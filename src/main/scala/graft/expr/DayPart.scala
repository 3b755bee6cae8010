package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Day-part bucketing of an hhmm integer — the engine's worked example of
  * a native Catalyst `Expression` with whole-stage codegen.
  *
  * Semantics match the reference's `replaceTimeWithDayPart` UDF
  * (reference `src/main/scala/Main.scala:27-38`): eight labeled buckets
  * over [0, 2400], `""` for out-of-range values. Unlike the reference's
  * `.asNondeterministic()` Scala UDF, this is a deterministic,
  * null-safe, codegen'd expression — filters can push through it and it
  * fuses into the surrounding WholeStageCodegen span.
  */
case class DayPart(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"day_part requires INT (hhmm), got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "day_part"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(DayPart.label(v.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.expr.DayPart.label($c));")

  override protected def withNewChildInternal(newChild: Expression): DayPart =
    copy(child = newChild)
}

object DayPart {
  /** Bucket boundaries, half-open [lo, hi) except the final [2100, 2400]. */
  def label(hhmm: Int): String =
    if (hhmm < 0) ""
    else if (hhmm < 500) "lateNight"
    else if (hhmm < 800) "earlyMorning"
    else if (hhmm < 1200) "lateMorning"
    else if (hhmm < 1400) "earlyAfternoon"
    else if (hhmm < 1700) "lateAfternoon"
    else if (hhmm < 1900) "earlyEvening"
    else if (hhmm < 2100) "lateEvening"
    else if (hhmm <= 2400) "earlyNight"
    else ""

  /** Register `day_part(int)` as a SQL function in the session, making the
    * expression usable from `expr(...)` / `spark.sql(...)`. */
  def register(spark: SparkSession): Unit =
    // idempotent: every query builder calls register, and
    // createOrReplaceTempFunction logs a replacement WARN per repeat —
    // 100 registered queries would spam the caller's captured log tail
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("day_part")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "day_part", exprs => DayPart(exprs.head), "internal")

  /** The same semantics as ANSI CASE text (for oracle SQL parity). */
  def caseSql(col: String): String =
    s"""CASE WHEN $col < 0 THEN ''
        WHEN $col < 500 THEN 'lateNight'
        WHEN $col < 800 THEN 'earlyMorning'
        WHEN $col < 1200 THEN 'lateMorning'
        WHEN $col < 1400 THEN 'earlyAfternoon'
        WHEN $col < 1700 THEN 'lateAfternoon'
        WHEN $col < 1900 THEN 'earlyEvening'
        WHEN $col < 2100 THEN 'lateEvening'
        WHEN $col <= 2400 THEN 'earlyNight'
        ELSE '' END"""
}
