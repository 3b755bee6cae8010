package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd Catalyst
  * `Expression` — the canonical-composition pass (UAX #15) every text
  * pipeline runs before hashing or deduplicating: the SAME visible
  * string can arrive as composed (é = U+00E9) or decomposed
  * (e + U+0301) codepoints, and every downstream fingerprint, shingle,
  * MinHash and exact-dedup key in this engine is byte-defined — without
  * canonicalization, equal-looking documents hash apart.
  *
  * Spark has no built-in for this (`lower`/`trim` are unrelated); the
  * usual fallback is a Scala UDF, which blackboxes the expression and
  * breaks whole-stage codegen. This is the DayPart pattern instead: a
  * null-safe `UnaryExpression` whose generated code calls the JDK's
  * `java.text.Normalizer` (ICU-grade, no extra dependency) — it fuses
  * into the surrounding codegen span and stays a deterministic,
  * push-through projection. DuckDB's `nfc_normalize` implements the
  * same UAX #15 algorithm, which is what makes t13 oracle-exact.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.NfcNormalize.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** NFC-compose; skips the (allocating) normalize call for the common
    * already-normalized fast path the JDK checks in O(n). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Register `nfc_normalize(string)` for `expr(...)`/`spark.sql(...)`. */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_normalize")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "nfc_normalize", exprs => NfcNormalize(exprs.head), "internal")
}
