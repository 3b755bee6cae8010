package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst Generator (UDTF): overlapping token windows.
  *
  * `chunk_windows(tokens, window, stride)` emits one row per chunk —
  * `(chunk_idx BIGINT, start_tok BIGINT, ct ARRAY<STRING>)` — with the
  * exact start-offset rule of the HOF-based chunker
  * (`Curation.chunkByTokens`, x24): starts at 0, stride, 2·stride, …,
  * last start = max(ceil((n-window)/stride), 0), final chunk may be
  * short. A NULL token array generates no rows (explode-of-NULL
  * semantics).
  *
  * This is the UDTF extension point done natively (the registered x24
  * query stays on the pure-SQL HOF form so its DuckDB mirror is
  * line-for-line): where `transform(sequence(...))` materializes the
  * full chunk ARRAY per row before explode — a whole document's chunks
  * held at once, ~window/stride × the document in flight — the
  * generator streams one chunk at a time through Generate's row
  * iterator, the shape that matters when a 100 TB corpus's longest
  * documents meet a small stride. Equality with the HOF path is
  * spec-asserted (ChunkWindowsSpec).
  */
case class ChunkWindows(tokens: Expression, window: Expression,
    stride: Expression)
    extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens, window, stride)
  override def prettyName: String = "chunk_windows"

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("start_tok", LongType, nullable = false),
    StructField("ct", ArrayType(StringType, containsNull = true),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!tokens.dataType.isInstanceOf[ArrayType] ||
      tokens.dataType.asInstanceOf[ArrayType].elementType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"chunk_windows requires ARRAY<STRING> tokens, got ${tokens.dataType.sql}")
    val boundsOk = Seq(window, stride).forall(e =>
      e.foldable && e.dataType == IntegerType && e.eval() != null)
    if (!boundsOk)
      return TypeCheckResult.TypeCheckFailure(
        "chunk_windows requires literal INT window and stride")
    val w = window.eval().asInstanceOf[Int]
    val s = stride.eval().asInstanceOf[Int]
    if (s < 1 || s > w)
      TypeCheckResult.TypeCheckFailure(
        s"chunk_windows requires 0 < stride <= window, got ($w, $s)")
    else TypeCheckResult.TypeCheckSuccess
  }

  // validated foldable by checkInputDataTypes
  private lazy val w: Int = window.eval().asInstanceOf[Int]
  private lazy val s: Int = stride.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = tokens.eval(input)
    if (arr == null) return Nil
    val a = arr.asInstanceOf[ArrayData]
    val n = a.numElements()
    val objs = a.toObjectArray(StringType)
    val lastStart = math.max((n - w + s - 1) / s, 0) // n,w,s ≥ 0 ⇒ ceil
    // one chunk at a time — never the whole chunk list in memory
    (0 to lastStart).iterator.map { i =>
      val start = i * s
      val len = math.min(w, math.max(n - start, 0))
      val ct = new Array[AnyRef](len)
      System.arraycopy(objs, start, ct, 0, len)
      InternalRow(i.toLong, start.toLong, new GenericArrayData(ct))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChunkWindows =
    copy(tokens = newChildren(0), window = newChildren(1),
      stride = newChildren(2))
}

object ChunkWindows {
  /** Register `chunk_windows(tokens, window, stride)` for expr()/SQL. */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("chunk_windows")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "chunk_windows",
        exprs => ChunkWindows(exprs(0), exprs(1), exprs(2)), "internal")
}
