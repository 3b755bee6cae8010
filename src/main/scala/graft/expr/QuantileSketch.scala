package graft.expr

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Q-digest quantile sketch (Shrivastava, Buragohain, Agrawal & Suri,
  * "Medians and beyond: new aggregation techniques for sensor
  * networks", SenSys 2004) as a typed `Aggregator` — the engine's
  * mergeable answer to "what are p50/p90/p99?" without a global sort,
  * completing the sketch family (HLL distinct, KMV distinct,
  * Misra-Gries heavy hitters, Q-digest quantiles).
  *
  * Determinism discipline (the repo's sketch contract): the BUFFER is
  * exact per-bucket counts over the fixed universe [0, 2¹⁶) — update
  * and merge are pure additions, so the accumulated state is
  * order- and partitioning-independent BY CONSTRUCTION (the property
  * e05's k-min values have, and randomized KLL compaction would not).
  * The Q-digest compression runs ONCE in `finish` on the final counts:
  * bottom-up over the implicit binary tree, a node whose
  * (self + sibling + parent) count is ≤ ⌊N/k⌋ pushes its count into the
  * parent. Canonical input → canonical digest → bit-identical output on
  * any cluster shape. The buffer is bounded by the universe (≤ 65 536
  * entries), the digest by O(k·log U).
  *
  * Guarantee: a rank query walks leaves-first and over-counts only by
  * ancestors' pushed-up mass — at most log₂(U) levels × ⌊N/k⌋ each, so
  * with k = 1024 and U = 2¹⁶ the rank error is ≤ 16·N/1024 = N/64
  * (~1.6%, matching the HLL twin's bound; asserted as a ScalaCheck law
  * in the spec). Values are clamped into the universe; a saturated
  * upper bucket reports the clamp boundary (documented, spec-pinned).
  */
object QuantileSketch {

  final val UniverseBits = 16
  final val Universe = 1 << UniverseBits // 65536
  final val K = 1024

  type Buf = mutable.HashMap[Int, Long]

  def bucketOf(v: Long): Int =
    if (v < 0L) 0 else if (v >= Universe) Universe - 1 else v.toInt

  /** Canonical Q-digest from exact bucket counts: map of
    * (level, index) -> count, levels 0 (leaves) .. UniverseBits (root).
    * A node pushes into its parent when the classic triple-sum test
    * passes; processed bottom-up in ascending index order. */
  def compress(counts: Buf, n: Long): mutable.HashMap[(Int, Int), Long] = {
    val d = mutable.HashMap.empty[(Int, Int), Long]
    counts.foreach { case (b, c) => d.update((0, b), c) }
    if (n <= 0L) return d
    val thresh = n / K
    for (lvl <- 0 until UniverseBits) {
      val idxs = d.keys.filter(_._1 == lvl).map(_._2).toArray.sorted
      var i = 0
      while (i < idxs.length) {
        val idx = idxs(i) & ~1 // left sibling of the pair
        val self = d.getOrElse((lvl, idx), 0L)
        val sib = d.getOrElse((lvl, idx + 1), 0L)
        val parent = d.getOrElse((lvl + 1, idx >> 1), 0L)
        if (self + sib + parent <= thresh) {
          if (self + sib > 0L) d.update((lvl + 1, idx >> 1), parent + self + sib)
          d.remove((lvl, idx))
          d.remove((lvl, idx + 1))
        }
        // skip the right sibling if it was next in the sorted list
        i += (if (i + 1 < idxs.length && idxs(i + 1) == (idx | 1)) 2 else 1)
      }
    }
    d
  }

  /** Rank query: nodes ordered by (upper bound, level) — leaves first —
    * accumulate counts until the target rank; report the node's upper
    * bound (so estimates only ever round UP within the error bound). */
  def quantile(digest: mutable.HashMap[(Int, Int), Long], n: Long,
      q: Double): Long = {
    if (n <= 0L) return 0L
    val target = math.max(1L, math.ceil(q * n).toLong)
    val nodes = digest.toArray.map { case ((lvl, idx), c) =>
      val hi = ((idx + 1) << lvl) - 1 // inclusive upper value bound
      (hi, lvl, c)
    }.sortBy(t => (t._1, t._2))
    var acc = 0L
    var i = 0
    while (i < nodes.length) {
      acc += nodes(i)._3
      if (acc >= target) return nodes(i)._1.toLong
      i += 1
    }
    (Universe - 1).toLong
  }

  /** finish output: [p50, p90, p99, n, digest_nodes]. */
  val agg: Aggregator[Long, Buf, Array[Long]] =
    new Aggregator[Long, Buf, Array[Long]] {
      override def zero: Buf = mutable.HashMap.empty
      override def reduce(b: Buf, v: Long): Buf = {
        val k = bucketOf(v)
        b.update(k, b.getOrElse(k, 0L) + 1L)
        b
      }
      override def merge(a: Buf, b: Buf): Buf = {
        b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
        a
      }
      override def finish(b: Buf): Array[Long] = {
        val n = b.valuesIterator.sum
        val d = compress(b, n)
        Array(quantile(d, n, 0.50), quantile(d, n, 0.90),
          quantile(d, n, 0.99), n, d.size.toLong)
      }
      override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      override def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }

  /** DataFrame-usable column over a long column. */
  def quantileSketch(c: Column): Column = udaf(agg).apply(c)
}
