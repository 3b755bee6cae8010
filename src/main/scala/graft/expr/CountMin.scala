package graft.expr

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms
  * 2005) as a typed `Aggregator`: point-frequency estimates over an
  * open domain in W×D longs of state — the complement of Misra-Gries
  * (which finds WHICH items are heavy; CM answers "how often was THIS
  * item seen", overestimate-only).
  *
  * Determinism discipline: state is a dense W×D counter array and both
  * update and merge are pure per-cell additions — order- and
  * partitioning-independent by construction, like the Q-digest's exact
  * counts. Rows are seeded xxhash-style mixes of the item's bytes with
  * the row index, fixed here (no engine-private randomness), so the
  * same item always hits the same cells on any engine or cluster
  * shape.
  *
  * Guarantees (the CM laws, ScalaCheck'd in the spec): estimates never
  * undercount — est(x) ≥ true(x) always — and with width W the
  * overcount is ≤ e·N/W per row, so the min over D=4 rows exceeds
  * true(x) + 2·N/W with probability ≤ (1/2)⁴ per item (asserted in
  * aggregate over random streams). */
object CountMin {

  final val W = 2048
  final val D = 4

  type Buf = Array[Long] // row-major W*D

  /** Per-row fold multipliers — public mixing constants (splitmix64's
    * golden-gamma, two murmur3 finalizer constants, xorshift*'s
    * multiplier), all odd so multiplication is invertible mod 2⁶⁴. */
  private val RowMult: Array[Long] = Array(
    -7046029254386353131L, // 0x9E3779B97F4A7C15
    -4417276706812531889L, // 0xC2B2AE3D27D4EB4F
    -49064778989728563L,   // 0xFF51AFD7ED558CCD
    2685821657736338717L)  // 0x2545F4914F6CDD1D

  /** Deterministic row hash: each row folds the item's bytes in a
    * DIFFERENT polynomial base (ADVICE r5/r6). A seed mixed in only
    * additively cancels for equal-length items (h = seed·B^len +
    * P(item), so any base-polynomial collision P(a)=P(b) with
    * len(a)=len(b) collided in every row at once — the r6 finding).
    * With per-row base Mᵣ, a row-r collision means the byte-difference
    * polynomial has Mᵣ as a root mod 2⁶⁴; the four bases are distinct,
    * so one pair knocking out all four rows needs four simultaneous
    * roots — the heuristic independence the (1/2)^D bound wants. This
    * is NOT a formally pairwise-independent family (no polynomial-mod-
    * 2⁶⁴ scheme is); the residual risk is a pair whose difference
    * polynomial vanishes at several of the fixed bases, which the
    * ScalaCheck laws (overestimate-only, error bound in aggregate)
    * bound empirically. */
  def cell(item: String, row: Int): Int = {
    val m = RowMult(row)
    var h = item.getBytes("UTF-8").foldLeft(
      1125899906842597L + row.toLong * m)(
      (acc, b) => acc * m + b)
    h ^= h >>> 33; h *= -49064778989728563L
    h ^= h >>> 33; h *= -4265267296055464877L
    h ^= h >>> 33
    (((h % W) + W) % W).toInt
  }

  def estimate(buf: Buf, item: String): Long =
    (0 until D).map(r => buf(r * W + cell(item, r))).min

  val agg: Aggregator[String, Buf, Buf] =
    new Aggregator[String, Buf, Buf] {
      override def zero: Buf = new Array[Long](W * D)
      override def reduce(b: Buf, v: String): Buf = {
        var r = 0
        while (r < D) { b(r * W + cell(v, r)) += 1L; r += 1 }
        b
      }
      override def merge(a: Buf, b: Buf): Buf = {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      override def finish(b: Buf): Buf = b
      override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      override def outputEncoder: Encoder[Buf] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
    }

  /** DataFrame-usable column: the full sketch as array<long>. */
  def countMin(c: Column): Column = udaf(agg).apply(c)
}
