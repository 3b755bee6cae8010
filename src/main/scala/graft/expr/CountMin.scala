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

  /** Deterministic row hash. The row index seeds the BYTE-LEVEL fold
    * (ADVICE r5): if it were only mixed in after one shared base hash,
    * two items colliding in that base hash would collide in every row
    * at once, voiding the (1/2)^D independence argument for that
    * (2⁻⁶⁴-per-pair) failure mode. Seeding the fold makes each row an
    * independent function of the item's bytes. */
  def cell(item: String, row: Int): Int = {
    var h = item.getBytes("UTF-8").foldLeft(
      1125899906842597L + row.toLong * -7046029254386353131L)(
      (acc, b) => acc * 31 + b)
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
