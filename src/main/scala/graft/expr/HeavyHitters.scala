package graft.expr

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters sketch (Misra & Gries, "Finding repeated
  * elements", Sci. Comput. Program. 1982; merge rule from Agarwal et
  * al., "Mergeable summaries", PODS 2012) as a typed `Aggregator` —
  * the engine's bounded-state answer to "which tokens dominate the
  * corpus?" when the domain is too large to group-by.
  *
  * State is K counters (not the domain): `update` increments a present
  * key, admits a new key while there is room, otherwise decrements ALL
  * counters (the classic MG step); `merge` adds counterparts then
  * subtracts the (K+1)-th largest count and drops non-positives — the
  * PODS'12 rule that keeps summaries mergeable in any order/shape (the
  * tree-aggregation property a 1000-executor reduce needs).
  *
  * Guarantee (the load-bearing fact): a sketch with K counters
  * underestimates any item's true count by at most N/(K+1), so every
  * item with true frequency > N/(K+1) SURVIVES. The e06 query therefore
  * confirms candidates exactly (one filtered group-by over the
  * candidate set only) and emits items above N/100 with K=200 — the
  * sketch bounds the rescan to a broadcast-sized candidate set, the
  * confirm pass restores exactness, and the output is independent of
  * partitioning and merge order.
  */
object HeavyHitters {

  final val K = 200

  type Buf = mutable.HashMap[String, Long]

  def update(buf: Buf, v: String, k: Int = K): Buf = {
    buf.get(v) match {
      case Some(c) => buf.update(v, c + 1)
      case None if buf.size < k => buf.update(v, 1L)
      case None =>
        // decrement-all; drop zeros (amortized O(1) per update)
        val dead = mutable.ArrayBuffer.empty[String]
        buf.foreach { case (key, c) =>
          if (c == 1L) dead += key else buf.update(key, c - 1)
        }
        dead.foreach(buf.remove)
    }
    buf
  }

  def merge(a: Buf, b: Buf, k: Int = K): Buf = {
    b.foreach { case (key, c) => a.update(key, a.getOrElse(key, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest count, keep strictly-positive rest
      val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.foreach { case (key, c) =>
        if (c - cut <= 0L) dead += key else a.update(key, c - cut)
      }
      dead.foreach(a.remove)
    }
    a
  }

  /** Typed Aggregator: string column → candidate keys (sorted for
    * determinism of the ARRAY; survivorship itself is order-independent
    * only up to the MG guarantee, which is all the confirm pass needs). */
  val agg: Aggregator[String, Buf, Array[String]] =
    new Aggregator[String, Buf, Array[String]] {
      override def zero: Buf = mutable.HashMap.empty
      override def reduce(b: Buf, a: String): Buf = update(b, a)
      override def merge(a: Buf, b: Buf): Buf = HeavyHitters.merge(a, b)
      override def finish(b: Buf): Array[String] = b.keys.toArray.sorted
      override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      override def outputEncoder: Encoder[Array[String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
    }

  /** DataFrame-usable column: `candidates(col("tok"))` → array<string>. */
  def candidates(c: Column): Column = udaf(agg).apply(c)
}
