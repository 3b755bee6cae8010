package graft.props

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.expr.QuantileSketch._

/** Q-digest laws (pure functions, no Spark): the ≤ N·log₂(U)/K rank
  * error of every estimate, and exact merge/split invariance of the
  * accumulated state and its canonical digest. */
object QuantileSketchProps extends Properties("quantile-sketch") {

  private def sketchOf(vs: Seq[Long]): collection.mutable.HashMap[Int, Long] = {
    val b = collection.mutable.HashMap.empty[Int, Long]
    vs.foreach(v => b.update(bucketOf(v), b.getOrElse(bucketOf(v), 0L) + 1L))
    b
  }

  private val values = Gen.nonEmptyListOf(Gen.chooseNum(0L, (Universe - 1).toLong))

  property("rank error of p50/p90/p99 <= N*log2(U)/K") = forAll(values) { vs =>
    val n = vs.length.toLong
    val d = compress(sketchOf(vs), n)
    val sorted = vs.sorted
    val slack = n * UniverseBits / K + 1
    Seq(0.5, 0.9, 0.99).forall { q =>
      val est = quantile(d, n, q)
      val target = math.max(1L, math.ceil(q * n).toLong)
      // the estimate's rank INTERVAL [#(< est), #(<= est)] must reach
      // the target within slack — duplicated values widen the interval
      // legitimately (that is tie mass, not sketch error)
      val below = sorted.count(_ < est).toLong
      val atOrBelow = sorted.count(_ <= est).toLong
      below < target + slack && atOrBelow >= target - slack
    }
  }

  property("state and digest are split-shape invariant") =
    forAll(for {
      vs <- values
      cut <- Gen.chooseNum(0, 1000)
    } yield (vs, cut % (vs.length + 1))) { case (vs, cut) =>
      val (a, b) = vs.splitAt(cut)
      val whole = sketchOf(vs)
      val merged = sketchOf(a)
      sketchOf(b).foreach { case (k, c) =>
        merged.update(k, merged.getOrElse(k, 0L) + c) }
      val n = vs.length.toLong
      whole == merged && compress(whole, n) == compress(merged, n)
    }
}
