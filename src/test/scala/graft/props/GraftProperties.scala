package graft.props

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.expr.{DayPart, DistinctSketch}

/** Pure-function property checks (SURVEY §5.2), run by sbt's native
  * ScalaCheck framework — no Spark session needed. */
object GraftProperties extends Properties("graft") {

  private val bucketOrder = Seq("lateNight", "earlyMorning", "lateMorning",
    "earlyAfternoon", "lateAfternoon", "earlyEvening", "lateEvening",
    "earlyNight")

  property("daypart.totalOnRange") =
    forAll(Gen.choose(0, 2400)) { h => DayPart.label(h).nonEmpty }

  property("daypart.emptyOutsideRange") =
    forAll(Gen.oneOf(Gen.choose(Int.MinValue, -1), Gen.choose(2401, Int.MaxValue))) {
      h => DayPart.label(h).isEmpty
    }

  property("daypart.orderPreserving") =
    forAll(Gen.choose(0, 2400), Gen.choose(0, 2400)) { (a, b) =>
      val (la, lb) = (DayPart.label(a), DayPart.label(b))
      a > b || bucketOrder.indexOf(la) <= bucketOrder.indexOf(lb)
    }

  property("sketch.mergeCommutative") =
    forAll(Gen.listOf(Gen.long), Gen.listOf(Gen.long)) { (xs, ys) =>
      def sk(vs: Seq[Long]) =
        vs.foldLeft(DistinctSketch.emptyBuffer)(DistinctSketch.update)
      DistinctSketch.merge(sk(xs), sk(ys)).toSeq ==
        DistinctSketch.merge(sk(ys), sk(xs)).toSeq
    }

  property("sketch.mergeIsUnion") =
    forAll(Gen.listOf(Gen.long), Gen.listOf(Gen.long)) { (xs, ys) =>
      def sk(vs: Seq[Long]) =
        vs.foldLeft(DistinctSketch.emptyBuffer)(DistinctSketch.update)
      DistinctSketch.merge(sk(xs), sk(ys)).toSeq == sk(xs ++ ys).toSeq
    }

  property("sketch.duplicateInsensitive") =
    forAll(Gen.nonEmptyListOf(Gen.long)) { xs =>
      def sk(vs: Seq[Long]) =
        vs.foldLeft(DistinctSketch.emptyBuffer)(DistinctSketch.update)
      sk(xs).toSeq == sk(xs ++ xs).toSeq
    }

  property("hash64.deterministicAndSpreading") =
    forAll(Gen.long) { x =>
      DistinctSketch.hash64(x) == DistinctSketch.hash64(x) &&
        (x == 0L || DistinctSketch.hash64(x) != x)
    }

  // d10's Carter-Wegman family h_k = a + k·b over md5 halves: with
  // a < 2^60 and b < 2^56 the sum never overflows a signed 64-bit long
  // for any k in the family (7·2^56 + 2^60 < 2^63) — the bound the
  // oracle-exact MinHash arithmetic depends on
  property("minhashMd5.carterWegmanNoOverflow") =
    forAll(
      Gen.choose(0L, (1L << 60) - 1),
      Gen.choose(0L, (1L << 56) - 1),
      Gen.choose(0, 7)) { (a, b, k) =>
      val h = a + k * b
      h >= a && h >= 0L
    }

  // Misra-Gries guarantee (the e06 correctness backbone): after ANY
  // split of the stream into two summaries merged back together, every
  // item with true count > N/(K+1) is still a candidate
  property("heavyHitters.noFalseNegativesUnderMerge") =
    forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(0, 30).map(i => s"w$i")),
      Gen.choose(0, 1000)) { (xs, cutRaw) =>
      import graft.expr.HeavyHitters
      // k=5 << 31 distinct values, so decrement-all and the merge cut
      // both fire; the MG bound must hold regardless of the split point
      val k = 5
      val cut = cutRaw % (xs.size + 1)
      val (l, r) = xs.splitAt(cut)
      def sk(vs: Seq[String]) =
        vs.foldLeft(HeavyHitters.agg.zero)((b, v) => HeavyHitters.update(b, v, k))
      val merged = HeavyHitters.merge(sk(l), sk(r), k).keySet
      val n = xs.size.toDouble
      val truth = xs.groupBy(identity).view.mapValues(_.size)
      truth.forall { case (key, c) =>
        c <= n / (k + 1) || merged.contains(key)
      }
    }

  // jaccard arithmetic invariants (the d04 formula on arbitrary set sizes)
  property("jaccard.bounds") =
    forAll(Gen.choose(0, 1000), Gen.choose(1, 1000), Gen.choose(1, 1000)) {
      (interRaw, na, nb) =>
        val inter = math.min(interRaw, math.min(na, nb))
        val j = inter.toDouble / (na + nb - inter)
        j >= 0.0 && j <= 1.0 && (inter != na || na != nb || j == 1.0)
    }
}
