package graft.props

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.expr.CountMin._

/** Count-Min laws (pure functions, no Spark): estimates NEVER
  * undercount, and the accumulated state is split-shape invariant. */
object CountMinProps extends Properties("count-min") {

  private def sketchOf(vs: Seq[String]): Array[Long] = {
    val b = new Array[Long](W * D)
    vs.foreach { v =>
      var r = 0
      while (r < D) { b(r * W + cell(v, r)) += 1L; r += 1 }
    }
    b
  }

  private val streams =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.identifier, Gen.numStr)).map(_.take(500))

  property("estimate(x) >= true count of x, for every x") =
    forAll(streams) { vs =>
      val sk = sketchOf(vs)
      vs.groupBy(identity).forall { case (v, occ) =>
        estimate(sk, v) >= occ.length.toLong
      }
    }

  property("state is split-shape invariant") =
    forAll(for {
      vs <- streams
      cut <- Gen.chooseNum(0, 1000)
    } yield (vs, cut % (vs.length + 1))) { case (vs, cut) =>
      val (a, b) = vs.splitAt(cut)
      val merged = sketchOf(a)
      val sb = sketchOf(b)
      var i = 0
      while (i < merged.length) { merged(i) += sb(i); i += 1 }
      java.util.Arrays.equals(merged, sketchOf(vs))
    }
}
