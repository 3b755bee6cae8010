package graft.expr

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Q-digest quantile sketch: deterministic digest/clamp/size behavior
  * plus the end-to-end Aggregator partitioning-invariance check. The
  * rank-error and merge-invariance LAWS are ScalaCheck'd in
  * [[graft.props.QuantileSketchProps]]. */
class QuantileSketchSpec extends AnyFunSuite {
  import QuantileSketch._

  private def sketchOf(vs: Seq[Long]): collection.mutable.HashMap[Int, Long] = {
    val b = collection.mutable.HashMap.empty[Int, Long]
    vs.foreach(v => b.update(bucketOf(v), b.getOrElse(bucketOf(v), 0L) + 1L))
    b
  }

  test("digest size stays bounded while exact counts would not") {
    // dense universe: 60k distinct values -> 60k exact buckets, but the
    // compressed digest must collapse to O(K log U) nodes
    val vs = (0L until 60000L)
    val d = compress(sketchOf(vs), vs.length.toLong)
    assert(d.size <= 3 * K, s"digest ${d.size} nodes")
    // and still answers correctly within the bound
    val est = quantile(d, vs.length.toLong, 0.5)
    assert(math.abs(est - 30000L) <= vs.length * UniverseBits / K + 1)
  }

  test("values beyond the universe clamp to the top bucket") {
    val vs = Seq(1L, 2L, 1000000L, 2000000L)
    val d = compress(sketchOf(vs), 4L)
    assert(quantile(d, 4L, 0.99) == (Universe - 1).toLong)
  }

  test("small-n digest is uncompressed and quantiles are exact") {
    // threshold floor(n/K) = 0 under K values -> no node merges
    val vs = Seq(5L, 10L, 20L, 40L)
    val d = compress(sketchOf(vs), 4L)
    assert(d.size == 4)
    assert(quantile(d, 4L, 0.5) == 10L)
    assert(quantile(d, 4L, 0.99) == 40L)
  }

  test("end-to-end aggregator: partitioning-invariant over a DataFrame") {
    val spark = TestSpark.spark
    import spark.implicits._
    val vs = (1L to 5000L).map(i => (i * 7919L) % 50000L)
    def run(parts: Int): Seq[Long] = vs.toDF("v").repartition(parts)
      .agg(QuantileSketch.quantileSketch(org.apache.spark.sql.functions.col("v")))
      .collect()(0).getSeq[Long](0)
    val one = run(1)
    assert(one == run(13), "sketch output depends on partitioning")
    assert(one(3) == 5000L) // n
  }
}
