package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Quantified recall of every approximate path against its exact
  * baseline at sf0.001. All inputs and hash seeds are fixed, so these
  * are deterministic measurements, asserted with a small slack below
  * the observed value. */
class RecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  test("IVF ANN (nprobe=4/16) recalls >= 60% of exact cosine top-5") {
    val exact = Similarity.cosineTopK.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.annIvf.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    // structureless random embeddings are the worst case for coarse
    // quantization; observed 0.64 with these seeds
    assert(recall >= 0.60, s"ivf recall=$recall")
  }

  test("native banded MinHash recalls >= 85% of exact jaccard>=0.2 pairs") {
    val exact = Dedup.ngramJaccard.build(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val native = Dedup.minhashNative.build(spark, sf).collect()
      .filter(_.getAs[Double]("jaccard_dist") <= 0.8)
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val recall = (exact & native).size.toDouble / exact.size
    assert(recall >= 0.85, s"native minhash recall=$recall") // observed 0.93
  }

  test("spark.ml MinHash recalls 100% of exact jaccard>=0.2 pairs here") {
    val exact = Dedup.ngramJaccard.build(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val ml = Dedup.minhash.build(spark, sf).collect()
      .filter(_.getAs[Double]("jaccard_dist") <= 0.8)
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert((exact & ml).size == exact.size,
      s"missing: ${exact -- ml}")
  }
}
