package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Edge cases in the multimodal framing ops that the generated fixtures
  * never hit (their texts are always non-empty). */
class MultimodalEdgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("m06 emits ZERO frames for an empty payload (sequence(0,-1) guard)") {
    // sequence(0, n_frames - 1) with n_frames = 0 yields the DESCENDING
    // [0, -1] — two bogus frames — where DuckDB's range(0, 0) yields
    // none. The guard filter must make the empty doc drop out entirely,
    // exactly like the oracle's lateral unnest over an empty range.
    val dir = java.nio.file.Files
      .createTempDirectory("m06_edge").toString
    Seq(
      (1L, "", "en", "web", 0L),
      (2L, "abc", "en", "web", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Multimodal.audioFrameEnergy.build(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L),
      s"empty doc must vanish, got: ${out.mkString(",")}")
    val r = out.head
    // "abc" = one 64-char frame: energy = 97+98+99 = 294
    assert(r.getAs[Int]("n_frames") == 1)
    assert(r.getAs[Long]("peak_energy") == 294L)
  }
}
