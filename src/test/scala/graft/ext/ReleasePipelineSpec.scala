package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** x28: the composed release pipeline on a planted corpus — exact dups
  * collapse to one survivor, near-dup pairs land on ONE side (decided
  * by the cluster root, not per-doc hashing), gate-failing docs vanish,
  * and the manifest rows carry the expected counts per side. */
class ReleasePipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("planted corpus: dedup, cluster-whole split, gated manifest") {
    def words(pre: String, n: Int) = (1 to n).map(i => s"$pre$i").mkString(" ")
    val base = words("w", 30)
    // md5 first hex digit: '100' -> f (train), '119' -> 0 (eval)
    val nearDup = base.replace("w7", "edited")
    val docs = Seq(
      (100L, "en", base), // exact-dup cluster {100, 101}: 100 survives;
      (101L, "en", base), //   ALSO a jaccard-1.0 near-dup pair -> root 100
      (119L, "en", words("q", 30)), // singleton -> root 119 -> eval
      (300L, "xx", words("z", 30)), // gate-fail: lang
      (301L, "en", words("s", 5))) // gate-fail: length
      .toDF("doc_id", "lang", "text")
    val tmp = java.nio.file.Files.createTempDirectory("x28").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Curation.releasePipeline.build(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3))))
      .toMap
    // survivors: 100 (root 100 -> train), 119 (eval); 101 deduped away,
    // 300/301 gated away
    assert(out.keySet == Set(("train", "en"), ("eval", "en")), out.toString)
    assert(out(("train", "en")) == ((1L, 30L)), out.toString)
    assert(out(("eval", "en")) == ((1L, 30L)), out.toString)
  }

  test("near-dup pair is assigned whole even when ids would hash apart") {
    def words(pre: String, n: Int) = (1 to n).map(i => s"$pre$i").mkString(" ")
    val base = words("w", 30)
    // 119 hashes eval, 100 hashes train — but they form one cluster
    // with root 100, so BOTH must land train
    val docs = Seq(
      (100L, "en", base),
      (119L, "en", base.replace("w7", "edited")))
      .toDF("doc_id", "lang", "text")
    val tmp = java.nio.file.Files.createTempDirectory("x28b").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Curation.releasePipeline.build(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out == Map("train" -> 2L), out.toString)
  }
}
