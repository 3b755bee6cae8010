package graft.ext

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** x27: the patched manifest must equal the from-scratch rebuild
  * bit-exactly — counts AND the XOR content fingerprint — including
  * when a changed doc flips its quality-gate status between versions. */
class ManifestRefreshSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def patchedVsRebuilt(docs: DataFrame): (Seq[String], Seq[String]) = {
    val rebuilt = Curation.manifestOf(Curation.snapshotV2(docs)).orderBy("shard")
      .collect().map(_.toString).toSeq
    // the registered query IS the patch pipeline; reuse it end to end
    val tmp = java.nio.file.Files.createTempDirectory("x27").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val patched = Curation.manifestRefresh.build(spark, tmp)
      .collect().map(_.toString).toSeq
    (patched, rebuilt)
  }

  test("patched manifest equals from-scratch rebuild on a gate-flipping corpus") {
    // doc 55 (% 5 != 2, % 11 = 0): 19 tokens in v1 (fails the >= 20
    // gate), 20 after the [rev2] marker (passes) — the newly-passing
    // changed doc; doc 33 (% 11 = 0): 20 tokens in v1... removed from
    // v2? 33 % 5 = 3 -> present, changed, stays gated in both.
    // doc 17 (% 7 = 3): absent from v1, present in v2 -> added.
    // doc 12 (% 5 = 2): present in v1, absent from v2 -> removed.
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (55L, "en", words(19)),
      (33L, "en", words(25)),
      (17L, "en", words(30)),
      (12L, "en", words(30)),
      (1L, "en", words(40)),   // unchanged bulk
      (2L, "de", words(40)),
      (3L, "xx", words(40)),   // gate-failing lang in both versions
      (4L, "en", words(5)))    // gate-failing length in both versions
      .toDF("doc_id", "lang", "text")
    val (patched, rebuilt) = patchedVsRebuilt(docs)
    assert(patched == rebuilt,
      s"patched:\n${patched.mkString("\n")}\nrebuilt:\n${rebuilt.mkString("\n")}")
    assert(patched.nonEmpty)
  }

  test("shard whose last doc disappears drops its row (no zero-count residue)") {
    // a single v1-only doc: v2 manifest is empty, so the patched one
    // must be too — the n_chunks > 0 filter, not a 0-count row
    val docs = Seq((12L, "en", (1 to 30).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val (patched, rebuilt) = patchedVsRebuilt(docs)
    assert(rebuilt.isEmpty && patched.isEmpty, s"$patched vs $rebuilt")
  }
}
