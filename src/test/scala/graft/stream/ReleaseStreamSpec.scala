package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming release pipeline's stream==batch theorem: after a
  * trigger sequence with near-dup clusters, a cluster-merging bridge
  * doc (split flip included), an out-of-order exact twin (survivor
  * replacement), gate-failed docs acting as graph nodes, a replayed
  * trigger, and a redelivered doc, the patched running manifest equals
  * x28's batch output over the union of everything that arrived. */
class ReleaseStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val A = (1 to 24).map(i => s"alpha$i").mkString(" ")
  private val Anear =
    ((1 to 22).map(i => s"alpha$i") ++ Seq("novel1", "novel2")).mkString(" ")
  private val B = (1 to 24).map(i => s"beta$i").mkString(" ")
  private val Bnear =
    ((1 to 22).map(i => s"beta$i") ++ Seq("fresh1", "fresh2")).mkString(" ")
  private val C = (1 to 24).map(i => s"gamma$i").mkString(" ")
  // first half of A + first half of B: jaccard ≈ 0.29 with each side —
  // above d04's theta, so it BRIDGES the two clusters
  private val bridge =
    ((1 to 12).map(i => s"alpha$i") ++ (1 to 12).map(i => s"beta$i"))
      .mkString(" ")

  private def manifestMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("patched streaming manifest equals the batch x28 release end to end") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft_release_stream").toString
    val in = MemoryStream[(Long, String, String)]
    val q = in.toDF().toDF("doc_id", "lang", "text")
      .writeStream
      .foreachBatch(ReleaseStream.processBatch(spark, dir) _)
      .start()

    // trigger 0: two seed clusters, one junk doc, one unrelated doc
    in.addData((10L, "en", A), (11L, "en", B), (12L, "en", "tiny doc"),
      (13L, "en", C))
    q.processAllAvailable()
    // trigger 1: near-dups join their clusters; 15 is an exact twin of
    // 10 (larger id → never a survivor); 3 is GATE-FAILED (lang xx) yet
    // a near-dup of A — it becomes the A-cluster's component min, so
    // the split of docs it never "joined" is decided by md5('3')
    in.addData((14L, "en", Anear), (15L, "en", A), (16L, "en", Bnear),
      (3L, "xx", Anear))
    q.processAllAvailable()
    // trigger 2: 6 is an exact twin of 11 with a SMALLER id — it takes
    // survivorship AND re-roots the B cluster (md5('6') starts '1' →
    // the whole B side flips to eval)
    in.addData((6L, "en", B))
    q.processAllAvailable()

    val mid = manifestMap(ReleaseStream.manifest(spark, dir))
    // A side (root 3 → train): survivors 10, 14; C (root 13 → train): 13
    // B side (root 6 → eval): survivors 6, 16
    assert(mid(("train", "en"))._1 == 3L, mid.toString)
    assert(mid(("eval", "en"))._1 == 2L, mid.toString)

    // trigger 3: the bridge merges A- and B-clusters under root 3 —
    // the B side flips BACK to train; doc 10 is redelivered and must
    // be ignored (admission is final)
    in.addData((18L, "en", bridge), (10L, "en", A))
    q.processAllAvailable()
    q.stop()

    // replayed trigger (same batchId): the marker makes it a no-op —
    // an XOR patch applied twice would cancel itself
    val before = manifestMap(ReleaseStream.manifest(spark, dir))
    ReleaseStream.processBatch(spark, dir)(
      Seq((6L, "en", B)).toDF("doc_id", "lang", "text"), 2L)
    assert(manifestMap(ReleaseStream.manifest(spark, dir)) == before)

    // THE THEOREM: the running manifest equals x28 batch over the union
    val union = Seq(
      (10L, "en", A), (11L, "en", B), (12L, "en", "tiny doc"),
      (13L, "en", C), (14L, "en", Anear), (15L, "en", A),
      (16L, "en", Bnear), (3L, "xx", Anear), (6L, "en", B),
      (18L, "en", bridge)).toDF("doc_id", "lang", "text")
    val tmp = java.nio.file.Files.createTempDirectory("x28_batch").toString
    union.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val batch = manifestMap(
      graft.ext.Curation.releasePipeline.build(spark, tmp))
    val streamed = manifestMap(ReleaseStream.manifest(spark, dir))
    assert(streamed == batch,
      s"stream != batch\nstream: $streamed\nbatch:  $batch")
    // everything merged under root 3 → train only, 6 survivors
    assert(streamed.keySet == Set(("train", "en")))
    assert(streamed(("train", "en"))._1 == 6L)
  }
}
