package graft.stream

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Guards the committed LATE_DATA.json late-data contract artifact
  * (VERDICT r9 #8): the watermark-drop rule the audit documents must BE
  * the engine's rule, batch for batch, and the committed file must
  * match a fresh run of the same harness. */
class LateDataAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("watermark drop accounting: engine-observed == contract-derived, per batch") {
    val audit = LateDataAudit.run(spark, TestSpark.sf0001,
      queryName = "late_audit_spec_out")
    assert(audit.totalDelivered == 1000, s"fixture drifted: $audit")
    audit.stats.foreach { b =>
      assert(b.observedDropped == b.expectedDropped,
        s"batch ${b.batch}: engine dropped ${b.observedDropped}, " +
          s"contract predicts ${b.expectedDropped}")
    }
    // the schedule must actually exercise the contract: deferred rows
    // both dropped AND admitted (a 0-drop or all-drop run guards nothing)
    val deferred = LateDataAudit
      .schedule(spark, TestSpark.sf0001, 8, 2)
      .count(e => e.eventId % 7 == 0)
    assert(audit.totalObserved > 0, "no late rows were dropped")
    assert(audit.totalObserved < deferred,
      "every deferred row dropped — admitted-late path unexercised")
  }

  test("st27 ingest horizon: engine-observed == contract-derived, per batch, " +
    "with both late paths exercised") {
    val audit = LateDataAudit.runSt27(spark, TestSpark.sf0001)
    assert(audit.totalDelivered == 500, s"fixture drifted: $audit")
    audit.stats.foreach { b =>
      assert(b.observedDropped == b.expectedDropped,
        s"batch ${b.batch}: engine dropped ${b.observedDropped}, " +
          s"contract predicts ${b.expectedDropped}")
    }
    // the 3-slice deferrals land behind the 1 h horizon (dropped); the
    // 1-slice deferrals are late but inside it (admitted) — a schedule
    // exercising only one path guards nothing
    assert(audit.totalObserved > 0, "no late docs were dropped")
    val ids = spark.read
      .parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val deferred = ids.count(id => id % 7 == 0 || id % 5 == 0 || id % 11 == 0)
    assert(audit.totalObserved < deferred,
      "every deferred doc dropped — admitted-late path unexercised")
    // the boundary class must be present: % 11 rows defer TWO slices,
    // landing ts EXACTLY ON the frozen watermark — they drop only
    // under the inclusive <= rule, so the observed == expected pass
    // above distinguishes <= from strict < (not just far-late drops)
    val n = ids.length
    val boundary = ids.zipWithIndex.count { case (id, i) =>
      val slice = (i.toLong * 8 / n).toInt
      id % 7 != 0 && id % 5 != 0 && id % 11 == 0 && slice + 2 < 8
    }
    assert(boundary > 0, "schedule carries no ts == watermark rows — " +
      "the inclusive-boundary contract is unexercised")
  }

  test("committed LATE_DATA.json matches a fresh audit run") {
    val path = java.nio.file.Paths.get("LATE_DATA.json")
    assert(java.nio.file.Files.exists(path), "LATE_DATA.json not committed")
    val committed = java.nio.file.Files.readString(path)
    val fresh = LateDataAudit.fullJson(spark, TestSpark.sf0001)
    assert(committed == fresh,
      "LATE_DATA.json is stale — regenerate with runMain graft.stream.LateDataAudit")
  }
}
