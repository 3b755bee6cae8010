package graft.stream

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Guards the committed STATE_SIZE_CHAINED.json artifact (VERDICT r11
  * ask #4): st21's chained join→window-count query must keep BOTH
  * state stores watermark-bounded, batch for batch. */
class ChainedStateAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val audit = ChainedStateAudit.run(spark, TestSpark.sf0001)

  test("the chained query reports both state operators separately") {
    audit.batches.foreach { b =>
      assert(b.ops.size == 2, s"batch ${b.batch}: ${b.ops.map(_.name)}")
      assert(b.ops.exists(_.name.toLowerCase.contains("join")),
        s"batch ${b.batch}: no join operator in ${b.ops.map(_.name)}")
    }
  }

  test("join state is watermark-bounded and falls after the watermark " +
    "passes — no accumulation behind the downstream aggregate") {
    val fedTotal = audit.batches.map(_.fed).sum
    assert(fedTotal == 1000, s"fixture drifted: $fedTotal rows")
    val join = audit.joinSeries
    assert(join.map(_.rows).max < fedTotal / 10,
      s"join peak ${join.map(_.rows).max} not watermark-bounded")
    // eviction observed: state falls across some delivery pair AND the
    // engine reports removals
    assert(join.map(_.rows).sliding(2).exists {
      case Seq(a, b) => b < a
      case _ => false
    }, s"join state never fell: ${join.map(_.rows)}")
    assert(join.map(_.removed).sum > 0, "join reported zero evictions")
    // cumulative evictions keep pace with feeding: by the end, far more
    // rows have been evicted than remain — the store drains, not grows
    assert(join.map(_.removed).sum > join.last.rows * 3,
      s"evicted ${join.map(_.removed).sum} vs final ${join.last.rows}")
  }

  test("aggregate state is bounded by open alarm windows, far below the " +
    "join output, and also evicts") {
    val agg = audit.aggSeries
    val joinedOut = audit.batches.map(_.outRows).sum
    // every batch: open-window rows, not rows-ever-joined
    assert(agg.map(_.rows).max < 20,
      s"agg peak ${agg.map(_.rows).max}: not bounded by open windows")
    assert(agg.map(_.removed).sum > 0, "agg reported zero window closes")
    // the aggregate closed more window-rows over the run than it ever
    // held at once (state turns over as the watermark advances)
    assert(agg.map(_.removed).sum > agg.map(_.rows).max,
      s"agg turnover ${agg.map(_.removed).sum} vs peak ${agg.map(_.rows).max}")
    assert(joinedOut > 0, "no alarms emitted — fixture drifted")
  }

  test("committed STATE_SIZE_CHAINED.json matches a fresh audit run") {
    val path = java.nio.file.Paths.get("STATE_SIZE_CHAINED.json")
    assert(java.nio.file.Files.exists(path),
      "STATE_SIZE_CHAINED.json not committed")
    val committed = java.nio.file.Files.readString(path)
    def skeleton(json: String): Seq[String] =
      json.linesIterator.filter(_.contains("\"batch\"")).toSeq
    assert(skeleton(committed) == skeleton(audit.json),
      "committed artifact drifted from a fresh run — regenerate via " +
        "runMain graft.stream.ChainedStateAudit")
  }
}
