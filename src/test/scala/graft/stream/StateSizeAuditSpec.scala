package graft.stream

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Guards the committed STATE_SIZE.json join-state artifact (VERDICT
  * r10 ask #8): the retention/output findings it documents must BE the
  * engine's behavior, batch for batch. */
class StateSizeAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val audit = StateSizeAudit.run(spark, TestSpark.sf0001)
  private def byName(n: String) =
    audit.queries.find(_.name == n).getOrElse(fail(s"$n missing from audit"))

  // derived, not hardcoded: a future join variant added to the audit
  // must automatically fall under the eviction assertions
  private val joinNames = StateSizeAudit.variants.map(_._1).toSet

  test("join state is watermark-bounded and evicts as the watermark advances") {
    audit.queries.filter(q => joinNames(q.name)).foreach { qa =>
      val fedTotal = qa.batches.map(_.fed).sum
      assert(fedTotal == 1000, s"fixture drifted: $fedTotal rows")
      // retention horizon (96 h + 1 h) spans ~1 delivery slice of the
      // month-long fixture: state must stay a small fraction of the
      // rows ever fed — the watermark bound, not an ever-growing store
      assert(qa.peak < fedTotal / 4,
        s"${qa.name}: peak state ${qa.peak} not watermark-bounded")
      // eviction must actually be observed: some batch ends with less
      // state than its predecessor and rows were removed
      val falls = qa.batches.sliding(2).exists {
        case Seq(a, b) => b.stateRows < a.stateRows
        case _ => false
      }
      assert(falls, s"${qa.name}: state never fell across batches")
      // numRowsRemoved is reported by inner/left-outer/semi; FULL outer
      // reads 0 there (its evictions surface as the unmatched-row
      // emissions counted in out_rows) — the falls-check above is the
      // eviction evidence common to every mode
      if (qa.name != "st15_stream_full_outer_join")
        assert(qa.batches.map(_.removed).sum > 0,
          s"${qa.name}: engine reported zero state evictions")
    }
  }

  test("state ROW counts are identical across join modes (symmetric storage)") {
    // the audit's honest finding: a semi-matched error is flagged, not
    // dropped — every mode stores both sides until watermark eviction
    val inner = byName("st05_stream_interval_join").batches.map(_.stateRows)
    for (other <- Seq("st11_stream_left_outer_join",
        "st15_stream_full_outer_join", "st17_stream_semi_join"))
      assert(byName(other).batches.map(_.stateRows) == inner,
        s"$other state rows diverged from inner — engine behavior " +
          "changed; re-adjudicate STATE_SIZE.json's findings")
  }

  test("what semi saves: output cardinality (and state bytes), not state rows") {
    val inner = byName("st05_stream_interval_join")
    val semi = byName("st17_stream_semi_join")
    // at-most-once per error vs inner's enumeration of matching clicks
    // (the fixture contains a multi-click error, so strictly smaller)
    assert(semi.totalOut < inner.totalOut,
      s"semi out ${semi.totalOut} !< inner out ${inner.totalOut}")
    // narrower click-side schema → smaller state bytes at the peak
    assert(semi.peakBytes < inner.peakBytes,
      s"semi bytes ${semi.peakBytes} !< inner ${inner.peakBytes}")
    // outer modes add unmatched-row emission on top of inner's output
    val lo = byName("st11_stream_left_outer_join")
    val fo = byName("st15_stream_full_outer_join")
    assert(inner.totalOut < lo.totalOut && lo.totalOut < fo.totalOut)
  }

  test("st27 dedup state: bounded by distinct texts, zero growth on re-crawl") {
    val qa = byName("st27_incremental_manifest")
    // one decision emitted per admitted doc, every doc admitted here
    assert(qa.batches.map(_.fed).sum == qa.totalOut,
      s"decisions ${qa.totalOut} != docs fed ${qa.batches.map(_.fed).sum}")
    // state is monotone non-decreasing (markers are never evicted) ...
    qa.batches.sliding(2).foreach {
      case Seq(a, b) => assert(b.stateRows >= a.stateRows,
        s"state fell ${a.stateRows} -> ${b.stateRows} at batch ${b.batch}")
      case _ =>
    }
    assert(qa.batches.map(_.removed).sum == 0, "markers were evicted")
    // ... bounded by DISTINCT TEXTS, not rows fed: the final re-crawl
    // delivery (batch 0's texts under fresh doc_ids) adds ZERO state
    val last = qa.batches.last
    val prev = qa.batches(qa.batches.size - 2)
    assert(last.fed > 0, "re-crawl delivery was empty")
    assert(last.stateRows == prev.stateRows,
      s"re-crawl grew state ${prev.stateRows} -> ${last.stateRows}")
    // and the final count IS the corpus's distinct-text count
    val distinctTexts = spark.read
      .parquet(s"${graft.TestSpark.sf0001}/documents.parquet")
      .select("text").distinct().count()
    assert(last.stateRows == distinctTexts,
      s"state ${last.stateRows} != distinct texts $distinctTexts")
  }

  test("committed STATE_SIZE.json matches a fresh audit run (rows/outputs)") {
    val path = java.nio.file.Paths.get("STATE_SIZE.json")
    assert(java.nio.file.Files.exists(path), "STATE_SIZE.json not committed")
    val committed = java.nio.file.Files.readString(path)
    // compare on the deterministic fields (state/out rows per batch);
    // state_bytes is a SizeEstimator figure that may drift across JVMs
    def skeleton(json: String): Seq[String] =
      json.linesIterator
        .filter(_.contains("\"batch\""))
        .map(_.replaceAll(""""state_bytes": \d+, """, "")).toSeq
    assert(skeleton(committed) == skeleton(audit.json),
      "STATE_SIZE.json is stale — regenerate with " +
        "runMain graft.stream.StateSizeAudit")
  }
}
