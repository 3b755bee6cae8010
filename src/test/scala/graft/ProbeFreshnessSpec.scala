package graft

import org.scalatest.funsuite.AnyFunSuite

/** Probe-freshness gate (VERDICT r13 ask #3): the committed dual-scale
  * probe artifacts must cover the FULL current registry, with no
  * failure and no timeout rows. The probe gate has caught real
  * scale-dependent bugs (x50, q02, ml21) — but only while it covers
  * the registry; in r12→r13 the artifacts silently lagged 15 new
  * queries. This spec turns that lag into a red build: after ANY
  * registry change, regenerate both artifacts (ProbeData → Verify →
  * tools/check_oracle.py --timeout --json; recipe in
  * .claude/skills/verify + BASELINE.md §probes) before committing.
  */
class ProbeFreshnessSpec extends AnyFunSuite {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  for (f <- Seq("CORRECTNESS_sf05_probe.json", "CORRECTNESS_sf10_probe.json")) {
    test(s"$f covers all ${SparkEntry.queries.size} registry queries, " +
      "zero failures, zero timeouts") {
      val node = mapper.readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(f)))
      val missing = SparkEntry.queries.keySet.filterNot(node.has)
      assert(node.size() == SparkEntry.queries.size && missing.isEmpty,
        s"$f is stale (${node.size()} of ${SparkEntry.queries.size} " +
          s"queries; missing e.g. ${missing.take(5).mkString(", ")}) — " +
          "regenerate the probe")
      val bad = SparkEntry.queries.keySet.toSeq.sorted.flatMap { q =>
        val err = node.get(q).get("err")
        if (err == null || err.isNull || err.asText() == "no_oracle") None
        else Some(s"$q: ${err.asText()}")
      }
      assert(bad.isEmpty, s"$f carries failing/timeout rows: " +
        bad.take(5).mkString("; "))
    }
  }
}
