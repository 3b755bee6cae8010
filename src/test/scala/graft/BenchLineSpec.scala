package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver-parsed bench stdout contract: one line, valid
  * JSON, under the caller's ~2000-char tail window at ANY registry
  * size (BENCH_r01-r03 were unparseable for budget/prefix reasons —
  * this is the regression class). */
class BenchLineSpec extends AnyFunSuite {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def line(n: Int): String =
    Bench.renderLine(
      (1 to n).map(i => (s"q${"%03d".format(i)}_some_long_query_name", i / 100.0)),
      (1 to n).map(_ / 100.0).sum, "bench_out.json", "/root/testdata/sf0.1")

  test("valid JSON with the contract fields, under budget, at every size") {
    for (n <- Seq(0, 1, 50, 137, 500)) {
      val l = line(n)
      assert(!l.contains("\n"))
      assert(l.length <= 1900, s"n=$n length=${l.length}")
      val node = mapper.readTree(l) // throws on malformed JSON
      assert(node.get("metric").asText() == "total")
      assert(node.get("n").asInt() == n)
      // qv mode: the complete value vector is in the line, nothing
      // omitted; legacy mode: the named prefix + omitted must tile n
      if (node.get("qv") != null) {
        assert(node.get("qv").size() == n)
        assert(node.get("omitted").asInt() == 0)
      } else
        assert(node.get("queries").size() + node.get("omitted").asInt() == n)
    }
  }

  test("registry-scale line carries the COMPLETE qv vector with omitted 0") {
    // ~280 queries at realistic magnitudes — the r11 registry shape;
    // the round artifact must parse to n == registry size, omitted 0
    // (VERDICT r10 ask #4)
    val results = (1 to 280).map(i =>
      (s"q${"%03d".format(i)}_some_long_query_name", (i % 40) / 7.5))
    val l = Bench.renderLine(results, results.map(_._2).sum,
      "bench_out.json", "/root/testdata/sf0.1", fullSha = Bench.sha16("x"))
    assert(l.length <= 1900, s"length=${l.length}")
    val node = mapper.readTree(l)
    assert(node.get("omitted").asInt() == 0)
    assert(node.get("qv").size() == 280)
    assert(node.get("order").asText() == "registry")
    // qv is positionally aligned with the input (registry) order at
    // 2-decimal precision
    assert(math.abs(node.get("qv").get(41).asDouble() - (42 % 40) / 7.5) < 0.005)
    // the named slowest-prefix map still renders for human readers
    assert(node.get("queries").size() > 0)
    // failed (-1) timings survive the compact encoding
    val withFail = Bench.renderLine(results.updated(0, (results(0)._1, -1.0)),
      0.0, "o.json", "sf0.1")
    assert(mapper.readTree(withFail).get("qv").get(0).asInt() == -1)
  }

  test("slowest queries survive truncation; omitted ones are the fastest") {
    val node = mapper.readTree(line(500))
    val kept = node.get("queries")
    assert(node.get("omitted").asInt() > 0) // 500 don't fit — some dropped
    // the slowest query (500/100 = 5.0) must be present
    assert(kept.has("q500_some_long_query_name"))
    // every kept value is >= every omitted value (kept = the top slice)
    val it = kept.elements()
    var minKept = Double.MaxValue
    while (it.hasNext) minKept = math.min(minKept, it.next().asDouble())
    assert(minKept >= (500 - kept.size()) / 100.0)
  }

  test("kept set is the contiguous slowest prefix even with mixed name lengths") {
    // a long-named slow query followed by short-named fast ones: once the
    // long name doesn't fit, nothing after it may be taken either
    val results = (1 to 400).map { i =>
      val name = if (i % 2 == 0) s"q${i}_an_extremely_long_query_name_padding_pad"
        else s"q$i"
      (name, i / 100.0)
    }
    val node = mapper.readTree(Bench.renderLine(
      results, results.map(_._2).sum, "o.json", "sf"))
    val kept = node.get("queries")
    assert(node.get("omitted").asInt() > 0)
    // contiguous prefix of the by-slowest ordering: every omitted value
    // <= every kept value AND the kept set is exactly the top-k of the
    // sorted sequence (no gaps where a long name was skipped over)
    val keptNames = {
      val it = kept.fieldNames(); val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next(); b.result().toSet
    }
    val sorted = results.sortBy(-_._2).map(_._1)
    assert(sorted.take(kept.size()).toSet == keptNames,
      "kept set is not the contiguous slowest prefix")
  }

  test("refocused count renders in the line") {
    val l = Bench.renderLine(Seq(("q1", 1.0)), 1.0, "o.json", "sf", refocused = 3)
    assert(mapper.readTree(l).get("refocused").asInt() == 3)
  }

  test("full_sha binds the line to the full-map file and stays in budget") {
    // sha16 is the leading 16 hex chars of SHA-256 (vector: sha256 of
    // the empty string starts e3b0c44298fc1c14)
    assert(Bench.sha16("") == "e3b0c44298fc1c14")
    val l = Bench.renderLine(Seq(("q1", 1.0)), 1.0, "o.json", "sf",
      fullSha = Bench.sha16("payload"))
    val node = mapper.readTree(l)
    assert(node.get("full_sha").asText().matches("[0-9a-f]{16}"))
    // omitted by default (focused runs pass no sha) — field absent
    val bare = mapper.readTree(
      Bench.renderLine(Seq(("q1", 1.0)), 1.0, "o.json", "sf"))
    assert(bare.get("full_sha") == null)
    // the sha field must not push a full-size registry line over budget
    val big = (1 to 500).map(i =>
      (s"q${"%03d".format(i)}_some_long_query_name", i / 100.0))
    val bigLine = Bench.renderLine(big, big.map(_._2).sum, "bench_out.json",
      "/root/testdata/sf0.1", fullSha = Bench.sha16("x"))
    assert(bigLine.length <= 1900)
    mapper.readTree(bigLine)
  }

  test("loadBaselines parses timing rows, last occurrence wins, missing file empty") {
    val f = java.nio.file.Files.createTempFile("baseline", ".md")
    java.nio.file.Files.writeString(f,
      """|# header
         || item | definition |
         ||---|---|
         || query set | stuff |
         |
         || query | sf | sec/query |
         ||---|---|---|
         || q01_scan_filter | 0.1 | 0.32 |
         || d06_dedup_minhash_native | 0.1 | 1.18 |
         |
         |re-record:
         || d06_dedup_minhash_native | 0.1 | 1.80 |
         |""".stripMargin)
    val b = Bench.loadBaselines(f.toString)
    assert(b == Map("q01_scan_filter" -> 0.32,
      "d06_dedup_minhash_native" -> 1.80))
    // sf filter: rows recorded at another scale never apply
    java.nio.file.Files.writeString(f,
      java.nio.file.Files.readString(f) +
        "| q01_scan_filter | 0.5 | 9.99 |\n")
    val b01 = Bench.loadBaselines(f.toString, Some("0.1"))
    assert(b01("q01_scan_filter") == 0.32, b01.toString)
    assert(Bench.loadBaselines(f.toString, Some("0.5")) ==
      Map("q01_scan_filter" -> 9.99))
    java.nio.file.Files.delete(f)
    assert(Bench.loadBaselines("/nonexistent/BASELINE.md").isEmpty)
  }

  test("negative (failed) timings render as -1, still valid JSON") {
    val l = Bench.renderLine(Seq(("q1", -1.0), ("q2", 0.5)), 0.5, "o.json", "sf")
    val node = mapper.readTree(l)
    assert(node.get("queries").get("q1").asInt() == -1)
  }

  // NOTE: mutates the JVM-global default Locale inside try/finally. This
  // build runs suites sequentially (no Test/parallelExecution override);
  // if that ever changes, move this test to a dedicated sequential suite
  // so other locale-sensitive tests can't observe the mutation window.
  test("locale independence: no comma-formatted numbers under a comma-decimal locale") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val l = line(3)
      // a comma DECIMAL separator ("0,01") would split a number into
      // two JSON tokens ("01" with a leading zero is malformed) —
      // readTree throws on either, and the parsed values confirm the
      // dot-decimal rendering survived the locale (the qv array's
      // legitimate element separators make a raw digit-comma-digit
      // regex a false positive here)
      val node = mapper.readTree(l)
      assert(math.abs(node.get("value").asDouble() - 0.06) < 1e-9, l)
      assert(math.abs(node.get("qv").get(2).asDouble() - 0.03) < 1e-9, l)
    } finally java.util.Locale.setDefault(prev)
  }
}
