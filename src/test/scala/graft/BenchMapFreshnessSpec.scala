package graft

import org.scalatest.funsuite.AnyFunSuite

/** Full-map bench freshness gate (VERDICT r14 ask #5): the probes' r14
  * treatment applied to the bench. BenchLineSpec guards the stdout
  * line's FORMAT, but nothing failed the build when the committed
  * canonical BENCH_full_r{N}.json lagged the registry or its bytes
  * stopped matching the sha the Bench run stamped for it. This spec
  * makes both a red build:
  *
  *   1. the LATEST committed canonical map must carry exactly one
  *      non-failed timing per `SparkEntry.registry` name, recorded at
  *      the canonical sf0.1 — a registry change without a map
  *      regeneration goes red here;
  *   2. the map's bytes must hash (Bench.sha16 — the same binding the
  *      stdout line's `full_sha` field carries) to the committed
  *      `.sha16` sidecar Bench writes next to every map, so a
  *      hand-edited or truncated artifact cannot pass as canonical.
  */
class BenchMapFreshnessSpec extends AnyFunSuite {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def latest: (Int, java.nio.file.Path) = {
    val rx = """BENCH_full_r(\d+)\.json$""".r
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.list(java.nio.file.Paths.get("."))
      .iterator.asScala
      .flatMap(p => rx.findFirstMatchIn(p.getFileName.toString)
        .map(m => m.group(1).toInt -> p))
      .toSeq
    assert(files.nonEmpty, "no committed BENCH_full_r{N}.json found")
    files.maxBy(_._1)
  }

  test("latest canonical map: one non-failed timing per registry query, at sf0.1") {
    val (_, path) = latest
    import scala.jdk.CollectionConverters._
    val node = mapper.readTree(java.nio.file.Files.readString(path))
    val qs = node.get("queries")
    val names = qs.fieldNames().asScala.toSet
    val reg = SparkEntry.registry.map(_.name).toSet
    val missing = reg -- names
    val extra = names -- reg
    assert(missing.isEmpty && extra.isEmpty,
      s"${path.getFileName} is stale vs the ${reg.size}-query registry " +
        s"(missing: ${missing.take(5).mkString(", ")}; " +
        s"extra: ${extra.take(5).mkString(", ")}) — regenerate the " +
        "canonical full map")
    reg.foreach { n =>
      assert(qs.get(n).asDouble() >= 0.0,
        s"$n recorded as FAILED (-1) in the canonical map")
    }
    assert(node.get("sf").asText().contains("sf0.1"),
      s"canonical map recorded at ${node.get("sf").asText()}, not sf0.1")
  }

  test("canonical map bytes match the committed sha16 binding") {
    val (_, path) = latest
    val sidecar = java.nio.file.Paths.get(path.toString + ".sha16")
    assert(java.nio.file.Files.exists(sidecar),
      s"missing ${sidecar.getFileName} — Bench writes it next to every " +
        "full map; commit both together")
    val sha = Bench.sha16(java.nio.file.Files.readString(path))
    val want = java.nio.file.Files.readString(sidecar).trim
    assert(sha == want,
      s"${path.getFileName} does not hash to its sha16 binding " +
        s"($sha != $want) — the committed map is not the one the Bench " +
        "run produced")
  }
}
