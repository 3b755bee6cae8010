package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps BASELINE.md's generated canonical table in sync with the
  * registry (VERDICT r13 ask #7): exactly ONE canonical row per
  * registered query — so the 2× bench gate is unambiguous to
  * recompute. After adding a query: record its focused sf0.1 median as
  * a history batch row, then rerun `tools/gen_baseline.py`. */
class BaselineTableSpec extends AnyFunSuite {
  test("BASELINE.md canonical table: one row per registry query") {
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get("BASELINE.md"))
    val begin = "<!-- baseline:begin -->"
    val end = "<!-- baseline:end -->"
    val (b, e) = (txt.indexOf(begin), txt.indexOf(end))
    assert(b >= 0 && e > b, "BASELINE.md lacks the baseline markers")
    val block = txt.substring(b + begin.length, e)
    val row = """\| ([a-z][a-z0-9_]+) \| 0\.1 \| [0-9.]+ \| [0-9]+ \|""".r
    val names = row.findAllMatchIn(block).map(_.group(1)).toSeq
    assert(names.distinct.size == names.size,
      "duplicate canonical baseline rows")
    val missing = SparkEntry.queries.keySet -- names.toSet
    val extra = names.toSet -- SparkEntry.queries.keySet
    assert(missing.isEmpty && extra.isEmpty,
      s"canonical baseline table is stale — missing ${missing.take(5)}, " +
        s"extra ${extra.take(5)}; record focused sf0.1 rows for new " +
        "queries in the history appendix, then rerun tools/gen_baseline.py")
  }
}
