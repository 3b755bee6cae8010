package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps the generated SURVEY.md §2.9 registry table in sync with the
  * code (r13 ask #7): the committed block between the registry markers
  * must equal RegistryDump.table exactly — one row per registered
  * query, anchors and oracle flags included. Regenerate with
  * `tools/gen_registry.sh` after registry changes. */
class RegistryTableSpec extends AnyFunSuite {
  test("SURVEY.md registry table matches the code-generated table") {
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get("SURVEY.md"))
    val begin = "<!-- registry:begin -->"
    val end = "<!-- registry:end -->"
    val (b, e) = (txt.indexOf(begin), txt.indexOf(end))
    assert(b >= 0 && e > b, "SURVEY.md lacks the registry markers")
    val committed = txt.substring(b + begin.length, e).trim
    assert(committed == RegistryDump.table.trim,
      "SURVEY.md §2.9 registry table is stale — run tools/gen_registry.sh")
  }
}
