package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** The standing lint for the uncast-HUGEINT-in-mirror class (r13,
  * VERDICT r12 ask #2): x56_budget_pareto_fill shipped red because its
  * DuckDB mirror emitted `take_ppm` as arithmetic over a RAW window
  * `sum(...)` alias — in DuckDB any `sum` of an integer column is
  * HUGEINT, arithmetic over it stays HUGEINT, and the driver's pandas
  * bridge renders HUGEINT as float64 (`1000000.0` vs Spark's
  * `1000000`), breaking the canonical hash even when every value is
  * identical. The sf0.5/sf1.0 probes did NOT catch it: their
  * value-exact compare is dtype-insensitive. Detection-by-probe lags;
  * only a class lint is proactive (the ml21 lesson).
  *
  * Rule enforced on every oracle SQL (the mirror side; Spark's types
  * are pinned by the engine code itself):
  *
  *   an item of the FINAL select list may not expose a HUGEINT-tainted
  *   value — i.e. a raw `sum(...)` / `sum(...) OVER` not immediately
  *   wrapped in `CAST(`, or an alias whose defining expression is
  *   tainted (transitively) — unless the item is top-level
  *   `CAST(... AS <type>)`.
  *
  * `count(...)` is BIGINT in DuckDB and `min`/`max` return the input
  * type, so only `sum` taints. Intermediate CTE aliases may stay raw
  * (comparisons like `WHERE cum_before < budget` are exact either
  * way); only the output list crosses the pandas bridge. New offenders
  * must gain the CAST, or be whitelisted HERE with a written rationale.
  */
class MirrorTypeGuardSpec extends AnyFunSuite {

  /** blank out single-quoted string literals and `--` comments so
    * their parens/commas can't confuse depth tracking. */
  private def stripLiterals(sql: String): String = {
    val noStr = new StringBuilder
    var i = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) { noStr.append(if (c == '\'') { inStr = false; c } else ' ') }
      else if (c == '\'') { inStr = true; noStr.append(c) }
      else noStr.append(c)
      i += 1
    }
    noStr.toString.linesIterator
      .map(l => { val k = l.indexOf("--"); if (k >= 0) l.substring(0, k) else l })
      .mkString("\n")
  }

  /** split `s` on commas at paren-depth 0. */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var start = 0
    for (i <- s.indices) s.charAt(i) match {
      case '(' => depth += 1
      case ')' => depth -= 1
      case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
      case _ => ()
    }
    out += s.substring(start)
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** every select list in the SQL, in source order, as (items, isFinal)
    * where "final" = the last SELECT at paren-depth 0. */
  private def selectLists(sql: String): Seq[(Seq[String], Boolean)] = {
    val tok = "(?i)\\b(SELECT|FROM)\\b".r
    case class Hit(kind: String, pos: Int, depth: Int)
    val depthAt = {
      val d = new Array[Int](sql.length + 1)
      var depth = 0
      for (i <- sql.indices) {
        d(i) = depth
        sql.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ => ()
        }
      }
      d(sql.length) = depth
      d
    }
    val hits = tok.findAllMatchIn(sql)
      .map(m => Hit(m.group(1).toUpperCase, m.start, depthAt(m.start))).toSeq
    val selects = hits.filter(_.kind == "SELECT")
    val lastTopSelect = selects.filter(_.depth == 0).map(_.pos).maxOption
    selects.map { s =>
      val end = hits
        .find(h => h.kind == "FROM" && h.pos > s.pos && h.depth == s.depth)
        .map(_.pos)
        .getOrElse {
          // SELECT without FROM: list ends at the paren closing this depth
          var i = s.pos; var depth = depthAt(s.pos)
          var stop = sql.length
          while (i < sql.length && stop == sql.length) {
            sql.charAt(i) match {
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth < depthAt(s.pos)) stop = i
              case _ => ()
            }
            i += 1
          }
          stop
        }
      val body = sql.substring(s.pos + "SELECT".length, end)
        .replaceAll("(?i)^\\s*DISTINCT\\b", "")
      (splitTop(body), lastTopSelect.contains(s.pos))
    }
  }

  /** mask every `CAST( ... )` span with spaces: anything inside a CAST
    * has an explicit declared type, so it cannot leak HUGEINT — only
    * what survives the masking can. */
  private def maskCastSpans(sql: String): String = {
    val out = sql.toCharArray
    for (m <- "(?i)\\bCAST\\s*\\(".r.findAllMatchIn(sql)) {
      var i = m.end - 1 // the opening paren
      var depth = 0
      var stop = -1
      while (i < sql.length && stop < 0) {
        sql.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) stop = i
          case _ => ()
        }
        i += 1
      }
      if (stop > 0)
        for (k <- m.start to stop) out(k) = ' '
    }
    new String(out)
  }

  /** positions of `sum(` outside every CAST span (HUGEINT producers
    * whose type never gets pinned). */
  private def rawSums(sql: String): Seq[Int] =
    "(?i)\\bsum\\s*\\(".r.findAllMatchIn(maskCastSpans(sql))
      .map(_.start).toSeq

  /** the item's trailing `AS <alias>` at depth 0, if any (CAST's AS is
    * inside parens, so depth tracking skips it). */
  private def aliasOf(item: String): Option[String] = {
    val re = "(?i)\\bAS\\s+(\\w+)\\s*$".r
    re.findFirstMatchIn(item).filter { m =>
      item.substring(0, m.start).count(_ == '(') ==
        item.substring(0, m.start).count(_ == ')')
    }.map(_.group(1).toLowerCase)
  }

  /** true if the whole item (minus a trailing alias) is one CAST(...). */
  private def topLevelCast(item: String): Boolean = {
    val body = "(?i)\\bAS\\s+\\w+\\s*$".r.replaceFirstIn(item, "").trim
    if (!body.toUpperCase.startsWith("CAST")) return false
    val open = body.indexOf('(')
    if (open < 0) return false
    var depth = 0
    for (i <- open until body.length) {
      body.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return body.substring(i + 1).trim.isEmpty
        case _ => ()
      }
    }
    false
  }

  /** query-name → (item-substring, rationale). An entry suppresses
    * findings whose offending item text contains the substring. */
  private val whitelist: Map[String, Seq[(String, String)]] = Map(
    "x51_dsir_selection" -> Seq(
      ("WHEN sum(score_e6) >= 0",
        "Fixed.sdiv shape: the raw sum appears only inside the boolean " +
          "WHEN guard (comparisons are exact at any integer width and " +
          "emit BOOLEAN, never HUGEINT); both value branches are " +
          "CAST(sum AS BIGINT) // CAST(sum AS BIGINT) — type-pinned")))

  private def findings(name: String, rawSql: String): Seq[String] = {
    val sql = stripLiterals(rawSql)
    val lists = selectLists(sql)
    // taint fixpoint over alias-defining items (any select list)
    val items = lists.flatMap(_._1)
    var tainted = Set.empty[String]
    var changed = true
    def itemTainted(item: String): Boolean = {
      if (topLevelCast(item)) return false
      val body = maskCastSpans(
        "(?i)\\bAS\\s+\\w+\\s*$".r.replaceFirstIn(item, ""))
      rawSums(body).nonEmpty ||
        tainted.exists(t => s"(?i)\\b$t\\b".r.findFirstIn(body).nonEmpty)
    }
    while (changed) {
      changed = false
      for (item <- items; a <- aliasOf(item) if !tainted(a))
        if (itemTainted(item)) { tainted += a; changed = true }
    }
    val finalItems = lists.filter(_._2).flatMap(_._1)
    val hits = finalItems.flatMap { item =>
      if (topLevelCast(item)) None
      else if (rawSums(item).nonEmpty)
        Some(s"raw-sum-in-output: ${item.replaceAll("\\s+", " ").take(90)}")
      else {
        val refBody = maskCastSpans(
          "(?i)\\bAS\\s+\\w+\\s*$".r.replaceFirstIn(item, ""))
        tainted.find(t => s"(?i)\\b$t\\b".r.findFirstIn(refBody).nonEmpty)
          .map(t => s"tainted-alias '$t' in output: " +
            item.replaceAll("\\s+", " ").take(90))
      }
    }
    val allowed = whitelist.getOrElse(name, Nil)
    hits.filterNot(h => allowed.exists { case (sub, _) => h.contains(sub) })
  }

  test("the lint reproduces the x56 escape (r12's only red row)") {
    // the EXACT pre-fix shape of x56's mirror tail: cum_before is a raw
    // window sum (HUGEINT), take_ppm does arithmetic over it uncast.
    val prefix56 =
      """WITH r AS (
           SELECT lang, n_chars,
             coalesce(sum(n_chars) OVER (w
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS cum_before
           FROM q WINDOW w AS (ORDER BY lang))
         SELECT lang,
           CAST(cum_before AS BIGINT) AS cum_before,
           (1000000 * least(n_chars, 100000 - cum_before))
             // n_chars AS take_ppm
         FROM r ORDER BY lang"""
    val hits = findings("x56_prefix_regression", prefix56)
    assert(hits.exists(_.contains("take_ppm")),
      s"lint must flag the pre-fix x56 take_ppm leak; got: $hits")
    // and the FIXED shape passes
    val fixed = prefix56.replace(
      """(1000000 * least(n_chars, 100000 - cum_before))
             // n_chars AS take_ppm""",
      """CAST((1000000 * least(n_chars, 100000 - cum_before))
             // n_chars AS BIGINT) AS take_ppm""")
    assert(findings("x56_fixed_regression", fixed).isEmpty)
  }

  test("no oracle mirror exposes an uncast HUGEINT (raw sum or " +
    "sum-tainted alias) in its output list") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) => findings(name, sql).map(f => s"$name → $f")
    }
    assert(bad.isEmpty,
      s"\nuncast-HUGEINT-in-mirror offenders (wrap the output item in " +
        s"CAST(... AS BIGINT/DOUBLE) or whitelist with rationale):\n  " +
        bad.mkString("\n  "))
  }
}
