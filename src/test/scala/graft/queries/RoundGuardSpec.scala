package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** The standing lint for the rounding-boundary class (r12, VERDICT r11
  * ask #2): after q02 (r11) and ml21 (r12) both failed the oracle hash
  * on `round(float-aggregate-or-128-bit-quotient, d)`, no oracled
  * query may apply a float aggregate to a fractional DOUBLE column or
  * round a float aggregate at all. The two failure mechanisms:
  *
  *   1. sum/avg/corr/stddev/var/percentile over fractional doubles are
  *      accumulation-order-dependent — Spark and DuckDB add in
  *      different orders, so a result within 1 ulp of a `round`
  *      boundary flips the last digit between engines;
  *   2. a quotient of exact integers IS bit-identical, but can sit
  *      EXACTLY on a dyadic rounding boundary (15/128 = 0.1171875 at
  *      6 dp) where the engines' half-up vs nearest-even tie rules
  *      differ — and CAST(128-bit AS DOUBLE) of a > 2⁵³ value can
  *      itself differ by 1 ulp (the ml21 bug).
  *
  * The sanctioned recipes live in [[graft.core.Fixed]]: integerize
  * BEFORE the aggregate (cents / e-k units), emit fixed-point integers
  * via sign-split DIV, derive display doubles from ≤2⁵³ integers, and
  * convert 128-bit values through the hi/lo `dec2d` split.
  *
  * This spec scans the ORACLE SQL contract text (every conversion is
  * mirrored, so one side suffices; the sf-probe gate catches Spark-side
  * drift) plus the main source tree as a second net. New offenders must
  * be converted, or whitelisted HERE with a written rationale.
  */
class RoundGuardSpec extends AnyFunSuite {

  // float aggregates whose rounding (mechanism 1+2) is banned outright
  private val floatAggs =
    "sum|avg|mean|corr|covar_pop|covar_samp|stddev_samp|stddev_pop|stddev|" +
      "var_samp|var_pop|variance|quantile_cont|quantile|percentile|median"

  // fractional-double columns of the TESTDATA tables: aggregating them
  // raw (un-integerized) is mechanism 1 even without a round()
  private val fracCols =
    "o_totalprice|c_acctbal|s_acctbal|l_extendedprice|l_discount|l_tax|" +
      "p_retailprice|value"

  private val roundOverAgg =
    s"""(?is)round\\s*\\(\\s*($floatAggs)\\s*\\(""".r
  private val aggOverFrac =
    s"""(?is)\\b($floatAggs)\\s*\\(\\s*(DISTINCT\\s+)?(\\w+\\.)?($fracCols)\\s*[,)]""".r

  /** query-name → (pattern-substring, rationale). An entry only
    * suppresses findings whose matched text contains the substring. */
  private val whitelist: Map[String, Seq[(String, String)]] = Map(
    // min/max are NOT in floatAggs (an extremum is one stored row
    // value, identical bits on both engines) — no entries needed.
    "q28_percentile_stats" -> Seq(
      ("round(quantile_cont(",
        "sanctioned ×10 snap: percentile over integer CENTS has a true " +
          "value exactly 1-dp; both engines land within 1 ulp, so " +
          "round(x*10) recovers the same integer — Fixed.scala recipe")),
    "q53_sql_scripting" -> Seq(
      ("round(quantile_cont(",
        "same sanctioned cents ×10 snap as q28")),
    "q59_interevent_gaps" -> Seq(
      ("round(quantile_cont(",
        "sanctioned ×2 snap: median of INTEGER microsecond gaps — the " +
          "interpolated midpoint is exactly .0 or .5, both engines land " +
          "on the same doubled integer")),
    "ml29_mad_anomaly" -> Seq(
      ("round(quantile_cont(",
        "sanctioned ×2 snap twice over: medians of INTEGER daily counts " +
          "and of integer doubled deviations — interpolated midpoints " +
          "are exactly .0/.5 on both engines (q59's recipe)")),
    "ml30_cusum_drift" -> Seq(
      ("round(quantile_cont(",
        "sanctioned ×2 snap: CUSUM target is the median of INTEGER " +
          "daily counts (ml29's recipe)")),
    "ml32_runs_test" -> Seq(
      ("round(quantile_cont(",
        "sanctioned ×2 snap: the runs-test split point is the median " +
          "of INTEGER daily counts (ml29's recipe); sign comparison " +
          "2y vs med2 is exact")),
    "ml33_theil_sen" -> Seq(
      ("round(quantile_cont(",
        "sanctioned ×2 snap: the Theil–Sen slope median runs over " +
          "INTEGER e6 slopes (sign-split exact quotients) — " +
          "interpolated midpoints are exactly .0/.5 (q59's recipe)")))

  private def findings(name: String, sql: String): Seq[String] = {
    val hits =
      roundOverAgg.findAllIn(sql).toSeq.map(m => s"round-over-agg: $m") ++
        aggOverFrac.findAllIn(sql).toSeq.map(m => s"agg-over-fractional: $m")
    val allowed = whitelist.getOrElse(name, Nil)
    hits.filterNot(h => allowed.exists { case (sub, _) => h.contains(sub) })
  }

  test("no oracled query rounds a float aggregate or aggregates a " +
    "fractional double column raw") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) => findings(name, sql).map(f => s"$name → $f")
    }
    assert(bad.isEmpty,
      s"\nrounding-boundary-class offenders (convert via graft.core.Fixed " +
        s"or whitelist with rationale):\n  ${bad.mkString("\n  ")}")
  }

  test("main source tree carries no round(float-aggregate idiom") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val srcRe =
      s"""(?s)round\\s*\\(\\s*($floatAggs)\\s*\\(""".r
    // the sanctioned cents ×10 percentile snap (see oracle whitelist):
    // strip its exact textual shape before scanning
    val snapRe =
      """(?s)round\(\s*(?:percentile|quantile_cont)\(\s*(?:CAST\(round\(\w+ \* 100\) AS BIGINT\)|\w+),\s*0\.\d+\)\s*\*\s*(?:2|10)\)""".r
    val bad = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val noComments = java.nio.file.Files.readString(p)
          .linesIterator.map(_.replaceAll("//.*$", "")).mkString("\n")
        val txt = snapRe.replaceAllIn(noComments, "SNAP")
        srcRe.findAllIn(txt).toSeq.map(m => s"$p → $m")
      }
      .toSeq
    assert(bad.isEmpty,
      s"\nround(float-agg in main sources:\n  ${bad.mkString("\n  ")}")
  }
}
