package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.expr.{DayPart, DistinctSketch}
import graft.ops.Profile

/** Queries exercising the engine's Catalyst extension points
  * (SURVEY §2.8/§7.3): the codegen'd `day_part` Expression, the
  * mergeable HLL `Aggregator`, and the sketch-based profile.
  */
object Extensions {

  /** e01 — the custom day_part Expression over event times, oracle-checked
    * against the equivalent CASE (proves the codegen path computes the
    * reference semantics of Main.scala:27-38 exactly). */
  val daypart: QueryDef = QueryDef(
    "e01_daypart_expr",
    (s, d) => {
      DayPart.register(s)
      Tables.events(s, d)
        .withColumn("hhmm",
          (hour(col("ts")) * 100 + minute(col("ts"))).cast("int"))
        .withColumn("day_part", expr("day_part(hhmm)"))
        .groupBy("day_part")
        // r12 sweep: cents before the sum (order-free), double derived.
        .agg(count(lit(1)).as("n"),
          (sum(expr("CAST(round(value * 100) AS BIGINT)")) / 100.0)
            .as("sum_value"))
        .orderBy("day_part")
    },
    Some(s"""SELECT ${DayPart.caseSql("hhmm")} AS day_part,
             count(*) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
               AS sum_value
             FROM (SELECT CAST(hour(ts) * 100 + minute(ts) AS INTEGER) AS hhmm,
                          value FROM events)
             GROUP BY day_part ORDER BY day_part"""))

  /** e02 — mergeable HLL distinct sketch vs exact, side by side. The
    * estimate is engine-specific (splitmix64/HLL) → rows-only check; the
    * ±1.6% accuracy bound is asserted in the test suite. */
  val sketch: QueryDef = QueryDef(
    "e02_distinct_sketch",
    (s, d) =>
      Tables.orders(s, d).agg(
        DistinctSketch.distinctSketch(col("o_custkey")).as("est_custkey"),
        countDistinct(col("o_custkey")).as("exact_custkey"),
        DistinctSketch.distinctSketch(col("o_orderkey")).as("est_orderkey"),
        countDistinct(col("o_orderkey")).as("exact_orderkey")),
    None)

  /** e03 — the 100 TB profile: approx_count_distinct, no Expand, no
    * distinct shuffle. Sketch values are engine-specific → rows-only. */
  val approxProfile: QueryDef = QueryDef(
    "e03_profile_approx",
    (s, d) => Profile.approx(Tables.lineitem(s, d)),
    None)

  /** e04 — the custom TopKPerKey PHYSICAL operator (LogicalPlan +
    * Strategy + bounded-heap exec, graft.plans.TopKPerKey), oracle-checked
    * against the window row_number semantics it replaces: proof that the
    * whole-operator extension point computes exactly the declared
    * semantics. */
  val topkOperator: QueryDef = QueryDef(
    "e04_topk_custom_operator",
    (s, d) =>
      graft.plans.TopKPerKey.topKPerKey(
          Tables.orders(s, d), Seq("o_custkey"), "o_totalprice",
          "o_orderkey", 3)
        .select(
          col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy("o_custkey", "o_orderkey"),
    Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price
            FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                    row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
                  FROM orders)
            WHERE rn <= 3 ORDER BY o_custkey, o_orderkey"""))

  /** e05 — KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et
    * al., "Counting distinct elements in a data stream", RANDOM 2002),
    * the ORACLE-EXACT counterpart of e02's HLL: the sketch is the k
    * smallest portable md5 hashes, so — unlike HLL register state — both
    * engines compute bit-identical estimates. est = (k−1)·2⁶⁰/h₍ₖ₎ when
    * ≥k distinct hashes exist, else the exact count; all factors are
    * exactly-rounded doubles and the one division is IEEE, so the DOUBLE
    * output hash-matches.
    *
    * Scale shape: per column one hash projection + partial-top-k
    * (TakeOrdered — map-side k-row heaps, never a global sort) and one
    * scalar distinct-count for the side-by-side comparison. k rows reach
    * the driver per column regardless of input size; sketches from
    * disjoint partitions of a 100 TB table union by re-taking the k
    * smallest (mergeability is what the spec's union law asserts). */
  val kmvSketch: QueryDef = {
    val K = 64
    def sparkOne(df: org.apache.spark.sql.DataFrame, c: String) = {
      val topk = df
        .select(expr(graft.ext.Dedup.sparkMd5Int60(s"CAST($c AS STRING)")).as("h"))
        .distinct()
        .orderBy("h").limit(K)
      val est = topk.agg(count(lit(1)).as("m"), max("h").as("hk"))
        .select(
          when(col("m") < K, col("m").cast("double"))
            .otherwise(expr(
              s"${K - 1}e0 * CAST(1152921504606846976 AS DOUBLE) / CAST(hk AS DOUBLE)"))
            .as("kmv_est"))
      val exact = df.agg(countDistinct(col(c)).as("exact"))
      est.crossJoin(exact).select(lit(c).as("col_name"), col("kmv_est"), col("exact"))
    }
    def duckOne(c: String) =
      s"""SELECT '$c' AS col_name,
            (SELECT CASE WHEN count(*) < $K THEN CAST(count(*) AS DOUBLE)
                    ELSE ${K - 1}e0 * CAST(1152921504606846976 AS DOUBLE)
                         / CAST(max(h) AS DOUBLE) END
             FROM (SELECT DISTINCT ${graft.ext.Dedup.duckMd5Int60(s"CAST($c AS VARCHAR)")} AS h
                   FROM orders ORDER BY 1 LIMIT $K)) AS kmv_est,
            (SELECT count(DISTINCT $c) FROM orders) AS exact"""
    QueryDef(
      "e05_kmv_distinct",
      (s, d) => {
        val o = Tables.orders(s, d)
        sparkOne(o, "o_custkey")
          .union(sparkOne(o, "o_orderpriority"))
          .orderBy("col_name")
      },
      Some(Seq("o_custkey", "o_orderpriority").map(duckOne)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")))
  }

  /** e06 — exact heavy hitters through a bounded-state sketch: the
    * Misra–Gries `Aggregator` (graft.expr.HeavyHitters, K=200 counters)
    * finds CANDIDATE tokens in one pass with O(K) state per partition,
    * then one group-by restricted to the candidate set confirms exact
    * counts and keeps tokens above 1% of the corpus. The MG
    * undercount bound (≤ N/(K+1) < N/100) guarantees no true heavy
    * hitter is missed, so the output is EXACT and oracle-checkable
    * against the plain GROUP BY ... HAVING — while at 100 TB the
    * group-by state is K tokens, not the open vocabulary.
    *
    * Same tokenization as t06 (split on single space). The threshold
    * joins in as a 1-row broadcast, not a driver constant. */
  val heavyHitters: QueryDef = QueryDef(
    "e06_heavy_hitters",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
      val summary = toks.agg(
        graft.expr.HeavyHitters.candidates(col("tok")).as("cands"),
        count(lit(1)).as("n_total"))
      toks.join(broadcast(summary))
        .filter(array_contains(col("cands"), col("tok")))
        .groupBy("tok", "n_total")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") * 100 > col("n_total"))
        .select("tok", "n")
        .orderBy(col("n").desc, col("tok"))
    },
    Some("""WITH toks AS (
              SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
            n AS (SELECT count(*) AS n_total FROM toks)
            SELECT tok, count(*) AS n
            FROM toks, n
            GROUP BY tok, n_total
            HAVING count(*) * 100 > n_total
            ORDER BY n DESC, tok"""))

  /** e07 — Q-digest quantile sketch (graft.expr.QuantileSketch): p50/
    * p90/p99 of document length in ONE mergeable aggregate — no global
    * sort, state bounded by the value universe, order- and
    * partitioning-independent by construction (exact bucket counts,
    * canonical one-shot compression). Alongside: the exact percentiles,
    * so the ≤ N/64 rank-error guarantee is visible in the output row.
    *
    * ORACLE-EXACT (r7, closing VERDICT r6 next-step #3): the digest is
    * a deterministic function of the leaf histogram, and the one-shot
    * compression has a load-bearing invariant that makes it
    * SQL-expressible — when level L is processed, level L+1 is still
    * EMPTY (pushes from level L−1 land at L, and within level L each
    * sibling pair touches only its own distinct parent), so the classic
    * (self + sibling + parent ≤ ⌊N/k⌋) test reduces to
    * (pair-sum ≤ ⌊N/k⌋): each level is one parallel pair-sum step. The
    * mirror below chains 16 such CTE steps (pair-sum ≤ thresh pushes
    * up, else both siblings survive into the digest), then replays the
    * rank walk as a cumulative sum in (upper-bound, level) order. The
    * error law is additionally ScalaCheck'd in QuantileSketchSpec, and
    * x15's exact-percentile family remains the exact-value twin. */
  val quantileSketch: QueryDef = {
    import graft.expr.QuantileSketch.{UniverseBits, Universe, K}
    // level step L: pair-sums at L; pairs ≤ thresh push their mass to
    // level L+1, pairs > thresh leave both present siblings in the
    // digest (k$L). Mass reaching level UniverseBits is never processed
    // (the Scala loop is `0 until UniverseBits`) and stays as-is.
    val steps = (0 until UniverseBits).map { l =>
      s"""p$l AS (SELECT idx // 2 AS pidx, CAST(sum(c) AS BIGINT) AS pc
               FROM d$l GROUP BY 1),
             k$l AS (SELECT d.idx, d.c FROM d$l d
               JOIN p$l p ON d.idx // 2 = p.pidx, t WHERE p.pc > t.thresh),
             d${l + 1} AS (SELECT pidx AS idx, pc AS c FROM p$l, t
               WHERE pc <= t.thresh)"""
    }.mkString(",\n             ")
    val digestUnion = ((0 until UniverseBits)
      .map(l => s"SELECT $l AS lvl, idx, c FROM k$l") :+
      s"SELECT $UniverseBits AS lvl, idx, c FROM d$UniverseBits")
      .mkString("\n               UNION ALL ")
    // rank walk: nodes in (upper bound, level) order — leaves first on
    // ties — accumulate until the target rank, report the upper bound.
    // acc is nondecreasing in the walk order, so min(hi) over the
    // crossing rows IS the first crossing node's bound.
    def est(q: String, alias: String) =
      s"""(SELECT min(hi) FROM ranked, t
               WHERE acc >= greatest(1, CAST(ceil($q * t.n) AS BIGINT))) AS $alias"""
    // Spark CAST(double AS BIGINT) truncates toward zero; n_chars ≥ 0
    // so floor() mirrors it (DuckDB's BIGINT cast would round)
    def exact(q: String, alias: String) =
      s"""(SELECT CAST(floor(quantile_cont(n_chars, $q)) AS BIGINT)
               FROM documents) AS $alias"""
    QueryDef(
      "e07_quantile_sketch",
      (s, d) => {
        Tables.documents(s, d).agg(
          graft.expr.QuantileSketch.quantileSketch(col("n_chars")).as("qs"),
          expr("CAST(percentile(n_chars, 0.5D) AS BIGINT)").as("exact_p50"),
          expr("CAST(percentile(n_chars, 0.9D) AS BIGINT)").as("exact_p90"),
          expr("CAST(percentile(n_chars, 0.99D) AS BIGINT)").as("exact_p99"))
          .select(
            expr("qs[0]").as("est_p50"), expr("qs[1]").as("est_p90"),
            expr("qs[2]").as("est_p99"),
            col("exact_p50"), col("exact_p90"), col("exact_p99"),
            expr("qs[3]").as("n"), expr("qs[4]").as("digest_nodes"))
      },
      Some(s"""WITH d0 AS (
                 SELECT CAST(CASE WHEN n_chars < 0 THEN 0
                     WHEN n_chars >= $Universe THEN ${Universe - 1}
                     ELSE n_chars END AS BIGINT) AS idx,
                   count(*) AS c
                 FROM documents GROUP BY 1),
               t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                   CAST(sum(c) // $K AS BIGINT) AS thresh FROM d0),
               $steps,
               digest AS (
                 $digestUnion),
               ranked AS (
                 SELECT (idx + 1) * (1 << lvl) - 1 AS hi, lvl, c,
                   CAST(sum(c) OVER (ORDER BY (idx + 1) * (1 << lvl) - 1, lvl
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS acc
                 FROM digest)
               SELECT
                 ${est("0.50", "est_p50")},
                 ${est("0.90", "est_p90")},
                 ${est("0.99", "est_p99")},
                 ${exact("0.5", "exact_p50")},
                 ${exact("0.9", "exact_p90")},
                 ${exact("0.99", "exact_p99")},
                 (SELECT n FROM t) AS n,
                 (SELECT count(*) FROM digest) AS digest_nodes"""))
  }

  /** e08 — Count-Min point-frequency sketch (graft.expr.CountMin): the
    * complement of e06's Misra-Gries (MG finds WHICH items are heavy;
    * CM answers "how often was THIS item seen") with W×D longs of
    * state and overestimate-only error. The corpus sketch is a 1-row
    * aggregate; the pinned probe list is then reported with sketch
    * estimate, exact count, and the overcount — the ≥-exact law
    * visible in the output. The probe strings are LITERALS, so their
    * D cell indices are pure driver-side arithmetic (no action): the
    * estimate is `least(element_at(sk, idx)…)` over the lazy sketch
    * column, which keeps the registry's lazy-build contract (ADVICE
    * r5: the previous form collected the sketch at DataFrame-
    * construction time, so plan-only consumers paid a corpus pass).
    * Cell placement is engine-independent but the estimates are
    * sketch-specific → rows-only, with e06 as the exact-twin for the
    * heavy end and the laws ScalaCheck'd in CountMinSpec. */
  val countMinProbe: QueryDef = QueryDef(
    "e08_countmin_sketch",
    (s, d) => {
      import graft.expr.CountMin.{W, D, cell, countMin}
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
      val sk = toks.agg(countMin(col("tok")).as("sk"))
      val probes = Seq("the", "and", "of", "to", "in")
      val est = sk
        .select(explode(array(probes.map { p =>
          val cells = (0 until D).map(r =>
            element_at(col("sk"), r * W + cell(p, r) + 1)) // 1-based
          struct(lit(p).as("tok"), least(cells: _*).as("est"))
        }: _*)).as("pe"))
        .select(col("pe.tok").as("tok"), col("pe.est").as("est"))
      val exact = toks.filter(col("tok").isin(probes: _*))
        .groupBy("tok").agg(count(lit(1)).as("exact"))
      est.join(exact, Seq("tok"), "left")
        .select(col("tok"), col("est"),
          coalesce(col("exact"), lit(0L)).as("exact"),
          (col("est") - coalesce(col("exact"), lit(0L))).as("overcount"))
        .orderBy("tok")
    },
    None)

  /** e08b — e08's ORACLE-EXACT twin: the same Count-Min point-frequency
    * semantics (D=4 rows × W=2048 cells, min over per-row counters,
    * overestimate-only) with the PORTABLE md5 hash family in place of
    * the engine-native seeded fold — `cell(r, tok) = md5int60('r:tok')
    * % W`, the d10/d11/e05 discipline. Everything is integer
    * arithmetic over both engines' identical md5, so the driver
    * hash-checks the sketch MATH end to end (e08 stays the fast
    * engine-native path whose 64-bit wrapping fold DuckDB cannot
    * express — DuckDB BIGINT overflow throws rather than wraps).
    *
    * Row independence here is the genuine Carter-Wegman argument: each
    * row keys md5 with a distinct prefix, so rows are independent
    * functions of the token — the property e08's per-row fold bases
    * approximate (CountMin.cell scaladoc).
    *
    * Scale shape: the sketch build IS the one corpus pass — explode
    * tokens ×D row-cells, one (row, cell) hash aggregate with map-side
    * combine into ≤ D·W groups; probes are a D·|P|-row broadcast side
    * of an equi-join. */
  val countMinMd5: QueryDef = {
    val Wm = 2048; val Dm = 4
    val probes = Seq("the", "and", "of", "to", "in")
    def sparkCell(tok: String, r: String) =
      s"${graft.ext.Dedup.sparkMd5Int60(s"concat($r, ':', $tok)")} % $Wm"
    def duckCell(tok: String, r: String) =
      s"${graft.ext.Dedup.duckMd5Int60(s"concat($r, ':', $tok)")} % $Wm"
    QueryDef(
      "e08b_countmin_md5",
      (s, d) => {
        import s.implicits._
        val toks = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("tok"))
        val cells = toks
          .select(explode(expr(
            s"transform(sequence(0, ${Dm - 1}), r -> " +
              s"struct(r AS r, CAST(${sparkCell("tok", "r")} AS BIGINT) AS cell))"))
            .as("rc"))
          .groupBy(col("rc.r").as("r"), col("rc.cell").as("cell"))
          .agg(count(lit(1)).as("c"))
        val probeCells = probes.flatMap(p =>
          (0 until Dm).map(r => (p, r))).toDF("tok", "r")
          .withColumn("cell", expr(sparkCell("tok", "r")).cast("long"))
        val est = probeCells.join(cells, Seq("r", "cell"), "left")
          .groupBy("tok")
          .agg(min(coalesce(col("c"), lit(0L))).as("est"))
        val exact = toks.filter(col("tok").isin(probes: _*))
          .groupBy("tok").agg(count(lit(1)).as("exact"))
        est.join(exact, Seq("tok"), "left")
          .select(col("tok"), col("est"),
            coalesce(col("exact"), lit(0L)).as("exact"),
            (col("est") - coalesce(col("exact"), lit(0L))).as("overcount"))
          .orderBy("tok")
      },
      Some(s"""WITH toks AS (
                 SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
               cells AS (
                 SELECT r, ${duckCell("tok", "r")} AS cell,
                   count(*) AS c
                 FROM toks, unnest(range(0, $Dm)) AS u(r)
                 GROUP BY 1, 2),
               pc AS (
                 SELECT p.tok, u.r, ${duckCell("p.tok", "u.r")} AS cell
                 FROM (VALUES ${probes.map(p => s"('$p')").mkString(", ")}) p(tok),
                   unnest(range(0, $Dm)) AS u(r)),
               est AS (
                 SELECT pc.tok,
                   CAST(min(coalesce(c.c, 0)) AS BIGINT) AS est
                 FROM pc LEFT JOIN cells c
                   ON c.r = pc.r AND c.cell = pc.cell
                 GROUP BY 1),
               ex AS (
                 SELECT tok, count(*) AS exact FROM toks
                 WHERE tok IN (${probes.map(p => s"'$p'").mkString(", ")})
                 GROUP BY 1)
               SELECT e.tok AS tok, e.est,
                 coalesce(ex.exact, 0) AS exact,
                 e.est - coalesce(ex.exact, 0) AS overcount
               FROM est e LEFT JOIN ex ON ex.tok = e.tok
               ORDER BY e.tok"""))
  }

  /** e02b — e02's ORACLE-EXACT twin: a PORTABLE raw HyperLogLog
    * (Flajolet, Fusy, Gandouet & Meunier, "HyperLogLog: the analysis of
    * a near-optimal cardinality estimation algorithm", AofA 2007) over
    * the md5 hash family, so — unlike e02's engine-internal register
    * state — both engines compute bit-identical estimates:
    *
    *  - h = md5int60(value); bucket = h % 256; rank of the remaining
    *    52 bits via `length(bin(v))` (identical no-leading-zeros
    *    semantics in Spark and DuckDB — no log2, no libm);
    *  - register fold in ascending-bucket order with terms
    *    `1.0 / (1 << mj)` — exact powers of two, so every addition
    *    rounds identically given the identical order;
    *  - α·m²/S with α written as the same literal expression
    *    (0.7213/(1.0+1.079/256.0)) in both engines.
    *
    * This is the RAW estimator — the small-range (linear-counting)
    * correction is deliberately NOT applied, because its `ln` would
    * reintroduce libm variance across engines; `n_zero_registers` is
    * emitted so a consumer can apply it, and e05's KMV (exact below
    * k distinct) is the registry's corrected-small-range tool. The
    * engine-native e02 keeps the fully-corrected estimate.
    *
    * Scale shape: per column one hash projection + a ≤256-group
    * aggregate (map-side combine) + a 1-row fold; the side-by-side
    * exact count is the same scalar broadcast as e05's. */
  val hllMd5: QueryDef = {
    val M = 256
    // every literal CAST to DOUBLE: Spark would otherwise parse these
    // as DECIMAL and compute a (24,16)-scale alpha that differs from
    // the IEEE-double value at the 9th digit — the identical expression
    // TEXT must also carry identical TYPES in both engines
    val alphaExpr = s"(CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) + " +
      s"CAST(1.079 AS DOUBLE) / CAST($M AS DOUBLE))) * CAST(${M * M} AS DOUBLE)"
    def sparkOne(df: org.apache.spark.sql.DataFrame, c: String) = {
      val regs = df
        .select(expr(graft.ext.Dedup.sparkMd5Int60(s"CAST($c AS STRING)")).as("h"))
        .select((col("h") % M).as("bucket"), expr(s"h DIV $M").as("v"))
        .groupBy("bucket")
        .agg(max(expr("IF(v = 0, 53, 53 - length(bin(v)))")).as("mj"))
      val est = regs
        .agg(count(lit(1)).as("np"),
          sort_array(collect_list(struct(col("bucket"), col("mj"))))
            .as("rl"))
        .select(
          expr(s"""$alphaExpr / aggregate(rl,
                CAST($M - np AS DOUBLE),
                (acc, x) -> acc + 1.0D /
                  CAST(shiftleft(CAST(1 AS BIGINT), x.mj) AS DOUBLE))""")
            .as("hll_est"),
          (lit(M) - col("np")).cast("long").as("n_zero_registers"))
      val exact = df.agg(countDistinct(col(c)).as("exact"))
      est.crossJoin(broadcast(exact))
        .select(lit(c).as("col_name"), col("hll_est"),
          col("n_zero_registers"), col("exact"))
    }
    def duckOne(c: String) = {
      val h = graft.ext.Dedup.duckMd5Int60(s"CAST($c AS VARCHAR)")
      s"""SELECT '$c' AS col_name,
            (SELECT $alphaExpr / list_reduce(
               list_prepend(CAST($M - count(*) AS DOUBLE),
                 list_transform(list(mj ORDER BY bucket),
                   m -> 1.0 / CAST((CAST(1 AS BIGINT) << m) AS DOUBLE))),
               (a, b) -> a + b)
             FROM (SELECT h % $M AS bucket,
                     max(CASE WHEN h // $M = 0 THEN 53
                         ELSE 53 - length(bin(h // $M)) END) AS mj
                   FROM (SELECT $h AS h FROM orders) GROUP BY 1)) AS hll_est,
            (SELECT CAST($M - count(DISTINCT ($h) % $M) AS BIGINT)
             FROM orders) AS n_zero_registers,
            (SELECT count(DISTINCT $c) FROM orders) AS exact"""
    }
    QueryDef(
      "e02b_hll_md5",
      (s, d) => {
        val o = Tables.orders(s, d)
        sparkOne(o, "o_custkey")
          .union(sparkOne(o, "o_orderkey"))
          .orderBy("col_name")
      },
      Some(Seq("o_custkey", "o_orderkey").map(duckOne)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")))
  }

  /** e09 — PORTABLE Bloom membership filter (Bloom, CACM 1970) over the
    * corpus token vocabulary, md5 hash family (the d10/e05/e08b
    * discipline): bit(i, tok) = md5int60(i || ':' || tok) % M for K=3
    * probe functions over M=65536 bits. The set-bit table is built in
    * ONE distinct-aggregate pass and both engines compute identical
    * bits, so — unlike x18's engine-private `spark.util.sketch`
    * BloomFilter, which stays the fast native decontamination path —
    * the filter MATH is oracle-checked end to end: membership verdicts,
    * true presence, and the false-positive flags all hash-match.
    *
    * The one-sided error law (no false negatives — a present token can
    * never probe to a missing bit, by construction the K build bits of
    * every corpus token are set) is asserted for every probe in both
    * engines via the `present=1 → might_contain=1` column pair, and the
    * spec checks it over the whole planted vocabulary.
    *
    * Scale shape: the build is one token explode → ≤ M-row distinct
    * (map-side combining to a bounded 0.5 MB bit set); probes join
    * against the broadcast bit table. At 100 TB the bit set is the
    * mergeable per-shard sketch a coordinator ORs together — position
    * sets merge by union exactly as the distinct here does. */
  val bloomMd5: QueryDef = {
    val M = 65536; val K = 3
    val probes = Seq("the", "and", "of", "qqxzabsent1", "qqxzabsent2")
    def sparkBit(tok: String, i: String) =
      s"${graft.ext.Dedup.sparkMd5Int60(s"concat($i, ':', $tok)")} % $M"
    def duckBit(tok: String, i: String) =
      s"${graft.ext.Dedup.duckMd5Int60(s"concat($i, ':', $tok)")} % $M"
    QueryDef(
      "e09_bloom_md5",
      (s, d) => {
        import s.implicits._
        val toks = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("tok")).distinct()
        val bits = toks.select(explode(expr(
          s"transform(sequence(0, ${K - 1}), i -> " +
            s"CAST(${sparkBit("tok", "i")} AS BIGINT))")).as("bit"))
          .distinct()
        val pb = probes.flatMap(p => (0 until K).map(i => (p, i)))
          .toDF("tok", "i")
          .withColumn("bit", expr(sparkBit("tok", "i")).cast("long"))
        val might = pb
          .join(broadcast(bits.withColumn("s", lit(1))), Seq("bit"), "left")
          .groupBy("tok")
          .agg((count(col("s")) === K).cast("int").as("might_contain"))
        val pres = toks.filter(col("tok").isin(probes: _*))
          .withColumn("p", lit(1))
        might.join(broadcast(pres), Seq("tok"), "left")
          .select(col("tok"), col("might_contain"),
            coalesce(col("p"), lit(0)).as("present"),
            (col("might_contain") * (lit(1) - coalesce(col("p"), lit(0))))
              .as("false_positive"))
          .orderBy("tok")
      },
      Some(s"""WITH toks AS (
                 SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
                 FROM documents),
               bits AS (
                 SELECT DISTINCT ${duckBit("tok", "u.i")} AS bit
                 FROM toks, unnest(range(0, $K)) AS u(i)),
               pb AS (
                 SELECT p.tok, u.i, ${duckBit("p.tok", "u.i")} AS bit
                 FROM (VALUES ${probes.map(p => s"('$p')").mkString(", ")})
                   p(tok),
                   unnest(range(0, $K)) AS u(i)),
               might AS (
                 SELECT pb.tok,
                   CAST(CASE WHEN count(b.bit) = $K THEN 1 ELSE 0 END
                     AS INTEGER) AS might_contain
                 FROM pb LEFT JOIN bits b ON b.bit = pb.bit
                 GROUP BY 1),
               pres AS (
                 SELECT tok, 1 AS p FROM toks
                 WHERE tok IN (${probes.map(p => s"'$p'").mkString(", ")}))
               SELECT m.tok, m.might_contain,
                 CAST(coalesce(pres.p, 0) AS INTEGER) AS present,
                 CAST(m.might_contain * (1 - coalesce(pres.p, 0))
                   AS INTEGER) AS false_positive
               FROM might m LEFT JOIN pres ON pres.tok = m.tok
               ORDER BY m.tok"""))
  }

  /** e10 — AMS second-frequency-moment (F₂) sketch (Alon, Matias &
    * Szegedy, "The space complexity of approximating the frequency
    * moments", STOC 1996) over the corpus token stream, md5 sign family
    * (the e05/e08b/e09 portable discipline): R=16 estimator rows, row r
    * assigns every token a ±1 sign from md5int60(r‖':'‖tok)%2, keeps
    * Z_r = Σ_tok sign·count, and estimates F₂ = Σ_tok count² as Z_r².
    * The output carries each row's Z and Z², the exact F₂, the 16-row
    * mean, and the classic median-of-4-means — ALL deterministic 64-bit
    * integer arithmetic (plus three exactly-representable IEEE ops:
    * /16, /4, and the midpoint of two doubles), so — completing the
    * oracle-checked sketch family HLL/KMV/Misra-Gries/Q-digest/
    * Count-Min/Bloom — estimator math hash-matches DuckDB end to end.
    *
    * F₂ is the self-join size: for a training corpus it measures token
    * (or shingle) concentration — the quantity that predicts hot-key
    * skew in every shuffle over this column and the candidate-pair
    * volume of shingle-join dedup (d04/d12) BEFORE running it.
    *
    * Scale shape: one token hash-aggregate (map-side combined,
    * vocab-bounded — d08's fingerprint discipline), then a 16× explode
    * of the BOUNDED count table, never of the corpus; the Z buffer is
    * 16 longs, mergeable by addition across shards (Z is a plain sum),
    * which is the whole AMS point: a coordinator adds per-shard Z
    * vectors and squares once. The two 1-row summary frames broadcast
    * (whitelisted scalar pattern). */
  val amsF2: QueryDef = {
    val R = 16
    val sparkSign =
      s"IF(${graft.ext.Dedup.sparkMd5Int60("concat(CAST(r AS STRING), ':', tok)")} % 2 = 0, 1L, -1L)"
    val duckSign =
      s"CASE WHEN ${graft.ext.Dedup.duckMd5Int60("concat(CAST(u.r AS VARCHAR), ':', tok)")} % 2 = 0 THEN 1 ELSE -1 END"
    QueryDef(
      "e10_ams_f2",
      (s, d) => {
        val cnts = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("cnt"))
        val perRow = cnts
          .select(col("tok"), col("cnt"),
            explode(expr(s"sequence(0, ${R - 1})")).as("ri"))
          .select(col("tok"), col("cnt"), col("ri").cast("long").as("r"))
          .groupBy("r")
          .agg(sum(expr(sparkSign) * col("cnt")).as("z"))
          .withColumn("est", col("z") * col("z"))
        val exact = cnts.agg(sum(col("cnt") * col("cnt")).as("f2_exact"))
        val summary = perRow.agg(
          (sum(col("est")).cast("double") / R).as("ams_mean"))
        val mom = perRow
          .groupBy(expr("r DIV 4").as("g"))
          .agg((sum(col("est")).cast("double") / 4).as("m"))
          .agg(expr("percentile(m, 0.5D)").as("ams_mom"))
        perRow
          .crossJoin(broadcast(exact))
          .crossJoin(broadcast(summary))
          .crossJoin(broadcast(mom))
          .select(col("r"), col("z"), col("est"), col("f2_exact"),
            col("ams_mean"), col("ams_mom"))
          .orderBy("r")
      },
      Some(s"""WITH cnt AS (
                 SELECT tok, count(*) AS cnt
                 FROM (SELECT unnest(string_split(text, ' ')) AS tok
                       FROM documents)
                 GROUP BY tok),
               zr AS (
                 SELECT u.r,
                   CAST(sum(($duckSign) * cnt) AS BIGINT) AS z
                 FROM cnt, unnest(range(0, $R)) AS u(r)
                 GROUP BY u.r),
               est AS (SELECT r, z, z * z AS est FROM zr),
               ex AS (SELECT CAST(sum(cnt * cnt) AS BIGINT) AS f2_exact
                      FROM cnt),
               mn AS (SELECT CAST(sum(est) AS DOUBLE) / $R AS ams_mean
                      FROM est),
               gm AS (SELECT r // 4 AS g,
                        CAST(sum(est) AS DOUBLE) / 4 AS m
                      FROM est GROUP BY 1),
               md AS (SELECT quantile_cont(m, 0.5) AS ams_mom FROM gm)
               SELECT est.r, est.z, est.est, ex.f2_exact,
                 mn.ams_mean, md.ams_mom
               FROM est, ex, mn, md
               ORDER BY est.r"""))
  }

  /** e11 — KMV set ALGEBRA (Beyer et al., "On synopses for distinct-
    * value estimation under multiset operations", SIGMOD 2007): union,
    * intersection, and Jaccard estimates between the token sets of two
    * disjoint corpus splits, from one bounded KMV synopsis per side.
    * e05 estimates |A| from one sketch; the 2007 result is that the
    * same k-smallest-hashes synopsis COMPOSES: the k smallest of
    * S_A ∪ S_B is exactly the KMV sketch of A ∪ B (so est_union is
    * e05's estimator on the merged sketch), and the fraction ρ of that
    * merged sketch present in BOTH side sketches estimates the Jaccard,
    * giving est_inter = ρ · est_union. When the merged sketch holds
    * fewer than k hashes, both side sketches are complete sets and
    * every output degrades to the exact value — the same CASE both
    * engines compute.
    *
    * ORACLE-EXACT like e05: hashes are the portable md5-int60, sketch
    * contents are deterministic (k smallest distinct values), counts
    * are integers, and each estimate does its divisions in the same
    * IEEE order in both engines. The exact union/intersection/Jaccard
    * ride along side-by-side so the estimator error is visible in the
    * output row (and in production would be dropped — they, not the
    * sketches, are the full-shuffle cost).
    *
    * Scale shape: per side a map-side k-row heap (TakeOrdered after a
    * hash-distinct), never a global sort; merging two sketches is a
    * TakeOrdered over 2k rows; all algebra happens on ≤3k rows. At
    * 100 TB per-shard sketches union associatively the same way —
    * that mergeability is the point of the construction. */
  val kmvSetAlgebra: QueryDef = {
    val K = 64
    val B = "CAST(1152921504606846976 AS DOUBLE)" // 2^60, the hash range
    def estSql(m: String, hk: String) =
      s"CASE WHEN $m < $K THEN CAST($m AS DOUBLE) " +
        s"ELSE ${K - 1}e0 * $B / CAST($hk AS DOUBLE) END"
    val jaccSql =
      "CASE WHEN m_u = 0 THEN 0e0 " +
        "ELSE CAST(n_both AS DOUBLE) / CAST(m_u AS DOUBLE) END"
    val exJaccSql =
      "CASE WHEN exact_union = 0 THEN 0e0 " +
        "ELSE CAST(exact_inter AS DOUBLE) / CAST(exact_union AS DOUBLE) END"
    QueryDef(
      "e11_kmv_set_algebra",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(
            expr("substring(md5(CAST(doc_id AS STRING)), 1, 1) < '8'")
              .as("in_a"),
            explode(split(col("text"), " ")).as("tok"))
          .select(col("in_a"),
            expr(graft.ext.Dedup.sparkMd5Int60("tok")).as("h"))
        def sketch(side: org.apache.spark.sql.Column) =
          toks.filter(side).select("h").distinct().orderBy("h").limit(K)
        val sa = sketch(col("in_a")).localCheckpoint()
        val sb = sketch(!col("in_a")).localCheckpoint()
        val su = sa.union(sb).distinct().orderBy("h").limit(K)
        val uagg = su
          .join(sa.withColumn("fa", lit(1)), Seq("h"), "left")
          .join(sb.withColumn("fb", lit(1)), Seq("h"), "left")
          .agg(count(lit(1)).as("m_u"), max("h").as("hk_u"),
            coalesce(sum(when(col("fa") === 1 && col("fb") === 1, 1L)),
              lit(0L)).as("n_both"))
        val aagg = sa.agg(count(lit(1)).as("m_a"), max("h").as("hk_a"))
        val bagg = sb.agg(count(lit(1)).as("m_b"), max("h").as("hk_b"))
        val ex = toks.groupBy("h")
          .agg(
            max(when(col("in_a"), 1).otherwise(0)).as("a"),
            max(when(!col("in_a"), 1).otherwise(0)).as("b"))
          .agg(
            sum("a").cast("long").as("exact_a"),
            sum("b").cast("long").as("exact_b"),
            count(lit(1)).as("exact_union"),
            sum(when(col("a") === 1 && col("b") === 1, 1L).otherwise(0L))
              .cast("long").as("exact_inter"))
        uagg.crossJoin(aagg).crossJoin(bagg).crossJoin(ex)
          .withColumn("est_a", expr(estSql("m_a", "hk_a")))
          .withColumn("est_b", expr(estSql("m_b", "hk_b")))
          .withColumn("est_union", expr(estSql("m_u", "hk_u")))
          .withColumn("est_jaccard", expr(jaccSql))
          .withColumn("est_inter", expr("est_jaccard * est_union"))
          .withColumn("exact_jaccard", expr(exJaccSql))
          .select("est_a", "exact_a", "est_b", "exact_b",
            "est_union", "exact_union", "est_inter", "exact_inter",
            "est_jaccard", "exact_jaccard")
      },
      Some(s"""WITH toks AS (
                 SELECT substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8' AS in_a,
                        unnest(string_split(text, ' ')) AS tok
                 FROM documents),
               hs AS (SELECT in_a, ${graft.ext.Dedup.duckMd5Int60("tok")} AS h
                      FROM toks),
               sa AS (SELECT DISTINCT h FROM hs WHERE in_a ORDER BY h LIMIT $K),
               sb AS (SELECT DISTINCT h FROM hs WHERE NOT in_a ORDER BY h LIMIT $K),
               su AS (SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb) u
                      ORDER BY h LIMIT $K),
               uagg AS (
                 SELECT CAST(count(*) AS BIGINT) AS m_u, max(su.h) AS hk_u,
                   CAST(coalesce(sum(CASE WHEN sa.h IS NOT NULL
                     AND sb.h IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_both
                 FROM su LEFT JOIN sa ON su.h = sa.h
                   LEFT JOIN sb ON su.h = sb.h),
               aagg AS (SELECT CAST(count(*) AS BIGINT) AS m_a, max(h) AS hk_a
                        FROM sa),
               bagg AS (SELECT CAST(count(*) AS BIGINT) AS m_b, max(h) AS hk_b
                        FROM sb),
               sides AS (SELECT h,
                   max(CASE WHEN in_a THEN 1 ELSE 0 END) AS a,
                   max(CASE WHEN in_a THEN 0 ELSE 1 END) AS b
                 FROM hs GROUP BY h),
               ex AS (SELECT
                   CAST(sum(a) AS BIGINT) AS exact_a,
                   CAST(sum(b) AS BIGINT) AS exact_b,
                   CAST(count(*) AS BIGINT) AS exact_union,
                   CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS exact_inter
                 FROM sides),
               est AS (SELECT *,
                   ${estSql("m_a", "hk_a")} AS est_a,
                   ${estSql("m_b", "hk_b")} AS est_b,
                   ${estSql("m_u", "hk_u")} AS est_union,
                   $jaccSql AS est_jaccard
                 FROM uagg, aagg, bagg, ex)
               SELECT est_a, exact_a, est_b, exact_b,
                 est_union, exact_union,
                 est_jaccard * est_union AS est_inter, exact_inter,
                 est_jaccard, $exJaccSql AS exact_jaccard
               FROM est"""))
  }

  /** e12 — moments synopsis (the Moments Sketch, Gan et al., VLDB
    * 2018): per group keep (n, Σx, Σx², Σx³, min, max) — a constant-size,
    * PERFECTLY mergeable summary (plain addition merges partials, the
    * property that makes it the cheapest distributed-quantile /
    * distribution synopsis: map-side combine does all the work, the
    * shuffle carries 6 longs per group). Derived here: exact mean and
    * the exact population variance as the integer rational
    * (n·Σx² − (Σx)²) / n² — numerator and denominator are exact longs,
    * ONE IEEE division at the end.
    *
    * Determinism: l_quantity is integer-valued (1..50, FIXTURES.md), so
    * every power sum is an exact long — no float accumulation anywhere;
    * x³ ≤ 1.25e5 · n keeps Σx³ far under 2⁶³ at any realistic group
    * size. Overflow guard at 100 TB: Σx³ < 2⁶³ needs n < 7.4e13 rows
    * per group — beyond that the sums move to DECIMAL(38,0), same
    * algebra.
    *
    * Scale shape: ONE partial-aggregated groupBy — identical to q02's
    * plan; the synopsis columns are what a rollup service would store
    * and merge across shards without touching rows again. */
  val momentsSketch: QueryDef = QueryDef(
    "e12_moments_sketch",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity").cast("long").as("x"))
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("m1"),
          sum(col("x") * col("x")).as("m2"),
          sum(col("x") * col("x") * col("x")).as("m3"),
          min(col("x")).as("x_min"),
          max(col("x")).as("x_max"))
        .select(col("l_returnflag"), col("n"), col("m1"), col("m2"),
          col("m3"), col("x_min"), col("x_max"),
          round(col("m1").cast("double") / col("n").cast("double"), 6)
            .as("mean"),
          round((col("n") * col("m2") - col("m1") * col("m1")).cast("double")
            / (col("n") * col("n")).cast("double"), 6).as("variance"))
        .orderBy("l_returnflag"),
    Some("""WITH a AS (
              SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x
              FROM lineitem),
            g AS (
              SELECT l_returnflag, count(*) AS n,
                CAST(sum(x) AS BIGINT) AS m1,
                CAST(sum(x * x) AS BIGINT) AS m2,
                CAST(sum(x * x * x) AS BIGINT) AS m3,
                min(x) AS x_min, max(x) AS x_max
              FROM a GROUP BY 1)
            SELECT l_returnflag, n, m1, m2, m3, x_min, x_max,
              round(CAST(m1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
              round(CAST(n * m2 - m1 * m1 AS DOUBLE) /
                    CAST(n * n AS DOUBLE), 6) AS variance
            FROM g ORDER BY l_returnflag"""))

  /** e13 — KMV size/accuracy sweep (the sketch-SIZING table: KMV's
    * relative error is ~1/√(k−2) (Bar-Yossef et al., RANDOM 2002;
    * Beyer et al., SIGMOD 2007 unbiased form), and every capacity
    * plan trades that k against state — this op measures the actual
    * error at k ∈ {4, 8, 16, 32} against the exact count in ONE pass,
    * the nested-prefix trick of t33 applied to sketch sizes: the
    * k-minimum set is a PREFIX of the 32-minimum set, so one bottom-32
    * gives every smaller sketch for free).
    *
    * Determinism: md5-portable hashes; the k-th minimum is the rank-k
    * row of the bottom-32 frame; estimates are one fixed-shape IEEE
    * expression rounded to integers; error in exact ppm.
    *
    * Scale shape: one distinct-hash agg, then a map-side TakeOrdered
    * 32 — the 100 TB cost is the distinct agg (key-keyed);
    * everything after runs on a 32-row frame (bounded rank window). */
  val kmvSizeSweep: QueryDef = {
    val ks = Seq(4, 8, 16, 32)
    val estExpr =
      "CAST(round(CAST(k - 1 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE) " +
        "/ CAST(hk AS DOUBLE)) AS BIGINT)"
    QueryDef(
      "e13_kmv_size_sweep",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val keys = Tables.lineitem(s, d)
          .selectExpr("CAST(l_orderkey AS STRING) AS tok")
        val bottom = keys
          .select(expr(graft.ext.Dedup.sparkMd5Int60("tok")).as("h"))
          .distinct().orderBy("h").limit(ks.max)
        val ranked = bottom
          .withColumn("k", row_number().over(Window.orderBy("h")))
          .filter(col("k").isin(ks: _*))
          .select(col("k").cast("long").as("k"), col("h").as("hk"))
        val exact = keys.agg(countDistinct(col("tok")).as("exact"))
        ranked.crossJoin(broadcast(exact))
          .withColumn("kmv_est", expr(estExpr))
          .withColumn("err_ppm",
            expr("(1000000 * abs(kmv_est - exact)) DIV exact"))
          .select("k", "hk", "exact", "kmv_est", "err_ppm")
          .orderBy("k")
      },
      Some(s"""WITH tf AS (
                 SELECT CAST(l_orderkey AS VARCHAR) AS tok FROM lineitem),
               hs AS (
                 SELECT DISTINCT ${graft.ext.Dedup.duckMd5Int60("tok")} AS h
                 FROM tf),
               bot AS (
                 SELECT h, CAST(row_number() OVER (ORDER BY h) AS BIGINT)
                   AS k
                 FROM (SELECT h FROM hs ORDER BY h LIMIT ${ks.max})),
               ex AS (
                 SELECT CAST(count(DISTINCT tok) AS BIGINT) AS exact
                 FROM tf)
               SELECT k, h AS hk, exact,
                 CAST(round(CAST(k - 1 AS DOUBLE)
                   * CAST(1152921504606846976 AS DOUBLE)
                   / CAST(h AS DOUBLE)) AS BIGINT) AS kmv_est,
                 (1000000 * abs(CAST(round(CAST(k - 1 AS DOUBLE)
                   * CAST(1152921504606846976 AS DOUBLE)
                   / CAST(h AS DOUBLE)) AS BIGINT) - exact)) // exact
                   AS err_ppm
               FROM bot CROSS JOIN ex
               WHERE k IN (${ks.mkString(", ")})
               ORDER BY k"""))
  }

  /** e14 — Bloom filter sizing sweep (the m-bits pricing table next to
    * e13's KMV-size sweep: Bloom 1970's analysis says FPR ≈
    * (1−e^{−kn/m})^k, but the operational question — "what FPR does MY
    * key set at THIS size actually give" — is measurable exactly): the
    * e09 md5 filter built ONCE at m = 65536 prices every power-of-two
    * size below it, because bit sets NEST under the modulus
    * (4096 | 65536 ⇒ h mod 4096 = (h mod 65536) mod 4096 — the e13
    * prefix-nesting trick in modular form); observed FPR comes from a
    * 200-token synthetic probe panel with presence checked EXACTLY
    * against the vocabulary (never assumed absent).
    *
    * Determinism: md5 bit family (e09), set cardinalities, integer
    * ppm. Scale shape: one vocab explode to the ≤m-row bit set
    * (map-side distinct, localCheckpoint'd for its three consumers /
    * MATERIALIZED in the mirror); everything per-size runs on ≤65536
    * rows. The sweep is how a 100 TB decontamination filter is sized
    * before it ships (x18's production path). */
  val bloomFprSweep: QueryDef = {
    val Ms = Seq(16384, 65536, 262144)
    val K = 3
    val P = 200
    def sparkBit(tok: String, i: String) =
      s"${graft.ext.Dedup.sparkMd5Int60(s"concat($i, ':', $tok)")} % 262144"
    def duckBit(tok: String, i: String) =
      s"${graft.ext.Dedup.duckMd5Int60(s"concat($i, ':', $tok)")} % 262144"
    QueryDef(
      "e14_bloom_fpr_sweep",
      (s, d) => {
        import s.implicits._
        val keys = Tables.documents(s, d)
          .select(explode(expr(graft.ext.Dedup.shingleExpr("text")))
            .as("tok"))
          .distinct()
          .localCheckpoint()
        val nKeys = keys.agg(count(lit(1)).as("n_keys"))
        val bitsTop = keys.select(explode(expr(
          s"transform(sequence(0, ${K - 1}), i -> " +
            s"CAST(${sparkBit("tok", "i")} AS BIGINT))")).as("bit"))
          .distinct().localCheckpoint()
        val present = s.range(P)
          .select(concat(lit("qqxzfp"), col("id")).as("tok"))
          .join(keys, Seq("tok"), "left_semi")
          .agg(count(lit(1)).as("n_present"))
        val pb = s.range(P)
          .select(concat(lit("qqxzfp"), col("id")).as("tok"))
          .crossJoin(s.range(K).select(col("id").cast("int").as("i")))
          .withColumn("bitTop", expr(sparkBit("tok", "CAST(i AS STRING)"))
            .cast("long"))
        Ms.map { m =>
          val bm = bitsTop.select((col("bit") % m).as("bit")).distinct()
          val might = pb.withColumn("bit", col("bitTop") % m)
            .join(broadcast(bm.withColumn("s0", lit(1))), Seq("bit"), "left")
            .groupBy("tok")
            .agg((count(col("s0")) === K).cast("long").as("might"))
            // probes absent by construction - verified via n_present
            .agg(sum(col("might")).as("n_fp"))
          bm.agg(count(lit(1)).as("bits_set"))
            .crossJoin(might).crossJoin(nKeys).crossJoin(present)
            .select(lit(m.toLong).as("m_bits"), col("n_keys"),
              col("bits_set"),
              expr(s"(1000000 * bits_set) DIV $m").as("load_ppm"),
              (lit(P.toLong) - col("n_present")).as("n_absent"),
              col("n_fp"),
              expr(s"(1000000 * n_fp) DIV ($P - n_present)").as("fpr_ppm"))
        }.reduce(_ unionByName _).orderBy("m_bits")
      },
      Some {
        val perM = Ms.map { m =>
          s"""SELECT CAST($m AS BIGINT) AS m_bits,
                (SELECT n_keys FROM nk) AS n_keys,
                (SELECT CAST(count(DISTINCT bit % $m) AS BIGINT)
                 FROM bitstop) AS bits_set,
                (1000000 * (SELECT CAST(count(DISTINCT bit % $m) AS BIGINT)
                 FROM bitstop)) // $m AS load_ppm,
                (SELECT CAST($P - n_present AS BIGINT) FROM pres)
                  AS n_absent,
                (SELECT CAST(coalesce(sum(might), 0) AS BIGINT) FROM (
                   SELECT CASE WHEN count(b.bit) = $K THEN 1 ELSE 0 END
                     AS might
                   FROM pb LEFT JOIN
                     (SELECT DISTINCT bit % $m AS bit FROM bitstop) b
                     ON b.bit = pb.bitTop % $m
                   GROUP BY pb.tok)) AS n_fp,
                (1000000 * (SELECT CAST(coalesce(sum(might), 0) AS BIGINT)
                 FROM (
                   SELECT CASE WHEN count(b.bit) = $K THEN 1 ELSE 0 END
                     AS might
                   FROM pb LEFT JOIN
                     (SELECT DISTINCT bit % $m AS bit FROM bitstop) b
                     ON b.bit = pb.bitTop % $m
                   GROUP BY pb.tok)))
                  // (SELECT $P - n_present FROM pres) AS fpr_ppm"""
        }.mkString("\nUNION ALL\n")
        s"""WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS t FROM documents),
            keys AS MATERIALIZED (
              SELECT DISTINCT array_to_string(t[gi + 1:gi + 3], ' ') AS tok
              FROM toks, unnest(range(0, greatest(len(t) - 2, 1))) AS u(gi)),
            nk AS (SELECT CAST(count(*) AS BIGINT) AS n_keys FROM keys),
            bitstop AS MATERIALIZED (
              SELECT DISTINCT ${duckBit("tok", "u.ki")} AS bit
              FROM keys, unnest(range(0, $K)) AS u(ki)),
            pt AS (
              SELECT 'qqxzfp' || CAST(j AS VARCHAR) AS tok
              FROM unnest(range(0, $P)) AS t(j)),
            pres AS (
              SELECT CAST(count(*) AS BIGINT) AS n_present
              FROM pt JOIN keys USING (tok)),
            pb AS MATERIALIZED (
              SELECT pt.tok, u.ki,
                ${duckBit("pt.tok", "CAST(u.ki AS VARCHAR)")} AS bitTop
              FROM pt, unnest(range(0, $K)) AS u(ki))
            SELECT * FROM ($perM) ORDER BY m_bits"""
      })
  }

  val all: Seq[QueryDef] =
    Seq(daypart, sketch, approxProfile, topkOperator, kmvSketch, heavyHitters,
      quantileSketch, countMinProbe, countMinMd5, hllMd5, bloomMd5, amsF2,
      kmvSetAlgebra, momentsSketch, kmvSizeSweep, bloomFprSweep)
}
