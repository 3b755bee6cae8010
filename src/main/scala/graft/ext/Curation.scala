package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.QueryDef

/** Corpus-curation and reproducible-sampling operators — the pieces a
  * training-data pipeline needs between "raw corpus" and "training
  * shards" (SURVEY §2.9 extended surface).
  *
  * All four are oracle-exact: every source of randomness is replaced by
  * md5 over a stable key, which both Spark and DuckDB compute
  * identically (lowercase hex over UTF-8 bytes), so sampling decisions
  * are reproducible across engines, runs, and cluster sizes — the
  * property seeded RNG sampling (`rand(seed)`) does NOT have, since its
  * draw depends on partition layout.
  *
  * Scale notes:
  *  - hash-threshold sampling is a pure per-row filter: no shuffle, no
  *    sampler state, pushes down to a scan + filter;
  *  - entity-consistent sampling (all lineitems of a sampled order)
  *    falls out for free by hashing the ENTITY key, where seeded
  *    row-level sampling would tear entities apart;
  *  - stratified exact-k is one window per stratum (bounded output);
  *  - shard assignment is a map-side expression + one small agg.
  */
object Curation {

  /** Whitespace token count, one definition per dialect (used by x03,
    * x04, x07 — these two strings are a load-bearing cross-engine pair;
    * edit them together or hash-exactness silently breaks). */
  private val sparkTokCount = raw"size(split(trim(text), '\\s+'))"
  private val duckTokCount =
    """CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER)"""

  /** x01 — entity-consistent deterministic sampling: keep every lineitem
    * of the ~5.1% of orders whose md5(l_orderkey) falls under the
    * threshold ('00'..'0c' of 256 two-hex-char prefixes = 13/256).
    * Because membership is a function of the order key alone, the sample
    * is entity-closed (never a partial order) and identical on any
    * engine or partitioning. */
  val sampleEntityHash: QueryDef = QueryDef(
    "x01_sample_entity_hash",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(expr("substring(md5(CAST(l_orderkey AS STRING)), 1, 2) < '0d'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
            count(DISTINCT l_orderkey) AS n_orders,
            round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem
            WHERE substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 2) < '0d'
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** x02 — stratified exact-k reservoir: per (returnflag, linestatus)
    * stratum, the 20 rows with the smallest md5 over the unique row key.
    * Hash order is a uniform-but-deterministic permutation, so this IS a
    * k-reservoir sample — minus the nondeterminism. One bounded window
    * per stratum; strata counts are small so no skew concern. */
  val sampleStratifiedHash: QueryDef = {
    val rowKey =
      "md5(concat(CAST(l_orderkey AS STRING), ':', CAST(l_linenumber AS STRING)))"
    QueryDef(
      "x02_sample_stratified_hash",
      (s, d) => {
        val w = Window.partitionBy("l_returnflag", "l_linestatus")
          .orderBy(expr(rowKey), col("l_orderkey"), col("l_linenumber"))
        Tables.lineitem(s, d)
          .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 20)
          .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber")
          .orderBy("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber
              FROM (SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
                      row_number() OVER (PARTITION BY l_returnflag, l_linestatus
                        ORDER BY md5(concat(CAST(l_orderkey AS VARCHAR), ':',
                                            CAST(l_linenumber AS VARCHAR))),
                                 l_orderkey, l_linenumber) AS rn
                    FROM lineitem)
              WHERE rn <= 20
              ORDER BY 1, 2, 3, 4"""))
  }

  /** x03 — corpus curation: the canonical filter chain every LLM data
    * pipeline runs — quality gates (token count, punctuation ratio) +
    * keep only the exact-dedup survivor (min doc_id per identical text).
    * Text is dropped BEFORE the dedup shuffle: only (doc_id, fingerprint,
    * metrics) move, the d08 discipline. punct_ratio is one exact IEEE
    * division, identical on both engines. Scope: ASCII text (the
    * documents fixture) — like t04, Spark's length() counts UTF-16 units
    * while DuckDB's counts codepoints, so astral-plane input would
    * diverge at the ratio gate. */
  val corpusCuration: QueryDef = QueryDef(
    "x03_corpus_curation",
    (s, d) => {
      val metered = Tables.documents(s, d).select(
        col("doc_id"),
        expr("md5(text)").as("fp"),
        expr(sparkTokCount).as("n_tokens"),
        // nullif guards the empty-text row: Spark 4 ANSI division would
        // throw DIVIDE_BY_ZERO where DuckDB NULL-filters; with nullif both
        // engines yield NULL and the ratio gate drops the row identically
        expr("CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '')) AS DOUBLE) / nullif(length(text), 0)")
          .as("punct_ratio"))
      val w = Window.partitionBy("fp")
      metered
        .withColumn("canonical_id", min(col("doc_id")).over(w))
        .filter(col("doc_id") === col("canonical_id") &&
          col("n_tokens") >= 5 && col("punct_ratio") < 0.2)
        .select("doc_id", "n_tokens", "punct_ratio")
        .orderBy("doc_id")
    },
    Some(s"""SELECT doc_id, n_tokens, punct_ratio
             FROM (SELECT doc_id,
                     $duckTokCount AS n_tokens,
                     CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                       / nullif(length(text), 0) AS punct_ratio,
                     min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
                   FROM documents)
             WHERE doc_id = canonical_id AND n_tokens >= 5 AND punct_ratio < 0.2
             ORDER BY doc_id"""))

  /** x04 — deterministic shard assignment: route each doc to one of 16
    * training shards by its md5 first hex char, report per-shard doc and
    * token totals. The hash is uniform, so shards balance without any
    * coordination — the property that lets 1000 writers emit shards
    * independently. Map-side expression + a 16-group agg. */
  val shardHash: QueryDef = QueryDef(
    "x04_shard_hash",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          expr("substring(md5(CAST(doc_id AS STRING)), 1, 1)").as("shard"),
          expr(sparkTokCount).as("n_tokens"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
        .orderBy("shard"),
    Some(s"""SELECT substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
             count(*) AS n_docs,
             CAST(sum($duckTokCount) AS BIGINT) AS total_tokens
             FROM documents GROUP BY 1 ORDER BY 1"""))

  /** x05 — salted two-phase aggregation as a registered, oracle-checked
    * query: `ops.Skew.saltedSum` fans the hot grouping keys over
    * saltFactor reducers (partial agg on (key, salt), final agg on key).
    * The salt is internal, so the result is salt-invariant and the
    * oracle is the plain GROUP BY — proving the skew path is
    * semantics-preserving, not just present. l_quantity is
    * integer-valued, so the double sums are exact in any accumulation
    * order. */
  val saltedAgg: QueryDef = QueryDef(
    "x05_salted_agg",
    (s, d) =>
      graft.ops.Skew.saltedSum(
        Tables.lineitem(s, d), "l_returnflag", "l_quantity")
        .withColumn("sum_l_quantity", round(col("sum_l_quantity"), 2))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_l_quantity
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** x06 — incremental dedup: an arriving batch (the fixture-pinned
    * first 250 doc_ids — a constant-size batch at every sf, while the
    * "existing" corpus doc_id ≥ 250 grows with sf: 250 rows at sf0.01,
    * 4 750 at sf0.1 — the steady-state shape) is admitted only if its
    * content fingerprint is absent from the existing corpus AND it is
    * the min-id survivor within the batch itself. This is d01/d08's
    * steady-state form — at 100 TB the "existing" side is a compact
    * fingerprint index (8-byte keys, no bodies), and the plan is one
    * anti equi-join plus one batch-local aggregate. The mirror uses
    * NOT EXISTS, not NOT IN: NOT IN's three-valued NULL semantics would
    * diverge from the anti-join if a fingerprint were ever NULL. */
  val incrementalDedup: QueryDef = QueryDef(
    "x06_incremental_dedup",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), expr("md5(text)").as("fp"))
      val batchMax = 250L // fixture-pinned batch: doc_ids [0, 250)
      val existing = docs.filter(col("doc_id") >= batchMax)
        .select("fp").distinct()
      val batch = docs.filter(col("doc_id") < batchMax)
      batch
        .join(existing, Seq("fp"), "left_anti")
        .groupBy("fp")
        .agg(min(col("doc_id")).as("admitted_id"),
          count(lit(1)).as("n_batch_copies"))
        .select("admitted_id", "n_batch_copies")
        .orderBy("admitted_id")
    },
    Some("""WITH docs AS (SELECT doc_id, md5(text) AS fp FROM documents),
            batch AS (SELECT * FROM docs WHERE doc_id < 250)
            SELECT min(doc_id) AS admitted_id, count(*) AS n_batch_copies
            FROM batch b
            WHERE NOT EXISTS (
              SELECT 1 FROM docs e WHERE e.doc_id >= 250 AND e.fp = b.fp)
            GROUP BY fp ORDER BY admitted_id"""))

  /** x07 — reproducible train/eval split by content-independent hash:
    * md5(doc_id) < threshold ⇒ eval (~12.5%), else train. Unlike
    * `randomSplit(seed)`, membership is a pure row function —
    * partitioning, cluster size, and engine cannot change it, which is
    * what makes 100 TB experiment reruns comparable. Reported as
    * per-split doc/token totals. */
  val hashSplit: QueryDef = QueryDef(
    "x07_hash_split",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          expr("CASE WHEN substring(md5(CAST(doc_id AS STRING)), 1, 1) " +
            "IN ('0', '1') THEN 'eval' ELSE 'train' END").as("split"),
          expr(sparkTokCount).as("n_tokens"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
        .orderBy("split"),
    Some(s"""SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                         IN ('0', '1') THEN 'eval' ELSE 'train' END AS split,
             count(*) AS n_docs,
             CAST(sum($duckTokCount) AS BIGINT) AS total_tokens
             FROM documents GROUP BY 1 ORDER BY 1"""))

  val all: Seq[QueryDef] =
    Seq(sampleEntityHash, sampleStratifiedHash, corpusCuration, shardHash,
      saltedAgg, incrementalDedup, hashSplit)
}
