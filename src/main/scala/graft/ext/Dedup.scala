package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}

import graft.core.Tables
import graft.queries.QueryDef

/** Deduplication operators over `documents` / `embeddings` (the
  * training-data-pipeline surface): exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale shapes:
  *  - exact dedup: one hash aggregate on the dedup key — the cheapest
  *    possible shuffle, AQE-coalesced;
  *  - MinHash/SimHash/LSH: candidate generation via hashing so the
  *    pairwise comparison never touches the full n² space — the 100 TB
  *    path. The n-gram-Jaccard and cosine all-pairs forms are the exact
  *    small-scale baselines the approximate paths are validated against
  *    in tests (bounded inputs only).
  */
object Dedup {

  /** d01 — exact dedup by content hash-aggregate. The canonical survivor
    * is min(doc_id): deterministic, unlike dropDuplicates' arbitrary-row
    * semantics (which the library still exposes via [[exactDropDuplicates]]). */
  val exact: QueryDef = QueryDef(
    "d01_dedup_exact",
    (s, d) =>
      Tables.documents(s, d)
        .groupBy("text")
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
        .select("canonical_id", "n_copies")
        .orderBy("canonical_id"),
    Some("""SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
            FROM documents GROUP BY text ORDER BY canonical_id"""))

  /** Plain `dropDuplicates` form (arbitrary survivor — used where survivor
    * identity doesn't matter; not oracle-comparable for that reason). */
  def exactDropDuplicates(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** d08 — hash-keyed exact dedup: group on a 64-bit content fingerprint
    * instead of the full text — the at-scale d01 (shuffling 8-byte keys,
    * not document bodies; collision odds ~n²/2^61 under the mod-prime
    * rolling hash). Same mirrored hash as t04, so fully oracle-checked. */
  val exactByFingerprint: QueryDef = QueryDef(
    "d08_dedup_fingerprint",
    (s, d) =>
      Tables.documents(s, d)
        .selectExpr("doc_id",
          "aggregate(split(text, ''), 0L, (acc, ch) -> (acc * 31 + ascii(ch)) % 1000000007) AS fp")
        .groupBy("fp")
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
        .select("canonical_id", "n_copies")
        .orderBy("canonical_id"),
    Some("""WITH f AS (
              SELECT doc_id,
                list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_transform(range(1, length(text) + 1),
                                   i -> CAST(ascii(text[i]) AS BIGINT))),
                  (acc, ch) -> (acc * 31 + ch) % 1000000007) AS fp
              FROM documents)
            SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
            FROM f GROUP BY fp ORDER BY canonical_id"""))

  /** Word 3-gram shingle array for a text column (empty-safe).
    *
    * r15 optimization (guide §1.2 "per-task work"): the token array is
    * LET-BOUND via a one-element outer `transform` so `split` runs
    * once per ROW. The previous form referenced `split($textCol)`
    * inside the position lambda, and Catalyst does not hoist
    * loop-invariant expressions out of higher-order-function lambdas —
    * the text was re-split once per gram position, O(L²) tokenization
    * per document. Measured at sf0.1 (noop sink, 32 cores): the
    * explode+hash pass over documents dropped 1.48 s → 0.60 s.
    * Output is bit-identical (same grams, same order). */
  def shingleExpr(textCol: String): String =
    s"transform(array(split($textCol, ' ')), t -> " +
      "transform(sequence(0, greatest(size(t) - 3, 0)), " +
      "i -> concat_ws(' ', slice(t, i + 1, 3))))[0]"

  /** d02 — MinHash+LSH fuzzy dedup (Broder, "On the resemblance and
    * containment of documents", SEQUENCES 1997): shingle → binary hashed term vector →
    * MinHash signatures → LSH band-bucket candidate join with exact
    * Jaccard distance on candidates only. Seeded, deterministic; no SQL
    * oracle (hash-family dependent) → rows-only check. */
  val minhash: QueryDef = QueryDef(
    "d02_dedup_minhash",
    (s, d) => {
      // fan-out before the 2^18-dim featurization pass: the single-file
      // scan gives this CPU-heavy map stage one task (r15, guide §2.5)
      val docs = Tables.fanOutForCpu(
          Tables.documents(s, d).select("doc_id", "text"), col("doc_id"))
        .withColumn("shingles", expr(shingleExpr("text")))
      val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
        .setNumFeatures(1 << 18).setBinary(true)
      // cache: the 2^18-dim featurization pass feeds the LSH fit AND
      // both sides of approxSimilarityJoin — uncached, the shingle +
      // hashing scan re-runs three times (this is the corpus-sized work;
      // everything after it is candidate-sized)
      val vecs = tf.transform(docs).select("doc_id", "features").cache()
      val mh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
        .setNumHashTables(4).setSeed(42)
      val model = mh.fit(vecs)
      val out = model.approxSimilarityJoin(vecs, vecs, 0.95, "jaccard_dist")
        .select(
          col("datasetA.doc_id").as("a_id"),
          col("datasetB.doc_id").as("b_id"),
          col("jaccard_dist"))
        .filter(col("a_id") < col("b_id"))
        .orderBy("a_id", "b_id")
        .localCheckpoint() // pair-sized; lets the featurization cache go
      vecs.unpersist()
      out
    },
    None)

  /** Engine-native MinHash+LSH — the same Broder scheme as d02 but
    * expressed entirely in Catalyst expressions instead of spark.ml's
    * 2^18-dim sparse vectors: 16 xxhash64 min-signatures per doc, banded
    * 4×4 for candidates (equi join on (band, value)), exact Jaccard via
    * array_intersect on the candidate pairs only. Same shape at 100 TB:
    * linear signature pass + equi shuffle, never all-pairs.
    *
    * The signature frame is materialized via localCheckpoint (see below);
    * checkpointed RDDs are GC-reclaimed, so repeated invocations leak no
    * session-lifetime cache entries. */
  def minhashNativePairs(
      docs: DataFrame,
      maxJaccardDist: Double,
      maxBucketSize: Int = 64): DataFrame = {
    // cached: the shingle pass (regex tokenize + distinct — the most
    // expensive linear pass) feeds the signature aggregate AND both
    // sides of the final candidate join; uncached it runs three times
    // (measured ~2× slower end-to-end).
    // Hashed-shingle representation: each word is string-hashed ONCE,
    // then each 3-shingle is the xxhash64 of its 3 word-hashes — so the
    // pass does #words string hashes instead of building and hashing a
    // concat'd string per shingle POSITION (~3× the string work), and
    // every downstream step (signature family, exact-Jaccard
    // array_intersect, the cache itself) operates on 8-byte longs, not
    // strings. Jaccard over distinct hashed shingles equals Jaccard over
    // distinct string shingles modulo hash collisions, which can only
    // perturb a pair's estimated distance — never create a blowup. The
    // two transforms stay in SEPARATE projections (wh referenced twice →
    // CollapseProject won't inline the split per shingle position).
    val shingled = Tables.fanOutForCpu(
        docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"),
        expr("transform(split(text, ' '), x -> xxhash64(x))").as("wh"))
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(0, greatest(size(wh) - 3, 0)), " +
          "i -> xxhash64(slice(wh, i + 1, 3))))").as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 16 min-signatures via ONE explode + hash-aggregate (partial-agg,
    // whole-stage codegen): per shingle-hash long, 16 seeded long
    // hashes — no string ever reaches the signature aggregate.
    val sigCols = (0 until 16).map(i =>
      min(xxhash64(col("h"), lit(i))).as(s"sig_$i"))
    // Materialized eagerly (own job): four downstream branches (band
    // explode, bucket-size cap, dup-rep agg, dup-cluster join) consume
    // the signature frame inside ONE action; a lazy cache races its own
    // concurrent scans there (measured slower), and exchange reuse alone
    // re-runs the post-shuffle agg per consumer. The frame is #docs × 17
    // longs — tiny relative to the exploded shingle pass it seals off —
    // and checkpointed RDDs are GC-reclaimed, so nothing leaks.
    val sigs = shingled
      .select(col("doc_id"), explode(col("sh")).as("h"))
      .groupBy("doc_id")
      .agg(sigCols.head, sigCols.tail: _*)
      .localCheckpoint()
    val sigNames = (0 until 16).map(i => s"sig_$i")
    val bandCols = (0 until 4).map(b =>
      struct(lit(b).as("band"),
        xxhash64((0 until 4).map(r => col(s"sig_${b * 4 + r}")): _*).as("bv"))
        .as(s"b$b"))
    val bands = sigs
      .select(col("doc_id"), array(bandCols: _*).as("bands"))
      .select(col("doc_id"), explode(col("bands")).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bv").as("bv"))

    // Mega-bucket cap (standard LSH hygiene): on homogeneous corpora the
    // globally-minimal shingles dominate the min-signatures, collapsing
    // most docs into a few buckets whose pairing is quadratic noise.
    // Computed as a partial-aggregated groupBy count + broadcast anti
    // join — NOT an unordered window, which would buffer each mega-bucket
    // in one task just to discard it.
    val bigBuckets = bands.groupBy("band", "bv")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > maxBucketSize)
      .select("band", "bv")
    val kept = bands.join(broadcast(bigBuckets), Seq("band", "bv"), "left_anti")

    // The cap would also drop duplicate CLUSTERS bigger than the cap
    // (identical docs share every band — their only buckets ARE the mega
    // ones). Recover them linearly: group identical full signatures and
    // pair each member with the min-id representative (n−1 pairs per
    // cluster, transitively complete, never n²/2). The group/join key is
    // xxhash64 over all 16 signatures — an 8-byte shuffle key instead of
    // the 128-byte raw tuple. A key collision merges two UNRELATED dup
    // clusters under one representative: the foreign cross-pairs are
    // discarded by the exact-Jaccard filter below, and the smaller
    // cluster's intra-pairs are then lost IF its members were also
    // mega-bucket-capped out of the banded path — an accepted ~2⁻⁶⁴
    // failure mode (per pair of clusters), traded for the 16× smaller
    // recovery shuffle.
    val keyed = sigs.withColumn("sigkey",
      xxhash64(sigNames.map(col): _*))
    val dupReps = keyed.groupBy("sigkey")
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select("sigkey", "rep")
    val dupClusters = keyed.join(dupReps, "sigkey")
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("a_id"), col("doc_id").as("b_id"))

    // ids-only banded candidates; shingle arrays re-join AFTER distinct
    val a = kept.select(col("doc_id").as("a_id"), col("band"), col("bv"))
    val b = kept.select(col("doc_id").as("b_id"), col("band"), col("bv"))
    val cand = a.join(b, Seq("band", "bv"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .union(dupClusters)
      .distinct()
    val sa = shingled.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val sb = shingled.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    val out = cand.join(sa, "a_id").join(sb, "b_id")
      .withColumn("n_inter", expr("size(array_intersect(a_sh, b_sh))"))
      .withColumn("jaccard_dist", expr(
        "1.0 - CAST(n_inter AS DOUBLE) / (size(a_sh) + size(b_sh) - n_inter)"))
      .filter(col("jaccard_dist") < maxJaccardDist)
      .select("a_id", "b_id", "jaccard_dist")
    // pair list is candidate-bounded (small); materialize it so the
    // corpus-scale shingle cache can be dropped before returning —
    // repeated invocations (bench warmup + timed runs) leak no entries
    val materialized = out.localCheckpoint()
    shingled.unpersist()
    materialized
  }

  /** d06 — the native-expression MinHash path as a registered query
    * (rows-only: hash-family specific, like d02). */
  val minhashNative: QueryDef = QueryDef(
    "d06_dedup_minhash_native",
    (s, d) => minhashNativePairs(Tables.documents(s, d), 0.95)
      .orderBy("a_id", "b_id"),
    None)

  /** 64-bit SimHash (Charikar, "Similarity estimation techniques from
    * rounding algorithms", STOC 2002) per document: xxhash64 each token, per-bit ±1 votes,
    * sign-pack into a long. One explode + one aggregate — linear at scale. */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val hashed = toks.select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val voteCols = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$i")
    }
    val votes = hashed.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
    val packed = (0 until 64).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    votes.select(col("doc_id"), packed.as("simhash"))
  }

  /** Banded SimHash near-dup candidates — the 100 TB path: each 64-bit
    * signature splits into 4×16-bit bands; only pairs colliding on at
    * least one band bucket are compared (equi shuffle on (band, value),
    * never all-pairs). Guaranteed recall for hamming ≤ 3 (pigeonhole);
    * approximate above. Output ⊆ the exact all-pairs result. */
  def simhashBandedPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sh = simhash(docs)
    val bands = sh.select(col("doc_id"), col("simhash"),
      explode(expr(
        "transform(sequence(0, 3), b -> struct(b AS band, " +
          "shiftright(simhash, b * 16) & 65535 AS bv))")).as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    val a = bands.select(col("doc_id").as("a_id"), col("simhash").as("a_sh"),
      col("band"), col("bv"))
    val b = bands.select(col("doc_id").as("b_id"), col("simhash").as("b_sh"),
      col("band"), col("bv"))
    a.join(b, Seq("band", "bv")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_sh", "b_sh").distinct()
      .withColumn("hamming", expr("bit_count(a_sh ^ b_sh)"))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** Multi-probe banded SimHash pairs — EXACT at the covered radius,
    * candidate generation a pure equi-join (the r10 VERDICT fix for
    * d03's all-pairs BroadcastNestedLoopJoin).
    *
    * Scheme (multi-index Hamming search, Norouzi et al. "Fast Search
    * in Hamming Space with Multi-Index Hashing", CVPR 2012): split the
    * signature into `nBands` disjoint `bandBits`-bit bands; for radius
    * ≤ 2·nBands − 1 the pigeonhole gives SOME band with ≤ 1 differing
    * bit, so probing each band's value XOR {0, each single bit} —
    * bandBits + 1 probe keys per band — guarantees a (band, value)
    * equi-collision for every qualifying pair. Candidates are then
    * hamming-filtered exactly, so output EQUALS the all-pairs result
    * at `maxHamming` (asserted in DedupSpec against brute force).
    *
    * Scale shape: probe fan-out is a CONSTANT nBands·(bandBits+1) rows
    * per doc (68 for 4×16-bit bands) into a (band, value) equi-join
    * over 2^bandBits buckets per band — d09's shuffle shape with a
    * bounded row multiplier, never a nested loop. The banded frame is
    * localCheckpointed because it feeds both join sides (d11's
    * signatures-table discipline: 4 rows/doc × ~32 B, text never
    * enters). Skewed buckets (mass-duplicated content) get the d06/d10
    * mega-bucket treatment upstream if needed — at the fixture scales
    * every bucket is tiny. */
  def multiProbePairs(sh: DataFrame, bandBits: Int, nBands: Int,
      maxHamming: Int): DataFrame = {
    require(maxHamming <= 2 * nBands - 1,
      s"probe radius 1 over $nBands bands covers hamming <= ${2 * nBands - 1}")
    val m = (1L << bandBits) - 1
    val masks = (Seq(0L) ++ (0 until bandBits).map(1L << _)).mkString(",")
    val bands = sh.select(col("doc_id"), col("simhash"),
      explode(expr(
        s"transform(sequence(0, ${nBands - 1}), b -> struct(b AS band, " +
          s"shiftright(simhash, b * $bandBits) & $m AS bv))")).as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
      .localCheckpoint()
    val probes = bands.select(col("doc_id").as("a_id"),
        col("simhash").as("a_sh"), col("band"),
        explode(expr(s"transform(array($masks), mm -> bv ^ mm)")).as("bv"))
    val exacts = bands.select(col("doc_id").as("b_id"),
      col("simhash").as("b_sh"), col("band"), col("bv"))
    probes.join(exacts, Seq("band", "bv"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_sh", "b_sh").distinct()
      .withColumn("hamming", expr("bit_count(a_sh ^ b_sh)"))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** d03 — SimHash near-dup pairs at Hamming ≤ 7 via [[multiProbePairs]]
    * over the 64-bit xxhash64 signature (4×16-bit bands, 68 probe keys
    * per doc).
    *
    * CONTRACT RESTATED in round 11 (VERDICT r10 ask #1): the original
    * radius-16 form required an all-pairs BroadcastNestedLoopJoin —
    * 3.47× growth per data doubling, the suite's one scale-killer — and
    * radius 16 of 64 bits is not coverable by bounded banding (17 bands
    * would leave 3-4-bit bands whose buckets collapse). Radius 7 is the
    * largest multi-probe-coverable radius for 4 bands at probe radius 1,
    * and the output is EXACT at that radius (not a candidate subset):
    * equal to brute-force all-pairs, asserted in DedupSpec. d09 stays
    * the probe-free banded form (exact at ≤ 3); d21 is the md5-portable
    * oracle-exact twin of THIS shape at the same radius. */
  val simhashPairs: QueryDef = QueryDef(
    "d03_dedup_simhash",
    (s, d) => multiProbePairs(simhash(Tables.documents(s, d)), 16, 4, 7)
      .orderBy("a_id", "b_id"),
    None)

  /** Jaccard threshold shared by d04 (pair list) and d07 (components). */
  val ngramTheta = 0.20

  /** Shared DuckDB CTE chain producing near-dup `pairs(a_id, b_id,
    * jaccard)` under word-3-gram Jaccard ≥ theta — the SQL mirror of
    * [[ngramJaccard]]'s plan, reused by the d07 oracle.
    *
    * The heavy CTEs carry AS MATERIALIZED (the g19/g20 recipe, r13 ask
    * #5): `sh` is referenced THREE times (sizes + both join sides) and
    * `pairs` twice by every recursive consumer — DuckDB inlines
    * multi-ref CTEs, re-running the shingle explode per reference,
    * which is what pushed x53's sf1.0 mirror past the probe timeout
    * (9× faster at sf0.1 materialized, byte-identical results). */
  def ngramPairSql(theta: Double): String =
    s"""toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        sh AS MATERIALIZED (
          SELECT DISTINCT doc_id, array_to_string(t[i + 1:i + 3], ' ') AS sh
          FROM toks, unnest(range(0, greatest(len(t) - 2, 1))) AS u(i)),
        sizes AS MATERIALIZED (
          SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        inter AS MATERIALIZED (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS MATERIALIZED (
          SELECT a_id, b_id,
            CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
          FROM inter
          JOIN sizes sa ON sa.doc_id = a_id
          JOIN sizes sb ON sb.doc_id = b_id
          WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter)
            >= $theta)"""

  /** The d04 pair plan, un-materialized and un-ordered: `(a_id, b_id,
    * jaccard)` under word-3-gram Jaccard ≥ [[ngramTheta]]. Shared by the
    * registered d04 query (which adds the presentation ORDER BY) and by
    * [[ngramSharedStage]] (which materializes it once per bench/verify
    * session for the composition queries).
    *
    * Shingles are hashed to 8-byte keys BEFORE the distinct/join shuffles
    * (the d08 discipline: fingerprints move, bodies don't) — set sizes and
    * intersections are hash-collision-exact (~n_shingles²/2⁶⁵ error
    * probability, zero observed at any sf). The oracle deliberately stays
    * on RAW shingles: DuckDB cannot compute xxhash64, and hashing there
    * with its own hash() would collapse a DIFFERENT collision set — same
    * mismatch risk, less interpretable. A collision thus surfaces as a
    * hard oracle diff (the honest signal); the portable-md5 twins
    * (d10/d11) are the shared-hash verification path. */
  def ngramPairPlan(s: SparkSession, d: String): DataFrame = {
    val sh = Tables.fanOutForCpu(
        Tables.documents(s, d).select("doc_id", "text"), col("doc_id"))
      .select(col("doc_id"), explode(expr(shingleExpr("text"))).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("sh"))
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("doc_id").as("a_id"), col("sh"))
    val b = sh.select(col("doc_id").as("b_id"), col("sh"))
    val inter = a.join(b, Seq("sh")).filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_inter"))
    val sa = sizes.select(col("doc_id").as("a_id"), col("n_sh").as("n_a"))
    val sb = sizes.select(col("doc_id").as("b_id"), col("n_sh").as("n_b"))
    inter.join(sa, "a_id").join(sb, "b_id")
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= ngramTheta)
      .select("a_id", "b_id", "jaccard")
  }

  /** d04 — word-3-gram Jaccard near-dup via shingle inverted index:
    * explode distinct shingles, self-join on shingle (equi — shuffles on
    * the shingle key, never materializes n² pairs), count intersections,
    * Jaccard = |∩| / (|A|+|B|−|∩|). Unrounded: both engines do the same
    * int→double division. Plan body in [[ngramPairPlan]]. */
  val ngramJaccard: QueryDef = QueryDef(
    "d04_dedup_ngram_jaccard",
    (s, d) => ngramPairPlan(s, d).orderBy("a_id", "b_id"),
    Some(s"""WITH ${ngramPairSql(ngramTheta)}
             SELECT a_id, b_id, jaccard FROM pairs ORDER BY a_id, b_id"""))

  /** Session-memoized materialization of the shared near-dup stage —
    * d04's pair frame and d07's CC label frame, `localCheckpoint`ed ONCE
    * per (session, data dir) and consumed by every composition query that
    * layers on the stage (x12 fuzzy-dedup pipeline, x19 leakage-safe
    * split, x28 release pipeline, x34 canonical selection). Before this,
    * each of those queries re-ran the shingle-explode pair join AND the
    * star-contraction CC loop from scratch — x34 was the most expensive
    * suite line purely on recomputed upstream stages (VERDICT r9 #1).
    *
    * The canonical operators d04/d07 still build their own
    * un-materialized plans: they ARE the stage's plan documentation
    * (PLANS.txt captures the real shuffle shape from them), and a focused
    * bench of either still times the real work. The compositions consume
    * the materialized copy — which is the production pattern anyway: a
    * curation pipeline materializes the pair table once and every
    * downstream pass (dedup accounting, split assignment, canonical
    * selection) reads it, rather than re-shingling 100 TB four times.
    *
    * Memory/lifecycle: both frames are bounded by docs that HAVE a
    * near-dup (a small fraction of any corpus — orders of magnitude under
    * the corpus itself); entries are keyed by the owning SparkSession, so
    * a new session never sees another session's blocks, and checkpoint
    * blocks die with their session — cache entries are evicted on
    * applicationEnd ([[graft.core.SessionScoped]]), and the sf dir is
    * assumed immutable for the session (SessionScoped's staleness
    * contract). */
  private[graft] val ngramStageCache =
    new graft.core.SessionScoped[(DataFrame, DataFrame)]()

  def ngramSharedStage(s: SparkSession, d: String): (DataFrame, DataFrame) =
    ngramStageCache.getOrCompute(s, d)({ case (ss, dir) =>
      // jaccard rides along (16 bytes/pair) so score-consuming
      // compositions (x47's audit sample) share the stage too
      val pairs = ngramPairPlan(ss, dir)
        .select("a_id", "b_id", "jaccard").localCheckpoint()
      val labels = connectedComponents(pairs.select("a_id", "b_id"))
        .localCheckpoint()
      (pairs, labels)
    })

  /** CC labels `(id, component)` from the shared stage. */
  def ngramSharedLabels(s: SparkSession, d: String): DataFrame =
    ngramSharedStage(s, d)._2

  /** Scored pairs `(a_id, b_id, jaccard)` from the shared stage. */
  def ngramSharedPairs(s: SparkSession, d: String): DataFrame =
    ngramSharedStage(s, d)._1

  /** Sequential left-fold dot product / squared norm as expression text —
    * the SAME accumulation order DuckDB's mirrored list_reduce uses, so
    * doubles match bit-for-bit. */
  def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
  def norm2Expr(a: String): String =
    s"aggregate($a, 0D, (acc, x) -> acc + x * x)"

  /** Unit-normalization over an `emb` (array<double>) column, carrying
    * `keep` through: the norm fold runs ONCE per row (not per pair), so
    * downstream pair stages are a single codegen'd dot product each.
    * The fold order is the load-bearing cross-engine contract — this is
    * the ONE Spark-side definition (s01/d05/s04 all come through here);
    * [[unitNormSql]] is its one DuckDB mirror. */
  def unitized(df: DataFrame, keep: Seq[Column], uAs: String): DataFrame =
    df.withColumn("nrm", sqrt(expr(norm2Expr("emb"))))
      .select(keep :+ expr("transform(emb, x -> x / nrm)").as(uAs): _*)

  /** Unit-normalized double embedding column. */
  def normalized(s: SparkSession, d: String, idAs: String, vecAs: String): DataFrame =
    unitized(
      // fan-out (r15, guide §2.5): every consumer does per-row vector
      // arithmetic (dots against centroid/query panels), and the
      // single-row-group fixture scan pinned all of it to one task.
      // All 25 consumers are exact fixed-point/total-order ops, so the
      // result is partition-independent; a no-op on a parallel scan.
      Tables.fanOutForCpu(
        Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("emb")),
        col("vec_id")),
      Seq(col("vec_id").as(idAs)), vecAs)

  /** DuckDB `n`/`u` CTE pair: unit-normalize `emb` from CTE `src`,
    * carrying `extraCols` (", col" list or "") — the single mirror of
    * [[unitized]]'s fold order.
    *
    * The mirror uses DuckDB's native `list_dot_product` rather than an
    * interpreted `list_reduce` lambda fold: both are a sequential
    * left-to-right double accumulation from 0.0 (the same order as the
    * Spark-side `aggregate(..)` fold), verified bit-identical on every
    * sf0.01 pair AND string-render-identical on all ~2M sf0.1 pairs
    * before the swap. The native loop is ~20× faster, which is what
    * keeps the quadratic pair mirrors (d05/d13) inside the oracle
    * timeout at sf1.0 probe scale. */
  def unitNormSql(src: String, extraCols: String): String =
    s"""n AS (SELECT vec_id$extraCols, emb,
               sqrt(list_dot_product(emb, emb)) AS nrm
             FROM $src),
       u AS (SELECT vec_id$extraCols, list_transform(emb, x -> x / nrm) AS u
             FROM n)"""

  /** Matching DuckDB CTEs (`e` raw → `u` unit-normalized). */
  val normalizedSql: String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       ${unitNormSql("e", "")}"""

  /** Pairwise dot of unit vectors, identical fold order both engines
    * (see [[unitNormSql]] for the native-function exactness argument). */
  val pairDotSql: String = "list_dot_product(a.u, b.u)"

  /** d05 — embedding-cosine near-dup pairs. All-pairs exact at fixture
    * scale (the pair stage is one codegen'd ArrayDot per pair); the
    * LSH-bucketed scale path is s02 (Similarity). */
  val embeddingCosine: QueryDef = {
    val theta = 0.40
    QueryDef(
      "d05_dedup_embedding",
      (s, d) => {
        graft.expr.ArrayDot.register(s)
        val a = normalized(s, d, "a_id", "a_u")
        val b = normalized(s, d, "b_id", "b_u")
        a.join(b, col("a_id") < col("b_id"))
          .withColumn("cos_sim", expr("array_dot(a_u, b_u)"))
          .filter(col("cos_sim") >= theta)
          .select("a_id", "b_id", "cos_sim")
          .orderBy("a_id", "b_id")
      },
      Some(s"""WITH $normalizedSql,
               p AS (
                 SELECT a.vec_id AS a_id, b.vec_id AS b_id, $pairDotSql AS cos_sim
                 FROM u a JOIN u b ON a.vec_id < b.vec_id)
               SELECT a_id, b_id, cos_sim FROM p WHERE cos_sim >= $theta
               ORDER BY a_id, b_id"""))
  }

  /** Connected components over near-dup pairs — turns pairwise matches
    * into dedup GROUPS (every member labeled with the smallest doc_id
    * reachable through the match graph — the step every dedup pipeline
    * needs between "pairs" and "keep one per group").
    *
    * Algorithm: alternating large-star / small-star contraction (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC 2014)
    * — converges in O(log² n) rounds vs O(diameter) for naive min-label
    * propagation, and each round is a pure edge-set rewrite:
    *
    *  - large-star: every node links its LARGER neighbors to the minimum
    *    of its neighborhood (incl. itself);
    *  - small-star: every node links itself and its smaller neighbors to
    *    the minimum of its smaller neighbors.
    *
    * Both steps preserve connectivity; the fixpoint is a star per
    * component centered on its minimum id, which IS the label assignment.
    *
    * Scale discipline (the 100 TB iterative-job rules):
    *  - ONE materialization job per round: the new edge set is
    *    `localCheckpoint`ed (truncating lineage so plan depth stays
    *    constant no matter how many rounds run), and convergence is an
    *    order-independent (count, hash-sum) fingerprint computed over the
    *    already-materialized blocks — a trivial second job, not a full
    *    `labels ⋈ next` equality join;
    *  - the input pair plan (often an expensive candidate join) is
    *    materialized exactly once up front;
    *  - the returned labels frame carries no cache entries — nothing for
    *    callers to unpersist (checkpointed RDDs are GC-reclaimed). */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    // materialize the (possibly expensive) pair plan once; nodes and
    // edges both derive from it
    val p = pairs.select(col("a_id"), col("b_id")).localCheckpoint()
    val nodes = p.select(col("a_id").as("id"))
      .union(p.select(col("b_id").as("id"))).distinct()
      .localCheckpoint()
    // canonical directed edges hi → lo; self-loops dropped
    var edges = p
      .select(greatest(col("a_id"), col("b_id")).as("u"),
        least(col("a_id"), col("b_id")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint()

    // order-independent edge-set fingerprint over materialized blocks
    // (bit_xor, not sum: ANSI mode makes a hash sum throw on overflow;
    // xor is overflow-free and collision-safe enough alongside the count
    // because the edge set is distinct)
    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    def largeStar(e: DataFrame): DataFrame = {
      val und = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = und.groupBy("u").agg(min(col("v")).as("mv"))
      und.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), least(col("mv"), col("u")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      // e is hi → lo, so every out-neighbor is a smaller neighbor
      val mins = e.groupBy("u").agg(min(col("v")).as("mv"))
      val j = e.join(mins, "u")
      j.select(col("v").as("u"), col("mv").as("v"))
        .union(j.select(col("u"), col("mv").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    var fp = fingerprint(edges)
    var iter = 0
    var converged = fp._1 == 0L // no edges: every node is its own star
    while (iter < maxIter && !converged) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      val nfp = fingerprint(next)
      converged = nfp == fp
      fp = nfp
      edges = next
      iter += 1
    }
    // silent non-convergence would mean silently WRONG groups (a real
    // component reported split) — fail loudly instead.
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds — " +
        "pathological structure; raise maxIter")
    // star sanity: at the fixpoint no node may be both a link source and
    // a link target (targets are component roots). Cheap on the converged
    // edge set; a violation means the contraction stalled short of stars.
    if (!edges.select("u").intersect(edges.select("v")).isEmpty)
      throw new IllegalStateException(
        "connectedComponents fixpoint is not a star forest — stalled " +
          "contraction; please report")
    nodes.join(
      edges.withColumnRenamed("u", "id").withColumnRenamed("v", "component"),
      Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** d07 — dedup groups: exact-Jaccard near-dup pairs (d04 semantics)
    * collapsed into components with a canonical min-id label.
    * Oracle-exact: the DuckDB mirror recomputes the same pair list and
    * takes its transitive closure with a recursive CTE (min reachable id
    * per node — deterministic, no hashing involved). */
  val components: QueryDef = QueryDef(
    "d07_dedup_components",
    (s, d) => {
      val pairs = ngramJaccard.build(s, d).select("a_id", "b_id")
      connectedComponents(pairs)
        .groupBy("component")
        .agg(count(lit(1)).as("n_members"))
        .orderBy("component")
    },
    Some(s"""WITH RECURSIVE ${ngramPairSql(ngramTheta)},
             edges AS (
               SELECT a_id AS src, b_id AS dst FROM pairs
               UNION
               SELECT b_id AS src, a_id AS dst FROM pairs),
             reach(id, r) AS (
               SELECT src, src FROM edges
               UNION
               SELECT e.src, reach.r FROM edges e
               JOIN reach ON reach.id = e.dst),
             labels AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
             SELECT component, count(*) AS n_members
             FROM labels GROUP BY component ORDER BY component"""))

  /** d09 — the banded-SimHash scale path as its own registered query.
    * maxHamming = 3 is the pigeonhole-exact radius for 4×16-bit bands
    * (3 differing bits can dirty at most 3 of the 4 bands), so at this
    * radius the banded output EQUALS the all-pairs result — asserted in
    * DedupSpec — while the plan stays an equi shuffle on (band, value). */
  val simhashBanded: QueryDef = QueryDef(
    "d09_dedup_simhash_banded",
    (s, d) => simhashBandedPairs(Tables.documents(s, d), 3)
      .orderBy("a_id", "b_id"),
    None)

  /** Portable 60-bit integer hash — the piece that makes d10/d11
    * oracle-exact: md5 hex chars 2-16 parsed as an integer. Both sides
    * verified bit-equal (md5('abc') → 370089762377648 on each). */
  def sparkMd5Int60(arg: String): String =
    s"CAST(conv(substring(md5($arg), 2, 15), 16, 10) AS BIGINT)"

  /** DuckDB mirror of [[sparkMd5Int60]]: hex-digit fold (DuckDB has no
    * hex-to-int conv built-in). */
  def duckMd5Int60(arg: String): String = duckMd5IntSlice(arg, 2, 15)

  /** Hex-digit fold over md5 chars [from, from+len) — the general form
    * behind [[duckMd5Int60]] and d10's second (56-bit) hash half. */
  def duckMd5IntSlice(arg: String, from: Int, len: Int): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range($from, ${from + len}),
            i -> CAST(strpos('0123456789abcdef',
              substring(md5($arg), i, 1)) - 1 AS BIGINT))),
          (a, d) -> a * 16 + d)"""

  /** Core of d10: md5-keyed MinHash pairs over an arbitrary documents
    * frame, with the same mega-bucket hygiene as d06: buckets larger
    * than maxBucketSize are dropped (their pairing is quadratic noise)
    * and duplicate clusters — whose only buckets ARE the mega ones — are
    * recovered linearly via identical-full-signature grouping (n−1 pairs
    * per cluster, never n²/2). Eagerly materialized (the pair list is
    * candidate-bounded) so the corpus-scale shingle cache never outlives
    * the call. */
  def minhashMd5Pairs(
      docs: DataFrame,
      numHashes: Int = 8,
      bandRows: Int = 4,
      theta: Double = 0.5,
      maxBucketSize: Int = 64): DataFrame = {
    require(numHashes % bandRows == 0, "bands must tile the signature")
    val shingled = Tables.fanOutForCpu(
        docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"),
        expr(s"array_distinct(${shingleExpr("text")})").as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE md5 per shingle, then the Carter-Wegman 2-universal family
    // h_k = a + k·b over its two halves (a: 60 bits from hex chars 2-16,
    // b: 56 bits from chars 17-30) — no overflow (7·2^56 + 2^60 < 2^63),
    // no per-k rehash, and pure arithmetic for the SQL mirror.
    val sigCols = (0 until numHashes).map(k =>
      min(expr(s"ha + $k * hb")).as(s"sig_$k"))
    // cached: sigs feeds THREE branches (banding, dup-rep aggregate, and
    // the dup-cluster join) — uncached, each branch would re-run the
    // md5+conv hash pass over the whole shingle set. One row per doc ×
    // numHashes longs, so the cache is corpus-count-sized, not
    // corpus-sized.
    val sigs = shingled
      .select(col("doc_id"), explode(col("sh")).as("s"))
      // ONE md5 evaluation per shingle, both integer halves sliced from
      // it — don't lean on codegen subexpression elimination for the
      // hottest expression in the query
      .select(col("doc_id"), md5(col("s")).as("m"))
      .select(col("doc_id"),
        expr("CAST(conv(substring(m, 2, 15), 16, 10) AS BIGINT)").as("ha"),
        expr("CAST(conv(substring(m, 17, 14), 16, 10) AS BIGINT)").as("hb"))
      .groupBy("doc_id")
      .agg(sigCols.head, sigCols.tail: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandCols = (0 until numHashes / bandRows).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",",
          (0 until bandRows).map(r => col(s"sig_${b * bandRows + r}")): _*)
          .as("bv")).as(s"b$b")
    }
    val bands = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bv").as("bv"))
    val bigBuckets = bands.groupBy("band", "bv")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > maxBucketSize)
      .select("band", "bv")
    val kept = bands.join(broadcast(bigBuckets), Seq("band", "bv"), "left_anti")
    // duplicate-cluster recovery (see d06): identical docs share every
    // band, so the cap would orphan clusters bigger than it
    val sigNames = (0 until numHashes).map(i => s"sig_$i")
    val dupReps = sigs.groupBy(sigNames.map(col): _*)
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(sigNames.map(col) :+ col("rep"): _*)
    val dupClusters = sigs.join(dupReps, sigNames)
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("a_id"), col("doc_id").as("b_id"))
    val a = kept.select(col("doc_id").as("a_id"), col("band"), col("bv"))
    val b = kept.select(col("doc_id").as("b_id"), col("band"), col("bv"))
    val cand = a.join(b, Seq("band", "bv"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .union(dupClusters)
      .distinct()
    val sa = shingled.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val sb = shingled.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    val out = cand.join(sa, "a_id").join(sb, "b_id")
      .withColumn("n_inter", expr("size(array_intersect(a_sh, b_sh))"))
      .withColumn("jaccard", expr(
        "CAST(n_inter AS DOUBLE) / (size(a_sh) + size(b_sh) - n_inter)"))
      .filter(col("jaccard") >= theta)
      .select("a_id", "b_id", "jaccard")
      .localCheckpoint()
    shingled.unpersist()
    sigs.unpersist()
    out
  }

  /** LSH band keys for an arbitrary documents frame — the index-build /
    * probe-build step of the incremental fuzzy-dedup pattern (x20's
    * band index, and its streaming form in StreamingSpec): `numHashes`
    * md5-keyed Carter-Wegman min-hashes banded `bandRows` per band, one
    * (doc_id, band, bv) row per document per band. Identical documents
    * share every band unconditionally, so an index probe on (band, bv)
    * can never miss an exact dup; near-dups surface with the standard
    * banded-LSH probability. */
  def bandKeys(docs: DataFrame, numHashes: Int, bandRows: Int): DataFrame = {
    require(numHashes % bandRows == 0, "bands must tile the signature")
    val shingled = Tables.fanOutForCpu(
        docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"),
        expr(s"array_distinct(${shingleExpr("text")})").as("sh"))
    val sigCols = (0 until numHashes).map(k =>
      min(expr(s"ha + $k * hb")).as(s"sig_$k"))
    val sigs = shingled
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), md5(col("s")).as("m"))
      .select(col("doc_id"),
        expr("CAST(conv(substring(m, 2, 15), 16, 10) AS BIGINT)").as("ha"),
        expr("CAST(conv(substring(m, 17, 14), 16, 10) AS BIGINT)").as("hb"))
      .groupBy("doc_id")
      .agg(sigCols.head, sigCols.tail: _*)
    val bandCols = (0 until numHashes / bandRows).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",",
          (0 until bandRows).map(r => col(s"sig_${b * bandRows + r}")): _*)
          .as("bv")).as(s"b$b")
    }
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bv").as("bv"))
  }

  /** DuckDB CTE chain mirroring [[minhashMd5Pairs]] over `input` (any
    * relation with doc_id + text), ending in `${p}pairs(a_id, b_id,
    * jaccard)`. ONE generator shared by the standalone d10 mirror and
    * the x62 composed-pipeline stage, so the two can never drift. */
  def minhashMd5PairsCte(input: String, K: Int, bandRows: Int,
      theta: Double, cap: Int, p: String = ""): String =
    s"""${p}toks AS (
         SELECT doc_id, string_split(text, ' ') AS t FROM $input),
       ${p}sh AS (
         SELECT DISTINCT doc_id, array_to_string(t[i + 1:i + 3], ' ') AS sh
         FROM ${p}toks, unnest(range(0, greatest(len(t) - 2, 1))) AS u(i)),
       ${p}hx AS (
         SELECT doc_id, sh,
           ${duckMd5Int60("sh")} AS ha,
           ${duckMd5IntSlice("sh", 17, 14)} AS hb
         FROM ${p}sh),
       ${p}sigs AS (
         SELECT doc_id, k, min(ha + k * hb) AS sig
         FROM ${p}hx, unnest(range(0, $K)) AS tk(k)
         GROUP BY 1, 2),
       ${p}bands AS (
         SELECT doc_id, k // $bandRows AS band,
           string_agg(CAST(sig AS VARCHAR), ',' ORDER BY k) AS bv
         FROM ${p}sigs GROUP BY 1, 2),
       ${p}bsz AS (SELECT band, bv, count(*) AS n
               FROM ${p}bands GROUP BY 1, 2),
       ${p}kept AS (SELECT ${p}bands.* FROM ${p}bands
                JOIN ${p}bsz USING (band, bv) WHERE ${p}bsz.n <= $cap),
       ${p}fullsig AS (
         SELECT doc_id,
           string_agg(CAST(sig AS VARCHAR), ',' ORDER BY k) AS fs
         FROM ${p}sigs GROUP BY 1),
       ${p}dupreps AS (
         SELECT fs, min(doc_id) AS rep FROM ${p}fullsig
         GROUP BY 1 HAVING count(*) > 1),
       ${p}dpairs AS (
         SELECT r.rep AS a_id, f.doc_id AS b_id
         FROM ${p}dupreps r JOIN ${p}fullsig f
           ON f.fs = r.fs AND f.doc_id <> r.rep),
       ${p}cand AS (
         SELECT DISTINCT a_id, b_id FROM (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id
           FROM ${p}kept a JOIN ${p}kept b
             ON a.band = b.band AND a.bv = b.bv
             AND a.doc_id < b.doc_id
           UNION ALL
           SELECT a_id, b_id FROM ${p}dpairs)),
       ${p}sizes AS (SELECT doc_id, count(*) AS n_sh
                     FROM ${p}sh GROUP BY 1),
       ${p}inter AS (
         SELECT c.a_id, c.b_id, count(*) AS n_inter
         FROM ${p}cand c
         JOIN ${p}sh a ON a.doc_id = c.a_id
         JOIN ${p}sh b ON b.doc_id = c.b_id AND b.sh = a.sh
         GROUP BY 1, 2),
       ${p}pairs AS (
         SELECT a_id, b_id,
           CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter)
             AS jaccard
         FROM ${p}inter
         JOIN ${p}sizes sa ON sa.doc_id = a_id
         JOIN ${p}sizes sb ON sb.doc_id = b_id
         WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter)
           >= $theta)"""

  /** d10 — ORACLE-EXACT MinHash LSH. d02/d06 are rows-only because
    * their hash family (spark.ml seeds / xxhash64) has no DuckDB
    * counterpart; this variant keys the Broder scheme on md5, which
    * both engines compute identically: one md5 per shingle split into
    * two integer halves (Spark `conv(substring(md5..), 16, 10)` ≡
    * DuckDB hex-digit fold, verified bit-equal), expanded to 8 hashes
    * by the Carter-Wegman family h_k = a + k·b. 8 signatures, banded
    * 2×4; band key is the comma-joined signature slice (pure string
    * equality on both engines); candidates from the band equi-join only
    * — never all-pairs, with the d06 mega-bucket cap and dup-cluster
    * recovery — then exact Jaccard on candidates. The whole chain, cap
    * included, is mirrored in SQL, so the driver hash-checks the
    * complete LSH pipeline, not just a pair count. */
  val minhashMd5: QueryDef = {
    val K = 8; val bandRows = 4; val theta = 0.5; val cap = 64
    QueryDef(
      "d10_dedup_minhash_md5",
      (s, d) => minhashMd5Pairs(Tables.documents(s, d), K, bandRows, theta, cap)
        .orderBy("a_id", "b_id"),
      Some(s"""WITH ${minhashMd5PairsCte("documents", K, bandRows, theta, cap)}
               SELECT a_id, b_id, jaccard FROM pairs
               ORDER BY a_id, b_id"""))
  }

  /** 60-bit SimHash over the md5 token hash — the oracle-portable
    * sibling of [[simhash]] (which uses xxhash64, engine-specific).
    * Same Charikar scheme: per-token hash, per-bit ±1 votes, sign-pack. */
  def simhashMd5(docs: DataFrame): DataFrame = {
    // The 60 vote sums stay FUSED inside the aggregate (each computes
    // its ±1 on the fly from `h`): the alternative — pre-projecting 60
    // int vote columns before the agg — was measured 2× slower (3.3 s
    // vs 1.6 s focused sf0.1 median) because every token row then
    // carries 60 materialized ints into the aggregation hash map. The
    // r9 JIT variance this form once showed (1.2-2.5 s spread) was
    // cured by the banded-signature localCheckpoint, not by agg shape:
    // post-fix 4-JVM spread is 1.52-1.90 s (±12%).
    val hashed = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), expr(sparkMd5Int60("tok")).as("h"))
    val voteCols = (0 until 60).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$i")
    }
    val votes = hashed.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
    val packed = (0 until 60).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    votes.select(col("doc_id"), packed.as("simhash"))
  }

  /** Banded candidate pairs over [[simhashMd5]] signatures: 4×15-bit
    * bands, equi-join candidates, hamming filter. The ONE implementation
    * both the registered d11 query and its spec assert on. */
  def simhashMd5BandedPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sh = simhashMd5(docs)
    // localCheckpoint: the banded frame feeds BOTH sides of the
    // candidate self-join, and without materialization Spark plans the
    // whole signature pipeline (tokenize → md5 → 60 vote aggregates)
    // twice — the dominant stage of the query, recomputed verbatim
    // (r9 focused bench: ~2× on m05/d11). The materialized frame is
    // tiny relative to the corpus (4 rows/doc × ~32 bytes — text never
    // enters it), so at 100 TB this is a deliberate signatures-table
    // write, not a cache of the input.
    val bands = sh.select(col("doc_id"), col("simhash"),
      explode(expr(
        "transform(sequence(0, 3), b -> struct(b AS band, " +
          "shiftright(simhash, b * 15) & 32767 AS bv))")).as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
      .localCheckpoint()
    val a = bands.select(col("doc_id").as("a_id"),
      col("simhash").as("a_sh"), col("band"), col("bv"))
    val b = bands.select(col("doc_id").as("b_id"),
      col("simhash").as("b_sh"), col("band"), col("bv"))
    a.join(b, Seq("band", "bv")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_sh", "b_sh").distinct()
      .withColumn("hamming", expr("bit_count(a_sh ^ b_sh)"))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** d11 — ORACLE-EXACT banded SimHash near-dup pairs: [[simhashMd5]]
    * signatures split into 4×15-bit bands (pigeonhole-exact at hamming
    * ≤ 3, like d09), candidates from the band equi-join only, and the
    * ENTIRE chain — 60 per-bit vote aggregates, sign-packing, banding,
    * hamming filter — mirrored in DuckDB SQL. d03/d09 stay as the
    * engine-native xxhash64 fast paths; this is the verification twin. */
  val simhashMd5Banded: QueryDef = {
    val maxHamming = 3
    QueryDef(
      "d11_dedup_simhash_md5",
      (s, d) => simhashMd5BandedPairs(Tables.documents(s, d), maxHamming)
        .orderBy("a_id", "b_id"),
      Some {
        s"""WITH $simhashMd5SigsSql,
            bands AS (
              SELECT doc_id, sh, k AS band, (sh >> (k * 15)) & 32767 AS bv
              FROM sigs, unnest(range(0, 4)) AS tk(k)),
            cand AS (
              SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
                a.sh AS a_sh, b.sh AS b_sh
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
            SELECT a_id, b_id,
              CAST(bit_count(xor(a_sh, b_sh)) AS INTEGER) AS hamming
            FROM cand WHERE bit_count(xor(a_sh, b_sh)) <= $maxHamming
            ORDER BY a_id, b_id"""
      })
  }

  /** DuckDB CTE chain `toks → hx → votes → sigs` producing `(doc_id,
    * sh)` — the one SQL mirror of [[simhashMd5]], shared by the d11
    * and d21 oracles. */
  def simhashMd5SigsSql: String = {
    val votes = (0 until 60).map(i =>
      s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
      .mkString(", ")
    val pack = (0 until 60).map(i =>
      s"CASE WHEN b$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END")
      .mkString(" + ")
    s"""toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        hx AS (SELECT doc_id, ${duckMd5Int60("tok")} AS h FROM toks),
        votes AS (SELECT doc_id, $votes FROM hx GROUP BY 1),
        sigs AS (SELECT doc_id, CAST($pack AS BIGINT) AS sh FROM votes)"""
  }

  /** d21 — ORACLE-EXACT multi-probe SimHash pairs at Hamming ≤ 7: the
    * md5-portable twin of d03's restated contract. [[simhashMd5]]'s
    * 60-bit signature in 4×15-bit bands with probe radius 1 (16 probe
    * keys per band — the band value XOR {0, each single bit}); by the
    * multi-index pigeonhole ([[multiProbePairs]]) candidates cover
    * EVERY pair at hamming ≤ 7, and the hamming filter makes the
    * output exactly the all-pairs result at that radius. The ENTIRE
    * chain — votes, sign-pack, banding, probe expansion, equi-join,
    * hamming filter — is mirrored in DuckDB, so this row is the
    * cross-engine proof that the d03 fix computes what it claims. */
  val simhashMultiProbe: QueryDef = {
    val maxHamming = 7
    QueryDef(
      "d21_dedup_simhash_multiprobe",
      (s, d) => multiProbePairs(simhashMd5(Tables.documents(s, d)), 15, 4,
        maxHamming).orderBy("a_id", "b_id"),
      Some {
        val masks = (Seq(0L) ++ (0 until 15).map(1L << _)).mkString(", ")
        s"""WITH $simhashMd5SigsSql,
            bands AS (
              SELECT doc_id, sh, k AS band, (sh >> (k * 15)) & 32767 AS bv
              FROM sigs, unnest(range(0, 4)) AS tk(k)),
            probes AS (
              SELECT doc_id, sh, band, xor(bv, m) AS bv
              FROM bands, unnest([$masks]) AS tm(m)),
            cand AS (
              SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
                a.sh AS a_sh, b.sh AS b_sh
              FROM probes a JOIN bands b
                ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
            SELECT a_id, b_id,
              CAST(bit_count(xor(a_sh, b_sh)) AS INTEGER) AS hamming
            FROM cand WHERE bit_count(xor(a_sh, b_sh)) <= $maxHamming
            ORDER BY a_id, b_id"""
      })
  }

  /** Core of d12 over an arbitrary documents frame. The token array is
    * projected ONCE per row before the window transform — referencing
    * `split(text)` inside the lambda would be inlined per element by
    * CollapseProject and re-tokenize the document for every window
    * (the same trap documented at the d06 signature aggregate).
    *
    * stride = 1 (the default, and what d12 registers) fingerprints
    * EVERY window: any verbatim shared span of ≥ `window` tokens
    * contains at least one identical full window in each doc, so
    * recall is exact regardless of where the span sits. A larger
    * stride is the cheaper sampled variant — it only catches spans
    * whose windows align mod stride, missing ~(stride−1)/stride of
    * arbitrary-offset overlaps. */
  def repeatedSpans(docs: DataFrame, window: Int = 32,
      stride: Int = 1): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, greatest((size(t) - $window) DIV $stride, 0)), " +
          s"w -> md5(concat_ws(' ', slice(t, w * $stride + 1, $window))))"))
        .as("fp"))
      .groupBy("fp")
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") > 1)

  /** d12 — cross-document repeated-span detection (the exact-substring
    * dedup of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better", ACL 2022 — boilerplate/memorized spans recur
    * VERBATIM across documents even when whole-doc similarity is low):
    * EVERY 32-token window (stride 1) md5-fingerprinted and grouped; a
    * span seen in >1 distinct doc is reported with its document and
    * occurrence counts. Stride 1 makes recall exact for shared spans of
    * ≥ 32 tokens at ANY offset (see [[repeatedSpans]]); oracle-exact
    * (md5 + counting on both engines).
    *
    * Scale: ~one window per token, but fingerprints (not span text)
    * shuffle into ONE hash aggregate — d08's discipline applied to
    * spans. Docs shorter than a window contribute their whole text as
    * one span (the negative-index DIV/floor-div engine difference is
    * clamped away by greatest(…, 0) before use). */
  val substringSpans: QueryDef = {
    val W = 32; val S = 1
    QueryDef(
      "d12_substring_spans",
      (s, d) => repeatedSpans(Tables.documents(s, d), W, S).orderBy("fp"),
      Some(s"""WITH toks AS (
                 SELECT doc_id, string_split(text, ' ') AS t FROM documents),
               spans AS (
                 SELECT doc_id,
                   md5(array_to_string(t[i * $S + 1 : i * $S + $W], ' ')) AS fp
                 FROM toks,
                   unnest(range(0, greatest((len(t) - $W) // $S, 0) + 1)) AS u(i))
               SELECT fp, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ,
                 min(doc_id) AS first_doc
               FROM spans GROUP BY fp
               HAVING count(DISTINCT doc_id) > 1
               ORDER BY fp"""))
  }

  /** d15 — repeated-span REMOVAL: the rewrite step of Lee et al.'s
    * exact-substring dedup (d12 detects the duplicated spans; the
    * actual pipeline then cuts them from every doc except the span's
    * first/keeper occurrence). Every doc comes back with its token
    * counts and the cleaned text — the first-occurrence doc keeps the
    * span verbatim, later docs drop every token covered by ANY
    * duplicated window, and a fully-boilerplate doc survives as an
    * empty string (a row the caller can gate on, never a silent drop).
    *
    * Scale shape: span fingerprints aggregate as in d12 (fingerprints
    * shuffle, not text); the duplicated-fp set is dup-bounded and
    * joins the window stream as a broadcast; covered positions explode
    * only for matching occurrences (≤ 32× the duplicate-window count).
    * The reassembly is the one corpus-sized stage — a (doc_id, pos)
    * anti join and a doc-keyed ordered collect — which is irreducible
    * for an operator whose OUTPUT is the rewritten corpus; both stages
    * key-partition on doc_id and never sort globally. Oracle-exact:
    * md5 windows, position arithmetic, and ordered reassembly are
    * mirrored in DuckDB bit-for-bit. */
  val spanRemoval: QueryDef = {
    val W = 32; val S = 1
    QueryDef(
      "d15_span_removal",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("t"))
        val wins = toks.select(col("doc_id"), expr(
          s"explode(transform(sequence(0, greatest((size(t) - $W) DIV $S, 0)), " +
            s"w -> struct(w AS w, md5(concat_ws(' ', slice(t, w * $S + 1, $W))) AS fp)))")
          .as("win"))
          .select(col("doc_id"), col("win.w").as("w"), col("win.fp").as("fp"))
        val dupSpans = repeatedSpans(Tables.documents(s, d), W, S)
          .select(col("fp"), col("first_doc"))
        val covered = wins.join(broadcast(dupSpans), "fp")
          .filter(col("doc_id") =!= col("first_doc"))
          .select(col("doc_id"),
            explode(expr(s"sequence(w * $S + 1, w * $S + $W)")).as("pos"))
          .distinct()
        val tokpos = toks.select(col("doc_id"), expr(
          "posexplode(t)").as(Seq("i0", "tok")))
          .select(col("doc_id"), (col("i0") + 1).as("pos"), col("tok"))
        val kept = tokpos.join(covered, Seq("doc_id", "pos"), "left_anti")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_kept"),
            concat_ws(" ", expr(
              "transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"))
              .as("cleaned_text"))
        toks.select(col("doc_id"), size(col("t")).cast("long").as("n_tok"))
          .join(kept, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("n_tok"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            (col("n_tok") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
            coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (
                 SELECT doc_id, string_split(text, ' ') AS t FROM documents),
               wins AS (
                 SELECT doc_id, i AS w,
                   md5(array_to_string(t[i * $S + 1 : i * $S + $W], ' ')) AS fp
                 FROM toks,
                   unnest(range(0, greatest((len(t) - $W) // $S, 0) + 1)) AS u(i)),
               dup AS (
                 SELECT fp, min(doc_id) AS first_doc
                 FROM wins GROUP BY fp
                 HAVING count(DISTINCT doc_id) > 1),
               cov AS (
                 SELECT DISTINCT wins.doc_id, p.pos
                 FROM wins JOIN dup ON dup.fp = wins.fp
                   AND wins.doc_id != dup.first_doc,
                   unnest(range(wins.w * $S + 1, wins.w * $S + $W + 1)) AS p(pos)),
               tokpos AS (
                 SELECT doc_id, i AS pos, t[i] AS tok
                 FROM toks, unnest(range(1, len(t) + 1)) AS u(i)),
               kept AS (
                 SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                   array_to_string(list(tok ORDER BY pos), ' ') AS cleaned_text
                 FROM (SELECT tk.doc_id, tk.pos, tk.tok FROM tokpos tk
                       ANTI JOIN cov ON cov.doc_id = tk.doc_id
                         AND cov.pos = tk.pos) k
                 GROUP BY doc_id)
               SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tok,
                 coalesce(k.n_kept, 0) AS n_kept,
                 CAST(len(t.t) AS BIGINT) - coalesce(k.n_kept, 0) AS n_removed,
                 coalesce(k.cleaned_text, '') AS cleaned_text
               FROM toks t LEFT JOIN kept k ON k.doc_id = t.doc_id
               ORDER BY t.doc_id"""))
  }

  /** Core of d13 over an arbitrary unit-normalized embedding frame
    * (`id`, `u`): SemDeDup-style semantic dedup (Abbas et al.,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication", 2023). Coarse clustering first, pairwise cosine
    * only WITHIN a cluster, connected components over the above-theta
    * pairs, keep the minimum id per component.
    *
    * The coarse quantizer is the first `kCentroids` corpus vectors by
    * id — pinned DATA, not engine-seeded model state, which is what
    * makes the whole chain oracle-expressible where a KMeans quantizer
    * (s03) cannot be: both engines assign each vector to its
    * max-dot centroid with the same sequential double fold and the
    * same (dot DESC, centroid id ASC) tiebreak.
    *
    * Scale shape: the centroid set is bounded and broadcast — the
    * assignment pass is a narrow map over the corpus (no shuffle);
    * the pair stage is an equi shuffle on cluster id touching only
    * same-cluster candidates (~n²/k per cluster, the SemDeDup
    * contract), never the full n²; components via the checkpointed
    * large-star/small-star contraction (see [[connectedComponents]]). */
  /** Coarse-quantizer assignment shared by d13/d14/s03b: each (`id`,
    * `u`) row labeled with its max-dot pinned centroid (the first
    * `kCentroids` corpus vectors by id), (dot DESC, centroid id ASC)
    * tiebreak.
    *
    * GENUINELY shuffle-free: the bounded centroid set is collected to
    * the driver (k rows — the same class of bounded collect as a 1-row
    * threshold) and rendered as a literal array, so the assignment is a
    * per-row fold — no k× cross join, no hash exchange on id for a
    * ranking window (the previous window form shuffled the expanded
    * corpus k times over). `Double.toString` round-trips exactly
    * through Spark's literal parser, so the rendered centroids are
    * bit-identical to the data. Dots are computed once into structs,
    * then reduced with strict `>` — in ascending c_id order the first
    * maximum wins, which IS the (dot DESC, c_id ASC) tiebreak. */
  def assignClusters(uVecs: DataFrame, kCentroids: Int): DataFrame = {
    val cents = uVecs.filter(col("id") < kCentroids)
      .select(col("id"), col("u"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
      .sortBy(_._1)
    // empty CORPUS: an empty assignment frame — "nothing to dedup" is a
    // valid answer, not a construction error. A NON-empty corpus with
    // no id < kCentroids is a misconfiguration (the pinned-centroid
    // contract needs the low-id vectors) and must fail LOUDLY — a
    // silent empty result would ship "zero duplicates" undetected.
    if (cents.isEmpty) {
      require(uVecs.isEmpty,
        s"non-empty corpus has no centroid vectors with id < $kCentroids")
      return uVecs.filter(lit(false))
        .select(col("id"), lit(-1L).as("cluster"), col("u"))
    }
    val centArr = cents.map { case (cid, cu) =>
      s"struct(CAST($cid AS BIGINT) AS c_id, " +
        cu.map(x => s"${x}D").mkString("array(", ", ", ")") + " AS c_u)"
    }.mkString("array(", ", ", ")")
    uVecs.select(col("id"), expr(
      s"""aggregate(
            transform($centArr, c -> struct(array_dot(u, c.c_u) AS d, c.c_id AS cid)),
            struct(CAST('-Infinity' AS DOUBLE) AS d, CAST(-1 AS BIGINT) AS cid),
            (acc, x) -> IF(x.d > acc.d, x, acc)).cid""").as("cluster"),
      col("u"))
  }

  def semanticDedupLabels(
      uVecs: DataFrame,
      kCentroids: Int,
      theta: Double): DataFrame = {
    val assigned = assignClusters(uVecs, kCentroids)
      // assignment feeds both sides of the pair join AND the final
      // labeling projection — without this the centroid cross-product
      // would run three times
      .localCheckpoint()
    val a = assigned
      .select(col("id").as("a_id"), col("cluster"), col("u").as("a_u"))
    val b = assigned
      .select(col("id").as("b_id"), col("cluster"), col("u").as("b_u"))
    val pairs = a.join(b, Seq("cluster"))
      .filter(col("a_id") < col("b_id"))
      .filter(expr("array_dot(a_u, b_u)") >= theta)
      .select("a_id", "b_id")
    val labels = connectedComponents(pairs)
    assigned.join(labels, assigned("id") === labels("id"), "left_outer")
      .select(assigned("id"), col("cluster"),
        coalesce(col("component"), assigned("id")).as("component"))
      .withColumn("kept", (col("component") === col("id")).cast("int"))
  }

  /** d13 — semantic dedup over the embeddings table: every vector
    * labeled with its coarse cluster, its semantic-dup component, and
    * whether it survives (kept = it is its component's minimum id).
    * Oracle-exact end to end: pinned-data centroids, mirrored dot-fold
    * assignment, and a recursive-CTE transitive closure for the
    * component labels (d07's idiom) — the driver hash-checks the full
    * cluster→pairs→components→survivor pipeline. */
  val semanticDedup: QueryDef = {
    val kCentroids = 16; val theta = 0.42
    QueryDef(
      "d13_semantic_dedup",
      (s, d) => {
        graft.expr.ArrayDot.register(s)
        semanticDedupLabels(
          normalized(s, d, "id", "u"), kCentroids, theta)
          .withColumnRenamed("id", "vec_id")
          .orderBy("vec_id")
      },
      Some(s"""WITH RECURSIVE $normalizedSql,
               cents AS (
                 SELECT vec_id AS c_id, u AS c_u FROM u
                 WHERE vec_id < $kCentroids),
               ad AS (
                 SELECT u.vec_id, c.c_id,
                   list_dot_product(u.u, c.c_u) AS c_dot
                 FROM u, cents c),
               asg AS (
                 SELECT vec_id, c_id AS cluster FROM (
                   SELECT vec_id, c_id,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY c_dot DESC, c_id) AS crn
                   FROM ad)
                 WHERE crn = 1),
               p AS (
                 SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                   $pairDotSql AS cs
                 FROM u a JOIN u b ON a.vec_id < b.vec_id
                 JOIN asg sa ON sa.vec_id = a.vec_id
                 JOIN asg sb ON sb.vec_id = b.vec_id
                   AND sb.cluster = sa.cluster),
               pairs AS (SELECT a_id, b_id FROM p WHERE cs >= $theta),
               edges AS (
                 SELECT a_id AS src, b_id AS dst FROM pairs
                 UNION
                 SELECT b_id AS src, a_id AS dst FROM pairs),
               reach(id, r) AS (
                 SELECT src, src FROM edges
                 UNION
                 SELECT e.src, reach.r FROM edges e
                 JOIN reach ON reach.id = e.dst),
               labels AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
               SELECT asg.vec_id, asg.cluster,
                 coalesce(l.component, asg.vec_id) AS component,
                 CAST(coalesce(l.component, asg.vec_id) = asg.vec_id
                      AS INTEGER) AS kept
               FROM asg LEFT JOIN labels l ON l.id = asg.vec_id
               ORDER BY vec_id"""))
  }

  /** Core of d14 over an arbitrary unit-normalized (`id`, `u`) frame:
    * rows with id ≡ 4 (mod 5) are the arriving batch, the rest the
    * static corpus index; every batch row comes back with its minimum-id
    * above-theta same-cluster corpus match (or -1 / is_new = 1). */
  def incrementalSemanticAdmission(
      uVecs: DataFrame,
      kCentroids: Int,
      theta: Double): DataFrame = {
    val asg = assignClusters(uVecs, kCentroids)
      // feeds the probe side, the corpus side, and the final
      // projection — one assignment job, three consumers
      .localCheckpoint()
    val batch = asg.filter(col("id") % 5 === 4)
    val corpus = asg.filter(col("id") % 5 =!= 4)
      .select(col("id").as("m_id"), col("cluster"), col("u").as("m_u"))
    val matches = batch.join(corpus, Seq("cluster"))
      .filter(expr("array_dot(u, m_u)") >= theta)
      .groupBy(col("id")).agg(min(col("m_id")).as("matched_id"))
    batch.join(matches, Seq("id"), "left_outer")
      .select(col("id").as("vec_id"), col("cluster"),
        coalesce(col("matched_id"), lit(-1L)).as("matched_id"),
        col("matched_id").isNull.cast("int").as("is_new"))
  }

  /** d14 — INCREMENTAL semantic dedup (x20's admission-control
    * discipline applied to d13's embedding space): a new batch of
    * vectors (vec_id ≡ 4 mod 5, ~20% — the arrivals) probes a static
    * corpus index (the other 80%) and each batch vector is either
    * flagged as a semantic dup of its minimum-id corpus match or
    * admitted as new. The corpus NEVER self-pairs — only the batch
    * side generates candidates, so per-increment cost is
    * |batch|·(cluster size), not |corpus|².
    *
    * Scale shape: the cluster assignment is d13's broadcast-centroid
    * map; the probe is an equi shuffle on cluster id where the corpus
    * side is the persisted index (in production: written once,
    * bucket-partitioned by cluster — x06's fingerprint-index pattern)
    * and only the small batch side is new work each increment.
    * Oracle-exact end to end. */
  val incrementalSemantic: QueryDef = {
    val kCentroids = 16; val theta = 0.40
    QueryDef(
      "d14_incremental_semantic",
      (s, d) => {
        graft.expr.ArrayDot.register(s)
        incrementalSemanticAdmission(
          normalized(s, d, "id", "u"), kCentroids, theta)
          .orderBy("vec_id")
      },
      Some(s"""WITH $normalizedSql,
               cents AS (
                 SELECT vec_id AS c_id, u AS c_u FROM u
                 WHERE vec_id < $kCentroids),
               ad AS (
                 SELECT u.vec_id, c.c_id,
                   list_dot_product(u.u, c.c_u) AS c_dot
                 FROM u, cents c),
               asg AS (
                 SELECT vec_id, c_id AS cluster FROM (
                   SELECT vec_id, c_id,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY c_dot DESC, c_id) AS crn
                   FROM ad)
                 WHERE crn = 1),
               m AS (
                 SELECT a.vec_id AS bid, b.vec_id AS mid
                 FROM u a JOIN asg sa ON sa.vec_id = a.vec_id
                 JOIN u b ON b.vec_id % 5 != 4
                 JOIN asg sb ON sb.vec_id = b.vec_id
                   AND sb.cluster = sa.cluster
                 WHERE a.vec_id % 5 = 4 AND $pairDotSql >= $theta),
               mm AS (SELECT bid, min(mid) AS matched_id FROM m GROUP BY bid)
               SELECT sa.vec_id, sa.cluster,
                 coalesce(mm.matched_id, -1) AS matched_id,
                 CAST(mm.matched_id IS NULL AS INTEGER) AS is_new
               FROM asg sa LEFT JOIN mm ON mm.bid = sa.vec_id
               WHERE sa.vec_id % 5 = 4
               ORDER BY vec_id"""))
  }

  /** d16 — asymmetric shingle CONTAINMENT (Broder's "containment" from
    * the original resemblance paper, the quantity d04's symmetric
    * Jaccard cannot see): C(A⊆B) = |S_A ∩ S_B| / |S_A|. When a short
    * document is quoted wholesale inside a much longer one, Jaccard is
    * tiny (the union is dominated by the long doc) but containment of
    * the short side is ~1 — exactly the doc-inside-doc duplication a
    * training-corpus pipeline must catch (press-release reprints,
    * quoted posts, license boilerplate). Emits both directions per
    * unordered pair and keeps pairs where EITHER direction clears θ=0.5;
    * d04 with its union denominator is the symmetric twin on the same
    * shingle index.
    *
    * Scale shape: identical to d04 — the pair stage is the shingle
    * inverted-index equi-join (shuffles on the 8-byte shingle hash,
    * never n² pairs), sizes join back per-doc. The oracle stays on raw
    * shingles for the same reason documented at d04. */
  val containmentPairs: QueryDef = {
    val thetaC = 0.5
    QueryDef(
      "d16_containment_pairs",
      (s, d) => {
        val sh = Tables.fanOutForCpu(
            Tables.documents(s, d).select("doc_id", "text"), col("doc_id"))
          .select(col("doc_id"), explode(expr(shingleExpr("text"))).as("sh"))
          .select(col("doc_id"), xxhash64(col("sh")).as("sh"))
          .distinct()
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        val a = sh.select(col("doc_id").as("a_id"), col("sh"))
        val b = sh.select(col("doc_id").as("b_id"), col("sh"))
        val inter = a.join(b, Seq("sh")).filter(col("a_id") < col("b_id"))
          .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_inter"))
        inter
          .join(sizes.select(col("doc_id").as("a_id"), col("n_sh").as("n_a")), "a_id")
          .join(sizes.select(col("doc_id").as("b_id"), col("n_sh").as("n_b")), "b_id")
          .withColumn("cont_a_in_b",
            col("n_inter").cast("double") / col("n_a"))
          .withColumn("cont_b_in_a",
            col("n_inter").cast("double") / col("n_b"))
          .filter(greatest(col("cont_a_in_b"), col("cont_b_in_a")) >= thetaC)
          .select("a_id", "b_id", "n_a", "n_b", "cont_a_in_b", "cont_b_in_a")
          .orderBy("a_id", "b_id")
      },
      Some(s"""WITH toks AS (
                 SELECT doc_id, string_split(text, ' ') AS t FROM documents),
               sh AS (
                 SELECT DISTINCT doc_id, array_to_string(t[i + 1:i + 3], ' ') AS sh
                 FROM toks, unnest(range(0, greatest(len(t) - 2, 1))) AS u(i)),
               sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
               inter AS (
                 SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
                 FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
               SELECT a_id, b_id,
                 CAST(sa.n_sh AS BIGINT) AS n_a, CAST(sb.n_sh AS BIGINT) AS n_b,
                 CAST(n_inter AS DOUBLE) / sa.n_sh AS cont_a_in_b,
                 CAST(n_inter AS DOUBLE) / sb.n_sh AS cont_b_in_a
               FROM inter
               JOIN sizes sa ON sa.doc_id = a_id
               JOIN sizes sb ON sb.doc_id = b_id
               WHERE greatest(CAST(n_inter AS DOUBLE) / sa.n_sh,
                              CAST(n_inter AS DOUBLE) / sb.n_sh) >= $thetaC
               ORDER BY a_id, b_id"""))
  }

  /** d17 — MinHash calibration harness (the dedup analogue of s08's
    * ANN recall report): for every banded candidate pair, compare the
    * MinHash ESTIMATE (fraction of the 8 Carter-Wegman signatures that
    * agree — the statistic whose expectation IS the Jaccard, Broder
    * 1997 §2) against the EXACT shingle Jaccard, pooled by exact-decile
    * bucket. This is how an operator decides whether the configured
    * (K, bands) reach the θ the pipeline assumes before trusting d10's
    * output at 100 TB.
    *
    * Determinism: matches and intersections are integers; the two
    * pooled ratios are single divisions of integer SUMS (never a mean
    * of per-pair doubles, whose accumulation order would be
    * engine-dependent); buckets are floor(10·j) on an exact-rational
    * j, clamped to 9.
    *
    * Scale shape: same candidate generation as d10 (band equi-join,
    * never all-pairs); the signature comparison joins the 8-column sig
    * rows pairwise on the candidate list (candidate-bounded), and the
    * report is a ≤10-row aggregate. */
  val minhashCalibration: QueryDef = {
    val K = 8; val bandRows = 4
    QueryDef(
      "d17_minhash_calibration",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val shingled = Tables.fanOutForCpu(
            docs.select(col("doc_id"), col("text")), col("doc_id"))
          .select(col("doc_id"),
            expr(s"array_distinct(${shingleExpr("text")})").as("sh"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val sigCols = (0 until K).map(k =>
          min(expr(s"ha + $k * hb")).as(s"sig_$k"))
        val sigs = shingled
          .select(col("doc_id"), explode(col("sh")).as("sg"))
          .select(col("doc_id"), md5(col("sg")).as("m"))
          .select(col("doc_id"),
            expr("CAST(conv(substring(m, 2, 15), 16, 10) AS BIGINT)").as("ha"),
            expr("CAST(conv(substring(m, 17, 14), 16, 10) AS BIGINT)").as("hb"))
          .groupBy("doc_id")
          .agg(sigCols.head, sigCols.tail: _*)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val bandCols = (0 until K / bandRows).map { b =>
          struct(lit(b).as("band"),
            concat_ws(",",
              (0 until bandRows).map(r => col(s"sig_${b * bandRows + r}")): _*)
              .as("bv")).as(s"b$b")
        }
        val bands = sigs.select(col("doc_id"),
          explode(array(bandCols: _*)).as("bb"))
          .select(col("doc_id"), col("bb.band").as("band"),
            col("bb.bv").as("bv"))
        val cand = bands.select(col("doc_id").as("a_id"), col("band"),
          col("bv"))
          .join(bands.select(col("doc_id").as("b_id"), col("band"),
            col("bv")), Seq("band", "bv"))
          .filter(col("a_id") < col("b_id"))
          .select("a_id", "b_id").distinct()
        val matchExpr = (0 until K)
          .map(k => s"IF(a_sig_$k = b_sig_$k, 1L, 0L)").mkString(" + ")
        val sa = sigs.select(
          col("doc_id").as("a_id") +:
            (0 until K).map(k => col(s"sig_$k").as(s"a_sig_$k")): _*)
        val sb = sigs.select(
          col("doc_id").as("b_id") +:
            (0 until K).map(k => col(s"sig_$k").as(s"b_sig_$k")): _*)
        val est = cand.join(sa, "a_id").join(sb, "b_id")
          .select(col("a_id"), col("b_id"),
            expr(matchExpr).as("sig_match"))
        val sha = shingled.select(col("doc_id").as("a_id"),
          col("sh").as("a_sh"))
        val shb = shingled.select(col("doc_id").as("b_id"),
          col("sh").as("b_sh"))
        val out = est.join(sha, "a_id").join(shb, "b_id")
          .withColumn("n_inter", expr("size(array_intersect(a_sh, b_sh))"))
          .withColumn("n_union",
            expr("size(a_sh) + size(b_sh) - n_inter"))
          .withColumn("bucket", expr(
            "CAST(least((10 * n_inter) DIV n_union, 9) AS INT)"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_pairs"),
            sum("sig_match").as("sum_sig_match"),
            sum("n_inter").as("sum_inter"),
            sum("n_union").as("sum_union"))
          .select(col("bucket"), col("n_pairs"),
            round(col("sum_sig_match").cast("double") /
              (lit(K) * col("n_pairs")).cast("double"), 6).as("pooled_est"),
            round(col("sum_inter").cast("double") /
              col("sum_union").cast("double"), 6).as("pooled_exact"))
          .orderBy("bucket")
          .localCheckpoint()
        shingled.unpersist()
        sigs.unpersist()
        out
      },
      Some(s"""WITH toks AS (
                 SELECT doc_id, string_split(text, ' ') AS t FROM documents),
               sh AS (
                 SELECT DISTINCT doc_id,
                   array_to_string(t[i + 1:i + 3], ' ') AS sh
                 FROM toks, unnest(range(0, greatest(len(t) - 2, 1))) AS u(i)),
               hx AS (
                 SELECT doc_id, sh,
                   ${duckMd5Int60("sh")} AS ha,
                   ${duckMd5IntSlice("sh", 17, 14)} AS hb
                 FROM sh),
               sigs AS (
                 SELECT doc_id, k, min(ha + k * hb) AS sig
                 FROM hx, unnest(range(0, $K)) AS tk(k)
                 GROUP BY 1, 2),
               bands AS (
                 SELECT doc_id, k // $bandRows AS band,
                   string_agg(CAST(sig AS VARCHAR), ',' ORDER BY k) AS bv
                 FROM sigs GROUP BY 1, 2),
               cand AS (
                 SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                 FROM bands a JOIN bands b
                   ON a.band = b.band AND a.bv = b.bv
                   AND a.doc_id < b.doc_id),
               m AS (
                 SELECT c.a_id, c.b_id,
                   CAST(sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END)
                     AS BIGINT) AS sig_match
                 FROM cand c
                 JOIN sigs sa ON sa.doc_id = c.a_id
                 JOIN sigs sb ON sb.doc_id = c.b_id AND sb.k = sa.k
                 GROUP BY 1, 2),
               sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
               inter AS (
                 SELECT c.a_id, c.b_id, count(*) AS n_inter
                 FROM cand c
                 JOIN sh a ON a.doc_id = c.a_id
                 JOIN sh b ON b.doc_id = c.b_id AND b.sh = a.sh
                 GROUP BY 1, 2),
               pairs AS (
                 SELECT m.a_id, m.b_id, m.sig_match,
                   coalesce(i.n_inter, 0) AS n_inter,
                   sa.n_sh + sb.n_sh - coalesce(i.n_inter, 0) AS n_union
                 FROM m
                 LEFT JOIN inter i ON i.a_id = m.a_id AND i.b_id = m.b_id
                 JOIN sizes sa ON sa.doc_id = m.a_id
                 JOIN sizes sb ON sb.doc_id = m.b_id),
               bucketed AS (
                 SELECT CAST(least((10 * n_inter) // n_union, 9) AS INTEGER)
                   AS bucket, *
                 FROM pairs)
               SELECT bucket, count(*) AS n_pairs,
                 round(CAST(sum(sig_match) AS DOUBLE) /
                       CAST($K * count(*) AS DOUBLE), 6) AS pooled_est,
                 round(CAST(sum(n_inter) AS DOUBLE) /
                       CAST(sum(n_union) AS DOUBLE), 6) AS pooled_exact
               FROM bucketed GROUP BY 1 ORDER BY bucket"""))
  }

  /** d18 — normalization-keyed exact dedup (the "fuzzy-exact" pass
    * production pipelines run BEFORE MinHash, e.g. RefinedWeb / CCNet:
    * lowercase, strip non-alphanumerics, collapse whitespace — so
    * case/punctuation/spacing variants of the same document collapse
    * into one exact group without paying the LSH machinery). Canonical
    * survivor is min(doc_id), the d01 discipline; `n_norm_chars`
    * reports the normalized length the group was keyed on.
    *
    * Scale shape: one hash aggregate keyed on md5(normalized text) —
    * document bodies never shuffle (a norm-string key measured 8.3× at
    * the 10× probe from hauling text through the exchange; the digest
    * key is the d08 fingerprint discipline with a 128-bit collision
    * margin). The normalization itself is a pure per-row projection
    * fused into the scan.
    *
    * Oracle note: Spark's `regexp_replace` replaces ALL matches;
    * DuckDB's replaces the first only unless passed the 'g' option —
    * the mirror must say `regexp_replace(..., 'g')`.
    *
    * Regex-cost note (r10, VERDICT r9 #3): the patterns are tuned to
    * minimize MATCH EVENTS, which is what the engines bill for —
    * `[^a-z0-9 ]+` deletes a punctuation run in one replacement
    * instead of one per char, and `' {2,}'` fires only on runs of ≥2
    * spaces where the old `' +'` made EVERY single space (the most
    * common char in text) a replacement event. Both rewrites are
    * per-run/per-char identical in output, applied to both engines;
    * the sf2.0 doubling ratio moved 2.64× → ~2× with them. */
  val normalizedExact: QueryDef = QueryDef(
    "d18_dedup_normalized",
    (s, d) =>
      Tables.documents(s, d)
        .selectExpr("doc_id",
          raw"trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]+', ''), ' {2,}', ' ')) AS norm")
        .selectExpr("doc_id", "md5(norm) AS k", "length(norm) AS n_norm")
        .groupBy("k")
        .agg(min(col("doc_id")).as("canonical_id"),
          count(lit(1)).as("n_copies"),
          min(col("n_norm")).as("n_norm_chars"))
        .select("canonical_id", "n_copies", "n_norm_chars")
        .orderBy("canonical_id"),
    Some("""WITH f AS (
              SELECT doc_id,
                trim(regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9 ]+', '', 'g'), ' {2,}', ' ', 'g')) AS norm
              FROM documents),
            h AS (
              SELECT doc_id, md5(norm) AS k,
                CAST(length(norm) AS INTEGER) AS n_norm
              FROM f)
            SELECT min(doc_id) AS canonical_id, count(*) AS n_copies,
              min(n_norm) AS n_norm_chars
            FROM h GROUP BY k ORDER BY canonical_id"""))

  /** d19 — content-defined chunking dedup audit (the FastCDC family:
    * Xia et al., "FastCDC: a Fast and Efficient Content-Defined
    * Chunking Approach", USENIX ATC 2016; Muthitacharoen et al.'s LBFS,
    * SOSP 2001 introduced the rolling-hash cut-point): each document is
    * cut where the rolling hash of the last 8 characters satisfies
    * h % 64 == 0, so chunk boundaries RESYNCHRONIZE after an insertion
    * — the property fixed-width windows (d12) lack and the reason
    * storage dedup uses CDC. Per document: chunk count, exact
    * min/max/mean chunk length, chunks shared with ANOTHER document
    * (by md5), and the duplicate-chunk share in ppm.
    *
    * Determinism: the gear is an exact integer sum of the window's
    * codepoints; boundaries, chunk substrings, and md5s are pure
    * row-local arithmetic; ppm is integer DIV.
    *
    * Scale shape: boundary detection, chunk slicing, and hashing all
    * happen IN-ROW inside the scan stage (array filter/transform over
    * the text — no per-position explode, no shuffle); only 16-byte
    * chunk hashes leave the scan: one hash agg keyed by chunk md5 for
    * the cross-doc census, one equi-join back, one doc-keyed agg —
    * the d04 inverted-index discipline. Documents shorter than the
    * 8-char window form a single chunk by construction. */
  val cdcChunking: QueryDef = {
    val W = 8; val D = 64
    QueryDef(
      "d19_cdc_chunking",
      (s, d) => {
        // gear(i) = sum of ascii over text[i-7..i]; boundary at i when
        // gear(i) % 64 == 0; the final position is always a boundary.
        // The text is split to a codepoint array ONCE per doc and each
        // position's gear is 8 indexed adds — O(n), no per-position
        // substring/array allocation (the naive form measured 10.4 s
        // at sf0.1 vs ~3 s for this one).
        val gearSum = (0 until W)
          .map(k => s"element_at(cps, i - $k)").mkString(" + ")
        val chunks = Tables.fanOutForCpu(
            Tables.documents(s, d).select("doc_id", "text"), col("doc_id"))
          .selectExpr("doc_id", "length(text) AS n", "text")
          .selectExpr("doc_id", "n",
            "transform(split(text, ''), ch -> ascii(ch)) AS cps", "text")
          .selectExpr("doc_id", "n",
            s"""IF(n >= $W,
                 filter(sequence($W, n), i -> ($gearSum) % $D = 0),
                 CAST(array() AS ARRAY<INT>)) AS bnds""",
            "text")
          .selectExpr("doc_id", "n",
            "IF(size(bnds) > 0 AND element_at(bnds, -1) = n, bnds, " +
              "concat(bnds, array(n))) AS allb",
            "text")
          .selectExpr("doc_id",
            "concat(array(0), slice(allb, 1, size(allb) - 1)) AS starts",
            "allb", "text")
          .selectExpr("doc_id",
            "explode(transform(sequence(1, size(allb)), k -> struct(" +
              "element_at(allb, k) - element_at(starts, k) AS len, " +
              "md5(substring(text, element_at(starts, k) + 1, " +
              "element_at(allb, k) - element_at(starts, k))) AS h))) AS c")
          .select(col("doc_id"), col("c.len").as("len"), col("c.h").as("h"))
          // checkpoint: the census aggregate AND the join-back both
          // read chunks — unchecked, the gear pass ran twice (r15)
          .localCheckpoint()
        val census = chunks.groupBy("h")
          .agg(countDistinct("doc_id").as("n_docs"))
        chunks.join(census, "h")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            min("len").as("min_len"), max("len").as("max_len"),
            sum("len").as("total_len"),
            sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_dup"))
          .select(col("doc_id"), col("n_chunks"), col("min_len"),
            col("max_len"), col("total_len"),
            expr("total_len DIV n_chunks").as("mean_len"),
            col("n_dup"),
            expr("(1000000 * n_dup) DIV n_chunks").as("dup_ppm"))
          .orderBy("doc_id")
      },
      Some(s"""WITH base AS (
                 SELECT doc_id, length(text) AS n, text,
                   list_transform(string_split(text, ''),
                     ch -> ascii(ch)) AS cps
                 FROM documents),
               b AS (
                 SELECT doc_id, n, text,
                   list_filter(range($W, n + 1), i ->
                     (${(0 until W).map(k => s"cps[i - $k]").mkString(" + ")})
                       % $D = 0) AS bnds
                 FROM base),
               ab AS (
                 SELECT doc_id, text,
                   CASE WHEN len(bnds) > 0 AND bnds[-1] = n THEN bnds
                        ELSE list_append(bnds, n) END AS allb
                 FROM b),
               ch AS (
                 SELECT doc_id,
                   unnest(list_transform(range(1, len(allb) + 1), k ->
                     struct_pack(
                       len := allb[k] - coalesce(allb[k - 1], 0),
                       h := md5(text[coalesce(allb[k - 1], 0) + 1 : allb[k]]))))
                     AS c
                 FROM ab),
               chunks AS (
                 SELECT doc_id, c.len AS len, c.h AS h FROM ch),
               census AS (
                 SELECT h, count(DISTINCT doc_id) AS n_docs
                 FROM chunks GROUP BY 1)
               SELECT k.doc_id, count(*) AS n_chunks,
                 min(k.len) AS min_len, max(k.len) AS max_len,
                 CAST(sum(k.len) AS BIGINT) AS total_len,
                 CAST(sum(k.len) AS BIGINT) // count(*) AS mean_len,
                 CAST(sum(CASE WHEN cs.n_docs > 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_dup,
                 (1000000 * CAST(sum(CASE WHEN cs.n_docs > 1 THEN 1 ELSE 0
                   END) AS BIGINT)) // count(*) AS dup_ppm
               FROM chunks k JOIN census cs ON cs.h = k.h
               GROUP BY k.doc_id ORDER BY k.doc_id"""))
  }

  /** d20 — dedup-detector evaluation against planted ground truth (the
    * validation harness a production dedup rollout runs BEFORE trusting
    * a threshold: Silcock et al., "Noise-robust de-duplication at
    * scale", 2022 publish exactly this planted-pair protocol): an
    * md5-selected quarter of the corpus is cloned with a deterministic
    * 20% tail truncation (the classic near-dup: same document, cut
    * short), the d04 shingle machinery — BLIND to the planting — runs
    * over the augmented corpus, and detected pairs involving a clone
    * are scored as TP (clone paired with its own parent) or FP at a
    * 3-point Jaccard threshold sweep, with exact precision/recall ppm.
    *
    * Determinism: planting is integer md5 selection; the mutation is
    * exact token-prefix slicing; Jaccard is held as the exact integer
    * percent (100·|∩|) DIV |∪| (so θ=20 ⟺ J ≥ 0.20 exactly — no
    * float threshold ever compares); all tallies are integers.
    *
    * Scale shape: the pair stage is d04's shingle-keyed equi-join over
    * the augmented corpus (hashed 8-byte shingles ride the shuffle,
    * bodies don't); the evaluation layer is a filter + 3-way explode
    * on the BOUNDED pair frame plus one tiny agg. Planted-side filter
    * keeps organic corpus near-dups out of the score (they are not
    * errors — the detector is right to find them). */
  val dedupEval: QueryDef = {
    val off = 100000000L
    QueryDef(
      "d20_dedup_eval",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val planted = docs
          .filter(expr(
            s"${sparkMd5Int60("CAST(doc_id AS STRING)")} % 4 = 0"))
          .select((col("doc_id") + off).as("doc_id"),
            expr("array_join(slice(split(text, ' '), 1, " +
              "greatest(CAST(ceil(size(split(text, ' ')) * 0.8) AS INT)," +
              " 1)), ' ')").as("text"))
        val nPlanted = planted.agg(count(lit(1)).as("n_planted"))
        val sh = Tables.fanOutForCpu(
            docs.select(col("doc_id"), col("text"))
              .unionAll(planted.select(col("doc_id"), col("text"))),
            col("doc_id"))
          .select(col("doc_id"), explode(expr(shingleExpr("text"))).as("sh"))
          .select(col("doc_id"), xxhash64(col("sh")).as("sh"))
          .distinct()
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        val pairs = sh.select(col("doc_id").as("a_id"), col("sh"))
          .join(sh.select(col("doc_id").as("b_id"), col("sh")), Seq("sh"))
          .filter(col("a_id") < col("b_id"))
          .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_inter"))
          .join(sizes.select(col("doc_id").as("a_id"),
            col("n_sh").as("n_a")), "a_id")
          .join(sizes.select(col("doc_id").as("b_id"),
            col("n_sh").as("n_b")), "b_id")
          .withColumn("jpct",
            expr("(100 * n_inter) DIV (n_a + n_b - n_inter)"))
          .filter(col("b_id") >= off && col("jpct") >= 20)
          .withColumn("is_tp",
            expr(s"IF(a_id + $off = b_id, 1L, 0L)"))
        val perTheta = pairs
          .select(col("is_tp"), col("jpct"),
            explode(expr("array(20, 40, 60)")).as("theta_pct"))
          .filter(col("jpct") >= col("theta_pct"))
          .groupBy("theta_pct")
          .agg(sum(col("is_tp")).as("tp0"),
            sum(expr("1L - is_tp")).as("fp0"))
        // drive the output from the theta DOMAIN (s13's lesson: an
        // empty sweep point must report zeros, not vanish)
        nPlanted
          .select(col("n_planted"),
            explode(expr("array(20, 40, 60)")).as("theta_pct"))
          .join(perTheta, Seq("theta_pct"), "left")
          .selectExpr("theta_pct", "n_planted",
            "coalesce(tp0, 0L) AS tp", "coalesce(fp0, 0L) AS fp",
            "n_planted - coalesce(tp0, 0L) AS fn",
            "(1000000 * coalesce(tp0, 0L)) DIV " +
              "greatest(coalesce(tp0, 0L) + coalesce(fp0, 0L), 1)" +
              " AS precision_ppm",
            "(1000000 * coalesce(tp0, 0L)) DIV greatest(n_planted, 1)" +
              " AS recall_ppm")
          .orderBy("theta_pct")
      },
      Some(s"""WITH planted AS (
                 SELECT doc_id + $off AS doc_id,
                   array_to_string(t[1:greatest(CAST(ceil(len(t) * 0.8)
                     AS INTEGER), 1)], ' ') AS text
                 FROM (SELECT doc_id, string_split(text, ' ') AS t
                       FROM documents
                       WHERE ${duckMd5Int60("CAST(doc_id AS VARCHAR)")}
                         % 4 = 0)),
               np AS (SELECT count(*) AS n_planted FROM planted),
               aug AS (
                 SELECT doc_id, text FROM documents
                 UNION ALL SELECT doc_id, text FROM planted),
               toks AS (
                 SELECT doc_id, string_split(text, ' ') AS t FROM aug),
               sh AS (
                 SELECT DISTINCT doc_id,
                   array_to_string(t[i + 1:i + 3], ' ') AS sh
                 FROM toks,
                   unnest(range(0, greatest(len(t) - 2, 1))) AS u(i)),
               sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
               inter AS (
                 SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   count(*) AS n_inter
                 FROM sh a JOIN sh b
                   ON a.sh = b.sh AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
               pairs AS (
                 SELECT a_id, b_id,
                   (100 * n_inter) // (sa.n_sh + sb.n_sh - n_inter)
                     AS jpct,
                   CASE WHEN a_id + $off = b_id THEN 1 ELSE 0 END AS is_tp
                 FROM inter
                 JOIN sizes sa ON sa.doc_id = a_id
                 JOIN sizes sb ON sb.doc_id = b_id
                 WHERE b_id >= $off
                   AND (100 * n_inter) // (sa.n_sh + sb.n_sh - n_inter)
                     >= 20),
               sweep AS (
                 SELECT th.theta_pct,
                   CAST(sum(is_tp) AS BIGINT) AS tp0,
                   CAST(sum(1 - is_tp) AS BIGINT) AS fp0
                 FROM pairs,
                   (SELECT unnest([20, 40, 60]) AS theta_pct) th
                 WHERE jpct >= th.theta_pct
                 GROUP BY 1),
               dom AS (
                 SELECT CAST(theta_pct AS INTEGER) AS theta_pct, n_planted
                 FROM (SELECT unnest([20, 40, 60]) AS theta_pct) t
                 CROSS JOIN np)
               SELECT d.theta_pct, d.n_planted,
                 coalesce(tp0, 0) AS tp, coalesce(fp0, 0) AS fp,
                 d.n_planted - coalesce(tp0, 0) AS fn,
                 (1000000 * coalesce(tp0, 0))
                   // greatest(coalesce(tp0, 0) + coalesce(fp0, 0), 1)
                   AS precision_ppm,
                 (1000000 * coalesce(tp0, 0)) // greatest(d.n_planted, 1)
                   AS recall_ppm
               FROM dom d LEFT JOIN sweep ON sweep.theta_pct = d.theta_pct
               ORDER BY d.theta_pct"""))
  }

  /** d22 — CONTAINMENT-SKETCH calibration (the d17 discipline applied
    * to d16's asymmetric containment): for every exact-containment
    * candidate pair, compare the K-minimum-values ESTIMATE of
    * C(A⊆B) = |A∩B|/|A| — count how many of A's k smallest md5 shingle
    * hashes land in B, over min(k, |A|) (Broder 1997 §3: the k
    * smallest hashes are a uniform sample of A, so the hit fraction is
    * an unbiased containment estimator) — against the exact value.
    * This is how a pipeline validates the sketch BEFORE replacing
    * d16's full-intersection join with sketch joins at 100 TB, where
    * only the k-row sketch (not the shingle set) can ride the shuffle.
    *
    * Determinism: md5-int60 hashes both engines; hit counts and sizes
    * are integers; both ratios are emitted in exact ppm (single
    * integer DIV). Scale shape: the exact stage is d16's shared-
    * shingle equi-join; the sketch stage joins the CANDIDATE-bounded
    * pair list against the k-row-per-doc sketch — pair-bounded, and
    * the sketch itself is the only per-doc state a production run
    * would retain. */
  val containmentSketchEval: QueryDef = {
    val K = 16
    val thetaPpm = 500000L // exact C(A⊆B) >= 0.5 defines the pair list
    QueryDef(
      "d22_containment_sketch_eval",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val sh = Tables.fanOutForCpu(
            Tables.documents(s, d).select("doc_id", "text"), col("doc_id"))
          .select(col("doc_id"), explode(expr(shingleExpr("text"))).as("sg"))
          .select(col("doc_id"),
            expr(sparkMd5Int60("sg")).as("h"))
          .distinct()
          .localCheckpoint() // feeds sizes, both join sides, and the sketch
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        val sketch = sh
          .withColumn("rk", row_number().over(
            Window.partitionBy("doc_id").orderBy("h")))
          .filter(col("rk") <= K)
          .select(col("doc_id"), col("h"))
        val inter = sh.select(col("doc_id").as("a_id"), col("h"))
          .join(sh.select(col("doc_id").as("b_id"), col("h")), Seq("h"))
          .filter(col("a_id") =!= col("b_id"))
          .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_inter"))
        val pairs = inter
          .join(sizes.select(col("doc_id").as("a_id"), col("n_sh").as("n_a")),
            "a_id")
          .withColumn("exact_ppm",
            expr("(1000000 * n_inter) DIV n_a"))
          .filter(col("exact_ppm") >= thetaPpm)
        val hits = pairs.select("a_id", "b_id")
          .join(sketch.select(col("doc_id").as("a_id"), col("h")), "a_id")
          .join(sh.select(col("doc_id").as("b2"), col("h").as("bh")),
            col("b_id") === col("b2") && col("h") === col("bh"))
          .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_hits"))
        pairs
          .join(hits, Seq("a_id", "b_id"), "left")
          .na.fill(0L, Seq("n_hits"))
          .withColumn("est_ppm",
            expr(s"(1000000 * n_hits) DIV least($K, n_a)"))
          .withColumn("err_ppm", expr("abs(exact_ppm - est_ppm)"))
          .select("a_id", "b_id", "n_a", "n_inter", "exact_ppm",
            "n_hits", "est_ppm", "err_ppm")
          .orderBy("a_id", "b_id")
      },
      Some(s"""WITH toks AS (
                 SELECT doc_id, string_split(text, ' ') AS t FROM documents),
               shr AS (
                 SELECT DISTINCT doc_id,
                   array_to_string(t[i + 1:i + 3], ' ') AS sg
                 FROM toks, unnest(range(0, greatest(len(t) - 2, 1))) AS u(i)),
               sh AS (
                 SELECT DISTINCT doc_id, ${duckMd5Int60("sg")} AS h
                 FROM shr),
               sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
               sk AS (
                 SELECT doc_id, h FROM (
                   SELECT doc_id, h,
                     row_number() OVER (PARTITION BY doc_id ORDER BY h)
                       AS rk
                   FROM sh)
                 WHERE rk <= $K),
               inter AS (
                 SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   CAST(count(*) AS BIGINT) AS n_inter
                 FROM sh a JOIN sh b ON a.h = b.h
                   AND a.doc_id != b.doc_id
                 GROUP BY 1, 2),
               pairs AS (
                 SELECT a_id, b_id, CAST(sa.n_sh AS BIGINT) AS n_a, n_inter,
                   (1000000 * n_inter) // sa.n_sh AS exact_ppm
                 FROM inter JOIN sizes sa ON sa.doc_id = a_id
                 WHERE (1000000 * n_inter) // sa.n_sh >= $thetaPpm),
               hits AS (
                 SELECT p.a_id, p.b_id, CAST(count(*) AS BIGINT) AS n_hits
                 FROM pairs p
                 JOIN sk ON sk.doc_id = p.a_id
                 JOIN sh bb ON bb.doc_id = p.b_id AND bb.h = sk.h
                 GROUP BY 1, 2)
               SELECT p.a_id, p.b_id, p.n_a, p.n_inter, p.exact_ppm,
                 CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
                 (1000000 * coalesce(h.n_hits, 0)) // least($K, p.n_a)
                   AS est_ppm,
                 abs(p.exact_ppm - (1000000 * coalesce(h.n_hits, 0))
                   // least($K, p.n_a)) AS err_ppm
               FROM pairs p LEFT JOIN hits h
                 ON h.a_id = p.a_id AND h.b_id = p.b_id
               ORDER BY p.a_id, p.b_id"""))
  }

  /** d23 — cluster-coherence audit for transitive-closure dedup (the
    * CHAINING problem: connected components promote pairwise
    * similarity to cluster membership, so A~B~C clusters A with C even
    * when jaccard(A,C) < θ — SimClusters/C4-style pipelines audit the
    * weakest link per cluster before deleting on the label. Per
    * cluster-size: how many clusters hang on a borderline bridge —
    * a minimum edge inside θ+0.05 of the threshold — plus exact
    * min/mean edge strength). Consumes the SAME materialized pair/CC
    * stage as x12/x19/x44/x53: zero re-shingling.
    *
    * Determinism: edge jaccards are the shared stage's verified
    * cross-engine doubles, 10⁻⁶-integerized per edge before exact
    * min/sum; the mean divides exact longs (DIV, nonneg).
    *
    * Scale shape: one edge→label equi-join on a_id (pairs within a
    * component share a_id's label by construction), two bounded hash
    * aggs (component-keyed, then size-keyed). */
  val clusterCoherence: QueryDef = {
    val weakPpm = 250000L // theta (0.20) + 0.05 margin, in ppm
    QueryDef(
      "d23_cluster_coherence",
      (s, d) => {
        val pairs = ngramSharedPairs(s, d)
        val labels = ngramSharedLabels(s, d)
        val perComp = pairs
          .join(labels, col("a_id") === col("id"))
          .select(col("component"),
            expr("CAST(round(jaccard * 1000000) AS BIGINT)").as("j_ppm"))
          .groupBy("component")
          .agg(count(lit(1)).as("n_edges"), min(col("j_ppm")).as("min_j"),
            sum(col("j_ppm")).as("sum_j"))
        val sizes = labels.groupBy("component")
          .agg(count(lit(1)).as("cluster_size"))
        perComp.join(sizes, Seq("component"))
          .groupBy("cluster_size")
          .agg(count(lit(1)).as("n_clusters"),
            sum(when(col("min_j") < weakPpm, 1L).otherwise(0L))
              .as("n_weak_bridge"),
            min(col("min_j")).as("weakest_edge_ppm"),
            sum(col("sum_j")).as("sj"), sum(col("n_edges")).as("ne"))
          .withColumn("mean_edge_ppm", expr("sj DIV ne"))
          .select("cluster_size", "n_clusters", "n_weak_bridge",
            "weakest_edge_ppm", "mean_edge_ppm")
          .orderBy("cluster_size")
      },
      Some(s"""WITH RECURSIVE ${ngramPairSql(ngramTheta)},
               edges AS (
                 SELECT a_id AS src, b_id AS dst FROM pairs
                 UNION
                 SELECT b_id AS src, a_id AS dst FROM pairs),
               reach(id, r) AS (
                 SELECT src, src FROM edges
                 UNION
                 SELECT e.src, reach.r FROM edges e
                 JOIN reach ON reach.id = e.dst),
               labels AS (
                 SELECT id, min(r) AS component FROM reach GROUP BY id),
               ej AS (
                 SELECT l.component,
                   CAST(round(p.jaccard * 1000000) AS BIGINT) AS j_ppm
                 FROM pairs p JOIN labels l ON l.id = p.a_id),
               pc AS (
                 SELECT component, CAST(count(*) AS BIGINT) AS n_edges,
                   CAST(min(j_ppm) AS BIGINT) AS min_j,
                   CAST(sum(j_ppm) AS BIGINT) AS sum_j
                 FROM ej GROUP BY 1),
               sz AS (
                 SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
                 FROM labels GROUP BY 1)
               SELECT sz.cluster_size,
                 CAST(count(*) AS BIGINT) AS n_clusters,
                 CAST(sum(CASE WHEN pc.min_j < $weakPpm THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_weak_bridge,
                 CAST(min(pc.min_j) AS BIGINT) AS weakest_edge_ppm,
                 CAST(sum(pc.sum_j) AS BIGINT)
                   // CAST(sum(pc.n_edges) AS BIGINT) AS mean_edge_ppm
               FROM pc JOIN sz USING (component)
               GROUP BY 1 ORDER BY cluster_size"""))
  }

  /** d24 — cross-source duplication matrix (the mirror-site/syndication
    * diagnostic every web-corpus report includes — RefinedWeb §D and
    * Dolma both break dup counts into within- vs cross-source:
    * within-source duplication means crawler revisits, CROSS-source
    * duplication means mirrors/syndication and decides whether dedup
    * must run globally or can shard by source). Per unordered source
    * pair: near-dup pair count and exact mean jaccard, plus the within
    * flag. Consumes the SAME materialized d04 pair stage — zero
    * re-shingling.
    *
    * Determinism: pair jaccards are the shared stage's verified
    * doubles, 10⁻⁶-integerized per pair before the exact mean; the
    * unordered pair key is (least, greatest) of the two sources.
    *
    * Scale shape: two doc-keyed equi-joins to attach sources, one
    * source-pair hash agg (≤ |sources|² rows). */
  val crossSourceDup: QueryDef = QueryDef(
    "d24_cross_source_dup",
    (s, d) => {
      val pairs = ngramSharedPairs(s, d)
      val src = Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("a_id"),
          col("source").as("src_a")), Seq("a_id"))
        .join(src.select(col("doc_id").as("b_id"),
          col("source").as("src_b")), Seq("b_id"))
        .select(least(col("src_a"), col("src_b")).as("src_lo"),
          greatest(col("src_a"), col("src_b")).as("src_hi"),
          expr("CAST(round(jaccard * 1000000) AS BIGINT)").as("j_ppm"))
        .groupBy("src_lo", "src_hi")
        .agg(count(lit(1)).as("n_pairs"), sum(col("j_ppm")).as("sj"))
        .withColumn("mean_j_ppm", expr("sj DIV n_pairs"))
        .withColumn("within", col("src_lo") === col("src_hi"))
        .select("src_lo", "src_hi", "n_pairs", "mean_j_ppm", "within")
        .orderBy("src_lo", "src_hi")
    },
    Some(s"""WITH ${ngramPairSql(ngramTheta)},
             j AS (
               SELECT least(da.source, db.source) AS src_lo,
                 greatest(da.source, db.source) AS src_hi,
                 CAST(round(p.jaccard * 1000000) AS BIGINT) AS j_ppm
               FROM pairs p
               JOIN documents da ON da.doc_id = p.a_id
               JOIN documents db ON db.doc_id = p.b_id)
             SELECT src_lo, src_hi, CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(j_ppm) AS BIGINT) // count(*) AS mean_j_ppm,
               src_lo = src_hi AS within
             FROM j GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** d25 — edit-distance verification of near-dup candidates (the
    * second-pass confirmation layer production dedup runs between
    * candidate generation and deletion — cf. Silcock et al. 2022's
    * human-verified pairs and RefinedWeb's audit sample: token-set
    * Jaccard is blind to word ORDER, so a character-level metric over
    * the candidate pairs catches reordered-but-distinct texts before
    * they are merged): for every pair on the shared d04 stage, the
    * exact Levenshtein distance over fixed 256-char prefixes — both
    * engines ship the same textbook DP builtin — plus the normalized
    * edit similarity and a confirmed flag at ≥ 60%.
    *
    * Determinism: lev is an exact integer on identical prefixes;
    * similarity is integer ppm over the longer prefix length (empty
    * pairs get 10⁶ by the CASE guard); jaccard rides along
    * 10⁻⁶-integerized. Scale shape: candidate-bounded — two doc-keyed
    * equi-joins attach prefixes, then a per-pair O(256²) codegen'd
    * expression; the prefix cap makes verification cost pairs-linear
    * (65 k char-ops each) regardless of document length, and NOTHING
    * here re-shingles or rescans the corpus. */
  val editDistanceVerify: QueryDef = QueryDef(
    "d25_edit_verify",
    (s, d) => {
      val pref = Tables.documents(s, d)
        .select(col("doc_id"), substring(col("text"), 1, 256).as("p"))
      ngramSharedPairs(s, d)
        .join(pref.select(col("doc_id").as("a_id"), col("p").as("pa")),
          Seq("a_id"))
        .join(pref.select(col("doc_id").as("b_id"), col("p").as("pb")),
          Seq("b_id"))
        .withColumn("j_ppm",
          expr("CAST(round(jaccard * 1000000) AS BIGINT)"))
        .withColumn("lev",
          levenshtein(col("pa"), col("pb")).cast("long"))
        .withColumn("max_len",
          greatest(length(col("pa")), length(col("pb"))).cast("long"))
        .withColumn("edit_sim_ppm",
          expr("""CASE WHEN max_len = 0 THEN CAST(1000000 AS BIGINT)
                  ELSE (1000000 * (max_len - lev)) DIV max_len END"""))
        .withColumn("confirmed", col("edit_sim_ppm") >= 600000L)
        .select("a_id", "b_id", "j_ppm", "lev", "edit_sim_ppm", "confirmed")
        .orderBy("a_id", "b_id")
    },
    Some(s"""WITH ${ngramPairSql(ngramTheta)},
             pref AS (
               SELECT doc_id, substring(text, 1, 256) AS p
               FROM documents),
             v AS (
               SELECT p.a_id, p.b_id,
                 CAST(round(p.jaccard * 1000000) AS BIGINT) AS j_ppm,
                 CAST(levenshtein(a.p, b.p) AS BIGINT) AS lev,
                 CAST(greatest(length(a.p), length(b.p)) AS BIGINT)
                   AS max_len
               FROM pairs p
               JOIN pref a ON a.doc_id = p.a_id
               JOIN pref b ON b.doc_id = p.b_id)
             SELECT a_id, b_id, j_ppm, lev,
               CASE WHEN max_len = 0 THEN CAST(1000000 AS BIGINT)
                 ELSE (1000000 * (max_len - lev)) // max_len END
                 AS edit_sim_ppm,
               (CASE WHEN max_len = 0 THEN CAST(1000000 AS BIGINT)
                 ELSE (1000000 * (max_len - lev)) // max_len END)
                 >= 600000 AS confirmed
             FROM v ORDER BY a_id, b_id"""))

  /** d26 — winnowing fingerprint selection (Schleimer, Wilkerson &
    * Aiken, SIGMOD 2003 — the MOSS algorithm: from every window of w
    * consecutive k-gram hashes keep the minimum, which GUARANTEES any
    * shared substring of length ≥ w+k−1 contributes a shared
    * fingerprint while storing only ~2/(w+1) of the grams — the
    * document-fingerprinting middle ground between d12's store-all
    * stride-1 windows and sampling schemes with no detection
    * guarantee): k = 5 char-grams, w = 4, portable 40-bit md5 hashes
    * packed with the position (h·2²¹ + i) so the per-window argmin is
    * ONE integer min with the leftmost-minimum tie rule; per doc the
    * selected-fingerprint census, the density vs the ~2/(w+1) theory
    * value, and the cross-document shared-print count (the MOSS match
    * signal).
    *
    * Determinism: md5 is the shared hash (d10's discipline); packing
    * and window mins are pure integer ops; 40-bit collisions are
    * engine-identical by construction (same md5 text both sides).
    * Scale shape: char-explode (corpus-linear, the d12 cost class),
    * ONE doc-keyed ordered window for all mins, then hash-keyed
    * equi-joins on the selected ~40% subset — never all-pairs; the
    * selected frame is localCheckpoint'd for its two consumers. */
  val winnowing: QueryDef = {
    val packShift = 2097152L // 2^21 ≥ max doc position
    def duckHash40(arg: String) = duckMd5IntSlice(arg, 2, 10)
    QueryDef(
      "d26_winnowing",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // fan-out on doc_id: parallelizes the char-gram md5 map pass
        // (the query's dominant cost, single-task on the fixture scan)
        // AND pre-establishes exactly the hashpartitioning(doc_id) the
        // selection window needs — no second exchange (r15, guide §2.5)
        val docs = Tables.fanOutForCpu(
            Tables.documents(s, d).select("doc_id", "text"), col("doc_id"))
          .select(col("doc_id"), col("text"),
            length(col("text")).as("len"))
          .filter(col("len") >= 8)
        val grams = docs
          .select(col("doc_id"), col("len"),
            posexplode(expr("sequence(1, len - 4)")).as(Seq("ord", "i")),
            col("text"))
          .select(col("doc_id"), col("len"), col("i"),
            expr(s"CAST(conv(substring(md5(substring(text, i, 5)), 2, 10), " +
              s"16, 10) AS BIGINT) * $packShift + i").as("key"))
        val sel = grams
          .withColumn("skey", min(col("key")).over(
            Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, 3)))
          .filter(col("i") <= col("len") - 7)
          .select(col("doc_id"), col("len"), col("skey"))
          .distinct()
          .localCheckpoint()
        val prints = sel
          .select(col("doc_id"), expr(s"skey DIV $packShift").as("h"))
          .distinct()
        val owners = prints.groupBy("h")
          .agg(countDistinct(col("doc_id")).as("nd"))
        val shared = prints.join(owners, "h").filter(col("nd") >= 2)
          .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
        sel.groupBy("doc_id", "len")
          .agg(count(lit(1)).as("n_selected"))
          .join(shared, Seq("doc_id"), "left")
          .na.fill(0L, Seq("n_shared"))
          .withColumn("n_grams", (col("len") - 4).cast("long"))
          .withColumn("n_windows", (col("len") - 7).cast("long"))
          .withColumn("density_ppm",
            expr("(1000000 * n_selected) DIV n_windows"))
          .select("doc_id", "n_grams", "n_windows", "n_selected",
            "density_ppm", "n_shared")
          .orderBy("doc_id")
      },
      Some(s"""WITH docs AS (
                 SELECT doc_id, text, length(text) AS len
                 FROM documents WHERE length(text) >= 8),
               grams AS (
                 -- position var is gi: duckMd5IntSlice's hex-fold lambda
                 -- binds i, which would capture an outer i (observed:
                 -- constant hashes, density 100%)
                 SELECT doc_id, len, gi,
                   ${duckHash40("substring(text, CAST(gi AS INTEGER), 5)")}
                     * $packShift + gi AS key
                 FROM docs, unnest(range(1, len - 3)) AS u(gi)),
               wins AS (
                 SELECT doc_id, len, gi,
                   min(key) OVER (PARTITION BY doc_id ORDER BY gi
                     ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS skey
                 FROM grams),
               sel AS MATERIALIZED (
                 SELECT DISTINCT doc_id, len, skey
                 FROM wins WHERE gi <= len - 7),
               prints AS MATERIALIZED (
                 SELECT DISTINCT doc_id, skey // $packShift AS h FROM sel),
               owners AS (
                 SELECT h, count(DISTINCT doc_id) AS nd
                 FROM prints GROUP BY 1),
               shared AS (
                 SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
                 FROM prints JOIN owners USING (h)
                 WHERE nd >= 2 GROUP BY 1),
               base AS (
                 SELECT doc_id, len, CAST(count(*) AS BIGINT) AS n_selected
                 FROM sel GROUP BY 1, 2)
               SELECT b.doc_id,
                 CAST(b.len - 4 AS BIGINT) AS n_grams,
                 CAST(b.len - 7 AS BIGINT) AS n_windows,
                 n_selected,
                 (1000000 * n_selected) // (b.len - 7) AS density_ppm,
                 CAST(coalesce(s.n_shared, 0) AS BIGINT) AS n_shared
               FROM base b LEFT JOIN shared s ON b.doc_id = s.doc_id
               ORDER BY b.doc_id"""))
  }

  /** d27's threshold — the high-band near-dup regime where prefix
    * filtering pays (see [[prefixFilterPairs]]). */
  val prefixTheta = 0.80

  /** d27 — prefix-filtered exact similarity self-join (Chaudhuri et
    * al. ICDE 2006 prefix filter; Bayardo et al. WWW 2007 all-pairs;
    * Vernica et al. SIGMOD 2010 for the symmetric self-join form):
    * the OTHER standard candidate generator next to the repo's
    * banding family (d02/d09 MinHash/SimHash bands) — and unlike
    * banding it is LOSSLESS: under any total token order, two sets
    * with Jaccard ≥ θ must share a token inside their length
    * |s| − ⌈θ·|s|⌉ + 1 prefixes, so candidates-from-prefixes followed
    * by exact verification returns EXACTLY d04's pair set (the spec
    * asserts row equality). The global order is rarest-first
    * (frequency ASC), which is what shrinks the inverted index: hub
    * shingles shared by thousands of docs fall OUTSIDE most prefixes,
    * so the candidate join never fans out on them — the d04 full-index
    * join's worst key is exactly such a hub.
    *
    * Spark side runs on xxhash64 fingerprints, the mirror on raw
    * shingles (d04's documented hash-collision-exact pattern); the
    * two sides' prefix ORDERS differ, but losslessness holds under
    * any order, so the verified outputs agree. θ = [[prefixTheta]]
    * = 0.80 — prefix filtering's natural regime is HIGH thresholds
    * (the near-dup band: every fixture dup pair sits ≥ 0.9): the
    * prefix keeps n − ⌈0.8n⌉ + 1 ≈ 20% of n shingles (the code's
    * `(4·n+4) DIV 5` is ⌈0.8n⌉), whereas at d04's θ = 0.2 the prefix
    * would keep 80%+ and the filter degenerates to the full inverted
    * index. The spec asserts d27 equals d04's pair set filtered to
    * jaccard ≥ 0.8 — both are exact-verified, so the sets must
    * coincide.
    *
    * Scale shape: one freq agg, one doc-keyed ranking window, a
    * prefix-restricted equi self-join (the candidate generator), and
    * a candidate-BOUNDED exact verify (cand ⋈ a-set ⋈ b-set equi
    * joins) — no all-pairs, no full inverted-index pair blowup. */
  val prefixFilterPairs: QueryDef = QueryDef(
    "d27_prefix_filter_pairs",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val sh = Tables.fanOutForCpu(
          Tables.documents(s, d).select("doc_id", "text"), col("doc_id"))
        .select(col("doc_id"), explode(expr(shingleExpr("text"))).as("sh"))
        .select(col("doc_id"), xxhash64(col("sh")).as("sh"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val freq = sh.groupBy("sh").agg(count(lit(1)).as("fr"))
      val w = Window.partitionBy("doc_id").orderBy(col("fr"), col("sh"))
      val pref = sh.join(freq, "sh")
        .withColumn("pos", row_number().over(w))
        .withColumn("n_sh",
          count(lit(1)).over(Window.partitionBy("doc_id")))
        .filter(expr("pos <= n_sh - ((4 * n_sh + 4) DIV 5) + 1"))
        .select("doc_id", "sh")
        // persisted: both sides of the candidate self-join read pref —
        // unpersisted, the freq join + two windows ran TWICE (r15
        // Profile: two ~0.9 s duplicate job pairs inside d27's action)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cand = pref.select(col("doc_id").as("a_id"), col("sh"))
        .join(pref.select(col("doc_id").as("b_id"), col("sh")), Seq("sh"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
      val inter = cand
        .join(sh.select(col("doc_id").as("a_id"), col("sh")), Seq("a_id"))
        .join(sh.select(col("doc_id").as("b_id"), col("sh")),
          Seq("b_id", "sh"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_inter"))
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val out = inter
        .join(sizes.select(col("doc_id").as("a_id"),
          col("n_sh").as("n_a")), "a_id")
        .join(sizes.select(col("doc_id").as("b_id"),
          col("n_sh").as("n_b")), "b_id")
        .withColumn("jaccard",
          col("n_inter").cast("double") /
            (col("n_a") + col("n_b") - col("n_inter")))
        .filter(col("jaccard") >= prefixTheta)
        .select("a_id", "b_id", "jaccard")
        .orderBy("a_id", "b_id")
        .localCheckpoint()
      sh.unpersist()
      pref.unpersist()
      out
    },
    Some(s"""WITH toks AS (
               SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             sh AS MATERIALIZED (
               SELECT DISTINCT doc_id,
                 array_to_string(t[i + 1:i + 3], ' ') AS sh
               FROM toks,
                 unnest(range(0, greatest(len(t) - 2, 1))) AS u(i)),
             sizes AS MATERIALIZED (
               SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
             fr AS MATERIALIZED (
               SELECT sh, count(*) AS fr FROM sh GROUP BY 1),
             pref AS MATERIALIZED (
               SELECT doc_id, sh FROM (
                 SELECT s.doc_id, s.sh,
                   row_number() OVER (PARTITION BY s.doc_id
                     ORDER BY f.fr, s.sh) AS pos,
                   z.n_sh
                 FROM sh s JOIN fr f USING (sh)
                 JOIN sizes z USING (doc_id)) q
               WHERE pos <= n_sh - ((4 * n_sh + 4) // 5) + 1),
             cand AS MATERIALIZED (
               SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
               FROM pref a JOIN pref b
                 ON a.sh = b.sh AND a.doc_id < b.doc_id),
             ic AS (
               SELECT c.a_id, c.b_id, count(*) AS n_inter
               FROM cand c
               JOIN sh sa ON sa.doc_id = c.a_id
               JOIN sh sb ON sb.doc_id = c.b_id AND sb.sh = sa.sh
               GROUP BY 1, 2)
             SELECT a_id, b_id,
               CAST(n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - n_inter)
                 AS jaccard
             FROM ic
             JOIN sizes za ON za.doc_id = a_id
             JOIN sizes zb ON zb.doc_id = b_id
             WHERE CAST(n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - n_inter)
               >= $prefixTheta
             ORDER BY a_id, b_id"""))

  val all: Seq[QueryDef] =
    Seq(exact, exactByFingerprint, minhash, minhashNative, simhashPairs,
      ngramJaccard, embeddingCosine, components, simhashBanded, minhashMd5,
      simhashMd5Banded, substringSpans, spanRemoval, semanticDedup,
      incrementalSemantic, containmentPairs, minhashCalibration,
      normalizedExact, cdcChunking, dedupEval, simhashMultiProbe,
      containmentSketchEval, clusterCoherence, crossSourceDup,
      editDistanceVerify, winnowing, prefixFilterPairs)
}
