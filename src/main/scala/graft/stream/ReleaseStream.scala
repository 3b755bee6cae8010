package graft.stream

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Curation, Dedup}

/** Streaming form of x28's release pipeline (VERDICT r5/r6 next-step):
  * the gate → exact-dedup → leakage-safe cluster split → manifest chain
  * as a `foreachBatch` admission loop over persisted state, so a corpus
  * release stays current as documents arrive instead of being rebuilt
  * from scratch (x27's "a 100 TB corpus cannot afford the from-scratch
  * manifest", applied to the whole release).
  *
  * State under `stateDir` (parquet, overwritten per trigger after an
  * eager localCheckpoint):
  *  - `docs/` — EVERY arrived doc (x28 computes cluster labels over the
  *    full corpus, so gate-failed docs are graph nodes too — a
  *    discarded doc can bridge two clusters or be the component min
  *    that decides the split): doc_id, lang, text, tmd5, gated,
  *    survivor, n_tokens, cfp, sh (distinct xxhash64'd word
  *    3-shingles), root;
  *  - `manifest/` — the running per-(split, lang) release manifest,
  *    PATCHED per trigger with x27's composition (counts add, XOR
  *    fingerprints compose — never rebuilt);
  *  - `_batch_<id>` markers — replayed batchIds are skipped, the
  *    idempotence discipline of [[Events.idempotentBatchWriter]] (an
  *    XOR patch would cancel itself on redelivery).
  *
  * Per trigger:
  *  1. d01 survivorship over gated docs per text is recomputed for the
  *     AFFECTED texts only (min doc_id globally — a later-arriving
  *     smaller id takes survivorship from its stored twin and the twin
  *     is patched out of the manifest);
  *  2. near-dup pairs of the new docs against stored shingle sets —
  *     d04's exact inverted-index jaccard, no LSH recall loss (x20's
  *     band index is the documented approximate variant), so the
  *     stream==batch theorem is exact;
  *  3. connected components over STAR EDGES (doc → root) of the
  *     TOUCHED components ∪ fresh pairs. Star edges preserve
  *     historical connectivity and component minima, and components
  *     untouched by fresh pairs keep their labels — the CC cost per
  *     trigger is bounded by the components the batch actually
  *     touches, not the corpus;
  *  4. every doc whose (survivor, split-of-root) changed contributes a
  *     negative (old state) and/or positive (new state) manifest term —
  *     a bridge doc merging two clusters re-roots and split-flips whole
  *     clusters, and the patch composes it exactly.
  *
  * The spec IS the theorem (the x06/x20/d14 equality-to-batch pattern):
  * after any trigger sequence — bridges, out-of-order exact twins,
  * replayed batches — [[manifest]] equals x28's batch output over the
  * union of all arrived documents, bit-exactly.
  *
  * Scale notes: per trigger, state maintenance rewrites `docs/` (in
  * production: a partitioned table with only touched partitions
  * rewritten, or a MERGE-capable format — the repo's Sinks cover the
  * write patterns); pair probing is batch-shingles × inverted index
  * (equi-join, never corpus²); CC is bounded to touched components;
  * the manifest patch is delta-sized. Keeping gate-failed docs' shingle
  * sets is the price of the exact full-corpus label semantics — a
  * deployment would prune them past its dedup horizon and accept the
  * documented drift. */
object ReleaseStream {

  private val minTok = 20
  private val theta = Dedup.ngramTheta

  private def docsDir(stateDir: String) = s"$stateDir/docs"
  private def manifestDir(stateDir: String) = s"$stateDir/manifest"

  private def splitOf(rootCol: String): String =
    s"CASE WHEN substring(md5(CAST($rootCol AS STRING)), 1, 1) " +
      "IN ('0', '1') THEN 'eval' ELSE 'train' END"

  /** Batch rows (doc_id, lang, text) → full per-doc state rows (root
    * still unset). */
  private def prep(batch: DataFrame): DataFrame =
    batch
      .withColumn("tmd5", md5(col("text")))
      .withColumn("gated", Curation.qualityGatePred(minTok))
      .withColumn("n_tokens", expr(Curation.sparkTokCount).cast("long"))
      .withColumn("cfp", expr(Dedup.sparkMd5Int60(
        "concat_ws(':', doc_id, text)")))
      .withColumn("sh", expr(
        s"array_distinct(transform(${Dedup.shingleExpr("text")}, " +
          "x -> xxhash64(x)))"))

  /** One trigger of the admission loop; bind with
    * `ds.writeStream.foreachBatch(ReleaseStream.processBatch(spark, dir) _)`.
    * Batch schema: (doc_id: long, lang: string, text: string). */
  def processBatch(spark: SparkSession, stateDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val marker = new File(s"$stateDir/_batch_$batchId")
    if (marker.exists()) return // replayed trigger: already applied
    new File(stateDir).mkdirs()

    val hasState = new File(docsDir(stateDir)).exists()
    val st = if (hasState) spark.read.parquet(docsDir(stateDir))
      else prep(batch.filter(lit(false)))
        .select(col("doc_id"), col("lang"), col("text"), col("tmd5"),
          col("gated"), lit(false).as("survivor"), col("n_tokens"),
          col("cfp"), col("sh"), col("doc_id").as("root"))
    // doc-level redelivery guard: a doc_id already admitted is final
    val b = prep(batch)
      .join(st.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .localCheckpoint()

    // 2. fresh near-dup pairs: new docs × (stored ∪ new), exact d04
    // jaccard on distinct hashed shingles
    val allSh = st.select(col("doc_id"), col("sh"))
      .unionByName(b.select(col("doc_id"), col("sh")))
    val bx = b.select(col("doc_id").as("n_id"), explode(col("sh")).as("h"))
    val ax = allSh.select(col("doc_id").as("o_id"), explode(col("sh")).as("h"))
    val cand = bx.join(ax, Seq("h"))
      .filter(col("n_id") =!= col("o_id"))
      .select(least(col("n_id"), col("o_id")).as("a_id"),
        greatest(col("n_id"), col("o_id")).as("b_id"))
      .distinct()
    val fresh = cand
      .join(allSh.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(allSh.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .withColumn("n_inter", size(array_intersect(col("a_sh"), col("b_sh"))))
      .filter(col("n_inter").cast("double") /
        (size(col("a_sh")) + size(col("b_sh")) - col("n_inter")) >= theta)
      .select("a_id", "b_id")
      .localCheckpoint()

    // 3. incremental CC: only components touched by fresh pairs re-run;
    // star edges preserve connectivity AND the component min (the root
    // is itself a member), so labels equal batch CC over all pairs
    val seedIds = fresh.select(col("a_id").as("doc_id"))
      .union(fresh.select(col("b_id").as("doc_id"))).distinct()
    val seedRoots = st.join(seedIds, Seq("doc_id")).select("root").distinct()
    val subStar = st.join(broadcast(seedRoots), Seq("root"))
      .filter(col("root") =!= col("doc_id"))
      .select(col("doc_id").as("a_id"), col("root").as("b_id"))
    val labels = Dedup.connectedComponents(subStar.union(fresh))
      .select(col("id").as("doc_id"), col("component"))

    // 1. d01 survivorship recomputed for texts the batch touches
    val affected = b.select("tmd5").distinct()
    val survNew = st.select(col("doc_id"), col("tmd5"), col("gated"))
      .union(b.select(col("doc_id"), col("tmd5"), col("gated")))
      .join(affected, Seq("tmd5"))
      .filter(col("gated"))
      .groupBy("tmd5").agg(min(col("doc_id")).as("s_id"))

    val upd = st
      .unionByName(b.select(col("doc_id"), col("lang"), col("text"), col("tmd5"),
        col("gated"), lit(false).as("survivor"), col("n_tokens"),
        col("cfp"), col("sh"), col("doc_id").as("root")))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("root2", coalesce(col("component"), col("root")))
      .join(survNew, Seq("tmd5"), "left")
      .withColumn("survivor2",
        when(col("s_id").isNotNull,
          col("gated") && col("doc_id") === col("s_id"))
          .otherwise(col("survivor")))
      .localCheckpoint()

    // 4. manifest patch: one negative term per doc leaving (survivor,
    // split) state, one positive term per doc entering one
    val changed = upd.filter(
      col("survivor2") =!= col("survivor") ||
        (col("survivor2") && col("survivor") &&
          expr(splitOf("root2")) =!= expr(splitOf("root"))))
    val neg = changed.filter(col("survivor"))
      .select(expr(splitOf("root")).as("split"), col("lang"),
        lit(-1L).as("nd"), (-col("n_tokens")).as("nt"), col("cfp"))
    val pos = changed.filter(col("survivor2"))
      .select(expr(splitOf("root2")).as("split"), col("lang"),
        lit(1L).as("nd"), col("n_tokens").as("nt"), col("cfp"))
    val delta = neg.union(pos)
      .groupBy("split", "lang")
      .agg(sum(col("nd")).as("d_docs"), sum(col("nt")).as("d_tokens"),
        expr("bit_xor(cfp)").as("d_fp"))
    val prev =
      if (new File(manifestDir(stateDir)).exists())
        spark.read.parquet(manifestDir(stateDir))
      else delta.filter(lit(false))
        .select(col("split"), col("lang"), col("d_docs").as("n_docs"),
          col("d_tokens").as("total_tokens"), col("d_fp").as("content_fp"))
    val patched = prev.join(delta, Seq("split", "lang"), "full_outer")
      .select(col("split"), col("lang"),
        (coalesce(col("n_docs"), lit(0L)) + coalesce(col("d_docs"), lit(0L)))
          .as("n_docs"),
        (coalesce(col("total_tokens"), lit(0L))
          + coalesce(col("d_tokens"), lit(0L))).as("total_tokens"),
        (coalesce(col("content_fp"), lit(0L))
          .bitwiseXOR(coalesce(col("d_fp"), lit(0L)))).as("content_fp"))
      .filter(col("n_docs") > 0)
      .localCheckpoint()

    val nextDocs = upd
      .select(col("doc_id"), col("lang"), col("text"), col("tmd5"),
        col("gated"), col("survivor2").as("survivor"), col("n_tokens"),
        col("cfp"), col("sh"), col("root2").as("root"))
      .localCheckpoint()

    nextDocs.write.mode("overwrite").parquet(docsDir(stateDir))
    patched.write.mode("overwrite").parquet(manifestDir(stateDir))
    marker.createNewFile()
  }

  /** The running release manifest — schema and order of x28's batch
    * output. */
  def manifest(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(manifestDir(stateDir))
      .orderBy("split", "lang")
}
