package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ext.{Dedup, Similarity}

/** Executable plan audit — the 100 TB discipline checks (SURVEY §4.3 /
  * builder prompt): filters and projections reach the parquet scan,
  * bounded dims broadcast, aggregates have a map-side partial phase, the
  * range join is an equi-keyed sort-merge (never a cartesian), and hot
  * paths stay inside WholeStageCodegen.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q01: predicate and projection pushed to the parquet scan") {
    val p = plan(Relational.q01.build(spark, sf))
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(l_quantity,30"), p)
    // pruned read schema — only the 4 referenced columns
    assert(p.contains("l_extendedprice") && !p.contains("l_shipdate"), p)
  }

  test("q02: hash aggregate has a map-side partial phase") {
    val p = plan(Relational.q02.build(spark, sf))
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_"), p)
  }

  test("q04/q05: bounded dims are broadcast, fact side never shuffles for the join") {
    assert(plan(Relational.q04.build(spark, sf)).contains("BroadcastHashJoin"))
    val p5 = plan(Relational.q05.build(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p5).size >= 2, p5)
    assert(!p5.contains("SortMergeJoin"), p5)
  }

  test("q07/q08: existence joins plan as semi/anti hash joins") {
    assert(plan(Relational.q07.build(spark, sf)).contains("LeftSemi"))
    assert(plan(Relational.q08.build(spark, sf)).contains("LeftAnti"))
  }

  test("q10: range join keys on the equi conjunct (no cartesian/nested-loop)") {
    val p = plan(Relational.q10.build(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // equi-keyed join with the range as residual: SMJ/SHJ at scale, BHJ
    // when one side fits the broadcast threshold (as at sf0.001).
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("q15: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = plan(Relational.q15.build(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  /** Codegen stars only appear once AQE has finalized the plan — run the
    * query, then read the executed plan. */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.explainString(ExplainMode.fromString("simple"))
  }

  test("scan+filter+project chains run inside WholeStageCodegen") {
    // simple mode marks codegen'd operators with a '*(n)' star
    val p = finalPlan(Relational.q19.build(spark, sf))
    assert(p.contains("*("), p)
  }

  test("e01: the custom DayPart expression stays codegen'd (no fallback)") {
    val p = finalPlan(Extensions.daypart.build(spark, sf))
    // the aggregate fed by the day_part projection carries a codegen star
    assert(p.linesIterator.exists(l =>
      l.contains("*(") && l.contains("HashAggregate")), p)
  }

  test("filters push through the deterministic day_part projection to the scan") {
    // the reference marked its UDFs nondeterministic, BLOCKING pushdown
    // (SURVEY §4.2); the native expression must not.
    graft.expr.DayPart.register(spark)
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("dp", org.apache.spark.sql.functions.expr(
        "day_part(CAST(l_linenumber * 100 AS INT))"))
      .filter(org.apache.spark.sql.functions.col("l_quantity") > 30)
    val p = plan(df)
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(l_quantity,30"), p)
  }

  test("s01: query side broadcasts; corpus side is never shuffled") {
    val p = plan(Similarity.cosineTopK.build(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q21: scale plan has no window and no single-partition exchange") {
    val p = plan(Relational.q21.build(spark, sf))
    assert(!p.contains("Window"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("runtime bloom filter prunes the fact scan when a selective dim join can't broadcast") {
    // the 100 TB case: a filtered dim too big to broadcast still cuts
    // the fact-side shuffle via an AQE-injected bloom filter. Thresholds
    // forced so the sf0.001 fixture exercises the same plan rewrite.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val sfDir = sf
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val p = plan(li.join(o, li("l_orderkey") === o("o_orderkey")))
      assert(p.contains("bloom_filter_agg"), p.take(2000))
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("q42: SQL-text plan matches the DataFrame discipline (broadcast dims, top-k sort)") {
    val p = plan(Relational.q42.build(spark, sf))
    // Catalyst plans the ANSI text like the DataFrame forms: bounded
    // dims broadcast, the LIMIT 10 plans TakeOrderedAndProject
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q43: all five snowflake dims broadcast; one agg exchange; no cartesian") {
    val p = plan(Relational.q43.build(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    // region, nation, supplier, customer all build broadcast sides —
    // the only SortMergeJoin/shuffle permitted is orders⋈lineitem
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4, p)
    assert(!p.contains("SinglePartition") || p.contains("TakeOrdered"), p)
  }

  test("e06: candidate summary broadcasts; confirm pass is a partial agg") {
    val p = plan(Extensions.heavyHitters.build(spark, sf))
    // the 1-row (candidates, n_total) summary joins in via broadcast —
    // the corpus-side tokens are filtered map-side, never cross-shuffled
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
  }

  test("g03: the peel loop's plan depth stays bounded (checkpointed rounds)") {
    // after 4 checkpointed rounds the plan must hang off scanned
    // checkpoint RDDs, not re-derive lineitem — same discipline as d07
    val df = graft.ext.Graph.kcore.build(spark, sf)
    val p = plan(df)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("Scan parquet"), p)
  }

  test("q44: distribution windows partition by the bounded key — no global window") {
    val p = plan(Relational.q44.build(spark, sf))
    assert(p.contains("Window"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q45: tainted NOT IN plans as a single-column null-aware anti join") {
    val df = Relational.q45.build(spark, sf)
    // the flag doesn't print in formatted explain — inspect the node
    val naaj = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.isNullAwareAntiJoin => j
    }
    assert(naaj.nonEmpty, df.queryExecution.sparkPlan.toString)
    assert(!plan(df).contains("CartesianProduct"))
  }

  test("join-strategy hints are honored (BROADCAST, MERGE, SHUFFLE_HASH)") {
    // the manual override lever for when the optimizer's stats are
    // wrong at 100 TB — each hint must actually flip the physical join
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val c = spark.read.parquet(s"$sf/customer.parquet")
    def joined(hint: String) =
      plan(o.join(c.hint(hint), o("o_custkey") === c("c_custkey")))
    assert(joined("broadcast").contains("BroadcastHashJoin"))
    assert(joined("merge").contains("SortMergeJoin"))
    assert(joined("shuffle_hash").contains("ShuffledHashJoin"))
  }

  test("q35: row-level joins are broadcast equi joins; no cartesian on rows") {
    val p = plan(Relational.q35.build(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    // the name-pair list broadcasts into equi joins over the part rows;
    // the only nested loop allowed is the vocab² name-domain cross join
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("d01: exact dedup is a single hash aggregate, no join") {
    val p = plan(Dedup.exact.build(spark, sf))
    assert(p.contains("HashAggregate") && !p.contains("Join"), p)
  }

  test("d11: banded simhash candidates come from equi joins, never all-pairs") {
    val p = plan(Dedup.simhashMd5Banded.build(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join"), p)
  }

  test("s04: hyperplane ANN joins on the bucket key with a broadcast query side") {
    val p = plan(Similarity.annHyperplane.build(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q38: LATERAL decorrelates to a ranked equi-join, not per-row subplans") {
    val p = plan(Relational.q38.build(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the decorrelated shape ranks customers once in a Window and
    // equi-joins nations against the ranked rows — not N executions
    // of the inner ORDER BY/LIMIT subquery
    assert(p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }

  test("q39: LOCF window partitions by user — no single-partition exchange") {
    val p = plan(Relational.q39.build(spark, sf))
    assert(!p.contains("Exchange SinglePartition, ENSURE"), p)
    assert(p.contains("Window"), p)
  }

  test("x02/t07: ranked-limit windows get the map-side WindowGroupLimit pushdown") {
    // the property that makes per-key top-k survive 100 TB: each map task
    // keeps only k rows per key BEFORE the shuffle, so the exchange moves
    // O(partitions·k) rows per key, not the whole stratum
    val px = plan(graft.ext.Curation.sampleStratifiedHash.build(spark, sf))
    assert("WindowGroupLimit".r.findAllIn(px).size >= 2, px)
    val pt = plan(graft.ext.TextAnalysis.tfidfExact.build(spark, sf))
    assert("WindowGroupLimit".r.findAllIn(pt).size >= 2, pt)
  }

  test("e05: the k-min sketch plans TakeOrdered heaps, never a global sort") {
    val p = plan(Extensions.kmvSketch.build(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    // no full sort of the hash column — only the final 2-row output sort
    assert(!p.contains("Sort [h"), p)
  }

  test("t10/t11: corpus-model join-backs are equi joins, no all-pairs") {
    for (q <- Seq(graft.ext.TextAnalysis.gramCommonness,
        graft.ext.TextAnalysis.bigramFluency)) {
      val p = plan(q.build(spark, sf))
      assert(!p.contains("CartesianProduct"), s"${q.name}\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"${q.name}\n$p")
    }
    // t11's model window partitions by w1 — never a global window
    val p11 = plan(graft.ext.TextAnalysis.bigramFluency.build(spark, sf))
    assert(!p11.contains("Exchange SinglePartition, [plan_id"), p11)
  }

  test("st08: per-window k-min rank gets the WindowGroupLimit map-side prune") {
    val p = plan(graft.stream.Events.windowSketchQ.build(spark, sf))
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p)
  }

  test("m04: probe side broadcasts; corpus embeds in place, never shuffled") {
    val p = plan(graft.ext.Multimodal.embedTopk.build(spark, sf))
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // top-5-per-probe rank window is map-side pruned too
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("d13: centroids broadcast to the assignment map; pair stage is an equi join on cluster") {
    graft.expr.ArrayDot.register(spark)
    val u = Dedup.normalized(spark, sf, "id", "u")
    // assignment pass: bounded centroid set broadcast, corpus untouched
    // by any shuffle until the (windowed) per-vector argmax
    val cents = u.filter(org.apache.spark.sql.functions.col("id") < 16)
    val pAssign = plan(u.crossJoin(
      org.apache.spark.sql.functions.broadcast(cents
        .select(org.apache.spark.sql.functions.col("id").as("c_id"),
          org.apache.spark.sql.functions.col("u").as("c_u")))))
    assert(pAssign.contains("BroadcastNestedLoopJoin"), pAssign)
    // full registered pipeline: candidate pairs only ever join on the
    // cluster key — no all-pairs nested loop anywhere
    val p = plan(Dedup.semanticDedup.build(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p) // centroid cross only
  }

  test("d14: probe join is equi-keyed on cluster; only the centroid cross is nested-loop") {
    graft.expr.ArrayDot.register(spark)
    val p = plan(Dedup.incrementalSemantic.build(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
  }

  test("x24: chunking is a narrow map — no join, no aggregate, one generator") {
    val p = plan(graft.ext.Curation.chunkByTokens(
      graft.core.Tables.documents(spark, sf), 32, 24))
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p)
    assert(!p.contains("Exchange"), p)
    assert(p.contains("Generate"), p)
  }

  test("x25: manifest pipeline has no join; gate/chunk/fingerprint stay map-side") {
    val p = plan(graft.ext.Curation.trainingManifest.build(spark, sf))
    assert(!p.contains("Join"), p)
    assert(p.contains("HashAggregate") && p.contains("partial_"), p)
    assert(p.contains("Generate"), p) // the chunk explode, inline in the scan pass
  }

  test("t14: classification is shuffle-free — argmax stays in the row") {
    val p = plan(graft.ext.TextAnalysis.classifyDomains(
      graft.core.Tables.documents(spark, sf)))
    assert(!p.contains("Exchange") && !p.contains("Window") &&
      !p.contains("Join"), p)
  }

  test("runtime bloom-filter join injection prunes the fact side of a selective shuffle join") {
    // the 100 TB join-pruning feature: when a selective dim filters a
    // shuffled fact join, Catalyst injects a bloom filter built from
    // the dim side as a runtime predicate on the fact scan — rows that
    // cannot join are dropped BEFORE the shuffle. Assert the rewrite
    // fires under the documented confs on this Spark.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force a shuffle join
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions.col
      val li = graft.core.Tables.lineitem(spark, sf)
      val ord = graft.core.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
        optimized.contains("BloomFilterMightContain") ||
        optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n${optimized.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
