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
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy("day_part")
    },
    Some(s"""SELECT ${DayPart.caseSql("hhmm")} AS day_part,
             count(*) AS n, round(sum(value), 4) AS sum_value
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

  val all: Seq[QueryDef] = Seq(daypart, sketch, approxProfile, topkOperator)
}
