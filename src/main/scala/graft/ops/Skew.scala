package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for joins whose key distribution is heavy-
  * tailed (the 100 TB discipline, SURVEY §4.3). AQE's skew-join split
  * handles sort-merge skew automatically; explicit salting is for the
  * cases AQE can't fix — e.g. a shuffled hash join against a
  * medium-sized build side, or aggregation hotspots.
  */
object Skew {

  /** Salted equi-join: the skewed (left) side gets a random salt in
    * [0, saltFactor); the right side is replicated saltFactor× with every
    * salt value, so each hot key fans out over saltFactor reducers.
    *
    * Semantics-preserving for inner joins on `key`. The salt column uses
    * a fixed seed so retried tasks salt identically (required for
    * deterministic shuffle replay).
    */
  def saltedJoin(
      skewed: DataFrame,
      dim: DataFrame,
      key: String,
      saltFactor: Int = 8,
      seed: Long = 42L): DataFrame = {
    val salted = skewed.withColumn("__salt",
      (rand(seed) * saltFactor).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted) aggregation for hot grouping keys: partial
    * aggregate on (key, salt), then final aggregate on key. `partial`
    * and `merge` must form an associative pair (e.g. sum/sum,
    * count/sum). */
  def saltedSum(
      df: DataFrame,
      key: String,
      valueCol: String,
      saltFactor: Int = 8,
      seed: Long = 42L): DataFrame =
    df.withColumn("__salt", (rand(seed) * saltFactor).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))

  /** Top-k hottest keys with their frequencies — the diagnostic used to
    * decide whether salting is warranted. */
  def keyHistogram(df: DataFrame, key: String, k: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key)).limit(k)
}
