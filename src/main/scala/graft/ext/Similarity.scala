package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector

import graft.core.Tables
import graft.queries.QueryDef

/** Similarity search over the embeddings table (SURVEY §2.9 extended
  * surface): brute-force cosine top-k as the exact baseline, and a
  * random-projection LSH bucketed variant as the 100 TB scale path.
  */
object Similarity {

  /** s01 — brute-force cosine top-k. Query set (vec_id < 10) is broadcast
    * against all candidates; per-query top-5 via a ranking window.
    * Cosine is the same sequential double fold on both engines →
    * bit-identical, so the top-k ordering agrees exactly (nid tiebreak).
    * Scale shape: broadcast the (bounded) query set, never shuffle the
    * corpus; the window partitions by query id. */
  val cosineTopK: QueryDef = {
    val k = 5
    QueryDef(
      "s01_cosine_topk",
      (s, d) => {
        graft.expr.ArrayDot.register(s)
        val q = Dedup.normalized(s, d, "q_id", "q_u").filter(col("q_id") < 10)
        val c = Dedup.normalized(s, d, "n_id", "n_u")
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos_sim").desc, col("n_id"))
        broadcast(q).join(c, col("q_id") =!= col("n_id"))
          .withColumn("cos_sim", expr("array_dot(q_u, n_u)"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k)
          .select("q_id", "n_id", "cos_sim", "rn")
          .orderBy("q_id", "rn")
      },
      Some(s"""WITH ${Dedup.normalizedSql},
               p AS (
                 SELECT a.vec_id AS q_id, b.vec_id AS n_id,
                   ${Dedup.pairDotSql} AS cos_sim
                 FROM u a JOIN u b ON a.vec_id < 10 AND b.vec_id != a.vec_id),
               r AS (
                 SELECT q_id, n_id, cos_sim,
                   CAST(row_number() OVER (PARTITION BY q_id
                        ORDER BY cos_sim DESC, n_id) AS INTEGER) AS rn
                 FROM p)
               SELECT q_id, n_id, cos_sim, rn FROM r WHERE rn <= $k
               ORDER BY q_id, rn"""))
  }

  /** s02 — approximate nearest neighbors via random-projection LSH
    * (euclidean family). Seeded and deterministic, but the hash family is
    * engine-specific → rows-only check. At 100 TB the bucket join touches
    * only same-bucket candidates instead of the full cross product. */
  val annLsh: QueryDef = QueryDef(
    "s02_ann_lsh",
    (s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"),
          array_to_vector(col("embedding").cast("array<double>")).as("features"))
      val lsh = new BucketedRandomProjectionLSH()
        .setInputCol("features").setOutputCol("hashes")
        .setBucketLength(2.0).setNumHashTables(4).setSeed(42)
      val model = lsh.fit(e)
      val q = e.filter(col("vec_id") < 10)
      model.approxSimilarityJoin(q, e, 1.5, "euclid_dist")
        .select(
          col("datasetA.vec_id").as("q_id"),
          col("datasetB.vec_id").as("n_id"),
          col("euclid_dist"))
        .filter(col("q_id") =!= col("n_id"))
        .orderBy("q_id", "n_id")
    },
    None)

  val all: Seq[QueryDef] = Seq(cosineTopK, annLsh)
}
