package graft.ext

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.QueryDef

/** Graph analytics over relationally-derived graphs (extended surface,
  * same family as d07's connected components): centrality scoring of
  * the part↔supplier bipartite graph induced by lineitem.
  *
  * Determinism discipline: PageRank is usually float — and float
  * accumulation order makes it engine- and partitioning-dependent. Here
  * every score is SCALED INTEGER arithmetic (score×10⁹; damping 0.85 as
  * `(85·x) DIV 100`; contributions as `s DIV deg`): long sums are
  * order-independent, so the result is bit-identical on any engine,
  * thread count, or cluster size, and the DuckDB oracle mirrors the
  * iterations as unrolled CTEs.
  *
  * Scale shape: each iteration is ONE equi-join of the edge list with
  * the score vector plus one key-partitioned aggregate — the standard
  * distributed PR round (Malewicz et al., "Pregel", SIGMOD 2010, §4.1).
  * The iteration count is FIXED (3), so lineage stays bounded without
  * checkpointing; longer runs would adopt d07's localCheckpoint
  * discipline. Degrees are joined once up front, not per round.
  */
object Graph {

  private val Scale = 1000000000L // score fixed-point: 1.0 == 10^9
  private val SuppOffset = 1000000000L // node-id space split
  private val Iters = 3

  /** g01 — fixed-point PageRank (3 rounds, damping 0.85) over the
    * part↔supplier graph; top-20 nodes by final score. */
  val pagerank: QueryDef = QueryDef(
    "g01_pagerank_fixedpoint",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey").as("p"),
          (col("l_suppkey") + SuppOffset).as("sup"))
        .distinct()
      // undirected: both directions materialized once
      val e = li.select(col("p").as("u"), col("sup").as("v"))
        .union(li.select(col("sup").as("u"), col("p").as("v")))
      val deg = e.groupBy("u").agg(count(lit(1)).as("deg"))
      val ec = e.join(deg, "u") // (u, v, deg) — degree joined ONCE
      var sc = deg.select(col("u").as("id"), lit(Scale).as("s"))
      for (_ <- 1 to Iters) {
        sc = ec.join(sc, ec("u") === sc("id"))
          .select(col("v"), expr("s DIV deg").as("c"))
          .groupBy("v")
          .agg(expr(s"CAST(${Scale * 15 / 100} AS BIGINT) + " +
            "(85 * sum(c)) DIV 100").as("s"))
          .select(col("v").as("id"), col("s"))
      }
      sc.select(
        expr(s"CASE WHEN id >= $SuppOffset THEN 'supplier' ELSE 'part' END")
          .as("kind"),
        expr(s"CASE WHEN id >= $SuppOffset THEN id - $SuppOffset ELSE id END")
          .as("node_id"),
        col("s").as("score"))
        .orderBy(col("score").desc, col("kind"), col("node_id"))
        .limit(20)
    },
    Some {
      val base =
        s"""li AS (SELECT DISTINCT l_partkey AS p,
                     l_suppkey + $SuppOffset AS sup FROM lineitem),
            e AS (SELECT p AS u, sup AS v FROM li
                  UNION ALL SELECT sup, p FROM li),
            deg AS (SELECT u, count(*) AS deg FROM e GROUP BY 1),
            ec AS (SELECT e.u, e.v, deg.deg FROM e JOIN deg USING (u)),
            s0 AS (SELECT u AS id, CAST($Scale AS BIGINT) AS s FROM deg)"""
      val rounds = (1 to Iters).map { i =>
        s"""s$i AS (SELECT ec.v AS id,
                      ${Scale * 15 / 100} + (85 * sum(s${i - 1}.s // ec.deg)) // 100 AS s
                    FROM ec JOIN s${i - 1} ON s${i - 1}.id = ec.u
                    GROUP BY ec.v)"""
      }.mkString(",\n")
      s"""WITH $base,
          $rounds
          SELECT CASE WHEN id >= $SuppOffset THEN 'supplier' ELSE 'part' END
                   AS kind,
                 CAST(CASE WHEN id >= $SuppOffset THEN id - $SuppOffset
                      ELSE id END AS BIGINT) AS node_id,
                 CAST(s AS BIGINT) AS score
          FROM s$Iters
          ORDER BY score DESC, kind, node_id
          LIMIT 20"""
    })

  val all: Seq[QueryDef] = Seq(pagerank)
}
