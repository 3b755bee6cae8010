package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Adjacent-in-sorted-order (part, part) co-occurrence pairs per
    * order — the LINEAR edge generator every co-occurrence graph query
    * shares (one row per adjacent pair of an order's sorted distinct
    * parts; NOT deduped across orders).
    *
    * r15 rework (guide §2.4 "remove shuffles outright"): the previous
    * form paid THREE exchanges before the per-query dedup —
    * `distinct(ok, pk)` (exchange on the pair), a lag window
    * re-partitioned by ok (second exchange + per-order sort), then the
    * consumer's own distinct/groupBy. This form gets the identical
    * pair multiset from ONE exchange: groupBy(ok) with a map-side
    * partially-aggregated collect_set (the within-order dedup the
    * separate distinct used to do), sort_array (the window's ordering,
    * now a per-row O(k log k) on the ~4-7-element part set), and an
    * adjacent-pair transform; fanOutForCpu parallelizes the
    * collect_set partial agg over the single-row-group fixture scan.
    * Plan: 3 Exchanges -> 2 for every consumer (their own
    * distinct/groupBy stays the second). Measured (6-query A/B,
    * focused): g02 4.03->3.68, g03 2.35->1.76, g12 3.33->2.62,
    * g19 5.03->3.63, g21 8.65->7.61 s.
    * The ANSI-mode CASE guards single-part orders (sequence(0,-1)
    * would DESCEND, and ps[size] would throw under ANSI). */
  private[graft] def cooccurAdjPairs(s: SparkSession, d: String): DataFrame =
    Tables.fanOutForCpu(
        Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")),
        col("ok"))
      .groupBy("ok").agg(sort_array(collect_set(col("pk"))).as("ps"))
      .select(explode(expr(
        """CASE WHEN size(ps) >= 2
             THEN transform(sequence(0, size(ps) - 2),
                            i -> struct(ps[i] AS u, ps[i + 1] AS v))
             ELSE array() END""")).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))

  /** [[cooccurAdjPairs]] deduped across orders — the undirected edge
    * list (u < v by construction). */
  private[graft] def cooccurEdges(s: SparkSession, d: String): DataFrame =
    cooccurAdjPairs(s, d).distinct()

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

  /** g02 — per-node triangle counts over the part co-occurrence graph,
    * top-20 by participation.
    *
    * Graph construction is LINEAR, not quadratic: within each order the
    * distinct parts are sorted and only ADJACENT pairs become edges (one
    * lag window per order), so a 10 000-line order contributes 9 999
    * edges, never 50M pairs.
    *
    * Counting uses degree orientation (Suri & Vassilvitskii, "Counting
    * triangles and the curse of the last reducer", WWW 2011): each edge
    * points from its lower-(degree, id) endpoint to the higher, every
    * wedge is generated at its lowest-rank node, and a triangle is
    * counted exactly once — wedge fan-out per node is bounded by
    * out-degree ≤ O(√m), which is what keeps the hub nodes from
    * exploding the join at 100 TB. Pure integer arithmetic throughout —
    * oracle-exact.
    */
  /** Degree-oriented per-node triangle counts over an undirected edge
    * list (columns u, v; no self-loops; each undirected edge once).
    *
    * The edge list feeds three consumers (two degree legs + the orient
    * join) and the oriented list three more (both wedge legs + the
    * closing join) — Spark does not CSE across DataFrame reuse, so both
    * are persisted for the duration of the count; the result is
    * localCheckpoint()ed (eager, lineage cut) before they unpersist.
    * Both caches are edge-count-sized projections, never corpus-sized. */
  def triangleCounts(edgesIn: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = edgesIn.persist(lvl)
    val deg = edges.select(col("u").as("n"))
      .union(edges.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    // orient every edge from lower (deg, id) rank to higher; the degree
    // frame is NODE-count-sized (dimension-bounded, ~24 B/node) so both
    // legs broadcast — the edge list is never shuffled for orientation
    // (r13 focused re-time: 2 of g02's 4 edge shuffles removed)
    val oriented = edges
      .join(broadcast(deg.select(col("n").as("u"), col("deg").as("du"))), "u")
      .join(broadcast(deg.select(col("n").as("v"), col("deg").as("dv"))), "v")
      .select(
        when(expr("struct(du, u) < struct(dv, v)"), col("u")).otherwise(col("v")).as("a"),
        when(expr("struct(du, u) < struct(dv, v)"), col("v")).otherwise(col("u")).as("b"),
        when(expr("struct(du, u) < struct(dv, v)"), col("dv")).otherwise(col("du")).as("db"))
      .persist(lvl)
    // wedges at the lowest-rank node, (p, q) ordered by rank
    val w1 = oriented.select(col("a"), col("b").as("x"), col("db").as("dx"))
    val w2 = oriented.select(col("a"), col("b").as("y"), col("db").as("dy"))
    val wedges = w1.join(w2, "a")
      .filter(expr("struct(dx, x) < struct(dy, y)"))
      .select(col("a"), col("x").as("p"), col("y").as("q"))
    val tri = wedges.join(
      oriented.select(col("a").as("p"), col("b").as("q")), Seq("p", "q"))
    val counts = tri
      .select(explode(array(col("a"), col("p"), col("q"))).as("node_id"))
      .groupBy("node_id").agg(count(lit(1)).as("triangles"))
      .localCheckpoint()
    // blocking: synchronous block removal, so a timed re-run (or the
    // next query) never pays the cleaner's async release (r15 ask #1)
    edges.unpersist(blocking = true)
    oriented.unpersist(blocking = true)
    counts
  }

  val triangles: QueryDef = QueryDef(
    "g02_triangle_count",
    (s, d) => {
      val edges = cooccurEdges(s, d)
      triangleCounts(edges)
        .orderBy(col("triangles").desc, col("node_id"))
        .limit(20)
    },
    Some("""WITH parts AS (
              SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
            lagged AS (
              SELECT lag(pk) OVER (PARTITION BY ok ORDER BY pk) AS u, pk AS v
              FROM parts),
            edges AS (
              SELECT DISTINCT u, v FROM lagged WHERE u IS NOT NULL),
            deg AS (
              SELECT n, count(*) AS deg FROM (
                SELECT u AS n FROM edges UNION ALL SELECT v FROM edges)
              GROUP BY 1),
            oriented AS (
              SELECT CASE WHEN (du.deg, u) < (dv.deg, v) THEN u ELSE v END AS a,
                     CASE WHEN (du.deg, u) < (dv.deg, v) THEN v ELSE u END AS b,
                     CASE WHEN (du.deg, u) < (dv.deg, v) THEN dv.deg ELSE du.deg END AS db
              FROM edges
              JOIN deg du ON du.n = edges.u
              JOIN deg dv ON dv.n = edges.v),
            wedges AS (
              SELECT w1.a, w1.b AS p, w2.b AS q
              FROM oriented w1 JOIN oriented w2 USING (a)
              WHERE (w1.db, w1.b) < (w2.db, w2.b)),
            tri AS (
              SELECT w.a, w.p, w.q
              FROM wedges w JOIN oriented o ON o.a = w.p AND o.b = w.q)
            SELECT node_id, count(*) AS triangles FROM (
              SELECT a AS node_id FROM tri
              UNION ALL SELECT p FROM tri
              UNION ALL SELECT q FROM tri)
            GROUP BY 1 ORDER BY triangles DESC, node_id
            LIMIT 20"""))

  /** Core of g03: `rounds` synchronous peel iterations toward the
    * k-core (Seidman, "Network structure and minimum degree", Social
    * Networks 1983; distributed peel as in Montresor et al., IEEE
    * TPDS 2013): each round drops nodes with degree < k over the
    * SURVIVING edge set, then keeps edges whose both endpoints
    * survived. The peel is monotone (edge set only shrinks), so after
    * convergence extra rounds are no-ops; a FIXED round count keeps the
    * computation engine-mirrorable round for round (the g01 discipline)
    * and the spec asserts the fixture converges within them. Each round
    * is one degree aggregate + two semi-joins, `localCheckpoint`ed so
    * lineage depth stays constant (d07's iterative-job rule). */
  def kcoreDegrees(edgesIn: org.apache.spark.sql.DataFrame, k: Int,
      rounds: Int): org.apache.spark.sql.DataFrame = {
    var edges = edgesIn.select(col("u"), col("v")).localCheckpoint()
    def und(e: org.apache.spark.sql.DataFrame) =
      e.select(col("u").as("n")).union(e.select(col("v").as("n")))
    (1 to rounds).foreach { _ =>
      val keep = und(edges).groupBy("n").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("n")
      edges = edges
        .join(keep.withColumnRenamed("n", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("n", "v"), Seq("v"), "left_semi")
        .select("u", "v").localCheckpoint()
    }
    und(edges).groupBy("n").agg(count(lit(1)).as("deg"))
  }

  /** g03 — k-core decomposition (k=3, 3 unrolled peel rounds) of the
    * g02 co-occurrence graph: the standard "dense cohesive subgraph"
    * filter (spam/bot rings in link graphs, well-connected entity hubs).
    * Output: top-20 surviving nodes by within-core degree. The DuckDB
    * oracle unrolls the same rounds as CTEs — both engines compute the
    * identical monotone sequence, so equality holds even before
    * convergence, and the spec proves convergence on the fixture. */
  val kcore: QueryDef = {
    val K = 3
    // the fixtures converge at round 2 (asserted in spec at three
    // scales via the r/r+1 equality); 3 leaves one round of margin
    val Rounds = 3
    QueryDef(
      "g03_kcore",
      (s, d) => {
        val edges = cooccurEdges(s, d)
        kcoreDegrees(edges, K, Rounds)
          .select(col("n").as("node_id"), col("deg"))
          .orderBy(col("deg").desc, col("node_id"))
          .limit(20)
      },
      Some {
        // MATERIALIZED: each round references the previous edge set
        // multiple times — left inlined, the evaluator would re-derive
        // e_{r-1} per reference and the work grows exponentially in r
        val roundCtes = (1 to Rounds).map { r =>
          val prev = if (r == 1) "e_0" else s"e_${r - 1}"
          s"""deg_$r AS MATERIALIZED (
                SELECT n, count(*) AS deg FROM (
                  SELECT u AS n FROM $prev UNION ALL SELECT v FROM $prev)
                GROUP BY 1),
              keep_$r AS MATERIALIZED (SELECT n FROM deg_$r WHERE deg >= $K),
              e_$r AS MATERIALIZED (
                SELECT u, v FROM $prev
                JOIN keep_$r ku ON ku.n = u
                JOIN keep_$r kv ON kv.n = v)"""
        }.mkString(",\n")
        s"""WITH parts AS (
              SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
            lagged AS (
              SELECT lag(pk) OVER (PARTITION BY ok ORDER BY pk) AS u, pk AS v
              FROM parts),
            e_0 AS MATERIALIZED (
              SELECT DISTINCT u, v FROM lagged WHERE u IS NOT NULL),
            $roundCtes
            SELECT n AS node_id, count(*) AS deg FROM (
              SELECT u AS n FROM e_$Rounds UNION ALL SELECT v FROM e_$Rounds)
            GROUP BY 1 ORDER BY deg DESC, node_id
            LIMIT 20"""
      })
  }

  /** g04 — synchronous label propagation communities (Raghavan, Albert
    * & Kumara, "Near linear time algorithm to detect community
    * structures in large-scale networks", Phys. Rev. E 2007) over g01's
    * part↔supplier graph: every node starts as its own label; each
    * round it adopts the most frequent label among its neighbors, ties
    * to the MINIMUM label — the (count DESC, label ASC) rank both
    * engines compute identically, which is what makes an inherently
    * heuristic community algorithm oracle-exact. Rounds are FIXED (3),
    * like g01: integer labels, bounded lineage, no checkpoint needed.
    *
    * Scale shape: each round is one equi-join of the edge list with the
    * label vector, one (node, label) count aggregate, and one per-node
    * ranking window (key-partitioned on the node — never global). The
    * output is the community SIZE distribution (top 20), the artifact a
    * corpus-partitioning run reads. */
  /** Synchronous LP rounds over a DIRECTED edge frame (u, v) — pass
    * both directions for an undirected graph. Per-node labels after
    * `rounds` iterations, (count DESC, label ASC) vote. */
  def labelPropagate(e: org.apache.spark.sql.DataFrame,
      rounds: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    var labels = e.select(col("u").as("id")).distinct()
      .withColumn("lab", col("id"))
    for (_ <- 1 to rounds) {
      // the (count DESC, label ASC) vote as ONE aggregate: max over
      // (cnt, -lab) structs == highest count, ties to minimum label —
      // no per-round ranking window (which would cost a second
      // exchange + sort on top of the count aggregate)
      labels = e.join(labels, e("u") === labels("id"))
        .groupBy(col("v"), col("lab"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("v"))
        .agg(max(struct(col("cnt").as("c"), (-col("lab")).as("nl"))).as("m"))
        .select(col("v").as("id"), (-col("m.nl")).as("lab"))
    }
    labels
  }

  val labelPropagation: QueryDef = {
    val Rounds = 3
    QueryDef(
      "g04_label_propagation",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey").as("p"),
            (col("l_suppkey") + SuppOffset).as("sup"))
          .distinct()
        val e = li.select(col("p").as("u"), col("sup").as("v"))
          .union(li.select(col("sup").as("u"), col("p").as("v")))
        labelPropagate(e, Rounds)
          .groupBy("lab")
          .agg(count(lit(1)).as("n_nodes"))
          .select(col("lab").as("community"), col("n_nodes"))
          .orderBy(col("n_nodes").desc, col("community"))
          .limit(20)
      },
      Some {
        val base =
          s"""li AS (SELECT DISTINCT l_partkey AS p,
                       l_suppkey + $SuppOffset AS sup FROM lineitem),
              e AS (SELECT p AS u, sup AS v FROM li
                    UNION ALL SELECT sup, p FROM li),
              l0 AS (SELECT DISTINCT u AS id, u AS lab FROM e)"""
        val rounds = (1 to Rounds).map { k =>
          s"""c$k AS (
                SELECT e.v, l${k - 1}.lab, count(*) AS cnt
                FROM e JOIN l${k - 1} ON l${k - 1}.id = e.u
                GROUP BY 1, 2),
              l$k AS (
                SELECT v AS id, lab FROM (
                  SELECT v, lab,
                    row_number() OVER (PARTITION BY v
                      ORDER BY cnt DESC, lab) AS rn
                  FROM c$k)
                WHERE rn = 1)"""
        }.mkString(",\n")
        s"""WITH $base,
            $rounds
            SELECT CAST(lab AS BIGINT) AS community,
              CAST(count(*) AS BIGINT) AS n_nodes
            FROM l$Rounds GROUP BY 1
            ORDER BY n_nodes DESC, community LIMIT 20"""
      })
  }

  /** Synchronous multi-source BFS rounds over a DIRECTED edge frame
    * (u, v) — pass both directions for an undirected graph. State is a
    * single BIGINT per node, `enc = dist·stride + seed` (seed < stride),
    * so the lexicographic (dist, seed) minimum the algorithm needs is a
    * plain integer `min` — order-independent, bit-identical on any
    * engine or partitioning. Each round is one equi-join of the edge
    * list with the current label frame (relaxation: `enc + stride` is
    * exactly "one hop further from the same seed") plus one min
    * aggregate; `localCheckpoint` keeps lineage depth constant (d07's
    * iterative-job rule). Unreached nodes are simply absent. */
  def bfsEncode(e: org.apache.spark.sql.DataFrame,
      seeds: org.apache.spark.sql.DataFrame, rounds: Int,
      stride: Long): org.apache.spark.sql.DataFrame = {
    var lab = seeds.select(col("id"), col("id").as("enc"))
    for (_ <- 1 to rounds) {
      lab = e.join(lab, e("u") === lab("id"))
        .select(col("v").as("id"), (col("enc") + stride).as("enc"))
        .union(lab.select(col("id"), col("enc")))
        .groupBy("id").agg(min(col("enc")).as("enc"))
        .localCheckpoint()
    }
    lab
  }

  /** g05 — multi-source BFS hop distance with nearest-seed attribution
    * (unit-weight Bellman-Ford, synchronously relaxed — the Pregel BFS
    * of Malewicz et al., SIGMOD 2010 §5.1) over g01's part↔supplier
    * graph: suppliers 1-3 are the seed anchors, every node learns
    * (min hops to any seed, min seed id at that distance), ties to the
    * lower seed. The output is the (dist, seed) histogram plus one
    * `dist = -1` row for nodes no seed reaches within the round budget
    * — the artifact a curation run reads to partition a corpus by its
    * nearest canonical anchor (d13's assignment, but along graph hops
    * instead of cosine).
    *
    * Determinism discipline: the g01 integer trick — state is
    * `dist·10¹⁰ + seed_node_id`, so the (dist, seed) minimum is one
    * BIGINT `min` both engines compute identically; rounds are FIXED
    * (4), mirrored as unrolled CTEs.
    *
    * Scale shape: per round one equi shuffle of the (node, enc) frame
    * against the edge list and one map-side-combining min aggregate —
    * 16 bytes of state per node, never the corpus; the histogram output
    * is bounded by seeds × rounds regardless of graph size. */
  val bfsHops: QueryDef = {
    val Rounds = 4
    val Stride = 10000000000L // > max node id; enc = dist*Stride + seed
    val Seeds = 3
    QueryDef(
      "g05_bfs_hops",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey").as("p"),
            (col("l_suppkey") + SuppOffset).as("sup"))
          .distinct()
        val e = li.select(col("p").as("u"), col("sup").as("v"))
          .union(li.select(col("sup").as("u"), col("p").as("v")))
          .localCheckpoint() // feeds all Rounds relaxation joins
        val nodes = e.select(col("u").as("id")).distinct()
          .localCheckpoint()
        val seeds = nodes.filter(
          col("id").between(SuppOffset + 1, SuppOffset + Seeds))
        nodes.join(bfsEncode(e, seeds, Rounds, Stride), Seq("id"),
            "left_outer")
          .select(
            coalesce(expr(s"enc DIV $Stride"), lit(-1L)).as("dist"),
            coalesce(expr(s"enc % $Stride - $SuppOffset"), lit(-1L))
              .as("seed_supp"))
          .groupBy("dist", "seed_supp")
          .agg(count(lit(1)).as("n_nodes"))
          .orderBy("dist", "seed_supp")
      },
      Some {
        val base =
          s"""li AS (SELECT DISTINCT l_partkey AS p,
                       l_suppkey + $SuppOffset AS sup FROM lineitem),
              e AS MATERIALIZED (SELECT p AS u, sup AS v FROM li
                    UNION ALL SELECT sup, p FROM li),
              nodes AS MATERIALIZED (SELECT DISTINCT u AS id FROM e),
              l0 AS (SELECT id, id AS enc FROM nodes
                     WHERE id BETWEEN ${SuppOffset + 1}
                       AND ${SuppOffset + Seeds})"""
        val rounds = (1 to Rounds).map { r =>
          s"""l$r AS MATERIALIZED (
                SELECT id, min(enc) AS enc FROM (
                  SELECT e.v AS id, l${r - 1}.enc + $Stride AS enc
                  FROM e JOIN l${r - 1} ON l${r - 1}.id = e.u
                  UNION ALL SELECT id, enc FROM l${r - 1})
                GROUP BY 1)"""
        }.mkString(",\n")
        s"""WITH $base,
            $rounds
            SELECT CAST(coalesce(l.enc // $Stride, -1) AS BIGINT) AS dist,
              CAST(coalesce(l.enc % $Stride - $SuppOffset, -1) AS BIGINT)
                AS seed_supp,
              CAST(count(*) AS BIGINT) AS n_nodes
            FROM nodes n LEFT JOIN l$Rounds l ON l.id = n.id
            GROUP BY 1, 2 ORDER BY dist, seed_supp"""
      })
  }

  /** g06 — PERSONALIZED PageRank (topic-sensitive PageRank, Haveliwala
    * WWW 2002): g01's integer fixed-point iteration with the teleport
    * mass concentrated on a pinned seed set (parts 1-4) instead of
    * spread uniformly — the random surfer restarts AT the seeds, so
    * scores measure proximity to them (the recommendation / related-
    * entity primitive, where g01 measures global centrality). Same
    * exact-arithmetic discipline as g01: integer-scaled scores, DIV
    * spreads, damping 85/100 in integer ops — deterministic on any
    * partitioning, unrolled-CTE mirror. Unnormalized form (each seed
    * gets the fixed 0.15·Scale restart injection); the ranking is what
    * the operator delivers.
    *
    * Scale shape: identical to g01 — one equi-join per round against
    * the degree-annotated edge list, bounded rounds; the seed
    * indicator is a per-row CASE, never a driver list. */
  val personalizedPagerank: QueryDef = QueryDef(
    "g06_personalized_pagerank",
    (s, d) => {
      val t = Scale * 15 / 100
      val seedCase =
        s"CASE WHEN id <= 4 AND id < $SuppOffset THEN CAST($t AS BIGINT) " +
          "ELSE CAST(0 AS BIGINT) END"
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey").as("p"),
          (col("l_suppkey") + SuppOffset).as("sup"))
        .distinct()
      val e = li.select(col("p").as("u"), col("sup").as("v"))
        .union(li.select(col("sup").as("u"), col("p").as("v")))
      val deg = e.groupBy("u").agg(count(lit(1)).as("deg"))
      val ec = e.join(deg, "u")
      var sc = deg.select(col("u").as("id"), expr(seedCase).as("s"))
      for (_ <- 1 to Iters) {
        sc = ec.join(sc, ec("u") === sc("id"))
          .select(col("v"), expr("s DIV deg").as("c"))
          .groupBy("v")
          .agg(expr("(85 * sum(c)) DIV 100").as("spread"))
          .select(col("v").as("id"),
            (expr(seedCase.replace("id", "v")) + col("spread")).as("s"))
          .select(col("id"), col("s"))
      }
      sc.filter(col("s") > 0)
        .select(
          expr(s"CASE WHEN id >= $SuppOffset THEN 'supplier' ELSE 'part' END")
            .as("kind"),
          expr(s"CASE WHEN id >= $SuppOffset THEN id - $SuppOffset ELSE id END")
            .as("node_id"),
          col("s").as("score"))
        .orderBy(col("score").desc, col("kind"), col("node_id"))
        .limit(20)
    },
    Some {
      val t = Scale * 15 / 100
      def seedCase(c: String) =
        s"CASE WHEN $c <= 4 AND $c < $SuppOffset THEN CAST($t AS BIGINT) " +
          "ELSE CAST(0 AS BIGINT) END"
      val base =
        s"""li AS (SELECT DISTINCT l_partkey AS p,
                     l_suppkey + $SuppOffset AS sup FROM lineitem),
            e AS (SELECT p AS u, sup AS v FROM li
                  UNION ALL SELECT sup, p FROM li),
            deg AS (SELECT u, count(*) AS deg FROM e GROUP BY 1),
            ec AS (SELECT e.u, e.v, deg.deg FROM e JOIN deg USING (u)),
            s0 AS (SELECT u AS id, ${seedCase("u")} AS s FROM deg)"""
      val rounds = (1 to Iters).map { i =>
        s"""s$i AS (SELECT ec.v AS id,
                      ${seedCase("ec.v")} + (85 * sum(s${i - 1}.s // ec.deg)) // 100 AS s
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
          WHERE s > 0
          ORDER BY score DESC, kind, node_id
          LIMIT 20"""
    })

  /** g07 — link prediction by neighbor overlap FOR A QUERY SET: for
    * each seed part (keys ≤ 100), count shared suppliers with every
    * co-supplied part (common neighbors in the bipartite graph) and
    * the neighbor-set Jaccard — the classic common-neighbors /
    * Jaccard-coefficient predictors (Liben-Nowell & Kleinberg, CIKM
    * 2003). Bipartite parts are never directly adjacent, so every
    * scored pair is a prediction; top-20 by overlap.
    *
    * Determinism: common/union are integers; Jaccard is ONE exact IEEE
    * division; ranking ties broken by the (pa, pb) key pair.
    *
    * Scale shape: seeding is what makes this 100 TB-safe. The
    * unrestricted pair count is Σ_sup deg(sup)² — measured 175 M rows
    * already at sf0.1 (1.8 B at sf1.0), a quadratic blowup no degree
    * trick fixes because every co-supplied pair genuinely scores. With
    * a bounded seed side the supplier-keyed equi-join materializes only
    * (seed ∩ sup's parts) × deg(sup) rows — LINEAR in corpus size at
    * fixed seed count (the g05/g06 source-set discipline applied to
    * prediction; all-pairs variants would go through d06's banded-cap
    * route instead). Seeds are a key-range filter pushed into the scan;
    * degrees join one-row-per-part. */
  val linkPrediction: QueryDef = QueryDef(
    "g07_link_prediction",
    (s, d) => {
      val e = Tables.lineitem(s, d)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sup"))
        .distinct()
      val deg = e.groupBy("p").agg(count(lit(1)).as("deg"))
      val a = e.filter(col("p") <= 100).select(col("p").as("pa"), col("sup"))
      val b = e.select(col("p").as("pb"), col("sup"))
      a.join(b, Seq("sup"))
        .filter(col("pa") =!= col("pb"))
        .groupBy("pa", "pb")
        .agg(count(lit(1)).as("common"))
        .join(deg.select(col("p").as("pa"), col("deg").as("da")), Seq("pa"))
        .join(deg.select(col("p").as("pb"), col("deg").as("db")), Seq("pb"))
        .select(col("pa"), col("pb"), col("common"),
          (col("da") + col("db") - col("common")).as("union_deg"),
          round(col("common").cast("double") /
            (col("da") + col("db") - col("common")), 6).as("jaccard"))
        .orderBy(col("common").desc, col("pa"), col("pb"))
        .limit(20)
    },
    Some("""WITH e AS (
              SELECT DISTINCT l_partkey AS p, l_suppkey AS sup FROM lineitem),
            deg AS (SELECT p, count(*) AS deg FROM e GROUP BY 1),
            pairs AS (
              SELECT a.p AS pa, b.p AS pb, count(*) AS common
              FROM e a JOIN e b ON a.sup = b.sup AND a.p <= 100
                AND b.p != a.p
              GROUP BY 1, 2)
            SELECT pa, pb, common,
              da.deg + db.deg - common AS union_deg,
              round(CAST(common AS DOUBLE) /
                    (da.deg + db.deg - common), 6) AS jaccard
            FROM pairs
            JOIN deg da ON da.p = pairs.pa
            JOIN deg db ON db.p = pairs.pb
            ORDER BY common DESC, pa, pb LIMIT 20"""))

  /** g08 — HITS hubs & authorities (Kleinberg, JACM 1999) over the
    * DIRECTED supplier→part graph: a supplier is a good hub when it
    * supplies high-authority parts, a part a good authority when
    * supplied by good hubs. Two full mutual-reinforcement rounds
    * (auth ← Σ in-hub, hub ← Σ out-auth) from hub₀ = 1; top-10 hubs
    * and top-10 authorities by final score.
    *
    * Determinism: HITS is normally L2-normalized — float, order-
    * dependent. Here scores stay RAW INTEGER sums (g01's fixed-point
    * discipline without even needing a scale): with hub₀ = 1, two
    * rounds bound every score by Σ(indeg·outdeg)² ≪ 2⁶³ at any TPC-H
    * SF, long addition commutes, and the ranking — HITS' actual
    * output — is identical to the normalized one because
    * normalization is a positive per-side constant.
    *
    * Scale shape: each half-round is ONE equi-join of the edge list
    * with the current score vector plus one key-partitioned sum —
    * the same Pregel-round shape as g01, bounded iterations, degrees
    * never materialized driver-side. */
  val hits: QueryDef = QueryDef(
    "g08_hits",
    (s, d) => {
      val e = Tables.lineitem(s, d)
        .select(col("l_suppkey").as("sup"), col("l_partkey").as("p"))
        .distinct()
      // hub0 = 1 for every supplier with >=1 edge
      var hub = e.select(col("sup")).distinct()
        .select(col("sup"), lit(1L).as("h"))
      var auth: org.apache.spark.sql.DataFrame = null
      for (_ <- 1 to 2) {
        auth = e.join(hub, "sup")
          .groupBy("p").agg(sum("h").as("a"))
        hub = e.join(auth, "p")
          .groupBy("sup").agg(sum("a").as("h"))
      }
      val topHub = hub.select(lit("hub").as("kind"),
        col("sup").as("node_id"), col("h").as("score"))
        .orderBy(col("score").desc, col("node_id")).limit(10)
      val topAuth = auth.select(lit("authority").as("kind"),
        col("p").as("node_id"), col("a").as("score"))
        .orderBy(col("score").desc, col("node_id")).limit(10)
      topHub.unionAll(topAuth)
        .orderBy(col("kind"), col("score").desc, col("node_id"))
    },
    Some("""WITH e AS (
              SELECT DISTINCT l_suppkey AS sup, l_partkey AS p FROM lineitem),
            h0 AS (SELECT DISTINCT sup, CAST(1 AS BIGINT) AS h FROM e),
            a1 AS (SELECT e.p, CAST(sum(h0.h) AS BIGINT) AS a
                   FROM e JOIN h0 USING (sup) GROUP BY 1),
            h1 AS (SELECT e.sup, CAST(sum(a1.a) AS BIGINT) AS h
                   FROM e JOIN a1 USING (p) GROUP BY 1),
            a2 AS (SELECT e.p, CAST(sum(h1.h) AS BIGINT) AS a
                   FROM e JOIN h1 USING (sup) GROUP BY 1),
            h2 AS (SELECT e.sup, CAST(sum(a2.a) AS BIGINT) AS h
                   FROM e JOIN a2 USING (p) GROUP BY 1),
            th AS (SELECT 'hub' AS kind, CAST(sup AS BIGINT) AS node_id,
                     h AS score
                   FROM h2 ORDER BY score DESC, node_id LIMIT 10),
            ta AS (SELECT 'authority' AS kind, CAST(p AS BIGINT) AS node_id,
                     a AS score
                   FROM a2 ORDER BY score DESC, node_id LIMIT 10)
            SELECT * FROM (SELECT * FROM th UNION ALL SELECT * FROM ta)
            ORDER BY kind, score DESC, node_id"""))

  /** g09 — degree-distribution profile of the part↔supplier bipartite
    * graph: per node kind, log₂-binned degree histogram (bin =
    * ⌊log₂ deg⌋ + 1, computed EXACTLY as the length of the binary
    * string `bin(deg)` — no floating log whose rounding could differ
    * at power-of-two boundaries) with node counts and degree mass per
    * bin. The heavy-tail profile is what sizes every downstream graph
    * op: it is the input to g02's degree orientation, d06's bucket
    * caps, and the salting decision in x16.
    *
    * Scale shape: one degree aggregate (key-partitioned) and one
    * ~⌈log₂ maxdeg⌉-row histogram aggregate — the second shuffle is
    * domain-bounded (≤ 64 bins), the classic two-level rollup. */
  val degreeHistogram: QueryDef = QueryDef(
    "g09_degree_histogram",
    (s, d) => {
      val e = Tables.lineitem(s, d)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sup"))
        .distinct()
      val deg = e.groupBy("p").agg(count(lit(1)).as("deg"))
        .select(lit("part").as("kind"), col("deg"))
        .unionAll(e.groupBy("sup").agg(count(lit(1)).as("deg"))
          .select(lit("supplier").as("kind"), col("deg")))
      deg
        .withColumn("bin", length(expr("bin(deg)")).cast("int"))
        .groupBy("kind", "bin")
        .agg(count(lit(1)).as("n_nodes"),
          sum("deg").as("degree_mass"),
          min("deg").as("min_deg"),
          max("deg").as("max_deg"))
        .orderBy("kind", "bin")
    },
    Some("""WITH e AS (
              SELECT DISTINCT l_partkey AS p, l_suppkey AS sup FROM lineitem),
            deg AS (
              SELECT 'part' AS kind, count(*) AS deg FROM e GROUP BY p
              UNION ALL
              SELECT 'supplier' AS kind, count(*) AS deg FROM e GROUP BY sup)
            SELECT kind, CAST(length(bin(deg)) AS INTEGER) AS bin,
              count(*) AS n_nodes,
              CAST(sum(deg) AS BIGINT) AS degree_mass,
              min(deg) AS min_deg, max(deg) AS max_deg
            FROM deg GROUP BY 1, 2 ORDER BY kind, bin"""))

  /** g10 — landmark harmonic-centrality profile (Boldi & Vigna,
    * "Axioms for centrality", Internet Math 2014: harmonic = Σ 1/d,
    * the closeness variant that is total on disconnected graphs):
    * per-landmark BFS distances over g01's part↔supplier graph
    * (landmarks = suppliers 1-3, g05's seed discipline), then each
    * landmark's centrality as the INTEGER sum Σ (10⁴ DIV d) over
    * reached nodes — plus reach count, eccentricity-within-budget, and
    * exact mean distance. Landmark centralities are the standard
    * approximation anchor for whole-graph closeness at scale.
    *
    * Determinism: per-(landmark, node) distance is a min over integer
    * relaxations (g05's discipline, one state row per pair); 1/d is
    * fixed-point 10⁴ DIV d so the centrality sum is order-free.
    *
    * Scale shape: state is |landmarks|·|V| rows of 24 bytes — linear
    * in nodes at fixed landmark count; each round is one equi shuffle
    * + one map-side-combining min; rounds FIXED (4), mirrored as
    * unrolled CTEs. */
  val harmonicCentrality: QueryDef = {
    val Rounds = 4; val Landmarks = 3
    QueryDef(
      "g10_harmonic_centrality",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey").as("p"),
            (col("l_suppkey") + SuppOffset).as("sup"))
          .distinct()
        val e = li.select(col("p").as("u"), col("sup").as("v"))
          .union(li.select(col("sup").as("u"), col("p").as("v")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        var st = s.range(1, Landmarks + 1)
          .select((col("id") + SuppOffset).as("seed"))
          .select(col("seed"), col("seed").as("id"), lit(0L).as("dist"))
        // FRONTIER BFS (r13 rework of the full-state relaxation): with
        // unit weights the first layer a node appears in IS its minimal
        // distance, so only the NEWLY-reached frontier needs expanding —
        // the full-state form re-expanded every settled node every
        // round, shuffling ~|E|·|landmarks| expansion rows per round
        // (the dominant cost in the r13 focused re-time; frontier form
        // measured ~2× faster at sf0.1). The frontier and settled set
        // are |landmarks|·|V|-bounded (landmark count is the op's own
        // parameter, V the part+supplier DIMENSION domain), so both
        // broadcast; the edge list never shuffles. Each frame is
        // multi-referenced → persist(), the g19 multi-ref lesson.
        val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
        val cached =
          scala.collection.mutable.Buffer.empty[org.apache.spark.sql.DataFrame]
        var frontier = st
        for (r <- 1 to Rounds) {
          val next = e.join(broadcast(frontier), frontier("id") === e("u"))
            .select(col("seed"), col("v").as("id"))
            .distinct()
            .join(broadcast(st.select("seed", "id")),
              Seq("seed", "id"), "left_anti")
            .select(col("seed"), col("id"), lit(r.toLong).as("dist"))
            .persist(lvl)
          st = st.union(next).persist(lvl)
          frontier = next
          cached += next; cached += st
        }
        val out = st.filter(col("dist") > 0)
          .groupBy("seed")
          .agg(count(lit(1)).as("n_reached"),
            sum(expr("10000 DIV dist")).as("harmonic_x10000"),
            max("dist").as("max_dist"),
            // r12 sweep: int/int quotient at e6 fixed point (a rounded
            // dyadic quotient can sit exactly on the tie boundary).
            expr("(1000000 * sum(dist)) DIV count(*)").as("mean_dist_e6"))
          .withColumn("mean_dist",
            expr("CAST(mean_dist_e6 AS DOUBLE) / 1000000.0"))
          .select((col("seed") - SuppOffset).as("landmark"),
            col("n_reached"), col("harmonic_x10000"), col("max_dist"),
            col("mean_dist_e6"), col("mean_dist"))
          .orderBy("landmark")
          .localCheckpoint()
        // blocking: g10 is the registry's most state-sensitive query
        // (r14 driver run spiked it 4.29x in-suite); releasing the ~10
        // round frames synchronously leaves nothing for the cleaner to
        // drain inside g10's own next timed run (r15 ask #1)
        e.unpersist(blocking = true)
        cached.foreach(_.unpersist(blocking = true))
        out
      },
      Some {
        val seeds = (1 to Landmarks)
          .map(i => s"SELECT CAST(${SuppOffset + i} AS BIGINT) AS seed")
          .mkString(" UNION ALL ")
        val rounds = (1 to Rounds).map { i =>
          s"""s$i AS (
                SELECT seed, id, min(dist) AS dist FROM (
                  SELECT s.seed, e.v AS id, s.dist + 1 AS dist
                  FROM s${i - 1} s JOIN e ON e.u = s.id
                  UNION ALL SELECT seed, id, dist FROM s${i - 1})
                GROUP BY 1, 2)"""
        }.mkString(",\n")
        s"""WITH li AS (SELECT DISTINCT l_partkey AS p,
                          l_suppkey + $SuppOffset AS sup FROM lineitem),
            e AS (SELECT p AS u, sup AS v FROM li
                  UNION ALL SELECT sup, p FROM li),
            s0 AS (SELECT seed, seed AS id, CAST(0 AS BIGINT) AS dist
                   FROM ($seeds)),
            $rounds
            SELECT seed - $SuppOffset AS landmark, count(*) AS n_reached,
              CAST(sum(10000 // dist) AS BIGINT) AS harmonic_x10000,
              max(dist) AS max_dist,
              CAST((1000000 * sum(dist)) // count(*) AS BIGINT)
                AS mean_dist_e6,
              CAST(CAST((1000000 * sum(dist)) // count(*) AS BIGINT)
                AS DOUBLE) / 1000000.0 AS mean_dist
            FROM s$Rounds WHERE dist > 0
            GROUP BY 1 ORDER BY landmark"""
      })
  }

  /** g11 — modularity scoring of g04's communities (Newman & Girvan,
    * PRE 2004): Q = Σ_c [e_c/m − (d_c/2m)²] for the label-propagation
    * partition — the community-QUALITY harness (t21/d17/s08's
    * evaluation idiom applied to graph clustering: g04 produces the
    * partition, g11 says whether it is better than chance). Top-10
    * communities by size with their exact pieces, plus the whole-graph
    * Q on every row.
    *
    * Determinism: everything is computed in the INTEGER numerator
    * Q·4m² = Σ_c (4m·e_c − d_c²) — internal-edge counts, degree sums,
    * and m are exact longs. Bound: with m ≈ 8·10⁵·SF distinct
    * part-supplier edges, 4m² crosses 2⁶³ near SF≈1900 (~2 TB of this
    * graph's edge data); past that, widen to the modular-accumulator /
    * 128-bit form exactly as x36's checksum documents — the final Q is
    * ONE division, round(6).
    *
    * Scale shape: LP rounds are g04's; internal edges = the edge list
    * joined to the label vector on BOTH endpoints (two equi joins);
    * degree sums one aggregate; the graph totals are a 1-row broadcast
    * (e05's scalar idiom), never a global window over the unbounded
    * community frame. */
  val modularity: QueryDef = {
    val Rounds = 3
    QueryDef(
      "g11_modularity",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey").as("p"),
            (col("l_suppkey") + SuppOffset).as("sup"))
          .distinct()
        val e2 = li.select(col("p").as("u"), col("sup").as("v"))
          .union(li.select(col("sup").as("u"), col("p").as("v")))
        val labels = labelPropagate(e2, Rounds).localCheckpoint()
        val internal = li
          .join(labels.select(col("id").as("p"), col("lab").as("lp")), "p")
          .join(labels.select(col("id").as("sup"), col("lab").as("ls")),
            "sup")
          .filter(col("lp") === col("ls"))
          .groupBy(col("lp").as("community"))
          .agg(count(lit(1)).as("internal_edges"))
        val degSum = e2.groupBy("u").agg(count(lit(1)).as("deg"))
          .join(labels, col("u") === col("id"))
          .groupBy(col("lab").as("community"))
          .agg(sum("deg").as("degree_sum"), count(lit(1)).as("n_nodes"))
        val cells = degSum
          .join(internal, Seq("community"), "left")
          .withColumn("internal_edges",
            coalesce(col("internal_edges"), lit(0L)))
        val mRow = li.agg(count(lit(1)).as("m_edges"))
        val scored = cells.crossJoin(broadcast(mRow))
          .withColumn("contrib_scaled",
            expr("4 * m_edges * internal_edges - degree_sum * degree_sum"))
        val total = scored.agg(
          sum("contrib_scaled").as("q_scaled_total"),
          max("m_edges").as("m2"))
          .select(col("q_scaled_total"),
            round(col("q_scaled_total").cast("double") /
              (lit(4.0) * col("m2") * col("m2")).cast("double"), 6)
              .as("modularity"))
        scored
          .select("community", "n_nodes", "internal_edges", "degree_sum",
            "contrib_scaled")
          .orderBy(col("n_nodes").desc, col("community")).limit(10)
          .crossJoin(broadcast(total))
          .orderBy(col("n_nodes").desc, col("community"))
      },
      Some {
        val base =
          s"""li AS (SELECT DISTINCT l_partkey AS p,
                       l_suppkey + $SuppOffset AS sup FROM lineitem),
              e AS (SELECT p AS u, sup AS v FROM li
                    UNION ALL SELECT sup, p FROM li),
              l0 AS (SELECT DISTINCT u AS id, u AS lab FROM e)"""
        val rounds = (1 to Rounds).map { k =>
          s"""c$k AS (
                SELECT e.v, l${k - 1}.lab, count(*) AS cnt
                FROM e JOIN l${k - 1} ON l${k - 1}.id = e.u
                GROUP BY 1, 2),
              l$k AS (
                SELECT v AS id, lab FROM (
                  SELECT v, lab,
                    row_number() OVER (PARTITION BY v
                      ORDER BY cnt DESC, lab) AS rn
                  FROM c$k)
                WHERE rn = 1)"""
        }.mkString(",\n")
        s"""WITH $base,
            $rounds,
            internal AS (
              SELECT lp.lab AS community, count(*) AS internal_edges
              FROM li
              JOIN l$Rounds lp ON lp.id = li.p
              JOIN l$Rounds ls ON ls.id = li.sup AND ls.lab = lp.lab
              GROUP BY 1),
            degs AS (
              SELECT l.lab AS community,
                CAST(sum(d.deg) AS BIGINT) AS degree_sum,
                count(*) AS n_nodes
              FROM (SELECT u, count(*) AS deg FROM e GROUP BY 1) d
              JOIN l$Rounds l ON l.id = d.u
              GROUP BY 1),
            m AS (SELECT count(*) AS m_edges FROM li),
            cells AS (
              SELECT degs.community, degs.n_nodes,
                CAST(coalesce(internal.internal_edges, 0) AS BIGINT)
                  AS internal_edges,
                degs.degree_sum,
                CAST(4 * m.m_edges * coalesce(internal.internal_edges, 0)
                  - degs.degree_sum * degs.degree_sum AS BIGINT)
                  AS contrib_scaled
              FROM degs
              LEFT JOIN internal ON internal.community = degs.community
              CROSS JOIN m),
            total AS (
              SELECT CAST(sum(contrib_scaled) AS BIGINT) AS q_scaled_total,
                round(CAST(CAST(sum(contrib_scaled) AS BIGINT) AS DOUBLE) /
                  CAST(4.0 * max(m.m_edges) * max(m.m_edges) AS DOUBLE), 6)
                  AS modularity
              FROM cells, m)
            SELECT c.community, c.n_nodes, c.internal_edges, c.degree_sum,
              c.contrib_scaled, t.q_scaled_total, t.modularity
            FROM (SELECT * FROM cells
                  ORDER BY n_nodes DESC, community LIMIT 10) c, total t
            ORDER BY c.n_nodes DESC, c.community"""
      })
  }

  /** g12 — local clustering coefficient per node (Watts & Strogatz,
    * "Collective dynamics of 'small-world' networks", Nature 1998):
    * cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)), the fraction of a node's
    * neighbor pairs that are themselves connected — the standard
    * tight-community / link-farm signal that complements g02's raw
    * triangle counts with a degree-normalized score.
    *
    * Determinism: the coefficient is reported as the INTEGER
    * `cc_ppm = (2·T·10⁶) DIV (deg·(deg−1))` — triangles and degrees
    * are exact longs from [[triangleCounts]], so the score is
    * bit-identical on any engine or partitioning (the g01 discipline).
    *
    * Scale shape: reuses g02's degree-oriented triangle count (wedge
    * fan-out bounded by O(√m) out-degree) plus ONE degree aggregate
    * and one equi-join of two node-sized frames; the co-occurrence
    * edge construction is the linear adjacent-pairs form, never the
    * per-order cross product. */
  val clusteringCoefficient: QueryDef = QueryDef(
    "g12_clustering_coeff",
    (s, d) => {
      val edges = cooccurEdges(s, d)
        .localCheckpoint()
      val deg = edges.select(col("u").as("node_id"))
        .union(edges.select(col("v").as("node_id")))
        .groupBy("node_id").agg(count(lit(1)).as("deg"))
      deg.filter(col("deg") >= 2)
        .join(triangleCounts(edges), Seq("node_id"), "left")
        .select(col("node_id"), col("deg"),
          coalesce(col("triangles"), lit(0L)).as("triangles"))
        .withColumn("cc_ppm",
          expr("(2 * triangles * 1000000) DIV (deg * (deg - 1))"))
        .orderBy(col("cc_ppm").desc, col("deg").desc, col("node_id"))
        .limit(20)
    },
    Some("""WITH parts AS (
              SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
            lagged AS (
              SELECT lag(pk) OVER (PARTITION BY ok ORDER BY pk) AS u, pk AS v
              FROM parts),
            edges AS (
              SELECT DISTINCT u, v FROM lagged WHERE u IS NOT NULL),
            deg AS (
              SELECT n, count(*) AS deg FROM (
                SELECT u AS n FROM edges UNION ALL SELECT v FROM edges)
              GROUP BY 1),
            oriented AS (
              SELECT CASE WHEN (du.deg, u) < (dv.deg, v) THEN u ELSE v END AS a,
                     CASE WHEN (du.deg, u) < (dv.deg, v) THEN v ELSE u END AS b,
                     CASE WHEN (du.deg, u) < (dv.deg, v) THEN dv.deg ELSE du.deg END AS db
              FROM edges
              JOIN deg du ON du.n = edges.u
              JOIN deg dv ON dv.n = edges.v),
            wedges AS (
              SELECT w1.a, w1.b AS p, w2.b AS q
              FROM oriented w1 JOIN oriented w2 USING (a)
              WHERE (w1.db, w1.b) < (w2.db, w2.b)),
            tri AS (
              SELECT w.a, w.p, w.q
              FROM wedges w JOIN oriented o ON o.a = w.p AND o.b = w.q),
            tcounts AS (
              SELECT node_id, count(*) AS triangles FROM (
                SELECT a AS node_id FROM tri
                UNION ALL SELECT p FROM tri
                UNION ALL SELECT q FROM tri)
              GROUP BY 1)
            SELECT deg.n AS node_id, deg.deg,
              CAST(coalesce(t.triangles, 0) AS BIGINT) AS triangles,
              CAST((2 * coalesce(t.triangles, 0) * 1000000)
                // (deg.deg * (deg.deg - 1)) AS BIGINT) AS cc_ppm
            FROM deg LEFT JOIN tcounts t ON t.node_id = deg.n
            WHERE deg.deg >= 2
            ORDER BY cc_ppm DESC, deg DESC, node_id
            LIMIT 20"""))

  /** g13 — degree assortativity coefficient (Newman, "Assortative
    * mixing in networks", PRL 2002): the Pearson correlation of the
    * degrees at either end of an edge. Positive = hubs link to hubs
    * (social networks), negative = hubs link to leaves (the
    * hub-and-spoke shape typical of catalog/bipartite-derived graphs)
    * — the one-number structural summary that says which scaling
    * regime the graph's joins will hit.
    *
    * Determinism: over the symmetric directed edge list, Σj = Σk and
    * Σj² = Σk², so r collapses to
    * (M·Σjk − (Σj)²) / (M·Σj² − (Σj)²). The four SUMS are exact
    * order-independent longs; the products are computed in DOUBLE —
    * (Σj)² alone reaches ~10²⁰ at the sf1.0 probe (Σj = Σdeg² over
    * hub degrees), past 2⁶³, so an integer numerator would overflow
    * exactly where the probe found it. Both engines evaluate the SAME
    * IEEE expression over the SAME exact longs → bit-identical ratio;
    * the ~10⁻¹⁶ relative error of the double products is far inside
    * round(6).
    *
    * Scale shape: one degree aggregate, two node-keyed equi-joins to
    * attach endpoint degrees, one global sum — no windows, no
    * iteration. */
  val assortativity: QueryDef = QueryDef(
    "g13_assortativity",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey").as("p"),
          (col("l_suppkey") + SuppOffset).as("sup"))
        .distinct()
      val e = li.select(col("p").as("u"), col("sup").as("v"))
        .union(li.select(col("sup").as("u"), col("p").as("v")))
      val deg = e.groupBy("u").agg(count(lit(1)).as("deg"))
      e.join(deg.select(col("u"), col("deg").as("ju")), "u")
        .join(deg.select(col("u").as("v"), col("deg").as("kv")), "v")
        .agg(count(lit(1)).as("m_directed"),
          sum(expr("ju * kv")).as("sum_jk"),
          sum(col("ju")).as("sum_j"),
          sum(expr("ju * ju")).as("sum_jj"))
        .selectExpr("m_directed", "sum_jk", "sum_j", "sum_jj",
          "round((CAST(m_directed AS DOUBLE) * CAST(sum_jk AS DOUBLE) - " +
            "CAST(sum_j AS DOUBLE) * CAST(sum_j AS DOUBLE)) / " +
            "(CAST(m_directed AS DOUBLE) * CAST(sum_jj AS DOUBLE) - " +
            "CAST(sum_j AS DOUBLE) * CAST(sum_j AS DOUBLE)), 6) " +
            "AS assortativity")
    },
    Some(s"""WITH li AS (SELECT DISTINCT l_partkey AS p,
                           l_suppkey + $SuppOffset AS sup FROM lineitem),
              e AS (SELECT p AS u, sup AS v FROM li
                    UNION ALL SELECT sup, p FROM li),
              deg AS (SELECT u, count(*) AS deg FROM e GROUP BY 1),
              j AS (SELECT e.u, e.v, du.deg AS ju, dv.deg AS kv
                    FROM e JOIN deg du ON du.u = e.u
                           JOIN deg dv ON dv.u = e.v)
            SELECT count(*) AS m_directed,
              CAST(sum(ju * kv) AS BIGINT) AS sum_jk,
              CAST(sum(ju) AS BIGINT) AS sum_j,
              CAST(sum(ju * ju) AS BIGINT) AS sum_jj,
              round((CAST(count(*) AS DOUBLE)
                       * CAST(CAST(sum(ju * kv) AS BIGINT) AS DOUBLE)
                     - CAST(CAST(sum(ju) AS BIGINT) AS DOUBLE)
                       * CAST(CAST(sum(ju) AS BIGINT) AS DOUBLE)) /
                    (CAST(count(*) AS DOUBLE)
                       * CAST(CAST(sum(ju * ju) AS BIGINT) AS DOUBLE)
                     - CAST(CAST(sum(ju) AS BIGINT) AS DOUBLE)
                       * CAST(CAST(sum(ju) AS BIGINT) AS DOUBLE)), 6)
                AS assortativity
            FROM j"""))

  /** g14 — weakly-connected components of the SUPPORT-FILTERED
    * co-purchase graph: g02's adjacent-in-sorted-order part edges kept
    * only when the pair co-occurs in ≥ 2 distinct orders (the standard
    * min-support cut that turns the near-complete co-occurrence graph
    * into sparse product communities), labeled with the
    * alternating-star contraction d07 already ships
    * (Kiveris et al., "Connected components in MapReduce and beyond",
    * SoCC 2014), then summarized as the component-SIZE histogram plus
    * the giant-component share — the first profile every graph
    * pipeline reads before deciding whether per-component processing
    * is feasible.
    *
    * Determinism: component labels are min-reachable-node-id (the d07
    * contract, mirrored by the oracle's recursive closure); the
    * histogram and totals are pure integer aggregates; giant share is
    * integer ppm.
    *
    * Scale shape: edge building is the g02 linear lag window; the
    * support filter is one (u,v) count aggregate; star contraction is
    * O(log n) rounds of degree-keyed equi-joins with checkpointed
    * lineage; the histogram reduces components to a ≤ max-size-row
    * frame and the 1-row totals broadcast attaches via the whitelisted
    * e05 idiom. */
  val wcc: QueryDef = QueryDef(
    "g14_wcc",
    (s, d) => {
      val pairs = cooccurAdjPairs(s, d)
        .groupBy("u", "v").agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .select(col("u").as("a_id"), col("v").as("b_id"))
      val sizes = Dedup.connectedComponents(pairs)
        .groupBy("component").agg(count(lit(1)).as("size"))
      val hist = sizes.groupBy("size")
        .agg(count(lit(1)).as("n_components"))
      val totals = sizes.agg(sum("size").as("n_nodes"),
        max("size").as("giant_size"))
      hist.crossJoin(broadcast(totals))
        .selectExpr("size", "n_components", "n_nodes", "giant_size",
          "(giant_size * 1000000) DIV n_nodes AS giant_ppm")
        .orderBy("size")
    },
    Some("""WITH RECURSIVE parts AS (
              SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
              FROM lineitem),
            lagged AS (
              SELECT lag(pk) OVER (PARTITION BY ok ORDER BY pk) AS u,
                pk AS v
              FROM parts),
            sup AS (
              SELECT u, v, count(*) AS support FROM lagged
              WHERE u IS NOT NULL GROUP BY 1, 2),
            pairs AS (SELECT u, v FROM sup WHERE support >= 2),
            edges AS (
              SELECT u AS src, v AS dst FROM pairs
              UNION
              SELECT v AS src, u AS dst FROM pairs),
            reach(id, r) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.src, reach.r FROM edges e
              JOIN reach ON reach.id = e.dst),
            labels AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
            sizes AS (
              SELECT component, count(*) AS size FROM labels GROUP BY 1),
            hist AS (
              SELECT size, count(*) AS n_components FROM sizes GROUP BY 1),
            tot AS (
              SELECT CAST(sum(size) AS BIGINT) AS n_nodes,
                CAST(max(size) AS BIGINT) AS giant_size
              FROM sizes)
            SELECT h.size, h.n_components, t.n_nodes, t.giant_size,
              (t.giant_size * 1000000) // t.n_nodes AS giant_ppm
            FROM hist h, tot t ORDER BY size"""))

  /** g15 — double-sweep diameter estimation (Magnien, Latapy &
    * Habib, JEA 2009: BFS from an arbitrary node, re-BFS from the
    * farthest node found; the second eccentricity is the standard
    * tight lower bound on graph diameter — THE practical way to bound
    * the diameter of a web-scale graph, where all-pairs is hopeless).
    * Sweep 1 starts from the minimum node id (deterministic
    * "arbitrary"); the farthest reached node (max hops, min id tie)
    * seeds sweep 2. Output: both sweeps' hop-frontier histograms —
    * the diameter lower bound is sweep 2's max hop, and the frontier
    * profile is the expansion curve a partitioner reads.
    *
    * Determinism: g05's integer encoding (enc = dist·10¹⁰ + seed id,
    * one BIGINT min per round); rounds FIXED (4 per sweep, mirrored
    * as unrolled CTEs); the farthest pick is a total order
    * (dist DESC, id ASC, LIMIT 1) in both engines.
    *
    * Scale shape: per round one equi shuffle of 16-byte node state
    * against the edge list (g05's envelope, ×2 sweeps); the
    * farthest-node selection is a top-1 TakeOrdered (never a driver
    * collect); the output is bounded by 2 × rounds rows. */
  val diameterSweep: QueryDef = {
    val Rounds = 4
    val Stride = 10000000000L
    QueryDef(
      "g15_diameter_sweep",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey").as("p"),
            (col("l_suppkey") + SuppOffset).as("sup"))
          .distinct()
        val e = li.select(col("p").as("u"), col("sup").as("v"))
          .union(li.select(col("sup").as("u"), col("p").as("v")))
          .localCheckpoint() // feeds both sweeps' relaxation joins
        val src = e.select(col("u").as("id")).distinct()
          .orderBy(col("id")).limit(1)
        val s1 = bfsEncode(e, src, Rounds, Stride)
          .select(col("id"), expr(s"enc DIV $Stride").as("dist"))
          .localCheckpoint()
        val far = s1.orderBy(col("dist").desc, col("id")).limit(1)
          .select("id")
        val s2 = bfsEncode(e, far, Rounds, Stride)
          .select(col("id"), expr(s"enc DIV $Stride").as("dist"))
        s1.groupBy("dist").agg(count(lit(1)).as("n_nodes"))
          .select(lit(1L).as("sweep"), col("dist"), col("n_nodes"))
          .union(s2.groupBy("dist").agg(count(lit(1)).as("n_nodes"))
            .select(lit(2L).as("sweep"), col("dist"), col("n_nodes")))
          .orderBy("sweep", "dist")
      },
      Some {
        val base =
          s"""li AS (SELECT DISTINCT l_partkey AS p,
                       l_suppkey + $SuppOffset AS sup FROM lineitem),
              e AS MATERIALIZED (SELECT p AS u, sup AS v FROM li
                    UNION ALL SELECT sup, p FROM li),
              src AS (SELECT min(u) AS id FROM e),
              s1_0 AS (SELECT id, id AS enc FROM src)"""
        def sweepCtes(tag: String): String = (1 to Rounds).map { r =>
          s"""${tag}_$r AS MATERIALIZED (
                SELECT id, min(enc) AS enc FROM (
                  SELECT e.v AS id, ${tag}_${r - 1}.enc + $Stride AS enc
                  FROM e JOIN ${tag}_${r - 1} ON ${tag}_${r - 1}.id = e.u
                  UNION ALL SELECT id, enc FROM ${tag}_${r - 1})
                GROUP BY 1)"""
        }.mkString(",\n")
        s"""WITH $base,
            ${sweepCtes("s1")},
            far AS (SELECT id FROM s1_$Rounds
                    ORDER BY enc // $Stride DESC, id LIMIT 1),
            s2_0 AS (SELECT id, id AS enc FROM far),
            ${sweepCtes("s2")}
            SELECT CAST(1 AS BIGINT) AS sweep,
              CAST(enc // $Stride AS BIGINT) AS dist,
              CAST(count(*) AS BIGINT) AS n_nodes
            FROM s1_$Rounds GROUP BY 2
            UNION ALL
            SELECT CAST(2 AS BIGINT), CAST(enc // $Stride AS BIGINT),
              CAST(count(*) AS BIGINT)
            FROM s2_$Rounds GROUP BY 2
            ORDER BY sweep, dist"""
      })
  }

  /** g16 — bipartite projection (Newman, "Scientific collaboration
    * networks I", PRE 2001 §II: the one-mode projection of a two-mode
    * network): collapse the part↔supplier bipartite graph onto the
    * supplier side — two suppliers are linked with weight w = the
    * number of distinct parts they BOTH supply — and report each
    * supplier's projected neighborhood (partner count, total/max/mean
    * co-supply weight). The projection is how recommender and
    * collaboration pipelines turn an entity↔item table into an
    * entity↔entity similarity graph without embeddings.
    *
    * Determinism: weights are exact distinct-pair counts; the mean is
    * the exact integer `(10⁶·w_sum) DIV n_partners` (both engines floor
    * non-negative longs identically) — nothing floats.
    *
    * Scale shape: pair generation is a self-EQUI-join of the distinct
    * (part, supplier) edge list on part — fanout per part is C(k,2)
    * where k = suppliers-per-part, bounded by the supply-chain
    * multiplicity (fixture max 41 → ≤ 820 pairs/part), NOT by graph
    * size; a pathological hub part would take the g02 triangle
    * discipline (degree-ordered halving / heavy-key salting). Then two
    * key-partitioned aggregates. No iteration, no collect. */
  val bipartiteProjection: QueryDef = QueryDef(
    "g16_bipartite_projection",
    (s, d) => {
      val ps = Tables.lineitem(s, d)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sup"))
        .distinct()
      val pairs = ps.as("a")
        .join(ps.as("b"),
          col("a.p") === col("b.p") && col("a.sup") < col("b.sup"))
        .groupBy(col("a.sup").as("s1"), col("b.sup").as("s2"))
        .agg(count(lit(1)).as("w"))
      pairs.select(col("s1").as("sup"), col("w"))
        .unionAll(pairs.select(col("s2").as("sup"), col("w")))
        .groupBy("sup")
        .agg(count(lit(1)).as("n_partners"), sum(col("w")).as("w_sum"),
          max(col("w")).as("w_max"))
        .withColumn("mean_w_e6", expr("(1000000 * w_sum) DIV n_partners"))
        .orderBy("sup")
    },
    Some("""WITH ps AS (
              SELECT DISTINCT l_partkey AS p, l_suppkey AS sup
              FROM lineitem),
            pairs AS (
              SELECT a.sup AS s1, b.sup AS s2, count(*) AS w
              FROM ps a JOIN ps b ON a.p = b.p AND a.sup < b.sup
              GROUP BY 1, 2),
            sym AS (
              SELECT s1 AS sup, w FROM pairs
              UNION ALL SELECT s2, w FROM pairs)
            SELECT sup, count(*) AS n_partners,
              CAST(sum(w) AS BIGINT) AS w_sum,
              CAST(max(w) AS BIGINT) AS w_max,
              (1000000 * CAST(sum(w) AS BIGINT)) // count(*) AS mean_w_e6
            FROM sym GROUP BY 1 ORDER BY 1"""))

  /** g17 — SEEDED BETWEENNESS (Brandes, "A Faster Algorithm for
    * Betweenness Centrality", 2001 — the standard two-phase scheme:
    * forward BFS counting shortest paths σ, then backward accumulation
    * of dependencies δ(v) = Σ_w σ(v)/σ(w) · (1 + δ(w)) over the
    * successors w one level deeper). Exact betweenness sums over ALL
    * sources; at 100 TB nobody does that — the production form is the
    * pivot/seed-sampled estimator (Brandes & Pich 2007), computed here
    * for a bounded 2-supplier seed panel over the part-supplier graph,
    * truncated at 3 BFS levels.
    *
    * Determinism discipline: σ is an EXACT integer path count (level-
    * wise sums); δ is INTEGER-SCALED — each contribution is
    * (σ_v · (1000 + δ'_w)) DIV σ_w with δ' ≈ 1000·δ — so every
    * cross-row sum is order-free BIGINT arithmetic (the float
    * dependency ratios of textbook Brandes would be order-dependent
    * under shuffle). Truncation floors each contribution; the score is
    * a deterministic lower bound within 1/1000 per term, which
    * preserves the ranking the operator exists to deliver. Overflow
    * bounds: σ ≤ ~10⁶ at 3 levels on the probe graphs, δ' ≤ 10³·|V|,
    * product < 10¹⁶ « 2⁶³.
    *
    * Scale shape: per level ONE equi-join of the frontier against the
    * localCheckpointed edge list + a (seed, node)-keyed sum, then the
    * same backward — 2·Levels bounded rounds, frontier state 24 bytes
    * per (seed, node), the d07 checkpoint discipline per round. The
    * oracle mirrors both phases as unrolled CTEs. */
  val seededBetweenness: QueryDef = {
    val Levels = 3
    val Seeds = 2
    val Scale = 1000L
    QueryDef(
      "g17_seeded_betweenness",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey").as("p"),
            (col("l_suppkey") + SuppOffset).as("sup"))
          .distinct()
        val e = li.select(col("p").as("u"), col("sup").as("v"))
          .union(li.select(col("sup").as("u"), col("p").as("v")))
          .localCheckpoint()
        // forward: per (seed, id) the BFS level and exact path count σ
        val f0 = e.select(col("u").as("id")).distinct()
          .filter(col("id").between(SuppOffset + 1, SuppOffset + Seeds))
          .select(col("id").as("seed"), col("id"), lit(1L).as("sigma"))
          .localCheckpoint()
        var levels = Vector(f0)
        // visited is a UNION of already-checkpointed level frames, so
        // re-checkpointing it copied every level's rows again each
        // round (r15: Levels extra materialization jobs removed); the
        // union's lineage is one node per level — bounded by Levels
        var visited = f0.select("seed", "id")
        for (_ <- 1 to Levels) {
          val prev = levels.last
            .select(col("seed"), col("id").as("pid"), col("sigma"))
          val next = e.join(prev, e("u") === prev("pid"))
            .select(col("seed"), col("v").as("id"), col("sigma"))
            .groupBy("seed", "id").agg(sum("sigma").as("sigma"))
            .join(visited, Seq("seed", "id"), "left_anti")
            .localCheckpoint()
          levels = levels :+ next
          visited = visited.union(next.select("seed", "id"))
        }
        // backward: integer-scaled dependency per (seed, id), deepest
        // level seeds δ' = 0
        var delta = levels(Levels)
          .select(col("seed"), col("id"), lit(0L).as("delta"))
          .localCheckpoint()
        var scores = Vector.empty[org.apache.spark.sql.DataFrame]
        for (r <- (Levels - 1) to 0 by -1) {
          val dj = levels(r + 1)
            .select(col("seed").as("wseed"), col("id").as("wid"),
              col("sigma").as("wsigma"))
            .join(delta
              .select(col("seed").as("dseed"), col("id").as("did"),
                col("delta").as("wdelta")),
              col("wseed") === col("dseed") && col("wid") === col("did"))
            .select("wseed", "wid", "wsigma", "wdelta")
          val cur = levels(r)
          val contrib = cur.join(e, cur("id") === e("u"))
            .select(col("seed"), col("id"), col("sigma"), col("v"))
            .join(dj, col("seed") === col("wseed") && col("v") === col("wid"))
            .select(col("seed"), col("id"),
              expr(s"(sigma * ($Scale + wdelta)) DIV wsigma").as("c"))
            .groupBy("seed", "id").agg(sum("c").as("delta"))
          delta = cur.select("seed", "id")
            .join(contrib, Seq("seed", "id"), "left")
            .na.fill(0L, Seq("delta"))
            .localCheckpoint()
          if (r >= 1) scores = scores :+ delta
        }
        scores.reduce(_ union _)
          .groupBy("id").agg(sum("delta").as("bc"))
          .filter(col("bc") > 0)
          .select(
            expr(s"CASE WHEN id >= $SuppOffset THEN 'supplier' ELSE 'part' END")
              .as("kind"),
            expr(s"CASE WHEN id >= $SuppOffset THEN id - $SuppOffset ELSE id END")
              .as("node_id"),
            col("bc"))
          .orderBy(col("bc").desc, col("kind"), col("node_id"))
          .limit(20)
      },
      Some {
        val lo = SuppOffset + 1
        val hi = SuppOffset + Seeds
        def notIn(levelsDone: Seq[String], seedRef: String) =
          levelsDone.map(l =>
            s"NOT EXISTS (SELECT 1 FROM $l x WHERE x.seed = $seedRef" +
              " AND x.id = e.v)").mkString(" AND ")
        s"""WITH li AS (SELECT DISTINCT l_partkey AS p,
                          l_suppkey + $SuppOffset AS sup FROM lineitem),
              e AS MATERIALIZED (SELECT p AS u, sup AS v FROM li
                    UNION ALL SELECT sup, p FROM li),
              f0 AS MATERIALIZED (
                SELECT DISTINCT u AS seed, u AS id, CAST(1 AS BIGINT) AS sigma
                FROM e WHERE u BETWEEN $lo AND $hi),
              f1 AS MATERIALIZED (
                SELECT f0.seed, e.v AS id,
                       CAST(sum(f0.sigma) AS BIGINT) AS sigma
                FROM e JOIN f0 ON e.u = f0.id
                WHERE ${notIn(Seq("f0"), "f0.seed")}
                GROUP BY 1, 2),
              f2 AS MATERIALIZED (
                SELECT f1.seed, e.v AS id,
                       CAST(sum(f1.sigma) AS BIGINT) AS sigma
                FROM e JOIN f1 ON e.u = f1.id
                WHERE ${notIn(Seq("f0", "f1"), "f1.seed")}
                GROUP BY 1, 2),
              f3 AS MATERIALIZED (
                SELECT f2.seed, e.v AS id,
                       CAST(sum(f2.sigma) AS BIGINT) AS sigma
                FROM e JOIN f2 ON e.u = f2.id
                WHERE ${notIn(Seq("f0", "f1", "f2"), "f2.seed")}
                GROUP BY 1, 2),
              d3 AS (SELECT seed, id, CAST(0 AS BIGINT) AS delta FROM f3),
              d2 AS MATERIALIZED (
                SELECT f2.seed, f2.id,
                  CAST(coalesce(sum(
                    (f2.sigma * ($Scale + d3.delta)) // f3.sigma), 0)
                    AS BIGINT) AS delta
                FROM f2
                LEFT JOIN e ON e.u = f2.id
                LEFT JOIN f3 ON f3.seed = f2.seed AND f3.id = e.v
                LEFT JOIN d3 ON d3.seed = f2.seed AND d3.id = e.v
                GROUP BY 1, 2),
              d1 AS MATERIALIZED (
                SELECT f1.seed, f1.id,
                  CAST(coalesce(sum(
                    (f1.sigma * ($Scale + d2.delta)) // f2.sigma), 0)
                    AS BIGINT) AS delta
                FROM f1
                LEFT JOIN e ON e.u = f1.id
                LEFT JOIN f2 ON f2.seed = f1.seed AND f2.id = e.v
                LEFT JOIN d2 ON d2.seed = f1.seed AND d2.id = e.v
                GROUP BY 1, 2),
              sc AS (
                SELECT id, CAST(sum(delta) AS BIGINT) AS bc FROM (
                  SELECT seed, id, delta FROM d1
                  UNION ALL SELECT seed, id, delta FROM d2)
                GROUP BY id)
            SELECT CASE WHEN id >= $SuppOffset THEN 'supplier' ELSE 'part' END
                     AS kind,
                   CAST(CASE WHEN id >= $SuppOffset THEN id - $SuppOffset
                        ELSE id END AS BIGINT) AS node_id,
                   bc
            FROM sc WHERE bc > 0
            ORDER BY bc DESC, kind, node_id
            LIMIT 20"""
      })
  }

  /** g18 — exact two-hop reach for a bounded seed panel (the
    * "audience estimation" / friends-of-friends primitive — Pregel's
    * canonical 2-superstep query; approximate engines answer it with
    * HLL neighborhoods a la Boldi–Vigna HyperANF, this is the exact
    * form the sketch is validated against): per seed supplier, the
    * distinct parts it supplies (1-hop) and the distinct OTHER
    * suppliers sharing any of those parts (2-hop co-suppliers), with
    * the co-supplier share of the supplier universe in exact ppm.
    * Differs from g05 (level census from ONE source via iterative
    * relaxation) — this is a per-seed exact DISTINCT reach through
    * two equi-joins, no iteration.
    *
    * Determinism: all distinct counts exact; the domain frame keeps
    * seeds with no lineitem (s13's lesson).
    *
    * Scale shape: edge list distinct once (part-keyed); seed filter
    * pushes into the scan; two part-keyed equi-joins + two hash
    * distinct-aggs; the seed panel is bounded (8), so intermediate
    * fan-out is (seed parts)·(suppliers/part) — the 2-hop frontier,
    * not the graph. */
  val twoHopReach: QueryDef = {
    val nSeeds = 8L
    QueryDef(
      "g18_two_hop_reach",
      (s, d) => {
        val edges = Tables.lineitem(s, d)
          .select(col("l_partkey").as("p"), col("l_suppkey").as("sup"))
          .distinct()
        val seeds = Tables.supplier(s, d)
          .filter(col("s_suppkey") <= nSeeds)
          .select(col("s_suppkey").as("seed"))
        val nSup = Tables.supplier(s, d)
          .agg(count(lit(1)).as("n_sup_total"))
        val hop1 = edges.filter(col("sup") <= nSeeds)
          .select(col("sup").as("seed"), col("p"))
        val hop2 = hop1.join(edges, Seq("p"))
          .filter(col("sup") =!= col("seed"))
        val perSeed = hop1.groupBy("seed")
          .agg(countDistinct(col("p")).as("n_parts"))
          .join(hop2.groupBy("seed")
            .agg(countDistinct(col("sup")).as("n_cosuppliers")), Seq("seed"))
        seeds.join(perSeed, Seq("seed"), "left")
          .na.fill(0L, Seq("n_parts", "n_cosuppliers"))
          .crossJoin(broadcast(nSup))
          .withColumn("reach_ppm",
            expr("(1000000 * n_cosuppliers) DIV (n_sup_total - 1)"))
          .select("seed", "n_parts", "n_cosuppliers", "n_sup_total",
            "reach_ppm")
          .orderBy("seed")
      },
      Some(s"""WITH edges AS (
                 SELECT DISTINCT l_partkey AS p, l_suppkey AS sup
                 FROM lineitem),
               seeds AS (
                 SELECT s_suppkey AS seed FROM supplier
                 WHERE s_suppkey <= $nSeeds),
               tot AS (
                 SELECT CAST(count(*) AS BIGINT) AS n_sup_total
                 FROM supplier),
               hop1 AS (
                 SELECT sup AS seed, p FROM edges WHERE sup <= $nSeeds),
               hop2 AS (
                 SELECT h.seed, e.sup FROM hop1 h
                 JOIN edges e ON e.p = h.p AND e.sup != h.seed),
               per AS (
                 SELECT a.seed,
                   CAST(a.n_parts AS BIGINT) AS n_parts,
                   CAST(b.n_cosup AS BIGINT) AS n_cosuppliers
                 FROM (SELECT seed, count(DISTINCT p) AS n_parts
                       FROM hop1 GROUP BY 1) a
                 JOIN (SELECT seed, count(DISTINCT sup) AS n_cosup
                       FROM hop2 GROUP BY 1) b USING (seed))
               SELECT seeds.seed,
                 coalesce(per.n_parts, 0) AS n_parts,
                 coalesce(per.n_cosuppliers, 0) AS n_cosuppliers,
                 tot.n_sup_total,
                 (1000000 * coalesce(per.n_cosuppliers, 0))
                   // (tot.n_sup_total - 1) AS reach_ppm
               FROM seeds LEFT JOIN per USING (seed)
               CROSS JOIN tot
               ORDER BY seed"""))
  }

  /** g19 — k-truss support census with one peel round (Cohen,
    * "Trussness of a graph", NSA tech report 2008; the truss is the
    * triangle analog of g03's k-core): per-edge SUPPORT = the number
    * of triangles the edge closes; the 3-truss peel drops support-0
    * edges and recounts — cascades (an edge's support can fall when a
    * neighboring edge is peeled) make the full truss iterative, so
    * like g03 the round count is FIXED (2: census → peel → re-census)
    * and engine-mirrorable round for round.
    *
    * Triangle enumeration uses g02's DEGREE-ORDERED orientation
    * (Chiba & Nishizeki 1985 / the "compact-forward" of Latapy 2008):
    * each undirected edge points from its lower-(deg, id) endpoint to
    * the higher, wedges enumerate pairs of out-edges per center, and
    * a triangle is a wedge whose far pair is itself an oriented edge —
    * per-center out-degree is bounded by arboricity, so wedge counts
    * stay near-linear where the naive u<v<w self-join is quadratic in
    * the max degree (its unoriented form spilled DuckDB at sf0.5).
    * The orientation predicate is plain boolean SQL (deg < deg OR
    * (= AND id <)), portable to both engines verbatim.
    *
    * Determinism: pure integer counts over exact joins. Scale shape:
    * edge self-joins on node keys — the same shuffle family as
    * g02/g12; the census aggregates are 1-row. */
  val ktrussSupport: QueryDef = {
    // oriented triangle block, reusable per peel round: IN = the
    // canonical (u < v) undirected edge CTE to count over
    // mat: "AS MATERIALIZED" for the DuckDB mirror — its optimizer
    // INLINES multiply-referenced CTEs, and this chain references tri
    // from three union branches and sup1 from the peel + census, so
    // inlining recomputes the whole pipeline exponentially (observed:
    // 4 s unmaterialized at sf0.01 for one round, minutes for two).
    // Spark has no MATERIALIZED and needs none (plan DAG, not text).
    def triBlock(in: String, deg: String, ori: String, tri: String,
        sup: String, mat: String): String =
      s"""$deg $mat (
            SELECT n, count(*) AS deg FROM (
              SELECT u AS n FROM $in UNION ALL SELECT v FROM $in)
            GROUP BY 1),
          $ori $mat (
            SELECT CASE WHEN du.deg < dv.deg
                     OR (du.deg = dv.deg AND u < v) THEN u ELSE v END AS a,
                   CASE WHEN du.deg < dv.deg
                     OR (du.deg = dv.deg AND u < v) THEN v ELSE u END AS b,
                   CASE WHEN du.deg < dv.deg
                     OR (du.deg = dv.deg AND u < v) THEN dv.deg
                     ELSE du.deg END AS db
            FROM $in
            JOIN $deg du ON du.n = $in.u
            JOIN $deg dv ON dv.n = $in.v),
          $tri $mat (
            SELECT w1.a, w1.b AS p, w2.b AS q
            FROM $ori w1
            JOIN $ori w2 ON w2.a = w1.a
              AND (w1.db < w2.db OR (w1.db = w2.db AND w1.b < w2.b))
            -- the wedge orders (db, id) exactly as the orientation
            -- does, so the closing edge can only point w1.b -> w2.b:
            -- a pure equi-join, never a nested loop
            JOIN $ori o ON o.a = w1.b AND o.b = w2.b),
          $sup $mat (
            SELECT eu, ev, count(*) AS support FROM (
              SELECT least(a, p) AS eu, greatest(a, p) AS ev FROM $tri
              UNION ALL SELECT least(a, q), greatest(a, q) FROM $tri
              UNION ALL SELECT least(p, q), greatest(p, q) FROM $tri)
            GROUP BY 1, 2)"""
    def sql(src: String, mat: String): String =
      s"""WITH parts AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM $src),
          lagged AS (
            SELECT lag(pk) OVER (PARTITION BY ok ORDER BY pk) AS u, pk AS v
            FROM parts),
          edges $mat (
            SELECT DISTINCT u, v FROM lagged WHERE u IS NOT NULL),
          ${triBlock("edges", "deg", "ori", "tri", "sup1", mat)},
          e2r $mat (
            SELECT u, v FROM edges JOIN sup1 ON eu = u AND ev = v
            WHERE support >= 1),
          ${triBlock("e2r", "deg2", "ori2", "tri2", "sup2", mat)}
          SELECT CAST(1 AS BIGINT) AS round,
            (SELECT count(*) FROM edges) AS n_edges,
            (SELECT count(*) FROM tri) AS n_triangles,
            (SELECT count(*) FROM sup1) AS n_supported_edges,
            (SELECT coalesce(max(support), 0) FROM sup1) AS max_support
          UNION ALL
          SELECT CAST(2 AS BIGINT),
            (SELECT count(*) FROM e2r),
            (SELECT count(*) FROM tri2),
            (SELECT count(*) FROM sup2),
            (SELECT coalesce(max(support), 0) FROM sup2)
          ORDER BY round"""
    QueryDef(
      "g19_ktruss_support",
      // Spark side is a DataFrame pipeline with localCheckpoint stage
      // reuse: Spark inlines WITH exactly like DuckDB does, so the SQL
      // form recomputed tri/sup exponentially too (28 s at sf0.1 vs
      // ~2 s checkpointed). Each stage is computed ONCE per round and
      // the lineage stays constant — the d07 iterative-job rule.
      (s, d) => {
        import org.apache.spark.sql.DataFrame
        val edges0 = cooccurEdges(s, d)
          .localCheckpoint()
        def census(edges: DataFrame): (DataFrame, DataFrame) = {
          val deg = edges.select(col("u").as("n"))
            .union(edges.select(col("v").as("n")))
            .groupBy("n").agg(count(lit(1)).as("dg"))
          val lower = col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v"))
          val ori = edges
            .join(deg.select(col("n").as("un"), col("dg").as("du")),
              col("u") === col("un"))
            .join(deg.select(col("n").as("vn"), col("dg").as("dv")),
              col("v") === col("vn"))
            .select(
              when(lower, col("u")).otherwise(col("v")).as("a"),
              when(lower, col("v")).otherwise(col("u")).as("b"),
              when(lower, col("dv")).otherwise(col("du")).as("db"))
            .localCheckpoint()
          val w2 = ori.select(col("a").as("wa2"), col("b").as("q"),
            col("db").as("dq"))
          val tri = ori.select(col("a").as("wa"), col("b").as("p"),
              col("db").as("dp"))
            .join(w2, col("wa") === col("wa2") &&
              (col("dp") < col("dq") ||
                (col("dp") === col("dq") && col("p") < col("q"))))
            .join(ori.select(col("a").as("oa"), col("b").as("ob")),
              col("p") === col("oa") && col("q") === col("ob"))
            .select(col("wa").as("a"), col("p"), col("q"))
            .localCheckpoint()
          val sup = tri
            .select(least(col("a"), col("p")).as("eu"),
              greatest(col("a"), col("p")).as("ev"))
            .union(tri.select(least(col("a"), col("q")),
              greatest(col("a"), col("q"))))
            .union(tri.select(least(col("p"), col("q")),
              greatest(col("p"), col("q"))))
            .groupBy("eu", "ev").agg(count(lit(1)).as("support"))
            .localCheckpoint()
          (tri, sup)
        }
        def censusRow(round: Int, edges: DataFrame, tri: DataFrame,
            sup: DataFrame): DataFrame =
          edges.agg(count(lit(1)).as("n_edges"))
            .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
            .crossJoin(sup.agg(
              count(lit(1)).as("n_supported_edges"),
              coalesce(max(col("support")), lit(0L)).as("max_support")))
            .select(lit(round.toLong).as("round"), col("n_edges"),
              col("n_triangles"), col("n_supported_edges"),
              col("max_support"))
        val (tri1, sup1) = census(edges0)
        val e2r = edges0
          .join(sup1, col("u") === col("eu") && col("v") === col("ev"))
          .filter(col("support") >= 1)
          .select("u", "v").localCheckpoint()
        val (tri2, sup2) = census(e2r)
        censusRow(1, edges0, tri1, sup1)
          .union(censusRow(2, e2r, tri2, sup2))
          .orderBy("round")
      },
      Some(sql("lineitem", "AS MATERIALIZED")))
  }

  /** g20 — rich-club coefficient ladder (Zhou & Mondragón, IEEE Comm
    * Letters 2004; the normalized form is Colizza et al., Nature
    * Physics 2006 — this is the raw φ(k), the census the normalized
    * variant divides): for each degree threshold k in a fixed ladder,
    * restrict to the "club" of nodes with degree > k and read
    * φ(k) = 2·E_k / (N_k·(N_k−1)) — do high-degree nodes link to each
    * other more than chance? The hub-interconnection diagnostic for
    * supplier/part co-occurrence topology.
    *
    * Determinism: integer counts; φ emitted as ppm via DIV with a
    * zero-guard on singleton clubs. Scale shape: one degree frame,
    * one ladder explode over it (domain-sized), and per-k edge
    * membership via two semi-join-shaped joins on the node key — the
    * edge list is touched once per ladder rung, never self-joined. */
  val richClub: QueryDef = {
    val ladder = Seq(1, 2, 3, 4, 6, 8)
    // mat: "AS MATERIALIZED" on the DuckDB side — edges/deg/club are
    // each referenced more than once and DuckDB INLINES multi-ref CTEs
    // (the g19 lesson: nested re-inlining goes exponential — the
    // unmaterialized form of this query ran 24 min at sf0.5, the
    // materialized one seconds)
    def sql(src: String, arr: String, mat: String): String =
      s"""WITH parts AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM $src),
          lagged AS (
            SELECT lag(pk) OVER (PARTITION BY ok ORDER BY pk) AS u, pk AS v
            FROM parts),
          edges $mat (
            SELECT DISTINCT u, v FROM lagged WHERE u IS NOT NULL),
          deg $mat (
            SELECT n, count(*) AS deg FROM (
              SELECT u AS n FROM edges UNION ALL SELECT v FROM edges)
            GROUP BY 1),
          club $mat (
            SELECT k, n FROM deg $arr WHERE deg > k),
          nk AS (
            SELECT k, count(*) AS n_nodes FROM club GROUP BY 1),
          ek AS (
            SELECT cu.k, count(*) AS n_edges
            FROM edges e
            JOIN club cu ON cu.n = e.u
            JOIN club cv ON cv.n = e.v AND cv.k = cu.k
            GROUP BY 1),
          j AS (
            SELECT nk.k, nk.n_nodes,
              CAST(coalesce(ek.n_edges, 0) AS BIGINT) AS n_edges
            FROM nk LEFT JOIN ek ON ek.k = nk.k)
          SELECT CAST(k AS INT) AS k, n_nodes, n_edges,
            CASE WHEN n_nodes < 2 THEN CAST(0 AS BIGINT)
              ELSE CAST((2000000 * n_edges) $$DIV$$
                (n_nodes * (n_nodes - 1)) AS BIGINT) END AS phi_ppm
          FROM j ORDER BY k"""
    QueryDef(
      "g20_rich_club",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("g20_lineitem")
        s.sql(sql("g20_lineitem",
          s"LATERAL VIEW explode(array(${ladder.mkString(", ")})) t AS k",
          "AS").replace("$DIV$", "DIV"))
      },
      Some(sql("lineitem",
        s", unnest([${ladder.mkString(", ")}]) AS t(k)",
        "AS MATERIALIZED").replace("$DIV$", "//")))
  }

  /** g21 — coreness ladder (the "onion" view of the degeneracy
    * decomposition — Seidman 1983 cores at k = 2, 3, 4 in one table:
    * where g03 reports ONE core's membership, the ladder is how graph
    * reports actually present robustness — core size and edge mass as
    * k rises, cf. Alvarez-Hamelin et al. NIPS 2006's k-core
    * decomposition plots): per k, the surviving node/edge census and
    * max degree after the bounded synchronous peel ([[kcoreDegrees]],
    * 3 rounds — fixture-convergent, spec-asserted).
    *
    * Determinism: pure integer censuses of converged peels; edges
    * counted as Σdeg DIV 2. Scale shape: 3 independent peels, each
    * g03's law (per-round degree agg + two semi-joins, checkpointed);
    * censuses are single aggregates — the ladder costs 3× g03, not a
    * new shape. DuckDB mirrors each peel with the g03 MATERIALIZED
    * unrolled chain (the exponential-CTE lesson), one chain per k. */
  val corenessLadder: QueryDef = {
    // the part co-occurrence graph is DENSE (min degree 18 at sf0.01,
    // median 44) with a sharp core collapse just above k=28 (k=30
    // cascades 18 rounds to empty at sf0.01): the rungs bracket that
    // transition — 24 barely peels, 28 bites, 32 empties — and 10
    // rounds cover every fixture's cascade (max observed 8; spec
    // asserts convergence at sf0.001)
    val ks = Seq(24, 28, 32)
    val Rounds = 10
    QueryDef(
      "g21_coreness_ladder",
      (s, d) => {
        val edges = cooccurEdges(s, d)
          .localCheckpoint()
        // early-exit peel: the round map is MONOTONE (edges only
        // shrink), so an unchanged edge count IS the fixpoint and all
        // remaining rounds are no-ops — stopping there yields exactly
        // the mirror's fixed-Rounds state while skipping dead rounds
        // (the fixed form ran 30 sequential checkpoint rounds; actual
        // cascade depth varies per k and per scale). The count action
        // per round reads a just-checkpointed frame — negligible.
        def peelDegrees(k: Int): org.apache.spark.sql.DataFrame = {
          var es = edges
          var prevCount = es.count()
          var r = 0
          var converged = false
          def und(e: org.apache.spark.sql.DataFrame) =
            e.select(col("u").as("n")).union(e.select(col("v").as("n")))
          while (r < Rounds && !converged) {
            val keep = und(es).groupBy("n").agg(count(lit(1)).as("deg"))
              .filter(col("deg") >= k).select("n")
            es = es
              .join(keep.withColumnRenamed("n", "u"), Seq("u"), "left_semi")
              .join(keep.withColumnRenamed("n", "v"), Seq("v"), "left_semi")
              .select("u", "v").localCheckpoint()
            val c = es.count()
            converged = c == prevCount
            prevCount = c
            r += 1
          }
          und(es).groupBy("n").agg(count(lit(1)).as("deg"))
        }
        // the three rungs are INDEPENDENT peels over the same
        // checkpointed edge list — run their eager round loops from
        // concurrent driver threads (guide §2.6 "overlap independent
        // jobs": each rung's tiny per-round jobs leave most executor
        // slots idle; overlapping back-fills them and hides the
        // per-round scheduling/planning gaps). Results are unioned in
        // ks order, so the output is identical to the sequential form.
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration.Duration
        val rungs = Await.result(
          Future.sequence(ks.map(k => Future {
            peelDegrees(k)
              .agg(count(lit(1)).as("n_nodes"),
                expr("CAST(coalesce(sum(deg), 0) DIV 2 AS BIGINT)")
                  .as("n_edges"),
                coalesce(max(col("deg")), lit(0L)).cast("long")
                  .as("max_deg"))
              .select(lit(k.toLong).as("k"), col("n_nodes"),
                col("n_edges"), col("max_deg"))
          })), Duration.Inf)
        rungs.reduce(_ unionByName _).orderBy("k")
      },
      Some {
        def chain(k: Int): String = (1 to Rounds).map { r =>
          val prev = if (r == 1) "e_0" else s"ek${k}_${r - 1}"
          s"""degk${k}_$r AS MATERIALIZED (
                SELECT n, count(*) AS deg FROM (
                  SELECT u AS n FROM $prev UNION ALL SELECT v FROM $prev)
                GROUP BY 1),
              keepk${k}_$r AS MATERIALIZED (
                SELECT n FROM degk${k}_$r WHERE deg >= $k),
              ek${k}_$r AS MATERIALIZED (
                SELECT u, v FROM $prev
                JOIN keepk${k}_$r ku ON ku.n = u
                JOIN keepk${k}_$r kv ON kv.n = v)"""
        }.mkString(",\n")
        val censuses = ks.map { k =>
          s"""SELECT CAST($k AS BIGINT) AS k,
                CAST(count(*) AS BIGINT) AS n_nodes,
                CAST(coalesce(sum(deg), 0) AS BIGINT) // 2 AS n_edges,
                CAST(coalesce(max(deg), 0) AS BIGINT) AS max_deg
              FROM (
                SELECT n, count(*) AS deg FROM (
                  SELECT u AS n FROM ek${k}_$Rounds
                  UNION ALL SELECT v FROM ek${k}_$Rounds)
                GROUP BY 1)"""
        }.mkString("\nUNION ALL\n")
        s"""WITH parts AS (
              SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
              FROM lineitem),
            lagged AS (
              SELECT lag(pk) OVER (PARTITION BY ok ORDER BY pk) AS u,
                pk AS v
              FROM parts),
            e_0 AS MATERIALIZED (
              SELECT DISTINCT u, v FROM lagged WHERE u IS NOT NULL),
            ${ks.map(chain).mkString(",\n")}
            SELECT * FROM ($censuses) ORDER BY k"""
      })
  }

  /** g22 — butterfly census over the part↔supplier bipartite graph
    * (Wang, Fu, Cheng & Yu, "Vertex priority based butterfly counting
    * for large-scale bipartite networks", VLDB 2019; the butterfly —
    * a 2×2 biclique / 4-cycle — is the bipartite analog of g02's
    * triangle and the primitive behind bipartite clustering
    * coefficients and co-engagement cohesion): wedges are supplier
    * pairs sharing a part (one part-keyed equi self-join), each pair's
    * common-part count c yields C(c,2) butterflies, attributed to both
    * endpoint suppliers; top-20 suppliers by exact butterfly count.
    *
    * Determinism: pure integer counting (c·(c−1) DIV 2). Scale shape:
    * wedge fan-out is Σ_p C(deg(p),2) — deg(p) is the
    * suppliers-per-part DATA-MODEL bound (~4 in the TPC-H shape), so
    * wedges stay ~6×|edges|; at a hub-heavy 100 TB graph the
    * vertex-priority orientation (the paper's device, g02's trick)
    * caps the explosion — documented, not needed at this degree
    * profile. The pair census frame is |supplier|²-bounded, itself
    * dimension-domain-sized. */
  val butterflyCount: QueryDef = QueryDef(
    "g22_butterfly_count",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sup"))
        .distinct()
      val pairs = li.select(col("p"), col("sup").as("s1"))
        .join(li.select(col("p"), col("sup").as("s2")), Seq("p"))
        .filter(col("s1") < col("s2"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("c"))
        .withColumn("bf", expr("(c * (c - 1)) DIV 2"))
        .filter(col("bf") > 0)
      pairs.select(explode(array(col("s1"), col("s2"))).as("supplier"),
          col("bf"), col("c"))
        .groupBy("supplier")
        .agg(sum(col("bf")).as("butterflies"),
          count(lit(1)).as("n_partner_pairs"),
          max(col("c")).as("max_common_parts"))
        .orderBy(col("butterflies").desc, col("supplier"))
        .limit(20)
    },
    Some("""WITH li AS (
              SELECT DISTINCT l_partkey AS p, l_suppkey AS sup
              FROM lineitem),
            pw AS (
              SELECT a.sup AS s1, b.sup AS s2, count(*) AS c
              FROM li a JOIN li b ON a.p = b.p AND a.sup < b.sup
              GROUP BY 1, 2),
            bf AS (
              SELECT s1, s2, c, (c * (c - 1)) // 2 AS bf
              FROM pw WHERE c > 1),
            x AS (
              SELECT s1 AS supplier, bf, c FROM bf
              UNION ALL SELECT s2, bf, c FROM bf)
            SELECT supplier, CAST(sum(bf) AS BIGINT) AS butterflies,
              CAST(count(*) AS BIGINT) AS n_partner_pairs,
              CAST(max(c) AS BIGINT) AS max_common_parts
            FROM x GROUP BY 1
            ORDER BY butterflies DESC, supplier
            LIMIT 20"""))

  /** g23 — vertex-priority butterfly counting (Wang, Fu, Cheng & Yu,
    * VLDB 2019, BFC-VP — the hub-robust device g22's doc defers): the
    * per-supplier butterfly counts of g22 recomputed with ORIENTED
    * wedge enumeration. Priority = (degree, id) — a strict total order
    * with hubs highest — and every wedge (start, mid, end) is
    * enumerated only from its strictly highest-priority endpoint:
    * pri(mid) < pri(start) and pri(end) < pri(start). Each butterfly
    * {a, b, x, y} is then counted EXACTLY ONCE, at its unique
    * max-priority vertex, as one pair in that start's (start, end)
    * wedge group — so per-group c wedges yield C(c,2) butterflies
    * credited C(c,2) to start and end and (c−1) to each mid, which is
    * the exact per-vertex butterfly count (group total
    * 2·C(c,2) + c·(c−1) = 4·C(c,2) — four vertices per butterfly).
    *
    * WHY it is hub-robust where g22 is not: g22 pivots every wedge on
    * its part middle, costing Σ_p C(deg(p), 2) — quadratic in the
    * hubbiest part. Here a hub is (almost) never a traversal middle:
    * mids must have LOWER priority than the start, so wedges through a
    * hub are enumerated only from the rare vertices prioritized above
    * it, and the paper bounds the wedge work by
    * O(Σ_{(u,v)∈E} min(deg u, deg v)). The degree frame is
    * node-domain-sized (a dimension domain here and at 100 TB) and
    * BROADCAST onto both hops.
    *
    * The DuckDB mirror is deliberately the UNORIENTED supplier-pair
    * census (g22's formula) — the oracle compare machine-checks that
    * orientation is lossless on every run, and the spec additionally
    * asserts row equality with g22's (supplier, butterflies)
    * projection. Determinism: integer counting, total-order tie-break.
    */
  val butterflyOriented: QueryDef = QueryDef(
    "g23_butterfly_vpriority",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey").as("p"),
          (col("l_suppkey") + SuppOffset).as("sup"))
        .distinct()
      val e = li.select(col("p").as("u"), col("sup").as("v"))
        .union(li.select(col("sup").as("u"), col("p").as("v")))
      val deg = e.groupBy("u").agg(count(lit(1)).as("deg"))
      val ed = e
        .join(broadcast(deg.select(col("u"), col("deg").as("du"))), "u")
        .join(broadcast(deg.select(col("u").as("v"),
          col("deg").as("dv"))), "v")
      // hop 1: start → mid, strictly descending priority
      val h1 = ed
        .filter(col("dv") < col("du") ||
          (col("dv") === col("du") && col("v") < col("u")))
        .select(col("u").as("start"), col("du").as("ds"),
          col("v").as("mid"))
      // hop 2: mid → end, end also strictly below the start
      val h2 = ed.select(col("u").as("mid"), col("v").as("end"),
        col("dv").as("de"))
      val wedges = h1.join(h2, "mid")
        .filter(col("end") =!= col("start") &&
          (col("de") < col("ds") ||
            (col("de") === col("ds") && col("end") < col("start"))))
        .select("start", "mid", "end")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val grp = wedges.groupBy("start", "end").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2)
        .withColumn("bf", expr("(c * (c - 1)) DIV 2"))
      val endContrib = grp
        .select(explode(array(col("start"), col("end"))).as("n"),
          col("bf").as("b"))
      val midContrib = wedges
        .join(grp.select("start", "end", "c"), Seq("start", "end"))
        .select(col("mid").as("n"), (col("c") - 1).as("b"))
      val out = endContrib.union(midContrib)
        .groupBy("n").agg(sum("b").as("butterflies"))
        .filter(col("n") >= SuppOffset)
        .select((col("n") - SuppOffset).as("supplier"), col("butterflies"))
        .orderBy(col("butterflies").desc, col("supplier"))
        .limit(20)
        .localCheckpoint()
      wedges.unpersist(blocking = true)
      out
    },
    Some("""WITH li AS (
              SELECT DISTINCT l_partkey AS p, l_suppkey AS sup
              FROM lineitem),
            pw AS (
              SELECT a.sup AS s1, b.sup AS s2, count(*) AS c
              FROM li a JOIN li b ON a.p = b.p AND a.sup < b.sup
              GROUP BY 1, 2),
            bf AS (
              SELECT s1, s2, (c * (c - 1)) // 2 AS bf
              FROM pw WHERE c > 1),
            x AS (
              SELECT s1 AS supplier, bf FROM bf
              UNION ALL SELECT s2, bf FROM bf)
            SELECT CAST(supplier AS BIGINT) AS supplier,
              CAST(sum(bf) AS BIGINT) AS butterflies
            FROM x GROUP BY 1
            ORDER BY butterflies DESC, supplier
            LIMIT 20"""))

  /** g24 — bipartite local clustering coefficient per supplier
    * (Latapy, Magnien & Del Vecchio, "Basic notions for the analysis
    * of large two-mode networks", Social Networks 2008 §5: the
    * pairwise coefficient cc(u,v) = |N(u)∩N(v)| / |N(u)∪N(v)| over
    * u's 2-hop neighbors, averaged per node — the bipartite analog of
    * g12's one-mode clustering coefficient, and the normalized readout
    * on top of g22/g23's raw butterfly counts: a supplier with high
    * mean overlap shares most of its part portfolio with its
    * co-suppliers): pair common-part counts c from the same part-keyed
    * wedge census as g22 (here at c ≥ 1 — Latapy's 2-hop neighborhood,
    * not just the butterfly-forming c ≥ 2), per-pair coefficient as
    * exact integer ppm `(10⁶·c) DIV (deg_u + deg_v − c)`, per-supplier
    * mean/max over the partner set.
    *
    * Determinism: pure integer arithmetic end to end. Scale shape:
    * g22's law — one distinct scan, one part-keyed equi self-join
    * (suppliers-per-part data-model bounded; g23's vertex-priority
    * orientation is the hub-robust alternative when that bound
    * breaks), a supplier-pair agg, a broadcast degree join, one
    * supplier-keyed agg over the dimension-domain output. */
  val bipartiteClustering: QueryDef = QueryDef(
    "g24_bipartite_clustering",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sup"))
        .distinct()
      val deg = li.groupBy("sup").agg(count(lit(1)).as("deg"))
      val pairs = li.select(col("p"), col("sup").as("s1"))
        .join(li.select(col("p"), col("sup").as("s2")), Seq("p"))
        .filter(col("s1") < col("s2"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("c"))
      val cc = pairs
        .join(broadcast(deg.select(col("sup").as("s1"),
          col("deg").as("d1"))), "s1")
        .join(broadcast(deg.select(col("sup").as("s2"),
          col("deg").as("d2"))), "s2")
        .withColumn("cc_e6", expr("(1000000 * c) DIV (d1 + d2 - c)"))
      cc.select(explode(array(col("s1"), col("s2"))).as("supplier"),
          col("cc_e6"))
        .groupBy("supplier")
        .agg(count(lit(1)).as("n_partners"),
          expr("CAST(sum(cc_e6) DIV count(1) AS BIGINT)")
            .as("mean_cc_e6"),
          max(col("cc_e6")).as("max_cc_e6"))
        .orderBy("supplier")
    },
    Some("""WITH li AS (
              SELECT DISTINCT l_partkey AS p, l_suppkey AS sup
              FROM lineitem),
            deg AS (SELECT sup, count(*) AS deg FROM li GROUP BY 1),
            pw AS (
              SELECT a.sup AS s1, b.sup AS s2, count(*) AS c
              FROM li a JOIN li b ON a.p = b.p AND a.sup < b.sup
              GROUP BY 1, 2),
            cc AS (
              SELECT s1, s2, (1000000 * c) // (d1.deg + d2.deg - c)
                AS cc_e6
              FROM pw
              JOIN deg d1 ON d1.sup = pw.s1
              JOIN deg d2 ON d2.sup = pw.s2),
            x AS (
              SELECT s1 AS supplier, cc_e6 FROM cc
              UNION ALL SELECT s2, cc_e6 FROM cc)
            SELECT supplier,
              CAST(count(*) AS BIGINT) AS n_partners,
              CAST(CAST(sum(cc_e6) AS BIGINT) // count(*) AS BIGINT)
                AS mean_cc_e6,
              CAST(max(cc_e6) AS BIGINT) AS max_cc_e6
            FROM x GROUP BY 1 ORDER BY supplier"""))

  val all: Seq[QueryDef] =
    Seq(pagerank, triangles, kcore, labelPropagation, bfsHops,
      personalizedPagerank, linkPrediction, hits, degreeHistogram,
      harmonicCentrality, modularity, clusteringCoefficient,
      assortativity, wcc, diameterSweep, bipartiteProjection,
      seededBetweenness, twoHopReach, ktrussSupport, richClub,
      corenessLadder, butterflyCount, butterflyOriented,
      bipartiteClustering)
}
