package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Independent-recomputation checks for the round-13 additions (t42
  * BM25, s26 RRF fusion): each query's sf0.001 output is rebuilt in
  * plain Scala from the collected base tables — a different execution
  * path than the registered plan (DuckDB hash parity is the Verify
  * gate's job). */
class Round13OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  /** exact round-half-up, matching Spark SQL round() on doubles. */
  private def roundHalfUp(x: Double): Long =
    new java.math.BigDecimal(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** the BM25 corpus statistics + per-(q,n) exact scores, replayed
    * with BigInt arithmetic from the raw documents table. */
  private lazy val bm25Replay: Map[(Long, Long), (Long, Long)] = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val tf: Map[Long, Map[String, Long]] =
      docs.map { case (id, ts) =>
        id -> ts.groupBy(identity).map { case (t, v) => t -> v.length.toLong }
      }.toMap
    val df: Map[String, Long] =
      tf.values.flatMap(_.keys).toSeq.groupBy(identity)
        .map { case (t, v) => t -> v.length.toLong }
    val n = BigInt(docs.length)
    val bigL = BigInt(docs.map(_._2.length.toLong).sum)
    val out = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    for ((qId, _) <- docs if qId < 10; (nId, _) <- docs) {
      val shared = tf(qId).keySet.intersect(tf(nId).keySet)
      if (shared.nonEmpty) {
        val score = shared.toSeq.map { t =>
          val tfv = BigInt(tf(nId)(t)); val dfv = BigInt(df(t))
          val len = BigInt(tf(nId).values.sum)
          val num = BigInt(1000000) * (2 * n - 2 * dfv + 1) * (22 * tfv) * bigL
          val den = (2 * dfv + 1) *
            (10 * bigL * tfv + 3 * bigL + 9 * len * n)
          (num / den).toLong // positive: df <= n
        }.sum
        out((qId, nId)) = (score, shared.size.toLong)
      }
    }
    out.toMap
  }

  /** per-query (id, score) lists ranked by (score DESC, id ASC),
    * truncated to k, as id → rank maps. */
  private def rank(scores: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    scores.sortBy { case (id, s) => (-s, id) }.take(k)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap

  test("t42: BM25 top-5 matches the BigInt replay (scores, term hits, " +
    "ranks)") {
    val got = TextAnalysis.bm25TopK.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    val byQ = bm25Replay.groupBy(_._1._1)
    val expect = byQ.toSeq.flatMap { case (q, m) =>
      val ranks = rank(m.toSeq.map { case ((_, nId), (s, _)) => nId -> s }, 5)
      ranks.toSeq.map { case (nId, r) =>
        (q, nId, r, m((q, nId))._1, m((q, nId))._2) }
    }.sortBy(t => (t._1, t._3))
    assert(got.toSeq == expect,
      s"BM25 divergence: got ${got.take(3).toSeq} vs ${expect.take(3)}")
  }

  test("s26: RRF fusion matches the replayed two-leg fusion, and the " +
    "sparse leg genuinely reorders the dense ranking") {
    // dense leg replay: unit-normalize (left-to-right fold, the
    // engine's aggregate() order), int8-quantize, integer dot
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>)").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val quant = vecs.map { case (id, e) =>
      val nrm = math.sqrt(e.foldLeft(0.0)((acc, x) => acc + x * x))
      id -> e.map(x => roundHalfUp(x / nrm * 127))
    }.toMap
    val qIds = quant.keys.filter(_ < 10).toSeq.sorted
    val denseRank: Map[Long, Map[Long, Long]] = qIds.map { q =>
      val dots = quant.toSeq.map { case (nId, v) =>
        nId -> quant(q).zip(v).foldLeft(0L) { case (acc, (a, b)) =>
          acc + a * b }
      }
      q -> rank(dots, 20)
    }.toMap
    val sparseRank: Map[Long, Map[Long, Long]] =
      bm25Replay.groupBy(_._1._1).map { case (q, m) =>
        q -> rank(m.toSeq.map { case ((_, nId), (s, _)) => nId -> s }, 20)
      }
    val expect = qIds.flatMap { q =>
      val ids = denseRank(q).keySet ++ sparseRank.getOrElse(q, Map.empty).keySet
      val fused = ids.toSeq.map { nId =>
        val d = denseRank(q).get(nId); val b = sparseRank(q).get(nId)
        val rrf = d.map(r => 1000000L / (60 + r)).getOrElse(0L) +
          b.map(r => 1000000L / (60 + r)).getOrElse(0L)
        nId -> rrf
      }
      rank(fused, 10).toSeq.map { case (nId, fr) =>
        val d = denseRank(q).getOrElse(nId, 0L)
        val b = sparseRank(q).getOrElse(nId, 0L)
        val rrf = (if (d > 0) 1000000L / (60 + d) else 0L) +
          (if (b > 0) 1000000L / (60 + b) else 0L)
        (q, nId, fr, rrf, d, b, if (d != fr) 1L else 0L)
      }
    }.sortBy(t => (t._1, t._3))
    val got = Similarity.rrfFusion.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expect,
      s"RRF divergence: got ${got.take(3)} vs ${expect.take(3)}")
    // the fusion must actually fuse: at least one output row ranked by
    // the sparse leg alone (dense_rnk = 0) or flipped vs dense order
    assert(got.exists(_._7 == 1L), "no rank flips — fusion is a no-op")
  }
}
