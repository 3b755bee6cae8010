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

  test("q66: CDC merge census matches the latest-change-wins replay") {
    val nCust = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("max(c_custkey)").collect()(0).getLong(0)
    val base = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey", "CAST(round(c_acctbal * 100) AS BIGINT)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ch = graft.core.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type",
        "CAST(round(value * 100) AS BIGINT) AS cents",
        "unix_micros(ts) AS us", "event_id")
      .collect()
      .map(r => (r.getLong(0) % nCust + 1,
        if (r.getString(1) == "error") "D" else "U",
        r.getLong(2), r.getLong(3), r.getLong(4)))
    val last = ch.groupBy(_._1).map { case (k, v) =>
      val w = v.maxBy(t => (t._4, t._5)); k -> (w._2, w._3)
    }
    val actions = (base.keySet ++ last.keySet).toSeq.map { k =>
      (base.contains(k), last.get(k)) match {
        case (true, None) => ("kept", base(k))
        case (true, Some(("D", _))) => ("deleted", 0L)
        case (false, Some(("D", _))) => ("noop_delete", 0L)
        case (false, Some(("U", v))) => ("inserted", v)
        case (true, Some(("U", v))) => ("updated", v)
        case other => fail(s"impossible: $other")
      }
    }
    val want = actions.groupBy(_._1)
      .map { case (a, v) => a -> (v.size.toLong, v.map(_._2).sum) }
    val got = graft.queries.Relational.q66.build(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, s"got $got want $want")
    // the merge genuinely exercises all three main actions
    assert(Set("kept", "updated", "deleted").subsetOf(got.keySet))
  }

  test("d27: prefix-filtered pairs equal d04's full-index pairs, and " +
    "the prefix genuinely prunes the candidate space") {
    val d04 = Dedup.ngramJaccard.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(_._3 >= Dedup.prefixTheta).toSeq
    val d27 = Dedup.prefixFilterPairs.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(d27.nonEmpty && d27 == d04,
      s"prefix filter is not lossless: ${d27.size} vs ${d04.size} pairs")
    // pruning replay: candidates sharing a PREFIX token vs any token
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map { r =>
        val t = r.getString(1).split(" ")
        val grams = (0 until math.max(t.length - 2, 1))
          .map(i => t.slice(i, i + 3).mkString(" ")).toSet
        r.getLong(0) -> grams
      }
    val fr = docs.flatMap(_._2).groupBy(identity)
      .map { case (g, v) => g -> v.length }
    def prefix(s: Set[String]): Set[String] = {
      val n = s.size
      s.toSeq.sortBy(g => (fr(g), g)).take(n - (4 * n + 4) / 5 + 1).toSet
    }
    def candPairs(sets: Map[Long, Set[String]]): Int = {
      val inv = sets.toSeq.flatMap { case (id, g) => g.map(_ -> id) }
        .groupBy(_._1).values
      inv.flatMap(v => for {
        a <- v.map(_._2); b <- v.map(_._2) if a < b } yield (a, b))
        .toSet.size
    }
    val full = candPairs(docs.toMap)
    val pruned = candPairs(docs.toMap.map { case (k, v) => k -> prefix(v) })
    assert(pruned < full,
      s"prefix produced no pruning: $pruned vs $full candidates")
  }

  test("g22: butterfly census matches the wedge-pair replay") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byPart = li.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val pairCnt = scala.collection.mutable.Map
      .empty[(Long, Long), Long].withDefaultValue(0L)
    byPart.values.foreach { sups =>
      for (i <- sups.indices; j <- (i + 1) until sups.length)
        pairCnt((sups(i), sups(j))) += 1
    }
    val per = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    pairCnt.foreach { case ((a, b), c) =>
      if (c > 1) {
        val bf = c * (c - 1) / 2
        Seq(a, b).foreach { s =>
          val (tb, np, mc) = per.getOrElse(s, (0L, 0L, 0L))
          per(s) = (tb + bf, np + 1, math.max(mc, c))
        }
      }
    }
    val want = per.toSeq.map { case (s, (b, np, mc)) => (s, b, np, mc) }
      .sortBy(t => (-t._2, t._1)).take(20)
    val got = Graph.butterflyCount.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want, s"got ${got.take(3)} want ${want.take(3)}")
    assert(got.exists(_._2 > 0), "fixture has no butterflies")
  }

  test("q67: first/last-touch attribution matches the per-user replay") {
    val ev = graft.core.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us",
        "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val rows = ev.groupBy(_._1).toSeq.flatMap { case (_, v) =>
      val sorted = v.sortBy(t => (t._3, t._4))
      sorted.zipWithIndex.flatMap { case ((_, t, us, _), i) =>
        if (t != "purchase") Nil
        else {
          val touches = sorted.take(i).filter(_._2 != "purchase")
          if (touches.isEmpty) Nil
          else {
            val lt = touches.last; val ft = touches.head
            Seq(("last_touch", lt._2, us - lt._3),
              ("first_touch", ft._2, us - ft._3))
          }
        }
      }
    }
    val want = rows.groupBy(r => (r._1, r._2)).map { case ((m, t), v) =>
      val tot = v.map(_._3).sum
      (m, t) -> (v.size.toLong, tot, tot / v.size)
    }
    val got = graft.queries.Relational.q67.build(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == want, s"got $got want $want")
  }

  test("ml33: Theil–Sen slope matches the exact pairwise-median replay") {
    val ev = graft.core.Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) DIV 86400000000 AS day")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = graft.queries.MlQueries.theilSen.build(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val byType = ev.groupBy(_._1)
    assert(got.keySet == byType.keySet)
    byType.foreach { case (t, rows) =>
      val cens = rows.groupBy(_._2).map { case (d, v) => d -> v.length.toLong }
        .toSeq.sortBy(_._1)
      def sdiv(num: Long, den: Long): Long =
        if (num >= 0) num / den else -((-num) / den)
      val slopes = (for {
        i <- cens.indices; j <- (i + 1) until cens.length
      } yield sdiv(1000000L * (cens(j)._2 - cens(i)._2),
        cens(j)._1 - cens(i)._1)).sorted
      val n = slopes.length
      val med2 = if (n % 2 == 1) 2 * slopes(n / 2)
        else slopes(n / 2 - 1) + slopes(n / 2)
      val want = (cens.length.toLong, n.toLong, med2,
        slopes.min, slopes.max,
        if (med2 > 0) 1L else if (med2 < 0) -1L else 0L)
      assert(got(t) == want, s"type $t: got ${got(t)} want $want")
    }
  }

  test("m16: format-sniff census matches the planted-magic replay") {
    val exts = Seq("png", "jpg", "wav", "gif", "txt", "bin", "mp4")
    val magics = Seq("PNG89", "JFIF", "RIFFWAVE", "GIF89a", "TEXT!")
    val sniffOf = Map("PNG89" -> "png", "JFIF" -> "jpg",
      "RIFFWAVE" -> "wav", "GIF89a" -> "gif", "TEXT!" -> "unknown")
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id").collect().map(_.getLong(0))
    val want = ids.map { id =>
      (exts((id % 7).toInt), sniffOf(magics((id % 5).toInt)))
    }.groupBy(identity).map { case ((de, sf2), v) =>
      (de, sf2) -> (v.length.toLong, if (de == sf2) 0L else 1L)
    }
    val got = Multimodal.formatSniff.build(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"got ${got.take(3)} want ${want.take(3)}")
    // the audit catches real lies: at least one declared ext is
    // contradicted by the sniffed magic
    assert(got.exists { case ((de, sf2), (_, m)) =>
      m == 1L && sf2 != "unknown" && de != sf2 })
  }

  test("ml34: Kaplan–Meier table matches the censored-duration replay") {
    val ev = graft.core.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // the engine's censoring rule: p_us is the user's FIRST purchase;
    // a first purchase BEFORE the first view counts as censored (the
    // conversion cannot be attributed to the observed view)
    val obs2 = ev.groupBy(_._1).toSeq.flatMap { case (_, v) =>
      val vUs = v.collect { case (_, "view", us) => us }.minOption
      vUs.map { v0 =>
        val pAll = v.collect { case (_, "purchase", us) => us }.minOption
        val last = v.map(_._3).max
        pAll match {
          case Some(p) if p >= v0 => ((p - v0) / 86400000000L, 1)
          case _ => ((last - v0) / 86400000000L, 0)
        }
      }
    }
    assert(obs2.nonEmpty)
    val n0 = obs2.size.toLong
    val cells = obs2.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (day, v) =>
        (day, v.count(_._2 == 1).toLong, v.count(_._2 == 0).toLong) }
    var atRisk = n0; var lnS = 0L
    val want = cells.flatMap { case (day, d, c) =>
      val row = if (atRisk > 0 && d > 0) {
        lnS += roundHalfUp(math.log((atRisk - d).toDouble) * 1e6) -
          roundHalfUp(math.log(atRisk.toDouble) * 1e6)
        Some((day, atRisk, d, c, lnS))
      } else None
      atRisk -= d + c
      row
    }
    val got = graft.queries.MlQueries.kaplanMeier.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want, s"got ${got.take(3)} want ${want.take(3)}")
    // censoring is genuinely exercised and survival strictly falls
    assert(cells.exists(_._3 > 0), "no censored users in fixture")
    assert(want.size > 1 && want.last._5 < want.head._5)
  }

  test("x60: temporal split audit matches the day-threshold replay") {
    val ev = graft.core.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) DIV 86400000000 AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = ev.length.toLong
    val cum = ev.map(_._2).groupBy(identity).toSeq.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, c), (d, v)) => (d, c + v.length) }
      .drop(1)
    val t70 = cum.find { case (_, c) => 20 * c >= 14 * n }.get._1
    val t85 = cum.find { case (_, c) => 20 * c >= 17 * n }.get._1
    def splitOf(day: Long) =
      if (day <= t70) "train" else if (day <= t85) "val" else "test"
    val lab = ev.map { case (u, d) => (splitOf(d), u, d) }
    val trainUsers = lab.filter(_._1 == "train").map(_._2).toSet
    val want = lab.groupBy(_._1).map { case (s, v) =>
      s -> (v.size.toLong, v.map(_._3).min, v.map(_._3).max,
        v.map(_._2).distinct.size.toLong,
        v.map(_._2).distinct.count(trainUsers).toLong)
    }
    val got = Curation.temporalSplit.build(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    want.foreach { case (s, (nr, mn, mx, nu, nw)) =>
      assert(got(s) == ((nr, mn, mx, nu, nw, 1L)), s"$s: ${got(s)}")
    }
    assert(got.keySet == Set("train", "val", "test"))
    // the audit's invariants hold by construction — check they DID
    assert(got("val")._2 > got("train")._3 &&
      got("test")._2 > got("val")._3, "boundary overlap")
  }

  test("x61: contamination sweep matches the per-n replay and is " +
    "monotone non-increasing in n") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "substring(md5(CAST(doc_id AS STRING)), 1, 1)",
        "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ")))
    val isEval = (hx: String) => hx == "0" || hx == "1"
    def gramsOf(t: Array[String], n: Int): Set[String] =
      (0 to math.max(t.length - n, 0))
        .map(i => t.slice(i, i + n).mkString(" ")).toSet
    val nEval = docs.count(d => isEval(d._2)).toLong
    val nTrain = docs.length - nEval
    val want = Seq(4, 8, 13).map { n =>
      val ev = docs.filter(d => isEval(d._2))
        .flatMap(d => gramsOf(d._3, n)).toSet
      val contam = docs.filterNot(d => isEval(d._2))
        .count(d => gramsOf(d._3, n).exists(ev)).toLong
      (n.toLong, nEval, nTrain, contam,
        1000000L * contam / nTrain, ev.size.toLong)
    }
    val got = Curation.contaminationSweep.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, s"got $got want $want")
    assert(got.map(_._4).sliding(2).forall {
      case Seq(a, b) => a >= b
      case _ => true
    }, "contamination not monotone in n")
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
