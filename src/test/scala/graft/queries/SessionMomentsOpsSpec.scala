package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Independent-recomputation checks for q50/s09/g07/x32/t18/e12: each
  * query's sf0.001 output is rebuilt in plain Scala from the collected
  * base tables (different execution path than the registered plan; the
  * DuckDB hash parity is the Verify gate's job).
  */
class SessionMomentsOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  test("q50: sessions match a hand-rolled gap split of the sorted event log") {
    val got = Relational.q50.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("duration_us"))).toMap
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "event_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = ev.groupBy(_._1).flatMap { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      // split on >30-min gaps, then number sessions 1..n
      val sessions = sorted.foldLeft(List.empty[List[Long]]) {
        case (acc, (_, _, us)) => acc match {
          case cur :: rest if us - cur.head <= 1800000000L =>
            (us :: cur) :: rest
          case _ => List(us) :: acc
        }
      }.reverse
      sessions.zipWithIndex.map { case (ss, i) =>
        (uid, (i + 1).toLong) -> (ss.size.toLong, ss.max - ss.min)
      }
    }.toMap
    assert(got == want, s"${got.size} vs ${want.size} sessions")
  }

  test("s09: per-query top-3 equals the in-label brute force, exactly") {
    val got = graft.ext.Similarity.filteredTopK.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("rn")) ->
        (r.getAs[Int]("label"), r.getLong(2))).toMap
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map { r =>
        val e = r.getSeq[Float](1).map(_.toDouble).toArray
        val n = math.sqrt(e.map(x => x * x).sum)
        (r.getLong(0), r.getInt(2), e.map(_ / n))
      }
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val want = vecs.filter(_._1 < 10).flatMap { case (qid, lab, qu) =>
      vecs.filter(v => v._2 == lab && v._1 != qid)
        .map(v => (v._1, dot(qu, v._3)))
        .sortBy { case (nid, cos) => (-cos, nid) }
        .take(3).zipWithIndex
        .map { case ((nid, _), i) => (qid, i + 1) -> (lab, nid) }
    }.toMap
    assert(got.keySet == want.keySet)
    // neighbor identity must agree; cos itself is checked by the oracle
    assert(got.view.mapValues(_._2).toMap ==
      want.view.mapValues(_._2).toMap)
    assert(got.forall { case ((q, _), (lab, n)) =>
      n != q && vecs.find(_._1 == n).get._2 == lab })
  }

  test("g07: overlap counts and Jaccard match a Scala recomputation") {
    val e = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = e.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pairs = for {
      (pa, na) <- nbrs.toSeq if pa <= 100 // seed query set
      (pb, nb) <- nbrs.toSeq
      if pb != pa
      common = (na & nb).size if common > 0
    } yield (pa, pb, common.toLong, (na | nb).size.toLong)
    val want = pairs.sortBy { case (pa, pb, c, _) => (-c, pa, pb) }.take(20)
      .map { case (pa, pb, c, u) =>
        (pa, pb) -> (c, u,
          BigDecimal(c.toDouble / u).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toMap
    val got = graft.ext.Graph.linkPrediction.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (c, u, j)) =>
      assert((c, u) == (want(k)._1, want(k)._2), s"pair $k")
      assert(math.abs(j - want(k)._3) < 1e-9, s"jaccard $k")
    }
  }

  test("x32: integer sqrt is exact and targets partition the budget") {
    val rows = graft.ext.Curation.temperatureMix.build(spark, sf).collect()
    val totIsq = rows.map(_.getAs[Long]("isq")).sum
    rows.foreach { r =>
      val (n, isq) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("isq"))
      assert(isq * isq <= n && n < (isq + 1) * (isq + 1), s"isq($n)=$isq")
      assert(r.getAs[Long]("target_tokens") == 1000000L * isq / totIsq)
      assert(math.abs(r.getAs[Double]("weight") -
        isq.toDouble / totIsq) <= 5e-7)
    }
    // floor targets never oversubscribe the budget, and the loss is < #sources
    val t = rows.map(_.getAs[Long]("target_tokens")).sum
    assert(t <= 1000000L && 1000000L - t < rows.length)
  }

  test("t18: formulas reproduce from per-doc regex counts in Scala") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = graft.ext.TextAnalysis.readability.build(spark, sf).collect()
    assert(got.length == texts.size)
    got.foreach { r =>
      val text = texts(r.getLong(0))
      val w = text.trim.split("\\s+").length.toLong
      val s = math.max(1L, "[.!?]+".r.findAllIn(text).size.toLong)
      val y = math.max(1L,
        "[aeiouy]+".r.findAllIn(text.toLowerCase).size.toLong)
      assert(r.getAs[Long]("n_words") == w)
      assert(r.getAs[Long]("n_sentences") == s)
      assert(r.getAs[Long]("n_syllables") == y)
      val flesch = BigDecimal(
        206.835 - 1.015 * (w.toDouble / s) - 84.6 * (y.toDouble / w))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("flesch") - flesch) < 1e-9)
    }
  }

  test("e12: moments and variance match a BigInt recomputation") {
    val xs = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_returnflag", "CAST(l_quantity AS BIGINT) AS x")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val got = Extensions.momentsSketch.build(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    xs.groupBy(_._1).foreach { case (flag, rows) =>
      val v = rows.map(x => BigInt(x._2))
      val (n, m1, m2, m3) =
        (BigInt(v.size), v.sum, v.map(x => x * x).sum, v.map(x => x * x * x).sum)
      val r = got(flag)
      assert(BigInt(r.getAs[Long]("n")) == n)
      assert(BigInt(r.getAs[Long]("m1")) == m1)
      assert(BigInt(r.getAs[Long]("m2")) == m2)
      assert(BigInt(r.getAs[Long]("m3")) == m3)
      val varExact = (n * m2 - m1 * m1).toDouble / (n * n).toDouble
      assert(math.abs(r.getAs[Double]("variance") -
        BigDecimal(varExact).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }
}
