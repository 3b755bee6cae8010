package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.MlQueries

/** Round-11 operators: ml17 ridge path, t33 vocabulary-growth curve,
  * x50 Neyman allocation (st21's laws live in StreamingSpec with the
  * other stream==batch proofs). Each op's oracle row is the hash-exact
  * proof; these are the fixture-law checks. */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sf = TestSpark.sf0001

  test("ml17: lambda=0 reproduces ml01b's OLS exactly; shrinkage is the slope ratio") {
    val path = MlQueries.ridgePath.build(spark, sf).collect()
      .map(r => r.getAs[Long]("lambda") ->
        (r.getAs[Double]("slope"), r.getAs[Double]("intercept"),
          r.getAs[Double]("shrinkage"))).toMap
    val ols = MlQueries.olsExact.build(spark, sf).collect().head
    val (s0, i0, sh0) = path(0L)
    assert(s0 == ols.getAs[Double]("slope"), "lambda=0 slope != OLS")
    assert(i0 == ols.getAs[Double]("intercept"), "lambda=0 intercept != OLS")
    assert(sh0 == 1.0)
    // monotone shrinkage toward zero, slope ratio identity
    val lams = Seq(0L, 10L, 100L, 1000L)
    lams.sliding(2).foreach { case Seq(a, b) =>
      assert(math.abs(path(b)._1) < math.abs(path(a)._1),
        s"slope magnitude must shrink: $a -> $b")
      assert(path(b)._3 < path(a)._3, "shrinkage must decrease")
    }
    lams.foreach { l =>
      assert(path(l)._3 > 0.0 && path(l)._3 <= 1.0)
      assert(math.abs(path(l)._1 - s0 * path(l)._3) < 1e-12,
        s"slope(l) must equal slope(0) * shrinkage(l) at l=$l")
    }
  }

  test("t33: nested prefixes reproduce brute-force cumulative vocab and token counts") {
    val got = TextAnalysis.vocabGrowth.build(spark, sf).collect()
      .map(r => (r.getAs[Long]("prefix"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_vocab")))
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    for (k <- 0L to 3L) {
      val toks = docs.filter(_._1 % 4 <= k)
        .flatMap(_._2.split(" ", -1))
      val row = got.find(_._1 == k).getOrElse(fail(s"prefix $k missing"))
      assert(row._2 == toks.length, s"prefix $k token count")
      assert(row._3 == toks.distinct.length, s"prefix $k vocab")
    }
    // monotone nesting: both curves nondecreasing, vocab <= tokens
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2 && b._3 >= a._3, "curves must be nondecreasing")
    }
    got.foreach { case (_, n, v) => assert(v <= n) }
  }

  test("ml18: eigen outputs reproduce a driver-side 2x2 PCA from raw rows") {
    val r = MlQueries.pca2d.build(spark, sf).collect().head
    val rows = graft.core.Tables.orders(spark, sf)
      .selectExpr("CAST(month(o_orderdate) AS LONG) AS x",
        "CAST(floor(o_totalprice / 100e0) AS LONG) AS y")
      .collect().map(q => (q.getLong(0), q.getLong(1)))
    val n = rows.length.toLong
    val sx = rows.map(_._1).sum; val sy = rows.map(_._2).sum
    val sxx = rows.map(t => t._1 * t._1).sum
    val sxy = rows.map(t => t._1 * t._2).sum
    val syy = rows.map(t => t._2 * t._2).sum
    val a = n.toDouble * sxx - sx.toDouble * sx
    val b = n.toDouble * sxy - sx.toDouble * sy
    val c = n.toDouble * syy - sy.toDouble * sy
    val disc = math.sqrt(((a - c) / 2) * ((a - c) / 2) + b * b)
    val lam1 = (a + c) / 2 + disc
    assert(r.getAs[Long]("n") == n)
    assert(math.abs(r.getAs[Double]("lam1_share") - lam1 / (a + c)) < 1e-12)
    assert(math.abs(r.getAs[Double]("corr_xy") - b / math.sqrt(a * c)) < 1e-12)
    // the emitted slope solves the eigenvector equation (A−λ1) + B·m = 0
    val m = r.getAs[Double]("pc1_slope")
    assert(math.abs((a - lam1) + b * m) / lam1 < 1e-9,
      s"pc1_slope $m fails the eigen identity")
    // λ1 is the LARGER eigenvalue: its share is at least half
    assert(r.getAs[Double]("lam1_share") >= 0.5 &&
      r.getAs[Double]("lam1_share") <= 1.0)
  }

  test("q55: nearest as-of direction/gap match a per-user brute force") {
    val got = graft.queries.Relational.q55.build(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[String]("direction"),
          Option(r.getAs[java.lang.Long]("nearest_gap_s")).map(_.toLong)))
      .toMap
    val ev = graft.core.Tables.events(spark, sf)
      .select("event_id", "user_id", "ts", "event_type").collect()
      .map { r =>
        val t = r.getTimestamp(2)
        (r.getLong(0), r.getLong(1), t.getTime, t.getNanos, r.getString(3))
      }
    // the window orders by full-precision ts then event_id — mirror it
    def before(c: (Long, Long, Long, Int, String),
        e: (Long, Long, Long, Int, String)): Boolean = {
      val ct = (c._3, c._4, c._1); val et = (e._3, e._4, e._1)
      Ordering[(Long, Int, Long)].lt(ct, et)
    }
    val clicksByUser = ev.filter(_._5 == "click").groupBy(_._2)
    val errors = ev.filter(_._5 == "error")
    assert(got.size == errors.length)
    errors.foreach { e =>
      val clicks = clicksByUser.getOrElse(e._2, Array.empty)
      // the query truncates EACH ts to epoch seconds before
      // differencing (unix_timestamp semantics), so the brute force
      // must floor-then-subtract, not subtract-then-floor
      val back = clicks.filter(c => before(c, e))
        .map(c => e._3 / 1000 - c._3 / 1000).reduceOption(_ min _)
      val fwd = clicks.filter(c => !before(c, e))
        .map(c => c._3 / 1000 - e._3 / 1000).reduceOption(_ min _)
      val expect = (back, fwd) match {
        case (None, None) => ("none", None)
        case (Some(gb), None) => ("backward", Some(gb))
        case (None, Some(gf)) => ("forward", Some(gf))
        case (Some(gb), Some(gf)) =>
          if (gb <= gf) ("backward", Some(gb)) else ("forward", Some(gf))
      }
      assert(got(e._1) == expect, s"error ${e._1}: ${got(e._1)} != $expect")
    }
  }

  test("t34: truncation accounting matches brute force; utilization monotone down") {
    val got = TextAnalysis.truncationLoss.build(spark, sf).collect()
      .map(r => r.getAs[Long]("lim") -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("docs_over"), r.getAs[Long]("tokens_lost"),
        r.getAs[Long]("tokens_kept"), r.getAs[Long]("utilization_ppm")))
      .toMap
    val lens = graft.core.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0).split(" ", -1).length.toLong)
    for (lim <- Seq(32L, 64L, 96L)) {
      val (nd, over, lost, kept, util) = got(lim)
      assert(nd == lens.length)
      assert(over == lens.count(_ > lim))
      assert(lost == lens.map(n => math.max(n - lim, 0L)).sum)
      assert(kept == lens.map(n => math.min(n, lim)).sum)
      assert(util == 1000000L * kept / (nd * lim))
    }
    // larger contexts lose less but utilize slots worse
    assert(got(32L)._3 > got(64L)._3 && got(64L)._3 >= got(96L)._3)
    assert(got(32L)._5 > got(64L)._5 && got(64L)._5 > got(96L)._5)
  }

  test("g17: seeded betweenness matches a driver-side Brandes recompute") {
    val SuppOffset = 1000000000L
    val Levels = 3; val Seeds = 2; val Scale = 1000L
    val li = graft.core.Tables.lineitem(spark, sf)
      .selectExpr("l_partkey AS p", s"l_suppkey + ${SuppOffset}L AS sup")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (li.map(t => t._1 -> t._2) ++ li.map(t => t._2 -> t._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val bc = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (seed <- (SuppOffset + 1) to (SuppOffset + Seeds)
        if adj.contains(seed)) {
      // forward: levelwise σ
      var level = Map(seed -> 1L)
      var dist = Map(seed -> 0)
      var levels = Vector(level)
      for (r <- 1 to Levels) {
        // every not-yet-visited neighbor of level r-1 is level r; σ
        // accumulates over ALL its level-(r-1) predecessors
        val next = collection.mutable.Map.empty[Long, Long]
        for ((u, sig) <- levels(r - 1); v <- adj(u) if !dist.contains(v))
          next(v) = next.getOrElse(v, 0L) + sig
        dist = dist ++ next.keys.map(_ -> r)
        levels = levels :+ next.toMap
      }
      // backward: integer-scaled δ'
      var delta = levels(Levels).map { case (v, _) => v -> 0L }
      for (r <- (Levels - 1) to 1 by -1) {
        val deeper = levels(r + 1)
        val d = levels(r).map { case (v, sig) =>
          val c = adj(v).filter(deeper.contains).map { w =>
            sig * (Scale + delta(w)) / deeper(w)
          }.sum
          v -> c
        }
        delta = d
        d.foreach { case (v, x) => bc(v) += x }
      }
    }
    val expect = bc.toSeq.filter(_._2 > 0)
      .map { case (id, s) =>
        val kind = if (id >= SuppOffset) "supplier" else "part"
        val nid = if (id >= SuppOffset) id - SuppOffset else id
        (s, kind, nid)
      }
      .sortBy { case (s, k, n) => (-s, k, n) }.take(20)
      .map { case (s, k, n) => (k, n, s) }
    val got = Graph.seededBetweenness.build(spark, sf).collect()
      .map(r => (r.getAs[String]("kind"), r.getAs[Long]("node_id"),
        r.getAs[Long]("bc"))).toSeq
    assert(got == expect,
      s"brandes mismatch:\n got=$got\n exp=$expect")
  }

  test("d22: sketch estimator laws — exact on full containment and small sets, ppm-bounded") {
    val rows = Dedup.containmentSketchEval.build(spark, sf).collect()
      .map(r => (r.getAs[Long]("n_a"), r.getAs[Long]("exact_ppm"),
        r.getAs[Long]("est_ppm"), r.getAs[Long]("err_ppm")))
    assert(rows.nonEmpty)
    rows.foreach { case (na, exact, est, err) =>
      assert(exact >= 500000L && exact <= 1000000L)
      assert(est >= 0L && est <= 1000000L)
      assert(err == math.abs(exact - est))
      // A fully contained in B => every sketch hash of A is in B: the
      // estimator cannot miss on exact containment
      if (exact == 1000000L) assert(est == 1000000L, s"n_a=$na est=$est")
      // |A| <= k => the sketch IS A: estimator degenerates to exact
      if (na <= 16L) assert(err == 0L, s"n_a=$na err=$err")
    }
    // the sketch path (|A| > k) must actually be exercised
    assert(rows.exists(_._1 > 16L))
  }

  test("x50: allocation sums to the budget and matches driver-side largest remainder") {
    val got = Curation.neymanAllocation.build(spark, sf).collect()
      .map(r => (r.getAs[String]("segment"), r.getAs[Long]("n_h"),
        r.getAs[Long]("sd_cents"), r.getAs[Long]("n_alloc")))
    assert(got.map(_._4).sum == 1000L, got.mkString(","))
    assert(got.length == 5) // the five market segments
    // driver-side largest-remainder recompute from raw cents
    val cents = graft.core.Tables.customer(spark, sf)
      .selectExpr("c_mktsegment AS seg",
        "CAST(round(c_acctbal * 100) AS BIGINT) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val w = cents.map { case (seg, cs) =>
      val n = cs.length.toLong
      val sc = cs.sum; val scc = cs.map(c => c * c).sum
      val sd = math.floor(math.sqrt((n * scc - sc * sc).toDouble) / n).toLong
      seg -> n * sd
    }
    val wt = w.values.sum
    val floor0 = w.view.mapValues(v => 1000L * v / wt).toMap
    val seats = 1000L - floor0.values.sum
    val order = w.toSeq.sortBy { case (seg, v) => (-(1000L * v % wt), seg) }
      .map(_._1).take(seats.toInt).toSet
    val expect = w.keys.map(seg =>
      seg -> (floor0(seg) + (if (order(seg)) 1L else 0L))).toMap
    got.foreach { case (seg, _, _, alloc) =>
      assert(alloc == expect(seg), s"$seg: $alloc != ${expect(seg)}")
    }
    // Neyman property: every stratum with positive weight gets a share
    got.foreach { case (seg, _, sd, alloc) =>
      if (sd > 0) assert(alloc > 0, s"$seg starved despite positive weight")
    }
  }
}
