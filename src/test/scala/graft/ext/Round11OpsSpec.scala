package graft.ext

import org.apache.spark.sql.functions.col
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
      val sc = BigInt(cs.sum)
      val scc = cs.map(c => BigInt(c) * BigInt(c)).sum
      // 128-bit numerator, the widened form the sf0.5 probe forced
      val sd = math.floor(
        math.sqrt((BigInt(n) * scc - sc * sc).toDouble) / n).toLong
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

  /** HALF_UP long rounding — the rounding Spark's round() and DuckDB's
    * round() share for doubles (math.round floors x+0.5, which differs
    * at negative .5 exactly where PMI/DSIR weights live). */
  private def roundHalfUp(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact

  test("t35: top-20 PMI collocations match a driver brute force") {
    val texts = graft.core.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val toks = texts.map(_.split(" ", -1))
    val uni = toks.flatten.filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bigrams = toks.filter(_.length >= 2)
      .flatMap(t => t.init.zip(t.tail))
      .filter(p => p._1.nonEmpty && p._2.nonEmpty)
    val nu = uni.values.sum; val nb = bigrams.length.toLong
    val expect = bigrams.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.filter(_._2 >= 5L)
      .map { case ((w1, w2), cxy) =>
        val pmi = roundHalfUp(math.log(
          (cxy.toDouble * nu.toDouble * nu.toDouble) /
            (nb.toDouble * uni(w1).toDouble * uni(w2).toDouble)) * 1e6)
        (w1, w2, cxy, uni(w1), uni(w2), pmi)
      }
      .sortBy { case (w1, w2, _, _, _, p) => (-p, w1, w2) }.take(20)
    val got = TextAnalysis.pmiCollocations.build(spark, sf).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("c_xy"), r.getAs[Long]("c_x"), r.getAs[Long]("c_y"),
        r.getAs[Long]("pmi_e6"))).toSeq
    assert(got == expect)
    // PMI needs the low-frequency guard it claims: every row has c_xy >= 5
    got.foreach { case (_, _, cxy, cx, cy, _) =>
      assert(cxy >= 5L && cx >= cxy && cy >= cxy)
    }
  }

  test("ml19: doubled rank sums, U, ties, and z match a driver brute force") {
    val ev = graft.core.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0) == "error", roundHalfUp(r.getDouble(1) * 100)))
    val byCent = ev.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (c, rows) =>
        (c, rows.count(_._1).toLong, rows.count(!_._1).toLong)
      }
    val na = byCent.map(_._2).sum; val nbb = byCent.map(_._3).sum
    var cum = 0L; var r1x2 = 0L; var ties = 0L
    byCent.foreach { case (_, an, bn) =>
      val t = an + bn
      r1x2 += an * (2 * cum + t + 1)
      ties += t * t * t - t
      cum += t
    }
    val u1x2 = r1x2 - na * (na + 1)
    val n = (na + nbb).toDouble
    val z = (u1x2 / 2.0 - na.toDouble * nbb.toDouble / 2.0) /
      math.sqrt((na.toDouble * nbb.toDouble / 12.0) *
        ((n + 1.0) - ties.toDouble / (n * (n - 1.0))))
    val r = MlQueries.mannWhitney.build(spark, sf).collect().head
    assert(r.getAs[Long]("na") == na && r.getAs[Long]("nb") == nbb)
    assert(r.getAs[Long]("r1_x2") == r1x2)
    assert(r.getAs[Long]("u1_x2") == u1x2)
    assert(r.getAs[Long]("tie_sum") == ties)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-8)
    assert(r.getAs[Boolean]("reject_h0") == (math.abs(z) > 1.96))
    // U range law: 0 <= U1 <= n1*n2
    assert(u1x2 >= 0L && u1x2 <= 2 * na * nbb)
  }

  test("x51: DSIR per-language selection matches a driver brute force") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).filter(_.nonEmpty)))
    val census = docs.flatMap { case (id, lang, ts) =>
      ts.groupBy(identity).map { case (t, xs) =>
        ((id, lang, t), xs.length.toLong) }
    }.toMap
    val vocab = census.groupBy(_._1._3).map { case (t, m) =>
      t -> (m.collect { case (k, n) if k._2 == "en" => n }.sum,
        m.values.sum)
    }
    val nt = vocab.values.map(_._1).sum; val ns = vocab.values.map(_._2).sum
    val v = vocab.size.toLong
    val w = vocab.map { case (t, (ct, cs)) =>
      t -> roundHalfUp(math.log(((ct.toDouble + 0.5) / (nt.toDouble + 0.5 * v)) /
        ((cs.toDouble + 0.5) / (ns.toDouble + 0.5 * v))) * 1e6)
    }
    val perDoc = census.groupBy(k => (k._1._1, k._1._2)).map {
      case ((id, lang), m) =>
        (id, lang,
          m.map { case (k, n) => n * w(k._3) }.sum,
          m.values.sum)
    }.toSeq
    val expect = perDoc.groupBy(_._2).view.mapValues { rows =>
      val nd = rows.size.toLong
      val sel = rows.count(_._3 > 0L).toLong
      val ss = rows.map(_._3).sum
      val ntk = rows.map(_._4).sum
      val mean = if (ss >= 0) ss / ntk else -((-ss) / ntk)
      (nd, sel, ss, ntk, 1000000L * sel / nd, mean)
    }.toMap
    val got = Curation.dsirSelection.build(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val lang = r.getAs[String]("lang")
      val e = expect(lang)
      assert((r.getAs[Long]("n_docs"), r.getAs[Long]("n_selected"),
        r.getAs[Long]("sum_score_e6"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("sel_ppm"), r.getAs[Long]("mean_tok_w_e6")) == e,
        s"lang $lang mismatch")
    }
    // the target slice must prefer itself: en's selection share is the max
    val shares = got.map(r =>
      r.getAs[String]("lang") -> r.getAs[Long]("sel_ppm")).toMap
    assert(shares("en") == shares.values.max,
      s"target lang not maximally selected: $shares")
  }

  test("ml20: chi-square cells match a driver brute force; partition law holds") {
    val ev = graft.core.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0),
        math.min(roundHalfUp(r.getDouble(1) * 100) / 5000, 9L)))
    val counts = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val types = ev.map(_._1).distinct.sorted
    val bands = ev.map(_._2).distinct.sorted
    val rt = types.map(t => t -> ev.count(_._1 == t).toLong).toMap
    val ct = bands.map(b => b -> ev.count(_._2 == b).toLong).toMap
    val n = ev.length.toLong
    val terms = for (t <- types; b <- bands) yield {
      val o = counts.getOrElse((t, b), 0L)
      val e = rt(t).toDouble * ct(b).toDouble / n.toDouble
      ((t, b), o, roundHalfUp((o.toDouble - e) * (o.toDouble - e) / e * 1e6))
    }
    val chi2 = terms.map(_._3).sum
    val dof = (types.length - 1).toLong * (bands.length - 1).toLong
    val got = MlQueries.chiSquare.build(spark, sf).collect()
    assert(got.length == types.length * bands.length)
    got.foreach { r =>
      val key = (r.getAs[String]("event_type"), r.getAs[Long]("band"))
      val exp = terms.find(_._1 == key).get
      assert(r.getAs[Long]("o") == exp._2, s"$key O")
      assert(r.getAs[Long]("term_e6") == exp._3, s"$key term")
      assert(r.getAs[Long]("chi2_e6") == chi2)
      assert(r.getAs[Long]("dof") == dof)
    }
    // the cells partition the events: sum of O over the frame is n
    assert(got.map(_.getAs[Long]("o")).sum == n)
    // Wilson-Hilferty at these dof is in the sane chi-square range
    val crit = got.head.getAs[Double]("crit")
    assert(crit > dof.toDouble * 0.5 && crit < dof.toDouble * 3.0)
  }

  test("s20: range search matches a driver brute force; zero-match queries survive") {
    val embs = graft.core.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS e").collect()
      .map { r =>
        val e = r.getSeq[Double](1).toArray
        var s = 0.0; e.foreach(x => s += x * x)
        val nrm = math.sqrt(s)
        (r.getLong(0), e.map(_ / nrm))
      }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val expect = embs.filter(_._1 < 8).map { case (q, qu) =>
      val m = embs.filter(_._1 != q)
        .map { case (n, nu) => (n, roundHalfUp(dot(qu, nu) * 1e6)) }
        .filter(_._2 >= 300000L)
      val best = m.sortBy { case (n, c) => (-c, n) }.headOption
      (q, m.length.toLong, m.map(_._2).sum,
        best.map(_._1).getOrElse(-1L), best.map(_._2).getOrElse(0L))
    }.sortBy(_._1)
    val got = Similarity.rangeSearch.build(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_within"),
        r.getAs[Long]("sum_cos_e6"), r.getAs[Long]("best_id"),
        r.getAs[Long]("best_cos_e6"))).toSeq
    assert(got == expect.toSeq)
    // the domain frame keeps all 8 queries even when nothing is in range
    assert(got.map(_._1) == (0L until 8L))
  }

  test("m13: keyframes match a driver brute force; shots partition the frames") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.flatMap { case (id, text) =>
      val nf = text.length / 64
      val energies = (0 until nf).map { i =>
        text.substring(i * 64, i * 64 + 64).map(_.toInt.toLong).sum
      }
      val cuts = energies.indices.map { i =>
        if (i > 0 && math.abs(energies(i) - energies(i - 1)) > 100L) 1L
        else 0L
      }
      val shotIds = cuts.scanLeft(0L)(_ + _).tail
      energies.indices.groupBy(shotIds).toSeq.map { case (sid, idxs) =>
        val key = idxs.maxBy(i => (energies(i), -i))
        (id, sid, idxs.min, idxs.length.toLong, key, energies(key))
      }
    }.sortBy(t => (t._1, t._2))
    val got = Multimodal.keyframeSelect.build(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shot_id"),
        r.getAs[Int]("shot_start"), r.getAs[Long]("n_frames_in_shot"),
        r.getAs[Int]("key_idx"), r.getAs[Long]("key_energy"))).toSeq
    assert(got == expect.toSeq)
    // partition law: per doc, shot sizes sum to the full-frame count
    got.groupBy(_._1).foreach { case (id, rows) =>
      val nf = docs.find(_._1 == id).get._2.length / 64
      assert(rows.map(_._4).sum == nf.toLong, s"doc $id shot partition")
      // keyframe idx lies inside its shot
      rows.foreach { r => assert(r._5 >= r._3) }
    }
  }

  test("ml21: Newton step and exact-integer accuracy match a BigInt brute force") {
    val ev = graft.core.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (roundHalfUp(r.getDouble(1) * 100),
        if (r.getString(0) == "error") 1L else 0L))
    val n = ev.length.toLong
    val sx = ev.map(_._1).sum; val sxx = ev.map(t => t._1 * t._1).sum
    val sy = ev.map(_._2).sum; val sxy = ev.map(t => t._1 * t._2).sum
    val g0 = BigInt(2 * sy - n); val g1 = BigInt(2 * sxy - sx)
    val a = BigInt(sxx) * g0 - BigInt(sx) * g1
    val b = BigInt(n) * g1 - BigInt(sx) * g0
    val det = BigInt(n) * BigInt(sxx) - BigInt(sx) * BigInt(sx)
    assert(det > 0)
    // r12: coefficients are exact 1e-9 fixed-point integers
    // (2*num*1e9) DIV det, sign-split truncation — the ml21 hash fix
    def e9(num: BigInt): Long = {
      val scaled = num * 2 * BigInt(1000000000)
      val q = if (scaled >= 0) scaled / det else -((-scaled) / det)
      q.toLong
    }
    val nCorrect = ev.count { case (x, y) =>
      (a + b * BigInt(x) > 0) == (y == 1L) }.toLong
    val r = MlQueries.logitNewton.build(spark, sf).collect().head
    assert(r.getAs[Long]("n") == n && r.getAs[Long]("n_pos") == sy)
    assert(r.getAs[Long]("b0_e9") == e9(a))
    assert(r.getAs[Long]("b1_e9") == e9(b))
    assert(r.getAs[Double]("b0") == e9(a).toDouble / 1e9)
    assert(r.getAs[Double]("b1") == e9(b).toDouble / 1e9)
    assert(r.getAs[Long]("n_correct") == nCorrect)
    assert(r.getAs[Long]("acc_ppm") == 1000000L * nCorrect / n)
    assert(r.getAs[Long]("base_correct") == math.max(sy, n - sy))
    // prediction threshold really is the sign of b0 + b1*x: spot-check
    val b0 = 2.0 * a.toDouble / det.toDouble
    val b1 = 2.0 * b.toDouble / det.toDouble
    ev.take(50).foreach { case (x, _) =>
      val score = b0 + b1 * x
      if (math.abs(score) > 1e-6)
        assert((a + b * BigInt(x) > 0) == (score > 0),
          s"integer threshold disagrees with float score at x=$x")
    }
  }

  test("t36: Kneser-Ney per-language cross-entropy matches a driver brute force") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val census: Map[(String, String, String), Long] = docs.flatMap {
      case (lang, t) =>
        if (t.length < 2) Seq.empty[(String, String, String)]
        else t.init.zip(t.tail).toSeq
          .filter(p => p._1.nonEmpty && p._2.nonEmpty)
          .map(p => (lang, p._1, p._2))
    }.groupBy(x => x).view.mapValues(_.length.toLong).toMap
    val model = census.groupBy(k => (k._1._2, k._1._3)).view
      .mapValues(_.values.sum).toMap
    val c1dot = model.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1pW1 = model.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val n1pW2 = model.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val tTypes = model.size.toLong
    val lp = model.map { case ((w1, w2), c12) =>
      val p = math.max(c12.toDouble - 0.75, 0.0) / c1dot(w1).toDouble +
        (0.75 * n1pW1(w1).toDouble / c1dot(w1).toDouble) *
          (n1pW2(w2).toDouble / tTypes.toDouble)
      (w1, w2) -> roundHalfUp(math.log(p) * 1e6)
    }
    val want = census.groupBy(_._1._1).view.mapValues { m =>
      val nB = m.values.sum
      val sumLp = m.map { case ((_, w1, w2), c) => c * lp((w1, w2)) }.sum
      (nB, sumLp)
    }.toMap
    val got = TextAnalysis.knPerplexity.build(spark, sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val lang = r.getAs[String]("lang")
      val (nB, sumLp) = want(lang)
      assert(r.getAs[Long]("n_bigrams") == nB, s"$lang n_bigrams")
      assert(r.getAs[Long]("sum_lp_e6") == sumLp, s"$lang sum_lp")
      val mean = if (sumLp >= 0) sumLp / nB else -((-sumLp) / nB)
      assert(r.getAs[Long]("mean_lp_e6") == mean, s"$lang mean")
      // a probability model: every log prob is negative, ppl > 1
      assert(sumLp < 0L && r.getAs[Double]("ppl") > 1.0)
    }
  }

  test("x52: bucket accounting matches brute force; saved-tokens identity holds") {
    val lens = graft.core.Tables.documents(spark, sf)
      .select("text").collect()
      .map(_.getString(0).split(" ", -1).length.toLong)
    val buckets = Seq(32L, 64L, 96L, 128L)
    def bucketOf(n: Long): Long =
      buckets.find(n <= _).getOrElse(128L)
    val got = Curation.lengthBucketing.build(spark, sf).collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("tokens_kept"),
          r.getAs[Long]("padding_toks"), r.getAs[Long]("util_ppm"),
          r.getAs[Long]("saved_vs_fixed")))).toMap
    assert(got.keySet == buckets.toSet)
    buckets.foreach { bkt =>
      val mine = lens.filter(bucketOf(_) == bkt)
      val kept = mine.map(math.min(_, bkt)).sum
      val pad = mine.map(n => bkt - math.min(n, bkt)).sum
      val fixedPad = mine.map(n => 128L - math.min(n, 128L)).sum
      val (nd, tk, pt, util, saved) = got(bkt)
      assert(nd == mine.length.toLong, s"bucket $bkt docs")
      assert(tk == kept && pt == pad, s"bucket $bkt tokens")
      assert(util == (if (nd == 0) 0L else 1000000L * kept / (nd * bkt)))
      assert(saved == fixedPad - pad, s"bucket $bkt saved")
      // below the cap nothing truncates, so saved is exactly (cap-L)*docs
      if (bkt < 128L) assert(saved == (128L - bkt) * nd)
    }
    // bucket frame partitions the corpus
    assert(got.values.map(_._1).sum == lens.length.toLong)
  }

  private def md5Int60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(1, 16), 16)
  }

  test("ml22: re-randomization p-value matches a driver md5 brute force") {
    val ev = graft.core.Tables.events(spark, sf)
      .select("event_id", "value").collect()
      .map(r => (r.getLong(0), roundHalfUp(r.getDouble(1) * 100)))
    def arms(key: Long => String): (Long, Long, Long, Long) = {
      var n1 = 0L; var s1 = 0L; var n0 = 0L; var s0 = 0L
      ev.foreach { case (id, c) =>
        if (md5Int60(key(id)) % 2 == 1) { n1 += 1; s1 += c }
        else { n0 += 1; s0 += c }
      }
      (n1, s1, n0, s0)
    }
    val (n1o, s1o, n0o, s0o) = arms(id => id.toString)
    val obsNum = (BigInt(s1o) * n0o - BigInt(s0o) * n1o).abs
    val nExtreme = (0 until 32).count { rep =>
      val (n1, s1, n0, s0) = arms(id => s"$id:$rep")
      (BigInt(s1) * n0 - BigInt(s0) * n1).abs * (BigInt(n1o) * n0o) >=
        obsNum * (BigInt(n1) * n0)
    }.toLong
    val r = MlQueries.permutationTest.build(spark, sf).collect().head
    assert(r.getAs[Long]("n_events") == ev.length.toLong)
    assert(r.getAs[Long]("n1o") == n1o && r.getAs[Long]("n0o") == n0o)
    assert(r.getAs[Long]("n_reps") == 32L)
    assert(r.getAs[Long]("n_extreme") == nExtreme)
    val p = 1000000L * (1 + nExtreme) / 33L
    assert(r.getAs[Long]("p_ppm") == p)
    assert(r.getAs[Boolean]("reject_h0") == (p <= 50000L))
    // p is a probability with add-one smoothing: strictly positive
    assert(p > 0L && p <= 1000000L)
  }

  test("s21: farthest-first seeds and census match a driver replay") {
    val embs = graft.core.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS e").collect()
      .map { r =>
        val e = r.getSeq[Double](1).toArray
        var s2 = 0.0; e.foreach(x => s2 += x * x)
        val nrm = math.sqrt(s2)
        (r.getLong(0), e.map(_ / nrm))
      }.sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s2 = 0.0; var i = 0
      while (i < a.length) { s2 += a(i) * b(i); i += 1 }; s2
    }
    var chosen = Vector((0L, embs.find(_._1 == 0L).get._2, 0.0))
    while (chosen.size < 4) {
      val cand = embs.filter(v => !chosen.exists(_._1 == v._1))
        .map { case (id, u) =>
          (id, u, chosen.map(c => 2.0 - 2.0 * dot(u, c._2)).min)
        }
      val best = cand.maxBy { case (id, _, md) => (md, -id) }
      // maxBy keeps the FIRST max; enforce the (md desc, id asc) rule
      val sel = cand.filter(_._3 == best._3).minBy(_._1)
      chosen = chosen :+ ((sel._1, sel._2, sel._3))
    }
    val assign = embs.map { case (id, u) =>
      val ds = chosen.zipWithIndex.map { case ((_, cu, _), rk) =>
        (2.0 - 2.0 * dot(u, cu), rk)
      }
      val bestRk = ds.minBy { case (d2, rk) => (d2, rk) }._2
      (bestRk.toLong, roundHalfUp(ds(bestRk)._1 * 1e9))
    }
    val expect = chosen.zipWithIndex.map { case ((id, _, md), rk) =>
      val mine = assign.filter(_._1 == rk.toLong)
      (rk.toLong, id, roundHalfUp(md * 1e9), mine.length.toLong,
        mine.map(_._2).sum)
    }
    val got = Similarity.farthestFirst.build(spark, sf).collect()
      .map(r => (r.getAs[Long]("rk"), r.getAs[Long]("cid"),
        r.getAs[Long]("sel_dist_e9"), r.getAs[Long]("n_assigned"),
        r.getAs[Long]("sum_dist_e9"))).toSeq
    assert(got == expect)
    // farthest-first law: selection radii are NON-INCREASING past seed 1
    val radii = got.drop(1).map(_._3)
    radii.sliding(2).foreach { case Seq(a, b2) => assert(b2 <= a) }
    // the seeds partition the corpus
    assert(got.map(_._4).sum == embs.length.toLong)
  }

  test("x53: cluster policy never splits a cluster; accounting matches driver replay") {
    val labels = Dedup.ngramSharedLabels(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = graft.core.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    val comp = ids.map(id => id -> labels.getOrElse(id, id)).toMap
    def statsFor(shardOf: Long => Long) = {
      val byComp = ids.groupBy(comp)
      val split = byComp.filter { case (_, ms) =>
        ms.map(shardOf).distinct.length > 1 }
      val shards = ids.groupBy(shardOf).view.mapValues(_.length.toLong)
      (byComp.size.toLong, split.size.toLong,
        split.values.map(_.length.toLong).sum,
        shards.values.max, shards.values.min)
    }
    val want = Map(
      "naive" -> statsFor(id => id % 8),
      "cluster" -> statsFor(id => comp(id) % 8))
    val got = Curation.clusterSharding.build(spark, sf).collect()
      .map(r => r.getAs[String]("policy") ->
        ((r.getAs[Long]("n_clusters"), r.getAs[Long]("clusters_split"),
          r.getAs[Long]("docs_in_split"), r.getAs[Long]("max_shard"),
          r.getAs[Long]("min_shard"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("skew_ppm")))).toMap
    assert(got.keySet == Set("naive", "cluster"))
    got.foreach { case (policy, (nc, cs, dis, mx, mn, nd, skew)) =>
      val (wnc, wcs, wdis, wmx, wmn) = want(policy)
      assert((nc, cs, dis, mx, mn) == ((wnc, wcs, wdis, wmx, wmn)),
        s"$policy stats")
      assert(nd == ids.length.toLong)
      assert(skew == 1000000L * (mx * 8 - nd) / nd)
    }
    // the whole point: cluster-keyed sharding can NEVER split a cluster
    assert(got("cluster")._2 == 0L && got("cluster")._3 == 0L)
  }

  test("q57: as-of lookup matches a per-customer replay; at most one version matches") {
    val ord = graft.core.Tables.orders(spark, sf)
      .selectExpr("o_custkey",
        "date_format(o_orderdate, 'yyyy-MM-dd') AS od",
        "o_orderkey", "o_orderpriority")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    // order dates are day-granular, so string comparison IS date order
    val probes = Seq("1994-01-01", "1996-01-01", "1998-01-01")
    val want = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    ord.groupBy(_._1).foreach { case (_, rows) =>
      val versions = rows.sortBy(r => (r._2, r._3))
      probes.foreach { ds =>
        // latest version whose valid_from <= probe and next-from > probe
        val idx = versions.lastIndexWhere(_._2 <= ds)
        if (idx >= 0) {
          val nextOk = idx == versions.length - 1 ||
            versions(idx + 1)._2 > ds
          // zero-length ranges never match; the LAST of equal dates wins
          if (nextOk) want((ds, versions(idx)._4)) += 1L
        }
      }
    }
    val got = graft.queries.Relational.q57.build(spark, sf).collect()
      .map(r => (r.getAs[String]("asof_date"),
        r.getAs[String]("o_orderpriority")) -> r.getAs[Long]("n_customers"))
      .toMap
    assert(got == want.toMap.filter(_._2 > 0L))
    // per probe date the census covers each ordering customer at most once
    val perDate = got.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum)
    val nCust = ord.map(_._1).distinct.length.toLong
    perDate.foreach { case (ds, total) =>
      assert(total <= nCust, s"$ds census exceeds customer count")
    }
  }

  test("ml23: per-segment OLS equals ml01b's closed form per group") {
    val rows = graft.core.Tables.orders(spark, sf)
      .join(graft.core.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .selectExpr("c_mktsegment AS seg",
        "CAST(month(o_orderdate) AS LONG) AS x",
        "CAST(floor(o_totalprice / 100e0) AS BIGINT) AS y")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).view.mapValues { rs =>
      val n = rs.length.toLong
      val sx = rs.map(_._2).sum; val sy = rs.map(_._3).sum
      val sxy = rs.map(t => t._2 * t._3).sum
      val sxx = rs.map(t => t._2 * t._2).sum
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      (n, slope, (sy.toDouble - slope * sx.toDouble) / n.toDouble)
    }.toMap
    val got = MlQueries.groupedOls.build(spark, sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (n, slope, icept) = want(r.getAs[String]("seg"))
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Double]("slope") == slope)
      assert(r.getAs[Double]("intercept") == icept)
    }
  }

  test("d23: coherence accounting matches the shared stage; no edge below theta") {
    val pairs = Dedup.ngramSharedPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        roundHalfUp(r.getDouble(2) * 1e6)))
    val labels = Dedup.ngramSharedLabels(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byComp = pairs.groupBy(p => labels(p._1))
    val sizes = labels.values.groupBy(identity[Long]).view
      .mapValues(_.size.toLong).toMap
    val want = byComp.toSeq.map { case (comp, es) =>
      (sizes(comp), es.length.toLong, es.map(_._3).min, es.map(_._3).sum)
    }.groupBy(_._1).view.mapValues { cs =>
      (cs.length.toLong, cs.count(_._3 < 250000L).toLong,
        cs.map(_._3).min, cs.map(_._4).sum / cs.map(_._2).sum)
    }.toMap
    val got = Dedup.clusterCoherence.build(spark, sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val k = r.getAs[Long]("cluster_size")
      val (nc, weak, wmin, mean) = want(k)
      assert(r.getAs[Long]("n_clusters") == nc, s"size $k clusters")
      assert(r.getAs[Long]("n_weak_bridge") == weak, s"size $k weak")
      assert(r.getAs[Long]("weakest_edge_ppm") == wmin, s"size $k min")
      assert(r.getAs[Long]("mean_edge_ppm") == mean, s"size $k mean")
      // every admitted edge is >= theta by the pair stage's filter
      assert(wmin >= 200000L)
    }
  }

  test("t37: McNemar cells agree with t01's per-doc predictions; verdict is exact-integer") {
    val t01 = TextAnalysis.langId.build(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("pred_lang")))
    val b = t01.count { case (lang, pa) => pa == lang && lang != "en" }.toLong
    val c = t01.count { case (lang, pa) => pa != lang && lang == "en" }.toLong
    val r = TextAnalysis.mcnemarLangId.build(spark, sf).collect().head
    assert(r.getAs[Long]("n_docs") == t01.length.toLong)
    assert(r.getAs[Long]("n_a_correct") ==
      t01.count(t => t._2 == t._1).toLong)
    assert(r.getAs[Long]("n_b_correct") ==
      t01.count(_._1 == "en").toLong)
    assert(r.getAs[Long]("b") == b && r.getAs[Long]("c") == c)
    assert(r.getAs[Long]("chi2_e6") == 1000000L * (b - c) * (b - c) / (b + c))
    assert(r.getAs[Boolean]("reject_h0") ==
      ((b - c) * (b - c) * 10000L > 38416L * (b + c)))
    // discordant cells are disjoint subsets of the corpus
    assert(b + c <= t01.length.toLong)
  }

  test("q58: rate-limit admissions match a per-user sliding-window replay") {
    val ev = graft.core.Tables.events(spark, sf)
      .selectExpr("event_type", "user_id",
        "unix_timestamp(ts) AS epoch_s").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byUser = ev.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
    val want = ev.groupBy(_._1).view.mapValues { rs =>
      val admitted = rs.count { case (_, uid, t) =>
        byUser(uid).count(t2 => t2 >= t - 600 && t2 <= t - 1) < 3
      }.toLong
      val peak = rs.map { case (_, uid, t) =>
        byUser(uid).count(t2 => t2 >= t - 600 && t2 <= t - 1).toLong
      }.max
      (rs.length.toLong, admitted, peak)
    }.toMap
    val got = graft.queries.Relational.q58.build(spark, sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (n, adm, peak) = want(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Long]("n_admitted") == adm)
      assert(r.getAs[Long]("peak_prior") == peak)
      assert(r.getAs[Long]("admit_ppm") == 1000000L * adm / n)
      // the admission rule can never admit more than everything
      assert(adm <= n)
    }
  }

  test("g18: two-hop reach matches a driver adjacency replay") {
    val edges = graft.core.Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nSup = graft.core.Tables.supplier(spark, sf).count()
    val bySup = edges.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val byPart = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = graft.core.Tables.supplier(spark, sf)
      .select("s_suppkey").collect().map(_.getLong(0)).filter(_ <= 8L).sorted
    val got = Graph.twoHopReach.build(spark, sf).collect()
      .map(r => (r.getAs[Long]("seed"), r.getAs[Long]("n_parts"),
        r.getAs[Long]("n_cosuppliers"), r.getAs[Long]("reach_ppm")))
    assert(got.map(_._1).toSeq == seeds.toSeq)
    got.foreach { case (seed, np, nc, ppm) =>
      val parts = bySup.getOrElse(seed, Set.empty)
      val cosup = parts.flatMap(byPart) - seed
      assert(np == parts.size.toLong, s"seed $seed parts")
      assert(nc == cosup.size.toLong, s"seed $seed cosuppliers")
      assert(ppm == 1000000L * cosup.size / (nSup - 1))
    }
  }

  test("d24: cross-source matrix matches the shared stage; keys are unordered") {
    val src = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Dedup.ngramSharedPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        roundHalfUp(r.getDouble(2) * 1e6)))
    val want = pairs.groupBy { case (a, b, _) =>
      val (sa, sb) = (src(a), src(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.view.mapValues(es =>
      (es.length.toLong, es.map(_._3).sum / es.length)).toMap
    val got = Dedup.crossSourceDup.build(spark, sf).collect()
      .map(r => (r.getAs[String]("src_lo"), r.getAs[String]("src_hi")) ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("mean_j_ppm"),
          r.getAs[Boolean]("within")))).toMap
    assert(got.size == want.size)
    got.foreach { case ((lo, hi), (n, mean, within)) =>
      assert(lo <= hi, "pair key must be unordered-normalized")
      assert(within == (lo == hi))
      assert((n, mean) == want((lo, hi)), s"($lo,$hi)")
    }
    // pair accounting: matrix covers every admitted pair exactly once
    assert(got.values.map(_._1).sum == pairs.length.toLong)
  }

  test("t38: kappa agrees with a confusion replay of t01; bounded in [-1, 1]") {
    val t01 = TextAnalysis.langId.build(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("pred_lang")))
    val n = t01.length.toLong
    val agree = t01.count(t => t._1 == t._2).toLong
    val rowT = t01.groupBy(_._1).view.mapValues(_.length.toLong)
    val colT = t01.groupBy(_._2).view.mapValues(_.length.toLong)
    val labels = (rowT.keySet ++ colT.keySet).toSeq
    val srcSum = labels.map(l =>
      rowT.getOrElse(l, 0L) * colT.getOrElse(l, 0L)).sum
    val kNum = 1000000L * (n * agree - srcSum)
    val kDen = n * n - srcSum
    val kappa = if (kNum >= 0) kNum / kDen else -((-kNum) / kDen)
    val r = TextAnalysis.cohensKappa.build(spark, sf).collect().head
    assert(r.getAs[Long]("n_docs") == n)
    assert(r.getAs[Long]("n_agree") == agree)
    assert(r.getAs[Long]("po_ppm") == 1000000L * agree / n)
    assert(r.getAs[Long]("pe_ppm") == 1000000L * srcSum / (n * n))
    assert(r.getAs[Long]("kappa_e6") == kappa)
    assert(kappa >= -1000000L && kappa <= 1000000L)
    // chance correction is real: kappa sits below raw accuracy
    assert(kappa <= r.getAs[Long]("po_ppm"))
  }

  test("e13: KMV sweep matches a driver bottom-k replay; prefixes nest") {
    val keys = graft.core.Tables.lineitem(spark, sf)
      .selectExpr("CAST(l_orderkey AS STRING) AS k").collect()
      .map(_.getString(0)).distinct
    val hs = keys.map(md5Int60).distinct.sorted
    val exact = keys.length.toLong
    val got = graft.queries.Extensions.kmvSizeSweep.build(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("hk"),
        r.getAs[Long]("exact"), r.getAs[Long]("kmv_est"),
        r.getAs[Long]("err_ppm")))
    assert(got.map(_._1).toSeq == Seq(4L, 8L, 16L, 32L))
    got.foreach { case (k, hk, ex, est, err) =>
      assert(hk == hs((k - 1).toInt), s"k=$k: h_k is the k-th minimum")
      assert(ex == exact)
      val want = roundHalfUp((k - 1).toDouble *
        1152921504606846976.0 / hk.toDouble)
      assert(est == want, s"k=$k estimate")
      assert(err == 1000000L * math.abs(est - exact) / exact)
    }
    // nesting: each h_k is <= the next (prefixes of ONE bottom-32 set)
    got.map(_._2).toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(a < b)
    }
  }

  test("t39: planted loops detected at their smallest period; fixture census partitions") {
    // the fixture has no natural loops, so plant every period through
    // the SAME build path (x49's canary discipline)
    val dir = java.nio.file.Files.createTempDirectory("t39").toString
    Seq(
      (1L, ("x " * 20).trim, "en", "s0"),
      (2L, ("a b " * 10).trim, "en", "s0"),
      (3L, ("a b c " * 8).trim, "en", "s0"),
      (4L, ("a b c d " * 6).trim, "en", "s0"),
      (5L, (1 to 14).map(i => s"w$i").mkString(" "), "en", "s0"),
      (6L, "too short", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = TextAnalysis.loopDetection.build(spark, dir).collect()
      .map(r => r.getAs[Int]("period") -> r.getAs[Long]("n_docs")).toMap
    assert(planted == Map(1 -> 1L, 2 -> 1L, 3 -> 1L, 4 -> 1L, 0 -> 2L),
      s"planted census wrong: $planted")
    // fixture: the census partitions the corpus per language
    val got = TextAnalysis.loopDetection.build(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs")))
    val docsPerLang = graft.core.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.map(_._2).sum == docsPerLang(lang), s"$lang partition")
    }
  }

  test("x54: acceptance replays with driver md5 BigInt; mix moves toward uniform") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val census = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = docs.length.toLong; val l = census.size.toLong
    val twoSixty = BigInt(1152921504606846976L)
    val want = docs.groupBy(_._2).view.mapValues { ds =>
      val nl = ds.length.toLong
      val acc = ds.count { case (id, _) =>
        BigInt(md5Int60(id.toString)) * l * nl < twoSixty * n
      }.toLong
      (nl, acc)
    }.toMap
    val got = Curation.rejectionResample.build(spark, sf).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_accepted"),
          r.getAs[Long]("before_ppm"), r.getAs[Long]("after_ppm")))).toMap
    assert(got.size == want.size)
    val accTotal = want.values.map(_._2).sum
    got.foreach { case (lang, (nd, na, before, after)) =>
      assert((nd, na) == want(lang), s"$lang acceptance")
      assert(before == 1000000L * nd / n)
      assert(after == 1000000L * na / accTotal)
      // under-represented languages are never rejected
      if (census(lang) * l <= n) assert(na == nd, s"$lang minority dropped")
    }
    // the rebalance law: worst-case deviation from uniform shrinks
    val uni = 1000000L / l
    val devBefore = got.values.map(v => math.abs(v._3 - uni)).max
    val devAfter = got.values.map(v => math.abs(v._4 - uni)).max
    assert(devAfter < devBefore, s"mix must move toward uniform: $got")
  }

  test("q56: map pipeline equals the relational recompute; cardinality law holds") {
    val li = graft.core.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_returnflag", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2).toLong))
    val per = li.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val nFlags = per.keys.toSeq.groupBy(_._1).view.mapValues(_.size).toMap
    val expect = per.toSeq.collect {
      case ((ok, fl), q) if q >= 50L => (ok, nFlags(ok), fl, 2 * q)
    }.sortBy(t => (t._1, t._3))
    val got = graft.queries.Relational.q56.build(spark, sf).collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Int]("n_flags"),
        r.getAs[String]("flag"), r.getAs[Long]("dbl_qty"))).toSeq
    assert(got == expect)
    // cardinality is the PRE-filter map size: emitted rows per order <= n_flags
    got.groupBy(_._1).foreach { case (ok, rows) =>
      assert(rows.length <= rows.head._2, s"order $ok emits more than n_flags")
    }
  }
}
