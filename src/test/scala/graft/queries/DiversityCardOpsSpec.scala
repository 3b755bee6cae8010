package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Independent-recomputation checks for the round-8 additions t19, t20,
  * g08, x33, m06, s10: each query's sf0.001 output is rebuilt in plain
  * Scala from the collected base tables (a different execution path than
  * the registered plan; DuckDB hash parity is the Verify gate's job).
  */
class DiversityCardOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  private def docs(): Map[Long, String] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def round(x: Double, d: Int): Double =
    BigDecimal(x).setScale(d, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("t19: TTR / Simpson / Yule's K reproduce from token frequencies") {
    val got = graft.ext.TextAnalysis.lexicalDiversity.build(spark, sf)
      .collect().map(r => r.getLong(0) -> r).toMap
    val texts = docs()
    assert(got.size == texts.size)
    texts.foreach { case (id, text) =>
      val f = text.toLowerCase.split(" ", -1).groupBy(identity)
        .map(_._2.length.toLong)
      val n = f.sum; val v = f.size.toLong; val f2 = f.map(x => x * x).sum
      val r = got(id)
      assert(r.getAs[Long]("n_tokens") == n, s"doc $id n")
      assert(r.getAs[Long]("n_types") == v, s"doc $id v")
      assert(math.abs(r.getAs[Double]("ttr") - round(v.toDouble / n, 6)) < 1e-9)
      val simpson = if (n > 1) round((f2 - n).toDouble / (n * (n - 1)), 6) else 0.0
      assert(math.abs(r.getAs[Double]("simpson_d") - simpson) < 1e-9, s"doc $id")
      val yule = round(10000.0 * ((f2 - n).toDouble / (n * n)), 4)
      assert(math.abs(r.getAs[Double]("yule_k") - yule) < 1e-9, s"doc $id")
    }
  }

  test("t20: RAKE phrases, scores, and ranking match a Scala recomputation") {
    val stop = Set("the", "a", "of", "and", "in", "to", "is", "on", "for", "with")
    val got = graft.ext.TextAnalysis.rakeKeywords.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("rank")) ->
        (r.getString(2), r.getAs[Long]("n_words"), r.getAs[Long]("score"),
          r.getAs[Long]("n_occur"))).toMap
    val want = docs().flatMap { case (id, text) =>
      val toks = text.toLowerCase.split(" ", -1).zipWithIndex
      // islands of consecutive non-stop tokens
      val phrases = scala.collection.mutable.ListBuffer.empty[List[(String, Int)]]
      var cur = List.empty[(String, Int)]
      toks.foreach { case (t, p) =>
        if (stop(t)) { if (cur.nonEmpty) phrases += cur.reverse; cur = Nil }
        else cur = (t, p) :: cur
      }
      if (cur.nonEmpty) phrases += cur.reverse
      if (phrases.isEmpty) Nil
      else {
        val words = phrases.flatMap(ph => ph.map(w => (w._1, ph.length.toLong)))
        val deg = words.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
        val freq = words.groupBy(_._1).map { case (w, xs) => w -> xs.size.toLong }
        def wscore(w: String) = deg(w) * 1000 / freq(w)
        val scored = phrases.map { ph =>
          (ph.map(_._1).mkString(" "), ph.length.toLong,
            ph.map(w => wscore(w._1)).sum)
        }
        val dist = scored.groupBy(_._1).map { case (p, xs) =>
          (p, xs.head._2, xs.head._3, xs.size.toLong)
        }.toSeq
        dist.sortBy { case (p, _, sc, _) => (-sc, p) }.take(2).zipWithIndex
          .map { case ((p, len, sc, occ), i) => (id, i + 1) -> (p, len, sc, occ) }
      }
    }
    assert(got == want.toMap)
  }

  test("g08: two HITS rounds reproduce from adjacency maps") {
    val e = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_suppkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var hub = e.map(_._1).distinct.map(_ -> 1L).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to 2) {
      auth = e.groupBy(_._2).map { case (p, es) =>
        p -> es.map(x => hub(x._1)).sum }
      hub = e.groupBy(_._1).map { case (s_, es) =>
        s_ -> es.map(x => auth(x._2)).sum }
    }
    val wantHub = hub.toSeq.sortBy { case (id, h) => (-h, id) }.take(10)
    val wantAuth = auth.toSeq.sortBy { case (id, a) => (-a, id) }.take(10)
    val got = graft.ext.Graph.hits.build(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.filter(_._1 == "hub").map(x => (x._2, x._3)).toSeq == wantHub)
    assert(got.filter(_._1 == "authority").map(x => (x._2, x._3)).toSeq
      == wantAuth)
  }

  test("x33: card cells reproduce, median is the exact midpoint") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "source", "text", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    val dupTexts = rows.groupBy(_._3).filter(_._2.length > 1).keySet
    val corpusTokens = rows.map(_._3.trim.split("\\s+").length.toLong).sum
    val got = graft.ext.Curation.datasetCard.build(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    rows.groupBy(r => (r._1, r._2)).foreach { case (key, cell) =>
      val toks = cell.map(_._3.trim.split("\\s+").length.toLong).sorted
      val r = got(key)
      assert(r.getAs[Long]("n_docs") == cell.length)
      assert(r.getAs[Long]("total_tokens") == toks.sum)
      val med =
        if (toks.length % 2 == 1) toks(toks.length / 2).toDouble
        else (toks(toks.length / 2 - 1) + toks(toks.length / 2)) / 2.0
      assert(r.getAs[Double]("median_tokens") == round(med, 1), s"cell $key")
      assert(r.getAs[Long]("max_tokens") == toks.max)
      assert(r.getAs[Long]("dup_docs") == cell.count(c => dupTexts(c._3)))
      assert(math.abs(r.getAs[Double]("token_share") -
        round(toks.sum.toDouble / corpusTokens, 6)) < 1e-9)
    }
  }

  test("m06: frame energies, peak, and mean reproduce per document") {
    val got = graft.ext.Multimodal.audioFrameEnergy.build(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    docs().foreach { case (id, text) =>
      val frames = text.grouped(64).toArray
      val energies = frames.map(_.map(_.toLong).sum)
      val r = got(id)
      assert(r.getAs[Int]("n_frames") == frames.length, s"doc $id")
      val (peakE, peakI) = energies.zipWithIndex
        .maxBy { case (e, i) => (e, -i.toLong) }
      assert(r.getAs[Int]("peak_frame") == peakI, s"doc $id")
      assert(r.getAs[Long]("peak_energy") == peakE, s"doc $id")
      // r12: exact e4 fixed-point mean (truncating DIV)
      val meanE4 = 10000L * energies.sum / energies.length
      assert(r.getAs[Long]("mean_energy_e4") == meanE4, s"doc $id")
      assert(r.getAs[Double]("mean_energy") == meanE4.toDouble / 10000.0)
    }
  }

  test("g09: log2 bins and masses reproduce from degree maps") {
    val e = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val degs = e.groupBy(_._1).map(_._2.length.toLong).map(("part", _)) ++
      e.groupBy(_._2).map(_._2.length.toLong).map(("supplier", _))
    val want = degs.groupBy { case (k, d) =>
      (k, java.lang.Long.toBinaryString(d).length)
    }.map { case ((k, b), xs) =>
      (k, b) -> (xs.size.toLong, xs.map(_._2).sum,
        xs.map(_._2).min, xs.map(_._2).max)
    }
    val got = graft.ext.Graph.degreeHistogram.build(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == want)
  }

  test("s11: the rescore stage reorders the int8 candidates, both exact") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map { r =>
        val e = r.getSeq[Float](1).map(_.toDouble).toArray
        val n = math.sqrt(e.map(x => x * x).sum)
        r.getLong(0) -> e.map(_ / n)
      }.toMap
    def q8(v: Array[Double]) = v.map(x => BigDecimal(x * 127)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    def idot(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    def fdot(a: Array[Double], b: Array[Double]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    val want = (0L until 5L).flatMap { qid =>
      val qu = vecs(qid); val qq = q8(qu)
      val cands = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, idot(qq, q8(v))) }
        .sortBy { case (id, d) => (-d, id) }.take(20)
      cands.map { case (id, d) => (id, d, fdot(qu, vecs(id))) }
        .sortBy { case (id, _, c) => (-c, id) }.take(5).zipWithIndex
        .map { case ((id, d, c), i) => (qid, i + 1) -> (id, d, c) }
    }.toMap
    val got = graft.ext.Similarity.twoStageRescore.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("rn")) ->
        (r.getLong(1), r.getAs[Long]("i_dot"), r.getAs[Double]("cos_sim")))
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (id, d, c)) =>
      assert(id == want(k)._1 && d == want(k)._2, s"key $k")
      assert(math.abs(c - want(k)._3) < 1e-12, s"cos $k")
    }
  }

  test("d17: calibration buckets reproduce from a Scala MinHash") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hexSlice(h: String, from: Int, len: Int) = // 1-based, like SQL
      h.substring(from - 1, from - 1 + len).foldLeft(0L)((a, c) =>
        a * 16 + Character.digit(c, 16))
    val texts = docs()
    val shingles = texts.map { case (id, t) =>
      val w = t.split(" ", -1)
      val n = math.max(w.length - 2, 1)
      id -> (0 until n).map(i =>
        w.slice(i, i + 3).mkString(" ")).distinct.toSet
    }
    val sigs = shingles.map { case (id, sh) =>
      val hs = sh.toSeq.map { g =>
        val m = md5hex(g); (hexSlice(m, 2, 15), hexSlice(m, 17, 14))
      }
      id -> (0 until 8).map(k => hs.map { case (a, b) => a + k * b }.min)
    }
    val bands = sigs.toSeq.flatMap { case (id, sg) =>
      (0 until 2).map(b => (b, sg.slice(b * 4, b * 4 + 4).mkString(",")) -> id)
    }
    val cand = bands.groupBy(_._1).values.flatMap { xs =>
      val ids = xs.map(_._2).sorted
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    val want = cand.toSeq.map { case (a, b) =>
      val m = (0 until 8).count(k => sigs(a)(k) == sigs(b)(k)).toLong
      val inter = (shingles(a) & shingles(b)).size.toLong
      val union = shingles(a).size + shingles(b).size - inter
      (math.min(10 * inter / union, 9L), m, inter, union)
    }.groupBy(_._1).map { case (bk, xs) =>
      bk.toInt -> (xs.size.toLong,
        round(xs.map(_._2).sum.toDouble / (8.0 * xs.size), 6),
        round(xs.map(_._3).sum.toDouble / xs.map(_._4).sum, 6))
    }
    val got = graft.ext.Dedup.minhashCalibration.build(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (n, e, x)) =>
      assert(n == want(k)._1, s"bucket $k n")
      assert(math.abs(e - want(k)._2) < 1e-9, s"bucket $k est")
      assert(math.abs(x - want(k)._3) < 1e-9, s"bucket $k exact")
    }
  }

  test("x34: kept member is the cluster argmax under a Scala union-find") {
    val pairs = graft.ext.Dedup.ngramJaccard.build(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val toks = docs().view.mapValues(t =>
      t.trim.split("\\s+").length.toLong).toMap
    val want = ids.groupBy(find).map { case (_, members) =>
      val comp = members.min
      val kept = members.minBy(id => (-toks(id), id))
      comp -> (members.length.toLong, kept, toks(kept),
        members.length.toLong - 1)
    }
    val got = graft.ext.Curation.canonicalSelection.build(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got == want)
  }

  test("m07: cross-modal self-ranks reproduce from Scala md5 embeddings") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hexSlice(h: String, from: Int, len: Int) =
      h.substring(from - 1, from - 1 + len).foldLeft(0L)((a, c) =>
        a * 16 + Character.digit(c, 16))
    val texts = docs()
    val embs = texts.map { case (id, t) =>
      val m = md5hex(t); val mi = md5hex("img:" + t)
      val (ha, hb) = (hexSlice(m, 2, 15), hexSlice(m, 17, 14))
      val (hc, hd) = (hexSlice(mi, 2, 15), hexSlice(mi, 17, 14))
      id -> ((0 until 8).map(k => (ha + k * hb) % 255 - 127).toArray,
        (0 until 8).map(k => (ha + k * hb + (hc + k * hd) % 17) % 255 - 127)
          .toArray)
    }
    val ranks = (0L until 20L).map { q =>
      val tf = embs(q)._1
      val scored = embs.toSeq.map { case (id, (_, mf)) =>
        (id, tf.zip(mf).map { case (x, y) => x * y }.sum)
      }.sortBy { case (id, dot) => (-dot, id) }
      scored.indexWhere(_._1 == q) + 1L
    }
    val r = graft.ext.Multimodal.crossmodalRetrieval.build(spark, sf).head()
    assert(r.getLong(0) == 20)
    assert(r.getLong(1) == ranks.count(_ == 1))
    assert(r.getLong(2) == ranks.count(_ <= 5))
    // r12: exact e4 fixed-point mean (truncating DIV), name-addressed
    // (the e4 column precedes the derived double)
    val meanE4 = 10000L * ranks.sum / 20
    assert(r.getAs[Long]("mean_self_rank_e4") == meanE4)
    assert(r.getAs[Double]("mean_self_rank") == meanE4.toDouble / 10000.0)
  }

  test("x35: weighted-sample priorities reproduce from Scala md5 math") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = docs().toSeq.map { case (id, t) =>
      val h = md5hex(t).substring(1, 16).foldLeft(0L)((a, c) =>
        a * 16 + Character.digit(c, 16))
      val w = math.max(t.trim.split("\\s+").length.toLong, 1L)
      (id, h / w)
    }.sortBy { case (id, p) => (p, id) }.take(50)
    val got = graft.ext.Curation.weightedSample.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("priority")))
    assert(got.toSeq == want)
  }

  test("g10: landmark distances and harmonic sums reproduce from Scala BFS") {
    val off = 1000000000L
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1) + off))
    val adj = (li.map(e => e._1 -> e._2) ++ li.map(e => e._2 -> e._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = (1L to 3L).map { lm =>
      val seed = lm + off
      var dist = Map(seed -> 0L)
      var frontier = Set(seed)
      for (r <- 1 to 4) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty))
          .filterNot(dist.contains)
        dist ++= next.map(_ -> r.toLong)
        frontier = next
      }
      val reached = dist.filter(_._2 > 0)
      // r12: exact e6 fixed-point mean distance (truncating DIV)
      val meanE6 = 1000000L * reached.values.sum / reached.size
      lm -> (reached.size.toLong,
        reached.values.map(10000L / _).sum,
        reached.values.max,
        meanE6,
        meanE6.toDouble / 1000000.0)
    }.toMap
    val got = graft.ext.Graph.harmonicCentrality.build(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getAs[Long]("mean_dist_e6"), r.getAs[Double]("mean_dist"))).toMap
    assert(got == want)
  }

  test("x36: epoch permutations reproduce from Scala md5; epochs differ") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ids = docs().keySet
    val want = (0 until 2).flatMap { e =>
      val ordered = ids.toSeq.map(id => (md5hex(s"$e:$id"), id)).sorted
      val checksum = ordered.map { case (k, _) =>
        k.take(10).foldLeft(0L)((a, c) => a * 16 + Character.digit(c, 16))
      }.sum
      ordered.take(10).zipWithIndex.map { case ((k, id), i) =>
        (e, i + 1) -> (id, k, checksum)
      }
    }.toMap
    val got = graft.ext.Curation.epochShuffle.build(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getString(3), r.getLong(4))).toMap
    assert(got == want)
    // different epochs genuinely permute differently
    val e0 = got.filter(_._1._1 == 0).toSeq.sortBy(_._1._2).map(_._2._1)
    val e1 = got.filter(_._1._1 == 1).toSeq.sortBy(_._1._2).map(_._2._1)
    assert(e0 != e1)
  }

  test("g11: modularity pieces reproduce from labels + edge maps") {
    val off = 1000000000L
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1) + off))
    import spark.implicits._
    val e2 = (li ++ li.map(_.swap)).toSeq.toDF("u", "v")
    val labs = graft.ext.Graph.labelPropagate(e2, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = li.length.toLong
    val internal = li.filter { case (p, s_) => labs(p) == labs(s_) }
      .groupBy(x => labs(x._1)).view.mapValues(_.length.toLong).toMap
    val deg = (li.map(_._1) ++ li.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cells = labs.groupBy(_._2).map { case (c, members) =>
      val dsum = members.keys.toSeq.map(deg).sum
      val ec = internal.getOrElse(c, 0L)
      c -> (members.size.toLong, ec, dsum, 4 * m * ec - dsum * dsum)
    }
    val qScaled = cells.values.map(_._4).sum
    val q = round(qScaled.toDouble / (4.0 * m * m), 6)
    val got = graft.ext.Graph.modularity.build(spark, sf).collect()
    assert(got.length == math.min(cells.size, 10))
    got.foreach { r =>
      val c = r.getLong(0)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        == cells(c), s"community $c")
      assert(r.getLong(5) == qScaled)
      assert(math.abs(r.getDouble(6) - q) < 1e-9)
    }
    // a community partition of a connected dense graph: Q in [-0.5, 1)
    assert(q >= -0.5 && q < 1.0)
  }

  test("s10: greedy MMR selection reproduces from quantized vectors") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map { r =>
        val e = r.getSeq[Float](1).map(_.toDouble).toArray
        val n = math.sqrt(e.map(x => x * x).sum)
        // HALF_UP (away from zero), matching Spark/DuckDB round()
        r.getLong(0) -> e.map(x => BigDecimal(x / n * 127)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }.toMap
    def dot(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val q0 = vecs(0L)
    val pool = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, v, dot(q0, v)) }
      .sortBy { case (id, _, rel) => (-rel, id) }.take(8)
    var sel = List.empty[(Long, Long, Long)] // (id, rel, mmr)
    for (i <- 1 to 4) {
      val rem = pool.filterNot(p => sel.exists(_._1 == p._1))
      val scored = rem.map { case (id, v, rel) =>
        val mmr =
          if (sel.isEmpty) 7 * rel
          else 7 * rel - 3 * sel.map(s_ => dot(v, vecs(s_._1))).max
        (id, rel, mmr)
      }
      sel = sel :+ scored.minBy { case (id, _, mmr) => (-mmr, id) }
    }
    val got = graft.ext.Similarity.mmrRerank.build(spark, sf).collect()
      .map(r => (r.getAs[Int]("rank"), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toList == sel.zipWithIndex.map { case ((id, rel, mmr), i) =>
      (i + 1, id, rel, mmr) })
  }
}
