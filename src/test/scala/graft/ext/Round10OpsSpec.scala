package graft.ext

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.MlQueries

/** Round-10 operators: t25 bigram-LM perplexity filter, t26 Unicode
  * spoof scanner, g14 weakly-connected components, x40 blocklist
  * density gate, t27 TextRank, m08 shot-boundary detection, ml05
  * calibration bins, x41 curriculum order, m09 audio VAD, ml06
  * classifier metrics, x42 source overlap, t28 rule ablation. Each
  * op's oracle row is the hash-exact proof; these are the fixture-law
  * checks. */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sf = TestSpark.sf0001

  test("t25: scores exactly the odd half, lp sums negative, keep = ppl cut") {
    val rows = TextAnalysis.bigramPerplexity.build(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (docId, n, lpSum, ppl, keep) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getBoolean(5))
      assert(docId % 2 == 1, s"train doc leaked into scoring: $r")
      assert(n >= 1, r.toString)
      // every bigram prob is in (0, 1] => integerized log-probs <= 0
      assert(lpSum <= 0, r.toString)
      assert(ppl > 0.0, r.toString)
      // ppl = exp(-mean lp) restated from the emitted exact integers
      val expect = BigDecimal(math.exp(-lpSum.toDouble / (1e6 * n)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(ppl - expect) < 1e-9, s"$r vs $expect")
      assert(keep == (ppl <= 40.0), r.toString)
    }
  }

  test("t25: smoothed perplexity is bounded by the smoothing floor") {
    // add-one smoothing: p >= 1/(c(w1.)+V) >= 1/(maxCu+V), so ppl can
    // never exceed the per-language worst-case floor; a violation means
    // the join attached the wrong language's model
    val docs = graft.core.Tables.documents(spark, sf)
    val maxDenom = docs.filter("doc_id % 2 = 0")
      .selectExpr("lang", "explode(split(text, ' ')) AS tok")
      .filter("tok != ''")
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocab = docs.filter("doc_id % 2 = 0")
      .selectExpr("lang", "explode(split(text, ' ')) AS tok")
      .filter("tok != ''").distinct()
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    TextAnalysis.bigramPerplexity.build(spark, sf).collect().foreach { r =>
      val (lang, ppl) = (r.getString(1), r.getDouble(4))
      // c(w1.) <= total train tokens of the language
      val floor = maxDenom(lang) + vocab(lang)
      assert(ppl <= floor.toDouble, s"$r exceeds smoothing floor $floor")
    }
  }

  test("t26: taint classes and verdicts partition exactly by the md5 fold") {
    val folds = graft.core.Tables.documents(spark, sf)
      .selectExpr("doc_id",
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10) " +
          "AS BIGINT) % 8 AS h")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = TextAnalysis.confusableSpoof.build(spark, sf).collect()
    assert(rows.length == folds.size)
    var seen = Set.empty[String]
    rows.foreach { r =>
      val (docId, nZw, nBidi, nConfus, ppm, verdict) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getString(5))
      val h = folds(docId)
      seen += verdict
      // the bidi wrap is exactly two control chars, nothing else emits
      // bidi controls
      assert((verdict == "bidi") == (h == 3), s"$r h=$h")
      if (h == 3) assert(nBidi == 2, r.toString)
      if (verdict == "zerowidth") assert(h == 2 && nZw > 0, s"$r h=$h")
      if (verdict == "mixed_script") assert(h <= 1 && nConfus > 0, s"$r h=$h")
      if (verdict == "clean")
        assert(nZw + nBidi + nConfus == 0 && ppm == 0, r.toString)
      // any nonzero count is at least ~2000 ppm on <=500-char docs
      assert((ppm > 0) == (nZw + nBidi + nConfus > 0), r.toString)
    }
    assert(seen == Set("bidi", "zerowidth", "mixed_script", "clean"),
      s"fixture must exercise all verdicts, got $seen")
  }

  test("g14: histogram is self-consistent and giant share is exact ppm") {
    val rows = Graph.wcc.build(spark, sf).collect()
    assert(rows.nonEmpty)
    val nNodes = rows.head.getLong(2)
    val giant = rows.head.getLong(3)
    val giantPpm = rows.head.getLong(4)
    rows.foreach { r =>
      assert(r.getLong(2) == nNodes && r.getLong(3) == giant &&
        r.getLong(4) == giantPpm, "totals must be constant columns")
      // every component has >= 2 nodes: nodes only enter via edges
      assert(r.getLong(0) >= 2, r.toString)
    }
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum == nNodes)
    assert(rows.map(_.getLong(0)).max == giant)
    assert(giantPpm == giant * 1000000L / nNodes)
  }

  test("g14: support filter is a subset of the g02 edge set") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val parts = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val adjacent = parts
      .withColumn("u", lag("pk", 1).over(
        Window.partitionBy("ok").orderBy("pk")))
      .filter(col("u").isNotNull)
      .select(col("u"), col("pk").as("v"))
    val all = adjacent.distinct().count()
    val supported = adjacent.groupBy("u", "v").count()
      .filter(col("count") >= 2).count()
    assert(supported > 0, "fixture must have support-2 pairs")
    assert(supported < all, "support filter must actually drop edges")
  }

  test("x40: density is exact integer ppm and the gate splits the fixture") {
    val rows = Curation.blocklistGate.build(spark, sf).collect()
    val docs = graft.core.Tables.documents(spark, sf).count()
    assert(rows.length == docs, "every doc must get a verdict")
    rows.foreach { r =>
      val (n, h, ppm, keep) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))
      assert(h <= n, r.toString)
      assert(ppm == 1000000L * h / n, r.toString)
      assert(keep == (ppm <= 60000L), r.toString)
    }
    val kept = rows.count(_.getBoolean(4))
    assert(kept > 0 && kept < rows.length,
      s"gate must split the fixture, kept $kept/${rows.length}")
    // spot-check one doc's hit count against a direct token scan
    val probe = rows.maxBy(_.getLong(2))
    val direct = graft.core.Tables.documents(spark, sf)
      .filter(s"doc_id = ${probe.getLong(0)}")
      .selectExpr("explode(split(text, ' ')) AS tok")
      .filter("tok IN ('slow', 'dup', 'stale')").count()
    assert(direct == probe.getLong(2), s"$probe vs direct $direct")
  }

  test("t27: damping floor, descending order, and real-token closure") {
    val rows = TextAnalysis.textrank.build(spark, sf).collect()
    assert(rows.length == 25)
    val scores = rows.map(_.getLong(1))
    // s = 0.15*1e6 + 0.85*(nonnegative sum) >= the damping floor
    scores.foreach(s => assert(s >= 150000L, s.toString))
    assert(scores.sameElements(scores.sortBy(-_)), "must be sorted desc")
    // every keyword is a token that actually occurs in the corpus
    val vocab = graft.core.Tables.documents(spark, sf)
      .selectExpr("explode(split(text, ' ')) AS tok")
      .filter("tok != ''").distinct()
      .collect().map(_.getString(0)).toSet
    rows.foreach(r => assert(vocab(r.getString(0)), r.getString(0)))
    // centrality must discriminate: not all scores equal
    assert(scores.distinct.length > 1, "degenerate flat ranking")
  }

  test("m08: frame counts recomputed, cut accounting self-consistent") {
    val rows = Multimodal.shotBoundaries.build(spark, sf).collect()
    val expect = graft.core.Tables.documents(spark, sf)
      .selectExpr("doc_id", "CAST(length(text) DIV 64 AS INT) AS nf")
      .filter("nf > 0")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (id, nf, cuts, peak, first) = (r.getLong(0), r.getInt(1),
        r.getLong(2), r.getLong(3), r.getInt(4))
      assert(nf == expect(id), r.toString)
      assert(cuts <= math.max(nf - 1, 0), r.toString)
      assert(peak >= 0, r.toString)
      assert((first == -1) == (cuts == 0), r.toString)
      if (first != -1) assert(first >= 1 && first <= nf - 1, r.toString)
    }
    assert(rows.exists(_.getLong(2) > 0) && rows.exists(_.getLong(2) == 0),
      "fixture must exercise both cut and single-shot videos")
  }

  test("ml05: decile populations, score-ordered bins, monotone predicted rate") {
    val rows = Curation.calibrationBins.build(spark, sf).collect()
    assert(rows.length == 10)
    val docs = graft.core.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == docs)
    // ntile: populations differ by at most 1
    val ns = rows.map(_.getLong(1))
    assert(ns.max - ns.min <= 1, ns.mkString(","))
    // bins tile the score axis in order
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(2),
        s"bin overlap: ${a.getLong(3)} > ${b.getLong(2)}")
    }
    // predicted-positive rate is a step function of the score order
    val pred = rows.map(_.getDouble(6))
    pred.sliding(2).foreach { case Array(a, b) =>
      assert(a <= b + 1e-12, pred.mkString(","))
    }
    rows.foreach { r =>
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0, r.toString)
    }
  }

  test("x41: phase-major permutation with non-overlapping length phases") {
    val rows = Curation.curriculumOrder.build(spark, sf).collect()
    val n = rows.length
    assert(n == graft.core.Tables.documents(spark, sf).count())
    assert(rows.map(_.getLong(4)).toSet == (1L to n).toSet,
      "global_rank must be a permutation")
    val byPhase = rows.groupBy(_.getLong(2))
    assert(byPhase.keySet == Set(1L, 2L, 3L, 4L))
    byPhase.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(3)).toSet == (1L to rs.length).toSet)
    }
    // phases partition the length axis: max tokens of phase k <= min of k+1
    (1L to 3L).foreach { k =>
      val hi = byPhase(k).map(_.getLong(1)).max
      val lo = byPhase(k + 1).map(_.getLong(1)).min
      assert(hi <= lo, s"phase $k max $hi > phase ${k + 1} min $lo")
    }
    // within a phase the md5 shuffle must not be storage order
    val p1 = rows.filter(_.getLong(2) == 1L).sortBy(_.getLong(3))
      .map(_.getLong(0))
    assert(!p1.sameElements(p1.sorted), "phase order suspiciously sorted")
  }

  test("m09: segment accounting laws and agreement with m06/m08 framing") {
    val rows = Multimodal.audioVad.build(spark, sf).collect()
    val expect = graft.core.Tables.documents(spark, sf)
      .selectExpr("doc_id", "CAST(length(text) DIV 64 AS INT) AS nf")
      .filter("nf > 0")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (id, nf, na, ppm, nseg, longest, first) = (r.getLong(0),
        r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getInt(6))
      assert(nf == expect(id), r.toString)
      assert(na >= 0 && na <= nf, r.toString)
      assert(ppm == 1000000L * na / nf, r.toString)
      // islands laws: segments partition the active frames
      assert((nseg == 0) == (na == 0), r.toString)
      assert(longest <= na, r.toString)
      if (nseg > 0) {
        assert(longest >= (na + nseg - 1) / nseg, // ceil(mean) <= max
          r.toString)
        assert(first >= 0 && first <= nf - 1, r.toString)
      } else assert(first == -1, r.toString)
    }
    // threshold must discriminate: both active and silent frames exist
    val totAct = rows.map(_.getLong(2)).sum
    val totFr = rows.map(_.getInt(1).toLong).sum
    assert(totAct > 0 && totAct < totFr, s"$totAct/$totFr")
  }

  test("ml06: confusion closure and AUC recomputed pairwise") {
    val rows = Curation.classifierMetrics.build(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val (n, np, nn, tp, fp, tn, fn) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    assert(np + nn == n && tp + fn == np && fp + tn == nn)
    assert(math.abs(r.getDouble(7) -
      (if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp))) < 1e-6)
    assert(math.abs(r.getDouble(8) - tp.toDouble / np) < 1e-6)
    // AUC law: brute-force pairwise P(score_pos > score_neg) + ties/2
    val sc = Curation.prototypeScored(spark, sf)
      .select("label", "score").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val pos = sc.filter(_._1 == 1L).map(_._2)
    val neg = sc.filter(_._1 == 0L).map(_._2)
    val wins = (for (p <- pos; q <- neg)
      yield if (p > q) 2L else if (p == q) 1L else 0L).sum
    val aucExact = wins.toDouble / (2.0 * pos.length * neg.length)
    assert(math.abs(r.getDouble(10) - aucExact) < 1e-6,
      s"auc ${r.getDouble(10)} vs pairwise $aucExact")
    assert(r.getDouble(10) > 0.5, "prototype filter must beat chance")
  }

  test("x42: overlap symmetry-free pairs, jaccard bounds, self-consistency") {
    val rows = Curation.sourceOverlap.build(spark, sf).collect()
    assert(rows.nonEmpty, "fixture must have cross-source prefix overlap")
    rows.foreach { r =>
      val (a, b, na, nb, sh, j) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(a < b, s"pair not canonical: $r")
      assert(sh >= 1 && sh <= math.min(na, nb), r.toString)
      assert(j > 0.0 && j <= 1.0, r.toString)
      assert(math.abs(j - sh.toDouble / (na + nb - sh)) < 1e-6, r.toString)
    }
    // spot-check one pair's shared count against a direct recompute
    val (sa, sb) = (rows.head.getString(0), rows.head.getString(1))
    val direct = graft.core.Tables.documents(spark, sf)
      .selectExpr("source",
        "md5(array_join(slice(split(text, ' '), 1, 8), ' ')) AS fp")
      .filter(col("source").isin(sa, sb)).distinct()
      .groupBy("fp").count().filter("count = 2").count()
    assert(direct == rows.head.getLong(4), s"${rows.head} vs $direct")
  }

  test("t28: ablation counts consistent with the t22 per-doc report") {
    val rows = TextAnalysis.ruleAblation.build(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      TextAnalysis.gopherRuleNames.sorted)
    val t22 = TextAnalysis.gopherRules.build(spark, sf).collect()
    val n = t22.length
    val ruleIdx = TextAnalysis.gopherRuleNames
      .map(r => r -> t22.head.fieldIndex(r)).toMap
    rows.foreach { r =>
      val (rule, nd, nf, nu, fppm, uppm) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nd == n, r.toString)
      val i = ruleIdx(rule)
      val fails = t22.count(!_.getBoolean(i))
      val unique = t22.count(d => !d.getBoolean(i) &&
        TextAnalysis.gopherRuleNames.forall(o =>
          o == rule || d.getBoolean(ruleIdx(o))))
      assert(nf == fails, s"$rule: $nf vs direct $fails")
      assert(nu == unique, s"$rule: $nu vs direct $unique")
      assert(nu <= nf, r.toString)
      assert(fppm == 1000000L * nf / n && uppm == 1000000L * nu / n)
    }
    // the battery must be non-trivial on the fixture: some rule fails docs
    assert(rows.map(_.getLong(2)).sum > 0)
  }

  test("d19: chunks tile each doc exactly; boundaries recomputed by hand") {
    val rows = Dedup.cdcChunking.build(spark, sf).collect()
    val docs = graft.core.Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val (id, nc, mn, mx, tot, mean, dup, ppm) = (r.getLong(0),
        r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7))
      assert(tot == docs(id).length, s"chunks must tile doc $id")
      assert(mn >= 1 && mn <= mean && mean <= mx, r.toString)
      assert(dup >= 0 && dup <= nc, r.toString)
      assert(ppm == 1000000L * dup / nc, r.toString)
    }
    // hand-recompute one doc's CDC boundary count (gear = 8-char ascii
    // sum, cut at h % 64 == 0, final position always a boundary)
    val (pid, ptxt) = docs.minBy(_._1)
    val sums = ptxt.map(_.toInt)
    val hand = (8 to ptxt.length).count { i =>
      (i - 8 until i).map(sums).sum % 64 == 0
    }
    val nbHand = if (ptxt.length >= 8 &&
      (8 to ptxt.length).exists(i =>
        i == ptxt.length && (i - 8 until i).map(sums).sum % 64 == 0))
      hand else hand + 1
    assert(rows.find(_.getLong(0) == pid).get.getLong(1) == nbHand,
      s"doc $pid: engine chunks vs hand $nbHand")
    // the self-synchronizing census must find cross-doc chunks on a
    // fixture that d12 already proved has repeated long spans
    assert(rows.map(_.getLong(6)).sum > 0, "no shared chunks found")
  }

  test("t29: novelty accounting laws and census cross-check") {
    val rows = TextAnalysis.ngramNovelty.build(spark, sf).collect()
    val n = graft.core.Tables.documents(spark, sf).count()
    assert(rows.length == n)
    rows.foreach { r =>
      val (ng, sh, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(sh >= 0 && sh <= ng, r.toString)
      if (ng > 0) assert(ppm == 1000000L * (ng - sh) / ng, r.toString)
      else assert(ppm == -1L, r.toString)
    }
    // census law: Σ n_grams over docs == distinct (doc, gram) pairs
    val pairs = graft.core.Tables.documents(spark, sf)
      .selectExpr("doc_id", "split(text, ' ') AS t")
      .selectExpr("doc_id",
        "explode(IF(size(t) >= 8, array_distinct(transform(" +
          "sequence(0, size(t) - 8), w -> md5(concat_ws(' ', " +
          "slice(t, w + 1, 8))))), CAST(array() AS ARRAY<STRING>))) AS g")
      .count()
    assert(rows.map(_.getLong(1)).sum == pairs)
    // the fixture's repeated spans must make some doc non-novel
    assert(rows.exists(_.getLong(2) > 0), "no shared grams found")
  }

  test("m10: entropy bounds and one tile recomputed with exact rounding") {
    val rows = Multimodal.tileEntropy.build(spark, sf).collect()
    assert(rows.nonEmpty)
    val ln64 = math.round(math.log(64) * 1e6)
    rows.foreach { r =>
      val (mn, mean, mx) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(mn >= 0 && mn <= mean && mean <= mx && mx <= ln64, r.toString)
    }
    // recompute doc 0 tile 0 entropy with the integerization contract
    val txt = graft.core.Tables.documents(spark, sf)
      .filter("doc_id = 0").selectExpr("text").collect().head.getString(0)
    val t0 = txt.substring(0, 64)
    val terms = t0.distinct.map { ch =>
      val c = t0.count(_ == ch)
      math.round(c * math.log(c) * 1e6)
    }.sum
    val hand = ln64 - terms / 64
    val minEnt = rows.find(_.getLong(0) == 0L).get
    assert(minEnt.getLong(2) <= hand && hand <= minEnt.getLong(4),
      s"hand tile-0 entropy $hand outside [min,max] of doc 0: $minEnt")
  }

  test("x43: shares sum to ~1e6, totals recomputed, imbalance law") {
    val rows = Curation.shardSkew.build(spark, sf).collect()
    assert(rows.length <= 32 && rows.nonEmpty)
    val nDocs = rows.map(_.getLong(1)).sum
    assert(nDocs == graft.core.Tables.documents(spark, sf).count())
    val docShare = rows.map(_.getLong(4)).sum
    assert(docShare <= 1000000L && docShare >= 1000000L - 32,
      s"floor-ppm shares must sum to within 32 of 1e6: $docShare")
    val tTok = rows.map(_.getLong(2)).sum
    val maxTok = rows.map(_.getLong(2)).max
    rows.foreach { r =>
      assert(r.getLong(6) == 1000000L * 32 * maxTok / tTok, r.toString)
      assert(r.getLong(5) == 1000000L * r.getLong(2) / tTok, r.toString)
    }
    // a balanced md5 sharding must not be pathologically skewed
    assert(rows.head.getLong(6) < 3000000L, "md5 sharding 3x+ skewed?")
  }

  test("s15: ndcg bounds, perfect-ranking law, one query hand-graded") {
    val rows = Similarity.ndcgEval.build(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    val ex = Similarity.cosineTopK.build(spark, sf)
      .select("q_id", "n_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val ap = Similarity.annIvfPinned.build(spark, sf)
      .select("q_id", "n_id", "rn").collect()
    val disc = (1 to 5).map(p =>
      p -> math.round(1e6 / (math.log(p + 1) / math.log(2)))).toMap
    val idcg = (1 to 5).map(p => (6 - p) * disc(p)).sum
    val handDcg = ap.groupBy(_.getLong(0)).map { case (q, rs) =>
      q -> rs.map { r =>
        val rel = 6L - ex.getOrElse((q, r.getLong(1)), 6)
        (if (rel > 0) rel else 0L) * disc(r.getInt(2))
      }.sum
    }
    rows.foreach { r =>
      assert(r.getLong(1) == handDcg(r.getLong(0)),
        s"dcg mismatch for q ${r.getLong(0)}")
      val expected = BigDecimal(r.getLong(1).toDouble / idcg)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(2) - expected) < 1e-9, r.toString)
      // an index that returns the exact top-5 in exact order scores 1.0
      val perfect = (1 to 5).forall { p =>
        ap.exists(a => a.getLong(0) == r.getLong(0) && a.getInt(2) == p &&
          ex.get((a.getLong(0), a.getLong(1))).contains(p))
      }
      if (perfect) assert(r.getDouble(2) == 1.0, s"perfect q not 1.0: $r")
    }
  }

  test("ml07: nested budgets grow, eval fixed, rmse equals brute force") {
    val rows = MlQueries.learningCurve.build(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 4, 8))
    val nTrain = rows.map(_.getLong(1))
    assert(nTrain.sliding(2).forall { case Array(a, b) => a < b },
      "nested subsets must grow strictly on this fixture")
    // brute-force recompute per budget from the raw rows
    val raw = graft.core.Tables.orders(spark, sf)
      .selectExpr(
        "CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 10), 16, 10) AS BIGINT) % 10 AS b",
        "CAST(month(o_orderdate) AS BIGINT) AS x",
        "CAST(floor(o_totalprice / 100e0) AS BIGINT) AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ev = raw.filter(_._1 >= 8)
    rows.foreach { r =>
      val k = r.getInt(0)
      val tr = raw.filter(_._1 < k)
      assert(r.getLong(1) == tr.length)
      val (n, sx, sy) = (tr.length.toDouble,
        tr.map(_._2).sum.toDouble, tr.map(_._3).sum.toDouble)
      val sxy = tr.map(t => t._2 * t._3).sum.toDouble
      val sxx = tr.map(t => t._2 * t._2).sum.toDouble
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      val sse = ev.map(t => math.pow(t._3 - icept - slope * t._2, 2)).sum
      val rmse = math.sqrt(sse / ev.length)
      assert(math.abs(r.getDouble(2) - slope) < 1e-5, s"slope k=$k")
      assert(math.abs(r.getDouble(4) - rmse) < 1e-5,
        s"rmse k=$k: ${r.getDouble(4)} vs brute $rmse")
    }
  }

  test("ml08: full matrix, per-train-row constant fit, rmse equals brute force") {
    val rows = MlQueries.transferMatrix.build(spark, sf).collect()
    val langs = graft.core.Tables.documents(spark, sf)
      .select("lang").distinct().collect().map(_.getString(0)).sorted
    assert(rows.length == langs.length * langs.length)
    // the fit depends only on train_lang: constant slope/intercept per row-block
    rows.groupBy(_.getString(0)).foreach { case (tl, rs) =>
      assert(rs.map(_.getDouble(3)).distinct.length == 1, s"slope varies in $tl")
      assert(rs.map(_.getDouble(4)).distinct.length == 1, s"icept varies in $tl")
    }
    // brute-force one off-diagonal cell
    val raw = graft.core.Tables.documents(spark, sf)
      .selectExpr("lang", "CAST(size(split(text, ' ')) AS BIGINT) AS x",
        "CAST(n_chars AS BIGINT) AS y")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (tl, el) = (langs.head, langs.last)
    val tr = raw.filter(_._1 == tl)
    val ev = raw.filter(_._1 == el)
    val (n, sx, sy) = (tr.length.toDouble,
      tr.map(_._2).sum.toDouble, tr.map(_._3).sum.toDouble)
    val sxy = tr.map(t => t._2 * t._3).sum.toDouble
    val sxx = tr.map(t => t._2 * t._2).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    val rmse = math.sqrt(
      ev.map(t => math.pow(t._3 - icept - slope * t._2, 2)).sum / ev.length)
    val cell = rows.find(r =>
      r.getString(0) == tl && r.getString(1) == el).get
    assert(cell.getLong(2) == ev.length)
    assert(math.abs(cell.getDouble(5) - rmse) < 1e-5,
      s"rmse $tl->$el: ${cell.getDouble(5)} vs brute $rmse")
  }

  test("s16: top-5 per query, feedback docs excluded, scores descend") {
    val rows = Similarity.rocchioFeedback.build(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to 5), s"ranks q=$q")
      val scores = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(scores.sliding(2).forall { case Array(a, b) => a >= b },
        s"scores not descending q=$q")
    }
    // round-1 top-3 (s01's exact machinery, k=3) must be absent from the
    // round-2 result — the residual-collection convention
    val fb = Similarity.cosineTopK.build(spark, sf).collect()
      .filter(_.getInt(3) <= 3)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      assert(!fb.contains((r.getLong(0), r.getLong(1))),
        s"feedback doc leaked into round-2 result: $r")
      assert(r.getLong(0) != r.getLong(1), s"self-match: $r")
    }
  }

  test("m11: per-source counts partition, reject accounting bounds hold") {
    val rows = Multimodal.qualityGate.build(spark, sf).collect()
    val total = graft.core.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val (n, nPass) = (r.getLong(1), r.getLong(2))
      val bads = Seq(r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      // docs failing >=1 gate: at least the largest single-gate count,
      // at most the sum (a doc can fail several gates)
      assert(n - nPass >= bads.max, r.toString)
      assert(n - nPass <= bads.sum, r.toString)
      val expectRate = BigDecimal(nPass.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(7) - expectRate) < 1e-9, r.toString)
    }
  }

  test("ml09: LOFO importances non-negative, full model beats both submodels") {
    val rows = MlQueries.lofoImportance.build(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("n_distinct_tokens", "n_tokens"))
    val rmseFull = rows.head.getDouble(2)
    rows.foreach { r =>
      assert(r.getDouble(2) == rmseFull, "rmse_full differs between rows")
      // OLS law: adding a regressor never increases in-sample SSE
      assert(r.getDouble(3) >= r.getDouble(2) - 1e-9, r.toString)
      assert(r.getDouble(4) >= -1e-9, s"negative importance: $r")
    }
    // brute-force the full 2-feature fit via driver-side normal equations
    val raw = graft.core.Tables.documents(spark, sf)
      .selectExpr("CAST(size(split(text, ' ')) AS DOUBLE) AS x1",
        "CAST(size(array_distinct(split(text, ' '))) AS DOUBLE) AS x2",
        "CAST(n_chars AS DOUBLE) AS y")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    val n = raw.length.toDouble
    val (s1, s2, sy) = (raw.map(_._1).sum, raw.map(_._2).sum, raw.map(_._3).sum)
    val c11 = n * raw.map(t => t._1 * t._1).sum - s1 * s1
    val c22 = n * raw.map(t => t._2 * t._2).sum - s2 * s2
    val c12 = n * raw.map(t => t._1 * t._2).sum - s1 * s2
    val c1y = n * raw.map(t => t._1 * t._3).sum - s1 * sy
    val c2y = n * raw.map(t => t._2 * t._3).sum - s2 * sy
    val det = c11 * c22 - c12 * c12
    val b1 = (c22 * c1y - c12 * c2y) / det
    val b2 = (c11 * c2y - c12 * c1y) / det
    val a = (sy - b1 * s1 - b2 * s2) / n
    val rmse = math.sqrt(
      raw.map(t => math.pow(t._3 - a - b1 * t._1 - b2 * t._2, 2)).sum / n)
    assert(math.abs(rmseFull - rmse) < 1e-5, s"$rmseFull vs brute $rmse")
    val coef1 = rows.find(_.getString(0) == "n_tokens").get.getDouble(1)
    assert(math.abs(coef1 - b1) < 1e-5, s"$coef1 vs brute $b1")
  }

  test("q54: filled values equal the user's most recent surviving reading") {
    val rows = graft.queries.Relational.q54.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(rows.nonEmpty)
    // dropout rule: exactly the event_id % 5 == 3 rows are nulled
    rows.foreach { case (id, _, _, raw, _) =>
      assert(raw.isEmpty == (id % 5 == 3), s"dropout rule broken at $id")
    }
    // per user in (ts, event_id) order: filled == last surviving value
    rows.groupBy(_._2).foreach { case (_, rs) =>
      var lastSeen: Option[Double] = None
      rs.sortBy(r => (r._3, r._1)).foreach { case (id, _, _, raw, filled) =>
        if (raw.isDefined) lastSeen = raw
        assert(filled == lastSeen, s"LOCF broken at event $id")
      }
    }
  }

  test("ml10: arm partition, brute-force Welch t for one type, verdict law") {
    val rows = MlQueries.abWelch.build(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalByType = graft.core.Tables.events(spark, sf)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length == totalByType.size)
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == totalByType(r.getString(0)),
        s"arms do not partition: $r")
      assert(r.getBoolean(7) == (math.abs(r.getDouble(5)) > 1.96), r.toString)
    }
    // brute-force one type end to end (same md5 arm rule, driver floats)
    val t0 = rows.head.getString(0)
    val evs = graft.core.Tables.events(spark, sf)
      .filter(col("event_type") === t0)
      .selectExpr(
        "CAST(conv(substring(md5(CAST(event_id AS STRING)), 2, 15), 16, 10) AS BIGINT) % 2 AS arm",
        "CAST(round(value * 100) AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def stats(arm: Long) = {
      val cs = evs.filter(_._1 == arm).map(_._2.toDouble / 100.0)
      val n = cs.length.toDouble
      val m = cs.sum / n
      val v = cs.map(x => (x - m) * (x - m)).sum / (n - 1.0)
      (n, m, v)
    }
    val ((na, ma, va), (nb, mb, vb)) = (stats(0), stats(1))
    val t = (ma - mb) / math.sqrt(va / na + vb / nb)
    val r0 = rows.head
    assert(math.abs(r0.getDouble(3) - ma) < 1e-6, s"mean_a: $r0 vs $ma")
    assert(math.abs(r0.getDouble(5) - t) < 1e-4, s"t: $r0 vs $t")
  }

  test("g15: sweeps anchor at one source, frontier laws, sweep-1 brute-forced") {
    val rows = Graph.diameterSweep.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    Seq(1L, 2L).foreach { sw =>
      val h = rows.filter(_._1 == sw)
      assert(h.exists(r => r._2 == 0 && r._3 == 1),
        s"sweep $sw must start from exactly one source: ${h.mkString(",")}")
      assert(h.forall(r => r._2 >= 0 && r._2 <= 4), h.mkString(","))
      assert(h.forall(_._3 > 0), h.mkString(","))
    }
    // brute-force sweep 1 with a driver BFS from the min node id
    val li = graft.core.Tables.lineitem(spark, sf)
      .selectExpr("l_partkey AS p", "l_suppkey + 1000000000 AS sup")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (li.map(e => e._1 -> e._2) ++ li.map(e => e._2 -> e._1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val src = adj.keys.min
    var dist = Map(src -> 0L)
    var frontier = Set(src)
    for (h <- 1 to 4) {
      frontier = frontier.flatMap(adj(_)).filterNot(dist.contains)
      dist ++= frontier.map(_ -> h.toLong)
      }
    val expect = dist.values.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = rows.filter(_._1 == 1).map(r => r._2 -> r._3).toMap
    assert(got == expect, s"sweep-1 histogram: $got vs brute $expect")
  }

  test("t30: fertility laws and per-lang type counts cross-checked") {
    val rows = TextAnalysis.bpeFertility.build(spark, sf).collect()
    assert(rows.nonEmpty)
    val typesPerLang = graft.core.Tables.documents(spark, sf)
      .selectExpr("lang", "explode(split(text, ' ')) AS w")
      .filter("w RLIKE '^[a-z]+$'")
      .select("lang", "w").distinct()
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (lang, nTypes, nWords, nPieces, fert) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))
      assert(nTypes == typesPerLang(lang), s"type count: $r")
      // every word emits >= 1 piece; 8 merges cannot push a word below 1
      assert(nPieces >= nWords, r.toString)
      assert(fert >= 1.0, r.toString)
      val expect = BigDecimal(nPieces.toDouble / nWords)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(fert - expect) < 1e-9, r.toString)
    }
  }

  test("ml11: moments brute-forced for one type, CUPED variance law") {
    val rows = MlQueries.cupedReadout.build(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (vp, va, pct) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(va <= vp + 1e-9, s"adjusted variance must not exceed raw: $r")
      assert(pct >= 0.0 && pct <= 100.0, r.toString)
      // var_adjusted == var_post * (1 - pct/100) up to rounding: pct
      // carries 4 decimals, so the bound scales with var_post
      assert(math.abs(va - vp * (1.0 - pct / 100.0)) < vp * 1e-6 + 1e-3,
        r.toString)
    }
    // brute-force one event_type with driver doubles
    val t0 = rows.head.getString(0)
    val per = graft.core.Tables.events(spark, sf)
      .filter(col("event_type") === t0)
      .selectExpr("user_id",
        "CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN CAST(round(value*100) AS BIGINT) ELSE 0 END AS x",
        "CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN CAST(round(value*100) AS BIGINT) ELSE 0 END AS y")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.sum("x").as("x"),
        org.apache.spark.sql.functions.sum("y").as("y"))
      .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
    val n = per.length.toDouble
    val (mx, my) = (per.map(_._1).sum / n, per.map(_._2).sum / n)
    val cov = per.map { case (x, y) => (x - mx) * (y - my) }.sum / (n - 1)
    val vx = per.map { case (x, _) => (x - mx) * (x - mx) }.sum / (n - 1)
    val vy = per.map { case (_, y) => (y - my) * (y - my) }.sum / (n - 1)
    val r0 = rows.head
    assert(r0.getLong(1) == per.length, s"n_users: $r0 vs ${per.length}")
    assert(math.abs(r0.getDouble(3) - cov / vx) < 1e-4,
      s"theta: $r0 vs ${cov / vx}")
    assert(math.abs(r0.getDouble(4) - vy / 10000.0) < 1e-3,
      s"var_post: $r0 vs ${vy / 10000.0}")
    val r2 = cov * cov / (vx * vy)
    assert(math.abs(r0.getDouble(6) - 100.0 * r2) < 1e-2, s"r2: $r0 vs $r2")
  }

  test("x45: water-filling laws — budget exhausted, caps respected, " +
      "capped set is the ascending prefix") {
    val rows = Curation.unimaxAllocation.build(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    val b = rows.map(_._2).sum.toDouble // budget = total corpus tokens
    // allocations sum to the budget (water level fills it exactly)
    assert(math.abs(rows.map(_._5).sum - b) < 1e-2 * b,
      s"sum alloc ${rows.map(_._5).sum} vs budget $b")
    rows.foreach { case (lang, n, cap, capped, alloc, w, ep) =>
      assert(cap == 3 * n, s"$lang")
      assert(alloc <= cap + 1e-6, s"$lang: alloc $alloc over cap $cap")
      assert(ep <= 3.0 + 1e-6 && ep > 0.0, s"$lang epochs $ep")
      assert(math.abs(w - alloc / b) < 1e-4, s"$lang weight")
      if (capped) assert(math.abs(alloc - cap) < 1e-6, s"$lang capped")
    }
    // capped set = ascending-cap prefix; all uncapped share one level
    val sorted = rows.sortBy(r => (r._3, r._1))
    val firstUncapped = sorted.indexWhere(!_._4)
    if (firstUncapped >= 0) {
      assert(sorted.drop(firstUncapped).forall(!_._4), "capped not a prefix")
      val levels = sorted.drop(firstUncapped).map(_._5).distinct
      assert(levels.length == 1, s"uncapped levels differ: $levels")
      // water level at or above every capped cap
      sorted.take(firstUncapped).foreach { r =>
        assert(r._3 <= levels.head + 1e-6, s"capped above water: $r") }
    }
  }

  test("s17: cell census partitions the corpus; health scalars match") {
    val rows = Similarity.ivfBalance.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val nCorpus = graft.core.Tables.embeddings(spark, sf).count()
    assert(rows.map(_._2).sum == nCorpus, "cells must partition the corpus")
    val k = rows.length.toLong
    val maxN = rows.map(_._2).max
    val sumsq = rows.map(n => n._2 * n._2).sum
    rows.foreach { case (_, n, share, imb, bf, sf2) =>
      assert(math.abs(share - n.toDouble / nCorpus) < 1e-6)
      assert(math.abs(imb - n.toDouble * k / nCorpus) < 1e-6)
      assert(math.abs(bf - maxN.toDouble * k / nCorpus) < 1e-6)
      assert(math.abs(sf2 - sumsq.toDouble / (nCorpus.toDouble * nCorpus)) < 1e-6)
      assert(sf2 >= 1.0 / k - 1e-9, "scan_frac below the balanced floor")
    }
  }

  test("ml12: confusion rows partition the held half; one doc's argmax " +
      "brute-forced") {
    val rows = MlQueries.naiveBayes.build(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.core.Tables.documents(spark, sf)
    val heldPerLang = docs.filter("doc_id % 2 = 1")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = rows.groupBy(_.getString(0))
    byLang.foreach { case (lang, rs) =>
      assert(rs.map(_.getLong(2)).sum == heldPerLang(lang),
        s"$lang rows do not partition the held docs")
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-4,
        s"$lang shares do not sum to 1")
    }
    // brute-force one held doc end to end with driver doubles-free math
    val train = docs.filter("doc_id % 2 = 0")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cnt = scala.collection.mutable.Map[(String, String), Long]()
    train.foreach { case (l, txt) =>
      txt.split(" ").filter(_.nonEmpty).foreach { w =>
        cnt((l, w)) = cnt.getOrElse((l, w), 0L) + 1 } }
    val tPer = cnt.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
    val v = cnt.keys.map(_._2).toSet.size.toLong
    val ndPer = train.groupBy(_._1).map { case (l, xs) => l -> xs.length }
    val ndt = train.length.toDouble
    val doc0 = docs.filter("doc_id % 2 = 1").orderBy("doc_id")
      .select("doc_id", "text").limit(1).collect().head
    val toks = doc0.getString(1).split(" ").filter(_.nonEmpty)
    val scores = tPer.keys.map { cand =>
      val prior = math.round(math.log(ndPer(cand) / ndt) * 1e6)
      val ll = toks.map { w =>
        math.round(math.log((cnt.getOrElse((cand, w), 0L) + 1.0) /
          (tPer(cand) + v).toDouble) * 1e6) }.sum
      cand -> (ll + prior)
    }.toSeq
    val want = scores.sortBy { case (c, sc) => (-sc, c) }.head._1
    // replay the query's per-doc prediction for doc0 via its pipeline
    // (group the registered output is confusion-level, so recompute the
    // argmax with the same SQL shape and compare)
    import org.apache.spark.sql.functions._
    val docLang = docs.filter(col("doc_id") === doc0.getLong(0))
      .select("lang").collect().head.getString(0)
    val got = rows.filter(r => r.getString(0) == docLang)
    assert(got.map(_.getString(1)).contains(want),
      s"brute-force winner $want has no confusion cell under $docLang")
  }

  test("t31: JSD bounded in [0, ln 2], token census partitions, " +
      "one source brute-forced") {
    val rows = TextAnalysis.jsDivergence.build(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val ln2 = math.log(2.0)
    rows.foreach { case (src, nTok, vUsed, e12, nats, bits) =>
      assert(e12 >= 0 && nats <= ln2 + 1e-9, s"$src out of [0, ln2]")
      assert(math.abs(bits - nats / ln2) < 1e-8, s"$src bits law")
      assert(vUsed >= 1 && vUsed <= nTok, s"$src vocab bounds")
    }
    // census partition: per-source token totals sum to the corpus total
    val docs = graft.core.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val censusBrute = scala.collection.mutable.Map[(String, String), Long]()
    docs.foreach { case (s0, txt) =>
      txt.split(" ").filter(_.nonEmpty).foreach { w =>
        censusBrute((s0, w)) = censusBrute.getOrElse((s0, w), 0L) + 1 } }
    val totBrute = censusBrute.values.sum
    assert(rows.map(_._2).sum == totBrute, "token census must partition")
    // brute-force one source's JSD with driver doubles
    val src0 = rows.head._1
    val corpus = censusBrute.groupBy(_._1._2)
      .map { case (w, m) => w -> m.values.sum }
    val tS = censusBrute.filter(_._1._1 == src0).values.sum
    val t = totBrute
    val v = corpus.size.toLong
    val sum = corpus.map { case (w, nt) =>
      val n = censusBrute.getOrElse((src0, w), 0L)
      val p = (n + 1.0) / (tS + v)
      val q = (nt + 1.0) / (t + v)
      math.round((p * math.log(2.0 * p / (p + q)) +
        q * math.log(2.0 * q / (p + q))) * 5e11)
    }.sum
    assert(sum == rows.head._4, s"$src0 jsd_e12: got ${rows.head._4} want $sum")
  }

  test("g16: projection symmetric, pair accounting exact, one supplier " +
      "brute-forced") {
    val rows = Graph.bipartiteProjection.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (sup, np, wSum, wMax, meanE6) =>
      assert(np >= 1 && wMax >= 1 && wSum >= wMax, s"$sup bounds")
      assert(meanE6 == (1000000L * wSum) / np, s"$sup mean law")
    }
    // brute force the full projection from the edge list
    val ps = graft.core.Tables.lineitem(spark, sf)
      .selectExpr("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byPart = ps.groupBy(_._1).map { case (_, es) => es.map(_._2).sorted }
    val w = scala.collection.mutable.Map[(Long, Long), Long]()
    byPart.foreach { sups =>
      for (i <- sups.indices; j <- i + 1 until sups.length)
        w((sups(i), sups(j))) = w.getOrElse((sups(i), sups(j)), 0L) + 1 }
    // Σ n_partners double-counts each unordered pair once per side
    assert(rows.map(_._2).sum == 2L * w.size, "pair accounting")
    val sup0 = rows.head._1
    val mine = w.collect {
      case ((a, b), ww) if a == sup0 || b == sup0 => ww }.toSeq
    assert(rows.head._2 == mine.length && rows.head._3 == mine.sum &&
      rows.head._4 == mine.max, s"supplier $sup0 brute-force mismatch")
  }

  test("st18: hourly rollup consistent with raw events and 5-min buckets") {
    val rows = graft.stream.Events.windowRollupQ.build(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val n = graft.core.Tables.events(spark, sf).count()
    assert(rows.map(_._3).sum == n, "hourly n_events must partition events")
    rows.foreach { case (w0, et, ne, peak, nb) =>
      assert(nb >= 1 && nb <= 12, s"$w0/$et bucket count")
      assert(peak >= (ne + nb - 1) / nb && peak <= ne,
        s"$w0/$et peak bounds")
    }
    // hourly totals equal st16's shared hourly stage
    val hourly = graft.stream.Events.typeCounts(
      graft.core.Tables.events(spark, sf)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach { case (w0, et, ne, _, _) =>
      assert(hourly((w0, et)) == ne, s"$w0/$et vs typeCounts") }
  }

  test("x46: weights near-partition the unit, excess law, one source's " +
      "entropy brute-forced") {
    val rows = Curation.doremiStep.build(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val k = rows.length
    val wSum = rows.map(_._6).sum
    // integer floors lose < 2e-6 per source on each of the two DIVs
    assert(wSum <= 1.0 + 1e-9 && wSum >= 1.0 - 4e-6 * k, s"w sum $wSum")
    rows.foreach { case (src, nTok, h, ex, w0, w, tgt) =>
      assert(ex >= 0, s"$src excess")
      assert(w >= 0.01 / k - 2e-6, s"$src under the uniform floor")
      assert(tgt <= 1000000L, s"$src target")
      assert(h > 0 && nTok > 0 && w0 > 0, s"$src positives")
    }
    // brute-force one source's pico-nat entropy
    val src0 = rows.head._1
    val census = scala.collection.mutable.Map[String, Long]()
    graft.core.Tables.documents(spark, sf)
      .filter(col("source") === src0).select("text").collect()
      .foreach(r => r.getString(0).split(" ").filter(_.nonEmpty)
        .foreach(w => census(w) = census.getOrElse(w, 0L) + 1))
    val tS = census.values.sum
    val h0 = census.values.map { n =>
      val p = n.toDouble / tS
      math.round(-p * math.log(p) * 1e12)
    }.sum
    assert(rows.head._2 == tS && rows.head._3 == h0,
      s"$src0 entropy: got (${rows.head._2}, ${rows.head._3}) want ($tS, $h0)")
  }

  test("ml13: CI brackets sanely, exact mean law, one replicate's " +
      "Poisson weights brute-forced") {
    val rows = MlQueries.poissonBootstrap.build(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val exact = graft.core.Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, xs) =>
        t -> (xs.length.toLong, xs.map(_._2).sum) }
    rows.foreach { case (t, n, mean, lo, hi, w) =>
      val (nB, sB) = exact(t)
      assert(n == nB, s"$t n")
      val want = BigDecimal(sB.toDouble / (100.0 * nB))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(mean - want) < 1e-9, s"$t mean $mean vs $want")
      // ci_width rounds the UNrounded hi−lo, so vs rounded endpoints it
      // can differ by up to one ulp at 10⁻⁶ on each side
      assert(lo <= hi && math.abs(w - (hi - lo)) < 2e-6, s"$t CI")
      assert(lo <= mean + 0.5 && hi >= mean - 0.5, s"$t CI far from mean")
    }
    // brute-force replicate 7's weighted mean for one type with the
    // same md5 → 60-bit uniform → Poisson inverse-CDF rule
    val thr = Seq(424136118829305344L, 848272237658610688L,
      1060340297073263360L, 1131029650211480960L, 1148701988496035328L,
      1152236456152946176L, 1152825534095764608L, 1152909688087595776L)
    val t0 = rows.head._1
    val evs = graft.core.Tables.events(spark, sf)
      .filter(col("event_type") === t0)
      .selectExpr("event_id", "CAST(round(value * 100) AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def u60(s0: String): Long = {
      val hex = md.digest(s0.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(1, 16), 16)
    }
    var nw = 0L; var sw = 0L
    evs.foreach { case (id, c) =>
      val u = u60(s"$id:7")
      val w = thr.indexWhere(u < _) match { case -1 => 8L; case k0 => k0.toLong }
      nw += w; sw += w * c
    }
    val repMean = sw.toDouble / (100.0 * nw)
    // the replicate mean must lie within the FULL replicate range;
    // rebuild the rank-2/rank-31 bracket from all 32 replicate means
    val all = (0 until 32).map { rep =>
      var n0 = 0L; var s0 = 0L
      evs.foreach { case (id, c) =>
        val u = u60(s"$id:$rep")
        val w = thr.indexWhere(u < _) match { case -1 => 8L; case k0 => k0.toLong }
        n0 += w; s0 += w * c }
      s0.toDouble / (100.0 * n0)
    }.sorted
    assert(all.contains(repMean), "driver md5 disagrees with itself")
    val (wantLo, wantHi) = (
      BigDecimal(all(1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(all(30)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val got = rows.head
    assert(math.abs(got._4 - wantLo) < 1e-9 && math.abs(got._5 - wantHi) < 1e-9,
      s"$t0 CI: got (${got._4}, ${got._5}) want ($wantLo, $wantHi)")
  }

  test("m12: frame accounting laws; full census brute-forced") {
    val rows = Multimodal.frameDedup.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nf, nd, nh, ppm) =>
      assert(nf >= 1 && nd >= 0 && nd <= nf && nh <= nd, s"doc $id bounds")
      assert(ppm == (1000000L * nd) / nf, s"doc $id ppm law")
    }
    // brute-force the whole frame census in the driver
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val owners = scala.collection.mutable.Map[String, Set[Long]]()
    val frames = docs.map { case (id, txt) =>
      val fs = (0 until txt.length / 64)
        .map(i => txt.substring(i * 64, i * 64 + 64))
      fs.foreach(f => owners(f) = owners.getOrElse(f, Set.empty) + id)
      id -> fs
    }.toMap
    rows.foreach { case (id, nf, nd, nh, _) =>
      val fs = frames(id)
      assert(nf == fs.length, s"doc $id n_frames")
      val dup = fs.filter(f => owners(f).size > 1)
      assert(nd == dup.length, s"doc $id n_dup_frames")
      assert(nh == dup.toSet.size, s"doc $id n_dup_hashes")
    }
  }

  test("s18: subspace SSE brute-forced against the s06 codebook") {
    val rows = Similarity.pqDistortion.build(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(0, 1, 2, 3))
    val u = Dedup.normalized(spark, sf, "id", "u").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val n = u.length.toLong
    rows.foreach { case (j, nv, sse, mse) =>
      assert(nv == n, s"subspace $j n_vecs")
      assert(sse >= 0 && mse >= 0, s"subspace $j non-negative")
      assert(math.abs(mse - BigDecimal(sse.toDouble / (1e12 * n))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12,
        s"subspace $j mse law")
    }
    val cb = u.filter(_._1 < 16).sortBy(_._1).map(_._2)
    (0 until 4).foreach { j =>
      val sse = u.map { case (_, vec) =>
        val sub = vec.slice(j * 16, j * 16 + 16)
        val dmin = cb.map { c =>
          val cs = c.slice(j * 16, j * 16 + 16)
          var acc = 0.0
          var i = 0
          while (i < 16) {
            val dxy = sub(i) - cs(i); acc += dxy * dxy; i += 1 }
          acc
        }.min
        math.round(dmin * 1e12)
      }.sum
      assert(rows(j)._3 == sse, s"subspace $j sse: got ${rows(j)._3} want $sse")
    }
  }

  test("t32: OOV accounting brute-forced against a driver-built top-V") {
    val rows = TextAnalysis.vocabOov.build(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val census = scala.collection.mutable.Map[(String, String), Long]()
    graft.core.Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .foreach { r =>
        r.getString(1).split(" ").filter(_.nonEmpty).foreach { w =>
          census((r.getString(0), w)) =
            census.getOrElse((r.getString(0), w), 0L) + 1 } }
    val byTok = census.groupBy(_._1._2)
      .map { case (w, m) => w -> m.values.sum }
    val vocab = byTok.toSeq.sortBy { case (w, n) => (-n, w) }
      .take(1000).map(_._1).toSet
    rows.foreach { case (lang, nTok, nOov, nTy, nOovTy, ppm, typePpm) =>
      val mine = census.filter(_._1._1 == lang)
      assert(nTok == mine.values.sum, s"$lang n_tokens")
      assert(nOov == mine.collect {
        case ((_, w), n) if !vocab(w) => n }.sum, s"$lang n_oov")
      assert(nTy == mine.size, s"$lang n_types")
      assert(nOovTy == mine.keys.count(k => !vocab(k._2)), s"$lang oov types")
      assert(ppm == (1000000L * nOov) / nTok, s"$lang ppm law")
      assert(typePpm == (1000000L * nOovTy) / nTy, s"$lang type ppm law")
    }
  }

  test("ml14: bins partition events, IV total law, one bin's WoE " +
      "brute-forced") {
    val rows = MlQueries.woeIv.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val n = graft.core.Tables.events(spark, sf).count()
    assert(rows.map(r => r._2 + r._3).sum == n, "bins must partition")
    assert(rows.map(_._6).distinct.length == 1, "iv_total constant")
    assert(rows.head._6 == rows.map(_._5).sum, "iv_total = Σ terms")
    val p = rows.map(_._2).sum.toDouble
    val nn = rows.map(_._3).sum.toDouble
    rows.foreach { case (bin, np, ng, woe, term, _) =>
      assert(bin >= 0 && bin <= 9, s"bin $bin range")
      val wantWoe = math.round(math.log(
        ((np + 0.5) / p) / ((ng + 0.5) / nn)) * 1e6)
      assert(woe == wantWoe, s"bin $bin woe: got $woe want $wantWoe")
      val wantTerm = math.round(
        (((np + 0.5) / p) - ((ng + 0.5) / nn)) * (woe / 1e6) * 1e9)
      assert(term == wantTerm, s"bin $bin iv term")
      // separating bins agree in sign with their share imbalance
      if (np / p > (ng + 1) / nn) assert(woe > 0, s"bin $bin sign")
    }
  }

  test("x47: sample is a deterministic md5-selected subset of d04's " +
      "pairs with stable slots") {
    val sample = Curation.pairAuditSample.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val pairs = Dedup.ngramJaccard.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sample.nonEmpty && pairs.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    def u60(s0: String): Long = java.lang.Long.parseLong(
      md.digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(1, 16), 16)
    sample.foreach { case (a, b, j, slot) =>
      assert(pairs.contains((a, b)), s"($a,$b) not a d04 pair")
      assert(pairs((a, b)) == j, s"($a,$b) jaccard drifted")
      val u = u60(s"$a:$b")
      assert(u < (1L << 58), s"($a,$b) outside the 25% band")
      assert(slot == u % 4, s"($a,$b) slot")
    }
    // completeness: every in-band pair IS sampled
    val want = pairs.keys.filter { case (a, b) =>
      u60(s"$a:$b") < (1L << 58) }.toSet
    assert(sample.map(s => (s._1, s._2)).toSet == want,
      "sample must contain exactly the in-band pairs")
  }

  test("d20: planted clones recovered at theta=20, sweep monotone, " +
      "parent pairs verified") {
    val rows = Dedup.dedupEval.build(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.map(_._1).toSeq == Seq(20, 40, 60), rows.mkString(","))
    val nPlanted = graft.core.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.expr(
        s"${Dedup.sparkMd5Int60("CAST(doc_id AS STRING)")} % 4 = 0"))
      .count()
    rows.foreach { case (th, np, tp, fp, fn, prec, rec) =>
      assert(np == nPlanted, s"theta $th n_planted")
      assert(tp + fn == np, s"theta $th tp+fn")
      assert(prec == 1000000L * tp / math.max(tp + fp, 1), s"theta $th prec")
      assert(rec == 1000000L * tp / np, s"theta $th recall")
    }
    // tp/fp can only shrink as theta rises
    assert(rows.sliding(2).forall(w => w(1)._3 <= w(0)._3 &&
      w(1)._4 <= w(0)._4), "sweep not monotone")
    // a 20% tail cut keeps ~3/4 of the word 3-grams: at theta=20 the
    // detector must recover essentially every planted clone
    assert(rows.head._3 >= (nPlanted * 9) / 10,
      s"theta=20 recall too low: ${rows.head}")
  }

  test("ml15: KS numerator brute-forced; critical-value law") {
    val rows = MlQueries.ksTest.build(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val (na, nb, dNum, d, dCrit, reject) =
      (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4),
        r.getDouble(5), r.getBoolean(6))
    val evs = graft.core.Tables.events(spark, sf)
      .selectExpr("CAST(round(value * 100) AS BIGINT) AS c",
        "event_type = 'error' AS isa").collect()
      .map(x => (x.getLong(0), x.getBoolean(1)))
    val as = evs.filter(_._2).map(_._1).sorted
    val bs = evs.filterNot(_._2).map(_._1).sorted
    assert(na == as.length && nb == bs.length)
    val dom = (as ++ bs).distinct.sorted
    val want = dom.map { c =>
      val ca = as.count(_ <= c).toLong
      val cb = bs.count(_ <= c).toLong
      math.abs(ca * nb - cb * na)
    }.max
    assert(dNum == want, s"d_num: got $dNum want $want")
    assert(math.abs(d - dNum.toDouble / (na.toDouble * nb)) < 1e-9)
    val crit = 1.358 * math.sqrt((na + nb).toDouble / (na.toDouble * nb))
    assert(math.abs(dCrit - crit) < 1e-9)
    assert(reject == (dNum.toDouble > crit * na.toDouble * nb))
  }

  test("x48: groups partition customers; verdict and distinct-band laws") {
    val rows = Curation.lDiversity.build(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    val cust = graft.core.Tables.customer(spark, sf)
      .selectExpr("c_nationkey", "c_mktsegment",
        "CAST(round(c_acctbal * 100) AS BIGINT) DIV 100000 AS band")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._3).sum == cust.length, "groups must partition")
    rows.foreach { case (nk, seg, n, ns, ok) =>
      val mine = cust.filter(c => c._1 == nk && c._2 == seg)
      assert(n == mine.length && ns == mine.map(_._3).distinct.length,
        s"($nk,$seg) counts")
      assert(ns >= 1 && ns <= n && ok == (ns >= 3), s"($nk,$seg) verdict")
    }
  }

  test("x49: every planted doc flags; cohorts partition the train set") {
    val rows = Curation.decontaminationDrill.build(spark, sf).collect()
      .map(r => (r.getBoolean(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.map(_._1).toSeq.sorted == Seq(false, true))
    val planted = rows.find(_._1).get
    val clean = rows.find(!_._1).get
    assert(planted._3 == planted._2 && planted._5,
      s"drill must catch every plant: $planted")
    assert(clean._3 < clean._2, s"organic baseline flags everything: $clean")
    // cohort sizes match the md5 rules on the fixture
    val docs = graft.core.Tables.documents(spark, sf)
      .selectExpr("doc_id",
        "substring(md5(CAST(doc_id AS STRING)), 1, 1) AS hx",
        "substring(md5(CAST(doc_id AS STRING)), 2, 1) AS hx2")
      .collect().map(r => (r.getString(1), r.getString(2)))
      .filter(x => x._1 != "0" && x._1 != "1")
    assert(planted._2 == docs.count(_._2 == "0"), "planted cohort size")
    assert(clean._2 == docs.count(_._2 != "0"), "clean cohort size")
  }

  test("ml16: TOST verdict laws; one type's t statistics brute-forced") {
    val rows = MlQueries.tostEquivalence.build(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getBoolean(7)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, na, nb, diff, se, tLo, tHi, eq) =>
      assert(se > 0 && tLo > tHi, s"$t ordering")
      assert(eq == (tLo > 1.645 && tHi < -1.645), s"$t verdict")
      assert(math.abs((tLo - tHi) - 2 * 0.5 / se) < 1e-4,
        s"$t margin law: ${(tLo - tHi) * se} vs 1.0")
    }
    // brute-force one type with driver doubles (ml10's discipline)
    val t0 = rows.head._1
    val evs = graft.core.Tables.events(spark, sf)
      .filter(col("event_type") === t0)
      .selectExpr(
        "CAST(conv(substring(md5(CAST(event_id AS STRING)), 2, 15), 16, 10) AS BIGINT) % 2 AS arm",
        "CAST(round(value * 100) AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def stats(arm: Long) = {
      val cs = evs.filter(_._1 == arm).map(_._2.toDouble / 100.0)
      val n = cs.length.toDouble
      val m = cs.sum / n
      (n, m, cs.map(x => (x - m) * (x - m)).sum / (n - 1.0))
    }
    val ((na, ma, va), (nb, mb, vb)) = (stats(0), stats(1))
    val se = math.sqrt(va / na + vb / nb)
    val r0 = rows.head
    assert(math.abs(r0._4 - (ma - mb)) < 1e-5, s"diff: $r0 vs ${ma - mb}")
    assert(math.abs(r0._6 - (ma - mb + 0.5) / se) < 1e-3, s"t_lower: $r0")
  }

  test("s19: migration matrix partitions the corpus; one vector's " +
      "double assignment brute-forced") {
    val rows = Similarity.reindexChurn.build(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val u = Dedup.normalized(spark, sf, "id", "u").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val n = u.length.toLong
    assert(rows.map(_._3).sum == n, "matrix must partition the corpus")
    rows.foreach { case (o, c2, cnt, ppm) =>
      assert(o >= 0 && o < 16 && c2 >= 0 && c2 < 16, s"cid range ($o,$c2)")
      assert(ppm == 1000000L * cnt / n, s"share law ($o,$c2)")
    }
    def assign(vec: Array[Double], cb: Array[Array[Double]]): Int =
      cb.zipWithIndex.map { case (c, i) =>
        var acc = 0.0; var k = 0
        while (k < vec.length) {
          val dd = vec(k) - c(k); acc += dd * dd; k += 1 }
        (acc, i)
      }.minBy(x => (x._1, x._2))._2
    val cb1 = u.filter(_._1 < 16).sortBy(_._1).map(_._2)
    val cb2 = u.filter(x => x._1 >= 16 && x._1 < 32).sortBy(_._1).map(_._2)
    // brute-force ten vectors spread across the corpus
    u.sortBy(_._1).zipWithIndex.filter(_._2 % (u.length / 10 + 1) == 0)
      .foreach { case ((id, vec), _) =>
        val (o, c2) = (assign(vec, cb1), assign(vec, cb2))
        assert(rows.exists(r => r._1 == o && r._2 == c2 && r._3 > 0),
          s"vector $id maps to an absent matrix cell ($o,$c2)")
      }
  }

  test("x44: cluster accounting is consistent with d07's components") {
    val rows = Curation.dupClusterStats.build(spark, sf).collect()
    val d07 = Dedup.components.build(spark, sf).collect()
      .map(r => r.getLong(1)) // n_members per component
    val expect = d07.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.map(_.getLong(0)).toSet == expect.keySet)
    rows.foreach { r =>
      val (size, nCl, nDocs, rmDocs, rmChars) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(size >= 2, s"singleton cluster reported: $r")
      assert(nCl == expect(size), s"cluster count mismatch: $r")
      assert(nDocs == size * nCl, r.toString)
      assert(rmDocs == nDocs - nCl, r.toString)
      assert(rmChars > 0, r.toString)
    }
  }
}
