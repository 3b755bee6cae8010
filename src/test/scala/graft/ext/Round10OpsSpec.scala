package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-10 operators: t25 bigram-LM perplexity filter, t26 Unicode
  * spoof scanner, g14 weakly-connected components. Each op's oracle
  * row is the hash-exact proof; these are the fixture-law checks. */
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
}
