package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-9 operators: g12 clustering coefficient, d18 normalized exact
  * dedup, s12 kNN classification, t23 Zipf fit, st16 window anomaly.
  * Each op's oracle row is the hash-exact proof; these are the planted
  * -fixture law checks. */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sf = TestSpark.sf0001

  test("g12: K4 nodes are fully clustered (cc_ppm = 10^6), path nodes at 0") {
    // K4 on {1,2,3,4}: every node has deg 3 and sits in 3 triangles →
    // cc = 2·3/(3·2) = 1; pendant path 4-5-6 adds deg-2 node 5 with no
    // triangle → cc = 0
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val e = und.toDF("u", "v")
    val tri = Graph.triangleCounts(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(n => tri(n) == 3L), tri.toString)
    assert(!tri.contains(5L) && !tri.contains(6L), tri.toString)
    // the registered query's integer coefficient on the same numbers:
    // node 4 has deg 4 (K4 + pendant) → 2·3·10⁶ DIV (4·3) = 500000
    assert(2L * 3L * 1000000L / (3L * 2L) == 1000000L)
    assert(2L * 3L * 1000000L / (4L * 3L) == 500000L)
  }

  test("g12 on fixture: coefficients bounded, triangles within wedge count") {
    val rows = Graph.clusteringCoefficient.build(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (deg, tri, cc) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(deg >= 2, r.toString)
      assert(tri <= deg * (deg - 1) / 2, r.toString)
      assert(cc >= 0 && cc <= 1000000, r.toString)
      assert(cc == 2 * tri * 1000000 / (deg * (deg - 1)), r.toString)
    }
  }

  test("d18: case/punctuation/whitespace variants collapse into one group") {
    val docs = Seq(
      (1L, "Hello,  World!"),
      (2L, "hello world"),
      (3L, "HELLO ... world"),
      (4L, "goodbye world")).toDF("doc_id", "text")
    val norm = docs.selectExpr("doc_id",
      raw"trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''), ' +', ' ')) AS norm")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(norm(1L) == "hello world" && norm(2L) == "hello world" &&
      norm(3L) == "hello world", norm.toString)
    assert(norm(4L) == "goodbye world")
  }

  test("d18 on fixture: groups partition the corpus, survivors are minima") {
    val rows = Dedup.normalizedExact.build(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == total)
    // canonical ids strictly increasing (orderBy + min-survivor)
    val ids = rows.map(_.getLong(0))
    assert(ids.sameElements(ids.sorted))
  }

  test("s12: every panel vector evaluated once, accuracy is the integer ratio") {
    val rows = Similarity.knnClassify.build(spark, sf).collect()
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter("vec_id < 100").count()
    assert(rows.map(_.getLong(1)).sum == nVecs)
    rows.foreach { r =>
      val (nEval, nCorrect, acc) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nCorrect <= nEval, r.toString)
      assert(acc == 1000000L * nCorrect / nEval, r.toString)
    }
  }

  test("t23: every source's fitted slope is negative (freq falls with rank)") {
    val rows = TextAnalysis.zipfFit.build(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 2, r.toString) // enough ranks to fit
      assert(r.getDouble(2) < 0.0, r.toString)
    }
  }

  test("g13: coefficient matches the collapsed integer identity, in [-1, 1]") {
    val r = Graph.assortativity.build(spark, sf).collect()
    assert(r.length == 1)
    val (m, sjk, sj, sjj, a) = (r(0).getLong(0), r(0).getLong(1),
      r(0).getLong(2), r(0).getLong(3), r(0).getDouble(4))
    // the double-product form the query computes (integer products
    // overflow a long at probe scale — (Σj)² alone reaches ~10²⁰)
    val expect = BigDecimal(
      (m.toDouble * sjk.toDouble - sj.toDouble * sj.toDouble) /
        (m.toDouble * sjj.toDouble - sj.toDouble * sj.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(a == expect, r(0).toString)
    assert(a >= -1.0 && a <= 1.0, r(0).toString)
    // the symmetric-edge-list collapse on a hand-run star K1,3:
    // directed edges (3,1)x3 + (1,3)x3 -> r = (6*18-144)/(6*30-144) = -1
    assert((6 * 18 - 144).toDouble / (6 * 30 - 144) == -1.0)
  }

  test("t24: moments are consistent and VMR is the exact rational") {
    val rows = TextAnalysis.tokenBurstiness.build(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val ss = rows.map(_.getLong(2))
    assert(ss.sameElements(ss.sorted.reverse)) // ordered by total desc
    rows.foreach { r =>
      val (df, s1, q, n) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
      assert(n == nDocs, r.toString)
      assert(df <= n && s1 >= df && q >= s1, r.toString)
      // r12: full-precision VMR from dec2d-split 128-bit integers
      // (fixture values < 2^53, so plain double division is the same)
      val expect = (n * q - s1 * s1).toDouble / (n * s1).toDouble
      assert(r.getDouble(5) == expect, r.toString)
    }
  }

  test("x38: suppression below k, noise bounded, true counts never released") {
    val rows = Curation.dpRelease.build(spark, sf).collect()
    val truth = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet
      == truth.keySet)
    // |Laplace^-1(u)| <= b * ln(2^40) for the 40-bit uniform grid
    val maxNoise = math.ceil(2.0 * 40 * math.log(2.0)).toLong
    rows.foreach { r =>
      val t = truth((r.getString(0), r.getString(1)))
      if (r.getBoolean(3)) {
        assert(t < 20 && r.isNullAt(2), r.toString)
      } else {
        assert(t >= 20 && !r.isNullAt(2), r.toString)
        val noisy = r.getLong(2)
        assert(noisy >= 0 && math.abs(noisy - t) <= maxNoise, r.toString)
      }
    }
    // the schema itself must not leak: only the four released columns
    assert(rows.head.schema.fieldNames.toSeq ==
      Seq("lang", "source", "noisy_docs", "suppressed"))
  }

  test("s13: recall is monotone in nprobe, bounded, over the fixed sweep") {
    val rows = Similarity.nprobeSweep.build(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 4, 8))
    val recalls = rows.map(_.getDouble(3))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      recalls.mkString(","))
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, r.toString)
      assert(r.getLong(2) <= 5 * r.getLong(1), r.toString)
    }
  }

  test("x39: PSI terms non-negative, buckets partition both snapshots, " +
    "total and verdict consistent") {
    val rows = Curation.psiDrift.build(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(rows.map(_.getLong(1)).sum ==
      docs.filter("doc_id % 2 = 0").count())
    assert(rows.map(_.getLong(2)).sum ==
      docs.filter("doc_id % 2 = 1").count())
    // each (p−q)·ln(p/q) term has matching signs → never negative
    rows.foreach(r => assert(r.getLong(3) >= 0, r.toString))
    val psiE9 = rows.map(_.getLong(3)).sum
    val expectTotal = BigDecimal(psiE9.toDouble / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val verdict =
      if (psiE9 < 100000000L) "stable"
      else if (psiE9 < 250000000L) "moderate" else "shifted"
    rows.foreach { r =>
      assert(r.getDouble(4) == expectTotal, r.toString)
      assert(r.getString(5) == verdict, r.toString)
    }
  }

  test("s14: every mined negative carries a different label, ranked by cosine") {
    val rows = Similarity.hardNegatives.build(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(1) != r.getInt(3), r.toString))
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      assert(g.map(_.getInt(5)).sorted.sameElements(1 to g.length))
      val cs = g.sortBy(_.getInt(5)).map(_.getDouble(4))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, cs.mkString(","))
    }
  }

  test("ml04: folds partition orders, summary matches the integerized slopes") {
    val rows = graft.queries.MlQueries.cvSlopeStability.build(spark, sf)
      .collect()
    assert(rows.map(_.getLong(0)).toSet == (0L until 5L).toSet)
    val nOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nOrders)
    val e6s = rows.map(_.getLong(3))
    val mean = BigDecimal(e6s.sum.toDouble / 5e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val spread = BigDecimal((e6s.max - e6s.min).toDouble / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      assert(r.getDouble(4) == mean, r.toString)
      assert(r.getDouble(5) == spread, r.toString)
      assert(r.getLong(3) == BigDecimal(r.getDouble(2) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong, r.toString)
    }
  }

  test("x39: identical snapshot halves give PSI exactly 0 / 'stable'") {
    // planted corpus: doc 2k and 2k+1 share n_chars, so the even/odd
    // halves have identical length distributions bucket for bucket —
    // every (p−q)·ln(p/q) term must be EXACTLY 0, not merely small
    val dir = java.nio.file.Files.createTempDirectory("x39law").toString
    val docs = (0L until 200L)
      .map(i => (i, s"t$i", "en", "s0", 50L + (i / 2) % 37))
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Curation.psiDrift.build(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), r.toString)
      assert(r.getLong(3) == 0L, r.toString)
      assert(r.getDouble(4) == 0.0, r.toString)
      assert(r.getString(5) == "stable", r.toString)
    }
  }

  test("st16: flags exactly the windows failing the integer 2-sigma test") {
    val rows = graft.stream.Events.windowAnomalyQ.build(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(1))
    byType.foreach { case (_, ws) =>
      val ns = ws.map(_.getLong(2))
      val w = ns.length.toLong
      val s1 = ns.sum
      val q = ns.map(n => n * n).sum
      ws.foreach { r =>
        val n = r.getLong(2)
        assert(r.getLong(3) == w, r.toString)
        assert(r.getLong(4) == s1, r.toString)
        val dev = w * n - s1
        assert(r.getLong(5) == dev, r.toString)
        val expect = dev * dev > 4 * (w * q - s1 * s1)
        assert(r.getBoolean(6) == expect, r.toString)
      }
    }
  }
}
