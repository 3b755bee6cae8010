package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fingerprint is the documented rolling hash and is deterministic") {
    def rollingHash(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    val df = Seq((1L, "hello world"), (2L, "hello world"), (3L, "x"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("tmp_docs")
    val got = df.selectExpr("doc_id",
      "aggregate(split(text, ''), 0L, (acc, ch) -> (acc * 31 + ascii(ch)) % 1000000007) AS fp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == rollingHash("hello world"))
    assert(got(1L) == got(2L))
    assert(got(3L) == 'x'.toInt)
  }

  test("t07 exact TF-IDF: linear-idf identity, top-5 bound, independent df") {
    import org.apache.spark.sql.functions._
    val sf = graft.TestSpark.sf0001
    val out = TextAnalysis.tfidfExact.build(spark, sf).collect()
    assert(out.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val n = docs.count()
    // tfidf must be EXACTLY (tf·n_docs)/df — one integer product, one
    // IEEE division, bit-for-bit (this is what makes the DuckDB oracle
    // hash-exact)
    out.foreach { r =>
      val tf = r.getAs[Long]("tf"); val dfc = r.getAs[Long]("df")
      assert(r.getAs[Double]("tfidf") == (tf * n).toDouble / dfc)
    }
    val perDoc = out.groupBy(_.getAs[Long]("doc_id"))
    assert(perDoc.values.forall(_.length <= 5))
    assert(perDoc.size > 1)
    // independently recompute df for one emitted (doc, token) row
    val r0 = out.head
    val tok = r0.getAs[String]("token")
    val indep = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") === tok).select("doc_id").distinct().count()
    assert(r0.getAs[Long]("df") == indep)
  }

  test("t09 hapax attribution conserves the df=1 token count") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val out = TextAnalysis.hapaxRatio.build(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // direct corpus-side count of tokens with document frequency 1
    val dfreq = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .groupBy("tok").agg(countDistinct("doc_id").as("df"))
    val nHapaxTotal = dfreq.filter(col("df") === 1).count()
    assert(out.map(_.getAs[Long]("n_hapax")).sum == nHapaxTotal)
    // per-row invariants: 0 <= n_hapax <= n_distinct, exact ratio
    assert(out.forall { r =>
      val h = r.getAs[Long]("n_hapax"); val d = r.getAs[Long]("n_distinct")
      h >= 0 && h <= d &&
        r.getAs[Double]("hapax_ratio") == h.toDouble / d
    })
    // one row per document
    assert(out.length == docs.count())
  }

  test("t10 commonness: exact means on planted dup/near-dup/unrelated docs") {
    // 20-token base => 18 shingles; near-dup edits token 18 => the 3
    // shingles covering it differ; unrelated shares nothing.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val nearDup = base.replace("sigma", "sigmoid")
    val unrelated = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen"
    val docs = Seq((0L, base), (1L, base), (2L, nearDup), (3L, unrelated))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gramCommonnessOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Double]("mean_df"))).toMap
    // base docs: 15 shingles shared by 3 docs + 3 shared by the 2 copies
    assert(out(0L) == ((18L, (15 * 3 + 3 * 2) / 18.0)))
    assert(out(1L) == out(0L)) // identical texts score identically
    // near-dup: 15 shared with both copies + 3 unique
    assert(out(2L) == ((18L, (15 * 3 + 3 * 1) / 18.0)))
    // unrelated 16-token doc: 14 shingles, all df=1 => floor of 1.0
    assert(out(3L) == ((14L, 1.0)))
    // floor + ordering: commonness ranks dup copies above near-dup above unique
    assert(out(0L)._2 > out(2L)._2 && out(2L)._2 > out(3L)._2)
  }

  test("t11 fluency: exact fixed-point means; repetition outscores novelty") {
    // model over both docs: c(a,b)=4, c(b,a)=2, c(b,c)=1; c(a·)=4, c(b·)=3
    // p_fp(a,b)=1e9, p_fp(b,a)=2e9 DIV 3, p_fp(b,c)=1e9 DIV 3
    val docs = Seq((0L, "a b a b a b"), (1L, "a b c"), (2L, "z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramFluencyOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_p"),
          r.getAs[Double]("fluency"))).toMap
    val pba = 2000000000L / 3  // 666666666
    val pbc = 1000000000L / 3  // 333333333
    assert(out(0L) == ((5L, 3L * 1000000000L + 2 * pba,
      (3L * 1000000000L + 2 * pba) / 5.0)))
    assert(out(1L) == ((2L, 1000000000L + pbc, (1000000000L + pbc) / 2.0)))
    assert(!out.contains(2L)) // single-token doc has no transitions
    assert(out(0L)._3 > out(1L)._3) // repeated transitions score higher
  }

  test("t12 encoding gate: planted dirt counted exactly, clean docs untouched") {
    val sf = graft.TestSpark.sf0001
    val out = TextAnalysis.encodingQuality.build(spark, sf).collect()
    assert(out.nonEmpty)
    // the plant rule: first md5 hex digit of doc_id < '4' (~25%)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source",
        "substring(md5(CAST(doc_id AS STRING)), 1, 1) < '4' AS dirty")
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.expr("CAST(dirty AS LONG)")).as("n_dirty"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val expected = docs(r.getAs[String]("source"))
      // trailer plants exactly one U+FFFD, one BEL, one 'Ã' per dirty doc
      assert(r.getAs[Long]("n_dirty") == expected, r.toString)
      assert(r.getAs[Long]("sum_repl") == expected, r.toString)
      assert(r.getAs[Long]("sum_ctrl") == expected, r.toString)
      assert(r.getAs[Long]("sum_moji") == expected, r.toString)
    }
  }

  test("NA replacement is idempotent (reference P8 net semantics)") {
    val df = Seq(("NA", "1"), ("5", "NA"), ("7", "8")).toDF("a", "b")
    val once = df.na.replace(df.columns, Map("NA" -> null))
    val twice = once.na.replace(df.columns, Map("NA" -> null))
    assert(once.collect().toSeq == twice.collect().toSeq)
    assert(once.filter("a IS NULL").count() == 1)
  }

  test("unknown-category fill matches reference value set") {
    val vals = Seq("Unknow", "None", "", " ", null, "keepme")
    val df = vals.map(Tuple1(_)).toDF("c")
    val out = df.na.fill("unknown", Seq("c"))
      .na.replace(Seq("c"), Map("Unknow" -> "unknown", "None" -> "unknown",
        "" -> "unknown", " " -> "unknown"))
      .collect().map(_.getString(0))
    assert(out.count(_ == "unknown") == 5)
    assert(out.contains("keepme"))
  }

  test("t14 domain classify: argmax with repetition, alphabetical tiebreak, 'other' fallback") {
    val docs = Seq(
      (0L, "scan join filter novel"), // compute 3
      (1L, "table table row scan"), // storage 3 beats compute 1
      (2L, "novel words only here"), // no lexicon hit -> other, score 0
      (3L, "scan table"), // 1-1 tie -> compute (alphabetical)
      (4L, "stream stream stream scan scan")) // repetition: streaming 3 > compute 2
      .toDF("doc_id", "text")
    val out = TextAnalysis.classifyDomains(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("domain"), r.getAs[Long]("score")))).toMap
    assert(out(0L) == (("compute", 3L)))
    assert(out(1L) == (("storage", 3L)))
    assert(out(2L) == (("other", 0L)))
    assert(out(3L) == (("compute", 1L)))
    assert(out(4L) == (("streaming", 3L)))
  }

  test("t14 lexicons are disjoint (a token votes for at most one domain)") {
    val all = TextAnalysis.domainLexicons.flatMap(_._2)
    assert(all.distinct.length == all.length)
  }

  test("t15 vocab: contiguous ids in (count desc, token) order; ppm conserves the corpus") {
    val r = TextAnalysis.vocabBuild.build(spark, TestSpark.sf0001).collect()
    assert(r.map(_.getAs[Long]("token_id")).toSeq == r.indices.map(_.toLong))
    val ranked = r.map(x => (x.getAs[Long]("n"), x.getAs[String]("token")))
    assert(ranked.sortBy { case (n, t) => (-n, t) }.toSeq == ranked.toSeq)
    // fixture vocab is under the cap, so the table IS the whole corpus:
    // truncated ppm sums to within |vocab| of exactly 1e6
    val ppmSum = r.map(_.getAs[Long]("ppm")).sum
    assert(ppmSum <= 1000000L && ppmSum > 1000000L - r.length)
    // df can never exceed n or the doc count
    val nDocs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet").count()
    assert(r.forall(x => x.getAs[Long]("df") <= x.getAs[Long]("n") &&
      x.getAs[Long]("df") <= nDocs))
  }
}
