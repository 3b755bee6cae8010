package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ChunkWindowsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def viaGenerator(docs: org.apache.spark.sql.DataFrame,
      w: Int, s: Int): org.apache.spark.sql.DataFrame = {
    ChunkWindows.register(spark)
    docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), expr(s"chunk_windows(t, $w, $s)"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("ct")).cast("long").as("n_tok"),
        concat_ws(" ", col("ct")).as("chunk_text"))
  }

  test("generator output equals the HOF chunker on every length class") {
    val words = (1 to 80).map(i => s"w$i")
    val docs = Seq(
      (0L, words.mkString(" ")), // multiple full chunks
      (1L, words.take(33).mkString(" ")), // final short chunk
      (2L, "a b c"), // shorter than one window
      (3L, words.take(9).mkString(" "))) // exactly one stride + overlap edge
      .toDF("doc_id", "text")
    for ((w, s) <- Seq((32, 24), (8, 8), (8, 3), (5, 1))) {
      val hof = graft.ext.Curation.chunkByTokens(docs, w, s)
        .orderBy("doc_id", "chunk_idx").collect().toSeq
      val gen = viaGenerator(docs, w, s)
        .orderBy("doc_id", "chunk_idx").collect().toSeq
      assert(gen == hof, s"window=$w stride=$s")
    }
  }

  test("null token array generates no rows (explode-of-NULL semantics)") {
    ChunkWindows.register(spark)
    val out = Seq((0L, Some("a b c")), (1L, None))
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), expr("chunk_windows(t, 4, 2)"))
      .collect()
    assert(out.map(_.getLong(0)).toSet == Set(0L))
  }

  test("usable from the SQL front-end via LATERAL VIEW") {
    ChunkWindows.register(spark)
    Seq((7L, "x y z u v w")).toDF("doc_id", "text")
      .createOrReplaceTempView("cw_docs")
    val r = spark.sql(
      """SELECT doc_id, chunk_idx, start_tok, ct
         FROM cw_docs
         LATERAL VIEW chunk_windows(split(text, ' '), 4, 2) c
         ORDER BY chunk_idx""").collect()
    assert(r.map(x => (x.getLong(1), x.getLong(2))).toSeq ==
      Seq((0L, 0L), (1L, 2L)))
    assert(r.last.getSeq[String](3) == Seq("z", "u", "v", "w"))
  }

  test("non-literal window is rejected at analysis, not silently computed") {
    ChunkWindows.register(spark)
    val err = intercept[Exception] {
      Seq((0L, "a b")).toDF("doc_id", "text")
        .select(expr("chunk_windows(split(text, ' '), CAST(doc_id AS INT), 1)"))
        .collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal") ||
      err.getMessage.toLowerCase.contains("foldable"), err.getMessage)
  }

  test("seeded sweep: both chunker paths match a plain-Scala reference on random lengths") {
    // independent reference implementation of the offset rule
    def reference(tokens: Seq[String], w: Int, s: Int): Seq[(Long, Long, Seq[String])] = {
      val n = tokens.length
      val lastStart = math.max(math.ceil((n - w).toDouble / s).toInt, 0)
      (0 to lastStart).map(i =>
        (i.toLong, (i * s).toLong, tokens.slice(i * s, i * s + w)))
    }
    val rnd = new scala.util.Random(20260813)
    val lens = Seq(0, 1, 2) ++ Seq.fill(40)(rnd.nextInt(120) + 1)
    val docs = lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(j => s"t$j").mkString(" "))
    }.toDF("doc_id", "text")
    val tokensOf = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    for ((w, s) <- Seq((32, 24), (16, 16), (7, 3), (4, 1), (50, 13))) {
      for (path <- Seq("hof", "generator")) {
        val out = (if (path == "hof")
          graft.ext.Curation.chunkByTokens(docs, w, s)
        else viaGenerator(docs, w, s))
          .orderBy("doc_id", "chunk_idx").collect()
          .groupBy(_.getAs[Long]("doc_id")).view
          .mapValues(_.map(r => (r.getAs[Long]("chunk_idx"),
            r.getAs[Long]("start_tok"),
            r.getAs[String]("chunk_text").split(" ", -1).toSeq)).toSeq)
          .toMap
        for ((id, toks) <- tokensOf) {
          val exp = reference(toks, w, s)
          assert(out(id) == exp, s"path=$path w=$w s=$s doc=$id")
          // coverage: chunk spans tile [0, n) with no gap
          val covered = exp.flatMap { case (_, st, ct) =>
            st.toInt until (st.toInt + ct.length) }.toSet
          assert(covered == toks.indices.toSet, s"coverage w=$w s=$s doc=$id")
        }
      }
    }
  }

  test("stride > window is rejected") {
    ChunkWindows.register(spark)
    val err = intercept[Exception] {
      Seq((0L, "a b")).toDF("doc_id", "text")
        .select(expr("chunk_windows(split(text, ' '), 4, 9)")).collect()
    }
    assert(err.getMessage.contains("stride"), err.getMessage)
  }
}
