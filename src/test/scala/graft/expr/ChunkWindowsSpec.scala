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

  test("stride > window is rejected") {
    ChunkWindows.register(spark)
    val err = intercept[Exception] {
      Seq((0L, "a b")).toDF("doc_id", "text")
        .select(expr("chunk_windows(split(text, ' '), 4, 9)")).collect()
    }
    assert(err.getMessage.contains("stride"), err.getMessage)
  }
}
