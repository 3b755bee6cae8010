package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NfcNormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val composed = "caf\u00e9"
  val decomposed = "cafe\u0301"

  test("nfc composes the decomposed form and fixes hash-apart twins") {
    NfcNormalize.register(spark)
    val df = Seq((1L, composed), (2L, decomposed), (3L, null: String))
      .toDF("id", "s")
      .selectExpr("id", "nfc_normalize(s) AS n", "s")
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows(0).getString(1) == composed)
    assert(rows(1).getString(1) == composed) // composed == normalized decomposed
    assert(rows(2).isNullAt(1))              // null-safe
    // the property the dedup stack depends on: equal rendering → equal bytes
    assert(df.filter("n = s").count() == 1)  // only the already-composed row
    assert(df.select(countDistinct("n")).head.getLong(0) == 1)
  }

  test("nfc is idempotent and length-shrinking on combining sequences") {
    val once = NfcNormalize.nfc(
      org.apache.spark.unsafe.types.UTF8String.fromString(decomposed))
    assert(NfcNormalize.nfc(once) eq once) // fast path: already normalized
    assert(once.toString == composed)
    assert(once.numChars() == decomposed.codePointCount(0, decomposed.length) - 1)
  }

  test("t13 planted fixture math: ~25% denormalized, one codepoint saved each") {
    val sf = TestSpark.sf0001
    val out = graft.ext.TextAnalysis.nfcCanonicalize.build(spark, sf).collect()
    assert(out.nonEmpty)
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source",
        "CAST(substring(md5(CAST(doc_id AS STRING)), 1, 1) < '4' AS LONG) AS d")
      .groupBy("source").agg(sum("d").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val e = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_denorm") == e, r.toString)
      assert(r.getAs[Long]("chars_saved") == e, r.toString)
    }
  }
}
