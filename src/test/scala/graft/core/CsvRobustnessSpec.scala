package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Source-reader robustness: a 100 TB CSV ingest always contains some
  * malformed rows, and the mode choice is a silent-data-loss lever —
  * PERMISSIVE keeps the row with nulls + the raw line in a corrupt
  * column (auditable), DROPMALFORMED discards it (counted, not
  * auditable), FAILFAST aborts the job. The engine's readers default to
  * PERMISSIVE (the reference's implicit choice); this spec pins all
  * three behaviors so an upgrade can't silently change them. */
class CsvRobustnessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def csvFile: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toFile
    val f = new java.io.File(dir, "rows.csv")
    val w = new java.io.PrintWriter(f)
    // header + 2 good rows + 1 type-malformed + 1 arity-malformed
    try w.write(
      "id,qty,name\n" +
        "1,10,alpha\n" +
        "2,20,beta\n" +
        "3,notanumber,gamma\n" +
        "4,40\n")
    finally w.close()
    f.getAbsolutePath
  }

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("qty", IntegerType),
    StructField("name", StringType),
    StructField("_corrupt_record", StringType)))

  test("PERMISSIVE keeps malformed rows with nulls and the raw line") {
    val df = spark.read.option("header", "true").option("mode", "PERMISSIVE")
      .schema(schema).csv(csvFile).cache()
    assert(df.count() == 4) // nothing dropped
    val bad = df.filter(col("_corrupt_record").isNotNull)
      .orderBy("id").collect()
    assert(bad.length == 2)
    // type failure: qty null, raw line preserved for audit
    assert(bad(0).getAs[Int]("id") == 3 && bad(0).isNullAt(1))
    assert(bad(0).getAs[String]("_corrupt_record").contains("notanumber"))
    // arity failure: missing trailing column
    assert(bad(1).getAs[String]("_corrupt_record") == "4,40")
    df.unpersist()
  }

  test("DROPMALFORMED silently discards the bad rows") {
    val df = spark.read.option("header", "true").option("mode", "DROPMALFORMED")
      .schema(StructType(schema.fields.dropRight(1))).csv(csvFile)
    // NOTE: collect(), not count() — count() prunes every column, the
    // parser never attempts the qty conversion, and no row is malformed
    // (a 100 TB ingest-count job has the same property: counts are
    // mode-independent unless columns are actually materialized)
    val rows = df.collect()
    // both the type-malformed and the arity-short row are dropped —
    // pinned because a silent change in either direction on upgrade
    // would corrupt ingest counts
    assert(rows.length == 2, rows.mkString("; "))
    assert(rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1)))
    assert(df.count() == 4, "count() is column-pruned — mode must not drop")
  }

  test("FAILFAST aborts on the first malformed row") {
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.option("header", "true").option("mode", "FAILFAST")
        .schema(StructType(schema.fields.dropRight(1))).csv(csvFile)
        .collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed")
      || Option(ex.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }
}
