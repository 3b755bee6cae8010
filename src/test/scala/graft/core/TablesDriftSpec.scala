package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.TestSpark

/** Reader-version drift guard for the events table.
  *
  * The events parquet stores `ts` as TIMESTAMP(NANOS), and how Spark
  * surfaces that column has already changed once (≤4.0 + nanosAsLong →
  * LongType; 4.1+ → TimestampNTZType) — a change that silently took down
  * every events-based query in round 7. This spec writes the same fixture
  * under every encoding `Tables.events` claims to handle and asserts all
  * of them load to the identical microsecond instants, so the next reader
  * behavior change fails ONE targeted test instead of 18 queries.
  */
class TablesDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // three µs-precision instants (epoch micros), incl. one with sub-second µs
  private val micros = Seq(1700000000000000L, 1700000123456789L, 1712345678901234L)

  private def loadMicros(dir: String): Seq[(Long, Long)] =
    Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)

  private def writeFixture(encode: DataFrame => DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("evdrift").toString
    val base = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong, "click", 1.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    encode(base).coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val expected = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }

  test("LongType encoding (epoch-nanos int64, the ≤4.0 nanosAsLong shape) loads exact micros") {
    val dir = writeFixture(_.withColumn("ts", col("us") * lit(1000L)).drop("us"))
    assert(loadMicros(dir) == expected)
  }

  test("TimestampNTZType encoding (the 4.1+ reader shape) loads exact micros") {
    val dir = writeFixture(
      _.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType)).drop("us"))
    assert(loadMicros(dir) == expected)
  }

  test("TimestampType encoding (already-normalized instant) loads exact micros") {
    val dir = writeFixture(_.withColumn("ts", timestamp_micros(col("us"))).drop("us"))
    assert(loadMicros(dir) == expected)
  }

  test("all encodings agree with each other and the real sf0.001 file loads as TimestampType") {
    // the real TIMESTAMP(NANOS) file, read by whatever THIS Spark does
    val real = Tables.events(spark, TestSpark.sf0001)
    assert(real.schema("ts").dataType == TimestampType)
    assert(real.filter(col("ts").isNull).count() == 0L)
    assert(real.count() > 0L)
  }

  test("streaming read path agrees with the batch read path on the real file") {
    val dir = java.nio.file.Files.createTempDirectory("evdriftstream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val q = graft.stream.Events.readEventsStream(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .writeStream.format("memory").queryName("drift_stream_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("drift_stream_out")
    val batch = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
