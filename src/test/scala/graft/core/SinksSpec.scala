package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fingerprint is partitioning/order insensitive") {
    val a = Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "v")
    val b = a.repartition(7).sortWithinPartitions("v")
    assert(Sinks.fingerprint(a) == Sinks.fingerprint(b.orderBy($"k".desc)))
  }

  test("fingerprint distinguishes differing relations and multiplicities") {
    val a = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val b = Seq((1, "x"), (2, "z")).toDF("k", "v")
    val dup = Seq((1, "x"), (2, "y"), (2, "y")).toDF("k", "v")
    assert(Sinks.fingerprint(a) != Sinks.fingerprint(b))
    assert(Sinks.fingerprint(a) != Sinks.fingerprint(dup))
  }

  test("fingerprint is total on the empty relation") {
    val empty = Seq.empty[(Int, String)].toDF("k", "v")
    assert(Sinks.fingerprint(empty) == Sinks.fingerprint(empty))
    assert(Sinks.fingerprint(empty) !=
      Sinks.fingerprint(Seq((1, "x")).toDF("k", "v")))
  }

  test("even-multiplicity rows do not cancel (sum-based, not xor)") {
    // {X,X,Y} vs {Z,Z,Y}: same cardinality, duplicated rows differ —
    // an xor fingerprint would collide with certainty
    val a = Seq((1, "x"), (1, "x"), (9, "y")).toDF("k", "v")
    val b = Seq((2, "z"), (2, "z"), (9, "y")).toDF("k", "v")
    assert(Sinks.fingerprint(a) != Sinks.fingerprint(b))
  }

  test("null hashes differently from the string 'null'") {
    val a = Seq(Tuple1(Option.empty[String])).toDF("v")
    val b = Seq(Tuple1(Option("null"))).toDF("v")
    assert(Sinks.fingerprint(a) != Sinks.fingerprint(b))
  }

  test("loaders read partitioned directory layouts (the 100 TB shape)") {
    // split lineitem into a multi-file directory and read it back through
    // the same spark.read.parquet call Tables uses
    val dir = java.nio.file.Files.createTempDirectory("parts").toString
    val li = spark.read.parquet(s"${graft.TestSpark.sf0001}/lineitem.parquet")
    li.repartition(5).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val back = Tables.table(spark, dir, "lineitem")
    assert(back.inputFiles.length == 5)
    assert(back.count() == li.count())
    assert(Sinks.fingerprint(back) == Sinks.fingerprint(li))
  }

  test("partitioned layout prunes directories at the scan (PartitionFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("partw").toString
    val ev = graft.core.Tables.events(spark, graft.TestSpark.sf0001)
      .withColumn("day", org.apache.spark.sql.functions.to_date($"ts"))
    Sinks.writePartitioned(ev, s"$dir/events_by_day", Seq("day"))
    val back = spark.read.parquet(s"$dir/events_by_day")
    val oneDay = back.filter($"day" ===
      org.apache.spark.sql.functions.lit(java.sql.Date.valueOf("2024-01-02")))
    oneDay.collect()
    // assert on the scan's actual partition filters, not the plan string
    // (the string always prints a "PartitionFilters: [...]" section)
    val scans = oneDay.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.nonEmpty,
      scans.head.toString.take(500))
    assert(scans.head.metrics("numFiles").value < back.inputFiles.length,
      s"read ${scans.head.metrics("numFiles").value} of ${back.inputFiles.length}")
    assert(oneDay.count() == ev.filter($"ts".cast("date") ===
      java.sql.Date.valueOf("2024-01-02")).count())
  }

  test("writeParquet round-trips deterministically") {
    val dir = java.nio.file.Files.createTempDirectory("sinks").toString
    val df = Seq((3, "c"), (1, "a"), (2, "b")).toDF("k", "v")
    Sinks.writeParquet(df, s"$dir/out", Seq("k"))
    val back = spark.read.parquet(s"$dir/out")
    assert(back.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("ORC round-trip: lineitem content is format-invariant vs parquet") {
    // format coverage: the engine's relations survive an ORC write/read
    // with identical content (order-insensitive fingerprint) and
    // identical resolved schema — the swap-the-storage-format test a
    // 100 TB deployment runs before committing to a layout. DuckDB
    // cannot read ORC, so this lives in the spec layer, not the oracle.
    val dir = java.nio.file.Files.createTempDirectory("orc").toString
    val li = spark.read.parquet(s"${graft.TestSpark.sf0001}/lineitem.parquet")
    li.write.orc(s"$dir/li_orc")
    val back = spark.read.orc(s"$dir/li_orc")
    assert(back.schema == li.schema)
    assert(back.count() == li.count())
    assert(Sinks.fingerprint(back.select(li.columns.head, li.columns.tail: _*)) ==
      Sinks.fingerprint(li))
    // predicate pushdown reaches the ORC scan like the parquet one
    val plan = back.filter($"l_quantity" > 30)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("l_quantity"), plan.take(500))
  }

  test("compactParquet collapses a many-small-files dir, content identical") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    val li = spark.read.parquet(s"${graft.TestSpark.sf0001}/lineitem.parquet")
    li.repartition(50).write.parquet(s"$dir/small")
    val fragmented = spark.read.parquet(s"$dir/small")
    assert(fragmented.inputFiles.length == 50)
    val parts = Sinks.compactParquet(spark, s"$dir/small", s"$dir/compacted")
    val back = spark.read.parquet(s"$dir/compacted")
    assert(back.inputFiles.length == parts && parts < 50,
      s"parts=$parts files=${back.inputFiles.length}")
    // content unchanged (order-insensitive fingerprint + count)
    assert(back.count() == li.count())
    assert(Sinks.fingerprint(back.select(li.columns.head, li.columns.tail: _*)) ==
      Sinks.fingerprint(li))
  }

  test("mergedParquet unions drifted schemas; missing columns read as null") {
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$dir/t/f1")
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2_added_later")
      .write.parquet(s"$dir/t/f2")
    val merged = graft.core.Tables
      .mergedParquet(spark, s"$dir/t/f1", s"$dir/t/f2")
    assert(merged.columns.toSet == Set("id", "v1", "v2_added_later"))
    val rows = merged.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("v2_added_later")))
    assert(rows(1).getDouble(rows(1).fieldIndex("v2_added_later")) == 9.5)
  }
}
