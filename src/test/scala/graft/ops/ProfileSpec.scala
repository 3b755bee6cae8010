package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact profile: one row, correct null + distinct counts") {
    val df = Seq(
      (Some(1), Some("a")), (Some(1), None), (Some(2), Some("b")),
      (None, Some("a"))).toDF("x", "y")
    val r = Profile.exact(df).collect()(0)
    assert(r.getAs[Long]("n_rows") == 4)
    assert(r.getAs[Long]("nulls_x") == 1)
    assert(r.getAs[Long]("distinct_x") == 2)
    assert(r.getAs[Long]("nulls_y") == 1)
    assert(r.getAs[Long]("distinct_y") == 2)
  }

  test("constantColumns finds all-null and constant columns") {
    val df = Seq(
      (1, "k", Option.empty[String], 9),
      (2, "k", Option.empty[String], 9),
      (3, "k", Option.empty[String], 9)).toDF("varies", "const", "allnull", "c2")
    assert(Profile.constantColumns(df).toSet == Set("const", "allnull", "c2"))
  }

  test("constantColumns keeps a value-plus-missing column (null counts as a value)") {
    // one non-null distinct + nulls = 2 reference-style values: informative
    val df = Seq(
      (Some("v"), "k"), (None, "k"), (Some("v"), "k"))
      .toDF("valueOrMissing", "const")
    assert(Profile.constantColumns(df) == Seq("const"))
  }

  test("profileTables sweeps every table with sane row counts") {
    val profiles = Profile.profileTables(spark, TestSpark.sf0001,
      Seq("region", "nation", "customer"))
    assert(profiles.keySet == Set("region", "nation", "customer"))
    assert(profiles("region").collect()(0).getAs[Long]("n_rows") == 5)
    assert(profiles("nation").collect()(0).getAs[Long]("n_rows") == 25)
  }

  test("aggregate invariant: sum of group counts equals total rows") {
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    val total = li.count()
    val grouped = li.groupBy("l_returnflag").count()
      .agg(org.apache.spark.sql.functions.sum("count")).collect()(0).getLong(0)
    assert(total == grouped)
  }
}
