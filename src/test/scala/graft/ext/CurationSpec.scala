package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  test("x01 hash sample is entity-closed and near the 13/256 rate") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val sampled = li.filter(
      expr("substring(md5(CAST(l_orderkey AS STRING)), 1, 2) < '0d'"))
    // entity-closed: for every sampled order, ALL its lineitems are in
    val keys = sampled.select("l_orderkey").distinct()
    val full = li.join(keys, "l_orderkey")
    assert(sampled.count() == full.count())
    // rate: binomial(n_orders, 13/256) — allow a wide band
    val nOrders = li.select("l_orderkey").distinct().count()
    val rate = keys.count().toDouble / nOrders
    assert(rate > 0.02 && rate < 0.09, s"sample rate $rate out of band")
    // determinism across runs (no sampler state)
    assert(Curation.sampleEntityHash.build(spark, sf).collect().toSeq ==
      Curation.sampleEntityHash.build(spark, sf).collect().toSeq)
  }

  test("x02 stratified sample: exactly min(20, |stratum|) rows per stratum") {
    val out = Curation.sampleStratifiedHash.build(spark, sf)
    val perStratum = out.groupBy("l_returnflag", "l_linestatus")
      .count().collect()
    val strata = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(perStratum.nonEmpty)
    perStratum.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == math.min(20L, strata(k)))
    }
  }

  test("x03 curation: survivors are text-unique and pass the gates") {
    val out = Curation.corpusCuration.build(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("n_tokens") >= 5)
      assert(r.getAs[Double]("punct_ratio") < 0.2)
    }
    // survivors must be one-per-distinct-text among themselves
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val ids = out.map(_.getAs[Long]("doc_id")).toSet
    val survivors = docs.filter(col("doc_id").isin(ids.toSeq: _*))
    assert(survivors.select("text").distinct().count() == ids.size)
  }

  test("x05 salted agg equals the plain group-by for any salt factor") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val plain = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (factor <- Seq(2, 8)) {
      val salted = graft.ops.Skew
        .saltedSum(li, "l_returnflag", "l_quantity", saltFactor = factor)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(salted == plain, s"salt factor $factor changed the result")
    }
  }

  test("x06 incremental dedup admits exactly the batch fps absent from the corpus") {
    val out = Curation.incrementalDedup.build(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "md5(text) AS fp").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val existingFps = docs.filter(_._1 >= 250).map(_._2).toSet
    val batch = docs.filter(_._1 < 250)
    val admitted = out.map(_.getAs[Long]("admitted_id")).toSet
    // no admitted doc's fingerprint may exist in the corpus
    val fpById = docs.toMap
    assert(admitted.forall(id => !existingFps.contains(fpById(id))))
    // completeness: every batch fp not in the corpus has exactly one survivor
    val newFps = batch.filter(d => !existingFps.contains(d._2))
    assert(admitted.size == newFps.map(_._2).distinct.length)
    // survivor is the min id of its batch duplicate group
    assert(out.forall { r =>
      val fp = fpById(r.getAs[Long]("admitted_id"))
      r.getAs[Long]("admitted_id") ==
        batch.filter(_._2 == fp).map(_._1).min
    })
  }

  test("x07 hash split partitions the corpus near 2/16 eval") {
    val out = Curation.hashSplit.build(spark, sf).collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.values.sum == total)
    val evalFrac = out.getOrElse("eval", 0L).toDouble / total
    assert(evalFrac > 0.04 && evalFrac < 0.25, s"eval fraction $evalFrac")
  }

  test("x04 shard assignment covers every doc exactly once") {
    val out = Curation.shardHash.build(spark, sf).collect()
    val total = out.map(_.getAs[Long]("n_docs")).sum
    assert(total == spark.read.parquet(s"$sf/documents.parquet").count())
    assert(out.map(_.getAs[String]("shard")).distinct.length == out.length)
    assert(out.forall(r => "0123456789abcdef".contains(r.getAs[String]("shard"))))
  }
}
