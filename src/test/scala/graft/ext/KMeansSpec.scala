package graft.ext

import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** s07 (Lloyd k-means) against an independent driver-side reference
  * implementation of the same algorithm: the distributed assign→update
  * rounds must reproduce the sequential simulation exactly (the query
  * is deterministic by construction — int8 vectors, exact integer
  * sums), and the simulation's inertia trajectory must be monotone
  * non-increasing, which is Lloyd's convergence guarantee. */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001
  val K = 8; val Iters = 3

  /** Sequential Lloyd over driver-collected vectors, mirroring s07's
    * arithmetic: unit-normalize (left fold), int8-quantize, score by
    * dot(c,c) − 2·dot(q,c) with lowest-id tie-break, centroids as
    * (exact integer sum)/count, empty clusters keep their centroid. */
  private def simulate(): (Map[Long, Int], Seq[Double]) = {
    val raw = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val q = raw.map { case (id, emb) =>
      val nrm = math.sqrt(emb.foldLeft(0.0)((a, x) => a + x * x))
      // Spark's round() is BigDecimal HALF_UP, not rint's half-even
      id -> emb.map(x => new java.math.BigDecimal(x / nrm * 127)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue)
    }
    val dim = q.head._2.length
    var cents: Seq[(Long, Array[Double])] =
      q.filter(_._1 < K).map { case (id, v) => id -> v.clone }.toSeq
    def assign(v: Array[Double]): Long =
      cents.map { case (cid, c) =>
        val cc = c.foldLeft(0.0)((a, x) => a + x * x)
        val qc = (0 until dim).foldLeft(0.0)((a, i) => a + v(i) * c(i))
        (cc - 2 * qc, cid)
      }.minBy(identity)._2
    def inertia(asg: Map[Long, Long]): Double =
      q.map { case (id, v) =>
        val c = cents.find(_._1 == asg(id)).get._2
        (0 until dim).foldLeft(0.0)((a, i) =>
          a + (v(i) - c(i)) * (v(i) - c(i)))
      }.sum
    val inertias = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to Iters) {
      val asg = q.map { case (id, v) => id -> assign(v) }.toMap
      inertias += inertia(asg)
      val groups = q.groupBy { case (id, _) => asg(id) }
      cents = cents.map { case (cid, prev) =>
        cid -> groups.get(cid).map { vs =>
          val n = vs.length
          Array.tabulate(dim)(i => vs.map(_._2(i)).sum / n)
        }.getOrElse(prev)
      }
    }
    val fin = q.map { case (id, v) => id -> assign(v) }.toMap
    inertias += inertia(fin)
    (fin.map { case (k, v) => k -> v.toInt }, inertias.toSeq)
  }

  test("s07 reproduces the sequential Lloyd simulation exactly") {
    val got = Similarity.kmeansLloyd.build(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    val (want, inertias) = simulate()
    assert(got == want)
    // Lloyd's guarantee: each assign+update round cannot increase the
    // objective (inertias has Iters+1 entries: per-round + final)
    inertias.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"inertia rose: $inertias")
    }
    info(s"inertia trajectory: ${inertias.map(x => f"$x%.0f").mkString(" -> ")}")
  }

  test("s07 output is a partition of the corpus with consistent sizes") {
    val rows = Similarity.kmeansLloyd.build(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.map(_.getLong(0)).distinct.length.toLong == n)
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < K))
    val recount = rows.groupBy(_.getLong(1)).map { case (c, rs) =>
      c -> rs.length.toLong
    }
    rows.foreach(r => assert(r.getLong(2) == recount(r.getLong(1))))
  }

  test("s07 on an empty corpus returns an empty clustering") {
    val tmp = java.nio.file.Files.createTempDirectory("kmeans-empty").toString
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
      .write.parquet(s"$tmp/embeddings.parquet")
    val out = Similarity.kmeansLloyd.build(spark, tmp)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq == Seq("vec_id", "cluster", "cluster_size"))
  }
}
