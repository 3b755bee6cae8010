package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** g04 label propagation on a planted two-clique graph with a bridge,
  * against the hand-executed synchronous min-tiebreak rounds. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two bridged triangles settle into two 3-node communities") {
    // triangles {1,2,3} and {10,11,12}, bridge 3-10; hand-run of the
    // synchronous (count DESC, label ASC) vote for 3 rounds:
    // l1: 1->2 2->1 3->1 10->3 11->10 12->10
    // l2: 1->1 2->1 3->1 10->10 11->3 12->3
    // l3: 1->1 2->1 3->1 10->3 11->3 12->3
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val e = (und ++ und.map(_.swap)).toDF("u", "v")
    val labs = Graph.labelPropagate(e, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labs == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L), labs.toString)
  }

  test("bfsEncode: hop distances, nearest-seed attribution, tie to min seed") {
    // path 1-2-3-4-5-6-7, seeds {1, 7}, stride 100:
    // enc = dist*100 + seed; node 4 is 3 hops from BOTH seeds → seed 1
    val und = (1L to 6L).map(n => (n, n + 1))
    val e = (und ++ und.map(_.swap)).toDF("u", "v")
    val seeds = Seq(1L, 7L).toDF("id")
    val got = Graph.bfsEncode(e, seeds, 3, 100L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 101L, 3L -> 201L, 4L -> 301L,
      7L -> 7L, 6L -> 107L, 5L -> 207L), got.toString)
  }

  test("bfsEncode: nodes beyond the round budget stay unlabeled") {
    val und = (1L to 6L).map(n => (n, n + 1))
    val e = (und ++ und.map(_.swap)).toDF("u", "v")
    val seeds = Seq(1L).toDF("id")
    val got = Graph.bfsEncode(e, seeds, 2, 100L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // only 1,2,3 are within 2 hops of seed 1
    assert(got == Map(1L -> 1L, 2L -> 101L, 3L -> 201L), got.toString)
  }

  test("g05 histogram partitions every graph node exactly once") {
    val sf = TestSpark.sf0001
    val rows = Graph.bfsHops.build(spark, sf).collect()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey", "l_suppkey").distinct()
    val nNodes = li.select("l_partkey").distinct().count() +
      li.select("l_suppkey").distinct().count()
    assert(rows.map(_.getLong(2)).sum == nNodes)
    // the three seeds are their own dist-0 anchors
    val d0 = rows.filter(_.getLong(0) == 0L)
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(d0 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), d0.toString)
    // attribution only ever points at a seed (or the unreached marker)
    assert(rows.forall(r => Set(-1L, 1L, 2L, 3L)(r.getLong(1))))
  }

  test("isolated pair converges immediately to the min label") {
    val e = Seq((5L, 6L), (6L, 5L)).toDF("u", "v")
    val labs = Graph.labelPropagate(e, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round1: 5->6, 6->5; round2: 5->5, 6->6 — 2-cycles oscillate in
    // synchronous LP (the documented behavior this pins down)
    assert(labs == Map(5L -> 5L, 6L -> 6L), labs.toString)
  }

  test("g06 personalized PageRank localizes to the seed community") {
    // two disconnected part-supplier communities; seeds (parts 1-4)
    // live in A, so every B node must score 0 and vanish from the
    // output — the localization property that distinguishes g06's
    // teleport-to-seeds from g01's uniform restart.
    val tmp = java.nio.file.Files.createTempDirectory("g06").toString
    val a = for (p <- 1L to 4L; s <- 1L to 2L) yield (p, s)
    val b = for (p <- 100L to 104L; s <- 50L to 51L) yield (p, s)
    (a ++ b).toDF("l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Graph.personalizedPagerank.build(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val nodes = out.map(t => (t._1, t._2)).toSet
    val communityA =
      (1L to 4L).map(("part", _)).toSet ++ (1L to 2L).map(("supplier", _))
    assert(nodes.subsetOf(communityA), s"B-community leak: $nodes")
    assert(out.forall(_._3 > 0))
    // the seeds' direct neighbors (suppliers 1-2) must be reached
    assert(Set(("supplier", 1L), ("supplier", 2L)).subsetOf(nodes), nodes.toString)
  }
}
