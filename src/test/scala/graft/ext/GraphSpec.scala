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

  test("isolated pair converges immediately to the min label") {
    val e = Seq((5L, 6L), (6L, 5L)).toDF("u", "v")
    val labs = Graph.labelPropagate(e, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round1: 5->6, 6->5; round2: 5->5, 6->6 — 2-cycles oscillate in
    // synchronous LP (the documented behavior this pins down)
    assert(labs == Map(5L -> 5L, 6L -> 6L), labs.toString)
  }
}
