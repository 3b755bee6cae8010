package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Lifecycle of the shared-stage memo cache (ADVICE r10: static maps
  * with no eviction retained stopped sessions' plan graphs forever). */
class SessionScopedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("memoizes per (session, dir): stage computed once, same instance back") {
    val c = new SessionScoped[Object]
    var computed = 0
    def get(dir: String) =
      c.getOrCompute(spark, dir)((_, _) => { computed += 1; new Object })
    val a1 = get("dirA"); val a2 = get("dirA"); val b = get("dirB")
    assert(a1 eq a2)
    assert(!(a1 eq b))
    assert(computed == 2 && c.size == 2)
  }

  test("evict(session) drops that session's entries and re-arms the hook") {
    val c = new SessionScoped[Object]
    c.getOrCompute(spark, "dirA")((_, _) => new Object)
    c.getOrCompute(spark, "dirB")((_, _) => new Object)
    assert(c.size == 2)
    c.evict(spark) // what the applicationEnd listener runs
    assert(c.size == 0)
    // a fresh getOrCompute after eviction recomputes rather than
    // serving a dead entry
    var recomputed = false
    c.getOrCompute(spark, "dirA")((_, _) => { recomputed = true; new Object })
    assert(recomputed && c.size == 1)
  }
}
