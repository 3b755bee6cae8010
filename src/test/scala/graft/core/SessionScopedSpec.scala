package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Lifecycle of the shared-stage memo cache (ADVICE r10: static maps
  * with no eviction retained stopped sessions' plan graphs forever;
  * ADVICE r11: the hook must be per-CONTEXT so cloned sessions are
  * covered and evict-then-reuse cannot stack listeners). */
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

  test("evict(session) drops that session's entries; the context hook stays") {
    val c = new SessionScoped[Object]
    c.getOrCompute(spark, "dirA")((_, _) => new Object)
    c.getOrCompute(spark, "dirB")((_, _) => new Object)
    assert(c.size == 2 && c.hookCount == 1)
    c.evict(spark)
    assert(c.size == 0)
    // a fresh getOrCompute after eviction recomputes rather than
    // serving a dead entry — and does NOT register a second listener
    var recomputed = false
    c.getOrCompute(spark, "dirA")((_, _) => { recomputed = true; new Object })
    assert(recomputed && c.size == 1)
    assert(c.hookCount == 1, "evict-then-reuse stacked a duplicate hook")
  }

  test("cloned sessions share one context hook; applicationEnd evicts all") {
    val c = new SessionScoped[Object]
    val clone = spark.newSession()
    c.getOrCompute(spark, "dirA")((_, _) => new Object)
    c.getOrCompute(clone, "dirA")((_, _) => new Object)
    // distinct sessions → distinct entries, but ONE context hook
    assert(c.size == 2 && c.hookCount == 1)
    // the applicationEnd path clears every session of the context
    c.evictContext(spark.sparkContext)
    assert(c.size == 0 && c.hookCount == 0)
  }
}
