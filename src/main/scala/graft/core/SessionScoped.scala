package graft.core

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped memo cache for shared materialized stages
  * (Dedup.ngramSharedStage, Similarity.pinnedAssigned).
  *
  * Lifecycle contract: entries are keyed by (owning SparkSession, data
  * dir). The first insert for a session registers a SparkListener that
  * EVICTS every entry of that session on applicationEnd — a stopped
  * session's entries no longer pin its plan graph, and a long-lived JVM
  * cycling many sessions (test suites, notebook restarts) cannot
  * accumulate dead DataFrames.
  *
  * Staleness contract (documented assumption, not detected): a data dir
  * whose parquet files are REWRITTEN mid-session keeps serving the
  * already-materialized stage — the same semantics as any cached /
  * checkpointed frame in Spark. Callers that rewrite inputs in place
  * must use a fresh session (or a fresh dir, the pattern every graft
  * harness follows: Verify/Bench read immutable sf dirs).
  */
final class SessionScoped[V] {
  private val cache = new ConcurrentHashMap[(SparkSession, String), V]()
  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()

  def getOrCompute(s: SparkSession, d: String)(stage: (SparkSession, String) => V): V = {
    if (hooked.add(s))
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          evict(s)
      })
    cache.computeIfAbsent((s, d), { case (ss, dir) => stage(ss, dir) })
  }

  /** Drop every entry owned by `s` (the applicationEnd path; visible so
    * the eviction spec can drive it without stopping the shared test
    * session). */
  private[graft] def evict(s: SparkSession): Unit = {
    cache.keySet.removeIf(_._1 eq s)
    hooked.remove(s)
  }

  /** Visible for the eviction spec. */
  private[graft] def size: Int = cache.size
}
