package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memoizer for derived tables shared across queries —
  * the generalization of the CC label cache
  * ([[Dedup.connectedComponents]]): a named derivation is built once,
  * pinned via lazy `localCheckpoint`, and every later consumer in the
  * same session reuses the materialized blocks instead of re-deriving
  * (the graph family alone repeated ~3-4 s of shared edge derivation
  * per query at sf0.1 before this).
  *
  * Contract mirrors ccCache: LRU capped at [[Max]] entries so a
  * long-lived session holds a bounded number of pinned tables (evicted
  * entries' blocks are released by the ContextCleaner once
  * unreferenced), and `localCheckpoint` blocks are non-recoverable —
  * after an executor loss call [[clear]] to force recomputation.
  */
object PlanCache {
  // Must exceed the number of memoized derivations a one-dir session
  // touches (currently 8: vec top-20, video frames, png media, two
  // graph edge tables, terms postings, char-dedup, jaccard pairs) —
  // at the cap, one more key would evict-thrash every query.
  private val Max = 12
  private val cache =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]): Boolean =
        size() > Max
    }

  /** Memoized build of a named derivation. Lazy checkpoint: the first
    * ACTION materializes the blocks; a plan cached but never executed
    * costs nothing. Built outside the lock (duplicate compute on a
    * race is deterministic and benign; holding the lock across a Spark
    * job would serialize unrelated callers). */
  def memo(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val k = (spark, key)
    cache.synchronized(Option(cache.get(k))).getOrElse {
      val built = build.localCheckpoint(false)
      cache.synchronized {
        Option(cache.get(k)).getOrElse { cache.put(k, built); built }
      }
    }
  }

  /** Drop every memoized derivation (e.g. after an executor loss
    * invalidated the non-recoverable checkpoint blocks). */
  def clear(): Unit = cache.synchronized(cache.clear())

  private[graft] def size: Int = cache.synchronized(cache.size())
}
