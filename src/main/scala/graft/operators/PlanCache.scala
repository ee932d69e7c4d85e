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
  *
  * Lifecycle: entries die with their session, not only under LRU
  * pressure. A stopped SparkContext purges every entry of its sessions
  * (a SparkListener registered on first use), and a long-lived context
  * hosting several short-lived child sessions calls [[onSessionEnd]]
  * when retiring one — Spark emits no per-child-session end event, so
  * that purge is necessarily explicit.
  */
object PlanCache {
  // Must exceed the number of memoized derivation families a one-dir
  // session touches — one per PlanCache.memo/memoPersisted call site
  // under queries/ (grep recounts them; 11 as of this note). At the
  // cap, one more key would evict-thrash every query.
  private val Max = 16
  private val cache =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]): Boolean = {
        val evict = this.size() > Max
        // A persisted entry's cached blocks are keyed by PLAN in the
        // session's CacheManager — dropping the map reference alone
        // would leak them until session end.
        if (evict) unpersistQuietly(e.getValue)
        evict
      }
    }

  private def unpersistQuietly(df: DataFrame): Unit =
    try { df.unpersist(false); () } catch { case _: Throwable => () }

  private val listenerRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[org.apache.spark.SparkContext]()

  private def ensureListener(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    if (listenerRegistered.add(sc))
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          purgeContext(sc)
          listenerRegistered.remove(sc)
        }
      })
  }

  /** Drop every entry belonging to a session of this (stopping)
    * context. Driven by the listener; callable directly too. */
  private[graft] def purgeContext(sc: org.apache.spark.SparkContext): Unit =
    cache.synchronized {
      val it = cache.keySet.iterator
      while (it.hasNext) if (it.next()._1.sparkContext eq sc) it.remove()
      // No unpersist here: the context is stopping, its blocks die with it.
    }

  /** Drop every entry of ONE session — for a long-lived context that
    * retires short-lived child sessions (`spark.newSession()`): Spark
    * has no per-child-session stop event, so the host must say when a
    * session is done or its pinned tables linger until LRU pressure. */
  def onSessionEnd(spark: SparkSession): Unit = cache.synchronized {
    val it = cache.entrySet().iterator
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq spark) { unpersistQuietly(e.getValue); it.remove() }
    }
  }

  /** Memoized build of a named derivation. Lazy checkpoint: the first
    * ACTION materializes the blocks; a plan cached but never executed
    * costs nothing. Built outside the lock (duplicate compute on a
    * race is deterministic and benign; holding the lock across a Spark
    * job would serialize unrelated callers). */
  def memo(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    ensureListener(spark)
    val k = (spark, key)
    cache.synchronized(Option(cache.get(k))).getOrElse {
      val built = build.localCheckpoint(false)
      cache.synchronized {
        Option(cache.get(k)).getOrElse { cache.put(k, built); built }
      }
    }
  }

  /** [[memo]] that pins with `.persist` (MEMORY_AND_DISK) instead of
    * `localCheckpoint` — for derivations whose OUTPUT PARTITIONING is
    * the point (iteration edge tables hash-partitioned on the join
    * key): a localCheckpointed LogicalRDD reports UnknownPartitioning,
    * so every consumer would re-exchange the table, while a cached
    * InMemoryRelation keeps the partitioning (AQE leaves cached-plan
    * output partitioning alone by default —
    * `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning`).
    * Entries unpersist on LRU eviction and session purge. */
  def memoPersisted(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    ensureListener(spark)
    val k = (spark, key)
    cache.synchronized(Option(cache.get(k))).getOrElse {
      val built = build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cache.synchronized {
        Option(cache.get(k)).getOrElse { cache.put(k, built); built }
      }
    }
  }

  /** Per-JVM memo of corpus-level SCALARS (row counts, distinct
    * estimates) keyed on the analyzed plan's semantic hash + a caller
    * tag — the scalar twin of [[memo]], with the same staleness
    * contract as Spark's own table cache (a rewrite behind an
    * unchanged plan is not detected within the JVM; this library's
    * lake mutators go through VersionedTable roots, whose paths change
    * the plan). Exists because adaptive operating points (LSH plane
    * counts, IVF centroid counts, sketch budgets) each need one cheap
    * corpus statistic: deriving it per call re-scans the corpus every
    * run, and compositions (classify-over-topk) would pay it twice. */
  private val scalars =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), Long]()

  def scalarMemo(df: DataFrame, tag: String)(compute: => Long): Long =
    scalars.computeIfAbsent(
      (df.queryExecution.analyzed.semanticHash(), tag), _ => compute)

  /** Memoized `df.count()` — the one corpus statistic every adaptive
    * grid needs. EAGER on first touch (an action inside what is
    * otherwise lazy plan construction — callers must not pass a
    * streaming DataFrame; adaptive operators guard this). */
  def countMemo(df: DataFrame): Long = {
    require(!df.isStreaming,
      "adaptive operating points need a batch corpus: deriving the grid " +
        "runs an eager count(), which a streaming DataFrame cannot serve — " +
        "pass an explicit grid parameter instead")
    scalarMemo(df, "count")(df.count())
  }

  /** Drop every memoized derivation (e.g. after an executor loss
    * invalidated the non-recoverable checkpoint blocks). */
  def clear(): Unit = cache.synchronized(cache.clear())

  private[graft] def size: Int = cache.synchronized(cache.size())
}
