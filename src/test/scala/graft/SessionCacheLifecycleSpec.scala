package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, PlanCache}

/** Pins the session lifecycle of the DataFrame-pinning caches: a
  * retired child session's entries are purged (explicitly via
  * onSessionEnd — Spark has no per-child-session stop event) while a
  * live session's entries survive, and the context-stop listener path
  * empties everything for a stopping SparkContext.
  */
class SessionCacheLifecycleSpec extends SparkSpec {

  test("onSessionEnd purges the retired session's entries; live sessions survive") {
    PlanCache.clear()
    val s2 = spark.newSession()
    val live = PlanCache.memo(spark, "lifecycle:live") {
      spark.range(3).toDF("id")
    }
    PlanCache.memo(s2, "lifecycle:dead")(s2.range(5).toDF("id"))
    assert(PlanCache.size === 2)

    GraftSession.onSessionEnd(s2)
    assert(PlanCache.size === 1)
    // The live session still HITS (same memoized frame back)...
    val hit = PlanCache.memo(spark, "lifecycle:live") {
      fail("live session's entry must not have been purged")
    }
    assert(hit eq live)
    // ...and the dead session's key is gone: a re-memo rebuilds.
    var rebuilt = false
    PlanCache.memo(s2, "lifecycle:dead") {
      rebuilt = true; s2.range(5).toDF("id")
    }
    assert(rebuilt)
    GraftSession.onSessionEnd(s2)
    PlanCache.clear()
  }

  test("onSessionEnd purges the retired session's CC label tables; live survive") {
    Dedup.clearCcCache()
    val s2 = spark.newSession()
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val pairs2 = {
      import s2.implicits._
      Seq((1L, 2L), (5L, 6L)).toDF("id1", "id2")
    }
    Dedup.connectedComponents(pairs).count()
    Dedup.connectedComponents(pairs2).count()
    assert(Dedup.ccCacheSize === 2)
    GraftSession.onSessionEnd(s2)
    assert(Dedup.ccCacheSize === 1)
    // live session's entry still present (memo hit leaves size at 1)
    Dedup.connectedComponents(pairs).count()
    assert(Dedup.ccCacheSize === 1)
    Dedup.clearCcCache()
  }

  test("a stopping SparkContext purges every entry of its sessions (listener path)") {
    PlanCache.clear()
    PlanCache.memo(spark, "lifecycle:ctx")(spark.range(2).toDF("id"))
    assert(PlanCache.size === 1)
    // The listener is registered on the shared test context; drive its
    // purge action directly (actually stopping the context would kill
    // every other suite sharing it).
    PlanCache.purgeContext(spark.sparkContext)
    assert(PlanCache.size === 0)
  }
}
