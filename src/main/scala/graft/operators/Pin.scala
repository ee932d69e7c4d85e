package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-truncating materialization for iterative operators, behind
  * a deployment conf.
  *
  * Default (`spark.graft.checkpoint.reliable` unset/false):
  * `localCheckpoint` — blocks live on executors, no filesystem
  * round-trip, the right choice single-tenant and on local[N]. Spark's
  * own documented caveat applies: the blocks are NOT replicated, so
  * losing one executor (dynamic allocation, preemptible/spot nodes)
  * kills every query whose iteration state it held.
  *
  * With `spark.graft.checkpoint.reliable=true`: a RELIABLE checkpoint
  * into `spark.graft.checkpoint.dir` (required — point it at the lake
  * filesystem next to [[graft.sinks.LakeRoot]]). Iteration state then
  * survives executor loss — the setting a 1000-executor deployment
  * with preemption should run with — at two documented costs this
  * helper does NOT hide: (1) each pin pays a filesystem write+read,
  * and an eager pin's plan is computed once for the action and again
  * by the checkpoint-write job (the RDD-level recompute Spark's own
  * checkpoint docs call out); (2) checkpoint FILES are not removed by
  * the callers' block-level `unpersist` — set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (a
  * context-creation conf) so out-of-scope checkpoints are reaped, or
  * point the dir at storage with a TTL. `ClusterSmoke` runs with the
  * cleaner enabled. The checkpoint dir is set once per SparkContext,
  * lazily, so merely importing this object costs nothing.
  *
  * Both paths return a DataFrame whose plan is a LogicalRDD, so
  * callers that release superseded rounds via the pinned RDD handle
  * (e.g. [[Graph]]) behave identically under either setting. */
object Pin {
  def reliable(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption("spark.graft.checkpoint.reliable")
      .contains("true")

  implicit class PinOps(private val df: DataFrame) extends AnyVal {
    /** `localCheckpoint(eager)` or reliable `checkpoint(eager)` per the
      * session's `spark.graft.checkpoint.reliable` conf. */
    def pin(eager: Boolean): DataFrame =
      if (!reliable(df)) df.localCheckpoint(eager)
      else {
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(
          df.sparkSession.conf.getOption("spark.graft.checkpoint.dir")
            .getOrElse(throw new IllegalArgumentException(
              "spark.graft.checkpoint.reliable=true requires " +
                "spark.graft.checkpoint.dir (a fault-tolerant filesystem path)")))
        df.checkpoint(eager)
      }
  }
}
