package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Driver-side task semantics from the reference's flow decorators
  * (/root/reference/prefect/flows/ingest_web_to_gcs.py:67
  * `retries=3, cache_key_fn=task_input_hash, cache_expiration`):
  * source-fetch retry with backoff, and input-fingerprint memoization so
  * an unchanged input never re-runs its ingest.
  *
  * Scope note: Spark already retries *executor task* failures; this
  * layer covers the failures Spark does not — flaky source listings /
  * fetches before a job starts, and whole-flow re-runs over inputs that
  * have not changed since the last success.
  */
object TaskRunner {

  /** Run `f`, retrying up to `attempts` times total with exponential
    * backoff. `sleep` is injectable for tests. */
  def retry[T](attempts: Int = 3, backoffMs: Long = 200,
               sleep: Long => Unit = Thread.sleep)(f: () => T): T = {
    require(attempts >= 1, s"attempts must be >= 1, got $attempts")
    var tryNo = 0
    var lastErr: Throwable = null
    while (tryNo < attempts) {
      try return f()
      catch {
        case e: Exception =>
          lastErr = e
          tryNo += 1
          if (tryNo < attempts) sleep(backoffMs << (tryNo - 1))
      }
    }
    throw lastErr
  }

  /** Fingerprint of a source glob from file listings only (path, length,
    * modification time — no data read): the `task_input_hash` analog
    * that works on any Hadoop filesystem. */
  def inputFingerprint(spark: SparkSession, glob: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(glob)
    val fs = p.getFileSystem(conf)
    val statuses = Option(fs.globStatus(p)).getOrElse(Array.empty)
    val h = statuses.sortBy(_.getPath.toString).foldLeft(1125899906842597L) { (acc, st) =>
      var x = acc
      for (part <- Seq(st.getPath.toString.hashCode.toLong, st.getLen, st.getModificationTime))
        x = x * 6364136223846793005L + part
      x
    }
    java.lang.Long.toHexString(h)
  }

  /** Run `body` only if no success marker exists for (taskName,
    * fingerprint) under `cacheDir`; record the marker after success.
    * Returns true if `body` ran. A changed input produces a new
    * fingerprint, so backfills re-run exactly when inputs changed —
    * the reference's cache_key_fn semantics on top of the idempotent
    * partition overwrite (re-running is safe, skipping is cheap).
    *
    * `revalidate` closes the fingerprint-then-read race: if the input
    * changed while `body` ran (recomputed fingerprint differs), the
    * marker is NOT written, so the next run re-ingests instead of
    * permanently skipping data the body never saw. */
  def memoize(spark: SparkSession, cacheDir: String, taskName: String,
              fingerprint: String, revalidate: () => String = null)
             (body: => Unit): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val marker = new Path(new Path(cacheDir, taskName), fingerprint)
    val fs = marker.getFileSystem(conf)
    if (fs.exists(marker)) return false
    body
    val stillCurrent = revalidate == null || revalidate() == fingerprint
    if (stillCurrent) {
      fs.mkdirs(marker.getParent)
      val out = fs.create(marker, true)
      out.close()
    }
    true
  }
}
