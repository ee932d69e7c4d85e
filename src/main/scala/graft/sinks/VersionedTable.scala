package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-versioned parquet table — the reproducibility primitive a
  * training-data lake needs and plain directories don't give: every
  * `commit` lands an immutable new version, any past version stays
  * byte-stable and readable forever ("the corpus model X trained on"),
  * and `diff` explains what changed between two versions at row-key
  * granularity.
  *
  * Layout: `root/v=N/` per version (plain parquet — every reader in
  * the ecosystem can consume a pinned version without this library).
  * Commits write to a staging directory and RENAME into place; rename
  * is atomic on HDFS-like stores, so readers never observe a partial
  * version, and a lost commit race surfaces as a retry onto the next
  * version number rather than silent overwrite (object stores without
  * atomic rename need their usual rename-committer arrangement —
  * cited as the same caveat Spark's own output committers carry).
  *
  * Scale shape: `read(version)` is an ordinary pruned parquet scan of
  * one version directory; `latestVersion` is a LISTING of version
  * directories (one RPC per commit ever made — compact rarely-read
  * history with [[Compactor]] if listings grow); `diff` is one full
  * outer join keyed on the row key between exactly two versions, never
  * a scan of intermediate history.
  */
object VersionedTable {

  private val VersionDir = "^v=(\\d+)$".r

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All committed version ids at `root`, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val p = new Path(root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case VersionDir(n) => Some(n.toLong)
        case _ => None
      })
      .sorted
  }

  def latestVersion(spark: SparkSession, root: String): Option[Long] =
    versions(spark, root).lastOption

  /** Commit `df` as the next version; returns the new version id.
    * Staging + atomic rename: a concurrent committer loses the rename
    * and retries onto the next id — versions are never overwritten. */
  def commit(df: DataFrame, root: String, maxAttempts: Int = 5): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    val staging = new Path(root,
      s".staging-${java.util.UUID.randomUUID.toString.take(12)}")
    df.write.mode("overwrite").parquet(staging.toString)
    var attempt = 0
    while (attempt < maxAttempts) {
      val next = latestVersion(spark, root).getOrElse(-1L) + 1
      val target = new Path(root, s"v=$next")
      if (!f.exists(target) && f.rename(staging, target)) return next
      attempt += 1
    }
    f.delete(staging, true)
    throw new IllegalStateException(
      s"lost $maxAttempts commit races on $root — giving up")
  }

  /** Read a pinned version (latest when `version` is None). */
  def read(spark: SparkSession, root: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, root)).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $root"))
    spark.read.parquet(new Path(root, s"v=$v").toString)
  }

  /** Row-level change report between two versions: one row per key
    * whose content was `added`, `removed`, or `updated` (content
    * compared by a column-order-stable xxhash64 over every non-key
    * column). One full outer equijoin on the key — intermediate
    * versions are never read. */
  def diff(spark: SparkSession, root: String, from: Long, to: Long,
           keyCols: Seq[String]): DataFrame = {
    def hashed(v: Long) = {
      val df = read(spark, root, Some(v))
      val valueCols = df.columns.filterNot(keyCols.contains).sorted
      df.select(keyCols.map(col) :+
        xxhash64(valueCols.map(col): _*).as("_vh"): _*)
    }
    val a = hashed(from).withColumnRenamed("_vh", "_vh_from")
    val b = hashed(to).withColumnRenamed("_vh", "_vh_to")
    a.join(b, keyCols, "full_outer")
      .withColumn("change",
        when(col("_vh_from").isNull, lit("added"))
          .when(col("_vh_to").isNull, lit("removed"))
          .when(col("_vh_from") =!= col("_vh_to"), lit("updated")))
      .where(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }
}
