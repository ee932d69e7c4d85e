package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Partitioned, idempotent parquet lake writer — the Spark re-expression
  * of the reference's per-period GCS layout + skip-if-exists logic
  * (/root/reference/prefect/flows/ingest_web_to_gcs.py:158-186):
  * `partitionBy(period...)` replaces the filename-encoded period, and
  * dynamic partition overwrite replaces the list-blobs existence check —
  * a backfill rewrites only the periods it actually produced, which is
  * the idempotency a 100 TB lake needs (no full-table overwrite, no
  * driver-side listing of millions of objects).
  */
object PartitionedWriter {

  /** True if the target (or a specific partition path) already exists. */
  def exists(df: DataFrame, path: String): Boolean = {
    val hadoopConf = df.sparkSession.sparkContext.hadoopConfiguration
    val p = new Path(path)
    p.getFileSystem(hadoopConf).exists(p)
  }

  /** Write partitioned parquet; `overwritePartitions = false` skips the
    * write entirely when the target exists (reference skip semantics),
    * `true` uses dynamic partition overwrite (idempotent backfill).
    * `clusterBy` sorts rows within output files so parquet row-group
    * min/max stats make point/range reads on those columns skip data —
    * the cheap half of Z-ordering, worth it on every 100 TB lake. */
  def write(df: DataFrame, path: String, partitionCols: Seq[String],
            overwritePartitions: Boolean = true,
            clusterBy: Seq[String] = Seq.empty,
            codec: String = "zstd",
            partitionOverwriteMode: String = "dynamic"): Boolean = {
    if (!overwritePartitions && exists(df, path)) return false
    val clustered =
      if (clusterBy.isEmpty) df
      else df.sortWithinPartitions((partitionCols ++ clusterBy).map(org.apache.spark.sql.functions.col): _*)
    clustered.write
      // Per-write option, not a session-conf mutation: the session default
      // (static overwrite) must survive for unrelated writes. Callers
      // whose write plan READS the target path (read-back-and-overwrite
      // merges like UpsertWriter) depend on "dynamic" deferring partition
      // deletion to job commit — they pass the mode explicitly so the
      // invariant is enforced where it is relied upon.
      .option("partitionOverwriteMode", partitionOverwriteMode)
      // zstd over the default snappy: ~20-30% smaller files at similar
      // scan speed — at 100 TB the bytes on disk and over the wire are
      // the bill, and parquet scan is rarely decompress-bound.
      .option("compression", codec)
      .partitionBy(partitionCols: _*)
      .mode(if (overwritePartitions) "overwrite" else "errorifexists")
      .parquet(path)
    true
  }
}
