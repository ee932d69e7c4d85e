package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range-clustered lake layout for DATA SKIPPING.
  *
  * At 100 TB the difference between scanning a table and scanning the
  * three files a predicate actually touches is the layout, not the
  * reader: parquet footers carry per-row-group min/max stats, and every
  * stats-based pruner (Spark's own parquet filter pushdown, external
  * file-level indexes) can only skip what the WRITE clustered apart.
  * `writeRangeClustered` produces that layout — each output file covers
  * a disjoint key range — and `zValue2` extends it to two predicate
  * columns in a single sort order (the Z-order trick used by lakehouse
  * table formats, here as a plain codegen'd column expression).
  */
object RangeLayout {

  /** Write `df` clustered on `keys`: `repartitionByRange` (sampled range
    * partitioner) gives each of the `nFiles` output files a DISJOINT key
    * range, and the within-partition sort makes row-group min/max stats
    * tight inside each file. Point/range predicates on the keys then
    * prune to the files whose range intersects — cost O(files matching)
    * instead of O(all files). */
  def writeRangeClustered(df: DataFrame, path: String, nFiles: Int, keys: Column*): Unit =
    df.repartitionByRange(nFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(path)

  /** Per-file [min, max] of `key` over a written layout — the file-level
    * stats index data skipping consults (parquet footers hold the same
    * bounds per row group; this derives them per file for auditing and
    * for external file pruning). One distributed scan, no driver loops. */
  def fileStats(spark: SparkSession, path: String, key: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(key)).as("min_key"), max(col(key)).as("max_key"))

  /** The files a [lo, hi] range predicate must actually read, given the
    * stats: everything whose range does NOT miss the query interval. */
  def filesToRead(stats: DataFrame, lo: Column, hi: Column): DataFrame =
    stats.where(!(col("max_key") < lo || col("min_key") > hi))

  /** Bit-interleaved 2-D Z-order value: co-clusters TWO predicate
    * columns in one sort order, so a single range-clustered layout
    * serves range predicates on either column (each maps to a bounded
    * set of Z-ranges). Pure shift/mask arithmetic — whole-stage
    * codegen'd, no UDF. Inputs must be non-negative and < 2^bits. */
  def zValue2(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(
          shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(
          shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
}
