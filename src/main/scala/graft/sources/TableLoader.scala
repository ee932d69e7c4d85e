package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Table registry for the test lake: one parquet file per table under a
  * scale-factor directory. Reads stay lazy so Catalyst pushes projection
  * and predicates into the parquet scan (verify with
  * `.explain("formatted")`: `PushedFilters` / narrow `ReadSchema`).
  */
object TableLoader {
  val tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    require(tables.contains(table), s"unknown table: $table")
    spark.read.parquet(s"$sfDir/$table.parquet")
  }

  /** Events table with `ts` normalized to a proper TIMESTAMP and
    * `ts_us` (epoch micros BIGINT) — THE one events entry point for
    * queries, streaming fixtures, and specs alike. */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame =
    normalizeEventTs(load(spark, sfDir, "events"))

  /** Adapt to either physical `ts` layout the testdata has shipped:
    * raw epoch-nanos BIGINT (parquet TIMESTAMP(NANOS) surfaced via
    * `spark.sql.legacy.parquet.nanosAsLong`) or a real
    * TIMESTAMP(MICROS) column. Integer `div 1000` truncation matches
    * DuckDB's epoch_us exactly, so oracle hashes are identical on both
    * layouts. Consumers must go through here rather than hardcoding one
    * representation — a testdata regeneration flipped the layout once
    * and broke every spec that had inlined the conversion. */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts_us", expr("ts div 1000"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case _ => raw.withColumn("ts_us", unix_micros(col("ts")))
    }

  /** Register every table as a temp view so operators can mix SQL and
    * DataFrame code against the same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tables.foreach(t => load(spark, sfDir, t).createOrReplaceTempView(t))
}
