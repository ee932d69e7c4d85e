package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Register every table as a temp view so operators can mix SQL and
    * DataFrame code against the same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tables.foreach(t => load(spark, sfDir, t).createOrReplaceTempView(t))
}
