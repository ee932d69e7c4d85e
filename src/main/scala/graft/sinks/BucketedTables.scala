package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-located joins: pre-shuffle both sides of a
  * recurring join into the same bucket layout so every subsequent join
  * on the bucket key is exchange-free — at 100 TB this converts the
  * biggest repeated shuffle (fact⋈fact on orderkey, ratings⋈ratings on
  * player id across periods) into a local zip of bucket files.
  *
  * Uses the session catalog (`saveAsTable`); bucket counts must match on
  * both sides, and `spark.sql.sources.bucketing.enabled` (default on)
  * lets the planner elide the Exchange.
  */
object BucketedTables {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. With matching bucket
    * layouts the physical plan contains no Exchange on either side
    * (asserted in BucketedTablesSpec). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
