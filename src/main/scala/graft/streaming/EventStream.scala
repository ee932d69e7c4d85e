package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Structured Streaming surface over the events table: the same tumbling
  * window aggregation the batch query `ev_tumbling_agg` declares, run
  * incrementally with a watermark so state is bounded — the plan shape
  * is identical batch vs stream, which is the point of declaring it
  * with DataFrame ops.
  *
  * At scale: watermark bounds state store size; the aggregation is
  * partial-agg friendly; the sink below uses `foreachBatch` so each
  * micro-batch lands with the same idempotent partitioned writer the
  * batch path uses.
  */
object EventStream {

  /** Tumbling hourly aggregation with a 1-hour watermark. Works on any
    * events-shaped DataFrame, batch or streaming. */
  def tumblingAgg(events: DataFrame, windowDur: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("value_cents"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("value_cents"))

  /** Stream the tumbling aggregation into the partitioned lake via
    * foreachBatch: each micro-batch lands through the same idempotent
    * dynamic-partition-overwrite writer the batch path uses, partitioned
    * by event_type — replaying a micro-batch rewrites only its
    * partitions (exactly-once landing on top of at-least-once
    * delivery). */
  def runLakeSink(spark: SparkSession, eventsDir: String, lakePath: String): StreamingQuery = {
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
    tumblingAgg(stream)
      .writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sinks.PartitionedWriter.write(batch, lakePath, Seq("event_type"))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** File-based streaming read of an events parquet directory, processed
    * with availableNow (bounded backfill) into an in-memory sink;
    * returns the query for the caller to await. */
  def runFileStream(spark: SparkSession, eventsDir: String, queryName: String): StreamingQuery = {
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
    tumblingAgg(stream)
      .writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Append)
      .format("memory")
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
