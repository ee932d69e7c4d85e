package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import graft.queries.EventQueries

class StreamingSpec extends SparkSpec {

  test("file-streamed tumbling agg equals the batch aggregation") {
    // Stream the events table (ts normalized to micros first, written as
    // proper timestamps so readStream sees a supported type).
    val tmp = java.nio.file.Files.createTempDirectory("graftstream").toFile.getAbsolutePath
    val batchEvents = spark.read.parquet(s"$Sf/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    batchEvents.write.mode("overwrite").parquet(tmp)

    val q = EventStream.runFileStream(spark, tmp, "graft_stream_test")
    q.awaitTermination(120000)

    val streamed = spark.table("graft_stream_test")
      .select("window_start", "event_type", "n_events", "value_cents")
      .collect().map(_.toSeq).toSet
    val batch = EventStream.tumblingAgg(batchEvents)
      .collect().map(_.toSeq).toSet
    // Append mode emits a window only once the watermark passes its end:
    // everything emitted must match batch exactly, and the only missing
    // windows are the trailing ones still within watermark+window of the
    // stream's end.
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch))
    val maxStart = batch.map(_.head.asInstanceOf[java.sql.Timestamp].getTime).max
    val missing = batch -- streamed
    assert(missing.forall(
      _.head.asInstanceOf[java.sql.Timestamp].getTime >= maxStart - 2L * 3600 * 1000))
  }

  test("foreachBatch lake sink lands micro-batches via the idempotent writer") {
    val tmp = java.nio.file.Files.createTempDirectory("graftstream2").toFile.getAbsolutePath
    val lake = java.nio.file.Files.createTempDirectory("graftlake2").toFile.getAbsolutePath + "/agg"
    spark.read.parquet(s"$Sf/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .write.mode("overwrite").parquet(tmp)
    val q = EventStream.runLakeSink(spark, tmp, lake)
    q.awaitTermination(120000)
    val landed = spark.read.parquet(lake)
    assert(landed.count() > 0)
    assert(landed.columns.contains("event_type")) // partition column survives
    assert(new java.io.File(lake).listFiles().exists(_.getName.startsWith("event_type=")))
  }

  test("batch streamingParity query shape matches tumblingAgg query") {
    val a = EventQueries.streamingParity(spark, Sf).collect().map(_.toSeq)
    val b = EventQueries.tumblingAgg(spark, Sf).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
