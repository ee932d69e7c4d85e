package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication: the incremental counterpart of
  * `operators.Dedup.exact`.
  *
  * `dropDuplicatesWithinWatermark` keys state on the text's rolling
  * hash (8 bytes per seen document, not the document) and evicts keys
  * once the event-time watermark passes — bounded state on an unbounded
  * stream, which is the only dedup shape that survives a continuous
  * 100 TB/day ingest. Exact-dup semantics within the watermark horizon;
  * cross-horizon dups are the batch job's business (run Dedup.exact
  * over the lake periodically).
  */
object DedupStream {

  /** Drop events whose `textCol` was already seen within the watermark
    * horizon. Input must be a streaming DataFrame with an event-time
    * column `ts` (the caller sets the watermark delay). */
  def dropDupTexts(stream: DataFrame, textCol: String, watermarkDelay: String): DataFrame =
    stream
      .withColumn("text_hash", xxhash64(col(textCol)))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("text_hash")

  /** Same state machinery keyed on explicit columns: first arrival per
    * key survives, repeats within the watermark horizon are dropped,
    * state is one entry per live key and evicts with the watermark. */
  def dropDupKeys(stream: DataFrame, keyCols: Seq[String], watermarkDelay: String): DataFrame =
    stream
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)
}
