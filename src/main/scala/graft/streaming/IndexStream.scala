package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.sinks.VersionedTable

/** Streaming maintenance of a versioned index root — the streaming
  * twin of the batch delta commit in
  * [[graft.queries.TextQueries.bm25IncQ]]: each micro-batch of a
  * document stream is transformed (e.g. to its postings delta) and
  * landed as the NEXT [[VersionedTable]] version, so the stored index
  * a retrieval layer serves from accrues one immutable version per
  * batch and `readAll` always sees a consistent union.
  *
  * Replay idempotence comes from the version ledger itself: versions
  * commit in micro-batch order, so version id == micro-batch id, and
  * a replayed batch (after a sink crash between the commit and the
  * checkpoint advancing, or a re-run over the same source without a
  * checkpoint) finds its id already covered by the ledger and is
  * skipped — the same exactly-once-by-ledger discipline a foreachBatch
  * MERGE sink gets from last-writer-wins on batch id. The commit
  * itself is staging + atomic rename, so a reader never observes a
  * torn version even mid-commit.
  *
  * Scale: the per-batch work is one tokenize + partial-agg of the
  * BATCH only (never the accumulated corpus), and the ledger check is
  * one directory listing. Compact rarely-read history with
  * [[graft.sinks.Compactor]] when version listings grow.
  */
object IndexStream {

  /** Land `transform(batch)` as one index version per micro-batch.
    * AvailableNow-triggered: drains the available source then stops,
    * the same drive shape as the other file-stream sinks. */
  def runVersionedSink(stream: DataFrame, root: String,
      transform: DataFrame => DataFrame,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // The ledger guard: batch ids are sequential from 0 and every
        // batch (even an empty one) commits, so a ledger already
        // holding > batchId versions has landed this batch before.
        if (VersionedTable.versions(batch.sparkSession, root).size <= batchId) {
          VersionedTable.commit(transform(batch), root)
          ()
        }
      }
      .trigger(Trigger.AvailableNow())
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }
}
