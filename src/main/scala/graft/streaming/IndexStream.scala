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
  * Replay idempotence: every version lands with a `_batch_id_<B>`
  * marker file staged alongside its data (one atomic rename, so the
  * marker's claim is true the instant the version is visible), and a
  * batch whose id is already <= the max surviving marker is skipped.
  * The guarantee is scoped to re-runs that REPRODUCE the original
  * batching: a replay under the same checkpoint (Spark re-delivers
  * the checkpointed batch contents — the crash-between-commit-and-
  * checkpoint-advance case this guards), or a fresh checkpoint over a
  * byte-identical source with the same reader options (file streams
  * batch deterministically, so ids line up). It does NOT cover a
  * fresh checkpoint over a source that has since GROWN or different
  * batching options — there, old documents regrouped into high-id
  * batches would re-commit and new documents grouped into low-id
  * batches would be skipped; resume a grown source with its original
  * checkpoint (the shape the IndexStreamSpec post-fold test pins), or
  * start a fresh root. A per-source-file ledger would lift the caveat
  * but accretes one marker per file ever ingested — unbounded
  * metadata the retention fold would have to carry forever — so batch
  * granularity is the deliberate trade. The marker — not the version
  * COUNT — is the ledger, because [[VersionedTable.foldHistory]]
  * retention shrinks the version list but carries each marker family's
  * max into the folded version: ingestion continues correctly across
  * folds. The commit itself is staging + atomic rename, so a reader
  * never observes a torn version even mid-commit.
  *
  * Scale: the per-batch work is one tokenize + partial-agg of the
  * BATCH only (never the accumulated corpus), and the ledger check is
  * one directory listing. Compact rarely-read history with
  * [[graft.sinks.Compactor]] when version listings grow.
  */
object IndexStream {

  /** Land `transform(batch)` as one index version per micro-batch.
    * AvailableNow-triggered: drains the available source then stops,
    * the same drive shape as the other file-stream sinks.
    *
    * Retention rides the loop (the same in-loop fold the streamed
    * graph harness runs): after each commit, once the root holds more
    * than `spark.graft.stream.indexFoldBudget` versions (default 8),
    * history is folded+compacted ([[VersionedTable.foldHistory]] —
    * rows verbatim, marker ledger carried at family max), so a stream
    * that runs for months keeps its version listing, small-file count,
    * and cold `readAll` planning cost bounded by the budget instead of
    * by the batch count. Safe at this point in the loop: the fold runs
    * strictly AFTER the batch's marker landed, so the replay guard
    * above (a max-marker comparison) never needs a folded-away
    * version. */
  def runVersionedSink(stream: DataFrame, root: String,
      transform: DataFrame => DataFrame,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // The replay guard: batch ids are monotone, every batch (even
        // an empty one) lands with its `_batch_id` marker, so a max
        // surviving marker >= batchId means this batch landed before.
        val spark = batch.sparkSession
        if (VersionedTable.maxMarker(spark, root, "batch_id").forall(_ < batchId)) {
          VersionedTable.commit(transform(batch), root,
            markers = Seq(s"_batch_id_$batchId"))
          val foldBudget = spark.conf
            .getOption("spark.graft.stream.indexFoldBudget").map(_.toInt).getOrElse(8)
          if (VersionedTable.versions(spark, root).size > foldBudget)
            VersionedTable.foldHistory(spark, root)
          ()
        }
      }
      .trigger(Trigger.AvailableNow())
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }
}
