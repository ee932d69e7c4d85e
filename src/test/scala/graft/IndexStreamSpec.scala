package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries
import graft.sinks.VersionedTable
import graft.streaming.IndexStream

/** Pins the streaming index-maintenance loop: a document stream landed
  * one postings version per micro-batch serves BM25 identical to the
  * from-scratch corpus ranking, and a full replay of the source lands
  * nothing new (the version ledger is the idempotence guard).
  */
class IndexStreamSpec extends SparkSpec {

  test("streamed postings maintenance serves BM25 equal to from-scratch; replay lands nothing") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_idxstream").toString
    val src = s"$tmp/docs"
    val root = s"$tmp/postings"
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    docs.repartition(3).write.parquet(src)
    def stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)

    val q = IndexStream.runVersionedSink(
      stream, root, TextQueries.postingsOf _, Some(s"$tmp/ckpt"))
    q.awaitTermination(120000)
    val nv = VersionedTable.versions(spark, root).size
    assert(nv >= 2, s"expected one version per micro-batch, got $nv")

    val postings = VersionedTable.readAll(spark, root)
    val dl = postings.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val served = TextQueries.bm25FromIndex(postings, dl)
      .collect().map(_.toSeq).toSeq
    val scratch = TextQueries.bm25Q(spark, Sf).collect().map(_.toSeq).toSeq
    assert(served.nonEmpty && served === scratch)

    // Replay the whole source with a fresh checkpoint: every batch id
    // is already covered by the ledger, so nothing new lands and the
    // served ranking is unchanged.
    val q2 = IndexStream.runVersionedSink(
      stream, root, TextQueries.postingsOf _, Some(s"$tmp/ckpt2"))
    q2.awaitTermination(120000)
    assert(VersionedTable.versions(spark, root).size === nv)

    // Retention: fold the per-micro-batch ledger into one version and
    // the served ranking is unchanged.
    VersionedTable.foldHistory(spark, root)
    assert(VersionedTable.versions(spark, root).size === 1)
    val pf = VersionedTable.readAll(spark, root)
    val dlf = pf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    assert(TextQueries.bm25FromIndex(pf, dlf)
      .collect().map(_.toSeq).toSeq === scratch)

    // Ingestion continues across retention: new documents land with the
    // ORIGINAL checkpoint. The batch-id ledger survived the fold as a
    // carried marker, so the new batch commits (it is NOT mistaken for
    // a replay) and the served ranking matches from-scratch over the
    // grown corpus.
    docs.limit(5).withColumn("doc_id", col("doc_id") + 10000000L)
      .coalesce(1).write.mode("append").parquet(src)
    val q3 = IndexStream.runVersionedSink(
      stream, root, TextQueries.postingsOf _, Some(s"$tmp/ckpt"))
    q3.awaitTermination(120000)
    assert(VersionedTable.versions(spark, root).size === 2,
      "the post-fold batch must land as a new delta")
    val pAll = VersionedTable.readAll(spark, root)
    val dlAll = pAll.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val servedAll = TextQueries.bm25FromIndex(pAll, dlAll)
      .collect().map(_.toSeq).toSeq
    val pScr = TextQueries.postingsOf(spark.read.parquet(src))
    val dlScr = pScr.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    assert(servedAll === TextQueries.bm25FromIndex(pScr, dlScr)
      .collect().map(_.toSeq).toSeq)
  }
}
