package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries
import graft.sinks.VersionedTable

/** Pins text_bm25_inc's contract: serving from the incrementally
  * maintained stored index reproduces from-scratch BM25 exactly, the
  * index is built once (v0 historical + v1 batch delta, never again),
  * and the two versions partition the corpus along the source split —
  * i.e. the incremental run tokenized only the batch.
  */
class Bm25IncSpec extends SparkSpec {

  test("stored-index BM25 equals the from-scratch ranking; index builds once") {
    val fromScratch = TextQueries.bm25Q(spark, Sf).collect().map(_.toSeq).toSeq
    val inc = TextQueries.bm25IncQ(spark, Sf).collect().map(_.toSeq).toSeq
    assert(inc.nonEmpty)
    assert(inc === fromScratch)

    val (pRoot, dRoot) = TextQueries.lexIndexRoots(Sf)
    assert(VersionedTable.latestVersion(spark, pRoot).contains(1L))
    assert(VersionedTable.latestVersion(spark, dRoot).contains(1L))

    // Batch isolation: v0 holds only historical-source documents, v1
    // only the "new" 1-in-4 sources — the stored split IS the proof
    // that no historical document was re-tokenized on the inc run.
    val d = spark.read.parquet(s"$Sf/documents.parquet")
    val isNew = pmod(xxhash64(col("source")), lit(4L)) === 0L
    val newIds = d.where(isNew).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(newIds.nonEmpty, "split must be non-trivial")
    val v0Ids = VersionedTable.read(spark, pRoot, Some(0L))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val v1Ids = VersionedTable.read(spark, pRoot, Some(1L))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(v0Ids.intersect(newIds).isEmpty,
      s"historical postings contain batch docs: ${v0Ids.intersect(newIds).take(5)}")
    assert(v1Ids.nonEmpty && v1Ids.subsetOf(newIds),
      s"delta postings contain historical docs: ${(v1Ids diff newIds).take(5)}")

    // Doclens derive from the committed postings version-for-version.
    val dl1 = VersionedTable.read(spark, dRoot, Some(1L))
    val fromP1 = VersionedTable.read(spark, pRoot, Some(1L))
      .groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    assert(dl1.exceptAll(fromP1).isEmpty && fromP1.exceptAll(dl1).isEmpty)

    // Idempotence: a later serve run commits nothing new.
    TextQueries.bm25IncQ(spark, Sf).count()
    assert(VersionedTable.latestVersion(spark, pRoot).contains(1L))
    assert(VersionedTable.latestVersion(spark, dRoot).contains(1L))
  }
}
