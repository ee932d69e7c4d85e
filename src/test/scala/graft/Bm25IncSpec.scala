package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries
import graft.sinks.VersionedTable

/** Pins text_bm25_inc's contract: serving from the incrementally
  * maintained stored index reproduces from-scratch BM25 exactly, the
  * index is built once (one version marked historical + one marked
  * batch delta, never again), the two marked versions partition the
  * corpus along the source split — i.e. the incremental run tokenized
  * only the batch — and a lost first-commit race (duplicate historical
  * versions under raced ids) neither skips the batch build nor
  * double-counts at serve time.
  */
class Bm25IncSpec extends SparkSpec {

  test("stored-index BM25 equals the from-scratch ranking; index builds once") {
    val fromScratch = TextQueries.bm25Q(spark, Sf).collect().map(_.toSeq).toSeq
    val inc = TextQueries.bm25IncQ(spark, Sf).collect().map(_.toSeq).toSeq
    assert(inc.nonEmpty)
    assert(inc === fromScratch)

    val (pRoot, dRoot) = TextQueries.lexIndexRoots(spark, Sf)
    def marked(root: String, part: String) =
      VersionedTable.versionsWithMarker(spark, root, s"split_$part")
    // Exactly one version carries each part's marker after a clean run.
    assert(marked(pRoot, "historical").size === 1)
    assert(marked(pRoot, "batch").size === 1)
    assert(marked(dRoot, "historical").size === 1)
    assert(marked(dRoot, "batch").size === 1)
    val pHist = marked(pRoot, "historical").head
    val pBatch = marked(pRoot, "batch").head

    // Batch isolation: the historical version holds only
    // historical-source documents, the batch version only the "new"
    // 1-in-4 sources — the stored split IS the proof that no
    // historical document was re-tokenized on the inc run.
    val d = spark.read.parquet(s"$Sf/documents.parquet")
    val isNew = pmod(xxhash64(col("source")), lit(4L)) === 0L
    val newIds = d.where(isNew).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(newIds.nonEmpty, "split must be non-trivial")
    val vHistIds = VersionedTable.read(spark, pRoot, Some(pHist))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val vBatchIds = VersionedTable.read(spark, pRoot, Some(pBatch))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(vHistIds.intersect(newIds).isEmpty,
      s"historical postings contain batch docs: ${vHistIds.intersect(newIds).take(5)}")
    assert(vBatchIds.nonEmpty && vBatchIds.subsetOf(newIds),
      s"delta postings contain historical docs: ${(vBatchIds diff newIds).take(5)}")

    // Doclens derive from the committed postings part-for-part.
    val dlBatch = VersionedTable.read(spark, dRoot, Some(marked(dRoot, "batch").head))
    val fromPBatch = VersionedTable.read(spark, pRoot, Some(pBatch))
      .groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    assert(dlBatch.exceptAll(fromPBatch).isEmpty && fromPBatch.exceptAll(dlBatch).isEmpty)

    // Idempotence: a later serve run commits nothing new.
    val before = (VersionedTable.versions(spark, pRoot), VersionedTable.versions(spark, dRoot))
    TextQueries.bm25IncQ(spark, Sf).count()
    assert((VersionedTable.versions(spark, pRoot), VersionedTable.versions(spark, dRoot)) === before)
  }

  test("a lost first-commit race (duplicate historical version) does not corrupt serving") {
    // Simulate the ADVICE r8 scenario: two concurrent first-time runs
    // both pass the "not built yet" check and both land the historical
    // postings — under the old version-count guards the batch was then
    // never indexed and serving double-counted history. With content
    // markers the duplicate is inert: the batch guard still fires and
    // serving reads exactly one version per part.
    val tmp = java.nio.file.Files.createTempDirectory("graft_bm25_race").toFile
    tmp.deleteOnExit()
    val pRoot = new java.io.File(tmp, "postings").getAbsolutePath
    val dRoot = new java.io.File(tmp, "doclens").getAbsolutePath
    val d = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val isNew = pmod(xxhash64(col("source")), lit(4L)) === 0L
    val hist = TextQueries.postingsOf(d.where(!isNew))
    // Two racers: identical historical content lands twice (v0 and v1).
    VersionedTable.commit(hist, pRoot, markers = Seq("_split_historical_0"))
    VersionedTable.commit(hist, pRoot, markers = Seq("_split_historical_0"))
    assert(VersionedTable.versionsWithMarker(spark, pRoot, "split_historical") === Seq(0L, 1L))
    // The serve path on top of the raced root: batch still gets
    // indexed (marker absent), and the result matches an index built
    // with no race at all.
    def serveFrom(pr: String, dr: String) = {
      def ensure(root: String, part: String, build: => org.apache.spark.sql.DataFrame): Long = {
        val have = VersionedTable.versionsWithMarker(spark, root, s"split_$part")
        if (have.nonEmpty) have.min
        else {
          VersionedTable.commit(build, root, markers = Seq(s"_split_${part}_0"))
          VersionedTable.versionsWithMarker(spark, root, s"split_$part").min
        }
      }
      val ph = ensure(pr, "historical", TextQueries.postingsOf(d.where(!isNew)))
      val pb = ensure(pr, "batch", TextQueries.postingsOf(d.where(isNew)))
      def doclensOf(v: Long) = VersionedTable.read(spark, pr, Some(v))
        .groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val dh = ensure(dr, "historical", doclensOf(ph))
      val db = ensure(dr, "batch", doclensOf(pb))
      TextQueries.bm25FromIndex(
        VersionedTable.readVersions(spark, pr, Seq(ph, pb)),
        VersionedTable.readVersions(spark, dr, Seq(dh, db)))
        .collect().map(_.toSeq).toSeq
    }
    val raced = serveFrom(pRoot, dRoot)
    val cleanP = new java.io.File(tmp, "postings_clean").getAbsolutePath
    val cleanD = new java.io.File(tmp, "doclens_clean").getAbsolutePath
    val clean = serveFrom(cleanP, cleanD)
    assert(raced.nonEmpty)
    assert(raced === clean)
  }
}
