package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Validate}
import graft.sources.{TableLoader, XmlRecordSource}

class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  test("Validate.Enum flags out-of-domain values, passes nulls to NotNull only") {
    val df = Seq(Some("O"), Some("F"), Some("Z"), None).toDF("st")
    val rep = Validate.report("t", df, Seq(Validate.Enum("st", Seq("O", "F", "P"))))
      .collect().map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(rep("enum") === 1L) // Z only; null is NotNull's business
  }

  test("XML parser ignores record-less documents and unknown nesting depth") {
    assert(XmlRecordSource.parseRecords("<root><other>x</other></root>", "rec").isEmpty)
    val withExtra = "<root><rec><a>1</a></rec><junk/><rec><a>2</a></rec></root>"
    assert(XmlRecordSource.parseRecords(withExtra, "rec").map(_("a")).toSeq === Seq("1", "2"))
  }

  test("XML parser refuses external entity expansion (XXE hardening)") {
    val xxe = """<?xml version="1.0"?><!DOCTYPE r [<!ENTITY x SYSTEM "file:///etc/hostname">]><root><rec><a>&x;</a></rec></root>"""
    intercept[Exception] { XmlRecordSource.parseRecords(xxe, "rec").toSeq }
  }

  test("permissive XML read skips malformed documents and counts them") {
    val good = XmlRecordSource.renderXml("rec", Iterator(Seq("a" -> "1")))
    val bad = "<root><rec><a>unclosed"
    val docs = Seq(good, bad, good).toDS()
    val out = XmlRecordSource.read(docs, "rec", Seq("a"), permissive = true)
    assert(out.count() === 2)
    assert(XmlRecordSource.malformedCount(docs, "rec") === 1L)
    // strict mode still fails loudly
    intercept[Exception] {
      XmlRecordSource.read(docs, "rec", Seq("a")).count()
    }
  }

  test("TableLoader rejects unknown tables") {
    intercept[IllegalArgumentException] { TableLoader.load(spark, Sf, "not_a_table") }
  }

  test("ngramJaccardPairs with a stop-shingle cap still finds the near-dup") {
    val docs = Seq(
      (0L, "aa bb cc dd ee ff gg hh"),
      (1L, "aa bb cc dd ee ff gg xx")).toDF("doc_id", "text")
    val capped = Dedup.ngramJaccardPairs(docs, tauBp = 5000L, maxShingleDf = Some(10L))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(capped === Set((0L, 1L)))
  }

  test("containmentPairs finds a quoted doc that symmetric Jaccard misses") {
    // Doc 0 is fully contained in the much longer doc 1: containment
    // (0 in 1) is 10000 bp, while Jaccard is diluted by doc 1's extra
    // shingles and stays under a 6000 bp threshold.
    val short = "aa bb cc dd ee"
    val docs = Seq(
      (0L, short),
      (1L, short + " ff gg hh ii jj kk ll mm nn oo pp")).toDF("doc_id", "text")
    val jac = Dedup.ngramJaccardPairs(docs, tauBp = 6000L)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(jac.isEmpty, s"fixture broke: Jaccard should miss the pair, got $jac")
    val cont = Dedup.containmentPairs(docs, tauBp = 6000L)
      .select("inner_id", "outer_id", "containment_bp")
      .as[(Long, Long, Long)].collect().toSet
    assert(cont === Set((0L, 1L, 10000L)), s"got $cont")
  }

  test("vec_q8 handles zero vectors and empty arrays without dividing by zero") {
    import graft.expressions.Int8Vec.{vecDotI8, vecQ8}
    val df = Seq(
      (1L, Seq(0.0f, 0.0f, 0.0f)), // all-zero: scale collapses to 0
      (2L, Seq.empty[Float])        // empty embedding
    ).toDF("id", "v")
    val out = df.select(col("id"), vecQ8(spark, col("v")).as("q"))
      .withColumn("n", vecDotI8(spark, col("q"), col("q")))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Byte](1), r.getLong(2))).toMap
    assert(out(1L) === ((Seq[Byte](0, 0, 0), 0L)))
    assert(out(2L) === ((Seq.empty[Byte], 0L)))
  }

  test("incremental minhash with an empty new batch returns no pairs") {
    val corpus = spark.read.parquet(s"$Sf/documents.parquet").limit(50)
    val bands = Dedup.minhashBandSignatures(corpus)
    val none = corpus.where(lit(false))
    assert(Dedup.incrementalMinhashPairs(none, corpus, bands, tauBp = 6000L).count() === 0L)
  }

  test("charDedupSpans: empty strings, no-dup corpus, and empty corpus are safe") {
    import graft.queries.TextQueries
    // empty + short + unique docs: nothing removed, hashes = full-text hashes
    val docs = Seq((1L, ""), (2L, "tiny"), (3L, "a perfectly unique sentence"))
      .toDF("doc_id", "text")
    val out = TextQueries.charDedupSpans(docs, L = 8)
      .select("doc_id", "n_removed", "kept_hash").as[(Long, Long, Long)]
      .collect().map { case (k, r, h) => k -> (r, h) }.toMap
    assert(out.values.forall(_._1 == 0L))
    assert(out(1L)._2 === 0L) // rolling hash of "" is 0
    // empty corpus: empty result, no crash
    val none = docs.where(lit(false))
    assert(TextQueries.charDedupSpans(none, L = 8).count() === 0L)
  }

  test("connectedComponents on an empty pair set returns an empty labeling") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(graft.operators.Dedup.connectedComponents(empty).count() === 0)
  }

  test("dedup operators ignore documents shorter than the shingle width") {
    val docs = Seq((0L, "one two"), (1L, "one two")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(docs, 0L).count() === 0)
    assert(Dedup.minhashPairs(docs, 0L).count() === 0)
  }

  test("bloom prune with an empty build side drops every fact row") {
    import graft.operators.Bloom
    val fact = Seq(1L, 2L, 3L).toDF("k")
    val emptyDim = Seq.empty[Long].toDF("k")
    // all-zero bitset => no key can pass; the (empty) real join agrees
    assert(Bloom.prune(fact, "k", emptyDim, "k", nBits = 1024).count() === 0)
  }

  test("incrementalComponents with an empty batch reproduces the prior labels") {
    val prior = Dedup.connectedComponents(Seq((1L, 2L), (2L, 3L), (9L, 9L)).toDF("id1", "id2"))
    val noNew = Seq.empty[(Long, Long)].toDF("id1", "id2")
    val out = Dedup.incrementalComponents(prior, noNew)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = prior.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === want)
  }

  test("collocations below min-count and on single-token docs yield empty, not errors") {
    import graft.queries.TextQueries
    // every bigram occurs once < minCount=5; one doc has no bigrams at all
    val d = Seq((0L, "alpha beta gamma"), (1L, "delta epsilon"), (2L, "solo"))
      .toDF("doc_id", "text")
    assert(TextQueries.collocations(d, minCount = 5, k = 10).count() === 0)
    // minCount=1 keeps them; the single-token doc contributes unigrams only
    val got = TextQueries.collocations(d, minCount = 1, k = 10)
      .select("w1", "w2").as[(String, String)].collect().toSet
    assert(got === Set(("alpha", "beta"), ("beta", "gamma"), ("delta", "epsilon")))
  }

  test("deflate_len of an empty string is a small constant, never negative") {
    import graft.expressions.DeflateOps
    assert(DeflateOps.deflateLen(Array.emptyByteArray) >= 0)
    assert(DeflateOps.deflateLen("".getBytes) <= 8)
  }

  test("pqTopK works when the corpus is smaller than the codebook size") {
    import graft.operators.Similarity
    val rows = (0L until 6L).map(i =>
      (i, Seq.tabulate(8)(j => (i + j).toFloat), i % 2))
    val tiny = rows.toDF("vec_id", "embedding", "label")
    // nCodes=16 > 6 sample vectors: seeding wraps, training must not
    // throw, and every query still gets k results from the rescore.
    val out = Similarity.pqTopK(tiny.where(col("vec_id") === 0), tiny, k = 2,
      nSub = 4, nCodes = 16, overFetch = 4)
    assert(out.count() === 2)
  }
}
