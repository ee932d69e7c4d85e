package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("rollingHash matches the cross-engine reference value") {
    // DuckDB: list_reduce(... 'hello world') == 204910434 (verified)
    val h = Seq("hello world").toDF("t").select(rollingHash(col("t"))).head.getLong(0)
    assert(h === 204910434L)
  }

  test("occurrences counts non-overlapping literal matches") {
    val df = Seq("the cat the dog the").toDF("t")
    assert(df.select(occurrences(col("t"), "the")).head.getLong(0) === 3L)
  }

  test("wordShingles produces n-2 trigrams and empty for short docs") {
    val df = Seq("a b c d e", "a b").toDF("t")
    val sizes = df.select(size(wordShingles(col("t")))).as[Int].collect()
    assert(sizes.toSeq === Seq(3, 0))
    val first = df.limit(1).select(wordShingles(col("t"))).as[Seq[String]].head
    assert(first === Seq("a b c", "b c d", "c d e"))
  }

  test("langId is deterministic argmax with alphabetical tie-break") {
    val df = Seq("the the data xx", "der window hash hash", "zzz").toDF("t")
    val got = df.select(langId(col("t"))).as[String].collect().toSeq
    assert(got === Seq("en", "de", "de")) // all-zero scores -> first lang code
  }

  test("native rolling_hash equals the Column-composition on the corpus") {
    import graft.expressions.RollingHash.rollingHashNative
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val both = docs.select(
      rollingHash(col("text")).as("ref"),
      rollingHashNative(spark, col("text"), 31L, HashMod).as("fast"),
      rollingHashWith(col("text"), 131L, HashMod2).as("ref2"),
      rollingHashNative(spark, col("text"), 131L, HashMod2).as("fast2"))
    assert(both.where(col("ref") =!= col("fast") || col("ref2") =!= col("fast2")).count() === 0)
  }

  test("native shingle_hashes equals the Column-composition on the corpus") {
    import graft.expressions.ShingleHashes.shingleHashesNative
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val both = docs.select(
      shingleHashes(col("text")).as("ref"),
      shingleHashesNative(spark, col("text")).as("fast"))
    assert(both.where(not(col("ref") === col("fast"))).count() === 0)
    // plus explicit edge cases
    val edge = Seq("", "one", "a b", "a b c", "x y z w").toDF("text")
    val eb = edge.select(shingleHashes(col("text")).as("ref"),
      shingleHashesNative(spark, col("text")).as("fast"))
    assert(eb.where(not(col("ref") === col("fast"))).count() === 0)
  }

  test("jaccardBp exact on known sets") {
    val df = Seq(("a b c d e f", "a b c d e x")).toDF("t1", "t2")
    val bpv = df.select(jaccardBp(shingleHashes(col("t1")), shingleHashes(col("t2"))))
      .head.getLong(0)
    // trigram sets {abc,bcd,cde,def} vs {abc,bcd,cde,dex}: 3 common of 5 distinct
    assert(bpv === 6000L)
  }

  test("char-level decontamination catches punctuation/casing variants word-8-grams miss") {
    import graft.queries.TextQueries
    // doc 1 is a near-verbatim copy of eval doc 0 whose tokens ALL
    // differ within any 8-word run (casing, hyphenation, punctuation),
    // so the word-8-gram filter cannot flag it; doc 2 is clean.
    val docsDf = Seq(
      (0L, "The quick, brown fox; jumps over the lazy dog and runs far away home."),
      (1L, "the QUICK brown-fox jumps over. the lazy dog... and runs? far AWAY home!"),
      (2L, "completely different content about database engines and query planners here.")
    ).toDF("doc_id", "text")
    // word-8-gram premise: no 8-token run survives the variant edits
    val sh8 = graft.expressions.ShingleHashes.shingleHashesNative(spark, col("text"), 8)
    val byDoc = docsDf.select(col("doc_id"), sh8.as("sh")).as[(Long, Seq[Long])]
      .collect().toMap
    assert(byDoc(0L).toSet.intersect(byDoc(1L).toSet).isEmpty,
      "premise broken: the word-8-gram filter would already catch the variant")
    // char-level: normalized streams are identical, so doc 1 is flagged
    val out = TextQueries.charDecontaminate(docsDf, pmod(col("doc_id"), lit(29L)) === 0)
      .select("doc_id", "n_eval_docs").as[(Long, Long)].collect().toMap
    assert(out.get(1L).contains(1L), s"variant not flagged: $out")
    assert(!out.contains(2L), s"clean doc falsely flagged: $out")
  }

  test("deflate_len matches a direct Deflater call and orders repetitive below prose") {
    import graft.expressions.{DeflateLen, DeflateOps}
    val texts = Seq(
      ("ab " * 500).trim,
      "the quick brown fox jumps over the lazy dog while planners reorder joins",
      "")
    val got = texts.toDF("t")
      .select(DeflateLen.deflateLenNative(spark, col("t"))).as[Int].collect().toSeq
    val want = texts.map(t => DeflateOps.deflateLen(t.getBytes("UTF-8")))
    assert(got === want)
    // templated text compresses far below its size; short prose doesn't
    assert(want.head < texts.head.length / 10, s"repetitive not compressible: $want")
    assert(want(1) > texts(1).length / 2, s"prose unexpectedly compressible: $want")
  }

  test("PMI collocations rank an always-adjacent pair above independent pairs") {
    import graft.queries.TextQueries
    // "new york" always adjacent; filler words co-occur independently
    val phrases = (0 until 40).map(i => (i.toLong, "x", "s",
      s"new york a b c d a c b d new york b a d c"))
    val dir = java.nio.file.Files.createTempDirectory("colloc").toString
    phrases.toDF("doc_id", "lang", "source", "text")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val top = TextQueries.collocationsQ(spark, dir)
      .select("w1", "w2").as[(String, String)].head(3)
    assert(top.head === (("new", "york")), s"got $top")
  }
}
