package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Plain in-memory reference BPE (Sennrich-style): most frequent
    * adjacent pair per round (ties lexicographic), applied greedily
    * left-to-right everywhere. */
  private def refMerges(words: Map[String, Long], nMerges: Int): Seq[(String, String)] = {
    var vocab: Map[Vector[String], Long] = words.map { case (w, f) =>
      (w.dropRight(1).map(_.toString).toVector :+ (w.last.toString + Bpe.Eow)) -> f
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) round = nMerges
      else {
        val ((l, r), _) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
        out += ((l, r))
        vocab = vocab.map { case (syms, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.result(), f)
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
      round += 1
    }
    out.toSeq
  }

  test("trainMerges matches the reference BPE merge-for-merge on a handcrafted corpus") {
    // The classic BPE illustration vocabulary, with repeated-symbol runs
    // ("aaaa") to exercise the greedy left-to-right overlap rule.
    val docs = Seq(
      "low low low low low lower lower newest newest newest newest newest newest",
      "widest widest widest aaaa aaaa new new").toDF("text")
    val words = docs
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f")).as[(String, Long)].collect().toMap
    val expected = refMerges(words, 12)
    val got = Bpe.trainMerges(docs, nMerges = 12).map(m => (m._2, m._3))
    assert(got === expected)
  }

  /** Apply learned merges to one word exactly like the reference
    * trainer does (greedy left-to-right per merge, in rank order). */
  private def refEncodeWord(w: String, merges: Seq[(String, String)]): Int = {
    var syms = w.dropRight(1).map(_.toString).toVector :+ (w.last.toString + Bpe.Eow)
    for ((l, r) <- merges) {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          b += (l + r); i += 2
        } else { b += syms(i); i += 1 }
      }
      syms = b.result()
    }
    syms.length
  }

  test("encode token counts match per-word reference application on the real corpus") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val merges = Bpe.trainMerges(docs, nMerges = 8)
    val pairs = merges.map(m => (m._2, m._3))
    val got = Bpe.encode(docs, merges)
      .select(col("doc_id").cast("long"), col("n_words"), col("n_bpe_tokens"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val texts = docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect()
    for ((id, text) <- texts) {
      val words = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      val expected = (words.length.toLong, words.map(refEncodeWord(_, pairs).toLong).sum)
      assert(got(id) === expected, s"doc $id")
    }
  }

  test("trainMerges matches the reference on the real document corpus") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val words = docs
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f")).as[(String, Long)].collect().toMap
    val expected = refMerges(words, 8)
    val got = Bpe.trainMerges(docs, nMerges = 8).map(m => (m._2, m._3))
    assert(got === expected)
  }

  test("batched merge selection cuts driver pacing while preserving the sequence") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val n = 16
    // distinct maxVocab forces a cache miss so lastTrainRounds is real
    val got = Bpe.trainMerges(docs, nMerges = n, maxVocab = 49999).map(m => (m._2, m._3))
    val words = docs
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f")).as[(String, Long)].collect().toMap
    assert(got === refMerges(words, n), "batching changed the merge sequence")
    // The SOUND batch criterion (symbol-disjoint + strict dominance over
    // every creatable pair) measures ~1.8x on this corpus — English
    // letter pairs interact heavily in the Zipf head, so batches stay
    // small there. Anything more aggressive is provably wrong: merging
    // (a,b) in "a b x c d" creates (ab,x), which sequentially outranks
    // a disjoint (c,d) of equal count. Assert strictly-fewer actions
    // than merges with headroom for distribution shifts.
    assert(Bpe.lastTrainRounds * 3 <= n * 2,
      s"expected batching to beat one action per merge, " +
        s"got ${Bpe.lastTrainRounds} rounds for $n merges")
  }
}
