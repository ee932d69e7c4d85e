package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.expressions.{RollingHashAllOps, RollingHashOps}
import graft.queries.TextQueries

/** Pins the character-level exact-substring dedup to Lee et al. 2022's
  * SUFFIX-ARRAY semantics via a literal brute force: a char position is
  * duplicated iff it lies inside some substring of length >= L that
  * occurs >= 2 times in the corpus (all occurrences, overlapping,
  * within- and cross-document). The implementation never builds a
  * suffix array — it marks covers of duplicated L-grams — so this spec
  * is the proof that the two formulations select identical positions.
  */
class CharSpanSpec extends SparkSpec {
  import spark.implicits._

  private val L = 8

  /** Literal reference: all occurrences (overlapping) of `t` across the corpus. */
  private def occurrences(corpus: Seq[String], t: String): Int =
    corpus.map { s =>
      Iterator.range(0, s.length - t.length + 1)
        .count(i => s.regionMatches(i, t, 0, t.length))
    }.sum

  /** Brute-force duplicated positions: try EVERY substring of length
    * >= L (not just length L), exactly the suffix-array formulation. */
  private def coveredBrute(docs: Seq[(Long, String)], L: Int): Map[Long, Set[Int]] = {
    val corpus = docs.map(_._2)
    docs.map { case (id, s) =>
      val cov = (for {
        i <- 0 until s.length
        j <- (i + L - 1) until s.length
        if occurrences(corpus, s.substring(i, j + 1)) >= 2
      } yield i to j).flatten.toSet
      id -> cov
    }.toMap
  }

  private def runOn(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] =
    TextQueries.charDedupSpans(docs.toDF("doc_id", "text"), L)
      .select(col("doc_id"), col("n_removed"), col("kept_hash"), col("n_chars"))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, rem, kh, n) => id -> (rem, kh, n) }.toMap

  private def checkAgainstBrute(docs: Seq[(Long, String)]): Unit = {
    val got = runOn(docs)
    val brute = coveredBrute(docs, L)
    for ((id, text) <- docs) {
      val cov = brute(id)
      val kept = text.zipWithIndex.collect { case (c, i) if !cov(i) => c }.mkString
      assert(got(id)._1 === cov.size.toLong,
        s"doc $id: removed ${got(id)._1}, brute ${cov.size}")
      assert(got(id)._2 ===
        RollingHashOps.hash(UTF8String.fromString(kept), 31L, 1000000007L),
        s"doc $id: kept text differs from brute-force reconstruction")
      assert(got(id)._3 === text.length.toLong)
    }
  }

  test("rolling_hash_all equals per-position recomputation (O(n) slide is exact)") {
    val rnd = new scala.util.Random(7)
    val strs = Seq("", "a", "ab" * 3, "the quick brown fox jumps over the lazy dog",
      rnd.alphanumeric.take(200).mkString, "aaaaaaaaaaaaaaaaaaaaa")
    for (s <- strs; k <- Seq(1, 3, 8, 40)) {
      val all = RollingHashAllOps.hashAll(
        UTF8String.fromString(s), k, 31L, 1000000007L).toLongArray()
      val expected =
        if (s.length < k) Array.empty[Long]
        else Array.tabulate(s.length - k + 1)(i =>
          RollingHashOps.hash(
            UTF8String.fromString(s.substring(i, i + k)), 31L, 1000000007L))
      assert(all.toSeq === expected.toSeq, s"k=$k s='${s.take(20)}...'")
    }
  }

  test("char dedup equals the all-substrings brute force on a mixed corpus") {
    checkAgainstBrute(Seq(
      // shared 12-char span at different offsets, unique elsewhere
      1L -> "xxHELLO WORLD CORPUSzz unique tail one",
      2L -> "prefix two HELLO WORLD CORPUS and more",
      // a unique document — nothing may be removed
      3L -> "entirely singular content qrstuv",
      // shorter than L — no grams, untouched
      4L -> "tiny",
      // within-doc repetition: duplicated span inside ONE document
      5L -> "abcdefgh--middle--abcdefgh"))
  }

  test("fuzz: random two-letter corpora match the brute force (dense duplicates)") {
    // A two-letter alphabet at L=8 makes duplicated substrings dense and
    // overlapping — the hardest case for interval merging and for the
    // L-gram-cover == all-substrings equivalence. Seeded: reproducible.
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 3) {
      val docs = (1L to 6L).map { id =>
        val len = 15 + rnd.nextInt(20)
        id * 100 + round -> Array.fill(len)(if (rnd.nextBoolean()) 'a' else 'b').mkString
      }
      checkAgainstBrute(docs)
    }
  }

  test("full duplicates annihilate; the unique doc survives untouched") {
    val docs = Seq(
      10L -> "exactly the same document text body",
      11L -> "exactly the same document text body",
      12L -> "completely different unique content!")
    checkAgainstBrute(docs)
    val got = runOn(docs)
    assert(got(10L)._1 === docs.head._2.length.toLong, "dup doc fully removed")
    assert(got(11L)._1 === docs.head._2.length.toLong)
    assert(got(12L)._1 === 0L, "unique doc untouched")
    assert(got(12L)._2 ===
      RollingHashOps.hash(UTF8String.fromString(docs(2)._2), 31L, 1000000007L))
  }

  test("overlapping duplicated grams merge into one removed interval") {
    // 1+L chars shared => two overlapping L-gram covers, one interval
    val span = "ABCDEFGHI" // length L+1 = 9
    val docs = Seq(
      20L -> s"start.$span.end00",
      21L -> s"other-$span-other")
    checkAgainstBrute(docs)
    val got = runOn(docs)
    assert(got(20L)._1 === span.length.toLong,
      "exactly the shared span (merged interval), nothing more")
  }
}
