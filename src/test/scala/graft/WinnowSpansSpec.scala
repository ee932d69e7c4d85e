package graft

import org.apache.spark.unsafe.types.UTF8String
import graft.expressions.RollingHashOps
import graft.queries.TextQueries

/** Specs for the round-6 third-batch text operators: duplicated-span
  * removal (the substring-dedup step past flagging) and winnowing
  * fingerprints — each pinned against a literal in-memory reference
  * so the distributed formulations can't drift from the published
  * semantics (Lee et al. 2022; Schleimer/Wilkerson/Aiken 2003).
  */
class WinnowSpansSpec extends SparkSpec {
  import spark.implicits._

  private val Mod = 1000000007L
  private def rh(s: String): Long =
    RollingHashOps.hash(UTF8String.fromString(s), 31L, Mod)

  test("dedupSpans removes exactly the duplicated 8-gram spans and rebuilds kept text") {
    // doc 1 and doc 2 share one 8-token span at different offsets;
    // docs 3 and 4 are full duplicates (everything removed); doc 5 is
    // unique (nothing removed).
    val common = "a b c d e f g h"
    val docs = Seq(
      (1L, s"x1 x2 $common y1 y2"),
      (2L, s"$common z1 z2 z3"),
      (3L, "p q r s t u v w"),
      (4L, "p q r s t u v w"),
      (5L, "only unique words appear in this document body here")
    ).toDF("doc_id", "text")
    val got = TextQueries.dedupSpans(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 1: 12 tokens, 1 dup gram at start 3, positions 3..10 removed
    assert(got(1L) === ((12L, 1L, 8L, rh("x1 x2 y1 y2"))))
    // doc 2: 11 tokens, dup gram at start 1, positions 1..8 removed
    assert(got(2L) === ((11L, 1L, 8L, rh("z1 z2 z3"))))
    // docs 3/4: the single gram is duplicated, whole doc removed
    assert(got(3L) === ((8L, 1L, 8L, rh(""))))
    assert(got(4L) === ((8L, 1L, 8L, rh(""))))
    assert(rh("") === 0L)
    // doc 5: untouched — kept text is the original
    assert(got(5L)._3 === 0L)
    assert(got(5L)._4 === rh("only unique words appear in this document body here"))
  }

  /** Literal reference winnowing: word-3-gram hashes, window of w,
    * rightmost minimum per window, distinct selections. */
  private def refWinnow(text: String, w: Int): Seq[(Int, Long)] = {
    val toks = text.split(" ", -1)
    val hs = (0 to toks.length - 3).map(i => rh(toks.slice(i, i + 3).mkString(" ")))
    val m = hs.length
    (1 to math.max(m - w + 1, 1)).map { j =>
      val win = (j to math.min(j + w - 1, m)).map(p => (hs(p - 1), p))
      val minH = win.map(_._1).min
      (win.filter(_._1 == minH).map(_._2).max, minH)
    }.distinct.sortBy(_._1)
  }

  test("winnow matches the literal MOSS reference, including ties and short docs") {
    val w = 8
    val texts = Seq(
      // repeated trigrams force hash ties inside windows (rightmost wins)
      1L -> Seq.fill(10)("a b").mkString(" "),
      // generic prose-like doc
      2L -> (1 to 40).map(i => s"tok${i % 13}").mkString(" "),
      // shorter than one full window: single truncated window
      3L -> "only five words right here",
      // exactly one gram
      4L -> "three tokens only"
    )
    val got = TextQueries.winnow(texts.toDF("doc_id", "text"), w)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for ((id, text) <- texts) {
      val ref = refWinnow(text, w)
      val m = text.split(" ", -1).length - 2
      val fp = rh(ref.map(_._2).mkString(","))
      assert(got(id) === ((m.toLong, ref.size.toLong, fp)), s"doc $id")
      // the winnowing guarantee: every window of w grams contains a selection
      val sel = ref.map(_._1).toSet
      (1 to math.max(m - w + 1, 1)).foreach { j =>
        assert((j until j + w).exists(sel.contains), s"doc $id window $j uncovered")
      }
    }
  }
}
