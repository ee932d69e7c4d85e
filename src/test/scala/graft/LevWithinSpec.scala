package graft

import org.apache.spark.unsafe.types.UTF8String
import graft.expressions.LevWithinOps

/** The specialized banded kernel must be indistinguishable from Spark's
  * builtin `levenshtein(a, b, k)` (and so from the DuckDB oracle's
  * plain-distance filter): same value when distance <= k, -1 when over.
  */
class LevWithinSpec extends SparkSpec {

  private def builtin(a: String, b: String, k: Int): Int =
    UTF8String.fromString(a).levenshteinDistance(UTF8String.fromString(b), k)

  private def kernel(a: String, b: String, k: Int): Int =
    LevWithinOps.levWithin(UTF8String.fromString(a), UTF8String.fromString(b), k)

  test("randomized ASCII equality against the builtin across thresholds") {
    val rnd = new scala.util.Random(11)
    val alphabets = Seq("ab", "abcde", "abcdefghijklmnopqrstuvwxyz 0123456789")
    var checked = 0
    for (alpha <- alphabets; k <- Seq(0, 1, 3, 8); _ <- 1 to 300) {
      val base = Seq.fill(rnd.nextInt(40))(alpha(rnd.nextInt(alpha.length))).mkString
      // half the pairs are perturbations (exercise the <= k branch),
      // half independent strings (exercise the bail)
      val other =
        if (rnd.nextBoolean()) {
          val sb = new StringBuilder(base)
          for (_ <- 0 until rnd.nextInt(2 * k + 2); if sb.nonEmpty) {
            val p = rnd.nextInt(sb.length)
            rnd.nextInt(3) match {
              case 0 => sb.setCharAt(p, alpha(rnd.nextInt(alpha.length)))
              case 1 => sb.deleteCharAt(p)
              case 2 => sb.insert(p, alpha(rnd.nextInt(alpha.length)))
            }
          }
          sb.toString
        } else Seq.fill(rnd.nextInt(40))(alpha(rnd.nextInt(alpha.length))).mkString
      assert(kernel(base, other, k) === builtin(base, other, k),
        s"k=$k a='$base' b='$other'")
      checked += 1
    }
    assert(checked === 3600)
  }

  test("blocked-prefix shape: shared 8-char heads trim and stay exact") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 500) {
      val head = Seq.fill(8)(('a' + rnd.nextInt(26)).toChar).mkString
      val t1 = head + Seq.fill(24)(('a' + rnd.nextInt(26)).toChar).mkString
      val t2 = head + Seq.fill(24)(('a' + rnd.nextInt(26)).toChar).mkString
      assert(kernel(t1, t2, 8) === builtin(t1, t2, 8))
    }
  }

  test("edge cases: empties, equals, exact-threshold, unicode fallback") {
    assert(kernel("", "", 8) === 0)
    assert(kernel("", "abcdefgh", 8) === 8)
    assert(kernel("", "abcdefghi", 8) === -1)
    assert(kernel("same", "same", 0) === 0)
    assert(kernel("ab", "ba", 1) === -1)
    assert(kernel("ab", "ba", 2) === 2)
    // non-ASCII goes through the builtin wholesale: code-point, not
    // byte, semantics (müller vs muller is ONE substitution)
    assert(kernel("müller", "muller", 8) === builtin("müller", "muller", 8))
    assert(kernel("müller", "muller", 8) === 1)
    assert(kernel("日本語のテキスト", "日本語のテクスト", 8) ===
      builtin("日本語のテキスト", "日本語のテクスト", 8))
  }

  test("the registered SQL function matches the builtin on the real corpus") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"), substring(col("text"), 1, 32).as("pfx"))
    val a = docs.select(col("doc_id").as("id1"), col("pfx").as("p1"))
    val b = docs.select(col("doc_id").as("id2"), col("pfx").as("p2"))
    val joined = a.crossJoin(b).where(col("id1") % 17 === 0 && col("id2") % 13 === 0)
      .select(levenshtein(col("p1"), col("p2"), 8).as("want"),
        graft.expressions.LevWithin.levCol(spark, col("p1"), col("p2"), 8).as("got"))
    val bad = joined.where(col("want") =!= col("got")).count()
    assert(bad === 0)
    assert(joined.count() > 1000)
  }
}
