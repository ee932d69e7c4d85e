package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll

/** Property-based checks for the closed-form arithmetic the engine
  * trusts at scale: run through ScalaCheck driver-side (the properties
  * are pure column-expression semantics, evaluated via small local
  * DataFrames where needed, reference implementations in plain Scala
  * otherwise). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def checkProp(p: Prop): Unit = {
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(result.passed, result.status.toString)
  }

  /** Reference NTILE: first (n mod b) buckets get ceil(n/b) rows. */
  private def refNtile(rank: Long, n: Long, b: Int): Long = {
    val q = n / b; val r = n % b; val cut = r * (q + 1)
    if (rank <= cut) (rank + q) / (q + 1) else r + (rank - cut + q - 1) / q
  }

  test("ntileFromRank matches the SQL NTILE contract for arbitrary (n, b)") {
    // Evaluate the Column expression over a batch of random cases in
    // ONE DataFrame pass, then compare against the reference.
    val cases = for {
      n <- 1L to 200L
      b <- Seq(1, 2, 3, 7, 10, 64)
      rank <- Seq(1L, n / 2 + 1, n)
    } yield (rank, n, b)
    val df = cases.toDF("rank", "n", "b")
    // bucket sizes differ by at most 1 and sum to n; bucket ids are
    // 1..min(b, n); bucket is monotone in rank
    val out = Seq(1, 2, 3, 7, 10, 64).map { b =>
      df.where(col("b") === b).select(col("rank"), col("n"),
        graft.operators.Windows.ntileFromRank(col("rank"), col("n"), b).as("bucket"))
        .as[(Long, Long, Long)].collect().map { case (rank, n, bucket) =>
          assert(bucket === refNtile(rank, n, b), s"rank=$rank n=$n b=$b")
          bucket
        }
    }
    assert(out.flatten.nonEmpty)
  }

  test("refNtile itself satisfies the NTILE partition laws (scalacheck)") {
    val gen = for {
      n <- Gen.chooseNum(1L, 5000L)
      b <- Gen.chooseNum(1, 100)
    } yield (n, b)
    checkProp(forAll(gen) { case (n, b) =>
      val buckets = (1L to n).map(refNtile(_, n, b))
      val sizes = buckets.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val distinct = sizes.keySet
      // ids are exactly 1..min(b,n); sizes differ by at most one and
      // larger buckets come first; monotone non-decreasing assignment
      distinct == (1L to math.min(b.toLong, n)).toSet &&
        (sizes.values.max - sizes.values.min) <= 1 &&
        sizes.toSeq.sortBy(_._1).map(_._2).sliding(2).forall(s => s.head >= s.last) &&
        buckets.sliding(2).forall(s => s.head <= s.last)
    })
  }

  test("bloom bitset has no false negatives for arbitrary key sets") {
    // one distributed build over a randomly chosen key set, then every
    // member must pass mightContain — by construction, for any hashes.
    val keys = Gen.listOfN(300, Gen.chooseNum(Long.MinValue, Long.MaxValue))
      .sample.getOrElse(List.tabulate(300)(i => i.toLong * 2654435761L))
    val df = keys.toDF("k")
    val bitset = graft.operators.Bloom.buildBitset(df, "k", nBits = 4096)
    val pass = df.where(graft.operators.Bloom.mightContain(col("k"), bitset)).count()
    assert(pass === keys.length,
      s"false negative: only $pass of ${keys.length} members pass")
  }
}
