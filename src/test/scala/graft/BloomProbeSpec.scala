package graft

import org.apache.spark.sql.functions._

/** The native bloom_probe kernel vs the legacy literal-array Column
  * formulation: the kernel exists to keep megabyte bitsets out of the
  * plan (driver latency), so the ONE thing to pin is bit-for-bit
  * position equality — a drifted hash fold would silently break the
  * no-false-negative contract against bitsets stored by earlier
  * rounds. */
class BloomProbeSpec extends SparkSpec {
  import graft.operators.Bloom

  test("native probe equals the literal formulation on random longs, negatives included") {
    import spark.implicits._
    val keys = spark.range(0, 5000)
      .select((xxhash64(col("id")) % 100000L).as("k")) // mixed-sign keys
    val build = keys.where(col("k") % 3 === 0)
    val bits = Bloom.buildBitset(build, "k", nBits = 1 << 12)
    val both = keys
      .withColumn("nat", Bloom.mightContain(spark, col("k"), bits, 3))
      .withColumn("lit", Bloom.mightContainLiteral(col("k"), bits, 3))
    assert(both.where(col("nat") =!= col("lit")).count() === 0)
    // no false negatives: every built key passes the native probe
    assert(build.where(!Bloom.mightContain(spark, col("k"), bits, 3)).count() === 0)
  }

  test("native probe mirrors the hash fold's null-skip semantics") {
    import spark.implicits._
    val df = Seq(Some(42L), None, Some(-7L)).toDF("k")
    val bits = Bloom.buildBitset(Seq(42L).toDF("k"), "k", nBits = 1 << 10)
    val rows = df
      .withColumn("nat", Bloom.mightContain(spark, col("k"), bits, 3))
      .withColumn("lit", Bloom.mightContainLiteral(col("k"), bits, 3))
      .collect()
    rows.foreach { r =>
      assert(!r.isNullAt(1), "native probe is non-nullable by contract")
      assert(r.getBoolean(1) === r.getBoolean(2))
    }
  }

  test("probe plan stays small: no array literal in the rendered plan") {
    import spark.implicits._
    val bits = Bloom.buildBitset(spark.range(100).select(col("id").as("k")), "k",
      nBits = 1 << 17)
    val probed = spark.range(1000).select(col("id").as("k"))
      .where(Bloom.mightContain(spark, col("k"), bits, 3))
    val planText = probed.queryExecution.executedPlan.toString
    assert(planText.length < 20000, s"plan text unexpectedly large: ${planText.length}")
    assert(planText.contains("bloom_probe"))
  }
}
