package graft

import org.apache.spark.sql.functions._
import graft.operators.Windows

class TopKNativeSpec extends SparkSpec {

  private def keyed(df: org.apache.spark.sql.DataFrame) =
    df.select("c_nationkey", "rnk", "c_custkey")
      .collect().map(_.toSeq).toSet

  test("native whole-operator top-k matches the window formulation exactly") {
    val df = spark.read.parquet(s"$Sf/customer.parquet")
    val part = Seq(col("c_nationkey"))
    val order = Seq(col("c_acctbal").desc, col("c_custkey"))
    val win = keyed(Windows.topKPerGroup(df, 3, part, order))
    val nat = keyed(Windows.topKPerGroupNative(df, 3, part, order))
    assert(nat === win)
    assert(nat.nonEmpty)
  }

  test("native top-k handles groups smaller than k and k=1") {
    val df = spark.read.parquet(s"$Sf/customer.parquet")
    val order = Seq(col("c_acctbal").desc, col("c_custkey"))
    // region has 5 nations; group by custkey%1000 makes sparse groups
    val sparse = df.withColumn("g", col("c_custkey") % 997)
    val win = Windows.topKPerGroup(sparse, 2, Seq(col("g")), order)
      .select("g", "rnk", "c_custkey").collect().map(_.toSeq).toSet
    val nat = Windows.topKPerGroupNative(sparse, 2, Seq(col("g")), order)
      .select("g", "rnk", "c_custkey").collect().map(_.toSeq).toSet
    assert(nat === win)
    val one = Windows.topKPerGroupNative(df, 1, Seq(col("c_nationkey")), order)
    assert(one.collect().forall(_.getAs[Int]("rnk") === 1))
  }

  test("native top-k normalizes floating group keys (0.0 and -0.0 are one group)") {
    import spark.implicits._
    val df = Seq((0.0, 1L), (-0.0, 2L), (0.0, 3L), (1.5, 4L)).toDF("g", "id")
    val order = Seq(col("id"))
    val win = Windows.topKPerGroup(df, 2, Seq(col("g")), order)
      .select("id", "rnk").collect().map(_.toSeq).toSet
    val nat = Windows.topKPerGroupNative(df, 2, Seq(col("g")), order)
      .select("id", "rnk").collect().map(_.toSeq).toSet
    assert(nat === win, "0.0/-0.0 must land in the same group, as the window version does")
  }

  test("native top-k resolves qualified column references and rejects k < 1") {
    val df = spark.read.parquet(s"$Sf/customer.parquet").alias("c")
    val nat = Windows.topKPerGroupNative(df, 1,
      Seq(col("c.c_nationkey")), Seq(col("c.c_acctbal").desc, col("c.c_custkey")))
    assert(nat.count() > 0)
    intercept[IllegalArgumentException] {
      Windows.topKPerGroupNative(df, 0, Seq(col("c_nationkey")), Seq(col("c_custkey")))
    }
  }

  test("native top-k plans partial+final execs with the exchange between (no Window, no full sort)") {
    val df = spark.read.parquet(s"$Sf/customer.parquet")
    val nat = Windows.topKPerGroupNative(df, 3,
      Seq(col("c_nationkey")), Seq(col("c_acctbal").desc, col("c_custkey")))
    nat.collect()
    val p = nat.queryExecution.executedPlan.toString
    assert(p.split("TopKPerGroup").length >= 3, s"expected partial+final execs:\n$p")
    assert(p.contains("Exchange"), "group-keyed exchange must sit between the stages")
    assert(!p.contains("Window"), "must not fall back to the window formulation")
    // The final stage streams sorted group runs, so ONE Sort is allowed
    // ABOVE the exchange — it orders the already-reduced survivors
    // (≤ k rows per group per map batch). Below the exchange (the raw
    // input side) there must be no Sort at all.
    // (under AQE the string repeats the tree as "== Initial Plan ==" —
    // only the final plan's subtree matters)
    val finalPlan = p.split("== Initial Plan ==")(0)
    val belowExchange = finalPlan.substring(finalPlan.indexOf("Exchange"))
    assert(!belowExchange.contains("Sort "),
      s"must not sort the raw input below the exchange:\n$p")
  }

  test("native top-k partial flush (tiny group cap) preserves exact results") {
    val df = spark.read.parquet(s"$Sf/customer.parquet")
    val order = Seq(col("c_acctbal").desc, col("c_custkey"))
    // 997 sparse groups with a cap of 4 forces hundreds of partial
    // flushes per partition; the final stage must still reduce to the
    // exact window answer.
    val sparse = df.withColumn("g", col("c_custkey") % 997)
    val win = Windows.topKPerGroup(sparse, 2, Seq(col("g")), order)
      .select("g", "rnk", "c_custkey").collect().map(_.toSeq).toSet
    spark.conf.set("spark.graft.topk.maxPartialGroups", "4")
    try {
      val nat = Windows.topKPerGroupNative(sparse, 2, Seq(col("g")), order)
        .select("g", "rnk", "c_custkey").collect().map(_.toSeq).toSet
      assert(nat === win)
    } finally spark.conf.unset("spark.graft.topk.maxPartialGroups")
  }
}
