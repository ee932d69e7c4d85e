package graft

import graft.queries.RelationalQueries

class PercentileSketchSpec extends SparkSpec {

  test("approx_count_distinct sketch stays within 5% of exact") {
    val exact = graft.queries.RelationalQueries.qDistinctAgg(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = graft.queries.RelationalQueries.qDistinctApprox(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (flag, (p, s)) =>
      val (ap, as_) = approx(flag)
      assert(math.abs(ap - p).toDouble / p < 0.05, s"$flag parts $ap vs $p")
      assert(math.abs(as_ - s).toDouble / s < 0.05, s"$flag supps $as_ vs $s")
    }
  }

  test("merged HLL sketches stay within 5% of exact distinct counts") {
    import org.apache.spark.sql.functions._
    val exact = spark.read.parquet(s"$Sf/orders.parquet")
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = RelationalQueries.qDistinctHllSketch(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (prio, d) =>
      assert(math.abs(approx(prio) - d).toDouble / d < 0.05,
        s"$prio: merged-sketch ${approx(prio)} vs exact $d")
    }
  }

  test("approx_top_k heavy hitters match exact counts when capacity covers the keys") {
    import org.apache.spark.sql.functions._
    val exactCounts = spark.read.parquet(s"$Sf/orders.parquet")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val top = RelationalQueries.qHeavyHittersApprox(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(top.length === 10)
    // every reported key carries its exact count (capacity >= distinct keys)
    top.foreach { case (k, n) => assert(exactCounts(k) === n, s"cust $k: $n") }
    // and the reported count multiset equals the exact top-10 multiset
    val exactTop10 = exactCounts.values.toSeq.sorted.reverse.take(10)
    assert(top.map(_._2).toSeq.sorted.reverse === exactTop10)
  }

  test("count-min sketch overestimates only, within eps*N of exact") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.TextQueries.termFreqCmsQ(spark, Sf).collect()
    assert(rows.length === 20)
    // The exact ground truth lives HERE, not in the query: the operator
    // itself is sketch-native (CMS + approx_top_k in one pass).
    val exactCounts = spark.read.parquet(s"$Sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalTerms = exactCounts.values.sum
    val bound = math.ceil(0.0001 * totalTerms * 2.718).toLong // eps*e slack
    rows.foreach { r =>
      val term = r.getString(0)
      val exact = exactCounts(term)
      val (topk, cms) = (r.getAs[Long]("topk_count"), r.getAs[Long]("cms_count"))
      // capacity (10000) >= corpus vocabulary, so approx_top_k counts are exact
      assert(topk === exact, s"$term: approx_top_k $topk vs exact $exact")
      assert(cms >= exact, s"$term: CMS must never underestimate")
      assert(cms - exact <= math.max(1L, bound), s"$term: $cms vs $exact")
    }
  }

  test("approx percentile sketch stays within 1% of the exact rank selection") {
    val exact = RelationalQueries.qPercentiles(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = RelationalQueries.qPercentilesApprox(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (seg, (p50, p90)) =>
      val (a50, a90) = approx(seg)
      assert(math.abs(a50 - p50).toDouble / p50 < 0.01, s"$seg p50 $a50 vs $p50")
      assert(math.abs(a90 - p90).toDouble / p90 < 0.01, s"$seg p90 $a90 vs $p90")
    }
  }
}
