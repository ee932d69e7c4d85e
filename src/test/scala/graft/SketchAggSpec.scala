package graft

import org.apache.spark.sql.functions._
import graft.queries.RelationalQueries
import graft.sinks.{LakeRoot, VersionedTable}

/** The KLL-quantile and theta-set-op driver queries, built on Spark
  * 4.1's native Datasketches function surface (kll_sketch_agg_bigint /
  * kll_merge_agg_bigint / kll_sketch_get_quantile_bigint,
  * theta_sketch_agg / theta_sketch_estimate / theta_intersection /
  * theta_difference) — built-ins over custom expressions, per the
  * engine's preference order.
  *
  * Contract per family:
  *  - theta, exact regime (distinct keys < nominal 2^lgK): estimates
  *    are EXACTLY the true distinct counts — pinned by recomputing the
  *    intersection/difference with plain distinct-set Scala over the
  *    same rows (the driver re-pins this vs DuckDB INTERSECT SQL).
  *  - theta, estimation regime (keys >> nominal, deliberately tiny
  *    lgK): estimates within a loose multiple of the published
  *    ~1/sqrt(k) relative standard error.
  *  - KLL: served quantile values are actual stored inputs (INCLUSIVE
  *    search) whose NORMALIZED RANK is within the published rank-error
  *    bound of the requested rank — the right assertion for a quantile
  *    sketch (value-space error is unbounded on skewed data; rank
  *    error is the guarantee).
  *  - lifecycle: the stored build is build-once (second serve commits
  *    no new versions), mirroring the HLL/CMS lifecycle pins.
  */
class SketchAggSpec extends SparkSpec {

  private def orders = spark.read.parquet(s"$Sf/orders.parquet")

  test("theta set-op estimates are exact in the exact regime (vs distinct-set recompute)") {
    val rows = orders
      .where(col("o_orderdate") >= lit("1995-01-01").cast("date") &&
        col("o_orderdate") < lit("1997-01-01").cast("date"))
      .select(col("o_orderpriority"), col("o_custkey"), year(col("o_orderdate")).as("y"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val byYear: Map[Int, Map[String, Set[Long]]] =
      rows.groupBy(_._3).view.mapValues(
        _.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap).toMap
    val a = byYear(1995)
    val b = byYear(1996)
    val expected = a.keySet.intersect(b.keySet).toSeq.sorted.map { p =>
      val (sa, sb) = (a(p), b(p))
      (p, sa.size.toLong, sb.size.toLong,
        sa.intersect(sb).size.toLong, sa.diff(sb).size.toLong)
    }
    val got = RelationalQueries.qDistinctThetaOps(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got === expected)
  }

  test("theta estimation regime degrades to ~1/sqrt(k) relative error") {
    import spark.implicits._
    // 50k distinct keys into a k=1024 sketch: deep estimation mode.
    // RSE ~ 3.1%; 15% tolerance is ~5 sigma — safe against the
    // task-merge-order nondeterminism of the retained set.
    val n = 50000L
    val est = spark.range(n).toDF("id")
      .agg(expr("theta_sketch_estimate(theta_sketch_agg(id, 10))").as("est"))
      .head().getLong(0)
    assert(math.abs(est - n).toDouble / n < 0.15, s"est $est vs $n")
    // Intersection in estimation mode: [0, 30k) vs [20k, 50k) -> 10k.
    val skA = spark.range(0L, 30000L).toDF("id")
      .agg(expr("theta_sketch_agg(id, 10)").as("sk")).head().getAs[Array[Byte]](0)
    val skB = spark.range(20000L, 50000L).toDF("id")
      .agg(expr("theta_sketch_agg(id, 10)").as("sk")).head().getAs[Array[Byte]](0)
    val both = Seq((skA, skB)).toDF("a", "b")
      .select(expr("theta_sketch_estimate(theta_intersection(a, b))").as("e"))
      .head().getLong(0)
    // Intersection error scales with the UNION size (~50k over k=1024
    // effective samples), so the absolute band is wider: +-30% of the
    // true 10k is ~2 sigma of that error model... keep 40% for margin.
    assert(math.abs(both - 10000L) < 4000L, s"intersect est $both vs 10000")
    val only = Seq((skA, skB)).toDF("a", "b")
      .select(expr("theta_sketch_estimate(theta_difference(a, b))").as("e"))
      .head().getLong(0)
    assert(math.abs(only - 20000L) < 6000L, s"anotb est $only vs 20000")
  }

  test("stored KLL serve returns stored values within the published rank-error bound") {
    val eps = org.apache.datasketches.kll.KllSketch.getNormalizedRankError(200, false)
    val served = RelationalQueries.qPercentilesStored(spark, Sf).collect()
      .map(r => (r.getString(0), Seq(r.getLong(1), r.getLong(2), r.getLong(3)), r.getLong(4)))
    val exact: Map[String, Array[Long]] = orders
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val nMonths = orders
      .select(col("o_orderpriority"), date_trunc("month", col("o_orderdate")).as("m"))
      .distinct().collect().map(r => r.getString(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(served.map(_._1).toSeq === exact.keySet.toSeq.sorted)
    served.foreach { case (p, qs, months) =>
      assert(months === nMonths(p), s"$p month count")
      val vals = exact(p)
      qs.zip(Seq(0.5, 0.9, 0.99)).foreach { case (v, phi) =>
        // INCLUSIVE search returns a retained input value...
        assert(vals.contains(v), s"$p p$phi=$v is not an input value")
        // ...whose normalized rank is within the sketch's bound (2x
        // the 99%-confidence eps: merged sketches, 15 assertions).
        val rank = vals.count(_ <= v).toDouble / vals.length
        assert(math.abs(rank - phi) <= 2 * eps + 1.0 / vals.length,
          s"$p p$phi: served rank $rank")
      }
    }
  }

  test("KLL build is build-once: a second serve commits nothing new") {
    RelationalQueries.qPercentilesStored(spark, Sf).collect()
    val root = LakeRoot.root(spark, Sf, "kll_cents_v1")
    val before = VersionedTable.versions(spark, root)
    assert(before.size === 2, s"expected historical+batch, got $before")
    RelationalQueries.qPercentilesStored(spark, Sf).collect()
    assert(VersionedTable.versions(spark, root) === before)
    assert(VersionedTable.versionsWithMarker(spark, root, "split_historical").size === 1)
    assert(VersionedTable.versionsWithMarker(spark, root, "split_batch").size === 1)
  }

  test("KLL merge of stored parts covers all rows: quantile endpoints are global min/max") {
    import spark.implicits._
    // Serve rank 0.0 and 1.0 from the STORED parts: INCLUSIVE search
    // returns the global min/max iff the merge saw every stored
    // sketch's stream — a split-lost-rows bug cannot pass this.
    val root = LakeRoot.root(spark, Sf, "kll_cents_v1")
    RelationalQueries.qPercentilesStored(spark, Sf).collect() // ensure built
    val merged = VersionedTable.readAll(spark, root)
      .agg(expr("kll_sketch_get_quantile_bigint(kll_merge_agg_bigint(sk), " +
        "array(0.0d, 1.0d))").as("q"))
      .select(element_at(col("q"), 1).as("lo"), element_at(col("q"), 2).as("hi"))
      .as[(Long, Long)].head()
    val bounds = orders
      .select((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .agg(min(col("c")), max(col("c"))).as[(Long, Long)].head()
    assert(merged === bounds)
  }
}
