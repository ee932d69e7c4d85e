package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch
import graft.queries.RelationalQueries
import graft.sinks.{LakeRoot, VersionedTable}

/** The stored-sketch lifecycle (q_distinct_hll_inc /
  * q_heavy_hitters_stored): splitting the build into lake-committed
  * marker-stamped parts and serving from the stored sketch bytes must
  * be semantically invisible — the same contract the bm25/minhash/IVF
  * incremental paths pin against their from-scratch twins.
  */
class SketchLifecycleSpec extends SparkSpec {

  test("stored-incremental HLL serve equals the inline one-pass twin row-for-row") {
    val inline = RelationalQueries.qDistinctHllSketch(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val stored = RelationalQueries.qDistinctHllInc(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // Identical per-(priority, month) input rows -> identical sketch
    // registers -> union (register max, order-independent) gives the
    // SAME estimate whether sketches were stored or inline.
    assert(stored.toSeq === inline.toSeq)
  }

  test("sketch builds are build-once: a second serve commits nothing new") {
    RelationalQueries.qDistinctHllInc(spark, Sf).collect()
    RelationalQueries.qHeavyHittersStored(spark, Sf).collect()
    val roots = Seq("hll_orders_v1", "cms_orders_v1", "cms_cands_v1")
      .map(LakeRoot.root(spark, Sf, _))
    val before = roots.map(r => VersionedTable.versions(spark, r))
    before.zip(roots).foreach { case (vs, r) =>
      assert(vs.size === 2, s"$r: expected historical+batch, got $vs")
    }
    RelationalQueries.qDistinctHllInc(spark, Sf).collect()
    RelationalQueries.qHeavyHittersStored(spark, Sf).collect()
    assert(roots.map(r => VersionedTable.versions(spark, r)) === before)
    // both parts are content-marked (the guard keys on markers, not ids)
    roots.foreach { r =>
      assert(VersionedTable.versionsWithMarker(spark, r, "split_historical").size === 1)
      assert(VersionedTable.versionsWithMarker(spark, r, "split_batch").size === 1)
    }
  }

  test("merged stored CMS is bit-identical to the single-pass sketch") {
    RelationalQueries.qHeavyHittersStored(spark, Sf).collect() // ensure built
    val cmsRoot = LakeRoot.root(spark, Sf, "cms_orders_v1")
    val stored = VersionedTable.readAll(spark, cmsRoot)
      .select(col("sk")).collect().map(_.getAs[Array[Byte]](0))
    val merged = stored.map(b => CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(b)))
      .reduce((a, b) => a.mergeInPlace(b))
    val onePass = spark.read.parquet(s"$Sf/orders.parquet")
      .agg(expr("count_min_sketch(o_custkey, 0.0001d, 0.99d, 42)").as("sk"))
      .head().getAs[Array[Byte]](0)
    val out = new java.io.ByteArrayOutputStream()
    merged.writeTo(out)
    // CMS merge is EXACT: counter sums per cell — storing per-month
    // sketches loses nothing vs sketching the whole table in one pass.
    assert(java.util.Arrays.equals(out.toByteArray, onePass))
  }

  test("distributed cms_merge equals the driver-side fold bit-for-bit") {
    RelationalQueries.qHeavyHittersStored(spark, Sf).collect() // ensure built
    val cmsRoot = LakeRoot.root(spark, Sf, "cms_orders_v1")
    val stored = VersionedTable.readAll(spark, cmsRoot)
    // The serve plan's aggregate: map-side partial merges across
    // partitions, final merge on an executor, driver sees bytes only.
    val distributed = stored
      .agg(graft.expressions.CmsMergeAgg.mergeCol(spark, col("sk")).as("sk"))
      .head().getAs[Array[Byte]](0)
    val driverFold = stored.select(col("sk")).collect()
      .map(r => CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](0))))
      .reduce((a, b) => a.mergeInPlace(b))
    val out = new java.io.ByteArrayOutputStream()
    driverFold.writeTo(out)
    // Cell-wise addition is associative/commutative: any partial split
    // across partitions serializes to the SAME bytes.
    assert(java.util.Arrays.equals(distributed, out.toByteArray))
    // And the point-estimate expression reads them back exactly.
    val probe = stored.sparkSession.read
      .parquet(s"$Sf/orders.parquet").select(col("o_custkey")).limit(5)
    val viaExpr = probe.crossJoin(
        broadcast(stored.agg(
          graft.expressions.CmsMergeAgg.mergeCol(spark, col("sk")).as("sk"))))
      .select(col("o_custkey"),
        graft.expressions.CmsMergeAgg.estimateCol(
          spark, col("sk"), col("o_custkey")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    viaExpr.foreach { case (k, est) =>
      assert(est === driverFold.estimateCount(k))
    }
  }

  test("stored-bloom decontamination equals the exact one-shot twin and prunes the probe") {
    val exact = queries.TextQueries.decontaminateQ(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val served = queries.TextQueries.decontamBloomIncQ(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Bloom has no false negatives and the exact confirm join removes
    // the false positives, so the stored-prefilter serve is EXACT.
    assert(served.toSeq === exact.toSeq)
    // Build-once: two marker-stamped parts, a second serve adds nothing.
    val nBits = queries.TextQueries.DecontamBloomBits
    val root = LakeRoot.root(spark, Sf, s"decontam_bloom_${nBits}_v1")
    val vs = VersionedTable.versions(spark, root)
    assert(vs.size === 2)
    queries.TextQueries.decontamBloomIncQ(spark, Sf).collect()
    assert(VersionedTable.versions(spark, root) === vs)
    // The stored filter genuinely prunes: rebuild the merged bitset the
    // serve path uses and count train shingles passing it vs all.
    val bitset = graft.operators.Bloom.bitsetFromWords(
      VersionedTable.readAll(spark, root)
        .groupBy(col("word")).agg(org.apache.spark.sql.functions.bit_or(col("bits")).as("bits"))
        .collect().map(r => (r.getInt(0), r.getLong(1))), nBits)
    val ex = spark.read.parquet(s"$Sf/documents.parquet")
      .where(pmod(col("doc_id"), lit(29L)) =!= 0)
      .select(explode(graft.expressions.ShingleHashes
        .shingleHashesNative(spark, col("text"), 8)).as("h"))
    val full = ex.count()
    val pruned = ex.where(graft.operators.Bloom.mightContain(col("h"), bitset)).count()
    assert(pruned < full,
      s"bloom prefilter pruned nothing: $pruned of $full train shingles pass")
  }

  test("streamed sketch maintenance serves the one-pass twin exactly; re-run is a no-op") {
    val inline = RelationalQueries.qDistinctHllSketch(spark, Sf).collect().toSeq
    val streamed = RelationalQueries.qDistinctHllStream(spark, Sf).collect().toSeq
    // HLL union is register-max: associative and split-independent, so
    // per-batch sketches union to the SAME registers as one pass.
    assert(streamed === inline)
    val root = LakeRoot.child(LakeRoot.root(spark, Sf, "hll_stream_v1"), "sketches")
    val vs = VersionedTable.versions(spark, root)
    assert(vs.size === 4, s"expected one version per micro-batch, got $vs")
    // Drained re-run over the same checkpoint: no new batches, no new
    // versions, same serve.
    val again = RelationalQueries.qDistinctHllStream(spark, Sf).collect().toSeq
    assert(again === inline)
    assert(VersionedTable.versions(spark, root) === vs)
  }

  test("ensurePart crash recovery: a lost part rebuilds alone, the other is reused") {
    // Simulate a crash between the two part commits: build both, then
    // delete the BATCH part's version wholesale (directory + marker).
    val exact = RelationalQueries.qDistinctHllSketch(spark, Sf).collect().toSeq
    RelationalQueries.qDistinctHllInc(spark, Sf).collect()
    val root = LakeRoot.root(spark, Sf, "hll_orders_v1")
    val histV = VersionedTable.versionsWithMarker(spark, root, "split_historical").min
    val batchV = VersionedTable.versionsWithMarker(spark, root, "split_batch").min
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/v=$batchV"), true)
    assert(VersionedTable.versionsWithMarker(spark, root, "split_batch").isEmpty)
    // Replay: the historical part is REUSED (same version id, no new
    // commit), only the lost batch part rebuilds, and the serve is
    // again row-identical to the inline twin.
    val served = RelationalQueries.qDistinctHllInc(spark, Sf).collect().toSeq
    assert(served === exact)
    assert(VersionedTable.versionsWithMarker(spark, root, "split_historical") === Seq(histV))
    // The rebuilt part gets a fresh commit (its version id may be
    // REUSED if the lost version was the newest — ids restart at
    // latest+1 — but the directory and marker are newly landed).
    val rebuilt = VersionedTable.versionsWithMarker(spark, root, "split_batch")
    assert(rebuilt.size === 1, s"batch part should rebuild exactly once, got $rebuilt")
    assert(batchV != histV && rebuilt.head != histV)
  }

  test("stored heavy hitters: estimates are overestimate-only and top-10 is exact here") {
    val exact = spark.read.parquet(s"$Sf/orders.parquet")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val served = RelationalQueries.qHeavyHittersStored(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(served.length === 10)
    // CMS error is one-sided: an estimate never undercounts.
    served.foreach { case (k, est) =>
      assert(est >= exact(k), s"cust $k: est $est < exact ${exact(k)}")
    }
    // At this corpus size eps*N << 1, so estimates ARE the exact
    // counts and the served set equals the exact top-10 (desc count,
    // asc key) — the candidates covered it and the sketch didn't blur.
    val exactTop = exact.toSeq.sortBy { case (k, n) => (-n, k) }.take(10)
    assert(served.toSeq === exactTop)
  }
}
