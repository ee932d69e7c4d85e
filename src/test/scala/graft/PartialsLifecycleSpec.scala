package graft

import graft.queries.RelationalQueries
import graft.sinks.{LakeRoot, VersionedTable}

/** The exact materialized-partials lifecycle (q1_pricing_inc /
  * q_cube_stored): where SketchLifecycleSpec pins the APPROXIMATE
  * stored summaries (HLL/CMS/KLL/Bloom), this pins the exact member of
  * the club — splitting the Q1 build into lake-committed month
  * partials and serving Q1 and the CUBE from them must be BIT-exact
  * against the one-pass fact-level twins, because every stored measure
  * (decimal sums, per-row-rounded long cents, long counts) is exactly
  * additive over any disjoint split of the facts.
  */
class PartialsLifecycleSpec extends SparkSpec {

  test("stored-partials Q1 serve equals the one-pass flagship bit-for-bit") {
    val inline = RelationalQueries.q1PricingSummary(spark, Sf).collect().toSeq
    val stored = RelationalQueries.q1PricingInc(spark, Sf).collect().toSeq
    assert(stored === inline)
  }

  test("cube served from the base cuboid equals the fact-level cube") {
    val inline = RelationalQueries.qCube(spark, Sf).collect().toSeq
    val stored = RelationalQueries.qCubeStored(spark, Sf).collect().toSeq
    assert(stored === inline)
  }

  test("stored-partials basket serve equals the one-pass affinity bit-for-bit") {
    val inline = RelationalQueries.qBasketAffinity(spark, Sf).collect().toSeq
    val stored = RelationalQueries.qBasketInc(spark, Sf).collect().toSeq
    assert(stored === inline)
    // Build-once: a second serve commits nothing new.
    val root = LakeRoot.root(spark, Sf, "basket_partials_v1")
    val vs = VersionedTable.versions(spark, root)
    assert(vs.size === 2, s"expected historical+batch, got $vs")
    RelationalQueries.qBasketInc(spark, Sf).collect()
    assert(VersionedTable.versions(spark, root) === vs)
  }

  test("partials build once; both serves share the same two marked versions") {
    RelationalQueries.q1PricingInc(spark, Sf).collect()
    RelationalQueries.qCubeStored(spark, Sf).collect()
    val root = LakeRoot.root(spark, Sf, "lineitem_partials_v1")
    val vs = VersionedTable.versions(spark, root)
    assert(vs.size === 2, s"expected historical+batch, got $vs")
    assert(VersionedTable.versionsWithMarker(spark, root, "split_historical").size === 1)
    assert(VersionedTable.versionsWithMarker(spark, root, "split_batch").size === 1)
    // A second serve of EITHER query commits nothing new — the build
    // guard keys on the content markers, not the caller.
    RelationalQueries.q1PricingInc(spark, Sf).collect()
    RelationalQueries.qCubeStored(spark, Sf).collect()
    assert(VersionedTable.versions(spark, root) === vs)
  }
}
