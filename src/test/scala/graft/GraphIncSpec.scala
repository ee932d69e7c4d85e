package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph
import graft.queries.GraphQueries
import graft.sinks.VersionedTable

/** Pins graph_pagerank_inc's contract: the incrementally-maintained
  * per-round PageRank state is BIT-IDENTICAL to from-scratch state over
  * the full graph (exact incremental view maintenance, every round and
  * every node — far stronger than the top-25 the driver hashes), the
  * delta split is non-trivial, the stored lifecycle is build-once
  * (marker-guarded, idempotent re-serve), and the driver query's output
  * equals graph_pagerank's.
  */
class GraphIncSpec extends SparkSpec {

  private def symPairs(filter: org.apache.spark.sql.Column) = {
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = spark.read.parquet(s"$Sf/orders.parquet").where(filter)
      .select(col("o_orderkey"), col("o_custkey"))
    val raw = li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
    raw.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(raw.select(col("s").as("src"), col("c").as("dst")))
      .distinct()
  }

  test("incremental fold reproduces from-scratch state bit-for-bit, all rounds") {
    val isDelta = col("o_orderkey") % 16 === 0
    val hist = symPairs(!isDelta)
    val full = symPairs(lit(true))
    val dEff = symPairs(isDelta).join(hist, Seq("src", "dst"), "left_anti")
    // The split must be non-trivial on both sides for the test to
    // exercise anything.
    val nDelta = dEff.count()
    val nHist = hist.count()
    assert(nDelta > 0, "delta adds no new edges — split degenerate")
    assert(nDelta < nHist, "delta must be the small side")

    val histState = Graph.pageRankStates(hist, iters = 5)
    val incState = Graph.pageRankIncrement(histState, full, dEff, iters = 5)
    val scratch = Graph.pageRankStates(full, iters = 5)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("round"), col("node")).collect().map(_.toSeq).toSeq
    val inc = rows(incState)
    assert(inc.nonEmpty)
    assert(inc === rows(scratch))

    // The delta genuinely moved ranks (the equality above is not
    // vacuous): some node's round-5 rank differs between the
    // historical-only state and the folded state.
    val moved = incState.where(col("round") === 5)
      .join(histState.where(col("round") === 5)
        .select(col("node"), col("pr").as("prHist")), Seq("node"), "left")
      .where(col("prHist").isNull || col("pr") =!= col("prHist"))
      .count()
    assert(moved > 0)
  }

  test("driver query equals graph_pagerank; stored lifecycle is build-once") {
    val got = GraphQueries.qPageRankInc(spark, Sf).collect().map(_.toSeq).toSeq
    val expect = GraphQueries.qPageRank(spark, Sf).collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    assert(got === expect)

    // Marker-guarded: one version per part, re-serve commits nothing.
    val root = new java.io.File(
      graft.sinks.LakeRoot.root(spark, Sf, "pagerank_state_v1")).getAbsolutePath
    assert(VersionedTable.versionsWithMarker(spark, root, "split_historical").size === 1)
    assert(VersionedTable.versionsWithMarker(spark, root, "split_batch").size === 1)
    val before = VersionedTable.versions(spark, root)
    GraphQueries.qPageRankInc(spark, Sf).count()
    assert(VersionedTable.versions(spark, root) === before)
  }

  test("streamed fold chain equals graph_pagerank; replay lands nothing") {
    val got = GraphQueries.qPageRankStream(spark, Sf).collect().map(_.toSeq).toSeq
    val expect = GraphQueries.qPageRank(spark, Sf).collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    assert(got === expect)

    val base = new java.io.File(
      graft.sinks.LakeRoot.root(spark, Sf, "pagerank_stream_v1"))
    val edges = new java.io.File(base, "edges").getAbsolutePath
    val state = new java.io.File(base, "state").getAbsolutePath
    // One ledger entry per micro-batch on BOTH roots, and a gapless
    // state ledger (the commit point).
    val stateMarked = VersionedTable.versionsWithMarker(spark, state, "batch_id")
    assert(stateMarked.nonEmpty)
    assert(VersionedTable.maxMarker(spark, state, "batch_id").get ===
      stateMarked.size - 1)
    assert(VersionedTable.versionsWithMarker(spark, edges, "batch_id").size ===
      stateMarked.size)
    // Replay over the drained source: nothing lands on either root.
    val beforeE = VersionedTable.versions(spark, edges)
    val beforeS = VersionedTable.versions(spark, state)
    GraphQueries.qPageRankStream(spark, Sf).count()
    assert(VersionedTable.versions(spark, edges) === beforeE)
    assert(VersionedTable.versions(spark, state) === beforeS)
  }
}
