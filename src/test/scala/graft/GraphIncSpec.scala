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

  test("bfsIncrement equals from-scratch BFS: real split + insertion/shortcut/cap cases") {
    import spark.implicits._
    def dists(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("node")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    // Real-corpus split, the driver query's exact shape.
    val isDelta = col("o_orderkey") % 16 === 0
    val hist = symPairs(!isDelta)
    val full = symPairs(lit(true))
    val dEff = symPairs(isDelta).join(hist, Seq("src", "dst"), "left_anti")
    assert(dEff.count() > 0, "delta adds no new edges — split degenerate")
    val seeds = spark.read.parquet(s"$Sf/customer.parquet")
      .where(col("c_nationkey") === 0)
      .select((col("c_custkey") * 2).as("node"))
    val stored = Graph.bfsDistances(hist, seeds, maxDepth = 6)
    val inc = Graph.bfsIncrement(stored, full, dEff, maxDepth = 6)
    assert(dists(inc) === dists(Graph.bfsDistances(full, seeds, maxDepth = 6)))

    // Handcrafted adversarial cases on a chain 1-2-3-4-5-6-7-8-9 with
    // seed 1 and cap 4 (so 6..9 start OUTSIDE the stored table):
    def sym(es: Seq[(Long, Long)]) =
      es.toDF("src", "dst").unionAll(es.map(_.swap).toDF("src", "dst"))
    val chain = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L), (8L, 9L)))
    val seed1 = Seq(1L).toDF("node")
    val storedChain = Graph.bfsDistances(chain, seed1, maxDepth = 4)
    // Shortcut 1-6: 6 enters at dist 1 (insertion past the old cap),
    // 5 IMPROVES through the back edge (7 -> 2, 8 -> 3), and 9 enters
    // at dist 4 — improvements must propagate through OLD edges from
    // newly-inserted nodes, the exact blast-radius path.
    val delta = sym(Seq((1L, 6L)))
    val folded = Graph.bfsIncrement(storedChain,
      chain.unionAll(delta), delta, maxDepth = 4)
    val expect = Graph.bfsDistances(chain.unionAll(delta), seed1, maxDepth = 4)
    assert(dists(folded) === dists(expect))
    assert(dists(folded).toMap === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> 2L, 6L -> 1L, 7L -> 2L, 8L -> 3L, 9L -> 4L))

    // A delta that shortens nothing folds to the stored table verbatim.
    val noop = sym(Seq((2L, 3L))) // already present
    assert(dists(Graph.bfsIncrement(storedChain, chain, noop, maxDepth = 4))
      === dists(storedChain))
  }

  test("driver query equals graph_pagerank; stored lifecycle is build-once") {
    val got = GraphQueries.qPageRankInc(spark, Sf).collect().map(_.toSeq).toSeq
    val expect = GraphQueries.qPageRank(spark, Sf).collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    assert(got === expect)

    // Marker-guarded: one version per part, re-serve commits nothing.
    val root = graft.sinks.LakeRoot.root(spark, Sf, "pagerank_state_v1")
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

    val base = graft.sinks.LakeRoot.root(spark, Sf, "pagerank_stream_v1")
    val edges = graft.sinks.LakeRoot.child(base, "edges")
    val state = graft.sinks.LakeRoot.child(base, "state")
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

  test("streamed BFS fold equals the from-scratch full-graph walk") {
    // The second operator on the shared streamed-fold harness: the
    // final streamed state must equal qGraphBfs row for row (they
    // share the driver oracle verbatim; this pins it in-process too).
    val streamed = GraphQueries.qGraphBfsStream(spark, Sf).collect().toSeq
    val scratch = GraphQueries.qGraphBfs(spark, Sf).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed === scratch)
    // Replay: a second run (same checkpoint, all batches landed)
    // commits nothing new and serves the same rows.
    val root = graft.sinks.LakeRoot.root(spark, Sf, "bfs_stream_v1")
    val stateRoot = graft.sinks.LakeRoot.child(root, "state")
    val vs = VersionedTable.versions(spark, stateRoot)
    assert(GraphQueries.qGraphBfsStream(spark, Sf).collect().toSeq === scratch)
    assert(VersionedTable.versions(spark, stateRoot) === vs)
  }

  test("crash between edges and state commit: recovery REUSES the landed delta") {
    import graft.sinks.LakeRoot
    // Runs after the streamed-fold test, so the shared stream lake is
    // fully landed. Inject the documented crash: batch 2's delta landed
    // (edges marker _batch_id_2 survives) but its state commit did not
    // — delete the state version carrying marker value 2 AND the
    // checkpoint's commit record for batch 2, so the restart replays
    // batch 2 against a root whose edges ledger is one ahead.
    val base = LakeRoot.root(spark, Sf, "pagerank_stream_v1")
    val edges = LakeRoot.child(base, "edges")
    val state = LakeRoot.child(base, "state")
    val lastBatch = VersionedTable.maxMarker(spark, state, "batch_id").get
    val hc = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(hc)
    val stateV = VersionedTable
      .versionsWithMarkerValue(spark, state, "batch_id", lastBatch)
    assert(stateV.size === 1)
    fs.delete(new org.apache.hadoop.fs.Path(state, s"v=${stateV.head}"), true)
    fs.delete(new org.apache.hadoop.fs.Path(
      LakeRoot.child(base, "ckpt"), s"commits/$lastBatch"), false)
    val edgesBefore = VersionedTable.versions(spark, edges)

    val got = GraphQueries.qPageRankStream(spark, Sf).collect().map(_.toSeq).toSeq
    val expect = GraphQueries.qPageRank(spark, Sf).collect().map(_.toSeq).toSeq
    assert(got === expect) // the re-run fold is lossless
    // The recovery branch selected the landed delta by marker family
    // AND value — it was reused, never re-committed (a family-only
    // match would have recomputed an EMPTY delta against a history
    // that already contains the orphan, re-landed the stale state, and
    // grown the edges ledger by a duplicate-marker version).
    assert(VersionedTable.versions(spark, edges) === edgesBefore)
    assert(VersionedTable
      .versionsWithMarkerValue(spark, edges, "batch_id", lastBatch).size === 1)
    // The state ledger is whole again: marker value re-landed.
    assert(VersionedTable
      .versionsWithMarkerValue(spark, state, "batch_id", lastBatch).size === 1)
  }

  test("edges root folds past the version budget; ledger and hash survive") {
    import graft.sinks.LakeRoot
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.lake.root",
      java.nio.file.Files.createTempDirectory("graft-foldlake").toString)
    s2.conf.set("spark.graft.stream.edgesFoldBudget", "1")
    val got = GraphQueries.qPageRankStream(s2, Sf).collect().map(_.toSeq).toSeq
    val expect = GraphQueries.qPageRank(spark, Sf).collect().map(_.toSeq).toSeq
    assert(got === expect) // post-fold batches landed and folded losslessly
    val base = LakeRoot.root(s2, Sf, "pagerank_stream_v1")
    val edges = LakeRoot.child(base, "edges")
    val state = LakeRoot.child(base, "state")
    // History retired: one folded version, not one per micro-batch —
    // the listing/file-count debt is bounded by the budget, not the
    // stream's lifetime.
    assert(VersionedTable.versions(s2, edges).size === 1)
    // The replay ledger survived the folds at family max.
    val lastBatch = VersionedTable.maxMarker(s2, state, "batch_id").get
    assert(lastBatch >= 2) // 3-file fixture => >= 3 micro-batches
    assert(VersionedTable.maxMarker(s2, edges, "batch_id").contains(lastBatch))
    // Folded edges still serve the exact distinct-edge union.
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = spark.read.parquet(s"$Sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val raw = li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
    val full = raw.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(raw.select(col("s").as("src"), col("c").as("dst"))).distinct()
    val stored = VersionedTable.readAll(s2, edges)
    assert(stored.count() === full.count())
    assert(stored.join(full, Seq("src", "dst"), "left_anti").count() === 0L)
  }
}
