package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components (see
  * [[Dedup]] for large-star/small-star CC): fixed-point-arithmetic
  * PageRank by synchronous power iteration.
  *
  * All rank arithmetic is integer (rank scaled by 1e6, damping as a
  * basis-point-style 85/100 rational, contributions via integral
  * division `pr div outdeg`), so the result is bit-identical across
  * engines and partitionings — a floating-point PageRank depends on
  * partial-sum order and cannot be hash-checked. The deliberate cost
  * is the truncation of each division: this is "PageRank with floor
  * division", the same function the DuckDB oracle computes, and rank
  * ORDER converges exactly like the float version for the iteration
  * counts used here.
  *
  * Scale shape: each iteration is one equijoin of the edge list with
  * the (nodes-sized) rank table on the source key plus one groupBy on
  * the destination key — the same shuffle pair every distributed
  * PageRank (e.g. GraphX's) pays. Ranks are lazily localCheckpointed
  * per iteration so the plan stays flat (5 iterations would otherwise
  * nest 10 shuffles deep and re-run earlier rounds on recompute).
  */
object Graph {

  /** Synchronous PageRank over a directed edge list.
    *
    * @param edges DataFrame with `src` and `dst` long columns. Every
    *              node is assumed to have at least one OUT-edge (true
    *              for symmetrized graphs; dangling-node mass is
    *              otherwise dropped, as in the classic formulation).
    * @param iters number of power iterations (synchronous updates).
    * @return (node, pr) with pr scaled by 1e6; initial rank 1e6 per
    *         node, damping 0.85 as `150000 + (85 * contribs) div 100`.
    */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    val deg = edges.groupBy(col("src").as("dsrc"))
      .agg(count(lit(1)).as("outdeg"))
    // Edge list with out-degree riding along; reused by every
    // iteration, so pin it once (lazy — materializes on first use).
    val e = edges.join(deg, col("src") === col("dsrc"))
      .select(col("src"), col("dst"), col("outdeg"))
      .localCheckpoint(false)
    var ranks = deg.select(col("dsrc").as("node"), lit(1000000L).as("pr"))
    for (_ <- 1 to iters) {
      ranks = e.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("pr div outdeg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("contribs"))
        .select(col("dst").as("node"),
          (lit(150000L) + expr("(85L * contribs) div 100L")).as("pr"))
        .localCheckpoint(false)
    }
    ranks
  }
}
