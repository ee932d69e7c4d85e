package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure `Column`
  * compositions (`zip_with` + left-fold `aggregate`) — codegen'd, no UDF,
  * no driver-side collect. Accumulation is an in-order left fold in
  * DOUBLE so results are bit-identical across engines (IEEE-754 ops in
  * the same sequence), which the DuckDB oracle relies on.
  */
object VectorFunctions {
  /** Dot product in double precision (in-order fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine scaled to integer micro-units: floor(1e6 * cos). Exact to
    * compare/sort/hash across engines. */
  def cosineMicro(a: Column, b: Column): Column =
    floor(lit(1e6) * cosine(a, b)).cast("long")

  /** Deterministic random-hyperplane sign for LSH bucketing: the k-th
    * hyperplane's j-th coordinate is a fixed ±1 from a splitmix-style
    * 64-bit mix of (k, j) — no RNG state, so every executor derives the
    * same planes. */
  def hyperplaneSign(k: Int, j: Int): Float = {
    // Full avalanche (murmur3-style finalizer) before taking the decision
    // bit. Deciding on low-bit parity of an affine map would make every
    // plane a ± copy of one checkerboard vector (odd multipliers preserve
    // parity), collapsing 2^nPlanes buckets to 2; the high bit after
    // mixing is independent across (k, j).
    var h = j.toLong + k.toLong * 2654435761L
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    if (h >= 0L) 1.0f else -1.0f
  }

  /** Precomputed ±1 hyperplane as a literal float vector (exact in
    * float, so vec_dot folds are deterministic). */
  def hyperplane(k: Int, dim: Int): Array[Float] =
    Array.tabulate(dim)(j => hyperplaneSign(k, j))

  /** LSH bucket key: sign pattern of `nPlanes` hyperplane projections
    * packed into one LONG (bit k = sign of plane `planeOffset + k`), each
    * projection a codegen'd vec_dot against a literal plane. At 100 TB
    * this turns the O(n^2) similarity cross-join into a shuffle-on-bucket
    * join whose key is 8 bytes, and multi-probe neighbor buckets are
    * single XORs instead of string surgery. `planeOffset` selects a
    * disjoint plane family so banded callers get independent bands. */
  def lshBucket(spark: org.apache.spark.sql.SparkSession, vec: Column,
                nPlanes: Int, planeOffset: Int = 0): Column = {
    require(nPlanes >= 1 && nPlanes <= 62, s"packed-long bucket needs 1..62 planes, got $nPlanes")
    element_at(
      graft.expressions.LshBands.lshBands(spark, vec, 1, nPlanes, planeOffset), 1)
  }

  /** Plane count that bounds expected bucket occupancy by `targetOcc`
    * for a corpus of `n` vectors: ceil(log2(n / targetOcc)), clamped to
    * [floorP, cap]. Derived from ONE cheap corpus count, deterministic —
    * this is what makes the hyperplane grid adapt to the corpus the way
    * IVF's trained centroids already do: per-bucket candidate work stays
    * O(targetOcc) as n grows instead of O(n / 2^fixedPlanes). The cap
    * is the LONG-packed band-key width (62 sign bits — binding only
    * past ~targetOcc * 2^62 vectors, i.e. never), raised from the
    * packed-INT era's 24, whose per-band occupancy went linear again
    * past ~2.7e8 vectors. */
  def adaptivePlanes(n: Long, targetOcc: Int, floorP: Int = 8, cap: Int = 62): Int = {
    val needed = math.ceil(
      math.log(math.max(1L, n).toDouble / targetOcc) / math.log(2.0)).toInt
    math.min(cap, math.max(floorP, needed))
  }
}
