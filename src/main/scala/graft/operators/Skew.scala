package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for heavy-hitter keys at 100 TB.
  *
  * AQE's skew-join split handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on in GraftSession); these
  * operators cover the two shapes AQE can't fix:
  *  - `saltedAggregate`: a groupBy whose key distribution is so skewed
  *    that one reducer would own a heavy hitter. Two-phase aggregation
  *    over (key, salt) then key — the salt comes from a deterministic
  *    hash of tie-breaker columns, so results are reproducible.
  *  - `replicatedJoin`: a fact⋈dim join with heavy-hitter fact keys and
  *    a dim too large to broadcast whole: the dim's rows for the listed
  *    hot keys are replicated across all salts so the fact side can
  *    spread each hot key over `salts` reducers.
  */
object Skew {

  /** Deterministic salt in [0, salts) from tie-breaker columns. */
  def saltCol(salts: Int, tieBreakers: Seq[Column]): Column =
    pmod(xxhash64(tieBreakers: _*), lit(salts.toLong))

  /** Two-phase (partial per (key, salt), final per key) aggregation for
    * sum/count-style aggregates. `partials` maps output column name to
    * the per-row column to sum. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
                      tieBreakers: Seq[Column],
                      partials: Map[String, Column]): DataFrame = {
    val salted = df.withColumn("_salt", saltCol(salts, tieBreakers))
    val phase1 = salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }.toSeq: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(sum(col(partials.head._1)).as(partials.head._1),
        partials.keys.toSeq.tail.map(n => sum(col(n)).as(n)): _*)
  }

  /** Join fact to dim on `key` with the dim rows for `hotKeys`
    * replicated over `salts` buckets; non-hot keys join with salt 0 so
    * the dim is scanned once. */
  def replicatedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
                     hotKeys: Seq[Long]): DataFrame = {
    val hot = hotKeys.map(lit(_))
    val factSalted = fact.withColumn("_salt",
      when(col(key).isin(hot: _*), pmod(xxhash64(fact.columns.toSeq.map(col): _*), lit(salts.toLong)))
        .otherwise(lit(0L)))
    val dimSalted = dim.withColumn("_dim_salt",
      explode(when(col(key).isin(hot: _*),
        sequence(lit(0L), lit(salts.toLong - 1)))
        .otherwise(array(lit(0L)))))
      .withColumnRenamed(key, s"${key}_dim")
    factSalted.join(dimSalted,
      factSalted(key) === dimSalted(s"${key}_dim") &&
        factSalted("_salt") === dimSalted("_dim_salt"))
      .drop("_salt", "_dim_salt", s"${key}_dim")
  }
}
