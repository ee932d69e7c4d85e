package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.expressions.FloatVecDot.vecDot

/** Similarity search over embedding columns (`array<float>`).
  *
  * `bruteForceTopK` is the exact baseline: broadcast the (small) query
  * set against the corpus — a map-side join, no shuffle of the corpus —
  * then a per-query top-k window. `lshTopK` is the 100 TB path: bucket
  * both sides with random-hyperplane LSH and join on bucket, turning the
  * cross join into an equijoin whose shuffle is keyed on buckets.
  *
  * L2 norms are computed once per vector before the join (one fold per
  * row instead of two extra folds per pair); the cosine denominator is
  * still sqrt(na)*sqrt(nb), bit-identical to computing it pairwise.
  */
object Similarity {

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors by cosine (integer micro-cosine for deterministic ties). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val spark = queries.sparkSession
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .withColumn("q_n", vecDot(spark, col("q_vec"), col("q_vec")))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_vec"),
      col("label").as("n_label"))
      .withColumn("n_n", vecDot(spark, col("n_vec"), col("n_vec")))
    val scored = broadcast(q).crossJoin(c)
      .where(col("q_id") =!= col("n_id"))
      .withColumn("cos_micro",
        floor(lit(1e6) * (vecDot(spark, col("q_vec"), col("n_vec")) /
          (sqrt(col("q_n")) * sqrt(col("n_n"))))).cast("long"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_micro").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("n_id"), col("n_label"), col("cos_micro"))
  }

  /** LSH-bucketed approximate top-k: candidates only within matching
    * hyperplane-sign buckets (probing all single-bit-flip neighbor
    * buckets for recall), then exact rescoring per candidate. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, nPlanes: Int = 8,
              dim: Int = 64): DataFrame = {
    val spark = queries.sparkSession
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_vec"),
      col("label").as("n_label"))
      .withColumn("n_n", vecDot(spark, col("n_vec"), col("n_vec")))
      .withColumn("bucket", lshBucket(spark, col("n_vec"), nPlanes, dim))
    // multi-probe: query probes its own bucket plus all 1-bit flips.
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .withColumn("q_n", vecDot(spark, col("q_vec"), col("q_vec")))
      .withColumn("bucket0", lshBucket(spark, col("q_vec"), nPlanes, dim))
      .withColumn("probe", explode(array(
        (Seq(col("bucket0")) ++ (0 until nPlanes).map { i =>
          concat(
            substring(col("bucket0"), 1, i),
            when(substring(col("bucket0"), i + 1, 1) === "1", lit("0")).otherwise(lit("1")),
            substring(col("bucket0"), i + 2, nPlanes - i - 1))
        }): _*)))
    val scored = broadcast(q).join(c, col("probe") === col("bucket"))
      .where(col("q_id") =!= col("n_id"))
      .withColumn("cos_micro",
        floor(lit(1e6) * (vecDot(spark, col("q_vec"), col("n_vec")) /
          (sqrt(col("q_n")) * sqrt(col("n_n"))))).cast("long"))
      .select(col("q_id"), col("n_id"), col("n_label"), col("cos_micro")).distinct()
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_micro").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }

  /** IVF-style approximate top-k: corpus vectors are assigned to their
    * nearest of `nCentroids` fixed centroid vectors (deterministic seed
    * set: the lowest vec_ids), queries probe the `nProbe` nearest
    * centroid lists and rescore exactly. Versus hyperplane LSH this is
    * the data-adaptive bucketing: buckets follow the corpus
    * distribution, and nProbe trades recall for candidates scanned. At
    * 100 TB the assignment is one broadcast-join pass and search
    * shuffles only the probed buckets. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 2): DataFrame = {
    val spark = queries.sparkSession
    val cents = broadcast(corpus.orderBy(col("vec_id")).limit(nCentroids)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
      .withColumn("cent_n", vecDot(spark, col("cent_vec"), col("cent_vec"))))
    def nearestCentroids(df: DataFrame, vecCol: String, idCol: String, keep: Int) = {
      val scored = df.crossJoin(cents)
        .withColumn("cent_cos",
          vecDot(spark, col(vecCol), col("cent_vec")) / sqrt(col("cent_n")))
      val w = Window.partitionBy(col(idCol)).orderBy(col("cent_cos").desc, col("cent_id"))
      scored.withColumn("cent_rnk", row_number().over(w)).where(col("cent_rnk") <= keep)
        .drop("cent_vec", "cent_n", "cent_cos", "cent_rnk")
    }
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_vec"),
      col("label").as("n_label"))
      .withColumn("n_n", vecDot(spark, col("n_vec"), col("n_vec")))
    val assigned = nearestCentroids(c, "n_vec", "n_id", keep = 1)
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .withColumn("q_n", vecDot(spark, col("q_vec"), col("q_vec")))
    val probed = nearestCentroids(q, "q_vec", "q_id", keep = nProbe)
    val scored = broadcast(probed).join(assigned, "cent_id")
      .where(col("q_id") =!= col("n_id"))
      .withColumn("cos_micro",
        floor(lit(1e6) * (vecDot(spark, col("q_vec"), col("n_vec")) /
          (sqrt(col("q_n")) * sqrt(col("n_n"))))).cast("long"))
      .select(col("q_id"), col("n_id"), col("n_label"), col("cos_micro")).distinct()
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_micro").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("n_id"), col("n_label"), col("cos_micro"))
  }

  /** kNN majority-vote classification of query vectors (k nearest by
    * cosine, most frequent label wins, smaller label on ties). */
  def knnClassify(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val nn = bruteForceTopK(queries, corpus, k)
    val votes = nn.groupBy(col("q_id"), col("n_label")).agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("votes").desc, col("n_label"))
    votes.withColumn("r", row_number().over(w)).where(col("r") === 1)
      .select(col("q_id"), col("n_label").as("predicted_label"), col("votes"))
  }
}
