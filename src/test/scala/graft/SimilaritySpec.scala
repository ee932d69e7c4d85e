package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$Sf/embeddings.parquet")

  test("cosine of identical vectors is 1.0 (1e6 micro-units)") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    assert(df.select(VectorFunctions.cosineMicro(col("a"), col("b"))).head.getLong(0) === 1000000L)
  }

  test("cosine of orthogonal vectors is 0") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("a", "b")
    assert(df.select(VectorFunctions.cosineMicro(col("a"), col("b"))).head.getLong(0) === 0L)
  }

  test("bruteForceTopK returns k ordered neighbors per query") {
    val q = emb.where(col("vec_id") === 0)
    val out = Similarity.bruteForceTopK(q, emb, k = 5).collect()
    assert(out.length === 5)
    val cos = out.map(_.getAs[Long]("cos_micro")).toSeq
    assert(cos === cos.sorted.reverse)
    assert(out.forall(_.getAs[Long]("n_id") != 0L))
  }

  test("LSH top-k recall@10 vs brute force is reasonable on real embeddings") {
    val q = emb.where(col("vec_id") % 100 === 0)
    val bf = Similarity.bruteForceTopK(q, emb, k = 10)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(q, emb, k = 10, nPlanes = 8)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect lsh).size.toDouble / bf.size
    // 8-plane single-table multi-probe on near-uniform synthetic vectors:
    // recall is modest by design; the scale path trades recall for the
    // O(n^2)->O(n/2^p) candidate cut. Guard against regression only.
    assert(recall >= 0.2, s"recall=$recall")
  }

  test("IVF top-k recall@10 beats random-bucket baseline on real embeddings") {
    val q = emb.where(col("vec_id") % 100 === 0)
    val bf = Similarity.bruteForceTopK(q, emb, k = 10)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(q, emb, k = 10, nCentroids = 16, nProbe = 4)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    // the synthetic embeddings are near-uniform (no cluster structure),
    // so IVF recall is bounded near the scanned fraction; probing 4/16
    // buckets must still beat that random-scan baseline (~0.25) clearly.
    assert(recall >= 0.35, s"recall=$recall")
  }

  test("knnClassify produces one deterministic label per query") {
    val q = emb.where(col("vec_id") % 50 === 0)
    val out = Similarity.knnClassify(q, emb, k = 5).collect()
    assert(out.length === q.count())
    assert(out.map(_.getAs[Long]("q_id")).distinct.length === out.length)
  }
}
