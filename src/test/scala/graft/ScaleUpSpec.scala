package graft

import org.apache.spark.sql.functions._

/** Pins the invariants the sf1 scaling evidence rests on (SURVEY §4a,
  * BENCH_r09_scale.json): ScaleUp's replicas must be structurally
  * IDENTICAL to the source per replica and disjoint across replicas,
  * or the decade's per-query growth ratios measure a changed
  * workload instead of the engine.
  */
class ScaleUpSpec extends SparkSpec {

  private lazy val out: String = {
    val dst = java.nio.file.Files.createTempDirectory("scaleup_spec").toString
    ScaleUp.run(spark, Sf, dst, replicas = 3)
    dst
  }
  private def src(t: String) = spark.read.parquet(s"$Sf/$t.parquet")
  private def rep(t: String) = spark.read.parquet(s"$out/$t.parquet")

  test("every fact table grows by exactly the replica count; dims are shared") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(rep(t).count() === 3 * src(t).count(), t)
    for (t <- Seq("region", "nation"))
      assert(rep(t).count() === src(t).count(), t)
  }

  test("replica 0 is the identity and id spaces are disjoint") {
    val a = src("documents").select("doc_id", "text").collect().map(_.toSeq).toSet
    val b = rep("documents").select("doc_id", "text").collect().map(_.toSeq).toSet
    assert(a.subsetOf(b))
    assert(rep("documents").select("doc_id").distinct().count() ===
      rep("documents").count())
  }

  test("id strides preserve the surface's modulus selections exactly") {
    // The residue-class populations must scale by the replica count —
    // the invariant that keeps %-based query sets (vec_id % 100,
    // o_orderkey % 16, doc_id % 29, ...) proportional.
    def grow(t: String, c: String, m: Int): Unit =
      assert(rep(t).where(col(c) % m === 0).count() ===
        3 * src(t).where(col(c) % m === 0).count(), s"$t.$c % $m")
    grow("embeddings", "vec_id", 100); grow("embeddings", "vec_id", 2)
    grow("orders", "o_orderkey", 16)
    grow("documents", "doc_id", 29); grow("documents", "doc_id", 1000)
  }

  test("documents: replicas share no tokens, so cross-replica overlap is zero") {
    // Replica 0 occupies the source id range; later replicas sit at
    // stride multiples above it.
    val srcMax = src("documents").agg(max("doc_id")).head.getLong(0)
    val toks = rep("documents")
      .select((col("doc_id") <= srcMax).as("base"),
        explode(split(col("text"), " ")).as("tok"))
    val shared = toks.where(col("base")).select("tok").distinct()
      .join(toks.where(!col("base")).select("tok").distinct(), "tok")
    assert(shared.count() === 0)
    // Disjointness must also survive the surface's [^a-z0-9]
    // normalization — the reason the suffix is all-alphanumeric
    // (`zzr<r>zz`): an `_`-carrying suffix loses its separator to
    // normalization and can collide with literal source tokens.
    val norm = toks.select(col("base"),
      regexp_replace(lower(col("tok")), "[^a-z0-9]", "").as("tok"))
      .where(length(col("tok")) > 0)
    val sharedNorm = norm.where(col("base")).select("tok").distinct()
      .join(norm.where(!col("base")).select("tok").distinct(), "tok")
    assert(sharedNorm.count() === 0)
    // n_chars stays consistent with the rewritten text.
    assert(rep("documents")
      .where(col("n_chars") =!= length(col("text"))).count() === 0)
  }

  test("embeddings: the dimension rotation preserves norms (orthogonality)") {
    // A circular shift reorders the same float32 components, so the
    // squared norm is the same term multiset — equal up to FP
    // summation order. Map each replica row to its source row by rank
    // (ids ascend identically within each replica block).
    val k = src("embeddings").count()
    val w = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
    val s = src("embeddings")
      .select(col("vec_id"), expr("vec_dot(embedding, embedding)").as("n"))
      .withColumn("r", row_number().over(w))
    val rp = rep("embeddings")
      .select(expr("vec_dot(embedding, embedding)").as("n2"),
        row_number().over(w).as("rk"))
      .withColumn("r", ((col("rk") - 1) % k) + 1)
    val bad = rp.join(s.select(col("r"), col("n")), "r")
      .where(abs(col("n") - col("n2")) > abs(col("n")) * 1e-6)
    assert(bad.count() === 0)
    // And replicas 1+ genuinely differ from the source vectors (the
    // rotation is not the identity), so cross-replica cosines are not
    // trivially 1.
    val srcMax = src("embeddings").agg(max("vec_id")).head.getLong(0)
    val identical = rep("embeddings").where(col("vec_id") > srcMax)
      .select(col("embedding").as("e2"),
        row_number().over(w).as("rk"))
      .withColumn("r", ((col("rk") - 1) % k) + 1)
      .join(src("embeddings")
        .select(col("embedding").as("e1"), row_number().over(w).as("r")), "r")
      .where(col("e1") === col("e2"))
    assert(identical.count() === 0)
  }
}
