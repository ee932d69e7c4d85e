package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityModel
import graft.queries.TextQueries

class QualityModelSpec extends SparkSpec {

  private def rawFeatures = TextQueries.qualityFeatures(
    graft.sources.TableLoader.load(spark, Sf, "documents"))

  /** The reference pipeline: identical fixed-point arithmetic on
    * collected raw features — floor'd long sums for the feature stats
    * AND the per-step gradients, the same left-associated expressions
    * everywhere. Returns (weights, standardized features, labels). */
  private def referenceTrain(raw: Array[(Array[Double], Double)], lr: Double,
                             steps: Int): (Array[Double], Array[Array[Double]]) = {
    val S = QualityModel.Scale
    val n = raw.length.toDouble
    val k = raw.head._1.length
    val stats = Array.tabulate(k) { j =>
      val s = raw.map(r => math.floor(r._1(j) * S).toLong).sum
      val s2 = raw.map(r => math.floor(r._1(j) * r._1(j) * S).toLong).sum
      val m = (s / S) / n
      val e2 = (s2 / S) / n
      val v = e2 - m * m
      (m, if (v > 0) math.sqrt(v) else 1.0)
    }
    val xs = raw.map { case (x, _) =>
      Array.tabulate(k)(j => (x(j) - stats(j)._1) / stats(j)._2)
    }
    val w = Array.fill(k + 1)(0.0)
    for (_ <- 1 to steps) {
      val sums = Array.fill(k + 1)(0L)
      var i = 0
      while (i < xs.length) {
        val err = raw(i)._2 - QualityModel.forward(w, xs(i))
        sums(0) += math.floor(err * S).toLong
        var j = 0
        while (j < k) { sums(j + 1) += math.floor(err * xs(i)(j) * S).toLong; j += 1 }
        i += 1
      }
      var j = 0
      while (j <= k) { w(j) = w(j) + lr * (sums(j) / S) / n; j += 1 }
    }
    (w, xs)
  }

  private def collectRaw = rawFeatures
    .select(TextQueries.QualityFeatCols.map(col) :+ col("y"): _*)
    .collect()
    .map(r => (Array(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)),
      r.getDouble(4)))

  test("distributed standardize+train equals the in-memory reference bit-for-bit") {
    val rawDf = rawFeatures.localCheckpoint(true)
    val (f, _) = QualityModel.standardize(rawDf, TextQueries.QualityFeatCols)
    val w = QualityModel.train(f, TextQueries.QualityFeatCols, "y", 2.0, 25)
    val (wRef, _) = referenceTrain(collectRaw, 2.0, 25)
    assert(w.toSeq === wRef.toSeq, s"distributed ${w.toSeq} != reference ${wRef.toSeq}")
  }

  test("training is bit-stable across input partitionings") {
    val rawDf = rawFeatures.localCheckpoint(true)
    val (f, _) = QualityModel.standardize(rawDf, TextQueries.QualityFeatCols)
    val w1 = QualityModel.train(f.repartition(1), TextQueries.QualityFeatCols, "y", 2.0, 5)
    val w7 = QualityModel.train(f.repartition(7), TextQueries.QualityFeatCols, "y", 2.0, 5)
    assert(w1.toSeq === w7.toSeq)
  }

  test("the learned filter beats the majority-class baseline, both classes predicted") {
    val rawDf = rawFeatures.localCheckpoint(true)
    val (f, _) = QualityModel.standardize(rawDf, TextQueries.QualityFeatCols)
    val w = QualityModel.train(f, TextQueries.QualityFeatCols, "y", 2.0, 25)
    val agg = QualityModel.score(f, TextQueries.QualityFeatCols, w).agg(
      avg((col("pred") === col("y").cast("long")).cast("double")),
      avg(col("y")),
      countDistinct(col("pred"))).head()
    val (acc, base, nPred) = (agg.getDouble(0), agg.getDouble(1), agg.getLong(2))
    val majority = math.max(base, 1.0 - base)
    assert(acc > majority, s"accuracy $acc does not beat majority $majority")
    assert(nPred === 2L, "degenerate classifier: one predicted class")
  }

  test("stored lifecycle: commit-once, stored == from-scratch weights, serve equals fresh scores") {
    // Isolate the lake root so this spec never reuses (or pollutes) a
    // driver run's committed model.
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft_qual_vt").toString
    val prev = spark.conf.getOption("spark.graft.lake.root")
    spark.conf.set("spark.graft.lake.root", tmpRoot)
    try {
      val first = TextQueries.qualityStoredQ(spark, Sf).collect().map(_.toSeq).toSeq
      val root = graft.sinks.LakeRoot.root(spark, Sf, "quality_model_v1")
      assert(graft.sinks.VersionedTable.latestVersion(spark, root) === Some(0L))
      // Second run must NOT retrain: still exactly version 0, and the
      // serve is deterministic.
      val second = TextQueries.qualityStoredQ(spark, Sf).collect().map(_.toSeq).toSeq
      assert(graft.sinks.VersionedTable.latestVersion(spark, root) === Some(0L),
        "second run committed a new model version — the freeze is broken")
      assert(second === first)
      // Stored weights equal a from-scratch train on the same
      // historical slice bit-for-bit (order-independent fixed-point
      // gradient sums).
      val hist = rawFeatures.where(col("doc_id") % 16 =!= 0).localCheckpoint(true)
      val (f, statsRef) = QualityModel.standardize(hist, TextQueries.QualityFeatCols)
      val wRef = QualityModel.train(f, TextQueries.QualityFeatCols, "y", 2.0, 25)
      val model = graft.sinks.VersionedTable.read(spark, root, Some(0L))
        .collect().sortBy(_.getAs[Int]("j"))
      assert(model.map(_.getAs[Double]("w")).toSeq === wRef.toSeq)
      assert(model.drop(1).map(r =>
          (r.getAs[Double]("mean"), r.getAs[Double]("sd"))).toSeq === statsRef.toSeq)
      // Stored-path scores equal scoring the batch with the fresh
      // model row for row (same standardization expression, same
      // forward pass).
      val batch = rawFeatures.where(col("doc_id") % 16 === 0)
      val fb = TextQueries.QualityFeatCols.zipWithIndex.foldLeft(batch) {
        case (df, (c, j)) =>
          df.withColumn(c, (col(c) - lit(statsRef(j)._1)) / lit(statsRef(j)._2))
      }
      val freshScores = QualityModel.score(fb, TextQueries.QualityFeatCols, wRef)
        .select(col("doc_id"), col("y").cast("long").as("label_heur"),
          col("p_micro"), col("pred"))
        .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
      assert(first === freshScores)
      assert(first.nonEmpty, "empty delta batch — the lifecycle gate is vacuous")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.graft.lake.root", v)
      case None => spark.conf.unset("spark.graft.lake.root")
    }
  }

  test("refresh contract: injected drift commits exactly one new version, then stabilizes") {
    // The no-drift half lives in the previous test (two runs on the
    // same corpus stay at version 0). Here the delta batch's text is
    // replaced with pathological repetition (no stopwords, low alpha,
    // extreme rep ratio) — feature means many stored sds away — so the
    // serve must retrain ON the drifted batch, commit it as v1, serve
    // v1, and measure z ~ 0 on the next identical run (no v2).
    val root = java.nio.file.Files.createTempDirectory("graft_qual_drift")
      .toString + "/model"
    val d = graft.sources.TableLoader.load(spark, Sf, "documents")
    val drifted = d.withColumn("text",
      when(col("doc_id") % 16 === 0,
        concat_ws(" ", typedLit(Seq.fill(40)("zzzz!!!!")))).otherwise(col("text")))
    val first = TextQueries.qualityStoredServe(spark, drifted, root)
      .collect().map(_.toSeq).toSeq
    assert(graft.sinks.VersionedTable.latestVersion(spark, root) === Some(1L),
      "injected drift must commit exactly one refresh version")
    val second = TextQueries.qualityStoredServe(spark, drifted, root)
      .collect().map(_.toSeq).toSeq
    assert(graft.sinks.VersionedTable.latestVersion(spark, root) === Some(1L),
      "a second run on the SAME drifted corpus must not commit again " +
        "(the refresh model's stats describe the batch)")
    assert(second === first)
    // The serve genuinely uses the refreshed closure: v1's weights
    // equal a from-scratch train on the drifted batch, not v0's.
    val batch = TextQueries.qualityFeatures(
      drifted.where(col("doc_id") % 16 === 0)).localCheckpoint(true)
    val (fb, statsRef) = QualityModel.standardize(batch, TextQueries.QualityFeatCols)
    val wRef = QualityModel.train(fb, TextQueries.QualityFeatCols, "y", 2.0, 25)
    val v1 = graft.sinks.VersionedTable.read(spark, root, Some(1L))
      .collect().sortBy(_.getAs[Int]("j"))
    assert(v1.map(_.getAs[Double]("w")).toSeq === wRef.toSeq)
    val v0 = graft.sinks.VersionedTable.read(spark, root, Some(0L))
      .collect().sortBy(_.getAs[Int]("j"))
    assert(v0.map(_.getAs[Double]("w")).toSeq !== wRef.toSeq,
      "drift fixture too weak: refresh weights equal the frozen ones")
  }
}
