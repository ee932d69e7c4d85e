package graft

import graft.sinks.Compactor

class CompactorSpec extends SparkSpec {
  import spark.implicits._

  test("compactLake shrinks fragmented partitions, preserves data, then no-ops") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/lake"
    val df = (0 until 2000).map(i => (i.toLong, i % 3, s"row_$i")).toDF("id", "p", "payload")
    // fragment: 16 files per partition (a streaming sink's typical debris)
    df.repartition(16).write.partitionBy("p").parquet(dir)
    val parts = Compactor.partitionDirs(spark, dir)
    assert(parts.length === 3)
    val before = spark.read.parquet(dir)
      .select("id", "p", "payload").as[(Long, Int, String)].collect().toSet
    val results = Compactor.compactLake(spark, dir, targetBytes = 512L * 1024 * 1024)
    assert(results.length === 3)
    assert(results.forall(r => r.compacted && r.filesBefore === 16 && r.filesAfter === 1),
      results.mkString("; "))
    val after = spark.read.parquet(dir)
      .select("id", "p", "payload").as[(Long, Int, String)].collect().toSet
    assert(after === before, "compaction must not change a single row")
    // second run: already compact, nothing read or rewritten
    val again = Compactor.compactLake(spark, dir, targetBytes = 512L * 1024 * 1024)
    assert(again.forall(r => !r.compacted && r.filesAfter === 1))
  }
}
