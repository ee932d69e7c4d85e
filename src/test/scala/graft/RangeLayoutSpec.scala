package graft

import org.apache.spark.sql.functions._
import graft.sinks.RangeLayout

class RangeLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("range-clustered write: disjoint per-file key ranges, rows preserved, narrow scans prune") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rangelayout").toString
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_shipdate"), col("l_extendedprice"))
    val n = li.count()
    RangeLayout.writeRangeClustered(li, dir, nFiles = 8, col("l_shipdate"))

    val out = spark.read.parquet(dir)
    assert(out.count() === n, "clustering must not drop or duplicate rows")

    val stats = RangeLayout.fileStats(spark, dir, "l_shipdate")
      .selectExpr("file", "cast(min_key as string)", "cast(max_key as string)")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(stats.length >= 4, s"expected multiple files, got ${stats.length}")
    // Disjoint ranges: no file's [min,max] overlaps another's. This is
    // the property parquet min/max skipping needs the WRITER to provide.
    // Strict: the range partitioner sends equal keys to one partition,
    // so consecutive files cannot even share a boundary value.
    val sorted = stats.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Array((fa, _, maxA), (fb, minB, _)) =>
        assert(maxA < minB,
          s"file ranges overlap: $fa max=$maxA vs $fb min=$minB")
      case _ =>
    }
    // A one-month predicate must prune to a small fraction of the files.
    val statsDf = RangeLayout.fileStats(spark, dir, "l_shipdate")
    val touched = RangeLayout.filesToRead(statsDf,
      lit(java.sql.Date.valueOf("1995-06-01")),
      lit(java.sql.Date.valueOf("1995-06-30"))).count()
    assert(touched < stats.length / 2,
      s"narrow scan should touch a minority of files: $touched/${stats.length}")
  }

  test("zValue2 matches the reference bit-interleave and serves range scans on BOTH columns") {
    // Reference interleave on the driver.
    def zRef(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val grid = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
      .withColumn("z", RangeLayout.zValue2(col("x"), col("y"), bits = 6))
    val got = df.select("x", "y", "z").as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z === zRef(x, y, 6), s"($x,$y)") }

    // Z-order the grid into 16 files; a narrow band on EITHER dimension
    // must prune to a strict subset of files — the single-sort-order
    // property neither x-only nor y-only clustering has.
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    RangeLayout.writeRangeClustered(df, dir, nFiles = 16, col("z"))
    val boxes = spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(boxes.length >= 8, s"expected many files, got ${boxes.length}")
    val xTouched = boxes.count { case (_, mnx, mxx, _, _) => !(mxx < 8 || mnx > 15) }
    val yTouched = boxes.count { case (_, _, _, mny, mxy) => !(mxy < 8 || mny > 15) }
    assert(xTouched <= boxes.length / 2, s"x-band touched $xTouched/${boxes.length}")
    assert(yTouched <= boxes.length / 2, s"y-band touched $yTouched/${boxes.length}")
  }
}
