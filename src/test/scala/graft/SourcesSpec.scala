package graft

import java.io.{File, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}
import java.nio.file.Files

import graft.sources.{XmlRecordSource, ZipSource}
import graft.sinks.PartitionedWriter
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("XML render -> parse round-trips records including escapes") {
    val rows = Seq(
      Seq("id" -> "1", "name" -> "a<b&c>d"),
      Seq("id" -> "2", "name" -> "plain"))
    val xml = XmlRecordSource.renderXml("rec", rows.iterator)
    val parsed = XmlRecordSource.parseRecords(xml, "rec").toSeq
    assert(parsed === Seq(Map("id" -> "1", "name" -> "a<b&c>d"), Map("id" -> "2", "name" -> "plain")))
  }

  test("XML distributed read parses partition-local documents") {
    val docs = Seq(
      XmlRecordSource.renderXml("r", Iterator(Seq("k" -> "1", "v" -> "x"))),
      XmlRecordSource.renderXml("r", Iterator(Seq("k" -> "2", "v" -> "y")))).toDS()
    val df = XmlRecordSource.read(docs, "r", Seq("k", "v"))
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSet === Set("1" -> "x", "2" -> "y"))
  }

  test("ZipSource reads entries from zip archives via binaryFile") {
    val dir = Files.createTempDirectory("graftzip").toFile
    val f = new File(dir, "a.zip")
    val zout = new ZipOutputStream(new FileOutputStream(f))
    zout.putNextEntry(new ZipEntry("inner.txt"))
    zout.write("hello zip".getBytes)
    zout.closeEntry(); zout.close()
    val entries = ZipSource.entries(spark, dir.getAbsolutePath)
    val got = entries.select("entry", "content").collect()
      .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1)))).toSet
    assert(got === Set(("inner.txt", "hello zip")))
  }

  test("PartitionedWriter clusterBy sorts rows within output files") {
    val out = Files.createTempDirectory("graftclust").toFile.getAbsolutePath + "/t"
    val df = spark.read.parquet(s"$Sf/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"))
    assert(graft.sinks.PartitionedWriter.write(df, out, Seq("o_orderstatus"),
      clusterBy = Seq("o_orderkey")))
    val dir = new File(s"$out/o_orderstatus=O")
    val file = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val keys = spark.read.parquet(file.getAbsolutePath)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(keys === keys.sorted, "rows in file not clustered")
  }

  test("PartitionedWriter writes per-partition dirs and honors skip-if-exists") {
    val out = Files.createTempDirectory("graftlake").toFile.getAbsolutePath + "/t"
    val df = Seq((1, "2024", "01"), (2, "2024", "02")).toDF("v", "y", "m")
    assert(PartitionedWriter.write(df, out, Seq("y", "m")))
    assert(new File(s"$out/y=2024/m=01").exists())
    // skip mode: existing target -> no write, returns false
    assert(!PartitionedWriter.write(df, out, Seq("y", "m"), overwritePartitions = false))
    // dynamic overwrite of a single partition leaves others in place
    val df2 = Seq((3, "2024", "02")).toDF("v", "y", "m")
    assert(PartitionedWriter.write(df2, out, Seq("y", "m")))
    val back = spark.read.parquet(out)
    assert(back.where(col("m") === "01").count() === 1)
  }
}
