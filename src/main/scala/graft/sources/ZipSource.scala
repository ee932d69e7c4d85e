package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders

/** Zip-archive ingest plumbing — re-expresses the reference's
  * `stream_zip_file` (/root/reference/prefect/flows/ingest_web_to_gcs.py:68-75)
  * without the single-node download: archives land in object storage,
  * Spark's `binaryFile` source splits them across executors, and each
  * partition decompresses its own archives. Entries are returned as
  * (archive, entry, bytes) so downstream parsers (e.g. XmlRecordSource)
  * stay format-agnostic.
  */
object ZipSource {
  case class ZipEntryRow(archive: String, entry: String, content: Array[Byte])

  def entries(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
    bin.as[(String, Array[Byte])].flatMap { case (path, bytes) =>
      val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
      val out = scala.collection.mutable.ArrayBuffer.empty[ZipEntryRow]
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) out += ZipEntryRow(path, e.getName, zin.readAllBytes())
        e = zin.getNextEntry
      }
      out
    }(Encoders.product[ZipEntryRow]).toDF()
  }
}
