package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.DedupStream

class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  test("streaming dedup drops repeats within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val deduped = DedupStream.dropDupTexts(input.toDF(), "text", "10 minutes")
    val query = deduped.writeStream
      .format("memory").queryName("graft_dedup_stream")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(
        Doc(1, ts(100), "alpha beta gamma"),
        Doc(2, ts(110), "alpha beta gamma"), // dup within horizon
        Doc(3, ts(120), "delta epsilon zeta"))
      query.processAllAvailable()
      input.addData(Doc(4, ts(200), "alpha beta gamma")) // still within horizon
      query.processAllAvailable()
      val ids = spark.table("graft_dedup_stream").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(ids === Seq(1L, 3L))
    } finally query.stop()
  }
}
