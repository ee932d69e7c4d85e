package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions._
import graft.streaming.SessionStream
import graft.streaming.SessionStream.{Event, Session}

class SessionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  test("streaming sessionization closes sessions on gap and on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = SessionStream.sessionize(
      input.toDS().withWatermark("ts", "0 seconds").as[Event])
    val query = sessions.writeStream
      .format("memory").queryName("graft_sessions")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: two events 100s apart (same session), user 7
      input.addData(Event(7L, 1L, ts(1000), 1.0), Event(7L, 2L, ts(1100), 2.0))
      query.processAllAvailable()
      // batch 2: event far past the gap -> closes session 1 immediately
      input.addData(Event(7L, 3L, ts(10000), 3.0))
      query.processAllAvailable()
      val afterGap = spark.table("graft_sessions").as[Session].collect()
      assert(afterGap.toSeq === Seq(Session(7L, 1L, 2L, 1000000000L, 1100000000L, 300L)))
      // batch 3: advance watermark far beyond last ts + gap -> session 2
      // closes via EventTimeTimeout (no new events for user 7 needed)
      input.addData(Event(8L, 4L, ts(100000), 1.0))
      query.processAllAvailable()
      input.addData(Event(8L, 5L, ts(200000), 1.0))
      query.processAllAvailable()
      val all = spark.table("graft_sessions").as[Session].collect().sortBy(s => (s.user_id, s.session_seq))
      assert(all.contains(Session(7L, 2L, 1L, 10000000000L, 10000000000L, 300L)))
    } finally query.stop()
  }
}
