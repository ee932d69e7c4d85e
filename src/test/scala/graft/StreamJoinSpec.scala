package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamJoin

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  test("stream-stream interval join matches clicks within the window, expires state") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val joined = StreamJoin.purchasesWithRecentClicks(
      purchases.toDF(), clicks.toDF(), windowMinutes = 30)
    val q = joined.writeStream.format("memory").queryName("graft_sjoin")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(Ev(1, 100, ts(1000)), Ev(1, 101, ts(2500)), Ev(2, 102, ts(1000)))
      purchases.addData(Ev(1, 200, ts(2600))) // clicks 100 (1600s ago) & 101 (100s ago): only within 1800s both
      q.processAllAvailable()
      // advance watermarks far so the left-outer unmatched rows flush
      clicks.addData(Ev(9, 900, ts(100000)))
      purchases.addData(Ev(3, 300, ts(100000))) // user 3 has no clicks
      q.processAllAvailable()
      clicks.addData(Ev(9, 901, ts(200000)))
      purchases.addData(Ev(9, 902, ts(200000)))
      q.processAllAvailable()
      val rows = spark.table("graft_sjoin")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(rows.contains((200L, 100L)) && rows.contains((200L, 101L))) // both clicks within 30 min
      assert(rows.contains((300L, -1L))) // unmatched purchase emitted after watermark
    } finally q.stop()
  }
}
