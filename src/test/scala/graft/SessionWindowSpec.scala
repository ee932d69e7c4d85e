package graft

import org.apache.spark.sql.functions._
import graft.operators.Windows

class SessionWindowSpec extends SparkSpec {

  test("builtin session_window agrees with the lag+cumsum sessionizer") {
    val events = graft.queries.EventQueries.events(spark, Sf)
    // builtin: merge events with gaps < 30 min into sessions per user
    val builtin = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val custom = Windows.sessionize(events, "user_id", "ts_us", "event_id",
        gap = 1800L * 1000000L)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    // same multiset of (user, session size): identical session structure.
    // (builtin gap is exclusive vs our exclusive ">" — both split when
    // gap > 30 min; boundary events landing exactly at 30 min are the
    // only divergence candidates and the corpus has micros precision.)
    assert(builtin === custom)
  }
}
