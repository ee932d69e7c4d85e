package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: attach to each purchase the clicks of
  * the same user within a trailing window — the streaming counterpart
  * of the batch as-of join (`operators.Windows.asOfJoin`).
  *
  * Both sides carry watermarks and the join condition bounds event time
  * on both sides, so Spark can expire join state: a click is held only
  * until the watermark passes `click_ts + window` — bounded state on
  * unbounded streams, which is what a 100 TB/day event feed needs.
  * Left-outer semantics emit unmatched purchases once their watermark
  * expires.
  */
object StreamJoin {

  /** purchases(user_id, ts, event_id) ⋈ clicks(user_id, ts, event_id)
    * within `windowMinutes` before each purchase. */
  def purchasesWithRecentClicks(purchases: DataFrame, clicks: DataFrame,
                                windowMinutes: Int, watermark: String = "10 minutes"): DataFrame = {
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", watermark)
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", watermark)
    p.join(c,
      expr(s"""p_user = c_user AND
               c_ts >= p_ts - INTERVAL $windowMinutes MINUTES AND
               c_ts <= p_ts"""),
      "leftOuter")
  }
}
