package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization with `flatMapGroupsWithState` —
  * the custom-state path for semantics tumbling windows can't express
  * (gap-based sessions over an unbounded stream).
  *
  * State per user is one open session (constant size); sessions close
  * either when a later event arrives past the gap (emitted immediately)
  * or when the event-time watermark passes last_ts + gap (emitted on
  * timeout) — so state is bounded by active users, not history, which
  * is what survives an unbounded 100 TB/day stream. Batch equivalent:
  * `operators.Windows.sessionize` (same gap semantics, verified against
  * the DuckDB oracle via `ev_sessionize`).
  */
object SessionStream {
  case class Event(user_id: Long, event_id: Long, ts: java.sql.Timestamp, value: Double)
  case class OpenSession(startUs: Long, lastUs: Long, n: Long, valueCents: Long, seq: Long)
  case class Session(user_id: Long, session_seq: Long, n_events: Long,
                     start_us: Long, end_us: Long, value_cents: Long)

  val GapUs: Long = 1800L * 1000000L

  private def tsUs(t: java.sql.Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000

  /** Exact per-event cents, mirroring the batch/oracle expression
    * `cast(value as decimal(18,2)) * 100`: accumulating LONG cents keeps
    * the session sum order-independent and bit-exact, where a running
    * double sum could drift off the oracle's decimal total. */
  private def cents(value: Double): Long =
    java.math.BigDecimal.valueOf(value)
      .setScale(2, java.math.RoundingMode.HALF_UP).movePointRight(2).longValueExact

  def updateUser(userId: Long, events: Iterator[Event],
                 state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator.single(Session(userId, s.seq, s.n, s.startUs, s.lastUs, s.valueCents))
    }
    val sorted = events.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
    var out = List.empty[Session]
    var cur = state.getOption
    sorted.foreach { e =>
      val us = tsUs(e.ts)
      cur match {
        case Some(s) if us - s.lastUs > GapUs =>
          out ::= Session(userId, s.seq, s.n, s.startUs, s.lastUs, s.valueCents)
          cur = Some(OpenSession(us, us, 1, cents(e.value), s.seq + 1))
        case Some(s) =>
          cur = Some(s.copy(lastUs = math.max(s.lastUs, us), n = s.n + 1,
            valueCents = s.valueCents + cents(e.value)))
        case None =>
          cur = Some(OpenSession(us, us, 1, cents(e.value), 1))
      }
    }
    cur.foreach { s =>
      state.update(s)
      // close via watermark: timeout once event time passes last_ts + gap
      state.setTimeoutTimestamp(s.lastUs / 1000 + GapUs / 1000)
    }
    out.reverseIterator
  }

  /** Streaming gap-sessionization of an Event stream (requires an
    * upstream `withWatermark("ts", ...)`). */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[Session]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateUser)
  }
}
