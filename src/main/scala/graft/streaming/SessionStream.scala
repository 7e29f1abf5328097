package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization: the Structured Streaming twin of
  * [[graft.operators.Sessionize.sessions]], built on
  * `flatMapGroupsWithState` with event-time timeout.
  *
  * Each user's open session lives in the state store; an event beyond
  * the gap closes the previous session (emitted downstream) and opens a
  * new one. A session with no activity for `gapMinutes` past the
  * watermark is closed by timeout — so state size is O(active users),
  * independent of stream length, and results are append-mode exact.
  *
  * Semantics match the batch operator: session_seq numbers a user's
  * sessions from 1 in event-time order; timestamps are epoch micros.
  * (Batch replay emits only gap-closed sessions — the still-open tail
  * session per user has not "timed out" in a finite input.)
  */
object SessionStream extends Serializable {

  case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp, value: Double)
  case class St(sessionSeq: Long, startUs: Long, lastUs: Long,
                nEvents: Long, totalValue: Double)
  case class SessionOut(user_id: Long, session_seq: Long, n_events: Long,
                        start_us: Long, end_us: Long, total_value: Double,
                        duration_us: Long)

  private[streaming] def finish(userId: Long, s: St): SessionOut =
    SessionOut(userId, s.sessionSeq, s.nEvents, s.startUs, s.lastUs,
      math.round(s.totalValue * 100).toDouble / 100.0, s.lastUs - s.startUs)

  /** `events` needs (user_id, event_id, ts: timestamp, value). */
  def sessions(events: DataFrame, gapMinutes: Int = 30,
               watermark: String = "1 hour"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val gapMs = gapMinutes * 60L * 1000L

    def update(userId: Long, batch: Iterator[Ev],
               state: GroupState[St]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(finish(userId, s))
      } else {
        // per-user per-batch volume is small by construction; sort for
        // deterministic in-batch event-time order
        val evs = batch.toIndexedSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var completed = List.empty[SessionOut]
        var cur = state.getOption
        evs.foreach { e =>
          val us = e.ts.getTime * 1000L
          cur = cur match {
            case Some(s) if us - s.lastUs <= gapUs =>
              Some(s.copy(lastUs = us, nEvents = s.nEvents + 1,
                totalValue = s.totalValue + e.value))
            case Some(s) =>
              completed ::= finish(userId, s)
              Some(St(s.sessionSeq + 1, us, us, 1, e.value))
            case None =>
              Some(St(1, us, us, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          if (eventTimeTimeoutAvailable(state))
            state.setTimeoutTimestamp(s.lastUs / 1000L + gapMs)
        }
        completed.reverseIterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Batch replays run the same lambda but reject timeout configuration;
    * probe via the watermark accessor (streaming-only feature).
    */
  private def eventTimeTimeoutAvailable(state: GroupState[St]): Boolean =
    try { state.getCurrentWatermarkMs(); true } catch { case _: Throwable => false }
}
