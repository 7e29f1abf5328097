package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Spark 4 arbitrary-state API (`transformWithState`) twins of the
  * engine's `flatMapGroupsWithState` stateful operators.
  *
  * Why both APIs exist in the engine: fMGWS couples ALL of a key's
  * state into one opaque value with a single timeout slot;
  * `StatefulProcessor` exposes typed named state slots
  * (Value/List/Map), MULTIPLE event-time timers per key, and built-in
  * per-slot TTL — the pieces a long-running ingest pipeline needs to
  * keep state bounded without hand-rolling eviction. These twins keep
  * the SEMANTICS of their fMGWS siblings (spec-pinned identical
  * outputs on the same input stream) so a deployment can move to the
  * new API without a results diff. Requires the RocksDB state store
  * provider (the API refuses the default HDFS-backed store), which is
  * also the scale choice: state spills to executor-local disk instead
  * of heap.
  */
object TwsStream extends Serializable {

  import SessionStream.{Ev, SessionOut, St}

  /** Sessionization processor: one ValueState slot holds the open
    * session; one event-time timer per user fires when the watermark
    * passes last-event + gap (replacing fMGWS's timeout slot). The
    * in-batch fold is byte-identical to [[SessionStream.sessions]] —
    * both emit through [[SessionStream.finish]].
    */
  private class SessionProcessor(gapMinutes: Int)
      extends StatefulProcessor[Long, Ev, SessionOut] {
    private val gapUs = gapMinutes * 60L * 1000000L
    private val gapMs = gapMinutes * 60L * 1000L
    @transient private var state: ValueState[St] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[St]("session",
        Encoders.product[St], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Ev],
                                 tv: TimerValues): Iterator[SessionOut] = {
      // per-user per-batch volume is small by construction; sort for
      // deterministic in-batch event-time order (same rule as fMGWS)
      val evs = rows.toIndexedSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var completed = List.empty[SessionOut]
      var cur = if (state.exists()) Some(state.get()) else None
      evs.foreach { e =>
        val us = e.ts.getTime * 1000L
        cur = cur match {
          case Some(s) if us - s.lastUs <= gapUs =>
            Some(s.copy(lastUs = us, nEvents = s.nEvents + 1,
              totalValue = s.totalValue + e.value))
          case Some(s) =>
            completed ::= SessionStream.finish(userId, s)
            Some(St(s.sessionSeq + 1, us, us, 1, e.value))
          case None =>
            Some(St(1, us, us, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // one live timer per key: drop the superseded expiry, arm the
        // new one (fMGWS's setTimeoutTimestamp did both implicitly)
        val expiry = s.lastUs / 1000L + gapMs
        getHandle.listTimers().foreach { t =>
          if (t != expiry) getHandle.deleteTimer(t)
        }
        getHandle.registerTimer(expiry)
      }
      completed.reverseIterator
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[SessionOut] =
      if (state.exists()) {
        val s = state.get()
        // stale-timer guard: only the CURRENT session's expiry closes
        // it (deleteTimer above makes staleness unreachable, but a
        // wrong fire here would silently truncate a live session)
        if (s.lastUs / 1000L + gapMs == info.getExpiryTimeInMs) {
          state.clear()
          Iterator.single(SessionStream.finish(userId, s))
        } else Iterator.empty
      } else Iterator.empty
  }

  /** [[SessionStream.sessions]] on the transformWithState API.
    * `events` needs (user_id, event_id, ts: timestamp, value).
    */
  def sessions(events: DataFrame, gapMinutes: Int = 30,
               watermark: String = "1 hour"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMinutes),
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class Doc(content_hash: String, ts: java.sql.Timestamp,
                 doc_id: Long, text: String)

  /** First-arrival processor: one Boolean ValueState per content hash
    * with a built-in TTL — the state-bounding knob
    * [[StreamDedup.firstArrivals]] gets from
    * `dropDuplicatesWithinWatermark`'s eviction, here declared per
    * slot instead of via the watermark. A key whose TTL lapsed
    * re-admits its next arrival (same contract as a hash evicted past
    * the watermark horizon).
    */
  private class FirstArrivalProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, Doc, Doc] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        Encoders.scalaBoolean, ttl)

    override def handleInputRows(hash: String, rows: Iterator[Doc],
                                 tv: TimerValues): Iterator[Doc] =
      if (!rows.hasNext || seen.exists()) Iterator.empty
      else {
        seen.update(true)
        // deterministic in-batch winner: earliest (ts, doc_id)
        Iterator.single(rows.minBy(d => (d.ts.getTime, d.doc_id)))
      }
  }

  /** [[StreamDedup.firstArrivals]] on the transformWithState API:
    * keep the first arrival per content hash, drop re-crawls; state
    * is one boolean per distinct hash, bounded by `ttl` (pass
    * `TTLConfig.NONE` for keep-forever). `docs` needs
    * (ts: timestamp, doc_id: long, text: string).
    *
    * Time mode follows the TTL: state TTL requires ProcessingTime
    * mode, but ProcessingTime makes the engine treat every trigger
    * as having work (a TTL could lapse at any moment), so an
    * untriggered query SPINS empty micro-batches and
    * `processAllAvailable` never returns — with a TTL, drive the
    * query with a real trigger interval or `Trigger.AvailableNow`.
    * Without one, TimeMode.None keeps the batch cadence data-driven.
    */
  def firstArrivals(docs: DataFrame,
                    ttl: TTLConfig = TTLConfig.NONE): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    docs
      .select(md5(col("text")).as("content_hash"), col("ts"),
        col("doc_id"), col("text"))
      .as[Doc]
      .groupByKey(_.content_hash)
      .transformWithState(new FirstArrivalProcessor(ttl),
        timeMode, OutputMode.Append())
  }
}
