package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization via `flatMapGroupsWithState` — the
  * continuous form of the batch `q_sessionize` operator (gap-based
  * session split; reference analogue: the groupby-shift session
  * pattern, full_stock_pipeline.py:324-330).
  *
  * A session closes when `gapSec` passes with no event for the key;
  * the closed session is emitted exactly once, when the first
  * later-than-gap event arrives (or on processing-time timeout for
  * keys that went quiet). State per key is one open session
  * (start, last, count) — after a timeout close it shrinks to a
  * tombstone carrying only the next session id, so the counter
  * survives quiet periods and (user, session_id) stays unique.
  * Either way it's one tiny row per key — bounded regardless of stream length, the
  * property that keeps an unbounded clickstream safe: 100M active
  * users is 100M tiny state rows, partitioned by key across the
  * cluster's state stores.
  */
object Sessionizer {

  case class Click(user_id: Long, ts_sec: Long)
  case class OpenSession(sessionId: Long, startSec: Long, lastSec: Long, n: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                        start_sec: Long, end_sec: Long)

  def updateSessions(gapSec: Long, closeQuiet: Boolean)(
      key: Long, clicks: Iterator[Click],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    if (clicks.isEmpty && state.hasTimedOut) {
      // key went quiet past the gap: close, but KEEP the session-id
      // counter in a tombstone (n = 0, no timeout re-armed) — removing
      // state here would restart the user's next session at id 0 and
      // emit a duplicate (user, session_id) key downstream
      val s = state.get
      if (s.n == 0L) return Iterator.empty // stray timeout on a tombstone
      state.update(OpenSession(s.sessionId + 1, 0L, 0L, 0L))
      return Iterator.single(SessionOut(key, s.sessionId, s.n, s.startSec, s.lastSec))
    }
    val ordered = clicks.toSeq.sortBy(_.ts_sec)
    var open = state.getOption
    val closed = Seq.newBuilder[SessionOut]
    ordered.foreach { c =>
      open match {
        case Some(s) if s.n == 0L => // tombstone: resume the counter
          open = Some(OpenSession(s.sessionId, c.ts_sec, c.ts_sec, 1))
        case Some(s) if c.ts_sec - s.lastSec <= gapSec =>
          open = Some(s.copy(lastSec = math.max(s.lastSec, c.ts_sec), n = s.n + 1))
        case Some(s) =>
          closed += SessionOut(key, s.sessionId, s.n, s.startSec, s.lastSec)
          open = Some(OpenSession(s.sessionId + 1, c.ts_sec, c.ts_sec, 1))
        case None =>
          open = Some(OpenSession(0L, c.ts_sec, c.ts_sec, 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      if (closeQuiet && s.n > 0L) state.setTimeoutDuration(gapSec * 1000)
    }
    closed.result().iterator
  }

  /** Wire a Click stream into gap sessionization. Append output: each
    * session appears exactly once, after it closes — when the key's
    * first later-than-gap event arrives.
    *
    * `closeQuiet = true` additionally closes sessions whose key goes
    * silent, via a processing-time timeout. NOTE: registered timeouts
    * make the micro-batch engine run batches continuously (each batch
    * re-checks expiry), so `processAllAvailable`-style draining never
    * settles — use it in deployments with a trigger interval, keep it
    * off for deterministic tests/backfills. */
  def sessions(clicks: Dataset[Click], gapSec: Long,
               closeQuiet: Boolean = false): Dataset[SessionOut] = {
    val spark = clicks.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (closeQuiet) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    clicks.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        updateSessions(gapSec, closeQuiet))
  }
}
