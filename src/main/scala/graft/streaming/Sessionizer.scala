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
  * keys that went quiet). `session_id` is the session's start second:
  * a key's sessions are disjoint intervals separated by more than the
  * gap, so their start times strictly increase and (user, session_id)
  * is unique WITHOUT any per-key counter memory. That lets a timeout
  * close remove the key's state entirely — no tombstone — so state
  * size is one small row per key with a currently-open session,
  * bounded by concurrent activity rather than by every key ever seen
  * (the property that keeps an unbounded churning key space — e.g.
  * anonymous visitor ids — safe on a long-running stream).
  */
object Sessionizer {

  case class Click(user_id: Long, ts_sec: Long)
  case class OpenSession(startSec: Long, lastSec: Long, n: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                        start_sec: Long, end_sec: Long)

  private def emit(key: Long, s: OpenSession): SessionOut =
    SessionOut(key, s.startSec, s.n, s.startSec, s.lastSec)

  def updateSessions(gapSec: Long, closeQuiet: Boolean)(
      key: Long, clicks: Iterator[Click],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    if (clicks.isEmpty && state.hasTimedOut) {
      // key went quiet past the gap: emit the session and DROP the
      // state row — session_id = startSec keeps (user, session_id)
      // unique with zero memory of past sessions
      val s = state.get
      state.remove()
      return Iterator.single(emit(key, s))
    }
    val ordered = clicks.toSeq.sortBy(_.ts_sec)
    var open = state.getOption
    val closed = Seq.newBuilder[SessionOut]
    ordered.foreach { c =>
      open match {
        case Some(s) if c.ts_sec - s.lastSec <= gapSec =>
          open = Some(s.copy(lastSec = math.max(s.lastSec, c.ts_sec), n = s.n + 1))
        case Some(s) =>
          closed += emit(key, s)
          open = Some(OpenSession(c.ts_sec, c.ts_sec, 1))
        case None =>
          open = Some(OpenSession(c.ts_sec, c.ts_sec, 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      if (closeQuiet) state.setTimeoutDuration(gapSec * 1000)
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
