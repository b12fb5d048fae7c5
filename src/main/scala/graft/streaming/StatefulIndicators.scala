package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Custom streaming state via `mapGroupsWithState` (SURVEY.md §2.10 /
  * brief: KeyValueGroupedDataset state ops): a per-key running EMA that
  * continues its recursion across micro-batches — the streaming form of
  * `Indicators.ema`/`emaByKey`.
  *
  * State per key is a single (lastTs, ema) pair — bounded regardless of
  * stream length, the property that makes this shape safe for an
  * unbounded 100 TB/day stream. Within a batch, events are folded in
  * timestamp order; across batches, ordering is the stream's arrival
  * order per key (exactly how an incremental indicator service behaves).
  */
object StatefulIndicators {

  case class Tick(user_id: Long, ts: Long, value: Double)
  case class EmaState(lastTs: Long, ema: Double)
  case class EmaOut(user_id: Long, lastTs: Long, ema: Double, n_seen: Long)

  def updateEma(span: Int)(
      key: Long, ticks: Iterator[Tick], state: GroupState[EmaState]): EmaOut = {
    val alpha = 2.0 / (span + 1)
    val ordered = ticks.toSeq.sortBy(t => (t.ts, t.value))
    var (lastTs, ema, seeded) = state.getOption
      .map(s => (s.lastTs, s.ema, true)).getOrElse((Long.MinValue, 0.0, false))
    var n = 0L
    ordered.foreach { t =>
      if (!seeded) { ema = t.value; seeded = true }
      else ema = t.value * alpha + ema * (1 - alpha)
      lastTs = math.max(lastTs, t.ts)
      n += 1
    }
    if (seeded) state.update(EmaState(lastTs, ema))
    EmaOut(key, lastTs, ema, n)
  }

  /** Wire a Tick stream into the stateful EMA. Output mode: update. */
  def runningEma(ticks: Dataset[Tick], span: Int): Dataset[EmaOut] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateEma(span))
  }
}
