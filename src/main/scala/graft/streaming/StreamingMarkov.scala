package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Markov transition extraction (ST15 — q161 as a stream):
  * per-user O(1) keyed state holding ONLY the last event seen (its
  * (micros, event_id) order key and type). Each micro-batch sorts its
  * within-group slice by that total order, chains it onto the stored
  * last event, and emits one (prev, next) row per adjacent pair AT
  * ARRIVAL — transitions are known the moment the successor lands, so
  * nothing waits for a timeout. For in-order arrival (the landing
  * harness's time-split drops) the emitted multiset equals q161's
  * batch lead window exactly; the aggregated view is the SAME
  * [[graft.operators.RelationalQueries.markovView]] code, so the
  * oracle IS q161's batch SQL.
  *
  * State expiry: idle users are dropped by event-time timeout at
  * last-event + [[HorizonMs]]. A transition spanning a gap larger
  * than the horizon is deliberately forfeited at scale — the standard
  * state-eviction trade (q131's) — and the horizon exceeds the
  * harness data span, so the oracle equality is exact at every SF.
  */
object StreamingMarkov {

  val HorizonMs: Long = 60L * 86400000L

  case class MarkovEvent(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String)

  case class LastEvent(us: Long, eventId: Long, tpe: String, lastMs: Long)

  case class Transition(user_id: Long, prev_type: String, next_type: String)

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def processGroup(user: Long, events: Iterator[MarkovEvent],
                           state: GroupState[LastEvent]): Iterator[Transition] = {
    if (!events.hasNext) {
      if (state.hasTimedOut) state.remove()
      Iterator.empty
    } else {
      val batch = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      val types = state.getOption.map(_.tpe).toSeq ++ batch.map(_.event_type)
      val last = batch.last
      val st = LastEvent(micros(last.ts), last.event_id, last.event_type,
        math.max(state.getOption.map(_.lastMs).getOrElse(0L),
          batch.map(_.ts.getTime).max))
      state.update(st)
      state.setTimeoutTimestamp(st.lastMs + HorizonMs)
      types.zip(types.tail).iterator
        .map { case (a, b) => Transition(user, a, b) }
    }
  }

  /** Streaming path: keyed last-event state, arrival-time emission. */
  def transitions(spark: SparkSession, events: DataFrame,
                  watermark: String = "1 hour"): Dataset[Transition] = {
    import spark.implicits._
    events.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type")).as[MarkovEvent]
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(processGroup)
  }
}
