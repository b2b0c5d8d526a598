package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel state machine (ST × W4 — the canonical
  * mapGroupsWithState shape): per user, O(1) keyed state tracking the
  * earliest view, the earliest click at-or-after it, and the earliest
  * purchase at-or-after that, folded greedily over in-order events.
  * For in-order arrival the greedy fold equals q112's batch min-chain
  * exactly: a click before the first view finds tView unset and is
  * skipped — the same click the batch chain's `ts >= t_view` predicate
  * rejects. (An exact ts TIE between a user's click and view could
  * order either way in the within-batch sort; micros-precision
  * synthetic data makes that measure-zero, and the oracle hash would
  * surface it.)
  *
  * Final-state emission: a funnel never "closes" by a successor event,
  * so each user's state emits on EVENT-TIME TIMEOUT — armed at
  * last-event + [[FlushHorizonMs]]; the harness's far-future sentinel
  * drops push the watermark past every horizon, exactly the q71
  * machinery. State per user is three optional longs — bounded by
  * active users inside the watermark horizon at any scale.
  */
object StreamingFunnel {

  val FlushHorizonMs: Long = 7L * 86400000L

  case class FunnelEvent(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double)

  case class FunnelState(tView: Option[Long], tClick: Option[Long],
                         tPurchase: Option[Long], lastMs: Long)

  case class FunnelOut(user_id: Long, stage: Long, t_view: Option[Long],
                       t_click: Option[Long], t_purchase: Option[Long],
                       micros_to_convert: Option[Long])

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def fold(s: FunnelState, e: FunnelEvent): FunnelState = {
    val us = micros(e.ts)
    val next = e.event_type match {
      case "view" if s.tView.isEmpty => s.copy(tView = Some(us))
      case "click" if s.tView.isDefined && s.tClick.isEmpty =>
        s.copy(tClick = Some(us))
      case "purchase" if s.tClick.isDefined && s.tPurchase.isEmpty =>
        s.copy(tPurchase = Some(us))
      case _ => s
    }
    next.copy(lastMs = math.max(s.lastMs, e.ts.getTime))
  }

  private def emit(user: Long, s: FunnelState): FunnelOut = {
    val stage =
      if (s.tPurchase.isDefined) 3L
      else if (s.tClick.isDefined) 2L
      else if (s.tView.isDefined) 1L
      else 0L
    FunnelOut(user, stage, s.tView, s.tClick, s.tPurchase,
      for (p <- s.tPurchase; v <- s.tView) yield p - v)
  }

  private def processGroup(user: Long, events: Iterator[FunnelEvent],
                           state: GroupState[FunnelState]): Iterator[FunnelOut] = {
    if (!events.hasNext) {
      if (state.hasTimedOut && state.exists) {
        val out = emit(user, state.get)
        state.remove()
        Iterator.single(out)
      } else Iterator.empty
    } else {
      val batch = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      val st = batch.foldLeft(
        state.getOption.getOrElse(FunnelState(None, None, None, 0L)))(fold)
      state.update(st)
      state.setTimeoutTimestamp(st.lastMs + FlushHorizonMs)
      Iterator.empty
    }
  }

  /** Streaming path: keyed funnel state, append-mode timeout emission. */
  def funnel(spark: SparkSession, events: DataFrame,
             watermark: String = "1 hour"): Dataset[FunnelOut] = {
    import spark.implicits._
    events.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[FunnelEvent]
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(processGroup)
  }
}
