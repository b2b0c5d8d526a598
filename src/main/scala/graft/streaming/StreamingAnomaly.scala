package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.RelationalQueries.{AnomWin, AnomMinWin, AnomZsq}

/** Streaming rolling-anomaly detector (ST × W6 — q124's stream twin,
  * the alerting form a telemetry pipeline actually deploys): per-user
  * keyed state holding the last ≤ [[AnomWin]] scaled values in
  * (ts, event_id) order. Each arriving event is scored against the
  * CURRENT state BEFORE being appended — exactly the batch frame
  * [i−AnomWin, i−1] — with the same cross-multiplied integer z-test
  * (shared constants, so the two paths cannot drift). Flags emit
  * IMMEDIATELY (an anomaly alert is useful at arrival, not at state
  * close), so no timeout emission exists; the event-time timeout only
  * DROPS idle users' state, bounding it by users active inside the
  * horizon at any scale.
  *
  * Stream == batch because the trailing window depends only on
  * earlier events under the (ts, event_id) total order, drops are
  * split BY TIME (cross-drop order preserved, ties land in one drop),
  * and the within-batch sort applies the same order — so the fold
  * sees the identical prefix the batch window sees. The q124 oracle
  * is reused verbatim: stream == batch is re-proven on rows, schema
  * and hash every round.
  */
object StreamingAnomaly {

  val IdleHorizonMs: Long = 7L * 86400000L

  case class AnomEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                       event_type: String, value: Double)

  /** Bounded per-user state: ≤ AnomWin longs + the last event-time. */
  case class AnomState(vs: Seq[Long], lastMs: Long)

  case class AnomOut(event_id: Long, user_id: Long, event_type: String,
                     v_scaled: Long, win_n: Long, zsq_num: Long, zsq_den: Long)

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def processGroup(user: Long, events: Iterator[AnomEvent],
                           state: GroupState[AnomState]): Iterator[AnomOut] = {
    if (!events.hasNext) {
      if (state.hasTimedOut) state.remove()
      Iterator.empty
    } else {
      val batch = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var st = state.getOption.getOrElse(AnomState(Nil, 0L))
      val out = Seq.newBuilder[AnomOut]
      batch.foreach { e =>
        val v = math.floor(e.value * 10000.0).toLong
        val win = st.vs
        val n = win.length.toLong
        if (n >= AnomMinWin) {
          val sm = win.sum
          val s2 = win.map(x => x * x).sum
          val nd = n * v - sm
          val num = nd * nd
          val den = AnomZsq * (n * s2 - sm * sm)
          if (num > den)
            out += AnomOut(e.event_id, user, e.event_type, v, n, num, den)
        }
        st = AnomState((win :+ v).takeRight(AnomWin),
          math.max(st.lastMs, e.ts.getTime))
      }
      state.update(st)
      state.setTimeoutTimestamp(st.lastMs + IdleHorizonMs)
      out.result().iterator
    }
  }

  /** Streaming path: keyed trailing-window state, immediate flag
    * emission, idle-state expiry by event-time timeout. */
  def anomalies(spark: SparkSession, events: DataFrame,
                watermark: String = "1 hour"): Dataset[AnomOut] = {
    import spark.implicits._
    events.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[AnomEvent]
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(processGroup)
  }
}
