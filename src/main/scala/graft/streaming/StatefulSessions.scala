package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization (SURVEY.md §2.9 ST3+, the
  * `flatMapGroupsWithState` surface): gap-based sessions per user whose
  * payload needs IN-ORDER scanning — the count of strictly-increasing
  * value steps and the first three event types. `session_window` can
  * aggregate commutatively (counts, sums) but cannot see event order,
  * and ordered window functions don't exist on an unbounded stream:
  * this is exactly the case for hand-managed keyed state.
  *
  * State per user is O(1) (a running summary, never the event list);
  * state count is bounded by active users inside the watermark horizon;
  * EventTimeTimeout closes idle sessions when the watermark passes
  * last-event + gap. A session closed by a successor event is emitted
  * immediately — mid-batch — so emission does not depend on timeout
  * scheduling for any session that has a follow-up.
  *
  * The batch twin (`sessionStatsBatch`) derives the SAME result through
  * ordered window functions — an independent computation path used both
  * as the q60 oracle query and as the stream==batch spec reference.
  *
  * Ordering contract: events are sorted WITHIN each micro-batch, so
  * in-order arrival (per user, across batches) reproduces the batch
  * derivation exactly — that is what the spec gates. A CROSS-BATCH late
  * arrival (admitted by the watermark) cannot be re-ordered with O(1)
  * state; it merges with monotone boundaries (sess_end never rewinds,
  * counts stay complete) and the order-dependent summary fields remain
  * the in-order best effort — see processGroup.
  */
object StatefulSessions {

  val GapMs: Long = 30 * 60 * 1000L
  private val GapUs: Long = GapMs * 1000L

  case class SessEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                       event_type: String, value: Double)

  /** Exact event-time micros — gap decisions must use the full parquet
    * precision or a boundary-straddling pair could sessionize
    * differently from the window-function/DuckDB derivations (which
    * compare epoch_us). Timestamp.getTime alone floors to millis. */
  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Running per-user session summary — O(1), no event buffering; the
    * boundary Timestamps are kept verbatim so emission loses nothing. */
  case class SessState(start: java.sql.Timestamp, last: java.sql.Timestamp,
                       n: Long, lastValue: Double, nIncreasing: Long,
                       firstTypes: List[String])

  case class SessOut(user_id: Long, sess_start: java.sql.Timestamp,
                     sess_end: java.sql.Timestamp, n_events: Long,
                     n_increasing: Long, first_types: String)

  private def fresh(e: SessEvent): SessState =
    SessState(e.ts, e.ts, 1L, e.value, 0L, List(e.event_type))

  private def extend(s: SessState, e: SessEvent): SessState =
    SessState(s.start, e.ts, s.n + 1, e.value,
      s.nIncreasing + (if (e.value > s.lastValue) 1L else 0L),
      if (s.firstTypes.size < 3) s.firstTypes :+ e.event_type else s.firstTypes)

  private def close(user: Long, s: SessState): SessOut =
    SessOut(user, s.start, s.last, s.n, s.nIncreasing, s.firstTypes.mkString(","))

  /** Stream-or-timeout callback: fold this batch's events (sorted by
    * event time, id as tiebreak) into the running state, emitting a
    * session whenever its successor opens a new one; on event-time
    * timeout, emit and clear the idle session. */
  private def processGroup(user: Long, events: Iterator[SessEvent],
                           state: GroupState[SessState]): Iterator[SessOut] = {
    val out = scala.collection.mutable.ListBuffer.empty[SessOut]
    val batch = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    if (batch.isEmpty) {
      if (state.hasTimedOut && state.exists) { out += close(user, state.get); state.remove() }
    } else {
      var st = state.getOption
      batch.foreach { e =>
        st = st match {
          // Cross-batch LATE arrival (the watermark admits up to
          // `watermark` of disorder; the in-batch sort cannot see it).
          // Never rewind the open session's boundaries: if the event
          // plausibly belongs (>= start - gap) merge it with monotone
          // boundaries — count it, widen start if needed, leave the
          // order-dependent summary fields (lastValue, n_increasing,
          // first_types) as the in-order best effort. If it predates
          // even start - gap it belongs to an ALREADY-EMITTED session:
          // emit it as its own 1-event session rather than corrupting
          // the open one.
          case Some(s) if micros(e.ts) < micros(s.last) =>
            if (micros(e.ts) >= micros(s.start) - GapUs)
              Some(s.copy(
                start = if (micros(e.ts) < micros(s.start)) e.ts else s.start,
                n = s.n + 1))
            else {
              out += SessOut(user, e.ts, e.ts, 1L, 0L, e.event_type)
              Some(s)
            }
          case Some(s) if micros(e.ts) - micros(s.last) <= GapUs => Some(extend(s, e))
          case Some(s) => out += close(user, s); Some(fresh(e))
          case None => Some(fresh(e))
        }
      }
      state.update(st.get)
      state.setTimeoutTimestamp(st.get.last.getTime + GapMs)
    }
    out.iterator
  }

  /** Streaming path: keyed custom state, append-mode emission. */
  def sessionStats(spark: SparkSession, events: DataFrame,
                   watermark: String = "1 hour"): Dataset[SessOut] = {
    import spark.implicits._
    events.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[SessEvent]
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processGroup)
  }

  /** Batch derivation through ordered window functions — independent of
    * the streaming fold, ANSI-expressible (the q60 oracle mirrors it in
    * DuckDB). Session id = running count of gap breaks per user. */
  def sessionStatsBatch(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val inSess = Window.partitionBy(col("user_id"), col("sess"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("brk", when(col("prev_us").isNull ||
        unix_micros(col("ts")) - col("prev_us") > GapMs * 1000L, 1L).otherwise(0L))
      .withColumn("sess", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(inSess))
      .withColumn("prev_v", lag(col("value"), 1).over(inSess))
      .groupBy(col("user_id"), col("sess"))
      .agg(min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"),
        count(lit(1)).as("n_events"),
        sum(when(col("value") > col("prev_v"), 1L).otherwise(0L)).as("n_increasing"),
        array_join(transform(
          sort_array(collect_list(when(col("rn") <= 3,
            struct(col("rn"), col("event_type"))))),
          s => s.getField("event_type")), ",").as("first_types"))
      .drop("sess")
      .select("user_id", "sess_start", "sess_end", "n_events",
        "n_increasing", "first_types")
  }
}
