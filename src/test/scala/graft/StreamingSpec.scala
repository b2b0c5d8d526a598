package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** ST1–ST5: the streaming ops run REAL micro-batch streams (file source
  * → AvailableNow → parquet/memory sink), and their batch-mode twins
  * produce the same aggregates — the equivalence the Structured
  * Streaming model promises and the oracle can check.
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private lazy val batchEvents = Tables.events(spark, sf).cache()

  test("ST2 windowed counts: streaming run equals batch run") {
    val landing = tmp("graft-landing")
    batchEvents.write.mode("overwrite").parquet(landing)

    val streamIn = EventStreams.readEventStream(spark, landing, batchEvents)
    val outDir = tmp("graft-stream-out")
    val q = EventStreams.appendSink(
      EventStreams.windowedCounts(streamIn), outDir, tmp("graft-ckpt")).start()
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(outDir)
      .select("win_start", "win_end", "event_type", "n", "v")
    // Append mode only emits windows the final watermark has passed —
    // windows within [max_ts - watermark, max_ts] are correctly
    // withheld. Equivalence therefore holds over CLOSED windows.
    val horizon = batchEvents.agg(max(col("ts"))).head().getTimestamp(0)
    val closed = col("win_end") <= lit(new java.sql.Timestamp(
      horizon.getTime - 3600 * 1000))
    val batch = EventStreams.windowedCounts(batchEvents)
      .select("win_start", "win_end", "event_type", "n", "v")
    val sC = streamed.filter(closed); val bC = batch.filter(closed)
    assert(bC.count() > 0, "need at least one closed window to compare")
    assert(sC.exceptAll(bC).isEmpty && bC.exceptAll(sC).isEmpty,
      "streaming result must equal batch result over closed windows")
  }

  test("ST3 session windows (batch view) produce plausible sessions") {
    val sess = EventStreams.sessionCounts(batchEvents)
    val n = sess.count()
    assert(n > 0)
    val users = batchEvents.select("user_id").distinct().count()
    assert(n >= users, "at least one session per active user")
  }

  test("ST5 dedup drops duplicate event_ids") {
    val dup = batchEvents.union(batchEvents.limit(100))
    val deduped = EventStreams.dedupedStream(dup)
    assert(deduped.count() == batchEvents.count())
  }

  test("F11 typed from_json props equals per-path extraction") {
    val typed = EventStreams.withTypedProps(batchEvents)
      .select(col("event_id"), col("prop_k"))
    val pathBased = batchEvents.select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("int").as("prop_k"))
    assert(typed.exceptAll(pathBased).isEmpty &&
           pathBased.exceptAll(typed).isEmpty)
    // malformed JSON -> null field, not a failure
    val bad = Seq(("x", "not json")).toDF("event_id", "props")
    assert(EventStreams.withTypedProps(bad).select("prop_k").head().isNullAt(0))
  }

  test("ST4 watermark is applied on the streaming path") {
    val landing = tmp("graft-landing2")
    batchEvents.limit(10).write.mode("overwrite").parquet(landing)
    val streamIn = EventStreams.readEventStream(spark, landing, batchEvents)
    val withWm = EventStreams.windowedCounts(streamIn, watermark = "2 hours")
    // logical plan must carry the EventTimeWatermark node
    assert(withWm.queryExecution.logical.toString.contains("EventTimeWatermark"))
  }
}
