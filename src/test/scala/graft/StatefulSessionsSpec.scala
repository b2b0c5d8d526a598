package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.{EventStreams, StatefulSessions}

/** flatMapGroupsWithState sessionization (StatefulSessions): the
  * custom-state stream path must agree with the independent
  * window-function batch derivation (which is also the q60 oracle
  * query). Comparison is over sessions CLOSED BY A SUCCESSOR — those
  * are emitted in-function the moment the user's next session opens,
  * so the assertion does not depend on timeout/watermark scheduling;
  * each user's final session may legitimately still be open (same
  * reasoning as append-mode windows).
  */
class StatefulSessionsSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("streaming custom state equals the window-function batch derivation") {
    val batchEvents = Tables.events(spark, sf).cache()
    val landing = tmp("graft-sess-landing")
    batchEvents.write.mode("overwrite").parquet(landing)

    val streamIn = EventStreams.readEventStream(spark, landing, batchEvents)
    val outDir = tmp("graft-sess-out")
    val q = StatefulSessions.sessionStats(spark, streamIn).toDF()
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", tmp("graft-sess-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    q.awaitTermination(120000)

    val cols = Seq("user_id", "sess_start", "sess_end", "n_events",
      "n_increasing", "first_types")
    val streamed = spark.read.parquet(outDir).select(cols.head, cols.tail: _*)
    val batch = StatefulSessions.sessionStatsBatch(batchEvents)

    // sessions closed by a successor = all but each user's latest
    val lastPerUser = batch.groupBy(col("user_id"))
      .agg(max(col("sess_start")).as("sess_start"))
    val expected = batch.join(lastPerUser, Seq("user_id", "sess_start"), "left_anti")
      .select(cols.head, cols.tail: _*)

    assert(expected.count() > 50, "need a meaningful closed-session set")
    val missing = expected.exceptAll(streamed)
    assert(missing.isEmpty,
      s"stream lost sessions: ${missing.take(5).mkString("; ")}")
    // and nothing fabricated: every streamed row is a real batch session
    val extra = streamed.exceptAll(batch.select(cols.head, cols.tail: _*))
    assert(extra.isEmpty, s"stream fabricated: ${extra.take(5).mkString("; ")}")
  }

  test("cross-batch late arrivals never rewind session boundaries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val src = ms.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StatefulSessions.sessionStats(spark, src).toDF()
      .writeStream.format("memory").queryName("late_sess")
      .outputMode("append").start()
    val t0 = 1700000000000L
    val min = 60 * 1000L
    def ts(at: Long) = new java.sql.Timestamp(at)
    try {
      ms.addData((1L, ts(t0), 7L, "a", 1.0))
      q.processAllAvailable()
      // batch 2, all within the 1h watermark: one event older than the
      // open session minus the gap (belongs to an already-gone session),
      // one late-but-mergeable, one in-order successor
      ms.addData((2L, ts(t0 - 50 * min), 7L, "z", 0.0),
                 (3L, ts(t0 - 25 * min), 7L, "b", 2.0),
                 (4L, ts(t0 + 20 * min), 7L, "c", 3.0))
      q.processAllAvailable()
      // batch 3: far future successor closes the open session
      ms.addData((5L, ts(t0 + 300 * min), 7L, "d", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("late_sess")
      .select($"sess_start", $"sess_end", $"n_events")
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
    assert(rows.forall { case (s, e, _) => !e.before(s) },
      s"corrupted boundaries: ${rows.mkString("; ")}")
    // the too-old event surfaced as its own 1-event session
    assert(rows.contains((ts(t0 - 50 * min), ts(t0 - 50 * min), 1L)), rows.mkString("; "))
    // the open session absorbed the mergeable late event and the
    // successor: start widened to the late event, end never rewound
    assert(rows.contains((ts(t0 - 25 * min), ts(t0 + 20 * min), 3L)), rows.mkString("; "))
  }

  test("fold semantics: gap boundary, ordering, increasing steps, first-3 types") {
    val t0 = 1700000000000L
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val gap = StatefulSessions.GapMs
    val events = Seq(
      // user 1: one session of 4, then a new session exactly gap+1ms later
      (1L, ts(t0), 1L, "a", 1.0),
      (2L, ts(t0 + 1000), 1L, "b", 3.0),          // +inc
      (3L, ts(t0 + 2000), 1L, "c", 2.0),
      (4L, ts(t0 + 2000 + gap), 1L, "d", 5.0),    // exactly gap -> SAME session, +inc
      (5L, ts(t0 + 3000 + 2 * gap), 1L, "e", 1.0) // gap exceeded -> new session
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = StatefulSessions.sessionStatsBatch(events)
      .orderBy("sess_start")
      .select("n_events", "n_increasing", "first_types")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq((4L, 2L, "a,b,c"), (1L, 0L, "e")))
  }
}
