package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.{EventStreams, StatefulSessions, StreamingQueries}

/** Local mirror of the q71–q76 DuckDB oracles: each streaming query
  * (REAL micro-batch run over landing drops) must equal its independent
  * batch derivation EXACTLY — including the timeout-flushed final
  * sessions/windows that StatefulSessionsSpec's closed-by-successor
  * comparison deliberately excludes. If the sentinel-flush mechanism
  * ever stops firing timeouts, these go red before the driver does.
  */
class StreamingQueriesSpec extends SparkTestBase {

  private def q(name: String): DataFrame =
    StreamingQueries.queries(name)(spark, sf)

  private def assertSame(got: DataFrame, want: DataFrame, label: String): Unit = {
    val missing = want.exceptAll(got)
    val extra = got.exceptAll(want)
    assert(missing.isEmpty, s"$label lost rows: ${missing.take(5).mkString("; ")}")
    assert(extra.isEmpty, s"$label fabricated rows: ${extra.take(5).mkString("; ")}")
  }

  private lazy val events =
    Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value").cache()

  test("q71: streamed sessions equal the batch window derivation, finals included") {
    val got = q("q71_stream_sessions")
    val want = StatefulSessions.sessionStatsBatch(events)
    assert(got.count() === want.count(), "timeout flush must close every session")
    assertSame(got, want, "q71")
  }

  test("q131: streamed anomaly flags equal the batch trailing-window flags") {
    val got = q("q131_stream_anomaly")
    val want = SparkEntry.queries("q124_anomaly")(spark, sf)
      .select("event_id", "user_id", "event_type", "v_scaled", "win_n",
        "zsq_num", "zsq_den")
    assert(got.count() > 0, "the 3-sigma rule must flag something here")
    assertSame(got, want, "q131")
  }

  test("q131: drop-count invariance — one drop and three drops flag identically") {
    // the trailing window depends only on the (ts, event_id) prefix, so
    // how the stream is micro-batched must be invisible in the output
    import graft.streaming.StreamingQueries.{tmp, drop, flushDrops}
    val landing = tmp("graft-q131one-landing")
    drop(events, landing, 0)
    flushDrops(spark, events, landing, 1)
    val oneDrop = graft.streaming.StreamingQueries.runLandingAnomaly(
      spark, landing, events)
    assertSame(oneDrop, q("q131_stream_anomaly"), "q131 drop-count")
  }

  test("q163: streamed Markov transitions equal the batch lead-window model") {
    val got = q("q163_stream_markov")
    val want = SparkEntry.queries("q161_markov")(spark, sf)
    assert(got.count() > 0, "no transitions streamed")
    assertSame(got, want, "q163")
  }

  test("q163: drop-count invariance — one drop and three drops chain identically") {
    // the keyed last-event state makes micro-batch boundaries
    // invisible: a batch's first event chains onto the stored
    // predecessor exactly as the lead window would
    import graft.streaming.StreamingQueries.{tmp, drop, flushDrops}
    val landing = tmp("graft-q163one-landing")
    drop(events, landing, 0)
    flushDrops(spark, events, landing, 1)
    val oneDrop = graft.streaming.StreamingQueries.runLandingMarkov(
      spark, landing, events)
    assertSame(oneDrop, q("q163_stream_markov"), "q163 drop-count")
  }

  test("q167: streamed CUSUM equals the one-shot batch chain") {
    val got = q("q167_stream_cusum")
    val want = SparkEntry.queries("q162_cusum")(spark, sf)
    assert(got.count() > 0, "no CUSUM rows streamed")
    assertSame(got, want, "q167")
  }

  test("q172: streamed A/B monitor equals the one-shot batch test") {
    val got = q("q172_stream_ab")
    val want = SparkEntry.queries("q166_ab_test")(spark, sf)
    assert(got.count() > 0, "no experiment rows streamed")
    assertSame(got, want, "q172")
  }

  test("q197: streamed RFM equals the one-shot batch segmentation") {
    val got = q("q197_stream_rfm")
    val want = SparkEntry.queries("q181_rfm")(spark, sf)
    assert(got.count() > 0, "no segments streamed")
    assertSame(got, want, "q197")
    // the merge really is (MAX, SUM, SUM): user counts must total the
    // corpus user count, not a per-batch subset
    val users = got.agg(sum(col("n_users"))).head().getLong(0)
    val corpus = events.select("user_id").distinct().count()
    assert(users == corpus, s"segment users $users != corpus users $corpus")
  }

  test("q198: streamed decayed popularity equals the one-shot batch chain") {
    val got = q("q198_stream_decayed_pop")
    val want = SparkEntry.queries("q177_decayed_popularity")(spark, sf)
    assert(got.count() > 0, "no popularity rows streamed")
    assertSame(got, want, "q198")
  }

  test("q202: streamed seasonality equals the one-shot batch profile") {
    val got = q("q202_stream_seasonality")
    val want = SparkEntry.queries("q188_seasonality")(spark, sf)
    assert(got.count() > 0, "no seasonality rows streamed")
    assertSame(got, want, "q202")
  }

  test("q205: streamed EWMA trend equals the one-shot batch smoothing") {
    val got = q("q205_stream_ewma")
    val want = SparkEntry.queries("q204_ewma_trend")(spark, sf)
    assert(got.count() > 0, "no EWMA rows streamed")
    assertSame(got, want, "q205")
  }

  test("q229: streamed vocabulary store re-derives the one-shot Chao1 audit") {
    val got = q("q229_stream_chao1")
    val want = SparkEntry.queries("q225_chao1")(spark, sf)
    assert(got.count() > 0, "no chao1 rows streamed")
    assertSame(got, want, "q229")
    // the store merge is load-bearing: a token that spans batches must
    // count ONCE with its summed frequency, so per-source token mass
    // must equal the corpus count exactly
    val mass = got.agg(sum(col("n_tokens"))).head().getLong(0)
    val corpus = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .filter(length(col("t")) > 0).count()
    assert(mass == corpus, s"token mass $mass != corpus $corpus")
  }

  test("q230: streamed vocabulary store re-derives the one-shot Zipf fit") {
    val got = q("q230_stream_zipf")
    val want = SparkEntry.queries("q137_zipf_fit")(spark, sf)
    assert(got.count() > 0, "no zipf rows streamed")
    assertSame(got, want, "q230")
  }

  test("q228: streamed ACF equals the one-shot batch autocorrelation") {
    val got = q("q228_stream_acf")
    val want = SparkEntry.queries("q224_acf")(spark, sf)
    assert(got.count() > 0, "no ACF rows streamed")
    assertSame(got, want, "q228")
  }

  test("q220: streamed OLS trend equals the one-shot batch regression") {
    val got = q("q220_stream_ols")
    val want = SparkEntry.queries("q219_ols_trend")(spark, sf)
    assert(got.count() > 0, "no OLS rows streamed")
    assertSame(got, want, "q220")
  }

  test("q240: streamed Mann–Kendall equals the one-shot batch trend test") {
    val got = q("q240_stream_mk")
    val want = SparkEntry.queries("q236_mann_kendall")(spark, sf)
    assert(got.count() > 0, "no Mann–Kendall rows streamed")
    assertSame(got, want, "q240")
  }

  test("q243: streamed seasonal MK equals the one-shot batch stratum test") {
    val got = q("q243_stream_seasonal_mk")
    val want = SparkEntry.queries("q242_seasonal_mk")(spark, sf)
    assert(got.count() > 0, "no seasonal MK rows streamed")
    assertSame(got, want, "q243")
  }

  test("q262: streamed Kendall τ-b equals the one-shot batch effect size") {
    val got = q("q262_stream_kendall")
    val want = SparkEntry.queries("q260_kendall_tau")(spark, sf)
    assert(got.count() > 0, "no Kendall rows streamed")
    assertSame(got, want, "q262")
  }

  test("q268: streamed seasonal strength equals the one-shot batch decomposition") {
    val got = q("q268_stream_seasonal_strength")
    val want = SparkEntry.queries("q265_seasonal_strength")(spark, sf)
    assert(got.count() > 0, "no seasonal-strength rows streamed")
    assertSame(got, want, "q268")
  }

  test("q263: streamed Simpson diversity equals the one-shot batch audit") {
    val got = q("q263_stream_simpson")
    val want = SparkEntry.queries("q257_simpson_diversity")(spark, sf)
    assert(got.count() > 0, "no Simpson rows streamed")
    assertSame(got, want, "q263")
  }

  test("q264: streamed Nelson–Aalen equals the one-shot batch hazard curve") {
    val got = q("q264_stream_nelson_aalen")
    val want = SparkEntry.queries("q258_nelson_aalen")(spark, sf)
    assert(got.count() > 0, "no hazard rows streamed")
    assertSame(got, want, "q264")
  }

  test("q279: streamed Cox–Stuart equals the one-shot batch trend test") {
    val got = q("q279_stream_cox_stuart")
    val want = SparkEntry.queries("q272_cox_stuart")(spark, sf)
    assert(got.count() > 0, "no trend rows streamed")
    assertSame(got, want, "q279")
  }

  test("q280: streamed turning-point test equals the one-shot batch answer") {
    val got = q("q280_stream_turning_point")
    val want = SparkEntry.queries("q273_turning_point")(spark, sf)
    assert(got.count() > 0, "no turning-point rows streamed")
    assertSame(got, want, "q280")
  }

  test("q281: streamed Yule's K equals the one-shot batch richness profile") {
    val got = q("q281_stream_yule_k")
    val want = SparkEntry.queries("q276_yule_k")(spark, sf)
    assert(got.count() > 0, "no richness rows streamed")
    assertSame(got, want, "q281")
  }

  test("q245: streamed delta-ratio A/B equals the one-shot batch readout") {
    val got = q("q245_stream_delta_ratio")
    val want = SparkEntry.queries("q244_delta_ratio")(spark, sf)
    assert(got.count() > 0, "no delta-ratio rows streamed")
    assertSame(got, want, "q245")
  }

  test("q217: streamed KMV sketches re-cut to the one-shot batch overlap matrix") {
    val got = q("q217_stream_kmv")
    val want = SparkEntry.queries("q154_kmv_overlap")(spark, sf)
    assert(got.count() > 0, "no overlap rows streamed")
    assertSame(got, want, "q217")
  }

  test("q211: streamed cumulative-distinct curve equals the one-shot batch identity") {
    val got = q("q211_stream_cumdistinct")
    val want = SparkEntry.queries("q210_cumulative_distinct")(spark, sf)
    assert(got.count() > 0, "no curve rows streamed")
    assertSame(got, want, "q211")
    // the (MIN, MAX) merge really is first-seen: per type, the final
    // cum must equal the corpus distinct-user count, not a per-batch one
    val last = got.groupBy(col("event_type"))
      .agg(max_by(col("cum_users"), col("day")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val corpus = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(last == corpus, s"$last != $corpus")
  }

  test("q72: incremental near-dup pairs equal the one-shot batch pairs") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val got = q("q72_stream_neardup")
    val want = operators.MinHashLSH.verifiedPairs(
      docs, operators.ApproxOracle.MinJaccard)
    assertSame(got, want, "q72")
  }

  test("q73: streamed decontamination tags equal the batch tags") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    val bl = streaming.StreamingDecontaminate.blocklist(
      docs.filter(col("doc_id") % 97 === 0))
    val want = streaming.StreamingDecontaminate.tag(
        docs.filter(col("doc_id") % 97 =!= 0), bl)
      .select("doc_id", "contaminated")
    val got = q("q73_stream_decontaminate")
    assert(got.count() > 0)
    assertSame(got, want, "q73")
  }

  test("q74: streamed watermarked windows equal the batch windows, finals included") {
    val got = q("q74_stream_windows")
    val want = EventStreams.windowedCounts(events)
      .select("win_start", "win_end", "event_type", "n", "v")
    assert(got.count() === want.count(), "watermark flush must finalize every window")
    assertSame(got, want, "q74")
  }

  test("q75: exactly-once ingest across a process kill returns the raw rows") {
    // q75's registered entry IS the interrupted variant: a child JVM is
    // halted mid-run and this process resumes from its checkpoint
    assertSame(q("q75_stream_ingest"), events, "q75")
  }

  test("q71 restart: stateful sessions killed mid-run resume to the uninterrupted answer") {
    import streaming.{RestartHarness, StreamingQueries => SQ}
    val landing = SQ.tmp("graft-q71r-landing")
    SQ.splitByTime(events, landing, 3)
    SQ.flushDrops(spark, events, landing, 3)
    val ckpt = SQ.tmp("graft-q71r-ckpt")
    val outDir = SQ.tmp("graft-q71r-out")
    // child JVM: builds session state over the first batches, then
    // halts with two commits done — keyed state exists ONLY in its
    // checkpoint delta files when it dies
    val code = RestartHarness.launchKilled("sessions", landing, ckpt, outDir,
      sf, killAfter = 2)
    assert(code == RestartHarness.KilledExit || code == 0,
      s"restart child JVM failed with exit code $code")
    // resume in THIS process (a different JVM): state reloads from the
    // checkpoint, remaining drops + sentinels flush every session
    RestartHarness.start(spark, "sessions", landing, ckpt, outDir, events)
      .awaitTermination()
    val got = spark.read.parquet(outDir).filter(col("user_id") >= 0)
      .select("user_id", "sess_start", "sess_end", "n_events",
        "n_increasing", "first_types")
    val want = StatefulSessions.sessionStatsBatch(events)
    assert(got.count() === want.count(), "restart must close every session")
    assertSame(got, want, "q71-restart")
    Seq(landing, ckpt, outDir).foreach(SQ.rmTree)
  }

  test("q74 restart: watermarked window state killed mid-run resumes to the batch answer") {
    import streaming.{RestartHarness, StreamingQueries => SQ}
    val landing = SQ.tmp("graft-q74r-landing")
    SQ.splitByTime(events, landing, 3)
    SQ.flushDrops(spark, events, landing, 3)
    val ckpt = SQ.tmp("graft-q74r-ckpt")
    val outDir = SQ.tmp("graft-q74r-out")
    // built-in window-agg state + the WATERMARK itself must both come
    // back from the checkpoint: a resume that lost the watermark would
    // re-emit or hold back finalized windows
    val code = RestartHarness.launchKilled("windows", landing, ckpt, outDir,
      sf, killAfter = 2)
    assert(code == RestartHarness.KilledExit || code == 0,
      s"restart child JVM failed with exit code $code")
    RestartHarness.start(spark, "windows", landing, ckpt, outDir, events)
      .awaitTermination()
    val got = spark.read.parquet(outDir)
      .filter(col("event_type") =!= "__flush__")
      .select("win_start", "win_end", "event_type", "n", "v")
    val want = EventStreams.windowedCounts(events)
      .select("win_start", "win_end", "event_type", "n", "v")
    assert(got.count() === want.count(), "restart must finalize every window exactly once")
    assertSame(got, want, "q74-restart")
    Seq(landing, ckpt, outDir).foreach(SQ.rmTree)
  }

  test("q76: stateful dedup collapses the doubled feed to the raw rows") {
    assertSame(q("q76_stream_dedup"), events, "q76")
  }

  test("q80: stream-stream interval join equals the batch self-join") {
    val a = events.select(col("event_id").as("id_a"), col("ts").as("ts_a"),
      col("user_id")).filter(col("id_a") % 2 === 0)
    val b = events.select(col("event_id").as("id_b"), col("ts").as("ts_b"),
      col("user_id")).filter(col("id_b") % 2 === 1)
    val want = a.join(b, Seq("user_id"))
      .filter(col("ts_b") >= col("ts_a") - expr("INTERVAL 5 MINUTES") &&
              col("ts_b") <= col("ts_a") + expr("INTERVAL 5 MINUTES"))
      .select("id_a", "id_b", "user_id")
    val got = q("q80_stream_stream_join")
    assert(got.count() > 0, "the corpus must produce cross-parity matches")
    assertSame(got, want, "q80")
  }

  test("q80 restart: stream-stream join state killed mid-run resumes to the batch answer") {
    import streaming.{RestartHarness, StreamingQueries => SQ}
    val landing = SQ.tmp("graft-q80r-landing")
    SQ.splitByTime(events, landing, 3)
    val ckpt = SQ.tmp("graft-q80r-ckpt")
    val outDir = SQ.tmp("graft-q80r-out")
    // the child buffers both sides' rows as join state across its two
    // committed batches, then halts — the matches between drop 2 and
    // drop 3 can only come from state reloaded in the resuming JVM
    val code = RestartHarness.launchKilled("join", landing, ckpt, outDir,
      sf, killAfter = 2)
    assert(code == RestartHarness.KilledExit || code == 0,
      s"restart child JVM failed with exit code $code")
    RestartHarness.start(spark, "join", landing, ckpt, outDir, events)
      .awaitTermination()
    val got = spark.read.parquet(outDir).select("id_a", "id_b", "user_id")
    val a = events.select(col("event_id").as("id_a"), col("ts").as("ts_a"),
      col("user_id")).filter(col("id_a") % 2 === 0)
    val b = events.select(col("event_id").as("id_b"), col("ts").as("ts_b"),
      col("user_id")).filter(col("id_b") % 2 === 1)
    val want = a.join(b, Seq("user_id"))
      .filter(col("ts_b") >= col("ts_a") - expr("INTERVAL 5 MINUTES") &&
              col("ts_b") <= col("ts_a") + expr("INTERVAL 5 MINUTES"))
      .select("id_a", "id_b", "user_id")
    assert(got.count() === want.count(),
      "restart must emit every cross-parity match exactly once")
    assertSame(got, want, "q80-restart")
    Seq(landing, ckpt, outDir).foreach(SQ.rmTree)
  }

  test("q76 restart: dedup seen-key state killed mid-run resumes to exactly-once") {
    import streaming.{RestartHarness, StreamingQueries => SQ}
    val landing = SQ.tmp("graft-q76r-landing")
    // drop i carries chunk i PLUS a full copy of chunk i-1 — duplicates
    // that arrive a BATCH LATE, so suppressing them after the kill
    // requires the seen-key state the dead JVM checkpointed
    val r = events.agg(min(unix_micros(col("ts"))),
      max(unix_micros(col("ts")))).head()
    val (mn, mx) = (r.getLong(0), r.getLong(1))
    val w = (mx - mn) / 3 + 1
    def chunk(i: Int) = events.filter(
      unix_micros(col("ts")) >= mn + i * w && unix_micros(col("ts")) < mn + (i + 1) * w)
    SQ.drop(chunk(0), landing, 0)
    SQ.drop(chunk(1).unionAll(chunk(0)), landing, 1)
    SQ.drop(chunk(2).unionAll(chunk(1)), landing, 2)
    val ckpt = SQ.tmp("graft-q76r-ckpt")
    val outDir = SQ.tmp("graft-q76r-out")
    val code = RestartHarness.launchKilled("dedup", landing, ckpt, outDir,
      sf, killAfter = 2)
    assert(code == RestartHarness.KilledExit || code == 0,
      s"restart child JVM failed with exit code $code")
    RestartHarness.start(spark, "dedup", landing, ckpt, outDir, events)
      .awaitTermination()
    val got = spark.read.parquet(outDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    assert(got.count() === events.count(),
      "lost seen-key state would re-emit the earlier batches' rows")
    assertSame(got, events, "q76-restart")
    Seq(landing, ckpt, outDir).foreach(SQ.rmTree)
  }

  test("q229 restart: the vocabulary store killed mid-run resumes to the uninterrupted answer") {
    // the r11 verdict ask: the keyed-state family earned restart rows
    // (q71/q74/q75/q80/q107); this proves the batch_id dynamic-
    // overwrite replay-idempotence argument under an ACTUAL replay for
    // the store whose key space grows with the corpus — the child JVM
    // halts with two commits done (an in-flight batch may have written
    // its partition but not its commit-log entry), and the resumer
    // must replay that batch into ITS OWN partition without doubling
    // any token count.
    import streaming.{RestartHarness, StreamingVocab, StreamingQueries => SQ}
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text")
    val landing = SQ.tmp("graft-q229r-landing")
    val r = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val (mn, mx) = (r.getLong(0), r.getLong(1))
    val w = (mx - mn) / 4 + 1
    (0 until 4).foreach { i =>
      SQ.drop(docs.filter(col("doc_id") >= mn + i * w &&
        col("doc_id") < mn + (i + 1) * w), landing, i)
    }
    val store = TempDirs.register(SQ.tmp("graft-q229r-store"))
    val ckpt = SQ.tmp("graft-q229r-ckpt")
    val code = RestartHarness.launchKilled("vocab", landing, ckpt, store,
      sf, killAfter = 2)
    assert(code == RestartHarness.KilledExit || code == 0,
      s"restart child JVM failed with exit code $code")
    RestartHarness.start(spark, "vocab", landing, ckpt, store, docs)
      .awaitTermination()
    // the folded store == the one-shot batch counts (so EVERY tail of
    // the store — chao1, zipf — inherits equality)
    val got = StreamingVocab.counts(spark, store)
    val want = docs
      .select(col("source"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    assertSame(got, want, "q229-restart")
    // and the q229 read tail over the recovered store equals the
    // uninterrupted batch q225 answer bit-for-bit
    assertSame(graft.operators.QualityQueries.chao1View(got),
      graft.operators.QualityQueries.chao1View(want), "q229-restart-chao1")
    Seq(landing, ckpt).foreach(SQ.rmTree)
  }

  /** Slice the events table into four event_id-range drops under a
    * fresh landing dir — the restart tests' input shape (each drop one
    * micro-batch under maxFilesPerTrigger=1). */
  private def eventDrops(label: String): String = {
    import streaming.{StreamingQueries => SQ}
    val landing = SQ.tmp(s"graft-$label-landing")
    val r = events.agg(min(col("event_id")), max(col("event_id"))).head()
    val (mn, mx) = (r.getLong(0), r.getLong(1))
    val w = (mx - mn) / 4 + 1
    (0 until 4).foreach { i =>
      SQ.drop(events.filter(col("event_id") >= mn + i * w &&
        col("event_id") < mn + (i + 1) * w), landing, i)
    }
    landing
  }

  test("q245 restart: the user-metric store killed mid-run resumes to the uninterrupted answer") {
    // r12 verdict ask #5 (1/2): the per-(type, user) metric store is
    // the SUM-shaped one — a replay that double-landed a batch would
    // double (ne, sc) for every user in it, so this is the
    // discriminating store for the batch_id dynamic-overwrite
    // idempotence argument. Child JVM halts with two commits done (an
    // in-flight batch may have written its partition but not its
    // commit-log entry); the resumer must replay that batch into ITS
    // OWN partition without double-counting any user.
    import streaming.{RestartHarness, StreamingUserMetrics, StreamingQueries => SQ}
    val landing = eventDrops("q245r")
    val store = TempDirs.register(SQ.tmp("graft-q245r-store"))
    val ckpt = SQ.tmp("graft-q245r-ckpt")
    val code = RestartHarness.launchKilled("usermetrics", landing, ckpt,
      store, sf, killAfter = 2)
    assert(code == RestartHarness.KilledExit || code == 0,
      s"restart child JVM failed with exit code $code")
    RestartHarness.start(spark, "usermetrics", landing, ckpt, store, events)
      .awaitTermination()
    // the folded store == the one-shot batch sufficient statistics
    val got = StreamingUserMetrics.metrics(spark, store)
    val want = events
      .select(col("event_type"), col("user_id"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("ne"), sum(col("cents")).as("sc"))
    assertSame(got, want, "q245-restart")
    // and the q245 read tail over the recovered store equals the
    // uninterrupted batch q244 answer bit-for-bit
    assertSame(graft.operators.RelationalQueries.deltaRatioView(got),
      SparkEntry.queries("q244_delta_ratio")(spark, sf), "q245-restart-tail")
    Seq(landing, ckpt).foreach(SQ.rmTree)
  }

  test("q211 restart: the first-seen store killed mid-run resumes to the uninterrupted answer") {
    // r12 verdict ask #5 (2/2): (MIN, MAX) are idempotent under a
    // doubled replay, so the interesting failure here is LOST state —
    // a resume whose offset WAL forgot a committed drop would read a
    // too-late first-seen day and shift the whole cumulative curve.
    import streaming.{RestartHarness, StreamingFirstSeen, StreamingQueries => SQ}
    val landing = eventDrops("q211r")
    val store = TempDirs.register(SQ.tmp("graft-q211r-store"))
    val ckpt = SQ.tmp("graft-q211r-ckpt")
    val code = RestartHarness.launchKilled("firstseen", landing, ckpt,
      store, sf, killAfter = 2)
    assert(code == RestartHarness.KilledExit || code == 0,
      s"restart child JVM failed with exit code $code")
    RestartHarness.start(spark, "firstseen", landing, ckpt, store, events)
      .awaitTermination()
    val got = StreamingFirstSeen.perUser(spark, store)
    val want = events
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(min(col("day")).as("fday"), max(col("day")).as("lday"))
    assertSame(got, want, "q211-restart")
    assertSame(graft.operators.RelationalQueries.cumulativeDistinctView(got),
      SparkEntry.queries("q210_cumulative_distinct")(spark, sf),
      "q211-restart-tail")
    Seq(landing, ckpt).foreach(SQ.rmTree)
  }

  test("q81: streamed sliding windows equal the batch windows, finals included") {
    val got = q("q81_stream_sliding")
    val want = EventStreams.windowedCounts(events,
        width = "10 minutes", slide = Some("5 minutes"))
      .select("win_start", "win_end", "event_type", "n", "v")
    assert(got.count() === want.count(), "watermark flush must finalize every window")
    assertSame(got, want, "q81")
  }

  test("q92: streamed semantic dedup equals the batch SemDeDup summary") {
    val got = q("q92_stream_semdedup")
    val want = SparkEntry.queries("q89_semdedup")(spark, sf)
    assert(got.agg(org.apache.spark.sql.functions.sum("n_removed")).head().getLong(0) > 0,
      "the check is vacuous unless the stream actually removes something")
    assertSame(got, want, "q92")
  }
}
