package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round benchmark: one JSON artifact line with per-query medians.
  *
  * Failure-honest by construction: a query that throws contributes NO
  * timing (a broken query must never make the bench look faster), its
  * message is recorded under "errors", and the process exits nonzero so
  * the driver can flag the artifact. The JSON line is printed (and
  * flushed) BEFORE session shutdown chatter and also mirrored to
  * `bench_out.json`, so a truncating log capture cannot eat its head —
  * and `/proc/loadavg` is sampled before and after so a
  * contention-poisoned run is detectable from the artifact alone.
  *
  * The headline "total" covers the BATCH queries (median of 3 — one
  * noisy run in either direction is discarded). The streaming family
  * (q71–q76) really executes micro-batch jobs whose wall time is
  * dominated by harness overhead (landing-drop setup, state store,
  * per-batch scheduling), not operator throughput; they run once each
  * and report under "streaming"/"streaming_total" so the headline stays
  * comparable round-over-round and is never diluted by stream plumbing.
  *
  * Shared-stage accounting: the memoized cross-query stages (q53→q54
  * pairs, q77→q78 decode, q79's index) are warmed BEFORE timing and
  * their build seconds reported under "stage_build" — so the headline
  * measures steady-state compose/probe cost while the one-time ingest
  * cost stays auditable instead of hiding in a discarded first run.
  * "contended" self-certifies the artifact against machine load, and
  * "server_rps" records the concurrent TCP server's throughput.
  */
object Bench {

  final case class QResult(name: String, sec: Double, err: Option[String])

  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split("\\s+")(0)
    catch { case _: Throwable => "-1" }

  /** (steal, total) jiffies from /proc/stat's aggregate cpu line —
    * the host-contention axis loadavg cannot see inside a VM. */
  private def stealTicks(): (Long, Long) =
    try {
      val f = scala.io.Source.fromFile("/proc/stat").getLines().next()
        .trim.split("\\s+").drop(1).map(_.toLong)
      (f.lift(7).getOrElse(0L), f.sum)
    } catch { case _: Throwable => (0L, 0L) }

  /** Deterministic single-thread CPU canary (SHA-256 over 64 MB,
    * ~100–300 ms): a fixed workload whose wall time tracks the HOST's
    * effective per-core speed. Measured r12 on this idle VM: the same
    * commit's JIT-warm server probe read 22–28 rps in one hour and
    * 8–10 in the next (boards drifting ×1.1–1.4 with it, recorded
    * steal up to ~1.5%) — host weather an in-VM loadavg never shows.
    * The canary lands in the artifact so a slow board is attributable
    * from the JSON alone. */
  private def canaryMs(): Double = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val buf = new Array[Byte](1 << 20)
    val t0 = System.nanoTime()
    var i = 0
    while (i < 64) { md.update(buf); i += 1 }
    md.digest()
    (System.nanoTime() - t0) / 1e6
  }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def timeQuery(spark: SparkSession, sfDir: String, name: String,
                fn: (SparkSession, String) => DataFrame, runs: Int): QResult = {
    // iterator + takeWhile: stop at the FIRST failure instead of
    // re-running a deterministically-broken query `runs` times
    val timings = (1 to runs).iterator.map { _ =>
      // Reap dead session state BEFORE the clock starts: queries
      // localCheckpoint intermediates, whose blocks stay pinned until a
      // driver GC lets the ContextCleaner run — without this, every
      // query pays the accumulated backlog of all queries before it in
      // the (sorted) board, and late-alphabet timings creep ~2× over a
      // 180-query session (measured r9→r10: q79 1.07→4.68 s over 7
      // bare runs, flat at ~1.2 s with the reap). ~0.1 s per call,
      // OUTSIDE the timed window; memoized stages stay strongly
      // referenced by StageCache, so only dead intermediates go.
      System.gc()
      // Reap ZOMBIE state-store providers too: every completed
      // streaming pipeline leaves its loaded providers behind (the
      // checkpoint dir is deleted, the in-memory maps are not), and
      // the 60 s maintenance tick re-snapshots every one of them —
      // recreating deleted /tmp checkpoints — for the rest of the
      // session. The storm lands on whichever pipeline is running
      // when the tick fires, which is why the 15–25 s spikes MIGRATE
      // between otherwise-identical boards (r10: driver q117 17.2 s /
      // idle 8.0 s, idle q71 25.5 s / driver 9.9 s). Unloading between
      // timed runs bounds live providers to the current query's own.
      graft.streaming.StateStoreReaper.unloadAll()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
      }
    }
    val collected = scala.collection.mutable.ListBuffer.empty[Either[String, Double]]
    timings.takeWhile { r => collected += r; r.isRight }.foreach(_ => ())
    collected.collectFirst { case Left(err) => QResult(name, -1.0, Some(err)) }
      .getOrElse(QResult(name, median(collected.collect { case Right(t) => t }.toSeq), None))
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  /** Contention gate: an artifact taken on a busy machine is not
    * trustworthy without an idle re-run, so the JSON self-certifies —
    * loadavg_pre above this threshold sets `"contended":true` (override
    * via SPARK_GRAFT_MAX_LOAD). The run still completes and reports
    * (losing the numbers helps nobody), but a flagged artifact must not
    * be read as a performance claim. */
  val MaxLoadDefault = 2.0

  /** Opt-in idle gate: with SPARK_GRAFT_WAIT_IDLE_SECS set, block (up
    * to that budget) until loadavg drops under the contention
    * threshold BEFORE sampling loadavg_pre — so an end-of-round
    * artifact taken right after a test run waits out the machine
    * instead of committing a self-flagged contended JSON. On timeout
    * the run proceeds and self-certifies contended as before. */
  private def waitForIdle(): Unit = {
    val budget = sys.env.get("SPARK_GRAFT_WAIT_IDLE_SECS")
      .flatMap(_.toLongOption).getOrElse(0L)
    if (budget <= 0) return
    val maxLoad = sys.env.get("SPARK_GRAFT_MAX_LOAD")
      .flatMap(_.toDoubleOption).getOrElse(MaxLoadDefault)
    val deadline = System.currentTimeMillis() + budget * 1000
    while (System.currentTimeMillis() < deadline &&
           loadavg().toDoubleOption.exists(_ > maxLoad)) {
      System.err.println(s"[bench] waiting for idle: loadavg ${loadavg()} > $maxLoad")
      Thread.sleep(15000)
    }
  }

  /** Runs everything, returns (artifact JSON line, exit code). Pure of
    * System.exit/println so BenchSpec can assert a deliberately-broken
    * query poisons the exit code instead of the timings.
    * `stageWarm` builds the cross-query shared stages BEFORE timing and
    * reports their build seconds under "stage_build" — otherwise
    * median-of-N discards the ingest cost into the first run invisibly.
    * `serverBench` runs AFTER the timed queries (so its load cannot
    * pollute them) and reports under "server_rps". */
  def run(spark: SparkSession, sfDir: String,
          batch: Map[String, (SparkSession, String) => DataFrame],
          streaming: Map[String, (SparkSession, String) => DataFrame],
          runs: Int = 3,
          stageWarm: Option[(SparkSession, String) => Map[String, Double]] = None,
          serverBench: Option[() => Double] = None,
          extra: Seq[(String, String)] = Nil): (String, Int) = {
    waitForIdle()
    val loadPre = loadavg()
    val maxLoad = sys.env.get("SPARK_GRAFT_MAX_LOAD")
      .flatMap(_.toDoubleOption).getOrElse(MaxLoadDefault)
    val contended = loadPre.toDoubleOption.exists(_ > maxLoad)
    // failure-honest like the queries: a stage-build or server-probe
    // crash must be RECORDED (and poison the exit code), never abort
    // the artifact or pass as a clean run
    val (stageBuild, stageErr) =
      stageWarm.map { f =>
        try (f(spark, sfDir), None)
        catch { case e: Throwable =>
          (Map.empty[String, Double], Some(QResult("stage_build", -1.0,
            Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"))))
        }
      }.getOrElse((Map.empty[String, Double], None))
    val batchR = batch.toSeq.sortBy(_._1).map { case (n, f) =>
      timeQuery(spark, sfDir, n, f, runs) }
    val streamR = streaming.toSeq.sortBy(_._1).map { case (n, f) =>
      timeQuery(spark, sfDir, n, f, 1) }
    val (serverRps, serverErr) = serverBench.map { f =>
      try (Some(f()), None)
      catch { case e: Throwable =>
        (None, Some(QResult("server_bench", -1.0,
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"))))
      }
    }.getOrElse((None, None))
    val loadPost = loadavg()

    def queriesJson(rs: Seq[QResult]) =
      rs.filter(_.err.isEmpty).map(r => s"${jsonStr(r.name)}:${r.sec}")
        .mkString("{", ",", "}")
    val errs = (batchR ++ streamR ++ stageErr ++ serverErr).filter(_.err.isDefined)
    val errJson = errs.map(r => s"${jsonStr(r.name)}:${jsonStr(r.err.get)}")
      .mkString("{", ",", "}")
    def total(rs: Seq[QResult]) = rs.filter(_.err.isEmpty).map(_.sec).sum

    val stageJson = stageBuild.toSeq.sortBy(_._1)
      .map { case (n, t) => s"${jsonStr(n)}:$t" }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":${total(batchR)},"unit":"sec",""" +
        s""""queries":${queriesJson(batchR)},""" +
        s""""stage_build":$stageJson,""" +
        s""""streaming":${queriesJson(streamR)},""" +
        s""""streaming_total":${total(streamR)},""" +
        serverRps.map(r => s""""server_rps":$r,""").getOrElse("") +
        extra.map { case (k, v) => s"${jsonStr(k)}:$v," }.mkString +
        s""""errors":$errJson,"n_failed":${errs.size},""" +
        s""""loadavg_pre":$loadPre,"loadavg_post":$loadPost,""" +
        s""""contended":$contended,"max_loadavg":$maxLoad,""" +
        s""""sf":${jsonStr(sfDir)}}"""
    (json, if (errs.nonEmpty) 1 else 0)
  }

  /** Compact tail-survivable summary line (r15, the bench-contract
    * fix — r14 verdict ask #3): the full artifact line is ~7 kB for
    * 280 queries and has NEVER fit the round driver's 2000-char tail
    * capture, so the driver's round-over-round comparison has parsed
    * nothing since r01. This second line re-states the headline
    * totals in well under 500 chars so at least the totals, failure
    * count and host-regime fields parse from the tail alone. It
    * carries NO per-query map ON PURPOSE: a truncated "queries" map
    * in the tail could be read as the full registry and flag every
    * missing query as dropped. Additions-only — the full artifact
    * line and the bench_out.json mirror are byte-identical to the
    * historic contract; this line follows it. */
  private[graft] def compactLine(json: String): String = {
    def f(key: String): String =
      ("\"" + key + "\":(-?[0-9.eE+-]+|true|false)").r
        .findFirstMatchIn(json).map(_.group(1)).getOrElse("null")
    // failed-query NAMES only (messages stay in the full line); the
    // errors map is {} on a clean run
    val errBody = "\"errors\":\\{([^}]*)".r.findFirstMatchIn(json)
      .map(_.group(1)).getOrElse("")
    val failed = "\"([^\"]+)\":".r.findAllMatchIn(errBody)
      .map(_.group(1)).take(10).toSeq
    val sf = "\"sf\":\"([^\"]*)\"".r.findFirstMatchIn(json)
      .map(_.group(1)).getOrElse("")
    val stageTotal = "\"stage_build\":\\{([^}]*)".r.findFirstMatchIn(json)
      .map(m => ":(-?[0-9.eE+]+)".r.findAllMatchIn(m.group(1))
        .map(_.group(1).toDouble).sum).getOrElse(0.0)
    s"""{"compact":true,"metric":"total","value":${f("value")},""" +
      s""""unit":"sec","streaming_total":${f("streaming_total")},""" +
      s""""stage_build_total":$stageTotal,""" +
      s""""server_rps":${f("server_rps")},""" +
      s""""n_failed":${f("n_failed")},""" +
      (if (failed.nonEmpty)
        s""""failed":[${failed.map(jsonStr).mkString(",")}],""" else "") +
      s""""loadavg_pre":${f("loadavg_pre")},""" +
      s""""contended":${f("contended")},""" +
      s""""machine_canary_ms_post":${f("machine_canary_ms_post")},""" +
      s""""steal_pct":${f("steal_pct")},"sf":${jsonStr(sf)}}"""
  }

  /** Block (up to `budgetMs`) until loadavg drops under the contention
    * threshold — used before the server probe and again before the
    * board, so BOTH measurements happen in the idle regime the
    * artifact self-certifies. */
  private def settle(budgetMs: Long): Unit = {
    val deadline = System.currentTimeMillis() + budgetMs
    while (System.currentTimeMillis() < deadline &&
           loadavg().toDoubleOption.exists(_ > MaxLoadDefault)) {
      System.err.println(s"[bench] settling: loadavg ${loadavg()}")
      Thread.sleep(10000)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // backstop for the per-query reap in timeQuery: the streaming
      // pipelines run long enough between timeQuery calls that the
      // cleaner's own periodic trigger (default 30 MINUTES) matters
      .config("spark.cleaner.periodicGC.interval", "30s")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val streamingNames = SparkEntry.streamingQueries.keySet
    val batch = SparkEntry.queries.view.filterKeys(!streamingNames(_)).toMap
    // Warm the JVM/codegen/catalog once so the first measured query
    // doesn't absorb one-time session startup (~3-5s otherwise). Warm
    // from the BATCH map only — the full map's hash-arbitrary head
    // could be a streaming query that runs a whole micro-batch job.
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      batch.get("q01_pricing_summary").orElse(batch.headOption.map(_._2))
        .foreach(fn => fn(spark, sfDir).count())
    } catch { case _: Throwable => }

    // Concurrent-server throughput probe (the reference GUI's serving
    // regime): 8 clients × 12 mixed explore/retraction requests against
    // one cached sample store, MEDIAN OF 3 rounds. Measured BEFORE the
    // board, in the serving-shaped session the claim is about: probing
    // after 216 analytics queries conflated session aging with server
    // cost — identical idle boards read 4–11 rps (vs ~15 in a fresh
    // session, graft.ServerProbe), noise that would mask a real 2×
    // server regression, and neither a dead-state reap nor evicting
    // every memoized stage recovered it. A real deployment serves from
    // a serving process, not from the tail of an analytics board; the
    // post-board regime stays bisectable via ServerProbe.
    //
    // The probe SETTLES FIRST, unconditionally: the r10 driver
    // artifact read server_rps 2.23 vs 19.81 idle on the SAME commit
    // because the driver launches Bench straight after a ~20-minute
    // sbt phase — the probe ran on a still-hot machine while the
    // board's loadavg_pre (sampled after the post-probe settle loop)
    // read 1.92, so only the flattering half of the run was
    // self-certified. Now both harnesses probe in the same regime and
    // the artifact records the loadavg the probe actually saw
    // ("server_probe_loadavg") so a contended probe is visible.
    settle(300000L)
    val probeLoad = loadavg()
    val canaryPre = canaryMs()
    val (steal0, total0) = stealTicks()
    val (serverRps: Double, serverRounds: Seq[Double]) = {
      import spark.implicits._
      import graft.chess._
      val games = ChessIngest.parseGames(spark,
        spark.createDataset(Seq(SampleGames.pgn)), Core.Level.Human)
      val agg = ChessIngest.positionsAgg(
        ChessIngest.positionStream(spark, games)).cache()
      agg.count()
      val e2e4 = "rnbqkbnr/pppppppp/8/8/4P3/8/PPPP1PPP/RNBQKBNR b KQkq - 0 1"
      val lines = Seq(
        s"""{"token":"b1","query":{"positions":[{"fen":"${Position.StartFen}"}],"fetchChildren":true}}""",
        s"""{"token":"b2","query":{"positions":[{"fen":"${Position.StartFen}","move":"e2e4"}],"fetchChildren":true}}""",
        s"""{"token":"b3","retractions":{"fen":"$e2e4","synthesize":true}}""")
      // 2 warm-up + 3 measured rounds, median of the measured: the
      // probe path is JIT-cold-start dominated (measured r12: round 1
      // reads 12–14 rps, round 3+ reads 19–28 in the same JVM — a
      // >2× within-JVM warm-up), so a 3-round median samples compile
      // maturity, not server throughput, and reads LOWER the slower
      // the machine ran the early rounds — the r10/r11 driver-vs-idle
      // spread's measurable component. A real deployment serves
      // JIT-warm; the steady-state number is the honest claim. ALL
      // rounds (warm-up included) land in the artifact under
      // "server_rps_rounds" so a regime where even late rounds sit
      // low (a genuine serving regression, or an execution-wrapper
      // throttle) is visible from the artifact alone. Bisection notes
      // (r12): bare-java vs sbt-forked probe identical; 2 busy cores
      // cost <15%; 3 GB of dirty-page writeback costs ~25% — none
      // reproduces the r11 driver's flat 3.77, which leaves the
      // round-driver's execution wrapper; the per-round record makes
      // that diagnosable next time it appears.
      val warmup = 2
      val rounds = (1 to warmup + 3).map { r =>
        System.gc()
        val (rps, _) = ChessServer.throughput(spark, agg, lines,
          clients = 8, perClient = 12, games = Some(games))
        System.err.println(f"[bench] server probe round $r: $rps%.2f req/s" +
          (if (r <= warmup) " (warm-up)" else ""))
        rps
      }
      agg.unpersist(blocking = false)
      (median(rounds.drop(warmup)), rounds)
    }
    // let the probe's own load decay so it cannot contaminate the
    // board's loadavg_pre / contended self-certification
    settle(240000L)

    val (json0, exitCode) = run(spark, sfDir, batch, SparkEntry.streamingQueries,
      stageWarm = Some(graft.operators.SharedStages.warm),
      serverBench = Some(() => serverRps),
      extra = Seq("server_probe_loadavg" -> probeLoad,
        "server_rps_rounds" -> serverRounds.mkString("[", ",", "]"),
        "machine_canary_ms_pre" -> f"$canaryPre%.1f"))
    // host-regime postscript: the canary again plus the steal share
    // over the whole run — appended after `run` so the fields reflect
    // the board the artifact times
    val canaryPost = canaryMs()
    val (steal1, total1) = stealTicks()
    val stealPct =
      if (total1 > total0) 100.0 * (steal1 - steal0) / (total1 - total0)
      else 0.0
    // the splice assumes run() emits a bare object with no trailer; if
    // its shape ever changes, fail loudly rather than emitting an
    // unparseable artifact the gates would then mis-read
    require(json0.endsWith("}"),
      s"bench artifact no longer ends with '}' — fix the host-regime " +
        s"splice before emitting: ...${json0.takeRight(40)}")
    val json = json0.stripSuffix("}") +
      f""","machine_canary_ms_post":$canaryPost%.1f""" +
      f""","steal_pct":$stealPct%.2f}"""
    // artifact first, own line, flushed — then the tail-survivable
    // compact summary (see compactLine), a file mirror, THEN teardown
    println(); println(json); println(compactLine(json)); Console.out.flush()
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), json)
    catch { case _: Throwable => }
    spark.stop()
    if (exitCode != 0) sys.exit(exitCode)
  }
}
