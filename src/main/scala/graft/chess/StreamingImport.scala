package graft.chess

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** ST1 (SURVEY.md §2.9): incremental PGN ingest as a real stream.
  *
  * The reference's `create` + later `merge` becomes: a file-source
  * stream watches a landing directory for PGN drops; each micro-batch
  * parses + replays its games and APPENDS a pre-aggregated epoch to the
  * entry store directory (partitioned by epoch id). Readers union all
  * epochs and re-aggregate (cheap: epochs are already partial
  * aggregates); `compact` collapses them to one epoch — exactly the
  * reference's LSM run/merge lifecycle with Spark doing the heavy
  * lifting (SURVEY.md §3.1).
  *
  * Scale posture: each batch shuffles only ITS new games; compaction is
  * an idempotent batch job over epoch partitions; watermark-free (game
  * ingest has no event-time semantics — files are whole units).
  */
object StreamingImport {

  /** Start the incremental import: `landingDir` PGN drops → destDir/epoch=N.
    * Trigger.AvailableNow processes the backlog then stops (the
    * catch-up "merge" mode); pass continuous=true for a long-lived
    * watcher. */
  def start(spark: SparkSession, landingDir: String, destDir: String,
            checkpointDir: String, level: Byte = Core.Level.Human,
            continuous: Boolean = false): StreamingQuery = {
    import spark.implicits._
    val raw = spark.readStream
      .option("wholetext", "true")       // one PGN file = one parse unit
      .option("maxFilesPerTrigger", 64)
      .text(landingDir)
    val writer = raw.as[String].writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[String], epochId: Long) =>
        writeEpoch(spark, batch, destDir, epochId, level)
      }
    (if (continuous) writer else writer.trigger(Trigger.AvailableNow())).start()
  }

  /** One micro-batch's epoch write — IDEMPOTENT under foreachBatch's
    * at-least-once contract: a batch replayed after a mid-write kill
    * re-runs with the same epochId, and dynamic partition overwrite
    * makes it rewrite exactly `epoch=<id>` instead of appending a
    * second copy of every row into it (the silent double-count a blind
    * append mode has on restart — the same fix IncrementalDedup's
    * batch-id partitions apply). Exposed so the spec can replay an
    * epoch directly and assert the store unchanged. */
  def writeEpoch(spark: SparkSession, batch: org.apache.spark.sql.Dataset[String],
                 destDir: String, epochId: Long,
                 level: Byte = Core.Level.Human): Unit = {
    val games = ChessIngest.parseGames(spark, batch, level)
    ChessIngest.positionsAgg(ChessIngest.positionStream(spark, games))
      .withColumn("epoch", lit(epochId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("epoch").parquet(destDir)
  }

  /** Read the current entry store: union of all epochs, re-combined.
    * Equal keys across epochs merge exactly like the reference's k-way
    * run merge (the measures are all reassociative). */
  def readStore(spark: SparkSession, destDir: String): DataFrame =
    spark.read.parquet(destDir)
      .groupBy("posHi", "posLo", "reverseMove", "level", "result")
      .agg(sum("games").as("games"), sum("eloDiffSum").as("eloDiffSum"),
           min("firstGameId").as("firstGameId"), max("lastGameId").as("lastGameId"))

  /** Compaction: collapse all epochs into epoch=0 (idempotent job). */
  def compact(spark: SparkSession, destDir: String, compactedDir: String): Unit =
    readStore(spark, destDir)
      .withColumn("epoch", lit(0L))
      .write.mode("overwrite").partitionBy("epoch").parquet(compactedDir)

  /** Epoch partitions currently in the store — one FileSystem listing
    * (works on HDFS/S3 paths, not just local disk), no Spark job. */
  def epochCount(destDir: String): Int =
    graft.Fs.childNames(destDir).count(_.startsWith("epoch="))

  /** Compaction trigger policy (conf'd like a broadcast threshold):
    * compact once the store accumulates this many epochs. Measured
    * (COMPACTION_BENCH.json, 100k games, 5.6M entries): probe LATENCY
    * is flat in epoch count on one node — the per-epoch partials
    * re-merge in the same parallel agg — and row inflation is small
    * when epochs' key sets barely overlap (~2% here; it approaches
    * ×epochs for hot-key-heavy corpora, e.g. openings). What grows
    * without bound is FILE count (×16 at 16 epochs): at cluster scale
    * that is listing RPCs, footer reads and scheduler tasks on every
    * probe, paid by every executor. Compacting every ~8 epochs keeps
    * the file count a small constant over unbounded appends while
    * paying the one-pass rewrite (readStore + write, ~2x one probe
    * here) an 8th as often as every-epoch compaction would. */
  val CompactEpochsConf = "spark.graft.store.compactEpochs"
  val DefaultCompactEpochs = 8

  /** Apply the trigger policy: compact `destDir` into `compactedDir`
    * iff the epoch count has reached the conf'd threshold. Returns
    * whether compaction ran. */
  def maybeCompact(spark: SparkSession, destDir: String,
                   compactedDir: String): Boolean = {
    val thr = spark.conf.get(CompactEpochsConf, DefaultCompactEpochs.toString).toInt
    val due = epochCount(destDir) >= thr
    if (due) compact(spark, destDir, compactedDir)
    due
  }
}
