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
        val games = ChessIngest.parseGames(spark, batch, level)
        ChessIngest.positionsAgg(ChessIngest.positionStream(spark, games))
          .withColumn("epoch", lit(epochId))
          .write.mode("append").partitionBy("epoch").parquet(destDir)
        ()
      }
    (if (continuous) writer else writer.trigger(Trigger.AvailableNow())).start()
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
}
