package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Structured-Streaming surface (SURVEY.md §2.9 ST1–ST5).
  *
  * The reference is batch-with-incremental-append (`create` then
  * `merge`); here incremental ingest is a first-class stream: a file
  * source watches a landing directory, and the same declarative
  * transforms run over the unbounded table. Each op is expressed so the
  * IDENTICAL column logic also runs in batch mode (the specs exercise
  * both paths; the batch path is what the DuckDB oracle can check).
  *
  * Scale posture: all stateful ops are keyed by (user_id | window) so
  * state partitions by the shuffle key across executors; watermarks
  * bound state size; Trigger.AvailableNow gives bounded catch-up runs
  * (the "merge" equivalent) without a long-lived cluster.
  */
object EventStreams {

  /** ST1: stream-read a landing directory of event parquet drops with
    * the given schema (taken from an existing batch table). */
  def readEventStream(spark: SparkSession, landingDir: String,
                      schemaFrom: DataFrame): DataFrame =
    spark.readStream
      .schema(schemaFrom.schema)
      .option("maxFilesPerTrigger", 16)
      .parquet(landingDir)

  /** ST2: tumbling/sliding window counts per event_type with an ST4
    * watermark bounding late data (and thus state). Works on a batch or
    * streaming `events` frame alike. */
  def windowedCounts(events: DataFrame, width: String = "10 minutes",
                     slide: Option[String] = None,
                     watermark: String = "1 hour"): DataFrame = {
    val wm = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    val win = slide.fold(window(col("ts"), width))(sl => window(col("ts"), width, sl))
    // decimal accumulate, round, THEN back to double: a double sum is
    // association-order-dependent, so its hash would vary with the
    // micro-batch slicing (and never match the DuckDB oracle of q74)
    wm.groupBy(win.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(38,6)")), 2).cast("double").as("v"))
      .select(col("w.start").as("win_start"), col("w.end").as("win_end"),
              col("event_type"), col("n"), col("v"))
  }

  /** ST3: session windows per user (gap-based), watermarked. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "1 hour"): DataFrame = {
    val wm = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    wm.groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        // decimal-routed like windowedCounts: a raw double sum is
        // association-order-dependent and would flake the moment this
        // joins a hash-compared surface
        round(sum(col("value").cast("decimal(38,6)")), 2).cast("double").as("v"))
      .select(col("w.start").as("sess_start"), col("w.end").as("sess_end"),
              col("user_id"), col("n_events"), col("v"))
  }

  /** ST5: stateful dedup — drop repeated event_ids within the watermark
    * horizon (exactly-once view of an at-least-once feed). */
  def dedupedStream(events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")
  }

  /** F11 typed variant: parse the `props` JSON string into a typed
    * struct with an explicit schema (vs per-path `get_json_object` in
    * q16) — one parse per row however many fields are read, and
    * malformed JSON degrades to null fields instead of failing the
    * batch. Works identically on the streaming path. */
  def withTypedProps(events: DataFrame): DataFrame =
    events.withColumn("props_t",
      from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))))
      .withColumn("prop_k", col("props_t.k"))
      .drop("props_t")

  /** ST1 sink side: append each micro-batch to a parquet epoch dir —
    * the streaming analogue of the reference's import-then-merge run
    * accumulation (SURVEY.md §3.1). */
  def appendSink(out: DataFrame, destDir: String, checkpointDir: String):
      DataStreamWriter[Row] =
    out.writeStream
      .format("parquet")
      .option("path", destDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
}
