package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming A/B monitor (ST17 — q166 as a stream): the
  * continuously-watched experiment dashboard. Each micro-batch lands
  * its PARTIAL per-(user, type) event counts under a batch_id
  * partition (dynamic overwrite → replay-idempotent), the store
  * LSM-folds mid-run, and the answer is the SAME
  * [[graft.operators.RelationalQueries.abTestView]] the one-shot batch
  * runs, over the merge-on-read SUM. The conversion gate (k ≥ AbConvK)
  * is applied AT READ over the merged totals — a per-batch gate would
  * be wrong (a user can cross the bar across batches); counts add, so
  * stream == batch BY ALGEBRA and the oracle IS q166's batch SQL.
  */
object StreamingAbTest {

  def processBatch(spark: SparkSession, storeDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    batch
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(storeDir)
    BatchStore.maybeCompact(spark, storeDir, batchId)
  }

  /** Stream a landing directory of event drops into the partial-count
    * store; AvailableNow = bounded catch-up run. */
  def run(spark: SparkSession, landingDir: String, schemaFrom: DataFrame,
          storeDir: String, checkpointDir: String): Unit = {
    spark.readStream
      .schema(schemaFrom.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landingDir)
      .writeStream
      .foreachBatch(processBatch(spark, storeDir) _)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
  }

  /** Merge-on-read per-user counts: sum of the live partials. */
  def userCounts(spark: SparkSession, storeDir: String): DataFrame =
    BatchStore.liveRows(spark, storeDir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("cnt")).as("k"))
}
