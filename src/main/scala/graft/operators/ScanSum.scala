package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum (parallel scan): running total of `valueCol`
  * in global (`partCol`, `orderCol`) order WITHOUT a per-group
  * single-reducer window.
  *
  * `Window.partitionBy(group).orderBy(k)` funnels each group through
  * ONE task — correct, but a scale-killer when groups are few and huge
  * (q58 packs per `lang`: five groups over the whole corpus). The
  * classic fix is the two-pass scan: range-partition on (group, k) so
  * each task holds a contiguous slice, compute partition-LOCAL running
  * sums (windows keyed by (group, partition id) — thousands of small
  * groups, embarrassingly parallel), aggregate one subtotal row per
  * (group, partition) into a table small enough to broadcast, prefix-sum
  * THAT tiny table, and add each slice's offset back. Every stage is
  * bounded by partition size, never by group size.
  *
  * Determinism: range boundaries come from sampling, so the slice
  * assignment can vary between runs — but any boundaries are correct
  * (offsets are computed from the actual slices), and the pinned
  * localCheckpoint keeps partition ids consistent between the local-scan
  * and offset passes within a run.
  */
object ScanSum {

  def runningSum(df: DataFrame, partCol: String, orderCol: String,
                 valueCol: String, outCol: String = "cum",
                 numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(n, col(partCol), col(orderCol))
      .sortWithinPartitions(col(partCol), col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val local = Window.partitionBy(col(partCol), col("__pid"))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = ranged
      .groupBy(col(partCol), col("__pid"))
      .agg(sum(col(valueCol)).as("__psum"))
      .withColumn("__off", coalesce(sum(col("__psum")).over(
        Window.partitionBy(col(partCol)).orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(partCol), col("__pid"), col("__off"))
    ranged
      .withColumn("__lcum", sum(col(valueCol)).over(local))
      .join(broadcast(offsets), Seq(partCol, "__pid"))
      .withColumn(outCol, col("__lcum") + col("__off"))
      // drop ALL scratch columns — a leaked __off makes a CHAINED
      // ScanSum call (q221 ranks two axes, q222 cumulates two sides)
      // fail with an ambiguous reference on its own offsets join
      .drop("__pid", "__lcum", "__off")
  }
}
