package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k without a per-group single-reducer window.
  *
  * `Window.partitionBy(g).orderBy(o)` + `rn <= k` funnels every row of
  * a group through one task — fine for high-cardinality groups, a
  * scale-killer when groups are few and huge (per-language sampling,
  * per-probe ranking over a fact-sized candidate set). The two-phase
  * form exploits that a group's global top-k is a subset of the union
  * of its per-partition top-ks UNDER ANY partitioning: phase one takes
  * k candidates per (group, input partition) — embarrassingly parallel,
  * bounded by partition size — and the final exact window ranks only
  * the ≤ k × numPartitions survivors per group.
  *
  * `orderCols` must be a total order (include a unique tiebreak) or
  * the survivor set — and thus the result — could vary with
  * partitioning. The row_number emitted by the final window is exact. */
object GroupedTopK {

  def topK(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
           k: Int, rnCol: String = "rn"): DataFrame = {
    val localW = Window
      .partitionBy((groupCols.map(col) :+ col("__pid")): _*)
      .orderBy(orderCols: _*)
    val finalW = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", row_number().over(localW))
      .filter(col("__lrn") <= k)
      .drop("__lrn", "__pid")
      .withColumn(rnCol, row_number().over(finalW))
      .filter(col(rnCol) <= k)
  }
}
