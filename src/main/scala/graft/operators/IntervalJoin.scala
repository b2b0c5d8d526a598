package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Binned point-in-interval join (SURVEY.md §2.3 J5 — the FACT×FACT
  * scale path).
  *
  * The broadcast-nested-loop range join (q15) is right only while one
  * side is dimension-sized; at 100 TB a fact×fact `p BETWEEN lo AND hi`
  * join degenerates to a cartesian per executor. The standard fix is to
  * discretize the join axis: points land in bin floor(p/w), intervals
  * replicate to every bin they overlap, and the theta join becomes an
  * EQUI-join on the bin key — shuffle-partitioned, AQE-skew-splittable,
  * spillable — followed by a partition-local residual range check.
  *
  * Each matching (point, interval) pair meets in EXACTLY one bin (the
  * point's), so no post-join dedup is needed. Replication factor is
  * len(interval)/w + 1 per interval row: pick `binWidth` at or above
  * the typical interval length so the blow-up stays ~2×.
  */
object IntervalJoin {

  private val Bin = "__graft_bin"

  /** Join `points` (numeric/timestamp column `pointCol`) with
    * `intervals` rows satisfying `loCol <= pointCol <= hiCol`, inclusive
    * both ends. The axis is discretized with `binWidth` in the column's
    * natural units (epoch seconds for timestamps). Column names must be
    * disjoint between the two sides (rename before calling, as with any
    * equi-join). */
  /** Axis value as epoch-second/integer long. TIMESTAMP_NTZ has no
    * direct long cast — route it through TIMESTAMP (session TZ; the
    * mapping is monotonic and applied identically to both sides, which
    * is all binning needs). */
  private def axisLong(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampNTZType => col(c).cast(TimestampType).cast(LongType)
      case _ => col(c).cast(LongType)
    }

  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn(Bin,
      floor(axisLong(points, pointCol) / binWidth))
    val i = intervals.withColumn(Bin,
      explode(sequence(floor(axisLong(intervals, loCol) / binWidth),
                       floor(axisLong(intervals, hiCol) / binWidth))))
    p.join(i, Seq(Bin))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(Bin)
  }
}
