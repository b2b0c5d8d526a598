package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join (SURVEY.md §2.3 J6): for each left row attach the latest
  * right timestamp that is <= the left row's timestamp, within the same
  * key group (inner semantics: left rows with no prior right row drop).
  *
  * Implementation: tag + union + `last(_, ignoreNulls)` over a
  * key-partitioned time-ordered window. Cost: ONE shuffle on the key and
  * a sort within each key partition — no crossjoin, no range explosion —
  * so it scales linearly with events per key and is skew-safe under AQE.
  * Right rows order before left rows at equal timestamps, making the
  * match inclusive (right.ts == left.ts matches), which mirrors
  * `ASOF JOIN ... ON l.ts >= r.ts` semantics.
  */
object AsOfJoin {
  def apply(left: DataFrame, right: DataFrame,
            key: String, leftTs: String, rightTsOut: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val tsType = right.schema(rightTsOut).dataType

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .withColumn("__rts", lit(null).cast(tsType))

    // Right rows carry only (key, ts); left payload columns are null.
    val r0 = right
      .withColumn("__ts", col(rightTsOut).cast(left.schema(leftTs).dataType))
      .withColumn("__tag", lit(0))
      .withColumn("__rts", col(rightTsOut))
    val r = r0.select(
      leftCols.map(c =>
        if (c == key) col(key)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__ts"), col("__tag"), col("__rts")): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.select(leftCols.map(col) ++ Seq(col("__ts"), col("__tag"), col("__rts")): _*)
      .unionByName(r)
      .withColumn("__filled", last(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1 && col("__filled").isNotNull)
      .select(leftCols.map(col) :+ col("__filled").as(rightTsOut): _*)
  }
}
