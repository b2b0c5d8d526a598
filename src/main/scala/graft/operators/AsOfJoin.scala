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

  /** NEAREST as-of (J6b): attach the right timestamp CLOSEST in time —
    * either direction — to each left row, ties to the earlier side.
    * Same tag+union machinery as [[apply]], but with BOTH directional
    * fills over one key shuffle: the backward branch is the inclusive
    * `last(_, ignoreNulls)` prefix fill (right rows order before left
    * at equal ts, so a dt = 0 match lands here — which also settles
    * the |dt| tie toward the earlier side for free), the forward
    * branch is the strictly-later `first(_, ignoreNulls)` suffix fill
    * (equal-ts rights sort BEFORE the left row and stay out of its
    * suffix frame — no double count). Requires a NUMERIC ts column
    * (epoch micros) so the |dt| argmin is exact integer arithmetic.
    * Still one shuffle, two in-partition sorts' worth of window work,
    * no range explosion — linear in events per key, skew-safe. */
  def nearest(left: DataFrame, right: DataFrame,
              key: String, leftTs: String, rightTsOut: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val tsType = right.schema(rightTsOut).dataType

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .withColumn("__rts", lit(null).cast(tsType))
    val r0 = right
      .withColumn("__ts", col(rightTsOut).cast(left.schema(leftTs).dataType))
      .withColumn("__tag", lit(0))
      .withColumn("__rts", col(rightTsOut))
    val r = r0.select(
      leftCols.map(c =>
        if (c == key) col(key)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__ts"), col("__tag"), col("__rts")): _*)

    val ord = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__tag").asc)
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    l.select(leftCols.map(col) ++ Seq(col("__ts"), col("__tag"), col("__rts")): _*)
      .unionByName(r)
      .withColumn("__back", last(col("__rts"), ignoreNulls = true).over(wb))
      .withColumn("__fwd", first(col("__rts"), ignoreNulls = true).over(wf))
      .filter(col("__tag") === 1 &&
        (col("__back").isNotNull || col("__fwd").isNotNull))
      .withColumn("__near",
        when(col("__fwd").isNull, col("__back"))
          .when(col("__back").isNull, col("__fwd"))
          .when(col("__ts") - col("__back") <= col("__fwd") - col("__ts"),
            col("__back"))
          .otherwise(col("__fwd")))
      .select(leftCols.map(col) :+ col("__near").as(rightTsOut): _*)
  }

  /** TOLERANT as-of (J6c — pandas' `merge_asof(tolerance=...)` /
    * kdb's windowed aj shape): the latest prior-or-equal right
    * timestamp, but a match STALER than `toleranceUs` is no match at
    * all, and unmatched left rows are KEPT with a null (left-outer
    * semantics — the attribution regime where "no recent touchpoint"
    * is itself the signal, which [[apply]]'s inner semantics cannot
    * express). Same one-shuffle tag+union prefix fill; the tolerance
    * is a post-fill null-out, so the plan shape is identical to J6's.
    * `leftTs`/`rightTsOut` must be integer epoch micros (the
    * tolerance arithmetic is exact). */
  def tolerant(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTsOut: String,
               toleranceUs: Long): DataFrame = {
    val leftCols = left.columns.toSeq
    val tsType = right.schema(rightTsOut).dataType
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .withColumn("__rts", lit(null).cast(tsType))
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
      .filter(col("__tag") === 1)
      .withColumn("__tol",
        when(col("__filled").isNotNull &&
          col("__ts") - col("__filled") <= toleranceUs, col("__filled")))
      .select(leftCols.map(col) :+ col("__tol").as(rightTsOut): _*)
  }
}
