package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-stable numeric aggregates.
  *
  * Summing doubles is accumulation-order dependent, and Spark's shuffle
  * merge order is not deterministic across runs — so a `round(sum(x),2)`
  * can flip its last digit vs the DuckDB oracle (or vs itself). Routing
  * the sum through an exact DECIMAL makes it order-independent, and
  * rounding IN DECIMAL SPACE sidesteps the engines' differing
  * double-rounding algorithms (Spark rounds the shortest decimal
  * representation HALF_UP; DuckDB rounds the true binary value). The
  * SQL mirror is `CAST(round(sum(CAST(x AS DECIMAL(38,6))), r) AS DOUBLE)`.
  */
object Num {
  /** Order-independent exact sum of a double column, as double. */
  def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(38, scale))).cast("double")

  /** dsum rounded to `r` decimals while still exact decimal. */
  def dsumR(c: Column, r: Int, scale: Int = 6): Column =
    round(sum(c.cast(DecimalType(38, scale))), r).cast("double")

  /** Order-independent mean: exact decimal sum cast to double, divided
    * by the group count — both engines perform the identical IEEE
    * division, so the result is bit-stable without rounding. */
  def davg(c: Column, scale: Int = 6): Column =
    dsum(c, scale) / count(lit(1))
}
