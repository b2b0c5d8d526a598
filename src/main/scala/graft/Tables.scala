package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness parquet tables (TESTDATA.md).
  *
  * All queries take the sf dir as a parameter so the same plan runs at
  * sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) — and, unchanged,
  * against a 100 TB lake: nothing here materializes driver-side state
  * that scales with data.
  */
object Tables {
  /** Timestamp normalization — the harness has regenerated the testdata
    * with different parquet timestamp flavors across rounds (MICROS
    * isAdjustedToUTC=true, then TIMESTAMP(NANOS), now MICROS
    * isAdjustedToUTC=false), so every read pins confs that make all of
    * them land as a plain `TimestampType` holding the same micros:
    *
    *  - `inferTimestampNTZ.enabled=false`: naive MICROS/MILLIS columns
    *    (`lineitem.l_shipdate`, `orders.o_orderdate`, `events.ts`) read
    *    as TIMESTAMP with the stored micros verbatim — value-identical
    *    to the adjusted-to-UTC flavor, and to how the DuckDB oracle
    *    reads the same column. Without it Spark 4 infers TIMESTAMP_NTZ,
    *    which unix_micros/watermarks reject.
    *  - `nanosAsLong=true`: TIMESTAMP(NANOS) — which the vectorized
    *    reader otherwise rejects outright — reads as a nanos long;
    *    `eventsRaw` rebuilds TimestampType via integer division (the
    *    data is exactly microsecond-grained, verified epoch_ns % 1000
    *    == 0 for all rows, so the conversion is lossless).
    *  - session UTC so any residual NTZ→LTZ cast is micros-preserving.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  private def eventsRaw(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
