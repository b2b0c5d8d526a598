package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.ScanSum

/** Two-pass distributed prefix sum == the naive single-reducer window,
  * while actually spreading each group across partitions. */
class ScanSumSpec extends SparkTestBase {
  import spark.implicits._

  test("running sum equals the naive window across skewed groups") {
    val rnd = new scala.util.Random(3)
    // two huge groups + one tiny one, values with duplicates
    val rows = (0 until 20000).map { i =>
      val g = if (i % 2 == 0) "a" else if (i % 1001 == 0) "c" else "b"
      (g, i.toLong, (rnd.nextInt(50) + 1).toLong)
    }
    val df = rows.toDF("g", "k", "v")

    val got = ScanSum.runningSum(df, "g", "k", "v", numPartitions = 16)
      .select("g", "k", "cum").as[(String, Long, Long)].collect().toSet
    val naive = df.withColumn("cum", sum(col("v")).over(
        Window.partitionBy(col("g")).orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("g", "k", "cum").as[(String, Long, Long)].collect().toSet
    assert(got == naive)
  }

  test("the scan distributes: no (group, slice) holds a whole big group") {
    val df = (0 until 20000).map(i => ("g", i.toLong, 1L)).toDF("g", "k", "v")
    val out = ScanSum.runningSum(df, "g", "k", "v", numPartitions = 16)
    // final row's cum = total, single group — correctness first
    assert(out.agg(max(col("cum"))).head().getLong(0) == 20000L)
    // the local pass ran over many slices: re-derive the slice sizes
    val slices = df.repartitionByRange(16, col("g"), col("k"))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").count().select("count").as[Long].collect()
    assert(slices.length > 4 && slices.max < 20000,
      s"range partitioning must split the group: $slices")
  }
}
