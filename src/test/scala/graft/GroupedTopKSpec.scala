package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GroupedTopK

/** Two-phase grouped top-k == the naive per-group window, including the
  * emitted rank, regardless of input partitioning. */
class GroupedTopKSpec extends SparkTestBase {
  import spark.implicits._

  test("equals the naive window on skewed groups, any partitioning") {
    val rnd = new scala.util.Random(9)
    val rows = (0 until 30000).map { i =>
      (if (i % 3 == 0) "big" else if (i % 3 == 1) "bigger" else "small",
        i.toLong, rnd.nextInt(1000).toLong)
    }
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("g", "k", "v").repartition(parts)
      val got = GroupedTopK.topK(df, Seq("g"), Seq(col("v").desc, col("k").asc), 10)
        .select("g", "k", "v", "rn").as[(String, Long, Long, Int)].collect().toSet
      val naive = df.withColumn("rn", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("v").desc, col("k").asc)))
        .filter(col("rn") <= 10)
        .select("g", "k", "v", "rn").as[(String, Long, Long, Int)].collect().toSet
      assert(got == naive, s"parts=$parts")
    }
  }

  test("k larger than a group returns the whole group, exactly ranked") {
    val df = Seq(("g", 1L, 5L), ("g", 2L, 9L), ("h", 3L, 1L)).toDF("g", "k", "v")
    val got = GroupedTopK.topK(df, Seq("g"), Seq(col("v").desc, col("k").asc), 10)
      .select("g", "k", "rn").as[(String, Long, Int)].collect().toSet
    assert(got == Set(("g", 2L, 1), ("g", 1L, 2), ("h", 3L, 1)))
  }
}
