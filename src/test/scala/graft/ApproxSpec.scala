package graft

import org.apache.spark.sql.functions._

/** A6: sketch-based distinct counting — HLL++ must land within its
  * documented error of the exact count (exact-count queries are oracle-
  * checked in q08; the sketch is asserted here since DuckDB's sketch
  * would not hash-match).
  */
class ApproxSpec extends SparkTestBase {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on orders.o_custkey") {
    val df = Tables.orders(spark, "/root/testdata/sf0.01")
    val (exact, approx) = df.agg(
      countDistinct(col("o_custkey")),
      approx_count_distinct(col("o_custkey"), rsd = 0.02))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx tracks exact percentile on lineitem quantity") {
    val df = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val (ex, ap) = df.agg(
      expr("percentile(l_quantity, 0.5)"),
      expr("percentile_approx(l_quantity, 0.5, 1000)"))
      .as[(Double, Double)].head()
    assert(math.abs(ap - ex) <= 1.0, s"approx=$ap exact=$ex")
  }
}
