package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.{CosineSim, DotProduct, VectorFunctions}

class VectorExprSpec extends SparkTestBase {
  import spark.implicits._

  private val vecs = Seq(
    (Array(1.0, 2.0, 3.0), Array(-4.0, 5.5, 0.25)),
    (Array(0.0, 0.0), Array(0.0, 0.0)),
    (Array(1e-8, 1e8), Array(1e8, 1e-8)))

  test("native dot/cosine equal the higher-order-function formulation") {
    val df = vecs.toDF("a", "b")
    val hofDot = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("nd"), hofDot.as("hd"),
      VectorFunctions.cosine(col("a"), col("b")).as("nc"))
      .as[(Double, Double, Double)].collect()
    rows.foreach { case (nd, hd, _) => assert(nd == hd, "codegen dot != HOF dot") }
    assert(rows(1)._3 == 0.0, "zero vectors -> cosine 0.0 (not NaN)")
  }

  test("interpreted eval path matches the codegen path") {
    val a = Literal.create(Array(1.5, -2.0, 3.25), ArrayType(DoubleType))
    val b = Literal.create(Array(4.0, 0.5, -1.0), ArrayType(DoubleType))
    val interp = DotProduct(a, b).eval(null).asInstanceOf[Double]
    val viaDf = Seq((Array(1.5, -2.0, 3.25), Array(4.0, 0.5, -1.0))).toDF("a", "b")
      .select(VectorFunctions.dot(col("a"), col("b"))).as[Double].head()
    assert(interp == viaDf && interp == 1.5 * 4.0 - 2.0 * 0.5 - 3.25)
    val ci = CosineSim(a, b).eval(null).asInstanceOf[Double]
    assert(math.abs(ci - interp / (math.sqrt(1.5*1.5+4.0+3.25*3.25) *
      math.sqrt(16.0+0.25+1.0))) < 1e-12)
  }

  test("GraftExtensions registers dot_product/cosine_sim for SQL") {
    // a NEW session (same SparkContext) picks up the extensions
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql(
        "SELECT dot_product(array(1d,2d), array(3d,4d)) AS d, " +
        "cosine_sim(array(1d,0d), array(1d,0d)) AS c").collect().head
      assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 1.0)
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
