package graft

import org.apache.spark.sql.functions._
import graft.operators.IntervalJoin

/** IntervalJoin == the naive theta join, including bin-boundary and
  * negative-axis edge cases, with no duplicate pairs. */
class IntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("binned join == theta join on an adversarial axis") {
    val rnd = new scala.util.Random(7)
    // points on bin boundaries, negatives, and interval endpoints
    val pts = (Seq(-40L, -8L, -1L, 0L, 1L, 7L, 8L, 16L, 63L, 64L) ++
      Seq.fill(200)(rnd.nextLong() % 300)).zipWithIndex
      .map { case (x, i) => (i.toLong, x) }
      .toDF("pid", "x")
    // intervals: zero-length, bin-spanning, negative, nested
    val ivs = (Seq((-40L, -40L), (-10L, 10L), (0L, 0L), (0L, 7L), (7L, 9L),
      (60L, 200L)) ++
      Seq.fill(120) { val a = rnd.nextLong() % 280; (a, a + rnd.nextInt(40)) })
      .zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      .toDF("iid", "lo", "hi")

    val binned = IntervalJoin.pointInInterval(pts, "x", ivs, "lo", "hi", 8L)
      .select("pid", "iid").as[(Long, Long)].collect()
    val naive = pts.join(ivs, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect()
    assert(binned.length == binned.distinct.length,
      "a pair must meet in exactly one bin (no duplicates)")
    assert(binned.toSet == naive.toSet,
      s"missing=${naive.toSet -- binned.toSet} extra=${binned.toSet -- naive.toSet}")
    assert(naive.nonEmpty)
  }

  /** Run `f` with the bin-width conf in an explicit state, restoring
    * the session-wide posture (GraftSession.tune sets it to 50)
    * afterwards so later suites keep the board's rewrite-on regime. */
  private def withWidth[T](v: Option[String])(f: => T): T = {
    val key = "spark.graft.intervalJoin.binWidth"
    val saved = spark.conf.getOption(key)
    v match {
      case Some(x) => spark.conf.set(key, x)
      case None => spark.conf.unset(key)
    }
    try f finally saved match {
      case Some(x) => spark.conf.set(key, x)
      case None => spark.conf.unset(key)
    }
  }

  test("optimizer rule rewrites a pure range join to the binned equi-join") {
    import graft.plans.BinnedIntervalJoinRule
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(300)(rnd.nextLong() % 500).zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("pid", "x")
    val ivs = Seq.fill(80) { val a = rnd.nextLong() % 480; (a, a + rnd.nextInt(50)) }
      .zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      .toDF("iid", "lo", "hi")
    def rangeJoin = pts.join(ivs, col("x") >= col("lo") && col("x") <= col("hi"))

    val naive = withWidth(None) {
      val n = rangeJoin.select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(rangeJoin.queryExecution.sparkPlan.toString
        .contains("BroadcastNestedLoopJoin"), "without the rule this is a BNLJ")
      n
    }

    spark.experimental.extraOptimizations = Seq(BinnedIntervalJoinRule(spark))
    try withWidth(Some("16")) {
      val rewritten = rangeJoin
      val plan = rewritten.queryExecution.sparkPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("Cartesian"),
        s"rule must replace the nested loop:\n$plan")
      assert(rewritten.select("pid", "iid").as[(Long, Long)].collect().toSet == naive)
      assert(rewritten.columns.toSeq == Seq("pid", "x", "iid", "lo", "hi"),
        "bin columns must not leak into the join output")

      // point on the RIGHT side rewrites too, with column order kept
      val flipped = ivs.join(pts, col("x") >= col("lo") && col("x") <= col("hi"))
      assert(!flipped.queryExecution.sparkPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(flipped.columns.toSeq == Seq("iid", "lo", "hi", "pid", "x"))
      assert(flipped.select("pid", "iid").as[(Long, Long)].collect().toSet == naive)

      // an equi conjunct means Catalyst already has a hash key: stay out
      val equi = pts.join(ivs, col("pid") === col("iid") &&
        col("x") >= col("lo") && col("x") <= col("hi"))
      assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft_bin"),
        "rule must not fire when an equi key exists")
    } finally spark.experimental.extraOptimizations = Nil
    // conf unset -> rule inert even while registered
    spark.experimental.extraOptimizations = Seq(BinnedIntervalJoinRule(spark))
    try withWidth(None) {
      assert(rangeJoin.queryExecution.sparkPlan.toString
        .contains("BroadcastNestedLoopJoin"), "rule must be opt-in")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("optimizer rule rewrites date and timestamp BETWEEN joins from SQL") {
    import graft.plans.BinnedIntervalJoinRule
    val rnd = new scala.util.Random(23)
    val day = 86400000L
    val t0 = java.sql.Date.valueOf("2024-01-01").getTime
    val pts = Seq.tabulate(120)(i => (i.toLong,
      new java.sql.Date(t0 + rnd.nextInt(360) * day))).toDF("pid", "d")
    val ivs = Seq.tabulate(40) { i =>
      val a = rnd.nextInt(330)
      (i.toLong, new java.sql.Date(t0 + a * day),
        new java.sql.Date(t0 + (a + rnd.nextInt(30)) * day))
    }.toDF("iid", "dlo", "dhi")
    pts.createOrReplaceTempView("bin_pts")
    ivs.createOrReplaceTempView("bin_ivs")
    def sqlJoin = spark.sql(
      "SELECT pid, iid FROM bin_pts JOIN bin_ivs ON d BETWEEN dlo AND dhi")
    val naive = withWidth(None) {
      val n = sqlJoin.as[(Long, Long)].collect().toSet
      assert(sqlJoin.queryExecution.sparkPlan.toString
        .contains("BroadcastNestedLoopJoin"), "without the rule this is a BNLJ")
      n
    }

    spark.experimental.extraOptimizations = Seq(BinnedIntervalJoinRule(spark))
    try {
      withWidth(Some("7")) { // days
        val plan = sqlJoin.queryExecution.sparkPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("Cartesian"),
          s"date axis must qualify for the binned rewrite:\n$plan")
        assert(sqlJoin.as[(Long, Long)].collect().toSet == naive)
      }
      withWidth(Some((7 * 86400).toString)) {
        // timestamp axis: binWidth means SECONDS
        val tpts = pts.select(col("pid"), col("d").cast("timestamp").as("t"))
        val tivs = ivs.select(col("iid"), col("dlo").cast("timestamp").as("tlo"),
          col("dhi").cast("timestamp").as("thi"))
        val tj = tpts.join(tivs, col("t") >= col("tlo") && col("t") <= col("thi"))
        assert(!tj.queryExecution.sparkPlan.toString.contains("BroadcastNestedLoopJoin"),
          "timestamp axis must qualify for the binned rewrite")
        assert(tj.select("pid", "iid").as[(Long, Long)].collect().toSet == naive)
      }
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("timestamps discretize on epoch seconds") {
    val pts = Seq(1L, 100L, 86400L, 86401L)
      .map(s => (s, new java.sql.Timestamp(s * 1000L))).toDF("pid", "t")
    val ivs = Seq((0L, 0L, 86400L), (1L, 86400L, 200000L))
      .map { case (i, a, b) => (i, new java.sql.Timestamp(a * 1000L),
        new java.sql.Timestamp(b * 1000L)) }.toDF("iid", "lo", "hi")
    val got = IntervalJoin.pointInInterval(pts, "t", ivs, "lo", "hi", 3600L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 0L), (100L, 0L), (86400L, 0L), (86400L, 1L),
      (86401L, 1L)))
  }
}
