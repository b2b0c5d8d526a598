package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TwoPhaseTopKRule

/** The opt-in top-k rewrite: fires only under its conf, produces the
  * two-phase plan (local prune + exact final window), preserves the
  * answer bit-for-bit, respects the maxK guard, and does not stack
  * across optimizer fixpoint iterations.
  */
class TwoPhaseTopKRuleSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val rule = TwoPhaseTopKRule(spark)

  private def withRule[T](confs: (String, String)*)(f: => T): T = {
    // the shared session runs with the rule ON (GraftSession.tune), so
    // each test starts from an explicit OFF state and the finally
    // RESTORES the session-wide posture for later suites
    val touched =
      (confs.map(_._1) :+ rule.EnabledConf :+ rule.MaxKConf).distinct
    val saved = touched.map(k => k -> spark.conf.getOption(k))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    touched.foreach(spark.conf.unset)
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq rule)
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  /** 3 groups × 2000 rows — the few-huge-groups regime the rewrite
    * exists for; (v DESC, id) is a total order. */
  private def base: DataFrame =
    spark.range(6000).select(
      (col("id") % 3).as("g"),
      ((col("id") * 2654435761L) % 10007).as("v"),
      col("id"))

  private def topk(k: Int): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
    base.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  private def nWindows(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case w: logical.Window => w }.size

  test("inert without the conf; fires with it; answer identical") {
    withRule() {
      assert(nWindows(topk(5)) == 1, "must not rewrite while disabled")
      val naive = topk(5).collect().map(_.toString).sorted.toSeq
      spark.conf.set(rule.EnabledConf, "true")
      val df = topk(5)
      assert(nWindows(df) == 2,
        "expected local + final windows:\n" +
          df.queryExecution.optimizedPlan.toString)
      assert(df.collect().map(_.toString).sorted.toSeq == naive,
        "rewritten answer must equal the naive window")
      spark.conf.unset(rule.EnabledConf)
    }
  }

  test("rn = 1 (the argmax idiom) rewrites too") {
    withRule(rule.EnabledConf -> "true") {
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
      val df = base.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      assert(nWindows(df) == 2, df.queryExecution.optimizedPlan.toString)
      val got = df.collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      val want = base.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.minBy(t => (-t._2, t._3))._3).toMap
      assert(got == want, "argmax must match a driver recomputation")
    }
  }

  test("maxK guard blocks oversized rewrites; non-row_number windows untouched") {
    withRule(rule.EnabledConf -> "true", rule.MaxKConf -> "3") {
      assert(nWindows(topk(5)) == 1, "k=5 must not rewrite under maxK=3")
      assert(nWindows(topk(3)) == 2, "k=3 still rewrites")
    }
    withRule(rule.EnabledConf -> "true") {
      // a rank() window is NOT the matched shape — must pass through
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc)
      val df = base.withColumn("rk", rank().over(w)).filter(col("rk") <= 5)
      assert(nWindows(df) == 1, "rank() must not be rewritten")
    }
  }
}
