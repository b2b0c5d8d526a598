package graft

import org.apache.spark.sql.functions._

/** Driver replays for the round-11 statistics family: OLS trend
  * (q219/W25), Spearman rank correlation (q221/D23), two-sample KS
  * (q222/D24), and exact distributed quantiles (q223/A13). Every
  * replay recomputes the answer from the raw parquet in plain Scala
  * (BigInt where the plan routes DECIMAL(38,0)) and compares EXACTLY —
  * the doubles must be bit-identical because both sides perform the
  * same IEEE ops on the same exact integers. Non-vacuity guards make
  * sure each statistic actually discriminates on this corpus.
  */
class TrendStatsSpec extends SparkTestBase {

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("q219: OLS trend equals a BigInt least-squares replay on the full grid") {
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((t, d), xs) => (t, d, xs.size.toLong) }.toSeq
    val d0 = daily.map(_._2).min
    val d1 = daily.map(_._2).max
    val got = rows("q219_ols_trend")
      .map(r => r.getString(0) -> r).toMap
    val types = daily.map(_._1).distinct
    assert(got.keySet == types.toSet)
    var risingSeen, fallingSeen = false
    types.foreach { t =>
      val byDay = daily.filter(_._1 == t).map(x => x._2 -> x._3).toMap
      val xs = (d0 to d1).map(d => (BigInt(d - d0), BigInt(byDay.getOrElse(d, 0L))))
      val n = BigInt(xs.size)
      val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
      val sxy = xs.map(p => p._1 * p._2).sum
      val sxx = xs.map(p => p._1 * p._1).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val r = got(t)
      assert(r.getLong(1) == xs.size.toLong, s"$t n_days")
      assert(r.getLong(2) == sy.toLong, s"$t total")
      val slope = if (den == 0) 0.0 else num.toDouble / den.toDouble
      val icept = if (den == 0) sy.toDouble / xs.size
                  else (sy * sxx - sx * sxy).toDouble / den.toDouble
      assert(r.getDouble(3) == slope, s"$t slope ${r.getDouble(3)} != $slope")
      assert(r.getDouble(4) == icept, s"$t intercept")
      assert(r.getBoolean(5) == (num > 0), s"$t rising")
      if (num > 0) risingSeen = true; if (num < 0) fallingSeen = true
    }
    // the flag must discriminate on this corpus, not sit constant
    assert(risingSeen || fallingSeen, "every trend exactly flat — vacuous")
  }

  test("q221: Spearman rho equals a sorted-rank replay; bounded and non-degenerate") {
    val base = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("n_chars"),
        size(array_distinct(split(trim(col("text")), "\\s+"))).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = rows("q221_spearman").map(r => r.getString(0) -> r).toMap
    base.groupBy(_._1).foreach { case (src, docs) =>
      val rx = docs.sortBy(d => (d._3, d._2)).zipWithIndex
        .map { case (d, i) => d._2 -> BigInt(i + 1) }.toMap
      val ry = docs.sortBy(d => (d._4, d._2)).zipWithIndex
        .map { case (d, i) => d._2 -> BigInt(i + 1) }.toMap
      val d2 = docs.map(d => { val dd = rx(d._2) - ry(d._2); dd * dd }).sum
      val n = BigInt(docs.length)
      val den = n * (n * n - 1)
      val rho = if (den == 0) 0.0
                else 1.0 - (BigInt(6) * d2).toDouble / den.toDouble
      val r = got(src)
      assert(r.getLong(1) == docs.length.toLong, s"$src n_docs")
      assert(r.getDouble(2) == d2.toDouble, s"$src sum_d2")
      assert(r.getDouble(3) == rho, s"$src rho ${r.getDouble(3)} != $rho")
      assert(rho >= -1.0 && rho <= 1.0, s"$src rho out of range")
    }
    // length vs distinct-token count must correlate somewhere without
    // being the identity permutation — otherwise the audit reads nothing
    assert(got.values.exists(r => r.getDouble(3) > 0 && r.getDouble(3) < 1),
      "no source with a non-degenerate positive rho")
  }

  test("q222: KS gap equals a BigInt cross-multiply replay at every jump point") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value"),
        (expr("unix_micros(ts) DIV 86400000000") + 4) % 7 >= 5)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    val got = rows("q222_ks_audit").map(r => r.getString(0) -> r).toMap
    ev.groupBy(_._1).foreach { case (t, xs) =>
      val nwe = BigInt(xs.count(_._3)); val nwd = BigInt(xs.count(!_._3))
      val byV = xs.groupBy(_._2).toSeq.sortBy(_._1)
      var cwe = BigInt(0); var cwd = BigInt(0); var dnum = BigInt(0)
      byV.foreach { case (_, g) =>
        cwe += g.count(_._3); cwd += g.count(!_._3)
        dnum = dnum.max((cwe * nwd - cwd * nwe).abs)
      }
      val r = got(t)
      assert(r.getLong(1) == nwe.toLong && r.getLong(2) == nwd.toLong, s"$t sides")
      val d = if (nwe == 0 || nwd == 0) 0.0
              else dnum.toDouble / (nwe * nwd).toDouble
      assert(r.getDouble(3) == d, s"$t d_stat ${r.getDouble(3)} != $d")
      val bar = 1.358 * math.sqrt((nwe + nwd).toDouble /
        (nwe.toDouble * nwd.toDouble))
      assert(r.getBoolean(4) == (nwe > 0 && nwd > 0 && d > bar), s"$t flag")
      assert(nwe > 0 && nwd > 0, s"$t missing a sample side — vacuous split")
      assert(dnum > 0, s"$t zero KS gap — vacuous")
    }
  }

  test("q223: exact quantiles equal a full-sort selection at k = ceil(p*n)") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val got = rows("q223_exact_quantiles").map(r => r.getString(0) -> r).toMap
    ev.groupBy(_._1).foreach { case (t, xs) =>
      val sorted = xs.map(_._2).sorted
      val n = sorted.length
      val p50 = sorted((n + 1) / 2 - 1)
      val p90 = sorted((9 * n + 9) / 10 - 1)
      val r = got(t)
      assert(r.getLong(1) == n.toLong, s"$t n")
      assert(r.getDouble(2) == p50, s"$t p50 ${r.getDouble(2)} != $p50")
      assert(r.getDouble(3) == p90, s"$t p90 ${r.getDouble(3)} != $p90")
      assert(r.getDouble(3) >= r.getDouble(2), s"$t p90 < p50")
      // the ranks must genuinely differ — a corpus where p50 == p90
      // would leave the second selection path untested
      assert(p90 > p50, s"$t degenerate spread")
    }
  }
}
