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

  test("q224: ACF equals a cleared-denominator BigInt replay; lag-7 rhythm visible") {
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((t, d), xs) => (t, d, xs.size.toLong) }.toSeq
    val d0 = daily.map(_._2).min; val d1 = daily.map(_._2).max
    val got = rows("q224_acf")
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    daily.map(_._1).distinct.foreach { t =>
      val byDay = daily.filter(_._1 == t).map(x => x._2 -> x._3).toMap
      val ys = (d0 to d1).map(d => BigInt(byDay.getOrElse(d, 0L)))
      val n = BigInt(ys.size); val s = ys.sum
      val e = ys.map(y => n * y - s)
      val den = e.map(x => x * x).sum
      (1 to 7).foreach { k =>
        val num = (0 until e.size - k).map(i => e(i) * e(i + k)).sum
        val r = got((t, k.toLong))
        val want = if (den == 0) 0.0 else num.toDouble / den.toDouble
        assert(r.getDouble(2) == want, s"$t lag $k: ${r.getDouble(2)} != $want")
        assert(r.getBoolean(3) == (num > 0), s"$t lag $k flag")
      }
    }
    // the audit must read SOMETHING: at least one (type, lag) with
    // nonzero memory in either direction
    assert(rows("q224_acf").exists(r => r.getDouble(2) != 0.0),
      "every autocorrelation exactly zero — vacuous")
  }

  test("q225: Chao1 equals a count-of-counts replay; estimate bounds observed") {
    val toks = Tables.documents(spark, sf)
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("t"))
      .filter(length(col("t")) > 0)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val got = rows("q225_chao1").map(r => r.getString(0) -> r).toMap
    toks.groupBy(_._1).foreach { case (src, xs) =>
      val cnt = xs.groupBy(_._2).map(_._2.size)
      val v = cnt.size.toLong; val n = cnt.map(_.toLong).sum
      val f1 = cnt.count(_ == 1).toLong; val f2 = cnt.count(_ == 2).toLong
      val r = got(src)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((v, n, f1, f2)), s"$src counts")
      val chao1 = v.toDouble +
        (BigInt(f1) * BigInt(f1 - 1)).toDouble / (2 * (f2 + 1)).toDouble
      assert(r.getDouble(5) == chao1, s"$src chao1")
      assert(r.getDouble(5) >= v.toDouble, s"$src estimate below observed")
      assert(r.getDouble(6) == 1.0 - f1.toDouble / n.toDouble, s"$src coverage")
    }
  }

  test("q226: Bloom FPR equals an exact MessageDigest replay; filter genuinely FPs") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    def positions(g: String): Seq[Int] = Seq(1, 9, 17).map { o =>
      Integer.parseInt(md5hex(g).substring(o - 1, o + 3), 16)
    }
    val grams = Tables.documents(spark, sf)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ts"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
      .filter(_._2.size >= 3)
      .flatMap { case (id, ts) =>
        ts.sliding(3).map(w => id -> w.mkString(" ")).toSeq.distinct
      }
    val bench = grams.filter(_._1 % 97 == 0).map(_._2).toSet
    val neg = grams.filter(_._1 % 97 != 0).map(_._2).distinct.filterNot(bench)
    val bits = bench.flatMap(positions)
    val fp = neg.count(g => positions(g).forall(bits))
    val r = rows("q226_bloom_fpr").head
    assert(r.getLong(0) == neg.size.toLong, "n_neg")
    assert(r.getLong(1) == bits.size.toLong, "bits_set")
    assert(r.getLong(2) == fp.toLong, s"false_pos ${r.getLong(2)} != $fp")
    assert(r.getDouble(3) == fp.toDouble / neg.size, "fpr")
    val load = bits.size.toDouble / 65536.0
    assert(r.getDouble(4) == load * load * load, "expected_fpr")
    // the audit is only informative if the filter actually errs AND
    // the negatives dominate (an empty negative set reads nothing)
    assert(neg.nonEmpty && bits.nonEmpty, "vacuous audit inputs")
  }

  test("q227: Heaps fit equals a stripes + ppb-ln replay; growth is sublinear") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
      .filter(_._2.size >= 3)
    val grams = docs.flatMap { case (id, ts) =>
      ts.sliding(3).map(w => id -> w.mkString(" ")) }
    val mn = docs.map(_._1).min; val w = docs.map(_._1).max - mn + 1
    def bkt(id: Long): Int = ((id - mn) * 32 / w).toInt
    val dv = grams.groupBy(_._2).map(_._2.map(_._1).min)
      .groupBy(bkt).map { case (b, xs) => b -> xs.size.toLong }
    val dn = grams.groupBy(g => bkt(g._1)).map { case (b, xs) => b -> xs.size.toLong }
    val bs = (dv.keySet ++ dn.keySet).toSeq.sorted
    var v = 0L; var n = 0L
    val pts = bs.flatMap { b =>
      v += dv.getOrElse(b, 0L); n += dn.getOrElse(b, 0L)
      if (v > 0 && n > 0) Some((v, n)) else None
    }
    def ppb(x: Long): BigInt = BigInt(BigDecimal(math.log(x.toDouble))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).underlying
      .movePointRight(9).longValueExact())
    val k = BigInt(pts.size)
    val sx = pts.map(p => ppb(p._2)).sum; val sy = pts.map(p => ppb(p._1)).sum
    val sxy = pts.map(p => ppb(p._2) * ppb(p._1)).sum
    val sxx = pts.map(p => ppb(p._2) * ppb(p._2)).sum
    val num = k * sxy - sx * sy; val den = k * sxx - sx * sx
    val beta = if (den == 0) 0.0 else num.toDouble / den.toDouble
    val r = rows("q227_heaps_fit").head
    assert(r.getLong(0) == pts.size.toLong, "n_points")
    assert(r.getLong(1) == pts.last._1 && r.getLong(2) == pts.last._2,
      "final vocab/tokens")
    assert(r.getDouble(3) == beta, s"beta ${r.getDouble(3)} != $beta")
    // Heaps regime: vocabulary grows, but sublinearly
    assert(beta > 0.0 && beta < 1.0, s"beta $beta outside the Heaps regime")
  }

  test("q234: bucket-bootstrap CI equals a driver replay; interval brackets the mean") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = rows("q234_bootstrap_ci").map(r => r.getString(0) -> r).toMap
    docs.groupBy(_._1).foreach { case (lang, xs) =>
      val byB = xs.groupBy(x =>
        Integer.parseInt(md5hex(x._2.toString).substring(0, 2), 16) / 8)
      val ms = byB.values.map(g =>
        g.map(_._3).sum.toDouble / g.size).toSeq
      val k = ms.size
      def dsum6(vs: Seq[Double]): Double =
        vs.map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble
      val sm = dsum6(ms); val smm = dsum6(ms.map(m => m * m))
      val grand = sm / k
      val half = if (k < 2) 0.0
        else 1.96 * math.sqrt(math.max(
          (smm - sm * sm / k) / (k - 1), 0.0) / k)
      val r = got(lang)
      assert(r.getLong(1) == xs.size.toLong && r.getLong(2) == k.toLong,
        s"$lang counts")
      assert(r.getDouble(3) == grand, s"$lang mean ${r.getDouble(3)} != $grand")
      assert(r.getDouble(4) == grand - half && r.getDouble(5) == grand + half,
        s"$lang interval")
      // structure: the interval is non-degenerate and brackets the mean
      assert(half > 0 && r.getDouble(4) < r.getDouble(3) &&
        r.getDouble(3) < r.getDouble(5), s"$lang degenerate CI")
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
