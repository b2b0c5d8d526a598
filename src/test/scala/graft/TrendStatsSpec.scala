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

  test("q235: MWU equals a BigInt midrank replay; ties exercised; z chain identical") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value"),
        (expr("unix_micros(ts) DIV 86400000000") + 4) % 7 >= 5)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    val got = rows("q235_mwu_audit").map(r => r.getString(0) -> r).toMap
    var tiesSeen = false
    ev.groupBy(_._1).foreach { case (t, xs) =>
      val nwe = BigInt(xs.count(_._3)); val nwd = BigInt(xs.count(!_._3))
      val nn = nwe + nwd
      var cumBefore = BigInt(0); var r2 = BigInt(0); var tieT = BigInt(0)
      xs.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (_, g) =>
        val c = BigInt(g.size); val cwe = BigInt(g.count(_._3))
        r2 += cwe * (2 * cumBefore + c + 1)
        tieT += c * c * c - c
        if (c > 1) tiesSeen = true
        cumBefore += c
      }
      val u2 = r2 - nwe * (nwe + 1)
      val u = u2.toDouble / 2.0
      val mu = nwe.toDouble * nwd.toDouble / 2.0
      val varU = nwe.toDouble * nwd.toDouble / 12.0 *
        ((nn.toDouble + 1.0) - tieT.toDouble / (nn.toDouble * (nn.toDouble - 1.0)))
      val z = if (nwe == 0 || nwd == 0 || !(varU > 0.0)) 0.0
              else (u - mu) / math.sqrt(varU)
      val r = got(t)
      assert(r.getLong(1) == nwe.toLong && r.getLong(2) == nwd.toLong, s"$t sides")
      assert(r.getDouble(3) == u, s"$t u ${r.getDouble(3)} != $u")
      assert(r.getDouble(4) == z, s"$t z ${r.getDouble(4)} != $z")
      assert(r.getBoolean(5) == (math.abs(z) > 1.96), s"$t flag")
      assert(nwe > 0 && nwd > 0, s"$t missing a sample side — vacuous split")
    }
    // tie correction must actually fire somewhere — a tie-free corpus
    // leaves the midrank algebra untested
    assert(tiesSeen, "no tied values anywhere — midrank path vacuous")
  }

  test("q236: Mann–Kendall equals a BigInt pair replay on the full grid") {
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((t, d), xs) => (t, d, xs.size.toLong) }.toSeq
    val d0 = daily.map(_._2).min; val d1 = daily.map(_._2).max
    val got = rows("q236_mann_kendall").map(r => r.getString(0) -> r).toMap
    var trendSeen = false
    daily.map(_._1).distinct.foreach { t =>
      val byDay = daily.filter(_._1 == t).map(x => x._2 -> x._3).toMap
      val ys = (d0 to d1).map(d => byDay.getOrElse(d, 0L))
      val n = ys.size
      var s = 0L
      for (i <- 0 until n; j <- i + 1 until n)
        s += (if (ys(j) > ys(i)) 1L else if (ys(j) < ys(i)) -1L else 0L)
      val tieSum = ys.groupBy(identity).values
        .map { g => val tt = g.size.toLong; tt * (tt - 1) * (2 * tt + 5) }.sum
      val var18 = n.toLong * (n - 1) * (2L * n + 5) - tieSum
      val varS = var18.toDouble / 18.0
      val z = if (var18 == 0) 0.0
              else if (s > 0) (s - 1).toDouble / math.sqrt(var18.toDouble / 18.0)
              else if (s < 0) (s + 1).toDouble / math.sqrt(var18.toDouble / 18.0)
              else 0.0
      val r = got(t)
      assert(r.getLong(1) == n.toLong, s"$t n_days")
      assert(r.getLong(2) == s, s"$t S ${r.getLong(2)} != $s")
      assert(r.getDouble(3) == varS, s"$t var_s")
      assert(r.getDouble(4) == z, s"$t z ${r.getDouble(4)} != $z")
      assert(r.getBoolean(5) == (math.abs(z) > 1.96), s"$t trending")
      assert(r.getString(6) ==
        (if (s > 0) "up" else if (s < 0) "down" else "flat"), s"$t direction")
      if (s != 0) trendSeen = true
    }
    assert(trendSeen, "every S exactly zero — vacuous")
  }

  test("q242: seasonal MK equals a per-stratum BigInt pair replay") {
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((t, d), xs) => (t, d, xs.size.toLong) }.toSeq
    val d0 = daily.map(_._2).min; val d1 = daily.map(_._2).max
    val got = rows("q242_seasonal_mk").map(r => r.getString(0) -> r).toMap
    daily.map(_._1).distinct.foreach { t =>
      val byDay = daily.filter(_._1 == t).map(x => x._2 -> x._3).toMap
      val days = (d0 to d1).map(d => (d, (d + 4) % 7, byDay.getOrElse(d, 0L)))
      var s = 0L; var var18 = 0L
      (0L to 6L).foreach { dw =>
        val ys = days.filter(_._2 == dw).sortBy(_._1).map(_._3)
        val nk = ys.size
        for (i <- 0 until nk; j <- i + 1 until nk)
          s += (if (ys(j) > ys(i)) 1L else if (ys(j) < ys(i)) -1L else 0L)
        val tieK = ys.groupBy(identity).values
          .map { g => val tt = g.size.toLong; tt * (tt - 1) * (2 * tt + 5) }.sum
        var18 += nk.toLong * (nk - 1) * (2L * nk + 5) - tieK
      }
      val z = if (var18 == 0) 0.0
              else if (s > 0) (s - 1).toDouble / math.sqrt(var18.toDouble / 18.0)
              else if (s < 0) (s + 1).toDouble / math.sqrt(var18.toDouble / 18.0)
              else 0.0
      val r = got(t)
      assert(r.getLong(1) == (d1 - d0 + 1), s"$t n_days")
      assert(r.getLong(2) == math.min(7L, d1 - d0 + 1), s"$t n_strata")
      assert(r.getLong(3) == s, s"$t S ${r.getLong(3)} != $s")
      assert(r.getDouble(4) == var18.toDouble / 18.0, s"$t var_s")
      assert(r.getDouble(5) == z, s"$t z")
      assert(r.getBoolean(6) == (math.abs(z) > 1.96), s"$t trending")
    }
  }

  test("events.value sits on the cent grid at every SF (q244/q245/q246 exactness precondition)") {
    // r11 ADVICE: the DECIMAL(12,2)·100 cents route assumes both
    // engines round each stored double to the SAME 2-dp decimal.
    // Spark rounds the shortest-decimal representation HALF_UP while
    // DuckDB rounds the scaled binary double — these diverge for
    // values OFF the cent grid near .xx5 ties (2.675 → 2.68 vs 2.67).
    // The claim holds because every events.value is the nearest
    // double of an exact 2-dp decimal; this guard PINS that corpus
    // property (value == round(value, 2) is exactly "v is the
    // nearest-double of a 2-dp decimal") at all three SFs, so a
    // regenerated corpus with finer-grained values fails loudly here
    // instead of silently flipping the oracle gate.
    Seq("0.001", "0.01", "0.1").foreach { s =>
      val dir = s"/root/testdata/sf$s"
      if (new java.io.File(dir).isDirectory) {
        val off = Tables.events(spark, dir)
          .filter(col("value") =!= round(col("value"), 2)).count()
        assert(off == 0L,
          s"sf$s: $off events rows off the cent grid — the q244/q245/" +
            "q246 cents exactness precondition no longer holds")
      }
    }
  }

  test("q244: delta-method ratio A/B equals a BigInt sufficient-stats replay") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        (col("value").cast("decimal(12,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = rows("q244_delta_ratio").map(r => r.getString(0) -> r).toMap
    var sigDiscriminates = Set.empty[Boolean]
    ev.groupBy(_._1).foreach { case (t, xs) =>
      val perUser = xs.groupBy(_._2).toSeq.map { case (uid, es) =>
        (uid, BigInt(es.size), BigInt(es.map(_._3).sum))
      }
      def side(v: Int): (BigInt, Double, Double) = {
        val us = perUser.filter(_._1 % 2 == v)
        val n = BigInt(us.size)
        val sn = us.map(_._2).sum; val ss = us.map(_._3).sum
        val snn = us.map(u => u._2 * u._2).sum
        val sss = us.map(u => u._3 * u._3).sum
        val ssn = us.map(u => u._3 * u._2).sum
        val r = if (sn == 0) 0.0 else ss.toDouble / sn.toDouble
        val vr = if (n < 2 || sn == 0) 0.0
          else n.toDouble *
            ((n * sss - ss * ss).toDouble -
             2.0 * r * (n * ssn - ss * sn).toDouble +
             r * r * (n * snn - sn * sn).toDouble) /
            ((n - 1).toDouble * sn.toDouble * sn.toDouble)
        (n, r, vr)
      }
      val (n0, r0, v0) = side(0); val (n1, r1, v1) = side(1)
      val diff = r1 - r0
      val z = if (!(v0 + v1 > 0.0)) 0.0 else diff / math.sqrt(v0 + v1)
      val r = got(t)
      assert(r.getLong(1) == n0.toLong && r.getLong(2) == n1.toLong, s"$t n")
      assert(r.getDouble(3) == r0, s"$t r0 ${r.getDouble(3)} != $r0")
      assert(r.getDouble(4) == r1, s"$t r1")
      assert(r.getDouble(5) == diff, s"$t diff")
      assert(r.getDouble(6) == z, s"$t z ${r.getDouble(6)} != $z")
      assert(r.getBoolean(7) == (math.abs(z) > 1.96), s"$t significant")
      assert(v0 > 0.0 && v1 > 0.0, s"$t a variant with zero delta variance — vacuous")
      sigDiscriminates += r.getBoolean(7)
    }
    // under a null A/A-style split the test should mostly NOT fire —
    // all-significant would mean the variance is understated
    assert(sigDiscriminates.contains(false),
      "every type significant under the hash split — variance understated")
  }

  test("q246: digit χ² equals a BigInt cleared-numerator replay over all 10 digits") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"),
        abs((col("value").cast("decimal(12,2)") * 100).cast("long")) % 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = rows("q246_digit_audit").map(r => r.getString(0) -> r).toMap
    ev.groupBy(_._1).foreach { case (t, xs) =>
      val n = BigInt(xs.size)
      val byD = xs.groupBy(_._2).map { case (d, g) => d -> BigInt(g.size) }
      val ssq = (0L to 9L).map { d =>
        val diff = byD.getOrElse(d, BigInt(0)) * 10 - n; diff * diff
      }.sum
      val chi2 = ssq.toDouble / (n * 10).toDouble
      val r = got(t)
      assert(r.getLong(1) == n.toLong, s"$t n")
      assert(r.getDouble(2) == chi2, s"$t chi2 ${r.getDouble(2)} != $chi2")
      assert(r.getBoolean(3) == (chi2 <= 16.919), s"$t uniform")
      // all ten digits must occur somewhere, or the zero-mass grid
      // leg is untested corpus-wide
      assert(byD.size >= 5, s"$t degenerate digit spread")
    }
  }

  test("q247: Cramér's V equals a decimal-summed contingency replay; bounded") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"),
        (expr("unix_micros(ts) DIV 86400000000") + 4) % 7)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val cells = ev.groupBy(identity).map { case ((t, d), g) =>
      (t, d, BigInt(g.size)) }.toSeq
    val rt = cells.groupBy(_._1).map { case (t, g) => t -> g.map(_._3).sum }
    val cd = cells.groupBy(_._2).map { case (d, g) => d -> g.map(_._3).sum }
    val n = BigInt(ev.size)
    val rr = rt.size; val cc = cd.size
    // mirror dsum: exact decimal accumulation of the per-cell doubles
    val tsum = cells.map { case (t, d, o) =>
      BigDecimal((o * o * n).toDouble / (rt(t) * cd(d)).toDouble)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val chi2 = math.max(tsum - n.toDouble, 0.0)
    val v = if (rr < 2 || cc < 2) 0.0
            else math.sqrt(chi2 / (n * BigInt(math.min(rr - 1, cc - 1))).toDouble)
    val r = rows("q247_cramers_v").head
    assert(r.getLong(0) == n.toLong, "n")
    assert(r.getLong(1) == rr.toLong && r.getLong(2) == cc.toLong, "dims")
    assert(r.getDouble(3) == chi2, s"chi2 ${r.getDouble(3)} != $chi2")
    assert(r.getDouble(4) == v, s"v ${r.getDouble(4)} != $v")
    assert(v >= 0.0 && v <= 1.0, "V out of range")
    assert(rows("q247_cramers_v").length == 1, "must be exactly one row")
  }

  test("q248: quantile normalization equals a sorted ceil-ordinal replay; means converge") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val pooled = docs.map(_._2).sorted
    val n = BigInt(pooled.length)
    val got = rows("q248_quantile_norm").map(r => r.getString(0) -> r).toMap
    docs.groupBy(_._1).foreach { case (src, xs) =>
      val vs = xs.map(_._2).sorted
      val ns = BigInt(vs.length)
      val normed = (1 to vs.length).map { i =>
        val k = ((BigInt(i) * n + ns - 1) / ns).toInt
        pooled(k - 1)
      }
      val r = got(src)
      assert(r.getLong(1) == vs.length.toLong, s"$src n_docs")
      assert(r.getDouble(2) == vs.map(BigInt(_)).sum.toDouble / vs.length,
        s"$src mean_raw")
      assert(r.getDouble(3) == normed.map(BigInt(_)).sum.toDouble / vs.length,
        s"$src mean_norm ${r.getDouble(3)}")
    }
    // the audit's read: normalized means must be closer together than
    // raw means (that is what quantile normalization is FOR)
    def spread(f: org.apache.spark.sql.Row => Double): Double = {
      val ms = got.values.map(f).toSeq; ms.max - ms.min
    }
    assert(spread(_.getDouble(3)) < spread(_.getDouble(2)),
      "normalization did not tighten the cross-source mean spread")
  }

  test("q250: trending tokens equal a half-count replay; top-k order total") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val i0 = docs.map(_._1).min; val i1 = docs.map(_._1).max
    val mid = i0 + (i1 - i0 + 1) / 2
    val cnt = scala.collection.mutable.Map.empty[String, (Long, Long)]
    docs.foreach { case (id, text) =>
      text.trim.split("\\s+").filter(_.nonEmpty).foreach { t =>
        val (a, b) = cnt.getOrElse(t, (0L, 0L))
        cnt(t) = if (id >= mid) (a, b + 1) else (a + 1, b)
      }
    }
    // the cut key is the EXACT integer ppm ratio (BigInt mirrors the
    // DECIMAL(38,0)/HUGEINT chain); the IEEE double is display only
    val want = cnt.toSeq
      .filter { case (_, (c1, c2)) =>
        c1 + c2 >= graft.operators.TextQueries.TrendMinN }
      .map { case (t, (c1, c2)) =>
        (t, c1, c2, (BigInt(c2 + 1) * 1000000 / (c1 + 1)).toLong,
          (c2 + 1).toDouble / (c1 + 1).toDouble) }
      .sortBy { case (t, _, _, ppm, _) => (-ppm, t) }
      .take(graft.operators.TextQueries.TrendTopK)
      .map { case (t, c1, c2, _, s) => (t, c1, c2, s) }
    val got = rows("q250_trending_tokens")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq,
      s"trending mismatch:\n got=${got.toSeq}\nwant=${want.toSeq}")
    // the ratio must discriminate — an all-equal score list means the
    // split found no drift signal and the ORDER is carrying nothing
    assert(want.map(_._4).distinct.size > 1, "flat score list — vacuous")
  }

  test("q252: churn half-life equals an OLS replay over the q239 ln integers") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val d1 = ev.map(_._3).max
    val censor = graft.operators.RelationalQueries.KmCensorDays
    val got = rows("q252_churn_halflife").map(r => r.getString(0) -> r).toMap
    ev.groupBy(_._1).foreach { case (t, xs) =>
      val lifetimes = xs.groupBy(_._2).toSeq.map { case (_, es) =>
        val f = es.map(_._3).min; val l = es.map(_._3).max
        (l - f, l <= d1 - censor)
      }
      val nUsers = lifetimes.size.toLong
      val byT = lifetimes.groupBy(_._1).toSeq.sortBy(_._1)
      var before = 0L; var cum = 0L
      val pts = byT.map { case (tt, g) =>
        val ct = g.size.toLong; val d = g.count(_._2).toLong
        val nRisk = nUsers - before
        val lnPpb = if (d == 0 || nRisk == d) 0L
          else (BigDecimal(math.log((nRisk - d).toDouble / nRisk.toDouble))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP) *
            BigDecimal(1000000000)).toLongExact
        cum += lnPpb; before += ct
        (BigInt(tt), BigInt(cum))
      }
      val n = BigInt(pts.size)
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
      val slope = if (den == 0) 0.0 else num.toDouble / den.toDouble
      val lambda = -slope / 1.0e9
      val hl = if (lambda > 0.0) 0.6931471805599453 / lambda else 0.0
      val r = got(t)
      assert(r.getLong(1) == pts.size.toLong, s"$t n_points")
      assert(r.getDouble(2) == lambda, s"$t lambda ${r.getDouble(2)} != $lambda")
      assert(r.getDouble(3) == hl, s"$t half_life")
      assert(r.getBoolean(4) == (lambda > 0.0), s"$t decaying")
      // a non-increasing, non-constant ln-survival sequence has a
      // strictly negative OLS slope — so wherever the curve actually
      // moves, the fit MUST read decay (at sf0.001 the single churn
      // sits at the minimum lifetime, the curve is flat across the
      // fitted points, and lambda = 0 is the correct answer)
      if (pts.map(_._2).distinct.size > 1)
        assert(lambda > 0.0, s"$t moving curve but no decay read")
    }
  }

  test("q254: weighted quantiles equal a brute weighted-rank replay; weighting matters") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("n_chars"),
        size(split(trim(col("text")), "\\s+")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = rows("q254_weighted_quantiles")
      .map(r => r.getString(0) -> r).toMap
    var weightMoved = false
    docs.groupBy(_._1).foreach { case (src, xs) =>
      val ordered = xs.sortBy(d => (d._3, d._2))
      val tw = ordered.map(_._4).sum
      def wq(k: Long): Long = {
        var cum = 0L
        ordered.find { d => cum += d._4; cum >= k }.get._3
      }
      val k50 = (tw + 1) / 2; val k90 = (9 * tw + 9) / 10
      val r = got(src)
      assert(r.getLong(1) == xs.length.toLong, s"$src n_docs")
      assert(r.getLong(2) == tw, s"$src token_mass")
      assert(r.getLong(3) == wq(k50), s"$src wp50 ${r.getLong(3)} != ${wq(k50)}")
      assert(r.getLong(4) == wq(k90), s"$src wp90")
      assert(r.getLong(4) >= r.getLong(3), s"$src wp90 < wp50")
      // the UNWEIGHTED median for contrast — weighting must actually
      // move the answer somewhere, or the operator adds nothing
      val n = ordered.length
      val unw50 = ordered((n + 1) / 2 - 1)._3
      if (wq(k50) != unw50) weightMoved = true
    }
    assert(weightMoved, "weighted == unweighted median everywhere — vacuous")
  }

  test("q237: Sen slope equals a sorted full-pair replay at the lower median") {
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((t, d), xs) => (t, d, xs.size.toLong) }.toSeq
    val d0 = daily.map(_._2).min; val d1 = daily.map(_._2).max
    val got = rows("q237_sen_slope").map(r => r.getString(0) -> r).toMap
    daily.map(_._1).distinct.foreach { t =>
      val byDay = daily.filter(_._1 == t).map(x => x._2 -> x._3).toMap
      val ys = (d0 to d1).map(d => byDay.getOrElse(d, 0L))
      val n = ys.size
      val slopes = (for (i <- 0 until n; j <- i + 1 until n)
        yield (ys(j) - ys(i)).toDouble / (j - i).toDouble).sorted
      val m = slopes.size
      val r = got(t)
      assert(r.getLong(1) == m.toLong, s"$t n_pairs")
      assert(r.getDouble(2) == slopes((m + 1) / 2 - 1),
        s"$t sen ${r.getDouble(2)} != ${slopes((m + 1) / 2 - 1)}")
    }
  }

  test("q238: CUPED equals a BigInt sufficient-statistics replay; reduction non-vacuous") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val d0 = ev.map(_._3).min; val d1 = ev.map(_._3).max
    val mid = d0 + (d1 - d0 + 1) / 2
    val got = rows("q238_cuped").map(r => r.getString(0) -> r).toMap
    var reductionSeen = false
    ev.groupBy(_._1).foreach { case (t, xs) =>
      val perUser = xs.groupBy(_._2).map { case (uid, es) =>
        (uid, BigInt(es.count(_._3 < mid)), BigInt(es.count(_._3 >= mid)))
      }.toSeq
      val n = BigInt(perUser.size)
      val sx = perUser.map(_._2).sum; val sy = perUser.map(_._3).sum
      val sxy = perUser.map(p => p._2 * p._3).sum
      val sxx = perUser.map(p => p._2 * p._2).sum
      val syy = perUser.map(p => p._3 * p._3).sum
      val num = n * sxy - sx * sy
      val denx = n * sxx - sx * sx; val deny = n * syy - sy * sy
      val theta = if (denx == 0) 0.0 else num.toDouble / denx.toDouble
      val v0 = perUser.filter(_._1 % 2 == 0); val v1 = perUser.filter(_._1 % 2 == 1)
      val (n0, n1) = (BigInt(v0.size), BigInt(v1.size))
      val (sx0, sx1) = (v0.map(_._2).sum, v1.map(_._2).sum)
      val (sy0, sy1) = (v0.map(_._3).sum, v1.map(_._3).sum)
      val diffRaw = if (n0 == 0 || n1 == 0) 0.0
        else sy1.toDouble / n1.toDouble - sy0.toDouble / n0.toDouble
      val diffAdj = if (n0 == 0 || n1 == 0) 0.0
        else diffRaw - theta *
          (sx1.toDouble / n1.toDouble - sx0.toDouble / n0.toDouble)
      val varRed = if (denx == 0 || deny == 0) 0.0
        else num.toDouble * num.toDouble / (denx.toDouble * deny.toDouble)
      val r = got(t)
      assert(r.getLong(1) == n.toLong, s"$t n_users")
      assert(r.getLong(2) == n0.toLong && r.getLong(3) == n1.toLong, s"$t variants")
      assert(r.getDouble(4) == theta, s"$t theta ${r.getDouble(4)} != $theta")
      assert(r.getDouble(5) == diffRaw, s"$t diff_raw")
      assert(r.getDouble(6) == diffAdj, s"$t diff_adj")
      assert(r.getDouble(7) == varRed, s"$t var_reduction")
      assert(varRed >= 0.0 && varRed <= 1.0, s"$t rho2 out of range")
      if (varRed > 0.0) reductionSeen = true
    }
    assert(reductionSeen, "no type with any pre/post correlation — vacuous")
  }

  test("q239: KM survival equals a right-censored product-limit replay") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val d1 = ev.map(_._3).max
    val censor = graft.operators.RelationalQueries.KmCensorDays
    val got = rows("q239_survival")
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    var censoredSeen = false
    ev.groupBy(_._1).foreach { case (t, xs) =>
      val lifetimes = xs.groupBy(_._2).toSeq.map { case (_, es) =>
        val f = es.map(_._3).min; val l = es.map(_._3).max
        (l - f, l <= d1 - censor)
      }
      val nUsers = lifetimes.size.toLong
      val byT = lifetimes.groupBy(_._1).toSeq.sortBy(_._1)
      var before = 0L; var cum = 0L
      byT.foreach { case (tt, g) =>
        val ct = g.size.toLong; val d = g.count(_._2).toLong
        val nRisk = nUsers - before
        val lnPpb = if (d == 0 || nRisk == d) 0L
          else (BigDecimal(math.log((nRisk - d).toDouble / nRisk.toDouble))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP) *
            BigDecimal(1000000000)).toLongExact
        cum += lnPpb
        val surv = if (nRisk == d) 0.0 else math.exp(cum.toDouble / 1.0e9)
        val r = got((t, tt))
        assert(r.getLong(2) == nRisk, s"$t/$tt n_risk")
        assert(r.getLong(3) == d, s"$t/$tt d_churn")
        assert(r.getLong(4) == ct - d, s"$t/$tt n_censored")
        assert(r.getLong(5) == cum, s"$t/$tt ln_surv_ppb ${r.getLong(5)} != $cum")
        assert(r.getDouble(6) == surv, s"$t/$tt survival")
        if (ct - d > 0) censoredSeen = true
        before += ct
      }
      // the curve must be a genuine survival curve: non-increasing
      val curve = byT.map(bt => got((t, bt._1)).getDouble(6))
      assert(curve.zip(curve.tail).forall { case (a, b) => b <= a },
        s"$t survival not monotone: $curve")
    }
    assert(censoredSeen, "no censored user anywhere — the censor rule is vacuous")
  }

  test("q241: isotonic minimax equals a sequential PAVA replay; monotone") {
    import graft.operators.QualityQueries
    val docs = Tables.documents(spark, sf)
      .select(col("n_chars"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val binned = docs.map { case (nc, text) =>
      val ts = text.trim.split("\\s+").filter(_.nonEmpty)
      val conf = ts.distinct.length.toLong * QualityQueries.EceMass / ts.length
      val bin = math.min(QualityQueries.EceBins - 1,
        conf * QualityQueries.EceBins / QualityQueries.EceMass)
      (bin, if (nc >= QualityQueries.EceLenBar) 1L else 0L)
    }
    val bins = binned.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (b, g) => (b, g.size.toLong, g.map(_._2).sum) }
    // sequential weighted PAVA over (weight = n_b, value = n_pos/n_b),
    // block means compared as exact integer cross-multiplies
    case class Block(nb: Long, pos: Long, bins: List[Long])
    val stack = bins.foldLeft(List.empty[Block]) { case (st, (b, nb, pos)) =>
      var cur = Block(nb, pos, List(b)); var rest = st
      while (rest.nonEmpty &&
          rest.head.pos * cur.nb >= cur.pos * rest.head.nb) {
        cur = Block(rest.head.nb + cur.nb, rest.head.pos + cur.pos,
          rest.head.bins ++ cur.bins)
        rest = rest.tail
      }
      cur :: rest
    }.reverse
    val pava = stack.flatMap(bl =>
      bl.bins.map(_ -> (bl.pos, bl.nb))).toMap
    // r11 ADVICE: before trusting double equality, prove the minimax
    // identity in EXACT integers — min over k≥b of max over j≤b of
    // mean(j..k), all comparisons and the final equality as BigInt
    // cross-multiplies. This removes the rational-tie fragility: a
    // non-block segment can tie the block mean as a RATIONAL (and
    // correctly-rounded division then yields the identical double
    // regardless of which representation min/max surfaced), so once
    // the rationals agree, the double assertion below cannot be
    // 1-ulp flaky.
    val idx = bins.map(_._1).zipWithIndex.toMap
    val pn = bins.scanLeft(BigInt(0))(_ + _._2)
    val pp = bins.scanLeft(BigInt(0))(_ + _._3)
    def mean(j: Int, k: Int): (BigInt, BigInt) =
      (pp(k + 1) - pp(j), pn(k + 1) - pn(j))
    def lt(a: (BigInt, BigInt), b: (BigInt, BigInt)): Boolean =
      a._1 * b._2 < b._1 * a._2
    bins.indices.foreach { i =>
      val minimax = (i until bins.size).map { k =>
        (0 to i).map(j => mean(j, k)).reduce((a, b) => if (lt(a, b)) b else a)
      }.reduce((a, b) => if (lt(b, a)) b else a)
      val (bp, bn) = pava(bins(i)._1)
      assert(minimax._1 * bn == BigInt(bp) * minimax._2,
        s"bin ${bins(i)._1}: minimax rational ${minimax} != PAVA block ($bp, $bn)")
    }
    val got = rows("q241_isotonic").map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == bins.map(_._1).toSet, "bin sets differ")
    bins.foreach { case (b, nb, pos) =>
      val r = got(b)
      assert(r.getLong(1) == nb, s"bin $b n_b")
      assert(r.getDouble(2) == pos.toDouble / nb.toDouble, s"bin $b acc_raw")
      val (bp, bn) = pava(b)
      assert(r.getDouble(3) == bp.toDouble / bn.toDouble,
        s"bin $b minimax ${r.getDouble(3)} != PAVA ${bp.toDouble / bn.toDouble}")
    }
    val curve = bins.map(b => got(b._1).getDouble(3))
    assert(curve.zip(curve.tail).forall { case (a, c) => c >= a },
      s"isotonic fit not monotone: $curve")
    assert(bins.size >= 3, "fewer than 3 populated bins — vacuous")
  }
}
