package graft

import org.apache.spark.sql.functions._

/** Driver replays for the round-12 statistics family: Kruskal–Wallis
  * (q255/D33), Cliff's delta (q256/D34), Simpson diversity (q257/D35),
  * Nelson–Aalen (q258/W35), log-rank (q259/W36), Kendall τ-b
  * (q260/W37) and Cohen's d (q261/D36). Every replay recomputes the
  * answer from the raw parquet in plain Scala (BigInt where the plan
  * routes DECIMAL(38,0), BigDecimal setScale where it routes dsum/ppb)
  * and compares EXACTLY — the doubles must be bit-identical because
  * both sides perform the same IEEE ops on the same exact integers.
  * Non-vacuity guards make sure each statistic discriminates on this
  * corpus (conditional where sf0.001 cannot guarantee the branch).
  */
class StatTestsSpec extends SparkTestBase {

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  private def dsum6(xs: Seq[Double]): Double =
    xs.map(BigDecimal(_).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble

  test("q255: Kruskal–Wallis equals a pooled-midrank BigInt replay") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val vtot = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    var cum = 0L
    val mr2 = vtot.keys.toSeq.sorted.map { v =>
      cum += vtot(v); v -> ((cum - vtot(v)) * 2 + vtot(v) + 1)
    }.toMap
    val terms = docs.groupBy(_._1).toSeq.map { case (_, xs) =>
      (xs.map(x => BigInt(mr2(x._2))).sum, xs.size.toLong)
    }
    val k = terms.size.toLong
    val nn = BigInt(docs.length)
    val tSum = dsum6(terms.map { case (r2, ns) =>
      r2.toDouble * r2.toDouble / ns.toDouble })
    val h = 3.0 * tSum / (nn * (nn + 1)).toDouble - 3.0 * (nn + 1).toDouble
    val tieT = vtot.values.map(c => BigInt(c) * c * c - c).sum
    val c1 = 1.0 - tieT.toDouble / (nn * nn * nn - nn).toDouble
    val hc = if (c1 > 0.0) h / c1 else 0.0
    val df = (k - 1).toInt
    val out = rows("q255_kruskal_wallis")
    assert(out.length == 1, "one global row")
    val r = out.head
    assert(r.getLong(0) == k && r.getLong(1) == nn.toLong &&
      r.getLong(2) == df.toLong, "shape")
    assert(r.getDouble(3) == h, s"h ${r.getDouble(3)} != $h")
    assert(r.getDouble(4) == hc, s"h_corr ${r.getDouble(4)} != $hc")
    // the df lookup must be IN RANGE and produce a real decision —
    // the loud guard behind the Chi2Crit95 31-entry cap
    assert(df >= 1 && df <= graft.operators.QualityQueries.Chi2Crit95.size,
      s"df $df outside the shared lookup table")
    assert(!r.isNullAt(5) && r.getBoolean(5) ==
      (hc > graft.operators.QualityQueries.Chi2Crit95(df - 1)),
      "significance lookup")
    // ranks must discriminate: identical per-source rank sums would
    // mean the pooled ranking carries nothing
    assert(terms.map(_._1).distinct.size > 1,
      "all per-source rank sums equal — vacuous")
  }

  test("q256: Cliff's delta equals a BigInt pair replay; pairs conserve") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value"),
        ((expr("unix_micros(ts) DIV 86400000000") + 4) % 7 >= 5).as("we"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    val got = rows("q256_cliffs_delta").map(r => r.getString(0) -> r).toMap
    assert(got.keySet == ev.map(_._1).toSet)
    ev.groupBy(_._1).foreach { case (t, xs) =>
      var cumwd = BigInt(0); var gt = BigInt(0); var eq = BigInt(0)
      var nwe = 0L; var nwd = 0L
      xs.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (_, g) =>
        val cwe = g.count(_._3).toLong
        val cwd = g.count(!_._3).toLong
        gt += BigInt(cwe) * cumwd
        eq += BigInt(cwe) * cwd
        cumwd += cwd; nwe += cwe; nwd += cwd
      }
      val np = BigInt(nwe) * nwd
      val lt = np - gt - eq
      val delta =
        if (nwe == 0 || nwd == 0) 0.0 else (gt - lt).toDouble / np.toDouble
      val mag =
        if (math.abs(delta) < 0.147) "negligible"
        else if (math.abs(delta) < 0.33) "small"
        else if (math.abs(delta) < 0.474) "medium" else "large"
      val r = got(t)
      assert(r.getLong(1) == nwe && r.getLong(2) == nwd, s"$t n")
      assert(r.getDouble(3) == gt.toDouble, s"$t gt")
      assert(r.getDouble(4) == lt.toDouble, s"$t lt")
      assert(r.getDouble(5) == eq.toDouble, s"$t eq")
      assert(r.getDouble(6) == delta, s"$t delta ${r.getDouble(6)} != $delta")
      assert(r.getString(7) == mag, s"$t magnitude")
      assert(gt + lt + eq == np, s"$t pair conservation")
      assert(delta >= -1.0 && delta <= 1.0, s"$t delta out of range")
      assert(nwe > 0 && nwd > 0, s"$t a split side is empty — vacuous")
    }
  }

  test("q257: Simpson diversity equals a BigInt count replay; bounded") {
    val toks = Tables.documents(spark, sf)
      .select(col("source"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val got = rows("q257_simpson_diversity")
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == toks.map(_._1).toSet)
    toks.groupBy(_._1).foreach { case (src, xs) =>
      val cnt = xs.groupBy(_._2).view.mapValues(g => BigInt(g.size)).toMap
      val n = BigInt(xs.size)
      val lamNum = cnt.values.map(c => c * (c - 1)).sum
      val lam = if (n > 1) lamNum.toDouble / (n * (n - 1)).toDouble else 0.0
      val r = got(src)
      assert(r.getLong(1) == n.toLong && r.getLong(2) == cnt.size.toLong,
        s"$src shape")
      assert(r.getDouble(3) == lam, s"$src lambda ${r.getDouble(3)} != $lam")
      assert(r.getDouble(4) == 1.0 - lam, s"$src gini")
      assert(r.getDouble(5) == (if (lam > 0.0) 1.0 / lam else 0.0),
        s"$src effective vocab")
      assert(lam > 0.0 && lam <= 1.0, s"$src lambda out of (0,1]")
    }
    // concentration must discriminate across sources or the audit
    // reads nothing
    assert(got.values.map(_.getDouble(3)).toSeq.distinct.size > 1,
      "flat lambda across sources — vacuous")
  }

  /** Shared KM risk-set replay: per type, the (t, ct, d, n_risk) rows
    * in lifetime order — the q239/q252 chain re-derived. */
  private def riskRows(ev: Seq[(String, Long, Long)])
      : Map[String, Seq[(Long, Long, Long, Long)]] = {
    val d1 = ev.map(_._3).max
    val censor = graft.operators.RelationalQueries.KmCensorDays
    ev.groupBy(_._1).view.mapValues { xs =>
      val lifetimes = xs.groupBy(_._2).toSeq.map { case (_, es) =>
        val f = es.map(_._3).min; val l = es.map(_._3).max
        (l - f, l <= d1 - censor)
      }
      val nUsers = lifetimes.size.toLong
      var before = 0L
      lifetimes.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, g) =>
        val ct = g.size.toLong; val d = g.count(_._2).toLong
        val nRisk = nUsers - before
        before += ct
        (t, ct, d, nRisk)
      }
    }.toMap
  }

  test("q258: Nelson–Aalen equals a risk-set replay; dominated by −ln S") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = rows("q258_nelson_aalen")
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    var anyHazard = false
    riskRows(ev).foreach { case (t, rws) =>
      var cumH = 0L; var cumLn = 0L; var i = 0
      rws.foreach { case (tt, _, d, nRisk) =>
        val hz = (BigInt(d) * 1000000000L / nRisk).toLong
        cumH += hz; i += 1
        val lnPpb = if (d == 0 || nRisk == d) 0L
          else (BigDecimal(math.log((nRisk - d).toDouble / nRisk.toDouble))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP) *
            BigDecimal(1000000000)).toLongExact
        cumLn += lnPpb
        val r = got((t, tt))
        assert(r.getLong(2) == nRisk && r.getLong(3) == d, s"$t/$tt risk")
        assert(r.getLong(4) == hz, s"$t/$tt hz_ppb")
        assert(r.getLong(5) == cumH, s"$t/$tt cum_haz_ppb")
        assert(r.getDouble(6) == cumH.toDouble / 1.0e9, s"$t/$tt display")
        // Nelson–Aalen is dominated by −ln Ŝ (x ≤ −ln(1−x)); each
        // floored DIV can only push H down, each ln ppb rounds within
        // half a unit — so the identity holds up to one ppb per row
        assert(cumH <= -cumLn + i, s"$t/$tt H ${cumH} > −lnS ${-cumLn}")
      }
      if (cumH > 0) anyHazard = true
    }
    assert(got.size == riskRows(ev).values.map(_.size).sum, "row count")
    assert(anyHazard, "no churn hazard anywhere — vacuous")
  }

  test("q259: log-rank equals a per-variant risk-set replay") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val d1 = ev.map(_._3).max
    val censor = graft.operators.RelationalQueries.KmCensorDays
    val got = rows("q259_logrank").map(r => r.getString(0) -> r).toMap
    var anyVar = false
    ev.groupBy(_._1).foreach { case (t, xs) =>
      val lifetimes = xs.groupBy(_._2).toSeq.map { case (u, es) =>
        val f = es.map(_._3).min; val l = es.map(_._3).max
        (u % 2, l - f, l <= d1 - censor)
      }
      val nV = Map(0L -> lifetimes.count(_._1 == 0).toLong,
                   1L -> lifetimes.count(_._1 == 1).toLong)
      assert(nV(0L) > 0 && nV(1L) > 0, s"$t one variant empty — vacuous")
      val times = lifetimes.map(_._2).distinct.sorted
      def at(v: Long, tt: Long): (Long, Long) = {
        val mine = lifetimes.filter(_._1 == v)
        val nRisk = nV(v) - mine.count(_._2 < tt)
        val d = mine.count(x => x._2 == tt && x._3).toLong
        (nRisk, d)
      }
      var o1 = 0L; var anyDeath = false
      val eTerms = scala.collection.mutable.ListBuffer.empty[Double]
      val vTerms = scala.collection.mutable.ListBuffer.empty[Double]
      times.foreach { tt =>
        val (n0, d0) = at(0L, tt); val (n1, d0b) = at(1L, tt)
        val d1t = d0b; val dt = d0 + d1t; val nt = n0 + n1
        if (dt > 0) {
          anyDeath = true
          o1 += d1t
          eTerms += dt.toDouble * n1.toDouble / nt.toDouble
          vTerms += (if (nt > 1)
            dt.toDouble * n1.toDouble * n0.toDouble * (nt - dt).toDouble /
              (nt.toDouble * nt.toDouble * (nt - 1).toDouble)
          else 0.0)
        }
      }
      if (!anyDeath) {
        // a type with ZERO churned users has no death times — both
        // engines emit no row for it (the dt > 0 filter), and the
        // replay must mirror that
        assert(!got.contains(t), s"$t has no deaths but emitted a row")
      } else {
        val e1 = dsum6(eTerms.toSeq); val vlr = dsum6(vTerms.toSeq)
        val z = if (vlr > 0.0) (o1.toDouble - e1) / math.sqrt(vlr) else 0.0
        val r = got(t)
        assert(r.getLong(1) == o1, s"$t O1 ${r.getLong(1)} != $o1")
        assert(r.getDouble(2) == e1, s"$t E1 ${r.getDouble(2)} != $e1")
        assert(r.getDouble(3) == vlr, s"$t V ${r.getDouble(3)} != $vlr")
        assert(r.getDouble(4) == z, s"$t z")
        assert(r.getBoolean(5) == (math.abs(z) > 1.96), s"$t significant")
        if (vlr > 0.0) anyVar = true
      }
    }
    assert(anyVar, "zero log-rank variance everywhere — vacuous")
  }

  test("q260: Kendall τ-b equals a BigInt pair replay; sign-coherent") {
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts) DIV 86400000000"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val d0 = daily.keys.map(_._2).min; val dM = daily.keys.map(_._2).max
    val got = rows("q260_kendall_tau").map(r => r.getString(0) -> r).toMap
    val types = daily.keys.map(_._1).toSeq.distinct
    assert(got.keySet == types.toSet)
    var anySignal = false
    types.foreach { t =>
      val ys = (d0 to dM).map(d => daily.getOrElse((t, d), 0L))
      var c = 0L; var disc = 0L
      for (i <- ys.indices; j <- (i + 1) until ys.size) {
        if (ys(j) > ys(i)) c += 1 else if (ys(j) < ys(i)) disc += 1
      }
      val n = ys.size.toLong
      val n0x2 = n * (n - 1)
      val tie2 = ys.groupBy(identity).values
        .map(g => g.size.toLong * (g.size - 1)).sum
      val s = c - disc
      val den4 = (n0x2 - tie2) * n0x2
      val tau = if (den4 > 0) s.toDouble * 2.0 / math.sqrt(den4.toDouble)
                else 0.0
      val r = got(t)
      assert(r.getLong(1) == n && r.getLong(2) == c &&
        r.getLong(3) == disc && r.getLong(4) == s, s"$t counts")
      assert(r.getDouble(5) == tau, s"$t tau ${r.getDouble(5)} != $tau")
      assert(math.abs(tau) <= 1.0, s"$t tau out of range")
      assert(den4 == 0 || math.signum(tau) == math.signum(s.toDouble),
        s"$t sign mismatch")
      if (s != 0) anySignal = true
    }
    assert(anySignal, "every series perfectly balanced — vacuous")
  }

  test("q265: seasonal strength equals a dow-decomposition replay; bounded") {
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts) DIV 86400000000"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val d0 = daily.keys.map(_._2).min; val dM = daily.keys.map(_._2).max
    val got = rows("q265_seasonal_strength")
      .map(r => r.getString(0) -> r).toMap
    val etas = daily.keys.map(_._1).toSeq.distinct.map { t =>
      val ys = (d0 to dM).map(d => (d, daily.getOrElse((t, d), 0L)))
      val n = BigInt(ys.size)
      val tt = ys.map(y => BigInt(y._2)).sum
      val syy = ys.map(y => BigInt(y._2) * y._2).sum
      val byDow = ys.groupBy(y => (y._1 + 4) % 7)
      val b = dsum6(byDow.values.toSeq.map { g =>
        val td = g.map(y => BigInt(y._2)).sum
        td.toDouble * td.toDouble / g.size.toDouble
      })
      val ttd = tt.toDouble * tt.toDouble / n.toDouble
      val ssT = syy.toDouble - ttd
      val ssB = b - ttd
      val eta2 = if (ssT > 0.0) ssB / ssT else 0.0
      val r = got(t)
      assert(r.getLong(1) == ys.size.toLong, s"$t n_days")
      assert(r.getDouble(2) == ssB, s"$t ss_between ${r.getDouble(2)} != $ssB")
      assert(r.getDouble(3) == ssT, s"$t ss_total")
      assert(r.getDouble(4) == eta2, s"$t eta2 ${r.getDouble(4)} != $eta2")
      assert(r.getBoolean(5) == (eta2 > 0.2), s"$t seasonal")
      assert(eta2 >= -1e-9 && eta2 <= 1.0 + 1e-9, s"$t eta2 out of [0,1]")
      eta2
    }
    assert(etas.exists(_ > 0.0), "zero weekly structure everywhere — vacuous")
  }

  test("q266: runs test equals a sequential median/streak replay") {
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts) DIV 86400000000"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val d0 = daily.keys.map(_._2).min; val dM = daily.keys.map(_._2).max
    val got = rows("q266_runs_test").map(r => r.getString(0) -> r).toMap
    var anyTested = false
    daily.keys.map(_._1).toSeq.distinct.foreach { t =>
      val ys = (d0 to dM).map(d => (d, daily.getOrElse((t, d), 0L)))
      // lower median under the (y, day) total order
      val med = ys.sortBy(y => (y._2, y._1)).apply((ys.size + 1) / 2 - 1)._2
      val kept: Seq[Boolean] = ys.filter(_._2 != med).map(_._2 > med)
      if (kept.isEmpty) {
        // every day sits on the median: nothing retained — both
        // engines emit no row for the type and the replay mirrors it
        assert(!got.contains(t), s"$t empty but emitted")
      } else {
        val n1 = kept.count(identity).toLong
        val n2 = kept.count(b => !b).toLong
        val runs = 1L + kept.zip(kept.tail).count { case (a, b) => a != b }
        val m = n1 + n2; val p = n1 * n2
        val mu = 1.0 + (p * 2).toDouble / m.toDouble
        val vr = if (m > 1)
          (p * 2 * (p * 2 - m)).toDouble / (m * m * (m - 1)).toDouble
        else 0.0
        val z = if (n1 > 0 && n2 > 0 && vr > 0.0)
          (runs.toDouble - mu) / math.sqrt(vr) else 0.0
        val r = got(t)
        assert(r.getLong(1) == n1 && r.getLong(2) == n2, s"$t sides")
        assert(r.getLong(3) == runs, s"$t runs ${r.getLong(3)} != $runs")
        assert(r.getDouble(4) == z, s"$t z ${r.getDouble(4)} != $z")
        assert(r.getBoolean(5) == (math.abs(z) <= 1.96), s"$t random")
        if (n1 > 0 && n2 > 0) anyTested = true
        // the discard rule must have removed the median days
        assert(kept.size.toLong == n1 + n2 &&
          kept.size < ys.size, s"$t discard rule did not fire")
      }
    }
    assert(anyTested, "no type with both sides populated — vacuous")
  }

  test("q267: char-class entropy equals a ppb-ln replay; masses conserve") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val got = rows("q267_char_entropy").map(r => r.getString(0) -> r).toMap
    def lnppb(c: Long): Long =
      (BigDecimal(math.log(c.toDouble))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP) *
        BigDecimal(1000000000)).toLongExact
    docs.groupBy(_._1).foreach { case (src, xs) =>
      val text = xs.map(_._2)
      val nc = text.map(_.length.toLong).sum
      val lo = text.map(_.count(c => c >= 'a' && c <= 'z').toLong).sum
      val up = text.map(_.count(c => c >= 'A' && c <= 'Z').toLong).sum
      val di = text.map(_.count(c => c >= '0' && c <= '9').toLong).sum
      val sp = text.map(_.count(_ == ' ').toLong).sum
      val ot = nc - lo - up - di - sp
      val tsum = Seq(lo, up, di, sp, ot).filter(_ > 0)
        .map(c => BigInt(c) * lnppb(c)).sum
      val hPpb = if (nc > 0) lnppb(nc) - (tsum / nc).toLong else 0L
      val r = got(src)
      assert(r.getLong(1) == nc && r.getLong(2) == lo &&
        r.getLong(3) == up && r.getLong(4) == di &&
        r.getLong(5) == sp && r.getLong(6) == ot, s"$src class masses")
      assert(r.getLong(7) == hPpb, s"$src ppb ${r.getLong(7)} != $hPpb")
      assert(r.getDouble(8) == hPpb.toDouble / 1.0e9, s"$src display")
      assert(ot >= 0, s"$src negative other mass — classes overlap")
      // entropy of a 5-class distribution lies in [0, ln 5]; the ppb
      // rounding can stray at most a few units past the bound
      assert(hPpb >= -8 && hPpb <= 1609437913L, s"$src entropy out of bounds")
    }
    assert(got.values.map(_.getLong(7)).toSeq.distinct.size > 1,
      "flat entropy across sources — vacuous")
  }

  test("q261: Cohen's d equals a BigInt sufficient-stats replay") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), (col("user_id") % 2).as("variant"),
        (col("value").cast("decimal(12,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = rows("q261_cohens_d").map(r => r.getString(0) -> r).toMap
    ev.groupBy(_._1).foreach { case (t, xs) =>
      def side(v: Long): (Long, BigInt, BigInt) = {
        val cs = xs.filter(_._2 == v).map(_._3)
        val s = cs.map(BigInt(_)).sum
        val scc = cs.map(c => BigInt(c) * c).sum
        (cs.size.toLong, s, BigInt(cs.size) * scc - s * s)
      }
      val (num0, s0, q0) = side(0); val (num1, s1, q1) = side(1)
      val mean0 = s0.toDouble / num0.toDouble
      val mean1 = s1.toDouble / num1.toDouble
      val sp2 = (q0.toDouble / num0.toDouble + q1.toDouble / num1.toDouble) /
        (num0 + num1 - 2).toDouble
      val d = if (num0 > 0 && num1 > 0 && num0 + num1 > 2 && sp2 > 0.0)
        (mean1 - mean0) / math.sqrt(sp2) else 0.0
      val g = d * (1.0 - 3.0 / ((num0 + num1) * 4 - 9).toDouble)
      val r = got(t)
      assert(r.getLong(1) == num0 && r.getLong(2) == num1, s"$t n")
      assert(r.getDouble(3) == mean0 && r.getDouble(4) == mean1, s"$t means")
      assert(r.getDouble(5) == d, s"$t d ${r.getDouble(5)} != $d")
      assert(r.getDouble(6) == g, s"$t g")
      assert(sp2 > 0.0, s"$t zero pooled variance — vacuous")
    }
  }

  test("q269: Welch's t equals a BigInt sufficient-stats replay") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), (col("user_id") % 2).as("variant"),
        (col("value").cast("decimal(12,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = rows("q269_welch_t").map(r => r.getString(0) -> r).toMap
    assert(got.keySet == ev.map(_._1).toSet)
    ev.groupBy(_._1).foreach { case (t, xs) =>
      def side(v: Long): (Long, BigInt, BigInt) = {
        val cs = xs.filter(_._2 == v).map(_._3)
        val s = cs.map(BigInt(_)).sum
        val scc = cs.map(c => BigInt(c) * c).sum
        (cs.size.toLong, s, BigInt(cs.size) * scc - s * s)
      }
      val (n0, s0, q0) = side(0); val (n1, s1, q1) = side(1)
      val mean0 = s0.toDouble / n0.toDouble
      val mean1 = s1.toDouble / n1.toDouble
      val v0 = q0.toDouble / (BigInt(n0) * (n0 - 1)).toDouble
      val v1 = q1.toDouble / (BigInt(n1) * (n1 - 1)).toDouble
      val se0 = v0 / n0.toDouble; val se1 = v1 / n1.toDouble
      val se2 = se0 + se1
      val ok = n0 > 1 && n1 > 1 && se2 > 0.0
      val tW = if (ok) (mean1 - mean0) / math.sqrt(se2) else 0.0
      val df = if (ok) se2 * se2 /
        (se0 * se0 / (n0 - 1).toDouble + se1 * se1 / (n1 - 1).toDouble)
      else 0.0
      val r = got(t)
      assert(r.getLong(1) == n0 && r.getLong(2) == n1, s"$t n")
      assert(r.getDouble(3) == mean0 && r.getDouble(4) == mean1, s"$t means")
      assert(r.getDouble(5) == v0 && r.getDouble(6) == v1, s"$t variances")
      assert(r.getDouble(7) == tW, s"$t t ${r.getDouble(7)} != $tW")
      assert(r.getDouble(8) == df, s"$t df")
      assert(r.getBoolean(9) == (math.abs(tW) > 1.96), s"$t cut")
      // unequal variances are the whole point — if both sides ever
      // read identical the Welch/pooled distinction is vacuous here
      assert(v0 != v1, s"$t equal variances — vacuous")
    }
  }

  test("q270: one-way ANOVA F equals a BigInt sufficient-stats replay") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"),
        (col("value").cast("decimal(12,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val by = ev.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = by.size.toLong
    val nTot = ev.length.toLong
    val tSum = by.values.map(_.map(BigInt(_)).sum).sum
    val qTot = by.values.map(_.map(c => BigInt(c) * c).sum).sum
    val b = dsum6(by.values.toSeq.map { cs =>
      val s = cs.map(BigInt(_)).sum
      s.toDouble * s.toDouble / cs.size.toDouble
    })
    val tt = tSum.toDouble * tSum.toDouble / nTot.toDouble
    val ssB = b - tt
    val ssW = qTot.toDouble - b
    val df1 = (k - 1).toInt
    val f = if (df1 >= 1 && nTot > k && ssW > 0.0)
      (ssB / df1.toDouble) / (ssW / (nTot - k).toDouble) else 0.0
    val out = rows("q270_anova_f")
    assert(out.length == 1, "one global row")
    val r = out.head
    assert(r.getLong(0) == k && r.getLong(1) == nTot, "shape")
    assert(r.getDouble(2) == ssB, s"ss_between ${r.getDouble(2)} != $ssB")
    assert(r.getDouble(3) == ssW, s"ss_within")
    assert(r.getDouble(4) == f, s"f ${r.getDouble(4)} != $f")
    assert(df1 >= 1 && df1 <= graft.operators.QualityQueries.Chi2Crit95.size,
      s"df $df1 outside the shared lookup table")
    assert(!r.isNullAt(5) && r.getBoolean(5) ==
      (f * df1.toDouble > graft.operators.QualityQueries.Chi2Crit95(df1 - 1)),
      "significance lookup")
    assert(ssB > 0.0 && ssW > 0.0, "degenerate decomposition — vacuous")
  }

  test("q271: McNemar equals a paired-flags replay; the pairing discriminates") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val d0 = ev.map(_._3).min; val d1 = ev.map(_._3).max
    val mid = Math.floorDiv(d0 + d1 + 1, 2L)
    val got = rows("q271_mcnemar").map(r => r.getString(0) -> r).toMap
    assert(got.keySet == ev.map(_._1).toSet)
    var anyDisc = false
    ev.groupBy(_._1).foreach { case (t, xs) =>
      val flags = xs.groupBy(_._2).view.mapValues { es =>
        (es.exists(_._3 < mid), es.exists(_._3 >= mid))
      }.toMap
      val b = flags.values.count { case (f, s) => f && !s }.toLong
      val c = flags.values.count { case (f, s) => !f && s }.toLong
      val both = flags.values.count { case (f, s) => f && s }.toLong
      val cc = BigInt(math.max(math.abs(b - c) - 1, 0L))
      val chi2 = if (b + c > 0) (cc * cc).toDouble / (b + c).toDouble else 0.0
      val r = got(t)
      assert(r.getLong(1) == b && r.getLong(2) == c &&
        r.getLong(3) == both, s"$t cells")
      assert(r.getDouble(4) == chi2, s"$t chi2 ${r.getDouble(4)} != $chi2")
      assert(r.getBoolean(5) == (chi2 > 3.8415), s"$t cut")
      if (b + c > 0) anyDisc = true
    }
    // sf0.001's ~100 users are all active in both halves, so the
    // discordant branch can be empty here — the consistency demand is
    // then that EVERY chi2 reads exactly 0 (the sf0.01 oracle corpus
    // exercises the live branch)
    assert(anyDisc || got.values.forall(_.getDouble(4) == 0.0),
      "no discordant users, yet a nonzero chi2 appeared")
  }

  /** Zero-filled per-type daily-count grid over the GLOBAL day span —
    * the q272/q273 replays' shared input (mirrors dailyGrid). */
  private def dailyGridLocal(): Map[String, Array[Long]] = {
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts) DIV 86400000000"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val d0 = daily.keys.map(_._2).min; val d1 = daily.keys.map(_._2).max
    daily.keys.map(_._1).toSeq.distinct.map { t =>
      t -> (d0 to d1).map(d => daily.getOrElse((t, d), 0L)).toArray
    }.toMap
  }

  test("q272: Cox–Stuart equals a half-offset pairing replay") {
    val grids = dailyGridLocal()
    val got = rows("q272_cox_stuart").map(r => r.getString(0) -> r).toMap
    assert(got.keySet == grids.keySet)
    var anyTrend = false
    grids.foreach { case (t, ys) =>
      val n = ys.length
      val h = (n + 1) / 2
      val pairs = (0 until n - h).map(i => (ys(i), ys(i + h)))
      val plus = pairs.count { case (a, b) => b > a }.toLong
      val minus = pairs.count { case (a, b) => b < a }.toLong
      val m = plus + minus
      val sStat = plus * 2 - m
      val z = if (m > 0 && sStat != 0)
        (sStat - (if (sStat > 0) 1L else -1L)).toDouble /
          math.sqrt(m.toDouble)
      else 0.0
      val r = got(t)
      assert(r.getLong(1) == n.toLong && r.getLong(2) == pairs.size.toLong,
        s"$t shape")
      assert(r.getLong(3) == plus && r.getLong(4) == minus, s"$t signs")
      assert(r.getDouble(5) == z, s"$t z ${r.getDouble(5)} != $z")
      val trend = if (z > 1.96) "increasing"
        else if (z < -1.96) "decreasing" else "none"
      assert(r.getString(6) == trend, s"$t trend")
      if (m > 0) anyTrend = true
    }
    assert(anyTrend, "every pair tied everywhere — vacuous")
  }

  test("q273: turning-point test equals a strict-extrema replay") {
    val grids = dailyGridLocal()
    val got = rows("q273_turning_point").map(r => r.getString(0) -> r).toMap
    assert(got.keySet == grids.keySet)
    grids.foreach { case (t, ys) =>
      val n = ys.length
      val tp = (1 until n - 1).count(i =>
        (ys(i - 1) < ys(i) && ys(i) > ys(i + 1)) ||
        (ys(i - 1) > ys(i) && ys(i) < ys(i + 1))).toLong
      val mu = (n - 2).toDouble * 2.0 / 3.0
      val vr = (n * 16 - 29).toDouble / 90.0
      val z = if (n > 3) (tp.toDouble - mu) / math.sqrt(vr) else 0.0
      val r = got(t)
      assert(r.getLong(1) == n.toLong && r.getLong(2) == tp, s"$t counts")
      assert(r.getDouble(3) == z, s"$t z ${r.getDouble(3)} != $z")
      assert(r.getBoolean(4) == (math.abs(z) <= 1.96), s"$t cut")
      assert(tp > 0, s"$t zero turning points — vacuous")
    }
  }

  test("q274: Wasserstein matrix equals a BigInt CDF replay; W1 is a metric sample") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1).view
      .mapValues(_.groupBy(_._2).view.mapValues(_.size.toLong).toMap).toMap
    val support = docs.map(_._2).distinct.sorted
    val gaps = support.zip(support.drop(1)).map { case (v, nv) => v -> (nv - v) }.toMap
    def cdf(src: String): Map[Long, Long] = {
      var cum = 0L
      support.map { v =>
        cum += bySrc(src).getOrElse(v, 0L); v -> cum
      }.toMap
    }
    val cums = bySrc.keys.map(s => s -> cdf(s)).toMap
    val ns = bySrc.view.mapValues(_.values.sum).toMap
    val got = rows("q274_wasserstein")
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val srcs = bySrc.keys.toSeq.sorted
    val wantPairs = (for (a <- srcs; b <- srcs if a < b) yield (a, b)).toSet
    assert(got.keySet == wantPairs, s"pair coverage ${got.keySet} != $wantPairs")
    var anyPositive = false
    wantPairs.foreach { case (a, b) =>
      val num = support.dropRight(1).map { v =>
        (BigInt(cums(a)(v)) * ns(b) - BigInt(cums(b)(v)) * ns(a)).abs *
          gaps(v)
      }.sum
      val w1 = num.toDouble / (BigInt(ns(a)) * ns(b)).toDouble
      val r = got((a, b))
      assert(r.getLong(2) == ns(a) && r.getLong(3) == ns(b), s"($a,$b) n")
      assert(r.getDouble(4) == w1, s"($a,$b) w1 ${r.getDouble(4)} != $w1")
      assert(w1 >= 0.0, s"($a,$b) negative distance")
      if (w1 > 0.0) anyPositive = true
    }
    assert(anyPositive, "all sources identically distributed — vacuous")
  }

  test("q275: readability equals a tokenizer/syllable replay") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val sentRe = "[.!?]+".r
    val sylRe = "[aeiouy]+".r
    val got = rows("q275_readability").map(r => r.getString(0) -> r).toMap
    // per-source local counts; a source whose docs are ALL
    // empty/whitespace (wc == 0) is dropped by BOTH engines
    val local = docs.groupBy(_._1).map { case (src, xs) =>
      var nd = 0L; var wc = 0L; var sc = 0L; var syl = 0L
      xs.foreach { case (_, text0) =>
        val t = text0.toLowerCase
        nd += 1
        sc += math.max(1L, sentRe.findAllIn(t).size.toLong)
        t.trim.split("\\s+").filter(_.nonEmpty).foreach { w =>
          wc += 1
          syl += math.max(1L, sylRe.findAllIn(w).size.toLong)
        }
      }
      (src, nd, wc, sc, syl)
    }
    assert(got.keySet == local.filter(_._3 > 0).map(_._1).toSet)
    var totNd = 0L; var totWc = 0L; var totSc = 0L; var totSyl = 0L
    local.filter(_._3 > 0).foreach { case (src, nd, wc, sc, syl) =>
      val wps = wc.toDouble / sc.toDouble
      val spw = syl.toDouble / wc.toDouble
      val ease = 206.835 - 1.015 * wps - 84.6 * spw
      val grade = 0.39 * wps + 11.8 * spw - 15.59
      val r = got(src)
      assert(r.getLong(1) == nd && r.getLong(2) == wc &&
        r.getLong(3) == sc && r.getLong(4) == syl, s"$src counts")
      assert(r.getDouble(5) == ease, s"$src ease ${r.getDouble(5)} != $ease")
      assert(r.getDouble(6) == grade, s"$src grade")
      totNd += nd; totWc += wc; totSc += sc; totSyl += syl
    }
    // the synthetic corpus has NO sentence punctuation at any SF
    // (verified: zero [.!?] matches at sf0.01), so the sentence leg
    // floors to 1/doc BY CORPUS — wps degrades to words-per-doc,
    // which still varies. The discriminating structure the guard can
    // demand here: multi-syllable words (vowel runs) and a score that
    // actually separates the sources.
    assert(totSyl > totWc,
      s"syllable floor dominates — vacuous ($totSyl syllables/$totWc words)")
    assert(got.values.map(_.getDouble(5)).toSeq.distinct.size > 1,
      "all sources read identically — vacuous")
  }

  test("q276: Yule's K equals a BigInt counts-of-counts replay and is size-invariant") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val got = rows("q276_yule_k").map(r => r.getString(0) -> r).toMap
    assert(got.keySet == docs.map(_._1).toSet)
    val ks = docs.groupBy(_._1).map { case (src, xs) =>
      val cnt = scala.collection.mutable.Map.empty[String, Long]
      xs.foreach(_._2.trim.split("\\s+").filter(_.nonEmpty)
        .foreach(tok => cnt.update(tok, cnt.getOrElse(tok, 0L) + 1)))
      val n = cnt.values.sum
      val s2 = cnt.values.map(c => BigInt(c) * c).sum
      val k = if (n > 0)
        (s2 - n).toDouble * 10000.0 / (BigInt(n) * n).toDouble else 0.0
      val r = got(src)
      assert(r.getLong(1) == n && r.getLong(2) == cnt.size.toLong,
        s"$src shape")
      assert(r.getDouble(3) == s2.toDouble, s"$src sum_c2")
      assert(r.getDouble(4) == k, s"$src K ${r.getDouble(4)} != $k")
      // size-invariance — the property that distinguishes K from raw
      // repeat counts: doubling the text leaves K within O(1/N)
      val n2 = n * 2
      val s2x = cnt.values.map(c => BigInt(2 * c) * (2 * c)).sum
      val kDoubled = (s2x - n2).toDouble * 10000.0 /
        (BigInt(n2) * n2).toDouble
      assert(math.abs(kDoubled - k) <= 10000.0 / n.toDouble * 2,
        s"$src K not size-stable: $k vs doubled $kDoubled")
      k
    }.toSeq
    assert(ks.distinct.size > 1, "all sources equally rich — vacuous")
  }

  test("q277: odds ratio equals a smoothed 2x2 replay with the lnR rounding") {
    import graft.operators.RelationalQueries.AbConvK
    val ut = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val users = ut.keys.map(_._1).toSeq.distinct
    val nByV = users.groupBy(_ % 2).view.mapValues(_.size.toLong).toMap
    val types = ut.keys.map(_._2).toSeq.distinct
    val got = rows("q277_odds_ratio").map(r => r.getString(0) -> r).toMap
    assert(got.keySet == types.toSet)
    var anyConv = false
    types.foreach { t =>
      def conv(v: Long): Long = ut.count { case ((u, tt), k) =>
        tt == t && u % 2 == v && k >= AbConvK }.toLong
      val (c1, n1) = (conv(0), nByV(0)); val (c2, n2) = (conv(1), nByV(1))
      val a = c1.toDouble + 0.5; val b = (n1 - c1).toDouble + 0.5
      val c = c2.toDouble + 0.5; val dd = (n2 - c2).toDouble + 0.5
      val or = a * dd / (b * c)
      val lnOr = BigDecimal(math.log(or))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      val se = math.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / dd)
      val lo = lnOr - 1.96 * se; val hi = lnOr + 1.96 * se
      val r = got(t)
      assert(r.getLong(1) == c1 && r.getLong(2) == n1 &&
        r.getLong(3) == c2 && r.getLong(4) == n2, s"$t cells")
      assert(r.getDouble(5) == or, s"$t OR ${r.getDouble(5)} != $or")
      assert(r.getDouble(6) == lnOr, s"$t lnOR")
      assert(r.getDouble(7) == lo && r.getDouble(8) == hi, s"$t CI")
      assert(r.getBoolean(9) == (lo > 0.0 || hi < 0.0), s"$t cut")
      if (c1 > 0 && c2 > 0) anyConv = true
    }
    assert(anyConv, "no converters in either variant — vacuous")
  }

  test("q278: Gehan–Wilcoxon equals a BigInt risk-set replay") {
    import graft.operators.RelationalQueries.KmCensorDays
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val pu = ev.groupBy(x => (x._1, x._2)).map { case ((t, u), xs) =>
      (t, u % 2, xs.map(_._3).min, xs.map(_._3).max)
    }.toSeq
    val dmax = pu.map(_._4).max
    val durs = pu.map { case (t, v, f, l) =>
      (t, v, l - f, l <= dmax - KmCensorDays) }
    val got = rows("q278_gehan_wilcoxon").map(r => r.getString(0) -> r).toMap
    // a type with zero churn deaths has no dt>0 row and is absent by
    // construction (the q259 convention over the same risk-set table)
    val withDeaths = durs.groupBy(_._1).collect {
      case (t, xs) if xs.exists(_._4) => t
    }.toSet
    assert(got.keySet == withDeaths,
      s"key set ${got.keySet} != types-with-deaths $withDeaths")
    var anyVar = false
    durs.groupBy(_._1).filter(g => withDeaths(g._1)).foreach { case (t, xs) =>
      val times = xs.map(_._3).distinct.sorted
      def nRisk(v: Long, tt: Long): Long = xs.count(x => x._2 == v && x._3 >= tt).toLong
      def deaths(v: Long, tt: Long): Long =
        xs.count(x => x._2 == v && x._3 == tt && x._4).toLong
      var u = BigInt(0); val varTerms = scala.collection.mutable.ListBuffer.empty[Double]
      times.foreach { tt =>
        val n1 = nRisk(1, tt); val n0 = nRisk(0, tt)
        val d1 = deaths(1, tt); val d0 = deaths(0, tt)
        val nt = n0 + n1; val dt = d0 + d1
        if (dt > 0) {
          u += BigInt(nt) * d1 - BigInt(dt) * n1
          varTerms += (if (nt > 1)
            dt.toDouble * n1.toDouble * n0.toDouble * (nt - dt).toDouble /
              (nt - 1).toDouble
          else 0.0)
        }
      }
      val vg = dsum6(varTerms.toSeq)
      val z = if (vg > 0.0) u.toDouble / math.sqrt(vg) else 0.0
      val r = got(t)
      assert(r.getDouble(1) == u.toDouble, s"$t U ${r.getDouble(1)} != $u")
      assert(r.getDouble(2) == vg, s"$t var")
      assert(r.getDouble(3) == z, s"$t z ${r.getDouble(3)} != $z")
      assert(r.getBoolean(4) == (math.abs(z) > 1.96), s"$t cut")
      if (vg > 0.0) anyVar = true
    }
    assert(anyVar, "zero Gehan variance everywhere — vacuous")
  }

  test("q282: GD trajectory + held-out apply equal a BigInt replay; " +
    "train loss descends; the filter beats the majority class") {
    import graft.operators.QualityQueries.{LrIters, LrRateNum}
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def md5h(id: Long): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(h.substring(0, 3), 16) % 10
    }
    // (source, h, y, x0..x3) — the exact integer feature view
    val feats = docs.flatMap { case (id, src, text) =>
      val ws = text.trim.split("\\s+").filter(_.nonEmpty)
      val wc = ws.length.toLong
      if (wc == 0) None else {
        val dist = ws.distinct.length.toLong
        val tokchars = ws.map(_.length.toLong).sum
        val y = if (wc >= graft.operators.QualityQueries.FcMinTokens &&
          dist * 2 >= wc) 1L else 0L
        val x1 = (math.min(1000000L, wc * 2000L) - 100000L) * 2L
        val x2 = (dist * 1000000L / wc - 500000L) * 5L
        val x3 = (math.min(1000000L,
          tokchars * 1000000L / (wc * 16L)) - 280000L) * 10L
        Some((src, md5h(id), y, Array(1000000L, x1, x2, x3)))
      }
    }
    val trn = feats.filter(_._2 < 8)
    val ho = feats.filter(_._2 >= 8)
    val n = trn.length.toLong
    val den = BigInt(1000000L) * n
    def sig(znum: BigInt): Long = {
      val z = znum.toDouble / 1.0E15
      val s = 1.0 / (1.0 + math.exp(-z))
      (BigDecimal(s).setScale(9, BigDecimal.RoundingMode.HALF_UP) *
        BigDecimal(1000000000L)).toLongExact
    }
    var w = Array.fill(4)(0L)
    val losses = scala.collection.mutable.ListBuffer.empty[Double]
    def trainLoss(): Double = dsum6(trn.toSeq.map { case (_, _, y, x) =>
      val znum = x.indices.map(i => BigInt(w(i)) * x(i)).sum
      val s = sig(znum).toDouble / 1.0e9
      // clamp: the rounded sigmoid can reach exactly 0/1 ppb
      val sc = math.min(1.0 - 1e-10, math.max(1e-10, s))
      -(y * math.log(sc) + (1 - y) * math.log(1.0 - sc))
    }) / n.toDouble
    losses += trainLoss()
    for (_ <- 1 to LrIters) {
      val g = Array.fill(4)(BigInt(0))
      trn.foreach { case (_, _, y, x) =>
        val znum = x.indices.map(i => BigInt(w(i)) * x(i)).sum
        val r = BigInt(sig(znum) - y * 1000000000L)
        x.indices.foreach(i => g(i) += r * x(i))
      }
      w = w.indices.map { i =>
        val gi = g(i) * LrRateNum
        val d = if (gi.signum >= 0) gi / den else -((-gi) / den)
        (BigInt(w(i)) - d).toLong
      }.toArray
      losses += trainLoss()
    }
    // the same trajectory the registered query trains (StageCache key)
    val spark2 = graft.operators.QualityQueries
    val traj = spark2.trainLogReg(
      spark2.lrFeatures(Tables.documents(spark, sf))
        .filter(col("h") < 8), n)
    assert(traj.length == LrIters)
    assert(traj.last.toSeq == w.toSeq,
      s"final weights ${traj.last.toSeq} != replay ${w.toSeq}")
    // held-out apply replay == the registered output
    val got = rows("q282_learned_filter").map(r => r.getString(0) -> r).toMap
    assert(got.keySet == ho.map(_._1).toSet)
    ho.groupBy(_._1).foreach { case (src, xs) =>
      val stats = xs.map { case (_, _, y, x) =>
        val znum = x.indices.map(i => BigInt(w(i)) * x(i)).sum
        (y, znum.signum >= 0, sig(znum))
      }
      val r = got(src)
      assert(r.getLong(1) == xs.length.toLong, s"$src n_docs")
      assert(r.getLong(2) == stats.count(_._2).toLong, s"$src n_pred_pass")
      assert(r.getLong(3) == stats.map(_._1).sum, s"$src n_label_pass")
      assert(r.getLong(4) ==
        stats.count(t => t._2 == (t._1 == 1L)).toLong, s"$src n_correct")
      assert(r.getLong(5) ==
        (stats.map(t => BigInt(t._3)).sum / xs.length).toLong,
        s"$src mean_prob_ppb")
    }
    // non-vacuity: GD actually descends, learns nonzero structure,
    // predicts BOTH classes held-out, and beats the majority class
    assert(losses.toSeq.sliding(2).forall(p => p(1) < p(0)),
      s"train loss not monotone: $losses")
    assert(w.exists(_ != 0L), "all-zero weights — GD vacuous")
    val preds = ho.map { case (_, _, y, x) =>
      (y, x.indices.map(i => BigInt(w(i)) * x(i)).sum.signum >= 0)
    }
    assert(preds.exists(_._2) && preds.exists(!_._2),
      "single-class predictor — the sign test is vacuous")
    val acc = preds.count(p => p._2 == (p._1 == 1L)).toDouble / preds.length
    val maj = math.max(preds.count(_._1 == 1L), preds.count(_._1 == 0L))
      .toDouble / preds.length
    assert(acc >= maj,
      s"held-out accuracy $acc below the majority baseline $maj")
  }
}
