package graft

import org.apache.spark.sql.functions._

/** q183–q193 — the round-10 audit/analytics additions (Benford,
  * MAD outliers, Cohen's kappa, calibration/ECE, χ² feature selection,
  * seasonality, burstiness, windowed funnel). The DuckDB oracles prove
  * cross-engine equality; these specs pin semantics the hash compare
  * can't express, via independent driver-side recomputation from the
  * raw tables (never via the operator's own building blocks).
  */
class AuditFamilySpec extends SparkTestBase {

  private def md5Bucket(id: Long): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    Integer.parseInt(h.substring(0, 2), 16)
  }

  private def events: Array[(Long, Long, Long, String, Double)] =
    Tables.events(spark, sf)
      .select(col("event_id"), expr("unix_micros(ts)"), col("user_id"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))

  private def docs: Array[(Long, String, String, Long)] =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("q183: digit shares equal a driver recount; constants are a Benford pmf") {
    // the interpolated table must actually BE Benford's law
    val ppm = graft.operators.RelationalQueries.BenfordPpm.toMap
    assert(ppm.keySet == (1 to 9).toSet && ppm.values.sum > 999990 &&
      ppm.values.sum <= 1000000, s"not a pmf: $ppm")
    assert((1 to 8).forall(d => ppm(d) > ppm(d + 1)), "must decrease in d")
    val digits = events.map { case (_, _, _, _, v) =>
      math.floor(v * 100).toLong.toString.substring(0, 1).toInt }
    val n = digits.length.toLong
    val got = SparkEntry.queries("q183_benford")(spark, sf).collect()
      .map(r => r.getLong(0).toInt ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(6)))).toMap
    assert(got.keySet == (1 to 9).toSet, "one row per digit 1..9")
    (1 to 9).foreach { d =>
      val nd = digits.count(_ == d).toLong
      val (gn, gobs, gflag) = got(d)
      assert(gn == nd, s"digit $d count $gn != $nd")
      assert(gobs == nd * 1000000L / n, s"digit $d obs ppm")
      assert(gflag == (math.abs(nd * 1000000L / n - ppm(d)) >=
        graft.operators.RelationalQueries.BenfordTolPpm), s"digit $d flag")
    }
    assert(got.values.exists(_._3) && got.values.exists(!_._3),
      "both flag branches must be populated")
  }

  test("q188: dow profile equals a driver recount under arithmetic dow") {
    val cells = events.groupBy { case (_, us, _, tpe, _) =>
      (tpe, ((us / 86400000000L + 4) % 7)) }.map { case (k, v) => k -> v.size.toLong }
    val byType = events.groupBy(_._4).map { case (k, v) => k -> v.size.toLong }
    val got = SparkEntry.queries("q188_seasonality")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(6)))).toMap
    assert(got.keySet == byType.keySet.flatMap(t => (0L to 6L).map(t -> _)),
      "explicit type x dow grid")
    got.foreach { case ((tpe, dow), (gn, gtot, gflag)) =>
      val n = cells.getOrElse((tpe, dow), 0L)
      assert(gn == n && gtot == byType(tpe), s"cell ($tpe, $dow)")
      assert(gflag == (math.abs(n * 7 - byType(tpe)) * 5 >= byType(tpe)),
        s"flag ($tpe, $dow)")
    }
    assert(got.values.exists(_._3) && got.values.exists(!_._3),
      "both flag branches must be populated")
  }

  test("q189: CV² masses equal an exact driver replay; Poisson-ish data sits near 10⁶") {
    val byUser = events.groupBy(_._3).map { case (u, es) =>
      u -> es.sortBy(e => (e._2, e._1)).map(_._2) }
    val want = byUser.flatMap { case (u, ts) =>
      val gaps = ts.sliding(2).collect { case Array(a, b) => b - a }.toArray
      val sg = gaps.sum
      if (gaps.length >= 2 && sg > 0) {
        val n = BigInt(gaps.length)
        val sg2 = gaps.map(g => BigInt(g) * BigInt(g)).sum
        val num = (n * sg2 - BigInt(sg) * BigInt(sg)) * 1000000
        Some(u -> (num / (BigInt(sg) * BigInt(sg))).toLong)
      } else None
    }
    val got = SparkEntry.queries("q189_burstiness")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getString(4)))).toMap
    assert(got.keySet == want.keySet, "gated user set")
    want.foreach { case (u, cv2) =>
      assert(got(u)._1 == cv2, s"user $u cv2 ${got(u)._1} != $cv2")
      assert(cv2 >= 0, "Cauchy-Schwarz keeps the mass non-negative")
      val lbl = got(u)._2
      assert(lbl == (if (cv2 > 1500000L) "bursty"
        else if (cv2 < 700000L) "regular" else "poissonish"), s"user $u label")
    }
    // synthetic arrivals are near-Poisson: the median mass should sit
    // in the poissonish band, with at least one user outside it
    val masses = want.values.toSeq.sorted
    assert(masses(masses.size / 2) > 400000L && masses(masses.size / 2) < 2500000L,
      s"median CV² mass ${masses(masses.size / 2)} implausible for event data")
  }

  test("q193: windowed funnel equals a driver replay and never outranks q112") {
    val W = graft.operators.RelationalQueries.FunnelWindowUs
    val byUser = events.groupBy(_._3)
    val want = byUser.map { case (u, es) =>
      val views = es.filter(_._4 == "view").map(_._2)
      val tView = if (views.isEmpty) None else Some(views.min)
      val tClick = tView.flatMap { tv =>
        val cs = es.filter(e => e._4 == "click" && e._2 >= tv && e._2 <= tv + W)
          .map(_._2)
        if (cs.isEmpty) None else Some(cs.min)
      }
      val tPurch = tClick.flatMap { tc =>
        val ps = es.filter(e => e._4 == "purchase" && e._2 >= tc && e._2 <= tc + W)
          .map(_._2)
        if (ps.isEmpty) None else Some(ps.min)
      }
      u -> ((tView, tClick, tPurch))
    }
    val got = SparkEntry.queries("q193_windowed_funnel")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(got.keySet == byUser.keySet, "one row per user")
    want.foreach { case (u, (tv, tc, tp)) =>
      val (stage, gv, gc, gp) = got(u)
      assert((gv, gc, gp) == ((tv, tc, tp)), s"user $u chain")
      assert(stage == Seq(tv, tc, tp).count(_.isDefined).toLong, s"user $u stage")
    }
    val unbounded = SparkEntry.queries("q112_funnel")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (u, (stage, _, _, _)) =>
      assert(stage <= unbounded(u),
        s"user $u: a bounded funnel can only drop stages, never add them")
    }
    assert(got.values.exists(_._1 == 3L),
      "somebody must still convert inside the window")
    assert(got.exists { case (u, (st, _, _, _)) => st < unbounded(u) },
      "the window must actually drop someone q112 converts")
  }

  test("q184: binned median/MAD and the outlier count equal a driver replay") {
    val byType = events.groupBy(_._4).map { case (t, es) => t -> es.map(_._5) }
    val got = SparkEntry.queries("q184_mad_outliers")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))).toMap
    assert(got.keySet == byType.keySet, "one row per event_type")
    byType.foreach { case (t, vs) =>
      val (lo, hi, n) = (vs.min, vs.max, vs.length.toLong)
      def bin(v: Double, l: Double, h: Double): Long =
        if (h == l) 0L
        else math.min(255L, math.max(0L, math.floor((v - l) / (h - l) * 256).toLong))
      def medBin(bs: Seq[Long]): Long = {
        val cnt = bs.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val sorted = cnt.keys.toSeq.sorted
        var cum = 0L
        sorted.find { b => cum += cnt(b); cum * 2 >= n }.get
      }
      val mb = medBin(vs.map(bin(_, lo, hi)).toSeq)
      val med = lo + (mb.toDouble + 0.5) * (hi - lo) / 256.0
      val maxDev = math.max(hi - med, med - lo)
      val devs = vs.map(v => math.abs(v - med))
      val madB = medBin(devs.map(bin(_, 0.0, maxDev)).toSeq)
      val mad = (madB.toDouble + 0.5) * maxDev / 256.0
      val nOut = devs.count(_ > mad * 3).toLong
      val (gn, gmed, gmad, gout) = got(t)
      assert(gn == n && gmed == med && gmad == mad && gout == nOut,
        s"$t: got ($gn, $gmed, $gmad, $gout) want ($n, $med, $mad, $nOut)")
      assert(nOut > 0 && nOut * 4 < n,
        s"$t: outlier gate must flag some and pass most ($nOut of $n)")
    }
  }

  test("q185: kappa equals an exact driver replay; annotators genuinely disagree") {
    val rows = docs.map { case (_, src, text, nChars) =>
      val ts = text.trim.split("\\s+")
      (src, if (nChars >= 300) 1L else 0L,
        if (ts.distinct.length.toLong * 1000000L >= ts.length.toLong * 460000L) 1L
        else 0L)
    }
    val got = SparkEntry.queries("q185_kappa")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    val bySrc = rows.groupBy(_._1)
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (src, rs) =>
      val n = rs.length.toLong
      val a1 = rs.map(_._2).sum; val b1 = rs.map(_._3).sum
      val agree = rs.count(r => r._2 == r._3).toLong
      val chance = BigInt(a1) * b1 + BigInt(n - a1) * (n - b1)
      val den = BigInt(n) * n - chance
      val kappa =
        if (den == 0) 0.0
        else (BigInt(n) * agree - chance).toDouble / den.toDouble
      val (gn, ga, gb, gagree, gk) = got(src)
      assert((gn, ga, gb, gagree) == ((n, a1, b1, agree)), s"$src marginals")
      assert(gk == kappa, s"$src kappa $gk != $kappa")
    }
    val disagreements = rows.count(r => r._2 != r._3)
    assert(disagreements > 0 && disagreements < rows.length,
      "the two annotators must both agree and disagree somewhere")
  }

  test("q186: gap masses and the ECE equal an exact driver replay") {
    val scored = docs.map { case (_, _, text, nChars) =>
      val ts = text.trim.split("\\s+")
      (ts.distinct.length.toLong * 1000000L / ts.length,
        if (nChars >= 300) 1L else 0L)
    }
    val byBin = scored.groupBy { case (c, _) => math.min(9L, c * 10 / 1000000L) }
    val got = SparkEntry.queries("q186_calibration")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got.keySet == byBin.keySet)
    val gapTotal = byBin.values.map(rs =>
      math.abs(rs.map(_._1).sum - rs.map(_._2).sum * 1000000L)).sum
    byBin.foreach { case (b, rs) =>
      val (gn, ggap, gece) = got(b)
      assert(gn == rs.length.toLong, s"bin $b size")
      assert(ggap == math.abs(rs.map(_._1).sum - rs.map(_._2).sum * 1000000L),
        s"bin $b gap mass")
      assert(gece == gapTotal / scored.length, s"bin $b ece")
    }
    assert(byBin.size >= 3, "the confidence signal must spread over bins")
  }

  test("q190: canonical picks are the diversity argmax of exactly the q54 clusters") {
    val q54 = SparkEntry.queries("q54_dup_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val divPpm = docs.map { case (id, _, text, _) =>
      val ts = text.trim.split("\\s+")
      id -> ts.distinct.length.toLong * 1000000L / ts.length
    }.toMap
    val got = SparkEntry.queries("q190_canonical_docs")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == q54.keySet && got.forall { case (c, v) => v._1 == q54(c) },
      "q190 must resolve exactly the q54 cluster set")
    // the canonical member maximizes (div_ppm, -doc_id) within its
    // cluster: it can never have a LOWER diversity than the cluster's
    // reported best, and best must equal its own diversity
    got.foreach { case (comp, (nMembers, canon, best, dropped)) =>
      assert(divPpm(canon) == best, s"cluster $comp: canonical not the argmax")
      assert(dropped == nMembers - 1, s"cluster $comp: dropped count")
    }
    // the content-aware rule must actually differ from q54's length
    // rule somewhere, else the operator is a rename
    val q54keep = SparkEntry.queries("q54_dup_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.exists { case (c, (_, canon, _, _)) => canon != q54keep(c) },
      "diversity argmax never disagrees with the length argmax — vacuous")
  }

  test("q191: water-fill equals a driver replay; budget exactly exhausted up to floor") {
    val avail = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (l, rs) =>
        l -> rs.map(_._2.trim.split("\\s+").length.toLong).sum }
    val total = avail.values.sum
    val b = total * 4 / 5
    val k = avail.size.toLong
    val asc = avail.toSeq.sortBy { case (l, a) => (a, l) }
    var sExcl = 0L; var level = Long.MaxValue; var found = false
    val want = asc.zipWithIndex.map { case ((l, a), i) =>
      val rn = i + 1L
      val sat = a * (k - rn + 1) <= b - sExcl
      if (!sat && !found) { level = (b - sExcl) / (k - rn + 1); found = true }
      sExcl += a
      l -> ((a, sat, if (sat) a else level))
    }.toMap
    val got = SparkEntry.queries("q191_token_budget")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(3), r.getLong(4)))).toMap
    assert(got == want, s"water-fill mismatch:\n$got\n$want")
    val allocSum = got.values.map(_._3).sum
    assert(allocSum <= b && b - allocSum < k,
      s"allocation $allocSum must exhaust the budget $b up to a <k floor remainder")
    assert(got.values.exists(_._2) && got.values.exists(!_._2),
      "both the saturated and level branches must be populated")
  }

  test("q192: greedy cover equals a driver replay; gains non-increasing") {
    val sets = docs.flatMap { case (id, _, text, _) =>
      val ts = text.trim.split("\\s+")
      if (ts.length < 3) None
      else Some(id -> ts.sliding(3).map(_.mkString(" ")).toSet)
    }.toMap
    var covered = Set.empty[String]; var picked = Set.empty[Long]
    val want = (1 to 5).map { r =>
      val (docId, gain) = sets.view.filterKeys(!picked(_))
        .map { case (id, s) => (id, (s -- covered).size.toLong) }
        .minBy { case (id, g) => (-g, id) }
      covered ++= sets(docId); picked += docId
      (r.toLong, docId, gain, covered.size.toLong)
    }
    val got = SparkEntry.queries("q192_set_cover")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == want, s"greedy trace:\n$got\n$want")
    assert(got.map(_._3) == got.map(_._3).sorted.reverse,
      "greedy gains must be non-increasing (submodularity)")
    assert(got.last._3 > 0, "five rounds must all find new content here")
  }

  test("q194: media clusters equal a driver union-find over the q78 pairs") {
    val pairs = SparkEntry.queries("q78_image_neardup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .groupBy(find)
    val got = SparkEntry.queries("q194_media_dup_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == members.keySet.map(k => members(k).min),
      "components keyed by min member")
    members.foreach { case (_, ms) =>
      val (n, keep) = got(ms.min)
      assert(n == ms.length.toLong && keep == ms.min,
        s"cluster ${ms.min}: ($n, $keep) vs ${ms.length}")
    }
    assert(got.nonEmpty && got.values.exists(_._1 > 1),
      "the shot-structured media corpus must contain a real dup cluster")
  }

  test("q196: sweep is monotone and its bottom rung equals the base pair set") {
    val got = SparkEntry.queries("q196_dedup_sweep")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == Set(500000L, 600000L, 700000L, 800000L, 900000L))
    val ladder = got.toSeq.sortBy(_._1)
    assert(ladder.map(_._2._1) == ladder.map(_._2._1).sorted.reverse,
      "pair counts must fall as the threshold rises")
    assert(ladder.map(_._2._2) == ladder.map(_._2._2).sorted.reverse,
      "doc counts must fall as the threshold rises")
    val base = graft.operators.MinHashLSH.verifiedPairs(
      Tables.documents(spark, sf).select(col("doc_id"), col("text")),
      graft.operators.ApproxOracle.MinJaccard).count()
    assert(got(500000L)._1 == base && got(500000L)._3 == 1.0,
      "the bottom rung IS the base threshold")
    assert(ladder.last._2._1 < base,
      "the top rung must genuinely prune at this corpus")
  }

  test("q199: a-priori trace equals a driver replay; both support verdicts populated") {
    val dayUs = 86400000000L
    val items = events.map(e => (e._3, e._2 / dayUs, e._4)).distinct
    val baskets = items.map(i => (i._1, i._2)).distinct
    val nb = baskets.size.toLong
    val pairCnt = items.groupBy(i => (i._1, i._2)).values.toSeq
      .flatMap { es =>
        val ts = es.map(_._3).distinct.sorted
        for (i <- ts.indices; j <- i + 1 until ts.length) yield (ts(i), ts(j))
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val frequentPairs = pairCnt.filter { case (_, c) => c * 19 >= nb }.keySet
    val tripleCnt = items.groupBy(i => (i._1, i._2)).values.toSeq
      .flatMap { es =>
        val ts = es.map(_._3).distinct.sorted
        for {
          i <- ts.indices; j <- i + 1 until ts.length
          k <- j + 1 until ts.length
        } yield (ts(i), ts(j), ts(k))
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val want = tripleCnt.filter { case ((x, y, z), _) =>
      frequentPairs((x, y)) && frequentPairs((x, z)) && frequentPairs((y, z))
    }.map { case (k, c) => k -> ((c, c * 19 >= nb)) }
    val got = SparkEntry.queries("q199_itemsets3")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getBoolean(5)))).toMap
    assert(got == want, s"a-priori trace:\n$got\n$want")
    assert(got.values.exists(_._2) && got.values.exists(!_._2),
      "the single-sigma gate must keep AND prune candidates here")
  }

  test("q200: PSI equals a driver replay with the decimal-rounded ln terms") {
    val scored = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map { r =>
        val ts = r.getString(1).trim.split("\\s+")
        val conf = ts.distinct.length.toLong * 1000000L / ts.length
        (r.getString(0), math.min(9L, conf * 10 / 1000000L))
      }
    val cells = scored.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val byLang = scored.groupBy(_._1).map { case (l, v) => l -> v.size.toLong }
    val byBin = scored.groupBy(_._2).map { case (b, v) => b -> v.size.toLong }
    val n = scored.size.toLong
    val want = byLang.map { case (lang, nl) =>
      // corpus-empty bins carry no distribution mass and are excluded
      // (the byBin inner join in the operator); lang-empty cells of
      // populated bins are add-one smoothed
      val psi = (0L until 10L).filter(byBin.contains).map { b =>
        val p = (cells.getOrElse((lang, b), 0L) + 1).toDouble / (nl + 10)
        val q = (byBin(b) + 1).toDouble / (n + 10)
        val lnR = BigDecimal(math.log(p / q))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        BigDecimal((p - q) * lnR)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      lang -> psi
    }
    val got = SparkEntry.queries("q200_psi_drift")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getString(3)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (lang, psi) =>
      val (gn, gpsi, gband) = got(lang)
      assert(gn == byLang(lang), s"$lang n_docs")
      assert(gpsi == psi, s"$lang psi $gpsi != $psi")
      assert(gband == (if (psi < 0.1) "stable"
        else if (psi < 0.25) "moderate" else "shifted"), s"$lang band")
    }
    assert(want.values.max > 0.0, "PSI must register SOME finite divergence")
  }

  test("q201: audit equals a driver replay; the histogram transform is imperfect but bounded") {
    val vals = events.map(e => (e._1, e._5))
    val sample = vals.filter { case (id, _) => md5Bucket(id) < 16 }
    val (lo, hi, n) = (vals.map(_._2).min, vals.map(_._2).max, vals.length.toLong)
    val binOf = (v: Double) =>
      if (hi == lo) 0L
      else math.min(255L, math.max(0L, math.floor((v - lo) / (hi - lo) * 256).toLong))
    val binCnt = vals.map(v => binOf(v._2)).groupBy(identity)
      .map { case (b, v) => b -> v.size.toLong }
    val cumBelow = (0L to 255L).map(b =>
      b -> (0L until b).map(binCnt.getOrElse(_, 0L)).sum).toMap
    val pctMass = vals.map { case (id, v) =>
      id -> cumBelow(binOf(v)) * 1000000L / n }.toMap
    val sorted = sample.sortBy(s => (s._2, s._1))
    val ns = sorted.length
    val errs = sorted.zipWithIndex.map { case ((id, _), i) =>
      i.toDouble / (ns - 1) * 1000000L - pctMass(id).toDouble }
    val meanAbs = errs.map(e =>
        BigDecimal(math.abs(e)).setScale(3, BigDecimal.RoundingMode.HALF_UP))
      .sum.setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble / ns
    val got = SparkEntry.queries("q201_discretizer_audit")(spark, sf)
      .collect()(0)
    assert(got.getLong(0) == ns.toLong, "sample size")
    assert(got.getDouble(1) == meanAbs,
      s"mean err ${got.getDouble(1)} != $meanAbs")
    assert(got.getDouble(2) == errs.map(math.abs).max, "max err")
    assert(got.getDouble(3) ==
      errs.count(e => math.abs(e) <= 60000.0).toDouble / ns, "tol share")
    assert(got.getDouble(3) > 0.0 && got.getDouble(3) < 1.0,
      "the tolerance must split the sample — an all-pass audit is vacuous")
  }

  test("q203: the dedup ledger conserves docs/tokens and matches the q54 keep rule") {
    val q54 = SparkEntry.queries("q54_dup_clusters")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val keepers = q54.map(_._3).toSet
    val clustered = SparkEntry.queries("q190_canonical_docs")(spark, sf)
      .collect().map(_.getLong(0)) // same cluster set — just the roots
    val docsBySrc = docs.groupBy(_._2)
    val got = SparkEntry.queries("q203_dedup_yield")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet == docsBySrc.keySet, "one ledger row per source")
    // conservation: total docs and kept docs reconcile with the
    // cluster table (kept = all docs − non-keeper cluster members)
    val totalDocs = got.values.map(_._1).sum
    val totalKept = got.values.map(_._2).sum
    val clusterMembers = q54.map(_._2).sum
    assert(totalDocs == docs.length.toLong)
    assert(totalKept == totalDocs - (clusterMembers - q54.length),
      s"kept $totalKept must drop exactly the non-keeper members")
    got.foreach { case (src, (nd, nk, tt, tk, typpm, dyppm)) =>
      val rows = docsBySrc(src)
      assert(nd == rows.length.toLong, s"$src n_docs")
      val toks = rows.map { case (id, _, text, _) =>
        id -> text.trim.split("\\s+").length.toLong }
      assert(tt == toks.map(_._2).sum, s"$src tokens_total")
      assert(nk <= nd && tk <= tt, s"$src kept must not exceed totals")
      assert(typpm == tk * 1000000L / tt && dyppm == nk * 1000000L / nd,
        s"$src yields")
    }
    assert(totalKept < totalDocs,
      "the ladder must actually drop documents on this corpus")
    assert(clustered.nonEmpty, "cluster set must be non-trivial")
  }

  test("q187: top-χ² tokens equal an exact driver replay per source") {
    val N = docs.length.toLong
    val dt = docs.flatMap { case (id, src, text, _) =>
      text.trim.split("\\s+").distinct.map(t => (src, id, t)) }
    val nS = docs.groupBy(_._2).map { case (s, v) => s -> v.length.toLong }
    val a = dt.groupBy(r => (r._1, r._3)).map { case (k, v) => k -> v.length.toLong }
    val dfT = dt.groupBy(_._3).map { case (t, v) => t -> v.length.toLong }
    val want = a.toSeq.flatMap { case ((src, tok), av) =>
      val df = dfT(tok); val ns = nS(src)
      if (df < 5 || av < 2) None
      else {
        val adbc = BigInt(av) * (N - ns - df + av) - BigInt(ns - av) * (df - av)
        if (adbc <= 0) None
        else Some((src, tok,
          (BigInt(N) * adbc * adbc).toDouble /
            (BigInt(ns) * (N - ns) * df * (N - df)).toDouble))
      }
    }.groupBy(_._1).map { case (src, rs) =>
      src -> rs.sortBy(r => (-r._3, r._2)).take(5).map(r => (r._2, r._3))
    }
    val got = SparkEntry.queries("q187_chi2_tokens")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(5), r.getString(1), r.getDouble(4)))
      .groupBy(_._1).map { case (src, rs) =>
        src -> rs.sortBy(_._2).map(r => (r._3, r._4)).toSeq }
    assert(got.keySet == want.keySet, "per-source answers")
    want.foreach { case (src, topk) =>
      assert(got(src) == topk, s"$src: ${got(src)} != $topk")
    }
  }
}
