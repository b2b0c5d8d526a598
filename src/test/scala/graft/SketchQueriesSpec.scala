package graft

import org.apache.spark.sql.functions._

/** q134–q136 — the sketch family (Bloom decontamination, Count-Min
  * heavy hitters, priority sampling). The DuckDB oracles prove
  * cross-engine equality; these specs re-derive each sketch driver-side
  * from the raw table (own md5, own counters, own priorities — never
  * the operator's building blocks) and pin the sketch-theoretic
  * guarantees the hash compare can't express: one-sidedness of the
  * Bloom and CMS error, and the exact τ/HT-weight structure of the
  * priority sample.
  */
class SketchQueriesSpec extends SparkTestBase {

  private def md5Hex(sv: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(sv.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hexSlice(h: String, offset1: Int, width: Int): Long =
    java.lang.Long.parseLong(h.substring(offset1 - 1, offset1 - 1 + width), 16)

  private def docs: Array[(Long, String, String, Long)] =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  private def trigrams(text: String): Set[String] = {
    val ts = text.trim.split("\\s+")
    if (ts.length < 3) Set.empty
    else ts.sliding(3).map(_.mkString(" ")).toSet
  }

  test("q134: bloom flags equal a driver-side filter replay; error is one-sided") {
    val all = docs
    val bench = all.filter(_._1 % 97 == 0).flatMap(d => trigrams(d._3)).toSet
    val bits = bench.flatMap { g =>
      val h = md5Hex(g); Seq(1, 9, 17).map(o => hexSlice(h, o, 4))
    }
    val expected = all.filter(_._1 % 97 != 0)
      .map { case (id, lang, text, _) =>
        val gs = trigrams(text)
        val bloomG = gs.count { g =>
          val h = md5Hex(g); Seq(1, 9, 17).forall(o => bits(hexSlice(h, o, 4)))
        }
        val exactG = gs.count(bench)
        (lang, bloomG.toLong, exactG.toLong)
      }
      .groupBy(_._1)
      .map { case (lang, rows) =>
        lang -> (rows.length.toLong,
          rows.count(_._2 > 0).toLong, rows.count(_._3 > 0).toLong,
          rows.map(_._2).sum, rows.map(_._3).sum)
      }
    val got = SparkEntry.queries("q134_bloom_decontam")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got === expected)
    // no false negatives, ever: every exact hit is a bloom hit
    got.values.foreach { case (_, bloomDocs, exactDocs, bloomGrams, exactGrams) =>
      assert(bloomDocs >= exactDocs)
      assert(bloomGrams >= exactGrams)
    }
  }

  test("q135: CMS estimates equal a driver-side sketch replay; error is one-sided") {
    val exact = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach(_._3.trim.split("\\s+").filter(_.nonEmpty)
      .foreach(t => exact(t) += 1L))
    val counters = scala.collection.mutable.Map.empty[(Int, Long), Long].withDefaultValue(0L)
    exact.foreach { case (tok, cnt) =>
      val h = md5Hex(tok)
      Seq(1, 9, 17).zipWithIndex.foreach { case (o, r) =>
        counters((r, hexSlice(h, o, 3))) += cnt
      }
    }
    val est = exact.map { case (tok, cnt) =>
      val h = md5Hex(tok)
      val e = Seq(1, 9, 17).zipWithIndex
        .map { case (o, r) => counters((r, hexSlice(h, o, 3))) }.min
      (tok, e, cnt)
    }.toSeq
    val expected = est.sortBy { case (tok, e, _) => (-e, tok) }.take(20)
    val got = SparkEntry.queries("q135_cms_heavy")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    got.foreach { case (_, cmsEst, exactCnt) => assert(cmsEst >= exactCnt) }
    // the heaviest exact token cannot be displaced from the top-20
    val maxExact = est.maxBy { case (tok, _, cnt) => (cnt, tok) }
    assert(got.exists(_._1 == maxExact._1))
  }

  test("q139: ground truth matches a driver-side Jaccard sweep; metrics are consistent") {
    val sampled = docs.filter { case (id, _, _, _) =>
      Integer.parseInt(md5Hex(id.toString).substring(0, 2), 16) <
        operators.TextQueries.DedupEvalBuckets
    }
    // independent shingle-hash sets (own fnv1a-free path: the exported
    // hash space only matters for collisions, so the driver truth uses
    // the STRING sets — equality of counts proves the hash table
    // collision-free on this corpus)
    def shingles(text: String): Seq[String] = {
      val ts = text.trim.split("\\s+")
      if (ts.length < 3) Seq(ts.mkString(" "))
      else ts.sliding(3).map(_.mkString(" ")).toSeq.distinct
    }
    val sets = sampled.map { case (id, _, text, _) => id -> shingles(text).toSet }
    var nTruth = 0L
    for (i <- sets.indices; j <- (i + 1) until sets.length) {
      val (ia, sa) = sets(i); val (ib, sb) = sets(j)
      val inter = (sa & sb).size
      if (inter > 0) {
        val jac = BigDecimal(inter.toDouble / (sa.size + sb.size - inter))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (jac >= operators.ApproxOracle.MinJaccard) nTruth += 1
      }
    }
    val r = SparkEntry.queries("q139_dedup_eval")(spark, sf).collect().head
    val (gotTruth, gotCand, gotHit) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(gotTruth == nTruth, s"truth pairs: got $gotTruth, expected $nTruth")
    assert(gotHit <= math.min(gotCand, gotTruth))
    val expPrec = if (gotCand > 0) gotHit.toDouble / gotCand else 1.0
    val expRec = if (gotTruth > 0) gotHit.toDouble / gotTruth else 1.0
    assert(r.getDouble(3) === expPrec && r.getDouble(4) === expRec)
  }

  test("q140: streaming CMS heavy hitters equal the one-shot batch q135") {
    val batch = SparkEntry.queries("q135_cms_heavy")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val stream = SparkEntry.queries("q140_stream_heavy")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stream == batch, "stream != batch")
  }

  test("q136: sample, tau, and HT weights equal a driver-side replay") {
    val pri = docs.map { case (id, lang, _, w) =>
      val u = hexSlice(md5Hex(id.toString), 1, 10) + 1
      (lang, id, w, w.toDouble / u.toDouble)
    }
    val expected = pri.groupBy(_._1).iterator.flatMap { case (lang, rows) =>
      val ordered = rows.sortBy { case (_, id, _, p) => (-p, id) }
      val tau = if (ordered.length > operators.SketchQueries.PsK)
        ordered(operators.SketchQueries.PsK)._4 else 0.0
      ordered.take(operators.SketchQueries.PsK).zipWithIndex.map {
        case ((_, id, w, _), i) =>
          (lang, (i + 1).toLong, id, w, math.max(w.toDouble, tau), tau)
      }
    }.toSet
    val got = SparkEntry.queries("q136_priority_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSet
    assert(got === expected)
    got.foreach { case (_, rn, _, w, htW, tau) =>
      assert(rn >= 1 && rn <= operators.SketchQueries.PsK)
      assert(htW >= w.toDouble)
      assert(htW === math.max(w.toDouble, tau))
    }
  }

  /** Driver-side HLL register replay from the raw documents. */
  private def hllReplay: Map[String, (Long, Long, Double, Long)] = {
    import operators.SketchQueries.{HllM, HllScale, HllNumerator}
    val toks = docs.flatMap { case (_, lang, text, _) =>
      text.trim.split("\\s+").filter(_.nonEmpty).map(t => (lang, t))
    }
    val regs = scala.collection.mutable.Map.empty[(String, Long), Int]
      .withDefaultValue(0)
    toks.foreach { case (lang, t) =>
      val h = md5Hex(t)
      val b = hexSlice(h, 1, 1)
      val x = hexSlice(h, 2, 8)
      val rho = if (x == 0) 33
        else 33 - java.lang.Long.toBinaryString(x).length
      if (rho > regs((lang, b))) regs((lang, b)) = rho
    }
    toks.map(_._1).distinct.map { lang =>
      val ms = (0L until HllM.toLong).map(b => regs((lang, b)))
      val s = ms.map(m => 1L << (HllScale - m)).sum
      val zeros = ms.count(_ == 0).toLong
      val exact = toks.collect { case (l, t) if l == lang => t }.distinct.size
      lang -> ((zeros, s, HllNumerator / s.toDouble, exact.toLong))
    }.toMap
  }

  test("q145: HLL registers, harmonic sum and estimate equal a driver replay; estimate is sane") {
    val want = hllReplay
    val got = SparkEntry.queries("q145_hll_distinct")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5)))).toMap
    assert(got.keySet == want.keySet, s"lang sets differ: $got")
    got.foreach { case (lang, (zeros, s, est, exact)) =>
      val (wz, ws, we, wx) = want(lang)
      assert(zeros == wz && s == ws && exact == wx, s"$lang integers differ")
      assert(est == we, s"$lang estimate differs: $est vs $we")
      // m=16 gives σ ≈ 26%; everything is deterministic, so this band
      // is a structure check, not a flake risk
      assert(est > 0.3 * exact && est < 3.0 * exact,
        s"$lang estimate $est far from exact $exact")
    }
  }

  test("q231: lattice HLL equals a driver replay at every level; coarse = max of fine") {
    import operators.SketchQueries.{HllM, HllScale, HllNumerator}
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val ev = Tables.events(spark, sf)
      .select(col("event_type"),
        ((expr("unix_micros(ts) DIV 86400000000") + 4) % 7).as("dow"),
        col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def regsOf(users: Seq[Long]): Array[Int] = {
      val m = Array.fill(HllM)(0)
      users.foreach { u =>
        val h = md5hex(u.toString)
        val b = Integer.parseInt(h.substring(0, 1), 16)
        val x = java.lang.Long.parseLong(h.substring(1, 9), 16)
        val rho = if (x == 0) 33 else 33 - java.lang.Long.toBinaryString(x).length
        if (rho > m(b)) m(b) = rho
      }
      m
    }
    def estOf(m: Array[Int]): (Long, Double) = {
      val s = m.map(r => math.pow(2.0, (HllScale - r).toDouble).toLong).sum
      (s, HllNumerator / s.toDouble)
    }
    val got = SparkEntry.queries("q231_hll_rollup")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    val levels: Seq[((String, Long), Seq[Long])] =
      ev.groupBy(e => (e._1, e._2)).view.mapValues(_.map(_._3).toSeq).toSeq ++
      ev.groupBy(_._1).map { case (t, xs) => (t, -1L) -> xs.map(_._3).toSeq } ++
      Seq(("ALL", -1L) -> ev.map(_._3).toSeq)
    assert(got.keySet == levels.map(_._1).toSet, "level universe differs")
    levels.foreach { case (key, users) =>
      val (s, e) = estOf(regsOf(users))
      val (gs, ge, gx) = got(key)
      assert(gs == s && ge == e, s"$key sketch differs: ($gs,$ge) != ($s,$e)")
      assert(gx == users.distinct.size.toLong, s"$key exact")
    }
    // the lattice identity itself: the ALL row's registers are the
    // max-merge of the per-type registers — same s_scaled either way
    val types = ev.map(_._1).distinct
    val merged = types.map(t => regsOf(ev.filter(_._1 == t).map(_._3)))
      .transpose.map(_.max).toArray
    assert(estOf(merged)._1 == got(("ALL", -1L))._1,
      "coarse registers are not the max of fine registers")
  }

  test("q146: streaming HLL equals the one-shot batch q145 (sketch columns)") {
    val batch = SparkEntry.queries("q145_hll_distinct")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    val stream = SparkEntry.queries("q146_stream_hll")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(stream == batch, "stream != batch")
  }

  test("q147: quantile bins bracket the true percentile and match a driver histogram replay") {
    import operators.SketchQueries.{HistBins, HistPs}
    val byLang = docs.groupBy(_._2).view.mapValues(_.map(_._4).sorted).toMap
    val all = docs.map(_._4)
    val (lo, hi) = (all.min, all.max)
    val w = (hi - lo) / HistBins + 1
    val rows = SparkEntry.queries("q147_hist_quantiles")(spark, sf).collect()
    assert(rows.length == byLang.size * HistPs.size, "one row per (lang, p)")
    rows.foreach { r =>
      val (lang, p, qbin) = (r.getString(0), r.getLong(1), r.getLong(2))
      val (binLo, binHi) = (r.getLong(3), r.getLong(4))
      val (cumLe, nDocs) = (r.getLong(5), r.getLong(6))
      val vals = byLang(lang)
      assert(nDocs == vals.length, s"$lang n_docs")
      assert(binLo == lo + qbin * w && binHi == lo + (qbin + 1) * w - 1,
        s"$lang bin bounds")
      // driver replay of the histogram rule
      val bins = vals.map(v => (v - lo) / w)
      val wantBin = bins.distinct.sorted.find(b =>
        bins.count(_ <= b).toLong * 100 >= p * vals.length).get
      assert(qbin == wantBin, s"$lang p$p bin $qbin != $wantBin")
      assert(cumLe == bins.count(_ <= qbin), s"$lang p$p cum")
      // the true percentile_disc value falls inside the bracket
      val idx = math.ceil(p * vals.length / 100.0).toInt - 1
      val truePv = vals(math.max(0, idx))
      assert(truePv >= binLo && truePv <= binHi,
        s"$lang p$p: true $truePv outside [$binLo, $binHi]")
    }
  }

  test("q153: streamed log-bin quantiles equal a driver replay; brackets hold") {
    import operators.SketchQueries.HistPs
    def log2(v: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(v)
    val byLang = docs.groupBy(_._2).view.mapValues(_.map(_._4).sorted).toMap
    val rows = SparkEntry.queries("q153_stream_quantiles")(spark, sf).collect()
    assert(rows.length == byLang.size * HistPs.size, "one row per (lang, p)")
    rows.foreach { r =>
      val (lang, p, qb) = (r.getString(0), r.getLong(1), r.getLong(2))
      val (binLo, binHi) = (r.getLong(3), r.getLong(4))
      val (cumLe, nDocs) = (r.getLong(5), r.getLong(6))
      val vals = byLang(lang)
      assert(nDocs == vals.length, s"$lang n_docs")
      assert(binLo == (1L << qb) && binHi == (1L << (qb + 1)) - 1,
        s"$lang bin bounds")
      // driver replay of the absolute-grid rule — the stream answer
      // must equal the one-shot batch answer (mergeability by algebra)
      val bins = vals.map(log2)
      val wantBin = bins.distinct.sorted.find(b =>
        bins.count(_ <= b).toLong * 100 >= p * vals.length).get
      assert(qb == wantBin, s"$lang p$p bin $qb != $wantBin")
      assert(cumLe == bins.count(_ <= qb), s"$lang p$p cum")
      val idx = math.ceil(p * vals.length / 100.0).toInt - 1
      val truePv = vals(math.max(0, idx))
      assert(truePv >= binLo && truePv <= binHi,
        s"$lang p$p: true $truePv outside [$binLo, $binHi]")
    }
    // the grid is non-degenerate on this corpus: more than one bin seen
    assert(docs.map(d => log2(d._4)).distinct.length > 1,
      "all docs fell in one log bin — grid untested")
  }

  test("q154: KMV pair sketches equal a driver replay; estimates bracket truth") {
    import operators.SketchQueries.{KmvK, KmvSpace}
    def h48(g: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 12), 16)
    }
    // per-source distinct trigram hash sets from the raw strings
    val srcRows = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val gsets = srcRows.groupBy(_._1).view.mapValues { rows =>
      rows.flatMap { case (_, t) =>
        val ts = t.trim.split("\\s+")
        if (ts.length >= 3) ts.sliding(3).map(_.mkString(" ")) else Iterator.empty
      }.map(h48).toSet
    }.toMap
    val sketches = gsets.view.mapValues(_.toSeq.sorted.take(KmvK).toSet).toMap
    val want = (for {
      s1 <- gsets.keys; s2 <- gsets.keys if s1 < s2
    } yield {
      val cut = (sketches(s1) ++ sketches(s2)).toSeq.sorted.take(KmvK)
      val nK = cut.length.toLong
      val kth = cut.max
      val nCommon = cut.count(v => sketches(s1)(v) && sketches(s2)(v)).toLong
      (s1, s2, nK, kth, nCommon,
        ((nK - 1) * KmvSpace).toDouble / kth, nCommon.toDouble / nK)
    }).toSet
    val got = SparkEntry.queries("q154_kmv_overlap")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSet
    assert(got == want,
      s"pair sketches differ: extra=${(got -- want).take(2)} " +
        s"missing=${(want -- got).take(2)}")
    // the estimator is non-vacuous and sane on this corpus: some pair
    // shares sketch values, and every union estimate is within 5σ
    // (σ ≈ true/√k, Beyer et al. 2007) of the exact distinct union
    assert(got.exists(_._5 > 0), "no pair shares a sketch value")
    got.foreach { case (s1, s2, _, _, _, uEst, _) =>
      val exact = (gsets(s1) ++ gsets(s2)).size.toDouble
      assert(math.abs(uEst - exact) <= 5.0 * exact / math.sqrt(KmvK.toDouble),
        s"($s1,$s2) union_est $uEst vs exact $exact out of 5-sigma")
    }
  }

  test("q212: cumulative HLL curve equals a driver prefix-max replay; estimate grows with the curve") {
    import operators.SketchQueries.{HllM, HllScale, HllNumerator}
    val dayUs = 86400000000L
    val evs = Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("ts")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getTimestamp(2).getTime * 1000 / dayUs))
    val (d0, d1) = (evs.map(_._3).min, evs.map(_._3).max)
    val types = evs.map(_._1).distinct
    // daily registers, then the prefix max per (type, b)
    val daily = scala.collection.mutable
      .Map.empty[(String, Long, Long), Int].withDefaultValue(0)
    evs.distinct.foreach { case (t, u, day) =>
      val h = md5Hex(u.toString)
      val b = hexSlice(h, 1, 1)
      val x = hexSlice(h, 2, 8)
      val rho = if (x == 0) 33
        else 33 - java.lang.Long.toBinaryString(x).length
      if (rho > daily((t, day, b))) daily((t, day, b)) = rho
    }
    val want = (for { t <- types; day <- d0 to d1 } yield {
      val cms = (0L until HllM.toLong).map(b =>
        (d0 to day).map(dd => daily((t, dd, b))).max)
      val s = cms.map(m => 1L << (HllScale - m)).sum
      val zeros = cms.count(_ == 0).toLong
      val est = HllNumerator / s.toDouble
      val cum = evs.filter(e => e._1 == t && e._3 <= day)
        .map(_._2).distinct.length.toLong
      val err = if (cum == 0) -1L
        else math.floor(math.abs(est / cum - 1.0) * 1000000).toLong
      (t, day) -> ((zeros, s, est, cum, err))
    }).toMap
    val got = SparkEntry.queries("q212_hll_curve")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == want,
      s"first diff: ${(got.toSet -- want.toSet).take(2)} vs " +
        s"${(want.toSet -- got.toSet).take(2)}")
    // registers only grow → s_scaled non-increasing → est non-decreasing
    types.foreach { t =>
      val curve = (d0 to d1).map(day => got((t, day)))
      assert(curve.map(_._2).zip(curve.tail.map(_._2))
        .forall { case (a, b) => a >= b }, s"$t: harmonic mass grew")
      assert(curve.map(_._3).zip(curve.tail.map(_._3))
        .forall { case (a, b) => a <= b }, s"$t: estimate shrank")
      val (_, _, est, cum, _) = curve.last
      assert(est > 0.3 * cum && est < 3.0 * cum,
        s"$t: final estimate $est far from exact $cum")
    }
  }

  test("q159: AMS counters equal a driver replay; sketch is addition-mergeable; estimate brackets F2") {
    import operators.SketchQueries.AmsCounters
    def sign(j: Int, u: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j:$u".getBytes("UTF-8")).map("%02x".format(_)).mkString
      1L - 2L * ((h.charAt(11) match {
        case c if c <= '9' => c - '0'
        case c             => c - 'a' + 10
      }) % 2)
    }
    val counts = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val f2 = counts.map { case (_, c) => BigInt(c) * BigInt(c) }.sum
    val ctrs = (1 to AmsCounters).map(j =>
      j.toLong -> counts.map { case (u, c) => sign(j, u) * c }.sum).toMap
    val est = ctrs.values.map(v => BigInt(v) * BigInt(v)).sum.toDouble /
      AmsCounters
    val got = SparkEntry.queries("q159_ams_f2")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))
    assert(got.length == AmsCounters)
    got.foreach { case (j, counter, x2, f2Est, f2Exact, nKeys) =>
      assert(counter == ctrs(j), s"counter $j: $counter != ${ctrs(j)}")
      assert(x2 == (BigInt(counter) * BigInt(counter)).toDouble)
      assert(f2Est == est && f2Exact == f2.toDouble &&
        nKeys == counts.length.toLong)
    }
    // addition-mergeability — the property that makes the sketch
    // shard- and stream-safe: counters built on two disjoint halves
    // of the key space sum to the whole-corpus counters
    val (loHalf, hiHalf) = counts.partition(_._1 % 2 == 0)
    (1 to AmsCounters).foreach { j =>
      val lo = loHalf.map { case (u, c) => sign(j, u) * c }.sum
      val hi = hiHalf.map { case (u, c) => sign(j, u) * c }.sum
      assert(lo + hi == ctrs(j), s"counter $j not addition-mergeable")
    }
    // estimator sanity: Var = 2(F2² − F4)/S ≤ 2F2²/S, so 5σ with
    // σ = F2·√(2/S) brackets truth generously
    assert(math.abs(est - f2.toDouble) <=
        5.0 * f2.toDouble * math.sqrt(2.0 / AmsCounters),
      s"AMS estimate $est vs exact $f2 out of 5-sigma")
  }
}
