package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.QualityQueries

/** q85/q86 — corpus-statistics quality weighting. The oracle proves
  * cross-engine value equality; these specs prove the properties the
  * oracle can't see: hash-key losslessness (q85 shuffles xxhash64
  * longs, never token strings), the closed feature space that makes
  * q86's profile broadcast-able, and the semantic direction of the
  * importance weights (target-language docs score above baseline).
  */
class QualityQueriesSpec extends SparkTestBase {

  private def docs = Tables.documents(spark, "/root/testdata/sf0.01")

  test("q85: hashed-key path equals the string-keyed twin (hashing lossless)") {
    val hashed = QualityQueries.rareTokenQuality(docs)
      .orderBy("doc_id").collect().toSeq
    val strings = QualityQueries.rareTokenQualityByString(docs)
      .orderBy("doc_id").collect().toSeq
    assert(hashed == strings,
      s"xxhash64 keying changed results: ${hashed.take(3)} vs ${strings.take(3)}")
  }

  test("q85: counts nest (hapax <= rare <= tokens) and fractions are exact ratios") {
    val rows = QualityQueries.rareTokenQuality(docs).collect()
    assert(rows.length == docs.count())
    rows.foreach { case Row(id: Long, n: Long, rare: Long, hapax: Long, frac: Double) =>
      assert(hapax <= rare && rare <= n, s"doc $id: $hapax/$rare/$n")
      assert(frac == rare.toDouble / n, s"doc $id: frac not the exact ratio")
    }
  }

  test("q86: feature buckets stay inside the closed [0, 4096) space") {
    val mm = QualityQueries.docFeatures(docs)
      .agg(min(col("f")), max(col("f"))).head()
    assert(mm.getLong(0) >= 0L && mm.getLong(1) < QualityQueries.NBuckets, mm.toString)
  }

  test("q86: target-language docs weigh above the non-target mean") {
    val byLang = QualityQueries.dsirWeights(docs)
      .groupBy(col("lang")).agg(avg(col("affinity")).as("a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val others = (byLang - QualityQueries.TargetLang).values
    assert(byLang(QualityQueries.TargetLang) > others.max,
      s"en should dominate every other lang mean: $byLang")
  }

  test("q86: every doc with >=2 tokens is scored, masses are positive") {
    val w = QualityQueries.dsirWeights(docs)
    val expected = docs
      .filter(size(split(trim(col("text")), "\\s+")) >= 2).count()
    assert(w.count() == expected)
    val bad = w.filter(col("t_mass") <= 0 || col("s_mass") <= 0 ||
      col("affinity") <= 0).count()
    assert(bad == 0)
  }

  test("q94: consistent-phrase docs score fluent; common-token salad does not") {
    import spark.implicits._
    // 50 docs share one phrase; the salad doc reuses the SAME common
    // tokens in an unseen order — q85's unigram rarity cannot separate
    // them (every token is corpus-frequent), the transition model can.
    val d = ((0 until 50).map(i => (i.toLong, "alpha beta gamma delta"))
      :+ (99L, "beta alpha delta gamma")).toDF("doc_id", "text")
    val out = QualityQueries.bigramFluency(d)
      .collect().map(r => r.getLong(0) -> r).toMap
    (0 until 50).foreach { i =>
      assert(out(i.toLong).getDouble(4) == 1.0, s"pattern doc $i not fluent")
    }
    // beta->alpha and alpha->delta are 1-in-51 continuations (below
    // 1/16); delta->gamma is delta's only continuation (p=1, fluent)
    val salad = out(99L)
    assert(salad.getLong(1) == 3 && salad.getLong(3) == 3, salad.toString)
    assert(salad.getDouble(4) == 1.0 / 3, salad.toString)
  }

  test("q119: planted repetition is measured exactly (Gopher filter semantics)") {
    import spark.implicits._
    val d = Seq(
      // pure bigram loop: "x y" appears 4 times (8 chars over 8)
      (1L, "x y x y x y x y"),
      // all-distinct tokens: top bigram count 1, no duplicate 5-grams
      (2L, "a b c d e f g h"),
      // one repeated 5-gram: "a b c d e" occurs twice (10 chars / 10)
      (3L, "a b c d e a b c d e"),
      // too short for 5-grams, still has bigrams
      (4L, "p q")
    ).toDF("doc_id", "text")
    val out = QualityQueries.repetitionStats(d)
      .collect().map(r => r.getLong(0) -> r).toMap
    // columns: doc_id, n_tokens, tok_chars, n_bigrams, top2_cnt,
    //          top2_chars, n_5grams, dup5_chars, top2_frac, dup5_frac
    val loop = out(1L)
    assert(loop.getLong(1) == 8 && loop.getLong(2) == 8, loop.toString)
    assert(loop.getLong(4) == 4 && loop.getLong(5) == 8, loop.toString)
    assert(loop.getDouble(8) == 1.0, s"loop doc top2_frac: $loop")
    // its 5-grams: "x y x y x" x2, "y x y x y" x2 -> all 4 duplicated
    assert(loop.getLong(7) == 4 * 5 && loop.getDouble(9) == 20.0 / 8, loop.toString)
    val uniq = out(2L)
    assert(uniq.getLong(4) == 1 && uniq.getLong(7) == 0, uniq.toString)
    assert(uniq.getDouble(9) == 0.0, uniq.toString)
    val rep5 = out(3L)
    assert(rep5.getLong(6) == 6 && rep5.getLong(7) == 10, rep5.toString)
    assert(rep5.getDouble(9) == 1.0, s"planted dup 5-gram: $rep5")
    val short = out(4L)
    assert(short.getLong(3) == 1 && short.getLong(6) == 0
      && short.getLong(7) == 0, short.toString)
  }

  test("q119: every doc is scored; counts nest; n-gram counts tie to token counts") {
    val rows = QualityQueries.repetitionStats(docs).collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      val (n, chars, nbi, top2c, top2ch, n5, dup5) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
         r.getLong(5), r.getLong(6), r.getLong(7))
      assert(nbi == math.max(0, n - 1), s"bigram count: $r")
      assert(n5 == math.max(0, n - QualityQueries.DupN + 1), s"5-gram count: $r")
      assert(top2c >= 1 && top2c <= nbi, s"top bigram count bounds: $r")
      assert(top2ch <= 2 * chars, s"top bigram char mass bound: $r")
      assert(r.getDouble(8) == top2ch.toDouble / chars, s"top2_frac exact: $r")
      assert(r.getDouble(9) == dup5.toDouble / chars, s"dup5_frac exact: $r")
    }
  }

  test("q94: every >=2-token doc is scored; counts nest; frac is the exact ratio") {
    val rows = QualityQueries.bigramFluency(docs).collect()
    val expected = docs
      .filter(size(split(trim(col("text")), "\\s+")) >= 2).count()
    assert(rows.length == expected)
    rows.foreach { case Row(id: Long, n: Long, fl: Long, hx: Long, frac: Double) =>
      assert(fl <= n && hx <= n, s"doc $id: $fl/$hx/$n")
      assert(frac == fl.toDouble / n, s"doc $id: frac not the exact ratio")
    }
  }

  test("q142: KN hand-check — discounted ML, continuation backoff, backoff-heavy flag") {
    import spark.implicits._
    // Same planted corpus as the q94 test: 50 pattern docs + one salad
    // reusing the SAME tokens in an unseen order. Bigram types: 6; with
    // D = 3/4 every smoothed probability below is hand-computable.
    val d = ((0 until 50).map(i => (i.toLong, "alpha beta gamma delta"))
      :+ (99L, "beta alpha delta gamma")).toDF("doc_id", "text")
    val out = QualityQueries.knFluency(d)
      .collect().map(r => r.getLong(0) -> r).toMap
    // pattern docs: all three transitions are ~0.97+ under KN -> fluent,
    // and the discounted ML term dwarfs the backoff everywhere
    (0 until 50).foreach { i =>
      assert(out(i.toLong).getDouble(4) == 1.0, s"pattern doc $i not KN-fluent")
      assert(out(i.toLong).getLong(3) == 0, s"pattern doc $i backoff-heavy")
    }
    // salad: beta->alpha p = .25/51 + .75*(2/51)*(1/6) ~ .0098 (< 1/16,
    // backoff EQUALS ML -> not heavy); alpha->delta p ~ .0147 (< 1/16,
    // backoff 12 > ML 6 -> heavy); delta->gamma p = .25 + .75*(1)*(2/6)
    // = .5 (fluent — delta's only continuation, rescued by the high-
    // continuation suffix)
    val salad = out(99L)
    assert(salad.getLong(1) == 3, salad.toString)
    assert(salad.getLong(2) == 1, s"expected 1 KN-fluent: $salad")
    assert(salad.getLong(3) == 1, s"expected 1 backoff-heavy: $salad")
    assert(salad.getDouble(4) == 1.0 / 3, salad.toString)
  }

  test("q143: each gate drops its planted doc, charged to the FIRST failing stage") {
    import spark.implicits._
    val common = (1 to 24).map(i => f"alpha$i%02d").mkString(" ")
    val d = Seq(
      (0L, "fr", common),                        // fail lang (stage 1)
      (1L, "en", common),                        // keep — every gate passes
      (2L, "de", common),                        // fail lang (stage 1)
      (3L, "en", "alpha01 alpha02 alpha03 alpha04 alpha05"), // fail len (2)
      (4L, "en", Seq.fill(12)("x y").mkString(" ")),         // fail rep (3)
      (5L, "en", (1 to 20).map(i => f"zz$i%02d").mkString(" "))  // fail rare (4)
    ).toDF("doc_id", "lang", "text")
    val out = QualityQueries.filterCascade(d)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(6) == 0 && out(1L).getLong(7) == 1, out(1L).toString)
    assert(out(0L).getLong(6) == 1 && out(2L).getLong(6) == 1, "lang gate")
    assert(out(3L).getLong(6) == 2, s"len gate: ${out(3L)}")
    assert(out(4L).getLong(6) == 3, s"rep gate: ${out(4L)}")
    assert(out(5L).getLong(6) == 4, s"rare gate: ${out(5L)}")
    // the repetition doc fails rep while PASSING lang/len/rare — the
    // charge really is first-fail order, not any-fail
    assert(out(4L).getLong(2) == 1 && out(4L).getLong(3) == 1
      && out(4L).getLong(5) == 1, out(4L).toString)
  }

  test("q143: the funnel is additive and non-trivial on the real corpus") {
    val rows = QualityQueries.filterCascade(docs).collect()
    assert(rows.length == docs.count())
    val byStage = rows.groupBy(_.getLong(6)).view.mapValues(_.length).toMap
    assert(byStage.values.sum == rows.length, "every doc charged exactly once")
    rows.foreach { r =>
      val (p1, p2, p3, p4, ff, keep) = (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      val expected = if (p1 == 0) 1L else if (p2 == 0) 2L
        else if (p3 == 0) 3L else if (p4 == 0) 4L else 0L
      assert(ff == expected && keep == (if (ff == 0) 1L else 0L), r.toString)
    }
    // the corpus splits: some docs survive, some die at the lang gate
    assert(byStage.getOrElse(0L, 0) > 0 && byStage.getOrElse(1L, 0) > 0,
      s"degenerate funnel: $byStage")
  }

  test("q142: every >=2-token doc is scored; counts nest; frac is the exact ratio") {
    val rows = QualityQueries.knFluency(docs).collect()
    val expected = docs
      .filter(size(split(trim(col("text")), "\\s+")) >= 2).count()
    assert(rows.length == expected)
    rows.foreach { case Row(id: Long, n: Long, fl: Long, bo: Long, frac: Double) =>
      assert(fl <= n && bo <= n, s"doc $id: $fl/$bo/$n")
      assert(frac == fl.toDouble / n, s"doc $id: frac not the exact ratio")
    }
  }

  test("q149: PMI top-k equals a driver replay; gate and score algebra hold") {
    import QualityQueries.{CollocMinCount, CollocTopK}
    val texts = docs.select(col("text")).collect().map(_.getString(0))
    val bigrams = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    val unis = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    texts.foreach { t =>
      val ts = t.trim.split("\\s+")
      ts.foreach(w => unis(w) += 1)
      if (ts.length >= 2)
        ts.sliding(2).foreach(p => bigrams((p(0), p(1))) += 1)
    }
    val nBi = bigrams.values.sum
    val tToks = unis.values.sum
    val want = bigrams.toSeq
      .filter(_._2 >= CollocMinCount)
      .map { case ((w1, w2), cxy) =>
        val score = cxy.toDouble * tToks / nBi * tToks / unis(w1) / unis(w2)
        (w1, w2, cxy, unis(w1), unis(w2), tToks, nBi, score)
      }
      .sortBy { case (w1, w2, _, _, _, _, _, s) => (-s, w1, w2) }
      .take(CollocTopK)
    val got = QualityQueries.collocations(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7))).toSeq
    assert(got == want,
      s"top-$CollocTopK differs:\n got=${got.take(3)}\nwant=${want.take(3)}")
    // semantics: every reported pair clears the gate, scores descend,
    // and the list is non-trivial on the real corpus
    assert(got.nonEmpty && got.forall(_._3 >= CollocMinCount))
    assert(got.map(_._8) == got.map(_._8).sorted.reverse, "scores must descend")
  }

  test("q152: TextRank top-k equals a driver integer-mass replay") {
    import QualityQueries.{TrMinCount, TrTopK}
    import graft.operators.VectorQueries.{PrMass, PrDampNum, PrDampDen, PrIters}
    val texts = docs.select(col("text")).collect().map(_.getString(0))
    // undirected co-occurrence graph: adjacent distinct words, pair
    // count gate, then 3 integer-mass PageRank iterations
    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    texts.foreach { t =>
      val ts = t.trim.split("\\s+")
      if (ts.length >= 2)
        ts.sliding(2).filter(p => p(0) != p(1)).foreach { p =>
          val k = if (p(0) < p(1)) (p(0), p(1)) else (p(1), p(0))
          pairCounts(k) += 1
        }
    }
    val kept = pairCounts.filter(_._2 >= TrMinCount).keys.toSeq
    val adj = scala.collection.mutable.Map.empty[String, List[String]]
      .withDefaultValue(Nil)
    kept.foreach { case (u, v) => adj(u) ::= v; adj(v) ::= u }
    val nodes = adj.keys.toSeq.sorted
    val n = nodes.length.toLong
    val base = (3L * PrMass) / (PrDampDen * n)
    var rank = nodes.map(_ -> PrMass / n).toMap
    for (_ <- 1 to PrIters) {
      val contrib = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      nodes.foreach { u =>
        val share = rank(u) / adj(u).size
        adj(u).foreach(v => contrib(v) += share)
      }
      // no dangling nodes in an undirected graph — dg = 0, kept for
      // operand parity with pageRankMass
      rank = nodes.map(u =>
        u -> (base + (PrDampNum * (contrib(u) + 0L / n)) / PrDampDen)).toMap
    }
    val want = nodes.map(u => (u, adj(u).size.toLong, rank(u)))
      .sortBy { case (w, _, pr) => (-pr, w) }
      .take(TrTopK)
    val got = QualityQueries.textRank(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want,
      s"top-$TrTopK differs:\n got=${got.take(3)}\nwant=${want.take(3)}")
    // the graph is non-trivial: the gate kept edges AND pruned edges,
    // and some word out-ranks the uniform start mass
    assert(kept.nonEmpty && kept.size < pairCounts.size,
      "TrMinCount gate must keep some pairs and prune others")
    assert(got.head._3 > PrMass / n, "top word must out-rank uniform mass")
  }

  test("q168: count-of-counts equal a driver replay; GT mass discounts the seen") {
    import QualityQueries.GtMass
    val counts = Tables.documents(spark, sf).select(col("text")).collect()
      .flatMap { r =>
        val ts = r.getString(0).trim.split("\\s+")
        if (ts.length >= 2) ts.sliding(2).map(_.mkString(" ")) else Iterator.empty
      }
      .groupBy(identity).view.mapValues(_.length.toLong).values.toSeq
    val nr = counts.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val t = counts.sum
    val got = SparkEntry.queries("q168_good_turing")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got.keySet == nr.keySet)
    got.foreach { case (r, (gnr, rstar, gt, p0)) =>
      assert(gnr == nr(r), s"N_$r")
      assert(rstar == (r + 1) * nr.getOrElse(r + 1, 0L) * GtMass / nr(r),
        s"r*_$r")
      assert(gt == t && p0 == nr.getOrElse(1L, 0L).toDouble / t)
    }
    // Good-Turing's point: the total adjusted mass over SEEN counts is
    // BELOW the raw mass — the difference is the unseen reserve p0.
    // Σ_r N_r·r* (in GtMass·token units) vs Σ_r N_r·r·GtMass:
    val adj = got.map { case (r, (gnr, rstar, _, _)) =>
      BigInt(gnr) * rstar }.sum
    val raw = got.map { case (r, (gnr, _, _, _)) =>
      BigInt(gnr) * r * GtMass }.sum
    assert(adj < raw, "GT must reserve mass for the unseen")
    assert(got.contains(1L) && got(1L)._1 > 0, "no hapaxes — p0 vacuous")
  }

  test("q213: Gini equals a driver Lorenz replay; bounds and decile algebra hold") {
    val byDoc = docs.select(org.apache.spark.sql.functions.col("source"),
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).trim.split("\\s+").length.toLong))
    val want = byDoc.groupBy(_._1).map { case (src, ds) =>
      val xs = ds.sortBy(d => (d._3, d._2)).map(_._3)
      val n = xs.length.toLong
      val tot = xs.sum
      val ix = xs.zipWithIndex.map { case (x, i) =>
        BigInt(i + 1) * x }.sum
      val gini = (BigInt(2) * ix - BigInt(n + 1) * tot).toDouble /
        (BigInt(n) * tot).toDouble
      val top = xs.zipWithIndex.collect {
        case (x, i) if (i + 1) * 10 > n * 9 => x }.sum
      src -> ((n, tot, gini, top.toDouble / tot))
    }
    val got = SparkEntry.queries("q213_gini_concentration")(spark,
      "/root/testdata/sf0.01").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == want, s"gini replay:\n$got\n$want")
    got.values.foreach { case (n, _, g, ts) =>
      assert(g >= 0.0 && g < 1.0, s"gini $g out of [0,1)")
      // the top decile holds AT LEAST its uniform share of tokens
      assert(ts * n >= math.floor(n / 10.0), s"decile share $ts impossible")
    }
  }

  test("q214: JSD equals a driver replay; symmetric-by-construction, bounded by ln 2") {
    val toksBySrc = docs.select(org.apache.spark.sql.functions.col("source"),
      org.apache.spark.sql.functions.col("text")).collect()
      .flatMap(r => r.getString(1).trim.split("\\s+")
        .filter(_.nonEmpty).map(t => (r.getString(0), t)))
    val cnt = toksBySrc.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val totals = toksBySrc.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val vocab = toksBySrc.map(_._2).distinct.sorted
    val v = vocab.length.toLong
    def lnR(x: Double): Double = BigDecimal(math.log(x))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val srcs = totals.keys.toSeq.sorted
    val want = (for {
      i <- srcs.indices; j <- i + 1 until srcs.length
    } yield {
      val (a, b) = (srcs(i), srcs(j))
      val terms = vocab.map { t =>
        val p = (cnt.getOrElse((a, t), 0L) + 1).toDouble / (totals(a) + v)
        val q = (cnt.getOrElse((b, t), 0L) + 1).toDouble / (totals(b) + v)
        BigDecimal(0.5 * (p * lnR(p * 2.0 / (p + q)) +
          q * lnR(q * 2.0 / (p + q))))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }
      (a, b) -> ((totals(a), totals(b), terms.sum.toDouble))
    }).toMap
    val got = SparkEntry.queries("q214_jsd_matrix")(spark,
      "/root/testdata/sf0.01").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == want,
      s"first diff: ${(got.toSet -- want.toSet).take(2)} vs " +
        s"${(want.toSet -- got.toSet).take(2)}")
    val n = srcs.length
    assert(got.size == n * (n - 1) / 2, "pair grid incomplete")
    got.values.foreach { case (_, _, jsd) =>
      assert(jsd >= 0.0 && jsd <= math.log(2.0) + 1e-9,
        s"JSD $jsd outside [0, ln 2]")
    }
    assert(got.values.exists(_._3 > 0.0), "all-zero divergence is vacuous")
  }
}
