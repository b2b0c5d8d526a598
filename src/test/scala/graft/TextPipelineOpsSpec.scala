package graft

import org.apache.spark.sql.functions._

/** Invariant specs for the round-4 pipeline ops (q63/q64/q66/q67); the
  * hard value-level gate for each is its DuckDB oracle in Verify. */
class TextPipelineOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)

  test("q63 decontamination partitions the corpus and counts consistently") {
    val out = SparkEntry.queries("q63_decontaminate")(spark, sf)
      .select($"lang", $"n_docs", $"n_contaminated", $"shared_grams")
      .as[(String, Long, Long, Long)].collect()
    val nonBench = docs.filter($"doc_id" % 97 =!= 0).count()
    assert(out.map(_._2).sum == nonBench, "every non-benchmark doc counted once")
    assert(out.forall { case (_, n, c, g) => c <= n && g >= c },
      "contaminated <= docs and each contaminated doc shares >= 1 gram")
  }

  test("q63 flags a doc that quotes a benchmark trigram") {
    // doc 0 is in the benchmark slice (0 % 97 == 0); doc 1 quoting 3+
    // consecutive tokens of doc 0 must be contaminated. Run the same
    // pipeline over a crafted table via a temp view against the real
    // query? The query reads parquet, so instead verify on real data:
    // any doc sharing a trigram with the bench slice appears in hits.
    val tri = transform(sequence(lit(0), size(split(trim($"text"), "\\s+")) - 3),
      i => concat_ws(" ",
        element_at(split(trim($"text"), "\\s+"), i + 1),
        element_at(split(trim($"text"), "\\s+"), i + 2),
        element_at(split(trim($"text"), "\\s+"), i + 3)))
    val g = docs.filter(size(split(trim($"text"), "\\s+")) >= 3)
      .select($"doc_id", $"lang", explode(array_distinct(tri)).as("g"))
    val bench = g.filter($"doc_id" % 97 === 0).select($"g").distinct()
    val expected = g.filter($"doc_id" % 97 =!= 0).join(bench, "g")
      .groupBy($"lang").agg(countDistinct($"doc_id").as("c"))
      .as[(String, Long)].collect().toMap
    val out = SparkEntry.queries("q63_decontaminate")(spark, sf)
      .select($"lang", $"n_contaminated").as[(String, Long)].collect().toMap
    expected.foreach { case (lang, c) => assert(out(lang) == c) }
  }

  test("q64 emits exactly one BM25 winner per doc with positive score") {
    val out = SparkEntry.queries("q64_bm25")(spark, sf)
    assert(out.count() == docs.count())
    assert(out.filter($"score" <= 0 || $"tf" < 1 || $"df" < 1).isEmpty)
    assert(out.select($"doc_id").distinct().count() == docs.count())
  }

  test("q64 length normalization demotes terms in long docs vs raw tf-idf") {
    // For two docs with the same (tf, df) of their top term, the longer
    // doc must score lower — the defining BM25 property.
    val out = SparkEntry.queries("q64_bm25")(spark, sf)
      .join(docs.select($"doc_id",
        size(split(trim($"text"), "\\s+")).cast("long").as("dl")), "doc_id")
      .select($"tf", $"df", $"dl", $"score")
      .as[(Long, Long, Long, Double)].collect()
    val byKey = out.groupBy(t => (t._1, t._2)).filter(_._2.length >= 2)
    val violations = byKey.values.flatMap { rows =>
      rows.sortBy(_._3).sliding(2).collect {
        case Array(a, b) if a._3 < b._3 && a._4 < b._4 => (a, b)
      }
    }
    // shorter doc scores >= longer doc for identical (tf, df)
    assert(violations.isEmpty, s"monotonicity violated: ${violations.headOption}")
  }

  test("q66 scrubbing accounts for every event and redacts the numerics") {
    val out = SparkEntry.queries("q66_pii_scrub")(spark, sf)
      .select($"n_events", $"n_numeric", $"n_emails", $"n_urls", $"chars_redacted")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.map(_._1).sum == Tables.events(spark, sf).count())
    assert(out.map(_._2).sum > 0, "numeric ids exist in props and are counted")
    assert(out.forall { case (_, n, _, _, red) => red >= n },
      "each numeric run redacts at least one char")
  }

  test("q69 mixing keeps under-represented languages whole and downsamples the rest") {
    val total = docs.count().toDouble
    val out = SparkEntry.queries("q69_domain_mix")(spark, sf)
      .select($"lang", $"n_docs", $"n_kept").as[(String, Long, Long)].collect()
    val targets = Map("de" -> 0.15, "en" -> 0.4, "es" -> 0.15,
      "fr" -> 0.15, "zh" -> 0.15)
    out.foreach { case (lang, n, kept) =>
      assert(kept <= n)
      val p = math.min(1.0, targets(lang) / (n / total))
      if (p == 1.0) assert(kept == n, s"$lang is under target: keep everything")
      // md5 buckets are near-uniform: kept/n within 10 buckets of floor(p*256)/256
      else assert(math.abs(kept.toDouble / n - math.floor(p * 256) / 256) < 10.0 / 256,
        s"$lang kept ratio ${kept.toDouble / n} vs p=$p")
    }
  }

  test("q67 TakeOrdered+self-join rank equals the naive global-window formulation") {
    // the scale-safe plan (per-partition top-k, bounded rank self-join)
    // must be value-identical to the textbook single-reducer window it
    // replaced — computed here naively, over the same trigram counts
    import org.apache.spark.sql.expressions.Window
    val counts = docs.filter(length($"text") >= 3)
      .select($"text", explode(sequence(lit(1), length($"text") - 2)).as("i"))
      .select(expr("substring(text, i, 3)").as("g"))
      .groupBy($"g").agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy($"cnt".desc, $"g".asc)
    val ranked = counts
      .withColumn("rn", row_number().over(w))
      .withColumn("cum", sum($"cnt").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val total = counts.agg(sum($"cnt")).as[Long].head()
    val naive = Seq(50, 150, 300).map { v =>
      val covered = ranked.filter($"rn" <= v).agg(max($"cum")).as[Long].head()
      (v.toLong, covered, total, covered.toDouble / total)
    }
    val out = SparkEntry.queries("q67_vocab_coverage")(spark, sf)
      .orderBy($"v").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == naive)
  }

  test("q83 histogram-threshold selection equals the naive global-window prefix") {
    import org.apache.spark.sql.expressions.Window
    val stop = array(Seq("the", "a", "an", "of", "and", "or", "is",
      "to", "in", "that").map(lit): _*)
    val ts = split(trim($"text"), "\\s+")
    val scored = docs.select($"doc_id", $"lang",
      size(ts).cast("long").as("toks"),
      (size(filter(ts, t => array_contains(stop, t))).cast("double") /
        size(ts).cast("double")).as("q"))
    val budget = scored.agg(sum($"toks")).as[Long].head() >> 2
    val naive = scored
      .withColumn("cum", sum($"toks").over(
        Window.orderBy($"q".desc, $"doc_id".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter($"cum" <= budget)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_kept"), sum($"toks").as("tokens_kept"))
      .as[(String, Long, Long)].collect().sorted.toSeq
    val got = SparkEntry.queries("q83_budget_select")(spark, sf)
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(got == naive)
    assert(got.map(_._3).sum <= budget && got.nonEmpty,
      "kept tokens must respect the budget")
  }

  test("q84 shard export: balanced layout, every doc exactly once, single-shard reads prune") {
    val out = SparkEntry.queries("q84_shard_export")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L until 16L), "all 16 shards must exist")
    assert(out.map(_._2).sum == docs.count(), "every doc lands in exactly one shard")
    // md5 shards are near-uniform: no shard more than 2x the smallest
    val sizes = out.map(_._2)
    assert(sizes.max <= 2 * sizes.min,
      s"shard skew ${sizes.min}..${sizes.max} — hash balance broken")
    // a loader reading ONE shard must prune the other 15 directories
    val dir = operators.TextQueries.shardExportDir(spark, sf)
    val one = spark.read.parquet(dir).filter($"shard" === 3)
    one.count()
    val plan = one.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val scans = plan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }
    assert(scans.nonEmpty && scans.head.selectedPartitions.partitionCount == 1,
      "shard filter must prune to one partition directory")
  }

  test("q67 vocab coverage is monotone in V and bounded by 1") {
    val out = SparkEntry.queries("q67_vocab_coverage")(spark, sf)
      .orderBy($"v").select($"v", $"covered", $"total", $"coverage")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(50L, 150L, 300L))
    assert(out.sliding(2).forall { case Array(a, b) => a._2 <= b._2 })
    assert(out.forall { case (_, c, t, r) => c <= t && r > 0 && r <= 1.0 })
    assert(out.map(_._3).distinct.length == 1, "total is corpus-wide constant")
  }

  test("q206: FastSS candidates equal a brute driver levenshtein sweep — blocking is lossless") {
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    val vocab = docs.select($"text").as[String].collect()
      .flatMap(_.trim.split("\\s+"))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val toks = vocab.keys.toSeq.sorted
    val want = (for {
      i <- toks.indices; j <- i + 1 until toks.length
      d = lev(toks(i), toks(j)) if d <= 2
    } yield (toks(i), toks(j)) ->
      ((d.toLong, vocab(toks(i)), vocab(toks(j))))).toMap
    val got = SparkEntry.queries("q206_fuzzy_vocab")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want,
      s"missed=${(want.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- want.keySet).take(5)}")
    assert(got.nonEmpty, "the corpus vocab must contain SOME variant pairs")
  }

  test("q207: quotas are a Hamilton apportionment; selection is the md5 prefix per source") {
    import graft.operators.TextQueries.SampleDen
    val byDoc = docs.select($"doc_id", $"source")
      .as[(Long, String)].collect()
    val cnt = byDoc.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val total = byDoc.length.toLong
    val budget = total / SampleDen
    val base = cnt.view.mapValues(n => budget * n / total).toMap
    val leftover = budget - base.values.sum
    val seats = cnt.keys.toSeq
      .sortBy(s => (-(budget * cnt(s) % total), s)).take(leftover.toInt).toSet
    val quota = cnt.keys.map(s =>
      s -> (base(s) + (if (seats(s)) 1L else 0L))).toMap
    def md5hex(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = byDoc.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.map(_._1).sortBy(id => (md5hex(id), id)).take(quota(src).toInt)
        .zipWithIndex.map { case (id, i) =>
          (src, id) -> ((i + 1).toLong, quota(src)) }
    }.toMap
    val got = SparkEntry.queries("q207_stratified_sample")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == want,
      s"missed=${(want.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- want.keySet).take(5)}")
    // Σ quota == budget BY CONSTRUCTION — the property float
    // apportionment loses; and the remainder seats must be exercised
    assert(got.size.toLong == budget, s"selected ${got.size} != $budget")
    assert(leftover > 0 || cnt.values.forall(n => budget * n % total == 0),
      "corpus should exercise the largest-remainder branch")
  }
}
