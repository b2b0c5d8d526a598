package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Text-analysis + dedup surface over `documents` (SURVEY.md §2.11
  * L1/L5, A9, F9): token stats, exact dedup, content fingerprinting,
  * n-gram Jaccard similarity, quality scoring, length percentiles.
  *
  * All token work uses codegen'd built-ins (`split`, higher-order array
  * fns) — no UDFs in the hot path. Pairwise similarity is bounded
  * (adjacent-id pairs / LSH candidates), never an n² crossjoin, so every
  * query stays linear in corpus size.
  */
object TextQueries {

  /** Whitespace tokens of `text`, after trim (so no empty edge tokens). */
  private def toks: Column = split(trim(col("text")), "\\s+")

  /** q250 support gate and cut: a token must occur at least TrendMinN
    * times across both halves to have a readable growth ratio, and
    * the audit reports the top TrendTopK under the (score DESC,
    * token ASC) total order. */
  private[graft] val TrendMinN = 5L
  private[graft] val TrendTopK = 20

  /** q101 hashed-feature dimensionality — matches the corpus embedding
    * dim so the hashed vectors are drop-in probes for the ANN family.
    * Interpolated into the oracle SQL. */
  val FeatureHashDim = 64

  /** q102 stage-1 shortlist depth per probe — the binary pool the
    * exact rerank pays float cost for. Interpolated into the oracle. */
  val HammingPool = 50

  /** q206 edit-distance bar: the FastSS deletion-neighborhood depth
    * AND the verify threshold (they must match — the neighborhood is
    * lossless exactly up to its own depth). d=2 catches the
    * substitution/transposition-heavy variants OCR produces while the
    * neighborhood stays L²-bounded per token. */
  private[graft] val FuzzyD = 2

  /** q207 sampling rate denominator: budget = ⌊total/4⌋ docs (25 %),
    * apportioned across sources by largest remainder. */
  private[graft] val SampleDen = 4L

  /** q103 chunking geometry: fixed token windows of [[ChunkW]] starting
    * every [[ChunkStride]] tokens (overlap W − stride = 8) — the
    * RAG/embedding-ingest slicer. Both interpolated into the oracle so
    * the two engines cannot drift if the window is retuned. */
  val ChunkW = 32
  val ChunkStride = 24

  /** The q103 chunker on an arbitrary (doc_id, text) frame — shared by
    * q103 and q111's chunk-level dedup. One projection + generate,
    * zero shuffles (plan-audited). */
  private[graft] def chunks(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), toks.as("ts"))
      .select(col("doc_id"), col("ts"), size(col("ts")).as("n"))
      .select(col("doc_id"), col("n"),
        posexplode(transform(
          sequence(lit(0), col("n") - 1, lit(ChunkStride)),
          st => struct(
            least(lit(ChunkW), col("n") - st).cast("long")
              .as("n_chunk_tokens"),
            concat_ws(" ", slice(col("ts"), st + 1, lit(ChunkW)))
              .as("chunk_text")))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
              col("col.n_chunk_tokens"), col("col.chunk_text"))

  /** Token trigrams of a token-array column. `ts` MUST be a
    * materialized column attribute, not an inline expression: an
    * expression referenced inside a higher-order-function lambda is
    * re-evaluated per element (an inline split() here is O(tokens²)
    * per doc — measured 10x on the 100k-doc pipeline). Callers must
    * also guard size(ts) >= 3: below that, sequence(0, size-3)
    * descends and element_at(ts, 0) throws. Shared by q59, q63,
    * PipelineBench and StreamingDecontaminate. */
  def tokenTrigrams(ts: Column): Column =
    transform(sequence(lit(0), size(ts) - 3),
      i => concat_ws(" ", element_at(ts, i + 1),
        element_at(ts, i + 2), element_at(ts, i + 3)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 1-D Wasserstein (earth-mover's) distance matrix between the
    // per-source length distributions (D43 — Vaserstein '69 /
    // Rubner's EMD in the one case it is closed-form: on the line,
    // W₁ = ∫|F_a − F_b|. The curation read q214's JSD cannot give:
    // JSD on binned lengths saturates at ln 2 for disjoint supports,
    // while W₁ says HOW FAR apart in characters two sources' length
    // profiles sit — the number a mixture planner can trade off).
    // Shape: value-count table per source, ONE global ScanSum over
    // the distinct-length support to index it (support is
    // domain-bounded — distinct lengths, not docs), gaps by
    // consecutive-index equi-join, per-source CDFs by ScanSum over
    // the zero-filled source×support grid, then the 45-pair join on
    // value. |F_a − F_b| clears denominators: |cum_a·n_b − cum_b·n_a|
    // is DECIMAL(38,0)-exact (10²⁴ at 10¹² docs wraps BIGINT), ×gap
    // stays decimal-exact, and W₁ is ONE final IEEE division by
    // n_a·n_b per pair.
    "q274_wasserstein" -> ((s, d) => {
      val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val cnt = documents(s, d).select(col("source"), col("n_chars"))
        .groupBy(col("source"), col("n_chars"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // feeds support, srcN, and the filled grid
      val support = cnt.select(col("n_chars")).distinct()
        .withColumn("g", lit("all")).withColumn("one", lit(1L))
      val idx = graft.operators.ScanSum
        .runningSum(support, "g", "n_chars", "one", outCol = "i")
        .select(col("n_chars"), col("i"))
        .localCheckpoint() // feeds the grid, both gap legs
      val gap = idx
        .join(idx.select((col("i") - 1).as("i2"), col("n_chars").as("nv")),
          col("i") === col("i2"))
        .select(col("n_chars"), (col("nv") - col("n_chars")).as("gap"))
      val srcN = cnt.groupBy(col("source")).agg(sum(col("c")).as("n"))
      val filled = idx.select(col("n_chars"))
        .crossJoin(broadcast(cnt.select(col("source")).distinct()))
        .join(cnt, Seq("source", "n_chars"), "left")
        .select(col("source"), col("n_chars"),
          coalesce(col("c"), lit(0L)).as("c"))
      val cum = graft.operators.ScanSum
        .runningSum(filled, "source", "n_chars", "c", outCol = "cum")
      val a = cum.select(col("source").as("source_a"), col("n_chars"),
          col("cum").as("cum_a"))
        .join(broadcast(srcN.select(col("source").as("source_a"),
          col("n").as("n_a"))), "source_a")
      val b = cum.select(col("source").as("source_b"), col("n_chars"),
          col("cum").as("cum_b"))
        .join(broadcast(srcN.select(col("source").as("source_b"),
          col("n").as("n_b"))), "source_b")
      a.join(b, "n_chars").filter(col("source_a") < col("source_b"))
        .join(broadcast(gap), "n_chars") // inner: the last support
        // value has no gap and contributes zero (both CDFs are 1)
        .groupBy(col("source_a"), col("source_b"), col("n_a"), col("n_b"))
        .agg(sum((abs((col("cum_a").cast(dec19) * col("n_b").cast(dec19))
            .cast(dec) -
            (col("cum_b").cast(dec19) * col("n_a").cast(dec19)).cast(dec))
          * col("gap").cast(dec19)).cast(dec)).cast(dec).as("num"))
        .withColumn("w1_chars",
          col("num").cast("double") /
            (col("n_a").cast(dec19) * col("n_b").cast(dec19)).cast(dec)
              .cast("double"))
        .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
          col("w1_chars"))
    }),

    // Flesch readability profile per source (L5ii — Flesch '48 /
    // Kincaid '75: the curation-grade reading-level read — quality
    // filters like Gopher gate on repetition and symbol ratios
    // (q119), but a training-mix planner also wants "how HARD is this
    // source", and Flesch/FK is the standard deterministic proxy).
    // All three inputs are exact BIGINT counts in one pass: words
    // (the corpus tokenizer), sentences (regexp [.!?]+ runs, floored
    // at 1/doc), syllables (vowel-group [aeiouy]+ runs per word,
    // floored at 1/word — the classic heuristic). The syllable sum is
    // computed at DOC level: a vowel run never crosses whitespace, so
    // Σ_w runs(w) == runs(text), and the per-word ≥1 floor adds
    // exactly one per vowel-less word — syl = runs(text) +
    // |{w : w has no vowel}|. Same exact BIGINT as the old per-word
    // regexp_extract_all fold, WITHOUT materializing a match array
    // per word (one extract_all per doc + one cheap rlike per word —
    // the r14 map-stage fix for the hottest regex in the battery;
    // guide §1.2 step 2). The two score chains are the identical IEEE
    // ops over the exact sums in both engines.
    "q275_readability" -> ((s, d) => {
      val per = documents(s, d)
        .select(col("source"), lower(col("text")).as("t"))
        .select(col("source"),
          greatest(lit(1L),
            regexp_count(col("t"), lit("[.!?]+")).cast("long")).as("sents"),
          // wc: a word is a maximal \S+ run — identical to the old
          // split-and-filter count, no array materialized
          regexp_count(col("t"), lit("\\S+")).cast("long").as("wc"),
          // syl = vowel runs in the doc + one per vowel-less word
          // (a maximal \S+ run containing no vowel); the bounded-width
          // lookaround anchors the run without consuming either
          // boundary, so adjacent vowel-less words both count
          (regexp_count(col("t"), lit("[aeiouy]+")).cast("long") +
            regexp_count(col("t"),
              lit("(?<=^|\\s)[^aeiouy\\s]+(?=\\s|$)")).cast("long"))
            .as("syl"))
      per.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("wc")).as("n_words"),
          sum(col("sents")).as("n_sentences"),
          sum(col("syl")).as("n_syllables"))
        // a source whose documents are ALL empty/whitespace has no
        // word leg in the oracle (its inner join drops it) — mirror
        // that here so degenerate corpora agree by construction
        .filter(col("n_words") > 0)
        .withColumn("wps",
          col("n_words").cast("double") / col("n_sentences").cast("double"))
        .withColumn("spw",
          col("n_syllables").cast("double") / col("n_words").cast("double"))
        .withColumn("flesch_ease",
          lit(206.835) - lit(1.015) * col("wps") - lit(84.6) * col("spw"))
        .withColumn("fk_grade",
          lit(0.39) * col("wps") + lit(11.8) * col("spw") - lit(15.59))
        .select(col("source"), col("n_docs"), col("n_words"),
          col("n_sentences"), col("n_syllables"), col("flesch_ease"),
          col("fk_grade"))
    }),

    // Cross-source quantile normalization (L5gg — Bolstad '03's
    // microarray recipe applied to corpus curation: before comparing
    // per-source quality/length statistics, align each source's
    // distribution onto the pooled one, so a source that writes long
    // documents is not mistaken for a source that writes good ones).
    // Per doc: its rank i within the source and the pooled value at
    // ordinal k = ⌈i·N/n_s⌉ — BOTH ranks from ScanSum's distributed
    // running count in n_chars order (never a per-source or global
    // sort task; tie order inside an equal-value run is irrelevant
    // because the per-source AGGREGATE is tie-permutation-invariant),
    // the ordinal product i·N routed DECIMAL(38,0) DIV (exact
    // IntegralDivide — ~10²⁴ at 100 TB; HUGEINT // in the oracle),
    // then ONE equi-join on k. Output: per-source raw vs normalized
    // decimal-exact means — normalized means converge by construction,
    // which is the audit's read.
    "q248_quantile_norm" -> ((s, d) => {
      import graft.functions.Num.davg
      val docs = documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("g", lit("all")).withColumn("one", lit(1L))
        .localCheckpoint() // feeds both rank passes + counts
      val ranked = graft.operators.ScanSum
        .runningSum(docs, "source", "n_chars", "one", outCol = "i")
      val pooled = graft.operators.ScanSum
        .runningSum(docs.select(col("g"), col("n_chars"), col("one")),
          "g", "n_chars", "one", outCol = "k")
        .select(col("k"), col("n_chars").as("pooled"))
      val ns = docs.groupBy(col("source")).agg(count(lit(1)).as("ns"))
      val nAll = docs.agg(count(lit(1)).as("n"))
      ranked.join(broadcast(ns), "source").crossJoin(broadcast(nAll))
        .withColumn("k", expr(
          """CAST((CAST(i AS DECIMAL(38,0)) * n + ns - 1)
             DIV CAST(ns AS DECIMAL(19,0)) AS BIGINT)"""))
        .join(pooled, "k")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          davg(col("n_chars")).as("mean_raw"),
          davg(col("pooled")).as("mean_norm"))
    }),

    // Trending-token audit (D32 — "which vocabulary is GROWING":
    // corpus drift made token-level, the monitoring read behind
    // crawl-refresh and contamination triage). Time proxy = the
    // doc_id axis split at its integer midpoint (the q227 Heaps
    // convention: ingestion order), per-token counts in each half
    // from ONE rollup, growth score = (c2+1)/(c1+1) as ONE IEEE
    // division of exact integers (add-one so births rank above
    // steady-state), support gate c1+c2 ≥ [[TrendMinN]], and the
    // global top-[[TrendTopK]] under a (score_ppm DESC, token ASC)
    // TOTAL order via TakeOrdered — the O3 shape, no window, no
    // second scan. The CUT key is the exact integer
    // (c2+1)·10⁶ DIV (c1+1) — ppm resolution, DECIMAL(38,0)/HUGEINT
    // routed so the product can't wrap at 100 TB token counts
    // (c2 ~1e12 · 1e6 grazes the BIGINT edge) — per the house "no
    // float before the cut" rule; the IEEE-divided double stays as
    // DISPLAY only. ppm ties fall to token ASC in both engines, so
    // the order stays total and engine-identical.
    "q250_trending_tokens" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("text"))
      val span = docs.agg(min(col("doc_id")).as("i0"),
        max(col("doc_id")).as("i1"))
      docs.crossJoin(broadcast(span))
        .withColumn("late",
          col("doc_id") >= col("i0") + expr("(i1 - i0 + 1) DIV 2"))
        .select(col("late"), explode(toks).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("token"))
        .agg(sum(when(!col("late"), 1L).otherwise(0L)).as("c1"),
          sum(when(col("late"), 1L).otherwise(0L)).as("c2"))
        .filter(col("c1") + col("c2") >= TrendMinN)
        .withColumn("score_ppm", expr(
          "CAST(c2 + 1 AS DECIMAL(38,0)) * 1000000 DIV (c1 + 1)"))
        .withColumn("score",
          (col("c2") + 1).cast("double") / (col("c1") + 1).cast("double"))
        .orderBy(col("score_ppm").desc, col("token").asc)
        .limit(TrendTopK)
        .select(col("token"), col("c1"), col("c2"), col("score"))
    }),

    // Token-weighted exact quantiles (A14 — "the median document
    // length BY TOKEN MASS": unweighted medians (q28/q223) answer
    // "what does the typical DOCUMENT look like", but a training run
    // consumes TOKENS, so the curation-relevant percentile weights
    // each doc by its token count — a corpus of many short docs and
    // few huge ones has wildly different answers). Same distributed
    // selection as q223 with WEIGHTED mass everywhere: per-source
    // 256-bin histogram of token mass, boundary bin per target
    // k = ⌈p·W⌉, windowless member filter, and ScanSum's weighted
    // running mass locating the row whose interval CONTAINS k (w ≥ 1
    // per doc, so intervals are disjoint and exactly one row
    // qualifies; value ties make the pick tie-order-free). The
    // oracle is the INDEPENDENT brute weighted rank — full ordered
    // cumsum, no histogram shared.
    "q254_weighted_quantiles" -> ((s, d) => {
      import org.apache.spark.sql.{Row, types => T}
      // r15 fused form — q223's treatment, weighted: the stats and
      // histogram tables are bounded by GEOMETRY (sources, sources×256)
      // so they collect and the target/boundary arithmetic runs on the
      // driver (graft.operators.BinSelect, guide §5); the checkpoint
      // stays because every pass reuses the tokenize-derived w. Same
      // bin/k/kk arithmetic, same ScanSum weighted-interval tail —
      // identical picks (independent brute-rank oracle + BinSelectSpec).
      val docs = documents(s, d).select(col("source"), col("doc_id"),
          col("n_chars"), size(toks).cast("long").as("w"))
        .localCheckpoint() // feeds stats + histogram + boundary members
      val stAgg = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"),
        sum(col("w")).as("tw"), min(col("n_chars")).as("lo"),
        max(col("n_chars")).as("hi"))
      val stRows = stAgg.collect() // one row per source
      val stLocal = broadcast(
        s.createDataFrame(java.util.Arrays.asList(stRows: _*), stAgg.schema))
      val binned = docs.join(stLocal, "source")
        .withColumn("bin", when(col("hi") === col("lo"), lit(0))
          .otherwise(least(lit(255),
            floor((col("n_chars") - col("lo")) / (col("hi") - col("lo"))
              * 256).cast("int"))))
      val hist = binned.groupBy(col("source"), col("bin"))
        .agg(sum(col("w")).as("bw")).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
      val targets = stRows.toSeq.flatMap { r =>
        val (src, tw) = (r.getString(0), r.getLong(2))
        Seq(graft.operators.BinSelect.Target(src, "wp50", (tw + 1) / 2),
          graft.operators.BinSelect.Target(src, "wp90", (9 * tw + 9) / 10))
      }
      val statOf = stRows.map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val bounds = graft.operators.BinSelect.boundary(hist, targets)
      val boundLocal = broadcast(s.createDataFrame(
        java.util.Arrays.asList(bounds.map { b =>
          val (nDocs, tw) = statOf(b.group)
          Row(b.group, b.tgt, b.bbin, b.kk, nDocs, tw)
        }: _*),
        T.StructType(Seq(
          T.StructField("source", T.StringType, nullable = false),
          T.StructField("tgt", T.StringType, nullable = false),
          T.StructField("bbin", T.IntegerType, nullable = false),
          T.StructField("kk", T.LongType, nullable = false),
          T.StructField("n_docs", T.LongType, nullable = false),
          T.StructField("tw", T.LongType, nullable = false)))))
      val members = binned
        .select(col("source"), col("n_chars"), col("w"), col("bin"))
        .join(boundLocal, "source")
        .filter(col("bin") === col("bbin"))
        .withColumn("__grp", concat(col("source"), lit(":"), col("tgt")))
      graft.operators.ScanSum
        .runningSum(members, "__grp", "n_chars", "w", outCol = "cw")
        .filter(col("cw") >= col("kk") && col("cw") - col("w") < col("kk"))
        .groupBy(col("source"))
        .agg(max(col("n_docs")).as("n_docs"),
          max(col("tw")).as("token_mass"),
          max(when(col("tgt") === "wp50", col("n_chars"))).as("wp50"),
          max(when(col("tgt") === "wp90", col("n_chars"))).as("wp90"))
    }),

    // Corpus stats per (lang, source) — A9.
    "q20_text_stats" -> ((s, d) => {
      documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_chars")).as("total_chars"),
             round(avg(col("n_chars")), 2).as("avg_chars"),
             min(col("n_chars")).as("min_chars"),
             max(col("n_chars")).as("max_chars"))
    }),

    // Per-doc token counting (whitespace tokenizer) — L5.
    "q21_token_count" -> ((s, d) => {
      documents(s, d)
        .select(col("doc_id"),
                size(toks).cast("long").as("n_tokens"),
                size(array_distinct(toks)).cast("long").as("n_distinct_tokens"))
    }),

    // Exact dedup by content hash (md5) — L1. Emits one surviving id per
    // content group + the group size; a `dropDuplicates` view of the same.
    "q22_exact_dedup" -> ((s, d) => {
      documents(s, d)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    }),

    // Bag-of-words fingerprint (order-insensitive content identity):
    // md5 over the sorted distinct token set. Near-dup prefilter key.
    "q23_fingerprint" -> ((s, d) => {
      documents(s, d)
        .select(col("doc_id"),
                md5(array_join(array_sort(array_distinct(toks)), " ")).as("bow_fp"))
    }),

    // Bounded n-gram Jaccard: word-set similarity of id-adjacent doc
    // pairs (linear chain, not n² — the all-pairs variant goes through
    // MinHash-LSH, q25).
    "q24_jaccard_adjacent" -> ((s, d) => {
      val a = documents(s, d).select(col("doc_id"),
        array_distinct(toks).as("ta"))
      val b = documents(s, d).select((col("doc_id") - 1).as("doc_id"),
        array_distinct(toks).as("tb"))
      a.join(b, "doc_id")
        .select(col("doc_id").as("doc_a"), (col("doc_id") + 1).as("doc_b"),
          round(
            size(array_intersect(col("ta"), col("tb"))).cast("double") /
            (size(col("ta")) + size(col("tb")) -
             size(array_intersect(col("ta"), col("tb")))).cast("double"),
            4).as("jaccard"))
    }),

    // MinHash-LSH near-dup candidates (L2): shingle → 32 minhashes →
    // 8 bands × 4 rows → band-bucket join → exact Jaccard rescore.
    // Oracle: Verify exports band keys + shingle hashes (ApproxOracle)
    // and DuckDB redoes the self-join + set-Jaccard rescore + summary
    // relationally; MinHashSpec covers the signature math.
    "q25_minhash_pairs" -> ((s, d) =>
      MinHashLSH.candidatePairs(documents(s, d),
        minJaccard = ApproxOracle.MinJaccard)),

    // Cluster-aware split assignment (L5z — the FIX for the leakage
    // q178 measures): route every near-dup CLUSTER wholly into one
    // split by hashing its component ROOT instead of the doc id
    // (singletons keep their own id as root, so unclustered docs get
    // exactly the q56 assignment). Cross-split near-dup pairs are then
    // zero BY CONSTRUCTION — and the query PROVES it relationally (the
    // n_pairs_cross column is computed, not asserted) while showing
    // the split ratios survived. Pairs and clusters are the q25/q54
    // machinery (banded candidates, star-contraction CC); the md5
    // bucket rule is q56's, applied to the root.
    "q180_cluster_split" -> ((s, d) => {
      val docs = documents(s, d)
      val pairs = MinHashLSH
        .verifiedPairs(docs.select(col("doc_id"), col("text")),
          ApproxOracle.MinJaccard)
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint() // feeds CC + the leakage re-audit
      val lab = ConnectedComponents.labels(s,
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      val rooted = docs.select(col("doc_id"))
        .join(lab.select(col("doc_id"), col("comp_id").as("root0")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("root0"), col("doc_id")).as("root"))
        .withColumn("h", md5(col("root").cast("string").cast("binary")))
        .withColumn("bkt",
          (expr("instr('0123456789abcdef', substr(h, 1, 1))") - 1) * 16 +
           expr("instr('0123456789abcdef', substr(h, 2, 1))") - 1)
        .withColumn("split", when(col("bkt") < 204, "train")
          .when(col("bkt") < 230, "val").otherwise("test"))
        .select(col("doc_id"), col("root"), col("split"))
        .localCheckpoint() // feeds the rollup + both pair legs
      val tagged = pairs
        .join(rooted.select(col("doc_id").as("doc_a"),
          col("split").as("sa")), "doc_a")
        .join(rooted.select(col("doc_id").as("doc_b"),
          col("split").as("sb")), "doc_b")
      val within = tagged.filter(col("sa") === col("sb"))
        .groupBy(col("sa").as("split"))
        .agg(count(lit(1)).as("n_pairs_within"))
      val cross = tagged.filter(col("sa") =!= col("sb"))
        .agg(count(lit(1)).as("n_pairs_cross"))
      rooted.groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("doc_id") =!= col("root"), 1L)
            .otherwise(0L)).as("n_nonroot_docs"))
        .join(within, Seq("split"), "left")
        .crossJoin(broadcast(cross))
        .select(col("split"), col("n_docs"), col("n_nonroot_docs"),
          coalesce(col("n_pairs_within"), lit(0L)).as("n_pairs_within"),
          col("n_pairs_cross"))
    }),

    // Cross-split leakage audit (D11 — the eval-hygiene question q56's
    // SPLIT and q25's NEAR-DUP machinery exist to answer together): how
    // many near-duplicate pairs STRADDLE the train/val/test boundary?
    // A doc whose near-twin sits in another split leaks supervision
    // into evaluation — the within-corpus analogue of q63's benchmark
    // decontamination, and the audit every published split should ship
    // with. Pairs from the q25 banded join + exact rescore; splits by
    // the q56 md5 bucket; pair volume is O(near-dup pairs), the rollup
    // ≤ 6 split-combo rows, leak shares single IEEE divisions.
    "q178_split_leakage" -> ((s, d) => {
      val docs = documents(s, d)
      val split = docs
        .withColumn("h", md5(col("doc_id").cast("string").cast("binary")))
        .withColumn("bkt",
          (expr("instr('0123456789abcdef', substr(h, 1, 1))") - 1) * 16 +
           expr("instr('0123456789abcdef', substr(h, 2, 1))") - 1)
        .withColumn("split", when(col("bkt") < 204, "train")
          .when(col("bkt") < 230, "val").otherwise("test"))
        .select(col("doc_id"), col("split"))
      val combos = MinHashLSH
        .verifiedPairs(docs.select(col("doc_id"), col("text")),
          ApproxOracle.MinJaccard)
        .join(split.select(col("doc_id").as("doc_a"),
          col("split").as("sa")), "doc_a")
        .join(split.select(col("doc_id").as("doc_b"),
          col("split").as("sb")), "doc_b")
        .groupBy(least(col("sa"), col("sb")).as("split_lo"),
          greatest(col("sa"), col("sb")).as("split_hi"))
        .agg(count(lit(1)).as("n_pairs"))
        .localCheckpoint() // ≤6 rows; feeds output + the total
      val tot = combos.agg(sum(col("n_pairs")).as("t"))
      combos.crossJoin(broadcast(tot))
        .select(col("split_lo"), col("split_hi"), col("n_pairs"),
          (col("split_lo") =!= col("split_hi")).as("is_cross"),
          (col("n_pairs").cast("double") / col("t")).as("pair_frac"))
    }),

    // Near-dedup quality audit (the "is my LSH geometry right" harness
    // a production dedup pipeline runs before trusting its band
    // parameters): candidate-stage precision/recall of the q25
    // MinHash-LSH band join against EXACT ground truth — all pairs
    // whose shingle-set Jaccard clears the threshold, from the
    // inverted-index self-join over shingle hashes. Ground truth is
    // inherently quadratic in dup-cluster size, so the audit runs on a
    // deterministic md5-bucket SAMPLE of the corpus (the scale lever: a
    // fixed-rate audit is how you evaluate at 100 TB without paying the
    // full all-pairs bill); the sample gate, the band join, and the
    // Jaccard rescore are all mirrored in the oracle from the
    // ApproxOracle exports.
    "q139_dedup_eval" -> ((s, d) => {
      val sampled = documents(s, d)
        .withColumn("h", md5(col("doc_id").cast("string").cast("binary")))
        .withColumn("bkt",
          (expr("instr('0123456789abcdef', substr(h, 1, 1))") - 1) * 16 +
           expr("instr('0123456789abcdef', substr(h, 2, 1))") - 1)
        .filter(col("bkt") < DedupEvalBuckets)
        .select(col("doc_id"), col("text"))
      val sh = MinHashLSH.shingleHashes(sampled)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = sh.as("a").join(sh.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("ci"))
      val truth = inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .withColumn("jaccard", round(
          col("ci").cast("double") / (col("na") + col("nb") - col("ci")), 4))
        .filter(col("jaccard") >= ApproxOracle.MinJaccard)
        .select(col("doc_a"), col("doc_b"))
      val bands = MinHashLSH.bandsOf(sampled)
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      val hit = cand.join(truth, Seq("doc_a", "doc_b"))
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .select(col("n_truth"), col("n_cand"), col("n_hit"),
          when(col("n_cand") > 0,
            col("n_hit").cast("double") / col("n_cand")).otherwise(1.0)
            .as("cand_precision"),
          when(col("n_truth") > 0,
            col("n_hit").cast("double") / col("n_truth")).otherwise(1.0)
            .as("cand_recall"))
    }),

    // SimHash 64-bit signature per doc (L2 family). Oracle: Verify
    // exports each doc's token-hash multiset and DuckDB recomputes the
    // per-bit majority vote + packing in SQL (ApproxOracle).
    "q26_simhash" -> ((s, d) =>
      SimHash.signatures(documents(s, d)).select(col("doc_id"), col("simhash"))),

    // Hamming top-k search over the q26 SimHash signatures — the BINARY
    // rung of the compression ladder (PQ q95 codes subspaces, SQ8 q98
    // codes dimensions; a binary signature codes the whole document in
    // 64 bits, and ranking is XOR + popcount — the cheapest rescore
    // there is, which is the published reason binary codes exist:
    // Charikar '02 similarity estimation, Manku '07 web dedup). Probes
    // broadcast against the one-projection signature table, the rank
    // runs the two-phase GroupedTopK tail, and every score is an
    // INTEGER — the one ANN family member with zero cross-engine float
    // surface. Radius-style search (hamming ≤ k) would ride q38's
    // block-combination pruning; top-k has no radius to prune by, and
    // brute force over 64-bit codes at 8 bytes/doc IS the scale path
    // (the corpus signature table for 100 TB of text is ~tens of GB).
    // Feature hashing (the "hashing trick", Weinberger et al. 2009) —
    // the model-free text→vector ingest stage the ANN family implies:
    // each term's count lands in dimension xxhash64(term) mod D with a
    // hash-bit sign (the signed construction that makes collisions
    // cancel in expectation), giving every doc a D-dim vector with NO
    // trained vocabulary — the vectorizer production pipelines use when
    // an embedding model is too expensive or the vocab is unbounded.
    // Composed here end-to-end: hash → dense vector → cosine top-k vs
    // doc 0's vector (self lands rank 1 at cosine 1.0 — a built-in
    // sanity row). Scale shape: one tf aggregation (hashed longs, the
    // q85 posture), integer per-(doc, dim) sums — order-independent, so
    // no decimal routing needed — a map-lookup dense projection, and a
    // TakeOrdered cut; D is a constant so the vector column is bounded.
    // The oracle recomputes EVERYTHING from the exported per-occurrence
    // token hashes (the one engine-specific input): mod/sign/sum/dense
    // grid/cosine/cut all replayed relationally.
    "q101_feature_hash" -> ((s, d) => {
      // r15 (guide §2.4): the signed-tf vector is a pure per-document
      // function of the token array, but the relational form shuffled
      // token-scale rows THREE times (explode → (doc, term) tf →
      // (doc, dim) sum → collect_map per doc) for zero cross-document
      // information. One compiled kernel (FeatureHashVec — the same
      // xxhash64/seed-42, pmod and bit-32 sign, with sign·tf folded to
      // per-occurrence ±1) builds fv and nnz in the scan projection:
      // ZERO exchanges before the top-10 cut. Oracle (DuckDB re-derives
      // tf/mod/sign/grid/cosine from the hashed_tokens export)
      // unchanged — solo PASS; FeatureHashSpec pins kernel == the old
      // relational chain on random corpora.
      import org.apache.spark.sql.GraftSqlBridge.{column => toCol, expression => toExpr}
      // stacked projection: the struct is referenced twice (fv, nnz) —
      // keep the non-cheap producer in its own select (the SimHash hs
      // idiom) so it is computed once per doc
      val dense = documents(s, d)
        .select(col("doc_id"),
          toCol(graft.functions.FeatureHashVec(toExpr(toks), FeatureHashDim))
            .as("f"))
        .select(col("doc_id"), col("f.fv").as("fv"), col("f.nnz").as("nnz"))
      val qv = dense.filter(col("doc_id") === 0).select(col("fv"))
        .head().getSeq[Double](0)
      dense
        .withColumn("cos", graft.functions.VectorFunctions.cosine(
          array(qv.map(lit): _*), col("fv")))
        .orderBy(col("cos").desc, col("doc_id").asc)
        .limit(10)
        .select(col("doc_id"), col("nnz"), round(col("cos"), 4).as("cos"))
    }),

    "q100_hamming_ann" -> ((s, d) => {
      val sigs = SimHash.signatures(documents(s, d))
      val probes = sigs.filter(col("doc_id") < 10)
        .select(col("doc_id").as("probe_id"), col("simhash").as("psig"))
      val scored = sigs.join(broadcast(probes), col("doc_id") =!= col("probe_id"))
        .select(col("probe_id"), col("doc_id"),
          bit_count(col("psig").bitwiseXOR(col("simhash")))
            .cast("long").as("hamming"))
      GroupedTopK.topK(scored, Seq("probe_id"),
          Seq(col("hamming").asc, col("doc_id").asc), VectorQueries.AnnK)
        .select(col("probe_id"), col("doc_id").as("neighbor_id"),
                col("hamming"), col("rn").cast("long").as("rn"))
    }),

    // Two-stage retrieval: binary prefilter + exact float rerank — the
    // production deployment pattern for binary codes (the binary pass
    // is never the final answer; it SHORTLISTS). Stage 1 is q100's
    // XOR+popcount scan over the 8-byte signature table — at 100 TB of
    // text that table is tens of GB, the cheapest possible first pass —
    // cut to a HammingPool-deep pool per probe (integer-deterministic,
    // so the pool membership is cross-engine exact). Stage 2 touches
    // the full-precision embeddings ONLY for the pooled rows: the
    // bounded pool broadcasts INTO the embedding scan (the corpus never
    // shuffles), exact cosine, two-phase rank. Links text-side
    // signatures to vector-side embeddings by the corpus's
    // doc_id ↔ vec_id correspondence, like q99.
    "q102_binary_rerank" -> ((s, d) => {
      val sigs = SimHash.signatures(documents(s, d))
      val probes = sigs.filter(col("doc_id") < 10)
        .select(col("doc_id").as("probe_id"), col("simhash").as("psig"))
      val scored = sigs.join(broadcast(probes), col("doc_id") =!= col("probe_id"))
        .select(col("probe_id"), col("doc_id"),
          bit_count(col("psig").bitwiseXOR(col("simhash")))
            .cast("long").as("hamming"))
      val pool = GroupedTopK.topK(scored, Seq("probe_id"),
          Seq(col("hamming").asc, col("doc_id").asc), HammingPool, "rh")
        .drop("rh")
      val e = VectorQueries.emb(s, d)
      val pemb = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("emb").as("pemb"))
      val reranked = e.select(col("vec_id").as("doc_id"), col("emb"))
        .join(broadcast(pool), "doc_id")
        .join(broadcast(pemb), "probe_id")
        .select(col("probe_id"), col("doc_id"), col("hamming"),
          graft.functions.VectorFunctions.cosine(col("pemb"), col("emb"))
            .as("cos"))
      GroupedTopK.topK(reranked, Seq("probe_id"),
          Seq(col("cos").desc, col("doc_id").asc), VectorQueries.AnnK)
        .select(col("probe_id"), col("doc_id"), col("hamming"),
                round(col("cos"), 4).as("cos"), col("rn").cast("long").as("rn"))
    }),

    // Sliding-window chunking (L5): slice each document into
    // ChunkW-token windows every ChunkStride tokens (overlap 8) — the
    // retrieval/embedding ingest stage that turns documents into
    // unit-sized passages. Entirely within-row (sequence of starts →
    // slice → join), so the plan is ONE codegen'd projection + generate
    // with ZERO shuffles — at 100 TB it is a pure map over the corpus
    // scan, output ~n_tokens/stride rows per doc. chunk_id is the
    // ordinal of the window (start/stride), so chunks are addressable
    // without reading neighbors.
    "q103_chunking" -> ((s, d) => chunks(documents(s, d))),

    // Chunk-level exact dedup (L1 at passage granularity — the pass
    // production pipelines run between whole-doc exact dedup and fuzzy
    // dedup: boilerplate paragraphs repeat across documents that are
    // globally distinct). Rides q103's slicer; chunks group by
    // md5(chunk_text) (fixed-width keys — the q22/q53 doctrine), the
    // first occurrence under the (doc_id, chunk_id) total order is
    // canonical, every later copy is redundant; per-doc rollup. The
    // exact-string oracle doubles as the md5-collision check.
    "q111_chunk_dedup" -> ((s, d) => {
      val ch = chunks(documents(s, d))
        .select(col("doc_id"), col("chunk_id"), md5(col("chunk_text")).as("h"))
      val first = ch.groupBy(col("h"))
        .agg(min(struct(col("doc_id"), col("chunk_id"))).as("f"))
        .select(col("h"), col("f.doc_id").as("fdoc"), col("f.chunk_id").as("fchunk"))
      ch.join(first, "h")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("fdoc") === col("doc_id") &&
                   col("fchunk") === col("chunk_id"), 0L).otherwise(1L))
            .as("n_redundant"))
        .withColumn("redundant_frac",
          col("n_redundant").cast("double") / col("n_chunks"))
    }),

    // Cross-source duplication matrix (L2 × provenance — "which
    // sources copy from each other", the question a crawl curator asks
    // before trusting per-source mixture weights): distinct chunk
    // hashes per source (the q103/q111 chunker), md5-keyed self-join
    // over source pairs. Per hash the pair fan-out is ≤ sources² after
    // the per-source distinct — sources are hundreds, not corpus-
    // scale — and chunk TEXT dies at the md5 projection (q22/q53
    // doctrine). Integers end-to-end. Oracle: the chunk CTE + the same
    // distinct/self-join over exact chunk strings (= collision check).
    "q132_source_overlap" -> ((s, d) => {
      val docs = documents(s, d)
      val sc = chunks(docs)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .select(col("source"), md5(col("chunk_text")).as("h"))
        .distinct()
        .localCheckpoint() // three consumers: per-source counts + legs
      val per = sc.groupBy(col("source")).agg(count(lit(1)).as("n"))
      sc.select(col("source").as("src_a"), col("h"))
        .join(sc.select(col("source").as("src_b"), col("h")), Seq("h"))
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_shared"))
        .join(broadcast(per.select(col("source").as("src_a"),
          col("n").as("na"))), "src_a")
        .join(broadcast(per.select(col("source").as("src_b"),
          col("n").as("nb"))), "src_b")
        .select(col("src_a"), col("src_b"), col("n_shared"),
          col("na"), col("nb"))
    }),

    // Quality scoring (L5): punctuation ratio, stopword ratio, mean
    // token length — the usual pretraining-corpus filters. Ratios are
    // emitted UNROUNDED: both engines derive them from identical ints
    // with one IEEE division, so the doubles are bit-identical, whereas
    // query-level round() near a tie diverges between engines (Spark
    // rounds the shortest decimal repr, DuckDB the true binary value).
    "q27_quality_score" -> ((s, d) => {
      val stop = array(Seq("the", "a", "an", "of", "and", "or", "is",
        "to", "in", "that").map(lit): _*)
      documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          size(toks).cast("long").as("n_tokens"),
          (length(regexp_replace(col("text"), "[^.,!?;:]", ""))
            .cast("double") / col("n_chars").cast("double")).as("punct_ratio"),
          (size(filter(toks, t => array_contains(stop, t))).cast("double") /
            size(toks).cast("double")).as("stop_ratio"),
          ((length(col("text")) - size(toks) + 1).cast("double") /
            size(toks).cast("double")).as("avg_token_len"))
    }),

    // Length distribution per lang: exact interpolated percentiles.
    "q28_length_percentiles" -> ((s, d) => {
      documents(s, d)
        .groupBy(col("lang"))
        .agg(round(expr("percentile(n_chars, 0.5)"), 2).as("p50"),
             round(expr("percentile(n_chars, 0.9)"), 2).as("p90"),
             round(expr("percentile(n_chars, 0.99)"), 2).as("p99"))
    }),

    // Composed pretraining-corpus pipeline (L1+L5 end-to-end): exact
    // dedup (keep lowest doc_id per content hash) -> length band ->
    // stopword-ratio quality floor -> per-lang survivor stats. One
    // declarative plan; Catalyst fuses the filters and both aggs.
    "q48_corpus_pipeline" -> ((s, d) => {
      val docs = documents(s, d)
      val keep = docs
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      val stopRatio =
        size(filter(toks, t => array_contains(
          array(Seq("the", "a", "an", "of", "and", "or", "is", "to", "in",
            "that").map(lit): _*), t))).cast("double") /
          size(toks).cast("double")
      docs.join(keep, "doc_id")
        .filter(col("n_chars") >= 80 && col("n_chars") <= 5000)
        .withColumn("sr", stopRatio)
        .filter(col("lang") =!= "en" || col("sr") >= 0.02)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_chars")).as("total_chars"),
             sum(size(toks)).cast("long").as("total_tokens"))
    }),

    // Exact n-gram Jaccard near-dup pairs (L2, the EXACT member of the
    // dedup family): trigram shingles, prefix-filtered inverted-index
    // self-join, exact rescore — never n². Pure SQL oracle below redoes
    // the UNFILTERED all-pairs join, so the comparison also proves the
    // prefix filter loses nothing.
    "q53_ngram_neardup" -> ((s, d) =>
      NgramJoin.similarPairs(documents(s, d), NgramN, NgramMinJ)),

    // (q53's own entry deliberately does NOT read the memoized stage:
    // its benched time must stay the true cost of the pair join.)

    // Exact n-gram CONTAINMENT pairs (L2, the asymmetric member):
    // detects a short doc quoted (near-)whole inside a longer one,
    // which Jaccard's union term hides. Probe-side prefix filter +
    // full inverted index on the containing side, exact rescore.
    // Oracle: the UNFILTERED directed all-pairs join — proving the
    // probe-only prefix filter and the size gate lose nothing.
    "q123_containment" -> ((s, d) =>
      NgramJoin.containedPairs(documents(s, d), NgramN, ContainMinC)),

    // Dup-cluster resolution (L2 end-game): near-dup pairs → connected
    // components (alternating large-star/small-star) → keep the best
    // doc per cluster (longest, then lowest id). Oracle: DuckDB
    // recomputes components via a recursive transitive-closure CTE.
    // The pair stage comes MATERIALIZED from `ngramPairsStage`: a real
    // pipeline stages its dedup pairs once and composes on them, and
    // without the shared stage the bench double-counts q53's
    // prefix-filter join inside q54's time.
    "q54_dup_clusters" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = documents(s, d)
      val pairs = ngramPairsStage(s, d)
      val lab = ConnectedComponents.labels(s,
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      lab.join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("comp_id"))
            .orderBy(col("n_chars").desc, col("doc_id").asc)))
        .groupBy(col("comp_id"))
        .agg(count(lit(1)).as("n_members"),
             min(when(col("rn") === 1, col("doc_id"))).as("keep_id"))
    }),

    // Canonical-doc selection per dup cluster (L2 — q54's resolution
    // rule made CONTENT-AWARE, the way production dedup actually picks
    // survivors: keep the most lexically DIVERSE member, not merely
    // the longest; a boilerplate-padded page outranks its original on
    // length but not on distinct-token ratio). Clusters are the q54
    // machinery verbatim (staged ngram pairs + star-contraction CC);
    // quality is the exact integer mass n_distinct·10⁶ DIV n_toks, the
    // argmax the (div_ppm DESC, doc_id ASC) total order. Oracle: the
    // q54 recursive-closure CTE extended with the same diversity rank.
    "q190_canonical_docs" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = documents(s, d)
      val pairs = ngramPairsStage(s, d)
      val lab = ConnectedComponents.labels(s,
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      val q = docs.select(col("doc_id"), toks.as("ts"))
        .select(col("doc_id"),
          expr(s"CAST(size(array_distinct(ts)) AS BIGINT) * $CanonMass" +
            " DIV size(ts)").as("div_ppm"))
      lab.join(q, "doc_id")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("comp_id"))
            .orderBy(col("div_ppm").desc, col("doc_id").asc)))
        .groupBy(col("comp_id"))
        .agg(count(lit(1)).as("n_members"),
          min(when(col("rn") === 1, col("doc_id"))).as("canonical_id"),
          max(col("div_ppm")).as("best_div_ppm"),
          (count(lit(1)) - 1).as("n_dropped"))
    }),

    // Dedup threshold-sensitivity sweep (D16 — the "how much does the
    // knob matter" audit run before committing a corpus to one Jaccard
    // bar): the q25 banded-candidate + exact-rescore pairs, bucketed
    // against a fixed threshold ladder in ONE pass (each pair explodes
    // to the ≤5 thresholds it clears); per threshold the surviving
    // pair count, the distinct docs touched, and the share of the
    // base-threshold pairs. Jaccard compares as the EXACT ppm integer
    // (round(j·10⁶)) — a raw float ≥ against 0.7 would silently fail
    // on the 0.699999… double. Explicit ladder grid so empty rungs
    // still report.
    "q196_dedup_sweep" -> ((s, d) => {
      import s.implicits._
      val pairs = MinHashLSH.verifiedPairs(
          documents(s, d).select(col("doc_id"), col("text")),
          ApproxOracle.MinJaccard)
        .withColumn("j_ppm",
          expr(s"CAST(round(jaccard * $CanonMass) AS BIGINT)"))
        .localCheckpoint() // feeds the ladder explode + the base count
      val cleared = pairs
        .withColumn("thr_ppm", explode(typedLit(SweepThresholdsPpm)))
        .filter(col("j_ppm") >= col("thr_ppm"))
        .localCheckpoint() // feeds the pair count + the doc count
      val np = cleared.groupBy(col("thr_ppm"))
        .agg(count(lit(1)).as("n_pairs"))
      val nd = cleared.select(col("thr_ppm"),
          explode(array(col("doc_a"), col("doc_b"))).as("doc"))
        .groupBy(col("thr_ppm")).agg(countDistinct(col("doc")).as("n_docs"))
      val base = pairs.agg(count(lit(1)).as("n_base"))
      SweepThresholdsPpm.toDF("thr_ppm")
        .join(np, Seq("thr_ppm"), "left")
        .join(nd, Seq("thr_ppm"), "left")
        .crossJoin(broadcast(base))
        .select(col("thr_ppm"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs"),
          when(col("n_base") === 0, lit(0.0)).otherwise(
            coalesce(col("n_pairs"), lit(0L)).cast("double") /
              col("n_base")).as("pair_frac"))
    }),

    // Token-budget water-filling (L5 — the allocation step of data
    // mixing under a budget: given B tokens to keep, each language
    // gets min(its supply, a common level) with the level chosen so
    // allocations total B — the classic water-fill, in CLOSED
    // RELATIONAL FORM over the language-bounded table: sort by supply
    // ascending, a language saturates iff supply·remaining ≤
    // remaining-budget (integer cross-multiply — saturation is a
    // PREFIX of the ascending order by the standard exchange
    // argument), the first non-saturating row fixes the level as ONE
    // integer division, floor remainder ≤ k−1 tokens documented. No
    // iteration, no driver loop — one fact rollup, then windows over
    // ≤|langs| rows. */
    "q191_token_budget" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val avail = documents(s, d)
        .select(col("lang"), size(toks).cast("long").as("n_toks"))
        .groupBy(col("lang")).agg(sum(col("n_toks")).as("avail"))
        .localCheckpoint() // |langs| rows; feeds totals + the fill
      val tot = avail.agg(sum(col("avail")).as("total"),
        count(lit(1)).as("k"))
      val ord = Window.orderBy(col("avail").asc, col("lang").asc)
      val ranked = avail.crossJoin(broadcast(tot))
        .withColumn("b", expr(s"total * $BudgetNum DIV $BudgetDen"))
        .withColumn("rn", row_number().over(ord).cast("long"))
        .withColumn("s_excl", coalesce(sum(col("avail")).over(
          ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("saturated",
          col("avail") * (col("k") - col("rn") + 1) <= col("b") - col("s_excl"))
        .localCheckpoint() // feeds the level pick + the output
      val level = ranked.agg(
        min(when(!col("saturated"),
          struct(col("rn"), expr("(b - s_excl) DIV (k - rn + 1)").as("lv"))))
          .as("first"))
        .select(coalesce(col("first.lv"), lit(Long.MaxValue)).as("level"))
      ranked.crossJoin(broadcast(level))
        .select(col("lang"), col("avail"), col("b").as("budget"),
          col("saturated"),
          when(col("saturated"), col("avail")).otherwise(col("level"))
            .as("alloc"))
    }),

    // Greedy max-coverage selection (L5 — Nemhauser/Wolsey's (1−1/e)
    // greedy, the "pick K docs that cover the most distinct content"
    // step behind seed-corpus and eval-set construction): coverage
    // units are word TRIGRAMS (the q109 novelty unit — the harness
    // token vocabulary is only ~31 words, which one doc covers
    // entirely; trigrams number ~16k and make the greedy genuinely
    // iterate). SetCoverRounds driver-paced rounds (the q70 BPE-merge
    // pattern), each one anti-join (drop covered grams) + one count
    // rollup + one TakeOrdered argmax under the (gain DESC, doc_id
    // ASC) total order. The covered set stays a gram-bounded TABLE
    // (never driver memory); picked ids are excluded explicitly so a
    // zero-gain re-pick is impossible. Oracle: the same rounds
    // unrolled as generated CTEs over exact gram STRINGS — doubling
    // as the xxhash64 losslessness check (q85 doctrine).
    "q192_set_cover" -> ((s, d) => {
      import s.implicits._
      val dt = documents(s, d)
        .select(col("doc_id"), toks.as("ts"))
        .filter(size(col("ts")) >= 3)
        .select(col("doc_id"),
          explode(array_distinct(tokenTrigrams(col("ts")))).as("tok"))
        .select(col("doc_id"), xxhash64(col("tok")).as("th"))
        .localCheckpoint() // feeds every round's gain scan
      var covered: DataFrame = null
      val picks = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)]
      var coveredTotal = 0L
      (1 to SetCoverRounds).foreach { r =>
        val pickedIds = picks.map(_._2)
        val remaining =
          (if (covered == null) dt
           else dt.join(covered, Seq("th"), "left_anti"))
            .filter(!col("doc_id").isInCollection(
              if (pickedIds.isEmpty) Seq(-1L) else pickedIds))
        val top = remaining.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("doc_id").asc)
          .limit(1).collect()
        require(top.nonEmpty,
          s"set-cover round $r found no doc with uncovered tokens — " +
            "corpus vocabulary exhausted below SetCoverRounds")
        val (docId, gain) = (top(0).getLong(0), top(0).getLong(1))
        coveredTotal += gain
        picks += ((r.toLong, docId, gain, coveredTotal))
        val newCov = dt.filter(col("doc_id") === docId).select(col("th"))
        covered =
          (if (covered == null) newCov else covered.union(newCov))
            .distinct().localCheckpoint()
      }
      picks.toSeq.toDF("round", "doc_id", "gain", "covered_total")
    }),

    // Dedup yield accounting (L2 — the curation ledger every corpus
    // release ships: how many docs/tokens survive the near-dup ladder,
    // per source): q54's clusters with its keep rule (longest, then
    // lowest id); a doc is kept iff unclustered OR the cluster keeper.
    // One CC, one rank window over cluster members, one source rollup;
    // yields as exact ppm integer masses, shares one division each.
    "q203_dedup_yield" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"),
          size(toks).cast("long").as("n_toks"))
        .localCheckpoint() // feeds the keep join + the rollup
      val pairs = ngramPairsStage(s, d)
      val lab = ConnectedComponents.labels(s,
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      val keep = lab.join(docs.select(col("doc_id"), col("n_chars")),
          "doc_id")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("comp_id"))
            .orderBy(col("n_chars").desc, col("doc_id").asc)))
        .select(col("doc_id"), (col("rn") === 1).as("is_keeper"))
      docs.join(keep, Seq("doc_id"), "left")
        .select(col("source"), col("n_toks"),
          coalesce(col("is_keeper"), lit(true)).as("kept"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(col("n_toks")).as("tokens_total"),
          sum(when(col("kept"), col("n_toks")).otherwise(0L))
            .as("tokens_kept"))
        .select(col("source"), col("n_docs"), col("n_kept"),
          col("tokens_total"), col("tokens_kept"),
          expr(s"tokens_kept * $CanonMass DIV tokens_total")
            .as("token_yield_ppm"),
          expr(s"n_kept * $CanonMass DIV n_docs").as("doc_yield_ppm"))
    }),

    // TF-IDF top term per doc (L5). idf here is the RATIONAL N/df
    // (no log dampening): every score is then one IEEE multiply +
    // divide over exact integers, so Spark and DuckDB produce
    // bit-identical doubles — a transcendental ln() differs in ulps
    // between libm implementations and would poison the hash compare.
    // Ranking order is unaffected for a fixed tf (N/df is monotone in
    // 1/df exactly like ln(N/df)).
    "q55_tfidf_terms" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = documents(s, d)
      val tf = docs.select(col("doc_id"), explode(toks).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfr = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      tf.join(dfr, "term").crossJoin(broadcast(n))
        .withColumn("score", col("tf").cast("double") * col("n") / col("df"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term").asc)))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("term").as("top_term"),
                col("tf"), col("df"), col("score"))
    }),

    // Deterministic hash-based train/val/test split (80/10/10): bucket
    // by the first md5 byte of the doc id — stable under reordering,
    // re-partitioning, and incremental re-runs, unlike randomSplit.
    "q56_train_split" -> ((s, d) => {
      documents(s, d)
        .withColumn("h", md5(col("doc_id").cast("string").cast("binary")))
        .withColumn("bkt",
          (expr("instr('0123456789abcdef', substr(h, 1, 1))") - 1) * 16 +
           expr("instr('0123456789abcdef', substr(h, 2, 1))") - 1)
        .withColumn("split", when(col("bkt") < 204, "train")
          .when(col("bkt") < 230, "val").otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_chars")).as("total_chars"))
    }),

    // Stratified per-language sample (k docs per lang), deterministic:
    // rank docs inside each language by md5(doc_id) — an unbiased,
    // reproducible draw with no RNG state to coordinate across
    // executors or reruns. Ranking goes through the two-phase
    // GroupedTopK: a plain per-lang window is one reducer per language
    // (five groups over the whole corpus at 100 TB).
    "q57_stratified_sample" -> ((s, d) => {
      GroupedTopK.topK(
        documents(s, d)
          .withColumn("h", md5(col("doc_id").cast("string").cast("binary"))),
        Seq("lang"), Seq(col("h").asc, col("doc_id").asc), 20)
        .select(col("lang"), col("doc_id"), col("n_chars"))
    }),

    // BPE-ish token counting (L5 — the pretraining budget metric):
    // a GPT-2-style pretokenizer regex (contraction suffixes, space-
    // prefixed letter/digit/punctuation runs) alongside the whitespace
    // count. The pattern stays in the RE2-compatible subset so Spark's
    // Java regex and DuckDB's RE2 tokenize identically.
    "q62_bpe_tokens" -> ((s, d) => {
      documents(s, d)
        .select(col("doc_id"),
          size(expr(s"regexp_extract_all(text, '$BpePattern', 0)"))
            .cast("long").as("n_bpe_tokens"),
          size(toks).cast("long").as("n_ws_tokens"))
    }),

    // Sequence packing (contiguous variant): assign docs to fixed
    // token-budget chunks per language via a prefix sum — the
    // deterministic shape of LLM-pretraining sequence packing (greedy
    // bin packing is inherently sequential; contiguous packing after a
    // global shuffle is what pipelines actually run). The cumulative
    // sum runs through ScanSum's two-pass distributed scan: a plain
    // `Window.partitionBy(lang)` would funnel each of the FIVE
    // languages through one reducer — the q58 plan would not survive
    // 100x data. The oracle recomputes with the naive window (DuckDB's
    // single node doesn't care), so the scan's correctness is re-proven
    // every round.
    "q58_sequence_pack" -> ((s, d) => {
      val tok = documents(s, d)
        .select(col("lang"), col("doc_id"), size(toks).cast("long").as("n_tokens"))
      ScanSum.runningSum(tok, "lang", "doc_id", "n_tokens")
        .withColumn("chunk_id", floor((col("cum") - 1) / 4096))
        .groupBy(col("lang"), col("chunk_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("chunk_tokens"))
    }),

    // Intra-doc repetition ratio (Gopher-style quality filter): share
    // of trigram occurrences that are repeats of an earlier trigram in
    // the same doc. Integer counts + one IEEE division — exact oracle.
    "q59_repetition" -> ((s, d) => {
      val tris = tokenTrigrams(col("ts"))
      documents(s, d)
        .select(col("doc_id"), toks.as("ts"))
        .filter(size(col("ts")) >= 3)
        .select(col("doc_id"),
          size(tris).cast("long").as("n_trigrams"),
          size(array_distinct(tris)).cast("long").as("n_distinct"))
        .withColumn("rep_ratio",
          lit(1.0) - col("n_distinct").cast("double") / col("n_trigrams").cast("double"))
    }),

    // BPE merge learning (L5 — tokenizer TRAINING; q62 counts with a
    // learned-tokenizer-shaped regex, this learns one): BpeMerges
    // rounds of distributed pair-count + global argmax over the
    // weighted word vocabulary. The result is the model-sized merge
    // table. Oracle: Verify exports each round's word-state
    // (ApproxOracle) and DuckDB recomputes every round's argmax
    // independently.
    "q70_bpe_merges" -> ((s, d) => {
      import s.implicits._
      BpeLearn.learnFromDocs(documents(s, d), BpeMerges)
        .zipWithIndex
        .map { case (((a, b), cnt), i) => (i.toLong, a, b, cnt) }
        .toDF("rank", "a", "b", "cnt")
    }),

    // Tokenizer APPLICATION (L5 — the encode half q70 learns for):
    // corpus tokenized with the learned merges, rolled up per lang.
    // The sequential fold runs ONCE per distinct word (bpeEncodedStage,
    // language-bounded); the corpus side is a plain (lang, word) count
    // that joins the encoded vocab by xxhash64(word) — fixed-width
    // keys, and the oracle joins by the exact strings so a collision
    // would fail the hash compare (q85 doctrine). At 100 TB the corpus
    // pass dominates and the encode stage stays a small-table job.
    "q87_bpe_encode" -> ((s, d) => {
      val wc = documents(s, d)
        .select(col("lang"), explode(toks).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("n"))
        .select(col("lang"), xxhash64(col("word")).as("wh"), col("n"),
          length(col("word")).cast("long").as("wlen"))
      val enc = bpeEncodedStage(s, d)
        .select(xxhash64(col("word")).as("wh"), col("n_tokens"))
      wc.join(enc, "wh")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_words"),
             sum(col("n")).as("word_occurrences"),
             sum(col("n") * col("n_tokens")).as("total_tokens"),
             sum(col("n") * col("wlen")).as("total_chars"))
        .withColumn("tokens_per_word",
          col("total_tokens").cast("double") / col("word_occurrences"))
    }),

    // Heuristic language ID (L5): stopword-profile scoring vs the
    // labeled lang column. The scoring is plain counting + argmax, so it
    // gets a REAL DuckDB oracle (generated from the same profiles —
    // see langIdOracle); accuracy asserted in LangIdSpec.
    "q29_lang_id" -> ((s, d) => {
      LangId.predict(documents(s, d))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
    }),

    // Benchmark decontamination (L5 — the eval-hygiene pass every
    // pretraining pipeline runs): a held-out "benchmark" slice
    // (doc_id % 97 == 0) defines a token-trigram blocklist; every other
    // doc reports how many distinct trigrams it shares with it. The
    // benchmark gram set is tiny relative to the corpus (real eval sets
    // are a few MB against 100 TB), so it BROADCASTS — the corpus side
    // is one narrow scan + map-side semi join, no shuffle of the grams.
    "q63_decontaminate" -> ((s, d) => {
      val tris = tokenTrigrams(col("ts"))
      val g = documents(s, d)
        .select(col("doc_id"), col("lang"), toks.as("ts"))
        .filter(size(col("ts")) >= 3)
        .select(col("doc_id"), col("lang"),
                explode(array_distinct(tris)).as("g"))
      val bench = g.filter(col("doc_id") % 97 === 0).select(col("g")).distinct()
      val hits = g.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), "g")
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("shared")) // grams are per-doc distinct
      val perLang = hits.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_contaminated"), sum(col("shared")).as("shared_grams"))
      documents(s, d).filter(col("doc_id") % 97 =!= 0)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        .join(perLang, Seq("lang"), "left")
        .select(col("lang"), col("n_docs"),
          coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
          coalesce(col("shared_grams"), lit(0L)).as("shared_grams"))
    }),

    // BM25 top term per doc (L5) — q55's tf-idf with doc-length
    // normalization (k1=1.5, b=0.75: both exactly representable
    // doubles). idf stays the RATIONAL N/df and every factor is applied
    // in one fixed left-associated chain, mirrored character-for-
    // character in the oracle, so the scores are bit-identical without
    // rounding. avgdl is an exact long sum with ONE division.
    "q64_bm25" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = documents(s, d)
      // dl derives from tf (Σ tf per doc == token count) instead of
      // riding in the grouping key: with dl in the key, column pruning
      // makes the tf subtree under dfr DIFFER from the main one and the
      // shuffle is computed twice; identical subtrees share one
      // exchange (measured 4x on the bench).
      val tf = docs
        .select(col("doc_id"), explode(toks).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
        .withColumn("dl", sum(col("tf")).over(Window.partitionBy(col("doc_id"))))
      val dfr = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val stats = docs.agg(count(lit(1)).as("n"),
        (sum(size(toks)).cast("double") / count(lit(1))).as("avgdl"))
      tf.join(dfr, "term").crossJoin(broadcast(stats))
        .withColumn("score",
          col("tf").cast("double") * lit(2.5) /
            (col("tf").cast("double") + lit(0.375) +
             lit(1.125) * (col("dl").cast("double") / col("avgdl"))) *
            col("n").cast("double") / col("df").cast("double"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term").asc)))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("term").as("top_term"),
                col("tf"), col("df"), col("score"))
    }),

    // Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    // 2003 — the MOSS algorithm; L2's POSITION-AWARE member, beside
    // MinHash's set sketch): per doc, hash every char 5-gram, slide a
    // width-4 window, keep each window's minimal hash (rightmost on
    // ties — the "robust winnowing" rule), and report doc pairs
    // sharing ≥ WinnowMinShared distinct selected hashes. The
    // guarantee MinHash cannot give: ANY shared substring of ≥ 8
    // chars is detected. Selection is per-row higher-order-function
    // work (zero shuffle — hashes, windows, and the fold all stay
    // inside one projection); only the ≤ L/w selected fingerprints
    // reach the hash-keyed pair join, and fingerprints selected by
    // more than WinnowMaxDf docs are dropped first (MOSS's common-code
    // rule — also the bound that keeps the join ≤ MaxDf² pairs per
    // hash instead of n² on a shared-vocabulary corpus). Hashes are
    // 12-hex-digit md5
    // prefixes (the q86 idiom) so the oracle replays the SAME values
    // and the SAME argmin — selection, not just membership, is
    // cross-checked.
    "q128_winnowing" -> ((s, d) => winnowedPairs(documents(s, d))),

    // Exact phrase search via a POSITIONAL inverted index (the
    // retrieval op BM25's bag-of-words scoring cannot express): find
    // every occurrence of the corpus's PhraseTopQ most-frequent word
    // trigrams by chaining (doc_id, pos+k) equi-joins over the
    // positional index — the classic search-engine phrase plan.
    // Tokens travel as xxhash64 longs (fixed-width shuffles, q53
    // doctrine); the phrase table is a broadcast ≤ PhraseTopQ rows.
    // Scale: each join leg keys on (doc_id, pos) — uniform, never
    // skewed; leg 1 is pre-filtered to the first word's postings, so
    // candidate volume is the postings volume of the query terms, not
    // the corpus. Oracle: the scan-side recomputation over exact
    // STRINGS (occurrence counting by start position — also the
    // collision check for the hashed index).
    "q126_phrase_search" -> ((s, d) => {
      val docs = documents(s, d)
      val toksArr = split(trim(col("text")), "\\s+")
      val idx = docs.select(col("doc_id"), posexplode(toksArr))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
                xxhash64(col("col")).as("tok"))
        .localCheckpoint() // three join legs read it
      val occ = docs.select(col("doc_id"), toksArr.as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(explode(transform(sequence(lit(0), size(col("toks")) - 3),
          i => concat_ws(" ", element_at(col("toks"), i + 1),
            element_at(col("toks"), i + 2), element_at(col("toks"), i + 3))))
          .as("phrase"))
      val top = occ.groupBy(col("phrase")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("phrase").asc).limit(PhraseTopQ)
        .withColumn("pw", transform(split(col("phrase"), " "), w => xxhash64(w)))
        .select(col("phrase"), col("pw"))
      val i1 = idx.select(col("doc_id").as("d1"), col("pos").as("p1"),
        col("tok").as("t1"))
      val i2 = idx.select(col("doc_id").as("d2"), col("pos").as("p2"),
        col("tok").as("t2"))
      idx.join(broadcast(top), col("tok") === element_at(col("pw"), 1))
        .join(i1, col("d1") === col("doc_id") && col("p1") === col("pos") + 1)
        .filter(col("t1") === element_at(col("pw"), 2))
        .join(i2, col("d2") === col("doc_id") && col("p2") === col("pos") + 2)
        .filter(col("t2") === element_at(col("pw"), 3))
        .groupBy(col("phrase"), col("doc_id"))
        .agg(count(lit(1)).as("n_occ"))
    }),

    // PII / identifier scrubbing over event-log payloads (L5 — logs are
    // a training-data source and numeric ids, emails and URLs must come
    // out before training). Pure regexp built-ins (codegen'd, one narrow
    // pass); patterns stay in the RE2 ∩ Java-regex subset with NO
    // backslash escapes (SQL string literals would eat them) so Spark
    // and DuckDB match identical spans.
    "q66_pii_scrub" -> ((s, d) => {
      val scrubbed = Seq(PiiEmail, PiiUrl, PiiNum)
        .foldLeft(col("props"))((c, re) => regexp_replace(c, re, ""))
      events(s, d)
        .withColumn("n_num", size(expr(s"regexp_extract_all(props, '$PiiNum', 0)")))
        .withColumn("n_email", size(expr(s"regexp_extract_all(props, '$PiiEmail', 0)")))
        .withColumn("n_url", size(expr(s"regexp_extract_all(props, '$PiiUrl', 0)")))
        .withColumn("redacted", length(col("props")) - length(scrubbed))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
             sum(col("n_num")).cast("long").as("n_numeric"),
             sum(col("n_email")).cast("long").as("n_emails"),
             sum(col("n_url")).cast("long").as("n_urls"),
             sum(col("redacted")).cast("long").as("chars_redacted"))
    }),

    // Domain-mixing downsampler (L5 — q68 plans the mix, this enforces
    // it): each language keeps docs with probability
    // p = min(1, target_share / actual_share), decided per doc by the
    // SAME md5 bucket as the q56 split — deterministic, coordination-
    // free, stable under re-runs and re-partitioning. The comparison is
    // INTEGER (bucket < floor(p*256)), so both engines agree exactly
    // even though p is a computed double.
    "q69_domain_mix" -> ((s, d) => {
      val targets = Seq("de" -> 0.15, "en" -> 0.4, "es" -> 0.15,
        "fr" -> 0.15, "zh" -> 0.15)
      val tgt = targets.map { case (l, t) =>
        struct(lit(l).as("lang"), lit(t).as("target"))
      }
      val targetDf = s.range(1)
        .select(explode(array(tgt: _*)).as("t"))
        .select(col("t.lang").as("lang"), col("t.target").as("target"))
      val docs = documents(s, d)
      val perLang = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
      val total = docs.agg(count(lit(1)).as("n_total"))
      val thr = perLang.join(broadcast(targetDf), "lang")
        .crossJoin(broadcast(total))
        .withColumn("p", least(lit(1.0),
          col("target") * col("n_total").cast("double") / col("n_lang").cast("double")))
        .withColumn("thr", floor(col("p") * 256).cast("int"))
      docs
        .withColumn("h", md5(col("doc_id").cast("string").cast("binary")))
        .withColumn("bkt",
          (expr("instr('0123456789abcdef', substr(h, 1, 1))") - 1) * 16 +
           expr("instr('0123456789abcdef', substr(h, 2, 1))") - 1)
        .join(broadcast(thr.select(col("lang"), col("n_lang"), col("thr"))), "lang")
        .groupBy(col("lang"), col("n_lang"))
        .agg(sum(when(col("bkt") < col("thr"), 1L).otherwise(0L)).as("n_kept"))
        .select(col("lang"), col("n_lang").as("n_docs"), col("n_kept"))
    }),

    // Source-fingerprint similarity (L5 — the distribution-shift matrix
    // a mixture designer reads before weighting sources): cosine
    // between every source pair's unigram count vectors. Counts stay
    // BIGINTs keyed by xxhash64(term) (fixed-width, order-independent
    // sums); the pair dot is a token-keyed self-join of the per-source
    // profile (per token ≤ sources² contributions — sources are
    // hundreds, not corpus-scale), norms are per-source scalars, and
    // the ONE float op is the final dot/√(na²·nb²) — the same IEEE
    // expression on both engines over identical integers. Oracle
    // recomputes from exact strings (= the collision check).
    "q127_source_similarity" -> ((s, d) => {
      val cnts = documents(s, d)
        .select(col("source"), explode(toks).as("term"))
        .groupBy(col("source"), xxhash64(col("term")).as("tok"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // three consumers: norms + both join legs
      val norms = cnts.groupBy(col("source"))
        .agg(sum(col("c") * col("c")).as("n2"))
      val a = cnts.select(col("source").as("src_a"), col("tok"), col("c").as("ca"))
      val b = cnts.select(col("source").as("src_b"), col("tok"), col("c").as("cb"))
      a.join(b, Seq("tok")).filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(sum(col("ca") * col("cb")).as("dot"))
        .join(broadcast(norms.select(col("source").as("src_a"),
          col("n2").as("na2"))), "src_a")
        .join(broadcast(norms.select(col("source").as("src_b"),
          col("n2").as("nb2"))), "src_b")
        .select(col("src_a"), col("src_b"), col("dot"), col("na2"), col("nb2"),
          round(col("dot").cast("double") /
            sqrt(col("na2").cast("double") * col("nb2").cast("double")), 4)
            .as("cos"))
    }),

    // Temperature-flattened mixture resampling (L5 — the multilingual
    // α = 0.5 recipe of mBERT/XLM-R: sampling shares ∝ n_d^α so
    // low-resource domains are up-weighted relative to their share).
    // Per-language keep-probability p = min(1, T·w_d / (S·n_d)) with
    // w_d = ⌊√n_d⌋, S = Σw, T = half the corpus — derived ENTIRELY
    // from the corpus, unlike q69's fixed targets. Selection is the
    // same md5-bucket integer threshold as q69/q56: deterministic,
    // coordination-free, no rank window (the scalable exact-decision
    // sampler; quotas are hit in expectation, which is what temperature
    // sampling means). All threshold arithmetic is cross-multiplied
    // BIGINTs (⌊√n⌋ via one correctly-rounded IEEE sqrt both engines
    // share); 256·T·w stays inside int64 for corpora to ~10¹⁰ docs —
    // past that the documented widening is DECIMAL(38,0) on both
    // engines, same expressions.
    "q125_temperature_mix" -> ((s, d) => {
      val docs = documents(s, d)
      val perLang = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
      val tot = docs.agg(count(lit(1)).as("n_total"))
      val wgt = perLang.withColumn("w",
        floor(sqrt(col("n_lang").cast("double"))).cast("long"))
      val sw = wgt.agg(sum(col("w")).as("sw"))
      val thr = wgt.crossJoin(broadcast(tot)).crossJoin(broadcast(sw))
        .withColumn("thr", least(lit(256L),
          expr("(256 * (n_total DIV 2) * w) DIV (sw * n_lang)")))
        .select(col("lang"), col("n_lang"), col("w"), col("thr"))
      docs
        .withColumn("h", md5(col("doc_id").cast("string").cast("binary")))
        .withColumn("bkt",
          (expr("instr('0123456789abcdef', substr(h, 1, 1))") - 1) * 16 +
           expr("instr('0123456789abcdef', substr(h, 2, 1))") - 1)
        .join(broadcast(thr), "lang")
        .groupBy(col("lang"), col("n_lang"), col("w"), col("thr"))
        .agg(sum(when(col("bkt") < col("thr"), 1L).otherwise(0L)).as("n_kept"))
        .select(col("lang"), col("n_lang").as("n_docs"), col("w"),
                col("thr"), col("n_kept"))
    }),

    // Tokenizer-vocabulary coverage (L5 — the vocab-size sweep run
    // before training a subword tokenizer): rank character trigrams by
    // corpus frequency and report what fraction of all trigram
    // occurrences the top-V cover, V ∈ {50, 150, 300}. No global
    // window anywhere: only the top-maxV trigrams can matter to any
    // cut, and `orderBy.limit` plans as TakeOrderedAndProject
    // (per-partition top-k in executors, driver merge of ≤ k rows per
    // partition). Rank and running sum are then recovered over those
    // ≤ 300 survivors by a broadcast self-join counting/summing each
    // row's predecessors under the total order (cnt desc, g asc) —
    // 300×300 comparisons, independent of vocabulary size. This
    // matters beyond ASCII: for CJK corpora |charset|³ makes the
    // trigram vocabulary itself data-scaled, so funneling it through
    // one WindowExec task is the plan that dies at 100 TB.
    "q67_vocab_coverage" -> ((s, d) => {
      // explode the POSITIONS (an int array) and substring per output
      // row, instead of materializing an array of 3-char strings per
      // doc — same rows, far less per-row allocation
      val counts = documents(s, d).filter(length(col("text")) >= 3)
        .select(col("text"), explode(sequence(lit(1), length(col("text")) - 2)).as("i"))
        .select(expr("substring(text, i, 3)").as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      val maxV = 300
      val top = counts.orderBy(col("cnt").desc, col("g").asc).limit(maxV)
      val prior = top.select(col("g").as("g2"), col("cnt").as("cnt2"))
      // rn(a) = |{b : b ≼ a}|, cum(a) = Σ cnt(b) over b ≼ a — exact
      // row_number + inclusive running sum under the total order,
      // computed over the survivors instead of the full vocabulary
      val ranked = top.join(broadcast(prior),
          col("cnt2") > col("cnt") ||
            (col("cnt2") === col("cnt") && col("g2") <= col("g")))
        .groupBy(col("g"), col("cnt"))
        .agg(count(lit(1)).as("rn"), sum(col("cnt2")).as("cum"))
      val total = counts.agg(sum(col("cnt")).as("total"))
      val cuts = s.range(1)
        .select(explode(array(lit(50), lit(150), lit(300))).as("v"))
      ranked.join(broadcast(cuts), col("rn") <= col("v"))
        .groupBy(col("v")).agg(max(col("cum")).as("covered"))
        .crossJoin(broadcast(total))
        .select(col("v").cast("long").as("v"), col("covered"), col("total"),
          (col("covered").cast("double") / col("total").cast("double")).as("coverage"))
    }),

    // Zipf power-law diagnostic (the corpus-health check run before
    // mixing: natural text has token frequencies ≈ C·rank^slope with
    // slope ≈ -1; a badly deduplicated or template-heavy crawl bends
    // the curve). OLS fit of ln(cnt) on ln(rank) over the top-V tokens:
    // the top-V funnels through TakeOrderedAndProject (per-partition
    // top-k, never a global sort or window), rank is recovered by the
    // q67 broadcast self-join over the ≤V survivors, and every ln-sum
    // routes through DECIMAL (Num.dsum) so the moments are
    // accumulation-order independent. The closed-form slope/intercept/
    // r² are mirrored operand-for-operand in the oracle, so the doubles
    // agree to the bit.
    "q137_zipf_fit" -> ((s, d) =>
      zipfFitView(documents(s, d)
        .select(explode(toks).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt")))),

    // Budget-constrained corpus selection (L5j — fill a token budget
    // with the best documents, the mixing-under-budget step before
    // training): keep the maximal prefix of the (stop_ratio DESC,
    // doc_id ASC) quality order whose cumulative token count fits a
    // budget of 1/4 of all corpus tokens; report kept docs/tokens per
    // language. The oracle is the naive global-window cumsum; the
    // Spark plan never builds one. Exact two-phase threshold
    // selection: (1) one aggregation histograms token mass into 4097
    // quality bins (bin = floor(q*4096) is strictly monotone in q, so
    // bins are contiguous runs of the global order) and the driver
    // walks that BOUNDED table to find the boundary bin + remaining
    // budget; (2) bins above the boundary keep every row, and only the
    // boundary bin's rows (corpus/4096 in expectation) pay an exact
    // ordered prefix sum — via ScanSum's two-phase distributed scan,
    // so even an adversarial all-one-bin corpus never funnels through
    // a single reducer. Three passes over the corpus total — the
    // inherent cost of a global threshold, never a global sort.
    "q83_budget_select" -> ((s, d) => {
      val stop = array(Seq("the", "a", "an", "of", "and", "or", "is",
        "to", "in", "that").map(lit): _*)
      val scored = documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(toks).cast("long").as("toks"),
          (size(filter(toks, t => array_contains(stop, t))).cast("double") /
            size(toks).cast("double")).as("q"))
      val nBins = 4096
      val bin = floor(col("q") * nBins).cast("int")
      // bounded driver fetch: ≤ nBins+1 rows, like a centroid collect
      val hist = scored.groupBy(bin.as("bin"))
        .agg(sum(col("toks")).as("btoks"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(-_._1)
      val budget = hist.map(_._2).sum >> 2
      var acc = 0L; var boundary = Int.MinValue; var rem = budget
      var partial = false
      hist.foreach { case (b, t) =>
        if (!partial) {
          if (acc + t <= budget) acc += t
          else { boundary = b; rem = budget - acc; partial = true }
        }
      }
      val kept =
        if (!partial) scored // the whole corpus fits the budget
        else {
          val above = scored.filter(bin > boundary)
          val atBoundary = scored.filter(bin === boundary)
            .withColumn("__ord",
              struct((-col("q")).as("nq"), col("doc_id").as("id")))
            .withColumn("__g", lit(0))
          ScanSum.runningSum(atBoundary, "__g", "__ord", "toks")
            .filter(col("cum") <= rem)
            .select(above.columns.map(col): _*)
            .unionByName(above)
        }
      kept.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("toks")).as("tokens_kept"))
    }),

    // Training-data shard export (the pipeline's last mile — the WRITE
    // that ships a corpus to the trainer): 16 deterministic md5
    // shards, corpus materialized partitionBy(shard) once per session
    // (the layout a data loader consumes shard-by-shard, q79's
    // written-index pattern applied to export), and the query answers
    // per-shard accounting FROM THE WRITTEN LAYOUT — the oracle
    // recomputes the same accounting from the raw table, so every
    // round re-proves the export lost/duplicated nothing and the
    // shard hash balanced it.
    "q84_shard_export" -> ((s, d) => {
      s.read.parquet(shardExportDir(s, d))
        .groupBy(col("shard").cast("long").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_tokens")).as("total_tokens"),
             sum(col("n_chars")).as("total_chars"))
    }),

    // Fuzzy vocabulary join (L5dd — spelling-variant detection, the
    // cleanup pass every OCR/web corpus needs before token stats):
    // candidate pairs come from FastSS deletion neighborhoods (Bocek
    // et al. '07): every edit script of cost ≤ d decomposes into ≤ d
    // deletions on EACH side reaching a common string, so two tokens
    // within distance d always share a ≤d-deletion variant — the
    // neighborhood equi-join is LOSSLESS, never all-pairs, and
    // vocab·L²-bounded. Exact levenshtein verifies survivors (both
    // engines run textbook Wagner–Fischer — integer-exact). The
    // oracle is the brute O(vocab²) pair filter, so every run
    // re-proves the blocking lost nothing.
    "q206_fuzzy_vocab" -> ((s, d) => {
      val vocab = documents(s, d)
        .select(explode(toks).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      // ≤2-deletion neighborhood, enumerated with higher-order
      // functions (zero UDF surface): d1 = delete one char, d2 =
      // delete one more from each d1 member. The CASE guards the
      // empty string (sequence(1,0) would DESCEND, not return []).
      val nbr = vocab
        .withColumn("d1", expr(
          """transform(sequence(1, length(tok)),
             i -> concat(substr(tok, 1, i - 1),
                         substr(tok, i + 1, length(tok))))"""))
        .withColumn("d2", expr(
          """flatten(transform(d1, v ->
               CASE WHEN length(v) >= 1
                 THEN transform(sequence(1, length(v)),
                   i -> concat(substr(v, 1, i - 1),
                               substr(v, i + 1, length(v))))
                 ELSE array() END))"""))
        .select(col("tok"), col("n"),
          explode(array_distinct(concat(array(col("tok")), col("d1"),
            col("d2")))).as("v"))
        .localCheckpoint() // vocab·L² rows; feeds BOTH sides of the join
      nbr.select(col("v"), col("tok").as("tok_a"), col("n").as("n_a"))
        .join(nbr.select(col("v"), col("tok").as("tok_b"),
          col("n").as("n_b")), "v")
        .filter(col("tok_a") < col("tok_b"))
        .select(col("tok_a"), col("tok_b"), col("n_a"), col("n_b"))
        .distinct()
        .filter(levenshtein(col("tok_a"), col("tok_b")) <= FuzzyD)
        .select(col("tok_a"), col("tok_b"),
          levenshtein(col("tok_a"), col("tok_b")).cast("long").as("dist"),
          col("n_a"), col("n_b"))
    }),

    // Heaps'-law vocabulary-growth fit (L5ff — "how fast does new
    // vocabulary appear as the corpus grows": V(N) ≈ K·N^β, the
    // growth-planning companion to q137's Zipf fit; Heaps 1978). Over
    // the trigram vocabulary (the unit the dedup/coverage ops here
    // use). The growth CURVE costs no sort: a trigram enters the
    // vocabulary at its FIRST doc (min doc_id — the q210 first-seen
    // identity on the token axis), so V at any doc-id checkpoint is a
    // prefix count over 32 fixed id buckets, and N is the matching
    // prefix of per-bucket token mass — two bounded 32-row prefix
    // scans, never a corpus window. The log-log line then reuses the
    // q219 OLS closed form with ln values pinned to exact ppb
    // integers (round(ln·10⁹) — the q200/q214 decimal-ln trick made
    // integral), so all five sufficient statistics are exact
    // DECIMAL(38,0)/HUGEINT and β is ONE IEEE division. Emits the
    // exponent, the ln-intercept (no cross-engine exp), and the
    // final V/N. */
    "q227_heaps_fit" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val docs = documents(s, d)
        .select(col("doc_id"), toks.as("ts"))
        .filter(size(col("ts")) >= 3)
      val grams = docs.select(col("doc_id"),
        explode(tokenTrigrams(col("ts"))).as("g"))
      val span = docs.agg(min(col("doc_id")).as("mn"),
        (max(col("doc_id")) - min(col("doc_id")) + 1).as("w"))
      // bucket i ∈ [0, 31]: fixed doc-id stripes (exact integer DIV —
      // never float division on ids); checkpoint i = the corpus
      // prefix through stripe i
      val vNew = grams.groupBy(col("g")).agg(min(col("doc_id")).as("fdoc"))
        .crossJoin(broadcast(span))
        .groupBy(expr("CAST((fdoc - mn) * 32 DIV w AS INT)").as("b"))
        .agg(count(lit(1)).as("dv"))
      val nNew = grams.crossJoin(broadcast(span))
        .groupBy(expr("CAST((doc_id - mn) * 32 DIV w AS INT)").as("b"))
        .agg(count(lit(1)).as("dn"))
      val wc = Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // ≤32 rows from here on — every window/aggregate below is
      // geometry-bounded
      val pts = vNew.join(nNew, Seq("b"), "full")
        .select(col("b"), coalesce(col("dv"), lit(0L)).as("dv"),
          coalesce(col("dn"), lit(0L)).as("dn"))
        .withColumn("v", sum(col("dv")).over(wc))
        .withColumn("n", sum(col("dn")).over(wc))
        .filter(col("v") > 0 && col("n") > 0)
        .select(
          (log(col("n").cast("double")).cast(
            org.apache.spark.sql.types.DecimalType(20, 9)) *
            lit(1000000000L)).cast("long").as("x"),
          (log(col("v").cast("double")).cast(
            org.apache.spark.sql.types.DecimalType(20, 9)) *
            lit(1000000000L)).cast("long").as("y"),
          col("v"), col("n"))
      val fit = pts.agg(count(lit(1)).as("k"),
          sum(col("x")).cast(dec).as("sx"), sum(col("y")).cast(dec).as("sy"),
          sum(col("x").cast(dec19) * col("y").cast(dec19)).cast(dec).as("sxy"),
          sum(col("x").cast(dec19) * col("x").cast(dec19)).cast(dec).as("sxx"),
          max(col("v")).as("vocab"), max(col("n")).as("tokens"))
        .withColumn("num",
          col("k").cast(dec) * col("sxy") - col("sx") * col("sy"))
        .withColumn("den",
          col("k").cast(dec) * col("sxx") - col("sx") * col("sx"))
      fit.select(col("k").as("n_points"), col("vocab"), col("tokens"),
        when(col("den") === 0, lit(0.0))
          .otherwise(col("num").cast("double") / col("den").cast("double"))
          .as("beta"),
        when(col("den") === 0, lit(0.0))
          .otherwise((col("sy") * col("sxx") - col("sx") * col("sxy"))
            .cast("double") / (col("den") * lit(1000000000L).cast(dec))
            .cast("double")).as("ln_k"))
    }),

    // Character-class entropy profile (L5hh — the byte-level health
    // read boilerplate/markup/base64 contamination shows up in first:
    // a source whose character mass collapses onto one class, or
    // grows an unusual digit/other share, drifts from prose — the
    // composition audit under q27's word-level quality score). One
    // projection pass counts the FIVE class masses per doc (regex
    // keep-length, codegen'd built-ins), one rollup per source;
    // entropy in nats rides the house ppb-ln route: H = ln N −
    // (Σ c·ln c)/N with each ln rounded in DECIMAL(20,9) space, the
    // Σ exact DECIMAL(38,0) (c·ln_ppb ~ 10²⁵ at 10¹⁵ chars — wraps
    // BIGINT, HUGEINT in the oracle), ONE integral division, double
    // only as display. Zero-mass classes contribute zero BY RULE
    // (lim x·ln x = 0), identically in both engines.
    "q267_char_entropy" -> ((s, d) => {
      val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      def keep(p: String) =
        length(col("text")) - length(regexp_replace(col("text"), p, ""))
      def lnppb(c: Column) =
        (log(c.cast("double"))
          .cast(org.apache.spark.sql.types.DecimalType(20, 9)) *
          1000000000).cast("long")
      def term(c: Column) =
        when(c > 0, (c.cast(dec19) * lnppb(c).cast(dec19)).cast(dec))
          .otherwise(lit(0L).cast(dec))
      documents(s, d)
        .select(col("source"), length(col("text")).as("nc"),
          keep("[a-z]").as("lo"), keep("[A-Z]").as("up"),
          keep("[0-9]").as("di"), keep(" ").as("sp"))
        .groupBy(col("source"))
        .agg(sum(col("nc")).as("n_chars_total"),
          sum(col("lo")).as("n_lower"), sum(col("up")).as("n_upper"),
          sum(col("di")).as("n_digit"), sum(col("sp")).as("n_space"))
        .withColumn("n_other",
          col("n_chars_total") - col("n_lower") - col("n_upper") -
            col("n_digit") - col("n_space"))
        .withColumn("tsum",
          (term(col("n_lower")) + term(col("n_upper")) +
            term(col("n_digit")) + term(col("n_space")) +
            term(col("n_other"))).cast(dec))
        .withColumn("entropy_ppb",
          when(col("n_chars_total") > 0,
            lnppb(col("n_chars_total")) -
              expr("tsum DIV n_chars_total")).otherwise(lit(0L)))
        .withColumn("entropy",
          col("entropy_ppb").cast("double") / 1.0e9)
        .select(col("source"), col("n_chars_total"), col("n_lower"),
          col("n_upper"), col("n_digit"), col("n_space"),
          col("n_other"), col("entropy_ppb"), col("entropy"))
    }),

    // Stratified quota sampling (L5ee — the per-source subsample every
    // eval set and data ablation starts from): the global budget
    // (total/[[SampleDen]]) apportions across sources by Hamilton's
    // largest-remainder method — EXACT integer base quotas, the
    // leftover seats to the largest integer remainders (ties by source
    // name) — so Σ quota == budget by construction, no float
    // apportionment drift. Selection inside each stratum is the
    // deterministic md5 order (the q201/q139 sampling lever), cut by
    // the q83 histogram-threshold recipe: a 256-bin md5-prefix
    // histogram (strata × 256 rows, bounded) finds each source's
    // boundary bin, a windowless filter keeps only bins ≤ boundary
    // (~quota + one bin-width of docs), and ScanSum's two-pass
    // distributed scan supplies the exact rank + tie-break over the
    // survivors — no task ever sorts a corpus-proportional stratum
    // (the old per-source row_number window funneled every doc of a
    // ~20-way operational axis through one reducer each; at 100 TB
    // with SampleDen=4 that was a ~5 TB single-task sort).
    //
    // The quota + boundary arithmetic runs DRIVER-SIDE over the
    // collected strata×256 histogram (bounded: the source axis is a
    // ~20-way operational dimension, never corpus-proportional — the
    // same model-sized-collect class as the k-means centroids). BigInt
    // mirrors the oracle's HUGEINT chain exactly (budget·n_docs wraps
    // BIGINT at 100 TB — the q159 discipline). r11 shipped this chain
    // as three localCheckpointed strata frames; the barriers cost 2–6×
    // run-to-run variance at sf0.1 (the one waived bench regression),
    // while recomputing ~5 k rows on the driver costs microseconds —
    // so the distributed plan is now exactly two corpus passes
    // (histogram, survivors) plus ScanSum's pinned scan.
    "q207_stratified_sample" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("source"))
      val withH = docs
        .withColumn("h", md5(col("doc_id").cast("string").cast("binary")))
        .withColumn("bin", expr("CAST(conv(substr(h, 1, 2), 16, 10) AS INT)"))
      val hist: Map[String, Seq[(Int, Long)]] = withH
        .groupBy(col("source"), col("bin")).agg(count(lit(1)).as("bn"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        .groupBy(_._1).view
        .mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap
      val nDocs: Map[String, Long] =
        hist.view.mapValues(_.map(_._2).sum).toMap
      val total = nDocs.values.sum
      val budget = total / SampleDen
      val base = nDocs.view.mapValues(n =>
        (BigInt(budget) * n / total).toLong).toMap
      val rem = nDocs.view.mapValues(n =>
        (BigInt(budget) * n % total).toLong).toMap
      val leftover = budget - base.values.sum
      val seats = nDocs.keys.toSeq
        .sortBy(src => (-rem(src), src)).take(leftover.toInt).toSet
      // boundary bin: first (ascending md5-prefix) bin whose cumulative
      // count reaches the quota — bin ASC == h-prefix ASC (fixed-width
      // lowercase hex), so "bin <= bbin" keeps ~quota + one bin-width
      val bounds = nDocs.keys.toSeq.sorted.map { src =>
        val quota = base(src) + (if (seats(src)) 1L else 0L)
        val cum = hist(src).scanLeft((0, 0L)) {
          case ((_, c), (b, n)) => (b, c + n) }.tail
        val bbin = cum.find(_._2 >= quota).map(_._1)
          .getOrElse(cum.last._1)
        (src, quota, bbin)
      }
      import s.implicits._
      val boundsDf = bounds.toDF("source", "quota", "bbin")
      val survivors = withH.join(broadcast(boundsDf), "source")
        .filter(col("bin") <= col("bbin"))
        .withColumn("__ord", struct(col("h"), col("doc_id")))
        .withColumn("__one", lit(1L))
      ScanSum.runningSum(survivors, "source", "__ord", "__one", outCol = "rk")
        .filter(col("rk") <= col("quota"))
        .select(col("source"), col("doc_id"), col("rk"), col("quota"))
    })
  )

  /** q84's written shard layout — export-side state, materialized once
    * per (session, sf) via StageCache and reaped at JVM exit; Bench
    * warms it through SharedStages so the write cost is an auditable
    * artifact field. The shard key is one uniform md5 hex digit of the
    * doc id (16 shards; the same engine-portable digit arithmetic as
    * q56's buckets), so the assignment is deterministic — a re-export
    * lands every doc in the same shard. */
  /** q87's encoded word vocabulary — the learned merge list (memoized
    * per session: learning is the model-build, billed once under
    * "stage_build" like q79's index) applied to every distinct corpus
    * word, materialized via localCheckpoint. q70 itself still learns
    * fresh so its benched time stays the true training cost (the q77
    * accounting doctrine). */
  private[graft] def bpeMergesStage(s: SparkSession,
                                    d: String): Seq[((String, String), Long)] =
    StageCache.valueFor(s, s"bpe_merges:$d")(
      BpeLearn.learnFromDocs(documents(s, d), BpeMerges))

  private[graft] def bpeEncodedStage(s: SparkSession, d: String): DataFrame =
    StageCache.getOrCompute(s, s"bpe_encoded:$d") {
      val vocab = documents(s, d)
        .select(explode(toks).as("word"))
        .filter(length(col("word")) > 0)
      BpeLearn.encodeWords(s, vocab, bpeMergesStage(s, d).map(_._1))
        .localCheckpoint()
    }

  /** Lake-path conf for the q84 shard layout (see
    * [[graft.LakeDirs.resolve]]); unset → registered temp dir. */
  val ShardDirConf = "spark.graft.shards.dir"

  private[graft] def shardExportDir(s: SparkSession, d: String): String =
    StageCache.dirFor(s, s"shard_export:$d") {
      val dir = graft.LakeDirs.resolve(s, ShardDirConf, "q84_shards", d)
      documents(s, d)
        .withColumn("h", md5(col("doc_id").cast("string").cast("binary")))
        .withColumn("shard",
          (expr("instr('0123456789abcdef', substr(h, 2, 1))") - 1).cast("int"))
        .select(col("doc_id"), col("lang"), col("text"), col("n_chars"),
          size(toks).cast("long").as("n_tokens"), col("shard"))
        .write.mode("overwrite").partitionBy("shard").parquet(dir)
      dir
    }

  /** q66 patterns — shared verbatim with the oracle SQL. Escape-free by
    * construction: a `\.` would be eaten by the SQL string literal on
    * the Spark side, so literal dots live in `[.]` classes. */
  private val PiiNum   = "[0-9]+"
  private val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
  private val PiiUrl   = "https?://[^ ]+"

  /** q53/q54 parameters — shared by the Spark queries and the oracle SQL
    * (which hardcodes trigram concatenation, so NgramN stays 3). */
  private val NgramN = 3
  private val NgramMinJ = 0.8

  /** q190/q196 ppm mass scale (the shared 10⁶ doctrine). */
  private[graft] val CanonMass = 1000000L

  /** q191 budget: Num/Den of the corpus token total. 4/5 sits ABOVE
    * the harness's smallest language shares (fr ≈ 12.8%, de ≈ 14% of
    * tokens vs a 16% fair share at k = 5), so the small languages
    * saturate while en absorbs the remainder — both branches of the
    * water-fill provably exercised at every SF. */
  private[graft] val BudgetNum = 4L
  private[graft] val BudgetDen = 5L

  /** q192 greedy rounds — fixed, so the oracle unrolls exactly this
    * many CTE stages. */
  private[graft] val SetCoverRounds = 5

  /** q196 threshold ladder, ppm — brackets the q25 base threshold so
    * the sweep's bottom rung equals the base pair set and the top
    * rungs genuinely prune. */
  private[graft] val SweepThresholdsPpm = Seq(500000L, 600000L, 700000L,
    800000L, 900000L)

  /** q123 containment threshold — shared with its oracle SQL. */
  private val ContainMinC = 0.8

  /** q126: how many of the corpus's most-frequent trigram phrases the
    * positional-index search runs — shared with its oracle SQL. */
  private val PhraseTopQ = 3

  /** q128 winnowing (Schleimer et al. 2003): char k-gram length,
    * window width, and the minimum shared-fingerprint count for a
    * reported pair. Guarantee: any shared substring of length
    * ≥ k + w − 1 = 8 chars yields at least one shared fingerprint. */
  /** q137 fit width: tokens ranked 1..V enter the regression. */
  private[graft] val ZipfV = 200

  /** q137's Zipf log-log fit over ANY (tok, cnt) table — extracted so
    * the streaming vocabulary store (q230) feeds the IDENTICAL tail:
    * counts add, so the merged store reproduces the one-shot fit by
    * algebra. Rank = ZipfV-bounded prior-count self-join (never a
    * global window); ln values rounded in decimal space to scale 9
    * (see the comment below for why), sums decimal-routed via dsum. */
  private[graft] def zipfFitView(counts: DataFrame): DataFrame = {
    import graft.functions.Num.dsum
    val top = counts.orderBy(col("cnt").desc, col("tok").asc).limit(ZipfV)
    val prior = top.select(col("tok").as("tok2"), col("cnt").as("cnt2"))
    val ranked = top.join(broadcast(prior),
        col("cnt2") > col("cnt") ||
          (col("cnt2") === col("cnt") && col("tok2") <= col("tok")))
      .groupBy(col("tok"), col("cnt")).agg(count(lit(1)).as("rn"))
    // ln is the one transcendental in the oracle surface: JVM
    // Math.log and DuckDB ln may disagree by 1 ulp, and at the raw
    // DECIMAL(38,12) cast a 1-ulp diff flips the captured decimal
    // whenever the value sits within ~1 ulp of a 0.5e-12 boundary
    // (~2e-4 per term — a real flake across 2·ZipfV terms). Rounding
    // each ln IN DECIMAL SPACE to scale 9 first widens the boundary
    // 1000×: a flip now needs the true value within an ulp of a
    // 0.5e-9 tie (~2e-7 per term). The decimal→double re-cast is
    // correctly rounded in both engines, so downstream products and
    // sums are bit-identical. Residual accepted risk: ~2e-7/term ulp
    // ties plus Spark's shortest-repr vs DuckDB's true-binary
    // double→decimal rounding on those same ties.
    val lnR = (c: Column) =>
      log(c.cast("double"))
        .cast(org.apache.spark.sql.types.DecimalType(20, 9)).cast("double")
    val xy = ranked.select(lnR(col("rn")).as("x"), lnR(col("cnt")).as("y"))
    xy.agg(count(lit(1)).cast("double").as("n"),
        dsum(col("x"), 12).as("sx"), dsum(col("y"), 12).as("sy"),
        dsum(col("x") * col("x"), 12).as("sxx"),
        dsum(col("y") * col("y"), 12).as("syy"),
        dsum(col("x") * col("y"), 12).as("sxy"))
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("denx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("deny", col("n") * col("syy") - col("sy") * col("sy"))
      .withColumn("slope", col("num") / col("denx"))
      .select(lit(ZipfV.toLong).as("v"), col("n").cast("long").as("n_fit"),
        col("slope"),
        ((col("sy") - col("slope") * col("sx")) / col("n")).as("intercept"),
        ((col("num") * col("num")) / (col("denx") * col("deny"))).as("r2"))
  }

  /** q139 audit-sample gate: docs whose md5 bucket (0..255) falls below
    * this enter the dedup evaluation (192 = a 3/4 deterministic
    * sample — the knob a 100 TB audit turns DOWN). */
  private[graft] val DedupEvalBuckets = 192

  private[graft] val WinnowK = 5
  private[graft] val WinnowW = 4
  private[graft] val WinnowMinShared = 2

  /** Fingerprints selected by more than this many docs are "common
    * code" (MOSS's base-file/stop-fingerprint rule) and are dropped
    * before pairing. Also the SCALE bound: pair fan-out per
    * fingerprint is ≤ MaxDf², so the join can never go n² on a
    * shared-vocabulary corpus (without it, this harness corpus pairs
    * 124k of its 125k possible doc pairs — all noise). */
  private[graft] val WinnowMaxDf = 10

  /** q53's pair output, memoized per (session, sf dir) as an EAGER
    * localCheckpoint — the shared materialized stage that composed
    * queries (q54) build on, exactly as a production pipeline stages
    * its near-dup pairs once. Pair volume is O(near-dups), far below
    * corpus scale, so checkpointing it is the 100 TB-correct move too
    * (PipelineBench stages the same way). Session-identity keyed via
    * StageCache so a stale checkpoint can never leak across
    * SparkSessions. */
  private[operators] def ngramPairsStage(s: SparkSession, d: String): DataFrame =
    StageCache.getOrCompute(s, s"ngram_pairs:$d")(
      NgramJoin.similarPairs(documents(s, d), NgramN, NgramMinJ).localCheckpoint())

  /** q70 merge count — shared with ApproxOracle's per-round exports and
    * generated oracle SQL. */
  val BpeMerges = 8

  /** GPT-2-ish pretokenizer, restricted to the subset Java regex and
    * RE2 treat identically (no lookarounds, no \\p classes): contraction
    * suffixes, then optionally-space-prefixed letter / digit / other
    * runs, then whitespace runs. Shared verbatim with the q62 oracle. */
  private val BpePattern =
    """''[a-z]{1,2}| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n]+|[ \t\n]+"""

  /** q128's engine over ANY (doc_id, text) frame — split out so specs
    * can run planted fixtures through the exact production path.
    * Selection (k-gram hashes, window fold, rightmost-min ties) is one
    * zero-shuffle projection through the NATIVE kernel
    * (functions/WinnowExpressions.scala — the declarative
    * transform/aggregate chain is CodegenFallback and was 9 s of the
    * 9.1 s query; the kernel is the same value in one O(L) pass, and
    * [[winnowedFpSql]] keeps the declarative twin alive for the
    * equality spec); the df gate and pair join shuffle only selected
    * fingerprints. */
  private[graft] def winnowedPairs(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column => toCol, expression => toExpr}
    val fp = docs
      .filter(length(col("text")) >= WinnowK + WinnowW - 1)
      .select(col("doc_id"),
        explode(toCol(graft.functions.WinnowFingerprints(
          toExpr(col("text")), WinnowK, WinnowW))).as("h"))
      .localCheckpoint() // ≤ n·L/w rows; df agg + both pair legs read it
    val rare = fp.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= WinnowMaxDf)
      .select(col("h"))
    val fpr = fp.join(rare.hint("merge"), Seq("h"))
    fpr.select(col("doc_id").as("doc_a"), col("h"))
      .join(fpr.select(col("doc_id").as("doc_b"), col("h")).hint("merge"),
        Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= WinnowMinShared)
  }

  /** The declarative (higher-order-function) winnowing selection — the
    * formulation q128 shipped before the native kernel. Kept ONLY as
    * the equality twin: AnalyticsFamilySpec proves the kernel emits the
    * identical per-doc fingerprint set on the real corpus. */
  private[graft] def winnowedFpSql(docs: DataFrame): DataFrame =
    docs
      .filter(length(col("text")) >= WinnowK + WinnowW - 1)
      .withColumn("hs", expr(
        s"""transform(sequence(1, length(text) - ${WinnowK - 1}),
              i -> named_struct('pos', i, 'h',
                cast(conv(substring(md5(cast(substring(text, i, $WinnowK)
                  as binary)), 1, 12), 16, 10) as bigint)))"""))
      .withColumn("fp", explode(expr(
        s"""array_distinct(transform(sequence(1, size(hs) - ${WinnowW - 1}),
              j -> aggregate(slice(hs, j + 1, ${WinnowW - 1}),
                element_at(hs, j),
                (acc, x) -> if(x.h <= acc.h, x, acc))))""")))
      .select(col("doc_id"), col("fp.h").as("h"))
      .distinct()

  /** 12-hex-digit md5 prefix decoded to a BIGINT in DuckDB — mirrors
    * Spark's conv(substring(md5(x), 1, 12), 16, 10); the q86 instr
    * idiom (same helper as VectorQueries.md5ModSql). */
  private def md5IntSql(strExpr: String): String =
    (1 to 12).map(i =>
      s"(instr('0123456789abcdef', substr(md5($strExpr), $i, 1)) - 1) " +
        s"* ${BigInt(16).pow(12 - i)}")
      .mkString("(", "\n             + ", ")")

  /** Shared CTE chain computing the exact trigram-Jaccard pair list the
    * NAIVE way (full inverted-index join, no prefix filter) — the
    * independent recomputation both q53 and q54 oracles build on. */
  private def ngramPairsCtes: String =
    s"""sh AS (
         SELECT doc_id, unnest(list_distinct(
           list_transform(range(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
         FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
               FROM documents)
         WHERE len(toks) >= $NgramN),
       sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       inter AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       pairs AS (
         SELECT doc_a, doc_b,
           CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS jac
         FROM inter
         JOIN sz na ON na.doc_id = doc_a
         JOIN sz nb ON nb.doc_id = doc_b
         WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= $NgramMinJ)"""

  /** DuckDB mirror of LangId.classify, generated from LangId.profiles so
    * the two can never drift: per-language token-profile hit counts
    * (zh counts profile CHARS in the raw text — no spaces), argmax with
    * lexicographically-largest language winning ties (the same order
    * classify's consider() loop produces). */
  private def langIdOracle: String = {
    val langs = LangId.profiles.keys.toSeq.sorted // de,en,es,fr,zh
    def lst(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")
    val scores = langs.map {
      case "zh" => LangId.profiles("zh")
        .map(ch => s"(length(text) - length(replace(text, '$ch', '')))")
        .mkString("(", " + ", ") AS s_zh")
      case l =>
        s"len(list_filter(toks, x -> list_contains(${lst(LangId.profiles(l))}, x))) AS s_$l"
    }.mkString(", ")
    val desc = langs.reverse // descending = tie-break winner first
    val cases = desc.init.zipWithIndex.map { case (l, i) =>
      val smaller = desc.drop(i + 1).map("s_" + _)
      s"WHEN s_$l >= greatest(${smaller.mkString(", ")}) THEN '$l'"
    }.mkString(" ")
    s"""SELECT lang, lang_pred, count(*) AS n FROM (
       SELECT lang, CASE $cases ELSE '${desc.last}' END AS lang_pred
       FROM (SELECT lang, $scores
             FROM (SELECT lang, text,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
                   FROM documents)))
       GROUP BY lang, lang_pred"""
  }

  /** The q103 chunk derivation as shared CTEs (`ch` is the chunk
    * table) — q103 selects it, q111 deduplicates over it. */
  private def chunkCte: String =
    s"""t AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
           FROM documents),
         c AS (
           SELECT doc_id, len(ts) AS n, ts,
             unnest(range(0, len(ts), $ChunkStride)) AS st
           FROM t),
         ch AS (
           SELECT doc_id, CAST(st // $ChunkStride AS BIGINT) AS chunk_id,
             CAST(least($ChunkW, n - st) AS BIGINT) AS n_chunk_tokens,
             array_to_string(list_slice(ts, st + 1, st + $ChunkW), ' ')
               AS chunk_text
           FROM c)"""

  val oracleSql: Map[String, String] = Map(
    // q274: identical value-count table; the support index / gaps /
    // per-source CDFs ride windows (unique per (source, value)), the
    // HUGEINT cleared numerator |cum_a·n_b − cum_b·n_a|·gap, the same
    // single division per pair.
    "q274_wasserstein" ->
      """WITH cnt AS (
           SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
         sup AS (SELECT DISTINCT n_chars FROM cnt),
         gap AS (
           SELECT n_chars,
             lead(n_chars) OVER (ORDER BY n_chars) - n_chars AS gap
           FROM sup),
         srcn AS (
           SELECT source, CAST(sum(c) AS BIGINT) AS n
           FROM cnt GROUP BY 1),
         filled AS (
           SELECT s.source, v.n_chars, CAST(coalesce(c.c, 0) AS BIGINT)
               AS c
           FROM (SELECT DISTINCT source FROM cnt) s
           CROSS JOIN sup v
           LEFT JOIN cnt c
             ON c.source = s.source AND c.n_chars = v.n_chars),
         cum AS (
           SELECT source, n_chars, CAST(sum(c) OVER (
             PARTITION BY source ORDER BY n_chars
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum
           FROM filled),
         p AS (
           SELECT a.source AS source_a, b.source AS source_b,
             a.n_chars, a.cum AS cum_a, b.cum AS cum_b
           FROM cum a JOIN cum b
             ON b.n_chars = a.n_chars AND a.source < b.source),
         j AS (
           SELECT p.source_a, p.source_b, na.n AS n_a, nb.n AS n_b,
             abs(CAST(p.cum_a AS HUGEINT) * nb.n
               - CAST(p.cum_b AS HUGEINT) * na.n) * g.gap AS term
           FROM p
           JOIN gap g ON g.n_chars = p.n_chars AND g.gap IS NOT NULL
           JOIN srcn na ON na.source = p.source_a
           JOIN srcn nb ON nb.source = p.source_b)
         SELECT source_a, source_b, n_a, n_b,
           CAST(CAST(sum(term) AS HUGEINT) AS DOUBLE)
             / CAST(CAST(n_a AS HUGEINT) * n_b AS DOUBLE) AS w1_chars
         FROM j GROUP BY 1, 2, 3, 4""",

    // q275: identical tokenizer, sentence/syllable regexp runs with
    // the same 1-floors, BIGINT sums, the same two score chains.
    "q275_readability" ->
      """WITH d AS (
           SELECT source, lower(text) AS t FROM documents),
         sents AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(greatest(1,
               len(regexp_extract_all(t, '[.!?]+')))) AS BIGINT)
               AS n_sentences
           FROM d GROUP BY 1),
         w AS (
           SELECT source,
             unnest(regexp_split_to_array(trim(t), '\s+')) AS w
           FROM d),
         wc AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(greatest(1,
               len(regexp_extract_all(w, '[aeiouy]+')))) AS BIGINT)
               AS n_syllables
           FROM w WHERE len(w) > 0 GROUP BY 1),
         a AS (
           SELECT s.source, s.n_docs, wc.n_words, s.n_sentences,
             wc.n_syllables,
             CAST(wc.n_words AS DOUBLE) / CAST(s.n_sentences AS DOUBLE)
               AS wps,
             CAST(wc.n_syllables AS DOUBLE) / CAST(wc.n_words AS DOUBLE)
               AS spw
           FROM sents s JOIN wc ON wc.source = s.source)
         SELECT source, n_docs, n_words, n_sentences, n_syllables,
           206.835 - 1.015 * wps - 84.6 * spw AS flesch_ease,
           0.39 * wps + 11.8 * spw - 15.59 AS fk_grade
         FROM a""",

    // q267: identical keep-length class masses (regexp_replace with
    // the 'g' flag == Spark's replace-all), the same ppb-ln rounding,
    // HUGEINT Σ c·ln_ppb, the same integral division.
    "q267_char_entropy" ->
      """WITH per AS (
           SELECT source, CAST(len(text) AS BIGINT) AS nc,
             CAST(len(text) - len(regexp_replace(text, '[a-z]', '', 'g'))
               AS BIGINT) AS lo,
             CAST(len(text) - len(regexp_replace(text, '[A-Z]', '', 'g'))
               AS BIGINT) AS up,
             CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g'))
               AS BIGINT) AS di,
             CAST(len(text) - len(regexp_replace(text, ' ', '', 'g'))
               AS BIGINT) AS sp
           FROM documents),
         a AS (
           SELECT source, CAST(sum(nc) AS BIGINT) AS n_chars_total,
             CAST(sum(lo) AS BIGINT) AS n_lower,
             CAST(sum(up) AS BIGINT) AS n_upper,
             CAST(sum(di) AS BIGINT) AS n_digit,
             CAST(sum(sp) AS BIGINT) AS n_space
           FROM per GROUP BY 1),
         b AS (
           SELECT *, n_chars_total - n_lower - n_upper - n_digit
             - n_space AS n_other
           FROM a),
         t AS (
           SELECT *,
             (CASE WHEN n_lower > 0 THEN CAST(n_lower AS HUGEINT)
                * CAST(CAST(ln(CAST(n_lower AS DOUBLE)) AS DECIMAL(20,9))
                  * 1000000000 AS BIGINT) ELSE 0 END)
             + (CASE WHEN n_upper > 0 THEN CAST(n_upper AS HUGEINT)
                * CAST(CAST(ln(CAST(n_upper AS DOUBLE)) AS DECIMAL(20,9))
                  * 1000000000 AS BIGINT) ELSE 0 END)
             + (CASE WHEN n_digit > 0 THEN CAST(n_digit AS HUGEINT)
                * CAST(CAST(ln(CAST(n_digit AS DOUBLE)) AS DECIMAL(20,9))
                  * 1000000000 AS BIGINT) ELSE 0 END)
             + (CASE WHEN n_space > 0 THEN CAST(n_space AS HUGEINT)
                * CAST(CAST(ln(CAST(n_space AS DOUBLE)) AS DECIMAL(20,9))
                  * 1000000000 AS BIGINT) ELSE 0 END)
             + (CASE WHEN n_other > 0 THEN CAST(n_other AS HUGEINT)
                * CAST(CAST(ln(CAST(n_other AS DOUBLE)) AS DECIMAL(20,9))
                  * 1000000000 AS BIGINT) ELSE 0 END) AS tsum
           FROM b),
         h AS (
           SELECT *, CASE WHEN n_chars_total > 0
             THEN CAST(CAST(ln(CAST(n_chars_total AS DOUBLE))
                 AS DECIMAL(20,9)) * 1000000000 AS BIGINT)
               - CAST(tsum // n_chars_total AS BIGINT)
             ELSE 0 END AS entropy_ppb
           FROM t)
         SELECT source, n_chars_total, n_lower, n_upper, n_digit,
           n_space, n_other, entropy_ppb,
           CAST(entropy_ppb AS DOUBLE) / 1.0e9 AS entropy
         FROM h""",

    // q250: identical doc-id midpoint split, per-token half counts,
    // the EXACT integer ppm cut key ((c2+1)·10⁶ // (c1+1), HUGEINT ==
    // Spark's DECIMAL(38,0) DIV) under the (ppm DESC, token ASC)
    // total order; the IEEE ratio is display only.
    "q250_trending_tokens" ->
      s"""WITH span AS (
           SELECT min(doc_id) AS i0, max(doc_id) AS i1 FROM documents),
         tok AS (
           SELECT d.doc_id >= s.i0 + (s.i1 - s.i0 + 1) // 2 AS late,
             unnest(regexp_split_to_array(trim(d.text), '\\s+')) AS token
           FROM documents d CROSS JOIN span s),
         cnt AS (
           SELECT token,
             CAST(count(*) FILTER (NOT late) AS BIGINT) AS c1,
             CAST(count(*) FILTER (late) AS BIGINT) AS c2
           FROM tok WHERE len(token) > 0 GROUP BY 1),
         sc AS (
           SELECT token, c1, c2,
             CAST(c2 + 1 AS HUGEINT) * 1000000 // (c1 + 1) AS ppm,
             CAST(c2 + 1 AS DOUBLE) / CAST(c1 + 1 AS DOUBLE) AS score
           FROM cnt WHERE c1 + c2 >= $TrendMinN)
         SELECT token, c1, c2, score FROM sc
         ORDER BY ppm DESC, token ASC LIMIT $TrendTopK""",

    // q254: the INDEPENDENT brute weighted rank — full per-source
    // ordered cumsum, arg_min at the first row reaching each target
    // mass; no histogram machinery shared with the plan.
    "q254_weighted_quantiles" ->
      """WITH d AS (
           SELECT source, doc_id, n_chars,
             CAST(len(regexp_split_to_array(trim(text), '\s+'))
               AS BIGINT) AS w
           FROM documents),
         st AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(w) AS BIGINT) AS tw
           FROM d GROUP BY 1),
         r AS (
           SELECT source, n_chars, w,
             CAST(sum(w) OVER (PARTITION BY source
               ORDER BY n_chars, doc_id ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS cw
           FROM d),
         t AS (
           SELECT source, n_docs, tw, (tw + 1) // 2 AS k50,
             (9 * tw + 9) // 10 AS k90
           FROM st),
         w50 AS (
           SELECT r.source, arg_min(r.n_chars, r.cw) AS wp50
           FROM r JOIN t ON t.source = r.source
           WHERE r.cw >= t.k50 GROUP BY 1),
         w90 AS (
           SELECT r.source, arg_min(r.n_chars, r.cw) AS wp90
           FROM r JOIN t ON t.source = r.source
           WHERE r.cw >= t.k90 GROUP BY 1)
         SELECT t.source, t.n_docs, t.tw AS token_mass, w50.wp50, w90.wp90
         FROM t
         JOIN w50 ON w50.source = t.source
         JOIN w90 ON w90.source = t.source""",

    // q248: identical ranks (row_number in the same n_chars order —
    // tie order is aggregate-invariant), the same exact ceil-ordinal
    // (HUGEINT //), the same decimal-exact means.
    "q248_quantile_norm" ->
      """WITH d AS (SELECT source, doc_id, n_chars FROM documents),
         r AS (
           SELECT source, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY n_chars)
               AS i,
             count(*) OVER (PARTITION BY source) AS ns
           FROM d),
         p AS (
           SELECT n_chars AS pooled,
             row_number() OVER (ORDER BY n_chars) AS k
           FROM d),
         nall AS (SELECT count(*) AS n FROM d),
         j AS (
           SELECT r.source, r.n_chars, p.pooled
           FROM r CROSS JOIN nall
           JOIN p ON p.k = (CAST(r.i AS HUGEINT) * nall.n + r.ns - 1)
             // r.ns)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE) / count(*)
             AS mean_raw,
           CAST(sum(CAST(pooled AS DECIMAL(38,6))) AS DOUBLE) / count(*)
             AS mean_norm
         FROM j GROUP BY 1""",

    // q132: the chunk replay + per-source distinct over exact chunk
    // STRINGS (the md5-collision check), same pair join and counts.
    "q132_source_overlap" ->
      s"""WITH $chunkCte,
         sc AS (
           SELECT DISTINCT d.source, c2.chunk_text
           FROM ch c2 JOIN documents d ON d.doc_id = c2.doc_id),
         per AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                 FROM sc GROUP BY 1)
         SELECT a.source AS src_a, b.source AS src_b,
           CAST(count(*) AS BIGINT) AS n_shared, pa.n AS na, pb.n AS nb
         FROM sc a JOIN sc b
           ON a.chunk_text = b.chunk_text AND a.source < b.source
         JOIN per pa ON pa.source = a.source
         JOIN per pb ON pb.source = b.source
         GROUP BY 1, 2, pa.n, pb.n""",

    "q29_lang_id" -> langIdOracle,

    "q103_chunking" ->
      s"""WITH $chunkCte
         SELECT doc_id, chunk_id, n_chunk_tokens, chunk_text FROM ch""",

    // q111: the same chunk CTE, first-occurrence rule replayed as a
    // row_number over the EXACT chunk strings while Spark keys by
    // md5 — the collision check, per the q53 doctrine.
    "q111_chunk_dedup" ->
      s"""WITH $chunkCte,
         r AS (
           SELECT doc_id, chunk_id,
             row_number() OVER (PARTITION BY chunk_text
               ORDER BY doc_id, chunk_id) AS rn
           FROM ch)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT)
             AS n_redundant,
           CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS DOUBLE)
             / CAST(count(*) AS BIGINT) AS redundant_frac
         FROM r GROUP BY 1""",

    "q63_decontaminate" ->
      """WITH toks AS (
           SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS ts
           FROM documents),
         grams AS (
           SELECT doc_id, lang, unnest(list_distinct(
             list_transform(range(1, len(ts) - 1),
               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS g
           FROM toks WHERE len(ts) >= 3),
         bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
         hits AS (
           SELECT lang, doc_id, count(*) AS shared
           FROM grams JOIN bench USING (g)
           WHERE doc_id % 97 != 0 GROUP BY 1, 2),
         hl AS (
           SELECT lang, count(*) AS n_contaminated,
             CAST(sum(shared) AS BIGINT) AS shared_grams
           FROM hits GROUP BY 1),
         base AS (
           SELECT lang, count(*) AS n_docs FROM documents
           WHERE doc_id % 97 != 0 GROUP BY 1)
         SELECT base.lang, n_docs,
           CAST(coalesce(n_contaminated, 0) AS BIGINT) AS n_contaminated,
           CAST(coalesce(shared_grams, 0) AS BIGINT) AS shared_grams
         FROM base LEFT JOIN hl USING (lang)""",

    "q64_bm25" ->
      """WITH t AS (
           SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS dl,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS term
           FROM documents),
         tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM t GROUP BY 1, 2, 3),
         dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         stats AS (
           SELECT count(*) AS n,
             CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS DOUBLE)
               / count(*) AS avgdl
           FROM documents),
         scored AS (
           SELECT doc_id, term, tf, df,
             CAST(tf AS DOUBLE) * 2.5 /
               (CAST(tf AS DOUBLE) + 0.375 +
                1.125 * (CAST(dl AS DOUBLE) / avgdl)) *
               CAST(n AS DOUBLE) / CAST(df AS DOUBLE) AS score
           FROM tf JOIN dfr USING (term) CROSS JOIN stats),
         ranked AS (
           SELECT doc_id, term, tf, df, score,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, term ASC) AS rn
           FROM scored)
         SELECT doc_id, term AS top_term, tf, df, score
         FROM ranked WHERE rn = 1""",

    "q66_pii_scrub" ->
      """SELECT event_type, count(*) AS n_events,
         CAST(sum(len(regexp_extract_all(props, '[0-9]+', 0))) AS BIGINT)
           AS n_numeric,
         CAST(sum(len(regexp_extract_all(props,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+', 0))) AS BIGINT)
           AS n_emails,
         CAST(sum(len(regexp_extract_all(props, 'https?://[^ ]+', 0))) AS BIGINT)
           AS n_urls,
         CAST(sum(length(props) - length(
           regexp_replace(regexp_replace(regexp_replace(props,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+', '', 'g'),
             'https?://[^ ]+', '', 'g'),
             '[0-9]+', '', 'g'))) AS BIGINT) AS chars_redacted
         FROM events GROUP BY event_type""",

    "q69_domain_mix" ->
      """WITH targets(lang, target) AS (
           VALUES ('de', 0.15), ('en', 0.4), ('es', 0.15),
                  ('fr', 0.15), ('zh', 0.15)),
         per_lang AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1),
         total AS (SELECT count(*) AS n_total FROM documents),
         thr AS (
           SELECT p.lang, p.n_lang,
             CAST(floor(least(1.0,
               t.target * CAST(n_total AS DOUBLE) / CAST(p.n_lang AS DOUBLE))
               * 256) AS INT) AS thr
           FROM per_lang p JOIN targets t USING (lang) CROSS JOIN total),
         b AS (
           SELECT lang,
             (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
             + instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS bkt
           FROM documents)
         SELECT b.lang, thr.n_lang AS n_docs,
           CAST(sum(CASE WHEN b.bkt < thr.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         FROM b JOIN thr ON b.lang = thr.lang
         GROUP BY b.lang, thr.n_lang""",

    // q128: the winnowing selection replayed VALUE-for-value — same
    // 12-hex md5 hashes, same per-window (h ASC, pos DESC) argmin
    // (rightmost minimal = robust winnowing), same distinct-hash pair
    // count. The oracle checks the selection itself, not just overlap.
    "q128_winnowing" ->
      s"""WITH d AS (
           SELECT doc_id, text FROM documents
           WHERE length(text) >= ${WinnowK + WinnowW - 1}),
         pos AS (
           SELECT doc_id, text, unnest(range(1, length(text) - ${WinnowK - 2}))
             AS pos
           FROM d),
         hs AS (
           SELECT doc_id, pos,
             ${md5IntSql(s"substr(text, CAST(pos AS INT), $WinnowK)")} AS h
           FROM pos),
         wj AS (
           SELECT doc_id, unnest(range(1, length(text) - ${WinnowK + WinnowW - 3}))
             AS j
           FROM d),
         win AS (
           SELECT doc_id, j, pos, h FROM (
             SELECT w.doc_id, w.j, h0.pos, h0.h,
               row_number() OVER (PARTITION BY w.doc_id, w.j
                 ORDER BY h0.h ASC, h0.pos DESC) AS rn
             FROM wj w JOIN hs h0 ON h0.doc_id = w.doc_id
               AND h0.pos >= w.j AND h0.pos <= w.j + ${WinnowW - 1})
           WHERE rn = 1),
         fp0 AS (SELECT DISTINCT doc_id, h FROM win),
         rare AS (SELECT h FROM fp0 GROUP BY h
                  HAVING count(*) <= $WinnowMaxDf),
         fp AS (SELECT doc_id, h FROM fp0 JOIN rare USING (h))
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared
         FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
         GROUP BY 1, 2
         HAVING count(*) >= $WinnowMinShared""",

    // q127: per-source unigram profiles from exact strings, the same
    // integer dot/norm algebra, one final double expression.
    "q127_source_similarity" ->
      """WITH c AS (
           SELECT source, t AS term, count(*) AS c
           FROM (SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
                 FROM documents)
           GROUP BY 1, 2),
         n2 AS (SELECT source, CAST(sum(c * c) AS BIGINT) AS n2 FROM c GROUP BY 1),
         d AS (
           SELECT a.source AS src_a, b.source AS src_b,
             CAST(sum(a.c * b.c) AS BIGINT) AS dot
           FROM c a JOIN c b ON a.term = b.term AND a.source < b.source
           GROUP BY 1, 2)
         SELECT src_a, src_b, dot, na.n2 AS na2, nb.n2 AS nb2,
           round(CAST(dot AS DOUBLE) /
             sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 4) AS cos
         FROM d JOIN n2 na ON na.source = d.src_a
                JOIN n2 nb ON nb.source = d.src_b""",

    // q126: the scan-side recomputation over exact STRINGS — every
    // trigram start position counted directly, same (cnt DESC, phrase
    // ASC) top cut. Proves the positional-index join plan AND checks
    // the hashed postings for collisions in one compare.
    "q126_phrase_search" ->
      s"""WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
           FROM documents),
         occ AS (
           SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS phrase
           FROM tk WHERE len(toks) >= 3),
         top AS (
           SELECT phrase FROM (SELECT phrase, count(*) AS cnt FROM occ GROUP BY 1)
           ORDER BY cnt DESC, phrase ASC LIMIT $PhraseTopQ)
         SELECT o.phrase, o.doc_id, CAST(count(*) AS BIGINT) AS n_occ
         FROM occ o JOIN top USING (phrase)
         GROUP BY 1, 2""",

    // q125: the corpus-derived temperature thresholds (⌊√n⌋ weights,
    // integer cross-multiplied keep-probability) + the same md5-bucket
    // count. `//` mirrors Spark's DIV on the all-positive operands.
    "q125_temperature_mix" ->
      """WITH pl AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1),
         tot AS (SELECT count(*) AS n_total FROM documents),
         wg AS (SELECT lang, n_lang,
                  CAST(floor(sqrt(CAST(n_lang AS DOUBLE))) AS BIGINT) AS w
                FROM pl),
         sw AS (SELECT CAST(sum(w) AS BIGINT) AS sw FROM wg),
         thr AS (
           SELECT lang, n_lang, w,
             least(CAST(256 AS BIGINT),
               (256 * (n_total // 2) * w) // (sw * n_lang)) AS thr
           FROM wg CROSS JOIN tot CROSS JOIN sw),
         b AS (
           SELECT lang,
             (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
             + instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS bkt
           FROM documents)
         SELECT t.lang, t.n_lang AS n_docs, t.w, t.thr,
           CAST(sum(CASE WHEN b.bkt < t.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         FROM b JOIN thr t ON b.lang = t.lang
         GROUP BY t.lang, t.n_lang, t.w, t.thr""",

    // the textbook derivation: global rank window over the vocabulary,
    // then the same DECIMAL-routed moments and the identical
    // operand-order closed forms
    "q137_zipf_fit" ->
      s"""WITH counts AS (
           SELECT tok, count(*) AS cnt FROM (
             SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
             FROM documents)
           WHERE length(tok) > 0 GROUP BY tok),
         ranked AS (
           SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rn
           FROM counts QUALIFY rn <= $ZipfV),
         xy AS (
           SELECT CAST(CAST(ln(CAST(rn AS DOUBLE)) AS DECIMAL(20,9)) AS DOUBLE) AS x,
             CAST(CAST(ln(CAST(cnt AS DOUBLE)) AS DECIMAL(20,9)) AS DOUBLE) AS y
           FROM ranked),
         sums AS (
           SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS syy,
             CAST(sum(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy
           FROM xy),
         fit AS (
           SELECT n, sx, sy,
             n * sxy - sx * sy AS num,
             n * sxx - sx * sx AS denx,
             n * syy - sy * sy AS deny
           FROM sums)
         SELECT CAST($ZipfV AS BIGINT) AS v, CAST(n AS BIGINT) AS n_fit,
           num / denx AS slope,
           (sy - (num / denx) * sx) / n AS intercept,
           (num * num) / (denx * deny) AS r2
         FROM fit""",

    "q67_vocab_coverage" ->
      """WITH counts AS (
           SELECT g, count(*) AS cnt FROM (
             SELECT unnest(list_transform(range(1, length(text) - 1),
               i -> substr(text, CAST(i AS INT), 3))) AS g
             FROM documents WHERE length(text) >= 3)
           GROUP BY g),
         ranked AS (
           SELECT cnt,
             row_number() OVER (ORDER BY cnt DESC, g ASC) AS rn,
             sum(cnt) OVER (ORDER BY cnt DESC, g ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM counts),
         total AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts),
         cuts AS (SELECT unnest([50, 150, 300]) AS v)
         SELECT CAST(v AS BIGINT) AS v,
           CAST(max(cum) AS BIGINT) AS covered, total,
           CAST(max(cum) AS DOUBLE) / CAST(total AS DOUBLE) AS coverage
         FROM ranked JOIN cuts ON rn <= v CROSS JOIN total
         GROUP BY v, total""",

    // same accounting recomputed from the RAW table — equality proves
    // the written shard layout is lossless and the hash balanced
    "q84_shard_export" ->
      """WITH b AS (
           SELECT n_chars,
             instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1
               AS shard,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_toks
           FROM documents)
         SELECT shard, count(*) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS total_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM b GROUP BY shard""",

    // the textbook single-reducer derivation the Spark plan avoids:
    // global window cumsum over the quality order, prefix under budget
    "q83_budget_select" ->
      """WITH t AS (
           SELECT doc_id, lang,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS toks,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> list_contains(['the','a','an','of','and','or','is','to','in','that'], x)))
                   AS DOUBLE)
                   / CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS q
           FROM documents),
         b AS (SELECT CAST(sum(toks) AS BIGINT) // 4 AS budget FROM t),
         r AS (SELECT doc_id, lang, toks,
                 sum(toks) OVER (ORDER BY q DESC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM t)
         SELECT lang, count(*) AS n_kept, CAST(sum(toks) AS BIGINT) AS tokens_kept
         FROM r, b WHERE cum <= budget GROUP BY lang""",

    "q53_ngram_neardup" ->
      s"""WITH $ngramPairsCtes
         SELECT doc_a, doc_b, round(jac, 4) AS jaccard FROM pairs""",

    // q123: the UNFILTERED directed containment join (every shared
    // shingle, no prefix filter, no size gate) — the same
    // independence-from-the-filter proof as q53's oracle, for the
    // asymmetric variant. i and n are integers; one double division.
    "q123_containment" ->
      s"""WITH sh AS (
           SELECT doc_id, unnest(list_distinct(
             list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
           FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
                 FROM documents)
           WHERE len(toks) >= $NgramN),
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
           GROUP BY 1, 2)
         SELECT doc_a, doc_b,
           round(CAST(i AS DOUBLE) / CAST(na.n AS DOUBLE), 4) AS containment
         FROM inter JOIN sz na ON na.doc_id = doc_a
         WHERE CAST(i AS DOUBLE) / CAST(na.n AS DOUBLE) >= $ContainMinC""",

    "q55_tfidf_terms" ->
      """WITH tf AS (
           SELECT doc_id, t AS term, count(*) AS tf
           FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
                 FROM documents)
           GROUP BY 1, 2),
         dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS n FROM documents),
         scored AS (
           SELECT doc_id, term, tf, df,
             CAST(tf AS DOUBLE) * n.n / df AS score,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY CAST(tf AS DOUBLE) * n.n / df DESC, term ASC) AS rn
           FROM tf JOIN dfr USING (term) CROSS JOIN n)
         SELECT doc_id, term AS top_term, tf, df, score
         FROM scored WHERE rn = 1""",

    "q56_train_split" ->
      """WITH b AS (
           SELECT lang, n_chars,
             (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
             + instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS bkt
           FROM documents)
         SELECT CASE WHEN bkt < 204 THEN 'train'
                     WHEN bkt < 230 THEN 'val' ELSE 'test' END AS split,
           lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM b GROUP BY 1, 2""",

    "q57_stratified_sample" ->
      """WITH r AS (
           SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
           FROM documents)
         SELECT lang, doc_id, n_chars FROM r WHERE rn <= 20""",

    "q62_bpe_tokens" ->
      s"""SELECT doc_id,
         CAST(len(regexp_extract_all(text, '$BpePattern', 0)) AS BIGINT)
           AS n_bpe_tokens,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
           AS n_ws_tokens
         FROM documents""",

    "q58_sequence_pack" ->
      """WITH t AS (
           SELECT lang, doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (
           SELECT lang, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM t)
         SELECT lang, CAST(floor((cum - 1) / 4096) AS BIGINT) AS chunk_id,
           count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens
         FROM c GROUP BY 1, 2""",

    "q59_repetition" ->
      """WITH t AS (
           SELECT doc_id,
             list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS tris
           FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                 FROM documents)
           WHERE len(toks) >= 3)
         SELECT doc_id, CAST(len(tris) AS BIGINT) AS n_trigrams,
           CAST(len(list_distinct(tris)) AS BIGINT) AS n_distinct,
           1.0 - CAST(len(list_distinct(tris)) AS DOUBLE)
               / CAST(len(tris) AS DOUBLE) AS rep_ratio
         FROM t""",

    "q54_dup_clusters" ->
      s"""WITH RECURSIVE $ngramPairsCtes,
         edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                   UNION SELECT doc_b, doc_a FROM pairs),
         reach(a, b) AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         labels AS (
           SELECT a AS doc_id, least(a, min(b)) AS comp_id
           FROM reach GROUP BY a),
         members AS (
           SELECT l.comp_id, d.doc_id,
             row_number() OVER (PARTITION BY l.comp_id
               ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
           FROM labels l JOIN documents d ON l.doc_id = d.doc_id)
         SELECT comp_id, CAST(count(*) AS BIGINT) AS n_members,
           min(CASE WHEN rn = 1 THEN doc_id END) AS keep_id
         FROM members GROUP BY comp_id""",

    // q191: identical ascending fill — same cross-multiply saturation
    // test, same first-non-saturated level division.
    "q191_token_budget" ->
      s"""WITH avail AS (
           SELECT lang,
             CAST(sum(len(regexp_split_to_array(trim(text), '\\s+')))
               AS BIGINT) AS avail
           FROM documents GROUP BY 1),
         tot AS (SELECT CAST(sum(avail) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS k FROM avail),
         ranked AS (
           SELECT a.lang, a.avail, tot.k,
             tot.total * $BudgetNum // $BudgetDen AS b,
             CAST(row_number() OVER (ORDER BY a.avail ASC, a.lang ASC)
               AS BIGINT) AS rn,
             CAST(coalesce(sum(a.avail) OVER (
               ORDER BY a.avail ASC, a.lang ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS s_excl
           FROM avail a CROSS JOIN tot),
         sat AS (
           SELECT *, avail * (k - rn + 1) <= b - s_excl AS saturated
           FROM ranked),
         lvl AS (
           SELECT coalesce((SELECT (b - s_excl) // (k - rn + 1)
             FROM sat WHERE NOT saturated ORDER BY rn LIMIT 1),
             9223372036854775807) AS level)
         SELECT s.lang, s.avail, s.b AS budget, s.saturated,
           CASE WHEN s.saturated THEN s.avail ELSE lvl.level END AS alloc
         FROM sat s CROSS JOIN lvl""",

    // q192: the greedy rounds unrolled as generated CTEs over exact
    // token strings (doubling as the xxhash64 losslessness check).
    "q192_set_cover" -> {
      val rounds = (2 to SetCoverRounds).map { r =>
        val picked = (1 until r).map(i => s"SELECT doc_id FROM p$i")
          .mkString(" UNION ALL ")
        s"""g$r AS (
             SELECT d.doc_id, CAST(count(*) AS BIGINT) AS gain
             FROM dt d ANTI JOIN c${r - 1} c ON c.tok = d.tok
             WHERE d.doc_id NOT IN ($picked)
             GROUP BY 1),
           p$r AS (SELECT doc_id, gain FROM g$r
                   ORDER BY gain DESC, doc_id ASC LIMIT 1),
           c$r AS (SELECT tok FROM c${r - 1}
                   UNION SELECT DISTINCT d.tok FROM dt d
                   JOIN p$r USING (doc_id))"""
      }.mkString(",\n")
      val rows = (1 to SetCoverRounds).map(r =>
        s"SELECT CAST($r AS BIGINT) AS round, doc_id, gain FROM p$r")
        .mkString(" UNION ALL ")
      s"""WITH dt AS (
           SELECT doc_id, unnest(list_distinct(
             list_transform(range(1, len(ts) - 1),
               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS tok
           FROM (SELECT doc_id,
                   regexp_split_to_array(trim(text), '\\s+') AS ts
                 FROM documents)
           WHERE len(ts) >= 3),
         g1 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain
                FROM dt GROUP BY 1),
         p1 AS (SELECT doc_id, gain FROM g1
                ORDER BY gain DESC, doc_id ASC LIMIT 1),
         c1 AS (SELECT DISTINCT d.tok FROM dt d JOIN p1 USING (doc_id)),
         $rounds,
         picks AS ($rows)
         SELECT round, doc_id, gain,
           CAST(sum(gain) OVER (ORDER BY round ASC) AS BIGINT)
             AS covered_total
         FROM picks"""
    },

    // q203: the q54 closure + keep rule, rolled up to the source
    // ledger with the identical ppm yields.
    "q203_dedup_yield" ->
      s"""WITH RECURSIVE $ngramPairsCtes,
         edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                   UNION SELECT doc_b, doc_a FROM pairs),
         reach(a, b) AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         labels AS (
           SELECT a AS doc_id, least(a, min(b)) AS comp_id
           FROM reach GROUP BY a),
         members AS (
           SELECT l.comp_id, l.doc_id,
             row_number() OVER (PARTITION BY l.comp_id
               ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
           FROM labels l JOIN documents d ON l.doc_id = d.doc_id),
         toksz AS (
           SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(text), '\\s+'))
               AS BIGINT) AS n_toks
           FROM documents),
         tagged AS (
           SELECT t.source, t.n_toks,
             CASE WHEN m.doc_id IS NULL THEN TRUE ELSE m.rn = 1 END AS kept
           FROM toksz t LEFT JOIN members m ON m.doc_id = t.doc_id)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(n_toks) AS BIGINT) AS tokens_total,
           CAST(sum(CASE WHEN kept THEN n_toks ELSE 0 END) AS BIGINT)
             AS tokens_kept,
           CAST(sum(CASE WHEN kept THEN n_toks ELSE 0 END) * $CanonMass
             // sum(n_toks) AS BIGINT) AS token_yield_ppm,
           CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) * $CanonMass
             // count(*) AS BIGINT) AS doc_yield_ppm
         FROM tagged GROUP BY source""",

    // q190: the q54 closure + the identical diversity-mass argmax.
    "q190_canonical_docs" ->
      s"""WITH RECURSIVE $ngramPairsCtes,
         edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                   UNION SELECT doc_b, doc_a FROM pairs),
         reach(a, b) AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         labels AS (
           SELECT a AS doc_id, least(a, min(b)) AS comp_id
           FROM reach GROUP BY a),
         q AS (
           SELECT doc_id,
             len(list_distinct(toks)) * $CanonMass // len(toks) AS div_ppm
           FROM (SELECT doc_id,
                   regexp_split_to_array(trim(text), '\\s+') AS toks
                 FROM documents)),
         members AS (
           SELECT l.comp_id, l.doc_id, q.div_ppm,
             row_number() OVER (PARTITION BY l.comp_id
               ORDER BY q.div_ppm DESC, l.doc_id ASC) AS rn
           FROM labels l JOIN q USING (doc_id))
         SELECT comp_id, CAST(count(*) AS BIGINT) AS n_members,
           min(CASE WHEN rn = 1 THEN doc_id END) AS canonical_id,
           CAST(max(div_ppm) AS BIGINT) AS best_div_ppm,
           CAST(count(*) - 1 AS BIGINT) AS n_dropped
         FROM members GROUP BY comp_id""",

    "q20_text_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         round(avg(n_chars),2) AS avg_chars,
         min(n_chars) AS min_chars, max(n_chars) AS max_chars
         FROM documents GROUP BY lang, source""",

    "q21_token_count" ->
      """SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
           AS n_distinct_tokens
         FROM documents""",

    "q22_exact_dedup" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
         count(*) AS n_copies
         FROM documents GROUP BY md5(text)""",

    "q23_fingerprint" ->
      """SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(
           regexp_split_to_array(trim(text), '\s+'))), ' ')) AS bow_fp
         FROM documents""",

    "q24_jaccard_adjacent" ->
      """SELECT a.doc_id AS doc_a, a.doc_id + 1 AS doc_b,
         round(CAST(len(list_intersect(a.ta, b.tb)) AS DOUBLE) /
               CAST(len(a.ta) + len(b.tb) - len(list_intersect(a.ta, b.tb))
                    AS DOUBLE), 4) AS jaccard
         FROM (SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\s+')) AS ta
               FROM documents) a
         JOIN (SELECT doc_id - 1 AS doc_id,
                      list_distinct(regexp_split_to_array(trim(text), '\s+')) AS tb
               FROM documents) b USING (doc_id)""",

    "q27_quality_score" ->
      """SELECT doc_id, n_chars,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
               / CAST(n_chars AS DOUBLE) AS punct_ratio,
         CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                 x -> list_contains(['the','a','an','of','and','or','is','to','in','that'], x)))
               AS DOUBLE)
               / CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE)
           AS stop_ratio,
         CAST(length(text) - len(regexp_split_to_array(trim(text), '\s+')) + 1
               AS DOUBLE)
               / CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE)
           AS avg_token_len
         FROM documents""",

    "q48_corpus_pipeline" ->
      """WITH keep AS (
           SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
         ),
         survivors AS (
           SELECT d.lang, d.n_chars, d.text,
             CAST(len(list_filter(regexp_split_to_array(trim(d.text), '\s+'),
               x -> list_contains(['the','a','an','of','and','or','is','to','in','that'], x)))
               AS DOUBLE)
               / CAST(len(regexp_split_to_array(trim(d.text), '\s+')) AS DOUBLE) AS sr
           FROM documents d JOIN keep USING (doc_id)
           WHERE d.n_chars >= 80 AND d.n_chars <= 5000
         )
         SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
             AS total_tokens
         FROM survivors
         WHERE lang != 'en' OR sr >= 0.02
         GROUP BY lang""",

    "q28_length_percentiles" ->
      """SELECT lang,
         round(quantile_cont(n_chars, 0.5),2) AS p50,
         round(quantile_cont(n_chars, 0.9),2) AS p90,
         round(quantile_cont(n_chars, 0.99),2) AS p99
         FROM documents GROUP BY lang""",

    // q206: the brute O(vocab²) pair filter — every run re-proves the
    // deletion-neighborhood candidate generation lost nothing.
    "q206_fuzzy_vocab" ->
      s"""WITH v AS (
           SELECT t AS tok, CAST(count(*) AS BIGINT) AS n
           FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+'))
                   AS t FROM documents)
           GROUP BY 1)
         SELECT a.tok AS tok_a, b.tok AS tok_b,
           CAST(levenshtein(a.tok, b.tok) AS BIGINT) AS dist,
           a.n AS n_a, b.n AS n_b
         FROM v a JOIN v b ON a.tok < b.tok
         WHERE levenshtein(a.tok, b.tok) <= $FuzzyD""",

    // q227: identical stripes, first-seen identity, ppb-integer ln
    // values (the decimal-rounded ln trick made integral), HUGEINT
    // sufficient statistics — β and ln K are single divisions of the
    // same exact integers.
    "q227_heaps_fit" ->
      """WITH d2 AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts
           FROM documents
           WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 3),
         grams AS (
           SELECT doc_id, unnest(list_transform(range(1, len(ts) - 1),
             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
           FROM d2),
         span AS (SELECT min(doc_id) AS mn,
                    max(doc_id) - min(doc_id) + 1 AS w FROM d2),
         vnew AS (
           SELECT CAST((f.min_doc - s.mn) * 32 // s.w AS INT) AS b,
             count(*) AS dv
           FROM (SELECT g, min(doc_id) AS min_doc FROM grams GROUP BY g) f
           CROSS JOIN span s GROUP BY 1),
         nnew AS (
           SELECT CAST((doc_id - s.mn) * 32 // s.w AS INT) AS b,
             count(*) AS dn
           FROM grams CROSS JOIN span s GROUP BY 1),
         pts0 AS (
           SELECT coalesce(v.b, n.b) AS b, coalesce(dv, 0) AS dv,
             coalesce(dn, 0) AS dn
           FROM vnew v FULL JOIN nnew n ON n.b = v.b),
         pts1 AS (
           SELECT b, sum(dv) OVER cw AS v, sum(dn) OVER cw AS n FROM pts0
           WINDOW cw AS (ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         pts AS (
           SELECT
             CAST(CAST(ln(CAST(n AS DOUBLE)) AS DECIMAL(20,9))
               * 1000000000 AS BIGINT) AS x,
             CAST(CAST(ln(CAST(v AS DOUBLE)) AS DECIMAL(20,9))
               * 1000000000 AS BIGINT) AS y,
             v, n
           FROM pts1 WHERE v > 0 AND n > 0),
         a AS (
           SELECT CAST(count(*) AS BIGINT) AS k,
             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             CAST(max(v) AS BIGINT) AS vocab,
             CAST(max(n) AS BIGINT) AS tokens
           FROM pts),
         f AS (
           SELECT k, vocab, tokens,
             k * sxy - sx * sy AS num, k * sxx - sx * sx AS den,
             sy * sxx - sx * sxy AS inum
           FROM a)
         SELECT k AS n_points, vocab, tokens,
           CASE WHEN den = 0 THEN 0.0
                ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS beta,
           CASE WHEN den = 0 THEN 0.0
                ELSE CAST(inum AS DOUBLE)
                   / CAST(den * 1000000000 AS DOUBLE) END AS ln_k
         FROM f""",

    // q207: identical Hamilton apportionment and md5 rank order.
    // budget·n_docs routes HUGEINT (DECIMAL(38,0) on the Spark side):
    // the BIGINT product wraps at 100 TB-scale corpora.
    "q207_stratified_sample" ->
      s"""WITH cnt AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY 1),
         tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM cnt),
         q0 AS (
           SELECT c.source, c.n_docs, t.total,
             t.total // $SampleDen AS budget,
             CAST(t.total // $SampleDen AS HUGEINT) * c.n_docs
               // t.total AS base,
             CAST(t.total // $SampleDen AS HUGEINT) * c.n_docs
               % t.total AS rem
           FROM cnt c CROSS JOIN tot t),
         lo AS (SELECT min(budget) - sum(base) AS leftover FROM q0),
         qt AS (
           SELECT source, CAST(base + CASE WHEN
               row_number() OVER (ORDER BY rem DESC, source ASC)
                 <= l.leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
           FROM q0 CROSS JOIN lo l),
         sel AS (
           SELECT d.source, d.doc_id,
             CAST(row_number() OVER (PARTITION BY d.source
               ORDER BY md5(CAST(d.doc_id AS VARCHAR)) ASC, d.doc_id ASC)
               AS BIGINT) AS rk
           FROM documents d)
         SELECT s.source, s.doc_id, s.rk, q.quota
         FROM sel s JOIN qt q ON q.source = s.source
         WHERE s.rk <= q.quota"""
  )
}
