package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Sketch-backed corpus operators — the probabilistic-structure family a
  * training-data pipeline leans on when the exact form stops fitting:
  * Bloom-filter decontamination (the scale path for q63's exact
  * benchmark-gram join), Count-Min heavy hitters (Cormode & Muthu-
  * krishnan 2005), and priority sampling (Duffield, Lund & Thorup,
  * JACM 2007) for weighted subset selection with an unbiased total
  * estimator.
  *
  * Every sketch here is DETERMINISTIC and cross-engine exact: hash
  * positions are fixed-width slices of the md5 hex digest (md5 is the
  * one keyed digest Spark and DuckDB share bit-for-bit), so the DuckDB
  * oracle rebuilds the identical filter/counter/priority values and the
  * driver's hash compare proves the whole sketch, not a summary of it.
  * Doubles appear only as single correctly-rounded IEEE divisions of
  * exactly-representable integers (priority = w/u), so even the
  * ORDER-BY-priority selection is bit-identical across engines.
  */
object SketchQueries {

  /** Interpret `width` hex chars of digest `h` starting at 1-based
    * `offset` as an integer — the shared position-derivation for every
    * sketch in this file (the oracle SQL re-derives the same value with
    * instr arithmetic; conv() is just the Spark spelling). */
  private def hexSlice(h: Column, offset: Int, width: Int): Column =
    conv(substring(h, offset, width), 16, 10).cast("long")

  /** Bloom geometry: k=3 probes, each a 16-bit md5 slice → m=65536
    * bits. The three offsets are disjoint, non-adjacent slices of the
    * 32-char digest. At 100 TB the set-bit table stays ≤ m rows — a
    * guaranteed broadcast — while the benchmark gram set it summarizes
    * can grow unboundedly; that is the whole point of the operator
    * vs q63's exact semi-join (which must broadcast the grams
    * themselves). */
  private[graft] val BloomOffsets = Seq(1, 9, 17)
  private[graft] val BloomBits = 1 << 16

  /** CMS geometry: depth 3 × width 4096 (12-bit md5 slices). The
    * counter table is ≤ 3·4096 rows whatever the corpus size. */
  private[graft] val CmsOffsets = Seq(1, 9, 17)
  private[graft] val CmsWidth = 1 << 12
  private[graft] val CmsTopK = 20

  /** Priority-sampling k: per-language sample size. τ is the (k+1)-th
    * priority; the Horvitz–Thompson weight max(w, τ) makes Σ ht_w an
    * unbiased estimator of the group's Σ w (Duffield et al. §2). */
  private[graft] val PsK = 8

  /** AMS sketch width (q159): independent ±1 counters averaged into
    * the F₂ estimate. 16 gives relative error ≈ 1/√16 — the classic
    * sketch-accuracy dial; the state is S BIGINTs however large the
    * key domain grows. */
  private[graft] val AmsCounters = 16

  private def whitespaceToks: Column = split(trim(col("text")), "\\s+")

  /** HLL geometry (q145/q146): b = 4 bits → m = 16 registers addressed
    * by the digest's FIRST hex char; ρ is computed over the NEXT 8 hex
    * chars (a 32-bit window), so ρ ∈ [1, 32] for x > 0 and 33 for
    * x = 0. Registers are maxes — idempotent, commutative, map-side
    * combinable, and LSM-fold-invariant, which is exactly what makes
    * the streaming twin (q146) a plain partial-register store with a
    * merge-on-read max. The harmonic sum routes through INTEGERS:
    * Σ 2^(scale − M[j]) ≤ m·2^scale fits BIGINT comfortably, and the
    * estimate is ONE IEEE division of a constant numerator
    * (α₁₆·m²·2^scale) by that integer — bit-identical cross-engine
    * (Flajolet et al. 2007's estimator, rescaled to avoid 2^-M
    * fractions). No small-range linear-counting correction: that would
    * reintroduce ln(); instead the zero-register count is REPORTED so
    * a consumer can apply it, and q145 carries the exact distinct
    * count beside the estimate as its own accuracy audit. */
  private[graft] val HllM = 16
  private[graft] val HllScale = 34
  private[graft] val HllNumerator: Double =
    0.673 * (HllM.toDouble * HllM) * math.pow(2.0, HllScale)

  /** Per-(lang, register) max-ρ table from a document slice — the
    * mergeable HLL state (shared: q145 builds it in one pass, q146's
    * micro-batches each build a PARTIAL one and merge by max). */
  def hllRegisters(docs: DataFrame): DataFrame =
    docs.select(col("lang"), explode(whitespaceToks).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("h", md5(col("tok").cast("binary")))
      .select(col("lang"), hexSlice(col("h"), 1, 1).as("b"),
        hexSlice(col("h"), 2, 8).as("x"))
      .withColumn("rho", when(col("x") === 0, lit(33))
        .otherwise(lit(33) - length(bin(col("x")))))
      .groupBy(col("lang"), col("b")).agg(max(col("rho")).as("m"))

  /** Registers → (lang, zeros, s_scaled, est): the grid join fills
    * absent registers with M = 0 (2^scale mass), the harmonic sum is
    * an exact BIGINT, and `est` is the single division. `langs` is the
    * group universe (distinct lang — rows with NO tokens still get a
    * row, with est = α·m²·2^scale / (m·2^scale) = α·m). */
  def hllSummary(regs: DataFrame, langs: DataFrame): DataFrame = {
    val s = regs.sparkSession
    val grid = langs.crossJoin(broadcast(s.range(HllM).toDF("b")))
    grid.join(regs, Seq("lang", "b"), "left")
      .withColumn("m", coalesce(col("m"), lit(0)))
      .groupBy(col("lang")).agg(
        sum(pow(lit(2.0), lit(HllScale) - col("m")).cast("long")).as("s_scaled"),
        sum(when(col("m") === 0, 1L).otherwise(0L)).as("zeros"))
      .withColumn("est", lit(HllNumerator) / col("s_scaled").cast("double"))
  }

  /** Histogram-quantile geometry (q147): 256 fixed bins between the
    * corpus min/max — the mergeable fixed-memory alternative to an
    * exact per-group sort at 100 TB (the bin table is ≤ bins×groups
    * rows whatever the corpus size; merging shards is a plain count
    * sum). Quantile selection is the integer cross-multiply
    * cum·100 ≥ p·n — no division anywhere. */
  private[graft] val HistBins = 256L
  private[graft] val HistPs = Seq(50, 90, 99)

  /** q153 base-2 log-bin histogram quantiles over a merged
    * (lang, b, cnt) count table — the STREAMING-legitimate variant of
    * q147: the bin grid is ABSOLUTE (b = ⌊log2 n_chars⌋ via the same
    * length(bin(x)) trick q145's ρ uses — ≤ 64 bins forever, no
    * corpus min/max barrier to wait for), so batch/shard histograms
    * merge by plain count addition with no re-binning. The quantile
    * pick is the same integer cross-multiply cum·100 ≥ p·n; the
    * answer is the integer [2^b, 2^(b+1)) bin bracket. Windows run
    * only over the geometry-bounded (≤ 64 × langs) bin table. */
  def logHistQuantiles(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byLang = Window.partitionBy(col("lang"))
    val cum = counts
      .groupBy(col("lang"), col("b")).agg(sum(col("cnt")).as("cnt"))
      .withColumn("cum_le",
        sum(col("cnt")).over(byLang.orderBy(col("b").asc)))
      .withColumn("n_docs", sum(col("cnt")).over(byLang))
      .localCheckpoint()
    val ps = HistPs.map(p => lit(p.toLong))
    val qb = cum.withColumn("p", explode(array(ps: _*)))
      .filter(col("cum_le") * 100 >= col("p") * col("n_docs"))
      .groupBy(col("lang"), col("p")).agg(min(col("b")).as("qb")).alias("q")
    qb.join(cum.alias("c"),
        col("q.lang") === col("c.lang") && col("q.qb") === col("c.b"))
      .select(col("q.lang").as("lang"), col("q.p").as("p"),
        col("q.qb").cast("long").as("qb"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(q.qb AS INT))").as("bin_lo"),
        (expr("shiftleft(CAST(1 AS BIGINT), CAST(q.qb AS INT) + 1)") - 1)
          .as("bin_hi"),
        col("c.cum_le").as("cum_le"), col("c.n_docs").as("n_docs"))
  }

  /** q154 KMV geometry: [[KmvK]] minimum hash values kept per source
    * (Beyer et al. 2007 — the distinct-value sketch whose UNION is
    * just a merge-and-recut, which is what makes cross-source overlap
    * estimation a k-row join instead of a corpus-sized one); hashes
    * are the md5 first-12-hex slice → a 48-bit value, so the k-th
    * minimum estimator (k−1)·2^48/kth is exact-integer until its one
    * IEEE division. */
  private[graft] val KmvK = 64
  private[graft] val KmvSpace = 281474976710656L // 2^48

  /** Per-source distinct 48-bit trigram hashes — the KMV input unit,
    * shared by q154's one-shot build and the streaming twin's
    * per-batch partial sketches. */
  private[graft] def kmvHashes(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), whitespaceToks.as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(col("source"),
        explode(TextQueries.tokenTrigrams(col("ts"))).as("g"))
      .select(col("source"),
        hexSlice(md5(col("g").cast("binary")), 1, 12).as("h"))
      .distinct()

  /** The q154 tail over ANY (source, h) candidate table that CONTAINS
    * each source's true k minima: re-cut to k per source, pair-merge,
    * re-cut per pair, estimate. Shared with the streaming twin (q217)
    * BY ORDER-STATISTICS ALGEBRA: each of the global k smallest hashes
    * is among the k smallest of whichever batch carried it, so the
    * union of per-batch k-min sketches always contains the global
    * k-min set and the re-cut recovers it exactly — the merge rule
    * Beyer et al. define for KMV union, applied across micro-batches
    * instead of across sources. */
  def kmvOverlapView(g0: DataFrame): DataFrame = {
    val sk = GroupedTopK.topK(g0.distinct(), Seq("source"),
      Seq(col("h").asc), KmvK)
      .select(col("source"), col("h"))
      .localCheckpoint() // ≤ k×sources rows; feeds pairs + both merge legs
    val srcs = sk.select(col("source")).distinct()
    // ≤ sources² rows — materialize once so both merge legs read the
    // pair list rather than re-planning the s1<s2 loop join twice
    val sp = srcs.select(col("source").as("s1"))
      .join(srcs.select(col("source").as("s2")), col("s1") < col("s2"))
      .localCheckpoint()
    val merged = sp
      .join(sk.select(col("source").as("s1"), col("h")), "s1")
      .select(col("s1"), col("s2"), col("h"))
      .unionAll(sp
        .join(sk.select(col("source").as("s2"), col("h")), "s2")
        .select(col("s1"), col("s2"), col("h")))
      .groupBy(col("s1"), col("s2"), col("h"))
      .agg(count(lit(1)).as("nsk")) // 2 ⇔ the value is in BOTH sketches
    val cut = GroupedTopK.topK(merged, Seq("s1", "s2"),
      Seq(col("h").asc), KmvK)
    cut.groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("n_k"), max(col("h")).as("kth"),
        sum(when(col("nsk") === 2, 1L).otherwise(0L)).as("n_common"))
      .select(col("s1"), col("s2"), col("n_k"), col("kth"), col("n_common"),
        (((col("n_k") - 1) * KmvSpace).cast("double") / col("kth"))
          .as("union_est"),
        (col("n_common").cast("double") / col("n_k")).as("jacc_est"))
  }

  /** The CMS tail over an exact (tok, exact_cnt) count table — shared
    * by batch q135 and the streaming twin q140 (whose counts arrive via
    * the incremental store), so both pin against the SAME oracle SQL.
    * The counter table is bounded by geometry (≤ depth·width rows) →
    * broadcast; the top-k plans as TakeOrderedAndProject. */
  def cmsTopK(exactCounts: DataFrame): DataFrame = {
    val exact = exactCounts.withColumn("h", md5(col("tok").cast("binary")))
    val rows = exact.select(col("tok"), col("exact_cnt"),
      posexplode(array(CmsOffsets.map(o => hexSlice(col("h"), o, 3)): _*))
        .as(Seq("r", "p")))
    val counters = rows.groupBy(col("r"), col("p"))
      .agg(sum(col("exact_cnt")).as("c"))
    rows.join(broadcast(counters), Seq("r", "p"))
      .groupBy(col("tok"), col("exact_cnt"))
      .agg(min(col("c")).as("cms_est"))
      .orderBy(col("cms_est").desc, col("tok").asc).limit(CmsTopK)
      .select(col("tok"), col("cms_est"), col("exact_cnt"))
  }

  /** Per-doc distinct token trigrams with their md5 digests — the
    * shared front end of q134. */
  private def gramDigests(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), whitespaceToks.as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(TextQueries.tokenTrigrams(col("ts")))).as("g"))
      .withColumn("h", md5(col("g").cast("binary")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Bloom-filter decontamination (the q63 semantics at sketch scale):
    // the benchmark's distinct trigrams are folded into a 65536-bit
    // filter (stored relationally as the ≤65536-row set-bit table so
    // the oracle can replay it); corpus grams whose THREE probe
    // positions are all set are bloom-flagged. Reported next to the
    // exact semi-join flags so the false-positive overhead is the
    // query's own output: bloom_* ≥ exact_* always (no false
    // negatives), and the gap is what m buys. The bit table and the
    // exact gram set are both broadcast; the corpus side never
    // shuffles by gram.
    "q134_bloom_decontam" -> ((s, d) => {
      val g = gramDigests(documents(s, d))
      val bench = g.filter(col("doc_id") % 97 === 0)
      val probe = g.filter(col("doc_id") % 97 =!= 0)
      val bits = bench
        .select(explode(array(BloomOffsets.map(o => hexSlice(col("h"), o, 4)): _*)).as("p"))
        .distinct()
      val probePos = probe.select(col("doc_id"), col("lang"), col("g"),
        explode(array(BloomOffsets.map(o => hexSlice(col("h"), o, 4)): _*)).as("p"))
      val bloomHits = probePos.join(broadcast(bits), "p")
        .groupBy(col("doc_id"), col("g"))
        .agg(count(lit(1)).as("k_set"))
        .filter(col("k_set") === BloomOffsets.size)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("bloom_grams"))
      val exactHits = probe
        .join(broadcast(bench.select(col("g")).distinct()), "g")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("exact_grams"))
      documents(s, d).filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), col("lang"))
        .join(bloomHits, Seq("doc_id"), "left")
        .join(exactHits, Seq("doc_id"), "left")
        .groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          sum(when(coalesce(col("bloom_grams"), lit(0L)) > 0, 1L).otherwise(0L)).as("bloom_docs"),
          sum(when(coalesce(col("exact_grams"), lit(0L)) > 0, 1L).otherwise(0L)).as("exact_docs"),
          sum(coalesce(col("bloom_grams"), lit(0L))).as("bloom_grams"),
          sum(coalesce(col("exact_grams"), lit(0L))).as("exact_grams"))
    }),

    // Multi-granularity HLL distinct (SK9 — "distinct users at every
    // rollup level from ONE scan": the sketch algebra DISTRIBUTES
    // over the grouping-sets lattice because registers max-merge —
    // a coarse level's registers are exactly the max of its fine
    // level's, so one Expand pass computes every level's sketch and
    // the levels are CONSISTENT by construction, which post-hoc
    // per-level count-distincts never are. q145's estimator × q215's
    // lattice, over (event_type, dow) / (event_type) / (). The exact
    // distinct rides along from a second grouping-sets pass over the
    // same 3-column projection, so the query is its own accuracy
    // audit; est is the single division of exact integers. */
    "q231_hll_rollup" -> ((s, d) => {
      val e = graft.Tables.events(s, d).select(col("event_type"),
        ((expr("unix_micros(ts) DIV 86400000000") + 4) % 7).as("dow"),
        col("user_id"))
      val withReg = e
        .withColumn("h", md5(col("user_id").cast("string").cast("binary")))
        .select(col("event_type"), col("dow"),
          hexSlice(col("h"), 1, 1).as("b"),
          hexSlice(col("h"), 2, 8).as("x"))
        .withColumn("rho", when(col("x") === 0, lit(33))
          .otherwise(lit(33) - length(bin(col("x")))))
      val regs = withReg.groupingSets(
          Seq(Seq(col("event_type"), col("dow"), col("b")),
            Seq(col("event_type"), col("b")), Seq(col("b"))),
          col("event_type"), col("dow"), col("b"))
        .agg(max(col("rho")).as("m"))
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("dow"), lit(-1L)).as("dow"), col("b"), col("m"))
      // group universe per level: types×7 + types + 1 rows — bounded
      val groups = e.select(col("event_type"), col("dow")).distinct()
        .unionByName(e.select(col("event_type")).distinct()
          .withColumn("dow", lit(-1L)))
        .unionByName(s.range(1).select(lit("ALL").as("event_type"),
          lit(-1L).as("dow")))
      val grid = groups.crossJoin(broadcast(s.range(HllM).toDF("b")))
      val ests = grid.join(regs, Seq("event_type", "dow", "b"), "left")
        .withColumn("m", coalesce(col("m"), lit(0)))
        .groupBy(col("event_type"), col("dow"))
        .agg(sum(pow(lit(2.0), lit(HllScale) - col("m")).cast("long"))
          .as("s_scaled"))
        .withColumn("est", lit(HllNumerator) / col("s_scaled").cast("double"))
      val exact = e.groupingSets(
          Seq(Seq(col("event_type"), col("dow")), Seq(col("event_type")),
            Seq.empty),
          col("event_type"), col("dow"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("dow"), lit(-1L)).as("dow"), col("n_exact"))
      ests.join(exact, Seq("event_type", "dow"))
        .select(col("event_type"), col("dow"), col("s_scaled"), col("est"),
          col("n_exact"))
    }),

    // Bloom false-positive-rate audit (D26 — "is the filter's error
    // what the math promised": the calibration check that decides
    // whether q134's m/k geometry is still right as the benchmark
    // grows). KNOWN NEGATIVES = distinct probe-side trigrams absent
    // from the benchmark gram set (exact anti-join — ground truth by
    // construction); measured FPR = the fraction whose 3 probe
    // positions are all set. The expected rate CONDITIONS ON THE
    // ACTUAL LOAD, (bits_set/m)³ — an identity both engines evaluate
    // as one division and two multiplies over the same exact integers
    // (no e^{−kn/m} approximation, no pow). One row out; the bit
    // table stays ≤65536 rows and broadcasts.
    "q226_bloom_fpr" -> ((s, d) => {
      val g = gramDigests(documents(s, d))
      val bench = g.filter(col("doc_id") % 97 === 0)
      val bits = bench
        .select(explode(array(
          BloomOffsets.map(o => hexSlice(col("h"), o, 4)): _*)).as("p"))
        .distinct()
        .localCheckpoint() // ≤65536 rows; feeds load + membership
      val neg = g.filter(col("doc_id") % 97 =!= 0)
        .select(col("g"), col("h")).distinct()
        .join(bench.select(col("g")).distinct(), Seq("g"), "left_anti")
        .localCheckpoint() // feeds the probe + the denominator
      val falsePos = neg
        .select(col("g"), explode(array(
          BloomOffsets.map(o => hexSlice(col("h"), o, 4)): _*)).as("p"))
        .join(broadcast(bits), "p")
        .groupBy(col("g")).agg(count(lit(1)).as("k_set"))
        .filter(col("k_set") === BloomOffsets.size)
        .agg(count(lit(1)).as("false_pos"))
      neg.agg(count(lit(1)).as("n_neg"))
        .crossJoin(broadcast(bits.agg(count(lit(1)).as("bits_set"))))
        .crossJoin(broadcast(falsePos))
        .select(col("n_neg"), col("bits_set"), col("false_pos"),
          (col("false_pos").cast("double") / col("n_neg").cast("double"))
            .as("fpr"),
          {
            val load = col("bits_set").cast("double") / lit(65536.0)
            (load * load * load).as("expected_fpr")
          })
    }),

    // Count-Min heavy hitters: 3×4096 counter table built from the
    // EXACT per-token counts (counter(r,p) = Σ cnt over tokens hashing
    // to p in row r — identical to adding per occurrence, one shuffle
    // cheaper), estimate = min over the 3 rows, top-20 tokens by
    // (estimate DESC, token ASC). The exact count rides along so the
    // query's own output exhibits the one-sided CMS error
    // (cms_est ≥ exact_cnt row by row). The counter table is bounded
    // by geometry, not data → broadcast; the top-20 plans as
    // TakeOrderedAndProject, never a global sort.
    "q135_cms_heavy" -> ((s, d) =>
      cmsTopK(documents(s, d)
        .select(explode(whitespaceToks).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt")))),

    // Priority sampling: u = 40-bit md5 slice of doc_id (+1, so
    // u ∈ [1, 2^40] — never 0), priority = w/u with w = n_chars. Both
    // operands are exactly-representable doubles, so the one division
    // is correctly rounded and IDENTICAL in DuckDB — the top-k
    // SELECTION itself is cross-engine exact, not just the output
    // values. Per-language top-(k+1) through GroupedTopK (no
    // single-reducer window; languages are few and huge — the exact
    // shape GroupedTopK exists for), row k+1's priority is τ, and the
    // k kept rows carry ht_w = max(w, τ): Σ ht_w per group is the
    // unbiased Horvitz–Thompson estimate of the group's total weight.
    "q136_priority_sample" -> ((s, d) => {
      val docs = documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars").as("w"))
        .withColumn("h", md5(col("doc_id").cast("string").cast("binary")))
        .withColumn("u", hexSlice(col("h"), 1, 10) + 1)
        .withColumn("priority", col("w").cast("double") / col("u").cast("double"))
      val ranked = GroupedTopK.topK(docs, Seq("lang"),
        Seq(col("priority").desc, col("doc_id").asc), PsK + 1)
      // τ rides a per-lang window over the ≤(k+1)-row SURVIVORS (not
      // the corpus), so the scan+rank chain runs exactly once — a
      // separate tau branch would recompute it
      import org.apache.spark.sql.expressions.Window
      ranked
        .withColumn("tau", coalesce(
          max(when(col("rn") === PsK + 1, col("priority")))
            .over(Window.partitionBy(col("lang"))), lit(0.0)))
        .filter(col("rn") <= PsK)
        .select(col("lang"), col("rn").cast("long").as("rn"), col("doc_id"),
          col("w"), greatest(col("w").cast("double"), col("tau")).as("ht_w"),
          col("tau"))
    }),

    // Deterministic HyperLogLog distinct-token estimate per language
    // (Flajolet et al. 2007), the sketch sibling of A6: q08's
    // approx_count_distinct is engine-internal (spec-gated only); this
    // one's registers are md5-derived, so DuckDB rebuilds the IDENTICAL
    // sketch and the driver hash-checks the whole estimator — zeros,
    // harmonic sum AND the one-division estimate. The exact distinct
    // count rides along as the query's own accuracy audit (the q135
    // exact_cnt pattern). Register table ≤ m×langs rows — geometry-
    // bounded; the corpus pass is one hash + one map-side-combined max.
    "q145_hll_distinct" -> ((s, d) => {
      val docs = documents(s, d)
      val exact = docs.select(col("lang"), explode(whitespaceToks).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy(col("lang")).agg(countDistinct(col("tok")).as("n_exact"))
      hllSummary(hllRegisters(docs), docs.select(col("lang")).distinct())
        .join(exact, Seq("lang"), "left")
        .select(col("lang"), lit(HllM.toLong).as("m_regs"), col("zeros"),
          col("s_scaled"), col("est"),
          coalesce(col("n_exact"), lit(0L)).as("n_exact"))
    }),

    // Mergeable histogram quantiles: per-lang p50/p90/p99 of n_chars
    // from a 256-bin fixed grid between the corpus min/max — the
    // fixed-memory alternative to an exact per-group sort (O3's global
    // order) at 100 TB. The bin table is geometry-bounded (≤ bins ×
    // langs rows), shards merge by count addition, and the quantile
    // pick is the integer cross-multiply cum·100 ≥ p·n — the answer is
    // a bin [lo, hi] bracket, all integers, no division, no
    // interpolation float surface. The only windows run over the
    // geometry-bounded bin table, never the corpus.
    // KMV cross-source distinct-overlap estimation (Beyer et al. 2007)
    // — "how much does source A's content overlap source B's", the
    // curation question behind source-mix design, answered WITHOUT the
    // corpus-sized pairwise gram join q132 does exactly: each source
    // keeps only its KmvK minimum 48-bit gram hashes (two-phase
    // GroupedTopK — sources are LOW-cardinality groups, exactly the
    // regime where a plain source-partitioned window single-reduces
    // the corpus); a pair's union sketch is the merged re-cut of two
    // k-row sketches, so the pair stage touches k×sources rows total.
    // Union estimate (n_k−1)·2^48/kth and Jaccard n_common/n_k are
    // each ONE IEEE division over exact integers — bit-stable. The
    // exact-string oracle rebuilds the identical sketch (md5 slices),
    // doubling as the collision check.
    // HLL distinct-GROWTH curve (SK8 — q210's cumulative curve at
    // sketch cost, the form that survives when per-day exact user sets
    // stop fitting): registers are MAX-mergeable, so the cumulative
    // sketch at day t is the prefix-max of the daily register table —
    // one window over the GEOMETRY-BOUNDED (types × calendar × m) grid,
    // never over users. The exact curve (q210's first-seen identity)
    // rides along, so the query IS its own accuracy audit (err in ppm,
    // the q145 exact-beside-estimate pattern, extended per-day).
    "q212_hll_curve" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = events(s, d)
        .select(col("event_type"), col("user_id"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .localCheckpoint() // feeds registers + span + the exact curve
      val regs = e
        .withColumn("h", md5(col("user_id").cast("string").cast("binary")))
        .select(col("event_type"), col("day"),
          hexSlice(col("h"), 1, 1).as("b"),
          hexSlice(col("h"), 2, 8).as("x"))
        .withColumn("rho", when(col("x") === 0, lit(33))
          .otherwise(lit(33) - length(bin(col("x")))))
        .groupBy(col("event_type"), col("day"), col("b"))
        .agg(max(col("rho")).as("m"))
      val span = e.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val grid = e.select(col("event_type")).distinct()
        .crossJoin(broadcast(span))
        .select(col("event_type"),
          explode(expr("sequence(d0, d1)")).as("day"))
        .crossJoin(broadcast(s.range(HllM).toDF("b")))
      val w = Window.partitionBy(col("event_type"), col("b"))
        .orderBy(col("day").asc)
      val summary = grid.join(regs, Seq("event_type", "day", "b"), "left")
        .withColumn("cm", max(coalesce(col("m"), lit(0))).over(w))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(pow(lit(2.0), lit(HllScale) - col("cm")).cast("long"))
          .as("s_scaled"),
          sum(when(col("cm") === 0, 1L).otherwise(0L)).as("zeros"))
        .withColumn("est", lit(HllNumerator) / col("s_scaled").cast("double"))
      val exact = RelationalQueries.cumulativeDistinctView(
        e.groupBy(col("event_type"), col("user_id"))
          .agg(min(col("day")).as("fday"), max(col("day")).as("lday")))
      summary
        .join(exact.select(col("event_type"), col("day"),
          col("cum_users")), Seq("event_type", "day"))
        .select(col("event_type"), col("day"), col("zeros"),
          col("s_scaled"), col("est"), col("cum_users"),
          when(col("cum_users") === 0, lit(-1L)).otherwise(
            floor(abs(col("est") / col("cum_users") - 1.0) * 1000000)
              .cast("long")).as("err_ppm"))
    }),

    "q154_kmv_overlap" -> ((s, d) => kmvOverlapView(kmvHashes(documents(s, d)))),

    // AMS F₂ / self-join-size estimation (Alon, Matias & Szegedy '96,
    // the STOC Gödel-prize sketch): estimate Σ c_k² over the user_id
    // key WITHOUT materializing anything key-domain-sized — the number
    // a distributed planner wants before committing to a join strategy
    // on a 100 TB fact table (Σ c² IS the self-join row count, and
    // pairwise join size follows from the same counters). Each of the
    // AmsCounters counters is Σ ±c with a deterministic md5-parity
    // sign — per-key state never exists, the sketch is S BIGINTs, and
    // shards merge by ADDITION (counter_j is a plain sum), so the
    // sketch is partition- and stream-mergeable by algebra. E[counter²]
    // = F₂ under 4-wise independence (md5 in practice); the estimate
    // averages the S squares. Squares route through DECIMAL(38,0) —
    // counter ≤ Σc can reach 10¹³ at 100 TB, so counter² overflows
    // BIGINT by design, not by accident. The exact F₂ rides along as
    // the accuracy audit (the q145 doctrine), and the single division
    // is one IEEE double over exactly-represented operands.
    "q159_ams_f2" -> ((s, d) => {
      val c = events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // consumed twice: the grid and the exact audit
      val grid = c.withColumn("j",
          explode(sequence(lit(1), lit(AmsCounters))))
        .select(col("j"), ((lit(1L) - lit(2L) *
          (hexSlice(md5(concat_ws(":", col("j"), col("user_id"))), 12, 1)
            % 2)) * col("c")).as("sc"))
      val ctr = grid.groupBy(col("j")).agg(sum(col("sc")).as("counter"))
        .withColumn("x2",
          (col("counter").cast("decimal(19,0)") *
            col("counter").cast("decimal(19,0)")).cast("decimal(38,0)"))
        .localCheckpoint() // consumed twice: output rows + the Σx² leg
      val est = ctr.agg(sum(col("x2")).cast("decimal(38,0)").as("sx"))
      val exact = c.agg(
        sum(col("c").cast("decimal(19,0)") * col("c").cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("f2"),
        count(lit(1)).as("n_keys"))
      // decimal→double only at the OUTPUT boundary (IEEE-nearest in
      // both engines over identical decimal values — the arithmetic
      // itself never leaves DECIMAL)
      ctr.crossJoin(broadcast(est)).crossJoin(broadcast(exact))
        .select(col("j").cast("long").as("j"), col("counter"),
          col("x2").cast("double").as("x2"),
          (col("sx").cast("double") / AmsCounters).as("f2_est"),
          col("f2").cast("double").as("f2_exact"), col("n_keys"))
    }),

    "q147_hist_quantiles" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = documents(s, d).select(col("lang"), col("n_chars"))
      val stats = docs.agg(min(col("n_chars")).as("lo"),
        max(col("n_chars")).as("hi"))
      val binned = docs.crossJoin(broadcast(stats))
        .select(col("lang"), col("lo"),
          expr(s"(hi - lo) DIV $HistBins + 1").as("w"),
          expr(s"(n_chars - lo) DIV ((hi - lo) DIV $HistBins + 1)").as("bin"))
      val counts = binned
        .groupBy(col("lang"), col("lo"), col("w"), col("bin"))
        .agg(count(lit(1)).as("cnt"))
      val byLang = Window.partitionBy(col("lang"))
      // geometry-bounded (≤ bins×langs rows) and consumed by BOTH the
      // quantile-pick branch and the join-back — materialize once so
      // the corpus scan + binning never replays per branch
      val cum = counts
        .withColumn("cum_le", sum(col("cnt"))
          .over(byLang.orderBy(col("bin").asc)))
        .withColumn("n_docs", sum(col("cnt")).over(byLang))
        .localCheckpoint()
      val ps = HistPs.map(p => lit(p.toLong))
      val withP = cum.withColumn("p", explode(array(ps: _*)))
        .filter(col("cum_le") * 100 >= col("p") * col("n_docs"))
      // qb descends from cum, so the join-back is a self-join: alias
      // both sides explicitly (unaliased, Spark resolves the lang
      // equality to ONE attribute — a trivially-true predicate)
      val qb = withP.groupBy(col("lang"), col("p"))
        .agg(min(col("bin")).as("qbin")).alias("q")
      qb.join(cum.alias("c"),
          col("q.lang") === col("c.lang") && col("q.qbin") === col("c.bin"))
        .select(col("q.lang").as("lang"), col("q.p").as("p"), col("q.qbin").as("qbin"),
          (col("c.lo") + col("q.qbin") * col("c.w")).as("bin_lo"),
          (col("c.lo") + (col("q.qbin") + 1) * col("c.w") - 1).as("bin_hi"),
          col("c.cum_le").as("cum_le"), col("c.n_docs").as("n_docs"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    // q159: the identical sketch rebuilt — same md5-parity signs, same
    // DECIMAL(38,0) squares, the same single IEEE division.
    "q159_ams_f2" ->
      s"""WITH c AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
         grid AS (
           SELECT js.j, u.c, CAST(1 - 2 * ((instr('0123456789abcdef',
               substr(md5(CAST(js.j AS VARCHAR) || ':' ||
                 CAST(u.user_id AS VARCHAR)), 12, 1)) - 1) % 2)
             AS BIGINT) AS sgn
           FROM c u CROSS JOIN
             (SELECT unnest(generate_series(1, $AmsCounters)) AS j) js),
         ctr AS (
           SELECT j, CAST(sum(sgn * c) AS BIGINT) AS counter
           FROM grid GROUP BY 1),
         x AS (
           SELECT j, counter, CAST(CAST(counter AS DECIMAL(19,0)) *
             CAST(counter AS DECIMAL(19,0)) AS DECIMAL(38,0)) AS x2
           FROM ctr),
         sx AS (SELECT CAST(sum(x2) AS DECIMAL(38,0)) AS sx FROM x),
         ex AS (
           SELECT CAST(sum(CAST(c AS DECIMAL(19,0)) *
               CAST(c AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS f2,
             CAST(count(*) AS BIGINT) AS n_keys
           FROM c)
         SELECT CAST(x.j AS BIGINT) AS j, x.counter,
           CAST(x.x2 AS DOUBLE) AS x2,
           CAST(sx.sx AS DOUBLE) / $AmsCounters AS f2_est,
           CAST(ex.f2 AS DOUBLE) AS f2_exact, ex.n_keys
         FROM x CROSS JOIN sx CROSS JOIN ex""",

    // q231: the identical register construction per (type, dow), then
    // the three lattice levels rebuilt EXPLICITLY (coarse registers =
    // max over the fine table — the same identity the Spark Expand
    // relies on), the same grid fill, harmonic sum and division;
    // exact distincts via GROUPING SETS.
    "q231_hll_rollup" ->
      s"""WITH e AS (
           SELECT event_type,
             (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
             user_id
           FROM events),
         hashed AS (
           SELECT DISTINCT event_type, dow,
             md5(CAST(user_id AS VARCHAR)) AS h
           FROM e),
         xs AS (
           SELECT event_type, dow, h,
             CAST(sum((instr('0123456789abcdef',
                 substr(h, CAST(i AS INT), 1)) - 1)
               * CAST(power(16, 9 - i) AS BIGINT)) AS BIGINT) AS x
           FROM hashed CROSS JOIN range(2, 10) r(i)
           GROUP BY event_type, dow, h),
         fine AS (
           SELECT event_type, dow,
             instr('0123456789abcdef', substr(h, 1, 1)) - 1 AS b,
             max(CASE WHEN x = 0 THEN 33 ELSE 33 - length(bin(x)) END) AS m
           FROM xs GROUP BY event_type, dow, b),
         regs AS (
           SELECT event_type, dow, b, m FROM fine
           UNION ALL
           SELECT event_type, CAST(-1 AS BIGINT), b, max(m)
           FROM fine GROUP BY event_type, b
           UNION ALL
           SELECT 'ALL', CAST(-1 AS BIGINT), b, max(m)
           FROM fine GROUP BY b),
         groups AS (
           SELECT DISTINCT event_type, dow FROM e
           UNION ALL SELECT DISTINCT event_type, CAST(-1 AS BIGINT) FROM e
           UNION ALL SELECT 'ALL', CAST(-1 AS BIGINT)),
         grid AS (
           SELECT g.event_type, g.dow, r.range AS b
           FROM groups g CROSS JOIN range(0, $HllM) r),
         filled AS (
           SELECT g.event_type, g.dow, g.b, coalesce(r.m, 0) AS m
           FROM grid g LEFT JOIN regs r ON r.event_type = g.event_type
             AND r.dow = g.dow AND r.b = g.b),
         agg AS (
           SELECT event_type, dow,
             CAST(sum(CAST(power(2, $HllScale - m) AS BIGINT)) AS BIGINT)
               AS s_scaled
           FROM filled GROUP BY 1, 2),
         exact AS (
           SELECT coalesce(event_type, 'ALL') AS event_type,
             coalesce(dow, -1) AS dow,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
           FROM e
           GROUP BY GROUPING SETS ((event_type, dow), (event_type), ()))
         SELECT a.event_type, a.dow, a.s_scaled,
           $HllNumerator / CAST(a.s_scaled AS DOUBLE) AS est,
           x.n_exact
         FROM agg a JOIN exact x
           ON x.event_type = a.event_type AND x.dow = a.dow""",

    // q226: the same md5-slice bit table and positions as q134's
    // oracle, negatives via EXCEPT, membership via k-of-k HAVING;
    // the conditional expected rate is the identical (b/m)³ chain.
    "q226_bloom_fpr" ->
      """WITH toksrc AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts
           FROM documents),
         grams AS (
           SELECT doc_id, unnest(list_distinct(
             list_transform(range(1, len(ts) - 1),
               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS g
           FROM toksrc WHERE len(ts) >= 3),
         bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
         negg AS (
           SELECT DISTINCT g FROM grams WHERE doc_id % 97 <> 0
           EXCEPT SELECT g FROM bench),
         posb AS (
           SELECT DISTINCT
             (instr('0123456789abcdef', substr(md5(g), o, 1)) - 1) * 4096
             + (instr('0123456789abcdef', substr(md5(g), o + 1, 1)) - 1) * 256
             + (instr('0123456789abcdef', substr(md5(g), o + 2, 1)) - 1) * 16
             + (instr('0123456789abcdef', substr(md5(g), o + 3, 1)) - 1) AS p
           FROM bench CROSS JOIN (SELECT unnest([1, 9, 17]) AS o) os),
         posn AS (
           SELECT g,
             (instr('0123456789abcdef', substr(md5(g), o, 1)) - 1) * 4096
             + (instr('0123456789abcdef', substr(md5(g), o + 1, 1)) - 1) * 256
             + (instr('0123456789abcdef', substr(md5(g), o + 2, 1)) - 1) * 16
             + (instr('0123456789abcdef', substr(md5(g), o + 3, 1)) - 1) AS p
           FROM negg CROSS JOIN (SELECT unnest([1, 9, 17]) AS o) os),
         fp AS (
           SELECT g FROM posn WHERE p IN (SELECT p FROM posb)
           GROUP BY g HAVING count(*) = 3),
         s AS (
           SELECT CAST((SELECT count(*) FROM negg) AS BIGINT) AS n_neg,
             CAST((SELECT count(*) FROM posb) AS BIGINT) AS bits_set,
             CAST((SELECT count(*) FROM fp) AS BIGINT) AS false_pos)
         SELECT n_neg, bits_set, false_pos,
           CAST(false_pos AS DOUBLE) / CAST(n_neg AS DOUBLE) AS fpr,
           (CAST(bits_set AS DOUBLE) / 65536.0)
             * (CAST(bits_set AS DOUBLE) / 65536.0)
             * (CAST(bits_set AS DOUBLE) / 65536.0) AS expected_fpr
         FROM s""",

    "q134_bloom_decontam" ->
      """WITH toksrc AS (
           SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS ts
           FROM documents),
         grams AS (
           SELECT doc_id, lang, unnest(list_distinct(
             list_transform(range(1, len(ts) - 1),
               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS g
           FROM toksrc WHERE len(ts) >= 3),
         gh AS (SELECT doc_id, g, md5(g) AS h FROM grams),
         pos AS (
           SELECT doc_id, g,
             (instr('0123456789abcdef', substr(h, o, 1)) - 1) * 4096
             + (instr('0123456789abcdef', substr(h, o + 1, 1)) - 1) * 256
             + (instr('0123456789abcdef', substr(h, o + 2, 1)) - 1) * 16
             + (instr('0123456789abcdef', substr(h, o + 3, 1)) - 1) AS p
           FROM gh CROSS JOIN (SELECT unnest([1, 9, 17]) AS o) os),
         bits AS (SELECT DISTINCT p FROM pos WHERE doc_id % 97 = 0),
         bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
         bloom AS (
           SELECT doc_id, count(*) AS bloom_grams FROM (
             SELECT doc_id, g FROM pos
             WHERE doc_id % 97 <> 0 AND p IN (SELECT p FROM bits)
             GROUP BY doc_id, g HAVING count(*) = 3)
           GROUP BY doc_id),
         exact AS (
           SELECT doc_id, count(*) AS exact_grams FROM grams
           WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM bench)
           GROUP BY doc_id)
         SELECT d.lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN coalesce(b.bloom_grams, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS bloom_docs,
           CAST(sum(CASE WHEN coalesce(e.exact_grams, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS exact_docs,
           CAST(sum(coalesce(b.bloom_grams, 0)) AS BIGINT) AS bloom_grams,
           CAST(sum(coalesce(e.exact_grams, 0)) AS BIGINT) AS exact_grams
         FROM documents d
         LEFT JOIN bloom b ON d.doc_id = b.doc_id
         LEFT JOIN exact e ON d.doc_id = e.doc_id
         WHERE d.doc_id % 97 <> 0
         GROUP BY d.lang""",

    "q135_cms_heavy" ->
      """WITH occ AS (
           SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           FROM documents),
         exact AS (
           SELECT tok, count(*) AS exact_cnt FROM occ
           WHERE length(tok) > 0 GROUP BY tok),
         slots AS (
           SELECT tok, exact_cnt, o,
             (instr('0123456789abcdef', substr(md5(tok), o, 1)) - 1) * 256
             + (instr('0123456789abcdef', substr(md5(tok), o + 1, 1)) - 1) * 16
             + (instr('0123456789abcdef', substr(md5(tok), o + 2, 1)) - 1) AS p
           FROM exact CROSS JOIN (SELECT unnest([1, 9, 17]) AS o) os),
         counters AS (
           SELECT o, p, CAST(sum(exact_cnt) AS BIGINT) AS c
           FROM slots GROUP BY o, p),
         est AS (
           SELECT s.tok, CAST(s.exact_cnt AS BIGINT) AS exact_cnt,
             min(c.c) AS cms_est
           FROM slots s JOIN counters c ON s.o = c.o AND s.p = c.p
           GROUP BY s.tok, s.exact_cnt)
         SELECT tok, cms_est, exact_cnt FROM est
         ORDER BY cms_est DESC, tok ASC LIMIT 20""",

    "q136_priority_sample" ->
      s"""WITH u AS (
           SELECT doc_id, lang, n_chars AS w,
             1 + CAST(sum(
               (instr('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1)
               * CAST(power(16, 10 - i) AS BIGINT)) AS BIGINT) AS u
           FROM documents CROSS JOIN range(1, 11) t(i)
           GROUP BY doc_id, lang, n_chars),
         pri AS (
           SELECT doc_id, lang, w,
             CAST(w AS DOUBLE) / CAST(u AS DOUBLE) AS priority
           FROM u),
         ranked AS (
           SELECT *, row_number() OVER (
             PARTITION BY lang ORDER BY priority DESC, doc_id ASC) AS rn
           FROM pri),
         tau AS (SELECT lang, priority AS tau FROM ranked WHERE rn = ${PsK + 1})
         SELECT r.lang, r.rn, r.doc_id, r.w,
           greatest(CAST(r.w AS DOUBLE), coalesce(t.tau, 0.0)) AS ht_w,
           coalesce(t.tau, 0.0) AS tau
         FROM ranked r LEFT JOIN tau t ON r.lang = t.lang
         WHERE r.rn <= $PsK""",

    // the full HLL replay: identical md5-addressed registers, the same
    // integer harmonic sum, the same single division
    "q145_hll_distinct" ->
      s"""WITH toks AS (
           SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
           FROM documents),
         t AS (SELECT lang, tok FROM toks WHERE length(tok) > 0),
         hashed AS (SELECT DISTINCT lang, md5(tok) AS h FROM t),
         xs AS (
           SELECT lang, h,
             CAST(sum((instr('0123456789abcdef', substr(h, CAST(i AS INT), 1)) - 1)
               * CAST(power(16, 9 - i) AS BIGINT)) AS BIGINT) AS x
           FROM hashed CROSS JOIN range(2, 10) r(i)
           GROUP BY lang, h),
         regs AS (
           SELECT lang,
             instr('0123456789abcdef', substr(h, 1, 1)) - 1 AS b,
             max(CASE WHEN x = 0 THEN 33 ELSE 33 - length(bin(x)) END) AS m
           FROM xs GROUP BY lang, b),
         grid AS (
           SELECT l.lang, g.b FROM (SELECT DISTINCT lang FROM documents) l
           CROSS JOIN range(0, $HllM) g(b)),
         filled AS (
           SELECT g.lang, g.b, coalesce(r.m, 0) AS m
           FROM grid g LEFT JOIN regs r ON g.lang = r.lang AND g.b = r.b),
         agg AS (
           SELECT lang,
             CAST(sum(CAST(power(2, $HllScale - m) AS BIGINT)) AS BIGINT) AS s_scaled,
             CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zeros
           FROM filled GROUP BY lang),
         exact AS (
           SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS n_exact
           FROM t GROUP BY lang)
         SELECT a.lang, CAST($HllM AS BIGINT) AS m_regs, a.zeros, a.s_scaled,
           $HllNumerator / CAST(a.s_scaled AS DOUBLE) AS est,
           coalesce(e.n_exact, 0) AS n_exact
         FROM agg a LEFT JOIN exact e ON a.lang = e.lang""",

    // q212: the identical sketch rebuilt per (type, day), the same
    // prefix-max window over the same explicit grid, exact curve via
    // the first-seen identity (itself proven against the brute
    // quadratic by q210's own oracle).
    "q212_hll_curve" ->
      s"""WITH e AS (
           SELECT event_type, user_id,
             epoch_us(ts) // 86400000000 AS day
           FROM events),
         hashed AS (
           SELECT DISTINCT event_type, day,
             md5(CAST(user_id AS VARCHAR)) AS h
           FROM e),
         xs AS (
           SELECT event_type, day, h,
             CAST(sum((instr('0123456789abcdef',
               substr(h, CAST(i AS INT), 1)) - 1)
               * CAST(power(16, 9 - i) AS BIGINT)) AS BIGINT) AS x
           FROM hashed CROSS JOIN range(2, 10) r(i)
           GROUP BY event_type, day, h),
         regs AS (
           SELECT event_type, day,
             instr('0123456789abcdef', substr(h, 1, 1)) - 1 AS b,
             max(CASE WHEN x = 0 THEN 33
                      ELSE 33 - length(bin(x)) END) AS m
           FROM xs GROUP BY event_type, day, b),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
         grid AS (
           SELECT t.event_type, s.d0 + r.range AS day, g.range AS b
           FROM (SELECT DISTINCT event_type FROM e) t
           CROSS JOIN span s
           CROSS JOIN range(0, ${RelationalQueries.MaxGridDays}) r
           CROSS JOIN range(0, $HllM) g
           WHERE ${RelationalQueries.oracleGridWhere}),
         cumreg AS (
           SELECT g.event_type, g.day, g.b,
             max(coalesce(r.m, 0)) OVER (PARTITION BY g.event_type, g.b
               ORDER BY g.day ASC) AS cm
           FROM grid g LEFT JOIN regs r ON r.event_type = g.event_type
             AND r.day = g.day AND r.b = g.b),
         agg AS (
           SELECT event_type, day,
             CAST(sum(CAST(power(2, $HllScale - cm) AS BIGINT))
               AS BIGINT) AS s_scaled,
             CAST(sum(CASE WHEN cm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS zeros
           FROM cumreg GROUP BY 1, 2),
         f0 AS (SELECT event_type, user_id, min(day) AS fday
                FROM e GROUP BY 1, 2),
         fs AS (SELECT event_type, fday AS day,
             CAST(count(*) AS BIGINT) AS nu
           FROM f0 GROUP BY 1, 2),
         gridd AS (SELECT DISTINCT event_type, day FROM grid),
         ex AS (
           SELECT g.event_type, g.day,
             CAST(sum(coalesce(f.nu, 0)) OVER (PARTITION BY g.event_type
               ORDER BY g.day ASC) AS BIGINT) AS cum_users
           FROM gridd g LEFT JOIN fs f ON f.event_type = g.event_type
             AND f.day = g.day)
         SELECT a.event_type, a.day, a.zeros, a.s_scaled,
           $HllNumerator / CAST(a.s_scaled AS DOUBLE) AS est,
           x.cum_users,
           CASE WHEN x.cum_users = 0 THEN CAST(-1 AS BIGINT)
                ELSE CAST(floor(abs(($HllNumerator /
                  CAST(a.s_scaled AS DOUBLE)) / x.cum_users - 1.0)
                  * 1000000) AS BIGINT) END AS err_ppm
         FROM agg a JOIN ex x ON x.event_type = a.event_type
           AND x.day = a.day""",

    // same grid, same integer cross-multiply quantile rule
    // q154: the identical sketch rebuilt from exact strings — the same
    // md5 12-hex slice (sum-over-range hex parse), the same per-source
    // k-minimum cut, the same pair merge-and-recut, the same one-
    // division estimators over exact integers.
    "q154_kmv_overlap" ->
      s"""WITH toksrc AS (
           SELECT source, regexp_split_to_array(trim(text), '\\s+') AS ts
           FROM documents),
         grams AS (
           -- DISTINCT before the hex-parse cross join: a gram seen N
           -- times in a source would otherwise contribute N×12 digit
           -- rows to its (source, g) group and sum to N× the true value
           SELECT DISTINCT source, unnest(list_transform(range(1, len(ts) - 1),
             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
           FROM toksrc WHERE len(ts) >= 3),
         gh AS (
           SELECT DISTINCT source,
             CAST(sum((instr('0123456789abcdef',
                 substr(md5(g), CAST(i AS INT), 1)) - 1)
               * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) AS h
           FROM grams CROSS JOIN range(1, 13) t(i)
           GROUP BY source, g),
         sk AS (
           SELECT source, h FROM (
             SELECT source, h, row_number() OVER (
               PARTITION BY source ORDER BY h ASC) AS rn
             FROM gh) WHERE rn <= $KmvK),
         sp AS (
           SELECT a.source AS s1, b.source AS s2
           FROM (SELECT DISTINCT source FROM sk) a
           JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source),
         m AS (
           SELECT s1, s2, h, count(*) AS nsk FROM (
             SELECT sp.s1, sp.s2, k.h FROM sp JOIN sk k ON k.source = sp.s1
             UNION ALL
             SELECT sp.s1, sp.s2, k.h FROM sp JOIN sk k ON k.source = sp.s2)
           GROUP BY 1, 2, 3),
         cut AS (
           SELECT * FROM (
             SELECT m.*, row_number() OVER (
               PARTITION BY s1, s2 ORDER BY h ASC) AS rn FROM m)
           WHERE rn <= $KmvK)
         SELECT s1, s2, count(*) AS n_k, max(h) AS kth,
           CAST(sum(CASE WHEN nsk = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_common,
           CAST((count(*) - 1) * $KmvSpace AS DOUBLE) / max(h) AS union_est,
           CAST(sum(CASE WHEN nsk = 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS jacc_est
         FROM cut GROUP BY s1, s2""",

    "q147_hist_quantiles" ->
      s"""WITH stats AS (
           SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents),
         binned AS (
           SELECT lang, s.lo,
             (s.hi - s.lo) // $HistBins + 1 AS w,
             (n_chars - s.lo) // ((s.hi - s.lo) // $HistBins + 1) AS bin
           FROM documents CROSS JOIN stats s),
         counts AS (
           SELECT lang, lo, w, bin, count(*) AS cnt
           FROM binned GROUP BY lang, lo, w, bin),
         cum AS (
           SELECT lang, lo, w, bin, cnt,
             sum(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum_le,
             sum(cnt) OVER (PARTITION BY lang) AS n_docs
           FROM counts),
         ps AS (SELECT unnest([${HistPs.mkString(", ")}]) AS p),
         qb AS (
           SELECT lang, p, min(bin) AS qbin
           FROM cum CROSS JOIN ps
           WHERE cum_le * 100 >= p * n_docs
           GROUP BY lang, p)
         SELECT q.lang, CAST(q.p AS BIGINT) AS p, q.qbin,
           c.lo + q.qbin * c.w AS bin_lo,
           c.lo + (q.qbin + 1) * c.w - 1 AS bin_hi,
           CAST(c.cum_le AS BIGINT) AS cum_le,
           CAST(c.n_docs AS BIGINT) AS n_docs
         FROM qb q JOIN cum c ON q.lang = c.lang AND q.qbin = c.bin"""
  )
}
