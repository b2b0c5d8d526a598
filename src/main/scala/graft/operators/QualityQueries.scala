package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Corpus-statistics quality weighting (SURVEY.md §2.11 L5 — the two
  * signals a pretraining pipeline derives from the corpus itself rather
  * than from each document in isolation):
  *
  *  - q85: CCNet-style corpus-frequency scoring — a document whose
  *    tokens are mostly corpus-rare is boilerplate, OCR noise, or
  *    gibberish; the signal needs a global term-frequency table, not a
  *    per-doc heuristic (contrast q27's local ratios).
  *  - q86: DSIR-style importance weighting (Xie et al. 2023, "Data
  *    Selection for Language Models via Importance Resampling") —
  *    hashed n-gram bag features scored against a target-domain
  *    profile, the standard recipe for tilting a web crawl toward a
  *    curated distribution.
  *
  * Scale posture (the part that must survive 100 TB):
  *  - q85 keys every shuffle by `xxhash64(token)` — fixed-width longs,
  *    never strings (the q53 doctrine). Distinct-token collisions would
  *    merge two counts; the DuckDB oracle joins by the exact strings,
  *    so every round re-proves the hashing lossless at test scale, and
  *    QualityQueriesSpec re-proves it against a string-keyed twin.
  *  - q86's feature space is CLOSED (4096 md5 buckets), so the
  *    target/source profiles are O(buckets) rows regardless of corpus
  *    size: profile aggregation collapses map-side to ≤4096 partial
  *    rows per task and the per-doc scoring join is a broadcast — the
  *    corpus never shuffles for the profile.
  *  - Both scores are RATIONAL (integer masses, one IEEE division at
  *    the end) — the q55 doctrine: no `ln`, no order-dependent double
  *    sums, bit-identical cross-engine without rounding.
  */
object QualityQueries {

  /** Whitespace tokens of `text`, after trim (same tokenization as
    * TextQueries.toks — q85/q86 must agree with q21/q55/q58 on what a
    * token is). */
  private def toks: Column = split(trim(col("text")), "\\s+")

  /** Token bigrams of a token-array column. Same caveat as
    * TextQueries.tokenTrigrams: `ts` must be a materialized column
    * attribute (an inline split() inside the lambda re-evaluates per
    * element), and callers guard size(ts) >= 2. */
  private def tokenBigrams(ts: Column): Column =
    transform(sequence(lit(0), size(ts) - 2),
      i => concat_ws(" ", element_at(ts, i + 1), element_at(ts, i + 2)))

  /** Corpus count at or below which a token is "rare" (q85). */
  val RareCutoff = 2L

  /** q168 Good-Turing mass scale: r* is reported as the integer
    * (r+1)·N_{r+1}·GtMass DIV N_r (the q105/q161 doctrine). */
  val GtMass = 1000000L

  /** q86 hashed-feature space: first 3 md5 hex chars = 4096 buckets.
    * Closed and tiny by construction — that is what makes the profile
    * broadcast-able at any corpus size. */
  val NBuckets = 4096L

  /** q86 target domain: English docs (the curated-side stand-in). */
  val TargetLang = "en"

  /** md5-prefix feature bucket in [0, 4096) — md5 because both engines
    * produce identical lowercase hex (the q56 split idiom), so bucket
    * IDENTITY matches the oracle exactly; xxhash64 would not (DuckDB
    * lacks it) and here the bucket VALUE is load-bearing (profiles are
    * joined by it), unlike q85 where the hash only needs to be
    * injective. */
  private def featureBucket(g: Column): Column =
    conv(substring(md5(g), 1, 3), 16, 10).cast("long")

  /** Per-(doc, hashed-token) frequency — the shared first stage of q85.
    * Aggregating to (doc_id, th) BEFORE the corpus-count join collapses
    * repeated tokens map-side, so the join fan-in is distinct terms per
    * doc, not raw token occurrences. */
  private def docTermFreq(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(toks).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("th"))
      .groupBy(col("doc_id"), col("th")).agg(count(lit(1)).as("tf"))

  /** q85 on an arbitrary (doc_id, text) frame — QualityQueriesSpec
    * drives this with a string-keyed twin to prove hash losslessness. */
  private[graft] def rareTokenQuality(docs: DataFrame): DataFrame = {
    val tf = docTermFreq(docs)
    val ctf = tf.groupBy(col("th")).agg(sum(col("tf")).as("ctf"))
    tf.join(ctf, "th")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
           sum(when(col("ctf") <= RareCutoff, col("tf")).otherwise(0L)).as("n_rare"),
           sum(when(col("ctf") === 1L, col("tf")).otherwise(0L)).as("n_hapax"))
      .withColumn("rare_frac", col("n_rare").cast("double") / col("n_tokens"))
  }

  /** String-keyed twin of q85 — identical plan shape but shuffles the
    * raw token strings. Exists ONLY for the losslessness spec; the
    * hashed path is the one registered (and the one you'd run at
    * 100 TB). */
  private[graft] def rareTokenQualityByString(docs: DataFrame): DataFrame = {
    val tf = docs.select(col("doc_id"), explode(toks).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val ctf = tf.groupBy(col("tok")).agg(sum(col("tf")).as("ctf"))
    tf.join(ctf, "tok")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
           sum(when(col("ctf") <= RareCutoff, col("tf")).otherwise(0L)).as("n_rare"),
           sum(when(col("ctf") === 1L, col("tf")).otherwise(0L)).as("n_hapax"))
      .withColumn("rare_frac", col("n_rare").cast("double") / col("n_tokens"))
  }

  /** q86's per-(doc, feature-bucket) counts — bigram bag, hashed into
    * the closed bucket space. */
  private[graft] def docFeatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), toks.as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(tokenBigrams(col("ts"))).as("g"))
      .select(col("doc_id"), col("lang"), featureBucket(col("g")).as("f"))
      .groupBy(col("doc_id"), col("lang"), col("f"))
      .agg(count(lit(1)).as("c"))

  /** q86 on an arbitrary (doc_id, lang, text) frame. Importance score
    * in the LINEAR domain: affinity = (t_mass/T)/(s_mass/S) where
    * t_mass/s_mass are the doc's feature counts weighted by the
    * add-one-smoothed target/source profiles and T/S the profile
    * totals (Σ counts + |buckets|). DSIR's log-domain weight orders
    * documents by Σc·(log t̂ - log ŝ); the linear ratio keeps the same
    * plan (and the same "above/below corpus baseline" reading at
    * affinity 1.0) while staying integer-exact until one final
    * division — cross-engine bit-stable with no ln. */
  private[graft] def dsirWeights(docs: DataFrame): DataFrame = {
    // cf is the one corpus-scale pass and it feeds FOUR consumers
    // (source profile, target profile, totals, scoring join) — stage it
    // once (the ConnectedComponents/BpeLearn materialization idiom)
    // instead of trusting exchange reuse across differently-filtered
    // aggregates; at 100 TB re-running the explode per consumer is the
    // cost that matters.
    val cf = docFeatures(docs).localCheckpoint()
    val src = cf.groupBy(col("f")).agg(sum(col("c")).as("sc"))
    val tgt = cf.filter(col("lang") === TargetLang)
      .groupBy(col("f")).agg(sum(col("c")).as("tc"))
    val prof = src.join(tgt, Seq("f"), "left")
      .select(col("f"),
        (coalesce(col("tc"), lit(0L)) + 1L).as("tc1"),
        (col("sc") + 1L).as("sc1"))
    val tot = cf.agg(
      (sum(when(col("lang") === TargetLang, col("c")).otherwise(0L)) +
        NBuckets).as("tt"),
      (sum(col("c")) + NBuckets).as("st"))
    cf.join(broadcast(prof), "f")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c")).as("n_bigrams"),
           sum(col("c") * col("tc1")).as("t_mass"),
           sum(col("c") * col("sc1")).as("s_mass"))
      .crossJoin(broadcast(tot))
      .withColumn("affinity",
        (col("t_mass").cast("double") * col("st")) /
          (col("s_mass").cast("double") * col("tt")))
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        col("t_mass"), col("s_mass"), col("affinity"))
  }

  /** q94 fluency band: a bigram occurrence is "fluent" when its
    * corpus conditional probability p(w2|w1) = c12/c1 is at least
    * 1/FluentDen. The comparison is the integer cross-multiply
    * c12 * FluentDen >= c1 (the aHash prodGt idiom) — no division
    * until the final per-doc fraction, so the band is bit-exact
    * cross-engine. */
  val FluentDen = 16L

  /** q94: bigram-LM fluency scoring (the CCNet/KenLM-shaped signal,
    * order-2): score each document by the fraction of its bigrams that
    * are high-conditional-probability continuations under a language
    * model trained on the corpus itself. A fluent document repeats the
    * corpus's common transitions; word salad, shuffled boilerplate and
    * OCR noise have locally-plausible tokens (which q85's unigram
    * rarity misses) but improbable TRANSITIONS. c1 counts w1's
    * occurrences as a bigram PREFIX (= Σ_w2 c12), so p(w2|w1) is a
    * proper conditional that sums to 1 per prefix.
    *
    * Scale posture: the bigram stream collapses to per-(doc, gh)
    * counts map-side before any join (docTermFreq's idiom); every
    * shuffle and join is keyed by xxhash64 longs — (gh) for the bigram
    * table, (uh) for the prefix table — never by strings. Both hashes
    * ride the SAME aggregated tf frame (localCheckpoint-staged: one
    * corpus pass feeds both count tables and the scoring join). The
    * exact-string DuckDB oracle doubles as the collision check for
    * BOTH key spaces (q53 doctrine).
    */
  private[graft] def bigramFluency(docs: DataFrame): DataFrame = {
    val bi = docs.select(col("doc_id"), toks.as("ts"))
      .filter(size(col("ts")) >= 2)
      .withColumn("a", slice(col("ts"), lit(1), size(col("ts")) - 1))
      .withColumn("b", slice(col("ts"), lit(2), size(col("ts")) - 1))
      .select(col("doc_id"), explode(arrays_zip(col("a"), col("b"))).as("z"))
      .select(col("doc_id"),
        xxhash64(col("z.a"), col("z.b")).as("gh"),
        xxhash64(col("z.a")).as("uh"))
    // one corpus pass, three consumers (c12 table, c1 table, scoring)
    val tf = bi.groupBy(col("doc_id"), col("gh"), col("uh"))
      .agg(count(lit(1)).as("tf")).localCheckpoint()
    val cbg = tf.groupBy(col("gh")).agg(sum(col("tf")).as("c12"))
    val cu  = tf.groupBy(col("uh")).agg(sum(col("tf")).as("c1"))
    tf.join(cbg, "gh").join(cu, "uh")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
           sum(when(col("c12") * FluentDen >= col("c1"), col("tf"))
             .otherwise(0L)).as("n_fluent"),
           sum(when(col("c12") === 1L, col("tf")).otherwise(0L))
             .as("n_hapax_bi"))
      .withColumn("fluent_frac",
        col("n_fluent").cast("double") / col("n_bigrams"))
  }

  /** q149 collocation-mining geometry: bigrams below [[CollocMinCount]]
    * corpus occurrences never rank (a hapax pair of two rare words has
    * unboundedly high PMI — the standard min-count guard of Church &
    * Hanks 1990); the report is the [[CollocTopK]] best by PMI ratio.
    * Both interpolated into the oracle. */
  val CollocMinCount = 5L
  val CollocTopK = 20

  /** q149: PMI collocation mining (Church & Hanks 1990) — the phrase-
    * vocabulary induction step of a tokenizer/curation pipeline: rank
    * adjacent word pairs by pointwise mutual information
    * p(xy)/(p(x)p(y)) = c_xy·T²/(N·c_x·c_y). The SCORE is doubles —
    * but every operand is an exactly-representable integer and the
    * factor chain is FIXED left-associated (the q64 BM25 doctrine), so
    * both engines round identically at every step and the
    * (score DESC, w1, w2) cut is bit-stable. Counts key by xxhash64
    * (fixed-width shuffles; the strings ride as aggregate payload into
    * the final top-k only); the exact-string oracle is the collision
    * check. The min-count gate cuts the rank input to frequent pairs
    * BEFORE the unigram joins; the top-k plans as TakeOrdered. */
  private[graft] def collocations(docs: DataFrame): DataFrame = {
    val pairs = docs.select(toks.as("ts"))
      .filter(size(col("ts")) >= 2)
      .withColumn("a", slice(col("ts"), lit(1), size(col("ts")) - 1))
      .withColumn("b", slice(col("ts"), lit(2), size(col("ts")) - 1))
      .select(explode(arrays_zip(col("a"), col("b"))).as("z"))
      .select(col("z.a").as("w1"), col("z.b").as("w2"))
    // distinct-bigram counts: consumed by N (unfiltered sum) AND the
    // gated rank input — materialize the vocabulary-sized table once
    val big0 = pairs
      .select(xxhash64(col("w1"), col("w2")).as("gh"),
        xxhash64(col("w1")).as("uh"), xxhash64(col("w2")).as("vh"),
        col("w1"), col("w2"))
      .groupBy(col("gh"), col("uh"), col("vh"))
      .agg(count(lit(1)).as("c_xy"),
        min(col("w1")).as("w1"), min(col("w2")).as("w2"))
      .localCheckpoint()
    val uni = docs.select(explode(toks).as("w"))
      .select(xxhash64(col("w")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val totals = big0.agg(sum(col("c_xy")).as("n_bigrams"))
      .crossJoin(uni.agg(sum(col("c")).as("t_toks")))
    big0.filter(col("c_xy") >= CollocMinCount)
      .join(uni.select(col("h").as("uh"), col("c").as("c_x")).hint("merge"), "uh")
      .join(uni.select(col("h").as("vh"), col("c").as("c_y")).hint("merge"), "vh")
      .crossJoin(broadcast(totals))
      .withColumn("score",
        col("c_xy").cast("double") * col("t_toks") / col("n_bigrams") *
          col("t_toks") / col("c_x") / col("c_y"))
      .orderBy(col("score").desc, col("w1").asc, col("w2").asc)
      .limit(CollocTopK)
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        col("t_toks"), col("n_bigrams"), col("score"))
  }

  /** q152 TextRank geometry: co-occurrence edges below [[TrMinCount]]
    * corpus occurrences are dropped (the sparsity guard that keeps the
    * word graph ≪ vocab² — one-off adjacencies are noise, not
    * structure); the report is the [[TrTopK]] best words by rank mass.
    * Both interpolated into the oracle. */
  val TrMinCount = 2L
  val TrTopK = 25

  /** q152: TextRank keyword extraction (Mihalcea & Tarau 2004) —
    * PageRank over the word co-occurrence graph: vertices are words,
    * an undirected edge links words adjacent somewhere in the corpus
    * at least [[TrMinCount]] times, and the rank is q105's integer-
    * mass iteration ([[VectorQueries.pageRankMass]] — the SAME loop,
    * damping and mass constants), so the score table is bit-identical
    * cross-engine with zero float surface before the final cut.
    *
    * Scale posture: the pair table is vocabulary-sized and hash-keyed
    * (q149's doctrine — strings ride as agg payload only), materialized
    * ONCE and consumed by the edge list (both directions), the word
    * table and the node set; the PageRank loop shuffles on fixed-width
    * hashed keys with the dangling scalar a broadcast one-row table;
    * the tail is a TakeOrdered [[TrTopK]] cut under the
    * (pr_mass DESC, word) total order. The exact-string oracle doubles
    * as the xxhash collision check. */
  private[graft] def textRank(docs: DataFrame): DataFrame = {
    val bi = docs.select(toks.as("ts"))
      .filter(size(col("ts")) >= 2)
      .withColumn("a", slice(col("ts"), lit(1), size(col("ts")) - 1))
      .withColumn("b", slice(col("ts"), lit(2), size(col("ts")) - 1))
      .select(explode(arrays_zip(col("a"), col("b"))).as("z"))
      .select(col("z.a").as("w1"), col("z.b").as("w2"))
      .filter(col("w1") =!= col("w2"))
    val und = bi
      .select(least(col("w1"), col("w2")).as("u"),
        greatest(col("w1"), col("w2")).as("v"))
      .groupBy(xxhash64(col("u")).as("uh"), xxhash64(col("v")).as("vh"))
      .agg(count(lit(1)).as("c"), min(col("u")).as("u"), min(col("v")).as("v"))
      .filter(col("c") >= TrMinCount)
      .localCheckpoint()
    val edges = und.select(col("uh").as("src"), col("vh").as("dst"))
      .unionAll(und.select(col("vh").as("src"), col("uh").as("dst")))
    val words = und.select(col("uh").as("h"), col("u").as("w"))
      .unionAll(und.select(col("vh").as("h"), col("v").as("w")))
      .groupBy(col("h")).agg(min(col("w")).as("word"))
    val nodes = words.select(col("h").as("vec_id"))
    val pr = VectorQueries.pageRankMass(nodes, edges, nodes.count())
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("degree"))
    pr.join(words.withColumnRenamed("h", "vec_id"), "vec_id")
      .join(deg.withColumnRenamed("src", "vec_id"), "vec_id")
      .orderBy(col("pr_mass").desc, col("word").asc)
      .limit(TrTopK)
      .select(col("word"), col("degree"), col("pr_mass"))
  }

  /** The q152 oracle: exact-string graph build + [[VectorQueries
    * .PrIters]] unrolled integer-mass iterations — the same generated-
    * CTE shape as q105's, over word keys instead of vec_ids (an
    * undirected graph has no dangling nodes, but the dang CTE stays so
    * the arithmetic is operand-for-operand identical to the Spark
    * loop). */
  private def textRankOracle: String = {
    import VectorQueries.{PrMass, PrDampNum, PrDampDen, PrIters}
    val iters = (1 to PrIters).map { k =>
      s"""dang$k AS (
           SELECT coalesce(sum(pr), 0) AS dg FROM r${k - 1}
           WHERE w NOT IN (SELECT src FROM outdeg)),
         c$k AS (
           SELECT e.dst, sum(r.pr // o.outdeg) AS m
           FROM edges e JOIN r${k - 1} r ON r.w = e.src
                        JOIN outdeg o ON o.src = e.src
           GROUP BY 1),
         r$k AS (
           SELECT nd.w,
             bb.base + ($PrDampNum * (coalesce(c$k.m, 0)
               + dang$k.dg // nn.n)) // $PrDampDen AS pr
           FROM nodes nd CROSS JOIN nn CROSS JOIN bb CROSS JOIN dang$k
           LEFT JOIN c$k ON c$k.dst = nd.w)"""
    }.mkString(",\n         ")
    s"""WITH t AS (
           SELECT regexp_split_to_array(trim(text), '\\s+') AS ts
           FROM documents),
         bi AS (
           SELECT unnest(ts[1:len(ts)-1]) AS w1,
                  unnest(ts[2:len(ts)]) AS w2
           FROM t WHERE len(ts) >= 2),
         up AS (
           SELECT least(w1, w2) AS u, greatest(w1, w2) AS v,
             count(*) AS c
           FROM bi WHERE w1 <> w2 GROUP BY 1, 2),
         g AS (SELECT u, v FROM up WHERE c >= $TrMinCount),
         edges AS (SELECT u AS src, v AS dst FROM g
                   UNION ALL SELECT v AS src, u AS dst FROM g),
         nodes AS (SELECT DISTINCT src AS w FROM edges),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
         bb AS (SELECT (3 * $PrMass) // ($PrDampDen * nn.n) AS base FROM nn),
         r0 AS (SELECT w, $PrMass // nn.n AS pr FROM nodes CROSS JOIN nn),
         $iters
         SELECT r.w AS word, CAST(o.outdeg AS BIGINT) AS degree,
           CAST(r.pr AS BIGINT) AS pr_mass
         FROM r$PrIters r JOIN outdeg o ON o.src = r.w
         ORDER BY pr_mass DESC, word ASC LIMIT $TrTopK"""
  }

  /** q142 Kneser-Ney absolute discount D = [[KnDiscNum]]/[[KnDiscDen]]
    * (the standard 0.75), kept as a RATIONAL so the smoothed
    * probability comparison stays an integer cross-multiply. */
  val KnDiscNum = 3L
  val KnDiscDen = 4L

  /** q142 fluency band: a bigram occurrence is "KN-fluent" when its
    * interpolated Kneser-Ney probability is at least 1/KnFluentDen —
    * the q94 band applied to the SMOOTHED model. */
  val KnFluentDen = 16L

  /** q142: interpolated Kneser-Ney bigram-LM fluency — the published
    * smoothing (Kneser & Ney 1995; Chen & Goodman 1999 §2.7) that
    * KenLM-based pipelines (CCNet) actually train, where q94's raw
    * conditional is the unsmoothed upper rung. Per observed bigram:
    *
    *   p_KN(w2|w1) = (c12 − D)/c1 + D·(N1+(w1,·)/c1)·(N1+(·,w2)/N1+(··))
    *
    * with c12 ≥ 1 for every SCORED bigram (documents only score
    * transitions they contain), so the max(·,0) clamp never binds. The
    * backoff term is the continuation probability — "how many distinct
    * contexts precede w2" — which is what separates KN from naive
    * interpolation: a token frequent in ONE context ("Francisco")
    * backs off near zero. The band test multiplies through by the
    * positive KnDiscDen·c1·N1+(··):
    *
    *   KnFluentDen·[(KnDiscDen·c12 − KnDiscNum)·nctot
    *                 + KnDiscNum·n1w1·ncw2] ≥ KnDiscDen·c1·nctot
    *
    * — all BIGINT, no division until the final per-doc fraction (the
    * q94/q105 rational doctrine). `n_backoff_heavy` counts occurrences
    * where the backoff term exceeds the discounted ML term
    * (KnDiscNum·n1w1·ncw2 > (KnDiscDen·c12 − KnDiscNum)·nctot): the
    * document's transitions lean on the unigram continuation model,
    * the KN-native "rote vs composed" signal.
    *
    * Scale posture: q94's exactly — the bigram stream collapses to
    * per-(doc, gh) counts map-side; one localCheckpoint-staged tf pass
    * feeds all five count tables and the scoring join; every shuffle is
    * keyed by xxhash64 longs (gh bigram / uh prefix / vh suffix). The
    * count tables are vocabulary-sized, not corpus-sized; products are
    * bounded by KnFluentDen·KnDiscNum·(distinct continuations)×
    * (distinct predecessors) ≤ ~64·vocab² — inside BIGINT to vocab
    * ~5·10⁸ (route through DECIMAL past that). The exact-string DuckDB
    * oracle doubles as the collision check for all THREE hash key
    * spaces. */
  private[graft] def knFluency(docs: DataFrame): DataFrame = {
    val bi = docs.select(col("doc_id"), toks.as("ts"))
      .filter(size(col("ts")) >= 2)
      .withColumn("a", slice(col("ts"), lit(1), size(col("ts")) - 1))
      .withColumn("b", slice(col("ts"), lit(2), size(col("ts")) - 1))
      .select(col("doc_id"), explode(arrays_zip(col("a"), col("b"))).as("z"))
      .select(col("doc_id"),
        xxhash64(col("z.a"), col("z.b")).as("gh"),
        xxhash64(col("z.a")).as("uh"),
        xxhash64(col("z.b")).as("vh"))
    // one corpus pass, five consumers (c12, c1, fertility, continuation,
    // type total) + the scoring join; uh/vh are functionally dependent
    // on gh so grouping by all three costs nothing extra
    val tf = bi.groupBy(col("doc_id"), col("gh"), col("uh"), col("vh"))
      .agg(count(lit(1)).as("tf")).localCheckpoint()
    val cbg = tf.groupBy(col("gh")).agg(sum(col("tf")).as("c12"))
    val cu  = tf.groupBy(col("uh")).agg(sum(col("tf")).as("c1"))
    // the bigram TYPE table: distinct (w1, w2) with both end hashes
    val types = tf.select(col("gh"), col("uh"), col("vh")).distinct()
      .localCheckpoint()
    val fert = types.groupBy(col("uh")).agg(count(lit(1)).as("n1w1"))
    val cont = types.groupBy(col("vh")).agg(count(lit(1)).as("ncw2"))
    val nct  = types.agg(count(lit(1)).as("nctot"))
    val lhs = lit(KnFluentDen) *
      ((lit(KnDiscDen) * col("c12") - KnDiscNum) * col("nctot") +
        lit(KnDiscNum) * col("n1w1") * col("ncw2"))
    val rhs = lit(KnDiscDen) * col("c1") * col("nctot")
    val backoff = lit(KnDiscNum) * col("n1w1") * col("ncw2") >
      (lit(KnDiscDen) * col("c12") - KnDiscNum) * col("nctot")
    tf.join(cbg, "gh").join(cu, "uh").join(fert, "uh").join(cont, "vh")
      .crossJoin(broadcast(nct))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
           sum(when(lhs >= rhs, col("tf")).otherwise(0L)).as("n_kn_fluent"),
           sum(when(backoff, col("tf")).otherwise(0L)).as("n_backoff_heavy"))
      .withColumn("kn_frac",
        col("n_kn_fluent").cast("double") / col("n_bigrams"))
  }

  /** q119 duplicate-n-gram order (Gopher's "duplicate 5-grams" row). */
  val DupN = 5

  /** Word n-grams of a token-array column, joined by single spaces —
    * the tokenBigrams shape generalized to n. Callers guard
    * size(ts) >= n. */
  private def tokenNgrams(ts: Column, n: Int): Column =
    transform(sequence(lit(0), size(ts) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(ts, i + j + 1)): _*))

  /** Per-(doc, hashed n-gram) counts carrying the n-gram's character
    * mass (`cl` = token chars, i.e. length minus the n-1 joining
    * spaces — functionally dependent on the hash, grouped with it so
    * the string itself never shuffles). */
  private def ngramCounts(base: DataFrame, n: Int): DataFrame =
    base.filter(size(col("ts")) >= n)
      .select(col("doc_id"), explode(tokenNgrams(col("ts"), n)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gh"),
        (length(col("g")) - (n - 1)).cast("long").as("cl"))
      .groupBy(col("doc_id"), col("gh"), col("cl"))
      .agg(count(lit(1)).as("cnt"))

  /** q119: within-document repetition statistics — the Gopher
    * repetition filters (Rae et al. 2021, "Scaling Language Models",
    * §A1.1), the standard per-document signal for boilerplate and
    * looping generations that corpus-level dedup (q22/q24) cannot
    * see because the repetition is INSIDE one document:
    *
    *  - `top2_frac`: fraction of the document's token characters
    *    covered by occurrences of its most frequent word bigram
    *    (count × bigram token-chars / total token chars). Ties break
    *    to the larger character mass (max(struct(cnt, cl))) so the
    *    metric is a deterministic max, not an argmax identity —
    *    both engines compute (max cnt, then max cl among those).
    *  - `dup5_frac`: fraction of token characters covered by
    *    occurrences of duplicated [[DupN]]-grams (count ≥ 2).
    *    Overlapping occurrences each count — the published
    *    definition; the value may exceed 1 for degenerate loops,
    *    which is exactly the signal.
    *
    * Scale posture: per-document metrics — every shuffle is keyed by
    * (doc_id, xxhash64(n-gram)) fixed-width longs (q85 doctrine), the
    * n-gram stream collapses to per-(doc, hash) counts map-side, and
    * nothing is corpus-global (no join across documents at all; three
    * sub-aggregates re-join on doc_id). All outputs are integers until
    * the two final divisions, so the exact-string DuckDB oracle is
    * bit-exact AND doubles as the collision check for both hash key
    * spaces. */
  private[graft] def repetitionStats(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), toks.as("ts"))
    val tokStats = base.select(col("doc_id"), explode(col("ts")).as("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
           sum(length(col("tok"))).as("tok_chars"))
    val top = ngramCounts(base, 2)
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
           max(struct(col("cnt"), col("cl"))).as("m"))
      .select(col("doc_id"), col("n_bigrams"),
        col("m.cnt").as("top2_cnt"),
        (col("m.cnt") * col("m.cl")).as("top2_chars"))
    val d5 = ngramCounts(base, DupN)
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_5grams"),
           sum(when(col("cnt") >= 2L, col("cnt") * col("cl"))
             .otherwise(0L)).as("dup5_chars"))
    tokStats.join(top, Seq("doc_id"), "left")
      .join(d5, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("tok_chars"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("top2_cnt"), lit(0L)).as("top2_cnt"),
        coalesce(col("top2_chars"), lit(0L)).as("top2_chars"),
        coalesce(col("n_5grams"), lit(0L)).as("n_5grams"),
        coalesce(col("dup5_chars"), lit(0L)).as("dup5_chars"))
      .withColumn("top2_frac",
        col("top2_chars").cast("double") / col("tok_chars"))
      .withColumn("dup5_frac",
        col("dup5_chars").cast("double") / col("tok_chars"))
  }

  /** q109: arrival-order n-gram novelty — for each document, the share
    * of its DISTINCT trigrams that no lower-doc_id document contains
    * (doc_id is the corpus's arrival order). The curation signal dedup
    * pipelines use to measure marginal contribution: a document whose
    * trigrams are all already in the corpus adds nothing even if no
    * single earlier document near-duplicates it (contrast q63, which
    * needs a specific benchmark overlap, and q24/q53, which need a
    * matching PAIR). Scale posture: the corpus's distinct-trigram table
    * is built once, keyed by xxhash64 longs (q53 doctrine), and "first
    * container" is a plain min(doc_id) aggregation — one shuffle on the
    * hash, one join back, never pairwise. The exact-string oracle
    * doubles as the trigram-hash collision check. */
  private[graft] def trigramNovelty(docs: DataFrame): DataFrame = {
    val tg = docs.select(col("doc_id"), toks.as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(TextQueries.tokenTrigrams(col("ts")))).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gh"))
    val first = tg.groupBy(col("gh")).agg(min(col("doc_id")).as("first_doc"))
    tg.join(first, "gh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
           sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
             .as("n_novel"))
      .withColumn("novel_frac",
        col("n_novel").cast("double") / col("n_trigrams"))
  }

  /** q143 cascade gates, all kept integer/rational (the q94 band
    * doctrine): a doc passes length at ≥ [[FcMinTokens]] tokens,
    * repetition when top2_chars/tok_chars ≤ 1/[[FcTop2Den]], rarity
    * when n_rare/n_tokens ≤ 1/[[FcRareDen]]. */
  val FcMinTokens = 20L
  val FcTop2Den = 5L
  val FcRareDen = 10L

  /** q143: curation filter-cascade audit — the FineWeb/RefinedWeb
    * pipeline shape (Penedo et al. 2023/2024): a fixed ORDER of gates
    * (language → length → Gopher repetition → corpus rarity), scored
    * per document with every gate's verdict plus the FIRST failing
    * stage. Production pipelines ship exactly this table before any
    * doc is dropped: per-stage attrition (how much each rule costs) is
    * the number curation teams actually argue about, and "first_fail"
    * is what makes the funnel additive — each doc is charged to ONE
    * stage, so stage drop counts sum to total drops.
    *
    * Stage semantics ride the already-audited library signals
    * ([[repetitionStats]] for token/char/top-bigram mass,
    * [[rareTokenQuality]] for the corpus-frequency gate) — the audit
    * composes their outputs by doc_id, it does not re-derive them.
    *
    * Scale posture: two linear signal pipelines (each already keyed by
    * xxhash64 longs internally) + doc_id-keyed equi-joins of their
    * per-doc aggregates — no new corpus-global shuffle; every gate is
    * an integer cross-multiply, so the row is bit-exact cross-engine
    * and the oracle (which re-derives both signals string-keyed)
    * doubles as their collision check. */
  private[graft] def filterCascade(docs: DataFrame): DataFrame = {
    val rep = repetitionStats(docs)
      .select(col("doc_id"), col("n_tokens"), col("tok_chars"),
        col("top2_chars"))
    val rare = rareTokenQuality(docs).select(col("doc_id"), col("n_rare"))
    docs.select(col("doc_id"), col("lang"))
      .join(rep, "doc_id").join(rare, "doc_id")
      .withColumn("pass_lang", (col("lang") === TargetLang).cast("long"))
      .withColumn("pass_len", (col("n_tokens") >= FcMinTokens).cast("long"))
      .withColumn("pass_rep",
        (col("top2_chars") * FcTop2Den <= col("tok_chars")).cast("long"))
      .withColumn("pass_rare",
        (col("n_rare") * FcRareDen <= col("n_tokens")).cast("long"))
      .withColumn("first_fail",
        when(col("pass_lang") === 0L, 1L)
          .when(col("pass_len") === 0L, 2L)
          .when(col("pass_rep") === 0L, 3L)
          .when(col("pass_rare") === 0L, 4L)
          .otherwise(0L))
      .withColumn("keep", (col("first_fail") === 0L).cast("long"))
      .select(col("doc_id"), col("lang"), col("pass_lang"), col("pass_len"),
        col("pass_rep"), col("pass_rare"), col("first_fail"), col("keep"))
  }

  // ---- q282 learned quality filter (L6) -------------------------------
  // Distributed batch-gradient-descent logistic regression over exact
  // integer surface features — the fastText/CCNet-style LEARNED
  // combiner production pipelines gate on, where q143's cascade is the
  // hand-tuned ancestor. The q105/q239 doctrine applied to
  // optimization: every per-row quantity is an exact integer (features
  // in centered/scaled ppm, weights in ppb), the ONLY transcendental
  // is the sigmoid, computed on a double and immediately rounded to
  // DECIMAL(20,9) ppb (the lnR route) so both engines agree
  // bit-for-bit; gradients are exact Σ r_ppb·x_ppm in
  // DECIMAL(38,0)/HUGEINT; the update is an exact sign-handled
  // integral division. Magnitudes at 100 TB: |r|≤10⁹, |x|≤7.2·10⁶ ⇒
  // per-row product ≤7.2·10¹⁵, Σ over 10¹² docs ≤10²⁸ — inside
  // DECIMAL(38,0) with 10 orders of headroom. |Δw_ppb| per step is
  // bounded by the rate alone (the corpus size cancels in G/(10⁶·n)),
  // so weights never leave ~10¹⁰ and the z dot product stays ≤10¹⁷
  // regardless of scale.

  /** GD iteration count (unrolled in the oracle CTE chain). Chosen
    * with [[LrRateNum]] on the monotone-descent region measured at
    * every test SF (StatTestsSpec's replay guards the monotonicity). */
  val LrIters = 8
  /** Learning rate η = [[LrRateNum]] (an exact small integer — the
    * denominator 10⁶·n is folded into the update's integral division). */
  val LrRateNum = 2L
  /** Feature names, index-aligned with x0..x3. */
  val LrFeatureNames = Seq("bias", "length", "diversity", "tok_len")

  /** Per-doc exact feature/label table. Features are CENTERED at fixed
    * constants and rescaled to comparable ±10⁶ ranges — without this
    * the bias coordinate (|x₀| = 10⁶ vs centered spreads ~10⁵)
    * dominates every gradient and full-batch GD oscillates (measured;
    * the standard conditioning argument):
    *   x0 bias = 10⁶ (ppm of 1.0)
    *   x1 (saturated length − 100k ppm)·2 — wc·2000 capped at 10⁶,
    *      centered at 50 tokens
    *   x2 (lexical diversity − 500k ppm)·5 — distinct·10⁶ DIV wc,
    *      centered at ½
    *   x3 (mean token length/16 − 280k ppm)·10 — tokchars·10⁶ DIV
    *      (wc·16) capped, centered at 4.5 chars
    * (No digit/char-class feature: the synthetic corpus has ZERO
    * digits at every SF, a dead coordinate.) Label y = the
    * q143-style cascade verdict "wc ≥ FcMinTokens AND distinct·2 ≥ wc"
    * (length + repetition gate) — deterministic, and only PARTIALLY
    * expressible in the saturated/centered feature view, so held-out
    * accuracy beating the majority class is a learned result, not an
    * identity (the corpus's closed vocabulary makes diversity ≈ V/wc,
    * so the label is a wc-interval no single linear cut reproduces).
    * One map-only projection, no shuffle. */
  private[graft] def lrFeatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), col("text"))
      .withColumn("ws",
        filter(split(trim(col("text")), "\\s+"), w => length(w) > 0))
      .withColumn("wc", size(col("ws")).cast("long"))
      .filter(col("wc") > 0)
      .withColumn("dist", size(array_distinct(col("ws"))).cast("long"))
      .withColumn("tokchars",
        aggregate(col("ws"), lit(0L), (a, w) => a + length(w)))
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 3), 16, 10)
          .cast("long") % 10)
      .select(col("doc_id"), col("source"), col("h"),
        ((col("wc") >= FcMinTokens) && (col("dist") * 2 >= col("wc")))
          .cast("long").as("y"),
        lit(1000000L).as("x0"),
        ((least(lit(1000000L), col("wc") * 2000L) - 100000L) * 2L)
          .as("x1"),
        ((expr("dist * 1000000 DIV wc") - 500000L) * 5L).as("x2"),
        ((least(lit(1000000L),
          expr("tokchars * 1000000 DIV (wc * 16)")) - 280000L) * 10L)
          .as("x3"))

  /** z numerator Σ w_ppb·x_ppm as DECIMAL(38,0) (HUGEINT mirror) —
    * z(real) = znum/10¹⁵. */
  private def lrZNum(w: Array[Long]): Column =
    LrFeatureNames.indices.map(i =>
      col(s"x$i").cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
        lit(w(i)))
      .reduce(_ + _)
      .cast(org.apache.spark.sql.types.DecimalType(38, 0))

  /** σ(z) in exact ppb: the double sigmoid rounded through
    * DECIMAL(20,9) — the house ln/exp route, so the last-ulp freedom
    * of exp() never reaches a compared or accumulated value. */
  private def lrSigPpb(znum: Column): Column =
    ((lit(1.0) / (lit(1.0) +
      exp(-(znum.cast("double") / lit(1.0E15)))))
      .cast(org.apache.spark.sql.types.DecimalType(20, 9)) *
      lit(1000000000L)).cast("long")

  /** ONE GD step's gradient sums — the per-iteration job: scan →
    * per-row residual (weights folded in as literals) → one aggregate
    * with the k gradient columns. Factored out so PlanAuditSpec pins
    * the iteration's plan shape (no join, no window, one fact scan). */
  private[graft] def lrGradients(tr: DataFrame, w: Array[Long]): DataFrame = {
    val r = lrSigPpb(lrZNum(w)) - col("y") * lit(1000000000L)
    tr.select(LrFeatureNames.indices.map(i =>
      sum(r.cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
        col(s"x$i")).as(s"g$i")): _*)
  }

  /** [[LrIters]] exact batch-GD steps from w=0 over the feature table
    * `tr` (n = its exact row count). One fact scan per iteration (the
    * 5 gradient sums share a single aggregate); the model is 5 longs,
    * collected driver-side like KMeans.lloydModel's centroids and
    * updated with BigInt arithmetic identical to the oracle's HUGEINT
    * chain (sign-handled truncating division — DuckDB // floors, so
    * negative numerators are routed through -((-g) // den) in BOTH
    * engines). Returns the weight trajectory, one Array per iteration. */
  private[graft] def trainLogReg(tr: DataFrame, n: Long): Seq[Array[Long]] = {
    val k = LrFeatureNames.size
    val den = BigInt(1000000L) * BigInt(n)
    var w = Array.fill(k)(0L)
    val traj = Seq.newBuilder[Array[Long]]
    for (_ <- 1 to LrIters) {
      val sums = lrGradients(tr, w).head()
      w = w.indices.map { i =>
        val gi = BigInt(sums.getDecimal(i).toBigInteger) * LrRateNum
        val d = if (gi.signum >= 0) gi / den else -((-gi) / den)
        (BigInt(w(i)) - d).toLong
      }.toArray
      traj += w.clone()
    }
    traj.result()
  }

  /** The registered q282 body: train on the md5(doc_id)%10<8 slice
    * (a hash split — a doc_id-range split correlates with `source` in
    * the testdata and starves the holdout of sources), apply the
    * learned weights to the HELD-OUT slice, report per source. All
    * compared columns are exact BIGINTs (the prediction is the integer
    * sign test znum ≥ 0 ⇔ σ ≥ ½; the mean predicted probability is an
    * exact ppb integral division). */
  private[graft] def learnedFilter(s: SparkSession, docs: DataFrame,
                                   cacheKey: String): DataFrame = {
    val f = lrFeatures(docs)
    val tr = f.filter(col("h") < 8)
    val w = StageCache.valueFor(s, s"lr282:$cacheKey") {
      trainLogReg(tr, tr.count()).last
    }
    val znum = lrZNum(w)
    f.filter(col("h") >= 8)
      .select(col("source"), col("y"), znum.as("znum"),
        lrSigPpb(znum).as("sppb"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("znum") >= 0, 1L).otherwise(0L)).as("n_pred_pass"),
        sum(col("y")).as("n_label_pass"),
        sum(when((col("znum") >= 0) === (col("y") === 1L), 1L)
          .otherwise(0L)).as("n_correct"),
        sum(col("sppb").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("sp"))
      .select(col("source"), col("n_docs"), col("n_pred_pass"),
        col("n_label_pass"), col("n_correct"),
        expr("CAST(sp DIV CAST(n_docs AS DECIMAL(19,0)) AS BIGINT)")
          .as("mean_prob_ppb"))
  }

  /** Good-Turing count-of-counts smoothing (q168 — Good '53, the
    * Gale & Sampson '95 estimator's exact integer core): how much
    * probability mass belongs to UNSEEN tokens, and what a count of r
    * is really worth. One tf pass (terms keyed by the token string in
    * the agg only — the count-of-counts table that shuffles afterwards
    * is O(distinct counts) ≤ O(√T) rows), N_r = #terms seen exactly r
    * times, r* = (r+1)·N_{r+1}·GtMass DIV N_r via one self-join on
    * r+1 (no window), p0 = N₁/T as the single IEEE division. Rows
    * where N_{r+1} = 0 report rstar_mass 0 — the estimator's standard
    * undefined tail, left to the consumer (Gale–Sampson smooth the
    * N_r curve; that is a modeling choice, not an engine one).
    * The terms are token BIGRAMS — the q94 LM's event space, and the
    * smallest unit where unseen mass is a real phenomenon (this
    * corpus's unigram vocabulary is closed: every word repeats). */
  private[graft] def goodTuring(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(toks.as("ts")).filter(size(col("ts")) >= 2)
      .select(explode(tokenBigrams(col("ts"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("r"))
    val nr = tf.groupBy(col("r")).agg(count(lit(1)).as("n_r"))
      .localCheckpoint() // bounded table; feeds output + r+1 leg + sums
    val tot = nr.agg(sum(col("r") * col("n_r")).as("t_tokens"),
      max(when(col("r") === 1, col("n_r"))).as("n1"))
    nr.join(nr.select((col("r") - 1).as("r"), col("n_r").as("n_r1")),
        Seq("r"), "left")
      .crossJoin(broadcast(tot))
      .select(col("r"), col("n_r"),
        expr(s"(r + 1) * coalesce(n_r1, CAST(0 AS BIGINT)) * $GtMass" +
          " DIV n_r").as("rstar_mass"),
        col("t_tokens"),
        (coalesce(col("n1"), lit(0L)).cast("double") / col("t_tokens"))
          .as("p0"))
  }

  /** q185 annotator rules: A = length gate (n_chars ≥ bar), B =
    * lexical-diversity gate (distinct/total tokens ≥ ratio, as the
    * integer cross-multiply n_dist·10⁶ ≥ n_toks·ppm). Both bars sit at
    * the harness medians (306 chars, 0.462 diversity), so each rule
    * splits the corpus near-half and their DISAGREEMENT is populated —
    * a kappa of a degenerate always-agree pair teaches nothing. */
  private[graft] val KappaLenBar = 300L
  private[graft] val KappaDivPpm = 460000L

  /** q186 calibration geometry: 10 fixed confidence bins on the
    * diversity mass; the "label" is the length gate. */
  private[graft] val EceBins = 10L
  private[graft] val EceMass = 1000000L
  private[graft] val EceLenBar = 300L

  /** q187 chi² feature-selection gates: corpus df floor (prunes the
    * long tail before any join fan-out), in-source df floor, and the
    * per-source answer size. */
  private[graft] val Chi2MinDf = 5L
  private[graft] val Chi2MinA = 2L
  private[graft] val Chi2TopK = 5

  /** q200 PSI bands (the conventional 0.1 / 0.25 industry bars — kept
    * standard rather than tuned to the corpus). The harness languages
    * genuinely track the corpus baseline, and the audit SHOWS it: PSI
    * shrinks as n grows (sf0.001 ≈ 0.03–0.07, sf0.01 ≈ 0.01–0.16 with
    * de's moderate being small-sample noise, sf0.1 ≈ 0.003–0.019 all
    * stable) — exactly the convergence an honest drift metric reports
    * on undrifted data. The spec therefore pins the EXACT psi values
    * against a driver replay rather than demanding every band fire. */
  private[graft] val PsiModerate = 0.1
  private[graft] val PsiShifted = 0.25

  /** Population-stability-index drift audit per language (D16 — THE
    * production drift metric between a segment's score distribution
    * and the corpus baseline): the q186 diversity mass binned into the
    * same 10 fixed bins, add-one smoothing on an explicit lang×bin
    * grid over the CORPUS-POPULATED bins (a lang-empty cell of a
    * populated bin must shift the index, not crash the log; a bin
    * empty in the whole corpus carries no distribution mass and drops
    * out via the baseline inner join),
    * PSI = Σ (p−q)·ln(p/q) with each ln ROUNDED IN DECIMAL SPACE to
    * scale 9 (the q137 trick — libm ulps cannot flip the compared
    * value) and the sum decimal-routed (order-invariant). p and q are
    * each ONE division of exact integers. */
  private[graft] def psiDrift(docs: DataFrame): DataFrame = {
    import graft.functions.Num.dsum
    val s = docs.sparkSession
    val scored = docs.select(col("lang"), toks.as("ts"))
      .select(col("lang"),
        expr(s"CAST(size(array_distinct(ts)) AS BIGINT) * $EceMass" +
          s" DIV size(ts)").as("conf_ppm"))
      .withColumn("bin", least(lit(EceBins - 1),
        expr(s"conf_ppm * $EceBins DIV $EceMass")))
    val cells = scored.groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_lb"))
      .localCheckpoint() // ≤langs×10 rows; feeds grid + both totals
    val byLang = cells.groupBy(col("lang")).agg(sum(col("n_lb")).as("n_l"))
    val byBin = cells.groupBy(col("bin")).agg(sum(col("n_lb")).as("n_b"))
    val nAll = cells.agg(sum(col("n_lb")).as("n"))
    val grid = cells.select(col("lang")).distinct()
      .crossJoin(s.range(0, EceBins).toDF("bin"))
    val lnR = (c: Column) => c
      .cast(org.apache.spark.sql.types.DecimalType(20, 9)).cast("double")
    val terms = grid
      .join(cells, Seq("lang", "bin"), "left")
      .join(broadcast(byLang), "lang")
      .join(broadcast(byBin), "bin")
      .crossJoin(broadcast(nAll))
      .select(col("lang"), col("n_l"),
        ((coalesce(col("n_lb"), lit(0L)) + 1).cast("double") /
          (col("n_l") + EceBins)).as("p"),
        ((col("n_b") + 1).cast("double") / (col("n") + EceBins)).as("q"))
      .select(col("lang"), col("n_l"),
        ((col("p") - col("q")) * lnR(log(col("p") / col("q")))).as("term"))
    terms.groupBy(col("lang"))
      .agg(max(col("n_l")).as("n_docs"), dsum(col("term"), 12).as("psi"))
      .select(col("lang"), col("n_docs"), col("psi"),
        when(col("psi") < PsiModerate, "stable")
          .when(col("psi") < PsiShifted, "moderate")
          .otherwise("shifted").as("band"))
  }

  /** Inter-annotator agreement, Cohen's kappa per source (D13 — the
    * label-quality audit run before trusting any labeling pipeline;
    * Cohen '60): two deterministic integer-gated "annotators"
    * ([[KappaLenBar]]/[[KappaDivPpm]]), per-source marginals from ONE
    * rollup, kappa = (n·agree − chance) / (n² − chance) with chance =
    * a₁b₁ + a₀b₀ — every product routed DECIMAL(38,0) (n² passes
    * BIGINT at ~3·10⁹ docs per source; 100 TB does not), ONE IEEE
    * division, and the pe = 1 degenerate (a constant-label source)
    * defined to kappa 0 in both engines rather than dividing by zero. */
  private[graft] def kappaAgreement(docs: DataFrame): DataFrame = {
    val lab = docs.select(col("source"), col("n_chars"), toks.as("ts"))
      .select(col("source"),
        (col("n_chars") >= KappaLenBar).cast("long").as("a"),
        (size(array_distinct(col("ts"))).cast("long") * EceMass >=
          size(col("ts")).cast("long") * KappaDivPpm).cast("long").as("b"))
    lab.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("a")).as("a1"),
        sum(col("b")).as("b1"),
        sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("n_agree"))
      .withColumn("kappa", expr(
        """CASE WHEN CAST(n AS DECIMAL(38,0)) * n
             - (CAST(a1 AS DECIMAL(38,0)) * b1
                + CAST(n - a1 AS DECIMAL(38,0)) * (n - b1)) = 0
           THEN CAST(0.0 AS DOUBLE)
           ELSE CAST(CAST(n AS DECIMAL(38,0)) * n_agree
               - (CAST(a1 AS DECIMAL(38,0)) * b1
                  + CAST(n - a1 AS DECIMAL(38,0)) * (n - b1)) AS DOUBLE)
             / CAST(CAST(n AS DECIMAL(38,0)) * n
               - (CAST(a1 AS DECIMAL(38,0)) * b1
                  + CAST(n - a1 AS DECIMAL(38,0)) * (n - b1)) AS DOUBLE)
           END"""))
      .select(col("source"), col("n"), col("a1"), col("b1"),
        col("n_agree"), col("kappa"))
  }

  /** Calibration audit, expected-calibration-error shape (D14 — is the
    * pipeline's quality score an honest probability?): the diversity
    * mass as "confidence", the length gate as "outcome", 10 fixed
    * bins; per bin the exact integer gap mass |Σconf − pos·10⁶|
    * (= n_b·|avg conf − accuracy| without any floor-loss), the ECE the
    * mass-weighted total. One fact rollup to ≤10 rows, everything
    * exact integers but the two reporting divisions. */
  private[graft] def calibration(docs: DataFrame): DataFrame = {
    val scored = docs.select(col("n_chars"), toks.as("ts"))
      .select(
        expr(s"CAST(size(array_distinct(ts)) AS BIGINT) * $EceMass" +
          s" DIV size(ts)").as("conf_ppm"),
        (col("n_chars") >= EceLenBar).cast("long").as("pos"))
      .withColumn("bin", least(lit(EceBins - 1),
        expr(s"conf_ppm * $EceBins DIV $EceMass")))
    val bins = scored.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_b"), sum(col("conf_ppm")).as("sum_conf"),
        sum(col("pos")).as("n_pos"))
      .localCheckpoint() // ≤10 rows; feeds output + the ECE total
    val tot = bins.agg(sum(col("n_b")).as("n"),
      sum(abs(col("sum_conf") - col("n_pos") * EceMass)).as("gap_total"))
    bins.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_b"),
        expr("sum_conf DIV n_b").as("avg_conf_ppm"),
        expr(s"n_pos * $EceMass DIV n_b").as("acc_ppm"),
        abs(col("sum_conf") - col("n_pos") * EceMass).as("gap_mass"),
        expr("gap_total DIV n").as("ece_ppm"))
  }

  /** Isotonic (PAVA) calibration curve (D29 — the monotone
    * recalibration fitted on top of q186's reliability bins before a
    * confidence score is trusted as a probability; Ayer '55, Barlow &
    * Brunk '72). Computed NOT by the sequential pool-adjacent-
    * violators loop but by its closed MINIMAX form — fitted(i) =
    * max_{j≤i} min_{k≥i} mean(y over bins j..k), a classical identity
    * with the weighted PAVA solution — which is three joins over the
    * ≤[[EceBins]]-row bin table (≤ 10³ segment rows end to end,
    * bounded by the BIN grid, never the corpus; the corpus is only
    * touched by the one binning aggregation). Segment means are ONE
    * IEEE division of exact integer sums, so min/max over them are
    * bit-stable cross-engine; the spec replays the sequential PAVA
    * algorithm in Scala and the two must agree exactly. */
  private[graft] def isotonicCalibration(docs: DataFrame): DataFrame = {
    val scored = docs.select(col("n_chars"), toks.as("ts"))
      .select(
        expr(s"CAST(size(array_distinct(ts)) AS BIGINT) * $EceMass" +
          s" DIV size(ts)").as("conf_ppm"),
        (col("n_chars") >= EceLenBar).cast("long").as("pos"))
      .withColumn("bin", least(lit(EceBins - 1),
        expr(s"conf_ppm * $EceBins DIV $EceMass")))
    val bins = scored.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_b"), sum(col("pos")).as("n_pos"))
      .localCheckpoint() // ≤10 populated bins; feeds the bounded joins
    val seg = bins.select(col("bin").as("j"))
      .crossJoin(broadcast(bins.select(col("bin").as("k"))))
      .filter(col("j") <= col("k"))
      .join(broadcast(bins),
        col("bin") >= col("j") && col("bin") <= col("k"))
      .groupBy(col("j"), col("k"))
      .agg((sum(col("n_pos")).cast("double") /
        sum(col("n_b")).cast("double")).as("seg_mean"))
    val fitted = bins.select(col("bin").as("i"))
      .join(broadcast(seg), col("j") <= col("i") && col("k") >= col("i"))
      .groupBy(col("i"), col("j")).agg(min(col("seg_mean")).as("mn"))
      .groupBy(col("i")).agg(max(col("mn")).as("acc_iso"))
    bins.join(broadcast(fitted), col("bin") === col("i"))
      .select(col("bin"), col("n_b"),
        (col("n_pos").cast("double") / col("n_b").cast("double"))
          .as("acc_raw"),
        col("acc_iso"))
  }

  /** χ² token↔source feature selection (L5 — Yang & Pedersen '97's
    * strongest selector, the "which tokens characterize this source"
    * question behind domain tagging and contamination triage): doc-
    * level 2×2 contingency per (source, token) from ONE distinct
    * (doc, token) projection, χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))
    * over DECIMAL(38,0)-routed exact subproducts (N⁴ caps the route at
    * ~10⁹ docs — past that the denominators move to doubles AFTER the
    * exact (ad−bc)², same answer to double precision), positive
    * associations only, top-[[Chi2TopK]] per source by the
    * (χ² DESC, token ASC) total order via two-phase GroupedTopK.
    * Scale: the contingency table is (sources × vocab)-sized, joins
    * are one token-keyed hash join plus two broadcasts. */
  private[graft] def chi2Tokens(docs: DataFrame): DataFrame = {
    val dt = docs
      .select(col("source"), col("doc_id"),
        explode(array_distinct(toks)).as("token"))
      .localCheckpoint() // feeds the contingency + the df table
    val bySource = dt.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("a"))
    val dfT = bySource.groupBy(col("token")).agg(sum(col("a")).as("df"))
    val nS = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    val nAll = docs.agg(count(lit(1)).as("n"))
    val scored = bySource
      .join(dfT, "token")
      .join(broadcast(nS), "source")
      .crossJoin(broadcast(nAll))
      .filter(col("df") >= Chi2MinDf && col("a") >= Chi2MinA)
      .withColumn("ad_bc", expr(
        """CAST(a AS DECIMAL(38,0)) * (n - n_s - df + a)
           - CAST(n_s - a AS DECIMAL(38,0)) * (df - a)"""))
      .filter(col("ad_bc") > 0)
      .withColumn("chi2", expr(
        """CAST(CAST(n AS DECIMAL(38,0)) * ad_bc * ad_bc AS DOUBLE)
           / CAST(CAST(n_s AS DECIMAL(38,0)) * (n - n_s) * df * (n - df)
             AS DOUBLE)"""))
    GroupedTopK.topK(scored, Seq("source"),
        Seq(col("chi2").desc, col("token").asc), Chi2TopK)
      .select(col("source"), col("token"), col("a").as("df_in_source"),
        col("df").as("df_corpus"), col("chi2"), col("rn").cast("long").as("rn"))
  }

  /** Corpus concentration audit (D19 — "is a source's token mass
    * dominated by a few giant documents", the Lorenz/Gini lens data
    * curation uses to spot scrape pathologies): per-source ASCENDING
    * Lorenz rank of per-doc token counts, then the closed form
    * Gini = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx). The rank i is a
    * per-source PREFIX COUNT, so it goes through ScanSum's two-pass
    * distributed scan (the q58/q83 machinery: each task sorts only
    * its own range slice, per-slice subtotals broadcast, offsets add
    * back) — the r10 verdict flagged the previous per-source
    * row_number window here: sources are a ~20-way operational axis,
    * so at 100 TB each task single-reducer-sorted ~5 TB. n comes from
    * an aggregate + broadcast join for the same reason (an unordered
    * count().over(partitionBy(source)) funnels identically). Every
    * product routes DECIMAL(38,0): i·x alone reaches ~10¹⁵ and its
    * sum ~10²⁵ at 100 TB-scale sources, past BIGINT by design (the
    * q159 discipline); the two outputs are each ONE IEEE division of
    * exact decimals. The top-decile token share rides the SAME scan
    * via an integer decile cross-multiply — no second shuffle. */
  private[graft] def giniConcentration(docs: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = docs.select(col("source"), col("doc_id"),
        size(toks).cast("long").as("x"))
    val counts = base.groupBy(col("source")).agg(count(lit(1)).as("n"))
    ScanSum.runningSum(
        base.withColumn("__ord", struct(col("x"), col("doc_id")))
          .withColumn("__one", lit(1L)),
        "source", "__ord", "__one", outCol = "i")
      .join(broadcast(counts), "source")
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"), sum(col("x")).as("total_toks"),
        sum(col("i").cast(dec) * col("x").cast(dec)).as("ix"),
        sum(when(col("i") * 10 > col("n") * 9, col("x")).otherwise(0L))
          .as("top_toks"))
      .select(col("source"), col("n_docs"), col("total_toks"),
        ((lit(2L).cast(dec) * col("ix") -
          (col("n_docs") + 1).cast(dec) * col("total_toks").cast(dec))
          .cast("double") /
          (col("n_docs").cast(dec) * col("total_toks").cast(dec))
            .cast("double")).as("gini"),
        (col("top_toks").cast("double") / col("total_toks"))
          .as("top10_share"))
  }

  /** Pairwise source-divergence matrix (D20 — the source-similarity
    * map behind mixture design, the distributional complement of
    * q132's exact chunk overlap): Jensen–Shannon divergence between
    * per-source unigram distributions over the SHARED corpus vocab
    * grid, add-one smoothed (the q200 recipe), every ln rounded in
    * decimal space to scale 9 and the sum decimal-routed — bit-stable
    * cross-engine. The term table is vocab × pairs rows; sources are
    * an operational dimension (bounded), so the pair fan-out is the
    * bounded axis while the vocab axis stays an equi-join on tok. */
  private[graft] def jsdMatrix(docs: DataFrame): DataFrame = {
    import graft.functions.Num.dsum
    val cnt = docs.select(col("source"), explode(toks).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // sources×vocab rows; feeds grid + totals
    val totals = cnt.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val vsize = cnt.select(col("tok")).distinct()
      .agg(count(lit(1)).as("v"))
    val filled = broadcast(cnt.select(col("source")).distinct())
      .crossJoin(cnt.select(col("tok")).distinct())
      .join(cnt, Seq("source", "tok"), "left")
      .join(broadcast(totals), "source")
      .crossJoin(broadcast(vsize))
      .select(col("source"), col("tok"), col("n"),
        ((coalesce(col("c"), lit(0L)) + 1).cast("double") /
          (col("n") + col("v"))).as("p"))
      .localCheckpoint() // sources×vocab rows; feeds BOTH pair sides
    val lnR = (c: Column) => c
      .cast(org.apache.spark.sql.types.DecimalType(20, 9)).cast("double")
    filled.select(col("source").as("src_a"), col("tok"),
        col("n").as("n_a"), col("p"))
      .join(filled.select(col("source").as("src_b"), col("tok"),
        col("n").as("n_b"), col("p").as("q")), "tok")
      .filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        (lit(0.5) * (col("p") *
          lnR(log(col("p") * 2.0 / (col("p") + col("q")))) +
          col("q") *
          lnR(log(col("q") * 2.0 / (col("p") + col("q")))))).as("term"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        dsum(col("term"), 12).as("jsd"))
  }

  /** Spearman rank correlation audit (D23 — "does doc length track
    * lexical diversity per source": the monotone-association check
    * that decides whether one quality signal is redundant given
    * another, without assuming linearity). BOTH rank axes go through
    * ScanSum's two-pass distributed scan (the q213 doctrine — the
    * second call simply re-ranges the first call's output on the
    * other axis, ranks riding along as payload); ties break by doc_id
    * on both axes, so this is Spearman of the deterministic tie-broken
    * total order — the SAME order the oracle's row_number uses, making
    * ρ cross-engine exact. Σd² routes DECIMAL(38,0) (d² alone reaches
    * ~10²⁴ at stratum scale; the denominator n(n²−1) ~10³⁶ — HUGEINT
    * in the oracle); ρ = 1 − 6Σd²/(n(n²−1)) is one IEEE division of
    * exact decimals. n < 2 (denominator 0) defines ρ = 0 both sides. */
  private[graft] def spearmanAudit(docs: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = docs.select(col("source"), col("doc_id"),
        col("n_chars").as("x"),
        size(array_distinct(toks)).cast("long").as("y"))
    val rx = ScanSum.runningSum(
      base.withColumn("__ord", struct(col("x"), col("doc_id")))
        .withColumn("__one", lit(1L)),
      "source", "__ord", "__one", outCol = "rx")
    val ry = ScanSum.runningSum(
      rx.drop("__ord")
        .withColumn("__ord", struct(col("y"), col("doc_id"))),
      "source", "__ord", "__one", outCol = "ry")
    ry.select(col("source"),
        (col("rx") - col("ry")).as("dd"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("dd").cast(dec) * col("dd").cast(dec)).cast(dec).as("d2"))
      .withColumn("den", col("n_docs").cast(dec) *
        (col("n_docs").cast(dec) * col("n_docs").cast(dec) - 1))
      .select(col("source"), col("n_docs"),
        col("d2").cast("double").as("sum_d2"),
        when(col("den") === 0, lit(0.0))
          .otherwise(lit(1.0) - (lit(6L).cast(dec) * col("d2"))
            .cast("double") / col("den").cast("double")).as("rho"))
  }

  /** Unseen-vocabulary estimate (D25 — "how much of this source's
    * vocabulary have we NOT seen yet": Chao1's lower bound on species
    * richness (Chao '84) plus Good–Turing sample coverage — the pair
    * a crawler reads to decide whether more of a source is worth
    * fetching). Everything derives from ONE per-(source, token) count
    * rollup: V observed types, F₁ singletons, F₂ doubletons, N token
    * mass; chao1 = V + F₁(F₁−1)/(2(F₂+1)) (the bias-corrected form —
    * defined at F₂ = 0) with the product routed DECIMAL(38,0)
    * (F₁ ~10¹⁰ squares past BIGINT at corpus scale; HUGEINT in the
    * oracle) and ONE IEEE division; coverage = 1 − F₁/N likewise.
    * Tokens hash-shuffle once; strings never re-shuffle. */
  private[graft] def chao1Audit(docs: DataFrame): DataFrame =
    chao1View(docs.select(col("source"), explode(toks).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c")))

  /** The Chao1 tail over ANY per-(source, tok) count table — shared
    * with the streaming vocabulary store (q229): per-token counts are
    * addition-mergeable, and V/F₁/F₂/N are pure functions of the
    * merged counts, so stream == batch BY ALGEBRA. */
  private[graft] def chao1View(cnt: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    cnt
      .groupBy(col("source"))
      .agg(count(lit(1)).as("v_obs"), sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("source"), col("v_obs"), col("n_tokens"), col("f1"),
        col("f2"),
        (col("v_obs").cast("double") +
          (col("f1").cast(dec) * (col("f1").cast(dec) - 1)).cast("double") /
          ((col("f2") + 1) * 2).cast("double")).as("chao1"),
        (lit(1.0) - col("f1").cast("double") /
          col("n_tokens").cast("double")).as("coverage"))
  }

  /** Hash-bucket bootstrap confidence interval (D27 — "how sure is
    * this corpus mean": the bag-of-little-bootstraps-shaped
    * uncertainty estimate that needs NO resampling pass — 32
    * deterministic md5 buckets are 32 independent-ish subsamples, the
    * between-bucket spread of their means estimates the sampling
    * variance, and the whole thing is two aggregations). Bucket means
    * are single IEEE divisions of exact integers; their first two
    * moments go through dsum (exact decimal accumulation) so the
    * 32-term sums are order-independent; the CI arithmetic is one
    * identical IEEE chain per engine (sqrt is correctly rounded).
    * n_buckets < 2 defines a zero-width interval both sides. */
  private[graft] def bootstrapCi(docs: DataFrame): DataFrame = {
    import graft.functions.Num.dsum
    val m = docs
      .withColumn("h", md5(col("doc_id").cast("string").cast("binary")))
      .withColumn("bkt",
        expr("CAST(conv(substr(h, 1, 2), 16, 10) AS INT) DIV 8"))
      .groupBy(col("lang"), col("bkt"))
      .agg(count(lit(1)).as("nj"), sum(col("n_chars")).as("sj"))
      .withColumn("mj", col("sj").cast("double") / col("nj").cast("double"))
    val a = m.groupBy(col("lang"))
      .agg(sum(col("nj")).as("n_docs"), count(lit(1)).as("k"),
        dsum(col("mj"), 6).as("sm"),
        dsum(col("mj") * col("mj"), 6).as("smm"))
    val grand = col("sm") / col("k")
    val half = when(col("k") < 2, lit(0.0)).otherwise(
      lit(1.96) * sqrt(greatest(
        (col("smm") - col("sm") * col("sm") / col("k")) / (col("k") - 1),
        lit(0.0)) / col("k")))
    a.select(col("lang"), col("n_docs"), col("k").as("n_buckets"),
      grand.as("mean_chars"),
      (grand - half).as("ci_lo"), (grand + half).as("ci_hi"))
  }

  /** χ² 95 % critical values for df 1..31 — shared with the oracle as
    * a literal lookup (both engines 1-index the SAME list; a df past
    * the table yields NULL significance in BOTH engines and the spec's
    * non-vacuity guard trips loudly). The source axis is a ~20-way
    * operational dimension, so df = k−1 sits comfortably inside. */
  private[graft] val Chi2Crit95: Seq[Double] = Seq(
    3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067, 15.507, 16.919,
    18.307, 19.675, 21.026, 22.362, 23.685, 24.996, 26.296, 27.587,
    28.869, 30.144, 31.410, 32.671, 33.924, 35.172, 36.415, 37.652,
    38.885, 40.113, 41.337, 42.557, 43.773, 44.985)

  /** Kruskal–Wallis H across sources on document length (D33 —
    * Kruskal & Wallis '52: the k-sample generalization of q235's
    * Mann–Whitney — "do the sources draw lengths from one
    * distribution", the one-number balance audit a mixture rebuild
    * runs before q69's domain mixing). Pooled midranks come from ONE
    * ScanSum pass over the value-count table (doubled to stay
    * integral under ties — the q235 discipline); per-source doubled
    * rank sums are exact DECIMAL(38,0) (R₂ ≤ 2N·n_s ~ 10²³ at 10¹²
    * docs); the Σ R₂²/n_s terms are per-source IEEE divisions of
    * exact integers accumulated by dsum (order-independent; term ≤
    * 4N³/k ~ 10³² of DECIMAL(38,6)'s integral range at N ~ 8·10¹⁰
    * pooled docs — the documented cap; past it route dsum at scale
    * 0); tie correction is the cleared Σ(c³−c) / (N³−N) chain, both
    * factors DECIMAL(38,0)-exact; H, the correction and the
    * [[Chi2Crit95]] lookup are the identical IEEE chain in both
    * engines. One global row. */
  private[graft] def kruskalWallis(docs: DataFrame): DataFrame = {
    import graft.functions.Num.dsum
    val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val cnt = docs.select(col("source"), col("n_chars"))
      .groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("cs"))
    val vtot = cnt.groupBy(col("n_chars")).agg(sum(col("cs")).as("c"))
      .withColumn("g", lit("all"))
    val mr = graft.operators.ScanSum
      .runningSum(vtot, "g", "n_chars", "c", outCol = "cumc")
      .select(col("n_chars"),
        ((col("cumc") - col("c")) * 2 + col("c") + 1).as("mr2"))
    val rs = cnt.join(mr, "n_chars")
      .groupBy(col("source"))
      .agg(sum((col("cs").cast(dec19) * col("mr2").cast(dec19)).cast(dec))
          .cast(dec).as("r2"),
        sum(col("cs")).as("ns"))
    val ties = vtot.agg(
      sum((col("c").cast(dec19) * col("c").cast(dec19) * col("c"))
        .cast(dec) - col("c").cast(dec)).cast(dec).as("tie_t"))
    rs.agg(count(lit(1)).as("n_groups"), sum(col("ns")).as("n_total"),
        dsum(col("r2").cast("double") * col("r2").cast("double") /
          col("ns").cast("double")).as("t_sum"))
      .crossJoin(broadcast(ties))
      .withColumn("df", col("n_groups") - 1)
      .withColumn("h",
        lit(3.0) * col("t_sum") /
          (col("n_total").cast(dec19) * (col("n_total") + 1).cast(dec19))
            .cast(dec).cast("double") -
          lit(3.0) * (col("n_total") + 1).cast("double"))
      .withColumn("c1",
        lit(1.0) - col("tie_t").cast("double") /
          (col("n_total").cast(dec19) * col("n_total").cast(dec19) *
            col("n_total").cast(dec19) - col("n_total").cast(dec19))
            .cast(dec).cast("double"))
      .withColumn("h_tie_corrected",
        when(col("c1") > 0.0, col("h") / col("c1")).otherwise(lit(0.0)))
      .withColumn("significant",
        when(col("df").between(1, Chi2Crit95.size),
          col("h_tie_corrected") >
            element_at(array(Chi2Crit95.map(lit): _*),
              col("df").cast("int")))
          .otherwise(lit(null).cast("boolean")))
      .select(col("n_groups"), col("n_total"), col("df"), col("h"),
        col("h_tie_corrected"), col("significant"))
  }

  /** Simpson concentration / Gini–Simpson diversity per source over
    * tokens (D35 — Simpson '49: λ = Σc(c−1)/(N(N−1)), the probability
    * two tokens drawn WITHOUT replacement are the same type; 1−λ is
    * the Gini–Simpson diversity and 1/λ the effective vocabulary —
    * the concentration audit that flags a source collapsing onto
    * boilerplate even when q225's richness still looks healthy).
    * Exact: Σc(c−1) and N(N−1) route DECIMAL(38,0)/HUGEINT (c² ~
    * 10²⁴ at 10¹² same-type tokens wraps BIGINT); ONE IEEE division,
    * the inverse as display. Pure function of the per-(source, token)
    * counts ⇒ the streaming twin (q263) reads the SAME view over the
    * vocabulary store — its THIRD tail. */
  private[graft] def simpsonDiversityView(cnt: DataFrame): DataFrame = {
    val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    cnt.groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"), sum(col("c")).as("n_tokens"),
        sum((col("c").cast(dec19) * (col("c") - 1).cast(dec19)).cast(dec))
          .cast(dec).as("lam_num"))
      .withColumn("simpson_lambda",
        when(col("n_tokens") > 1,
          col("lam_num").cast("double") /
            (col("n_tokens").cast(dec19) * (col("n_tokens") - 1)
              .cast(dec19)).cast(dec).cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("gini_simpson", lit(1.0) - col("simpson_lambda"))
      .withColumn("effective_vocab",
        when(col("simpson_lambda") > 0.0,
          lit(1.0) / col("simpson_lambda")).otherwise(lit(0.0)))
      .select(col("source"), col("n_tokens"), col("vocab"),
        col("simpson_lambda"), col("gini_simpson"),
        col("effective_vocab"))
  }

  private[graft] def simpsonDiversity(docs: DataFrame): DataFrame =
    simpsonDiversityView(docs.select(col("source"), explode(toks).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c")))

  /** Yule's characteristic K over a per-(source, token) count table
    * (D42 — Yule '44: vocabulary RICHNESS as repeat-rate per 10⁴
    * token pairs, K = 10⁴·(Σc² − N)/N². Unlike q227's Heaps exponent
    * it is SIZE-INVARIANT by construction — K of a text and of the
    * text doubled are equal in expectation — so it separates "this
    * source repeats itself" from "this source is just bigger", the
    * axis q257's Simpson λ (which K is an unnormalized sibling of)
    * and q225's Chao1 both conflate with corpus size). Σc² routes
    * DECIMAL(38,0)/HUGEINT (c ~ 10¹² wraps BIGINT when squared); K is
    * ONE IEEE chain over the exact integers, identical in both
    * engines. Pure function of the merged per-(source, token) counts
    * ⇒ the streaming twin (q281) reads the SAME view over the
    * vocabulary store — its FOURTH tail. */
  private[graft] def yuleKView(cnt: DataFrame): DataFrame = {
    val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    cnt.groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"), sum(col("c")).as("n_tokens"),
        sum((col("c").cast(dec19) * col("c").cast(dec19)).cast(dec))
          .cast(dec).as("s2"))
      .withColumn("yule_k",
        when(col("n_tokens") > 0,
          (col("s2") - col("n_tokens").cast(dec)).cast("double") *
            10000.0 /
            (col("n_tokens").cast(dec19) * col("n_tokens").cast(dec19))
              .cast(dec).cast("double"))
          .otherwise(lit(0.0)))
      .select(col("source"), col("n_tokens"), col("vocab"),
        col("s2").cast("double").as("sum_c2"), col("yule_k"))
  }
  private[graft] def yuleK(docs: DataFrame): DataFrame =
    yuleKView(docs.select(col("source"), explode(toks).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Learned quality-filter combiner (L6): LrIters exact GD steps,
    // applied to the held-out slice. See the q282 block above for the
    // 100 TB magnitude/caps argument.
    "q282_learned_filter" -> ((s, d) =>
      learnedFilter(s, documents(s, d), d)),
    "q276_yule_k" -> ((s, d) => yuleK(documents(s, d))),
    "q255_kruskal_wallis" -> ((s, d) => kruskalWallis(documents(s, d))),
    "q257_simpson_diversity" -> ((s, d) =>
      simpsonDiversity(documents(s, d))),
    "q234_bootstrap_ci" -> ((s, d) => bootstrapCi(documents(s, d))),
    "q225_chao1" -> ((s, d) => chao1Audit(documents(s, d))),
    "q221_spearman" -> ((s, d) => spearmanAudit(documents(s, d))),
    "q213_gini_concentration" -> ((s, d) =>
      giniConcentration(documents(s, d))),
    "q214_jsd_matrix" -> ((s, d) => jsdMatrix(documents(s, d))),
    "q185_kappa" -> ((s, d) => kappaAgreement(documents(s, d))),
    "q200_psi_drift" -> ((s, d) => psiDrift(documents(s, d))),
    "q186_calibration" -> ((s, d) => calibration(documents(s, d))),
    "q241_isotonic" -> ((s, d) => isotonicCalibration(documents(s, d))),
    "q187_chi2_tokens" -> ((s, d) => chi2Tokens(documents(s, d))),
    "q168_good_turing" -> ((s, d) => goodTuring(documents(s, d))),
    "q85_rare_token_quality" -> ((s, d) => rareTokenQuality(documents(s, d))),
    "q86_dsir_weights" -> ((s, d) => dsirWeights(documents(s, d))),
    "q94_bigram_fluency" -> ((s, d) => bigramFluency(documents(s, d))),
    "q149_collocations" -> ((s, d) => collocations(documents(s, d))),
    "q152_textrank" -> ((s, d) => textRank(documents(s, d))),
    "q142_kn_fluency" -> ((s, d) => knFluency(documents(s, d))),
    "q143_filter_cascade" -> ((s, d) => filterCascade(documents(s, d))),
    "q109_novelty" -> ((s, d) => trigramNovelty(documents(s, d))),
    "q119_repetition" -> ((s, d) => repetitionStats(documents(s, d))))

  /** Σ w_i·x_i over HUGEINT for the weight row alias `w` — the oracle
    * twin of [[lrZNum]]. */
  private def lrZNumSql(w: String): String =
    LrFeatureNames.indices
      .map(i => s"CAST($w.w$i AS HUGEINT) * x$i").mkString(" + ")

  /** The oracle twin of [[lrSigPpb]] over a znum SQL expression. */
  private def lrSigPpbSql(znum: String): String =
    s"CAST(CAST(1.0 / (1.0 + exp(-(CAST($znum AS DOUBLE) / 1.0e15)))" +
      s" AS DECIMAL(20,9)) * 1000000000 AS BIGINT)"

  /** Sign-handled truncating update step (DuckDB // floors, so the
    * negative branch routes through -((-g) // den), matching BigInt's
    * truncation toward zero). */
  private def lrDeltaSql(g: String): String =
    s"""CASE WHEN $g >= 0
          THEN CAST(($LrRateNum * $g) // (1000000 * nn.n) AS BIGINT)
          ELSE -CAST(($LrRateNum * (-($g))) // (1000000 * nn.n) AS BIGINT)
        END"""

  /** The full q282 oracle: the exact feature CTE, then EVERY GD step
    * unrolled (s/g/w CTE triple per iteration — iteration count, rate,
    * mass and rounding all shared constants with the Scala loop), then
    * the held-out application. */
  private def lrOracle: String = {
    val k = LrFeatureNames.size
    val w0 = (0 until k).map(i => s"CAST(0 AS BIGINT) AS w$i").mkString(", ")
    val steps = (1 to LrIters).map { t =>
      val gs = (0 until k)
        .map(i => s"sum(CAST(r AS HUGEINT) * x$i) AS g$i").mkString(", ")
      val ws = (0 until k)
        .map(i => s"w.w$i - ${lrDeltaSql(s"g.g$i")} AS w$i").mkString(", ")
      s"""s$t AS (
           SELECT tr.*, ${lrSigPpbSql(lrZNumSql("w"))}
             - y * 1000000000 AS r
           FROM tr CROSS JOIN w${t - 1} w),
         g$t AS (SELECT $gs FROM s$t),
         w$t AS (SELECT $ws FROM w${t - 1} w CROSS JOIN g$t g CROSS JOIN nn)"""
    }.mkString(",\n         ")
    s"""WITH tk AS (
           SELECT doc_id, source,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
           FROM documents),
         ag AS (
           SELECT doc_id, any_value(source) AS source,
             CAST(count(*) AS BIGINT) AS wc,
             CAST(count(DISTINCT w) AS BIGINT) AS dist,
             CAST(sum(len(w)) AS BIGINT) AS tokchars
           FROM tk WHERE len(w) > 0 GROUP BY doc_id),
         f AS (
           SELECT doc_id, source,
             ((instr('0123456789abcdef',
                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 256
              + (instr('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 16
              + (instr('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1)) % 10
               AS h,
             CAST(CASE WHEN wc >= $FcMinTokens AND dist * 2 >= wc
               THEN 1 ELSE 0 END AS BIGINT) AS y,
             CAST(1000000 AS BIGINT) AS x0,
             (least(1000000, wc * 2000) - 100000) * 2 AS x1,
             (dist * 1000000 // wc - 500000) * 5 AS x2,
             (least(1000000, tokchars * 1000000 // (wc * 16)) - 280000)
               * 10 AS x3
           FROM ag),
         tr AS (SELECT * FROM f WHERE h < 8),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tr),
         w0 AS (SELECT $w0),
         $steps,
         sc AS (
           SELECT f.source, f.y, ${lrZNumSql("w")} AS znum,
             ${lrSigPpbSql(lrZNumSql("w"))} AS sppb
           FROM f CROSS JOIN w$LrIters w
           WHERE f.h >= 8)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN znum >= 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pred_pass,
           CAST(sum(y) AS BIGINT) AS n_label_pass,
           CAST(sum(CASE WHEN (znum >= 0) = (y = 1) THEN 1 ELSE 0 END)
             AS BIGINT) AS n_correct,
           CAST(sum(CAST(sppb AS HUGEINT)) // count(*) AS BIGINT)
             AS mean_prob_ppb
         FROM sc GROUP BY 1"""
  }

  val oracleSql: Map[String, String] = Map(
    // q282: the feature table, all LrIters GD steps as generated CTE
    // triples, and the held-out application — see [[lrOracle]].
    "q282_learned_filter" -> lrOracle,

    // q276: one token rollup; HUGEINT Σc² and N; the same single
    // ×10⁴ division chain.
    "q276_yule_k" ->
      """WITH tok AS (
           SELECT source,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           FROM documents),
         cnt AS (
           SELECT source, tok, CAST(count(*) AS BIGINT) AS c
           FROM tok WHERE len(tok) > 0 GROUP BY 1, 2),
         a AS (
           SELECT source, CAST(count(*) AS BIGINT) AS vocab,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2
           FROM cnt GROUP BY 1)
         SELECT source, n_tokens, vocab, CAST(s2 AS DOUBLE) AS sum_c2,
           CASE WHEN n_tokens > 0
             THEN CAST(s2 - n_tokens AS DOUBLE) * 10000.0
               / CAST(CAST(n_tokens AS HUGEINT) * n_tokens AS DOUBLE)
             ELSE 0.0 END AS yule_k
         FROM a""",

    // q255: identical pooled doubled-midrank prefix (a window over
    // the value-count rows — unique per value), HUGEINT rank sums,
    // the dsum mirror for Σ R₂²/n, the same tie/H/lookup IEEE chain
    // (list_extract OOB → NULL == the Spark guard's NULL).
    "q255_kruskal_wallis" ->
      s"""WITH cnt AS (
           SELECT source, n_chars, CAST(count(*) AS BIGINT) AS cs
           FROM documents GROUP BY 1, 2),
         vtot AS (
           SELECT n_chars, CAST(sum(cs) AS BIGINT) AS c
           FROM cnt GROUP BY 1),
         cum AS (
           SELECT n_chars, c, CAST(sum(c) OVER (ORDER BY n_chars
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cumc
           FROM vtot),
         mr AS (SELECT n_chars, (cumc - c) * 2 + c + 1 AS mr2 FROM cum),
         rs AS (
           SELECT c2.source,
             CAST(sum(CAST(c2.cs AS HUGEINT) * m.mr2) AS HUGEINT) AS r2,
             CAST(sum(c2.cs) AS BIGINT) AS ns
           FROM cnt c2 JOIN mr m ON m.n_chars = c2.n_chars GROUP BY 1),
         tie AS (
           SELECT CAST(sum(CAST(c AS HUGEINT) * c * c - c) AS HUGEINT)
             AS tie_t
           FROM vtot),
         a AS (
           SELECT CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(ns) AS BIGINT) AS n_total,
             CAST(sum(CAST(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
               / CAST(ns AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE)
               AS t_sum
           FROM rs),
         f AS (
           SELECT n_groups, n_total,
             CAST(n_groups - 1 AS BIGINT) AS df,
             3.0 * t_sum / CAST(CAST(n_total AS HUGEINT) * (n_total + 1)
               AS DOUBLE) - 3.0 * CAST(n_total + 1 AS DOUBLE) AS h,
             1.0 - CAST(tie_t AS DOUBLE)
               / CAST(CAST(n_total AS HUGEINT) * n_total * n_total
                 - n_total AS DOUBLE) AS c1
           FROM a CROSS JOIN tie)
         SELECT n_groups, n_total, df, h,
           CASE WHEN c1 > 0.0 THEN h / c1 ELSE 0.0 END
             AS h_tie_corrected,
           CASE WHEN c1 > 0.0 THEN h / c1 ELSE 0.0 END
             > list_extract([${Chi2Crit95.mkString(", ")}],
                 CAST(df AS INT)) AS significant
         FROM f""",

    // q257: one token rollup; HUGEINT Σc(c−1) and N(N−1); the same
    // single-division λ and display chain.
    "q257_simpson_diversity" ->
      """WITH tok AS (
           SELECT source,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           FROM documents),
         cnt AS (
           SELECT source, tok, CAST(count(*) AS BIGINT) AS c
           FROM tok WHERE len(tok) > 0 GROUP BY 1, 2),
         a AS (
           SELECT source, CAST(count(*) AS BIGINT) AS vocab,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(sum(CAST(c AS HUGEINT) * (c - 1)) AS HUGEINT)
               AS lam_num
           FROM cnt GROUP BY 1),
         l AS (
           SELECT *, CASE WHEN n_tokens > 1
             THEN CAST(lam_num AS DOUBLE)
               / CAST(CAST(n_tokens AS HUGEINT) * (n_tokens - 1)
                 AS DOUBLE)
             ELSE 0.0 END AS simpson_lambda
           FROM a)
         SELECT source, n_tokens, vocab, simpson_lambda,
           1.0 - simpson_lambda AS gini_simpson,
           CASE WHEN simpson_lambda > 0.0 THEN 1.0 / simpson_lambda
                ELSE 0.0 END AS effective_vocab
         FROM l""",

    // q234: identical md5 buckets, single-division bucket means,
    // decimal-accumulated moments, the same IEEE CI chain.
    "q234_bootstrap_ci" ->
      """WITH b AS (
           SELECT lang,
             ((instr('0123456789abcdef',
                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
              + instr('0123456789abcdef',
                 substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) // 8
               AS bkt,
             CAST(count(*) AS BIGINT) AS nj,
             CAST(sum(n_chars) AS BIGINT) AS sj
           FROM documents GROUP BY 1, 2),
         m AS (SELECT lang, nj,
                 CAST(sj AS DOUBLE) / CAST(nj AS DOUBLE) AS mj FROM b),
         a AS (
           SELECT lang, CAST(sum(nj) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CAST(mj AS DECIMAL(38,6))) AS DOUBLE) AS sm,
             CAST(sum(CAST(mj * mj AS DECIMAL(38,6))) AS DOUBLE) AS smm
           FROM m GROUP BY 1)
         SELECT lang, n_docs, k AS n_buckets,
           sm / k AS mean_chars,
           sm / k - (CASE WHEN k < 2 THEN 0.0
             ELSE 1.96 * sqrt(greatest(
               (smm - sm * sm / k) / (k - 1), 0.0) / k) END) AS ci_lo,
           sm / k + (CASE WHEN k < 2 THEN 0.0
             ELSE 1.96 * sqrt(greatest(
               (smm - sm * sm / k) / (k - 1), 0.0) / k) END) AS ci_hi
         FROM a""",

    // q225: one count rollup; HUGEINT mirrors F₁(F₁−1); the same
    // additive double then single divisions.
    "q225_chao1" ->
      """WITH c AS (
           SELECT source, t AS tok, CAST(count(*) AS BIGINT) AS c
           FROM (SELECT source,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS t
                 FROM documents)
           WHERE t <> '' GROUP BY 1, 2),
         a AS (
           SELECT source, CAST(count(*) AS BIGINT) AS v_obs,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
           FROM c GROUP BY 1)
         SELECT source, v_obs, n_tokens, f1, f2,
           CAST(v_obs AS DOUBLE)
             + CAST(CAST(f1 AS HUGEINT) * (f1 - 1) AS DOUBLE)
               / CAST(2 * (f2 + 1) AS DOUBLE) AS chao1,
           1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS coverage
         FROM a""",

    // q221: identical tie-broken rank orders ((x, doc_id) / (y,
    // doc_id) — the same total order ScanSum ranks), HUGEINT mirrors
    // the DECIMAL(38,0) Σd² and n(n²−1), one division at the end.
    "q221_spearman" ->
      """WITH b AS (
           SELECT source, doc_id, n_chars AS x,
             CAST(len(list_distinct(
               regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS y
           FROM documents),
         r AS (
           SELECT source,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY x, doc_id) AS HUGEINT) AS rx,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY y, doc_id) AS HUGEINT) AS ry
           FROM b),
         a AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             sum((rx - ry) * (rx - ry)) AS d2
           FROM r GROUP BY 1)
         SELECT source, n_docs, CAST(d2 AS DOUBLE) AS sum_d2,
           CASE WHEN CAST(n_docs AS HUGEINT)
                  * (CAST(n_docs AS HUGEINT) * n_docs - 1) = 0 THEN 0.0
                ELSE 1.0 - CAST(6 * d2 AS DOUBLE)
                  / CAST(CAST(n_docs AS HUGEINT)
                      * (CAST(n_docs AS HUGEINT) * n_docs - 1) AS DOUBLE)
           END AS rho
         FROM a""",

    // q213: identical rank order, HUGEINT mirrors the DECIMAL(38,0)
    // route, the same decile cross-multiply and single divisions.
    "q213_gini_concentration" ->
      """WITH x AS (
           SELECT source, doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+'))
               AS BIGINT) AS x
           FROM documents),
         r AS (
           SELECT source, x,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY x ASC, doc_id ASC) AS BIGINT) AS i,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
           FROM x),
         a AS (
           SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
             CAST(sum(x) AS BIGINT) AS total_toks,
             sum(CAST(i AS HUGEINT) * CAST(x AS HUGEINT)) AS ix,
             CAST(sum(CASE WHEN i * 10 > n * 9 THEN x ELSE 0 END)
               AS BIGINT) AS top_toks
           FROM r GROUP BY 1)
         SELECT source, n_docs, total_toks,
           CAST(CAST(2 AS HUGEINT) * ix
             - CAST(n_docs + 1 AS HUGEINT) * total_toks AS DOUBLE)
             / CAST(CAST(n_docs AS HUGEINT) * total_toks AS DOUBLE)
             AS gini,
           CAST(top_toks AS DOUBLE) / total_toks AS top10_share
         FROM a""",

    // q214: identical shared-vocab grid, add-one smoothing,
    // decimal-rounded ln terms, decimal-routed per-pair sum.
    "q214_jsd_matrix" ->
      """WITH cnt AS (
           SELECT source, t AS tok, CAST(count(*) AS BIGINT) AS c
           FROM (SELECT source,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS t
                 FROM documents)
           WHERE t <> '' GROUP BY 1, 2),
         totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
                    FROM cnt GROUP BY 1),
         vsize AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
                   FROM cnt),
         filled AS (
           SELECT s.source, t.tok, tt.n,
             CAST(coalesce(c.c, 0) + 1 AS DOUBLE) / (tt.n + vs.v) AS p
           FROM (SELECT DISTINCT source FROM cnt) s
           CROSS JOIN (SELECT DISTINCT tok FROM cnt) t
           LEFT JOIN cnt c ON c.source = s.source AND c.tok = t.tok
           JOIN totals tt ON tt.source = s.source
           CROSS JOIN vsize vs),
         terms AS (
           SELECT a.source AS src_a, b.source AS src_b,
             a.n AS n_a, b.n AS n_b,
             0.5 * (a.p * CAST(CAST(ln(a.p * 2.0 / (a.p + b.p))
                 AS DECIMAL(20,9)) AS DOUBLE)
               + b.p * CAST(CAST(ln(b.p * 2.0 / (a.p + b.p))
                 AS DECIMAL(20,9)) AS DOUBLE)) AS term
           FROM filled a JOIN filled b ON a.tok = b.tok
             AND a.source < b.source)
         SELECT src_a, src_b, CAST(max(n_a) AS BIGINT) AS n_a,
           CAST(max(n_b) AS BIGINT) AS n_b,
           CAST(sum(CAST(term AS DECIMAL(38,12))) AS DOUBLE) AS jsd
         FROM terms GROUP BY 1, 2""",

    // q200: identical bins, explicit grid, add-one smoothing,
    // decimal-rounded ln terms, decimal-routed per-lang sum.
    "q200_psi_drift" ->
      s"""WITH scored AS (
           SELECT lang,
             least(${EceBins - 1},
               (len(list_distinct(regexp_split_to_array(trim(text),
                   '\\s+'))) * $EceMass
                 // len(regexp_split_to_array(trim(text), '\\s+')))
               * $EceBins // $EceMass) AS bin
           FROM documents),
         cells AS (SELECT lang, bin, CAST(count(*) AS BIGINT) AS n_lb
                   FROM scored GROUP BY 1, 2),
         bylang AS (SELECT lang, CAST(sum(n_lb) AS BIGINT) AS n_l
                    FROM cells GROUP BY 1),
         bybin AS (SELECT bin, CAST(sum(n_lb) AS BIGINT) AS n_b
                   FROM cells GROUP BY 1),
         nall AS (SELECT CAST(sum(n_lb) AS BIGINT) AS n FROM cells),
         grid AS (SELECT l.lang, CAST(r.range AS BIGINT) AS bin
                  FROM (SELECT DISTINCT lang FROM cells) l
                  CROSS JOIN range(0, $EceBins) r),
         pq AS (
           SELECT g.lang, bl.n_l,
             CAST(coalesce(c.n_lb, 0) + 1 AS DOUBLE)
               / (bl.n_l + $EceBins) AS p,
             CAST(bb.n_b + 1 AS DOUBLE) / (nall.n + $EceBins) AS q
           FROM grid g
           LEFT JOIN cells c ON c.lang = g.lang AND c.bin = g.bin
           JOIN bylang bl ON bl.lang = g.lang
           JOIN bybin bb ON bb.bin = g.bin
           CROSS JOIN nall),
         terms AS (
           SELECT lang, n_l,
             (p - q) * CAST(CAST(ln(p / q) AS DECIMAL(20,9)) AS DOUBLE)
               AS term
           FROM pq),
         agg AS (
           SELECT lang, CAST(max(n_l) AS BIGINT) AS n_docs,
             CAST(sum(CAST(term AS DECIMAL(38,12))) AS DOUBLE) AS psi
           FROM terms GROUP BY 1)
         SELECT lang, n_docs, psi,
           CASE WHEN psi < $PsiModerate THEN 'stable'
                WHEN psi < $PsiShifted THEN 'moderate'
                ELSE 'shifted' END AS band
         FROM agg""",

    // q185: identical gates, HUGEINT mirrors the DECIMAL(38,0) route,
    // identical degenerate-denominator CASE.
    "q185_kappa" ->
      s"""WITH lab AS (
           SELECT source,
             CASE WHEN n_chars >= $KappaLenBar THEN 1 ELSE 0 END AS a,
             CASE WHEN len(list_distinct(regexp_split_to_array(trim(text),
                 '\\s+'))) * $EceMass
               >= len(regexp_split_to_array(trim(text), '\\s+'))
                 * $KappaDivPpm THEN 1 ELSE 0 END AS b
           FROM documents),
         m AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a) AS BIGINT) AS a1, CAST(sum(b) AS BIGINT) AS b1,
             CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree
           FROM lab GROUP BY 1)
         SELECT source, n, a1, b1, n_agree,
           CASE WHEN CAST(n AS HUGEINT) * n
               - (CAST(a1 AS HUGEINT) * b1
                  + CAST(n - a1 AS HUGEINT) * (n - b1)) = 0
           THEN CAST(0.0 AS DOUBLE)
           ELSE CAST(CAST(n AS HUGEINT) * n_agree
               - (CAST(a1 AS HUGEINT) * b1
                  + CAST(n - a1 AS HUGEINT) * (n - b1)) AS DOUBLE)
             / CAST(CAST(n AS HUGEINT) * n
               - (CAST(a1 AS HUGEINT) * b1
                  + CAST(n - a1 AS HUGEINT) * (n - b1)) AS DOUBLE)
           END AS kappa
         FROM m""",

    // q186: identical confidence mass, bins, exact gap masses.
    "q186_calibration" ->
      s"""WITH scored AS (
           SELECT len(list_distinct(regexp_split_to_array(trim(text),
               '\\s+'))) * $EceMass
               // len(regexp_split_to_array(trim(text), '\\s+'))
               AS conf_ppm,
             CASE WHEN n_chars >= $EceLenBar THEN 1 ELSE 0 END AS pos
           FROM documents),
         bins AS (
           SELECT least(${EceBins - 1}, conf_ppm * $EceBins // $EceMass)
               AS bin,
             CAST(count(*) AS BIGINT) AS n_b,
             CAST(sum(conf_ppm) AS BIGINT) AS sum_conf,
             CAST(sum(pos) AS BIGINT) AS n_pos
           FROM scored GROUP BY 1),
         tot AS (
           SELECT CAST(sum(n_b) AS BIGINT) AS n,
             CAST(sum(abs(sum_conf - n_pos * $EceMass)) AS BIGINT)
               AS gap_total
           FROM bins)
         SELECT bin, n_b,
           sum_conf // n_b AS avg_conf_ppm,
           n_pos * $EceMass // n_b AS acc_ppm,
           abs(sum_conf - n_pos * $EceMass) AS gap_mass,
           tot.gap_total // tot.n AS ece_ppm
         FROM bins CROSS JOIN tot""",

    // q241: identical bins; segment means are the same single IEEE
    // divisions of exact integer sums, and the minimax (max over j of
    // min over k) is order-free over bit-identical doubles.
    "q241_isotonic" ->
      s"""WITH scored AS (
           SELECT len(list_distinct(regexp_split_to_array(trim(text),
               '\\s+'))) * $EceMass
               // len(regexp_split_to_array(trim(text), '\\s+'))
               AS conf_ppm,
             CASE WHEN n_chars >= $EceLenBar THEN 1 ELSE 0 END AS pos
           FROM documents),
         bins AS (
           SELECT least(${EceBins - 1}, conf_ppm * $EceBins // $EceMass)
               AS bin,
             CAST(count(*) AS BIGINT) AS n_b,
             CAST(sum(pos) AS BIGINT) AS n_pos
           FROM scored GROUP BY 1),
         seg AS (
           SELECT j.bin AS j, k.bin AS k,
             CAST(sum(b.n_pos) AS DOUBLE) / CAST(sum(b.n_b) AS DOUBLE)
               AS seg_mean
           FROM bins j JOIN bins k ON j.bin <= k.bin
           JOIN bins b ON b.bin >= j.bin AND b.bin <= k.bin
           GROUP BY 1, 2),
         inner_min AS (
           SELECT i.bin AS i, s.j, min(s.seg_mean) AS mn
           FROM bins i JOIN seg s ON s.j <= i.bin AND s.k >= i.bin
           GROUP BY 1, 2),
         fitted AS (
           SELECT i, max(mn) AS acc_iso FROM inner_min GROUP BY 1)
         SELECT b.bin, b.n_b,
           CAST(b.n_pos AS DOUBLE) / CAST(b.n_b AS DOUBLE) AS acc_raw,
           f.acc_iso
         FROM bins b JOIN fitted f ON f.i = b.bin""",

    // q187: identical contingency, HUGEINT-routed subproducts, the
    // same (chi2 DESC, token ASC) total order and per-source cut.
    "q187_chi2_tokens" ->
      s"""WITH dt AS (
           SELECT DISTINCT source, doc_id,
             unnest(list_distinct(regexp_split_to_array(trim(text),
               '\\s+'))) AS token
           FROM documents),
         bys AS (SELECT source, token, CAST(count(*) AS BIGINT) AS a
                 FROM dt GROUP BY 1, 2),
         dft AS (SELECT token, CAST(sum(a) AS BIGINT) AS df
                 FROM bys GROUP BY 1),
         ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
                FROM documents GROUP BY 1),
         nall AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         scored AS (
           SELECT b.source, b.token, b.a, d.df,
             CAST(CAST(nall.n AS HUGEINT) * adbc.v * adbc.v AS DOUBLE)
               / CAST(CAST(s.n_s AS HUGEINT) * (nall.n - s.n_s) * d.df
                 * (nall.n - d.df) AS DOUBLE) AS chi2
           FROM bys b
           JOIN dft d USING (token)
           JOIN ns s USING (source)
           CROSS JOIN nall,
           LATERAL (SELECT CAST(b.a AS HUGEINT)
               * (nall.n - s.n_s - d.df + b.a)
             - CAST(s.n_s - b.a AS HUGEINT) * (d.df - b.a) AS v) adbc
           WHERE d.df >= $Chi2MinDf AND b.a >= $Chi2MinA
             AND adbc.v > 0),
         ranked AS (
           SELECT source, token, a, df, chi2,
             row_number() OVER (PARTITION BY source
               ORDER BY chi2 DESC, token ASC) AS rn
           FROM scored)
         SELECT source, token, a AS df_in_source, df AS df_corpus,
           chi2, CAST(rn AS BIGINT) AS rn
         FROM ranked WHERE rn <= $Chi2TopK""",

    // q168: the identical tf / count-of-counts / r+1 self-join /
    // floor-mass chain — integers end-to-end, one IEEE division.
    "q168_good_turing" ->
      s"""WITH ts AS (
           SELECT regexp_split_to_array(trim(text), '\\s+') AS ts
           FROM documents),
         tok AS (
           SELECT unnest(list_transform(range(1, len(ts)),
             i -> ts[i] || ' ' || ts[i + 1])) AS tok
           FROM ts WHERE len(ts) >= 2),
         tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS r
                FROM tok GROUP BY 1),
         nr AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r
                FROM tf GROUP BY 1),
         tot AS (
           SELECT CAST(sum(r * n_r) AS BIGINT) AS t_tokens,
             CAST(max(CASE WHEN r = 1 THEN n_r END) AS BIGINT) AS n1
           FROM nr)
         SELECT a.r, a.n_r,
           CAST((a.r + 1) * coalesce(b.n_r, 0) * $GtMass // a.n_r
             AS BIGINT) AS rstar_mass,
           tot.t_tokens,
           CAST(coalesce(tot.n1, 0) AS DOUBLE) / tot.t_tokens AS p0
         FROM nr a
         LEFT JOIN nr b ON b.r = a.r + 1
         CROSS JOIN tot""",

    // Exact string-keyed recomputation — a Spark-side xxhash64
    // collision between distinct tokens would desync n_rare/n_hapax
    // and fail the hash compare, so the oracle doubles as the
    // collision check (q53 doctrine).
    "q85_rare_token_quality" ->
      s"""WITH tok AS (
           SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
           FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
         ctf AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS ctf
                 FROM tf GROUP BY 1)
         SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN ctf <= $RareCutoff THEN tf ELSE 0 END)
             AS BIGINT) AS n_rare,
           CAST(sum(CASE WHEN ctf = 1 THEN tf ELSE 0 END) AS BIGINT)
             AS n_hapax,
           CAST(sum(CASE WHEN ctf <= $RareCutoff THEN tf ELSE 0 END)
             AS DOUBLE) / CAST(sum(tf) AS BIGINT) AS rare_frac
         FROM tf JOIN ctf USING (tok) GROUP BY 1""",

    // Exact string-keyed recomputation of q94 — parallel unnests zip
    // positionally in DuckDB, giving the (w1, w2) stream the Spark
    // side builds with slice+arrays_zip. Joining by the raw strings
    // while Spark joins by xxhash64(w1,w2)/xxhash64(w1) makes this
    // oracle the collision check for both hashed key spaces.
    "q94_bigram_fluency" ->
      s"""WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(trim(text), '\\s+') AS ts
           FROM documents),
         bi AS (
           SELECT doc_id,
             unnest(ts[1:len(ts)-1]) AS w1,
             unnest(ts[2:len(ts)]) AS w2
           FROM t WHERE len(ts) >= 2),
         tf AS (SELECT doc_id, w1, w2, count(*) AS tf
                FROM bi GROUP BY 1, 2, 3),
         cbg AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c12
                 FROM tf GROUP BY 1, 2),
         cu AS (SELECT w1, CAST(sum(tf) AS BIGINT) AS c1
                FROM tf GROUP BY 1)
         SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_bigrams,
           CAST(sum(CASE WHEN c12 * $FluentDen >= c1 THEN tf ELSE 0 END)
             AS BIGINT) AS n_fluent,
           CAST(sum(CASE WHEN c12 = 1 THEN tf ELSE 0 END) AS BIGINT)
             AS n_hapax_bi,
           CAST(sum(CASE WHEN c12 * $FluentDen >= c1 THEN tf ELSE 0 END)
             AS DOUBLE) / CAST(sum(tf) AS BIGINT) AS fluent_frac
         FROM tf JOIN cbg USING (w1, w2) JOIN cu USING (w1)
         GROUP BY 1""",

    // Exact string-keyed PMI replay — same parallel-unnest bigram
    // stream, same gate, and the IDENTICAL left-associated factor
    // chain, so the double scores (and thus the top-k cut) agree bit
    // for bit; string keys make it the xxhash collision check
    "q149_collocations" ->
      s"""WITH t AS (
           SELECT regexp_split_to_array(trim(text), '\\s+') AS ts
           FROM documents),
         bi AS (
           SELECT unnest(ts[1:len(ts)-1]) AS w1,
                  unnest(ts[2:len(ts)]) AS w2
           FROM t WHERE len(ts) >= 2),
         big AS (SELECT w1, w2, count(*) AS c_xy FROM bi GROUP BY 1, 2),
         uni AS (
           SELECT w, count(*) AS c FROM (SELECT unnest(ts) AS w FROM t)
           GROUP BY 1),
         tot AS (
           SELECT (SELECT CAST(sum(c_xy) AS BIGINT) FROM big) AS n_bigrams,
                  (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS t_toks)
         SELECT b.w1, b.w2, CAST(b.c_xy AS BIGINT) AS c_xy,
           CAST(u1.c AS BIGINT) AS c_x, CAST(u2.c AS BIGINT) AS c_y,
           t.t_toks, t.n_bigrams,
           CAST(b.c_xy AS DOUBLE) * t.t_toks / t.n_bigrams * t.t_toks
             / u1.c / u2.c AS score
         FROM big b
         JOIN uni u1 ON b.w1 = u1.w
         JOIN uni u2 ON b.w2 = u2.w
         CROSS JOIN tot t
         WHERE b.c_xy >= $CollocMinCount
         ORDER BY score DESC, b.w1 ASC, b.w2 ASC
         LIMIT $CollocTopK""",

    "q152_textrank" -> textRankOracle,

    // Exact string-keyed recomputation of q142 — the q94 oracle plus
    // the three continuation-count tables, band and backoff tests as
    // the same integer cross-multiplies. Joining by raw strings while
    // Spark joins by xxhash64(gh/uh/vh) makes this the collision check
    // for all three hashed key spaces.
    "q142_kn_fluency" ->
      s"""WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(trim(text), '\\s+') AS ts
           FROM documents),
         bi AS (
           SELECT doc_id,
             unnest(ts[1:len(ts)-1]) AS w1,
             unnest(ts[2:len(ts)]) AS w2
           FROM t WHERE len(ts) >= 2),
         tf AS (SELECT doc_id, w1, w2, count(*) AS tf
                FROM bi GROUP BY 1, 2, 3),
         cbg AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c12
                 FROM tf GROUP BY 1, 2),
         cu AS (SELECT w1, CAST(sum(tf) AS BIGINT) AS c1
                FROM tf GROUP BY 1),
         ty AS (SELECT DISTINCT w1, w2 FROM tf),
         fert AS (SELECT w1, CAST(count(*) AS BIGINT) AS n1w1
                  FROM ty GROUP BY 1),
         cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS ncw2
                  FROM ty GROUP BY 1),
         nct AS (SELECT CAST(count(*) AS BIGINT) AS nctot FROM ty)
         SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_bigrams,
           CAST(sum(CASE WHEN $KnFluentDen *
                 (($KnDiscDen * c12 - $KnDiscNum) * nctot
                   + $KnDiscNum * n1w1 * ncw2)
                 >= $KnDiscDen * c1 * nctot THEN tf ELSE 0 END)
             AS BIGINT) AS n_kn_fluent,
           CAST(sum(CASE WHEN $KnDiscNum * n1w1 * ncw2 >
                 ($KnDiscDen * c12 - $KnDiscNum) * nctot
                 THEN tf ELSE 0 END) AS BIGINT) AS n_backoff_heavy,
           CAST(sum(CASE WHEN $KnFluentDen *
                 (($KnDiscDen * c12 - $KnDiscNum) * nctot
                   + $KnDiscNum * n1w1 * ncw2)
                 >= $KnDiscDen * c1 * nctot THEN tf ELSE 0 END)
             AS DOUBLE) / CAST(sum(tf) AS BIGINT) AS kn_frac
         FROM tf JOIN cbg USING (w1, w2) JOIN cu USING (w1)
                 JOIN fert USING (w1) JOIN cont USING (w2)
                 CROSS JOIN nct
         GROUP BY 1""",

    // q143: the q119 top-bigram CTEs + the q85 rarity CTEs re-derived
    // string-keyed, then the same integer-cross-multiply gates and
    // first-fail charge — one more collision check over both signal
    // pipelines' hash key spaces, now composed.
    "q143_filter_cascade" ->
      s"""WITH t AS (
           SELECT doc_id, lang,
             regexp_split_to_array(trim(text), '\\s+') AS ts
           FROM documents),
         tokc AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(length(tok)) AS BIGINT) AS tok_chars
           FROM (SELECT doc_id, unnest(ts) AS tok FROM t) GROUP BY 1),
         bg AS (
           SELECT doc_id, g, CAST(length(g) - 1 AS BIGINT) AS cl,
             CAST(count(*) AS BIGINT) AS cnt
           FROM (SELECT doc_id, unnest(list_transform(range(1, len(ts)),
                   i -> ts[i] || ' ' || ts[i+1])) AS g
                 FROM t WHERE len(ts) >= 2)
           GROUP BY 1, 2, 3),
         top AS (SELECT doc_id, CAST(max(cnt) AS BIGINT) AS top2_cnt
                 FROM bg GROUP BY 1),
         topc AS (
           SELECT b.doc_id,
             CAST(top.top2_cnt * max(b.cl) AS BIGINT) AS top2_chars
           FROM bg b JOIN top USING (doc_id)
           WHERE b.cnt = top.top2_cnt
           GROUP BY 1, top.top2_cnt),
         tf AS (
           SELECT doc_id, tok, count(*) AS tf
           FROM (SELECT doc_id, unnest(ts) AS tok FROM t) GROUP BY 1, 2),
         ctf AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS ctf
                 FROM tf GROUP BY 1),
         rare AS (
           SELECT doc_id,
             CAST(sum(CASE WHEN ctf <= $RareCutoff THEN tf ELSE 0 END)
               AS BIGINT) AS n_rare
           FROM tf JOIN ctf USING (tok) GROUP BY 1),
         f AS (
           SELECT d.doc_id, d.lang,
             CASE WHEN d.lang = '$TargetLang' THEN 1 ELSE 0 END AS p1,
             CASE WHEN tokc.n_tokens >= $FcMinTokens THEN 1 ELSE 0 END AS p2,
             CASE WHEN coalesce(topc.top2_chars, 0) * $FcTop2Den
                  <= tokc.tok_chars THEN 1 ELSE 0 END AS p3,
             CASE WHEN rare.n_rare * $FcRareDen <= tokc.n_tokens
                  THEN 1 ELSE 0 END AS p4
           FROM (SELECT doc_id, lang FROM documents) d
           JOIN tokc USING (doc_id)
           LEFT JOIN topc USING (doc_id)
           JOIN rare USING (doc_id))
         SELECT doc_id, lang,
           CAST(p1 AS BIGINT) AS pass_lang, CAST(p2 AS BIGINT) AS pass_len,
           CAST(p3 AS BIGINT) AS pass_rep, CAST(p4 AS BIGINT) AS pass_rare,
           CAST(CASE WHEN p1 = 0 THEN 1 WHEN p2 = 0 THEN 2
                     WHEN p3 = 0 THEN 3 WHEN p4 = 0 THEN 4
                     ELSE 0 END AS BIGINT) AS first_fail,
           CAST(CASE WHEN p1 = 1 AND p2 = 1 AND p3 = 1 AND p4 = 1
                     THEN 1 ELSE 0 END AS BIGINT) AS keep
         FROM f""",

    // Exact string-keyed recomputation of q109 — same trigram builder
    // as the q63 oracle; joining by raw trigram strings while Spark
    // joins by xxhash64 makes this the collision check for the
    // trigram-hash key space.
    "q109_novelty" ->
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts
           FROM documents),
         g AS (
           SELECT doc_id, unnest(list_distinct(
             list_transform(range(1, len(ts) - 1),
               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS g
           FROM t WHERE len(ts) >= 3),
         f AS (SELECT g, min(doc_id) AS first_doc FROM g GROUP BY 1)
         SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_trigrams,
           CAST(sum(CASE WHEN first_doc = g.doc_id THEN 1 ELSE 0 END)
             AS BIGINT) AS n_novel,
           CAST(sum(CASE WHEN first_doc = g.doc_id THEN 1 ELSE 0 END)
             AS DOUBLE) / CAST(count(*) AS BIGINT) AS novel_frac
         FROM g JOIN f USING (g) GROUP BY 1""",

    // Exact string-keyed recomputation of q119 — grouping by raw
    // n-gram strings while Spark groups by xxhash64 makes this the
    // collision check for both (bigram, 5-gram) hashed key spaces.
    // The tie-break equivalence: Spark's max(struct(cnt, cl)) =
    // (max cnt, max cl among max-cnt rows), mirrored here as
    // top2_cnt * max(cl) FILTER (cnt = top2_cnt).
    "q119_repetition" ->
      s"""WITH t AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
           FROM documents),
         tokc AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(length(tok)) AS BIGINT) AS tok_chars
           FROM (SELECT doc_id, unnest(ts) AS tok FROM t) GROUP BY 1),
         bg AS (
           SELECT doc_id, g, CAST(length(g) - 1 AS BIGINT) AS cl,
             CAST(count(*) AS BIGINT) AS cnt
           FROM (SELECT doc_id, unnest(list_transform(range(1, len(ts)),
                   i -> ts[i] || ' ' || ts[i+1])) AS g
                 FROM t WHERE len(ts) >= 2)
           GROUP BY 1, 2, 3),
         top AS (
           SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
             CAST(max(cnt) AS BIGINT) AS top2_cnt
           FROM bg GROUP BY 1),
         topc AS (
           SELECT b.doc_id,
             CAST(top.top2_cnt * max(b.cl) AS BIGINT) AS top2_chars
           FROM bg b JOIN top USING (doc_id)
           WHERE b.cnt = top.top2_cnt
           GROUP BY 1, top.top2_cnt),
         g5 AS (
           SELECT doc_id, g, CAST(length(g) - ${DupN - 1} AS BIGINT) AS cl,
             CAST(count(*) AS BIGINT) AS cnt
           FROM (SELECT doc_id, unnest(list_transform(
                   range(1, len(ts) - ${DupN - 2}),
                   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                     || ' ' || ts[i+3] || ' ' || ts[i+4])) AS g
                 FROM t WHERE len(ts) >= $DupN)
           GROUP BY 1, 2, 3),
         d5 AS (
           SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_5grams,
             CAST(sum(CASE WHEN cnt >= 2 THEN cnt * cl ELSE 0 END)
               AS BIGINT) AS dup5_chars
           FROM g5 GROUP BY 1)
         SELECT tokc.doc_id, n_tokens, tok_chars,
           coalesce(n_bigrams, 0) AS n_bigrams,
           coalesce(top2_cnt, 0) AS top2_cnt,
           coalesce(top2_chars, 0) AS top2_chars,
           coalesce(n_5grams, 0) AS n_5grams,
           coalesce(dup5_chars, 0) AS dup5_chars,
           CAST(coalesce(top2_chars, 0) AS DOUBLE) / tok_chars
             AS top2_frac,
           CAST(coalesce(dup5_chars, 0) AS DOUBLE) / tok_chars
             AS dup5_frac
         FROM tokc
         LEFT JOIN top USING (doc_id)
         LEFT JOIN topc USING (doc_id)
         LEFT JOIN d5 USING (doc_id)""",

    // Full relational recomputation: same md5 buckets (instr hex
    // decode = Spark's conv(substr(md5,1,3),16,10)), same add-one
    // smoothing, same (double * BIGINT) / (double * BIGINT) final
    // expression.
    "q86_dsir_weights" ->
      s"""WITH t AS (
           SELECT doc_id, lang,
             regexp_split_to_array(trim(text), '\\s+') AS ts
           FROM documents),
         bi AS (
           SELECT doc_id, lang,
             unnest(list_transform(range(1, len(ts)),
               i -> ts[i] || ' ' || ts[i+1])) AS g
           FROM t WHERE len(ts) >= 2),
         feat AS (
           SELECT doc_id, lang,
             (instr('0123456789abcdef', substr(md5(g), 1, 1)) - 1) * 256
           + (instr('0123456789abcdef', substr(md5(g), 2, 1)) - 1) * 16
           + (instr('0123456789abcdef', substr(md5(g), 3, 1)) - 1) AS f
           FROM bi),
         cf AS (SELECT doc_id, lang, f, count(*) AS c
                FROM feat GROUP BY 1, 2, 3),
         src AS (SELECT f, CAST(sum(c) AS BIGINT) AS sc FROM cf GROUP BY 1),
         tgt AS (SELECT f, CAST(sum(c) AS BIGINT) AS tc
                 FROM cf WHERE lang = '$TargetLang' GROUP BY 1),
         prof AS (
           SELECT src.f AS f, coalesce(tc, 0) + 1 AS tc1, sc + 1 AS sc1
           FROM src LEFT JOIN tgt ON src.f = tgt.f),
         tot AS (
           SELECT
             CAST(sum(CASE WHEN lang = '$TargetLang' THEN c ELSE 0 END)
               + $NBuckets AS BIGINT) AS tt,
             CAST(sum(c) + $NBuckets AS BIGINT) AS st
           FROM cf),
         mass AS (
           SELECT cf.doc_id, cf.lang,
             CAST(sum(c) AS BIGINT) AS n_bigrams,
             CAST(sum(c * tc1) AS BIGINT) AS t_mass,
             CAST(sum(c * sc1) AS BIGINT) AS s_mass
           FROM cf JOIN prof USING (f) GROUP BY 1, 2)
         SELECT doc_id, lang, n_bigrams, t_mass, s_mass,
           (CAST(t_mass AS DOUBLE) * st) / (CAST(s_mass AS DOUBLE) * tt)
             AS affinity
         FROM mass CROSS JOIN tot""")
}
