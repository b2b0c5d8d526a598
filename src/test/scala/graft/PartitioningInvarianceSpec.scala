package graft

/** Multi-executor proxy gate (the closest local[4] gets to a 1000-node
  * shuffle): every hash-compared query must produce IDENTICAL rows under
  * different `spark.sql.shuffle.partitions` — i.e., under different
  * physical groupings, reducer counts, and aggregation orders. Anything
  * order-dependent (a raw double sum, a non-total ordering before a
  * row_number, an iteration whose state depends on partition layout)
  * fails here before it fails as a flaky oracle on a real cluster.
  * Queries chosen: the decimal-sum family, the iterative operators
  * (k-means, BPE), the join-heavy dedup path, and window/session stats.
  */
class PartitioningInvarianceSpec extends SparkTestBase {

  private val names = Seq(
    "q01_pricing_summary",  // decimal-routed sums
    "q53_ngram_neardup",    // prefix-filter join over hashed shingles
    "q55_tfidf_terms",      // rational idf + windowed argmax
    "q60_session_stats",    // ordered windows, order-dependent payload
    "q64_bm25",             // shared-shuffle tf/df + float chain
    "q65_kmeans",           // ITERATIVE: 2 Lloyd rounds of float means
    "q67_vocab_coverage",   // TakeOrdered top-k + bounded rank self-join
    "q70_bpe_merges",       // ITERATIVE: per-round global argmax
    "q83_budget_select",    // histogram threshold + ScanSum boundary prefix
    "q85_rare_token_quality", // hashed-key corpus counts + ratio
    "q86_dsir_weights",     // broadcast profile masses + one division
    "q87_bpe_encode",       // learned merges folded over the vocab stage
    "q88_dup_spans",        // hashed gram counts + islands window
    "q89_semdedup",         // cluster-bucketed pair scan + keep-first rule
    "q91_image_resize",     // per-row decode + integer grid-cell sums
    "q94_bigram_fluency",   // two hashed corpus-count joins + one ratio
    "q95_pq_codes",         // ITERATIVE: PqM×2 Lloyd rounds + ADC top-k
    "q96_ivf_pq",           // cell-pruned candidates + compressed rescore rank
    "q97_ivf_pq_residual",  // + residual coding under the coarse grid
    "q98_sq8_ann",          // per-dim grid coding + ADC top-k cut
    "q99_hybrid_retrieval", // two-leg pools + decimal BM25 sums + RRF rank
    "q100_hamming_ann",     // integer XOR/popcount two-phase rank
    "q101_feature_hash",    // hashed-dim integer sums + map-lookup dense + cut
    "q102_binary_rerank",   // integer pool cut + broadcast float rerank
    "q103_chunking",        // within-row slicer (no shuffle to vary, cheap pin)
    "q104_knn_graph",       // cell self-join + per-src rank window
    "q105_pagerank",        // ITERATIVE: integer-mass joins + dangling scalar
    "q108_mmr_diverse",     // greedy unroll over the bounded pool
    "q109_novelty",         // hashed first-container agg + ratio
    "q110_label_prop",      // ITERATIVE: integer voting rounds + clamp
    "q111_chunk_dedup",     // md5 chunk keys + first-occurrence rule
    "q112_funnel",          // chained user-keyed mins, integer micros
    "q113_retention",       // integer day cohort matrix
    "q114_semantic_clusters", // thresholded edges + star-contraction CC
    "q116_nn_descent",      // ITERATIVE: bounded NoN candidates + rank
    "q119_repetition",      // per-doc hashed n-gram aggs + max(struct) tiebreak
    "q120_graph_greedy",    // ITERATIVE: beam expand/score/cut over the graph
    "q121_contrastive_mine", // staged cell pairs + two per-src rank cuts
    "q122_triangles",        // wedge join + closing semi-join, all integers
    "q123_containment",      // probe-prefix index join + exact rescore
    "q124_anomaly",          // trailing-frame integer z-test per user
    "q125_temperature_mix",  // derived integer thresholds + bucket counts
    "q126_phrase_search",    // positional-index chained joins + TakeOrdered cut
    "q127_source_similarity", // token-keyed profile self-join, integer algebra
    "q128_winnowing",        // zero-shuffle selection + df-gated pair join
    "q129_kcore",            // ITERATIVE: degree agg + semi-join peel rounds
    "q130_matryoshka",       // two GroupedTopK stages over staged cosines
    "q132_source_overlap",   // md5 chunk keys + source-pair self-join
    "q133_cluster_labels",   // CC labels + tf-idf rank per cluster
    "q134_bloom_decontam",   // md5-slice bit sets + k-of-k membership
    "q135_cms_heavy",        // integer counter mins + TakeOrdered cut
    "q136_priority_sample",  // exact-division priorities + two-phase rank
    "q137_zipf_fit",         // TakeOrdered survivors + DECIMAL-routed moments
    "q138_cluster_quality",  // Lloyd model + decimal-routed metric means
    "q139_dedup_eval",       // band join vs inverted-index truth counts
    "q141_ann_recall",       // three total-order rank cuts + hit joins
    "q142_kn_fluency",       // integer cross-multiplied KN band
    "q143_filter_cascade",   // composed integer gates over two signals
    "q144_scd2",             // lag-compress + lead-stitch under a total order
    "q145_hll_distinct",     // md5 registers, integer harmonic sum, one division
    "q147_hist_quantiles",   // fixed bins + integer cross-multiply quantile pick
    "q148_audio_vad",        // per-window integer energies + integer gate
    "q149_collocations",     // hashed counts + fixed-chain PMI + TakeOrdered
    "q150_ivf_two_level",    // stride sub-cells + two argmax ranks + rescore
    "q151_assoc_rules",      // basket pair counts + integer support gate
    "q152_textrank",         // hashed word graph + integer-mass PageRank
    "q154_kmv_overlap",      // per-source k-min cut + pair merge re-cut
    "q155_shot_detect",      // per-asset lag gate + run segmentation
    "q156_hits",             // integer-mass half-rounds + floor renorm
    "q157_label_noise",      // integer votes + total-order argmax
    "q158_random_walks",     // md5 draw + struct-min argmin per hop
    "q159_ams_f2",           // signed integer sums + decimal squares
    "q160_kcenter",          // global struct-argmax + exact-cos dmin
    "q161_markov",           // user-keyed lead + integer floor mass
    "q162_cusum",            // prefix-dev windows + squared integer bar
    "q164_key_skew",         // log-bin histogram + broadcast scalars
    "q165_zorder",           // bit-interleave grid + zone-map blocks
    "q166_ab_test",          // integer counts + decimal z² gate
    "q168_good_turing",      // count-of-counts + floor GT masses
    "q169_seq_patterns",     // basket min/max join + integer gate
    "q170_ann_ndcg",         // graded-hit joins + integer dcg masses
    "q171_recon_audit",      // three decodes + decimal-routed SSE sums
    "q173_media_gates",      // per-row exact gates over the decode stage
    "q174_k_anonymity",      // ladder of bounded group-size rollups
    "q175_attribution",      // user-keyed ignoreNulls frames + dsumR
    "q176_discretize",       // fixed grid + bounded cum + floor mass
    "q177_decayed_popularity", // integer power-of-two decay masses
    "q178_split_leakage",    // banded pairs + md5 split tagging
    "q179_link_prediction",  // wedge counts + anti join + total-order cut
    "q180_cluster_split",    // CC roots + md5 split + pair re-audit
    "q181_rfm",              // three histogram picks + bin quartiles
    "q182_burst_detect",     // event-time RANGE frame + integer bar
    "q183_benford",          // digit-string rollup + ppm constants
    "q184_mad_outliers",     // two histogram medians + MAD gate
    "q185_kappa",            // integer gates + decimal-routed chance
    "q186_calibration",      // integer masses + fixed bins
    "q187_chi2_tokens",      // decimal contingency + total-order cut
    "q188_seasonality",      // arithmetic dow grid + ppm gate
    "q189_burstiness",       // user-keyed lag + decimal CV² mass
    "q190_canonical_docs",   // CC labels + diversity argmax rank
    "q191_token_budget",     // ascending fill over the lang table
    "q192_set_cover",        // ITERATIVE: anti-join + argmax rounds
    "q194_media_dup_clusters", // banded Hamming pairs + CC rollup
    "q196_dedup_sweep",      // ppm ladder explode + distinct docs
    "q199_itemsets3",        // basket triple counts + semi-join prunes
    "q200_psi_drift",        // decimal-rounded ln terms + dsum
    "q201_discretizer_audit", // sample window + decimal error rollup
    "q203_dedup_yield",      // CC keep rule + source token ledger
    "q195_unpivot",          // melt explode + decimal rollup
    "q204_ewma_trend",       // decimal dot product + per-type lag window
    "q206_fuzzy_vocab",      // deletion-neighborhood join + distinct pairs
    "q207_stratified_sample", // remainder rank + per-source md5 rank
    "q208_winsor_stats",     // histogram percentiles + decimal means
    "q209_session_paths",    // session sort windows + global rank
    "q210_cumulative_distinct", // first-seen rollup + grid prefix sum
    "q212_hll_curve",        // register max rollup + grid prefix-max window
    "q213_gini_concentration", // per-source rank windows + decimal products
    "q214_jsd_matrix",       // shared-vocab grid + decimal-rounded ln terms
    "q215_grouping_sets",    // one-pass expand lattice + decimal rollup
    "q216_reconcile",        // full-outer presence classes + decimal ledger
    "q218_embedding_contrast", // systematic pair join + decimal cosine means
    "q219_ols_trend",        // grid sufficient stats, decimal closed form
    "q221_spearman",         // TWO chained ScanSum rank axes + decimal d2
    "q222_ks_audit",         // ScanSum prefix CDFs + decimal cross-multiply max
    "q223_exact_quantiles",  // histogram boundary + ScanSum selection
    "q224_acf",              // cleared-denominator lag join, decimal sums
    "q225_chao1",            // count-of-counts rollup, decimal product
    "q226_bloom_fpr",        // md5-slice bit table + anti-join negatives
    "q227_heaps_fit",        // first-seen stripes + ppb-ln OLS
    "q231_hll_rollup",       // register max through the lattice + division
    "q232_audio_zcr",        // integer gates + islands runs per asset
    "q233_nearest_asof",     // dual directional fills + integer argmin
    "q234_bootstrap_ci",     // md5 buckets + dsum moments + IEEE CI
    "q235_mwu_audit",        // ScanSum midranks + decimal rank-sum
    "q236_mann_kendall",     // broadcast-grid pair join, integer S/ties
    "q237_sen_slope",        // pair slopes + ScanSum median selection
    "q238_cuped",            // user rollup + decimal sufficient stats
    "q239_survival",         // two chained ScanSum passes + ppb ln terms
    "q241_isotonic",         // bounded bin joins + IEEE segment means
    "q242_seasonal_mk",      // stratum-keyed pair join, integer S/ties
    "q244_delta_ratio",      // user rollup + decimal sufficient stats
    "q246_digit_audit",      // digit grid + exact cleared numerator
    "q247_cramers_v",        // contingency margins + dsum cell terms
    "q248_quantile_norm",    // two ScanSum rank axes + ordinal join
    "q249_tolerant_asof",    // key-windowed fill + integer tolerance
    "q250_trending_tokens",  // half counts + total-order TakeOrdered
    "q252_churn_halflife",   // KM ScanSum chain + decimal OLS
    "q253_color_profile",    // real decode + argmax + zero-filled grid
    "q254_weighted_quantiles", // weighted histogram + ScanSum selection
    "q255_kruskal_wallis",   // pooled ScanSum midranks + dsum H terms
    "q256_cliffs_delta",     // ScanSum weekday prefix + decimal pair counts
    "q257_simpson_diversity", // decimal c(c-1) rollup + one division
    "q258_nelson_aalen",     // KM ScanSum chain + ppb DIV hazard prefix
    "q259_logrank",          // per-variant ScanSum risk sets + dsum E/V
    "q260_kendall_tau",      // broadcast-grid pair join, integer C/D/ties
    "q261_cohens_d",         // decimal sufficient stats + closed-form d
    "q265_seasonal_strength", // dow rollups + dsum terms + closed eta2
    "q266_runs_test",        // ScanSum median rank + adjacency equi-join
    "q267_char_entropy",     // class-mass rollup + ppb-ln division
    "q269_welch_t",          // decimal sufficient stats + Satterthwaite chain
    "q270_anova_f",          // per-type stats + dsum between-terms
    "q271_mcnemar",          // broadcast midpoint + discordant counts
    "q272_cox_stuart",       // grid half-offset pair join + sign counts
    "q273_turning_point",    // consecutive-day triple joins + extrema count
    "q274_wasserstein",      // ScanSum support/CDFs + decimal pair terms
    "q275_readability",      // HOF syllable aggregate + exact sums
    "q276_yule_k",           // decimal c^2 rollup + one division
    "q277_odds_ratio",       // 2x2 grid + lnR + log-scale CI
    "q278_gehan_wilcoxon",   // shared risk sets + decimal U + dsum var
    "q282_learned_filter",   // decimal GD gradients + sign-test apply
    "q283_sem_decontam",     // frozen cells + broadcast eval pair scan
    "q193_windowed_funnel")  // bounded min-chain, integer micros

  /** The highest-risk subset for the DEFAULT suite (r15, verdict ask
    * #2 — the full ~170-query double sweep ran ~4 minutes and was the
    * single largest block in the driver's expiring test budget): every
    * ITERATIVE operator (partition-layout-dependent state), every
    * ScanSum consumer (the two-pass scan is the order-sensitive
    * machinery), the keep-first / total-order-argmax rules, the
    * decimal-sum spine, and every query whose internals changed this
    * round. The FULL list still runs under the [[Slow]] tag (once per
    * round, quoted in OPTIMIZATION_r15.md). */
  private val core = Seq(
    "q01_pricing_summary", "q53_ngram_neardup", "q55_tfidf_terms",
    "q60_session_stats", "q64_bm25", "q65_kmeans", "q70_bpe_merges",
    "q83_budget_select", "q86_dsir_weights", "q87_bpe_encode",
    "q88_dup_spans", "q89_semdedup", "q95_pq_codes", "q99_hybrid_retrieval",
    "q100_hamming_ann", "q101_feature_hash", "q102_binary_rerank",
    "q105_pagerank", "q108_mmr_diverse", "q110_label_prop",
    "q111_chunk_dedup", "q116_nn_descent", "q120_graph_greedy",
    "q129_kcore", "q144_scd2", "q158_random_walks", "q160_kcenter",
    "q175_attribution", "q192_set_cover", "q207_stratified_sample",
    "q209_session_paths", "q221_spearman", "q222_ks_audit",
    "q223_exact_quantiles", "q235_mwu_audit", "q237_sen_slope",
    "q239_survival", "q248_quantile_norm", "q252_churn_halflife",
    "q254_weighted_quantiles", "q255_kruskal_wallis", "q258_nelson_aalen",
    "q266_runs_test", "q274_wasserstein")

  private def checkInvariance(qs: Seq[String]): Unit = {
    val key = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(key)
    def runAll(parts: Int): Map[String, Seq[String]] = {
      spark.conf.set(key, parts.toString)
      qs.map { n =>
        n -> SparkEntry.queries(n)(spark, sf).collect()
          .map(_.toString).sorted.toSeq
      }.toMap
    }
    try {
      val at3 = runAll(3)
      val at17 = runAll(17)
      qs.foreach { n =>
        assert(at3(n) == at17(n),
          s"$n differs between 3 and 17 shuffle partitions — " +
            "order-dependent computation would be nondeterministic at scale")
        assert(at3(n).nonEmpty, s"$n returned no rows; the check is vacuous")
      }
    } finally spark.conf.set(key, orig)
  }

  test("core query results are invariant to the shuffle partitioning") {
    assert(core.forall(names.contains), "core must be a subset of the full list")
    checkInvariance(core)
  }

  test("query results are invariant to the shuffle partitioning", Slow) {
    checkInvariance(names.filterNot(core.contains))
  }
}
