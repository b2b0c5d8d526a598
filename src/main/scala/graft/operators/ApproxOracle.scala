package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.OracleExport
import graft.Tables

/** Hard DuckDB oracles for the approximate family (q25 minhash, q26
  * simhash, q33 LSH ANN, q37 IVF ANN, q38 cosine near-dup) — the same
  * export pattern ChessOracle established for the chess path.
  *
  * The non-ANSI half of each operator is a PURE PER-ROW function
  * (minhash band keys, shingle hashes, token hashes, hyperplane
  * buckets, IVF cell ids): Verify exports those as parquet, and the
  * oracle SQL recomputes the RELATIONAL half — band/bucket/cell
  * self-joins, candidate distinct, exact Jaccard / Hamming-majority /
  * cosine rescore, ranking, summary — independently in DuckDB. The
  * rescore reads the `embeddings` table directly (list_cosine_similarity
  * is bit-identical to the native CosineSim loop — proven by q31/q34),
  * so the oracle never reads a Spark query RESULT, only per-row
  * signatures it joins and scores itself.
  */
object ApproxOracle {

  // Thresholds shared with the queries (TextQueries q25, VectorQueries
  // q38) — a drifted literal would silently break the oracle.
  val MinJaccard = 0.5
  val MinCos = 0.95

  /** Write every table the oracle SQL reads. Runs at Verify's sfDir so
    * exports and queries see the same corpus. */
  def export(spark: SparkSession, sfDir: String): Unit = {
    val docs = Tables.documents(spark, sfDir)
    OracleExport.write(MinHashLSH.bandsOf(docs), "minhash_bands")
    OracleExport.write(MinHashLSH.shingleHashes(docs), "minhash_shingles")
    // q26: the token-hash multiset each signature majority-votes over
    OracleExport.write(
      docs.select(col("doc_id"),
        explode(transform(array_distinct(split(trim(col("text")), "\\s+")),
          t => xxhash64(t))).as("th")),
      "simhash_tokens")
    // q101: per-OCCURRENCE token hashes (no distinct — the hashing
    // trick weights by tf); DuckDB recomputes tf, mod/sign, the dense
    // grid and the cosine cut from these
    OracleExport.write(
      docs.select(col("doc_id"),
        explode(transform(split(trim(col("text")), "\\s+"),
          t => xxhash64(t))).as("th")),
      "hashed_tokens")

    // q77/q78: the per-asset REAL-decode rows (pure per-row codec calls
    // — javax.imageio / javax.sound.sampled), from which DuckDB redoes
    // the modality rollup and the unfiltered all-pairs Hamming join
    OracleExport.write(
      Multimodal.decodeMedia(Multimodal.realAssets(docs.select("doc_id"))).toDF(),
      "media_features")
    // q82: the per-FRAME video decode rows (real multi-frame GIF reads)
    // — generate only the video slice, like q82 itself (no PNG/WAV
    // encode for rows videoFrames immediately drops)
    OracleExport.write(
      Multimodal.videoFrames(Multimodal.realAssets(
        docs.select("doc_id").filter(col("doc_id") % 3 === 2))).toDF(),
      "video_frames")
    // q155: the per-frame aHashes of the shot-structured GIFs (pure
    // per-row generate+decode) — DuckDB re-segments them relationally
    OracleExport.write(
      Multimodal.shotFrames(docs.select("doc_id")).toDF(), "shot_frames")
    // q91: the per-cell areal-resize rows (pure per-row decode +
    // integer grid sums) — DuckDB redoes the corpus-mean-image rollup
    OracleExport.write(
      Multimodal.resizedCells(Multimodal.realAssets(
        docs.select("doc_id").filter(col("doc_id") % 3 === 0))).toDF(),
      "resized_cells")
    // q253: the per-asset RGB-octant pixel counts (pure per-row real
    // PNG decode) — DuckDB redoes the dominant-bucket argmax and the
    // corpus color rollup
    OracleExport.write(
      Multimodal.colorCells(Multimodal.realAssets(
        docs.select("doc_id").filter(col("doc_id") % 3 === 0))).toDF(),
      "color_cells")
    // q148: the per-window audio energies (pure per-row codec calls —
    // burst-WAV encode + RIFF decode both executor-side); DuckDB redoes
    // the integer VAD gate and the per-asset rollup
    OracleExport.write(
      Multimodal.audioWindows(docs.select("doc_id")).toDF(),
      "audio_windows")
    // q232: the per-window (energy, zero-crossing) pairs — DuckDB
    // redoes the voiced/unvoiced gates, rollup and run segmentation
    OracleExport.write(
      Multimodal.audioZWindows(docs.select("doc_id")).toDF(),
      "audio_zcr")

    // q106: the aggregated PCA moments — the export cut after which
    // both engines run identical sequential arithmetic (Pca.scala's
    // determinism contract). The moments are an AGGREGATE, not a
    // per-row function, which is exactly why they are the export:
    // everything after them (the whole eigensolve) is replayed.
    {
      import spark.implicits._
      val pm = Pca.model(spark, sfDir)
      OracleExport.write(
        (for { i <- pm.gram.indices; j <- pm.gram.indices }
          yield (i, j, pm.gram(i)(j))).toDF("i", "j", "g"), "pca_gram")
      OracleExport.write(
        pm.mean.zipWithIndex.map { case (m, p) => (p, m) }.toSeq
          .toDF("pos", "m"), "pca_mean")
    }

    val e = VectorQueries.emb(spark, sfDir)
    OracleExport.write(
      VectorQueries.lshBucketed(e, VectorQueries.AnnTables, VectorQueries.AnnBits)
        .select(col("vec_id"), col("t"), col("bucket")),
      "lsh_buckets")
    val n = e.count()
    val (ndTables, ndBits) = VectorQueries.lshParams(n, MinCos)
    OracleExport.write(
      VectorQueries.lshBucketed(e, ndTables, ndBits)
        .select(col("vec_id"), col("t"), col("bucket")),
      "neardup_buckets")
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("emb").as("pemb"))
    // corpus-derived grid, the same derivation q37/q96 run from the
    // same count — the adaptive geometry is itself oracle-checked
    val nlist = VectorQueries.ivfNList(n)
    OracleExport.write(
      IvfIndex.cellAssignments(e, nlist, Some(n)), "ivf_cells")
    OracleExport.write(
      IvfIndex.probeCells(e, probes, nlist,
        VectorQueries.ivfNProbe(nlist), Some(n)), "ivf_probe_cells")
    // q150: the FORCED two-level geometry (TwoLevelNList coarse cells —
    // small enough that every harness SF saturates them and the
    // sub-cell search path is REAL); coarse assignment and probe cells
    // are pure per-row kernel functions, so they export; everything
    // downstream (sub-centroid strides, sub-assignment argmax, probe
    // sub-ranks, candidates, rescore) is replayed relationally.
    val cents2 = IvfIndex.centroids(e, VectorQueries.TwoLevelNList, Some(n))
    OracleExport.write(IvfIndex.assignWith(e, cents2), "ivf2_cells")
    OracleExport.write(
      IvfIndex.probeCellsWith(probes, cents2, VectorQueries.TwoLevelNProbe),
      "ivf2_probe_cells")
    // q90: the streamed appendable index freezes centroids from the
    // FIRST of three vec_id slices (StreamingQueries.incIvfDir); the
    // assignment is a pure per-row function of (emb, frozen centroids),
    // so the export recomputes it batch-side — identical to the union
    // of the streamed epochs regardless of batch boundaries. The grid
    // derives from the BOOTSTRAP slice (all the stream knows at
    // freeze time), exactly as incIvfDir derives it.
    val w = n / 3 + 1
    val bootCents = IvfIndex.centroids(
      e.filter(col("vec_id") < w), VectorQueries.ivfNList(w))
    OracleExport.write(IvfIndex.assignWith(e, bootCents), "ivf_inc_cells")
    OracleExport.write(
      IvfIndex.probeCellsWith(probes, bootCents,
        VectorQueries.ivfNProbe(bootCents.length)),
      "ivf_inc_probe_cells")

    // q70: each BPE round's word-state, so DuckDB can recompute every
    // round's pair-count argmax independently of the Spark run. If
    // learning exhausts all pairs early, the remaining rounds export
    // EMPTY states: their oracle argmax then yields 0 rows, matching
    // the shorter Spark merge list instead of erroring on a missing
    // table.
    var exported = 0
    val vocab = BpeLearn.wordVocab(docs)
    BpeLearn.learn(spark, vocab, TextQueries.BpeMerges,
      (i, words) => { OracleExport.write(words, s"bpe_words_$i"); exported = i + 1 })
    val emptyWords = vocab.limit(0)
      .select(split(col("word"), "").as("syms"), col("n"))
    (exported until TextQueries.BpeMerges).foreach(i =>
      OracleExport.write(emptyWords, s"bpe_words_$i"))

    // q87: the encoded word vocabulary (word -> token count) — the
    // per-word sequential fold is the exported pure function; DuckDB
    // redoes the corpus (lang, word) counts, the vocab join (by the
    // EXACT word strings — the collision check for q87's xxhash64 join
    // keys), and the per-lang rollup.
    OracleExport.write(
      TextQueries.bpeEncodedStage(spark, sfDir).select("word", "n_tokens"),
      "bpe_encoded")
  }

  private def p(name: String) = OracleExport.p(name)

  /** Generated q70 oracle: one argmax per exported round, unioned. The
    * (cnt DESC, a, b) order is the same TOTAL order the operator's
    * global top-1 uses, so ties cannot diverge. */
  private def bpeOracle: String =
    (0 until TextQueries.BpeMerges).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS rank, a, b, cnt FROM (
           SELECT syms[j] AS a, syms[j+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
           FROM ${p(s"bpe_words_$i")},
                unnest(generate_series(1, len(syms)-1)) AS t(j)
           GROUP BY 1, 2
           ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)"""
    }.mkString(" UNION ALL ")

  /** Shared ANN tail: candidates -> exact cosine rescore from the
    * embeddings table -> per-probe rank -> top 5. */
  private def annRescore(candCte: String): String =
    s"""WITH cand AS ($candCte),
       scored AS (
         SELECT c.probe_id, c.vec_id,
           list_cosine_similarity(CAST(pe.embedding AS DOUBLE[]),
                                  CAST(e.embedding AS DOUBLE[])) AS sim
         FROM cand c
         JOIN embeddings pe ON pe.vec_id = c.probe_id
         JOIN embeddings e  ON e.vec_id  = c.vec_id)
       SELECT probe_id, vec_id AS neighbor_id, round(sim, 4) AS cos, rn
       FROM (SELECT probe_id, vec_id, sim,
               CAST(row_number() OVER (PARTITION BY probe_id
                 ORDER BY sim DESC, vec_id ASC) AS BIGINT) AS rn
             FROM scored)
       WHERE rn <= ${VectorQueries.AnnK}"""

  /** q141 helper: per-probe top-AnnK ids from a candidate CTE — the
    * annRescore rank with the same (sim DESC, vec_id) total order,
    * keeping only the answer-set ids. Expects an `eb` CTE
    * (vec_id, fv DOUBLE[]) in scope. */
  private def topKIds(candCte: String): String =
    s"""SELECT probe_id, vec_id FROM (
         SELECT c.probe_id, c.vec_id,
           row_number() OVER (PARTITION BY c.probe_id
             ORDER BY list_cosine_similarity(pe.fv, e.fv) DESC,
                      c.vec_id ASC) AS rn
         FROM ($candCte) c
         JOIN eb pe ON pe.vec_id = c.probe_id
         JOIN eb e  ON e.vec_id  = c.vec_id)
       WHERE rn <= ${VectorQueries.AnnK}"""

  /** q141 helper: one method's per-probe hit counts vs the truth CTE. */
  private def recallArm(method: String, ansCte: String): String =
    s"""SELECT '$method' AS method, t.probe_id,
         CAST(count(*) AS BIGINT) AS n_truth,
         CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_hit
       FROM truth t LEFT JOIN $ansCte a
         ON a.probe_id = t.probe_id AND a.vec_id = t.vec_id
       GROUP BY t.probe_id"""

  /** q170 helper: per-probe RANKED top-AnnK from a candidate CTE —
    * topKIds keeping the rank. Expects an `eb` CTE in scope. */
  private def topKRanked(candCte: String): String =
    s"""SELECT probe_id, vec_id, CAST(rn AS BIGINT) AS rn FROM (
         SELECT c.probe_id, c.vec_id,
           row_number() OVER (PARTITION BY c.probe_id
             ORDER BY list_cosine_similarity(pe.fv, e.fv) DESC,
                      c.vec_id ASC) AS rn
         FROM ($candCte) c
         JOIN eb pe ON pe.vec_id = c.probe_id
         JOIN eb e  ON e.vec_id  = c.vec_id)
       WHERE rn <= ${VectorQueries.AnnK}"""

  /** q170 helper: one arm's per-probe dcg-mass/hit rows. Expects
    * `truth` (probe_id, vec_id, rel) and `probes` in scope. */
  private def ndcgArm(method: String, ansCte: String): String =
    s"""SELECT '$method' AS method, p.probe_id,
         coalesce(h.n_hit, 0) AS n_hit,
         coalesce(h.dcg_mass, 0) AS dcg_mass
       FROM probes p LEFT JOIN (
         SELECT t.probe_id,
           CAST(count(*) AS BIGINT) AS n_hit,
           CAST(sum(t.rel * ${VectorQueries.NdcgMass} // a.rn)
             AS BIGINT) AS dcg_mass
         FROM truth t JOIN $ansCte a
           ON a.probe_id = t.probe_id AND a.vec_id = t.vec_id
         GROUP BY 1) h ON h.probe_id = p.probe_id"""

  val oracleSql: Map[String, String] = Map(
    "q70_bpe_merges" -> bpeOracle,

    // q170: NDCG@k of both arms vs the graded brute truth — the q141
    // machinery with ranks kept; rel·mass DIV position discounts as
    // exact integers, the two divisions at the very end.
    "q170_ann_ndcg" ->
      s"""WITH eb AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS fv
           FROM embeddings),
         truth AS (
           SELECT probe_id, vec_id,
             ${VectorQueries.AnnK} + 1 - rn AS rel FROM (
             SELECT pe.vec_id AS probe_id, e.vec_id,
               row_number() OVER (PARTITION BY pe.vec_id
                 ORDER BY list_cosine_similarity(pe.fv, e.fv) DESC,
                          e.vec_id ASC) AS rn
             FROM eb pe JOIN eb e
               ON pe.vec_id < 10 AND e.vec_id <> pe.vec_id)
           WHERE rn <= ${VectorQueries.AnnK}),
         probes AS (SELECT DISTINCT probe_id FROM truth),
         ivfk AS (${topKRanked(
            s"""SELECT DISTINCT pc.probe_id, a.vec_id
                FROM ${p("ivf_cells")} a JOIN ${p("ivf_probe_cells")} pc
                  ON a.cell = pc.cell
                WHERE a.vec_id <> pc.probe_id""")}),
         lshk AS (${topKRanked(
            s"""SELECT DISTINCT pb.vec_id AS probe_id, x.vec_id AS vec_id
                FROM ${p("lsh_buckets")} x JOIN ${p("lsh_buckets")} pb
                  ON x.t = pb.t AND x.bucket = pb.bucket
                WHERE pb.vec_id < 10 AND x.vec_id <> pb.vec_id""")}),
         arms AS (${ndcgArm("ivf", "ivfk")}
               UNION ALL
               ${ndcgArm("lsh", "lshk")}),
         summ AS (
           SELECT method, CAST(sum(dcg_mass) AS BIGINT) AS sum_dcg,
             CAST(count(*) AS BIGINT) AS n_probes
           FROM arms GROUP BY 1)
         SELECT a.method, a.probe_id,
           CAST(a.n_hit AS BIGINT) AS n_hit,
           CAST(a.dcg_mass AS BIGINT) AS dcg_mass,
           CAST(a.dcg_mass AS DOUBLE) / ${VectorQueries.NdcgIdealMass}
             AS ndcg,
           CAST(s.sum_dcg AS DOUBLE) /
             (s.n_probes * ${VectorQueries.NdcgIdealMass}) AS mean_ndcg
         FROM arms a JOIN summ s USING (method)""",

    // q141: recall@k of both approximate methods vs brute-force truth —
    // truth recomputed from the embeddings table (the q31 window), each
    // method's answer set from its exported signature tables (the
    // q33/q37 candidate joins + rescore), hit counts by pair-key left
    // join. Everything integer until the one final division.
    "q141_ann_recall" ->
      s"""WITH eb AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS fv
           FROM embeddings),
         truth AS (
           SELECT probe_id, vec_id FROM (
             SELECT pe.vec_id AS probe_id, e.vec_id,
               row_number() OVER (PARTITION BY pe.vec_id
                 ORDER BY list_cosine_similarity(pe.fv, e.fv) DESC,
                          e.vec_id ASC) AS rn
             FROM eb pe JOIN eb e
               ON pe.vec_id < 10 AND e.vec_id <> pe.vec_id)
           WHERE rn <= ${VectorQueries.AnnK}),
         ivfk AS (${topKIds(
            s"""SELECT DISTINCT pc.probe_id, a.vec_id
                FROM ${p("ivf_cells")} a JOIN ${p("ivf_probe_cells")} pc
                  ON a.cell = pc.cell
                WHERE a.vec_id <> pc.probe_id""")}),
         lshk AS (${topKIds(
            s"""SELECT DISTINCT pb.vec_id AS probe_id, x.vec_id AS vec_id
                FROM ${p("lsh_buckets")} x JOIN ${p("lsh_buckets")} pb
                  ON x.t = pb.t AND x.bucket = pb.bucket
                WHERE pb.vec_id < 10 AND x.vec_id <> pb.vec_id""")}),
         r AS (${recallArm("ivf", "ivfk")}
               UNION ALL
               ${recallArm("lsh", "lshk")})
         SELECT method, probe_id, n_truth, n_hit,
           CAST(n_hit AS DOUBLE) / n_truth AS recall
         FROM r""",

    "q87_bpe_encode" ->
      s"""WITH wc AS (
           SELECT lang,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
           FROM documents),
         wcc AS (SELECT lang, word, count(*) AS n FROM wc
                 WHERE length(word) > 0 GROUP BY 1, 2)
         SELECT lang,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n) AS BIGINT) AS word_occurrences,
           CAST(sum(n * n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n * length(word)) AS BIGINT) AS total_chars,
           CAST(sum(n * n_tokens) AS DOUBLE) / CAST(sum(n) AS BIGINT)
             AS tokens_per_word
         FROM wcc JOIN ${p("bpe_encoded")} USING (word)
         GROUP BY 1""",

    // q139: candidate-stage precision/recall of the band join vs exact
    // Jaccard ground truth, both restricted to the same md5-bucket
    // sample — the band join from minhash_bands, the truth from the
    // inverted-index self-join over minhash_shingles
    "q139_dedup_eval" ->
      s"""WITH samp AS (
           SELECT doc_id FROM documents
           WHERE (instr('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + instr('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1
               < ${TextQueries.DedupEvalBuckets}),
         sh AS (
           SELECT s.doc_id, s.sh
           FROM ${p("minhash_shingles")} s JOIN samp USING (doc_id)),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         ix AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ci
           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         truth AS (
           SELECT doc_a, doc_b
           FROM ix m JOIN sizes na ON na.doc_id = m.doc_a
                     JOIN sizes nb ON nb.doc_id = m.doc_b
           WHERE round(CAST(m.ci AS DOUBLE) / (na.n + nb.n - m.ci), 4)
                 >= $MinJaccard),
         bands AS (
           SELECT b.doc_id, b.band_idx, b.band_hash
           FROM ${p("minhash_bands")} b JOIN samp USING (doc_id)),
         cand AS (
           SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           FROM bands x JOIN bands y
             ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
            AND x.doc_id < y.doc_id),
         hit AS (
           SELECT c.doc_a FROM cand c
           JOIN truth t ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b),
         agg AS (
           SELECT (SELECT count(*) FROM truth) AS n_truth,
                  (SELECT count(*) FROM cand) AS n_cand,
                  (SELECT count(*) FROM hit) AS n_hit)
         SELECT CAST(n_truth AS BIGINT) AS n_truth,
           CAST(n_cand AS BIGINT) AS n_cand,
           CAST(n_hit AS BIGINT) AS n_hit,
           CASE WHEN n_cand > 0
                THEN CAST(n_hit AS DOUBLE) / n_cand ELSE 1.0 END AS cand_precision,
           CASE WHEN n_truth > 0
                THEN CAST(n_hit AS DOUBLE) / n_truth ELSE 1.0 END AS cand_recall
         FROM agg""",

    // band self-join -> distinct candidate pairs -> exact set Jaccard
    // from the shingle-hash table -> threshold -> summary
    "q25_minhash_pairs" ->
      s"""WITH cand AS (
           SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           FROM ${p("minhash_bands")} x JOIN ${p("minhash_bands")} y
             ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
            AND x.doc_id < y.doc_id),
         sizes AS (
           SELECT doc_id, count(*) AS n
           FROM ${p("minhash_shingles")} GROUP BY doc_id),
         common AS (
           SELECT c.doc_a, c.doc_b, count(sb.sh) AS ci
           FROM cand c
           JOIN ${p("minhash_shingles")} sa ON sa.doc_id = c.doc_a
           LEFT JOIN ${p("minhash_shingles")} sb
             ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
           GROUP BY 1, 2),
         jac AS (
           SELECT round(CAST(m.ci AS DOUBLE) / (na.n + nb.n - m.ci), 4) AS jaccard
           FROM common m JOIN sizes na ON na.doc_id = m.doc_a
                         JOIN sizes nb ON nb.doc_id = m.doc_b)
         SELECT CAST(count(*) AS BIGINT) AS n_near_dup_pairs,
           coalesce(round(avg(jaccard), 4), 0.0) AS avg_jaccard
         FROM jac WHERE jaccard >= $MinJaccard""",

    // q196: the q25 pair chain bucketed against the threshold ladder —
    // the exact ppm-integer compare, the same grid and base share.
    "q196_dedup_sweep" -> {
      val ladder = TextQueries.SweepThresholdsPpm.mkString(", ")
      s"""WITH cand AS (
           SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           FROM ${p("minhash_bands")} x JOIN ${p("minhash_bands")} y
             ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
            AND x.doc_id < y.doc_id),
         sizes AS (
           SELECT doc_id, count(*) AS n
           FROM ${p("minhash_shingles")} GROUP BY doc_id),
         common AS (
           SELECT c.doc_a, c.doc_b, count(sb.sh) AS ci
           FROM cand c
           JOIN ${p("minhash_shingles")} sa ON sa.doc_id = c.doc_a
           LEFT JOIN ${p("minhash_shingles")} sb
             ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
           GROUP BY 1, 2),
         pairs AS (
           SELECT m.doc_a, m.doc_b,
             CAST(round(round(CAST(m.ci AS DOUBLE) / (na.n + nb.n - m.ci),
               4) * ${TextQueries.CanonMass}) AS BIGINT) AS j_ppm
           FROM common m JOIN sizes na ON na.doc_id = m.doc_a
                         JOIN sizes nb ON nb.doc_id = m.doc_b
           WHERE round(CAST(m.ci AS DOUBLE) / (na.n + nb.n - m.ci), 4)
             >= $MinJaccard),
         thr AS (SELECT unnest([$ladder]) AS thr_ppm),
         cleared AS (
           SELECT t.thr_ppm, pr.doc_a, pr.doc_b
           FROM pairs pr JOIN thr t ON pr.j_ppm >= t.thr_ppm),
         np AS (SELECT thr_ppm, CAST(count(*) AS BIGINT) AS n_pairs
                FROM cleared GROUP BY 1),
         nd AS (SELECT thr_ppm, CAST(count(DISTINCT doc) AS BIGINT) AS n_docs
                FROM (SELECT thr_ppm, unnest([doc_a, doc_b]) AS doc
                      FROM cleared) GROUP BY 1),
         base AS (SELECT CAST(count(*) AS BIGINT) AS n_base FROM pairs)
         SELECT CAST(t.thr_ppm AS BIGINT) AS thr_ppm,
           coalesce(np.n_pairs, 0) AS n_pairs,
           coalesce(nd.n_docs, 0) AS n_docs,
           CASE WHEN base.n_base = 0 THEN 0.0
                ELSE CAST(coalesce(np.n_pairs, 0) AS DOUBLE) / base.n_base
           END AS pair_frac
         FROM thr t LEFT JOIN np USING (thr_ppm)
         LEFT JOIN nd USING (thr_ppm) CROSS JOIN base"""
    },

    // q180: the q178 pair chain + recursive-closure components (the
    // q54 oracle's reach CTE) + md5(root) splits + the re-audit rollup
    "q180_cluster_split" ->
      s"""WITH RECURSIVE cand AS (
           SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           FROM ${p("minhash_bands")} x JOIN ${p("minhash_bands")} y
             ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
            AND x.doc_id < y.doc_id),
         sizes AS (
           SELECT doc_id, count(*) AS n
           FROM ${p("minhash_shingles")} GROUP BY doc_id),
         common AS (
           SELECT c.doc_a, c.doc_b, count(sb.sh) AS ci
           FROM cand c
           JOIN ${p("minhash_shingles")} sa ON sa.doc_id = c.doc_a
           LEFT JOIN ${p("minhash_shingles")} sb
             ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
           GROUP BY 1, 2),
         pairs AS (
           SELECT m.doc_a, m.doc_b
           FROM common m JOIN sizes na ON na.doc_id = m.doc_a
                         JOIN sizes nb ON nb.doc_id = m.doc_b
           WHERE round(CAST(m.ci AS DOUBLE) / (na.n + nb.n - m.ci), 4)
             >= $MinJaccard),
         edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                   UNION SELECT doc_b, doc_a FROM pairs),
         reach(a, b) AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         labels AS (
           SELECT a AS doc_id, least(a, min(b)) AS root
           FROM reach GROUP BY a),
         sp AS (
           SELECT doc_id, root,
             CASE WHEN bkt < 204 THEN 'train'
                  WHEN bkt < 230 THEN 'val' ELSE 'test' END AS split
           FROM (SELECT r.doc_id, r.root,
               (instr('0123456789abcdef',
                  substr(md5(CAST(r.root AS VARCHAR)), 1, 1)) - 1) * 16
               + instr('0123456789abcdef',
                  substr(md5(CAST(r.root AS VARCHAR)), 2, 1)) - 1 AS bkt
             FROM (SELECT d.doc_id, coalesce(l.root, d.doc_id) AS root
                   FROM documents d LEFT JOIN labels l USING (doc_id)) r)),
         tagged AS (
           SELECT a.split AS sa, b.split AS sb
           FROM pairs p JOIN sp a ON a.doc_id = p.doc_a
                        JOIN sp b ON b.doc_id = p.doc_b),
         wthn AS (
           SELECT sa AS split, CAST(count(*) AS BIGINT) AS n_pairs_within
           FROM tagged WHERE sa = sb GROUP BY 1),
         crossed AS (
           SELECT CAST(count(*) AS BIGINT) AS n_pairs_cross
           FROM tagged WHERE sa <> sb),
         base AS (
           SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN doc_id <> root THEN 1 ELSE 0 END)
               AS BIGINT) AS n_nonroot_docs
           FROM sp GROUP BY 1)
         SELECT b.split, b.n_docs, b.n_nonroot_docs,
           CAST(coalesce(w.n_pairs_within, 0) AS BIGINT) AS n_pairs_within,
           c.n_pairs_cross
         FROM base b LEFT JOIN wthn w ON w.split = b.split
         CROSS JOIN crossed c""",

    // q178: the q25 pair chain with ids kept, the q56 split buckets,
    // canonicalized split combos, one division per row
    "q178_split_leakage" ->
      s"""WITH cand AS (
           SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           FROM ${p("minhash_bands")} x JOIN ${p("minhash_bands")} y
             ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
            AND x.doc_id < y.doc_id),
         sizes AS (
           SELECT doc_id, count(*) AS n
           FROM ${p("minhash_shingles")} GROUP BY doc_id),
         common AS (
           SELECT c.doc_a, c.doc_b, count(sb.sh) AS ci
           FROM cand c
           JOIN ${p("minhash_shingles")} sa ON sa.doc_id = c.doc_a
           LEFT JOIN ${p("minhash_shingles")} sb
             ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
           GROUP BY 1, 2),
         pairs AS (
           SELECT m.doc_a, m.doc_b
           FROM common m JOIN sizes na ON na.doc_id = m.doc_a
                         JOIN sizes nb ON nb.doc_id = m.doc_b
           WHERE round(CAST(m.ci AS DOUBLE) / (na.n + nb.n - m.ci), 4)
             >= $MinJaccard),
         sp AS (
           SELECT doc_id,
             CASE WHEN bkt < 204 THEN 'train'
                  WHEN bkt < 230 THEN 'val' ELSE 'test' END AS split
           FROM (SELECT doc_id,
               (instr('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + instr('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS bkt
             FROM documents)),
         combos AS (
           SELECT least(a.split, b.split) AS split_lo,
             greatest(a.split, b.split) AS split_hi,
             CAST(count(*) AS BIGINT) AS n_pairs
           FROM pairs JOIN sp a ON a.doc_id = pairs.doc_a
                      JOIN sp b ON b.doc_id = pairs.doc_b
           GROUP BY 1, 2),
         tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS t FROM combos)
         SELECT split_lo, split_hi, n_pairs,
           split_lo <> split_hi AS is_cross,
           CAST(n_pairs AS DOUBLE) / tot.t AS pair_frac
         FROM combos CROSS JOIN tot""",

    // per-(doc, bit) majority vote over the token-hash multiset, packed
    // back into the signed 64-bit signature (bit 63 contributes the
    // negative 2^63 — DuckDB's << overflows at 63 where Java wraps)
    "q26_simhash" ->
      s"""SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS simhash FROM (
           SELECT doc_id, i,
             CASE WHEN 2 * sum((th >> i) & 1) > count(*)
                  THEN CASE WHEN i = 63 THEN -9223372036854775808
                       ELSE (1::BIGINT << CAST(i AS INTEGER)) END
                  ELSE 0 END AS contrib
           FROM ${p("simhash_tokens")} CROSS JOIN range(64) t(i)
           GROUP BY doc_id, i)
         GROUP BY doc_id""",

    // Feature hashing: tf, the mod-D dimension, the hash-bit sign, the
    // per-(doc, dim) integer sums, the dense 0-filled grid, and the
    // cosine cut ALL recomputed from the exported per-occurrence token
    // hashes; integer sums need no decimal routing and the >> sign bit
    // matches Spark's arithmetic shiftright on negative hashes (the
    // same equivalence q26's bit votes rely on).
    "q101_feature_hash" ->
      s"""WITH tf AS (
           SELECT doc_id, th, count(*) AS tf
           FROM ${p("hashed_tokens")} GROUP BY 1, 2),
         f AS (
           SELECT doc_id,
             ((th % ${TextQueries.FeatureHashDim}) + ${TextQueries.FeatureHashDim})
               % ${TextQueries.FeatureHashDim} AS dim,
             sum(CASE WHEN ((th >> 32) & 1) = 0 THEN tf ELSE -tf END) AS val
           FROM tf GROUP BY 1, 2),
         d AS (SELECT DISTINCT doc_id FROM tf),
         grid AS (SELECT d.doc_id, t.i
                  FROM d CROSS JOIN range(${TextQueries.FeatureHashDim}) t(i)),
         dense AS (
           SELECT g.doc_id,
             list(CAST(coalesce(f.val, 0) AS DOUBLE) ORDER BY g.i) AS fv,
             sum(CASE WHEN coalesce(f.val, 0) <> 0 THEN 1 ELSE 0 END) AS nnz
           FROM grid g LEFT JOIN f ON f.doc_id = g.doc_id AND f.dim = g.i
           GROUP BY g.doc_id),
         qv AS (SELECT fv AS q FROM dense WHERE doc_id = 0),
         sc AS (
           SELECT dense.doc_id, dense.nnz,
             (CASE WHEN list_dot_product(qv.q, qv.q) = 0 OR
                        list_dot_product(dense.fv, dense.fv) = 0 THEN 0.0
                   ELSE list_cosine_similarity(qv.q, dense.fv) END) AS cos
           FROM dense CROSS JOIN qv)
         SELECT doc_id, CAST(nnz AS BIGINT) AS nnz, round(cos, 4) AS cos
         FROM sc ORDER BY sc.cos DESC, doc_id LIMIT 10""",

    // Hamming top-k: the q26 signature CTE replayed from the same
    // exported token hashes, then pure-integer XOR + bit_count ranking
    // with the (hamming, doc_id) tie-break — nothing float anywhere.
    "q100_hamming_ann" ->
      s"""WITH sig AS (
           SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS simhash FROM (
             SELECT doc_id, i,
               CASE WHEN 2 * sum((th >> i) & 1) > count(*)
                    THEN CASE WHEN i = 63 THEN -9223372036854775808
                         ELSE (1::BIGINT << CAST(i AS INTEGER)) END
                    ELSE 0 END AS contrib
             FROM ${p("simhash_tokens")} CROSS JOIN range(64) t(i)
             GROUP BY doc_id, i)
           GROUP BY doc_id),
         sc AS (
           SELECT pb.doc_id AS probe_id, x.doc_id,
             bit_count(xor(pb.simhash, x.simhash)) AS hamming
           FROM sig pb JOIN sig x
             ON pb.doc_id < 10 AND x.doc_id <> pb.doc_id),
         r AS (
           SELECT probe_id, doc_id, hamming,
             row_number() OVER (PARTITION BY probe_id
               ORDER BY hamming, doc_id) AS rn
           FROM sc)
         SELECT probe_id, doc_id AS neighbor_id,
           CAST(hamming AS BIGINT) AS hamming, CAST(rn AS BIGINT) AS rn
         FROM r WHERE rn <= ${VectorQueries.AnnK}""",

    // Two-stage: the q100 signature/pool CTEs (integer-deterministic
    // shortlist) + exact cosine rerank over the embeddings, same
    // (cos DESC, doc_id) final cut.
    "q102_binary_rerank" ->
      s"""WITH sig AS (
           SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS simhash FROM (
             SELECT doc_id, i,
               CASE WHEN 2 * sum((th >> i) & 1) > count(*)
                    THEN CASE WHEN i = 63 THEN -9223372036854775808
                         ELSE (1::BIGINT << CAST(i AS INTEGER)) END
                    ELSE 0 END AS contrib
             FROM ${p("simhash_tokens")} CROSS JOIN range(64) t(i)
             GROUP BY doc_id, i)
           GROUP BY doc_id),
         sc AS (
           SELECT pb.doc_id AS probe_id, x.doc_id,
             bit_count(xor(pb.simhash, x.simhash)) AS hamming
           FROM sig pb JOIN sig x
             ON pb.doc_id < 10 AND x.doc_id <> pb.doc_id),
         pool0 AS (
           SELECT probe_id, doc_id, hamming,
             row_number() OVER (PARTITION BY probe_id
               ORDER BY hamming, doc_id) AS rh
           FROM sc),
         pool AS (SELECT * FROM pool0 WHERE rh <= ${TextQueries.HammingPool}),
         eb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS fv
                FROM embeddings),
         rr AS (
           SELECT pool.probe_id, pool.doc_id, pool.hamming,
             list_cosine_similarity(pe.fv, de.fv) AS cos
           FROM pool
           JOIN eb de ON de.vec_id = pool.doc_id
           JOIN eb pe ON pe.vec_id = pool.probe_id),
         r AS (
           SELECT probe_id, doc_id, hamming, cos,
             row_number() OVER (PARTITION BY probe_id
               ORDER BY cos DESC, doc_id) AS rn
           FROM rr)
         SELECT probe_id, doc_id, CAST(hamming AS BIGINT) AS hamming,
           round(cos, 4) AS cos, CAST(rn AS BIGINT) AS rn
         FROM r WHERE rn <= ${VectorQueries.AnnK}""",

    "q33_ann_lsh" -> annRescore(
      s"""SELECT DISTINCT pb.vec_id AS probe_id, x.vec_id AS vec_id
          FROM ${p("lsh_buckets")} x JOIN ${p("lsh_buckets")} pb
            ON x.t = pb.t AND x.bucket = pb.bucket
          WHERE pb.vec_id < 10 AND x.vec_id <> pb.vec_id"""),

    "q37_ann_ivf" -> annRescore(
      s"""SELECT DISTINCT pc.probe_id, a.vec_id
          FROM ${p("ivf_cells")} a JOIN ${p("ivf_probe_cells")} pc
            ON a.cell = pc.cell
          WHERE a.vec_id <> pc.probe_id"""),

    // q79 runs the same IVF geometry through the partitioned WRITE
    // path (writeIndexed + pruned-scan probe) — identical answer set,
    // so the in-memory path's oracle applies verbatim
    "q79_ann_ivf_indexed" -> annRescore(
      s"""SELECT DISTINCT pc.probe_id, a.vec_id
          FROM ${p("ivf_cells")} a JOIN ${p("ivf_probe_cells")} pc
            ON a.cell = pc.cell
          WHERE a.vec_id <> pc.probe_id"""),

    // q90 probes the STREAM-MAINTAINED layout (bootstrap-frozen
    // centroids + epoch appends); the exported assignment/probe-cell
    // tables already encode those centroids, so the rescore tail is
    // the same.
    "q90_stream_ann_index" -> annRescore(
      s"""SELECT DISTINCT pc.probe_id, a.vec_id
          FROM ${p("ivf_inc_cells")} a JOIN ${p("ivf_inc_probe_cells")} pc
            ON a.cell = pc.cell
          WHERE a.vec_id <> pc.probe_id"""),

    "q38_cosine_near_dup" ->
      s"""WITH cand AS (
           SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
           FROM ${p("neardup_buckets")} x JOIN ${p("neardup_buckets")} y
             ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
         scored AS (
           SELECT list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                         CAST(eb.embedding AS DOUBLE[])) AS cos
           FROM cand c JOIN embeddings ea ON ea.vec_id = c.vec_a
                       JOIN embeddings eb ON eb.vec_id = c.vec_b)
         SELECT CAST(count(*) AS BIGINT) AS n_near_dup_pairs,
           coalesce(round(avg(cos), 4), 0.0) AS avg_cos
         FROM scored WHERE cos >= $MinCos"""
  )
}
