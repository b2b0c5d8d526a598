package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Query surface over the multimodal plumbing (Multimodal.scala).
  * The payload arithmetic (byte length, frame counts, resize dims) is
  * deterministic, so the per-modality rollup and frame-sampling ops
  * get REAL DuckDB oracles; the stubbed decode internals (mean_byte,
  * checksum) are asserted in MultimodalSpec instead.
  */
object MultimodalQueries {

  /** q173 media-gate bars — each sits INSIDE the harness feature
    * ranges (luma 107–144, popcount 26–38, rms 8453–8508, frames 2–8),
    * so every gate provably keeps AND drops; comparisons are against
    * deterministically-decoded values, so the cascade is exact. */
  private[graft] val MgMinBytes = 1000L
  private[graft] val MgLumaLo = 110.0
  private[graft] val MgLumaHi = 140.0
  private[graft] val MgHashLo = 28L
  private[graft] val MgHashHi = 36L
  private[graft] val MgRmsMin = 8470.0
  private[graft] val MgMinFrames = 3L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Color-profile audit (L4g — "is this image corpus tonally
    // skewed": the dataset-balance read run before training a vision
    // tower, and the dominant-color signal dedup/retrieval pipelines
    // key thumbnails on). Per image: REAL PNG decode → RGB-octant
    // pixel counts (executor-side, ≤8 bounded rows per asset, the q91
    // shape); relational tail: per-asset dominant octant by the
    // (px DESC, bucket ASC) total order via max_by, corpus rollup
    // over the EXPLICIT 8-bucket grid (an empty octant must report
    // zeros), share_ppm through DECIMAL IntegralDivide (px·10⁶
    // passes 2⁶³ at ~10¹³ corpus pixels; HUGEINT // in the oracle).
    // The per-cell rows are the oracle export; DuckDB redoes argmax
    // + rollup relationally.
    "q253_color_profile" -> ((s, d) => {
      val cells = Multimodal.colorCells(Multimodal.realAssets(
          documents(s, d).select("doc_id").filter(col("doc_id") % 3 === 0)))
        .toDF().localCheckpoint() // feeds dominant + totals + t_px
      val dom = cells.groupBy(col("asset_id"))
        .agg(max_by(col("bucket"),
          struct(col("px"), -col("bucket"))).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_dominant"))
      val tot = cells.groupBy(col("bucket")).agg(sum(col("px")).as("n_px"))
      val all = cells.agg(sum(col("px")).as("t_px"))
      s.range(0, 8).toDF("bucket")
        .join(tot.withColumn("bucket", col("bucket").cast("long")),
          Seq("bucket"), "left")
        .join(dom.withColumn("bucket", col("bucket").cast("long")),
          Seq("bucket"), "left")
        .crossJoin(broadcast(all))
        .select(col("bucket"),
          coalesce(col("n_px"), lit(0L)).as("n_px"),
          coalesce(col("n_dominant"), lit(0L)).as("n_dominant"),
          col("t_px"))
        .withColumn("share_ppm", expr(
          """CAST((CAST(n_px AS DECIMAL(19,0)) * 1000000)
             DIV CAST(t_px AS DECIMAL(19,0)) AS BIGINT)"""))
        .select(col("bucket"), col("n_px"), col("share_ppm"),
          col("n_dominant"))
    }),

    // Media curation filter cascade (L4 × D5 — q143's multimodal
    // twin): the keep/drop funnel a multimodal training set runs over
    // its decoded assets. Per-modality integer/exact gates — payload
    // size, luma exposure band (too dark/bright), aHash bit balance
    // (near-constant images), audio silence, degenerate 1-frame
    // "videos" — composed in a fixed order with a first_fail
    // attribution, exactly the audit shape a curation pipeline needs
    // to see WHERE its corpus dies. One pass over the memoized decode
    // stage; every bar sits inside the harness feature ranges, so
    // every gate provably keeps AND drops (the q143/q151 doctrine).
    "q173_media_gates" -> ((s, d) => {
      val isImg = col("modality").isin("image", "video")
      val pop = expr("CAST(bit_count(ahash) AS BIGINT)")
      mediaFeaturesStage(s, d)
        .withColumn("pass_bytes", (col("n_bytes") >= MgMinBytes).cast("long"))
        .withColumn("pass_luma", (!isImg ||
          (col("mean_luma") >= MgLumaLo && col("mean_luma") <= MgLumaHi))
          .cast("long"))
        .withColumn("pass_hash", (!isImg ||
          (pop >= MgHashLo && pop <= MgHashHi)).cast("long"))
        .withColumn("pass_rms", (col("modality") =!= "audio" ||
          col("rms") >= MgRmsMin).cast("long"))
        .withColumn("pass_frames", (col("modality") =!= "video" ||
          col("n_frames") >= MgMinFrames).cast("long"))
        .withColumn("first_fail",
          when(col("pass_bytes") === 0L, 1L)
            .when(col("pass_luma") === 0L, 2L)
            .when(col("pass_hash") === 0L, 3L)
            .when(col("pass_rms") === 0L, 4L)
            .when(col("pass_frames") === 0L, 5L)
            .otherwise(0L))
        .withColumn("keep", (col("first_fail") === 0L).cast("long"))
        .select(col("asset_id"), col("modality"), col("pass_bytes"),
          col("pass_luma"), col("pass_hash"), col("pass_rms"),
          col("pass_frames"), col("first_fail"), col("keep"))
    }),
    // Decode pipeline rollup per modality (L4): asset counts, payload
    // bytes, frame totals — runs the full mapPartitions decode path.
    "q35_multimodal_stats" -> ((s, d) => {
      val feats = Multimodal.decodeStub(
        Multimodal.assetsFromDocuments(documents(s, d)))
      Multimodal.modalityStats(feats)
        .select(col("modality"), col("n_assets"), col("total_bytes"),
                col("total_frames"))
    }),

    // Frame sampling (one frame key per second of video): bounded
    // explode keyed for downstream per-frame feature jobs.
    "q36_frame_sample" -> ((s, d) => {
      val frames = Multimodal.sampleFrames(
        Multimodal.assetsFromDocuments(documents(s, d)))
      frames.agg(
        countDistinct(col("asset_id")).as("n_videos"),
        count(lit(1)).as("total_frames"),
        max(col("frame_idx")).cast("long").as("max_frame_idx"))
    }),

    // REAL-decode rollup (L4, no stubs left): PNG and multi-frame GIF
    // through javax.imageio, WAV through javax.sound.sampled,
    // per-modality aggregate over true decoded dims/luma/frames. The
    // oracle reads the exported per-asset feature rows (the decode is a
    // pure per-row function — same export pattern as the chess position
    // stream) and redoes the rollup relationally.
    "q77_media_decode" -> ((s, d) => {
      // composes on the memoized decode stage like q78/q82: the codec
      // cost is billed once under stage_build, and q77's own time is
      // the steady-state rollup over the staged features
      mediaFeaturesStage(s, d)
        .groupBy(col("modality"))
        .agg(count(lit(1)).as("n_assets"),
             sum(col("n_bytes")).as("total_bytes"),
             sum(col("width") + col("height")).cast("long").as("sum_dims"),
             sum(col("n_frames")).cast("long").as("total_frames"),
             round(sum(col("mean_luma").cast("decimal(38,6)")), 2)
               .cast("double").as("sum_luma"),
             round(sum(col("rms").cast("decimal(38,6)")), 2)
               .cast("double").as("sum_rms"))
    }),

    // Image perceptual near-dup (L2's image-modality member): 64-bit
    // aHash from the real decode, banded into 4x16-bit keys (pigeonhole:
    // any pair within Hamming<=3 shares at least one intact band), band
    // self-join, exact Hamming rescore. The oracle redoes the UNFILTERED
    // all-pairs Hamming join in DuckDB, so every round also proves the
    // banding lossless at the threshold.
    "q78_image_neardup" -> ((s, d) => imageNearDupPairs(s, d)),

    // Media dup-cluster resolution (L4 × L2 — q54's end-game applied to
    // the image modality: near-dup PAIRS are not yet an answer; the
    // curation decision needs CLUSTERS and one survivor each): q78's
    // banded Hamming pairs (lossless at the ≤3 bar by pigeonhole over
    // the 4 16-bit bands) under the shared star-contraction CC, keep
    // rule = min asset id. Oracle: recursive transitive closure over
    // the exported decoded-features table.
    "q194_media_dup_clusters" -> ((s, d) => {
      val lab = ConnectedComponents.labels(s,
        imageNearDupPairs(s, d)
          .select(col("asset_a").as("src"), col("asset_b").as("dst")))
      lab.groupBy(col("comp_id"))
        .agg(count(lit(1)).as("n_members"),
          min(col("doc_id")).as("keep_asset"))
    }),

    // REAL per-frame video decode (L4, the last modality off the stub):
    // every GIF asset explodes into its actual stored frames (true
    // multi-frame javax.imageio reader), and `sampleFrames`' duration-
    // derived keys join 1:1 against them — the per-asset rollup equals
    // the oracle's plain per-frame aggregate ONLY if the sampler's key
    // set is exactly the real frame set, so frame sampling is proven to
    // operate on real frames every round. Oracle reads the exported
    // per-frame rows (pure per-row codec calls) and redoes the rollup.
    "q82_video_frames" -> ((s, d) => {
      // generate ONLY the video slice (no PNG/WAV encode for assets the
      // query never touches), and sample from payload-free metadata —
      // the decode branch is then the single place GIF bytes exist
      val ids = documents(s, d).select("doc_id")
      val frames = Multimodal.videoFrames(
        Multimodal.realAssets(ids.filter(col("doc_id") % 3 === 2))).toDF()
      val sampled = Multimodal.sampleFramesDf(
        Multimodal.videoAssetMeta(ids), Multimodal.FrameMs)
      sampled.join(frames, Seq("asset_id", "frame_idx"))
        .groupBy(col("asset_id"))
        .agg(count(lit(1)).as("n_frames"),
             max(col("width")).cast("long").as("w"),
             max(col("height")).cast("long").as("h"),
             round(sum(col("mean_luma").cast("decimal(38,6)")), 2)
               .cast("double").as("sum_luma"),
             countDistinct(col("ahash")).as("n_distinct_ahash"))
    }),

    // REAL areal resize as a standalone operator (the L4 `resize`
    // verb): every image decodes and downsamples to an 8×6 luma grid
    // with floor-boundary cells — integer sums end to end, so the
    // "corpus-mean resized image" rollup below (per grid cell, mean
    // luma over all images) stays exact until ONE final division. The
    // per-cell rows are the oracle export; DuckDB redoes the rollup.
    "q91_image_resize" -> ((s, d) => {
      Multimodal.resizedCells(Multimodal.realAssets(
          documents(s, d).select("doc_id").filter(col("doc_id") % 3 === 0)))
        .toDF()
        .groupBy(col("gx").cast("long").as("gx"), col("gy").cast("long").as("gy"))
        .agg(count(lit(1)).as("n_imgs"),
             sum(col("luma_sum")).as("luma_total"),
             sum(col("px")).as("px_total"))
        // px_total casts to double BEFORE the *1000: the 64-bit integer
        // multiply would overflow identically on both engines at ~9.2e15
        // total pixels (cross-engine-identical bugs are invisible to the
        // oracle); the double product is the same IEEE op on both
        .withColumn("mean_luma",
          col("luma_total").cast("double") /
            (col("px_total").cast("double") * 1000))
    }),

    // Energy-based voice-activity detection (L4's audio feature-extract
    // verb): burst-structured REAL WAVs decode executor-side into 25 ms
    // windows with exact integer energies; a window is active iff
    // energy·4 ≥ n·amp² (pure integer gate, see Multimodal.VadWin), and
    // the per-asset rollup reports window/active counts, the active
    // span, and the total energy. The per-window rows are the oracle
    // export (pure per-row codec function, the q82 pattern); DuckDB
    // redoes the gate + rollup relationally.
    "q148_audio_vad" -> ((s, d) => {
      val w = Multimodal.audioWindows(documents(s, d).select("doc_id")).toDF()
      val active = col("energy") * 4 >=
        col("n_samples").cast("long") * Multimodal.VadAmpSq
      w.groupBy(col("asset_id"))
        .agg(count(lit(1)).as("n_windows"),
             sum(when(active, 1L).otherwise(0L)).as("n_active"),
             coalesce(min(when(active, col("win_idx"))).cast("long"),
               lit(-1L)).as("first_active"),
             coalesce(max(when(active, col("win_idx"))).cast("long"),
               lit(-1L)).as("last_active"),
             sum(col("energy")).as("energy_total"))
    }),

    // Voiced/unvoiced audio segmentation (L4f — the ZCR×energy frame
    // classifier real VAD pipelines run after q148's energy gate:
    // voiced speech = high energy + LOW zero-crossing rate, fricative
    // noise = high energy + HIGH ZCR). Both features are exact
    // integers from the real RIFF decode, both gates are integer
    // cross-multiplies (energy·4 ≥ n·amp²; zc·8 < n), and the longest
    // voiced run derives from gaps-and-islands on win_idx — windows
    // partition by asset_id (corpus-cardinality groups over bounded
    // per-asset windows, the q155 shape). Oracle: the exported
    // per-window rows re-gated and re-segmented relationally.
    "q232_audio_zcr" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Multimodal.audioZWindows(documents(s, d).select("doc_id")).toDF()
      val active = col("energy") * 4 >=
        col("n_samples").cast("long") * Multimodal.VadAmpSq
      val voiced = active && col("zc") * 8 < col("n_samples").cast("long")
      val flagged = w
        .withColumn("a", when(active, 1L).otherwise(0L))
        .withColumn("v", when(voiced, 1L).otherwise(0L))
      val byAsset = Window.partitionBy(col("asset_id"))
        .orderBy(col("win_idx").asc)
      val runs = flagged.filter(col("v") === 1)
        .withColumn("grp", col("win_idx") - row_number().over(byAsset))
        .groupBy(col("asset_id"), col("grp")).agg(count(lit(1)).as("len"))
        .groupBy(col("asset_id")).agg(max(col("len")).as("max_voiced_run"))
      flagged.groupBy(col("asset_id"))
        .agg(count(lit(1)).as("n_windows"),
          sum(col("a")).as("n_active"),
          sum(col("v")).as("n_voiced"),
          (sum(col("a")) - sum(col("v"))).as("n_unvoiced_active"),
          sum(col("zc")).as("zc_total"))
        .join(runs, Seq("asset_id"), "left")
        .withColumn("max_voiced_run",
          coalesce(col("max_voiced_run"), lit(0L)))
    }),

    // Shot-boundary detection over shot-structured REAL GIFs (L4 video
    // segmentation — the standard frame-difference cut detector): a
    // transition whose consecutive-frame aHash Hamming clears
    // ShotHamMin is a cut; the running cut count segments each asset
    // into shots, and the per-asset rollup (frames, shots, cuts,
    // longest shot) derives from ONE per-(asset, shot) length table,
    // so the decode+window lineage runs exactly once. The lag/sum
    // windows partition by asset_id — corpus-cardinality groups over
    // ≤ 12 frames each. Oracle: the exported per-frame rows (pure
    // per-row codec calls) re-segmented relationally in DuckDB.
    "q155_shot_detect" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byAsset = Window.partitionBy(col("asset_id"))
        .orderBy(col("frame_idx").asc)
      val shots = shotFramesStage(s, d)
        .withColumn("prev", lag(col("ahash"), 1).over(byAsset))
        .withColumn("is_cut", (col("prev").isNotNull &&
          expr("CAST(bit_count(ahash ^ prev) AS BIGINT)") >=
            Multimodal.ShotHamMin).cast("long"))
        .withColumn("shot_id", sum(col("is_cut")).over(
          byAsset.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("asset_id"), col("shot_id"))
        .agg(count(lit(1)).as("len"))
      shots.groupBy(col("asset_id"))
        .agg(sum(col("len")).as("n_frames"),
             count(lit(1)).as("n_shots"),
             (count(lit(1)) - 1).as("n_cuts"),
             max(col("len")).as("max_shot_len"))
    })
  )

  /** DuckDB table expression for the exported per-asset decode rows
    * (written by ApproxOracle.export alongside the other non-ANSI
    * artifacts). */
  private def media = graft.OracleExport.p("media_features")

  /** DuckDB table expression for the exported per-FRAME video decode
    * rows (q82). */
  private def vframes = graft.OracleExport.p("video_frames")

  /** q78's banded image near-dup pairs (asset_a, asset_b, hamming) —
    * shared by the pair query and the q194 cluster resolution. The
    * self-join consumes the memoized decode stage twice; the codec
    * cost is billed to q77. Banding is LOSSLESS at the ≤3 bar: 3 bit
    * diffs across 4 disjoint 16-bit bands leave at least one band
    * equal (pigeonhole), so the band join finds every qualifying pair. */
  private[operators] def imageNearDupPairs(s: SparkSession, d: String): DataFrame = {
    val img = mediaFeaturesStage(s, d)
      .filter(col("modality") === "image")
      .select(col("asset_id"), col("ahash"))
    val bands = img.select(col("asset_id"), col("ahash"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band_idx"),
          shiftrightunsigned(col("ahash"), i * 16)
            .bitwiseAND(lit(0xffffL)).as("band_key"))): _*)).as("b"))
      .select(col("asset_id"), col("ahash"),
        col("b.band_idx"), col("b.band_key"))
    bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("asset_a"),
        col("b.asset_id").as("asset_b"),
        expr("CAST(bit_count(a.ahash ^ b.ahash) AS BIGINT)").as("hamming"))
      // filter FIRST (partition-local, hamming already computed), so
      // the dedup shuffle carries only near-dup pairs — band-collision
      // candidates at high Hamming never reach the exchange
      .filter(col("hamming") <= 3)
      .distinct()
  }

  /** The decoded-features table, memoized per (session, sf dir) as an
    * eager localCheckpoint — the media pipeline's shared materialized
    * stage (same idiom as TextQueries' ngramPairsStage, via StageCache):
    * q77, q78 and the spec suites all compose on it, so the codec cost
    * is paid once per (session, corpus) and billed under Bench's
    * "stage_build" field. */
  private[operators] def mediaFeaturesStage(s: SparkSession, d: String): DataFrame =
    StageCache.getOrCompute(s, s"media_features:$d")(
      Multimodal.decodeMedia(
        Multimodal.realAssets(documents(s, d).select("doc_id")))
        .toDF().localCheckpoint())

  /** q155's per-FRAME GIF decode, memoized exactly like
    * [[mediaFeaturesStage]] — the decode was the whole 3.66 s r9 cost
    * of q155 (and the spec suite re-paid it per test); staged, q155 is
    * its relational cost and the decode bills under "stage_build". */
  private[operators] def shotFramesStage(s: SparkSession, d: String): DataFrame =
    StageCache.getOrCompute(s, s"shot_frames:$d")(
      Multimodal.shotFrames(documents(s, d).select("doc_id"))
        .toDF().localCheckpoint())

  val oracleSql: Map[String, String] = Map(
    // q253: the same dominant-octant argmax ((px DESC, bucket ASC)
    // total order) and zero-filled 8-bucket rollup over the exported
    // per-cell decode rows; HUGEINT mirrors the ppm IntegralDivide.
    "q253_color_profile" ->
      s"""WITH cells AS (
           SELECT * FROM ${graft.OracleExport.p("color_cells")}),
         dom0 AS (
           SELECT asset_id, bucket,
             row_number() OVER (PARTITION BY asset_id
               ORDER BY px DESC, bucket ASC) AS rn
           FROM cells),
         dom AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_dominant
                 FROM dom0 WHERE rn = 1 GROUP BY 1),
         tot AS (SELECT bucket, CAST(sum(px) AS BIGINT) AS n_px
                 FROM cells GROUP BY 1),
         allpx AS (SELECT CAST(sum(px) AS BIGINT) AS t_px FROM cells),
         grid AS (SELECT CAST(r.range AS BIGINT) AS bucket
                  FROM range(0, 8) r)
         SELECT g.bucket, coalesce(t.n_px, 0) AS n_px,
           CAST(CAST(coalesce(t.n_px, 0) AS HUGEINT) * 1000000 // a.t_px
             AS BIGINT) AS share_ppm,
           coalesce(d.n_dominant, 0) AS n_dominant
         FROM grid g
         LEFT JOIN tot t ON t.bucket = g.bucket
         LEFT JOIN dom d ON d.bucket = g.bucket
         CROSS JOIN allpx a""",

    // q173: identical gate cascade over the exported decoded features.
    "q173_media_gates" ->
      s"""WITH m AS (SELECT * FROM $media),
         g AS (
           SELECT asset_id, modality,
             CASE WHEN n_bytes >= $MgMinBytes THEN 1 ELSE 0 END AS pass_bytes,
             CASE WHEN modality NOT IN ('image', 'video')
                    OR (mean_luma >= $MgLumaLo AND mean_luma <= $MgLumaHi)
                  THEN 1 ELSE 0 END AS pass_luma,
             CASE WHEN modality NOT IN ('image', 'video')
                    OR (bit_count(ahash) >= $MgHashLo
                        AND bit_count(ahash) <= $MgHashHi)
                  THEN 1 ELSE 0 END AS pass_hash,
             CASE WHEN modality <> 'audio' OR rms >= $MgRmsMin
                  THEN 1 ELSE 0 END AS pass_rms,
             CASE WHEN modality <> 'video' OR n_frames >= $MgMinFrames
                  THEN 1 ELSE 0 END AS pass_frames
           FROM m)
         SELECT asset_id, modality,
           CAST(pass_bytes AS BIGINT) AS pass_bytes,
           CAST(pass_luma AS BIGINT) AS pass_luma,
           CAST(pass_hash AS BIGINT) AS pass_hash,
           CAST(pass_rms AS BIGINT) AS pass_rms,
           CAST(pass_frames AS BIGINT) AS pass_frames,
           CAST(CASE WHEN pass_bytes = 0 THEN 1
                     WHEN pass_luma = 0 THEN 2
                     WHEN pass_hash = 0 THEN 3
                     WHEN pass_rms = 0 THEN 4
                     WHEN pass_frames = 0 THEN 5
                     ELSE 0 END AS BIGINT) AS first_fail,
           CAST(CASE WHEN pass_bytes = 1 AND pass_luma = 1
                      AND pass_hash = 1 AND pass_rms = 1
                      AND pass_frames = 1
                     THEN 1 ELSE 0 END AS BIGINT) AS keep
         FROM g""",

    // Mirrors assetsFromDocuments + decodeStub arithmetic: modality by
    // doc_id%3, payload = utf8 bytes of text, duration = n_chars*10 ms,
    // video frames = max(1, duration/1000 int-div), others 1.
    "q35_multimodal_stats" ->
      """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                     WHEN doc_id % 3 = 1 THEN 'audio'
                     ELSE 'video' END AS modality,
         count(*) AS n_assets,
         CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
         CAST(sum(CASE WHEN doc_id % 3 = 2
                       THEN greatest(1, (n_chars * 10) // 1000)
                       ELSE 1 END) AS BIGINT) AS total_frames
         FROM documents GROUP BY 1""",

    // n_chars > 0 mirrors sampleFrames' duration_ms > 0 guard: a
    // zero-length video emits no frames on either side.
    "q36_frame_sample" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_videos,
         CAST(sum((n_chars * 10 - 1) // 1000 + 1) AS BIGINT) AS total_frames,
         CAST(max((n_chars * 10 - 1) // 1000) AS BIGINT) AS max_frame_idx
         FROM documents WHERE doc_id % 3 = 2 AND n_chars > 0""",

    // rollup recomputed from the exported per-asset decoded rows (the
    // decode itself is spec-verified: exact PNG/WAV round-trips in
    // MediaCodecsSpec)
    "q77_media_decode" ->
      s"""SELECT modality, count(*) AS n_assets,
          CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
          CAST(sum(width + height) AS BIGINT) AS sum_dims,
          CAST(sum(n_frames) AS BIGINT) AS total_frames,
          CAST(round(sum(CAST(mean_luma AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_luma,
          CAST(round(sum(CAST(rms AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_rms
          FROM $media GROUP BY 1""",

    // the UNFILTERED all-pairs Hamming join — proves the 4x16-bit
    // banding lossless at the <=3 threshold every round
    "q78_image_neardup" ->
      s"""WITH img AS (
           SELECT asset_id, ahash FROM $media WHERE modality = 'image')
          SELECT a.asset_id AS asset_a, b.asset_id AS asset_b,
            CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
          FROM img a JOIN img b ON a.asset_id < b.asset_id
          WHERE bit_count(xor(a.ahash, b.ahash)) <= 3""",

    // q194: recursive transitive closure over the exact all-pairs
    // Hamming edges (the band join is lossless at the bar, so the
    // closures agree), min-id components and survivors.
    "q194_media_dup_clusters" ->
      s"""WITH RECURSIVE img AS (
           SELECT asset_id, ahash FROM $media WHERE modality = 'image'),
         pairs AS (
           SELECT a.asset_id AS pa, b.asset_id AS pb
           FROM img a JOIN img b ON a.asset_id < b.asset_id
           WHERE bit_count(xor(a.ahash, b.ahash)) <= 3),
         edges AS (SELECT pa AS a, pb AS b FROM pairs
                   UNION SELECT pb, pa FROM pairs),
         reach(a, b) AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         labels AS (
           SELECT a AS id, least(a, min(b)) AS comp_id
           FROM reach GROUP BY a)
         SELECT comp_id, CAST(count(*) AS BIGINT) AS n_members,
           min(id) AS keep_asset
         FROM labels GROUP BY comp_id""",

    // plain per-frame aggregate over the exported decoded frames — it
    // equals the Spark side (sampler keys ⋈ real frames) only if the
    // duration-derived sample grid hits every stored frame exactly once
    "q82_video_frames" ->
      s"""SELECT asset_id, count(*) AS n_frames,
          CAST(max(width) AS BIGINT) AS w,
          CAST(max(height) AS BIGINT) AS h,
          CAST(round(sum(CAST(mean_luma AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_luma,
          CAST(count(DISTINCT ahash) AS BIGINT) AS n_distinct_ahash
          FROM $vframes GROUP BY asset_id""",

    // integer rollup over the exported per-cell resize rows; the one
    // division (exact longs, both < 2^53) is the same IEEE op on both
    // engines
    "q91_image_resize" ->
      s"""SELECT CAST(gx AS BIGINT) AS gx, CAST(gy AS BIGINT) AS gy,
          count(*) AS n_imgs,
          CAST(sum(luma_sum) AS BIGINT) AS luma_total,
          CAST(sum(px) AS BIGINT) AS px_total,
          CAST(sum(luma_sum) AS DOUBLE) / (CAST(sum(px) AS DOUBLE) * 1000)
            AS mean_luma
          FROM ${graft.OracleExport.p("resized_cells")} GROUP BY 1, 2""",

    // the same integer VAD gate + rollup over the exported per-window
    // energies (energy·4 ≥ n·amp², amp² interpolated from the shared
    // constant so the gate cannot drift between engines)
    "q148_audio_vad" ->
      s"""SELECT asset_id, count(*) AS n_windows,
          CAST(sum(CASE WHEN energy * 4 >= CAST(n_samples AS BIGINT) * ${Multimodal.VadAmpSq}
            THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
          coalesce(CAST(min(CASE WHEN energy * 4 >= CAST(n_samples AS BIGINT) * ${Multimodal.VadAmpSq}
            THEN win_idx END) AS BIGINT), -1) AS first_active,
          coalesce(CAST(max(CASE WHEN energy * 4 >= CAST(n_samples AS BIGINT) * ${Multimodal.VadAmpSq}
            THEN win_idx END) AS BIGINT), -1) AS last_active,
          CAST(sum(energy) AS BIGINT) AS energy_total
          FROM ${graft.OracleExport.p("audio_windows")} GROUP BY asset_id""",

    // q232: the exported per-window (energy, zc) rows re-gated with
    // the same integer cross-multiplies, re-segmented with the same
    // gaps-and-islands run grouping
    "q232_audio_zcr" ->
      s"""WITH w AS (
           SELECT asset_id, win_idx, zc,
             CASE WHEN energy * 4 >=
               CAST(n_samples AS BIGINT) * ${Multimodal.VadAmpSq}
               THEN 1 ELSE 0 END AS a,
             CASE WHEN energy * 4 >=
                 CAST(n_samples AS BIGINT) * ${Multimodal.VadAmpSq}
               AND zc * 8 < CAST(n_samples AS BIGINT)
               THEN 1 ELSE 0 END AS v
           FROM ${graft.OracleExport.p("audio_zcr")}),
         runs AS (
           SELECT asset_id, CAST(max(len) AS BIGINT) AS max_voiced_run
           FROM (
             SELECT asset_id, grp, count(*) AS len FROM (
               SELECT asset_id, win_idx,
                 win_idx - row_number() OVER (PARTITION BY asset_id
                   ORDER BY win_idx) AS grp
               FROM w WHERE v = 1) i
             GROUP BY asset_id, grp) l
           GROUP BY asset_id)
         SELECT w.asset_id, count(*) AS n_windows,
           CAST(sum(a) AS BIGINT) AS n_active,
           CAST(sum(v) AS BIGINT) AS n_voiced,
           CAST(sum(a) - sum(v) AS BIGINT) AS n_unvoiced_active,
           CAST(sum(zc) AS BIGINT) AS zc_total,
           coalesce(max(r.max_voiced_run), 0) AS max_voiced_run
         FROM w LEFT JOIN runs r ON r.asset_id = w.asset_id
         GROUP BY w.asset_id""",

    // q155: the exported per-frame rows re-segmented — same lag, same
    // integer Hamming gate, same running-cut shot ids, same rollup
    "q155_shot_detect" ->
      s"""WITH d AS (
           SELECT asset_id, frame_idx, ahash,
             lag(ahash) OVER (PARTITION BY asset_id ORDER BY frame_idx)
               AS prev
           FROM ${graft.OracleExport.p("shot_frames")}),
         g AS (
           SELECT asset_id, frame_idx,
             CASE WHEN prev IS NOT NULL AND
               bit_count(xor(ahash, prev)) >= ${Multimodal.ShotHamMin}
               THEN 1 ELSE 0 END AS is_cut
           FROM d),
         s AS (
           SELECT asset_id,
             sum(is_cut) OVER (PARTITION BY asset_id ORDER BY frame_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS shot_id
           FROM g),
         l AS (SELECT asset_id, shot_id, count(*) AS len
               FROM s GROUP BY 1, 2)
         SELECT asset_id, CAST(sum(len) AS BIGINT) AS n_frames,
           count(*) AS n_shots,
           CAST(count(*) - 1 AS BIGINT) AS n_cuts,
           CAST(max(len) AS BIGINT) AS max_shot_len
         FROM l GROUP BY asset_id"""
  )
}
