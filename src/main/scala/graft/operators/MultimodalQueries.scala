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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    })
  )

  val oracleSql: Map[String, String] = Map(
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
         FROM documents WHERE doc_id % 3 = 2 AND n_chars > 0"""
  )
}
