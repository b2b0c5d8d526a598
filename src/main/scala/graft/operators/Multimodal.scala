package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder contract: opaque `binary` payload
  * + typed metadata struct, decode / feature-extract / resize /
  * frame-sample as per-partition batch transforms).
  *
  * The image/audio codecs are NOT in this container, so `decodeStub`
  * is a clearly-marked deterministic fake: it "decodes" bytes into a
  * fixed-shape feature row (length, byte histogram moments, fake
  * width/height from the header bytes). Everything AROUND the stub —
  * schema, binary column handling, typed Dataset batching, partition
  * parallelism, metadata propagation — is real Spark plumbing and is
  * what the specs assert on. Swapping the stub body for a real JNI/
  * javax.imageio decode changes no plan shape.
  *
  * Scale posture: payloads stay in executors (no collect); the decode
  * is a narrow mapPartitions (no shuffle); batch shape = one row per
  * asset with bounded feature width.
  */
object Multimodal {

  /** Media asset row: opaque payload + typed metadata. */
  case class Asset(asset_id: Long, modality: String, payload: Array[Byte],
                   mime: String, width: Int, height: Int, duration_ms: Long)

  /** Fixed-shape decoded features (the Spark-side contract a real
    * decoder must also satisfy). */
  case class AssetFeatures(asset_id: Long, modality: String, n_bytes: Long,
                           mean_byte: Double, checksum: Long,
                           thumb_w: Int, thumb_h: Int, n_frames: Int)

  /** Build a deterministic fake asset table from `documents` (text bytes
    * as payload) — the container has no real media, but the column
    * shapes are exactly what a real ingest would produce. */
  def assetsFromDocuments(docs: DataFrame): Dataset[Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("asset_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("modality"),
        col("text").cast("binary").as("payload"),
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav").otherwise("video/mp4").as("mime"),
        (col("doc_id") % 640 + 16).cast("int").as("width"),
        (col("doc_id") % 480 + 16).cast("int").as("height"),
        (col("n_chars") * 10L).as("duration_ms"))
      .as[Asset]
  }

  /** STUB DECODE — deterministic fake standing in for image/audio/video
    * codecs (not installed in this container). Real decode would replace
    * ONLY the body of `decodeOne`; the mapPartitions batching, schema,
    * and downstream plan are production-shaped. */
  def decodeStub(assets: Dataset[Asset], thumbEdge: Int = 64): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        decodeOne(a, thumbEdge)
      }
    }
  }

  private def decodeOne(a: Asset, thumbEdge: Int): AssetFeatures = {
    val bytes = a.payload
    var sum = 0L; var crc = 1L
    var i = 0
    while (i < bytes.length) { // single pass, no boxing — hot path shape
      val b = bytes(i) & 0xff
      sum += b
      crc = crc * 31 + b
      i += 1
    }
    val (tw, th) = resizeDims(a.width, a.height, thumbEdge)
    val frames = if (a.modality == "video") math.max(1, (a.duration_ms / 1000L).toInt) else 1
    AssetFeatures(a.asset_id, a.modality, bytes.length.toLong,
      if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length, crc, tw, th, frames)
  }

  /** Aspect-preserving resize arithmetic (real, not stubbed). */
  def resizeDims(w: Int, h: Int, edge: Int): (Int, Int) =
    if (w >= h) (edge, math.max(1, math.round(edge.toDouble * h / w).toInt))
    else (math.max(1, math.round(edge.toDouble * w / h).toInt), edge)

  /** Frame sampling: one "frame" payload slice per second of video —
    * explodes bounded by duration, keyed for downstream per-frame ops. */
  def sampleFrames(assets: Dataset[Asset], everyMs: Long = 1000L): DataFrame =
    assets.toDF()
      // zero-length videos yield no frames (a duration-0 asset has
      // nothing to sample; emitting a phantom frame 0 diverged from the
      // frame-count arithmetic downstream)
      .filter(col("modality") === "video" && col("duration_ms") > 0)
      .select(col("asset_id"), col("duration_ms"),
        explode(sequence(lit(0L),
          col("duration_ms") - 1, lit(everyMs))).as("frame_ts_ms"))
      .withColumn("frame_idx",
        (col("frame_ts_ms") / everyMs).cast("int"))

  /** Per-modality feature rollup — the query surface over decoded
    * features (oracle-checkable arithmetic on top of the stub). */
  def modalityStats(features: Dataset[AssetFeatures]): DataFrame =
    features.toDF()
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_assets"),
           sum(col("n_bytes")).as("total_bytes"),
           round(avg(col("mean_byte")), 4).as("avg_mean_byte"),
           sum(col("n_frames")).cast("long").as("total_frames"))
}
