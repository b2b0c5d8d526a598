package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder contract: opaque `binary` payload
  * + typed metadata struct, decode / feature-extract / resize /
  * frame-sample as per-partition batch transforms).
  *
  * ALL THREE modalities decode for REAL — `decodeMedia` dispatches PNG
  * to `javax.imageio`, WAV to `javax.sound.sampled`, and the video
  * modality to the `javax.imageio` multi-frame GIF sequence reader
  * (the JDK's one true multi-frame container; see MediaCodecs, exact
  * round-trips in MediaCodecsSpec). `decodeStub` is kept as the
  * all-modality byte-stat fake that q35/q36 exercise over text-bytes
  * payloads — it documents the plumbing contract a codec-less mime
  * would flow through. Either way the Spark shape is identical:
  * schema, binary column handling, typed Dataset batching, partition
  * parallelism, metadata propagation.
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

  /** Unified decoded-media row. `real_decode` separates the modalities
    * that run an ACTUAL codec (image: javax.imageio, audio:
    * javax.sound.sampled — see MediaCodecs) from the disclosed video
    * stub (the JDK has no video codec). Unused fields are zero for a
    * modality (e.g. sample_rate for images). */
  case class MediaFeatures(asset_id: Long, modality: String, n_bytes: Long,
                           width: Int, height: Int, mean_luma: Double,
                           ahash: Long, sample_rate: Int, n_frames: Long,
                           duration_ms: Long, rms: Double, real_decode: Boolean)

  /** Milliseconds per video frame in the generated corpus: GIF assets
    * are stamped duration_ms = n_frames × FrameMs at generation, so
    * `sampleFrames(everyMs = FrameMs)` emits exactly one key per REAL
    * stored frame (q82 joins the two and proves it every round). */
  val FrameMs = 100L

  /** REAL media corpus from an id column: PNG payloads for ids ≡ 0
    * (mod 3), WAV for ≡ 1, multi-frame GIF for ≡ 2 (the video
    * modality — every payload runs a true JDK codec both ways).
    * Every 5th image is a planted perceptual NEAR-DUP of the previous
    * image id (same scene, 3 pixels flipped), so the aHash near-dup
    * join has known structure to recover. Generation happens on
    * executors (seeded per id, no data movement), the same pattern as
    * PipelineBench's corpus. */
  def realAssets(ids: DataFrame): Dataset[Asset] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        id % 3 match {
          case 0 =>
            val nearDup = id >= 3 && (id / 3) % 5 == 1
            val payload = if (nearDup) MediaCodecs.makePng(id - 3, flipPixels = 3)
                          else MediaCodecs.makePng(id)
            Asset(id, "image", payload, "image/png", 0, 0, 0L)
          case 1 =>
            Asset(id, "audio", MediaCodecs.makeWav(id), "audio/wav", 0, 0, 0L)
          case _ =>
            Asset(id, "video", MediaCodecs.makeGif(id), "image/gif", 0, 0,
              MediaCodecs.gifFrames(id) * FrameMs)
        }
      }
    }
  }

  /** REAL decode dispatch: every generated mime runs a true JDK codec —
    * PNG and WAV per asset, GIF per FRAME (video rows carry first-frame
    * dims + aHash, the across-frames mean luma, and the REAL stored
    * frame count). Unknown mimes fall back to the byte-stat stub,
    * marked real_decode=false. Same mapPartitions shape as decodeStub —
    * payloads never leave executors, no shuffle, bounded feature width. */
  def decodeMedia(assets: Dataset[Asset], thumbEdge: Int = 64): Dataset[MediaFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        a.mime match {
          case "image/png" =>
            val f = MediaCodecs.decodeImage(a.payload, thumbEdge)
            MediaFeatures(a.asset_id, a.modality, a.payload.length.toLong,
              f.width, f.height, f.meanLuma, f.aHash, 0, 1L, 0L, 0.0,
              real_decode = true)
          case "audio/wav" =>
            val f = MediaCodecs.decodeWav(a.payload)
            MediaFeatures(a.asset_id, a.modality, a.payload.length.toLong,
              0, 0, 0.0, 0L, f.sampleRate, f.nFrames, f.durationMs, f.rms,
              real_decode = true)
          case "image/gif" =>
            val frames = MediaCodecs.decodeGif(a.payload)
            MediaFeatures(a.asset_id, a.modality, a.payload.length.toLong,
              frames.head.width, frames.head.height,
              frames.map(_.meanLuma).sum / frames.size, frames.head.aHash,
              0, frames.size.toLong, frames.size * FrameMs, 0.0,
              real_decode = true)
          case _ =>
            val s = decodeOne(a, thumbEdge)
            MediaFeatures(a.asset_id, a.modality, s.n_bytes, 0, 0, 0.0, 0L,
              0, s.n_frames.toLong, a.duration_ms, 0.0, real_decode = false)
        }
      }
    }
  }

  /** One cell of a REAL areal image resize (row-major gw×gh grid):
    * integer luma1000 sum + pixel count, the exact-arithmetic form a
    * relational oracle can roll up. */
  /** q148 VAD geometry: 25 ms (200-sample) analysis windows; a window
    * is ACTIVE iff its mean square clears a quarter of the tone's
    * amplitude square — energy·4 ≥ n·12000², integers only (a tone
    * window carries amp²/2 per sample, silence exactly 0, so the gate
    * sits centrally between the two and boundary windows split by how
    * much tone they actually contain). */
  val VadWin = 200
  val VadAmpSq = 12000L * 12000L

  /** q155 shot-boundary gate: a transition is a CUT iff consecutive
    * frames' aHash Hamming distance ≥ this. Sits centrally in the
    * planted bimodal signal (within-shot jitter flips ≈0–3 bits,
    * scene changes ≈25–40) — interpolated into the oracle. */
  val ShotHamMin = 10L

  /** One decoded frame of a shot-structured GIF asset (q155). */
  case class ShotFrame(asset_id: Long, frame_idx: Int, ahash: Long)

  /** Per-frame aHashes of the shot-structured video slice (ids ≡ 2
    * mod 3, the realAssets video law), through the REAL multi-frame
    * GIF decode — generation + decode both executor-side, the same
    * mapPartitions shape as [[audioWindows]]. */
  def shotFrames(ids: DataFrame): Dataset[ShotFrame] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long")).as[Long]
      .filter(_ % 3 == 2)
      .mapPartitions(_.flatMap { id =>
        MediaCodecs.decodeGif(MediaCodecs.makeShotGif(id)).map(f =>
          ShotFrame(id, f.frameIdx, f.aHash))
      })
  }

  /** One VAD analysis window of a burst-WAV asset. */
  case class AudioWindow(asset_id: Long, win_idx: Int, n_samples: Int,
                         energy: Long)

  /** Per-window integer energies of the audio slice (ids ≡ 1 mod 3,
    * the realAssets modality law), over burst-structured REAL WAVs —
    * generation + decode both executor-side, no payload movement, the
    * same mapPartitions shape as [[decodeMedia]]. */
  def audioWindows(ids: DataFrame): Dataset[AudioWindow] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long")).as[Long]
      .filter(_ % 3 == 1)
      .mapPartitions(_.flatMap { id =>
        MediaCodecs.wavWindowEnergies(MediaCodecs.makeWavBursts(id), VadWin)
          .map { case (wi, n, e) => AudioWindow(id, wi, n, e) }
      })
  }

  /** q232's per-window row: q148's energy window plus the
    * zero-crossing count. */
  case class AudioZWindow(asset_id: Long, win_idx: Int, n_samples: Int,
                          energy: Long, zc: Long)

  def audioZWindows(ids: DataFrame): Dataset[AudioZWindow] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long")).as[Long]
      .filter(_ % 3 == 1)
      .mapPartitions(_.flatMap { id =>
        MediaCodecs.wavWindowStats(MediaCodecs.makeWavBursts(id), VadWin)
          .map { case (wi, n, e, z) => AudioZWindow(id, wi, n, e, z) }
      })
  }

  case class ResizedCell(asset_id: Long, gx: Int, gy: Int,
                         luma_sum: Long, px: Long)

  /** Decode every image asset and downsample it to a gw×gh luma grid
    * (MediaCodecs.resizeCells — floor-boundary areal cells, integer
    * sums). Narrow mapPartitions, payloads never leave executors;
    * output is gw·gh bounded-width rows per image. */
  def resizedCells(assets: Dataset[Asset], gw: Int = 8, gh: Int = 6): Dataset[ResizedCell] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.filter(_.mime == "image/png").flatMap { a =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(a.payload))
        require(img != null, "undecodable image payload")
        val (sum, cnt) = MediaCodecs.resizeCells(img, gw, gh)
        (0 until gw * gh).map { c =>
          ResizedCell(a.asset_id, c % gw, c / gw, sum(c), cnt(c))
        }
      }
    }
  }

  case class ColorCell(asset_id: Long, bucket: Int, px: Long)

  /** Per-asset RGB-octant pixel counts from the REAL PNG decode
    * (bucket = (r≥128)·4 + (g≥128)·2 + (b≥128) — the 8-corner color
    * cube, the coarsest quantization that still separates scenes).
    * Narrow mapPartitions, payloads never leave executors; ≤ 8
    * bounded-width rows per image (empty octants are omitted — the
    * relational tail zero-fills via the explicit bucket grid). */
  def colorCells(assets: Dataset[Asset]): Dataset[ColorCell] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.filter(_.mime == "image/png").flatMap { a =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(a.payload))
        require(img != null, "undecodable image payload")
        val counts = new Array[Long](8)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            val b = (if (((rgb >> 16) & 0xff) >= 128) 4 else 0) +
                    (if (((rgb >> 8) & 0xff) >= 128) 2 else 0) +
                    (if ((rgb & 0xff) >= 128) 1 else 0)
            counts(b) += 1
            x += 1
          }
          y += 1
        }
        (0 until 8).filter(counts(_) > 0)
          .map(b => ColorCell(a.asset_id, b, counts(b)))
      }
    }
  }

  /** Per-frame decoded row for the video modality. */
  case class VideoFrame(asset_id: Long, frame_idx: Int, width: Int,
                        height: Int, mean_luma: Double, ahash: Long)

  /** Explode each GIF asset into its REAL stored frames — per-frame
    * raster features through the actual multi-frame reader. Narrow
    * (flatMap inside mapPartitions, no shuffle); output rows are
    * bounded by true frame counts, not duration arithmetic. */
  def videoFrames(assets: Dataset[Asset]): Dataset[VideoFrame] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.filter(_.mime == "image/gif").flatMap { a =>
        MediaCodecs.decodeGif(a.payload).map { f =>
          VideoFrame(a.asset_id, f.frameIdx, f.width, f.height,
            f.meanLuma, f.aHash)
        }
      }
    }
  }

  /** Aspect-preserving resize arithmetic (real, not stubbed). */
  def resizeDims(w: Int, h: Int, edge: Int): (Int, Int) =
    if (w >= h) (edge, math.max(1, math.round(edge.toDouble * h / w).toInt))
    else (math.max(1, math.round(edge.toDouble * w / h).toInt), edge)

  /** Frame sampling: one "frame" payload slice per second of video —
    * explodes bounded by duration, keyed for downstream per-frame ops. */
  def sampleFrames(assets: Dataset[Asset], everyMs: Long = 1000L): DataFrame =
    sampleFramesDf(assets.toDF(), everyMs)

  /** Same sampler over any frame with (asset_id, modality, duration_ms)
    * — the sampler never reads payload bytes, so callers can feed it
    * payload-free metadata (`videoAssetMeta`) and skip media encode
    * entirely: manual projection pushdown that a typed mapPartitions
    * generator can't get from Catalyst. */
  def sampleFramesDf(assets: DataFrame, everyMs: Long = 1000L): DataFrame =
    assets
      // zero-length videos yield no frames (a duration-0 asset has
      // nothing to sample; emitting a phantom frame 0 diverged from the
      // frame-count arithmetic downstream)
      .filter(col("modality") === "video" && col("duration_ms") > 0)
      .select(col("asset_id"), col("duration_ms"),
        explode(sequence(lit(0L),
          col("duration_ms") - 1, lit(everyMs))).as("frame_ts_ms"))
      .withColumn("frame_idx",
        (col("frame_ts_ms") / everyMs).cast("int"))

  /** Payload-free metadata for the generated video assets: duration is
    * stamped from the SAME `gifFrames(seed)` arithmetic `realAssets`
    * uses (2 + seed mod 7 frames, expressible as a codegen'd column),
    * so grids derived here match the stored frames bit-for-bit without
    * paying a single GIF encode. */
  def videoAssetMeta(ids: DataFrame): DataFrame =
    ids.select(col(ids.columns.head).cast("long").as("asset_id"))
      .filter(col("asset_id") % 3 === 2)
      .select(col("asset_id"), lit("video").as("modality"),
        ((lit(2) + pmod(col("asset_id"), lit(7))) * FrameMs).as("duration_ms"))

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
