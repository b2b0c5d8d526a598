package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import graft.operators.{MediaCodecs, Multimodal}

/** The REAL media codecs: exact round-trips through javax.imageio and
  * javax.sound.sampled, aHash behavior on planted perturbations, and
  * the Spark decode dispatch over the generated corpus. */
class MediaCodecsSpec extends SparkTestBase {

  test("PNG round-trip is exact on a known raster") {
    // 2x1 image with hand-picked pixels: PNG is lossless, so the decode
    // must reproduce dimensions and the integer-exact BT.601 mean
    val img = new BufferedImage(2, 1, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000) // pure red   -> luma 299*255
    img.setRGB(1, 0, 0x0000ff) // pure blue  -> luma 114*255
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    val f = MediaCodecs.decodeImage(out.toByteArray, thumbEdge = 8)
    assert(f.width == 2 && f.height == 1)
    assert(f.meanLuma == (299.0 * 255 + 114.0 * 255) / (1000.0 * 2))
    assert((f.thumbW, f.thumbH) == (8, 4)) // aspect floor is 1... 2:1 -> (8,4)
  }

  test("generated PNGs decode to their seeded dimensions") {
    (0L until 30L by 3).foreach { seed =>
      val f = MediaCodecs.decodeImage(MediaCodecs.makePng(seed), 64)
      assert(f.width == 48 + math.floorMod(seed, 48).toInt, s"seed $seed")
      assert(f.height == 32 + math.floorMod(seed >> 3, 48).toInt, s"seed $seed")
      assert(f.meanLuma > 0 && f.meanLuma < 255)
    }
  }

  test("aHash: identical images collide, few-pixel flips stay within Hamming 3, distinct scenes do not") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    (0L until 60L by 6).foreach { seed =>
      val base = MediaCodecs.decodeImage(MediaCodecs.makePng(seed), 64).aHash
      val same = MediaCodecs.decodeImage(MediaCodecs.makePng(seed), 64).aHash
      assert(base == same, "decode must be deterministic")
      val dup = MediaCodecs.decodeImage(
        MediaCodecs.makePng(seed, flipPixels = 3), 64).aHash
      assert(ham(base, dup) <= 3, s"seed $seed: planted dup drifted ${ham(base, dup)} bits")
      val other = MediaCodecs.decodeImage(MediaCodecs.makePng(seed + 1), 64).aHash
      assert(ham(base, other) > 3, s"seed $seed: unrelated scenes too close")
    }
  }

  test("resizeCells: every pixel lands in exactly one cell and sums match a scalar recount") {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(MediaCodecs.makePng(7L)))
    val (gw, gh) = (8, 6)
    val (sum, cnt) = MediaCodecs.resizeCells(img, gw, gh)
    val (w, h) = (img.getWidth, img.getHeight)
    assert(cnt.sum === w.toLong * h, "cells must partition the raster")
    // brute-force per-pixel recount with the same floor-boundary rule
    val bsum = Array.ofDim[Long](gw * gh); val bcnt = Array.ofDim[Long](gw * gh)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val l = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
        114L * (rgb & 0xff)
      val c = math.min(gh - 1, y * gh / h) * gw + math.min(gw - 1, x * gw / w)
      bsum(c) += l; bcnt(c) += 1
    }
    assert(sum.toSeq == bsum.toSeq && cnt.toSeq == bcnt.toSeq,
      "chunked bulk path must equal the scalar path cell for cell")
    // degenerate geometry: resizing DOWN to 1x1 recovers the global sum
    val (s1, c1) = MediaCodecs.resizeCells(img, 1, 1)
    assert(s1(0) === sum.sum && c1(0) === w.toLong * h)
  }

  test("WAV round-trip: format, frame count, duration, and sine RMS") {
    (1L until 30L by 3).foreach { seed =>
      val f = MediaCodecs.decodeWav(MediaCodecs.makeWav(seed))
      val ms = 50 + math.floorMod(seed, 150)
      assert(f.sampleRate == 8000 && f.channels == 1, s"seed $seed")
      assert(f.nFrames == 8000 * ms / 1000, s"seed $seed")
      assert(f.durationMs == (f.nFrames * 1000) / 8000)
      // a full-scale sine at amplitude A has RMS A/sqrt(2); quantization
      // and partial final cycle keep it within a few percent
      val expected = 12000.0 / math.sqrt(2.0)
      assert(math.abs(f.rms - expected) / expected < 0.05,
        s"seed $seed: rms ${f.rms} vs $expected")
    }
  }

  test("decodeMedia dispatch: every modality runs a real JDK codec") {
    import spark.implicits._
    val ids = spark.range(60).toDF("doc_id")
    val feats = Multimodal.decodeMedia(Multimodal.realAssets(ids)).toDF().cache()
    assert(feats.filter(!col("real_decode")).count() == 0,
      "no modality may fall back to the byte-stat stub")
    // image rows carry true dims, audio rows true sample geometry,
    // video rows true stored frame counts (2..8 by construction)
    assert(feats.filter(col("modality") === "image" &&
      (col("width") < 48 || col("height") < 32)).count() == 0)
    assert(feats.filter(col("modality") === "audio" &&
      col("sample_rate") =!= 8000).count() == 0)
    assert(feats.filter(col("modality") === "video" &&
      (col("n_frames") < 2 || col("n_frames") > 8)).count() == 0)
  }

  test("GIF multi-frame round-trip: frame count, dims, and per-frame rasters are exact") {
    (2L until 44L by 3).foreach { seed =>
      val frames = MediaCodecs.decodeGif(MediaCodecs.makeGif(seed))
      assert(frames.size == MediaCodecs.gifFrames(seed), s"seed $seed")
      assert(frames.map(_.frameIdx) == frames.indices.toSeq)
      frames.foreach { f =>
        assert(f.width == 40 + math.floorMod(seed, 40).toInt, s"seed $seed")
        assert(f.height == 32 + math.floorMod(seed >> 2, 32).toInt, s"seed $seed")
      }
      // the indexed-gray palette makes GIF lossless: each decoded
      // frame's features must EXACTLY equal those of the source
      // BufferedImage (note: a PNG round-trip would NOT work as the
      // cross-check — Java's PNG reader hands back indexed-gray as
      // TYPE_BYTE_GRAY in the linear gray colorspace, so getRGB
      // gamma-shifts every pixel; GIF preserves the palette raster)
      frames.zipWithIndex.foreach { case (f, i) =>
        val direct = MediaCodecs.imageFeatures(MediaCodecs.gifFrame(seed, i), 64)
        assert(f.meanLuma == direct.meanLuma && f.aHash == direct.aHash,
          s"seed $seed frame $i: GIF decode diverged from the raster")
      }
      // distinct frames: scenes are seeded per (seed, idx)
      assert(frames.map(_.aHash).distinct.size > 1, s"seed $seed: frames identical")
    }
  }

  test("sampleFrames' duration grid hits exactly the real stored frames") {
    import spark.implicits._
    val ids = spark.range(60).toDF("doc_id")
    val assets = Multimodal.realAssets(ids)
    val sampled = Multimodal.sampleFrames(assets, everyMs = Multimodal.FrameMs)
      .groupBy(col("asset_id")).count()
      .as[(Long, Long)].collect().toMap
    val real = Multimodal.videoFrames(assets).toDF()
      .groupBy(col("asset_id")).count()
      .as[(Long, Long)].collect().toMap
    assert(real.nonEmpty && sampled == real,
      "sampler keys must map 1:1 onto decoded frames")
    // the payload-free metadata path must stay in lockstep with the
    // durations realAssets stamps (same gifFrames arithmetic)
    val meta = Multimodal.videoAssetMeta(ids)
      .select("asset_id", "duration_ms").as[(Long, Long)].collect().toMap
    val stamped = assets.toDF().filter(col("modality") === "video")
      .select("asset_id", "duration_ms").as[(Long, Long)].collect().toMap
    assert(meta == stamped, "videoAssetMeta drifted from generated durations")
  }

  test("banded aHash join recovers exactly the all-pairs Hamming<=3 set") {
    import spark.implicits._
    val got = graft.operators.MultimodalQueries.queries("q78_image_neardup")(spark, sf)
      .select("asset_a", "asset_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    // oracle mirror: brute-force all pairs over the same decoded hashes
    val hashes = Multimodal.decodeMedia(
        Multimodal.realAssets(Tables.documents(spark, sf).select("doc_id")))
      .toDF().filter(col("modality") === "image")
      .select("asset_id", "ahash").as[(Long, Long)].collect()
    val want = (for {
      (a, ha) <- hashes.iterator
      (b, hb) <- hashes.iterator if a < b
      h = java.lang.Long.bitCount(ha ^ hb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(got == want, s"banding lost ${(want -- got).size}, fabricated ${(got -- want).size}")
    assert(want.nonEmpty, "planted near-dups must produce at least one pair")
  }

  test("burst WAV: silence blocks carry exactly zero energy; windows match the generation law") {
    import graft.operators.{MediaCodecs, Multimodal}
    (1L until 40L by 3).foreach { seed =>
      val wins = MediaCodecs.wavWindowEnergies(
        MediaCodecs.makeWavBursts(seed), Multimodal.VadWin)
      val ms = 120 + math.floorMod(seed, 200)
      val n = (8000 * ms / 1000L).toInt
      assert(wins.map(_._2).sum == n, s"seed $seed: window partition lost samples")
      assert(wins.map(_._1).toSeq == wins.indices, s"seed $seed: indices")
      wins.foreach { case (wi, nw, e) =>
        // replay the burst law sample-for-sample: which of this
        // window's samples fall in ON blocks (block = 400 samples,
        // on iff (i/400 + seed) even)?
        val onSamples = (wi * Multimodal.VadWin until wi * Multimodal.VadWin + nw)
          .count(i => math.floorMod(i / MediaCodecs.BurstBlock + seed, 2) == 0L)
        if (onSamples == 0)
          assert(e == 0L, s"seed $seed win $wi: silence must be EXACTLY zero")
        else assert(e > 0L, s"seed $seed win $wi: tone window with zero energy")
        // the VAD gate: a fully-on window always clears it, a fully-off
        // window never does (the integer inequality q148 applies)
        val active = e * 4 >= nw.toLong * Multimodal.VadAmpSq
        if (onSamples == nw && nw == Multimodal.VadWin)
          assert(active, s"seed $seed win $wi: full tone window inactive")
        if (onSamples == 0) assert(!active, s"seed $seed win $wi")
      }
      // non-trivial structure: every asset has both active and silent windows
      val flags = wins.map { case (_, nw, e) =>
        e * 4 >= nw.toLong * Multimodal.VadAmpSq }
      assert(flags.contains(true) && flags.contains(false),
        s"seed $seed: VAD must split the asset")
    }
  }

  test("q148: per-asset VAD rollup equals a driver replay over the window energies") {
    import graft.operators.{MediaCodecs, Multimodal}
    val got = SparkEntry.queries("q148_audio_vad")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).filter(_ % 3 == 1)
    assert(got.keySet == ids.toSet, "one row per audio asset")
    ids.foreach { id =>
      val wins = MediaCodecs.wavWindowEnergies(
        MediaCodecs.makeWavBursts(id), Multimodal.VadWin)
      val act = wins.filter { case (_, nw, e) =>
        e * 4 >= nw.toLong * Multimodal.VadAmpSq }
      val want = (wins.length.toLong, act.length.toLong,
        act.headOption.map(_._1.toLong).getOrElse(-1L),
        act.lastOption.map(_._1.toLong).getOrElse(-1L),
        wins.map(_._3).sum)
      assert(got(id) == want, s"asset $id: ${got(id)} != $want")
    }
  }

  test("q253: color profile equals a driver pixel replay; octants non-degenerate") {
    import graft.operators.MediaCodecs
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).filter(_ % 3 == 0)
    // driver replay: decode every PNG and recount octants exactly
    val perAsset = ids.map { id =>
      val nearDup = id >= 3 && (id / 3) % 5 == 1
      val png = if (nearDup) MediaCodecs.makePng(id - 3, flipPixels = 3)
                else MediaCodecs.makePng(id)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      val counts = new Array[Long](8)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        val b = (if (((rgb >> 16) & 0xff) >= 128) 4 else 0) +
                (if (((rgb >> 8) & 0xff) >= 128) 2 else 0) +
                (if ((rgb & 0xff) >= 128) 1 else 0)
        counts(b) += 1
      }
      counts
    }
    val nPx = (0 until 8).map(b => perAsset.map(_(b)).sum)
    val tPx = nPx.sum
    val nDom = (0 until 8).map(b => perAsset.count { c =>
      val best = c.zipWithIndex.maxBy { case (px, bk) => (px, -bk) }._2
      best == b
    }.toLong)
    val got = SparkEntry.queries("q253_color_profile")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == (0L to 7L).toSet, "all 8 octants must report")
    (0 until 8).foreach { b =>
      val share = BigInt(nPx(b)) * 1000000 / tPx
      assert(got(b.toLong) == ((nPx(b), share.toLong, nDom(b))),
        s"bucket $b: ${got(b.toLong)} != ${(nPx(b), share.toLong, nDom(b))}")
    }
    // the generator's per-octant structure must actually spread —
    // a one-bucket corpus would leave the argmax and grid paths idle
    assert(nPx.count(_ > 0) >= 3, s"degenerate octant spread: $nPx")
    assert(nDom.count(_ > 0) >= 2, s"degenerate dominant spread: $nDom")
  }

  test("q232: ZCR segmentation equals a driver replay; both classes occur corpus-wide") {
    import graft.operators.{MediaCodecs, Multimodal}
    val got = SparkEntry.queries("q232_audio_zcr")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).filter(_ % 3 == 1)
    assert(got.keySet == ids.toSet, "one row per audio asset")
    var voicedSeen = 0L; var unvoicedSeen = 0L
    ids.foreach { id =>
      val wins = MediaCodecs.wavWindowStats(
        MediaCodecs.makeWavBursts(id), Multimodal.VadWin)
      def active(w: (Int, Int, Long, Long)) =
        w._3 * 4 >= w._2.toLong * Multimodal.VadAmpSq
      def voiced(w: (Int, Int, Long, Long)) =
        active(w) && w._4 * 8 < w._2.toLong
      val a = wins.count(active).toLong
      val v = wins.count(voiced).toLong
      // longest voiced run via the same gaps-and-islands identity
      val runs = wins.filter(voiced).map(_._1).sorted.zipWithIndex
        .groupBy { case (wi, i) => wi - i }.values
        .map(_.size.toLong)
      val want = (wins.length.toLong, a, v, a - v, wins.map(_._4).sum,
        if (runs.isEmpty) 0L else runs.max)
      assert(got(id) == want, s"asset $id: ${got(id)} != $want")
      voicedSeen += v; unvoicedSeen += a - v
    }
    // the classifier must discriminate on this corpus: the synthetic
    // burst frequencies span 200–2000 Hz, so both classes occur
    assert(voicedSeen > 0 && unvoicedSeen > 0,
      s"one-sided classifier (voiced=$voicedSeen unvoiced=$unvoicedSeen)")
    // energy windows agree with q148's decode (same RIFF path)
    ids.take(3).foreach { id =>
      val e1 = MediaCodecs.wavWindowEnergies(
        MediaCodecs.makeWavBursts(id), Multimodal.VadWin).map(_._3).toSeq
      val e2 = MediaCodecs.wavWindowStats(
        MediaCodecs.makeWavBursts(id), Multimodal.VadWin).map(_._3).toSeq
      assert(e1 == e2, s"asset $id: stats/energies decode divergence")
    }
  }

  test("q155: detected cuts recover the PLANTED shot structure; signal is bimodal") {
    import graft.operators.{MediaCodecs, Multimodal}
    val ids = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).filter(_ % 3 == 2)
    // decode through the REAL reader and measure the actual signal
    var withinMax = 0L
    var cutMin = Long.MaxValue
    val want = ids.map { id =>
      val frames = MediaCodecs.decodeGif(MediaCodecs.makeShotGif(id))
      assert(frames.length == MediaCodecs.shotGifFrames(id), s"asset $id frames")
      val cuts = (1 until frames.length).filter { i =>
        val ham = java.lang.Long.bitCount(frames(i).aHash ^ frames(i - 1).aHash)
        val planted = MediaCodecs.shotCut(id, i)
        if (planted) cutMin = math.min(cutMin, ham)
        else withinMax = math.max(withinMax, ham)
        ham >= Multimodal.ShotHamMin
      }
      // the detector recovers exactly the planted boundaries
      assert(cuts == (1 until frames.length).filter(MediaCodecs.shotCut(id, _)),
        s"asset $id: detected $cuts != planted")
      id -> ((frames.length.toLong, cuts.length + 1L, cuts.length.toLong))
    }.toMap
    val got = SparkEntry.queries("q155_shot_detect")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == want.keySet, "one row per video asset")
    want.foreach { case (id, w) =>
      assert(got(id) == w, s"asset $id: ${got(id)} != $w")
    }
    // the planted signal really is bimodal around the gate
    assert(withinMax < Multimodal.ShotHamMin && cutMin >= Multimodal.ShotHamMin,
      s"signal not separated: within-shot max $withinMax, cut min $cutMin, " +
        s"gate ${Multimodal.ShotHamMin}")
    // non-degenerate corpus: some asset has cuts, some shot is longer than 1
    assert(want.values.exists(_._3 > 0) && withinMax >= 0 && cutMin < Long.MaxValue)
  }
}
