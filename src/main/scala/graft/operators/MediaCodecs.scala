package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL media codecs, JDK-only (SURVEY.md §2.11 L4): PNG via
  * `javax.imageio`, WAV/PCM via `javax.sound.sampled`, and multi-frame
  * animated GIF via the `javax.imageio` sequence reader/writer — all
  * ship with Java 17, so image, audio AND video-shaped (frame-sequence)
  * decode need no external libraries. GIF is the JDK's one real
  * multi-frame container, so it carries the video modality: per-frame
  * raster decode, frame counting, and frame sampling all run a true
  * codec (single-image MP4-style codecs don't exist in the JDK and
  * would need external deps, which the container forbids).
  *
  * Everything here is a PURE PER-ROW function over payload bytes —
  * exactly the shape that runs inside `mapPartitions` on executors with
  * no shuffle, and exactly the shape the export-and-recompute oracle
  * pattern can consume (Verify exports decoded rows; DuckDB redoes the
  * relational remainder: rollups, Hamming-distance near-dup joins).
  *
  * aHash (average hash): decode → grayscale 8×8 resize → 64 bits, bit i
  * set iff pixel i is brighter than the image mean. Two images within a
  * few bit flips are perceptual near-duplicates — the image-modality
  * member of the dedup family (L2), joinable by Hamming distance
  * (DuckDB: bit_count(xor(a, b))).
  */
object MediaCodecs {

  final case class ImageFeatures(width: Int, height: Int, meanLuma: Double,
                                 aHash: Long, thumbW: Int, thumbH: Int)

  final case class WavFeatures(sampleRate: Int, channels: Int, nFrames: Long,
                               durationMs: Long, rms: Double)

  // ---------------------------------------------------------------- image

  /** Integer-exact luma (the BT.601 weights scaled by 1000) so decode
    * features are bit-stable across JVMs — no float rounding per pixel. */
  @inline private def luma1000(rgb: Int): Long = {
    val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
    299L * r + 587L * g + 114L * b
  }

  /** a*b > c*d over nonnegative longs, exact at ANY magnitude via the
    * 128-bit product (Math.multiplyHigh + unsigned low-word compare) —
    * the 64-bit cross-multiply overflows around 48 MP full-brightness
    * images, which would silently corrupt aHash bits on real photos. */
  @inline private def prodGt(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b); val hi2 = Math.multiplyHigh(c, d)
    hi1 > hi2 ||
      (hi1 == hi2 && java.lang.Long.compareUnsigned(a * b, c * d) > 0)
  }

  /** Shared raster features over ANY decoded frame: (w, h, total
    * luma×1000, 64-bit aHash). Integer-exact throughout (the aHash
    * bit test is an exact 128-bit cross-multiply), so features are
    * bit-stable across JVMs and image sizes. */
  private def rasterFeatures(img: BufferedImage): (Int, Int, Long, Long) = {
    val (w, h) = (img.getWidth, img.getHeight)
    var total = 0L
    val cell = Array.ofDim[Long](64)
    val cellN = Array.ofDim[Long](64)
    // row-chunked bulk getRGB: one raster access + colorspace pass per
    // chunk instead of per PIXEL (per-pixel getRGB re-resolves the
    // color model every call — measured ~3x on the decode path); the
    // chunk bounds the staging buffer to ~4 MB for arbitrarily large
    // images, and bulk getRGB converts each element through the same
    // ColorModel.getRGB as the scalar call, so values are identical
    val chunkRows = math.max(1, math.min(h, (1 << 20) / math.max(1, w)))
    val buf = new Array[Int](w * chunkRows)
    var y0 = 0
    while (y0 < h) {
      val rows = math.min(chunkRows, h - y0)
      img.getRGB(0, y0, w, rows, buf, 0, w)
      var r = 0
      while (r < rows) {
        val y = y0 + r
        val cy = math.min(7, y * 8 / h) * 8
        val off = r * w
        var x = 0
        while (x < w) {
          val l = luma1000(buf(off + x))
          total += l
          val c = cy + math.min(7, x * 8 / w)
          cell(c) += l; cellN(c) += 1
          x += 1
        }
        r += 1
      }
      y0 += rows
    }
    val n = w.toLong * h
    // average-hash bits from the 8x8 cell means vs the global mean —
    // cross-multiplication, no division, so exactly stable
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (cellN(i) > 0 && prodGt(cell(i), n, total, cellN(i))) bits |= (1L << i)
      i += 1
    }
    (w, h, total, bits)
  }

  /** REAL areal resize: partition the raster into a gw×gh grid (cell
    * boundaries floor(i·dim/g) — every pixel lands in exactly one
    * cell) and return per-cell (luma1000 sum, pixel count) in
    * row-major order. Integer-exact, so the resized raster is
    * bit-stable across JVMs, and the cell mean (sum / (1000·count))
    * is one IEEE division away — engine-stable for the oracle. This
    * is the aHash downsample generalized to any target geometry: the
    * L4 `resize` verb as a standalone operator rather than a hash
    * ingredient. */
  def resizeCells(img: BufferedImage, gw: Int, gh: Int): (Array[Long], Array[Long]) = {
    val (w, h) = (img.getWidth, img.getHeight)
    val sum = Array.ofDim[Long](gw * gh)
    val cnt = Array.ofDim[Long](gw * gh)
    val chunkRows = math.max(1, math.min(h, (1 << 20) / math.max(1, w)))
    val buf = new Array[Int](w * chunkRows)
    var y0 = 0
    while (y0 < h) {
      val rows = math.min(chunkRows, h - y0)
      img.getRGB(0, y0, w, rows, buf, 0, w)
      var r = 0
      while (r < rows) {
        val cy = math.min(gh - 1, (y0 + r) * gh / h) * gw
        val off = r * w
        var x = 0
        while (x < w) {
          val c = cy + math.min(gw - 1, x * gw / w)
          sum(c) += luma1000(buf(off + x)); cnt(c) += 1
          x += 1
        }
        r += 1
      }
      y0 += rows
    }
    (sum, cnt)
  }

  /** Features of an already-decoded raster (also the decode side's
    * ground truth: specs compare codec round-trips against this run
    * directly on the source BufferedImage). */
  def imageFeatures(img: BufferedImage, thumbEdge: Int): ImageFeatures = {
    val (w, h, total, bits) = rasterFeatures(img)
    val (tw, th) = Multimodal.resizeDims(w, h, thumbEdge)
    ImageFeatures(w, h, total.toDouble / (1000.0 * w.toLong * h), bits, tw, th)
  }

  /** Decode PNG/JPEG/BMP/GIF bytes: REAL dimensions and mean luma from
    * the decoded raster, 64-bit aHash from an areal 8x8 downsample, and
    * the aspect-preserving thumbnail dims for `thumbEdge`. */
  def decodeImage(payload: Array[Byte], thumbEdge: Int): ImageFeatures = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    imageFeatures(img, thumbEdge)
  }

  /** Deterministic REAL PNG: seeded dims and a seeded 8x8-block SCENE
    * (each block gets its own brightness, plus fine gradient texture),
    * encoded through ImageIO — the decode side then exercises the real
    * codec, PNG is lossless so expectations are exact, and distinct
    * seeds give distinct coarse structure (so unrelated aHashes are
    * far apart, like unrelated photos). */
  def makePng(seed: Long, flipPixels: Int = 0): Array[Byte] = {
    val rnd = new scala.util.Random(0x1111abcdL ^ seed)
    val w = 48 + (math.floorMod(seed, 48)).toInt
    val h = 32 + (math.floorMod(seed >> 3, 48)).toInt
    val scene = Array.fill(64)(rnd.nextInt(256))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = scene(math.min(7, y * 8 / h) * 8 + math.min(7, x * 8 / w))
        val r = (base + (x % 8) * 4) & 0xff
        val g = (base + (y % 8) * 4) & 0xff
        val b = base & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    // near-dup planting: flip a few pixels (tiny aHash perturbation)
    val frnd = new scala.util.Random(0x5ca1eL ^ seed)
    (0 until flipPixels).foreach { _ =>
      img.setRGB(frnd.nextInt(w), frnd.nextInt(h), frnd.nextInt())
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  // ---------------------------------------------------------------- video

  final case class FrameFeatures(frameIdx: Int, width: Int, height: Int,
                                 meanLuma: Double, aHash: Long)

  /** Decode an animated GIF through the real `javax.imageio` sequence
    * reader (`getNumImages(true)` + `read(i)`): one FrameFeatures row
    * per STORED frame — the same raster features as still images,
    * computed per frame. This is the real multi-frame decode path the
    * video modality runs (the JDK's only multi-frame container). */
  def decodeGif(payload: Array[Byte]): Seq[FrameFeatures] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    val readers = ImageIO.getImageReaders(iis)
    require(readers.hasNext, "undecodable gif payload")
    val reader = readers.next()
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      (0 until n).map { i =>
        val (w, h, total, bits) = rasterFeatures(reader.read(i))
        FrameFeatures(i, w, h, total.toDouble / (1000.0 * w.toLong * h), bits)
      }
    } finally { reader.dispose(); iis.close() }
  }

  /** Frame count of `makeGif(seed)` — derivable without decoding, so
    * asset generation can stamp the true duration. */
  def gifFrames(seed: Long): Int = 2 + math.floorMod(seed, 7).toInt

  /** One seeded frame of the synthetic GIF: an 8x8-block grayscale
    * scene, drawn through an explicit 256-gray IndexColorModel so the
    * GIF palette encode is LOSSLESS — decode expectations stay exact,
    * like PNG's. Each frame gets its own scene (frames differ). */
  def gifFrame(seed: Long, idx: Int): BufferedImage = {
    val rnd = new scala.util.Random(0x61fabcdL ^ (seed * 131 + idx))
    val w = 40 + math.floorMod(seed, 40).toInt
    val h = 32 + math.floorMod(seed >> 2, 32).toInt
    val grays = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
    val scene = Array.fill(64)(rnd.nextInt(256))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = scene(math.min(7, y * 8 / h) * 8 + math.min(7, x * 8 / w))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Deterministic REAL multi-frame GIF: `gifFrames(seed)` seeded
    * scenes written through the real `javax.imageio` sequence writer
    * (`prepareWriteSequence`/`writeToSequence`). */
  def makeGif(seed: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until gifFrames(seed)).foreach { i =>
        writer.writeToSequence(
          new javax.imageio.IIOImage(gifFrame(seed, i), null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** q155 shot geometry: [[shotGifFrames]] frames per asset; the
    * transition into frame `idx` is a CUT iff the deterministic
    * per-transition coin lands 0 (≈1/3 of transitions), and frames
    * WITHIN a shot repeat the shot's scene with a one-block jitter —
    * so consecutive-frame aHash Hamming is bimodal BY CONSTRUCTION
    * (≈0–3 within a shot, ≈25–40 across a cut), the same
    * signal-planting move [[makeWavBursts]] makes for VAD (makeGif's
    * every-frame-a-new-scene streams are all-cut by design). */
  def shotGifFrames(seed: Long): Int = 8 + math.floorMod(seed, 5).toInt

  /** Is the transition (idx−1 → idx) a planted cut? (idx ≥ 1.) The
    * coin is a splitmix64-style finalizer — a plain linear-congruence
    * mod 3 degenerates to (seed+idx) mod 3 (any odd multiplier ≡ 1
    * mod 3), which plants perfectly periodic length-3 shots. */
  def shotCut(seed: Long, idx: Int): Boolean = idx > 0 && {
    var z = seed * 0x9E3779B97F4A7C15L + idx * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    math.floorMod(z ^ (z >>> 31), 3) == 0
  }

  /** Which shot (scene) frame `idx` belongs to: cuts seen so far. */
  def shotSceneIdx(seed: Long, idx: Int): Int =
    (1 to idx).count(shotCut(seed, _))

  /** One frame of the shot-structured GIF: the shot's seeded 8x8-block
    * grayscale scene (fixed 48x40 canvas — cells align with the aHash
    * grid), with ONE block nudged by a small idx-dependent delta so
    * within-shot frames differ without moving the hash. Gray values
    * stay in [28, 227]+-24, inside the lossless indexed palette. */
  def shotFrame(seed: Long, idx: Int): BufferedImage = {
    val rnd = new scala.util.Random(0x5407abcL ^ (seed * 733 + shotSceneIdx(seed, idx)))
    val (w, h) = (48, 40)
    val grays = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
    val scene = Array.fill(64)(rnd.nextInt(200) + 28)
    val j = math.floorMod(idx * 37, 64)
    scene(j) = math.max(0, math.min(255,
      scene(j) + (math.floorMod(idx, 3) - 1) * 24))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = scene(math.min(7, y * 8 / h) * 8 + math.min(7, x * 8 / w))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Deterministic REAL shot-structured multi-frame GIF — the same
    * `javax.imageio` sequence writer as [[makeGif]]. */
  def makeShotGif(seed: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until shotGifFrames(seed)).foreach { i =>
        writer.writeToSequence(
          new javax.imageio.IIOImage(shotFrame(seed, i), null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  // ---------------------------------------------------------------- audio

  /** Decode WAV bytes through the real RIFF/PCM parser: format, frame
    * count, duration, and RMS over the 16-bit samples. */
  def decodeWav(payload: Array[Byte]): WavFeatures = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    try {
      val fmt = in.getFormat
      val frames = in.getFrameLength
      val bytes = in.readAllBytes()
      var sumSq = 0.0
      var i = 0
      while (i + 1 < bytes.length) { // 16-bit little-endian PCM
        val s = ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort.toDouble
        sumSq += s * s
        i += 2
      }
      val nSamples = bytes.length / 2
      WavFeatures(fmt.getSampleRate.toInt, fmt.getChannels, frames,
        (frames * 1000L) / fmt.getSampleRate.toLong,
        if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples))
    } finally in.close()
  }

  /** Deterministic REAL mono 16-bit WAV: a seeded-frequency sine with a
    * seeded length, written through the real RIFF encoder. */
  def makeWav(seed: Long): Array[Byte] = {
    val rate = 8000
    val ms = 50 + math.floorMod(seed, 150)
    val freq = 200.0 + math.floorMod(seed >> 2, 1800).toDouble
    val n = (rate * ms / 1000L).toInt
    val pcm = Array.ofDim[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (math.sin(2 * math.Pi * freq * i / rate) * 12000).toInt.toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val stream = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** q148 burst geometry: 50 ms (400-sample) alternating tone/silence
    * blocks — real speech-shaped on/off structure so VAD has something
    * to detect (makeWav's continuous sine is all-active by design). */
  val BurstBlock = 400

  /** Deterministic REAL mono 16-bit WAV of alternating sine bursts and
    * TRUE silence: block b is on iff (b + seed) is even, so half the
    * assets lead with silence. Same RIFF encoder as [[makeWav]]. */
  def makeWavBursts(seed: Long): Array[Byte] = {
    val rate = 8000
    val ms = 120 + math.floorMod(seed, 200)
    val freq = 200.0 + math.floorMod(seed >> 2, 1800).toDouble
    val n = (rate * ms / 1000L).toInt
    val pcm = Array.ofDim[Byte](n * 2)
    var i = 0
    while (i < n) {
      val on = math.floorMod(i / BurstBlock + seed, 2) == 0L
      val s = if (on) (math.sin(2 * math.Pi * freq * i / rate) * 12000).toInt.toShort
              else 0.toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val stream = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Per-window integer energies over a WAV payload's 16-bit PCM via
    * the real RIFF parser: (win_idx, n_samples, Σ s²). Energy is an
    * exact BIGINT (|s| ≤ 32767 → ≤ win·2³⁰ per window), so the VAD
    * decision downstream is pure integer algebra. */
  /** Per-window integer (energy, zero-crossing count) over a WAV
    * payload — the two classic frame features of voiced/unvoiced
    * segmentation (q232): zc counts STRICT sign changes between
    * consecutive samples inside the window (s·prev < 0 — silence
    * contributes none), so both features stay exact integers and the
    * downstream gates are pure integer algebra like q148's VAD. */
  def wavWindowStats(payload: Array[Byte],
                     win: Int): Array[(Int, Int, Long, Long)] = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    try {
      val bytes = in.readAllBytes()
      val nSamples = bytes.length / 2
      def sample(i: Int): Long =
        ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toLong
      val nWin = (nSamples + win - 1) / win
      Array.tabulate(nWin) { wi =>
        var e = 0L; var zc = 0L
        var i = wi * win
        val end = math.min(nSamples, i + win)
        val n = end - i
        while (i < end) {
          val s = sample(i)
          e += s * s
          if (i > wi * win && s * sample(i - 1) < 0) zc += 1
          i += 1
        }
        (wi, n, e, zc)
      }
    } finally in.close()
  }

  def wavWindowEnergies(payload: Array[Byte], win: Int): Array[(Int, Int, Long)] = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    try {
      val bytes = in.readAllBytes()
      val nSamples = bytes.length / 2
      val nWin = (nSamples + win - 1) / win
      Array.tabulate(nWin) { wi =>
        var e = 0L
        var i = wi * win
        val end = math.min(nSamples, i + win)
        val n = end - i
        while (i < end) {
          val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toLong
          e += s * s
          i += 1
        }
        (wi, n, e)
      }
    } finally in.close()
  }
}
