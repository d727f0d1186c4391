package graft.operators

/** REAL pixel/sample decode built ONLY on the stock JDK — `javax.imageio`
  * (java.desktop ships PNG/JPEG/GIF/BMP/TIFF readers, headless-safe) and
  * plain byte arithmetic for PCM WAV. This replaces the last stubbed tier
  * of [[Multimodal]]: dimensions, frame counts, pixel features, perceptual
  * hashes and resize are all computed from ACTUAL decoded samples now.
  * Only containers the JDK has no codec for (mp4/mkv video, compressed
  * audio) still fall back to [[Multimodal.StubCodec]].
  *
  * Determinism is load-bearing (the driver's DuckDB oracle replays the
  * feature arithmetic): all accumulation is over INTEGER pixel/sample
  * values in Long/exact-double space, divisions happen once at the end in
  * a fixed expression shape, and the downsamples are area-averages we
  * implement ourselves rather than Java2D's platform-tunable rendering
  * pipeline. `decodeImage` on the same bytes yields the same floats on
  * any JVM.
  *
  * Scale note: features sample at a stride that caps work at ~256×256
  * probes per image regardless of true size, so a 100 MP scan costs the
  * same as a thumbnail; the full-resolution path is only taken for small
  * images where it is also the exact path.
  */
object JvmCodec {

  // force headless before any AWT-adjacent class initializes — executors
  // have no display; ImageIO itself never needs one
  locally {
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")
  }

  /** Full image decode: true dims, frame count (animated GIF aware),
    * 8-dim pixel features, 64-bit dHash. */
  final case class ImagePixels(width: Int, height: Int, nFrames: Int,
                               features: Array[Float], phash: Long)

  /** Full PCM decode: header facts + 8-dim sample features. */
  final case class AudioSamples(rate: Int, channels: Int, frames: Int,
                                features: Array[Float])

  /** Integer luma ×1000: 299 r + 587 g + 114 b — exact in Long, ordered
    * identically to the double BT.601 luma. */
  @inline private def lumaInt(rgb: Int): Long = {
    val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
    299L * r + 587L * g + 114L * b
  }

  /** Decode an image payload with the JDK's registered reader for its
    * container. None (never a throw) when no reader claims the bytes or
    * the stream is corrupt — callers fall back to the header parse. */
  def decodeImage(bytes: Array[Byte]): Option[ImagePixels] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, false, true)
            // animated GIF: the reader counts frames; single-frame
            // containers answer 1. allowSearch=true is fine on a
            // fully-buffered byte stream.
            val frames =
              try math.max(1, reader.getNumImages(true))
              catch { case scala.util.control.NonFatal(_) => 1 }
            val img = reader.read(0)
            if (img == null) None
            else Some(ImagePixels(img.getWidth, img.getHeight, frames,
              pixelFeatures(img), dHash(img)))
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** 8-dim feature vector from decoded pixels, all in [0, 1]:
    *   0-2 mean R/G/B (÷255); 3 mean BT.601 luma; 4 luma std-dev;
    *   5 mean |horizontal luma gradient|; 6 aspect w/(w+h);
    *   7 bright-pixel fraction (luma > ½).
    * Sums are exact Longs over integer pixel values; each feature is one
    * double expression over those Longs (the shape the SQL oracle
    * replays), floated at the end. Stride bounds the sample grid at
    * ~256 per axis for huge images; small images are scanned exactly. */
  private[operators] def pixelFeatures(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    val stride = math.max(1, math.max(w, h) / 256)
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var sumL = 0L; var sumL2 = 0L; var bright = 0L
    var gradSum = 0L; var gradCnt = 0L; var cnt = 0L
    var y = 0
    while (y < h) {
      var x = 0; var prev = -1L
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sumR += (rgb >> 16) & 0xFF; sumG += (rgb >> 8) & 0xFF; sumB += rgb & 0xFF
        val l = lumaInt(rgb)
        sumL += l; sumL2 += l * l
        if (l * 2 > 255000L) bright += 1
        if (prev >= 0) { gradSum += math.abs(l - prev); gradCnt += 1 }
        prev = l; cnt += 1
        x += stride
      }
      y += stride
    }
    val n = math.max(1L, cnt).toDouble
    val meanL = sumL / (n * 255000.0)
    // the two-pass-free variance formula leaves ~1e-17 of double residue
    // on a constant raster; the smallest TRUE variance (one gray level in
    // one sampled pixel) is ≥5e-9 in these units, so clamping below
    // 1e-12 zeroes only the residue — constants report exactly 0
    val varRaw = (sumL2 / n) / (255000.0 * 255000.0) - meanL * meanL
    val varL = if (varRaw < 1e-12) 0.0 else varRaw
    Array(
      (sumR / (n * 255.0)).toFloat,
      (sumG / (n * 255.0)).toFloat,
      (sumB / (n * 255.0)).toFloat,
      meanL.toFloat,
      math.sqrt(varL).toFloat,
      (gradSum / (math.max(1L, gradCnt) * 255000.0)).toFloat,
      (w.toDouble / (w.toDouble + h.toDouble)).toFloat,
      (bright / n).toFloat)
  }

  /** 64-bit difference hash: area-average the luma onto a 9×8 grid, set
    * bit y·8+x when cell (x+1, y) is strictly brighter than cell (x, y).
    * Invariant under uniform brightness shift and any monotone tone map —
    * the property the perceptual near-dup queries lean on. Cell means are
    * exact integer-sum averages, so a 9×8 input maps identity and the
    * hash is bit-replayable from the pixel formula. */
  def dHash(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val cells = Array.ofDim[Double](8, 9)
    val stride = math.max(1, math.max(w, h) / 256)
    var cy = 0
    while (cy < 8) {
      val y0 = cy * h / 8; val y1 = math.max(y0 + 1, (cy + 1) * h / 8)
      var cx = 0
      while (cx < 9) {
        val x0 = cx * w / 9; val x1 = math.max(x0 + 1, (cx + 1) * w / 9)
        var s = 0L; var c = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += lumaInt(img.getRGB(x, y)); c += 1; x += stride }
          y += stride
        }
        cells(cy)(cx) = if (c == 0) 0.0 else s.toDouble / c
        cx += 1
      }
      cy += 1
    }
    var hash = 0L
    var b = 0
    while (b < 64) {
      val cy2 = b / 8; val cx2 = b % 8
      if (cells(cy2)(cx2) < cells(cy2)(cx2 + 1)) hash |= 1L << b
      b += 1
    }
    hash
  }

  /** Per-frame decode for multi-frame containers (animated GIF — the
    * one multi-frame format the JDK ships a codec for): every
    * `stride`-th stored frame decoded to (frameIdx, w, h, features,
    * dHash). Single-frame containers yield just frame 0; no-codec
    * payloads yield Nil. Honest caveat: frames are the STORED rasters —
    * GIF disposal/compositing is not applied, so a patch-optimized GIF
    * reports patch rects (a video pipeline composites before feature
    * extraction; fixture and thumbnail GIFs store full frames). */
  def decodeFrames(bytes: Array[Byte], stride: Int): Seq[(Int, Int, Int, Array[Float], Long)] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) Nil
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, false, true)
            val n = try math.max(1, reader.getNumImages(true))
              catch { case scala.util.control.NonFatal(_) => 1 }
            (0 until n by math.max(1, stride)).flatMap { f =>
              try {
                val img = reader.read(f)
                if (img == null) None
                else Some((f, img.getWidth, img.getHeight,
                  pixelFeatures(img), dHash(img)))
              } catch { case scala.util.control.NonFatal(_) => None }
            }
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => Nil }

  /** G.711 µ-law byte → linear 16-bit sample (ITU-T G.711 table as the
    * closed-form expansion; max magnitude 32124). */
  private[operators] def ulawToLinear(b: Int): Int = {
    val u = ~b & 0xFF
    val mag = (((u & 0x0F) << 3) + 0x84 << ((u >> 4) & 7)) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  /** G.711 A-law byte → linear 16-bit sample (max magnitude 32256). */
  private[operators] def alawToLinear(b: Int): Int = {
    val a = (b ^ 0x55) & 0xFF
    val exp = (a >> 4) & 7
    val mant = a & 0x0F
    val mag = if (exp == 0) (mant << 4) + 8
              else ((mant << 4) + 0x108) << (exp - 1)
    // A-law sign bit (after the 0x55 toggle) SET means positive — the
    // opposite convention of µ-law's complemented byte
    if ((a & 0x80) != 0) mag else -mag
  }

  /** IMA/DVI ADPCM step table (public spec: IMA "Recommended Practices
    * for Enhancing Digital Audio Compatibility", 1992 — the same 89
    * entries every implementation ships). */
  private[operators] val imaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private[operators] val imaIndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA ADPCM nibble step: (newPredictor, newIndex). The exact
    * integer state machine from the spec — diff accumulates step>>3,
    * plus step, step>>1, step>>2 for bits 2..0, sign bit 3, predictor
    * clamped to int16, index clamped to the table. */
  private[operators] def imaStep(nibble: Int, pred: Int, index: Int): (Int, Int) = {
    val step = imaStepTable(index)
    var diff = step >> 3
    if ((nibble & 4) != 0) diff += step
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 1) != 0) diff += step >> 2
    val p0 = if ((nibble & 8) != 0) pred - diff else pred + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, index + imaIndexTable(nibble)))
    (p, i)
  }

  /** Decode one IMA ADPCM block into per-channel sample arrays.
    * Block layout (WAV format 17): per channel a 4-byte header
    * (int16 LE initial predictor = sample 0, uint8 step index,
    * reserved), then 4-byte nibble groups interleaved by channel —
    * ch0's 8 nibbles, ch1's 8 nibbles, back to ch0, … low nibble
    * first within each byte. */
  private[operators] def decodeImaBlock(bytes: Array[Byte], off: Int, block: Int,
                             channels: Int): Array[Array[Int]] = {
    val spb = (block - 4 * channels) * 2 / channels + 1
    val out = Array.ofDim[Int](channels, spb)
    val pred = new Array[Int](channels)
    val idx = new Array[Int](channels)
    var ch = 0
    while (ch < channels) {
      val h = off + ch * 4
      pred(ch) = ((bytes(h) & 0xFF) | ((bytes(h + 1) & 0xFF) << 8)).toShort.toInt
      idx(ch) = math.min(88, bytes(h + 2) & 0xFF)
      out(ch)(0) = pred(ch)
      ch += 1
    }
    val dataOff = off + 4 * channels
    val groups = (block - 4 * channels) / (4 * channels)
    var g = 0
    while (g < groups) {
      ch = 0
      while (ch < channels) {
        val base = dataOff + (g * channels + ch) * 4
        var b = 0
        while (b < 4) {
          val byte = bytes(base + b) & 0xFF
          val s = 1 + g * 8 + b * 2
          val (p1, i1) = imaStep(byte & 0x0F, pred(ch), idx(ch))
          pred(ch) = p1; idx(ch) = i1
          if (s < spb) out(ch)(s) = p1
          val (p2, i2) = imaStep(byte >> 4, pred(ch), idx(ch))
          pred(ch) = p2; idx(ch) = i2
          if (s + 1 < spb) out(ch)(s + 1) = p2
          b += 1
        }
        ch += 1
      }
      g += 1
    }
    out
  }

  /** Decode WAV samples (the one audio container with a published
    * layout): chunk walk for fmt/data, then a single pass over frames
    * mixing channels to mono. Sample formats with published
    * arithmetic are decoded for REAL — 16-bit linear PCM (format 1),
    * the G.711 companded pair, A-law (6) and µ-law (7), expanded
    * by the ITU-T formulas, and IMA/DVI ADPCM (17) through the full
    * block state machine; anything else (MS-ADPCM, MP3-in-WAV, float)
    * is an honest None. Features:
    *   0 RMS; 1 zero-crossing rate; 2 peak |sample|; 3 mean |sample|
    *   (all ÷32768); 4 duration seconds; 5 rate/48000; 6 channels;
    *   7 bits/16. */
  def decodeWav(bytes: Array[Byte]): Option[AudioSamples] = {
    def le16(i: Int): Int = (bytes(i) & 0xFF) | ((bytes(i + 1) & 0xFF) << 8)
    def le32(i: Int): Long = (bytes(i) & 0xFF).toLong |
      ((bytes(i + 1) & 0xFF).toLong << 8) | ((bytes(i + 2) & 0xFF).toLong << 16) |
      ((bytes(i + 3) & 0xFF).toLong << 24)
    def tag(i: Int, s: String): Boolean = i + 4 <= bytes.length &&
      s.indices.forall(j => bytes(i + j) == s.charAt(j).toByte)
    if (!(tag(0, "RIFF") && tag(8, "WAVE"))) return None
    var i = 12
    var fmtOk = false; var channels = 0; var rate = 0; var block = 0; var bits = 0
    var law = 0 // 0 = linear PCM, 6 = A-law, 7 = µ-law
    var dataOff = -1; var dataLen = 0L
    while (i + 8 <= bytes.length && (!fmtOk || dataOff < 0)) {
      val size = le32(i + 4)
      if (tag(i, "fmt ") && i + 8 + 16 <= bytes.length) {
        val audioFormat = le16(i + 8)
        channels = le16(i + 10); rate = le32(i + 12).toInt
        block = le16(i + 20); bits = le16(i + 22)
        law = if (audioFormat == 6 || audioFormat == 7 ||
          audioFormat == 17) audioFormat else 0
        fmtOk = channels > 0 &&
          ((audioFormat == 1 && bits == 16 && block == channels * 2) ||
           ((law == 6 || law == 7) && bits == 8 && block == channels) ||
           (law == 17 && bits == 4 && block > 4 * channels &&
             (block - 4 * channels) % (4 * channels) == 0))
      } else if (tag(i, "data")) { dataOff = i + 8; dataLen = size }
      i += 8 + size.toInt + (size.toInt & 1)
    }
    if (!fmtOk || dataOff < 0 || rate <= 0) return None
    val avail = math.min(dataLen, (bytes.length - dataOff).toLong)
    var sumSq = 0.0; var sumAbs = 0.0; var peak = 0.0
    var crossings = 0L; var prevSign = 0
    var frames = 0
    def statFrame(mono: Double): Unit = {
      sumSq += mono * mono; sumAbs += math.abs(mono)
      if (math.abs(mono) > peak) peak = math.abs(mono)
      val sign = if (mono > 0) 1 else if (mono < 0) -1 else prevSign
      if (prevSign != 0 && sign != 0 && sign != prevSign) crossings += 1
      if (sign != 0) prevSign = sign
    }
    if (law == 17) {
      // block-structured decode: each block's channels come back as
      // whole sample arrays, mixed to mono frame by frame
      val nBlocks = (avail / block).toInt
      val spb = (block - 4 * channels) * 2 / channels + 1
      frames = nBlocks * spb
      var b = 0
      while (b < nBlocks) {
        val chans = decodeImaBlock(bytes, dataOff + b * block, block, channels)
        var s = 0
        while (s < spb) {
          var ch = 0; var acc = 0L
          while (ch < channels) { acc += chans(ch)(s); ch += 1 }
          statFrame(acc.toDouble / channels)
          s += 1
        }
        b += 1
      }
    } else {
      frames = (avail / block).toInt
      val bytesPer = block / channels
      var f = 0
      while (f < frames) {
        var ch = 0; var acc = 0L
        val base = dataOff + f * block
        while (ch < channels) {
          val v = law match {
            case 7 => ulawToLinear(bytes(base + ch) & 0xFF)
            case 6 => alawToLinear(bytes(base + ch) & 0xFF)
            case _ => (le16(base + ch * bytesPer) << 16) >> 16 // sign-extend
          }
          acc += v; ch += 1
        }
        statFrame(acc.toDouble / channels)
        f += 1
      }
    }
    val n = math.max(1, frames).toDouble
    Some(AudioSamples(rate, channels, frames, Array(
      (math.sqrt(sumSq / n) / 32768.0).toFloat,
      (crossings / math.max(1.0, n - 1.0)).toFloat,
      (peak / 32768.0).toFloat,
      (sumAbs / n / 32768.0).toFloat,
      (frames.toDouble / rate).toFloat,
      (rate / 48000.0).toFloat,
      channels.toFloat,
      (bits / 16.0).toFloat)))
  }

  /** Encode per-channel 16-bit samples as an IMA ADPCM WAV (format 17)
    * — the fixture/export side of the ADPCM decode tier, the same
    * public-spec quantizer run forward: per block, each channel's
    * header carries the current predictor (≡ the block's first sample,
    * emitted verbatim) and step index; every following sample becomes
    * the 4-bit code whose [[imaStep]] reconstruction tracks it.
    * `samplesPerBlock` must be 8k+1 (nibble groups are 8 samples per
    * channel) and divide the sample count; state carries across
    * blocks. fmt chunk written at size 20 with the standard
    * wSamplesPerBlock extension. */
  def encodeImaAdpcmWav(rate: Int, chans: Array[Array[Int]],
                        samplesPerBlock: Int): Array[Byte] = {
    val channels = chans.length
    val spb = samplesPerBlock
    require(channels >= 1 && spb >= 1 && (spb - 1) % 8 == 0,
      s"samplesPerBlock must be 8k+1, got $spb")
    val n = chans(0).length
    require(chans.forall(_.length == n) && n > 0 && n % spb == 0,
      s"sample count $n must be a positive multiple of samplesPerBlock $spb")
    val block = 4 * channels + ((spb - 1) / 8) * 4 * channels
    val nBlocks = n / spb
    val dataBytes = nBlocks * block
    val out = java.nio.ByteBuffer.allocate(48 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(40 + dataBytes)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(17).putShort(channels.toShort).putInt(rate)
      .putInt((rate.toLong * block / spb).toInt).putShort(block.toShort)
      .putShort(4).putShort(2).putShort(spb.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    val idx = new Array[Int](channels)
    val pred = new Array[Int](channels)
    var b = 0
    while (b < nBlocks) {
      var ch = 0
      while (ch < channels) {
        pred(ch) = chans(ch)(b * spb)
        out.putShort(pred(ch).toShort).put(idx(ch).toByte).put(0.toByte)
        ch += 1
      }
      val groups = (spb - 1) / 8
      var g = 0
      while (g < groups) {
        ch = 0
        while (ch < channels) {
          var byteIdx = 0
          while (byteIdx < 4) {
            var packed = 0
            var half = 0
            while (half < 2) {
              val s = b * spb + 1 + g * 8 + byteIdx * 2 + half
              val step = imaStepTable(idx(ch))
              var diff = chans(ch)(s) - pred(ch)
              var nib = 0
              if (diff < 0) { nib = 8; diff = -diff }
              if (diff >= step) { nib |= 4; diff -= step }
              if (diff >= (step >> 1)) { nib |= 2; diff -= step >> 1 }
              if (diff >= (step >> 2)) nib |= 1
              val (p, i2) = imaStep(nib, pred(ch), idx(ch))
              pred(ch) = p; idx(ch) = i2
              packed |= (nib & 0xF) << (half * 4)
              half += 1
            }
            out.put(packed.toByte)
            byteIdx += 1
          }
          ch += 1
        }
        g += 1
      }
      b += 1
    }
    out.array()
  }

  /** Real resize: decode, area-average down to the target box (never
    * upscales), re-encode as PNG. Target dims use the exact formula the
    * stub documented (`floor(side·scale + ½)`), so the two paths agree
    * on shape and the SQL oracle can replay it. None when the payload
    * has no JDK codec. */
  def resizeImage(bytes: Array[Byte], maxSide: Int): Option[(Int, Int, Array[Byte])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
        val nw = math.max(1, math.round(w * scale).toInt)
        val nh = math.max(1, math.round(h * scale).toInt)
        val out = new java.awt.image.BufferedImage(
          nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var cy = 0
        while (cy < nh) {
          val y0 = cy * h / nh; val y1 = math.max(y0 + 1, (cy + 1) * h / nh)
          var cx = 0
          while (cx < nw) {
            val x0 = cx * w / nw; val x1 = math.max(x0 + 1, (cx + 1) * w / nw)
            var sr = 0L; var sg = 0L; var sb = 0L; var c = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
                c += 1; x += 1
              }
              y += 1
            }
            // area-average rounds half-up per channel — deterministic,
            // no Java2D rendering-hint dependence
            val r = ((2 * sr + c) / (2 * c)).toInt
            val g = ((2 * sg + c) / (2 * c)).toInt
            val b = ((2 * sb + c) / (2 * c)).toInt
            out.setRGB(cx, cy, (r << 16) | (g << 8) | b)
            cx += 1
          }
          cy += 1
        }
        Some((nw, nh, encodePng(out)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Apply an EXIF orientation (1-8) to a raster — the eight dihedral
    * transforms as an explicit per-pixel remap (deterministic, no
    * Java2D transform pipeline): 2 mirror, 3 rotate 180, 4 flip, 5
    * transpose, 6 rotate 90 CW, 7 transverse, 8 rotate 270 CW. The
    * returned image displays upright; 1 (or any out-of-range value)
    * returns the input untouched. */
  def normalizeOrientation(img: java.awt.image.BufferedImage,
                           orientation: Int): java.awt.image.BufferedImage = {
    if (orientation <= 1 || orientation > 8) return img
    val w = img.getWidth; val h = img.getHeight
    val swap = orientation >= 5
    val out = new java.awt.image.BufferedImage(
      if (swap) h else w, if (swap) w else h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < out.getHeight) {
      var x = 0
      while (x < out.getWidth) {
        val (sx, sy) = orientation match {
          case 2 => (w - 1 - x, y)
          case 3 => (w - 1 - x, h - 1 - y)
          case 4 => (x, h - 1 - y)
          case 5 => (y, x)
          case 6 => (y, h - 1 - x)
          case 7 => (w - 1 - y, h - 1 - x)
          case _ => (w - 1 - y, x) // 8
        }
        out.setRGB(x, y, img.getRGB(sx, sy))
        x += 1
      }
      y += 1
    }
    out
  }

  /** PNG-encode a raster (lossless — decode inverts it pixel-exactly). */
  def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Build a solid-rgb raster — fixture helper for the oracle rows. */
  def solidImage(w: Int, h: Int, r: Int, g: Int, b: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    img
  }

  /** Build a gray raster from a per-pixel value function (0..255). */
  def grayImage(w: Int, h: Int)(v: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = math.max(0, math.min(255, v(x, y)))
        img.setRGB(x, y, (g << 16) | (g << 8) | g); x += 1
      }
      y += 1
    }
    img
  }
}
