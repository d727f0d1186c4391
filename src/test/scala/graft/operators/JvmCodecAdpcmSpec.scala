package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** IMA ADPCM codec correctness beyond the oracle row's DC case: the
  * declared `media_wave_adpcm` row proves the exact closed-form path;
  * these tests prove the NONZERO-nibble state machine — quantizer
  * round-trip tracking on a real waveform, stereo de-interleave,
  * predictor/index carry across blocks, and honest refusal of formats
  * the decoder does not implement. */
class JvmCodecAdpcmSpec extends AnyFunSuite {

  private def sine(n: Int, amp: Double, period: Double,
                   phase: Double = 0.0): Array[Int] =
    Array.tabulate(n)(i =>
      math.round(amp * math.sin(2 * math.Pi * i / period + phase)).toInt)

  test("DC signal decodes exactly through the compressed path") {
    for ((rate, ch, frames, amp) <- Seq((8000, 1, 401, 12345),
        (16000, 2, 457, 7000), (11025, 1, 9, 0))) {
      val chans = Array.fill(ch)(Array.fill(frames)(amp))
      val wav = JvmCodec.encodeImaAdpcmWav(rate, chans, samplesPerBlock = frames)
      val dec = JvmCodec.decodeWav(wav).get
      assert(dec.rate === rate)
      assert(dec.channels === ch)
      assert(dec.frames === frames)
      assert(dec.features(0) === (amp / 32768.0).toFloat) // rms exact
      assert(dec.features(1) === 0f)                      // zcr
      assert(dec.features(2) === (amp / 32768.0).toFloat) // peak
    }
  }

  test("sine round-trip: decoded samples track the input within quantizer error (multi-block state carry)") {
    val spb = 65
    val n = 4 * spb // 4 blocks — state must carry across
    val src = sine(n, amp = 9000, period = 80.0)
    val wav = JvmCodec.encodeImaAdpcmWav(8000, Array(src), samplesPerBlock = spb)
    // decode the raw blocks back and compare per-sample
    val block = 4 + 8 * 4 // 1 channel: header + 64 samples of nibbles
    val dataOff = wav.length - 4 * block
    val out = (0 until 4).flatMap { b =>
      JvmCodec.decodeImaBlock(wav, dataOff + b * block, block, 1)(0)
    }
    assert(out.length === n)
    val errPow = out.zip(src).map { case (a, b) =>
      (a - b).toDouble * (a - b) }.sum / n
    val sigPow = src.map(s => s.toDouble * s).sum / n
    val snrDb = 10 * math.log10(sigPow / math.max(errPow, 1e-9))
    // ADPCM on a smooth signal is a ~20 dB codec once the step ladder
    // locks on; far above what a broken index/predictor update yields
    assert(snrDb > 15.0, s"round-trip SNR $snrDb dB too low: decode drifted")
    // block restart correctness: each block's first decoded sample is
    // the header predictor, which the encoder set to the exact input
    for (b <- 0 until 4) assert(out(b * spb) === src(b * spb))
  }

  test("stereo de-interleave: per-channel DC mixes to the exact mono mean") {
    val frames = 401
    val (l, r) = (6000, 18000)
    val wav = JvmCodec.encodeImaAdpcmWav(8000,
      Array(Array.fill(frames)(l), Array.fill(frames)(r)),
      samplesPerBlock = frames)
    val dec = JvmCodec.decodeWav(wav).get
    assert(dec.channels === 2)
    assert(dec.features(0) === ((l + r) / 2.0 / 32768.0).toFloat)
    assert(dec.features(1) === 0f)
  }

  test("negative and clamped excursions survive the state machine") {
    // full-scale square wave forces max-magnitude nibbles, the int16
    // clamp, and the 8-entry index jumps in both directions
    val n = 65
    val src = Array.tabulate(n)(i => if ((i / 8) % 2 == 0) 30000 else -30000)
    val wav = JvmCodec.encodeImaAdpcmWav(8000, Array(src), samplesPerBlock = n)
    val dec = JvmCodec.decodeWav(wav).get
    assert(dec.frames === n)
    assert(dec.features(2) <= 1.0f) // peak clamped inside int16 range
    assert(dec.features(1) > 0f)    // the square wave does cross zero
  }

  test("unsupported WAV formats still refuse honestly") {
    // format 2 (MS-ADPCM) header with plausible sizes → None, not garbage
    val bb = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(56)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(2).putShort(1).putInt(8000).putInt(4000)
      .putShort(256.toShort).putShort(4)
    bb.put("data".getBytes("US-ASCII")).putInt(8)
    assert(JvmCodec.decodeWav(bb.array()).isEmpty)
  }
}
