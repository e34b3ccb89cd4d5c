package graft

import graft.multimodal.Media.MediaCodec

/** Audio perceptual-hash ROBUSTNESS: the dHash grid is RELATIVE (66
  * equal-duration ranges over the decoded signal), so the same signal
  * sampled at different rates must hash near-identically — the
  * property that lets a re-encoded/resampled copy of a clip land in
  * the same near-dup bucket. Negative controls pin that the hash
  * still separates genuinely different signals. */
class AudioResampleSpec extends SparkSpec {

  /** `seconds` of a deterministic multi-tone signal sampled at `rate`,
    * as an IEEE-float mono WAV. The tones are LOW-frequency relative
    * to every rate used (≤ 40 Hz), so both samplings observe the same
    * band-limited waveform — the honest resample-equivalence setup. */
  private def tone(rate: Int, seconds: Double, phase: Double = 0.0,
      f1: Double = 7.0, f2: Double = 23.0, f3: Double = 40.0): Array[Byte] = {
    val n = (rate * seconds).toInt
    val samples = new Array[Float](n)
    var i = 0
    while (i < n) {
      val t = i.toDouble / rate
      samples(i) = (0.5 * math.sin(2 * math.Pi * f1 * t + phase) +
        0.3 * math.sin(2 * math.Pi * f2 * t) +
        0.2 * math.sin(2 * math.Pi * f3 * t)).toFloat
      i += 1
    }
    MediaCodec.writeWavFloat(rate, 1, samples)
  }

  private def hashOf(wav: Array[Byte]): Long = {
    val plane = MediaCodec.decodeWavSamples(wav).get
    assert(plane.length >= 66)
    MediaCodec.dHash60(plane)
  }

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("resample invariance: 8 kHz vs 44.1 kHz of the same signal hash near-identically") {
    val h8 = hashOf(tone(8000, 2.0))
    val h44 = hashOf(tone(44100, 2.0))
    val d = hamming(h8, h44)
    assert(d <= 3, s"same signal at 8k/44.1k should be near-dup: hamming $d")
  }

  test("the full rate ladder stays within the near-dup threshold of each other") {
    val rates = Seq(8000, 11025, 16000, 22050, 44100, 48000)
    val hs = rates.map(r => r -> hashOf(tone(r, 2.0)))
    for ((ra, ha) <- hs; (rb, hb) <- hs if ra < rb) {
      val d = hamming(ha, hb)
      assert(d <= 3, s"$ra Hz vs $rb Hz drifted to hamming $d")
    }
  }

  test("bit-depth invariance rides the same grid: float vs 16-bit PCM of one signal") {
    val rate = 16000
    val n = (rate * 2.0).toInt
    val f = new Array[Float](n)
    val pcm = new Array[Byte](n * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) {
      val t = i.toDouble / rate
      val v = 0.5 * math.sin(2 * math.Pi * 7.0 * t) +
        0.3 * math.sin(2 * math.Pi * 23.0 * t) +
        0.2 * math.sin(2 * math.Pi * 40.0 * t)
      f(i) = v.toFloat
      bb.putShort((v * 32767.0).toShort)
      i += 1
    }
    val hf = hashOf(MediaCodec.writeWavFloat(rate, 1, f))
    val hp = hashOf(MediaCodec.writeWav(rate, 1, pcm, bits = 16))
    val d = hamming(hf, hp)
    assert(d <= 3, s"float vs 16-bit of one signal: hamming $d")
  }

  test("negative control: a different signal stays far at every rate") {
    val a8 = hashOf(tone(8000, 2.0))
    // different partials AND phase — a genuinely different clip
    val b8 = hashOf(tone(8000, 2.0, phase = 1.3, f1 = 5.0, f2 = 31.0, f3 = 17.0))
    val b44 = hashOf(tone(44100, 2.0, phase = 1.3, f1 = 5.0, f2 = 31.0, f3 = 17.0))
    assert(hamming(a8, b8) >= 15,
      s"different signals too close: ${hamming(a8, b8)}")
    assert(hamming(a8, b44) >= 15,
      s"different signals (cross-rate) too close: ${hamming(a8, b44)}")
    // and the different signal is rate-invariant WITH ITSELF
    assert(hamming(b8, b44) <= 3)
  }

  test("duration matters: a truncated clip is a different signal, not a near-dup") {
    // the grid is relative, so HALF the clip re-spreads over all 66
    // cells — a 2 s prefix of a 4 s clip must not collide with it
    // unless the signal is periodic at the cell scale; use a slow
    // chirp-like drift to break that symmetry
    def chirp(rate: Int, seconds: Double): Array[Byte] = {
      val n = (rate * seconds).toInt
      val s = new Array[Float](n)
      var i = 0
      while (i < n) {
        val t = i.toDouble / rate
        s(i) = (0.7 * math.sin(2 * math.Pi * (3.0 + t) * t)).toFloat
        i += 1
      }
      MediaCodec.writeWavFloat(rate, 1, s)
    }
    val full = hashOf(chirp(16000, 4.0))
    val half = hashOf(chirp(16000, 2.0))
    assert(hamming(full, half) >= 10,
      s"truncation collapsed: ${hamming(full, half)}")
  }
}
