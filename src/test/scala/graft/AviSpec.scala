package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.multimodal.Media
import graft.multimodal.Media.{MediaCodec, MediaRecord}

/** MJPEG-in-AVI container (round 15): writer → RIFF-walk round trips,
  * hostile-length refusal (the WAV fuzz discipline applied to the
  * nested LIST grammar), decode() sniffing, and the q158 path's
  * byte-exactness contract (extracted frames ≡ the JPEGs written). */
class AviSpec extends SparkSpec {

  private val md = MessageDigest.getInstance("MD5")
  private def jpeg(text: String): Array[Byte] =
    MediaCodec.encodeForOpt("video", text, md).get

  // each ≥ 66 chars: the perceptual-hash grid floor — shorter frames
  // are (correctly) hash-skipped, which would vacuously pass the
  // equivalence test below
  private val texts = Seq(
    "the first keyframe of a tiny synthetic video, padded well past the grid floor",
    "frame two drifts just a little from frame one, padded well past the floor....",
    "the third frame carries rather different content here, padded past the floor.",
    "and the fourth frame closes out the sequence cleanly, padded past the floor..")

  test("writeAvi → aviFrames returns every frame byte-exact, in order") {
    val frames = texts.map(jpeg)
    val avi = MediaCodec.writeAvi(frames)
    val back = MediaCodec.aviFrames(avi).get
    assert(back.length === 4)
    frames.zip(back).foreach { case (w, r) => assert(w.sameElements(r)) }
  }

  test("parseAvi reads dims, frame count, and frame period from avih") {
    val frames = texts.map(jpeg)
    val (w, h) = MediaCodec.parseJpeg(frames.head).get
    assert(MediaCodec.parseAvi(MediaCodec.writeAvi(frames)) ===
      Some((w, h, 4, 250000)))
  }

  test("odd-length frames pad to even chunk boundaries without corrupting the walk") {
    // craft an odd-length '00dc' payload: any byte blob is legal in the
    // container (the walk is length-driven, not content-driven)
    val odd = Array[Byte](1, 2, 3, 4, 5)
    val even = Array[Byte](9, 8, 7, 6)
    val back = MediaCodec.aviFrames(MediaCodec.writeAvi(Seq(odd, even, odd))).get
    assert(back.length === 3)
    assert(back(0).sameElements(odd) && back(1).sameElements(even) &&
      back(2).sameElements(odd))
  }

  test("zero-length frame chunks hold their stream position") {
    val f = jpeg(texts.head)
    val back = MediaCodec.aviFrames(
      MediaCodec.writeAvi(Seq(f, Array.emptyByteArray, f))).get
    assert(back.length === 3)
    assert(back(1).isEmpty)
    assert(back(0).sameElements(f) && back(2).sameElements(f))
  }

  test("hostile chunk sizes refuse at every level: never hang, never throw") {
    val avi = MediaCodec.writeAvi(texts.map(jpeg))
    // 1) top-level LIST size → negative (an unguarded cursor would spin)
    val h1 = avi.clone(); h1(16) = 0xf8.toByte; h1(17) = 0xff.toByte
    h1(18) = 0xff.toByte; h1(19) = 0xff.toByte
    assert(MediaCodec.parseAvi(h1) === None)
    assert(MediaCodec.aviFrames(h1) === None)
    // 2) top-level LIST size → past the buffer
    val h2 = avi.clone(); h2(19) = 0x7f.toByte
    assert(MediaCodec.parseAvi(h2) === None)
    // 3) avih chunk size → hostile inside the hdrl walk
    val h3 = avi.clone(); h3(28) = 0xf8.toByte; h3(29) = 0xff.toByte
    h3(30) = 0xff.toByte; h3(31) = 0xff.toByte
    assert(MediaCodec.parseAvi(h3) === None)
    // 4) a movi frame size → past the list end
    val moviSize = java.nio.ByteBuffer.wrap(avi).order(
      java.nio.ByteOrder.LITTLE_ENDIAN)
    // locate first '00dc' size field by scanning (test-side only)
    var i = 12
    var dcAt = -1
    while (dcAt < 0 && i + 8 <= avi.length) {
      if (new String(avi, i, 4, StandardCharsets.US_ASCII) == "00dc") dcAt = i
      i += 1
    }
    assert(dcAt > 0)
    val h4 = avi.clone(); h4(dcAt + 7) = 0x7f.toByte
    assert(MediaCodec.aviFrames(h4) === None)
    // 5) header-region truncations: total refusal, no exception
    Seq(0, 4, 11, 12, 20, 40).foreach { n =>
      val t = java.util.Arrays.copyOf(avi, n)
      assert(MediaCodec.parseAvi(t) === None)
      assert(MediaCodec.aviFrames(t) === None)
    }
    // 6) tail truncation: the HEADER stays readable (a partial download
    // still identifies itself — correct parser behavior), but the frame
    // walk refuses because the movi list size now overruns the buffer
    val half = java.util.Arrays.copyOf(avi, avi.length / 2)
    assert(MediaCodec.parseAvi(half).isDefined)
    assert(MediaCodec.aviFrames(half) === None)
  }

  test("decode() sniffs AVI: dims + fps/frame-count in the stream-shape slots") {
    val m = MediaCodec.decode(MediaRecord(7L, MediaCodec.writeAvi(texts.map(jpeg)), "video"))
    assert(m.container === "avi")
    assert(m.width === MediaCodec.parseJpeg(jpeg(texts.head)).map(_._1))
    assert(m.sample_rate === Some(4)) // 1e6 / 250000 usec
    assert(m.channels === Some(4)) // frame count
    // a WAV is RIFF too — the sniffers must not cross-claim
    val wav = MediaCodec.writeWav(8000, 1, "pcm".getBytes(StandardCharsets.UTF_8))
    assert(MediaCodec.decode(MediaRecord(8L, wav, "audio")).container === "wav")
    assert(MediaCodec.parseAvi(wav) === None)
  }

  test("interleaved a/v: audio round-trips byte-exact through the '01wb' split + WAV rewrap") {
    val frames = texts.map(jpeg)
    // 16-bit stereo (blockAlign 4) with a length that does NOT divide
    // evenly by the frame count — the remainder rides the last chunk
    val pcm = Array.tabulate(4 * 997)(i => ((i * 31) % 251).toByte)
    val avi = MediaCodec.writeAvi(frames,
      audio = Some(MediaCodec.AviAudio(8000, 2, pcm, bits = 16)))
    // video plane untouched by the interleave
    val back = MediaCodec.aviFrames(avi).get
    assert(back.length === 4)
    frames.zip(back).foreach { case (w, r) => assert(w.sameElements(r)) }
    assert(MediaCodec.parseAvi(avi).map(_._3) === Some(4))
    // audio plane: the rewrapped WAV is canonical and byte-exact
    val wav = MediaCodec.aviAudioWav(avi).get
    assert(MediaCodec.parseWav(wav) === Some((8000, 2, 16)))
    assert(java.util.Arrays.copyOfRange(wav, 44, wav.length).sameElements(pcm))
    // the EXISTING wav decode plane consumes the soundtrack unchanged
    assert(MediaCodec.decodeWavSamples(wav).isDefined)
    // odd-length mono u8 body: per-chunk padding must not leak into data
    val odd = Array.tabulate(777)(i => (i % 200).toByte)
    val avi2 = MediaCodec.writeAvi(frames,
      audio = Some(MediaCodec.AviAudio(11025, 1, odd)))
    val wav2 = MediaCodec.aviAudioWav(avi2).get
    assert(java.util.Arrays.copyOfRange(wav2, 44, wav2.length).sameElements(odd))
    // a video-only container has no audio track
    assert(MediaCodec.aviAudioWav(MediaCodec.writeAvi(frames)) === None)
  }

  test("interleaved a/v survives the hostile-length fuzz discipline") {
    val pcm = Array.tabulate(4000)(i => (i % 97).toByte)
    val avi = MediaCodec.writeAvi(texts.map(jpeg),
      audio = Some(MediaCodec.AviAudio(8000, 1, pcm)))
    // header-region truncations refuse everywhere
    Seq(0, 4, 12, 40, 80).foreach { n =>
      val t = java.util.Arrays.copyOf(avi, n)
      assert(MediaCodec.aviAudioWav(t) === None)
      assert(MediaCodec.aviFrames(t) === None)
    }
    // a hostile strf size inside the auds strl refuses, never throws
    var i = 12
    var strfAt = -1
    var seenAuds = false
    while (strfAt < 0 && i + 8 <= avi.length) {
      val id = new String(avi, i, 4, StandardCharsets.US_ASCII)
      if (id == "auds") seenAuds = true
      if (seenAuds && id == "strf") strfAt = i
      i += 1
    }
    assert(strfAt > 0)
    val h = avi.clone(); h(strfAt + 7) = 0x7f.toByte
    assert(MediaCodec.aviAudioWav(h) === None)
    // a hostile '01wb' chunk size fails the movi walk
    var wbAt = -1; i = 12
    while (wbAt < 0 && i + 8 <= avi.length) {
      if (new String(avi, i, 4, StandardCharsets.US_ASCII) == "01wb") wbAt = i
      i += 1
    }
    assert(wbAt > 0)
    val h2 = avi.clone(); h2(wbAt + 7) = 0x7f.toByte
    assert(MediaCodec.aviAudioWav(h2) === None)
    // tail truncation: header readable, both track walks refuse
    val half = java.util.Arrays.copyOf(avi, avi.length / 2)
    assert(MediaCodec.parseAvi(half).isDefined)
    assert(MediaCodec.aviAudioWav(half) === None)
  }

  test("demuxAvi fans one ingested AVI into image + audio rows, originals untouched") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val frames = texts.map(jpeg)
    val pcm = Array.tabulate(2048)(i => ((i * 7) % 256 - 128).toByte)
    val avi = MediaCodec.writeAvi(frames,
      audio = Some(MediaCodec.AviAudio(16000, 1, pcm)))
    val plainWav = MediaCodec.writeWav(8000, 1,
      "other doc".getBytes(StandardCharsets.UTF_8))
    val in = Seq(
      MediaRecord(1L, avi, "video"),
      MediaRecord(2L, plainWav, "audio")).toDS()
    val out = Media.demuxAvi(in).collect()
    // originals pass through
    assert(out.count(r => r.doc_id == 1L && r.fmt == "video") === 1)
    assert(out.count(r => r.doc_id == 2L && r.fmt == "audio") === 1)
    // one image row per keyframe, decodable by the JPEG plane
    val images = out.filter(r => r.fmt == "image" && r.doc_id != 2L)
    assert(images.length === 4)
    images.foreach(r => assert(MediaCodec.parseJpeg(r.payload).isDefined))
    // exactly one derived audio row, byte-exact PCM, WAV-plane decodable
    val derived = out.filter(r => r.fmt == "audio" && r.doc_id != 2L)
    assert(derived.length === 1)
    val w = derived.head.payload
    assert(MediaCodec.parseWav(w) === Some((16000, 1, 8)))
    assert(java.util.Arrays.copyOfRange(w, 44, w.length).sameElements(pcm))
    // derived ids are distinct from parents and from each other
    assert(out.map(_.doc_id).distinct.length === out.length)
  }

  test("aviFrameHashes ≡ videoFrameHashes frame-for-frame (container round trip is lossless)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val vids = Seq(
      (1L, texts),
      (2L, texts.map(_.toUpperCase)),
      (3L, texts.updated(2, texts(2).reverse)))
    val viaAvi = Media.aviFrameHashes(
      vids.map { case (id, ts) =>
        (id, Media.aviFromFrameTexts(ts, MessageDigest.getInstance("MD5")))
      }.toDS()).collect().toSet
    val viaFrames = Media.videoFrameHashes(
      vids.flatMap { case (id, ts) =>
        ts.zipWithIndex.map { case (t, k) => (id, k, t) }
      }.toDF("doc_id", "frame_idx", "frame_text")).collect().toSet
    assert(viaAvi === viaFrames)
    assert(viaAvi.nonEmpty)
  }
}
