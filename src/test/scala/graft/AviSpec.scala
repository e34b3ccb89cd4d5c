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
