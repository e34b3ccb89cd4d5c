package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.multimodal.Media
import graft.multimodal.Media.{MediaCodec, MediaRecord}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Real header parsing over hand-crafted container bytes: the parsers
  * must read dimensions/rates out of PNG IHDR, JPEG SOFn, and WAV `fmt `
  * structures built here byte-by-byte (NOT via the writers), survive
  * leading segments/chunks they don't care about, reject corrupt input,
  * and round-trip the writers' output. Then the Spark pipeline end-to-end:
  * synthesize → sniff → parse on a real documents frame.
  */
class MediaSpec extends SparkSpec {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // ---------------- PNG ----------------

  /** 3×2 PNG, built field-by-field (CRC bytes arbitrary — header parsers
    * must not require trailing chunks or validate CRCs to read IHDR). */
  private val pngFixture: Array[Byte] =
    bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++ // signature
      bytes(0, 0, 0, 13) ++                                   // IHDR length
      "IHDR".getBytes(StandardCharsets.US_ASCII) ++
      bytes(0, 0, 0, 3) ++ bytes(0, 0, 0, 2) ++               // width=3 height=2
      bytes(8, 2, 0, 0, 0) ++                                 // depth/color/etc
      bytes(0xde, 0xad, 0xbe, 0xef)                           // CRC (unchecked)

  test("parsePng reads IHDR width/height from a hand-crafted PNG") {
    assert(MediaCodec.parsePng(pngFixture) === Some((3, 2)))
  }

  test("parsePng rejects a bad signature and a truncated header") {
    val bad = pngFixture.clone(); bad(0) = 0x88.toByte
    assert(MediaCodec.parsePng(bad) === None)
    assert(MediaCodec.parsePng(pngFixture.take(20)) === None)
    assert(MediaCodec.parsePng(Array.emptyByteArray) === None)
  }

  // ---------------- JPEG ----------------

  /** 240×320 progressive JPEG: SOI, APP0/JFIF, a COM segment, then SOF2 —
    * the parser must walk the segment chain by length fields. */
  private val jpegSof2Fixture: Array[Byte] =
    bytes(0xff, 0xd8) ++                                      // SOI
      bytes(0xff, 0xe0, 0x00, 0x10) ++                        // APP0, len 16
      "JFIF".getBytes(StandardCharsets.US_ASCII) ++
      bytes(0, 1, 1, 0, 0, 1, 0, 1, 0, 0) ++
      bytes(0xff, 0xfe, 0x00, 0x07) ++                        // COM, len 7
      "hello".getBytes(StandardCharsets.US_ASCII) ++
      bytes(0xff, 0xc2, 0x00, 0x0b) ++                        // SOF2, len 11
      bytes(8) ++ bytes(0x01, 0x40) ++ bytes(0x00, 0xf0) ++   // prec, h=320, w=240
      bytes(1, 0x01, 0x11, 0x00) ++                           // 1 component
      bytes(0xff, 0xd9)                                       // EOI

  test("parseJpeg walks APP0/COM segments to a SOF2 frame header") {
    assert(MediaCodec.parseJpeg(jpegSof2Fixture) === Some((240, 320)))
  }

  test("parseJpeg reads a baseline SOF0 header") {
    val sof0 = bytes(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x0b, 8,
      0x00, 0x64, 0x00, 0xc8, 1, 1, 0x11, 0, 0xff, 0xd9) // h=100 w=200
    assert(MediaCodec.parseJpeg(sof0) === Some((200, 100)))
  }

  test("parseJpeg gives up at SOS and on non-JPEG bytes") {
    // SOI then straight to SOS: entropy data follows, no frame header
    val noSof = bytes(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0, 0, 1, 2, 3)
    assert(MediaCodec.parseJpeg(noSof) === None)
    assert(MediaCodec.parseJpeg("RIFFxxxxWAVE".getBytes) === None)
  }

  // ---------------- WAV ----------------

  /** 44.1 kHz stereo PCM with a 3-byte JUNK chunk (odd size → pad byte)
    * before `fmt ` — the parser must walk word-aligned chunks. */
  private val wavFixture: Array[Byte] = {
    val fmtChunk = "fmt ".getBytes(StandardCharsets.US_ASCII) ++
      bytes(16, 0, 0, 0) ++          // chunk size 16, LE
      bytes(1, 0) ++ bytes(2, 0) ++  // PCM, channels=2
      bytes(0x44, 0xac, 0, 0) ++     // sample rate 44100, LE
      bytes(0x10, 0xb1, 2, 0) ++     // byte rate 176400
      bytes(4, 0) ++ bytes(16, 0)    // block align 4, bits 16
    "RIFF".getBytes(StandardCharsets.US_ASCII) ++ bytes(0, 0, 0, 0) ++
      "WAVE".getBytes(StandardCharsets.US_ASCII) ++
      "JUNK".getBytes(StandardCharsets.US_ASCII) ++ bytes(3, 0, 0, 0) ++
      bytes(0xaa, 0xbb, 0xcc, 0x00) ++ // 3 junk bytes + pad to even
      fmtChunk
  }

  test("parseWav walks chunks to fmt and reads rate/channels/bits") {
    assert(MediaCodec.parseWav(wavFixture) === Some((44100, 2, 16)))
  }

  test("parseWav rejects non-RIFF and fmt-less input") {
    assert(MediaCodec.parseWav("RIFFxxxxAVI LIST".getBytes) === None)
    assert(MediaCodec.parseWav(wavFixture.take(30)) === None)
  }

  test("parseWav never hangs or throws on hostile chunk sizes") {
    // chunk size 0xFFFFFFF8 reads as -8: an unguarded cursor would add
    // 8 + (-8) = 0 and spin forever; a huge positive size would overflow
    // an int cursor into negative and index out of bounds
    def riff(sizeBytes: Int*) =
      "RIFF".getBytes(StandardCharsets.US_ASCII) ++ bytes(0, 0, 0, 0) ++
        "WAVE".getBytes(StandardCharsets.US_ASCII) ++
        "JUNK".getBytes(StandardCharsets.US_ASCII) ++ bytes(sizeBytes: _*) ++
        bytes(1, 2, 3, 4)
    assert(MediaCodec.parseWav(riff(0xf8, 0xff, 0xff, 0xff)) === None) // -8
    assert(MediaCodec.parseWav(riff(0xf0, 0xff, 0xff, 0x7f)) === None) // +2^31-ish
    // and through the full decode path: container unknown, no exception
    val m = MediaCodec.decode(MediaRecord(9L, riff(0xf8, 0xff, 0xff, 0xff), "audio"))
    assert(m.container === "unknown" && m.sample_rate.isEmpty)
  }

  // ---------------- writer → parser round trips ----------------

  test("writers emit containers their parsers read back exactly") {
    val body = "opaque body bytes".getBytes(StandardCharsets.UTF_8)
    assert(MediaCodec.parsePng(MediaCodec.writePng(640, 480, body)) ===
      Some((640, 480)))
    assert(MediaCodec.parseJpeg(MediaCodec.writeJpeg(1024, 768, body)) ===
      Some((1024, 768)))
    assert(MediaCodec.parseWav(MediaCodec.writeWav(16000, 1, body)) ===
      Some((16000, 1, 8))) // synthesis default: true 8-bit PCM
    assert(MediaCodec.parseWav(MediaCodec.writeWav(16000, 2, body, bits = 16)) ===
      Some((16000, 2, 16)))
    // documented length formulas (the oracle's byte_len arithmetic)
    assert(MediaCodec.writePng(1, 1, body).length === 57 + body.length)
    assert(MediaCodec.writeJpeg(1, 1, body).length === 23 + body.length)
    assert(MediaCodec.writeWav(8000, 1, body).length === 44 + body.length)
  }

  test("a writer PNG is a well-formed chunk stream (CRCs verify)") {
    val png = MediaCodec.writePng(3, 2, "xy".getBytes)
    var i = 8
    var seen = List.empty[String]
    while (i < png.length) {
      val len = java.nio.ByteBuffer.wrap(png, i, 4).getInt
      val ty = new String(png, i + 4, 4, StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32
      crc.update(png, i + 4, 4 + len)
      val stored = java.nio.ByteBuffer.wrap(png, i + 8 + len, 4).getInt
      assert(stored === crc.getValue.toInt, s"CRC mismatch in $ty")
      seen ::= ty
      i += 12 + len
    }
    assert(seen.reverse === List("IHDR", "IDAT", "IEND"))
  }

  // ---------------- decode dispatch + Spark pipeline ----------------

  test("decode sniffs the container from magic bytes, never from fmt") {
    val png = MediaRecord(1L, MediaCodec.writePng(10, 20, Array[Byte](1)), "video")
    val m = MediaCodec.decode(png)
    assert(m.container === "png" && m.width === Some(10) && m.height === Some(20))
    val junk = MediaRecord(2L, "not a container".getBytes, "image")
    val u = MediaCodec.decode(junk)
    assert(u.container === "unknown" && u.width.isEmpty && u.sample_rate.isEmpty)
  }

  test("decodeMeta end-to-end: synthesized payloads parse to the hash-derived fields") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType)))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "the quick brown fox", "src0"),  // 0 % 3 = 0 → image/png
        Row(2L, "jumps over the dog", "src1"),   // audio/wav
        Row(3L, "pack my box with jugs", "src2") // video/jpeg
      ), 2), schema)
    val metas = Media.decodeMeta(docs).collect().sortBy(_.doc_id)
    val md = MessageDigest.getInstance("MD5")
    def h(t: String) = MediaCodec.hash60(t.getBytes(StandardCharsets.UTF_8), md)

    val Array(img, aud, vid) = metas
    assert(img.container === "png" && img.fmt === "image")
    // the PNG is now a REAL image: the 19 text bytes are the pixel
    // plane, 19 is coprime to {2,3,4} → a 19×1 grayscale rectangle;
    // byte_len = 57 container + 6 zlib framing + (19 px + 1 filter
    // byte) + 5 stored-block header
    assert(img.width === Some("the quick brown fox".length))
    assert(img.height === Some(1))
    assert(img.byte_len === 63 + "the quick brown fox".length + 1 + 5)
    assert(aud.container === "wav" && aud.fmt === "audio")
    assert(aud.sample_rate ===
      Some(MediaCodec.SampleRates((h("jumps over the dog") % 5).toInt)))
    assert(aud.channels === Some(1)) // synthesis is true mono 8-bit PCM
    assert(vid.container === "jpeg" && vid.fmt === "video")
    // the JPEG is now a REAL baseline image (round 13): 21 text bytes,
    // 21 % 3 == 0 → 3 block rows × 7 cols of constant 8×8 tiles →
    // 56×24 true SOF0 dimensions; byte_len = 148 header/tables + 2
    // entropy bytes per block (16-bit stuffing-free tile profile)
    assert(vid.width === Some(8 * 7) && vid.height === Some(8 * 3))
    assert(vid.byte_len === 148 + 2 * 21)
  }

  test("the decode plan is narrow: no shuffle exchange anywhere") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = graft.core.Lake(spark, "/root/testdata/sf0.001").documents
    val plan = Media.decodeMeta(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode must not shuffle:\n$plan")
  }

  test("binaryFile ingestion: raw files -> typed records -> decoded meta") {
    import graft.multimodal.Media
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    val dir = new java.io.File(
      s"target/tmp/media_ingest_${java.util.UUID.randomUUID().toString.take(8)}")
    dir.mkdirs()
    def write(name: String, bytes: Array[Byte]): Unit = {
      val f = new java.io.FileOutputStream(new java.io.File(dir, name))
      try f.write(bytes) finally f.close()
    }
    val body = Array.fill[Byte](64)(7)
    write("a.png", Media.MediaCodec.writePng(320, 200, body))
    write("b.wav", Media.MediaCodec.writeWav(44100, 2, body))
    write("notes.txt", "not media".getBytes)
    // glob-scoped ingest sees one modality only
    val pngs = Media.ingestBinary(dir.getAbsolutePath, "*.png").collect()
    assert(pngs.length === 1 && pngs.head.fmt === "image")
    // full ingest + batch decode: headers parse from the REAL bytes
    val metas = Media.decodeIngested(
      Media.ingestBinary(dir.getAbsolutePath, "*.{png,wav}"))
      .collect().sortBy(_.fmt)
    assert(metas.length === 2)
    val img = metas.find(_.fmt == "image").get
    assert(img.width === Some(320) && img.height === Some(200))
    val aud = metas.find(_.fmt == "audio").get
    assert(aud.sample_rate === Some(44100) && aud.channels === Some(2))
    // ids are the stable path hash: re-ingest gives identical ids
    val again = Media.ingestBinary(dir.getAbsolutePath, "*.png").collect()
    assert(again.head.doc_id === pngs.head.doc_id)
  }

  test("ingested .jpg files hash through the magic-sniff image dispatch") {
    import graft.multimodal.Media
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    import ss.implicits._
    val dir = new java.io.File(
      s"target/tmp/media_jpg_${java.util.UUID.randomUUID().toString.take(8)}")
    dir.mkdirs()
    def write(name: String, bytes: Array[Byte]): Unit = {
      val f = new java.io.FileOutputStream(new java.io.File(dir, name))
      try f.write(bytes) finally f.close()
    }
    // one modality ("image"), two CONTAINERS: the bytes, not the
    // extension-derived fmt, must pick the decoder
    val bytes = Array.tabulate(96)(i => ((i * 37 + 5) % 256).toByte)
    write("tiles.jpg", MediaCodec.writeJpegTiles(bytes, rows = 4))
    write("plane.png", MediaCodec.writePngPixels(48, 2, 0,
      bytes, _ % 5, compress = true))
    val records = Media.ingestBinary(dir.getAbsolutePath, "*.{jpg,png}")
    val recs = records.collect()
    assert(recs.length === 2 && recs.forall(_.fmt === "image"))
    // both decode to the SAME plane through planeFor("image"):
    // PNG → full luma (= bytes), JPEG → tile block means (= bytes)
    val planes = recs.map(r =>
      graft.multimodal.Media.planeFor(r.fmt)(r.payload).get.toSeq).toSet
    assert(planes === Set(bytes.toSeq),
      "png luma and jpg block means must both recover the source plane")
    // and the whole fingerprint path agrees across containers
    val hashes = recs.map(r => MediaCodec.dHash60(
      graft.multimodal.Media.planeFor(r.fmt)(r.payload).get)).toSet
    assert(hashes.size === 1, "same picture, either container, one hash")
  }

  // ---------------- perceptual near-dup (dHash) ----------------

  test("extractPngBody walks the real chunk stream and concatenates IDAT") {
    val body = (0 until 100).map(_.toByte).toArray
    val png = MediaCodec.writePng(10, 10, body)
    assert(MediaCodec.extractPngBody(png).get.toSeq === body.toSeq)
    // rejects: bad signature, truncated (no IEND), hostile length
    assert(MediaCodec.extractPngBody(body) === None)
    assert(MediaCodec.extractPngBody(png.dropRight(13)) === None)
    val hostile = png.clone()
    hostile(33) = 0x7f.toByte // IDAT length field → absurdly large
    assert(MediaCodec.extractPngBody(hostile) === None)
  }

  test("extractWavData walks RIFF chunks to the PCM payload, hostile sizes refuse") {
    val body = (0 until 100).map(_.toByte).toArray
    val wav = MediaCodec.writeWav(44100, 2, body)
    assert(MediaCodec.extractWavData(wav).get.toSeq === body.toSeq)
    assert(MediaCodec.extractWavData(body) === None)
    val hostile = wav.clone()
    hostile(43) = 0x7f.toByte // data-chunk size (LE u32) → absurdly large
    assert(MediaCodec.extractWavData(hostile) === None)
    // one fingerprint function across modalities: the WAV data chunk
    // hashes identically to the same bytes as an image plane
    assert(MediaCodec.dHash60(MediaCodec.extractWavData(wav).get)
      === MediaCodec.dHash60(body))
  }

  test("decodeWavSamples: real PCM decode — bit depth + channel downmix") {
    val body = (0 until 100).map(_.toByte).toArray
    // 8-bit mono: the data bytes ARE the samples (identity decode)
    assert(MediaCodec.decodeWavSamples(
      MediaCodec.writeWav(8000, 1, body)).get.toSeq === body.toSeq)
    // 8-bit stereo: frames downmix by integer mean; odd tail drops
    val stereo = Array[Byte](10, 20, 30, 40, 50)
    val mixed = MediaCodec.decodeWavSamples(
      MediaCodec.writeWav(8000, 2, stereo)).get
    assert(mixed.toSeq === Seq(15.toByte, 35.toByte))
    // 16-bit mono LE: (s >> 8) + 128 — 0x7F00 → 0x7F+128=255, -32768 → 0
    val s16 = Array[Byte](0x00, 0x7f, 0x00, 0x80.toByte, 0x34, 0x12)
    val dec16 = MediaCodec.decodeWavSamples(
      MediaCodec.writeWav(8000, 1, s16, bits = 16)).get
    assert(dec16.toSeq === Seq(255.toByte, 0.toByte, (0x12 + 128).toByte))
    // unsupported depth refuses (hand-patch the bits field at offset 34;
    // 24-bit PCM DECODES since round 14 — 12-bit does not exist in PCM)
    val odd = MediaCodec.writeWav(8000, 1, body)
    odd(34) = 12
    assert(MediaCodec.decodeWavSamples(odd) === None)
    assert(MediaCodec.decodeWavSamples(body) === None)
  }

  test("extractJpegBody walks the marker chain to the entropy-coded segment") {
    val body = "the keyframe pixel stand-in bytes of a sampled video frame!!"
      .getBytes(StandardCharsets.US_ASCII)
    val jpeg = MediaCodec.writeJpeg(320, 200, body)
    assert(MediaCodec.extractJpegBody(jpeg).get.toSeq === body.toSeq)
    assert(MediaCodec.extractJpegBody(body) === None) // no SOI
    assert(MediaCodec.extractJpegBody(jpeg.dropRight(1)) === None) // no EOI
    // cross-modality fingerprint identity, same as the WAV case
    val plane = (0 until 100).map(_.toByte).toArray
    assert(MediaCodec.dHash60(
      MediaCodec.extractJpegBody(MediaCodec.writeJpeg(8, 8, plane)).get)
      === MediaCodec.dHash60(plane))
  }

  // ---------------- real PNG decode (inflate + unfilter + luma) -------

  test("decodePngLuma round-trips every filter type, stored and Deflater-compressed") {
    // 5 rows × 31 px: row r carries filter type r, so Sub/Up/Average/
    // Paeth all run against a real prior row; pixel values sweep the
    // byte range including wraparound-sensitive deltas
    val w = 31; val h = 5
    val px = Array.tabulate(w * h)(i => ((i * 37 + (i * i) % 251) % 256).toByte)
    for (compress <- Seq(false, true)) {
      val png = MediaCodec.writePngPixels(w, h, 0, px, r => r, compress)
      assert(MediaCodec.decodePngLuma(png).get.toSeq === px.toSeq,
        s"gray round trip failed (compress=$compress)")
    }
    // RGB: luma is the BT.601 integer combination of the decoded channels
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 53) % 256).toByte)
    val pngRgb = MediaCodec.writePngPixels(w, h, 2, rgb, r => 4 - r, compress = true)
    val luma = MediaCodec.decodePngLuma(pngRgb).get
    assert(luma.length === w * h)
    val expect0 = ((rgb(0) & 0xff) * 299 + (rgb(1) & 0xff) * 587 +
      (rgb(2) & 0xff) * 114) / 1000
    assert((luma(0) & 0xff) === expect0)
  }

  test("PNG colorTypes 3/4/6: palette, gray+alpha and RGBA decode to the same luma") {
    // one 16x4 picture expressed four ways — truecolor RGB, RGBA with a
    // varying alpha channel, gray+alpha, and palette-indexed — must
    // produce consistent luma planes (alpha is composition state, not
    // picture content; the web's transparent PNGs must near-dup match
    // their flattened re-encodes)
    val w = 16; val h = 4
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 41 + 7) % 256).toByte)
    val viaRgb = MediaCodec.decodePngLuma(
      MediaCodec.writePngPixels(w, h, 2, rgb, r => r % 5, compress = true)).get
    // RGBA: same colors, alpha sweeping — luma must not move
    val rgba = new Array[Byte](w * h * 4)
    for (k <- 0 until w * h) {
      rgba(4 * k) = rgb(3 * k); rgba(4 * k + 1) = rgb(3 * k + 1)
      rgba(4 * k + 2) = rgb(3 * k + 2); rgba(4 * k + 3) = (k * 17 % 256).toByte
    }
    val viaRgba = MediaCodec.decodePngLuma(
      MediaCodec.writePngPixels(w, h, 6, rgba, r => 4 - r, compress = true)).get
    assert(viaRgba.toSeq === viaRgb.toSeq, "alpha must not change the luma")
    // gray+alpha: gray samples = the RGB luma; alpha ignored
    val ga = new Array[Byte](w * h * 2)
    for (k <- 0 until w * h) {
      ga(2 * k) = viaRgb(k); ga(2 * k + 1) = (255 - k % 256).toByte
    }
    val viaGa = MediaCodec.decodePngLuma(
      MediaCodec.writePngPixels(w, h, 4, ga, _ % 5)).get
    assert(viaGa.toSeq === viaRgb.toSeq, "gray+alpha luma is the gray sample")
    // palette: indices into a 64-entry PLTE built from the same colors
    val palette = new Array[Byte](64 * 3)
    for (e <- 0 until 64) {
      palette(3 * e) = rgb(3 * e); palette(3 * e + 1) = rgb(3 * e + 1)
      palette(3 * e + 2) = rgb(3 * e + 2)
    }
    val indices = Array.tabulate(w * h)(k => (k % 64).toByte)
    val pal = MediaCodec.writePngPixels(w, h, 3, indices, r => r % 5,
      compress = false, palette = palette)
    val viaPal = MediaCodec.decodePngLuma(pal).get
    for (k <- 0 until w * h) {
      val e = k % 64
      val want = ((palette(3 * e) & 0xff) * 299 + (palette(3 * e + 1) & 0xff) * 587 +
        (palette(3 * e + 2) & 0xff) * 114) / 1000
      assert((viaPal(k) & 0xff) === want, s"palette pixel $k")
    }
    // an index past the palette is corrupt, not an exception
    val overIdx = MediaCodec.writePngPixels(w, h, 3,
      Array.tabulate(w * h)(k => if (k == 7) 99.toByte else 0.toByte),
      _ => 0, compress = false, palette = palette.take(30)) // 10 entries
    assert(MediaCodec.decodePngLuma(overIdx) === None,
      "palette index past PLTE refuses")
  }

  test("decodePngLuma refuses what it cannot decode, never throws") {
    val px = Array.tabulate(64)(_.toByte)
    val good = MediaCodec.writePngPixels(8, 8, 0, px, _ % 5)
    assert(MediaCodec.decodePngLuma(good).isDefined)
    def mut(at: Int, v: Int): Array[Byte] = {
      val c = good.clone(); c(at) = v.toByte; c
    }
    // depth 16 and Adam7 DECODE now (round 14); flipping only the IHDR
    // byte leaves the stream sized for the 8-bit sequential layout, so
    // both mutants still refuse — as length mismatches, not profile cuts
    assert(MediaCodec.decodePngLuma(mut(24, 16)) === None,
      "16-bit IHDR over an 8-bit-sized stream: length mismatch")
    assert(MediaCodec.decodePngLuma(mut(24, 4)) === None, "depth 4 unsupported")
    // colorType 3 DECODES now (round 13) — but only with a PLTE chunk,
    // which this mutant lacks
    assert(MediaCodec.decodePngLuma(mut(25, 3)) === None,
      "paletted image without a PLTE chunk")
    assert(MediaCodec.decodePngLuma(mut(25, 5)) === None, "colorType 5 illegal")
    assert(MediaCodec.decodePngLuma(mut(28, 1)) === None,
      "Adam7 IHDR over a sequential-layout stream: length mismatch")
    assert(MediaCodec.decodePngLuma(mut(28, 2)) === None, "interlace 2 illegal")
    assert(MediaCodec.decodePngLuma(good.dropRight(20)) === None, "truncated IDAT")
    // corrupt zlib payload: DataFormatException is caught → None
    val corrupt = good.clone(); corrupt(45) = 0xff.toByte; corrupt(46) = 0xff.toByte
    assert(MediaCodec.decodePngLuma(corrupt) === None)
    // a filter byte outside 0–4 refuses: IDAT data starts at 41
    // (8 sig + 25 IHDR chunk + 8 IDAT len/type), then 2 zlib header +
    // 5 stored-block header → the first scanline's filter byte is at 48
    assert((good(48) & 0xff) <= 4, "fixture sanity: offset 48 is the filter byte")
    assert(MediaCodec.decodePngLuma(mut(48, 9)) === None, "filter type 9")
    assert(MediaCodec.decodePngLuma("not a png".getBytes) === None)
    // FDICT: zlib FLG byte 0x20 sets the preset-dictionary bit with a
    // valid header check ((0x78·256 + 0x20) % 31 == 0). PNG forbids
    // preset dictionaries; Inflater.inflate() returns 0 here with
    // needsDictionary() — NOT needsInput() — so a needsInput-only bail
    // would spin this executor forever. Must refuse, promptly.
    assert((good(41) & 0xff) === 0x78, "fixture sanity: zlib CMF at 41")
    assert(MediaCodec.decodePngLuma(mut(42, 0x20)) === None,
      "FDICT stream must refuse with None, not loop")
  }

  test("encodeFor emits a REAL grayscale PNG whose decoded luma is the text bytes") {
    val md = MessageDigest.getInstance("MD5")
    // length 72 → divisible by 4 → a 18×4 rectangle, filters cycle by row
    val text = "a real png now: the pixel plane is this very sentence, 8-bit gray......!"
    assert(text.length === 72)
    val png = MediaCodec.encodeFor("image", text, md)
    assert(MediaCodec.parsePng(png) === Some((18, 4)))
    assert(MediaCodec.decodePngLuma(png).get.toSeq ===
      text.getBytes(StandardCharsets.UTF_8).toSeq)
    // the documented container-length arithmetic (q42's oracle)
    assert(png.length === 63 + (72 + 4) + 5)
    // pngRows picks the largest divisor in {4,3,2,1}
    assert(MediaCodec.pngRows(72) === 4 && MediaCodec.pngRows(69) === 3 &&
      MediaCodec.pngRows(46) === 2 && MediaCodec.pngRows(47) === 1)
  }

  test("zlibStored emits a standard stream Inflater accepts, incl. multi-block") {
    val data = Array.tabulate(70000)(i => (i % 251).toByte) // > one 65535 block
    val z = MediaCodec.zlibStored(data)
    assert(z.length === 6 + data.length + 5 * 2)
    val inf = new java.util.zip.Inflater()
    inf.setInput(z)
    val out = new Array[Byte](data.length)
    var got = 0
    while (got < out.length && !inf.finished())
      got += inf.inflate(out, got, out.length - got)
    inf.end()
    assert(got === data.length && out.toSeq === data.toSeq)
  }

  // ---------------- real baseline JPEG codec (round 13) ----------------

  test("writeJpegTiles → decodeJpegLuma: exact round trip through real Huffman + IDCT") {
    // every byte value appears, including the category-8 extremes
    val bytes = Array.tabulate(256)(i => i.toByte)
    val jpeg = MediaCodec.writeJpegTiles(bytes, rows = 4) // 64 cols × 4 rows
    // documented container arithmetic: 148 header/tables + 2 bytes/block
    assert(jpeg.length === 148 + 2 * 256)
    assert(MediaCodec.parseJpeg(jpeg) === Some((8 * 64, 8 * 4)))
    // no stuffing byte anywhere in the 16-bit-per-block tile profile:
    // entropy is exactly 2·blocks bytes (already implied by the length)
    val plane = MediaCodec.decodeJpegLuma(jpeg).get
    assert(plane.length === 512 * 32)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 512) {
        assert((plane(y * 512 + x) & 0xff) === ((y / 8) * 64 + x / 8),
          s"pixel ($x,$y) must equal its tile byte")
        x += 1
      }
      y += 1
    }
    // block means ARE the payload bytes — the oracle invariant
    assert(MediaCodec.decodeJpegBlockMeans(jpeg).get.toSeq === bytes.toSeq)
  }

  test("decodeJpegLuma is a GENERAL decoder: AC coefficients, quant, restarts") {
    // general profile: multi-length-free but multi-category tables,
    // real AC run/size coding, dequant by a non-trivial table, restart
    // markers every 2 MCUs — decoded against an independent reference
    // IDCT computed right here (T.81 allows ±1 LSB between conforming
    // IDCTs; the tile profile above already pins the exact case)
    val quant = Array.tabulate(64)(k => 1 + (k % 3)) // zigzag order
    val blocks = Array.tabulate(6) { m =>
      Array.tabulate(64) { k =>
        if (k == 0) (m * 17) % 50 - 25
        else if ((k + m) % 7 == 0) ((k * 31 + m * 13) % 81) - 40
        else 0
      }
    }
    val jpeg = MediaCodec.writeJpegGray(48, 8, quant, blocks,
      MediaCodec.GenDcCounts, MediaCodec.GenDcSymbols,
      MediaCodec.GenAcCounts, MediaCodec.GenAcSymbols, restartInterval = 2)
    // restart markers really are in the stream (D0 then D1)
    def hasMarker(m: Int) = jpeg.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)
    assert(hasMarker(0xd0) && hasMarker(0xd1), "RST0/RST1 expected")
    val plane = MediaCodec.decodeJpegLuma(jpeg).get
    // independent naive IDCT over the dequantized blocks
    val zz = MediaCodec.ZigZagNat
    def c(u: Int) = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
    var m = 0
    while (m < 6) {
      val nat = new Array[Int](64)
      (0 until 64).foreach(k => nat(zz(k)) = blocks(m)(k) * quant(k))
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var s = 0.0
          for (v <- 0 until 8; u <- 0 until 8)
            s += c(u) * c(v) * nat(v * 8 + u) *
              StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0) *
              StrictMath.cos((2 * y + 1) * v * StrictMath.PI / 16.0) / 4.0
          val want = math.max(0, math.min(255, Math.round(s).toInt + 128))
          val got = plane(y * 48 + m * 8 + x) & 0xff
          assert(math.abs(got - want) <= 1,
            s"block $m pixel ($x,$y): decoded $got vs reference $want")
          x += 1
        }
        y += 1
      }
      m += 1
    }
    // a corrupted restart sequence refuses instead of desyncing
    val idx = jpeg.indices.find(i =>
      (jpeg(i) & 0xff) == 0xff && i + 1 < jpeg.length &&
        (jpeg(i + 1) & 0xff) == 0xd0).get
    val badRst = jpeg.clone(); badRst(idx + 1) = 0xd5.toByte
    assert(MediaCodec.decodeJpegLuma(badRst) === None, "RST out of sequence")
  }

  test("byte stuffing: entropy 0xFF is escaped on write and unstuffed on read") {
    // DC-only two-tile images over the GENERAL tables (4-bit DC codes,
    // value bits up to 8 ones in a row): sweep payloads until the
    // entropy stream really contains a stuffed 0xFF 0x00 — every sweep
    // member must still round-trip exactly (quant DC=8 tile semantics)
    val quant = Array.fill(64)(1); quant(0) = 8
    var stuffedSeen = false
    var v1 = 0
    while (v1 < 256) {
      // v2 = 255 − v1 puts (0, 255) in the sweep: DC diff +255 = cat 8
      // with value bits 11111111 landing byte-aligned after block 1's
      // 20 bits — a guaranteed raw 0xFF the writer must stuff
      val v2 = 255 - v1
      val blocks = Array(v1, v2).map { v =>
        val blk = new Array[Int](64); blk(0) = v - 128; blk
      }
      val jpeg = MediaCodec.writeJpegGray(16, 8, quant, blocks,
        MediaCodec.GenDcCounts, MediaCodec.GenDcSymbols,
        MediaCodec.GenAcCounts, MediaCodec.GenAcSymbols)
      // entropy starts after the SOS segment and ends before EOI: any
      // 0xFF there must be followed by 0x00
      val sosAt = jpeg.indices.find(i =>
        (jpeg(i) & 0xff) == 0xff && i + 1 < jpeg.length &&
          (jpeg(i + 1) & 0xff) == 0xda).get
      var i = sosAt + 2 + 8 // marker + the 8-byte SOS segment
      while (i < jpeg.length - 2) {
        if ((jpeg(i) & 0xff) == 0xff) {
          assert((jpeg(i + 1) & 0xff) == 0x00, s"unstuffed 0xFF at $i (v1=$v1)")
          stuffedSeen = true
        }
        i += 1
      }
      val means = MediaCodec.decodeJpegBlockMeans(jpeg).get
      assert(means.toSeq === Seq(v1.toByte, v2.toByte),
        s"round trip broke at v1=$v1 v2=$v2")
      v1 += 1
    }
    assert(stuffedSeen, "the sweep must hit at least one stuffed byte")
  }

  test("color YCbCr decode: 4:2:0 / 4:2:2 / 4:4:4, chroma skipped, restarts, edge clip") {
    // tile-profile quant (DC 8, AC 1): a DC-only luma block of
    // blk(0) = v − 128 decodes to the constant tile v EXACTLY, so every
    // expectation below is exact integer arithmetic. Chroma blocks get
    // DC + scattered AC coefficients — if the decoder mis-skipped a
    // single chroma bit the stream would desync and the luma tiles
    // would come back wrong, so "chroma advanced correctly" is proven
    // by the luma values themselves.
    val quant = Array.fill(64)(1); quant(0) = 8
    def tile(v: Int): Array[Int] = {
      val blk = new Array[Int](64); blk(0) = v - 128; blk
    }
    def chroma(seed: Int): Array[Int] = Array.tabulate(64) { k =>
      if (k == 0) (seed * 29) % 200 - 100
      else if ((k + seed) % 5 == 0) ((k * 7 + seed) % 21) - 10
      else 0
    }

    // ---- 4:2:0 (luma 2x2): one 16x16 MCU, luma raster WITHIN the MCU
    val y420 = Array(10, 200, 60, 140).map(tile)
    val j420 = MediaCodec.writeJpegYcc(16, 16, quant, y420,
      Array(chroma(1)), Array(chroma(2)), hSamp = 2, vSamp = 2)
    assert(MediaCodec.parseJpeg(j420) === Some((16, 16)))
    val p420 = MediaCodec.decodeJpegLuma(j420).get
    assert(p420.length === 256)
    for (y <- 0 until 16; x <- 0 until 16)
      assert((p420(y * 16 + x) & 0xff) === Array(10, 200, 60, 140)((y / 8) * 2 + x / 8),
        s"4:2:0 pixel ($x,$y)")
    // the decoded luma equals the same blocks through the GRAY writer:
    // one picture, two container layouts, one plane
    val g = MediaCodec.writeJpegGray(16, 16, quant, y420,
      MediaCodec.GenDcCounts, MediaCodec.GenDcSymbols,
      MediaCodec.GenAcCounts, MediaCodec.GenAcSymbols)
    assert(p420.toSeq === MediaCodec.decodeJpegLuma(g).get.toSeq)

    // ---- 4:2:2 (luma 2x1): two MCUs with a restart between them —
    // per-component DC predictors must all reset at the RST boundary
    val y422 = Array(30, 90, 150, 210).map(tile)
    val j422 = MediaCodec.writeJpegYcc(32, 8, quant, y422,
      Array(chroma(3), chroma(4)), Array(chroma(5), chroma(6)),
      hSamp = 2, vSamp = 1, restartInterval = 1)
    def hasMarker(b: Array[Byte], m: Int) = b.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)
    assert(hasMarker(j422, 0xd0), "RST0 between the two MCUs")
    val p422 = MediaCodec.decodeJpegLuma(j422).get
    for (y <- 0 until 8; x <- 0 until 32)
      assert((p422(y * 32 + x) & 0xff) === Array(30, 90, 150, 210)(x / 8),
        s"4:2:2 pixel ($x,$y)")

    // ---- 4:4:4 (luma 1x1): three MCUs of one block per component
    val y444 = Array(5, 128, 250).map(tile)
    val j444 = MediaCodec.writeJpegYcc(24, 8, quant, y444,
      Array(chroma(7), chroma(8), chroma(9)),
      Array(chroma(10), chroma(11), chroma(12)), hSamp = 1, vSamp = 1)
    val p444 = MediaCodec.decodeJpegLuma(j444).get
    for (y <- 0 until 8; x <- 0 until 24)
      assert((p444(y * 24 + x) & 0xff) === Array(5, 128, 250)(x / 8),
        s"4:4:4 pixel ($x,$y)")

    // ---- edge clipping: a 12x12 image inside one 16x16 4:2:0 MCU —
    // the padding block regions decode (they consumed entropy bits)
    // but clip at the w×h boundary
    val jClip = MediaCodec.writeJpegYcc(12, 12, quant,
      Array(1, 2, 3, 4).map(v => tile(v * 50)),
      Array(chroma(13)), Array(chroma(14)), hSamp = 2, vSamp = 2)
    val pClip = MediaCodec.decodeJpegLuma(jClip).get
    assert(pClip.length === 144)
    for (y <- 0 until 12; x <- 0 until 12)
      assert((pClip(y * 12 + x) & 0xff) === ((y / 8) * 2 + x / 8 + 1) * 50,
        s"clip pixel ($x,$y)")

    // ---- magic-sniff integration: the color container flows through
    // the image plane dispatch to block means (luma-only, exact here)
    assert(MediaCodec.decodeImagePlane(j420).get.toSeq ===
      Seq(10, 200, 60, 140).map(_.toByte))
  }

  test("writeJpegYccTiles: exact color round trip; one picture, three containers, one hash") {
    val bytes = Array.tabulate(256)(i => i.toByte) // all byte values
    val jpeg = MediaCodec.writeJpegYccTiles(bytes, rows = 4)
    // documented container arithmetic: 158 header/tables + 6 bytes/MCU
    assert(jpeg.length === 158 + 6 * 256)
    assert(MediaCodec.parseJpeg(jpeg) === Some((8 * 64, 8 * 4)))
    // the decoded luma is the byte tiles exactly — through a genuinely
    // interleaved 3-component scan
    val plane = MediaCodec.decodeJpegLuma(jpeg).get
    assert(plane.length === 512 * 32)
    for (y <- 0 until 32; x <- 0 until 512)
      assert((plane(y * 512 + x) & 0xff) === ((y / 8) * 64 + x / 8),
        s"pixel ($x,$y) must equal its tile byte")
    // block means ARE the payload bytes — the q160 oracle invariant
    assert(MediaCodec.decodeJpegBlockMeans(jpeg).get.toSeq === bytes.toSeq)
    // container robustness: grayscale PNG, grayscale JPEG and color
    // JPEG of the same picture hash to the SAME 60-bit fingerprint
    val viaColor = MediaCodec.decodeImagePlane(jpeg).get
    val viaGray = MediaCodec.decodeImagePlane(
      MediaCodec.writeJpegTiles(bytes, rows = 4)).get
    val viaPng = MediaCodec.decodeImagePlane(
      MediaCodec.writePngPixels(256, 1, 0, bytes, _ => 0)).get
    assert(MediaCodec.dHash60(viaColor) === MediaCodec.dHash60(viaGray))
    assert(MediaCodec.dHash60(viaColor) === MediaCodec.dHash60(viaPng))
  }

  test("colorImageHashes agree with imageHashes doc-for-doc (PNG vs color JPEG)") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    import ss.implicits._
    val t1 = "the quick brown fox jumps over the lazy dog zz " * 3
    val t2 = "pack my box with five dozen liquor jugs now yy " * 3
    val docs = Seq((1L, t1, "src3"), (2L, t2, "src6"), (3L, t1, "src4"))
      .toDF("doc_id", "text", "source") // 3,6 → image; 4 → audio (skipped)
    val png = graft.multimodal.Media.imageHashes(docs).collect().toMap
    val ycc = graft.multimodal.Media.colorImageHashes(docs).collect().toMap
    assert(png.keySet === Set(1L, 2L) && ycc.keySet === Set(1L, 2L))
    assert(png === ycc, "container change must not move a perceptual hash")
  }

  test("color YCbCr malformations refuse: subsampled luma, dup ids, MCU bound, scan mismatch") {
    val quant = Array.fill(64)(1); quant(0) = 8
    def tile(v: Int): Array[Int] = {
      val blk = new Array[Int](64); blk(0) = v - 128; blk
    }
    val zero = new Array[Int](64)
    // 4:2:0 fixture: SOF0 data starts at 75 (SOI 2 + DQT 69 + marker 2
    // + len 2): nf@80, then (id,hv,tq) triplets @81..89
    val j = MediaCodec.writeJpegYcc(16, 16, quant,
      Array(10, 20, 30, 40).map(tile), Array(zero), Array(zero))
    assert(MediaCodec.decodeJpegLuma(j).isDefined)
    assert((j(71) & 0xff) === 0xff && (j(72) & 0xff) === 0xc0, "SOF0 at 71")
    def mut(at: Int, v: Int): Array[Byte] = {
      val c = j.clone(); c(at) = v.toByte; c
    }
    // chroma sampling above luma ⇒ the returned plane would be
    // sub-resolution Y: refuse by name
    assert(MediaCodec.decodeJpegLuma(mut(85, 0x41)) === None, "Cb H=4 > Y H=2")
    assert(MediaCodec.decodeJpegLuma(mut(88, 0x14)) === None, "Cr V=4 > Y V=2")
    // duplicate component ids are malformed
    assert(MediaCodec.decodeJpegLuma(mut(84, 1)) === None, "Cb id duplicates Y")
    // T.81 B.2.3: at most 10 data units per interleaved MCU (2x2 + 2x2
    // + 2x2 = 12)
    val bound = mut(85, 0x22); bound(88) = 0x22.toByte
    assert(MediaCodec.decodeJpegLuma(bound) === None, "sum Hi*Vi > 10")
    // scan header must cover all three components in frame order
    val sosAt = j.indices.find(i =>
      (j(i) & 0xff) == 0xff && i + 1 < j.length && (j(i + 1) & 0xff) == 0xda).get
    assert(MediaCodec.decodeJpegLuma(mut(sosAt + 4, 1)) === None, "ns=1 != nf=3")
    assert(MediaCodec.decodeJpegLuma(mut(sosAt + 5, 2)) === None,
      "scan components out of frame order")
    // sampling factor 0 is malformed
    assert(MediaCodec.decodeJpegLuma(mut(82, 0x02)) === None, "Y H=0")
    // truncating the color entropy stream refuses, never throws
    assert(MediaCodec.decodeJpegLuma(j.dropRight(6)) === None, "truncated")
  }

  test("decodeJpegLuma refuses every non-baseline profile, never throws") {
    val bytes = Array.tabulate(96)(i => ((i * 37 + 5) % 256).toByte)
    val good = MediaCodec.writeJpegTiles(bytes, rows = 4)
    assert(MediaCodec.decodeJpegLuma(good).isDefined)
    // fixed layout: SOI(2) + DQT(69) → SOF0 marker at offset 71
    assert((good(71) & 0xff) === 0xff && (good(72) & 0xff) === 0xc0)
    def mut(at: Int, v: Int): Array[Byte] = {
      val c = good.clone(); c(at) = v.toByte; c
    }
    // SOF2 DECODES now (round 13) — but this mutant stays malformed: a
    // progressive frame whose single scan spans the full band (DC and
    // AC never share a progressive scan)
    assert(MediaCodec.decodeJpegLuma(mut(72, 0xc2)) === None,
      "progressive frame with a baseline full-band scan header")
    assert(MediaCodec.decodeJpegLuma(mut(72, 0xc9)) === None, "arithmetic SOF9")
    assert(MediaCodec.decodeJpegLuma(mut(72, 0xc1)) === None, "extended SOF1")
    assert(MediaCodec.decodeJpegLuma(mut(72, 0xc3)) === None, "lossless SOF3")
    assert(MediaCodec.decodeJpegLuma(mut(75, 12)) === None, "12-bit precision")
    assert(MediaCodec.decodeJpegLuma(mut(80, 3)) === None,
      "3-component count on a 1-component payload: length mismatch")
    assert(MediaCodec.decodeJpegLuma(mut(80, 2)) === None, "2-component frame")
    assert(MediaCodec.decodeJpegLuma(mut(80, 4)) === None, "4-component CMYK")
    // declared 2x2 sampling on a SINGLE-component frame is LEGAL and
    // ignored (T.81 A.2.4: a one-component scan is non-interleaved,
    // data units tile the component's own grid) — decodes identically
    assert(MediaCodec.decodeJpegLuma(mut(82, 0x22)).get.toSeq ===
      MediaCodec.decodeJpegLuma(good).get.toSeq,
      "sampling factors are ignored for single-component scans")
    assert(MediaCodec.decodeJpegLuma(good.dropRight(10)) === None, "truncated entropy")
    assert(MediaCodec.decodeJpegLuma(good.take(100)) === None, "no SOS")
    assert(MediaCodec.decodeJpegLuma("not a jpeg".getBytes) === None)
    // the opaque-body writer (no DQT/DHT/SOS at all) refuses cleanly
    assert(MediaCodec.decodeJpegLuma(
      MediaCodec.writeJpeg(32, 32, "opaque".getBytes)) === None)
    // a raw 0xFF inside entropy (not stuffed, not a marker we expect)
    // is malformed, not an infinite loop: patch the first entropy byte
    val entAt = 146 // header is fixed-length for the tile profile
    assert(MediaCodec.decodeJpegLuma(mut(entAt, 0xff)) === None)
  }

  test("progressive JPEG: spectral selection + successive approximation, gray") {
    // rich AC content through the full canonical scan script (DC first
    // at Al=1, two spectral AC bands at Al=1, DC refinement, AC
    // refinements) vs the SAME blocks through the baseline writer: one
    // image, two codings, ONE plane — both recover the exact quantized
    // coefficients and share the IDCT, so the planes are bit-identical
    val quant = Array.tabulate(64)(k => 1 + (k % 4))
    val blocks = Array.tabulate(6) { m =>
      Array.tabulate(64) { k =>
        if (k == 0) (m * 37) % 120 - 60
        else if ((k + m) % 6 == 0) ((k * 13 + m * 7) % 41) - 20
        else if ((k + 2 * m) % 17 == 0) ((k * 3 + m) % 15) - 7
        else 0
      }
    }
    val prog = MediaCodec.writeJpegProgressive(24, 16, quant, blocks)
    def countMarker(jb: Array[Byte], m: Int) = jb.sliding(2).count(pr =>
      (pr(0) & 0xff) == 0xff && (pr(1) & 0xff) == m)
    assert(countMarker(prog, 0xc2) === 1, "SOF2 frame")
    // dcFirst + two spectral AC bands + dcRefine + two AC refinements
    assert(countMarker(prog, 0xda) === 6, "six scans for grayscale")
    assert(MediaCodec.parseJpeg(prog) === Some((24, 16)))
    val base = MediaCodec.writeJpegGray(24, 16, quant, blocks,
      MediaCodec.GenDcCounts, MediaCodec.GenDcSymbols,
      MediaCodec.GenAcCounts, MediaCodec.GenAcSymbols)
    val plane = MediaCodec.decodeJpegLuma(prog)
    assert(plane.isDefined, "progressive decode must succeed")
    assert(plane.get.toSeq === MediaCodec.decodeJpegLuma(base).get.toSeq,
      "progressive and baseline codings of one image must decode identically")
    // magic-sniff integration: progressive flows through the image
    // plane dispatch like any JPEG
    assert(MediaCodec.decodeImagePlane(prog).get.toSeq ===
      MediaCodec.decodeImagePlane(base).get.toSeq)
  }

  test("progressive color 4:2:0 with restarts: chroma scans skipped, plane matches baseline") {
    val quant = Array.fill(64)(1); quant(0) = 4
    // 32x16 at 2x2 sampling: 2 MCUs, luma grid 4x2 (8 raster blocks)
    val y = Array.tabulate(8)(i => Array.tabulate(64) { k =>
      if (k == 0) i * 23 - 80
      else if (k % 9 == (i % 4)) ((k * 5 + i) % 19) - 9
      else 0
    })
    val cb = Array.tabulate(2)(i => Array.tabulate(64) { k =>
      if (k == 0) 31 - 17 * i else if (k % 11 == 3) 6 - k % 13 else 0
    })
    val cr = Array.tabulate(2)(i => Array.tabulate(64) { k =>
      if (k == 0) -25 + 9 * i else if (k % 7 == 2) k % 9 - 4 else 0
    })
    // restartInterval 1: every scan restarts at every MCU/block — the
    // hardest cadence (DC predictors, EOB runs and correction buffers
    // all reset mid-scan on both sides)
    val prog = MediaCodec.writeJpegProgressive(32, 16, quant, y, cb, cr,
      hSamp = 2, vSamp = 2, restartInterval = 1)
    // baseline takes luma in MCU scan order: MCU0 = raster 0,1,4,5
    val yMcu = Array(0, 1, 4, 5, 2, 3, 6, 7).map(y)
    val base = MediaCodec.writeJpegYcc(32, 16, quant, yMcu, cb, cr,
      hSamp = 2, vSamp = 2)
    val plane = MediaCodec.decodeJpegLuma(prog)
    assert(plane.isDefined, "progressive color decode must succeed")
    assert(plane.get.toSeq === MediaCodec.decodeJpegLuma(base).get.toSeq)
  }

  test("non-interleaved baseline: three separate full-band scans decode like one") {
    // SOF0 with one scan per component (old scanners, TIFF-embedded
    // JPEGs): the luma scan renders, the chroma scans skip whole by
    // marker scan — and the plane equals the interleaved coding of the
    // same blocks. Restart interval 1 exercises per-scan restart
    // cadence inside skipped AND decoded scans.
    val quant = Array.tabulate(64)(k => 1 + (k % 3))
    def blocksFor(seed: Int) = Array.tabulate(6)(m => Array.tabulate(64) { k =>
      if (k == 0) (m * 29 + seed * 13) % 100 - 50
      else if ((k + m + seed) % 7 == 0) ((k * 11 + m) % 31) - 15
      else 0
    })
    val y = blocksFor(0); val cb = blocksFor(1); val cr = blocksFor(2)
    val scans = MediaCodec.writeJpegYccScans(24, 16, quant, y, cb, cr,
      restartInterval = 1)
    def countMarker(jb: Array[Byte], m: Int) = jb.sliding(2).count(pr =>
      (pr(0) & 0xff) == 0xff && (pr(1) & 0xff) == m)
    assert(countMarker(scans, 0xda) === 3, "one scan per component")
    val inter = MediaCodec.writeJpegYcc(24, 16, quant, y, cb, cr,
      hSamp = 1, vSamp = 1) // 4:4:4 1x1: MCU order == raster order
    val plane = MediaCodec.decodeJpegLuma(scans)
    assert(plane.isDefined, "multi-scan baseline decode must succeed")
    assert(plane.get.toSeq === MediaCodec.decodeJpegLuma(inter).get.toSeq,
      "non-interleaved and interleaved codings must decode identically")
    // a truncated final scan refuses; a frame that never delivers the
    // luma scan refuses at EOI
    assert(MediaCodec.decodeJpegLuma(scans.dropRight(6)) === None)
    val lumaSos = scans.indices.find(i =>
      (scans(i) & 0xff) == 0xff && i + 1 < scans.length &&
        (scans(i + 1) & 0xff) == 0xda).get
    // repoint the luma scan at a chroma id: all three scans now skip
    val noLuma = scans.clone(); noLuma(lumaSos + 5) = 2.toByte
    assert(MediaCodec.decodeJpegLuma(noLuma) === None,
      "no luma scan anywhere: nothing to render")
  }

  test("APP0/COM segments pass through: a JFIF-wrapped progressive file decodes") {
    // every real-world JPEG leads with APP0 (JFIF) or APP1 (EXIF) and
    // often COM — splice them after SOI and the decode must not move
    val quant = Array.fill(64)(1); quant(0) = 8
    val blocks = Array.tabulate(4) { m =>
      val blk = new Array[Int](64); blk(0) = m * 31 - 60; blk(5) = 4 - m; blk
    }
    val prog = MediaCodec.writeJpegProgressive(16, 16, quant, blocks)
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        (((payload.length + 2) >> 8) & 0xff).toByte,
        ((payload.length + 2) & 0xff).toByte) ++ payload
    val app0 = seg(0xe0, "JFIF      "
      .getBytes(StandardCharsets.ISO_8859_1))
    val com = seg(0xfe, "shot on a potato".getBytes(StandardCharsets.US_ASCII))
    val wrapped = prog.take(2) ++ app0 ++ com ++ prog.drop(2)
    assert(MediaCodec.decodeJpegLuma(wrapped).get.toSeq ===
      MediaCodec.decodeJpegLuma(prog).get.toSeq,
      "APPn/COM wrappers must not change the decoded plane")
    assert(MediaCodec.parseJpeg(wrapped) === Some((16, 16)))
  }

  test("progressive malformations refuse: bad approximation step, truncation") {
    val quant = Array.fill(64)(1); quant(0) = 8
    val blocks = Array.tabulate(4) { m =>
      val blk = new Array[Int](64); blk(0) = m * 31 - 60; blk(7) = 5 - m; blk
    }
    val prog = MediaCodec.writeJpegProgressive(16, 16, quant, blocks)
    assert(MediaCodec.decodeJpegLuma(prog).isDefined)
    // second SOS = the first AC scan; its Ss/Se/AhAl trail the header
    val sosIdx = prog.indices.filter(i =>
      (prog(i) & 0xff) == 0xff && i + 1 < prog.length &&
        (prog(i + 1) & 0xff) == 0xda)
    assert(sosIdx.length === 6)
    val acSos = sosIdx(1)
    // scan header: marker(2) + len(2) + ns(1) + comp(2) + Ss Se AhAl
    val ahAlAt = acSos + 4 + 1 + 2 + 2
    assert((prog(ahAlAt) & 0xff) === 0x01, "first AC scan is Ah=0, Al=1")
    val badStep = prog.clone(); badStep(ahAlAt) = 0x31.toByte // Ah=3 != Al+1
    assert(MediaCodec.decodeJpegLuma(badStep) === None,
      "successive approximation must step one bit at a time")
    val badBand = prog.clone(); badBand(ahAlAt - 1) = 0.toByte // Se=0 with Ss=1
    assert(MediaCodec.decodeJpegLuma(badBand) === None, "inverted band")
    assert(MediaCodec.decodeJpegLuma(prog.dropRight(8)) === None, "truncated")
    assert(MediaCodec.decodeJpegLuma(prog.take(acSos)) === None,
      "EOI missing: a progressive frame must terminate")
  }

  test("dHash60: stable, 60-bit, and Hamming-local under small edits") {
    val base = ("the quick brown fox jumps over the lazy dog " * 4)
      .getBytes(StandardCharsets.UTF_8)
    val h0 = MediaCodec.dHash60(base)
    assert(h0 === MediaCodec.dHash60(base), "deterministic")
    assert((h0 >>> 60) === 0L, "60-bit: clear of the BIGINT sign range")
    // a single-byte edit perturbs at most 2 grid cells → ≤ 4 bits
    val edited = base.clone(); edited(10) = 'Q'.toByte
    val h1 = MediaCodec.dHash60(edited)
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 4,
      s"near-identical planes must hash Hamming-close, got ${
        java.lang.Long.bitCount(h0 ^ h1)}")
    // an unrelated plane lands far away
    val other = ("entirely different pixel content with other stats zz " * 4)
      .getBytes(StandardCharsets.UTF_8)
    assert(java.lang.Long.bitCount(h0 ^ MediaCodec.dHash60(other)) > 3)
    // floor guard
    intercept[IllegalArgumentException](MediaCodec.dHash60(new Array[Byte](65)))
  }

  test("exact-hash collapse: a 1000-copy hot group enumerates group-linear") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    import ss.implicits._
    // a meme: 1000 exact copies of one image payload, one near-dup
    // (single-character edit), one structurally-different far image
    val hot = "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj kkkk llll " * 3
    val near = hot.updated(4, 'z') // verified: dHash Hamming 2 from hot
    val far = "Zq9 KKKKK ab 0 mmmm D ww t 88888 e RRR iii L x 2 yyyyyy c AA 777 o pQ " * 3
    val docs = ((1L to 1000L).map(i => (i, hot, "src3")) ++
      Seq((2000L, near, "src3"), (3000L, far, "src3")))
      .toDF("doc_id", "text", "source")
    val hashes = graft.multimodal.Media.imageHashes(docs).toDF("doc_id", "h")
    // collapsed surface (the 100 TB path): O(groups + edges) rows —
    // 3 distinct payloads, ONE rep-level near-dup edge. The hot group's
    // 1000 members never enter the band join.
    val (groups, edges) = graft.queries.PipelineOps.hammingBandedGroups(hashes)
    val g = groups.collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(g.size === 3, s"3 distinct payloads expected: $g")
    assert(g(1L) === 1000L, "hot group collapses to rep=1 cnt=1000")
    val e = edges.collect()
    assert(e.length === 1 && e.head.getInt(2) <= 3,
      s"exactly one rep-level edge (hot~near): ${e.toSeq}")
    // band-join input is 4 banded rows per DISTINCT hash (12 total),
    // linear in groups — not 4 x 1002 member rows
    val repPairs = graft.queries.PipelineOps.hammingBandedRepPairs(
      hashes.select("h").distinct())
    assert(repPairs.count() === 1L)
    // the expanded pairwise contract still holds exactly: C(1000,2)
    // within-group pairs + 1000 cross pairs to the near-dup, none to far
    val q = graft.queries.PipelineOps.q155ImageNearDupOn(docs)
    val byDist = q.groupBy("hamming_dist").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(byDist(0) === 1000L * 999L / 2, s"within-group pairs: $byDist")
    assert(byDist.filter(_._1 > 0).values.sum === 1000L, s"cross pairs: $byDist")
  }

  test("videoFrameHashes: per-frame JPEG round trip; payloadKeys/perceptualHashesAll one-pass") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    import ss.implicits._
    val t1 = "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj kkkk llll " * 2
    val frames = Seq((1L, 0, t1), (1L, 1, t1.reverse), (2L, 0, t1))
      .toDF("doc_id", "frame_idx", "frame_text")
    val fh = graft.multimodal.Media.videoFrameHashes(frames).collect()
      .map { case (id, k, h) => ((id, k), h) }.toMap
    assert(fh.size === 3)
    // same frame text → same hash across videos; reversed frame lands far
    assert(fh((1L, 0)) === fh((2L, 0)))
    assert(java.lang.Long.bitCount(fh((1L, 0)) ^ fh((1L, 1))) > 3)
    // frame hash == the direct dHash of the frame bytes: the REAL
    // encode→decode round trip (Huffman + dequant + IDCT → block
    // means) is exactly lossless on the constant-tile profile
    assert(fh((1L, 0)) === MediaCodec.dHash60(t1.getBytes(StandardCharsets.UTF_8)))

    // payloadKeys: md5 over REAL container bytes — equal iff (fmt, text) equal
    val docs = Seq((1L, t1, "src3"), (2L, t1, "src6"), (3L, t1, "src4"))
      .toDF("doc_id", "text", "source") // 3,6 → image; 4 → audio
    val keys = graft.multimodal.Media.payloadKeys(docs).collect()
      .map { case (id, fmt, k) => id -> ((fmt, k)) }.toMap
    assert(keys(1L)._2 === keys(2L)._2, "same modality+text → same payload md5")
    assert(keys(1L)._2 !== keys(3L)._2, "different container → different md5")
    // one-pass fingerprints agree with the per-modality entry points
    val all = graft.multimodal.Media.perceptualHashesAll(docs).collect()
      .map { case (id, fmt, h) => id -> ((fmt, h)) }.toMap
    assert(all(1L)._1 === "image" && all(3L)._1 === "audio")
    assert(all(1L)._2 === all(2L)._2)
    assert(all(1L)._2 === MediaCodec.dHash60(t1.getBytes(StandardCharsets.UTF_8)),
      "image luma really decodes back to the text bytes")
  }

  test("Adam7 interlaced PNG: seven passes deinterlace to the same luma plane") {
    // odd dimensions exercise fractional passes; tiny sizes exercise
    // EMPTY passes (pw or ph = 0 contributes no bytes, spec §8.2)
    for ((w, h) <- Seq((13, 7), (8, 8), (1, 1), (2, 2), (3, 3), (5, 1),
      (1, 5), (16, 9), (7, 11))) {
      val px = Array.tabulate(w * h)(k => ((k * 37 + 11) % 251).toByte)
      val seqPng = MediaCodec.writePngPixels(w, h, 0, px, _ % 5)
      val lacePng = MediaCodec.writePngPixels(w, h, 0, px, r => (r + 2) % 5,
        interlace = true)
      assert(MediaCodec.decodePngLuma(seqPng).get.sameElements(px))
      val lace = MediaCodec.decodePngLuma(lacePng)
      assert(lace.isDefined, s"$w x $h interlaced must decode")
      assert(lace.get.sameElements(px), s"$w x $h deinterlace mismatch")
    }
    // color (RGB) interlaced + Deflater-compressed: same luma either way
    val w = 10; val h = 7
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 71 + 5) % 256).toByte)
    val seqC = MediaCodec.writePngPixels(w, h, 2, rgb, _ % 5, compress = true)
    val laceC = MediaCodec.writePngPixels(w, h, 2, rgb, r => (4 - r % 5),
      compress = true, interlace = true)
    assert(MediaCodec.decodePngLuma(laceC).get.sameElements(
      MediaCodec.decodePngLuma(seqC).get))
    // one picture, either coding, ONE perceptual hash — the q160
    // container-robustness contract extended to interlacing
    val big = Array.tabulate(12 * 12)(k => ((k * 97 + 3) % 256).toByte)
    val hs = MediaCodec.dHash60(
      MediaCodec.decodePngLuma(MediaCodec.writePngPixels(12, 12, 0, big)).get)
    val hl = MediaCodec.dHash60(MediaCodec.decodePngLuma(
      MediaCodec.writePngPixels(12, 12, 0, big, interlace = true)).get)
    assert(hs === hl)
  }

  test("16-bit PNG decodes to high-byte luma: every color type, interlaced too") {
    val w = 9; val h = 5
    val hi = Array.tabulate(w * h)(k => (k * 53 + 7) % 256)
    val lo = Array.tabulate(w * h)(k => (k * 91 + 31) % 256)
    // gray 16-bit: big-endian (hi, lo) pairs → luma = hi bytes
    val g16 = new Array[Byte](w * h * 2)
    for (k <- 0 until w * h) { g16(2 * k) = hi(k).toByte; g16(2 * k + 1) = lo(k).toByte }
    val gOut = MediaCodec.decodePngLuma(
      MediaCodec.writePngPixels(w, h, 0, g16, _ % 5, depth = 16))
    assert(gOut.get.sameElements(hi.map(_.toByte)))
    // RGB 16-bit with distinct channels → BT.601 over the high bytes
    val rgb16 = new Array[Byte](w * h * 6)
    for (k <- 0 until w * h) {
      val r = (k * 11) % 256; val g = (k * 29 + 100) % 256; val b = (k * 47 + 200) % 256
      rgb16(6 * k) = r.toByte; rgb16(6 * k + 1) = lo(k).toByte
      rgb16(6 * k + 2) = g.toByte; rgb16(6 * k + 3) = hi(k).toByte
      rgb16(6 * k + 4) = b.toByte; rgb16(6 * k + 5) = 0x55
    }
    val expected = Array.tabulate(w * h) { k =>
      val r = (k * 11) % 256; val g = (k * 29 + 100) % 256; val b = (k * 47 + 200) % 256
      ((r * 299 + g * 587 + b * 114) / 1000).toByte
    }
    assert(MediaCodec.decodePngLuma(
      MediaCodec.writePngPixels(w, h, 2, rgb16, _ % 5, depth = 16))
      .get.sameElements(expected))
    // gray+alpha 16-bit: gray high byte wins, alpha ignored
    val ga16 = new Array[Byte](w * h * 4)
    for (k <- 0 until w * h) {
      ga16(4 * k) = hi(k).toByte; ga16(4 * k + 1) = lo(k).toByte
      ga16(4 * k + 2) = 0x12; ga16(4 * k + 3) = 0x34
    }
    assert(MediaCodec.decodePngLuma(
      MediaCodec.writePngPixels(w, h, 4, ga16, depth = 16))
      .get.sameElements(hi.map(_.toByte)))
    // RGBA 16-bit + Adam7 + Deflater together: the full gauntlet
    val rgba16 = new Array[Byte](w * h * 8)
    for (k <- 0 until w * h) {
      rgba16(8 * k) = hi(k).toByte; rgba16(8 * k + 2) = hi(k).toByte
      rgba16(8 * k + 4) = hi(k).toByte; rgba16(8 * k + 6) = 0x77
    }
    assert(MediaCodec.decodePngLuma(
      MediaCodec.writePngPixels(w, h, 6, rgba16, r => (r + 1) % 5,
        compress = true, depth = 16, interlace = true))
      .get.sameElements(hi.map(_.toByte)),
      "16-bit RGBA Adam7 Deflater: high-byte luma survives the gauntlet")
    // a 16-bit image whose high bytes equal an 8-bit image: SAME plane
    assert(gOut.get.sameElements(MediaCodec.decodePngLuma(
      MediaCodec.writePngPixels(w, h, 0, hi.map(_.toByte))).get))
  }

  test("PNG decode-bomb guards: huge widths refuse with None, never throw") {
    // IHDR with w = 2^28: the old Int row math overflowed negative and
    // threw from the allocator; must refuse cleanly
    def hdr(w: Int, h: Int, depth: Int, ct: Int): Array[Byte] =
      bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++
        bytes(0, 0, 0, 13) ++ "IHDR".getBytes(StandardCharsets.US_ASCII) ++
        bytes((w >> 24) & 0xff, (w >> 16) & 0xff, (w >> 8) & 0xff, w & 0xff) ++
        bytes((h >> 24) & 0xff, (h >> 16) & 0xff, (h >> 8) & 0xff, h & 0xff) ++
        bytes(depth, ct, 0, 0, 0) ++ bytes(0, 0, 0, 0) ++
        bytes(0, 0, 0, 2) ++ "IDAT".getBytes(StandardCharsets.US_ASCII) ++
        bytes(0x78, 0x01) ++ bytes(0, 0, 0, 0) ++
        bytes(0, 0, 0, 0) ++ "IEND".getBytes(StandardCharsets.US_ASCII) ++
        bytes(0, 0, 0, 0)
    assert(MediaCodec.decodePngLuma(hdr(0x10000000, 1, 8, 0)) === None)
    assert(MediaCodec.decodePngLuma(hdr(0x7fffffff, 2, 8, 2)) === None)
    // a 1-bit plane within the PACKED-stream budget but 8x over it
    // unpacked (2^27 x 15 = 1.9GB sample plane) refuses at the
    // allocation guard, not after a giant malloc
    assert(MediaCodec.decodePngLuma(hdr(0x08000000, 15, 1, 0)) === None)
  }

  test("4-component JPEG without APP14 carries plain ink: non-inverted composition") {
    val px = Array.tabulate(96)(k => ((k * 31 + 5) % 256).toByte)
    val rows = MediaCodec.pngRows(px.length)
    val w = 8 * (px.length / rows); val h = 8 * rows
    val quant = Array.fill(64)(1); quant(0) = 8
    def tiles(v: Int => Int): Array[Array[Int]] = Array.tabulate(px.length) { i =>
      val blk = new Array[Int](64); blk(0) = v(i) - 128; blk
    }
    // plain (non-Adobe) CMYK: stored C=M=Y = 255 - picture, K = 0 ink
    val inv = tiles(i => 255 - (px(i) & 0xff))
    val zeroInk = tiles(_ => 0)
    val withApp14 = MediaCodec.writeJpegCmyk(w, h, quant, inv, inv, inv, zeroInk, 0)
    // strip the APP14 segment (16 bytes at offset 2: ff ee 00 0e + 12)
    assert((withApp14(2) & 0xff) == 0xff && (withApp14(3) & 0xff) == 0xee)
    val noApp14 = withApp14.take(2) ++ withApp14.drop(18)
    val out = MediaCodec.decodeJpegLuma(noApp14)
    assert(out.isDefined, "4-comp without APP14 must still decode")
    assert(out.get.sameElements(
      MediaCodec.decodeJpegLuma(MediaCodec.writeJpegTiles(px, rows)).get),
      "non-Adobe CMYK inverts at composition: the picture comes out upright")
    // the SAME samples under the Adobe marker decode differently
    // (inverted convention) — proof the APP14 flag is actually read
    assert(!MediaCodec.decodeJpegLuma(withApp14).get.sameElements(out.get))
  }

  test("sub-8-bit PNG: 1/2/4-bit gray and palette decode, packed rows, Adam7 too") {
    // gray: sample scaling is left-bit replication (v*255/max)
    for (depth <- Seq(1, 2, 4); (w, h) <- Seq((13, 5), (8, 8), (3, 3), (1, 7))) {
      val max = (1 << depth) - 1
      val px = Array.tabulate(w * h)(k => ((k * 7 + 3) % (max + 1)).toByte)
      val expect = px.map(v => ((v & 0xff) * 255 / max).toByte)
      for (lace <- Seq(false, true); comp <- Seq(false, true)) {
        val png = MediaCodec.writePngPixels(w, h, 0, px, _ % 5,
          compress = comp, depth = depth, interlace = lace)
        val got = MediaCodec.decodePngLuma(png)
        assert(got.isDefined, s"d=$depth ${w}x$h lace=$lace comp=$comp")
        assert(got.get.sameElements(expect),
          s"d=$depth ${w}x$h lace=$lace comp=$comp mismatch")
      }
    }
    // palette at 2 bits: indices resolve through PLTE to BT.601 luma
    val pal = Array[Byte](
      10, 20, 30, 200.toByte, 100, 50, 0, 0, 0, 255.toByte, 255.toByte, 255.toByte)
    val idx = Array.tabulate(21)(k => (k % 4).toByte)
    val png3 = MediaCodec.writePngPixels(7, 3, 3, idx, r => (r + 1) % 5,
      palette = pal, depth = 2, interlace = true)
    val want = idx.map { i =>
      val r = pal(3 * i) & 0xff; val g = pal(3 * i + 1) & 0xff; val b = pal(3 * i + 2) & 0xff
      ((r * 299 + g * 587 + b * 114) / 1000).toByte
    }
    assert(MediaCodec.decodePngLuma(png3).get.sameElements(want))
    // a 1-bit index past the palette refuses (palette of ONE entry, index 1)
    val tiny = MediaCodec.writePngPixels(8, 1, 3,
      Array[Byte](0, 1, 0, 1, 0, 1, 0, 1), palette = Array[Byte](5, 5, 5), depth = 1)
    assert(MediaCodec.decodePngLuma(tiny) === None)
    // illegal combos refuse: 2-bit RGB, 16-bit palette
    val g8 = MediaCodec.writePngPixels(8, 8, 0, Array.tabulate(64)(_.toByte))
    val mut2 = g8.clone(); mut2(24) = 2; mut2(25) = 2
    assert(MediaCodec.decodePngLuma(mut2) === None, "2-bit RGB illegal")
  }

  test("24-bit PCM and 32-bit float WAV decode: high byte / [-1,1] mapping") {
    // 24-bit signed LE → unsigned high byte (+128)
    val vals = Seq(0x000000, 0x7fffff, -0x800000, 0x123456, -0x345678)
    val body24 = vals.flatMap(v =>
      Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte))
      .toArray
    val wav24 = MediaCodec.writeWav(16000, 1, body24, bits = 24)
    val out24 = MediaCodec.decodeWavSamples(wav24).get
    assert(out24.toSeq === vals.map(v => ((v >> 16) + 128).toByte))
    // 32-bit float in [-1, 1] → linear 0..255, out-of-range clamps
    val fs = Array(-1f, 0f, 1f, 0.5f, -2f, 2f)
    val wavF = MediaCodec.writeWavFloat(22050, 1, fs)
    val outF = MediaCodec.decodeWavSamples(wavF).get
    assert(outF.toSeq === Seq[Byte](0, 128.toByte, 255.toByte, 191.toByte,
      0, 255.toByte))
    // stereo 24-bit downmix averages channels
    val st = MediaCodec.writeWav(8000, 2, body24.take(12), bits = 24)
    val outSt = MediaCodec.decodeWavSamples(st).get
    assert(outSt.length === 2)
    assert(outSt(0) === (((vals(0) >> 16) + 128 + (vals(1) >> 16) + 128) / 2).toByte)
    // unknown format codes refuse (e.g. 2 = ADPCM), as do float-16 hybrids
    val adpcm = MediaCodec.writeWav(8000, 1, body24.take(3), bits = 24)
    adpcm(20) = 2 // format code byte (LE) inside `fmt `
    assert(MediaCodec.decodeWavSamples(adpcm) === None)
  }

  test("CMYK and YCCK JPEG decode: inverted-K composition, container-robust hash") {
    val px = Array.tabulate(128)(k => ((k * 67 + 13) % 256).toByte)
    val rows = MediaCodec.pngRows(px.length)
    val w = 8 * (px.length / rows); val h = 8 * rows
    def tiles(v: Int => Int): Array[Array[Int]] = Array.tabulate(px.length) { i =>
      val blk = new Array[Int](64); blk(0) = v(i) - 128; blk
    }
    val quant = Array.fill(64)(1); quant(0) = 8
    val pxT = tiles(i => px(i) & 0xff)
    val maxK = tiles(_ => 255) // zero ink: inverted K = 255 leaves luma alone
    val zero = Array.fill(px.length)(new Array[Int](64))
    // YCCK (transform 2): luma = Y·K/255; neutral chroma is skipped
    val ycck = MediaCodec.writeJpegCmyk(w, h, quant, pxT, zero, zero, maxK, 2)
    assert(MediaCodec.decodeJpegLuma(ycck).get.sameElements(
      MediaCodec.decodeJpegLuma(MediaCodec.writeJpegTiles(px, rows)).get),
      "YCCK with full K decodes to the same plane as the gray JPEG")
    // CMYK (transform 0): C=M=Y=picture (inverted storage), K full
    val cmyk = MediaCodec.writeJpegCmyk(w, h, quant, pxT, pxT, pxT, maxK, 0)
    assert(MediaCodec.decodeJpegLuma(cmyk).get.sameElements(
      MediaCodec.decodeJpegLuma(MediaCodec.writeJpegTiles(px, rows)).get),
      "CMYK via BT.601 over equal inverted channels is the picture")
    // one picture, FIVE containers, ONE perceptual hash
    val hashes = Seq(
      MediaCodec.writePngPixels(px.length / rows, rows, 0, px),
      MediaCodec.writeJpegTiles(px, rows),
      MediaCodec.writeJpegYccTiles(px, rows),
      ycck, cmyk).map(c =>
      MediaCodec.dHash60(MediaCodec.decodeImagePlane(c) match {
        case Some(p) if p.length == px.length => p // block means (JPEG)
        case Some(p) => p                          // full plane (PNG)
        case None => fail("container refused")
      }))
    assert(hashes.distinct.length === 1,
      s"PNG/gray/YCbCr/YCCK/CMYK must hash identically: $hashes")
    // K really scales: half ink (K' = 128) halves the luma
    val halfK = tiles(_ => 128)
    val dark = MediaCodec.decodeJpegLuma(
      MediaCodec.writeJpegCmyk(w, h, quant, pxT, zero, zero, halfK, 2)).get
    val full = MediaCodec.decodeJpegLuma(ycck).get
    assert(dark.zip(full).forall { case (d, f) =>
      (d & 0xff) == (f & 0xff) * 128 / 255 },
      "YCCK luma must be Y·K/255 pixel for pixel")
    // refusals stay refusals: K sampling != luma sampling; progressive 4-comp
    val badK = ycck.clone()
    // SOF0 component 4's h/v byte: find SOF0 marker and offset to comp 4
    val sof = {
      var i = 2
      while (!((badK(i) & 0xff) == 0xff && (badK(i + 1) & 0xff) == 0xc0)) i += 1
      i
    }
    badK(sof + 2 + 2 + 6 + 3 * 3 + 1) = 0x22 // K at 2x2 vs luma 1x1
    assert(MediaCodec.decodeJpegLuma(badK) === None,
      "K sampled differently from luma must refuse, not mis-compose")
    val prog4 = ycck.clone(); prog4(sof + 1) = 0xc2.toByte
    assert(MediaCodec.decodeJpegLuma(prog4) === None,
      "progressive 4-component refuses by name")
  }

  test("progressive DQT latch: a mid-stream table redefinition cannot re-dequantize") {
    // libjpeg latches a component's quant table when its first scan
    // starts; a (legal) DQT between scans must not change how already-
    // decoded coefficients render. Splice a DQT redefining table 0
    // before the SECOND scan and require the decode unchanged.
    val quant = Array.tabulate(64)(k => 1 + (k % 7))
    val blocks = Array.tabulate(6) { i =>
      val blk = new Array[Int](64)
      blk(0) = 17 * i - 40; blk(1) = 5 - i; blk(8) = i; blk
    }
    val prog = MediaCodec.writeJpegProgressive(24, 16, quant, blocks)
    val base = MediaCodec.decodeJpegLuma(prog).get
    // locate the second SOS and splice DQT (table 0, all 255s) before it
    def sosAt(b: Array[Byte], from: Int): Int = {
      var i = from
      while (i + 1 < b.length &&
        !((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xda)) i += 1
      i
    }
    val second = sosAt(prog, sosAt(prog, 2) + 2)
    val dqt = Array[Int](0xff, 0xdb, 0x00, 0x43, 0x00).map(_.toByte) ++
      Array.fill(64)(0xff.toByte)
    val spliced = prog.take(second) ++ dqt ++ prog.drop(second)
    val redecoded = MediaCodec.decodeJpegLuma(spliced)
    assert(redecoded.isDefined, "the spliced stream must still decode")
    assert(redecoded.get.sameElements(base),
      "mid-stream DQT redefinition must not change the rendered plane")
  }

  test("4-component allocation bound: CMYK planes count against the decode-bomb guard") {
    // 16384x8192 = 128M pixels slips the single-plane 256MB guard, but
    // a 4-comp frame materializes FOUR planes = 512MB — must refuse at
    // the materialization bound, before any entropy data
    val quant = Array.fill(64)(1)
    def seg(m: Int, payload: Array[Byte]): Array[Byte] =
      bytes(0xff, m, (payload.length + 2) >> 8, (payload.length + 2) & 0xff) ++ payload
    val crafted =
      bytes(0xff, 0xd8) ++
        seg(0xdb, bytes(0x00) ++ quant.map(_.toByte)) ++
        seg(0xc0, bytes(8, 0x20, 0x00, 0x40, 0x00, 4,
          1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0, 4, 0x11, 0)) ++
        seg(0xc4, bytes(0x00, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)) ++
        seg(0xc4, bytes(0x10, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)) ++
        seg(0xda, bytes(4, 1, 0x00, 2, 0x00, 3, 0x00, 4, 0x00, 0, 63, 0)) ++
        bytes(0x00, 0x00) ++
        bytes(0xff, 0xd9)
    assert(MediaCodec.decodeJpegLuma(crafted) === None)
  }

  test("progressive allocation bound: a crafted SOF2 header cannot demand a GB") {
    // 16384x8192 = 128M pixels passes the 256M-pixel cap but would
    // allocate 537 MB of Int coefficients; the byte-bound refuses it
    // at SOS, before any entropy data.
    val crafted =
      bytes(0xff, 0xd8) ++
        bytes(0xff, 0xdb, 0x00, 0x43, 0x00) ++ Array.fill(64)(1.toByte) ++
        bytes(0xff, 0xc2, 0x00, 0x0b, 8, 0x20, 0x00, 0x40, 0x00,
          1, 0x01, 0x11, 0x00) ++                     // h=8192 w=16384
        bytes(0xff, 0xda, 0x00, 0x08, 1, 0x01, 0x00, 0, 0, 0) ++
        bytes(0x00, 0x00) ++
        bytes(0xff, 0xd9)
    assert(MediaCodec.decodeJpegLuma(crafted) === None)
    // a same-shape header within the bound still enters the scan path
    // (it fails later on entropy, not at allocation) — the bound is a
    // guard, not a profile cut: 1024x1024 = 1M pixels, 1M blocks' ints
    val small = crafted.clone()
    small(76) = 0x04; small(78) = 0x04 // h=1024 w=1024
    assert(MediaCodec.decodeJpegLuma(small) === None) // truncated entropy, no throw
  }

  test("oversized payloads skip synthesis instead of failing the task") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    import ss.implicits._
    val ok = "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj kkkk llll " * 2
    val huge = "x" * 40000 // 40000/4 = 10000 blocks/row > 8191 → w > 65535
    assert(!MediaCodec.canTileJpeg(40000))
    assert(MediaCodec.canTileJpeg(ok.length))
    val docs = Seq((1L, ok, "src3"), (2L, huge, "src3"),
      (3L, ok, "src2"), (4L, huge, "src2"))
      .toDF("doc_id", "text", "source") // src3 → image, src2 → video
    val color = Media.colorImageHashes(docs).collect()
    assert(color.map(_._1).toSet === Set(1L),
      "huge doc skips the YCC tile writer instead of tripping its require")
    val video = Media.videoKeyframeHashes(docs).collect()
    assert(video.map(_._1).toSet === Set(3L))
    // the PNG path has no 16-bit dimension field — the huge doc still hashes
    assert(Media.imageHashes(docs).collect().map(_._1).toSet === Set(1L, 2L))
  }

  test("distinct-payload collapse: a 1000-exact-copy corpus decodes each payload ONCE") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    import ss.implicits._
    val hot = "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj kkkk llll " * 3
    val near = hot.updated(4, 'z')
    // 1000 exact copies + 1 near-dup, all image modality
    val docs = ((1L to 1000L).map(i => (i, hot, "src3")) ++
      Seq((2000L, near, "src3"))).toDF("doc_id", "text", "source")
    val before = MediaCodec.decodeInvocations.get()
    val hashes = Media.imageHashes(docs).collect()
    val decodes = MediaCodec.decodeInvocations.get() - before
    assert(hashes.length === 1001, "every member still gets its hash back")
    assert(hashes.count(_._2 == MediaCodec.dHash60(
      hot.getBytes(StandardCharsets.UTF_8))) === 1000)
    assert(decodes === 2L,
      s"2 distinct payloads must mean exactly 2 decodes, saw $decodes")

    // the video frame path collapses the same way: 1000 videos sharing
    // one keyframe decode it once
    val frames = (1L to 1000L).map(i => (i, 0, hot))
      .toDF("doc_id", "frame_idx", "frame_text")
    val b2 = MediaCodec.decodeInvocations.get()
    assert(Media.videoFrameHashes(frames).collect().length === 1000)
    assert(MediaCodec.decodeInvocations.get() - b2 === 1L,
      "one shared keyframe payload, one JPEG decode")
  }

  test("image near-dup end-to-end: fixture pair found, distant pair not, no all-pairs join") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    import ss.implicits._
    val near1 = "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj kkkk llll " * 3
    val near2 = near1.updated(5, 'B') // one-character edit
    // the far texts are STRUCTURALLY different (irregular word lengths
    // / mixed case / digits): uniformly periodic text hashes to the
    // same up-down luma profile whatever its letters — verified
    // pairwise Hamming here is 21–30
    val far1 = "zz ayx mnopqr s tuv wwwwww k x yy zz ab c ddd ee ffff gg hhhh iii j " * 3
    val far2 = "Zq9 KKKKK ab 0 mmmm D ww t 88888 e RRR iii L x 2 yyyyyy c AA 777 o pQ " * 3
    // source suffix % 3 == 0 → image modality for all four
    val docs = Seq(
      (1L, near1, "src3"), (2L, near2, "src6"),
      (3L, far1, "src9"), (4L, far2, "src12"))
      .toDF("doc_id", "text", "source")
    val q = graft.queries.PipelineOps.q155ImageNearDupOn(docs)
    val rows = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.contains((1L, 2L)), "the one-edit pair must surface")
    assert(!rows.exists(p => p._1 == 3L || p._2 == 3L || p._2 == 4L),
      s"distant images must not pair: $rows")
    // the candidate join is a band EQUI-join — no nested loop anywhere
    val loops = graft.plans.AdaptivePlans.collectDeep(q) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(loops.isEmpty, s"all-pairs stage leaked into the plan: $loops")
  }
}
