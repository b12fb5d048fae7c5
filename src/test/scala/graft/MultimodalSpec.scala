package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: real container decoders (WAV/PPM/Y4M), the
  * partition-local typed feature pass, and the format-dispatched
  * mixed-corpus decode (unknown formats fail loudly).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world this is a binary payload stand-in", "en", "src0", 45L),
    (2L, "tiny", "en", "src1", 4L),
    (3L, "", "en", "src2", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("asMixedMedia + extractMediaFeatures: format-dispatched REAL decode of a mixed corpus") {
    // doc_id mod 3 routes 3→wav, 1→ppm, 2→y4m
    val f = Multimodal.extractMediaFeatures(Multimodal.asMixedMedia(docs))
      .orderBy("doc_id").collect()
    // doc 1 (45 text bytes) → P6 PPM 16×3: header 29 + len("3") + 48·3
    assert(f(0).getAs[String]("format") === "image/x-portable-pixmap")
    assert(f(0).getAs[Long]("n_bytes") === 29 + 1 + 48 * 3)
    assert((f(0).getAs[Long]("width"), f(0).getAs[Long]("height")) === ((16L, 3L)))
    assert(f(0).getAs[Long]("n_units") === 48) // pixels
    val textSum = "hello world this is a binary payload stand-in"
      .getBytes("UTF-8").map(_ & 0xff).sum
    assert(math.abs(f(0).getAs[Double]("detail") - textSum / 48.0) < 1e-9) // r_mean
    // doc 2 (4 text bytes) → Y4M 8×8, one zero-padded frame
    assert(f(1).getAs[String]("format") === "video/x-yuv4mpeg")
    assert(f(1).getAs[Long]("n_bytes") === 39 + 102)
    assert(f(1).getAs[Long]("n_units") === 1) // frames
    val tinySum = "tiny".getBytes("UTF-8").map(_ & 0xff).sum
    assert(math.abs(f(1).getAs[Double]("detail") - tinySum / 64.0) < 1e-9) // y_mean
    // doc 3 (empty) → WAV with zero samples
    assert(f(2).getAs[String]("format") === "audio/wav")
    assert(f(2).getAs[Long]("n_bytes") === 56)
    assert(f(2).getAs[Long]("n_units") === 0) // samples
    assert(f(2).getAs[Double]("detail") === 0.0) // dur_ms
  }

  test("extractMediaFeatures: an unknown format fails loudly, never guesses a decoder") {
    val weird = Multimodal.asMixedMedia(docs)
      .withColumn("media_meta",
        struct(lit("video/h264").as("format"),
          col("media_meta.n_bytes").as("n_bytes"),
          col("media_meta.origin").as("origin")))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.extractMediaFeatures(weird).collect()
    }
    def deepMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage) ++ Iterator("")).mkString(" | ")
    assert(deepMsg(e).contains("unknown media format"), deepMsg(e))
  }

  test("wavEncode/decodeWav: real RIFF chunk walk, odd-size padding, PCM-only guard") {
    val payload = Multimodal.wavEncode("abc".getBytes("UTF-8"))
    assert(Multimodal.decodeWav(payload) === Multimodal.WavInfo(8000, 1, 16, 3))
    assert(payload.length === 56 + 2 * 3, "container arithmetic: 56 header bytes + 2/sample")
    // empty data chunk is still a valid container
    assert(Multimodal.decodeWav(Multimodal.wavEncode(Array.emptyByteArray)).nSamples === 0L)
    // malformed input fails loudly, never garbles
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav("notawavpayload!!".getBytes("US-ASCII"))
    }
    // a compressed (non-PCM) format code is rejected, not mis-decoded:
    // audioFormat lives at offset 32 (RIFF 12 + padded junk chunk 12 + chunk header 8)
    val nonPcm = payload.clone()
    nonPcm(32) = 3
    intercept[IllegalArgumentException] { Multimodal.decodeWav(nonPcm) }
    // a hostile chunk size near 2^32 (toInt-negative) must fail the
    // overrun check, not spin the chunk walk forever: junk chunk's
    // size field lives at offset 16
    val hostile = payload.clone()
    hostile(16) = 0xf8.toByte; hostile(17) = 0xff.toByte
    hostile(18) = 0xff.toByte; hostile(19) = 0xff.toByte
    intercept[IllegalArgumentException] { Multimodal.decodeWav(hostile) }
    // a third-party canonical WAV (fmt first, no junk chunk, stereo)
    // parses too — the decoder walks chunks, it doesn't assume our
    // encoder's layout; nSamples uses the real block align (4 bytes)
    val tp = java.nio.ByteBuffer.allocate(52).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tp.put("RIFF".getBytes("US-ASCII")).putInt(44).put("WAVE".getBytes("US-ASCII"))
    tp.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(2)
      .putInt(44100).putInt(44100 * 4).putShort(4).putShort(16)
    tp.put("data".getBytes("US-ASCII")).putInt(8).putLong(0L)
    assert(Multimodal.decodeWav(tp.array()) === Multimodal.WavInfo(44100, 2, 16, 2))
  }

  test("extractWavFeatures: every feature column comes from parsing the binary") {
    val f = Multimodal.extractWavFeatures(Multimodal.asWavMedia(docs))
      .orderBy("doc_id").collect()
    val n0 = "hello world this is a binary payload stand-in".getBytes("UTF-8").length
    assert(f(0).getAs[Long]("n_samples") === n0.toLong)
    assert(f(0).getAs[Long]("n_bytes") === 56L + 2 * n0)
    assert(f(0).getAs[Long]("sample_rate") === 8000L)
    assert(f(0).getAs[Long]("channels") === 1L)
    assert(f(0).getAs[Long]("bits") === 16L)
    assert(f(0).getAs[Double]("dur_ms") === n0 * 1000.0 / 8000)
    assert(f(2).getAs[Long]("n_samples") === 0L, "empty doc → zero samples")
  }

  test("ppmEncode/decodePpm: real header tokenizer, comment skip, hostile-header guards") {
    val payload = Multimodal.ppmEncode("abc".getBytes("UTF-8"))
    val info = Multimodal.decodePpm(payload)
    assert(info === Multimodal.PpmInfo(16, 1, 255, 30),
      "16x1 padded row; header = 29 + digits(h) bytes")
    assert(payload.length === 30 + 48, "container arithmetic: header + 3*16*1 raster")
    // pixel derivation: r=v, g=255-v, b=v^85 for 'a' (97)
    assert((payload(info.rasterOffset) & 0xff) === 97)
    assert((payload(info.rasterOffset + 1) & 0xff) === 158)
    assert((payload(info.rasterOffset + 2) & 0xff) === (97 ^ 85))
    // empty input encodes one all-zero row (0-high PPM is invalid)
    assert(Multimodal.decodePpm(Multimodal.ppmEncode(Array.emptyByteArray)).height === 1)
    // a third-party header layout (extra whitespace, comments between
    // EVERY token, multi-digit dims) parses too — it's a tokenizer,
    // not a fixed-offset read
    val tp = ("P6 # c1\n  2\n# between dims\n 3\t255\n" + "x" * 18).getBytes("US-ASCII")
    assert(Multimodal.decodePpm(tp).width === 2)
    assert(Multimodal.decodePpm(tp).height === 3)
    // hostile headers fail loudly, never misread:
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm("P5\n1 1\n255\nxxx".getBytes("US-ASCII")) // wrong magic
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm(("P6\n1 1\n65535\n" + "xx").getBytes("US-ASCII")) // 2-byte samples
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm("P6\n4 4\n255\nxxx".getBytes("US-ASCII")) // truncated raster
    }
    intercept[IllegalArgumentException] { // dims that overflow int
      Multimodal.decodePpm("P6\n99999999999 1\n255\nx".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm("P6\n0 5\n255\nx".getBytes("US-ASCII")) // zero dim
    }
  }

  test("extractPpmFeatures: dims and channel means come from parsing the raster") {
    val f = Multimodal.extractPpmFeatures(Multimodal.asPpmMedia(docs))
      .orderBy("doc_id").collect()
    val src = "hello world this is a binary payload stand-in".getBytes("UTF-8")
    val h = math.ceil(src.length / 16.0).toInt
    val n = 16L * h
    assert(f(0).getAs[Long]("width") === 16L)
    assert(f(0).getAs[Long]("height") === h.toLong)
    assert(f(0).getAs[Long]("n_pixels") === n)
    assert(f(0).getAs[Long]("n_bytes") === 29L + h.toString.length + 48L * h)
    // channel means: exact integer sums over the derived pixels,
    // zero-padding included in the denominator
    val sr = src.map(_ & 0xff).sum.toDouble
    val sg = src.map(v => 255 - (v & 0xff)).sum.toDouble
    val sb = src.map(v => (v & 0xff) ^ 85).sum.toDouble
    assert(f(0).getAs[Double]("r_mean") === sr / n)
    assert(f(0).getAs[Double]("g_mean") === sg / n)
    assert(f(0).getAs[Double]("b_mean") === sb / n)
    // empty doc → the all-zero 16x1 row
    assert(f(2).getAs[Long]("n_pixels") === 16L)
    assert(f(2).getAs[Double]("r_mean") === 0.0)
  }

  test("y4mEncode/decodeY4m: real header walk, frame markers, hostile-stream guards") {
    // long enough for SEVERAL 64-byte luma windows (multi-frame stream)
    val src = ("hello world this is a binary payload stand-in " * 4).getBytes("UTF-8")
    val enc = Multimodal.y4mEncode(src) // 8x8 → 64-byte luma windows
    val info = Multimodal.decodeY4m(enc)
    assert(info.width === 8 && info.height === 8)
    assert(info.fpsNum === 25 && info.fpsDen === 1)
    assert(info.nFrames === math.ceil(src.length / 64.0).toInt)
    assert(info.frameOffsets.length === info.nFrames)
    // every frame raster is exactly 1.5·wh and markers line up
    info.frameOffsets.foreach { o =>
      assert(new String(enc, o - 6, 5, "US-ASCII") === "FRAME")
    }
    // frame parameters after a FRAME marker are tolerated (spec'd)
    val withParams = enc.take(enc.length) // copy
    val paramed = (enc.take(39) ++ "FRAME Xtag\n".getBytes("US-ASCII") ++
      enc.slice(45, enc.length)).toArray
    assert(Multimodal.decodeY4m(paramed).nFrames === info.nFrames)
    val _ = withParams
    // hostile streams fail LOUDLY, never a silent short read
    intercept[IllegalArgumentException] {
      Multimodal.decodeY4m("JUNK".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] { // missing W
      Multimodal.decodeY4m("YUV4MPEG2 H8 F25:1\nFRAME\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] { // odd dims: C420 cannot subsample
      Multimodal.decodeY4m("YUV4MPEG2 W7 H8 F25:1\nFRAME\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] { // overflowing dim
      Multimodal.decodeY4m("YUV4MPEG2 W99999999999 H8 F25:1\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] { // truncated raster
      Multimodal.decodeY4m(enc.dropRight(1))
    }
    intercept[IllegalArgumentException] { // corrupt second frame marker
      val bad = enc.clone(); bad(info.frameOffsets(1) - 6) = 'X'.toByte
      Multimodal.decodeY4m(bad)
    }
    intercept[IllegalArgumentException] { // no frames at all
      Multimodal.decodeY4m("YUV4MPEG2 W8 H8 F25:1\n".getBytes("US-ASCII"))
    }
  }

  test("extractY4mFrameFeatures: sums come from the raster, sampling stride, padding") {
    val feats = Multimodal.extractY4mFrameFeatures(Multimodal.asY4mMedia(docs), every = 2)
      .orderBy("doc_id", "frame_idx").collect()
    val src = "hello world this is a binary payload stand-in".getBytes("UTF-8")
    val nf = math.ceil(src.length / 64.0).toInt
    def b(i: Int): Int = if (i < src.length) src(i) & 0xff else 0
    val doc1 = feats.filter(_.getAs[Long]("doc_id") == 1L)
    assert(doc1.map(_.getAs[Long]("frame_idx")).toSeq === (0 until nf by 2).map(_.toLong))
    doc1.foreach { r =>
      val f = r.getAs[Long]("frame_idx").toInt
      assert(r.getAs[Long]("y_sum") === (0 until 64).map(j => b(f * 64 + j)).sum.toLong)
      assert(r.getAs[Long]("u_sum") === (0 until 16).map(k => 255 - b(f * 64 + 4 * k)).sum.toLong)
      assert(r.getAs[Long]("v_sum") === (0 until 16).map(k => b(f * 64 + 4 * k) ^ 85).sum.toLong)
      assert(r.getAs[Long]("n_frames") === nf.toLong)
      assert(r.getAs[Long]("n_bytes") === 39L + 102L * nf)
    }
    // empty doc: one all-zero frame — zero luma, flat chroma
    val doc3 = feats.filter(_.getAs[Long]("doc_id") == 3L)
    assert(doc3.length === 1)
    assert(doc3.head.getAs[Long]("y_sum") === 0L)
    assert(doc3.head.getAs[Long]("u_sum") === 16L * 255)
    assert(doc3.head.getAs[Long]("v_sum") === 16L * 85)
  }

  test("resizePpm: exact nearest-neighbor map, identity size, re-decodable output") {
    val src = ("abcdefghijklmnop" * 4).getBytes("UTF-8") // 64 bytes → 16x4 image
    val ppm = Multimodal.ppmEncode(src)
    val info = Multimodal.decodePpm(ppm)
    assert(info.width === 16 && info.height === 4)
    // identity resize: raster byte-identical (header comment differs)
    val same = Multimodal.resizePpm(ppm, 16, 4)
    val sInfo = Multimodal.decodePpm(same)
    assert(same.slice(sInfo.rasterOffset, same.length).toSeq ===
      ppm.slice(info.rasterOffset, ppm.length).toSeq)
    // 4x2 downscale: out (x, y) samples src (x*4, y*2) — check every byte
    val small = Multimodal.resizePpm(ppm, 4, 2)
    val smInfo = Multimodal.decodePpm(small)
    assert(smInfo.width === 4 && smInfo.height === 2)
    for (y <- 0 until 2; x <- 0 until 4; c <- 0 until 3) {
      val got = small(smInfo.rasterOffset + (y * 4 + x) * 3 + c)
      val want = ppm(info.rasterOffset + ((y * 2) * 16 + x * 4) * 3 + c)
      assert(got === want, s"resized pixel ($x,$y) channel $c")
    }
    // upscale replicates pixels (nearest-neighbor, no interpolation)
    val big = Multimodal.resizePpm(small, 8, 4)
    val bInfo = Multimodal.decodePpm(big)
    assert(big(bInfo.rasterOffset) === big(bInfo.rasterOffset + 3),
      "upscaled neighbors must replicate the same source pixel")
    intercept[IllegalArgumentException] { Multimodal.resizePpm(ppm, 0, 4) }
    intercept[IllegalArgumentException] {
      Multimodal.resizePpm("JUNK".getBytes("US-ASCII"), 4, 4)
    }
  }
}
