package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with decode/feature-extraction as a partition-local typed pass.
  *
  * All three modalities decode for REAL with codec-free container
  * formats — PCM WAV (audio), P6 PPM (image), YUV4MPEG2 (video) —
  * and [[extractMediaFeatures]] dispatches a MIXED corpus on the
  * metadata's format tag, failing loudly on formats it does not
  * speak (a compressed codec would need a real decoder library; at
  * scale that slots into the same typed partition-local pass).
  *
  * Scale: the typed pass is partition-local (no shuffle); the binary
  * column stays columnar-compressed in parquet until projected.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], format: String, n_bytes: Long)

  // ───────────────────── real codec-free decode: PCM WAV ─────────────────────
  // PCM WAV is a container format, not a codec — header parse + frame
  // math needs no external libraries, so this decode path is REAL: the
  // bytes are a spec-conformant RIFF/WAVE file and the features come
  // from actually parsing it.

  case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int, nSamples: Long)
  case class WavFeatures(doc_id: Long, n_bytes: Long, sample_rate: Long, channels: Long,
                         bits: Long, n_samples: Long, dur_ms: Double)

  /** Encode bytes as a minimal spec-conformant PCM WAV: RIFF header, a
    * deliberately odd-sized `junk` chunk (forces decoders to honor the
    * RIFF even-byte padding rule instead of assuming fmt comes first),
    * the 16-byte `fmt ` chunk, and 16-bit mono little-endian samples —
    * one sample per input byte, centered to signed PCM. Deterministic:
    * the same text always produces the same file. */
  def wavEncode(src: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val dataSize = src.length * 2 // 16-bit mono: one sample per byte
    val junkBody = 3 // odd on purpose: exercises the pad-to-even rule
    val riffSize = 4 + (8 + junkBody + 1) + (8 + 16) + (8 + dataSize)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize).put("WAVE".getBytes("US-ASCII"))
    out.put("junk".getBytes("US-ASCII")).putInt(junkBody)
      .put(Array[Byte](0, 0, 0, 0)) // 3 bytes + 1 pad byte
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < src.length) {
      out.putShort(((((src(i) & 0xff) - 128) << 8)).toShort)
      i += 1
    }
    out.array()
  }

  /** REAL WAV decoder: strict little-endian RIFF chunk walk (unknown
    * chunks skipped, odd sizes padded to even per spec), PCM-only
    * (compressed WAV would need an actual codec — fail loudly), frame
    * count derived from the data chunk size and the fmt block align. */
  def decodeWav(payload: Array[Byte]): WavInfo = {
    def u16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
      ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    def tag(o: Int): String = new String(payload, o, 4, "US-ASCII")
    require(payload.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "not a RIFF/WAVE payload")
    // offsets advance in LONG arithmetic: a hostile/corrupt u32 size
    // near 2^32 truncated via toInt could make the advance zero or
    // negative and spin this walk forever inside an executor task —
    // fail loudly instead, like every other malformed-input path
    var off = 12L
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, blockAlign, bits
    var dataSize = -1L
    while (off + 8 <= payload.length && (fmt.isEmpty || dataSize < 0)) {
      val o = off.toInt
      val size = u32(o + 4)
      require(size <= payload.length - (off + 8),
        s"RIFF chunk '${tag(o)}' claims $size bytes but only " +
          s"${payload.length - off - 8} remain — corrupt container")
      tag(o) match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short: $size bytes")
          val audioFormat = u16(o + 8)
          require(audioFormat == 1,
            s"WAV audio format $audioFormat is not PCM — decoding it needs a real codec")
          fmt = Some((u16(o + 10), u32(o + 12).toInt, u16(o + 20), u16(o + 22)))
        case "data" => dataSize = size
        case _ => () // skip unknown chunks (junk, LIST, fact, ...)
      }
      off += 8 + size + (size & 1) // chunk bodies pad to even
    }
    val (channels, rate, blockAlign, bits) = fmt.getOrElse(
      throw new IllegalArgumentException("RIFF/WAVE payload has no fmt chunk"))
    require(dataSize >= 0, "RIFF/WAVE payload has no data chunk")
    require(blockAlign > 0, "fmt block align must be positive")
    WavInfo(rate, channels, bits, dataSize / blockAlign)
  }

  /** Documents as real WAV media: the text bytes PCM-encoded through
    * [[wavEncode]] (a stand-in for reading audio files into the binary
    * column — at 100 TB these arrive from the lake, not from text). */
  def asWavMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, wavEncode(text.getBytes("UTF-8")))
      })
      .toDF("doc_id", "payload")
      .select(
        col("doc_id"),
        col("payload"),
        struct(
          lit("audio/wav").as("format"),
          length(col("payload")).as("n_bytes"),
          lit("wav-encode").as("origin")).as("media_meta"))
  }

  /** Audio features via a partition-local typed pass with the REAL
    * decoder: every output
    * column is read out of the parsed RIFF structure, so a wrong
    * encoder or parser fails the q_multimodal_wav oracle gate. */
  def extractWavFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] = media.select(
      col("doc_id"),
      col("payload"),
      col("media_meta.format").as("format"),
      col("media_meta.n_bytes").cast("long").as("n_bytes")).as[MediaRow]
    typed.mapPartitions { rows =>
      rows.map { r =>
        val info = decodeWav(r.payload)
        WavFeatures(r.doc_id, r.n_bytes, info.sampleRate.toLong, info.channels.toLong,
          info.bitsPerSample.toLong, info.nSamples,
          info.nSamples * 1000.0 / info.sampleRate)
      }
    }.toDF()
  }

  // ───────────────────── real codec-free decode: binary PPM ─────────────────────
  // P6 PPM (netpbm) is to images what PCM WAV is to audio: a header +
  // raw raster, no compression — header tokenizing and pixel math need
  // no external libraries, so the image-decode path is REAL too.

  case class PpmInfo(width: Int, height: Int, maxval: Int, rasterOffset: Int)
  case class PpmFeatures(doc_id: Long, n_bytes: Long, width: Long, height: Long,
                         maxval: Long, n_pixels: Long,
                         r_mean: Double, g_mean: Double, b_mean: Double)

  /** Encode bytes as a spec-conformant binary PPM (P6): magic, a
    * header COMMENT (forces decoders to implement the real header
    * tokenizer instead of a fixed-offset read), width/height/maxval,
    * then one RGB pixel per input byte — r = v, g = 255−v, b = v⊕85 —
    * row width 16, last row zero-padded. Empty input encodes one
    * all-zero row (a 0-high image is not a valid PPM). Deterministic:
    * same bytes → same file. */
  def ppmEncode(src: Array[Byte], width: Int = 16): Array[Byte] = {
    require(width >= 1, "width must be positive")
    val h = math.max(1, math.ceil(src.length / width.toDouble).toInt)
    val header = s"P6\n# graft synthetic\n$width $h\n255\n".getBytes("US-ASCII")
    val raster = new Array[Byte](width * h * 3)
    var i = 0
    while (i < src.length) {
      val v = src(i) & 0xff
      raster(3 * i) = v.toByte
      raster(3 * i + 1) = (255 - v).toByte
      raster(3 * i + 2) = (v ^ 85).toByte
      i += 1
    }
    header ++ raster
  }

  /** REAL P6 header parse: whitespace/comment-tolerant token scan with
    * hostile-header guards — non-P6 magic, non-decimal tokens, header
    * values overflowing Int, maxval > 255 (two-byte samples — a real
    * format variant this decoder does not speak: fail loudly, never
    * misread), zero dims, and a raster shorter than width×height×3
    * claims (the PPM analog of the WAV chunk-overrun guard; the byte
    * need is computed in LONG arithmetic so huge dims cannot wrap). */
  def decodePpm(payload: Array[Byte]): PpmInfo = {
    require(payload.length >= 2 && payload(0) == 'P' && payload(1) == '6',
      "not a P6 PPM payload")
    var off = 2
    def skipSpaceAndComments(): Unit = {
      var moved = true
      while (moved) {
        moved = false
        while (off < payload.length && Character.isWhitespace(payload(off))) {
          off += 1; moved = true
        }
        if (off < payload.length && payload(off) == '#') {
          while (off < payload.length && payload(off) != '\n') off += 1
          moved = true
        }
      }
    }
    def token(): Long = {
      skipSpaceAndComments()
      require(off < payload.length && payload(off) >= '0' && payload(off) <= '9',
        "malformed PPM header: expected a decimal token")
      var v = 0L
      while (off < payload.length && payload(off) >= '0' && payload(off) <= '9') {
        v = v * 10 + (payload(off) - '0')
        require(v <= Int.MaxValue, "PPM header value overflows")
        off += 1
      }
      v
    }
    val w = token(); val h = token(); val maxval = token()
    require(w >= 1 && h >= 1, s"PPM dims ${w}x$h must be positive")
    require(maxval >= 1 && maxval <= 255,
      s"PPM maxval $maxval unsupported (maxval > 255 means two-byte samples)")
    require(off < payload.length && Character.isWhitespace(payload(off)),
      "malformed PPM header: missing raster separator")
    off += 1
    val need = w * h * 3L
    require(need <= payload.length - off.toLong,
      s"PPM raster claims $need bytes but only ${payload.length - off} remain — corrupt payload")
    PpmInfo(w.toInt, h.toInt, maxval.toInt, off)
  }

  /** REAL image resize — nearest-neighbor downscale/upscale of a
    * decoded P6 raster, emitted as a new spec-conformant P6 (header
    * comment included, so resized outputs re-enter the decode path).
    * The REAL thumbnail stage for the image modality: output
    * pixel (x, y) samples source pixel (⌊x·W/outW⌋, ⌊y·H/outH⌋) —
    * exact integer arithmetic, so every resized byte (and any feature
    * computed from it) replays in SQL (q_multimodal_resize). Pure
    * per-payload function, used inside the same partition-local typed
    * pass as the decoders. */
  def resizePpm(payload: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    require(outW >= 1 && outH >= 1, "resize dims must be positive")
    val info = decodePpm(payload)
    val header = s"P6\n# graft resized\n$outW $outH\n${info.maxval}\n".getBytes("US-ASCII")
    val out = new Array[Byte](outW * outH * 3)
    var y = 0
    while (y < outH) {
      val sy = y * info.height / outH
      var x = 0
      while (x < outW) {
        val sx = x * info.width / outW
        val src = info.rasterOffset + (sy * info.width + sx) * 3
        val dst = (y * outW + x) * 3
        out(dst) = payload(src)
        out(dst + 1) = payload(src + 1)
        out(dst + 2) = payload(src + 2)
        x += 1
      }
      y += 1
    }
    header ++ out
  }

  /** Resize every payload and re-extract features — the thumbnail
    * stage as a REAL pipeline: decode → nearest-neighbor resample →
    * re-encode → decode again for features, all in one typed
    * partition-local pass. */
  def extractResizedPpmFeatures(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] = media.select(
      col("doc_id"),
      col("payload"),
      col("media_meta.format").as("format"),
      col("media_meta.n_bytes").cast("long").as("n_bytes")).as[MediaRow]
    typed.mapPartitions { rows =>
      rows.map { r =>
        val resized = resizePpm(r.payload, outW, outH)
        val info = decodePpm(resized)
        val n = info.width.toLong * info.height
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = info.rasterOffset
        val end = info.rasterOffset + n.toInt * 3
        while (i < end) {
          sr += resized(i) & 0xff
          sg += resized(i + 1) & 0xff
          sb += resized(i + 2) & 0xff
          i += 3
        }
        PpmFeatures(r.doc_id, resized.length.toLong, info.width.toLong, info.height.toLong,
          info.maxval.toLong, n,
          sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
      }
    }.toDF()
  }

  /** Documents as real PPM media (the image analog of [[asWavMedia]]). */
  def asPpmMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, ppmEncode(text.getBytes("UTF-8")))
      })
      .toDF("doc_id", "payload")
      .select(
        col("doc_id"),
        col("payload"),
        struct(
          lit("image/x-portable-pixmap").as("format"),
          length(col("payload")).as("n_bytes"),
          lit("ppm-encode").as("origin")).as("media_meta"))
  }

  /** Image features via the partition-local typed pass, REAL decoder:
    * dimensions/maxval come from the parsed header and the per-channel
    * means from walking the actual raster bytes (exact integer sums,
    * one double division at the end), so a wrong header offset, a
    * missed comment, or a raster misread fails the q_multimodal_ppm
    * oracle gate. */
  def extractPpmFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] = media.select(
      col("doc_id"),
      col("payload"),
      col("media_meta.format").as("format"),
      col("media_meta.n_bytes").cast("long").as("n_bytes")).as[MediaRow]
    typed.mapPartitions { rows =>
      rows.map { r =>
        val info = decodePpm(r.payload)
        val n = info.width.toLong * info.height
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = info.rasterOffset
        val end = info.rasterOffset + n.toInt * 3
        while (i < end) {
          sr += r.payload(i) & 0xff
          sg += r.payload(i + 1) & 0xff
          sb += r.payload(i + 2) & 0xff
          i += 3
        }
        PpmFeatures(r.doc_id, r.n_bytes, info.width.toLong, info.height.toLong,
          info.maxval.toLong, n,
          sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
      }
    }.toDF()
  }

  // ───────────────────── real codec-free decode: Y4M video ─────────────────────
  // YUV4MPEG2 is to video what PCM WAV is to audio and P6 PPM to
  // images: a plain-text header, then per-frame "FRAME\n" markers with
  // RAW planar YUV bytes — no compression, no codec. Parsing it needs
  // only the header tokenizer + plane arithmetic, so the video
  // decode/frame-sample path is REAL as well — all three modalities
  // decode from their actual bytes.

  case class Y4mInfo(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                     nFrames: Int, frameOffsets: Seq[Int])
  case class Y4mFrameFeatures(doc_id: Long, frame_idx: Long, width: Long, height: Long,
                              fps_num: Long, fps_den: Long, n_frames: Long,
                              n_bytes: Long, y_sum: Long, u_sum: Long, v_sum: Long,
                              y_mean: Double)

  /** Encode bytes as a spec-conformant YUV4MPEG2 stream (C420jpeg):
    * header `YUV4MPEG2 W<w> H<h> F25:1 Ip A1:1 C420jpeg`, then one
    * frame per w×h input-byte window (last window zero-padded; empty
    * input encodes one all-zero frame). Frame f's luma plane byte j is
    * src[f·wh + j]; the quarter-size chroma planes derive from every
    * 4th source byte — u = 255−v, v = v⊕85 (the PPM channel recipe, so
    * the oracle replays every plane sum from the raw bytes in closed
    * form). Deterministic: same bytes → same stream. */
  def y4mEncode(src: Array[Byte], width: Int = 8, height: Int = 8): Array[Byte] = {
    require(width >= 2 && height >= 2 && width % 2 == 0 && height % 2 == 0,
      "C420 needs positive even dims")
    val wh = width * height
    val nFrames = math.max(1, math.ceil(src.length / wh.toDouble).toInt)
    val header = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val chroma = wh / 4
    val out = new java.io.ByteArrayOutputStream(
      header.length + nFrames * (marker.length + wh + 2 * chroma))
    out.write(header)
    def srcAt(i: Int): Int = if (i < src.length) src(i) & 0xff else 0
    var f = 0
    while (f < nFrames) {
      out.write(marker)
      var j = 0
      while (j < wh) { out.write(srcAt(f * wh + j)); j += 1 }
      var k = 0
      while (k < chroma) { out.write(255 - srcAt(f * wh + 4 * k)); k += 1 }
      k = 0
      while (k < chroma) { out.write(srcAt(f * wh + 4 * k) ^ 85); k += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** REAL YUV4MPEG2 parse with hostile-stream guards: magic, required
    * W/H/F parameters (decimal, overflow-checked in long arithmetic,
    * positive and even — C420 chroma halves both dims), unknown
    * parameter tokens tolerated (Ip/A/C/X… are spec'd extensions),
    * then a frame walk that demands every `FRAME` marker (with
    * optional frame parameters) and a complete 1.5·w·h C420 raster —
    * a truncated frame or a corrupt marker fails loudly, never a
    * silent short read. Returns per-frame raster offsets. */
  def decodeY4m(payload: Array[Byte]): Y4mInfo = {
    val magic = "YUV4MPEG2"
    require(payload.length >= magic.length &&
      new String(payload, 0, magic.length, "US-ASCII") == magic,
      "not a YUV4MPEG2 payload")
    var off = magic.length
    var w = -1L; var h = -1L; var fn = -1L; var fd = -1L
    def decimal(s: String, what: String): Long = {
      require(s.nonEmpty && s.forall(c => c >= '0' && c <= '9'),
        s"malformed Y4M $what parameter '$s'")
      val v = s.foldLeft(0L)((acc, c) => {
        val n = acc * 10 + (c - '0')
        require(n <= Int.MaxValue, s"Y4M $what value overflows"); n
      })
      v
    }
    while (off < payload.length && payload(off) != '\n') {
      require(payload(off) == ' ', "malformed Y4M header: parameters must be space-separated")
      off += 1
      val start = off
      while (off < payload.length && payload(off) != ' ' && payload(off) != '\n') off += 1
      val tok = new String(payload, start, off - start, "US-ASCII")
      require(tok.nonEmpty, "malformed Y4M header: empty parameter")
      tok.charAt(0) match {
        case 'W' => w = decimal(tok.substring(1), "width")
        case 'H' => h = decimal(tok.substring(1), "height")
        case 'F' =>
          val parts = tok.substring(1).split(":", -1)
          require(parts.length == 2, s"malformed Y4M frame-rate '$tok'")
          fn = decimal(parts(0), "fps numerator"); fd = decimal(parts(1), "fps denominator")
        case _ => () // Ip / A / C / X…: spec'd extensions, tolerated
      }
    }
    require(off < payload.length, "malformed Y4M header: unterminated")
    off += 1
    require(w >= 2 && h >= 2 && w % 2 == 0 && h % 2 == 0,
      s"Y4M dims ${w}x$h unsupported (C420 needs positive even dims)")
    require(fn >= 1 && fd >= 1, "Y4M header lacks a valid F<num>:<den> frame rate")
    val frameBytes = w * h * 3L / 2L
    val offsets = Seq.newBuilder[Int]
    var n = 0
    while (off < payload.length) {
      val ms = "FRAME"
      require(payload.length - off >= ms.length &&
        new String(payload, off, ms.length, "US-ASCII") == ms,
        s"corrupt Y4M: frame $n lacks its FRAME marker")
      off += ms.length
      while (off < payload.length && payload(off) != '\n') off += 1 // frame params
      require(off < payload.length, s"corrupt Y4M: frame $n header unterminated")
      off += 1
      require(payload.length - off >= frameBytes,
        s"corrupt Y4M: frame $n raster claims $frameBytes bytes but only ${payload.length - off} remain")
      offsets += off
      off += frameBytes.toInt
      n += 1
    }
    require(n >= 1, "Y4M stream holds no frames")
    Y4mInfo(w.toInt, h.toInt, fn.toInt, fd.toInt, n, offsets.result())
  }

  /** Documents as real Y4M media (the video analog of [[asWavMedia]] /
    * [[asPpmMedia]]). */
  def asY4mMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, y4mEncode(text.getBytes("UTF-8")))
      })
      .toDF("doc_id", "payload")
      .select(
        col("doc_id"),
        col("payload"),
        struct(
          lit("video/x-yuv4mpeg").as("format"),
          length(col("payload")).as("n_bytes"),
          lit("y4m-encode").as("origin")).as("media_meta"))
  }

  /** FRAME SAMPLING over real video — the brief's video operation: one
    * row per every-`every`-th frame with exact integer plane sums from
    * walking the actual raster (so a wrong frame offset, a missed
    * FRAME marker or a plane-boundary slip fails the q_multimodal_y4m
    * oracle). `mapPartitions` + flatMap is the batch shape a real
    * decoder needs: decode once per doc, emit a row per sampled
    * frame. */
  def extractY4mFrameFeatures(media: DataFrame, every: Int = 2): DataFrame = {
    require(every >= 1, "every must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] = media.select(
      col("doc_id"),
      col("payload"),
      col("media_meta.format").as("format"),
      col("media_meta.n_bytes").cast("long").as("n_bytes")).as[MediaRow]
    typed.mapPartitions { rows =>
      rows.flatMap { r =>
        val info = decodeY4m(r.payload)
        val wh = info.width * info.height
        val chroma = wh / 4
        (0 until info.nFrames).by(every).map { f =>
          val o = info.frameOffsets(f)
          var sy = 0L; var su = 0L; var sv = 0L
          var i = 0
          while (i < wh) { sy += r.payload(o + i) & 0xff; i += 1 }
          i = 0
          while (i < chroma) { su += r.payload(o + wh + i) & 0xff; i += 1 }
          i = 0
          while (i < chroma) { sv += r.payload(o + wh + chroma + i) & 0xff; i += 1 }
          Y4mFrameFeatures(r.doc_id, f.toLong, info.width.toLong, info.height.toLong,
            info.fpsNum.toLong, info.fpsDen.toLong, info.nFrames.toLong,
            r.n_bytes, sy, su, sv, sy.toDouble / wh)
        }
      }
    }.toDF()
  }

  // ─────────────── format-dispatched decode over a MIXED corpus ───────────────

  /** One unified feature row per media document, whatever its
    * modality: `n_units` is the format's natural count (samples /
    * pixels / frames) and `detail` its headline signal statistic
    * (duration ms / red-channel mean / frame-0 luma mean) — all read
    * out of the REAL parsed container, so every column replays in SQL
    * from the source bytes (q_multimodal's oracle). */
  case class MixedMediaFeatures(doc_id: Long, format: String, n_bytes: Long,
                                width: Long, height: Long, n_units: Long,
                                detail: Double)

  /** Documents as a MIXED-modality media corpus: audio / image / video
    * payloads interleaved by doc_id (mod 3), each a spec-conformant
    * container from the real encoders — the shape of a production
    * multimodal lake, where one binary column carries many formats and
    * the metadata struct says which. */
  def asMixedMedia(docs: DataFrame): DataFrame =
    asWavMedia(docs.filter(col("doc_id") % 3 === 0))
      .unionByName(asPpmMedia(docs.filter(col("doc_id") % 3 === 1)))
      .unionByName(asY4mMedia(docs.filter(col("doc_id") % 3 === 2)))

  /** REAL format-dispatched decode of a mixed media corpus — the
    * serving entry point that replaced the r14 stub pass: each row's
    * `media_meta.format` routes it to the matching container decoder
    * (RIFF walk / P6 header tokenizer / Y4M frame walk) inside ONE
    * partition-local typed pass; an unknown format fails loudly
    * instead of guessing. Per-format deep dives stay available as
    * [[extractWavFeatures]] / [[extractPpmFeatures]] /
    * [[extractY4mFrameFeatures]]. */
  def extractMediaFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] = media.select(
      col("doc_id"),
      col("payload"),
      col("media_meta.format").as("format"),
      col("media_meta.n_bytes").cast("long").as("n_bytes")).as[MediaRow]
    typed.mapPartitions { rows =>
      rows.map { r =>
        r.format match {
          case "audio/wav" =>
            val info = decodeWav(r.payload)
            MixedMediaFeatures(r.doc_id, r.format, r.n_bytes, 0L, 0L, info.nSamples,
              info.nSamples * 1000.0 / info.sampleRate)
          case "image/x-portable-pixmap" =>
            val info = decodePpm(r.payload)
            val n = info.width.toLong * info.height
            var sr = 0L
            var i = info.rasterOffset
            val end = info.rasterOffset + n.toInt * 3
            while (i < end) { sr += r.payload(i) & 0xff; i += 3 }
            MixedMediaFeatures(r.doc_id, r.format, r.n_bytes,
              info.width.toLong, info.height.toLong, n, sr.toDouble / n)
          case "video/x-yuv4mpeg" =>
            val info = decodeY4m(r.payload)
            val wh = info.width * info.height
            val o = info.frameOffsets.head
            var sy = 0L
            var j = 0
            while (j < wh) { sy += r.payload(o + j) & 0xff; j += 1 }
            MixedMediaFeatures(r.doc_id, r.format, r.n_bytes,
              info.width.toLong, info.height.toLong, info.nFrames.toLong,
              sy.toDouble / wh)
          case other => throw new IllegalArgumentException(
            s"unknown media format '$other' for doc ${r.doc_id} — refusing to " +
              "guess a decoder; register the format's container parser here")
        }
      }
    }.toDF()
  }
}
