package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dedup.Hashing

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, processed per-partition in batches —
  * the Spark-side shape of an image/audio feature-extraction stage.
  *
  * IMAGE decode and resize are REAL for the formats the JDK ships
  * codecs for (PNG, BMP, GIF, JPEG via `javax.imageio` — no external
  * dependency), and AUDIO decode is REAL for WAV/AU/AIFF via
  * `javax.sound.sampled`: [[decodeImage]] / [[resizeImage]] /
  * [[decodeAudio]] run inside the same mapPartitions batch path and
  * fall back to the deterministic stubs for payloads no installed
  * reader recognizes. VIDEO is REAL for the codec-free slice of the
  * format space: [[probeVideoMeta]] parses MP4 boxes and RIFF/AVI
  * headers (duration, resolution, track count), and MJPEG-in-AVI
  * frames decode END-TO-END — [[extractAviFrames]] walks the movi
  * chunks and each frame is a JPEG the JDK codec takes
  * ([[withVideoFrames]], oracle-checked by q122 with a
  * [[buildMjpegAvi]]-written container). Inter-frame codecs (H.264
  * etc.) remain out of scope — the JDK ships no such codec —
  * and fall back to [[decodeStub]]'s deterministic fake features, so
  * tests keep stable oracles. Everything around the decoders is
  * load-bearing at scale — schema, per-partition batching (one decoder
  * init per partition, not per row), chunking, and the pruned scan:
  * swap [[decodeStub]] for a JNI/codec call and nothing else changes.
  */
object Multimodal {

  val ChunkBytes = 256

  /** Feature dim of the stubbed decoder output. */
  val FeatureDim = 8

  /** STUB decoder: payload bytes → fixed-size feature vector. Real
    * implementations decode/resample here; this derives deterministic
    * values from a rolling hash of the bytes so tests have stable
    * oracles. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    var h = 1469598103934665603L // FNV offset basis
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      h = (h ^ (payload(i) & 0xffL)) * 1099511628211L
      i += 1
    }
    var k = 0
    while (k < FeatureDim) {
      val hk = Hashing.splitmix64(h + k)
      out(k) = (hk.toDouble / Long.MaxValue.toDouble).toFloat
      k += 1
    }
    out
  }

  /** REAL image decode via `javax.imageio` (JDK codecs: PNG, BMP, GIF,
    * JPEG): payload → [width, height, n_components, meanR, meanG,
    * meanB, meanA, n_pixels] — [[FeatureDim]] floats, same contract as
    * the stub. None when no installed reader recognizes the bytes (or
    * a recognized header turns out truncated/corrupt) — callers fall
    * back to [[decodeStub]], so arbitrary binary never poisons a
    * partition. */
  def decodeImage(payload: Array[Byte]): Option[Array[Float]] =
    readImage(payload).map { img =>
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y) // ARGB regardless of storage format
          sa += (p >>> 24) & 0xff; sr += (p >>> 16) & 0xff
          sg += (p >>> 8) & 0xff;  sb += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Array(w.toFloat, h.toFloat,
        img.getColorModel.getNumComponents.toFloat,
        (sr.toDouble / n).toFloat, (sg.toDouble / n).toFloat,
        (sb.toDouble / n).toFloat, (sa.toDouble / n).toFloat, n.toFloat)
    }

  /** REAL image resize (decode → scale 1/factor → re-encode PNG).
    * Dimensions floor to at least 1; drawImage's default interpolation
    * is deterministic for a given JDK. None when the payload is not a
    * decodable image — callers fall back to [[resizeStub]]. */
  def resizeImage(payload: Array[Byte], factor: Int): Option[Array[Byte]] =
    readImage(payload).map { img =>
      val w = math.max(1, img.getWidth / factor)
      val h = math.max(1, img.getHeight / factor)
      val dst = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
      val g = dst.createGraphics()
      try g.drawImage(img, 0, 0, w, h, null) finally g.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", out)
      out.toByteArray
    }

  /** REAL audio decode via `javax.sound.sampled` (JDK codecs: WAV, AU,
    * AIFF — no external dependency): payload → [sample_rate, channels,
    * n_frames, duration_sec, mean_abs, rms, peak, zero_cross_rate] —
    * [[FeatureDim]] floats, same contract as the stub. Samples are
    * converted to signed 16-bit PCM first so the stats are uniform
    * across source encodings (8-bit, big-endian, unsigned). None when
    * the bytes carry no recognizable audio header (RIFF/.snd/FORM) or
    * the recognized stream is truncated — callers fall back to
    * [[decodeStub]], so arbitrary binary never poisons a partition. */
  def decodeAudio(payload: Array[Byte]): Option[Array[Float]] =
    if (payload == null || payload.isEmpty) None
    else try {
      val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val src = raw.getFormat
        val pcm = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          2 * src.getChannels, src.getSampleRate, false)
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(pcm, raw)
        try {
          val bytes = in.readAllBytes()
          val n = bytes.length / 2 // 16-bit samples across all channels
          if (n == 0) None
          else {
            var sumAbs = 0.0; var sumSq = 0.0; var peak = 0.0; var zc = 0L
            var prev = 0; var i = 0
            while (i < n) {
              val s = (((bytes(2 * i + 1) & 0xff) << 8) |
                (bytes(2 * i) & 0xff)).toShort / 32768.0
              val a = math.abs(s)
              sumAbs += a; sumSq += s * s
              if (a > peak) peak = a
              val sign = java.lang.Double.compare(s, 0.0)
              if (sign != 0) { if (prev != 0 && sign != prev) zc += 1; prev = sign }
              i += 1
            }
            val frames = n / src.getChannels
            Some(Array(
              src.getSampleRate, src.getChannels.toFloat, frames.toFloat,
              (frames / src.getSampleRate.toDouble).toFloat,
              (sumAbs / n).toFloat, math.sqrt(sumSq / n).toFloat,
              peak.toFloat, (zc.toDouble / n).toFloat))
          }
        } finally in.close()
      } finally raw.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException |
           _: java.io.IOException | _: RuntimeException => None
    }

  private def readImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (payload == null || payload.isEmpty) None
    else try {
      // ImageIO returns null for an unrecognized header; a recognized
      // header over garbage (e.g. text starting with "BM") throws — both
      // mean "not an image here"
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    } catch { case _: java.io.IOException | _: RuntimeException => None }

  private val featureSchema = ArrayType(FloatType, containsNull = false)

  /** Appends `media_features: array<float>` by running the decoder over
    * `payloadCol` per partition: [[decodeImage]] (REAL, JDK codecs)
    * when the payload is a recognizable image, [[decodeAudio]] (REAL,
    * JDK codecs) when it is recognizable audio, [[decodeStub]]
    * otherwise. Sniff order is cheap-header-first — both real decoders
    * reject foreign bytes on the magic number, so a WAV never pays an
    * image parse and vice versa. mapPartitions (not a per-row UDF) so a
    * real decoder initializes once per partition — the standard shape
    * for codec/model handles that are expensive to construct. */
  def withMediaFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("media_features", featureSchema))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val feats =
          if (payload == null) Array.empty[Float]
          else decodeImage(payload)
            .orElse(decodeAudio(payload))
            .getOrElse(decodeStub(payload))
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Metadata projection for a binary column: byte length, 256-byte
    * chunk count, stub signature — pure codegen'd expressions, no UDF
    * (mirrors TextQueries.multimodalMeta, which phrases the same thing
    * over the utf-8 bytes of `text` for the oracle harness). */
  def mediaMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val byteLen = length(col(payloadCol)).cast("long")
    df.select(
      col("*"),
      byteLen.as("byte_len"),
      ceil(byteLen.cast("double") / ChunkBytes.toDouble).cast("long").as("n_chunks"))
  }

  /** STUB resize: keep every `factor`-th byte of the payload — the
    * spatial-downsample stand-in (a real implementation decodes,
    * rescales, re-encodes here). Deterministic, so the spec can assert
    * byte-exact output; the Spark-side shape (binary in → smaller
    * binary out, one decoder-style pass per partition) is the real
    * contract. */
  def resizeStub(payload: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }

  /** Appends `media_resized: binary`: [[resizeImage]] (REAL spatial
    * downsample, JDK codecs) for decodable images, [[resizeStub]] for
    * everything else — per-partition like [[withMediaFeatures]] (one
    * codec init per partition). Null payloads stay null — resize is
    * size-changing, so unlike features an empty sentinel would be
    * ambiguous. */
  def withResizedMedia(df: DataFrame, payloadCol: String,
                       factor: Int = 4): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("media_resized", BinaryType))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val resized =
          if (payload == null) null
          else resizeImage(payload, factor).getOrElse(resizeStub(payload, factor))
        Row.fromSeq(r.toSeq :+ resized)
      }
    }(enc)
  }

  // ------------------------------------------------------------- video

  /** Container-level video metadata, parsed with NO codec: `container`
    * is "mp4" or "avi"; duration in seconds from the container clock;
    * width/height of the first visual track; `n_tracks` = trak/stream
    * count. */
  final case class VideoMeta(container: String, durationSec: Double,
                             width: Int, height: Int, nTracks: Int)

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def le32(b: Array[Byte], o: Int): Long =
    ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) |
      ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** REAL video-container METADATA probe (r8 verdict item 6 — retires
    * the last fully-stubbed modality): parses the two dominant
    * container framings without decoding a single frame. ISO
    * BMFF/MP4: a bounds-checked box walk — top level must open with
    * `ftyp`; `moov`/`trak` recurse, `mvhd` yields the movie timescale
    * + duration (v0 and v1 layouts), the first `tkhd` with nonzero
    * fixed-16.16 dimensions yields width/height. RIFF/AVI: `RIFF…AVI `
    * magic, then the fixed-layout `avih` main header
    * (dwMicroSecPerFrame, dwTotalFrames, dwStreams, dwWidth,
    * dwHeight). Returns None for anything else — same
    * reject-foreign-bytes contract as [[decodeImage]]/[[decodeAudio]].
    *
    * These are the fields a video pipeline partitions and filters on
    * (duration buckets, resolution gates, stream sanity) BEFORE paying
    * for any codec; at scale the probe runs over the payload's leading
    * bytes, so a ranged read of the first few MB suffices — no full
    * payload fetch. Frame DECODE stays a documented stub
    * ([[decodeStub]] in [[sampleFrames]]): the JDK ships no video
    * codec and this container has none. */
  def probeVideoMeta(payload: Array[Byte]): Option[VideoMeta] =
    if (payload == null || payload.length < 12) None
    else try probeMp4(payload).orElse(probeAvi(payload))
    catch { case _: IndexOutOfBoundsException => None }

  private def probeMp4(b: Array[Byte]): Option[VideoMeta] = {
    if (fourcc(b, 4) != "ftyp") return None
    var timescale = 0L; var duration = 0L
    var w = 0; var h = 0; var tracks = 0
    def walk(start: Int, end: Int): Unit = {
      var off = start
      var ok = true
      while (ok && off + 8 <= end) {
        var size = be32(b, off)
        val typ = fourcc(b, off + 4)
        var hdr = 8
        if (size == 1 && off + 16 <= end) { size = be64(b, off + 8); hdr = 16 }
        else if (size == 0) size = end - off // last box runs to the end
        if (size < hdr || off + size > end) ok = false
        else {
          val po = off + hdr
          typ match {
            case "moov" => walk(po, off + size.toInt)
            case "trak" => tracks += 1; walk(po, off + size.toInt)
            case "mvhd" =>
              if ((b(po) & 0xff) == 1) { // v1: 64-bit ctime/mtime/duration
                timescale = be32(b, po + 20); duration = be64(b, po + 24)
              } else {
                timescale = be32(b, po + 12); duration = be32(b, po + 16)
              }
            case "tkhd" if w == 0 =>
              val base = if ((b(po) & 0xff) == 1) po + 88 else po + 76
              val tw = (be32(b, base) >> 16).toInt
              val th = (be32(b, base + 4) >> 16).toInt
              if (tw > 0 && th > 0) { w = tw; h = th }
            case _ => ()
          }
          off += size.toInt
        }
      }
    }
    walk(0, b.length)
    if (timescale <= 0) None
    else Some(VideoMeta("mp4", duration.toDouble / timescale, w, h, tracks))
  }

  private def probeAvi(b: Array[Byte]): Option[VideoMeta] = {
    if (fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return None
    // linear fourcc scan to the main header: avih is a fixed-layout
    // struct, so a full RIFF LIST walk buys nothing for a probe
    var i = 12
    while (i + 48 <= b.length) {
      if (fourcc(b, i) == "avih") {
        val po = i + 8
        val usPerFrame  = le32(b, po)
        val totalFrames = le32(b, po + 16)
        // header fields are attacker-controlled u32s: a Long×Long
        // product of two near-2^32 values overflows into a garbage
        // (possibly negative) duration instead of the documented
        // reject-foreign-bytes None. Duration math runs in Double
        // (exact enough for a probe, cannot overflow) and implausible
        // headers — zero/over-a-minute frame interval or an
        // over-2^31 frame count — are rejected outright.
        if (usPerFrame <= 0 || usPerFrame > 60_000_000L ||
            totalFrames < 0 || totalFrames > Int.MaxValue) return None
        return Some(VideoMeta("avi",
          totalFrames.toDouble * usPerFrame.toDouble / 1e6,
          le32(b, po + 32).toInt, le32(b, po + 36).toInt,
          le32(b, po + 24).toInt))
      }
      i += 1
    }
    None
  }

  /** Appends the [[probeVideoMeta]] fields (`container, duration_sec,
    * width, height, n_tracks`, all null for non-video payloads) in the
    * same per-partition batch path as the other decoders. */
  def withVideoMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("container", StringType),
      StructField("duration_sec", DoubleType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_tracks", IntegerType)))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val meta = probeVideoMeta(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq ++ (meta match {
          case Some(m) => Seq(m.container, m.durationSec, m.width, m.height, m.nTracks)
          case None    => Seq(null, null, null, null, null)
        }))
      }
    }(enc)
  }

  val FrameBytes  = 64 // fixed-size "frame" of the opaque payload
  val FrameStride = 4  // keep every 4th frame — the temporal subsample

  /** Video-style FRAME SAMPLING over an opaque binary column: the
    * payload is a sequence of fixed-[[FrameBytes]] frames; every
    * [[FrameStride]]-th frame is sliced out and decoded
    * ([[decodeStub]] per frame — swap for a real codec). The explode
    * happens BEFORE decode so a real decoder sees one bounded frame at
    * a time (never the whole payload in memory per row), and the
    * output is (row, frame_idx, frame_features) — the training-sample
    * granularity a video pipeline feeds downstream. Pure plan-side
    * slicing (codegen'd `substring` on binary) + one mapPartitions
    * decode pass; frame count per row is byte_len/[[FrameBytes]], so
    * output scales with data volume, not row count. */
  def sampleFrames(df: DataFrame, payloadCol: String): DataFrame = {
    val nFrames = ceil(length(col(payloadCol)).cast("double") / FrameBytes)
      .cast("int")
    // NULL payload → NO frames (explode of an empty array emits no
    // rows), matching withResizedMedia's null-stays-null contract.
    // Without the guard, greatest(null, 1) = 1 manufactured a phantom
    // frame_idx=0 row with empty features for every null payload
    // (ADVICE r6).
    val frameIdxs = when(col(payloadCol).isNull, array().cast("array<int>"))
      .otherwise(sequence(lit(0), greatest(nFrames, lit(1)) - 1, lit(FrameStride)))
    val sliced = df
      .withColumn("frame_idx", explode(frameIdxs))
      .withColumn("frame_bytes",
        expr(s"substring($payloadCol, frame_idx * $FrameBytes + 1, $FrameBytes)"))
    val schema = StructType(sliced.schema.fields :+
      StructField("frame_features", featureSchema))
    val idx = sliced.schema.fieldIndex("frame_bytes")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    sliced.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        val frame = r.getAs[Array[Byte]](idx)
        val feats = if (frame == null) Array.empty[Float] else decodeStub(frame)
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  // ------------------------------------ MJPEG-in-AVI: real frame decode

  /** Quality-1.0 JPEG of a SOLID-GRAY frame — the deterministic frame
    * generator for the real-decode video path (q122): a constant image
    * is DC-only so quality 1.0 (all quant steps 1) loses nothing, and
    * gray makes Cb=Cr=128 so the YCbCr round-trip is the identity.
    * Decode therefore returns EXACTLY `gray` at every pixel
    * (MultimodalSpec pins it, including odd dimensions), which is what
    * lets a SQL oracle predict real JPEG-decode output. */
  def encodeSolidGrayJpeg(w: Int, h: Int, gray: Int): Array[Byte] = {
    require(w > 0 && h > 0 && gray >= 0 && gray <= 255)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    wr.setOutput(new javax.imageio.stream.MemoryCacheImageOutputStream(bos))
    try wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    finally wr.dispose()
    bos.toByteArray
  }

  private def le32Bytes(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Minimal well-formed MJPEG-in-AVI container writer: RIFF('AVI '
    * LIST('hdrl' avih LIST('strl' strh['vids'/'MJPG'] strf[BITMAPINFO
    * 'MJPG'])) LIST('movi' ('00dc' jpeg)…)). Every structure the
    * readers here rely on is standard layout — [[probeAvi]] reads the
    * avih fields at their documented offsets, [[extractAviFrames]]
    * walks the movi chunks — and the header carries a real stream
    * description so common players accept the file too. */
  def buildMjpegAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
                    usPerFrame: Int = 40000): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def cc(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      cc(id) ++ le32Bytes(body.length.toLong) ++ body ++ pad
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(kind) ++ body)
    // AVIMAINHEADER (56 bytes): usPerFrame, maxBytesPerSec, padding,
    // flags, totalFrames, initialFrames, streams, suggestedBuf, w, h,
    // reserved[4]
    val maxFrame = if (frames.isEmpty) 0L else frames.map(_.length).max.toLong
    val avih = chunk("avih",
      le32Bytes(usPerFrame.toLong) ++ le32Bytes(0) ++ le32Bytes(0) ++
        le32Bytes(0) ++ le32Bytes(frames.length.toLong) ++ le32Bytes(0) ++
        le32Bytes(1) ++ le32Bytes(maxFrame) ++
        le32Bytes(w.toLong) ++ le32Bytes(h.toLong) ++
        Array.fill(16)(0.toByte))
    // AVISTREAMHEADER (56 bytes): 'vids'/'MJPG', flags, prio+lang,
    // initial, scale, rate, start, length, suggestedBuf, quality,
    // sampleSize, rcFrame
    val strh = chunk("strh",
      cc("vids") ++ cc("MJPG") ++ le32Bytes(0) ++ le32Bytes(0) ++
        le32Bytes(0) ++ le32Bytes(usPerFrame.toLong) ++ le32Bytes(1000000L) ++
        le32Bytes(0) ++ le32Bytes(frames.length.toLong) ++ le32Bytes(maxFrame) ++
        le32Bytes(0xffffffffL) ++ le32Bytes(0) ++
        le32Bytes(0) ++ le32Bytes((h.toLong << 16) | w.toLong))
    // BITMAPINFOHEADER (40 bytes), biCompression = 'MJPG'
    val strf = chunk("strf",
      le32Bytes(40) ++ le32Bytes(w.toLong) ++ le32Bytes(h.toLong) ++
        Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++ cc("MJPG") ++
        le32Bytes(w.toLong * h * 3) ++ Array.fill(16)(0.toByte))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi",
      frames.iterator.map(f => chunk("00dc", f)).foldLeft(Array.empty[Byte])(_ ++ _))
    val body = cc("AVI ") ++ hdrl ++ movi
    out.write(cc("RIFF")); out.write(le32Bytes(body.length.toLong)); out.write(body)
    out.toByteArray
  }

  /** Frame payloads of an AVI 'movi' list, in stream order: the
    * `##dc`/`##db` (compressed / uncompressed DIB) chunk bodies. Walks
    * top-level RIFF chunks to the movi LIST, then its sub-chunks, all
    * bounds-checked with even-byte padding — the standard framing.
    * Empty for anything that is not a plausible AVI (the
    * reject-foreign-bytes contract of the other decoders). */
  def extractAviFrames(payload: Array[Byte]): IndexedSeq[Array[Byte]] = {
    val b = payload
    if (b == null || b.length < 12 ||
        fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
      return IndexedSeq.empty
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val riffEnd = math.min(b.length.toLong, 8L + le32(b, 4)).toInt
    def isFrameId(o: Int): Boolean = {
      val c0 = b(o).toChar; val c1 = b(o + 1).toChar
      val c2 = b(o + 2).toChar; val c3 = b(o + 3).toChar
      c0.isDigit && c1.isDigit && c2 == 'd' && (c3 == 'c' || c3 == 'b')
    }
    def walkMovi(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val size = le32(b, off + 4)
        val next = off + 8 + size + (size & 1L)
        if (size < 0 || off + 8 + size > end) return // corrupt: stop, keep what we have
        if (isFrameId(off))
          frames += java.util.Arrays.copyOfRange(b, off + 8, off + 8 + size.toInt)
        off = next.toInt
      }
    }
    var off = 12
    while (off + 8 <= riffEnd) {
      val size = le32(b, off + 4)
      val next = off + 8 + size + (size & 1L)
      if (size < 0 || off + 8 + size > riffEnd) return frames.toIndexedSeq
      if (fourcc(b, off) == "LIST" && size >= 4 && fourcc(b, off + 8) == "movi")
        walkMovi(off + 12, (off + 8 + size).toInt)
      off = next.toInt
    }
    frames.toIndexedSeq
  }

  /** REAL per-frame video decode over an AVI payload column: container
    * probe → movi frame extraction → [[decodeImage]] per frame (JDK
    * JPEG codec — the MJPEG case), [[decodeStub]] fallback for frames
    * no installed reader takes (a DIB/raw codec would slot in there).
    * Output grain = (video row × frame): the input row's columns plus
    * `frame_idx` and the [[FeatureDim]]-float `frame_features`. Same
    * mapPartitions batch shape as every other decoder here — one
    * decoder init per partition, bounded memory per row (one frame
    * decoded at a time), schema/explode plumbing identical at any
    * payload size. */
  def withVideoFrames(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType),
      StructField("frame_features", featureSchema)))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val frames =
          if (payload == null) IndexedSeq.empty else extractAviFrames(payload)
        frames.iterator.zipWithIndex.map { case (fb, i) =>
          val feats = decodeImage(fb).getOrElse(decodeStub(fb))
          Row.fromSeq(r.toSeq ++ Seq(i, feats.toSeq))
        }
      }
    }(enc)
  }

  /** Videos generated for q122: one per `doc_id < `[[VideoDocs]]. */
  val VideoDocs = 16L

  /** Deterministic frame gray level for (video, frame). */
  def grayOf(id: Long, frame: Int): Int = ((id * 31 + frame * 7) % 251).toInt

  /** q122 — REAL video frame decode, oracle-checked: for each of
    * [[VideoDocs]] doc ids, an MJPEG-in-AVI payload is synthesized
    * executor-side (solid-gray quality-1.0 JPEG frames, dimensions and
    * gray levels pure functions of (doc_id, frame_idx)), then run
    * through the full REAL pipeline — [[probeVideoMeta]] container
    * probe, [[extractAviFrames]] movi walk, [[decodeImage]] JPEG
    * decode per frame. Because the solid-gray round-trip is EXACT
    * (see [[encodeSolidGrayJpeg]]), the DuckDB oracle predicts every
    * decoded cell with integer arithmetic: a single wrong bit anywhere
    * in container writing, chunk framing, or codec output moves
    * `mean_gray` or a dimension and the hash gate goes red. Payloads
    * are bounded (≤8 tiny frames each) so the generation cost is
    * noise; the decode path itself is the same mapPartitions batch
    * loop a 100 TB corpus of real AVIs would stream through. */
  def videoFrames(s: SparkSession, d: String): DataFrame = {
    val docs = graft.ops.Tables.documents(s, d)
      .select(col("doc_id")).filter(col("doc_id") < VideoDocs)
    val genSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val genEnc =
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(genSchema)
    val videos = docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = (4 + id % 5).toInt
        val w = (16 + (id % 4) * 8).toInt
        val frames = (0 until n).map(i => encodeSolidGrayJpeg(w, 16, grayOf(id, i)))
        Row(id, buildMjpegAvi(frames, w, 16))
      }
    }(genEnc)
    withVideoFrames(withVideoMeta(videos, "payload"), "payload")
      .select(
        col("doc_id"),
        col("frame_idx"),
        element_at(col("frame_features"), 1).cast("int").as("frame_w"),
        element_at(col("frame_features"), 2).cast("int").as("frame_h"),
        element_at(col("frame_features"), 4).cast("int").as("mean_gray"),
        col("width").as("header_w"), // container header, vs decoded frame_w
        round(col("duration_sec") * 1000).cast("int").as("duration_ms"))
  }

  val videoFramesSql: String =
    s"""WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < $VideoDocs),
       |f AS (SELECT doc_id, CAST(4 + doc_id % 5 AS INT) AS n_frames,
       |  CAST(16 + (doc_id % 4) * 8 AS INT) AS w FROM ids),
       |e AS (SELECT doc_id, n_frames, w, unnest(range(0, n_frames)) AS i FROM f)
       |SELECT doc_id, CAST(i AS INT) AS frame_idx, w AS frame_w,
       |  16 AS frame_h, CAST((doc_id * 31 + i * 7) % 251 AS INT) AS mean_gray,
       |  w AS header_w, n_frames * 40 AS duration_ms
       |FROM e""".stripMargin.replace("\n", " ")

  // --------------------------------- perceptual-hash image dedup

  val ImgDocs     = 120L // docs carrying a synthetic image payload
  val ImgPatterns = 17L  // distinct visual contents; doc % 17 shares one
  val ImgGrid     = 8    // aHash grid — 64-bit hash

  /** Deterministic 8×8 gray for pattern `pid` at grid cell (r, c). */
  def imgGray(pid: Long, r: Int, c: Int): Int =
    java.lang.Math.floorMod(
      Hashing.splitmix64(pid * 64 + r * 8 + c), 256L).toInt

  /** Render pattern `pid` as a REAL PNG at `scale`: each grid cell
    * becomes a scale×scale uniform block, encoded through the JDK
    * codec. Same pid at different scales = the same picture, larger —
    * the scale-invariance case a perceptual hash exists to catch. */
  def encodePatternPng(pid: Long, scale: Int): Array[Byte] = {
    val side = ImgGrid * scale
    val img = new java.awt.image.BufferedImage(
      side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < ImgGrid) {
      var c = 0
      while (c < ImgGrid) {
        val g = imgGray(pid, r, c)
        val rgb = (g << 16) | (g << 8) | g
        var y = r * scale
        while (y < (r + 1) * scale) {
          var x = c * scale
          while (x < (c + 1) * scale) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        c += 1
      }
      r += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 64-bit AVERAGE HASH (aHash) of a decoded image: exact integer
    * block-average down to the [[ImgGrid]]² grid, then one bit per
    * cell — "above the median gray" (integer median: 2·g > g₍₃₁₎+g₍₃₂₎,
    * no float anywhere). Uniform blocks make the downsample EXACT, so
    * re-encodes and integer rescales of one picture hash identically —
    * the invariance the dedup below relies on. None when no JDK codec
    * recognizes the payload. */
  def aHash(payload: Array[Byte]): Option[Long] =
    readImage(payload).flatMap(aHashImg)

  /** [[aHash]] over an already-decoded image (one decode per row in
    * the batch path). */
  def aHashImg(img0: java.awt.image.BufferedImage): Option[Long] =
    Some(img0).filter(i =>
      i.getWidth % ImgGrid == 0 && i.getHeight % ImgGrid == 0).map { img =>
      val bw = img.getWidth / ImgGrid
      val bh = img.getHeight / ImgGrid
      val g = new Array[Long](ImgGrid * ImgGrid)
      var r = 0
      while (r < ImgGrid) {
        var c = 0
        while (c < ImgGrid) {
          var sum = 0L
          var y = r * bh
          while (y < (r + 1) * bh) {
            var x = c * bw
            while (x < (c + 1) * bw) { sum += img.getRGB(x, y) & 0xff; x += 1 }
            y += 1
          }
          g(r * ImgGrid + c) = sum / (bw.toLong * bh)
          c += 1
        }
        r += 1
      }
      val sorted = g.sorted
      val m2 = sorted(31) + sorted(32)
      var h = 0L
      var i = 0
      while (i < 64) { if (2 * g(i) > m2) h |= (1L << i); i += 1 }
      h
    }

  /** q195 — PERCEPTUAL-HASH IMAGE DEDUP, the multimodal face of the
    * dedup family: payloads that LOOK the same must land in one
    * cluster even when their bytes differ (here: the same pattern
    * rendered at 1×/2×/3× and re-encoded — different PNG streams,
    * same picture). The pipeline is the real shape end-to-end —
    * opaque binary column → per-partition REAL JDK decode →
    * [[aHash]] → ONE hash-keyed aggregate — and the oracle checks the
    * resulting CLUSTER STRUCTURE (members, sizes-per-cluster) from
    * the generator arithmetic, which is exactly the contract a
    * perceptual dedup owes: bit-identical hashes for visually
    * identical content, regardless of encoding.
    *
    * Scale: hashes are 8 bytes/image; the aggregate is hash-keyed
    * (map-side combinable); decode is the per-partition batch path of
    * every op in this file. Swap [[aHash]] for a pHash/DCT or an
    * embedding under the SAME plan when codecs and models allow. */
  def imagePhashDedup(s: SparkSession, d: String): DataFrame = {
    val docs = graft.ops.Tables.documents(s, d)
      .select(col("doc_id")).filter(col("doc_id") < ImgDocs)
    val genSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val genEnc =
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(genSchema)
    val images = docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, encodePatternPng(id % ImgPatterns, (1 + id % 3).toInt))
      }
    }(genEnc)
    val hashSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("ahash", LongType),
      StructField("side", IntegerType)))
    val hashEnc =
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(hashSchema)
    images.mapPartitions { rows =>
      rows.flatMap { r =>
        for {
          img <- readImage(r.getAs[Array[Byte]](1))
          h <- aHashImg(img)
        } yield Row(r.getLong(0), h, img.getWidth)
      }
    }(hashEnc)
      .groupBy("ahash")
      .agg(
        min("doc_id").as("rep_doc_id"),
        count(lit(1)).as("n_members"),
        countDistinct("side").as("n_scales"))
      .select("rep_doc_id", "n_members", "n_scales")
  }

  val imagePhashDedupSql: String =
    s"""WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < $ImgDocs)
       |SELECT min(doc_id) AS rep_doc_id, CAST(count(*) AS BIGINT) AS n_members,
       |  CAST(count(DISTINCT 1 + doc_id % 3) AS BIGINT) AS n_scales
       |FROM ids GROUP BY doc_id % $ImgPatterns""".stripMargin.replace("\n", " ")

  val CutThr = 100

  /** q197 — SHOT-BOUNDARY DETECTION over the REAL-decoded q122 frame
    * stream: a cut is a frame whose decoded mean gray jumps more than
    * [[CutThr]] from its predecessor — the standard threshold detector
    * that seeds video scene segmentation (and decides which frames a
    * multimodal training pipeline samples: one per shot beats every
    * k-th frame). Runs on [[videoFrames]]'s output — container walk,
    * per-frame JPEG decode through the JDK codec, then ONE per-video
    * lag window (frame counts are container-bounded, so the window
    * partition is tiny by construction) into a video-grain rollup.
    * The oracle replays the generator arithmetic: +7 mod 251 gray
    * steps only exceed the threshold at the modular wrap, so expected
    * cuts are exactly the wraps. */
  def shotBoundaries(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    videoFrames(s, d)
      .select(col("doc_id"), col("frame_idx"), col("mean_gray"))
      .withColumn("jump",
        abs(col("mean_gray") - lag("mean_gray", 1).over(w)))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_frames"),
        sum(when(col("jump") > CutThr, 1L).otherwise(0L)).as("n_cuts"),
        coalesce(max("jump"), lit(0)).cast("int").as("max_jump"))
  }

  val shotBoundariesSql: String =
    s"""WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < $VideoDocs),
       |f AS (SELECT doc_id, CAST(4 + doc_id % 5 AS INT) AS n_frames FROM ids),
       |e AS (SELECT doc_id, unnest(range(0, n_frames)) AS i FROM f),
       |g AS (SELECT doc_id, i, (doc_id * 31 + i * 7) % 251 AS gray FROM e),
       |j AS (SELECT doc_id, abs(gray - lag(gray) OVER (PARTITION BY doc_id ORDER BY i)) AS jump FROM g)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
       |  CAST(sum(CASE WHEN jump > $CutThr THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
       |  CAST(coalesce(max(jump), 0) AS INT) AS max_jump
       |FROM j GROUP BY doc_id""".stripMargin.replace("\n", " ")

  // ----------------------------------- audio fingerprint dedup

  val AudDocs     = 96L  // docs carrying a synthetic audio payload
  val AudPatterns = 13L  // distinct audio contents; doc % 13 shares one
  val AudWindows  = 64   // fingerprint windows — 64-bit hash
  val AudBaseLen  = 16   // samples per window at stretch 1
  val AudRate     = 8000

  /** Deterministic window amplitude for audio pattern `pid`. */
  def audAmp(pid: Long, w: Int): Short =
    (java.lang.Math.floorMod(
      Hashing.splitmix64(pid * 997 + w), 32768L) - 16384L).toShort

  /** Render audio pattern `pid` as a REAL 16-bit PCM mono WAV at
    * time-stretch `stretch`: window w holds [[AudBaseLen]]·stretch
    * samples of constant amplitude [[audAmp]](pid, w). Same pid at
    * different stretches = the same signal, slower — the duration-
    * invariance case an audio fingerprint exists to catch. */
  def encodePatternWav(pid: Long, stretch: Int): Array[Byte] =
    encodeWindowsWav(stretch, w => audAmp(pid, w))

  /** 64-bit audio fingerprint of a decoded 16-bit PCM mono stream:
    * exact integer mean over [[AudWindows]] equal windows, one bit per
    * window — "above the median level" (the [[aHashImg]] idiom on the
    * time axis). Constant windows make the mean EXACT under integer
    * time-stretch, so stretched re-encodes of one signal fingerprint
    * identically. None when no JDK codec recognizes the payload or
    * the sample count doesn't tile the windows. */
  def audioFingerprint(payload: Array[Byte]): Option[Long] =
    try {
      val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val bytes = raw.readAllBytes()
        val n = bytes.length / 2
        if (n == 0 || n % AudWindows != 0) None
        else {
          val wlen = n / AudWindows
          val m = new Array[Long](AudWindows)
          var w = 0
          while (w < AudWindows) {
            var sum = 0L
            var i = w * wlen
            while (i < (w + 1) * wlen) {
              sum += (((bytes(2 * i + 1) & 0xff) << 8) |
                (bytes(2 * i) & 0xff)).toShort
              i += 1
            }
            m(w) = sum / wlen
            w += 1
          }
          val sorted = m.sorted
          val m2 = sorted(31) + sorted(32)
          var h = 0L
          var k = 0
          while (k < 64) { if (2 * m(k) > m2) h |= (1L << k); k += 1 }
          Some(h)
        }
      } finally raw.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException |
           _: java.io.IOException | _: RuntimeException => None
    }

  /** q196 — AUDIO FINGERPRINT DEDUP: the audio face of q195 —
    * payloads that SOUND the same must cluster even when their bytes
    * differ (the same signal at 1×/2×/3× time-stretch is a different
    * WAV stream). Same end-to-end shape: opaque binary → per-partition
    * REAL `javax.sound` decode → [[audioFingerprint]] → ONE hash-keyed
    * aggregate, cluster structure oracle-checked from the generator
    * arithmetic. With q195 (image) and q122 (video frames), each
    * modality now has a REAL decode path driving a registered,
    * oracle-gated operator. */
  def audioFingerprintDedup(s: SparkSession, d: String): DataFrame = {
    val docs = graft.ops.Tables.documents(s, d)
      .select(col("doc_id")).filter(col("doc_id") < AudDocs)
    val genSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val genEnc =
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(genSchema)
    val sounds = docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, encodePatternWav(id % AudPatterns, (1 + id % 3).toInt))
      }
    }(genEnc)
    val fpSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("fp", LongType),
      StructField("n_bytes", IntegerType)))
    val fpEnc =
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(fpSchema)
    sounds.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](1)
        audioFingerprint(payload).map(h => Row(r.getLong(0), h, payload.length))
      }
    }(fpEnc)
      .groupBy("fp")
      .agg(
        min("doc_id").as("rep_doc_id"),
        count(lit(1)).as("n_members"),
        countDistinct("n_bytes").as("n_stretches"))
      .select("rep_doc_id", "n_members", "n_stretches")
  }

  val audioFingerprintDedupSql: String =
    s"""WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < $AudDocs)
       |SELECT min(doc_id) AS rep_doc_id, CAST(count(*) AS BIGINT) AS n_members,
       |  CAST(count(DISTINCT 1 + doc_id % 3) AS BIGINT) AS n_stretches
       |FROM ids GROUP BY doc_id % $AudPatterns""".stripMargin.replace("\n", " ")

  // ------------------------------------ voice-activity segmentation

  /** Window w of VAD pattern `pid` is ACTIVE iff (w·(pid+3)) % 7 ≠ 0 —
    * integer arithmetic BOTH the generator and the DuckDB oracle can
    * evaluate, unlike splitmix64. Active windows render at a level
    * floor ≥ [[VadFloor]]; silent windows render at exactly 0, so the
    * energy threshold below separates them with no boundary cases. */
  def vadActive(pid: Long, w: Int): Boolean = (w * (pid + 3)) % 7 != 0

  val VadFloor     = 1000L // min |amplitude| of an active window
  val VadThreshold = 500L  // mean-|amp| cut between speech and silence

  /** Active-window amplitude: [[audAmp]] pushed outside ±[[VadFloor]],
    * sign preserved — still pattern-dependent, never near-silent. */
  def vadAmp(pid: Long, w: Int): Short = {
    val a = audAmp(pid, w).toLong
    val lifted = if (a >= 0) VadFloor + a % (16384 - VadFloor)
                 else -(VadFloor + (-a) % (16384 - VadFloor))
    lifted.toShort
  }

  /** Render VAD pattern `pid` at time-stretch `stretch` as a real WAV:
    * [[vadAmp]] in active windows, digital silence elsewhere. */
  def encodeVadWav(pid: Long, stretch: Int): Array[Byte] =
    encodeWindowsWav(stretch,
      w => if (vadActive(pid, w)) vadAmp(pid, w) else 0)

  /** Shared constant-window WAV renderer (q196's encoder with the
    * amplitude function lifted out). */
  def encodeWindowsWav(stretch: Int, amp: Int => Short): Array[Byte] = {
    val n = AudWindows * AudBaseLen * stretch
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val a = amp(i / (AudBaseLen * stretch))
      data(2 * i) = (a & 0xff).toByte
      data(2 * i + 1) = ((a >> 8) & 0xff).toByte
      i += 1
    }
    wavHeader(data)
  }

  private def wavHeader(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int) = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    bos.write("RIFF".getBytes("US-ASCII")); bos.write(le32(36 + data.length))
    bos.write("WAVE".getBytes("US-ASCII"))
    bos.write("fmt ".getBytes("US-ASCII")); bos.write(le32(16))
    bos.write(le16(1)); bos.write(le16(1)) // PCM, mono
    bos.write(le32(AudRate)); bos.write(le32(AudRate * 2))
    bos.write(le16(2)); bos.write(le16(16)) // block align, bits
    bos.write("data".getBytes("US-ASCII")); bos.write(le32(data.length))
    bos.write(data)
    bos.toByteArray
  }

  /** VAD segments of a decoded 16-bit PCM mono stream: per-window
    * exact integer mean-|amplitude| energy over [[AudWindows]] equal
    * windows, threshold at [[VadThreshold]], then merge RUNS of
    * active windows into (start_w, end_w) segments — all from the
    * DECODED samples, never from generator arithmetic. None when no
    * JDK codec recognizes the payload or windows don't tile. */
  def vadSegments(payload: Array[Byte]): Option[Seq[(Int, Int)]] =
    try {
      val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val bytes = raw.readAllBytes()
        val n = bytes.length / 2
        if (n == 0 || n % AudWindows != 0) None
        else {
          val wlen = n / AudWindows
          val active = (0 until AudWindows).map { w =>
            var sum = 0L
            var i = w * wlen
            while (i < (w + 1) * wlen) {
              sum += math.abs((((bytes(2 * i + 1) & 0xff) << 8) |
                (bytes(2 * i) & 0xff)).toShort.toLong)
              i += 1
            }
            sum / wlen > VadThreshold
          }
          val segs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
          var w = 0
          while (w < AudWindows) {
            if (active(w)) {
              val start = w
              while (w < AudWindows && active(w)) w += 1
              segs += ((start, w - 1))
            } else w += 1
          }
          Some(segs.toSeq)
        }
      } finally raw.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException |
           _: java.io.IOException | _: RuntimeException => None
    }

  /** q202 — VOICE-ACTIVITY SEGMENTATION: the temporal-segmentation op
    * for audio, completing the modality square (q195 image identity,
    * q196 audio identity, q197 video boundaries, THIS audio
    * boundaries). Opaque WAV payloads → per-partition REAL
    * `javax.sound` decode → exact integer window energies → threshold
    * → gaps-and-islands merge into speech segments with integer-ms
    * timestamps (ms = window · [[AudBaseLen]] · stretch · 1000 /
    * [[AudRate]] — exact: 16·1000/8000 = 2). The activity pattern is
    * generator arithmetic the oracle replays COLD (window-index
    * islands in SQL); the operator itself reads only the decoded
    * samples — the spec swaps in silence to prove it.
    *
    * Scale shape: identical to q196 — decode and segment are a pure
    * flatMap at payload grain (the mapInPandas posture for a real
    * codec fleet), output is segment-grain, and the only exchange is
    * the optional per-doc rollup the query ends with (none here:
    * segment rows ship as-is, doc-partitioned by the scan). */
  def vadSegmentation(s: SparkSession, d: String): DataFrame = {
    val docs = graft.ops.Tables.documents(s, d)
      .select(col("doc_id")).filter(col("doc_id") < AudDocs)
    val genSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("stretch", IntegerType),
      StructField("payload", BinaryType)))
    val genEnc =
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(genSchema)
    val sounds = docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val stretch = (1 + id % 3).toInt
        Row(id, stretch, encodeVadWav(id % AudPatterns, stretch))
      }
    }(genEnc)
    val segSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("seg_idx", LongType),
      StructField("start_ms", LongType),
      StructField("end_ms", LongType),
      StructField("n_windows", LongType)))
    val segEnc =
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(segSchema)
    sounds.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val msPerW = AudBaseLen.toLong * r.getInt(1) * 1000L / AudRate
        vadSegments(r.getAs[Array[Byte]](2)).toSeq.flatMap { segs =>
          segs.zipWithIndex.map { case ((a, b), i) =>
            Row(id, i.toLong, a * msPerW, (b + 1) * msPerW,
              (b - a + 1).toLong)
          }
        }
      }
    }(segEnc)
  }

  // Oracle: replay the activity arithmetic cold — islands of
  // consecutive active windows via the w − row_number() trick.
  val vadSegmentationSql: String =
    s"""WITH ids AS (SELECT doc_id, doc_id % $AudPatterns AS pid,
       |  1 + doc_id % 3 AS stretch FROM documents WHERE doc_id < $AudDocs),
       |act AS (SELECT i.doc_id, i.stretch, w.w
       |  FROM ids i CROSS JOIN (SELECT unnest(generate_series(0, ${AudWindows - 1})) AS w) w
       |  WHERE (w.w * (i.pid + 3)) % 7 != 0),
       |isl AS (SELECT doc_id, stretch, w,
       |  w - row_number() OVER (PARTITION BY doc_id ORDER BY w) AS grp
       |  FROM act),
       |seg AS (SELECT doc_id, stretch, grp, min(w) AS sw, max(w) AS ew,
       |  count(*) AS nw FROM isl GROUP BY 1, 2, 3)
       |SELECT doc_id,
       |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY sw) - 1 AS BIGINT) AS seg_idx,
       |  CAST(sw * $AudBaseLen * stretch * 1000 // $AudRate AS BIGINT) AS start_ms,
       |  CAST((ew + 1) * $AudBaseLen * stretch * 1000 // $AudRate AS BIGINT) AS end_ms,
       |  CAST(nw AS BIGINT) AS n_windows
       |FROM seg""".stripMargin.replace("\n", " ")
}
