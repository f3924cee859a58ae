package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The multimodal plumbing must be real even while the decoder is a
  * stub: schema, per-partition batching, null handling, determinism. */
class MultimodalSpec extends AnyFunSuite {

  test("withMediaFeatures appends deterministic fixed-size features; null payload → empty") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val df = Seq(
      (1L, "abc".getBytes("UTF-8")),
      (2L, "abc".getBytes("UTF-8")),
      (3L, "different".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = Multimodal.withMediaFeatures(df, "payload")
    assert(out.schema.fieldNames.toSeq == Seq("doc_id", "payload", "media_features"))
    val rows = out.select("doc_id", "media_features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows(1L).length === Multimodal.FeatureDim)
    assert(rows(1L) == rows(2L))      // same bytes → same features
    assert(rows(1L) != rows(3L))      // different bytes → different features
    assert(rows(4L).isEmpty)          // null payload → empty vector
  }

  test("sampleFrames slices every 4th 64-byte frame and decodes each") {
    val spark = SparkSpec.spark
    import spark.implicits._
    // 300 bytes → 5 frames (64,64,64,64,44) → sampled idx 0 and 4
    val payload = Array.tabulate[Byte](300)(i => (i % 127).toByte)
    val df = Seq((1L, payload), (2L, Array[Byte](1, 2, 3)),
        (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = Multimodal.sampleFrames(df, "payload")
      .select("doc_id", "frame_idx", "frame_features").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getSeq[Float](2)).toMap
    // null payload contributes NO frames (no phantom frame_idx=0 row)
    assert(out.keySet === Set((1L, 0), (1L, 4), (2L, 0)))
    // each sampled frame decodes like the standalone stub on its slice
    val frame0 = payload.slice(0, 64)
    assert(out((1L, 0)) === Multimodal.decodeStub(frame0).toSeq)
    val frame4 = payload.slice(256, 300) // short tail frame
    assert(out((1L, 4)) === Multimodal.decodeStub(frame4).toSeq)
    assert(out((2L, 0)) === Multimodal.decodeStub(Array[Byte](1, 2, 3)).toSeq)
  }

  test("withResizedMedia keeps every 4th byte, nulls stay null") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val payload = Array.tabulate[Byte](10)(_.toByte)
    val df = Seq((1L, payload), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = Multimodal.withResizedMedia(df, "payload")
      .select("doc_id", "media_resized").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(out(1L).toSeq === Seq[Byte](0, 4, 8))
    assert(out(2L) == null)
  }

  /** An in-memory w×h image filled with one ARGB color, encoded with
    * the JDK's own writer (png / bmp). */
  private def encodedImage(w: Int, h: Int, argb: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, argb)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }

  test("withMediaFeatures REALLY decodes PNG/BMP dimensions and channel means; text falls back to the stub") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val png = encodedImage(8, 4, 0xff336699, "png") // solid (51, 102, 153)
    val bmp = encodedImage(3, 5, 0xffff0000, "bmp") // solid red
    val txt = "just text bytes".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, bmp), (3L, txt)).toDF("doc_id", "payload")
    val feats = Multimodal.withMediaFeatures(df, "payload")
      .select("doc_id", "media_features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // [w, h, n_components, meanR, meanG, meanB, meanA, n_pixels]
    assert(feats(1L) === Seq(8f, 4f, 3f, 51f, 102f, 153f, 255f, 32f))
    assert(feats(2L) === Seq(3f, 5f, 3f, 255f, 0f, 0f, 255f, 15f))
    assert(feats(3L) === Multimodal.decodeStub(txt).toSeq,
      "non-image binary must take the deterministic stub path")
  }

  /** An in-memory WAV: `nFrames` of a 440 Hz sine at `sr` Hz, mono
    * 16-bit PCM, written by the JDK's own writer. */
  private def encodedWav(sr: Float, nFrames: Int): Array[Byte] = {
    val data = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val v = (math.sin(2 * math.Pi * 440 * i / sr) * 16384).toShort
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      sr, 16, 1, 2, sr, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("withMediaFeatures REALLY decodes WAV rate/frames/rms; image and text paths unaffected") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val wav = encodedWav(8000f, 800) // 0.1 s of 440 Hz sine
    val png = encodedImage(8, 4, 0xff336699, "png")
    val txt = "just text bytes".getBytes("UTF-8")
    val df = Seq((1L, wav), (2L, png), (3L, txt)).toDF("doc_id", "payload")
    val feats = Multimodal.withMediaFeatures(df, "payload")
      .select("doc_id", "media_features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // [sample_rate, channels, n_frames, duration_sec, mean_abs, rms, peak, zcr]
    val a = feats(1L)
    assert(a(0) === 8000f && a(1) === 1f && a(2) === 800f)
    assert(math.abs(a(3) - 0.1f) < 1e-6, s"duration: ${a(3)}")
    // a full-cycle sine at amplitude 0.5: rms = 0.5/√2 ≈ 0.3536
    assert(math.abs(a(5) - 0.3536f) < 0.005, s"rms: ${a(5)}")
    assert(a(6) <= 0.5f + 1e-3 && a(6) > 0.45f, s"peak: ${a(6)}")
    // 440 Hz over 0.1 s crosses zero ~88 times → zcr ≈ 88/800
    assert(math.abs(a(7) - 0.11f) < 0.01, s"zcr: ${a(7)}")
    assert(feats(2L) === Seq(8f, 4f, 3f, 51f, 102f, 153f, 255f, 32f),
      "image path must be unaffected by the audio sniff")
    assert(feats(3L) === Multimodal.decodeStub(txt).toSeq,
      "non-media binary must still take the deterministic stub path")
    // and the decoder itself agrees with the plan output
    assert(Multimodal.decodeAudio(wav).get.toSeq === a)
  }

  test("withResizedMedia REALLY rescales a decodable image and re-encodes it") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val png = encodedImage(8, 4, 0xff336699, "png")
    val txt = Array.tabulate[Byte](10)(_.toByte)
    val df = Seq((1L, png), (2L, txt)).toDF("doc_id", "payload")
    val out = Multimodal.withResizedMedia(df, "payload", factor = 2)
      .select("doc_id", "media_resized").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L)))
    assert(back != null, "resized payload must itself be a decodable image")
    assert((back.getWidth, back.getHeight) === ((4, 2)))
    // a solid-color image stays that color through any interpolation
    assert(back.getRGB(0, 0) === 0xff336699)
    assert(out(2L).toSeq === Seq[Byte](0, 2, 4, 6, 8),
      "non-image binary must take the stub resize path")
  }

  test("mediaMeta chunk math matches the chunk size contract") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val df = Seq((1L, Array.fill[Byte](300)(7)), (2L, Array.fill[Byte](256)(7)))
      .toDF("doc_id", "payload")
    val m = Multimodal.mediaMeta(df, "payload")
      .select("doc_id", "byte_len", "n_chunks").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m(1L) === ((300L, 2L)))
    assert(m(2L) === ((256L, 1L)))
  }

  // --- generated container headers for the video metadata probe ---

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32(v: Long): Array[Byte] = be32(v).reverse
  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ payload

  /** Minimal well-formed MP4: ftyp + moov{mvhd v0, trak{tkhd v0}} + mdat.
    * timescale 600, duration 3000 → 5 s; track 640×480 fixed-16.16. */
  private def miniMp4(): Array[Byte] = {
    val mvhd = new Array[Byte](100)
    be32(600L).copyToArray(mvhd, 12)  // timescale
    be32(3000L).copyToArray(mvhd, 16) // duration
    val tkhd = new Array[Byte](84)
    be32(640L << 16).copyToArray(tkhd, 76) // width, fixed 16.16
    be32(480L << 16).copyToArray(tkhd, 80) // height
    box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(0)) ++
      box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd))) ++
      box("mdat", Array.fill[Byte](32)(9))
  }

  /** Minimal RIFF/AVI: avih with 40000 µs/frame × 250 frames → 10 s,
    * 2 streams, 320×240. */
  private def miniAvi(): Array[Byte] = {
    val avih = new Array[Byte](56)
    le32(40000L).copyToArray(avih, 0)  // dwMicroSecPerFrame
    le32(250L).copyToArray(avih, 16)   // dwTotalFrames
    le32(2L).copyToArray(avih, 24)     // dwStreams
    le32(320L).copyToArray(avih, 32)   // dwWidth
    le32(240L).copyToArray(avih, 36)   // dwHeight
    val hdrl = "hdrl".getBytes("ISO-8859-1") ++
      "avih".getBytes("ISO-8859-1") ++ le32(56L) ++ avih
    "RIFF".getBytes("ISO-8859-1") ++ le32(4L + 8 + hdrl.length) ++
      "AVI ".getBytes("ISO-8859-1") ++
      "LIST".getBytes("ISO-8859-1") ++ le32(hdrl.length.toLong) ++ hdrl
  }

  test("probeVideoMeta parses generated MP4 and AVI headers; foreign bytes return None") {
    val mp4 = Multimodal.probeVideoMeta(miniMp4())
    assert(mp4 === Some(Multimodal.VideoMeta("mp4", 5.0, 640, 480, 1)))
    val avi = Multimodal.probeVideoMeta(miniAvi())
    assert(avi === Some(Multimodal.VideoMeta("avi", 10.0, 320, 240, 2)))
    // reject-foreign-bytes contract: text, truncation, image bytes
    assert(Multimodal.probeVideoMeta("not a container at all".getBytes) === None)
    assert(Multimodal.probeVideoMeta(miniMp4().take(10)) === None)
    assert(Multimodal.probeVideoMeta(encodedImage(4, 4, 0xff000000, "png")) === None)
    assert(Multimodal.probeVideoMeta(null) === None)
  }

  test("withVideoMeta appends probe fields per partition; non-video rows stay null") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val df = Seq(
      (1L, miniMp4()), (2L, miniAvi()),
      (3L, "just text".getBytes)).toDF("doc_id", "payload")
    val out = Multimodal.withVideoMeta(df, "payload")
      .select("doc_id", "container", "duration_sec", "width", "height", "n_tracks")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) === "mp4")
    assert(out(1L).getDouble(2) === 5.0)
    assert((out(1L).getInt(3), out(1L).getInt(4), out(1L).getInt(5)) === ((640, 480, 1)))
    assert(out(2L).getString(1) === "avi")
    assert(out(2L).getDouble(2) === 10.0)
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(2) && out(3L).isNullAt(5),
      "non-video payloads must carry null metadata")
  }

  test("solid-gray quality-1.0 JPEG round-trips EXACTLY (the q122 oracle premise)") {
    for (w <- Seq(16, 24, 17); h <- Seq(16, 9); v <- Seq(0, 1, 31, 128, 250, 255)) {
      val jpeg = Multimodal.encodeSolidGrayJpeg(w, h, v)
      val f = Multimodal.decodeImage(jpeg).get
      assert(f(0) == w.toFloat && f(1) == h.toFloat, s"dims $w x $h")
      assert(f(3) == v.toFloat && f(4) == v.toFloat && f(5) == v.toFloat,
        s"w=$w h=$h gray=$v decoded (${f(3)}, ${f(4)}, ${f(5)})")
    }
  }

  test("MJPEG/AVI round-trip: build → probe → extract → decode recovers every frame") {
    val frames = (0 until 7).map(i => Multimodal.encodeSolidGrayJpeg(32, 16, 20 * i))
    val avi = Multimodal.buildMjpegAvi(frames, 32, 16, usPerFrame = 40000)
    val meta = Multimodal.probeVideoMeta(avi)
    assert(meta === Some(Multimodal.VideoMeta("avi", 7 * 0.04, 32, 16, 1)))
    val back = Multimodal.extractAviFrames(avi)
    assert(back.length == 7)
    back.zipWithIndex.foreach { case (fb, i) =>
      assert(java.util.Arrays.equals(fb, frames(i)), s"frame $i bytes differ")
      val f = Multimodal.decodeImage(fb).get
      assert(f(3) == (20 * i).toFloat, s"frame $i gray")
    }
    // reject-foreign-bytes contract
    assert(Multimodal.extractAviFrames("plain text".getBytes).isEmpty)
    assert(Multimodal.extractAviFrames(avi.take(30)).isEmpty)
    assert(Multimodal.extractAviFrames(null).isEmpty)
    // odd-sized frame exercises the even-padding rule
    val odd = frames.map(f => if (f.length % 2 == 0) f :+ 0xd9.toByte else f)
    val avi2 = Multimodal.buildMjpegAvi(odd, 32, 16)
    Multimodal.extractAviFrames(avi2).zip(odd).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "padded chunk body must round-trip")
    }
  }

  test("withVideoFrames decodes per-frame features through the real pipeline") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val aviA = Multimodal.buildMjpegAvi(
      (0 until 3).map(i => Multimodal.encodeSolidGrayJpeg(24, 16, 50 + i)), 24, 16)
    val df = Seq((1L, aviA), (2L, "not video".getBytes)).toDF("doc_id", "payload")
    val out = Multimodal.withVideoFrames(df, "payload")
      .select(col("doc_id"), col("frame_idx"),
        element_at(col("frame_features"), 4).as("mean_r"))
      .collect()
    assert(out.length == 3, "non-AVI rows contribute no frames")
    out.foreach { r =>
      assert(r.getLong(0) == 1L)
      assert(r.getFloat(2) == (50 + r.getInt(1)).toFloat)
    }
  }

  test("q195 aHash: scale- and re-encode-invariant, pattern-injective") {
    // the invariance contract: one pattern, three scales, one hash
    (0L until graft.multimodal.Multimodal.ImgPatterns).foreach { pid =>
      val hs = (1 to 3).map(s => graft.multimodal.Multimodal
        .aHash(graft.multimodal.Multimodal.encodePatternPng(pid, s)))
      assert(hs.forall(_.isDefined), s"pattern $pid failed to hash")
      assert(hs.distinct.size == 1, s"pattern $pid not scale-invariant")
    }
    // injectivity across the generator's pattern space (what lets the
    // oracle predict clusters from arithmetic alone)
    val all = (0L until graft.multimodal.Multimodal.ImgPatterns).map(pid =>
      graft.multimodal.Multimodal.aHash(
        graft.multimodal.Multimodal.encodePatternPng(pid, 1)).get)
    assert(all.distinct.size == all.size, "aHash collision across patterns")
    // non-multiple-of-grid sizes are refused, junk bytes are refused
    assert(graft.multimodal.Multimodal.aHash(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("q195 clusters: every pattern's docs collapse to one row (sf0.001)") {
    val spark = SparkSpec.spark
    val rows = graft.multimodal.Multimodal
      .imagePhashDedup(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[Long]("rep_doc_id"), r.getAs[Long]("n_members"),
        r.getAs[Long]("n_scales")))
    val n = graft.multimodal.Multimodal.ImgPatterns
    assert(rows.length.toLong == n)
    assert(rows.map(_._2).sum == graft.multimodal.Multimodal.ImgDocs)
    // reps are the first occurrence of each pattern: exactly 0..16
    assert(rows.map(_._1).sorted.toSeq == (0L until n))
    // 120 docs over 17 patterns and 3 scales: every cluster spans >1 scale
    assert(rows.forall(_._3 >= 2))
  }

  test("q196 audio fingerprint: stretch-invariant, pattern-injective, junk-safe") {
    val M = graft.multimodal.Multimodal
    (0L until M.AudPatterns).foreach { pid =>
      val hs = (1 to 3).map(s => M.audioFingerprint(M.encodePatternWav(pid, s)))
      assert(hs.forall(_.isDefined), s"pattern $pid failed to fingerprint")
      assert(hs.distinct.size == 1, s"pattern $pid not stretch-invariant")
    }
    val all = (0L until M.AudPatterns).map(pid =>
      M.audioFingerprint(M.encodePatternWav(pid, 1)).get)
    assert(all.distinct.size == all.size, "fingerprint collision across patterns")
    assert(M.audioFingerprint(Array[Byte](9, 9, 9)).isEmpty)
  }

  test("q196 clusters: every audio pattern collapses to one row (sf0.001)") {
    val spark = SparkSpec.spark
    val M = graft.multimodal.Multimodal
    val rows = M.audioFingerprintDedup(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[Long]("rep_doc_id"), r.getAs[Long]("n_members"),
        r.getAs[Long]("n_stretches")))
    assert(rows.length.toLong == M.AudPatterns)
    assert(rows.map(_._2).sum == M.AudDocs)
    assert(rows.map(_._1).sorted.toSeq == (0L until M.AudPatterns))
    assert(rows.forall(_._3 >= 2))
  }

  test("q202 VAD: segments come from the DECODED samples and tile the active set") {
    val M = graft.multimodal.Multimodal
    // segmentation equals the generator's island structure at every stretch
    (0L until M.AudPatterns).foreach { pid =>
      val truth = {
        val act = (0 until M.AudWindows).map(w => M.vadActive(pid, w))
        val segs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        var w = 0
        while (w < M.AudWindows) {
          if (act(w)) { val s = w; while (w < M.AudWindows && act(w)) w += 1
            segs += ((s, w - 1)) } else w += 1
        }
        segs.toSeq
      }
      (1 to 3).foreach { st =>
        assert(M.vadSegments(M.encodeVadWav(pid, st)) === Some(truth),
          s"pattern $pid stretch $st")
      }
    }
    // the operator reads the AUDIO, not the arithmetic: all-silence and
    // all-active payloads segment by their samples alone
    assert(M.vadSegments(M.encodeWindowsWav(1, _ => 0)) === Some(Seq.empty))
    assert(M.vadSegments(M.encodeWindowsWav(1, _ => 2000)) ===
      Some(Seq((0, M.AudWindows - 1))))
    assert(M.vadSegments(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("q202 VAD segments: registered query matches per-doc replay (sf0.001)") {
    val spark = SparkSpec.spark
    val M = graft.multimodal.Multimodal
    val rows = M.vadSegmentation(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("seg_idx")) ->
        ((r.getAs[Long]("start_ms"), r.getAs[Long]("end_ms"),
          r.getAs[Long]("n_windows"))))
    val byDoc = rows.groupBy(_._1._1)
    byDoc.foreach { case (id, segs) =>
      val st = 1 + id % 3
      val truth = M.vadSegments(M.encodeVadWav(id % M.AudPatterns, st.toInt)).get
      assert(segs.length == truth.length, s"doc $id")
      val segMap = segs.toMap
      truth.zipWithIndex.foreach { case ((a, b), i) =>
        assert(segMap((id, i.toLong)) ===
          ((a * 2 * st, (b + 1) * 2 * st, (b - a + 1).toLong)), s"doc $id seg $i")
      }
    }
    // all-silent patterns (pid+3 ≡ 0 mod 7) contribute ZERO rows
    val silentPids = (0L until M.AudPatterns).filter(p => (p + 3) % 7 == 0)
    assert(silentPids.nonEmpty)
    assert(byDoc.keySet.forall(id => !silentPids.contains(id % M.AudPatterns)))
  }

  test("q197 shot boundaries: cuts are exactly the modular wraps of the generator") {
    val spark = SparkSpec.spark
    val M = graft.multimodal.Multimodal
    val rows = M.shotBoundaries(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_frames"), r.getAs[Long]("n_cuts"),
          r.getAs[Int]("max_jump")))).toMap
    (0L until M.VideoDocs).foreach { id =>
      val n = (4 + id % 5).toInt
      val grays = (0 until n).map(i => M.grayOf(id, i))
      val jumps = grays.sliding(2).map { case Seq(a, b) => math.abs(b - a) }.toSeq
      val expect = (n.toLong, jumps.count(_ > M.CutThr).toLong,
        if (jumps.isEmpty) 0 else jumps.max)
      assert(rows(id) === expect, s"video $id")
    }
    // the fixture must exercise both classes: videos with and without cuts
    assert(rows.values.exists(_._2 > 0) && rows.values.exists(_._2 == 0))
  }
}
