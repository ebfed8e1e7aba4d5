package graft.operators

import graft.SparkSuite

/** Multimodal plumbing: schema, batch shape, determinism and the real
  * (non-stub) byte mechanics. The codec itself is a deterministic fake —
  * these tests pin down everything a real codec swap must preserve. */
class MultimodalSpec extends SparkSuite {

  private lazy val sfDocs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val media = Multimodal.fromDocuments(sfDocs)

  test("fromDocuments: binary payload round-trips, metadata typed") {
    val r = media.orderBy("doc_id").head
    assert(r.getAs[Array[Byte]]("content").nonEmpty)
    assert(r.getAs[String]("format") == "text/utf-8")
    assert(r.getAs[Long]("n_bytes") ==
      r.getAs[Array[Byte]]("content").length.toLong)
    assert(r.getAs[Int]("width") >= 320 && r.getAs[Int]("height") >= 240)
  }

  test("extractFeatures: fixed dim, L1-normalized, no shuffle needed") {
    val feats = Multimodal.extractFeatures(spark, media, dim = 16).collect()
    assert(feats.length == sfDocs.count())
    feats.foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3f) // histogram mass
    }
  }

  test("feature extraction is deterministic across partitionings") {
    val a = Multimodal.extractFeatures(spark, media.repartition(1), 16)
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    val b = Multimodal.extractFeatures(spark, media.repartition(7), 16)
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    assert(a == b)
  }

  test("resize composes with extract: metadata updated, content bounded") {
    val resized = Multimodal.resize(spark, media, 8, 8)
    val r = resized.filter(_.doc_id == 0L).head()
    assert(r.width == 8 && r.height == 8)
    assert(r.content.length <= 64 && r.n_bytes == r.content.length)
    // pipeline composition: resized media still extracts
    val f = Multimodal.extractFeatures(spark, resized.toDF(), 4).head()
    assert(f.features.length == 4)
  }

  /** A real 2×2 PNG via the same JDK encoder executors use: black,
    * white, red, blue pixels — known BT.601 lumas 0, 255, 76, 29. */
  private def png2x2(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000) // black  → luma 0   → bucket 0 (dim=4)
    img.setRGB(1, 0, 0xFFFFFF) // white  → luma 255 → bucket 3
    img.setRGB(0, 1, 0xFF0000) // red    → luma 76  → bucket 1
    img.setRGB(1, 1, 0x0000FF) // blue   → luma 29  → bucket 0
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real image decode: a 2×2 PNG extracts the exact pixel-luminance " +
      "histogram and decoded dimensions override declared metadata") {
    import spark.implicits._
    val bytes = png2x2()
    // declared 320×240 is WRONG on purpose: the decoded 2×2 must win
    val mediaDf = Seq(
      Multimodal.MediaRecord(1L, bytes, "image/png", bytes.length.toLong,
        320, 240),
      // a text row in the same frame keeps going through the stub
      Multimodal.MediaRecord(2L, "hello".getBytes("UTF-8"), "text/utf-8",
        5L, 320, 240)).toDF()
    val feats = Multimodal.extractFeatures(spark, mediaDf, dim = 4)
      .collect().map(f => f.doc_id -> f).toMap
    val img = feats(1L)
    assert(img.width == 2 && img.height == 2,
      "decoded dimensions must come from the actual image")
    // black+blue → bucket 0, red → bucket 1, white → bucket 3; 4 pixels
    assert(img.features.toSeq == Seq(0.5f, 0.25f, 0.0f, 0.25f),
      s"luminance histogram mismatch: ${img.features.toSeq}")
    val txt = feats(2L)
    assert(txt.width == 320 && txt.height == 240,
      "non-image rows keep the stub path")
    // corrupt image bytes degrade to the stub instead of failing the task
    val corrupt = Seq(Multimodal.MediaRecord(3L,
      Array[Byte](1, 2, 3), "image/png", 3L, 9, 9)).toDF()
    val cf = Multimodal.extractFeatures(spark, corrupt, dim = 4).head()
    assert(cf.width == 9 && math.abs(cf.features.sum - 1.0f) < 1e-3f)
  }

  test("real image resize: 2×2 PNG resampled to 1×1 re-encodes as a " +
      "decodable PNG with true dimensions, and composes with extract") {
    import spark.implicits._
    val bytes = png2x2()
    val mediaDf = Seq(Multimodal.MediaRecord(1L, bytes, "image/png",
      bytes.length.toLong, 2, 2)).toDF()
    val r = Multimodal.resize(spark, mediaDf, 1, 1).head()
    assert(r.width == 1 && r.height == 1 && r.format == "image/png")
    val round = Multimodal.ImageIoCodec.decode(r.content)
    assert(round.exists(i => i.getWidth == 1 && i.getHeight == 1),
      "resized payload must itself be a decodable PNG")
    val f = Multimodal.extractFeatures(spark, Multimodal.resize(
      spark, mediaDf, 1, 1).toDF(), dim = 4).head()
    assert(f.width == 1 && f.height == 1 &&
      math.abs(f.features.sum - 1.0f) < 1e-3f)
  }

  test("frameSample: n evenly-spaced chunks, real byte slicing") {
    val frames = Multimodal.frameSample(spark, media, n = 5, frameBytes = 16)
      .collect()
    assert(frames.length == sfDocs.count() * 5)
    val f0 = frames.filter(_.doc_id == 0L).sortBy(_.frame_idx)
    assert(f0.map(_.frame_idx).toSeq == Seq(0, 1, 2, 3, 4))
    assert(f0.forall(_.frame.length <= 16))
    // frame 0 starts at the payload start
    val content = media.orderBy("doc_id").head.getAs[Array[Byte]]("content")
    assert(f0.head.frame.toSeq == content.take(16).toSeq)
  }

  /** A real WAV via the same JDK encoder executors use: 16-bit mono
    * PCM, 8 kHz, 0.5 s of a 440 Hz sine at amplitude 0.5 — known
    * sample rate 8000, 4000 frames, duration 0.5 s, RMS 0.5/√2. */
  private def sineWav(): Array[Byte] = {
    val sampleRate = 8000f
    val nFrames = 4000
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val v = 0.5 * math.sin(2 * math.Pi * 440.0 * i / sampleRate)
      val s = math.round(v * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      sampleRate, 16, 1, 2, sampleRate, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real audio decode: a planted sine WAV reports its true sample " +
      "rate, duration and RMS; features come from actual samples; " +
      "corrupt audio degrades to the stub") {
    import spark.implicits._
    val bytes = sineWav()
    val mediaDf = Seq(
      Multimodal.MediaRecord(1L, bytes, "audio/wav", bytes.length.toLong,
        0, 0),
      Multimodal.MediaRecord(2L, "hello".getBytes("UTF-8"), "text/utf-8",
        5L, 320, 240)).toDF()
    val s = Multimodal.audioSummary(spark, mediaDf).collect()
    assert(s.length == 1, "non-audio rows are dropped from the summary")
    val a = s.head
    assert(a.doc_id == 1L && a.sample_rate == 8000.0 && a.n_channels == 1)
    assert(a.n_frames == 4000L && math.abs(a.duration_sec - 0.5) < 1e-9)
    // sine RMS = amplitude/√2; 16-bit quantization keeps it within 1e-3
    assert(math.abs(a.rms - 0.5 / math.sqrt(2.0)) < 1e-3,
      s"RMS ${a.rms} != ${0.5 / math.sqrt(2.0)}")
    // extractFeatures routes audio through the REAL codec: a sine's
    // amplitude histogram is edge-heavy (arcsine law) and must differ
    // from the stub's byte-value histogram of the same payload
    val feats = Multimodal.extractFeatures(spark, mediaDf, dim = 4)
      .collect().map(f => f.doc_id -> f).toMap
    val audio = feats(1L).features
    assert(math.abs(audio.sum - 1.0f) < 1e-3f)
    assert(audio.toSeq != Multimodal.StubCodec.features(bytes, 4).toSeq,
      "audio features must come from decoded samples, not raw bytes")
    // amplitude 0.5 never reaches the outermost quarter-buckets' edges:
    // with dim=4, samples in [-0.5, 0.5] land in buckets 0..3 but the
    // arcsine peaks sit just inside buckets 0 and 3's inner edges —
    // symmetric signal → near-symmetric histogram
    assert(math.abs(audio(0) + audio(1) - (audio(2) + audio(3))) < 0.05f,
      s"sine histogram should be symmetric: ${audio.toSeq}")
    // corrupt audio bytes degrade to the stub instead of failing
    val corrupt = Seq(Multimodal.MediaRecord(3L,
      Array[Byte](9, 9, 9), "audio/wav", 3L, 7, 7)).toDF()
    val cf = Multimodal.extractFeatures(spark, corrupt, dim = 4).head()
    assert(cf.width == 7 && math.abs(cf.features.sum - 1.0f) < 1e-3f)
    assert(Multimodal.audioSummary(spark, corrupt).collect().isEmpty)
  }

  test("featureSummary: stable rows-only surface (x05)") {
    val out = Multimodal.featureSummary(spark, media).collect()
    assert(out.length == sfDocs.count())
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("l1_mass") - 1.0) < 1e-3)
      val b = r.getAs[Int]("top_bucket")
      assert(b >= 0 && b < 16)
    }
  }

  private def solidJpeg(gray: Int, w: Int = 8, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      img.setRGB(x, y, (gray << 16) | (gray << 8) | gray)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("MjpegCodec: marker scan recovers exactly the concatenated " +
      "frames and each decodes to its true content") {
    val f1 = solidJpeg(40)
    val f2 = solidJpeg(200)
    val stream = f1 ++ f2
    val frames = Multimodal.MjpegCodec.splitFrames(stream)
    assert(frames.length == 2)
    assert(frames(0).toSeq == f1.toSeq && frames(1).toSeq == f2.toSeq)
    val decoded = frames.flatMap(Multimodal.ImageIoCodec.decode)
    assert(decoded.length == 2)
    // solid-gray JPEG decodes near-exact (lossy but flat content)
    val lum = decoded.map(img => (img.getRGB(3, 3) >> 16) & 0xff)
    assert(math.abs(lum(0) - 40) <= 3 && math.abs(lum(1) - 200) <= 3)
  }

  test("videoSummary + extractFeatures on REAL MJPEG: frame accounting, " +
      "decoded dims, mean luma of known frames") {
    import spark.implicits._
    val stream = solidJpeg(40) ++ solidJpeg(200)
    val df = Seq(Multimodal.MediaRecord(7L, stream, "video/x-motion-jpeg",
      stream.length.toLong, 8, 8)).toDF()
    val s = Multimodal.videoSummary(spark, df).collect().head
    assert(s.doc_id == 7L && s.n_frames == 2L && s.n_decoded == 2L)
    assert(s.width == 8 && s.height == 8)
    assert(math.abs(s.mean_luma - 120.0 / 255.0) < 0.02)
    // the feature path takes the video branch: decoded dims, mass ~1,
    // and the histogram splits between the two frames' luma buckets
    val f = Multimodal.extractFeatures(spark, df, dim = 16).collect().head
    assert(f.width == 8 && f.height == 8)
    assert(math.abs(f.features.sum - 1.0f) < 1e-3f)
    assert(f.features(40 * 16 / 256) > 0.4f &&
      f.features(200 * 16 / 256) > 0.4f)
  }

  test("mjpegFromDocuments: every doc yields a decodable nFrames MJPEG " +
      "payload, deterministic across partitionings (x27 surface)") {
    val m = Multimodal.mjpegFromDocuments(spark, sfDocs.limit(20)).toDF()
    val out = Multimodal.videoSummary(spark, m).collect()
    assert(out.length == 20)
    out.foreach { s =>
      assert(s.n_frames == 3L && s.n_decoded == 3L)
      assert(s.width == 16 && s.height == 16)
      assert(s.mean_luma >= 0.0 && s.mean_luma <= 1.0)
    }
    val a = Multimodal.videoSummary(spark,
        Multimodal.mjpegFromDocuments(spark, sfDocs.limit(20)).toDF()
          .repartition(5))
      .collect().map(s => s.doc_id -> s.mean_luma).toMap
    assert(a == out.map(s => s.doc_id -> s.mean_luma).toMap)
  }

  /** A solid-gray indexed frame over the identity gray palette — GIF
    * preserves indexed pixels EXACTLY (no JPEG loss), so these goldens
    * assert equality, not tolerance. */
  private def grayFrame(gray: Int, w: Int = 2, h: Int = 2) = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED,
      Multimodal.grayPalette())
    (0 until h).foreach(y => (0 until w).foreach(x =>
      img.getRaster.setSample(x, y, 0, gray)))
    img
  }

  test("GifCodec: a REAL 2-frame animated GIF decodes to exactly its " +
      "known frames; videoSummary reports exact frame count and luma") {
    import spark.implicits._
    val bytes = Multimodal.encodeGif(Seq(grayFrame(40), grayFrame(200)))
    val (n, frames) = Multimodal.GifCodec.decodeFrames(bytes)
    assert(n == 2 && frames.length == 2)
    // grayscale GIF round-trips losslessly: every pixel exact
    assert(((frames(0).getRGB(1, 1) >> 16) & 0xff) == 40)
    assert(((frames(1).getRGB(0, 0) >> 16) & 0xff) == 200)
    val df = Seq(Multimodal.MediaRecord(11L, bytes, "image/gif",
      bytes.length.toLong, 2, 2)).toDF()
    val s = Multimodal.videoSummary(spark, df).collect().head
    assert(s.doc_id == 11L && s.n_frames == 2L && s.n_decoded == 2L)
    assert(s.width == 2 && s.height == 2)
    // mean luma is the exact mid-point of the two solid frames
    assert(math.abs(s.mean_luma - 120.0 / 255.0) < 1e-12)
  }

  test("extractFeatures on animated GIF covers EVERY frame (not just " +
      "frame 0) and a 1-frame still matches the plain image path") {
    import spark.implicits._
    val anim = Multimodal.encodeGif(Seq(grayFrame(40), grayFrame(200)))
    val df = Seq(Multimodal.MediaRecord(21L, anim, "image/gif",
      anim.length.toLong, 2, 2)).toDF()
    val f = Multimodal.extractFeatures(spark, df, dim = 16).collect().head
    assert(f.width == 2 && f.height == 2)
    assert(math.abs(f.features.sum - 1.0f) < 1e-3f)
    // both frames' luma buckets get exactly half the mass each — a
    // frame-0-only decode would put everything in bucket 40*16/256
    assert(math.abs(f.features(40 * 16 / 256) - 0.5f) < 1e-6f)
    assert(math.abs(f.features(200 * 16 / 256) - 0.5f) < 1e-6f)
    // a single-frame GIF through the multi-frame branch equals the
    // histogram of its only frame
    val still = Multimodal.encodeGif(Seq(grayFrame(40)))
    val sf = Multimodal.extractFeatures(spark,
      Seq(Multimodal.MediaRecord(22L, still, "image/gif",
        still.length.toLong, 2, 2)).toDF(), dim = 16).collect().head
    assert(sf.features(40 * 16 / 256) == 1.0f)
  }

  test("gifFromDocuments: every doc yields a decodable nFrames animated " +
      "GIF, deterministic across partitionings; corrupt bytes degrade " +
      "to zero-frame rows in videoSummary") {
    val g = Multimodal.gifFromDocuments(spark, sfDocs.limit(12)).toDF()
    val out = Multimodal.videoSummary(spark, g).collect()
    assert(out.length == 12)
    out.foreach { s =>
      assert(s.n_frames == 3L && s.n_decoded == 3L)
      assert(s.width == 16 && s.height == 16)
      assert(s.mean_luma >= 0.0 && s.mean_luma <= 1.0)
    }
    val b = Multimodal.videoSummary(spark,
        Multimodal.gifFromDocuments(spark, sfDocs.limit(12)).toDF()
          .repartition(5))
      .collect().map(s => s.doc_id -> s.mean_luma).toMap
    assert(b == out.map(s => s.doc_id -> s.mean_luma).toMap)
    // corrupt payload: parses to zero frames, summarized not dropped
    import spark.implicits._
    val junk = Array[Byte](1, 2, 3, 4)
    val z = Multimodal.videoSummary(spark,
      Seq(Multimodal.MediaRecord(31L, junk, "image/gif", 4L, 2, 2))
        .toDF()).collect().head
    assert(z.n_frames == 0L && z.n_decoded == 0L && z.mean_luma == 0.0)
  }
}
