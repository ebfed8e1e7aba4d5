package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media as opaque BINARY columns + typed metadata, with
  * decode / feature-extract / resize / frame-sample operators.
  *
  * Spark-side plumbing is real: explicit schemas, typed Datasets, and
  * per-partition batch processing via mapPartitions (the JVM analogue of
  * mapInPandas — one iterator pass per partition, nothing materialized,
  * embarrassingly parallel over partitions at 100 TB; partitioning and
  * column pruning behave exactly as for any other binary column).
  *
  * Codecs: IMAGE payloads (`format` starting "image/") decode FOR REAL
  * through the JDK's javax.imageio (`ImageIoCodec` — PNG/BMP/GIF/JPEG,
  * no external dependency): luminance-histogram features over actual
  * pixels, true decoded dimensions, real resampling + PNG re-encode.
  * AUDIO payloads (`format` starting "audio/") decode FOR REAL through
  * javax.sound.sampled (`AudioCodec` — WAV/AIFF PCM plus whatever the
  * JDK converter chain reaches): amplitude-histogram features,
  * sample-rate/duration/RMS summaries over actual samples. MOTION-JPEG
  * video decodes FOR REAL (`MjpegCodec` — SOI/EOI marker-scan container
  * parse + per-frame javax.imageio): frame counts, dimensions and luma
  * statistics over actual decoded pixels. ANIMATED GIF decodes FOR REAL
  * too (`GifCodec` — the JDK GIF reader's per-frame index; stills are
  * the 1-frame case). Only no-JDK-codec video (MP4/H.264-class) and
  * non-media payloads still go through the deterministic `StubCodec`
  * fake (no ffmpeg in this environment); the stub boundary is marked,
  * and the operator signatures, schemas and batch shapes are shared by
  * all paths.
  */
object Multimodal {

  /** Media record: opaque bytes + typed metadata (the schema a real
    * ingest would carry: format tag, byte size, declared dimensions). */
  case class MediaRecord(doc_id: Long, content: Array[Byte], format: String,
      n_bytes: Long, width: Int, height: Int)

  /** Decoded media features: fixed-dim vector + effective dimensions. */
  case class MediaFeatures(doc_id: Long, width: Int, height: Int,
      features: Array[Float])

  /** One sampled frame (video stand-in): evenly-spaced binary chunk. */
  case class MediaFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  // ------------------------------------------------------------ real codec

  /** REAL image codec over the JDK's javax.imageio — decodes PNG, BMP,
    * GIF and JPEG bytes with no external dependency. Used for records
    * whose `format` declares an image MIME type; everything else falls
    * back to StubCodec (format-gated so text/audio payloads never pay
    * the ImageIO reader-registry probe per row). All methods are
    * executor-side pure functions over the record's own bytes —
    * map-side, no shared state, safe under any partitioning. */
  object ImageIoCodec {
    def isImage(format: String): Boolean =
      format != null && format.startsWith("image/")

    /** None when the bytes are not a decodable image (corrupt row —
      * callers degrade to the stub rather than failing the partition,
      * the same per-item error isolation the JSON ingest applies).
      *
      * The stream is wrapped in a MemoryCacheImageInputStream
      * EXPLICITLY: `ImageIO.read(InputStream)` defaults to a
      * FileCacheImageInputStream, i.e. one temp FILE created and
      * deleted in java.io.tmpdir per decode — at 32 concurrent tasks
      * × 3 frames × every document that is ~200k tmpfs syscalls per
      * sf0.1 pass, a fixed cost that scales with filesystem load,
      * not data (the bytes are ALREADY in memory; disk spooling buys
      * nothing). The in-memory wrapper cut x27's interleaved median
      * ~3× on a loaded box. */
    def decode(content: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try {
        // no explicit close: ImageIO.read(ImageInputStream) closes the
        // stream itself, and a second close() throws on the JDK impl
        Option(javax.imageio.ImageIO.read(
          new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(content))))
      } catch { case _: java.io.IOException => None }

    /** Luminance histogram over REAL pixels, folded to `dim` buckets and
      * L1-normalized — same output contract as StubCodec.features (sums
      * to ~1), computed from decoded image content: bucket =
      * luma·dim/256 with ITU-R BT.601 integer luma (r·299+g·587+b·114)/1000. */
    def features(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
      val counts = new Array[Int](dim)
      val w = img.getWidth
      val h = img.getHeight
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          val luma = (r * 299 + g * 587 + b * 114) / 1000
          counts(luma * dim / 256) += 1
          x += 1
        }
        y += 1
      }
      val total = math.max(1, w * h).toFloat
      counts.map(_ / total)
    }

    /** Real resample to w×h (Java2D bilinear) re-encoded as PNG —
      * lossless, so resize → decode → extract composes exactly. */
    def resize(r: MediaRecord, img: java.awt.image.BufferedImage, w: Int,
        h: Int): MediaRecord = {
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      // in-memory output stream for the same reason decode() wraps its
      // input: ImageIO's OutputStream overload spools through a temp
      // FILE per call by default
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try javax.imageio.ImageIO.write(out, "png", ios)
      finally ios.close() // flushes the cache into bos
      val bytes = bos.toByteArray
      r.copy(content = bytes, format = "image/png",
        n_bytes = bytes.length.toLong, width = w, height = h)
    }
  }

  /** REAL audio codec over the JDK's javax.sound.sampled — decodes WAV
    * and AIFF (PCM, plus anything the JDK's format converters can reach,
    * e.g. A-law/µ-law) with no external dependency. Format-gated the
    * same way as ImageIoCodec: only records whose format starts with
    * "audio/" pay the decode probe. Executor-side pure functions —
    * map-side, no shared state. */
  object AudioCodec {
    def isAudio(format: String): Boolean =
      format != null && format.startsWith("audio/")

    /** Decoded audio: true sample rate / channel count / frame count
      * from the container header, samples mono-folded to [-1, 1]. */
    final case class DecodedAudio(sampleRate: Float, channels: Int,
        frames: Long, samples: Array[Double])

    /** None when the bytes are not decodable audio — callers degrade
      * to the stub, the same per-item error isolation as images. */
    def decode(content: Array[Byte]): Option[DecodedAudio] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        try {
          val fmt = in.getFormat
          // normalize through the JDK converter to 16-bit signed
          // little-endian PCM so 8-bit/unsigned/companded encodings
          // all land on one sample-extraction path
          val target = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            fmt.getSampleRate, 16, fmt.getChannels,
            fmt.getChannels * 2, fmt.getSampleRate, false)
          val pcm = javax.sound.sampled.AudioSystem
            .getAudioInputStream(target, in)
          try {
            val bytes = pcm.readAllBytes()
            val ch = math.max(1, target.getChannels)
            val nFrames = bytes.length / (2 * ch)
            val mono = new Array[Double](nFrames)
            var f = 0
            while (f < nFrames) {
              var s = 0.0
              var c = 0
              while (c < ch) {
                val idx = (f * ch + c) * 2
                val lo = bytes(idx) & 0xff
                val hi = bytes(idx + 1) // little-endian, signed high byte
                s += ((hi << 8) | lo) / 32768.0
                c += 1
              }
              mono(f) = s / ch
              f += 1
            }
            Some(DecodedAudio(target.getSampleRate, ch, nFrames.toLong, mono))
          } finally pcm.close()
        } finally in.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
        case _: IllegalArgumentException => None // no converter chain
      }

    def durationSec(a: DecodedAudio): Double =
      if (a.sampleRate <= 0) 0.0 else a.frames / a.sampleRate.toDouble

    /** Root-mean-square amplitude of the mono-folded signal in [0, 1]. */
    def rms(a: DecodedAudio): Double =
      if (a.samples.isEmpty) 0.0
      else {
        var acc = 0.0
        var i = 0
        while (i < a.samples.length) {
          acc += a.samples(i) * a.samples(i)
          i += 1
        }
        math.sqrt(acc / a.samples.length)
      }

    /** Amplitude histogram over REAL samples: [-1, 1] folded to `dim`
      * buckets, L1-normalized — the same output contract as the image
      * luma histogram (sums to ~1). */
    def features(a: DecodedAudio, dim: Int): Array[Float] = {
      val counts = new Array[Int](dim)
      var i = 0
      while (i < a.samples.length) {
        val v = (a.samples(i) + 1.0) / 2.0
        counts(math.min(dim - 1, math.max(0, (v * dim).toInt))) += 1
        i += 1
      }
      val total = math.max(1, a.samples.length).toFloat
      counts.map(_ / total)
    }
  }

  /** REAL video codec for MOTION-JPEG streams — the one video container
    * decodable with zero external dependencies, because MJPEG is
    * literally concatenated JPEG frames: the container parse is a
    * byte-level SOI/EOI (FFD8/FFD9) marker scan, and each frame decodes
    * through the same javax.imageio path as still images. Marker
    * scanning is sound for baseline JPEG: inside entropy-coded data
    * every 0xFF is stuffed with 0x00 or a RST marker (D0–D7), so
    * SOI/EOI bytes can only be the real frame boundaries. Other video
    * formats (no JDK codec exists) still fall to StubCodec — the stub
    * boundary now covers only those. */
  object MjpegCodec {
    def isMjpeg(format: String): Boolean =
      format != null &&
        (format == "video/x-motion-jpeg" || format == "video/mjpeg")

    /** Split a concatenated-JPEG stream into per-frame byte ranges. */
    def splitFrames(content: Array[Byte]): Seq[Array[Byte]] = {
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var i = 0
      var start = -1
      while (i < content.length - 1) {
        val m = ((content(i) & 0xff) << 8) | (content(i + 1) & 0xff)
        if (m == 0xffd8 && start < 0) { start = i; i += 2 }
        else if (m == 0xffd9 && start >= 0) {
          frames += java.util.Arrays.copyOfRange(content, start, i + 2)
          start = -1
          i += 2
        } else i += 1
      }
      frames.toSeq
    }
  }

  /** REAL multi-frame codec for GIF — the other video-adjacent format
    * the JDK decodes natively: javax.imageio's GIF reader exposes every
    * frame of an animated GIF via `reader.read(i)` (plain stills are
    * the 1-frame case). Frame count comes from `getNumImages(true)` —
    * an exact container scan, the authoritative equivalent of the
    * MJPEG marker scan. Per-frame decode errors skip the frame (the
    * same per-item isolation as every other codec); a payload that is
    * not GIF at all yields zero frames and callers degrade/drop per
    * their contract. After this, the stub boundary covers only true
    * no-JDK-codec formats (MP4/H.264-class). */
  object GifCodec {
    def isGif(format: String): Boolean = format == "image/gif"

    /** (container frame count, decoded frames) — decoded may be
      * shorter than the count when individual frames are corrupt. */
    def decodeFrames(content: Array[Byte])
        : (Int, Seq[java.awt.image.BufferedImage]) = {
      val readers =
        javax.imageio.ImageIO.getImageReadersByFormatName("gif")
      if (!readers.hasNext) return (0, Seq.empty)
      val reader = readers.next()
      // in-memory stream, same rationale as ImageIoCodec.decode
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        // seekForwardOnly=false: getNumImages(true) needs random access
        reader.setInput(iis, false, true)
        // NonFatal, not just IOException: the JDK GIF plugin throws
        // unchecked exceptions (ArrayIndexOutOfBounds, IllegalArgument)
        // on malformed/truncated payloads, and one bad record must not
        // fail the whole task — per-item isolation is the contract.
        val n =
          try reader.getNumImages(true)
          catch { case scala.util.control.NonFatal(_) => 0 }
        val frames = (0 until n).flatMap { i =>
          try Option(reader.read(i))
          catch { case scala.util.control.NonFatal(_) => None }
        }
        (n, frames)
      } catch {
        case scala.util.control.NonFatal(_) => (0, Seq.empty)
      } finally {
        reader.dispose()
        try iis.close() catch { case _: java.io.IOException => () }
      }
    }
  }

  // ------------------------------------------------------------ STUB codec

  /** ======================= STUB BOUNDARY =======================
    * Deterministic fake decoder. A real implementation would decode
    * image/audio bytes here (javax.imageio, libsndfile, ffmpeg). The
    * fake derives everything from the bytes themselves so results are
    * reproducible across partitionings and runs. */
  object StubCodec {
    /** "Decode" = byte-value histogram folded to `dim` buckets, L1-
      * normalized — a stand-in for a pixel/spectral feature extractor. */
    def features(content: Array[Byte], dim: Int): Array[Float] = {
      val counts = new Array[Int](dim)
      var i = 0
      while (i < content.length) {
        counts((content(i) & 0xff) % dim) += 1
        i += 1
      }
      val total = math.max(1, content.length).toFloat
      counts.map(_ / total)
    }

    /** "Resize" = deterministic re-dimension of the metadata plus a
      * content re-hash standing in for resampled pixels. */
    def resize(r: MediaRecord, w: Int, h: Int): MediaRecord = {
      val scaled = java.util.Arrays.copyOf(r.content,
        math.max(1, math.min(r.content.length, w * h)))
      r.copy(content = scaled, n_bytes = scaled.length.toLong,
        width = w, height = h)
    }
  }
  // ===================== END STUB BOUNDARY =====================

  /** Derive a media table from the harness documents table: UTF-8 bytes
    * as the opaque payload + synthetic-but-deterministic metadata. (The
    * harness ships no binary fixtures; deriving from given testdata keeps
    * the pipeline reproducible.) */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("content"),
      lit("text/utf-8").as("format"),
      length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
      (pmod(col("doc_id"), lit(4)) * 160 + 320).cast("int").as("width"),
      (pmod(col("doc_id"), lit(3)) * 120 + 240).cast("int").as("height"))

  /** Feature extraction: one iterator pass per partition (mapInPandas
    * batch shape). Image records decode through the REAL ImageIoCodec —
    * features over actual pixels, dimensions from the decoded image
    * (authoritative over declared metadata); everything else (and any
    * corrupt image row) degrades to the stub. Pure map side — no
    * shuffle; scales with partition count. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      dim: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val imageFeats =
          // GIFs route to the multi-frame branch below (an animated
          // GIF's features must cover every frame, not just frame 0;
          // the 1-frame still case gives the identical histogram)
          if (ImageIoCodec.isImage(r.format) && !GifCodec.isGif(r.format))
            ImageIoCodec.decode(r.content).map(img =>
              MediaFeatures(r.doc_id, img.getWidth, img.getHeight,
                ImageIoCodec.features(img, dim)))
          else None
        val audioFeats =
          if (imageFeats.isEmpty && AudioCodec.isAudio(r.format))
            AudioCodec.decode(r.content).map(a =>
              // dims carry declared metadata: audio has no pixel grid
              MediaFeatures(r.doc_id, r.width, r.height,
                AudioCodec.features(a, dim)))
          else None
        val videoFeats =
          if (imageFeats.isEmpty && audioFeats.isEmpty &&
              (MjpegCodec.isMjpeg(r.format) || GifCodec.isGif(r.format))) {
            val decoded =
              if (MjpegCodec.isMjpeg(r.format))
                MjpegCodec.splitFrames(r.content)
                  .flatMap(ImageIoCodec.decode)
              else GifCodec.decodeFrames(r.content)._2
            if (decoded.isEmpty) None
            else {
              // mean of the per-frame luma histograms: same contract
              // (L1 mass ≈ 1), dims authoritative from the first frame
              val hists = decoded.map(ImageIoCodec.features(_, dim))
              val avg = Array.tabulate(dim)(i =>
                hists.map(_(i)).sum / hists.length)
              Some(MediaFeatures(r.doc_id, decoded.head.getWidth,
                decoded.head.getHeight, avg))
            }
          } else None
        imageFeats.orElse(audioFeats).orElse(videoFeats).getOrElse(
          MediaFeatures(r.doc_id, r.width, r.height,
            StubCodec.features(r.content, dim)))
      }
    }
  }

  /** Per-record audio summary from REAL decode: header sample rate and
    * channel count, decoded frame count, duration and RMS amplitude.
    * Non-audio and undecodable rows are dropped (the quarantine
    * convention) — pure map-side flatMap, no shuffle. */
  case class AudioSummary(doc_id: Long, sample_rate: Double,
      n_channels: Int, n_frames: Long, duration_sec: Double, rms: Double)

  def audioSummary(spark: SparkSession,
      media: DataFrame): Dataset[AudioSummary] = {
    import spark.implicits._
    media.as[MediaRecord].flatMap { r =>
      if (AudioCodec.isAudio(r.format))
        AudioCodec.decode(r.content).map(a =>
          AudioSummary(r.doc_id, a.sampleRate.toDouble, a.channels,
            a.frames, AudioCodec.durationSec(a), AudioCodec.rms(a)))
      else None
    }
  }

  /** Resize: per-partition batch transform keeping the MediaRecord
    * schema (so resize → decode → extract compose). Image records get a
    * real Java2D resample re-encoded as PNG; others the stub. */
  def resize(spark: SparkSession, media: DataFrame, w: Int,
      h: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map { r =>
      val decoded =
        if (ImageIoCodec.isImage(r.format)) ImageIoCodec.decode(r.content)
        else None
      decoded match {
        case Some(img) => ImageIoCodec.resize(r, img, w, h)
        case None => StubCodec.resize(r, w, h)
      }
    })
  }

  /** Frame sampling (video stand-in): n evenly-spaced fixed-size chunks
    * of the payload, exploded to one row per frame. Real byte slicing —
    * no stub — this is exactly how keyframe bytes would be carved out of
    * a container-less stream. */
  def frameSample(spark: SparkSession, media: DataFrame, n: Int,
      frameBytes: Int = 32): Dataset[MediaFrame] = {
    import spark.implicits._
    media.as[MediaRecord].flatMap { r =>
      val len = r.content.length
      if (len == 0) Iterator.empty
      else (0 until n).iterator.map { i =>
        val start = math.min((len.toLong * i / n).toInt, math.max(0, len - 1))
        val end = math.min(start + frameBytes, len)
        MediaFrame(r.doc_id, i,
          java.util.Arrays.copyOfRange(r.content, start, end))
      }
    }
  }

  /** Derive an MJPEG media table from the documents table: per doc,
    * `nFrames` w×h frames whose pixels are a deterministic function of
    * the doc's own UTF-8 bytes (frame f shifts the byte walk, so
    * frames differ), each REALLY encoded as JPEG via javax.imageio and
    * concatenated into one MJPEG payload. (The harness ships no binary
    * fixtures; synthesizing from given testdata keeps the pipeline
    * reproducible.) Encoding happens executor-side per partition —
    * the same map-side batch shape as every other codec operator. */
  def mjpegFromDocuments(spark: SparkSession, docs: DataFrame,
      nFrames: Int = 3, w: Int = 16, h: Int = 16): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val bos = new java.io.ByteArrayOutputStream()
        var f = 0
        while (f < nFrames) {
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val i = y * w + x
              val v =
                if (bytes.isEmpty) 0
                else bytes(((i * 31) + f * 7) % bytes.length) & 0xff
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          // in-memory image output: the OutputStream overload spools
          // through a temp file per frame (same rationale as decode())
          val ios =
            new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          try javax.imageio.ImageIO.write(img, "jpg", ios)
          finally ios.close()
          f += 1
        }
        val content = bos.toByteArray
        MediaRecord(id, content, "video/x-motion-jpeg",
          content.length.toLong, w, h)
      })
  }

  /** Encode frames as ONE animated GIF via the JDK's sequence writer —
    * executor-side pure function (used by gifFromDocuments and directly
    * by tests building known-pixel goldens).
    *
    * Interlace is DISABLED explicitly: the JDK writer defaults to
    * interlaced GIF output, and the JDK's own interlaced round-trip is
    * broken for small rasters (a 2×2 frame comes back with row 1
    * zeroed — measured on this JDK via a write/read probe). Plain
    * sequential scan order round-trips bit-exactly. */
  def encodeGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(
        javax.imageio.ImageWriteParam.MODE_DISABLED)
      writer.prepareWriteSequence(null)
      frames.foreach { img =>
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), param)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** A 256-gray IndexColorModel: palette index i IS gray level i, so
    * indexed GIF frames round-trip each pixel exactly (TYPE_BYTE_GRAY
    * would re-map through the linear-gray color space — decoded RGB
    * 0x6e6e6e for sample 40 — which makes goldens non-obvious). */
  def grayPalette(): java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate[Byte](256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** Derive an animated-GIF media table from the documents table — the
    * GIF twin of mjpegFromDocuments: per doc, `nFrames` w×h GRAYSCALE
    * frames (indexed through grayPalette(), so every pixel round-trips
    * exactly — no quantization drift in goldens) whose pixels derive
    * from the doc's own UTF-8 bytes, REALLY encoded as one animated
    * GIF through the JDK sequence writer. Same map-side batch shape as
    * every codec operator. */
  def gifFromDocuments(spark: SparkSession, docs: DataFrame,
      nFrames: Int = 3, w: Int = 16, h: Int = 16): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val icm = grayPalette()
        val frames = (0 until nFrames).map { f =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val i = y * w + x
              val v =
                if (bytes.isEmpty) 0
                else bytes(((i * 31) + f * 7) % bytes.length) & 0xff
              raster.setSample(x, y, 0, v)
              x += 1
            }
            y += 1
          }
          img
        }
        val content = encodeGif(frames)
        MediaRecord(id, content, "image/gif", content.length.toLong, w, h)
      })
  }

  /** Per-record MJPEG summary from REAL decode: container frame count,
    * frames that decoded, first-frame dimensions, and the mean decoded
    * luma in [0, 1] across every pixel of every frame. Non-MJPEG rows
    * drop (quarantine convention) — pure map-side flatMap. */
  case class VideoSummary(doc_id: Long, n_frames: Long, n_decoded: Long,
      width: Int, height: Int, mean_luma: Double)

  def videoSummary(spark: SparkSession,
      media: DataFrame): Dataset[VideoSummary] = {
    import spark.implicits._
    media.as[MediaRecord].flatMap { r =>
      // container parse per format: MJPEG by SOI/EOI marker scan,
      // (animated) GIF by the JDK reader's exact frame index — both
      // land in the same per-frame decode + summary fold
      val parsed: Option[(Long, Seq[java.awt.image.BufferedImage])] =
        if (MjpegCodec.isMjpeg(r.format)) {
          val frames = MjpegCodec.splitFrames(r.content)
          Some((frames.length.toLong, frames.flatMap(ImageIoCodec.decode)))
        } else if (GifCodec.isGif(r.format)) {
          val (n, decoded) = GifCodec.decodeFrames(r.content)
          Some((n.toLong, decoded))
        } else None
      parsed.flatMap { case (nFrames, decoded) =>
        if (decoded.isEmpty)
          Some(VideoSummary(r.doc_id, nFrames, 0L, 0, 0, 0.0))
        else {
          var acc = 0.0
          var n = 0L
          decoded.foreach { img =>
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                val lum = (((rgb >> 16) & 0xff) * 299 +
                  ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
                acc += lum / 255.0
                n += 1
                x += 1
              }
              y += 1
            }
          }
          Some(VideoSummary(r.doc_id, nFrames,
            decoded.length.toLong, decoded.head.getWidth,
            decoded.head.getHeight, acc / n))
        }
      }
    }
  }

  /** Per-document media feature summary (the x05 query surface):
    * doc_id, dims, feature L1 mass (≈1 by construction) and the argmax
    * bucket — deterministic, so the rows-only check is stable. */
  def featureSummary(spark: SparkSession, media: DataFrame,
      dim: Int = 16): DataFrame = {
    import spark.implicits._
    extractFeatures(spark, media, dim)
      .map { f =>
        val argmax = f.features.indices.maxBy(i =>
          (f.features(i), -i)) // ties → lowest index
        (f.doc_id, f.width, f.height, f.features.sum.toDouble, argmax)
      }
      .toDF("doc_id", "width", "height", "l1_mass", "top_bucket")
      .orderBy(col("doc_id"))
  }
}
