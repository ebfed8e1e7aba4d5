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
  * The actual codecs are STUBBED: this environment has no image/audio
  * libraries, so `StubCodec` below is a deterministic fake standing in
  * for (e.g.) javax.imageio / ffmpeg bindings. Every stub is marked; the
  * operator signatures, schemas and batch shapes are what a real codec
  * would plug into unchanged.
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
    * batch shape), decoding each record through the (stubbed) codec.
    * Pure map side — no shuffle; scales with partition count. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      dim: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        MediaFeatures(r.doc_id, r.width, r.height,
          StubCodec.features(r.content, dim))
      }
    }
  }

  /** Resize: per-partition batch transform keeping the MediaRecord
    * schema (so resize → decode → extract compose). */
  def resize(spark: SparkSession, media: DataFrame, w: Int,
      h: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map(StubCodec.resize(_, w, h)))
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
