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

  test("featureSummary: stable rows-only surface (x05)") {
    val out = Multimodal.featureSummary(spark, media).collect()
    assert(out.length == sfDocs.count())
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("l1_mass") - 1.0) < 1e-3)
      val b = r.getAs[Int]("top_bucket")
      assert(b >= 0 && b < 16)
    }
  }
}
