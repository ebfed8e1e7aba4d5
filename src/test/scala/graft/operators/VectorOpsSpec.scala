package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.VectorFunctions

/** Vector math goldens + ANN operators over synthetic clustered vectors
  * (where correct answers are known analytically) and the harness
  * embeddings table (shape/consistency checks). */
class VectorOpsSpec extends SparkSuite
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  private def vecDf(rows: Seq[(Long, Seq[Float], Int)]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  /** 3 axis-aligned clusters: label i concentrated on axis i with a small
    * deterministic off-axis component — nearest neighbors are exactly the
    * same-label vectors, so IVF with label centroids is lossless. */
  private lazy val clustered: DataFrame = vecDf(
    (0 until 12).map { i =>
      val label = i % 3
      val base = Array.fill(4)(0.0f)
      base(label) = 1.0f
      base(3) = 0.01f * (i / 3) // symmetry-breaking, keeps cluster order
      (i.toLong, base.toSeq, label)
    })

  private lazy val sfEmb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("native VectorDot is bit-identical to the portable HOF tree " +
      "on harness embeddings") {
    import graft.functions.GraftFunctions
    val a = sfEmb.select(col("vec_id"), col("embedding"))
    val pairs = a.limit(20).crossJoin(
      a.select(col("vec_id").as("v2"), col("embedding").as("e2")).limit(20))
    val diff = pairs.select(
      VectorFunctions.dot(col("embedding"), col("e2")).as("tree"),
      GraftFunctions.vectorDot(col("embedding"), col("e2")).as("native"))
      .filter(col("tree") =!= col("native")) // bitwise: NaN-free data
      .count()
    assert(diff == 0L)
  }

  test("BoundedTopK aggregate == window ranking, ties and partitionings") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.GraftFunctions
    // scores with deliberate ties: tie goes to the smaller id
    val rows = (0L until 100L).map(i => (i % 3, (i % 7).toDouble, i))
    val df = rows.toDF("q_id", "cosine", "n_id")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id"))
    val viaWindow = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("q_id", "n_id", "cosine", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    def viaAgg(parts: Int) = df.repartition(parts)
      .groupBy(col("q_id"))
      .agg(GraftFunctions.topK(col("cosine"), col("n_id"), 5).as("_tk"))
      .select(col("q_id"), posexplode(col("_tk")).as(Seq("_pos", "_e")))
      .select(col("q_id"), col("_e.id").as("n_id"),
        col("_e.score").as("cosine"),
        (col("_pos") + 1).cast("long").as("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(viaAgg(1) == viaWindow)
    assert(viaAgg(13) == viaWindow) // partial-merge path, same result
  }

  test("dot / norm / cosine goldens") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 0.0f, 0.0f)))
      .toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("dot"),
      VectorFunctions.norm(col("a")).as("na"),
      VectorFunctions.cosine(col("a"), col("a")).as("self"),
      VectorFunctions.l2Squared(col("a"), col("b")).as("l2")).head
    assert(r.getAs[Double]("dot") == 2.0)
    assert(r.getAs[Double]("na") == 3.0)
    assert(math.abs(r.getAs[Double]("self") - 1.0) < 1e-15)
    assert(r.getAs[Double]("l2") == 1.0 + 4.0 + 4.0)
  }

  test("cosine on a zero vector is null, not NaN") {
    import spark.implicits._
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
    assert(df.select(VectorFunctions.cosine(col("a"), col("b"))).head.isNullAt(0))
  }

  test("annBruteForce: same-cluster vectors rank first; no self-match; " +
      "k respected") {
    val out = VectorOps.annBruteForce(clustered, Seq(0L, 1L), k = 3).collect()
    assert(out.length == 6)
    val q0 = out.filter(_.getAs[Long]("q_id") == 0L)
    // query 0 has label 0; its cluster-mates are 3, 6, 9
    assert(q0.map(_.getAs[Long]("n_id")).toSet == Set(3L, 6L, 9L))
    assert(q0.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(!out.exists(r => r.getAs[Long]("q_id") == r.getAs[Long]("n_id")))
    // cosine is non-increasing in rank
    q0.sortBy(_.getAs[Long]("rank")).sliding(2).foreach { w =>
      assert(w(0).getAs[Double]("cosine") >= w(1).getAs[Double]("cosine"))
    }
  }

  test("hardNegatives: every mined negative has a different label; " +
      "ties rank by n_id; cluster-mates never appear") {
    val labels = clustered.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val out = VectorOps.hardNegatives(clustered, Seq(0L, 1L, 2L), k = 3)
      .collect()
    assert(out.length == 9)
    out.foreach { r =>
      assert(labels(r.getAs[Long]("n_id")) !=
        labels(r.getAs[Long]("q_id")),
        s"negative shares the query label: $r")
    }
    // query 0 = (1,0,0,0): dot with every other-label vector is exactly
    // 0 (orthogonal axes; its own 4th component is 0), so all negatives
    // tie at cosine 0 and rank resolves by n_id: 1, 2, 4
    val q0 = out.filter(_.getAs[Long]("q_id") == 0L)
      .sortBy(_.getAs[Long]("rank"))
    assert(q0.map(_.getAs[Long]("n_id")).toSeq == Seq(1L, 2L, 4L))
    assert(q0.forall(_.getAs[Double]("cosine") == 0.0))
  }

  test("cosineSimilarityJoin finds exactly the same-cluster pairs") {
    val pairs = VectorOps.cosineSimilarityJoin(clustered, 0.9).collect()
    // 3 clusters x C(4,2)=6 same-cluster pairs = 18; cross-cluster cosines
    // are ~0.0001 and never pass 0.9
    assert(pairs.length == 18)
    assert(pairs.forall { r =>
      r.getAs[Long]("a_id") % 3 == r.getAs[Long]("b_id") % 3
    })
    assert(pairs.forall(r =>
      r.getAs[Long]("a_id") < r.getAs[Long]("b_id")))
  }

  test("cosineLshJoin: precision 1 (subset of exact), full recall on " +
      "tight clusters") {
    // clustered: same-cluster cosines ≈ 0.9999 → every plane agrees →
    // recall ≈ 1 at threshold 0.9
    val exact = VectorOps.cosineSimilarityJoin(clustered, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = VectorOps.cosineLshJoin(clustered, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
    // harness embeddings: verified candidates are always a subset
    val exactSf = VectorOps.cosineSimilarityJoin(sfEmb, 0.35).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshSf = VectorOps.cosineLshJoin(sfEmb, 0.35).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lshSf.subsetOf(exactSf))
  }

  test("HyperplaneBits == per-plane VectorDot sign bits, bit-for-bit") {
    import graft.functions.GraftFunctions
    val bands = 12
    val rows = 3
    val seed = 0x5eedL
    val d = 64 // harness embedding width
    // the formulation HyperplaneBits replaced: one literal-plane dot per bit
    val rnd = new scala.util.Random(seed)
    val planes: Seq[Seq[Float]] =
      Seq.fill(bands * rows)(Seq.fill(d)(rnd.nextGaussian().toFloat))
    val viaDots = array((0 until bands).map { b =>
      (0 until rows).map { r =>
        when(GraftFunctions.vectorDot(col("embedding"),
          typedlit(planes(b * rows + r))) >= 0.0, 1 << r).otherwise(0)
      }.reduce(_ + _)
    }: _*)
    val diff = sfEmb.select(
      GraftFunctions.hyperplaneBits(col("embedding"), bands, rows, seed)
        .as("native"),
      viaDots.as("tree"))
      .filter(col("native") =!= col("tree"))
      .count()
    assert(diff == 0L)
  }

  test("cosineLshJoin plan construction launches no Spark job " +
      "(no plan-time width probe)") {
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val df = VectorOps.cosineLshJoin(sfEmb, 0.35)
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before,
      "building the cosineLshJoin plan must not run a job")
    assert(df.columns.toSeq == Seq("a_id", "b_id", "cosine"))
  }

  test("cosineLshJoin maxBandFreq: duplicate-vector cluster suppressed, " +
      "normal near-dup pair kept") {
    // 20 identical vectors share every band value → 190 pairs uncapped;
    // the axis-1 pair lives in its own band groups and must survive
    val cluster = (10 until 30).map(i =>
      (i.toLong, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0))
    val pair = Seq(
      (1L, Seq(0.0f, 1.0f, 0.0f, 0.01f), 1),
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.02f), 1))
    val emb = vecDf(cluster ++ pair)
    val uncapped = VectorOps.cosineLshJoin(emb, 0.9).count()
    val capped = VectorOps.cosineLshJoin(emb, 0.9, maxBandFreq = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped == 191L, s"expected 190 cluster pairs + 1, got $uncapped")
    assert(capped == Set((1L, 2L)), s"got $capped")
  }

  test("recall floor: cosineLshJoin vs exact cosineSimilarityJoin at " +
      "sf0.01 stays >= 0.9") {
    val emb01 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val exact = VectorOps.cosineSimilarityJoin(emb01, 0.45).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = VectorOps.cosineLshJoin(emb01, 0.45).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh.subsetOf(exact), "precision must stay 1")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall below pinned floor 0.9 " +
      s"(${exact.size - lsh.size} of ${exact.size} pairs missed)")
  }

  test("semDedupPairs: precision 1 (subset of exact with identical " +
      "cosines), multi-probe recall climbs with probes and clears the " +
      "x19 floor at sf0.01; pair mining is an equi-join, never a " +
      "product") {
    val emb01 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val exactDf = VectorOps.cosineSimilarityJoin(emb01, 0.45)
    val exact = exactDf.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(exact.nonEmpty)
    val cents = VectorOps.trainCentroids(emb01)
    def pairsAt(p: Int) =
      VectorOps.semDedupPairs(emb01, 0.45, cents, probes = p).collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val p1 = pairsAt(1)
    val p3 = pairsAt(3)
    // precision 1: every mined pair is an exact pair, cosine identical
    for ((k, v) <- p3) {
      assert(exact.contains(k), s"pair $k not in the exact set")
      assert(math.abs(exact(k) - v) < 1e-12,
        "within-cell cosine must be the exact cosine")
    }
    // multi-assignment recovers boundary pairs single-assignment loses
    assert(p1.keySet.subsetOf(p3.keySet) && p3.size > p1.size,
      s"probes=3 must strictly widen probes=1 (${p1.size} -> ${p3.size})")
    // the x19 configuration (probes=3) clears its recall floor even in
    // this corpus' loose-threshold regime (0.45 — far below the
    // high-similarity setting SemDeDup assumes)
    val recall = p3.size.toDouble / exact.size
    assert(recall >= 0.9, s"probes=3 recall $recall below pinned 0.9 " +
      s"(${exact.size - p3.size} of ${exact.size} pairs missed)")
    // plan shape: candidates come from the bucket equi-join — the only
    // product-shaped node allowed is the single-row codebook broadcast
    val plan = VectorOps.semDedupPairs(emb01, 0.45, cents, probes = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "pair mining must never plan a cartesian product")
    // survivors: semDedup keeps one canonical vector per duplicate
    // cluster plus all unpaired rows — never more than the corpus,
    // never fewer than corpus minus paired rows
    val n = emb01.count()
    val survivors = VectorOps.semDedup(emb01, 0.45, Some(cents),
      probes = 3).count()
    assert(survivors < n && survivors >= n - 2L * exact.size)
  }

  test("labelCentroids: mean per dimension, ordered by position") {
    val c = VectorOps.labelCentroids(clustered).collect()
      .map(r => r.getAs[Long]("centroid_id") ->
        r.getSeq[Float](1)).toMap
    assert(c.keySet == Set(0L, 1L, 2L))
    // label 0 rows have dim0 = 1.0, dim3 in {0, .01, .02, .03} avg .015
    assert(math.abs(c(0L).head - 1.0f) < 1e-6)
    assert(math.abs(c(0L)(3) - 0.015f) < 1e-6)
  }

  test("annIvf with nprobe=1 on lossless clusters == annBruteForce") {
    val brute = VectorOps.annBruteForce(clustered, Seq(0L, 1L, 2L), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("rank")))
    val ivf = VectorOps.annIvf(clustered, Seq(0L, 1L, 2L), 3, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("rank")))
    assert(ivf.toSeq.sorted == brute.toSeq.sorted)
  }

  test("annIvf on harness embeddings: exact within the probed buckets") {
    // IVF self-consistency: its result must equal brute force restricted
    // to the candidate set it probed (here: recompute membership).
    val qIds = Seq(0L, 1L)
    val ivf = VectorOps.annIvf(sfEmb, qIds, k = 5, nprobe = 10).collect()
    // nprobe = all labels -> candidate set = everything -> equals brute
    val brute = VectorOps.annBruteForce(sfEmb, qIds, k = 5).collect()
    assert(ivf.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      brute.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("NearestCentroidIdx: argmax semantics — ties keep first, zero " +
      "vectors rank below any real cosine, empty codebook = -1; " +
      "interpreted eval == plan result") {
    import graft.functions.{GraftFunctions, NearestCentroidIdx}
    import spark.implicits._
    val cvecs = Seq(Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))
    val cnorms = Seq(1.0, 1.0, 1.0)
    val rows = Seq(
      (0L, Seq(2.0f, 0.0f)), // ties with centroids 0 and 1 → FIRST (0)
      (1L, Seq(0.0f, 3.0f)), // nearest = 2
      (2L, Seq(0.0f, 0.0f))  // zero vector: all sims -2.0 → first (0)
    ).toDF("vec_id", "embedding")
    val out = rows.select(col("vec_id"),
      GraftFunctions.nearestCentroidIdx(col("embedding"),
        sqrt(GraftFunctions.vectorDot(col("embedding"), col("embedding"))),
        typedlit(cvecs), typedlit(cnorms)).as("i"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(0L -> 0, 1L -> 2, 2L -> 0))

    // empty codebook → -1 (plan maps to null bucket in ivfAssign)
    val empty = rows.select(GraftFunctions.nearestCentroidIdx(
      col("embedding"), lit(1.0),
      typedlit(Seq.empty[Seq[Float]]), typedlit(Seq.empty[Double]))
      .as("i")).collect().map(_.getInt(0))
    assert(empty.forall(_ == -1))

    // interpreted eval matches the codegen path driven above
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val direct = NearestCentroidIdx.compute(
      new GenericArrayData(Array(2.0f, 0.0f)), 2.0,
      new GenericArrayData(cvecs.map(v =>
        new GenericArrayData(v.toArray): Any).toArray),
      new GenericArrayData(cnorms.toArray))
    assert(direct == 0)
  }

  /** Mean cosine of every vector to its assigned centroid — the
    * spherical k-means objective a Lloyd step must not decrease. */
  private def meanAssignedCos(emb: DataFrame, cents: DataFrame): Double = {
    val assigned = VectorOps.ivfAssign(emb, cents)
    val c = cents.select(col("centroid_id").as("bucket"),
      col("centroid"))
    assigned.join(c, "bucket")
      .select(graft.functions.GraftFunctions
        .vectorDot(col("embedding"), col("centroid"))
        ./(col("emb_norm") * sqrt(graft.functions.GraftFunctions
          .vectorDot(col("centroid"), col("centroid"))))
        .as("cos"))
      .agg(avg(col("cos"))).head.getDouble(0)
  }

  test("kmeansStep: objective is monotone, codebook never grows, and " +
      "lossless clusters are a fixpoint") {
    // On the lossless clustered fixture, label centroids are already
    // optimal: a step must reproduce the same assignment structure.
    val c0 = VectorOps.labelCentroids(clustered)
    val c1 = VectorOps.kmeansStep(clustered, c0)
    assert(c1.count() == 3)
    val obj0 = meanAssignedCos(clustered, c0)
    val obj1 = meanAssignedCos(clustered, c1)
    assert(obj1 >= obj0 - 1e-9, s"objective regressed: $obj0 -> $obj1")

    // harness embeddings: two training steps never decrease the
    // objective and never grow the codebook
    val e0 = VectorOps.labelCentroids(sfEmb)
    val k0 = e0.count()
    val e1 = VectorOps.kmeansStep(sfEmb, e0)
    val e2 = VectorOps.kmeansStep(sfEmb, e1)
    assert(e1.count() <= k0 && e2.count() <= k0)
    val o0 = meanAssignedCos(sfEmb, e0)
    val o1 = meanAssignedCos(sfEmb, e1)
    val o2 = meanAssignedCos(sfEmb, e2)
    assert(o1 >= o0 - 1e-9 && o2 >= o1 - 1e-9,
      s"objective must be non-decreasing: $o0, $o1, $o2")
  }

  test("annIvf with a trained codebook: still exact within probed " +
      "buckets (all-probe == brute force)") {
    val qIds = Seq(0L, 1L)
    val trained = VectorOps.trainCentroids(sfEmb, iters = 2)
    val ivf = VectorOps.annIvf(sfEmb, qIds, k = 5, nprobe = 10,
      codebook = Some(trained)).collect()
    val brute = VectorOps.annBruteForce(sfEmb, qIds, k = 5).collect()
    assert(ivf.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      brute.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("cosineLshJoinAgainst == cosineLshJoin on the union restricted " +
      "to cross pairs; persisted band index path identical (sf0.001)") {
    val newSide = sfEmb.filter(col("vec_id") % 10 === 0)
    val corpus = sfEmb.filter(col("vec_id") % 10 =!= 0)
    val incr = VectorOps.cosineLshJoinAgainst(newSide, corpus, 0.45)
      .collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    // full-union pairs, kept only when the sides straddle the split
    val full = VectorOps.cosineLshJoin(sfEmb, 0.45).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a % 10 == 0) != (b % 10 == 0) }
      .toSet
    assert(incr == full,
      s"incremental probe must equal union cross pairs; " +
        s"only-incr=${incr -- full} only-full=${full -- incr}")
    // probing a PRE-BUILT index gives byte-identical rows (the seed is
    // the engine's: signatures agree between build and probe time)
    val viaIndex = VectorOps.cosineLshJoinAgainst(newSide, corpus, 0.45,
      corpusBands = Some(VectorOps.hyperplaneBandTable(corpus)))
      .collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    assert(viaIndex == incr)
  }

  test("appendToIvfIndex: incremental append == from-scratch rebuild " +
      "over the union (same centroids, same buckets, same search)") {
    val centroids = VectorOps.labelCentroids(clustered)
    val half1 = clustered.filter(col("vec_id") % 2 === 0)
    val half2 = clustered.filter(col("vec_id") % 2 =!= 0)
    val incDir = java.nio.file.Files
      .createTempDirectory("ivf_inc").toString
    VectorOps.writeIvfIndex(half1, centroids, incDir)
    VectorOps.appendToIvfIndex(half2, centroids, incDir)
    val fullDir = java.nio.file.Files
      .createTempDirectory("ivf_full").toString
    VectorOps.writeIvfIndex(clustered, centroids, fullDir)
    val qdir = java.nio.file.Files.createTempDirectory("ivf_q2").toString
    clustered.write.mode("overwrite").parquet(qdir)
    val queryDocs = spark.read.parquet(qdir)
    val qIds = Seq(0L, 3L)
    def run(dir: String) =
      VectorOps.annIvfIndexed(spark, dir, queryDocs, qIds,
        k = 3, nprobe = 2, centroids)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run(incDir) == run(fullDir),
      "appended index must search identically to a rebuilt one")
    // the appended rows landed in the SAME bucket directories
    val dirsOf = (d: String) => new java.io.File(d).listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName).toSet
    assert(dirsOf(incDir) == dirsOf(fullDir))
  }

  test("materialized IVF index: search scans ONLY the probed bucket " +
      "partitions via DYNAMIC partition pruning (runtime subquery off " +
      "the probe broadcast — no collected literal, no driver " +
      "round-trip) and returns annIvf's exact results") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    val centroids = VectorOps.labelCentroids(clustered)
    VectorOps.writeIvfIndex(clustered, centroids, dir)
    val bucketDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName).toSet
    assert(bucketDirs == Set("bucket=0", "bucket=1", "bucket=2"))
    // the production shape: queries come from a TABLE (an in-memory
    // LocalRelation would constant-fold the id filter away, and DPP
    // keys off that selective predicate surviving on the probe side)
    val qdir = java.nio.file.Files.createTempDirectory("ivf_q").toString
    clustered.write.mode("overwrite").parquet(qdir)
    val queryDocs = spark.read.parquet(qdir)
    // queries 0 and 3 are both label 0; nprobe=1 probes exactly bucket 0
    val qIds = Seq(0L, 3L)
    val res = VectorOps.annIvfIndexed(spark, dir, queryDocs, qIds,
      k = 3, nprobe = 1, centroids)
    val rows = res.collect().map(r => (r.getLong(0), r.getLong(1)))
    val direct = VectorOps.annIvf(clustered, qIds, k = 3, nprobe = 1,
      codebook = Some(centroids)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == direct.toSeq,
      "indexed search must rank exactly as the in-memory IVF")
    // the scan carried a RUNTIME partition filter (dynamicpruning
    // subquery, not an isin literal) and read 1 of the 3 buckets
    val scans = collectWithSubqueries(res.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("ivf_idx")) => s
    }
    assert(scans.nonEmpty, "expected the index scan in the plan")
    val scan = scans.head
    val pf = scan.metadata.get("PartitionFilters")
    assert(pf.exists(f => f.contains("dynamicpruning")),
      s"bucket membership must arrive as a DPP runtime filter: $pf")
    val partsRead = scan.metrics.get("numPartitions").map(_.value)
    assert(partsRead.contains(1L),
      s"must read exactly the probed bucket partition, read $partsRead")
  }

  test("dedupEmbeddings: transitive cluster keeps only its min id; " +
      "survivors below threshold pairwise; the no-arg DEFAULT is the " +
      "LSH pair source and plans no cartesian product") {
    // clustered: labels 0/1/2 on orthogonal axes — same-label vectors
    // are near-identical (cos ~ 1), cross-label ~ 0. Each label forms
    // one 4-member cluster; survivor = min vec_id = 0, 1, 2.
    val exactDedup = VectorOps.dedupEmbeddings(clustered, 0.9,
      pairs = Some(VectorOps.pairsExact(clustered, 0.9)))
    val survivors = exactDedup
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(survivors == Set(0L, 1L, 2L))
    // no surviving pair is still a near-dup under the EXACT join
    val residual = VectorOps.cosineSimilarityJoin(exactDedup, 0.9).count()
    assert(residual == 0L)
    // the DEFAULT (LSH-banded) pair source gives the same survivors here
    // (recall is full on these planted clusters — VectorOpsSpec's
    // recall-floor test covers the general subset relation) ...
    val default = VectorOps.dedupEmbeddings(clustered, 0.9)
    assert(default.collect().map(_.getAs[Long]("vec_id")).toSet == survivors)
    // ... and, the point of the default flip: a caller who doesn't pick
    // a pair source gets the scale-safe plan — no cartesian product,
    // no broadcast nested loop anywhere in the no-arg call's plan
    val plan = default.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"default dedupEmbeddings must not plan a product join:\n$plan")
  }

  test("x11 end-to-end at sf0.01: LSH-pair dedup keeps every exact " +
      "survivor and removal recall stays >= 0.8") {
    val emb01 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val all = emb01.count()
    val exact = VectorOps.dedupEmbeddings(emb01, 0.45,
      pairs = Some(VectorOps.pairsExact(emb01, 0.45)))
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val viaLsh = VectorOps.dedupEmbeddings(emb01, 0.45,
      pairs = Some(VectorOps.cosineLshJoin(emb01, 0.45)))
      .collect().map(_.getAs[Long]("vec_id")).toSet
    // LSH pairs ⊆ exact pairs, so LSH components REFINE exact components:
    // the min id of an exact component is the min of whichever LSH
    // sub-component contains it → every exact survivor survives LSH too
    assert(exact.subsetOf(viaLsh),
      s"exact survivors must survive LSH dedup; lost ${exact -- viaLsh}")
    val removedExact = all - exact.size
    val removedLsh = all - viaLsh.size
    assert(removedExact > 0, "fixture must contain near-dups")
    val recall = removedLsh.toDouble / removedExact
    assert(recall >= 0.8,
      s"removal recall $recall below pinned floor 0.8 " +
        s"($removedLsh of $removedExact near-dups removed)")
  }

  test("pqTrain/pqEncode: codebook has ≤ m·k entries of dim/m floats; " +
      "codes are m positions inside the packed range") {
    val m = 4
    val cb = VectorOps.pqTrain(sfEmb, m = m, k = 8, iters = 1)
    val rows = cb.collect()
    assert(rows.length <= m * 8)
    val dim =
      sfEmb.head.getAs[scala.collection.Seq[Float]]("embedding").length
    assert(rows.forall(
      _.getAs[scala.collection.Seq[Float]]("centroid").length == dim / m))
    val enc = VectorOps.pqEncode(sfEmb, cb, m).collect()
    assert(enc.length == sfEmb.count())
    val perSub = rows.groupBy(_.getAs[Int]("sub_id")).view.mapValues(_.length)
    enc.foreach { r =>
      val codes = r.getAs[scala.collection.Seq[Int]]("codes")
      assert(codes.length == m)
      codes.toSeq.zipWithIndex.foreach { case (c, s) =>
        assert(c >= 0 && c < perSub(s), s"code $c outside subspace $s")
      }
    }
  }

  test("pqEncode positions == reference per-subspace L2 argmin on " +
      "deterministic pseudo-random vectors (ties break to first)") {
    val m = 2; val k = 4; val dim = 8
    def prand(seed: Int): Float =
      (((seed * 1103515245 + 12345) & 0x7fffffff) % 1000) / 500.0f - 1.0f
    val vecs = (0 until 24).map { i =>
      (i.toLong, (0 until dim).map(d => prand(i * 31 + d)), i % 3)
    }
    val emb = vecDf(vecs)
    val cb = VectorOps.pqTrain(emb, m = m, k = k, iters = 1)
    // reference codebook layout: ascending (sub_id, code) = the packed
    // position order
    val packed = cb.collect()
      .map(r => (r.getAs[Int]("sub_id"), r.getAs[Int]("code"),
        r.getAs[scala.collection.Seq[Float]]("centroid").toIndexedSeq))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toIndexedSeq).toMap
    val enc = VectorOps.pqEncode(emb, cb, m).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Int]]("codes").toIndexedSeq).toMap
    vecs.foreach { case (id, v, _) =>
      val sd = dim / m
      (0 until m).foreach { s =>
        val sub = v.slice(s * sd, (s + 1) * sd)
        val dists = packed(s).map(c =>
          sub.zip(c).map { case (a, b) =>
            val d = a.toDouble - b.toDouble; d * d
          }.sum)
        val expect = dists.zipWithIndex.minBy { case (d, i) => (d, i) }._2
        assert(enc(id)(s) == expect,
          s"vec $id subspace $s: code ${enc(id)(s)} != argmin $expect")
      }
    }
  }

  test("annPq on lossless clusters: ADC + re-rank returns the exact " +
      "neighbors (subspace centroids separate the planted clusters)") {
    // m=2 over dim 4; k=4 codes per subspace comfortably covers the 3
    // clusters, and the exact re-rank fixes any residual ordering
    val out = VectorOps.annPq(clustered, Seq(0L, 1L, 2L), k = 3,
      m = 2, kCodes = 4, refine = 4)
    val exact = VectorOps.annBruteForce(clustered, Seq(0L, 1L, 2L), k = 3)
    assert(out.collect().toSeq == exact.collect().toSeq,
      "on separable clusters PQ must equal brute force")
  }

  test("x13 recall floor: annPq vs annBruteForce at sf0.01") {
    val emb01 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val ids = Seq(0L, 1L, 2L, 3L, 4L)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.collect().map(r =>
        (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val exact = pairs(VectorOps.annBruteForce(emb01, ids, k = 10))
    val approx = pairs(VectorOps.annPq(emb01, ids, k = 10))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.85,
      s"PQ recall@10 $recall below pinned floor 0.85")
  }

  test("knnLabelVote: planted clusters vote their own label; votes " +
      "bounded by k; tie-break is deterministic (smallest label)") {
    // clustered: each label has 4 members; k=3 neighbors of any query
    // are exactly its 3 same-label peers -> unanimous correct vote
    val out = VectorOps.knnLabelVote(clustered, Seq(0L, 1L, 2L), k = 3)
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Int]("predicted_label") == r.getAs[Int]("true_label"))
      assert(r.getAs[Boolean]("correct"))
      assert(r.getAs[Long]("votes") == 3L)
    }
    // with k=12 (the whole corpus), the 3 off-label groups (4 votes
    // each vs 3 remaining same-label) tie at 4 — the vote must settle
    // on the smallest tied label, deterministically
    val wide = VectorOps.knnLabelVote(clustered, Seq(0L), k = 11).collect()
    assert(wide.length == 1)
    // neighbor labels: 4× label 1, 4× label 2, 3× label 0 — labels 1
    // and 2 tie at 4 votes; the smallest tied label must win
    assert(wide(0).getAs[Int]("predicted_label") == 1)
    assert(wide(0).getAs[Long]("votes") == 4L)
    assert(!wide(0).getAs[Boolean]("correct"))
  }

  test("embeddingDimStats: every dimension counted over every vector; " +
      "mean bounded by min/max; q_scale from the exact range") {
    val nVec = sfEmb.count()
    val stats = VectorOps.embeddingDimStats(sfEmb).collect()
    assert(stats.length == 64)
    stats.foreach { r =>
      assert(r.getAs[Long]("n") == nVec)
      val (lo, hi, mean) = (r.getAs[Double]("vmin"),
        r.getAs[Double]("vmax"), r.getAs[Double]("mean"))
      assert(lo <= mean && mean <= hi)
      assert(math.abs(r.getAs[Double]("q_scale") - (hi - lo) / 255.0)
        < 1e-15)
    }
  }

  test("quantizeEmbeddingsReport: int8 round-trip error within the " +
      "per-dim half-step bound on every vector") {
    val maxScale = VectorOps.embeddingDimStats(sfEmb)
      .collect().map(_.getAs[Double]("q_scale")).max
    // per-dim |err| ≤ scale/2 (codes never clamp: min/max come from
    // the data) → mse ≤ max_scale²/4
    val bound = maxScale * maxScale / 4.0 + 1e-12
    val rep = VectorOps.quantizeEmbeddingsReport(sfEmb).collect()
    assert(rep.length == sfEmb.count())
    rep.foreach { r =>
      val mse = r.getAs[Double]("mse")
      assert(mse >= 0.0 && mse <= bound, s"mse $mse > bound $bound")
    }
  }

  test("labelBalance: hand-computed shares, Gini impurity and entropy " +
      "on a 3:1 two-label corpus; uniform labels maximize entropy") {
    val df = vecDf(Seq(
      (0L, Seq(1.0f), 0), (1L, Seq(1.0f), 0), (2L, Seq(1.0f), 0),
      (3L, Seq(1.0f), 1)))
    val r = VectorOps.labelBalance(df).collect().head
    assert(r.getAs[Long]("n_vecs") == 4L)
    assert(r.getAs[Long]("n_labels") == 2L)
    assert(r.getAs[Double]("max_share") == 0.75)
    assert(r.getAs[Double]("min_share") == 0.25)
    // gini = 1 - (9 + 1) / 16
    assert(r.getAs[Double]("gini_impurity") == 1.0 - 10.0 / 16.0)
    def term(p: Double): BigDecimal =
      BigDecimal(p * (math.log(p) / math.log(2.0)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val expected = -(term(0.75) + term(0.25)).toDouble
    assert(r.getAs[Double]("entropy_bits") == expected)
    // 4 uniform labels → entropy exactly 2 bits, gini 0.75
    val u = vecDf((0 until 8).map(i => (i.toLong, Seq(1.0f), i % 4)))
    val ru = VectorOps.labelBalance(u).collect().head
    assert(ru.getAs[Double]("entropy_bits") == 2.0)
    assert(ru.getAs[Double]("gini_impurity") == 0.75)
    assert(ru.getAs[Double]("max_share") == ru.getAs[Double]("min_share"))
  }

  test("rebalanceLabels: every label capped at the minority count, " +
      "first-by-id selection, already-balanced corpus unchanged") {
    // label 0: ids 0,2,4,6,8 (5 vecs); label 1: ids 1,3 (2 vecs)
    val df = vecDf((0 until 10).map(i =>
      (i.toLong, Seq(1.0f), i % 2)).filter(t => t._3 == 0 || t._1 < 4))
    val out = VectorOps.rebalanceLabels(df).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"))).toSeq
    // minority count 2 → keep first 2 of each label in id order
    assert(out == Seq((0L, 0), (1L, 1), (2L, 0), (3L, 1)))
    // balanced input passes through whole
    val bal = vecDf((0 until 6).map(i => (i.toLong, Seq(1.0f), i % 3)))
    assert(VectorOps.rebalanceLabels(bal).count() == 6L)
  }

  // ---- planted VECTOR skew stress (VERDICT r10 next-round #4) -------
  // plantVectorSkew drops 30% of the corpus into ONE near-identical
  // direction — a collapsed-encoder/template-embedding pathology: all
  // planted vectors share one dominant SemDeDup cell and one hot
  // hyperplane-LSH bucket per band, so uncapped pair mining is
  // C(0.3N, 2) candidates inside single groups. The guards
  // (maxCellFreq / maxBandFreq) must bound the candidate OUTPUT and
  // keep wall-time comparable to an unskewed corpus of the same size,
  // while true dup pairs in NORMAL cells survive.

  /** `n` decorrelated deterministic vectors (dim 8); ids ≡ 99 (mod
    * 100) come in byte-identical sentinel pairs — true dups in normal
    * cells the guarded run must still find. `skewed` plants the
    * dominant direction on vec_id mod 100 < 30. */
  private def skewEmb(n: Int, skewed: Boolean): DataFrame = {
    val nSent = 4
    val rows = (0 until n).map { i =>
      // deterministic well-mixed direction per id (a linear map
      // without mixing makes consecutive ids near-TRANSLATES of each
      // other — spurious high-cosine pairs that polluted the first
      // cut of this fixture)
      val rnd = new scala.util.Random(7919L * i)
      val v = (0 until 8).map(_ => rnd.nextFloat() * 2.0f - 1.0f)
      // 8 labels → 8 k-means seed centroids for the normal mass (the
      // centroid count shapes cell sizes; one label would put the
      // whole corpus in one "cell" and make the cap test vacuous)
      (i.toLong, v, i % 8)
    } ++ (0 until nSent).flatMap { p =>
      val v = (0 until 8).map(d => -1.0f - 0.1f * ((p + d) % 3))
      Seq((100000L + p * 100 + 99, v, 8), (200000L + p * 100 + 99, v, 8))
    }
    val df = vecDf(rows)
    if (skewed) graft.tools.ScaleGen.plantVectorSkew(df) else df
  }

  private val sentinelPairs = (0 until 4)
    .map(p => (100000L + p * 100 + 99, 200000L + p * 100 + 99)).toSet

  test("planted vector skew: uncapped SemDeDup/LSH pair output explodes " +
      "quadratically, maxCellFreq/maxBandFreq bound it, and every " +
      "sentinel dup pair in a normal cell survives the guards") {
    val emb = skewEmb(600, skewed = true).localCheckpoint()
    // SemDeDup with a STALE codebook — trained before the corrupted
    // batch arrived (the incremental-index reality): the planted
    // direction has exactly ONE nearest stale centroid, so the whole
    // planted mass lands in one dominant cell. (A codebook re-trained
    // ON the skewed corpus fragments the planted ball across several
    // converged centroids — Lloyd "levels" the pathology into
    // cap-sized cells, which is the first line of defense the
    // scaladoc describes; the cap is the backstop for exactly this
    // stale/degenerate case.) probes=1 keeps each vector in its one
    // dominant cell; multi-probe dispersal is a recall feature with
    // per-cell work still bounded by cap².
    val cents = VectorOps.trainCentroids(
      skewEmb(600, skewed = false).localCheckpoint())
    val uncapped = VectorOps.semDedupPairs(emb, 0.95, cents,
      probes = 1).count()
    assert(uncapped > 10000,
      s"fixture must be skewed (uncapped SemDeDup pairs=$uncapped)")
    val capped = VectorOps.semDedupPairs(emb, 0.95, cents,
      probes = 1, maxCellFreq = 150)
    val cappedPairs = capped.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cappedPairs.size < uncapped / 10,
      s"maxCellFreq must collapse the dominant cell " +
        s"(${cappedPairs.size} vs $uncapped)")
    assert(sentinelPairs.subsetOf(cappedPairs),
      s"sentinel dups in normal cells must survive: " +
        s"missing ${sentinelPairs -- cappedPairs}")
    // hyperplane LSH: same pathology, same bound
    val lshUncapped = VectorOps.cosineLshJoin(emb, 0.95).count()
    assert(lshUncapped > 10000,
      s"fixture must be skewed (uncapped LSH pairs=$lshUncapped)")
    val lshCapped = VectorOps.cosineLshJoin(emb, 0.95, maxBandFreq = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lshCapped.size < lshUncapped / 10,
      s"maxBandFreq must collapse the hot buckets " +
        s"(${lshCapped.size} vs $lshUncapped)")
    assert(sentinelPairs.subsetOf(lshCapped),
      s"sentinel dups must survive the band cap: " +
        s"missing ${sentinelPairs -- lshCapped}")
  }

  test("planted vector skew: guarded hot-cell run completes within 2x " +
      "of the unskewed run of the same size") {
    val n = 600
    val unskewed = skewEmb(n, skewed = false).localCheckpoint()
    val skewed = skewEmb(n, skewed = true).localCheckpoint()
    def run(d: DataFrame): Unit = {
      val cents = VectorOps.trainCentroids(d)
      VectorOps.semDedupPairs(d, 0.95, cents, probes = 1,
        maxCellFreq = 150)
        .write.format("noop").mode("overwrite").save()
      VectorOps.cosineLshJoin(d, 0.95, maxBandFreq = 100)
        .write.format("noop").mode("overwrite").save()
    }
    // BEST of 3 (same rationale as NearDupSpec's skew guard): load
    // only ever inflates a wall-clock sample, so min is the stable
    // estimator of what the plan shape can do; the functional cap
    // assertions above carry the actual guarantee
    def timeBest(d: DataFrame): Double =
      (0 until 3).map { _ =>
        val t0 = System.nanoTime(); run(d); (System.nanoTime() - t0) / 1e9
      }.min
    timeBest(unskewed) // JIT warm-up pass
    val base = timeBest(unskewed)
    val hot = timeBest(skewed)
    assert(hot <= base * 2.0 + 1.0,
      s"guarded skewed run ${hot}s vs unskewed ${base}s — the caps " +
        "must keep the hot cell from dominating wall-time")
  }
  test("labelCentroidDrift: symmetric axis labels both sit at cos 45 " +
      "degrees from the corpus mean; a label aligned with the corpus " +
      "mean scores 1") {
    val emb = vecDf(Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(0.0f, 1.0f), 1), (4L, Seq(0.0f, 1.0f), 1),
      (5L, Seq(1.0f, 1.0f), 2), (6L, Seq(1.0f, 1.0f), 2)))
    val out = VectorOps.labelCentroidDrift(emb).collect()
      .map(r => (r.getInt(0), r.getAs[Long]("n_vecs"),
        r.getAs[Double]("centroid_cosine"))).toSeq
    // corpus sum = (4, 4); labels 0/1 are axes -> cos 45deg; label 2
    // is parallel to the mean -> 1
    assert(out.map(_._1) == Seq(0, 1, 2))
    assert(out.map(_._2) == Seq(2L, 2L, 2L))
    assert(out(0)._3 == out(1)._3)
    assert(math.abs(out(0)._3 - math.sqrt(0.5)) < 1e-6)
    assert(out(2)._3 == 1.0)
  }
  test("embeddingNormProfile: zero vectors counted, 3-4-5 norms exact") {
    val emb = vecDf(Seq(
      (1L, Seq(3.0f, 4.0f), 0), (2L, Seq(0.0f, 0.0f), 0),
      (3L, Seq(5.0f, 12.0f), 0)))
    val r = VectorOps.embeddingNormProfile(emb).collect().head
    assert(r.getAs[Long]("n_vecs") == 3L)
    assert(r.getAs[Long]("n_zero") == 1L)
    assert(r.getAs[Double]("min_norm") == 0.0)
    assert(r.getAs[Double]("max_norm") == 13.0)
    assert(math.abs(r.getAs[Double]("mean_norm") - 6.0) < 1e-9)
  }
  test("dimVarianceProfile: constant dimension flagged dead, varying " +
      "dimension's variance exact") {
    val emb = vecDf(Seq(
      (1L, Seq(1.0f, 2.0f), 0), (2L, Seq(1.0f, 4.0f), 0),
      (3L, Seq(1.0f, 6.0f), 0)))
    val out = VectorOps.dimVarianceProfile(emb).collect()
      .map(r => (r.getLong(0), r.getAs[Double]("variance"),
        r.getAs[Boolean]("is_dead"))).toSeq
    // dim0 constant -> var 0, dead; dim1 {2,4,6} -> pop var 8/3
    assert(out(0) == ((0L, 0.0, true)))
    assert(out(1)._1 == 1L && !out(1)._3)
    assert(math.abs(out(1)._2 - 8.0 / 3.0) < 1e-9)
  }

  test("labelCohesion: identical vectors cohere at ratio 1; " +
      "orthogonal vectors at 0; single-member labels dropped") {
    val emb = vecDf(Seq(
      (1L, Seq(2.0f, 0.0f), 0), (2L, Seq(2.0f, 0.0f), 0),
      (3L, Seq(1.0f, 0.0f), 1), (4L, Seq(0.0f, 1.0f), 1),
      (5L, Seq(9.0f, 9.0f), 2)))
    val out = VectorOps.labelCohesion(emb).collect()
      .map(r => (r.getInt(0), r.getAs[Long]("n_vecs"),
        r.getAs[Double]("mean_pair_dot"),
        r.getAs[Double]("mean_self_dot"),
        r.getAs[Double]("cohesion_ratio"))).toSeq
    // label 0: pair dot 4, self dot 4 -> ratio 1; label 1: pair dot 0;
    // label 2: single member -> absent
    assert(out == Seq((0, 2L, 4.0, 4.0, 1.0), (1, 2L, 0.0, 1.0, 0.0)),
      s"got $out")
  }

  test("ivfEvalReport: recall is non-decreasing in nprobe, hits the " +
      "floor the x04 search promises, and the report equals the " +
      "direct set computation on the harness embeddings") {
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val k = 10
    val nCentroids = sfEmb.select(col("label")).distinct().count().toInt
    val rep = VectorOps.ivfEvalReport(sfEmb, qids, k = k,
      maxProbe = nCentroids).collect()
      .map(r => (r.getAs[Long]("nprobe"), r.getAs[Long]("n_exact"),
        r.getAs[Long]("n_ivf"), r.getAs[Long]("n_both"),
        r.getAs[Double]("recall"))).toSeq
    assert(rep.map(_._1) == (1 to nCentroids).map(_.toLong),
      "one row per probe level, ordered")
    // recall monotone in nprobe (more probed buckets never lose hits)
    rep.sliding(2).foreach { case Seq(a, b) =>
      assert(b._5 >= a._5, s"recall must not decrease: $rep")
    }
    // probing EVERY bucket scores the whole corpus == brute force
    val full = rep.last
    assert(full._4 == full._2 && full._5 == 1.0,
      s"nprobe=|buckets| must reach recall 1; got $rep")
    // report parity vs direct set computation at nprobe=1
    val exact = VectorOps.annBruteForce(sfEmb, qids, k).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val ivf1 = VectorOps.annIvf(sfEmb, qids, k, nprobe = 1).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val r1 = rep.head
    assert((r1._2, r1._3, r1._4) ==
      ((exact.size.toLong, ivf1.size.toLong,
        (exact intersect ivf1).size.toLong)),
      s"report row must equal the set computation; got $r1")
  }

  // ---- PCA (x36): GramMatrix aggregate + Jacobi + Parseval pass ----

  test("GramMatrix: hand-checked sums/gram on two vectors, identical " +
      "across partitionings (mergeable)") {
    import graft.functions.GraftFunctions
    def stats(parts: Int) = vecDf(Seq(
        (1L, Seq(1f, 2f), 0), (2L, Seq(3f, 4f), 0)))
      .repartition(parts)
      .agg(GraftFunctions.gramMatrix(col("embedding")).as("g"))
      .select(col("g.n"), col("g.sums"), col("g.gram")).head()
    for (parts <- Seq(1, 3)) {
      val r = stats(parts)
      assert(r.getAs[Long]("n") == 2L)
      assert(r.getSeq[Double](r.fieldIndex("sums")).toList ==
        List(4.0, 6.0))
      // upper triangle row-major: xx=1+9, xy=2+12, yy=4+16
      assert(r.getSeq[Double](r.fieldIndex("gram")).toList ==
        List(10.0, 14.0, 20.0))
    }
  }

  test("GramMatrix: ragged input raises") {
    import graft.functions.GraftFunctions
    val df = vecDf(Seq((1L, Seq(1f, 2f), 0), (2L, Seq(3f), 0)))
      .coalesce(1)
      .agg(GraftFunctions.gramMatrix(col("embedding")).as("g"))
    val e = intercept[Exception] { df.head() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("ragged")), s"got: ${msgs(e)}")
  }

  test("pcaReport: analytic 2-d golden — rank-1 data recovers the " +
      "direction's variance; second component ~0") {
    // points t·(0.6, 0.8), t ∈ {−2,−1,1,2}: mean 0, top eigenvalue
    // mean(t²) = 2.5, second exactly 0
    val df = vecDf(Seq(-2f, -1f, 1f, 2f).zipWithIndex.map {
      case (t, i) => (i.toLong, Seq(0.6f * t, 0.8f * t), 0) })
    val rep = VectorOps.pcaReport(df, k = 2).collect()
    assert(rep.length == 2)
    val e1 = rep(0).getAs[Double]("eigenvalue")
    val e2 = rep(1).getAs[Double]("eigenvalue")
    assert(math.abs(e1 - 2.5) < 1e-6, s"top eigenvalue $e1")
    assert(math.abs(e2) < 1e-9, s"second eigenvalue $e2")
    assert(math.abs(rep(0).getAs[Double]("explained_frac") - 1.0) < 1e-9)
    assert(math.abs(
      rep(1).getAs[Double]("recon_error_frac_at_k")) < 1e-6)
  }

  test("pcaReport: trace identity (Σλ = total variance) and " +
      "residual == 1 − cumulative explained, on harness embeddings") {
    val emb = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "embeddings")
    val d = 64
    val rep = VectorOps.pcaReport(emb, k = d).collect()
      .sortBy(_.getAs[Int]("component"))
    assert(rep.length == d)
    // full-rank cumulative explained reaches 1
    assert(math.abs(
      rep.last.getAs[Double]("cum_explained_frac") - 1.0) < 1e-9)
    // eigenvalues descend
    val evs = rep.map(_.getAs[Double]("eigenvalue"))
    evs.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b - 1e-12, s"eigenvalues not descending: $a < $b") }
    // trace identity: Σλ equals the summed per-dim variance (q153's
    // quantity), computed independently here in one exact pass
    val sl = evs.sum
    val vr = emb.select(posexplode(col("embedding")).as(Seq("i", "v")))
      .groupBy(col("i"))
      .agg(avg(col("v").cast("double")).as("m"),
        avg(col("v").cast("double") * col("v").cast("double")).as("m2"))
      .select(sum(col("m2") - col("m") * col("m")).as("tv")).head()
      .getAs[Double]("tv")
    assert(math.abs(sl - vr) / vr < 1e-9, s"trace $sl vs variance $vr")
    // the measured rank-8 residual equals the spectral prediction
    val rep8 = VectorOps.pcaReport(emb, k = 8).collect()
      .sortBy(_.getAs[Int]("component"))
    val cum8 = rep8.last.getAs[Double]("cum_explained_frac")
    val recon8 = rep8.last.getAs[Double]("recon_error_frac_at_k")
    assert(math.abs(recon8 - (1.0 - cum8)) < 1e-3,
      s"Parseval check: recon $recon8 vs 1-cum ${1.0 - cum8}")
  }

  test("whitenEmbeddings: whitened coordinates have ~unit variance, " +
      "~zero pairwise covariance, and E[norm²] ≈ k on harness " +
      "embeddings") {
    val emb = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "embeddings")
    val out = VectorOps.whitenEmbeddings(emb, k = 8)
    val ys = (1 to 4).map(j => s"y$j")
    val aggs = ys.map(y => (avg(col(y)).as(s"m_$y"),
      avg(col(y) * col(y)).as(s"v_$y"))) // population moments
    val covs = for (i <- ys.indices; j <- i + 1 until ys.length)
      yield avg(col(ys(i)) * col(ys(j))).as(s"c_${i}_$j")
    val r = out.agg(
      (aggs.flatMap(t => Seq(t._1, t._2)) ++ covs ++
        Seq(avg(col("whitened_norm") * col("whitened_norm"))
          .as("mn2"))).head,
      (aggs.flatMap(t => Seq(t._1, t._2)) ++ covs ++
        Seq(avg(col("whitened_norm") * col("whitened_norm"))
          .as("mn2"))).tail: _*).head()
    ys.foreach { y =>
      assert(math.abs(r.getAs[Double](s"m_$y")) < 1e-2,
        s"mean($y) = ${r.getAs[Double](s"m_$y")}")
      assert(math.abs(r.getAs[Double](s"v_$y") - 1.0) < 1e-2,
        s"var($y) = ${r.getAs[Double](s"v_$y")}")
    }
    for (i <- ys.indices; j <- i + 1 until ys.length)
      assert(math.abs(r.getAs[Double](s"c_${i}_$j")) < 1e-2,
        s"cov(y${i + 1},y${j + 1}) = ${r.getAs[Double](s"c_${i}_$j")}")
    assert(math.abs(r.getAs[Double]("mn2") - 8.0) < 0.1,
      s"E[norm²] = ${r.getAs[Double]("mn2")}, expected ≈ 8")
  }

  test("whitenEmbeddings: dead directions are dropped — rank-1 input " +
      "keeps one component with unit variance") {
    val df = vecDf(Seq(-2f, -1f, 1f, 2f).zipWithIndex.map {
      case (t, i) => (i.toLong, Seq(0.6f * t, 0.8f * t), 0) })
    val out = VectorOps.whitenEmbeddings(df, k = 2)
    assert(out.columns.toSeq ==
      Seq("vec_id", "label", "y1", "whitened_norm"))
    val v = out.agg(avg(col("y1") * col("y1"))).head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-6, s"var(y1) = $v")
  }

  test("pcaReportIncremental: merged sufficient statistics equal the " +
      "from-scratch fit on the union; empty sides degrade gracefully") {
    val emb = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "embeddings")
    val old = emb.filter(col("vec_id") % 10 =!= 0)
    val fresh = emb.filter(col("vec_id") % 10 === 0)
    val inc = VectorOps.pcaReportIncremental(
      VectorOps.gramStats(old), fresh, k = 8).collect()
      .sortBy(_.getAs[Int]("component"))
    val full = VectorOps.pcaReport(emb, k = 8).collect()
      .sortBy(_.getAs[Int]("component"))
    assert(inc.length == 8 && full.length == 8)
    inc.zip(full).foreach { case (a, b) =>
      val (ea, eb) = (a.getAs[Double]("eigenvalue"),
        b.getAs[Double]("eigenvalue"))
      assert(math.abs(ea - eb) / eb < 1e-9,
        s"component ${a.getAs[Int]("component")}: $ea vs $eb")
      assert(math.abs(a.getAs[Double]("cum_explained_frac") -
        b.getAs[Double]("cum_explained_frac")) < 1e-9)
    }
    // an empty old statistic reduces to the batch-only fit
    val none = VectorOps.gramStats(emb.filter(col("vec_id") < 0))
    val only = VectorOps.pcaReportIncremental(none, emb, k = 3)
      .collect().sortBy(_.getAs[Int]("component"))
    val direct = VectorOps.pcaReport(emb, k = 3).collect()
      .sortBy(_.getAs[Int]("component"))
    only.zip(direct).foreach { case (a, b) =>
      assert(math.abs(a.getAs[Double]("eigenvalue") -
        b.getAs[Double]("eigenvalue")) /
        b.getAs[Double]("eigenvalue") < 1e-9)
    }
  }

  test("jacobiEigen: eigenvectors orthonormal on a random symmetric " +
      "matrix; V diagonalizes A back to the eigenvalues") {
    val d = 16
    val rnd = new scala.util.Random(7)
    val upper = Array.fill(d * (d + 1) / 2)(rnd.nextDouble() - 0.5)
    val (evals, evecs) = VectorOps.jacobiEigen(d, upper)
    // orthonormality
    for (i <- 0 until d; j <- i until d) {
      val dotp = evecs(i).zip(evecs(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dotp - expect) < 1e-9, s"v${i}.v$j = $dotp")
    }
    // vᵀAv = λ for each pair
    val a = Array.tabulate(d, d) { (i, j) =>
      val (r, c) = if (i <= j) (i, j) else (j, i)
      upper(r * d - r * (r - 1) / 2 + (c - r))
    }
    for (i <- 0 until d) {
      val av = a.map(row => row.zip(evecs(i)).map { case (x, y) => x * y }
        .sum)
      val vav = av.zip(evecs(i)).map { case (x, y) => x * y }.sum
      assert(math.abs(vav - evals(i)) < 1e-9,
        s"vᵀAv=${vav} != λ=${evals(i)} for component $i")
    }
  }

  test("knnHubness: hand-built hub dominates the in-degree histogram " +
      "and the zero row accounts for unreached vectors") {
    // v0 is everyone's nearest neighbor (the hub); queries 1..3 (k=1)
    // all retrieve v0; v4/v5 sit far off-axis and are never retrieved.
    val df = vecDf(Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f), 0),
      (1L, Seq(0.99f, 0.1f, 0.0f), 0),
      (2L, Seq(0.99f, -0.1f, 0.0f), 0),
      (3L, Seq(0.98f, 0.0f, 0.1f), 0),
      (4L, Seq(0.0f, 1.0f, 0.0f), 1),
      (5L, Seq(0.0f, 0.0f, 1.0f), 1)))
    val out = VectorOps.knnHubness(df, nQueries = 4L, k = 1)
      .collect().map(r => r.getAs[Long]("in_degree") ->
        ((r.getAs[Long]("n_vectors"), r.getAs[Double]("frac_vectors"))))
      .toMap
    // q0's top-1 is one of v1..v3 (cosine tie broken by n_id -> v1);
    // q1/q2/q3 each retrieve v0 -> v0 in-degree 3, v1 in-degree 1,
    // v2..v5 unreached -> zero row n=4
    assert(out(3L)._1 == 1L, s"hub row: $out")
    assert(out(1L)._1 == 1L)
    assert(out(0L) == ((4L, 0.666666666667)), s"zero row: $out")
    assert(out.values.map(_._1).sum == 6L,
      "histogram must partition the corpus")
  }

  test("labelNoise: a mislabeled vector inside the wrong cluster is " +
      "the only suspect; per-label means are exact") {
    // axis-x cluster labeled 0 (v0..v2); axis-y cluster labeled 1
    // (v3, v4) plus v5 — ON axis y but labeled 0 (the planted noise)
    val df = vecDf(Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(0.0f, 1.0f), 1), (4L, Seq(0.0f, 1.0f), 1),
      (5L, Seq(0.0f, 1.0f), 0)))
    val out = VectorOps.labelNoise(df, nQueries = 6L, k = 2)
      .collect().map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n_queries"),
          r.getAs[Double]("mean_disagreement"),
          r.getAs[Long]("n_suspect")))).toMap
    // label 0: v0/v1/v2 disagree 0; v5's two neighbors are v3/v4
    // (label 1) -> disagreement 1 -> mean 0.25, one suspect
    assert(out(0) == ((4L, 0.25, 1L)), s"label 0: $out")
    // label 1: v3/v4 each see one same-label and the mislabeled v5
    // -> 0.5 each, but 1*2 > 2 is false -> no suspects
    assert(out(1) == ((2L, 0.5, 0L)), s"label 1: $out")
  }

  test("knnHubness: identical vectors tie-break by n_id and the " +
      "fractions sum to 1") {
    val df = vecDf((0 until 5).map(i =>
      (i.toLong, Seq(1.0f, 0.0f), 0)))
    val out = VectorOps.knnHubness(df, nQueries = 5L, k = 1)
      .collect().map(r => r.getAs[Long]("in_degree") ->
        r.getAs[Long]("n_vectors")).toMap
    // every query's candidates are all cosine-1 ties -> lowest n_id
    // wins: q0 retrieves v1; q1..q4 retrieve v0
    assert(out == Map(0L -> 3L, 1L -> 1L, 4L -> 1L), s"got $out")
  }

  test("matryoshkaEval (x48): full-dim recall is exactly 1; a planted " +
      "truncation-blind prefix loses the true neighbor; fractions " +
      "divide exact counts") {
    // dim 2; EVERY vector's first component is 1.0, so prefix-1
    // cosine ties everywhere and the heap's n_id tie-break returns the
    // LOWEST ids — which are the WRONG neighbors by construction:
    // the query's true nearest (id 9) has the highest second component
    val df = vecDf(Seq(
      (0L, Seq(1.0f, 0.95f), 0), // query (panel head)
      (1L, Seq(1.0f, -0.9f), 0),
      (2L, Seq(1.0f, -0.8f), 0),
      (9L, Seq(1.0f, 0.9f), 0)   // true top-1 at full dim
    ))
    val out = VectorOps.matryoshkaEval(df, prefixes = Seq(1), k = 1,
      nQueries = 1).collect()
      .map(r => r.getAs[Long]("dims") -> r).toMap
    assert(out(2L).getAs[Double]("recall_at_k") == 1.0,
      "the full-dimension row is its own ground truth")
    assert(out(1L).getAs[Double]("recall_at_k") == 0.0,
      "prefix-1 ties everywhere and the id tie-break picks id 1, " +
        "not the true neighbor 9")
    assert(out(1L).getAs[Long]("n_truth") == 1L &&
      out(1L).getAs[Long]("n_hits") == 0L)
    // harness embeddings: recall well-formed at every prefix, exactly
    // 1 at the full dimension
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = VectorOps.matryoshkaEval(emb, k = 5, nQueries = 10)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall_at_k")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_truth") == 50L) // 10 queries x k=5
    }
    assert(rows.last.getAs[Long]("dims") == 64L &&
      rows.last.getAs[Double]("recall_at_k") == 1.0)
  }

  test("embeddingDiversity (q217): axis-aligned goldens hit 1/0/-1, " +
      "singletons report null, and the O(N*d) identity matches the " +
      "O(N^2) pair mean on the harness embeddings") {
    // axis-aligned unit vectors: rounded components are EXACT, so the
    // centroid-norm identity gives the textbook values with zero bias
    val df = vecDf(Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0), // identical
      (3L, Seq(1.0f, 0.0f), 1), (4L, Seq(0.0f, 1.0f), 1), // orthogonal
      (5L, Seq(1.0f, 0.0f), 2), (6L, Seq(-1.0f, 0.0f), 2), // opposite
      (7L, Seq(0.6f, 0.8f), 3) // singleton
    ))
    val out = VectorOps.embeddingDiversity(df).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out(0).getAs[Double]("mean_pairwise_cosine") == 1.0)
    assert(out(1).getAs[Double]("mean_pairwise_cosine") == 0.0)
    assert(out(2).getAs[Double]("mean_pairwise_cosine") == -1.0)
    assert(out(3).isNullAt(out(3).fieldIndex("mean_pairwise_cosine")),
      "a single-member group has no pairs")
    assert(out(0).getAs[Long]("n_vecs") == 2L)
    // identity vs brute force on the harness embeddings: the operator
    // never forms a pair; the reference computation forms all of them
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = VectorOps.embeddingDiversity(emb).collect()
      .map(r => r.getInt(0) -> r.getAs[Double]("mean_pairwise_cosine"))
      .toMap
    val byLabel = emb.collect()
      .map(r => (r.getInt(2), r.getSeq[Float](1).map(_.toDouble)))
      .groupBy(_._1)
    byLabel.foreach { case (label, rows) =>
      val units = rows.map(_._2).map { v =>
        val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
      }
      val pairs = for {
        i <- units.indices; j <- units.indices if i < j
      } yield units(i).zip(units(j)).map { case (a, b) => a * b }.sum
      val want = pairs.sum / pairs.length
      assert(math.abs(got(label) - want) < 1e-6,
        s"label $label: identity ${got(label)} vs pair mean $want " +
          "(bias bound is d*2e-9 ~ 1e-7)")
    }
  }
}
