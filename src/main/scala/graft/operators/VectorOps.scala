package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Similarity search over Array[Float] embedding columns.
  *
  * Hot-loop arithmetic runs in the native codegen'd VectorDot expression
  * (graft.functions.VectorDot — bit-identical to the portable
  * VectorFunctions tree, ~20× faster); norms are computed ONCE per input
  * row before any join, so a pair evaluation is a single dot product and
  * one division.
  *
  * Three tiers, by scale:
  *  1. annBruteForce — exact top-k for a small query set. The query
  *     vectors are BROADCAST; every data partition scores its own rows
  *     (map-side, codegen'd zip_with/aggregate), and only the per-query
  *     candidate rows shuffle for the final rank. Exact and 100 TB-sane
  *     as long as |queries| is small.
  *  2. cosineSimilarityJoin — exact all-pairs >= threshold. Quadratic by
  *     definition; it is the CORRECTNESS baseline the approximate paths
  *     are judged against, not the scale path.
  *  3. annIvf — inverted-file (IVF) search: vectors are bucketed by
  *     nearest coarse centroid at build time; a query probes only the
  *     nprobe nearest buckets. At 100 TB the centroids come from sampled
  *     k-means and the bucket assignment is a partition key — search cost
  *     drops by |buckets|/nprobe with recall controlled by nprobe.
  */
object VectorOps {

  private def dot(a: Column, b: Column): Column =
    GraftFunctions.vectorDot(a, b)
  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine from a precomputed-denominator pair; null on zero vectors
    * (same contract as VectorFunctions.cosine). */
  private def cosPre(d: Column, na: Column, nb: Column): Column =
    when(na * nb === 0.0, lit(null).cast("double"))
      .otherwise(d / (na * nb))

  /** Rank scored candidates per query via the bounded-heap aggregate
    * (graft.functions.BoundedTopK): each map task contributes at most k
    * rows per q_id to the shuffle — not the whole scored scan — which is
    * the only ranking shape that survives a 100 TB corpus. Ordering is
    * identical to row_number() OVER (ORDER BY cosine DESC, n_id). */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("q_id"))
      .agg(GraftFunctions.topK(col("cosine"), col("n_id"), k).as("_tk"))
      .select(col("q_id"), posexplode(col("_tk")).as(Seq("_pos", "_e")))
      .select(col("q_id"), col("_e.id").as("n_id"),
        col("_e.score").as("cosine"),
        (col("_pos") + 1).cast("long").as("rank"))
      .orderBy(col("q_id"), col("rank"))

  /** Exact cosine top-k neighbors for each query id. The tiny query side
    * is broadcast (nested-loop, map-side scoring); ranking is the
    * bounded-heap aggregate. Excludes self-matches. */
  def annBruteForce(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val queries = emb
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        norm(col("embedding")).as("_qn"))
    // NO widen here (measured, r17): q106's three fused brute-force
    // rankings ran 2.38→3.08 s with a widened stream side — the panel
    // is ≤ tens of queries, so the per-row work is too small to beat
    // 32-way task overhead on a one-split corpus
    val scored = emb
      .select(col("vec_id"), col("embedding"),
        norm(col("embedding")).as("_nrm"))
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosPre(dot(col("q_emb"), col("embedding")), col("_qn"), col("_nrm"))
          .as("cosine"))
    rankTopK(scored, k)
  }

  /** x48: Matryoshka truncation-recall evaluation (Kusupati et al.,
    * "Matryoshka Representation Learning", NeurIPS 2022): how much
    * retrieval quality survives truncating embeddings to PREFIX
    * dimensions — the decision table behind serving truncated vectors
    * (d/2 halves storage, bandwidth and dot-product cost; this
    * measures what it costs in recall). For each prefix length, the
    * exact cosine top-k over the truncated vectors is compared
    * against the full-dimension ground truth over a bounded query
    * panel; one row per prefix with recall@k.
    *
    * Determinism: both rankings use the q30 bounded-heap contract
    * (cosine desc, n_id tie-break), so membership — and therefore
    * recall — is deterministic; the fractions divide exact counts.
    *
    * Scale shape: the panel is bounded metadata (the x26 allowance);
    * each prefix evaluation is one annBruteForce pass — broadcast
    * panel, map-side scoring over a corpus scan, ≤k rows per query
    * reach the shuffle — and the loop runs |prefixes| times (≤ log d
    * by construction). The ground-truth membership is pinned once
    * (localCheckpoint: ≤ nQueries·k rows). At corpus-sized panels,
    * evaluate through the IVF index instead (annIvfIndexed per
    * prefix) — same comparison, pruned scans. */
  def matryoshkaEval(emb: DataFrame,
      prefixes: Seq[Int] = Seq(8, 16, 32), k: Int = 10,
      nQueries: Int = 20): DataFrame = {
    require(k >= 1 && nQueries >= 1, "need k >= 1 and nQueries >= 1")
    val spark = emb.sparkSession
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    // bounded metadata: the query panel off the corpus head
    val queryIds = emb.select(col("vec_id")).orderBy(col("vec_id"))
      .limit(nQueries).collect().map(_.getLong(0)).toSeq
    val truth = annBruteForce(emb, queryIds, k)
      .select(col("q_id"), col("n_id"))
      .localCheckpoint() // ≤ nQueries·k rows, reused per prefix
    val nTruth = truth.count()
    val evalPrefixes =
      (prefixes.filter(p => p > 0 && p < dim) :+ dim).distinct.sorted
    val rows = evalPrefixes.map { p =>
      val truncated = emb.withColumn("embedding",
        slice(col("embedding"), 1, p))
      val hits =
        if (p == dim) nTruth // same computation by definition
        else annBruteForce(truncated, queryIds, k)
          .select(col("q_id"), col("n_id"))
          .join(truth, Seq("q_id", "n_id")).count()
      (p.toLong, queryIds.size.toLong, k.toLong, nTruth, hits,
        BigDecimal(hits.toDouble / nTruth.toDouble)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    import spark.implicits._
    rows.toDF("dims", "n_queries", "k", "n_truth", "n_hits",
      "recall_at_k").orderBy(col("dims"))
  }

  /** Hard-negative mining for contrastive/embedding training: for each
    * query vector, the top-k most cosine-similar vectors whose LABEL
    * differs from the query's — the "near but wrong" examples a
    * contrastive loss learns most from (the in-batch-negatives
    * alternative wastes most of the batch on easy negatives).
    *
    * Same scale shape as [[annBruteForce]]: the tiny query side
    * broadcasts, scoring is map-side over one corpus scan, and the
    * label inequality is a pre-rank filter on that scan (cheaper than
    * ranking then discarding — the heap only ever sees admissible
    * candidates), with ranking via the bounded-heap aggregate (≤k rows
    * per query reach the shuffle). For corpus-sized query sets, mine
    * through the IVF index (annIvfIndexed) with the same label filter
    * applied per probed cell. */
  def hardNegatives(emb: DataFrame, queryIds: Seq[Long], k: Int)
      : DataFrame = {
    val queries = emb
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("label").as("_ql"),
        col("embedding").as("q_emb"), norm(col("embedding")).as("_qn"))
    val scored = emb.select(col("vec_id"), col("label"), col("embedding"),
        norm(col("embedding")).as("_nrm"))
      .crossJoin(broadcast(queries))
      .filter(col("label") =!= col("_ql"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosPre(dot(col("q_emb"), col("embedding")), col("_qn"), col("_nrm"))
          .as("cosine"))
    rankTopK(scored, k)
  }

  /** Exact all-pairs cosine similarity join at a threshold (the
    * embedding-space near-dup detector). Quadratic baseline — see class
    * doc; LSH/IVF bucketing is the scale path. Norms are computed n times
    * (not n²): once per side before the join. */
  def cosineSimilarityJoin(emb: DataFrame, threshold: Double): DataFrame = {
    // unsplittable-input guard (guide §2.5): the registered quadratic
    // anchor evaluates |n|²/2 cosines on the STREAM side of the
    // nested-loop join — a one-split scan serializes all of it
    val withNorm = ScanParallelism.widen(emb, "vec_id")
      .select(col("vec_id"), col("embedding"),
        norm(col("embedding")).as("_n"))
    val a = withNorm.select(col("vec_id").as("a_id"),
      col("embedding").as("e_a"), col("_n").as("_na"))
    val b = withNorm.select(col("vec_id").as("b_id"),
      col("embedding").as("e_b"), col("_n").as("_nb"))
    a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        cosPre(dot(col("e_a"), col("e_b")), col("_na"), col("_nb"))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Random-hyperplane LSH similarity join — the scale path for pair
    * mining that cosineSimilarityJoin baselines: each vector gets a
    * bit-signature (sign of the dot with `bands`×`rowsPerBand` fixed
    * random hyperplanes), signatures are banded, candidates come from an
    * equi-join on (band, bandBits) — never all-pairs — and candidates
    * are verified with the EXACT cosine at the threshold (precision 1,
    * recall governed by P(bit match) = 1 − θ/π per plane and the usual
    * 1−(1−p^r)^b band curve). Deterministic: planes generated from a
    * fixed seed and the row's own embedding width inside the native
    * HyperplaneBits expression — all band bits in one pass per row, no
    * plan-time width probe (constructing this plan launches no job).
    * `maxBandFreq` caps the size of a (band, bits) group admitted to
    * pair generation (NearDup.capBandGroups semantics — the skew guard
    * for duplicate-heavy or low-entropy-band corpora). */
  /** The persistable cosine-LSH index rows for an embedding corpus:
    * (vec_id, band, bits) under the engine's fixed hyperplane seed —
    * what cosineLshJoin bands internally, exposed so an accumulating
    * pipeline can write the index once and probe it per increment
    * (cosineLshJoinAgainst) instead of re-hashing the corpus. */
  def hyperplaneBandTable(emb: DataFrame, bands: Int = 12,
      rowsPerBand: Int = 3): DataFrame =
    // unsplittable-input guard (guide §2.5): bands×rowsPerBand dot
    // products per vector — the heaviest map stage of the cosine-LSH
    // path; never serialize it on a one-split scan
    ScanParallelism.widen(emb, "vec_id").select(col("vec_id"),
      posexplode(GraftFunctions.hyperplaneBits(col("embedding"), bands,
        rowsPerBand, 0x5eedL)).as(Seq("band", "bits")))

  def cosineLshJoin(emb: DataFrame, threshold: Double, bands: Int = 12,
      rowsPerBand: Int = 3, maxBandFreq: Int = Int.MaxValue): DataFrame = {
    require(maxBandFreq >= 2, "maxBandFreq < 2 would drop every pair")
    // candidate generation carries ONLY ids — the banded self-join and
    // the pair dedup shuffle narrow rows; embeddings re-join afterwards
    // (two hash joins on vec_id) for the exact verification
    val banded = NearDup.capBandGroups(
      hyperplaneBandTable(emb, bands, rowsPerBand),
      Seq("band", "bits"), maxBandFreq)
    val candidates = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bits") === col("y.bits") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"))
      .distinct()
    val withNorm = emb.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("_n"))
    candidates
      .join(withNorm.select(col("vec_id").as("a_id"),
        col("embedding").as("e_a"), col("_n").as("_na")), "a_id")
      .join(withNorm.select(col("vec_id").as("b_id"),
        col("embedding").as("e_b"), col("_n").as("_nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        cosPre(dot(col("e_a"), col("e_b")), col("_na"), col("_nb"))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Incremental cosine near-dup: NEW vectors probed AGAINST an
    * accumulated corpus via its (optionally persisted) hyperplane band
    * index — the embedding analog of NearDup.minHashLshPairsAgainst
    * (the continuous-ingestion shape: per-increment cost ∝ increment,
    * never corpus²). Candidates come from the (band, bits) equi-join of
    * the increment's bands against the index; every candidate is
    * verified with the EXACT cosine, so precision is 1 and the pair set
    * equals cosineLshJoin over the union restricted to cross pairs
    * (VectorOpsSpec pins the equivalence — same seed, so a vector's
    * signature is identical on both paths). Corpus embeddings are
    * touched only to verify candidates (hash join on vec_id). */
  def cosineLshJoinAgainst(newEmb: DataFrame, corpusEmb: DataFrame,
      threshold: Double, corpusBands: Option[DataFrame] = None,
      bands: Int = 12, rowsPerBand: Int = 3,
      maxBandFreq: Int = Int.MaxValue): DataFrame = {
    require(maxBandFreq >= 2, "maxBandFreq < 2 would drop every pair")
    val newBands = hyperplaneBandTable(newEmb, bands, rowsPerBand)
    val corpus = NearDup.capBandGroups(
      corpusBands.getOrElse(hyperplaneBandTable(corpusEmb, bands,
        rowsPerBand)),
      Seq("band", "bits"), maxBandFreq)
    val candidates = newBands.as("x")
      .join(corpus.as("y"),
        col("x.band") === col("y.band") && col("x.bits") === col("y.bits"))
      .select(col("x.vec_id").as("new_id"), col("y.vec_id").as("corpus_id"))
      .distinct()
    val a = newEmb.select(col("vec_id").as("new_id"),
      col("embedding").as("e_a"), norm(col("embedding")).as("_na"))
    val b = corpusEmb.select(col("vec_id").as("corpus_id"),
      col("embedding").as("e_b"), norm(col("embedding")).as("_nb"))
    candidates
      .join(a, "new_id")
      .join(b, "corpus_id")
      .select(col("new_id"), col("corpus_id"),
        cosPre(dot(col("e_a"), col("e_b")), col("_na"), col("_nb"))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy(col("new_id"), col("corpus_id"))
  }

  /** End-to-end EMBEDDING dedup: cosine near-dup pairs → connected
    * components (NearDup.duplicateClusters — the same min-label
    * propagation used for text clusters, the pair graph doesn't care
    * which modality produced it) → keep one canonical vector per
    * cluster (smallest vec_id) plus everything unpaired.
    *
    * `pairs` defaults to the LSH band equi-join (cosineLshJoin with its
    * default band layout) — the 100 TB path: candidates come from the
    * banded signature join, never all-pairs, and every candidate is
    * verified with the EXACT cosine, so the pair set's precision is 1
    * and only recall is traded (floor pinned in VectorOpsSpec). For the
    * exact quadratic baseline — the shape the DuckDB oracle computes —
    * pass `pairs = Some(pairsExact(emb, threshold))` explicitly; the
    * default API is deliberately the scale-safe one. Output: the
    * surviving embedding rows, unchanged schema. */
  def dedupEmbeddings(emb: DataFrame, threshold: Double,
      pairs: Option[DataFrame] = None): DataFrame = {
    val p = pairs.getOrElse(cosineLshJoin(emb, threshold))
      .select(col("a_id"), col("b_id"))
    val clusters = NearDup.duplicateClusters(p)
    // one survivor-policy implementation: delegate to the text-side
    // cluster dedup under the id name it expects
    NearDup.dedupByClusters(
      emb.withColumnRenamed("vec_id", "doc_id"), clusters)
      .withColumnRenamed("doc_id", "vec_id")
  }

  /** The exact quadratic pair source for dedupEmbeddings, under the
    * opt-in name: all-pairs cosine at the threshold. Use only at sizes
    * where O(n²) is affordable (correctness baselining, sampled audits
    * of the LSH default's recall) — the default dedupEmbeddings path is
    * the banded LSH join. */
  def pairsExact(emb: DataFrame, threshold: Double): DataFrame =
    cosineSimilarityJoin(emb, threshold)

  /** SemDeDup pair source (Abbas et al. 2023, "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication"): bucket the
    * corpus with k-means, then mine near-dup pairs ONLY within each
    * cluster — exact cosine inside the bucket, zero candidates across
    * buckets. The paper's observation is that semantic duplicates land
    * in the same k-means cell with overwhelming probability, so the
    * all-pairs cost collapses from n² to Σ|cluster|².
    *
    * Scale shape: assignment is ivfAssign's map-side native argmax over
    * the broadcast codebook (zero vector-side shuffle); pair mining is
    * an EQUI-join on the cluster id (hash join, never a product —
    * PlanSpec); each candidate is scored with the exact cosine, so
    * precision is 1 and only recall is traded (pairs whose endpoints
    * straddle a cell boundary are missed — the paper's trade, audited
    * against pairsExact in VectorOpsSpec). `probes` multi-assigns each
    * vector to its nearest cells (the annIvf nprobe idea applied to
    * indexing): a boundary pair still meets in one endpoint's
    * second-choice cell, at candidate cost (probes·|cell|)² per cell
    * instead of |cell|². Cluster-size skew is the |cluster|² hazard;
    * `trainCentroids`' Lloyd steps level cells, AQE skew-join splits
    * what remains — and `maxCellFreq` (NearDup.capBandGroups
    * semantics) BOUNDS it: a (cell) group larger than the cap is
    * dropped before the self-join, so a degenerate cell of
    * near-identical vectors (template embeddings, a collapsed
    * encoder) cannot emit |cell|² candidates. AQE balances work but
    * cannot bound candidate OUTPUT; the cap does — an explicit recall
    * trade on pathological cells only (normal cells are untouched,
    * and precision stays exact). */
  def semDedupPairs(emb: DataFrame, threshold: Double,
      centroids: DataFrame, probes: Int = 2,
      maxCellFreq: Int = Int.MaxValue): DataFrame = {
    require(probes >= 1, "probes must be at least 1")
    require(maxCellFreq >= 2, "maxCellFreq < 2 would drop every pair")
    // multi-assignment runs in the native TopCentroidIdxs expression —
    // one two-level loop per row inside codegen, like ivfAssign's
    // argmax (an array_sort over a transform'd struct array here would
    // be CodegenFallback: an interpreted per-row sort of the codebook
    // on the corpus-touching path)
    val assigned = ScanParallelism.widen(emb, "vec_id")
      .select(col("vec_id"), col("embedding"),
        norm(col("embedding")).as("_en"))
      .crossJoin(broadcast(packCentroidsFlat(centroids)))
      .select(col("vec_id"), col("embedding"), col("_en"), col("_cids"),
        explode(GraftFunctions.topCentroidIdxs(col("embedding"),
          col("_en"), col("_cvecs"), col("_cnorms"), lit(probes)))
          .as("_bi"))
      .select(col("vec_id"), col("embedding"), col("_en"),
        element_at(col("_cids"), col("_bi") + 1).as("bucket"))
    val capped = NearDup.capBandGroups(assigned, Seq("bucket"),
      maxCellFreq)
    val a = capped.select(col("bucket"), col("vec_id").as("a_id"),
      col("embedding").as("e_a"), col("_en").as("_na"))
    val b = capped.select(col("bucket"), col("vec_id").as("b_id"),
      col("embedding").as("e_b"), col("_en").as("_nb"))
    a.join(b, "bucket")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        cosPre(dot(col("e_a"), col("e_b")), col("_na"), col("_nb"))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
      // multi-assignment can surface a pair once per SHARED cell —
      // collapse to one row (the cosine is identical on every copy)
      .dropDuplicates("a_id", "b_id")
      .orderBy(col("a_id"), col("b_id"))
  }

  /** SemDeDup end-to-end: k-means-bucketed pair mining feeding the
    * shared cluster-dedup survivor policy (smallest vec_id canonical,
    * unpaired rows pass through). `centroids` defaults to the
    * Lloyd-trained codebook. */
  def semDedup(emb: DataFrame, threshold: Double,
      centroids: Option[DataFrame] = None, probes: Int = 2,
      maxCellFreq: Int = Int.MaxValue): DataFrame = {
    val c = centroids.getOrElse(trainCentroids(emb))
    dedupEmbeddings(emb, threshold,
      pairs = Some(semDedupPairs(emb, threshold, c, probes, maxCellFreq)))
  }

  /** kNN label vote — the embedding-quality eval primitive: for each
    * query vector, the majority label among its k nearest neighbors
    * (cosine), compared to the query's own label. Ties break to the
    * smallest label, so the result is deterministic given the
    * (deterministic) top-k set.
    *
    * Scale shape: inherits annBruteForce's broadcast-queries map-side
    * scan (≤k rows per query reach the shuffle); the vote is a count
    * over |queries|×k rows and every subsequent join keys on q_id/n_id
    * with the tiny side broadcast by AQE. */
  def knnLabelVote(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val nn = annBruteForce(emb, queryIds, k)
    val votes = nn
      .join(emb.select(col("vec_id").as("n_id"), col("label").as("n_label")),
        "n_id")
      .groupBy(col("q_id"), col("n_label"))
      .agg(count(lit(1)).as("votes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("votes").desc, col("n_label"))
    votes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .join(emb.select(col("vec_id").as("q_id"),
        col("label").as("true_label")), "q_id")
      .select(col("q_id"), col("n_label").as("predicted_label"),
        col("votes"), col("true_label"),
        (col("n_label") === col("true_label")).as("correct"))
      .orderBy(col("q_id"))
  }

  /** q217: per-label embedding diversity via the CENTROID-NORM
    * identity — mean pairwise cosine over a group of N unit vectors
    * WITHOUT the O(N²) pair join:
    *   Σ_{i≠j} cos(uᵢ, uⱼ) = ‖Σᵢ uᵢ‖² − N  ⇒
    *   mean = (‖Σu‖² − N) / (N·(N−1)).
    * The O(N·d) aggregate answers the question the quadratic q31/x06
    * pair mills answer per-pair: is a label/source/cluster COLLAPSED
    * (mean cosine → 1: embedding-space template flood, the SemDeDup
    * precondition) or diverse (→ 0)? Low diversity flags exactly the
    * groups worth sending through the expensive dedup path — this is
    * the cheap pre-screen in front of x19.
    *
    * Determinism: the per-row norm folds x² in ARRAY ORDER (same IEEE
    * chain both engines, floats widened to double); each unit
    * component rounds 9 dp into DECIMAL(28,9); per-dim sums are exact
    * decimal; the final ‖Σu‖² folds the d per-dim sums in DIM ORDER
    * (pinned sort_array fold). Documented bias: the identity uses
    * Σ‖uᵢ‖² = N, but 9-dp-rounded components give ‖uᵢ‖² = 1 ± d·2e-9
    * — a < 1e-7 additive bias at d = 64, IDENTICAL on both engines
    * (the oracle computes the same chain), so cross-engine equality is
    * exact even though the statistic carries the tiny rounding bias.
    * Single-member groups report null (no pairs exist).
    *
    * Scale shape: ONE explode shuffle of N·d (label, dim) rows with
    * map-side partial sums → |labels|·d rows; everything after is
    * metadata. No pair join anywhere — the whole point. */
  def embeddingDiversity(emb: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 9)
    val x = col("embedding")
    val norm = sqrt(aggregate(x, lit(0.0),
      (a, v) => a + v.cast("double") * v.cast("double")))
    val n = emb.groupBy(col("label")).agg(count(lit(1)).as("n_vecs"))
    val dimSums = emb
      .select(col("label"),
        posexplode(transform(x,
          v => round(v.cast("double") / norm, 9).cast(dec)))
          .as(Seq("dim", "u")))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("u")).as("s"))
    dimSums
      .groupBy(col("label"))
      .agg(sort_array(collect_list(struct(col("dim"), col("s"))))
        .as("_ds"))
      .select(col("label"),
        aggregate(col("_ds"), lit(0.0), (a, e) =>
          a + e.getField("s").cast("double") *
            e.getField("s").cast("double")).as("_ssq"))
      .join(n, "label")
      .select(col("label"), col("n_vecs"),
        when(col("n_vecs") > 1,
          round((col("_ssq") - col("n_vecs").cast("double")) /
            (col("n_vecs").cast("double") *
              (col("n_vecs") - 1).cast("double")), 12))
          .otherwise(lit(null).cast("double"))
          .as("mean_pairwise_cosine"))
      .orderBy(col("label"))
  }

  /** Coarse centroids per `label` (stand-in for a sampled k-means
    * codebook): mean vector per label, computed by position explode +
    * group — one shuffle of n_vectors * dim rows, then tiny. */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v")).as("c"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c"))))
        .as("_pairs"))
      .select(col("label").as("centroid_id"),
        transform(col("_pairs"), p => p.getField("c").cast("float"))
          .as("centroid"))

  /** Centroid table packed into ONE broadcastable row: a sorted
    * array<struct<centroid_id, centroid, _cn>> (ascending centroid_id, so
    * first-wins folds break ties toward the smallest id — same order the
    * previous window argmax used). The codebook is small by construction
    * (sampled k-means), so the single collect_list row is tiny. */
  private def packCentroids(centroids: DataFrame): DataFrame =
    centroids
      .select(col("centroid_id"), col("centroid"),
        norm(col("centroid")).as("_cn"))
      .agg(sort_array(collect_list(
        struct(col("centroid_id"), col("centroid"), col("_cn"))))
        .as("_cents"))

  /** Null-safe comparable similarity: cosine with zero-vector nulls mapped
    * below any real cosine (range [-1, 1]), so folds/sorts never compare
    * against null. */
  private def simKey(e: Column, c: Column, en: Column): Column =
    coalesce(
      cosPre(dot(e, c.getField("centroid")), en, c.getField("_cn")),
      lit(-2.0))

  /** Codebook as three PARALLEL broadcastable arrays (ids, vectors,
    * norms — ascending centroid_id), the flat layout the native argmax
    * expression consumes. The per-element transforms are interpreted
    * HOFs, but they run on the single packed row, not per data row. */
  private def packCentroidsFlat(centroids: DataFrame): DataFrame =
    packCentroids(centroids).select(
      transform(col("_cents"), c => c.getField("centroid_id")).as("_cids"),
      transform(col("_cents"), c => c.getField("centroid")).as("_cvecs"),
      transform(col("_cents"), c => c.getField("_cn")).as("_cnorms"))

  /** IVF index: each vector assigned to its nearest centroid (by cosine).
    * The packed codebook is broadcast and the argmax runs map-side in
    * the native codegen'd NearestCentroidIdx expression (one two-level
    * float loop per row — a higher-order fold here would be
    * CodegenFallback, interpreted per row per centroid) — ZERO shuffles
    * touch the (100 TB) vector side, vs. the row_number()-over-vec_id
    * alternative, which would shuffle n_vectors × n_centroids scored
    * rows (PlanSpec asserts the shape). Ties go to the smallest
    * centroid_id, as the fold and window argmax before it did. */
  def ivfAssign(emb: DataFrame, centroids: DataFrame): DataFrame =
    emb
      .select(col("vec_id"), col("embedding"),
        norm(col("embedding")).as("_en"))
      .crossJoin(broadcast(packCentroidsFlat(centroids)))
      .withColumn("_bi", GraftFunctions.nearestCentroidIdx(
        col("embedding"), col("_en"), col("_cvecs"), col("_cnorms")))
      .select(col("vec_id"), col("embedding"), col("_en").as("emb_norm"),
        // -1 (empty codebook) → null bucket, matching the old fold's init
        when(col("_bi") >= 0, element_at(col("_cids"), col("_bi") + 1))
          .as("bucket"))

  /** One Lloyd step of spherical k-means: assign every vector to its
    * nearest centroid by cosine (ivfAssign — map-side fold over the
    * broadcast codebook, zero shuffles on the vector side), then
    * recompute each centroid as the mean of its assigned vectors.
    * Cosine is scale-invariant, so the unnormalized mean scores
    * identically to the normalized spherical-k-means centroid, and the
    * mean-cosine objective is monotonically non-decreasing per step
    * (VectorOpsSpec asserts).
    *
    * Scale shape: the mean is a posexplode to (bucket, pos, v) followed
    * by partial+final avg — each map partition pre-collapses to
    * ≤ k×dim rows before the shuffle, so the exchange carries
    * O(k·dim·partitions), not O(n·dim). Centroids that lose every
    * vector simply drop out (standard k-means shrinkage). */
  def kmeansStep(emb: DataFrame, centroids: DataFrame): DataFrame =
    ivfAssign(emb, centroids)
      .select(col("bucket").as("centroid_id"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("centroid_id"), col("pos"))
      .agg(avg(col("v")).as("c"))
      .groupBy(col("centroid_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c"))))
        .as("_pairs"))
      .select(col("centroid_id"),
        transform(col("_pairs"), p => p.getField("c").cast("float"))
          .as("centroid"))

  /** Train an IVF codebook: label-seeded centroids refined by `iters`
    * Lloyd steps. localCheckpoint between steps truncates the growing
    * iterative lineage (same pattern as NearDup.duplicateClusters). */
  def trainCentroids(emb: DataFrame, iters: Int = 2): DataFrame = {
    var c = labelCentroids(emb)
    // Ckpt.advance: eager checkpoint of step r, then free step r-1's
    // superseded blocks (the chain otherwise keeps every iteration's
    // centroid table alive until the ContextCleaner runs)
    (0 until iters).foreach { _ => c = Ckpt.advance(c, kmeansStep(emb, c)) }
    c
  }

  /** IVF top-k search: each query probes its nprobe nearest buckets and
    * scores only the vectors inside them. Exact within the probed subset
    * (self-consistency is tested against annBruteForce restricted to the
    * same candidate set); recall vs. full brute force is the usual IVF
    * trade governed by nprobe. `codebook` defaults to the label-seeded
    * centroids; pass trainCentroids(emb) for the refined index. */
  def annIvf(emb: DataFrame, queryIds: Seq[Long], k: Int,
      nprobe: Int = 2, codebook: Option[DataFrame] = None): DataFrame = {
    val centroids = codebook.getOrElse(labelCentroids(emb))
    val indexed = ivfAssign(emb, centroids)
    val queries = emb
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        norm(col("embedding")).as("_qn"))
    val probes = probeTable(queries, centroids, nprobe)
    // score only vectors in probed buckets; norms were computed once in
    // ivfAssign and carried as emb_norm; rank via the bounded heap
    val scored = indexed
      .join(broadcast(probes), "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosPre(dot(col("q_emb"), col("embedding")), col("_qn"),
          col("emb_norm")).as("cosine"))
    rankTopK(scored, k)
  }

  /** Per-query probe list: nprobe nearest centroids, picked MAP-SIDE
    * from the broadcast codebook (sort the per-row scored array, slice
    * nprobe) — same zero-shuffle shape as ivfAssign; array_sort on
    * struct<negated sim, centroid_id> gives (sim desc, centroid_id asc)
    * order exactly. */
  private def probeTable(queries: DataFrame, centroids: DataFrame,
      nprobe: Int): DataFrame =
    queries.crossJoin(broadcast(packCentroids(centroids)))
      .select(col("q_id"), col("q_emb"), col("_qn"),
        explode(slice(
          array_sort(transform(col("_cents"), c =>
            struct((-simKey(col("q_emb"), c, col("_qn"))).as("_neg"),
              c.getField("centroid_id").as("centroid_id")))),
          1, nprobe)).as("_p"))
      .select(col("q_id"), col("q_emb"), col("_qn"),
        col("_p.centroid_id").as("bucket"))

  /** Materialize the IVF index as BUCKET-PARTITIONED parquet — the
    * 100 TB index layout: one directory per coarse centroid, so a
    * search's bucket predicate becomes a PARTITION filter and unprobed
    * buckets are never opened, let alone scanned. Assignment is the
    * zero-shuffle ivfAssign map pass; the write's only movement is the
    * file commit itself. */
  def writeIvfIndex(emb: DataFrame, centroids: DataFrame,
      path: String): Unit =
    ivfAssign(emb, centroids)
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** INCREMENTAL index maintenance: assign only the NEW vectors against
    * the existing codebook and append their rows into the same
    * bucket-partitioned layout — ingestion cost ∝ batch, never a
    * corpus re-index, and searches over the appended index are
    * IDENTICAL to a from-scratch rebuild over the union (same
    * centroids → same bucket assignment → same partition directories;
    * equality pinned in VectorOpsSpec). Centroid drift is the
    * documented trade: after enough appends, retrain + rebuild (the
    * standard IVF re-index cadence); the bucket-size report from the
    * index itself is the drift monitor. */
  def appendToIvfIndex(newEmb: DataFrame, centroids: DataFrame,
      path: String): Unit =
    ivfAssign(newEmb, centroids)
      .write.mode("append").partitionBy("bucket").parquet(path)

  /** IVF top-k search against the MATERIALIZED index: probes are picked
    * map-side from the broadcast codebook (identical to annIvf), and
    * the probed-bucket predicate reaches the scan as a RUNTIME
    * partition filter — dynamic partition pruning off the broadcast
    * probe join, no driver round-trip. The probe side is
    * ≤ |queries|·nprobe rows with a selective id predicate, so
    * Catalyst inserts the dynamicpruning subquery (reusing the probe
    * broadcast) on the bucket partition column, and unprobed
    * directories are never opened (PartitionFilters +
    * numPartitions==probed in VectorOpsSpec — pinned WITHOUT any
    * collected literal in the probe path). At any query volume the
    * pruning cost stays the one broadcast the join already pays.
    * Scores/ranks are identical to annIvf over the same codebook and
    * nprobe (exact within probed buckets). */
  def annIvfIndexed(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, queryDocs: DataFrame, queryIds: Seq[Long], k: Int,
      nprobe: Int, centroids: DataFrame): DataFrame = {
    val queries = queryDocs
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        norm(col("embedding")).as("_qn"))
    val probes = probeTable(queries, centroids, nprobe)
    val idx = spark.read.parquet(indexPath)
    val scored = idx
      .join(broadcast(probes), "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosPre(dot(col("q_emb"), col("embedding")), col("_qn"),
          col("emb_norm")).as("cosine"))
    rankTopK(scored, k)
  }

  // ------------------- Product quantization (PQ) -------------------
  //
  // The per-subvector argmin — the hot loop of both training assignment
  // and encoding, the paths that touch every row of a 100 TB corpus —
  // runs in the native codegen'd PqSubArgmin / PqArgminCodes
  // expressions (graft.functions.PqArgmin; the same upgrade
  // NearestCentroidIdx gave IVF). The replaced HOF tree evaluated m×k
  // interpreted zip_with/aggregate folds per row; equivalence to that
  // portable tree is property-pinned in PropertySpec, and position
  // semantics (POSITION is the code, first-min ties — shrinkage-proof
  // numbering) are documented on the expressions themselves.

  /** floor(dim/m) as an INT column — Column `/` is double division, and
    * feeding that to slice() would rely on implicit double→int narrowing
    * (silently wrong positions for a non-dividing m, and an analysis
    * error under ANSI mode). With the explicit floor-cast, a non-dividing
    * m deterministically ignores the trailing dim%m dimensions in the
    * codes (they still contribute to the stored true norm); standard PQ
    * picks m to divide dim. */
  private def subDimOf(e: Column, m: Int): Column =
    floor(size(e) / m).cast("int")

  /** Explode each vector into its m equal subvectors. */
  private def subVectors(emb: DataFrame, m: Int): DataFrame = {
    val subDim = subDimOf(col("embedding"), m)
    emb
      .select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(m - 1))).as("sub_id"))
      .select(col("vec_id"), col("sub_id"),
        slice(col("embedding"), col("sub_id") * subDim + 1, subDim).as("sv"))
  }

  /** Per-(sub_id, code) mean subvector — kmeansStep's repack shape keyed
    * by subspace. Partial+final avg: each map partition collapses to
    * ≤ m·k·subDim rows before the shuffle. */
  private def meanBySubCode(assigned: DataFrame): DataFrame =
    assigned
      .select(col("sub_id"), col("code"),
        posexplode(col("sv")).as(Seq("pos", "v")))
      .groupBy(col("sub_id"), col("code"), col("pos"))
      .agg(avg(col("v")).as("c"))
      .groupBy(col("sub_id"), col("code"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c"))))
        .as("_pairs"))
      .select(col("sub_id"), col("code"),
        transform(col("_pairs"), p => p.getField("c").cast("float"))
          .as("centroid"))

  /** Codebook packed into ONE broadcastable row: `_cb[sub_id+1][pos]` =
    * centroid, both levels ascending — the layout encode and the query
    * LUT share. m·k·subDim floats total (= one full vector per code),
    * tiny by construction. */
  private def packPq(codebook: DataFrame): DataFrame =
    codebook
      .groupBy(col("sub_id"))
      .agg(array_sort(collect_list(struct(col("code"), col("centroid"))))
        .as("_cs"))
      .select(col("sub_id"),
        transform(col("_cs"), c => c.getField("centroid")).as("_cents"))
      .agg(array_sort(collect_list(struct(col("sub_id"), col("_cents"))))
        .as("_ss"))
      .select(transform(col("_ss"), s => s.getField("_cents")).as("_cb"))

  /** Train a product-quantization codebook: m independent per-subspace
    * k-means (squared-L2), seeded deterministically by vec_id mod k and
    * refined by `iters` Lloyd steps. Assignment is the zero-shuffle
    * broadcast-fold (same shape as ivfAssign); the mean recompute
    * partial-aggregates to ≤ m·k·dim rows per partition. In production
    * the trainer runs on a sample — the codebook quality needs only a
    * representative slice, never the full corpus. */
  def pqTrain(emb: DataFrame, m: Int = 8, k: Int = 16,
      iters: Int = 2): DataFrame = {
    // persisted: the exploded subvector table feeds the seed aggregate
    // and every Lloyd assignment — without it the corpus re-explodes per
    // iteration (same bounded cache-lifecycle note as NearDup)
    val sub = subVectors(emb, m)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cb = meanBySubCode(
      sub.withColumn("code", pmod(col("vec_id"), lit(k)).cast("int")))
    (0 until iters).foreach { _ =>
      val assigned = sub
        .crossJoin(broadcast(packPq(cb)))
        .withColumn("code", GraftFunctions.pqSubArgmin(col("sv"),
          element_at(col("_cb"), col("sub_id") + 1)))
      // eager checkpoint + free of the superseded step (Ckpt.advance)
      cb = Ckpt.advance(cb, meanBySubCode(
        assigned.select(col("sub_id"), col("code"), col("sv"))))
    }
    // the returned codebook is a materialized checkpoint — the
    // subvector cache is fully consumed inside this function
    sub.unpersist(blocking = false)
    cb
  }

  /** Encode every vector as m byte-sized codes + its true norm — the
    * 100 TB index layout: 4·dim bytes of floats become m ints + one
    * float (dim=64, m=8, k=16 → 8 byte-range codes vs 256 bytes of
    * floats, ~32× smaller once the parquet writer dictionary/byte-packs
    * the small int range). Pure
    * MAP-SIDE over the broadcast codebook — zero shuffles touch the
    * vector side (PlanSpec pins the x13 shape). */
  def pqEncode(emb: DataFrame, codebook: DataFrame, m: Int): DataFrame = {
    require(m > 0, "m must be positive")
    pqEncodePacked(emb, packPq(codebook))
  }

  private def pqEncodePacked(emb: DataFrame,
      packed: DataFrame): DataFrame = {
    // m is implied by the packed codebook (size(_cb) == m for any
    // packPq output built with the same m) — PqArgminCodes derives the
    // subvector slicing from it natively, one two-level loop per row
    emb
      .crossJoin(broadcast(packed))
      .select(col("vec_id"),
        GraftFunctions.pqCodes(col("embedding"), col("_cb")).as("codes"),
        norm(col("embedding")).as("emb_norm"))
  }

  /** PQ top-k search with asymmetric distance computation (ADC) + exact
    * re-rank. Per query: one m×k lookup table of subspace dot products
    * (dot decomposes across subspaces; cosine follows from the STORED
    * true norm), so scanning a candidate costs m array lookups instead
    * of a dim-wide dot — the approximate pass reads only the m-int codes
    * column. The top refine·k by approximate cosine are re-scored
    * exactly (one hash join back to the embeddings by id — candidate
    * count is refine·k·|queries|, broadcast-sized) and the final top-k
    * ranks by TRUE cosine, so precision of the returned scores is 1;
    * recall vs. brute force is the PQ trade (floor pinned in
    * VectorOpsSpec). */
  def annPq(emb: DataFrame, queryIds: Seq[Long], k: Int, m: Int = 8,
      kCodes: Int = 16, refine: Int = 16,
      codebook: Option[DataFrame] = None): DataFrame = {
    val cb = codebook.getOrElse(pqTrain(emb, m, kCodes))
    // packed ONCE and shared by encode + LUT — packing aggregates the
    // codebook plan, and an unmaterialized caller-supplied codebook
    // would otherwise compute twice
    val packed = packPq(cb)
    val encoded = pqEncodePacked(emb, packed)
    val subDim = subDimOf(col("q_emb"), m)
    val queriesRaw = emb
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        norm(col("embedding")).as("_qn"))
    // ADC lookup table, built map-side against the broadcast codebook:
    // _lut[s+1][c+1] = dot(query subvector s, centroid c of subspace s)
    val queries = queriesRaw
      .crossJoin(broadcast(packed))
      .select(col("q_id"), col("_qn"),
        transform(col("_cb"), (cents, s) =>
          transform(cents, c =>
            dot(slice(col("q_emb"), s * subDim + 1, subDim), c)))
          .as("_lut"))
    // approximate pass: candidate cost = m lookups (never touches the
    // full embedding column)
    val approx = encoded
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosPre(
          aggregate(
            zip_with(col("codes"), col("_lut"),
              (cd, row) => element_at(row, cd + 1)),
            lit(0.0), (acc, x) => acc + x),
          col("_qn"), col("emb_norm")).as("cosine"))
    val shortlist = rankTopK(approx, refine * k)
      .select(col("q_id"), col("n_id"))
    // exact re-rank of the shortlist (ADC + re-rank, the standard PQ
    // pipeline): true cosine decides the final order
    val exact = shortlist
      .join(emb.select(col("vec_id").as("n_id"),
        col("embedding").as("n_emb")), "n_id")
      .join(broadcast(queriesRaw), "q_id")
      .select(col("q_id"), col("n_id"),
        cosPre(dot(col("q_emb"), col("n_emb")), col("_qn"),
          norm(col("n_emb"))).as("cosine"))
    rankTopK(exact, k)
  }

  /** Per-dimension statistics of the embedding column: count, min, max,
    * exact mean, and the int8 affine quantization scale ((max-min)/255)
    * each dimension would use — the calibration table every embedding
    * quantizer (and drift monitor) reads first.
    *
    * Determinism: min/max of floats are exact; the mean sums exact
    * decimals (order-independent — float→double is value-exact and
    * double→DECIMAL(28,8) cannot land on a rounding midpoint, because
    * no binary fraction terminates exactly at an 8-decimal half-ulp),
    * then divides once in IEEE double.
    *
    * Scale shape: posexplode is map-side (×dim row amplification of a
    * two-column projection); the aggregate partial-combines to ≤ dim
    * rows per map task, so the shuffle carries #tasks·dim tiny rows no
    * matter the corpus size. */
  def embeddingDimStats(emb: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 8)
    emb
      .select(posexplode(col("embedding")).as(Seq("dim", "val")))
      .select(col("dim").cast("long").as("dim"),
        col("val").cast("double").as("v"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        min(col("v")).as("vmin"),
        max(col("v")).as("vmax"),
        (sum(col("v").cast(dec)).cast("double") / count(lit(1)))
          .as("mean"))
      .withColumn("q_scale", (col("vmax") - col("vmin")) / 255.0)
      .orderBy(col("dim"))
  }

  /** Class-balance audit of the label column — the report a training
    * run reads before trusting a classifier head or mining hard
    * negatives (L106): per-corpus label count, share extremes, Gini
    * impurity and Shannon entropy in one row. A skewed label
    * distribution silently biases contrastive sampling and makes
    * accuracy a misleading metric; this is the pre-flight check.
    *
    * Determinism discipline (oracle is hash-compared): shares and Gini
    * are exact count ratios (sum of n² rides DECIMAL(38,0) — a BIGINT
    * product would overflow at web scale, ~1e12 rows → n² ~ 1e24);
    * the entropy terms p·log2(p) are the only transcendentals, rounded
    * to 9 decimals per label BEFORE the decimal sum so engine libm
    * differences (~1 ulp, measured) can never reach the published
    * value. Scale shape: one partial+final aggregate on label (bounded
    * cardinality), then arithmetic over the label-count rows with the
    * one-row total broadcast — nothing data-sized past the first
    * aggregate. */
  def labelBalance(emb: DataFrame): DataFrame = {
    val counts = emb.groupBy(col("label"))
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("_N"),
      count(lit(1)).as("_n_labels"))
    val nDec = col("n").cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val p = col("n").cast("double") / col("_N").cast("double")
    // round the DOUBLE first (both engines: half-away-from-zero), THEN
    // cast to decimal — a double→fine-decimal cast rounds under each
    // engine's own mode and would reintroduce the libm sensitivity
    val term = round(p * log2(p), 9)
      .cast(org.apache.spark.sql.types.DecimalType(28, 9))
    counts
      .crossJoin(broadcast(tot))
      .agg(max(col("_N")).as("n_vecs"),
        max(col("_n_labels")).as("n_labels"),
        max(p).as("max_share"),
        min(p).as("min_share"),
        (lit(1.0) - sum(nDec * nDec).cast("double") /
          max(col("_N")).cast("double") /
          max(col("_N")).cast("double")).as("gini_impurity"),
        (-sum(term)).cast("double").as("entropy_bits"))
  }

  /** Deterministic class rebalancing: downsample every label to the
    * minority class's count by keeping each label's FIRST vectors in
    * vec_id order — the undersampling step a contrastive/classifier
    * training set needs after labelBalance flags skew. Id-order
    * selection (not sample()) makes membership reproducible across
    * engines, partitionings and reruns, and appending new vectors
    * never evicts an already-selected one (ids are monotone).
    *
    * Scale shape: one bounded label-count aggregate, the one-row
    * minimum broadcast, and a per-label rank window. The majority
    * label's stream lands in one window partition — at corpus scale
    * swap in the documented two-phase variant: per-label keep-rate
    * from the same count table applied as a map-side `vec_id mod`
    * filter (approximate to ±rate rounding), or range-partition
    * within label and offset ranks by per-range prefix counts (the
    * q53 sharded trade). The exact-rank form IS the oracle anchor. */
  def rebalanceLabels(emb: DataFrame): DataFrame = {
    val target = emb.groupBy(col("label"))
      .agg(count(lit(1)).as("_n"))
      .agg(min(col("_n")).as("_t"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label")).orderBy(col("vec_id"))
    emb.select(col("vec_id"), col("label"))
      .withColumn("_rn", row_number().over(w))
      .crossJoin(broadcast(target))
      .filter(col("_rn") <= col("_t"))
      .select(col("vec_id"), col("label"))
      .orderBy(col("vec_id"))
  }

  /** Int8 affine quantization round-trip report: quantize every vector
    * with the per-dimension (min, scale) table from embeddingDimStats,
    * reconstruct, and report each vector's reconstruction error — the
    * accept/reject evidence for shipping a 4× smaller index (the
    * storage half of the PQ trade, without the codebook).
    *
    * Codes are never materialized wider than the report needs: the
    * per-dim calibration is a broadcast (dim-bounded) array and the
    * quantize→reconstruct→error chain is one codegen'd map-side
    * projection per row — zero shuffles touch the vector side. MSE
    * bound (scale²/4 per dim) pinned in VectorOpsSpec. */
  def quantizeEmbeddingsReport(emb: DataFrame): DataFrame = {
    val calib = embeddingDimStats(emb)
      .select(col("dim"), col("vmin"), col("q_scale"))
    // dim-bounded: pack the calibration into ONE array row for a
    // broadcast nested-loop join (sort_array pins dim order)
    val packed = calib
      .groupBy()
      .agg(sort_array(collect_list(struct(col("dim"), col("vmin"),
        col("q_scale")))).as("_cal"))
    emb
      .crossJoin(broadcast(packed))
      .select(col("vec_id"),
        aggregate(
          zip_with(col("embedding"), col("_cal"), (v, c) => {
            val lo = c.getField("vmin")
            val sc = c.getField("q_scale")
            val code = least(lit(255.0), greatest(lit(0.0),
              round((v.cast("double") - lo) /
                when(sc === 0.0, lit(1.0)).otherwise(sc), 0)))
            val err = v.cast("double") - (lo + code *
              when(sc === 0.0, lit(1.0)).otherwise(sc))
            err * err
          }),
          lit(0.0).cast("double"), (acc, x) => acc + x)
          .as("_sse"),
        size(col("embedding")).as("_d"))
      .select(col("vec_id"), (col("_sse") / col("_d")).as("mse"))
      .orderBy(col("vec_id"))
  }
  /** Embedding-centroid drift per label: the cosine between each
    * label's mean embedding and the corpus mean — the encoder-health
    * audit a training pipeline runs per batch (swap label → source or
    * ingestion day): a label whose centroid cosine drops is drifting
    * away from the corpus distribution (domain shift, a re-encoded
    * shard, a collapsed encoder), caught from sums alone before any
    * pairwise work.
    *
    * Determinism: per-(label, dim) sums ride DECIMAL(28,8) (the q81
    * discipline — float→double is exact, double→decimal rounds
    * identically on every engine and is then order-independent);
    * the corpus sums derive from the SAME per-label decimals, so both
    * sides are bit-identical inputs to one rounded double fold.
    * Cosine is scale-invariant, so sums stand in for means exactly.
    *
    * Scale shape: one (label, dim) partial-aggregated fold touches
    * the vectors (≤ |labels|·dim rows out); the corpus roll-up, the
    * broadcast join-back and the cosine fold all run on that metadata
    * frame. */
  def labelCentroidDrift(emb: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 8)
    val per = emb
      .select(col("label"), posexplode(col("embedding"))
        .as(Seq("dim", "val")))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("val").cast("double").cast(dec)).as("_s"),
        count(lit(1)).as("_n"))
    val corpus = per.groupBy(col("dim"))
      .agg(sum(col("_s")).as("_g"))
    val gnorm = corpus.agg(
      sum(col("_g").cast("double") * col("_g").cast("double")).as("_gg"))
    per
      .join(broadcast(corpus), "dim")
      .groupBy(col("label"))
      .agg((max(col("_n"))).as("n_vecs"),
        sum(col("_s").cast("double") * col("_g").cast("double"))
          .as("_dot"),
        sum(col("_s").cast("double") * col("_s").cast("double"))
          .as("_ss"))
      .crossJoin(broadcast(gnorm))
      .select(col("label"), col("n_vecs"),
        round(col("_dot") / (sqrt(col("_ss")) * sqrt(col("_gg"))), 6)
          .as("centroid_cosine"))
      .orderBy(col("label"))
  }
  /** Embedding-norm profile per label: zero-vector count and the
    * min/max/mean L2 norm — the "did a shard come back zeroed or
    * re-scaled" check (norm distributions are tight for a healthy
    * encoder; a bimodal or shifted profile flags a mixed-version
    * index long before retrieval quality shows it). Complements q81
    * (per-dimension) with the per-row magnitude view.
    *
    * Determinism: each row's norm is one double (identical on every
    * engine — same left-to-right fold the oracle-checked cosine
    * family relies on); min/max are order-independent; the MEAN
    * rounds each norm to 6 decimals into DECIMAL pre-sum so the fold
    * is order-independent too (the q140 discipline, applied to sqrt).
    *
    * Scale shape: map-side norm per row + one bounded per-label
    * aggregate. */
  def embeddingNormProfile(emb: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val nrm = norm(col("embedding"))
    emb
      .select(col("label"), nrm.as("_n"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        count(when(col("_n") === 0.0, lit(1))).as("n_zero"),
        round(min(col("_n")), 6).as("min_norm"),
        round(max(col("_n")), 6).as("max_norm"),
        (sum(round(col("_n"), 6).cast(dec)).cast("double") /
          count(lit(1))).as("mean_norm"))
      .orderBy(col("label"))
  }
  /** Per-dimension variance profile with dead-dimension flags: exact
    * DECIMAL sums of x and x² per dim → population variance, plus a
    * flag for dims whose variance sits under `deadEps` — the
    * "collapsed/dead dimensions" audit (a dimension the encoder never
    * varies wastes index space and distorts cosine; PQ subspace
    * training degenerates on it). Complements q81 (min/max/mean) with
    * the second moment.
    *
    * Determinism: both sums ride DECIMAL(28,8)/(38,16) (float→double
    * exact, decimal rounding identical on every engine); variance
    * derives from the exact sums in one double expression, round(12).
    *
    * Scale shape: one (dim) partial-aggregated fold over the exploded
    * vectors; everything after runs on dim-count rows. */
  def dimVarianceProfile(emb: DataFrame, deadEps: Double = 1e-4)
      : DataFrame = {
    // (18,8) not (28,8) before squaring: a (28,8) product needs width
    // 57 and both engines rescale a 38-overflow DIFFERENTLY (observed
    // ~1e-8 divergence); (18,8)x(18,8) -> (37,16) stays exact in both
    val dec = org.apache.spark.sql.types.DecimalType(18, 8)
    val dec2 = org.apache.spark.sql.types.DecimalType(38, 16)
    emb
      .select(posexplode(col("embedding")).as(Seq("dim", "val")))
      .select(col("dim").cast("long").as("dim"),
        col("val").cast("double").as("v"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(dec)).as("_s1"),
        sum((col("v").cast(dec) * col("v").cast(dec)).cast(dec2))
          .as("_s2"))
      .select(col("dim"), col("n"),
        round((col("_s2").cast("double") -
          col("_s1").cast("double") * col("_s1").cast("double") /
            col("n")) / col("n"), 12).as("variance"),
        ((col("_s2").cast("double") -
          col("_s1").cast("double") * col("_s1").cast("double") /
            col("n")) / col("n") < lit(deadEps)).as("is_dead"))
      .orderBy(col("dim"))
  }

  /** Intra-label cohesion WITHOUT pairwise work: the mean pairwise dot
    * product inside a label equals (|Σv|² − Σ|v|²) / (n·(n−1)) — the
    * norm of the sum vector against the sum of norms — so the O(n²)
    * "how tight is this cluster" statistic folds from the SAME
    * per-(label, dim) decimal sums the centroid audit uses, in O(n)
    * with one bounded aggregate. Reported alongside the mean
    * self-dot (Σ|v|²/n) so the dimensionless cohesion ratio
    * mean-pair-dot / mean-self-dot reads like an average cosine for
    * unit-ish embeddings. The contrastive-training health check:
    * cohesion falling toward 0 means the label's members no longer
    * agree.
    *
    * Scale shape: one (label, dim) decimal-sum fold + one per-label
    * decimal self-dot fold; the combine runs on |labels|·dim metadata
    * rows. Nothing pairwise anywhere. */
  def labelCohesion(emb: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 8)
    val dec2 = org.apache.spark.sql.types.DecimalType(38, 16)
    // Σv per (label, dim) — the sum vector, exactly
    val sums = emb
      .select(col("label"), posexplode(col("embedding"))
        .as(Seq("dim", "val")))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("val").cast("double").cast(dec)).as("_s"))
      .groupBy(col("label"))
      .agg(sum((col("_s").cast("double") * col("_s").cast("double")))
        .as("_sumsq")) // |Σv|² — 64-term double fold, round at the end
    // Σ|v|² per label — per-row self-dot is one double, decimal-summed
    val selfs = emb
      .select(col("label"),
        GraftFunctions.vectorDot(col("embedding"), col("embedding"))
          .as("_d"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(round(col("_d"), 6).cast(dec2)).as("_selfsum"))
    selfs.join(sums, "label")
      .filter(col("n_vecs") > 1)
      .select(col("label"), col("n_vecs"),
        round((col("_sumsq") - col("_selfsum").cast("double")) /
          (col("n_vecs") * (col("n_vecs") - lit(1))).cast("double"), 6)
          .as("mean_pair_dot"),
        round(col("_selfsum").cast("double") /
          col("n_vecs").cast("double"), 6).as("mean_self_dot"),
        round(((col("_sumsq") - col("_selfsum").cast("double")) /
          (col("n_vecs") * (col("n_vecs") - lit(1))).cast("double")) /
          (col("_selfsum").cast("double") /
            col("n_vecs").cast("double")), 6).as("cohesion_ratio"))
      .orderBy(col("label"))
  }

  /** IVF self-evaluation (x31's discipline for the vector index): for
    * each nprobe in 1..maxProbe, recall@k and precision@k of the
    * partition-pruned IVF search against the exact brute-force top-k
    * on the SAME query set — the nprobe-tuning curve an index
    * operator measures before committing a recall target ("how many
    * buckets must I probe to hit 95%?"). Both sides exclude self-
    * matches; the ground truth is computed ONCE and each probe level
    * joins against it on (q_id, n_id).
    *
    * Scale shape: at 100 TB the evaluation runs on a query SAMPLE
    * (queryIds — the statistic needs coverage, not the corpus); each
    * probe level replays the x04 partition-pruned search plan, the
    * truth side is one brute-force pass, and every comparison join is
    * |queries|·k rows — driver-bounded metadata. */
  def ivfEvalReport(emb: DataFrame, queryIds: Seq[Long],
      k: Int = 10, maxProbe: Int = 3,
      codebook: Option[DataFrame] = None): DataFrame = {
    require(maxProbe >= 1, "maxProbe must be positive")
    val exact = annBruteForce(emb, queryIds, k)
      .select(col("q_id"), col("n_id"), lit(1).as("_e"))
    val levels = (1 to maxProbe).map { p =>
      annIvf(emb, queryIds, k, nprobe = p, codebook = codebook)
        .select(col("q_id"), col("n_id"), lit(1).as("_i"))
        .join(exact, Seq("q_id", "n_id"), "full_outer")
        .agg(count(col("_e")).as("n_exact"),
          count(col("_i")).as("n_ivf"),
          count(when(col("_e").isNotNull && col("_i").isNotNull,
            lit(1))).as("n_both"))
        .select(lit(p.toLong).as("nprobe"), col("n_exact"),
          col("n_ivf"), col("n_both"),
          round(col("n_both").cast("double") /
            col("n_exact").cast("double"), 12).as("recall"),
          round(col("n_both").cast("double") /
            col("n_ivf").cast("double"), 12).as("precision"))
    }
    levels.reduce(_ unionAll _).orderBy(col("nprobe"))
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix (upper triangle,
    * row-major). Driver-side O(d³) on a d×d matrix that is bounded
    * metadata (d=64 → 4 KB); returns (eigenvalues desc, eigenvectors as
    * rows aligned with the values). Deterministic: fixed sweep order,
    * fixed convergence threshold. */
  private[operators] def jacobiEigen(d: Int, upper: Array[Double])
      : (Array[Double], Array[Array[Double]]) = {
    val a = Array.tabulate(d, d) { (i, j) =>
      val (r, c) = if (i <= j) (i, j) else (j, i)
      upper(r * d - r * (r - 1) / 2 + (c - r))
    }
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          off += a(p)(q) * a(p)(q)
          if (math.abs(a(p)(q)) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i)).toArray
    (order.map(i => a(i)(i)),
      order.map(i => (0 until d).map(k => v(k)(i)).toArray))
  }

  /** PCA over the embedding column (x36) — the spectrum report a
    * whitening/compression decision reads: per principal component its
    * eigenvalue (variance), explained fraction and the cumulative
    * curve, plus the measured mean squared reconstruction error of the
    * rank-k truncation as a verification column.
    *
    * Scale shape — the two-pass plan that works at 100 TB:
    *  1. ONE GramMatrix aggregate (custom TypedImperativeAggregate):
    *     partial state is d(d+1)/2+d+1 doubles per partition, so the
    *     shuffle carries ~17 KB per map task for d=64 — never the
    *     corpus. Covariance = G/n − μμᵀ on the driver; the Jacobi
    *     eigensolve is O(d³) driver metadata work.
    *  2. ONE verification pass: the top-k eigenvectors ride into the
    *     scan as literal arrays; each row's rank-k residual is
    *     computed by Parseval (‖x−μ‖² − Σⱼ⟨x−μ,vⱼ⟩²) with j map-side
    *     VectorDot calls — no second shuffle beyond a 1-row aggregate.
    * The compositional alternative (posexplode + self-join on vec_id +
    * d² groupBy) shuffles d·|corpus| rows; this plan shuffles O(d²).
    *
    * Eigenvector SIGNS and near-degenerate eigenvalue order are
    * engine/float-order-dependent → registered rows-only; VectorOpsSpec
    * pins analytic 2-d goldens, orthonormality, the trace identity
    * (Σλ = Σ per-dim variance, ties to q153) and residual==1−cum. */
  /** The fitted PCA basis: row count, mean vector, eigenvalues (desc)
    * and matching eigenvectors — driver-side bounded metadata. */
  private[operators] final case class PcaBasis(n: Long,
      mean: Array[Double], evals: Array[Double],
      evecs: Array[Array[Double]])

  /** The GramMatrix sufficient statistic as a 1-row frame (n, sums,
    * gram) — persistable (write it next to the corpus snapshot) and
    * mergeable by pure array addition, which is what makes PCA
    * maintenance INCREMENTAL: a new drop's statistic folds into the
    * stored one without ever re-reading the old corpus. */
  def gramStats(emb: DataFrame): DataFrame =
    emb.agg(
      graft.functions.GraftFunctions.gramMatrix(col("embedding"))
        .as("_g"))
      .select(col("_g.n").as("n"), col("_g.sums").as("sums"),
        col("_g.gram").as("gram"))

  /** Covariance + Jacobi from raw moments (shared by the one-shot and
    * incremental fits). */
  private def basisFromMoments(n: Long, sums: Array[Double],
      gram: Array[Double]): PcaBasis = {
    require(n > 1, s"PCA needs at least 2 vectors, got $n")
    val d = sums.length
    val mean = sums.map(_ / n)
    val cov = new Array[Double](d * (d + 1) / 2)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        cov(idx) = gram(idx) / n - mean(i) * mean(j)
        idx += 1; j += 1
      }
      i += 1
    }
    val (evals, evecs) = jacobiEigen(d, cov)
    PcaBasis(n, mean, evals, evecs)
  }

  /** ONE GramMatrix pass + driver covariance + Jacobi (shared by the
    * x36 report and the x37 whitening transform). */
  private[operators] def pcaBasis(emb: DataFrame): PcaBasis = {
    val stats = gramStats(emb).head()
    basisFromMoments(stats.getAs[Long]("n"),
      stats.getSeq[Double](stats.fieldIndex("sums")).toArray,
      stats.getSeq[Double](stats.fieldIndex("gram")).toArray)
  }

  /** Incremental PCA refresh (x39): merge a PERSISTED sufficient
    * statistic (a [[gramStats]] frame — in practice read back from the
    * corpus snapshot's sidecar) with a new batch's statistic and
    * re-solve — the old corpus is never re-read. The merge is array
    * addition of d²-bounded metadata; the only data pass is over the
    * new batch. Emits the x36 spectrum columns (no measured-residual
    * column: the verification pass would need the full corpus, which
    * is exactly what incremental maintenance avoids — VectorOpsSpec
    * pins incremental == from-scratch on the union instead). */
  def pcaReportIncremental(oldStats: DataFrame, newBatch: DataFrame,
      k: Int = 8): DataFrame = {
    val spark = newBatch.sparkSession
    val o = oldStats.select(col("n"), col("sums"), col("gram")).head()
    val b = gramStats(newBatch).head()
    def arr(r: org.apache.spark.sql.Row, f: String): Array[Double] =
      r.getSeq[Double](r.fieldIndex(f)).toArray
    val (on, os, og) = (o.getAs[Long]("n"), arr(o, "sums"), arr(o, "gram"))
    val (bn, bs, bg) = (b.getAs[Long]("n"), arr(b, "sums"), arr(b, "gram"))
    val (n, sums, gram) =
      if (on == 0) (bn, bs, bg)
      else if (bn == 0) (on, os, og)
      else {
        require(os.length == bs.length,
          s"dimension mismatch: stored d=${os.length}, batch d=${bs.length}")
        (on + bn, os.zip(bs).map { case (x, y) => x + y },
          og.zip(bg).map { case (x, y) => x + y })
      }
    val PcaBasis(_, _, evals, _) = basisFromMoments(n, sums, gram)
    val kk = math.min(k, sums.length)
    val totalVar = evals.sum
    val cums = evals.scanLeft(0.0)(_ + _).drop(1)
    import spark.implicits._
    (0 until kk).map { j =>
      (j + 1, evals(j), evals(j) / totalVar, cums(j) / totalVar)
    }.toDF("component", "eigenvalue", "explained_frac",
      "cum_explained_frac")
      .orderBy(col("component"))
  }

  def pcaReport(emb: DataFrame, k: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    val PcaBasis(n, mean, evals, evecs) = pcaBasis(emb)
    val d = mean.length
    val kk = math.min(k, d)
    val totalVar = evals.sum
    // pass 2: measured rank-k reconstruction error via Parseval
    // projections use x·v − μ·v (linearity); literals ride as
    // ARRAY<FLOAT> (VectorDot's native type — the ~1e-7 relative float
    // rounding of the eigenvector literals is far below the report's
    // meaning, and the hot loop stays whole-stage-codegen'd)
    val centered = "embedding"
    def flit(xs: Array[Double]): Column =
      array(xs.map(x => lit(x.toFloat)): _*)
    val projCols = (0 until kk).map { j =>
      val muDotV = mean.zip(evecs(j)).map { case (m, vv) => m * vv }.sum
      val p = dot(col(centered), flit(evecs(j))) - lit(muDotV)
      p * p
    }
    val muDotMu = mean.map(m => m * m).sum
    val normSq = dot(col(centered), col(centered)) -
      lit(2.0) * dot(col(centered), flit(mean)) + lit(muDotMu)
    // clamped at 0 (same guard as botRegularity's variance): the dot
    // products use float-cast eigenvector/mean literals while muDotV/
    // muDotMu are full-double constants, so a per-row Parseval
    // residual can land epsilon-negative near k=d and push
    // recon_error_frac_at_k marginally below 0 (r12 advisor finding)
    val resid = emb.select(
      greatest(normSq - projCols.reduce(_ + _), lit(0.0)).as("_r"),
      normSq.as("_n2"))
      .agg(sum(col("_r")).as("_sr"), sum(col("_n2")).as("_sn"))
      .head()
    val reconFrac = resid.getAs[Double]("_sr") / resid.getAs[Double]("_sn")
    import spark.implicits._
    val cums = evals.scanLeft(0.0)(_ + _).drop(1)
    (0 until kk).map { j =>
      (j + 1, evals(j), evals(j) / totalVar, cums(j) / totalVar,
        reconFrac)
    }.toDF("component", "eigenvalue", "explained_frac",
      "cum_explained_frac", "recon_error_frac_at_k")
      .orderBy(col("component"))
  }

  /** PCA WHITENING transform (x37) — x36's apply side: each embedding
    * is centered, projected onto the top-k principal axes and scaled by
    * 1/√λ, yielding decorrelated unit-variance coordinates (the
    * preprocessing SemDeDup-style embedding dedup and ANN quantizers
    * assume). Emits the first min(4,k) whitened coordinates as scalar
    * columns plus the full whitened norm — scalars because downstream
    * tabular tooling (and the driver's compare) can't order list
    * columns; callers needing the full vector compose the same
    * projection columns.
    *
    * Scale shape: the fit is x36's one GramMatrix pass; the transform
    * is k VectorDot projections per row with eigenvector LITERALS in
    * the scan — map-side only, zero shuffle beyond the output sort.
    * Components with λ ≤ 1e-12·λ₁ are dropped (whitening a dead
    * direction divides by ~0). */
  def whitenEmbeddings(emb: DataFrame, k: Int = 8): DataFrame = {
    val PcaBasis(_, mean, evals, evecs) = pcaBasis(emb)
    val kept = math.min(k, evals.count(_ > evals.headOption.getOrElse(0.0) * 1e-12))
    require(kept > 0, "no components with positive variance")
    def flit(xs: Array[Double]): Column =
      array(xs.map(x => lit(x.toFloat)): _*)
    val ys = (0 until kept).map { j =>
      val muDotV = mean.zip(evecs(j)).map { case (m, v) => m * v }.sum
      ((dot(col("embedding"), flit(evecs(j))) - lit(muDotV)) /
        lit(math.sqrt(evals(j)))).as(s"y${j + 1}")
    }
    val normSq = ys.map(y => y * y).reduce(_ + _)
    val head = ys.take(4)
    emb.select(
      (col("vec_id") +: col("label") +: head :+
        sqrt(normSq).as("whitened_norm")): _*)
      .orderBy(col("vec_id"))
  }

  /** q197: kNN-graph hubness audit (Radovanović et al. 2010) — the
    * in-degree distribution of the exact cosine top-k graph over a
    * bounded query panel. High-dimensional embedding spaces grow
    * HUBS: vectors that appear in everyone's neighbor list (skewing
    * dedup, retrieval and kNN label votes toward a few points) and
    * anti-hubs retrieval can never reach. The histogram (how many
    * vectors are retrieved 0×, 1×, 2×, … across the panel) is the
    * embedding-health check that catches this before x19 SemDeDup or
    * q56 kNN voting inherit the skew — a healthy space concentrates
    * near in-degree ≈ k·|panel|/N; a hubby one grows a long tail.
    *
    * Determinism: membership in a top-k list is the q30 contract
    * (cosine desc, n_id tiebreak, identical double chains), so the
    * integer in-degrees — and the zero-retrieval row derived as
    * N − |retrieved| — hash-match the oracle exactly.
    *
    * Scale shape: the panel (vec_id < nQueries) broadcasts; scoring
    * is map-side over ONE corpus scan; the bounded-heap top-k
    * aggregate ships ≤ k rows per query; every aggregate after runs
    * on the k·|panel| pair list — metadata. For a corpus-sized panel,
    * run the same histogram over the x04 IVF index's results. */
  /** q206: label-noise audit via kNN disagreement (the confident-
    * learning / cleanlab screen): for each panel vector, the fraction
    * of its exact cosine top-k neighbors carrying a DIFFERENT label;
    * per label: panel size, mean disagreement, and suspects
    * (disagreement > 1/2 — the majority of the neighborhood votes
    * against the assigned label). The pre-training screen that
    * catches mislabeled embeddings before q56's kNN voting or a
    * classifier inherits them.
    *
    * Determinism: neighbor membership is q30's contract; the
    * disagreement is an exact-count ratio (÷k), per-label means
    * divide exact decimal sums once, round 12.
    *
    * Scale shape: q197's — the panel broadcasts, scoring is map-side
    * over ONE corpus scan, the bounded-heap top-k ships ≤k rows per
    * query, and the disagreement/label folds run on k·|panel|
    * metadata. For a corpus-sized panel, run the same fold over the
    * x04 IVF index's neighbor lists. */
  def labelNoise(emb: DataFrame, nQueries: Long = 100L, k: Int = 10)
      : DataFrame = {
    require(nQueries > 0, "nQueries must be positive")
    val dec = org.apache.spark.sql.types.DecimalType(18, 12)
    val queries = emb
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("label").as("_ql"),
        col("embedding").as("q_emb"), norm(col("embedding")).as("_qn"))
    val scored = emb.select(col("vec_id"), col("label"),
        col("embedding"), norm(col("embedding")).as("_nrm"))
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosPre(dot(col("q_emb"), col("embedding")), col("_qn"),
          col("_nrm")).as("cosine"))
    val perQuery = rankTopK(scored, k)
      .join(broadcast(queries.select(col("q_id"), col("_ql"))), "q_id")
      .join(emb.select(col("vec_id").as("n_id"),
        col("label").as("_nl")), "n_id")
      .groupBy(col("q_id"), col("_ql"))
      .agg(count(lit(1)).as("_k"),
        count(when(col("_nl") =!= col("_ql"), lit(1))).as("_d"))
      .select(col("_ql").as("label"),
        round(col("_d").cast("double") / col("_k").cast("double"), 12)
          .as("_frac"),
        (col("_d") * 2 > col("_k")).as("_suspect"))
    perQuery
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_queries"),
        round(sum(col("_frac").cast(dec)).cast("double") /
          count(lit(1)).cast("double"), 12).as("mean_disagreement"),
        count(when(col("_suspect"), lit(1))).as("n_suspect"))
      .orderBy(col("label"))
  }

  def knnHubness(emb: DataFrame, nQueries: Long = 100L, k: Int = 10)
      : DataFrame = {
    require(nQueries > 0, "nQueries must be positive")
    val queries = emb
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        norm(col("embedding")).as("_qn"))
    val scored = emb.select(col("vec_id"), col("embedding"),
        norm(col("embedding")).as("_nrm"))
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosPre(dot(col("q_emb"), col("embedding")), col("_qn"),
          col("_nrm")).as("cosine"))
    val inDeg = rankTopK(scored, k)
      .groupBy(col("n_id"))
      .agg(count(lit(1)).as("_deg"))
    val hist = inDeg
      .groupBy(col("_deg").as("in_degree"))
      .agg(count(lit(1)).as("n_vectors"))
    val total = emb.agg(count(lit(1)).as("_N"))
    val reached = inDeg.agg(count(lit(1)).as("_R"))
    val zeroRow = total.crossJoin(reached)
      .select(lit(0L).as("in_degree"),
        (col("_N") - col("_R")).as("n_vectors"))
      .filter(col("n_vectors") > 0)
    hist.unionByName(zeroRow)
      .crossJoin(broadcast(total))
      .select(col("in_degree"), col("n_vectors"),
        round(col("n_vectors").cast("double") / col("_N"), 12)
          .as("frac_vectors"))
      .orderBy(col("in_degree"))
  }
}
