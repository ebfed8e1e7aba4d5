package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the polynomial rolling hash
  * h = (h·31 + codepoint) mod 1e9+7 — the document-fingerprinting
  * primitive, implemented with whole-stage codegen so the hot path is a
  * tight generated loop instead of the equivalent
  * split→transform→aggregate expression tree (TextFunctions.rollingHash),
  * which materializes a per-character array. Same result, ~10× less
  * allocation on long documents; this is the preferred extension point
  * order from SURVEY §4.2 (custom Expression before custom operator).
  */
case class RollingHash(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("str")
      val h = ctx.freshName("hash")
      val i = ctx.freshName("idx")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * 31L + $cp) % 1000000007L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** Session registration + Column-API access for the engine's native
  * Catalyst expressions (RollingHash, VectorDot, MinHashSig, SimHash63).
  * The no-session helpers register against `SparkSession.active` — the
  * session constructing the plan is the one that analyzes it. */
object GraftFunctions {
  val ROLLING_HASH = "graft_rolling_hash"
  val VECTOR_DOT = "graft_vector_dot"
  val MINHASH_SIG = "graft_minhash_sig"
  val SIMHASH = "graft_simhash63"
  val SHINGLE_HASHES = "graft_shingle_hashes"
  val TOP_K = "graft_top_k"
  val HYPERPLANE_BITS = "graft_hyperplane_bits"
  val MISRA_GRIES = "graft_misra_gries"
  val NEAREST_CENTROID = "graft_nearest_centroid"
  val COLLAPSE_RUNS = "graft_collapse_runs"
  val BLOOM_AGG = "graft_bloom_agg"
  val BLOOM_MIGHT_CONTAIN = "graft_bloom_might_contain"
  val REPETITION_STATS = "graft_repetition_stats"
  val DOC_PROFILE_STATS = "graft_doc_profile_stats"
  val ROW_TOP_K = "graft_row_top_k"
  val PQ_SUB_ARGMIN = "graft_pq_sub_argmin"
  val PQ_CODES = "graft_pq_codes"
  val BPE_SEGMENT = "graft_bpe_segment"
  val TOP_CENTROIDS = "graft_top_centroids"
  val NORMALIZE_TEXT = "graft_normalize_text"
  val LUHN_SCRUB = "graft_luhn_scrub"
  val JARO_WINKLER = "graft_jaro_winkler"
  val DEFLATE_SIZE = "graft_deflate_size"
  val GRAM_MATRIX = "graft_gram_matrix"
  val COLLAPSE_NGRAM_RUNS = "graft_collapse_ngram_runs"

  /** Exact-arity guard for registered builders: without it SQL callers
    * passing EXTRA arguments would have them silently dropped
    * (`exprs.head` ignores the tail), and missing arguments would
    * surface as a bare IndexOutOfBounds instead of an analysis-time
    * arity message — the same rigor checkInputDataTypes applies to
    * types, applied to argument count. */
  private def arity(name: String, n: Int, exprs: Seq[Expression])
      (build: Seq[Expression] => Expression): Expression = {
    if (exprs.length != n) throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> name, "expectedNum" -> n.toString,
        "actualNum" -> exprs.length.toString, "docroot" -> ""))
    build(exprs)
  }

  /** Idempotent; register once per session, then use from Column API or
    * SQL (`SELECT graft_rolling_hash(text) ...`). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // True idempotence: `registered` calls this on EVERY Column
    // construction, and createOrReplaceTempFunction logs a "replacing"
    // warning per function each time — skip when this session already
    // has the full set (ROW_TOP_K is registered last, so its presence
    // implies all of them).
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(ROW_TOP_K))) return
    reg.createOrReplaceTempFunction(
      ROLLING_HASH,
      exprs => arity(ROLLING_HASH, 1, exprs)(e => RollingHash(e.head)),
      "built-in")
    reg.createOrReplaceTempFunction(
      VECTOR_DOT,
      exprs => arity(VECTOR_DOT, 2, exprs)(e => VectorDot(e(0), e(1))),
      "built-in")
    reg.createOrReplaceTempFunction(
      MINHASH_SIG,
      exprs => arity(MINHASH_SIG, 3, exprs)(e =>
        MinHashSig(e(0), e(1), e(2))),
      "built-in")
    reg.createOrReplaceTempFunction(
      SIMHASH,
      exprs => arity(SIMHASH, 1, exprs)(e => SimHash63(e.head)), "built-in")
    reg.createOrReplaceTempFunction(
      SHINGLE_HASHES,
      exprs => arity(SHINGLE_HASHES, 3, exprs)(e =>
        ShingleHashes(e(0), e(1), e(2))), "built-in")
    reg.createOrReplaceTempFunction(
      TOP_K,
      exprs => arity(TOP_K, 3, exprs)(e => BoundedTopK(e(0), e(1), e(2))),
      "built-in")
    reg.createOrReplaceTempFunction(
      HYPERPLANE_BITS,
      exprs => arity(HYPERPLANE_BITS, 4, exprs)(e =>
        HyperplaneBits(e(0), e(1), e(2), e(3))),
      "built-in")
    reg.createOrReplaceTempFunction(
      MISRA_GRIES,
      exprs => arity(MISRA_GRIES, 2, exprs)(e => MisraGries(e(0), e(1))),
      "built-in")
    reg.createOrReplaceTempFunction(
      NEAREST_CENTROID,
      exprs => arity(NEAREST_CENTROID, 4, exprs)(e =>
        NearestCentroidIdx(e(0), e(1), e(2), e(3))),
      "built-in")
    reg.createOrReplaceTempFunction(
      TOP_CENTROIDS,
      exprs => arity(TOP_CENTROIDS, 5, exprs)(e =>
        TopCentroidIdxs(e(0), e(1), e(2), e(3), e(4))),
      "built-in")
    reg.createOrReplaceTempFunction(
      COLLAPSE_RUNS,
      exprs => arity(COLLAPSE_RUNS, 1, exprs)(e => CollapseRuns(e.head)),
      "built-in")
    // Spark's own runtime-join-pruning bloom expressions, exposed at the
    // user level (they are public but unregistered — the optimizer
    // normally injects them itself in InjectRuntimeFilter)
    reg.createOrReplaceTempFunction(
      BLOOM_AGG,
      exprs => arity(BLOOM_AGG, 3, exprs)(e =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(e(0), e(1), e(2))),
      "built-in")
    reg.createOrReplaceTempFunction(
      BLOOM_MIGHT_CONTAIN,
      exprs => arity(BLOOM_MIGHT_CONTAIN, 2, exprs)(e =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(e(0), e(1))),
      "built-in")
    reg.createOrReplaceTempFunction(
      REPETITION_STATS,
      exprs => arity(REPETITION_STATS, 1, exprs)(e =>
        RepetitionStats(e.head)), "built-in")
    reg.createOrReplaceTempFunction(
      DOC_PROFILE_STATS,
      exprs => arity(DOC_PROFILE_STATS, 1, exprs)(e =>
        DocProfileStats(e.head)), "built-in")
    reg.createOrReplaceTempFunction(
      PQ_SUB_ARGMIN,
      exprs => arity(PQ_SUB_ARGMIN, 2, exprs)(e => PqSubArgmin(e(0), e(1))),
      "built-in")
    reg.createOrReplaceTempFunction(
      PQ_CODES,
      exprs => arity(PQ_CODES, 2, exprs)(e => PqArgminCodes(e(0), e(1))),
      "built-in")
    reg.createOrReplaceTempFunction(
      BPE_SEGMENT,
      exprs => arity(BPE_SEGMENT, 2, exprs)(e => BpeSegment(e(0), e(1))),
      "built-in")
    reg.createOrReplaceTempFunction(
      ROW_TOP_K,
      exprs => arity(ROW_TOP_K, 3, exprs)(e => RowTopK(e(0), e(1), e(2))),
      "built-in")
    reg.createOrReplaceTempFunction(
      NORMALIZE_TEXT,
      exprs => arity(NORMALIZE_TEXT, 1, exprs)(e => NormalizeText(e.head)),
      "built-in")
    reg.createOrReplaceTempFunction(
      LUHN_SCRUB,
      exprs => arity(LUHN_SCRUB, 1, exprs)(e => LuhnScrub(e.head)),
      "built-in")
    reg.createOrReplaceTempFunction(
      JARO_WINKLER,
      exprs => arity(JARO_WINKLER, 2, exprs)(e => JaroWinkler(e(0), e(1))),
      "built-in")
    reg.createOrReplaceTempFunction(
      DEFLATE_SIZE,
      exprs => arity(DEFLATE_SIZE, 1, exprs)(e => DeflateSize(e.head)),
      "built-in")
    reg.createOrReplaceTempFunction(
      GRAM_MATRIX,
      exprs => arity(GRAM_MATRIX, 1, exprs)(e => GramMatrix(e.head)),
      "built-in")
    reg.createOrReplaceTempFunction(
      COLLAPSE_NGRAM_RUNS,
      exprs => arity(COLLAPSE_NGRAM_RUNS, 2, exprs)(e =>
        CollapseNgramRuns(e(0), e(1))),
      "built-in")
  }

  private def registered(name: String, cols: Column*): Column = {
    register(SparkSession.active)
    call_function(name, cols: _*)
  }

  def rollingHash(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function(ROLLING_HASH, c)
  }

  /** Σ aᵢ·bᵢ in double, codegen'd (see VectorDot). */
  def vectorDot(a: Column, b: Column): Column =
    registered(VECTOR_DOT, a, b)

  /** One-pass second-moment aggregate: struct<n, sums[d],
    * gram[d(d+1)/2]> — the PCA sufficient statistic with d²-bounded
    * partial state (see GramMatrix). */
  def gramMatrix(vec: Column): Column = registered(GRAM_MATRIX, vec)

  /** Aligned repeated n-gram RUN removal in one map-side pass:
    * struct<clean, n_raw, n_removed> (see CollapseNgramRuns). */
  def collapseNgramRuns(text: Column, n: Int): Column =
    registered(COLLAPSE_NGRAM_RUNS, text, lit(n))

  /** MinHash signature of a hash array under fixed seed pairs. */
  def minHashSig(hashes: Column, a: Seq[Long], b: Seq[Long]): Column =
    registered(MINHASH_SIG, hashes,
      org.apache.spark.sql.functions.array(a.map(lit): _*),
      org.apache.spark.sql.functions.array(b.map(lit): _*))

  /** 63-bit SimHash of a token-hash array. */
  def simHash63(hashes: Column): Column = registered(SIMHASH, hashes)

  /** Distinct n-gram shingle hashes (xxhash64 mod `mod`) in one pass. */
  def shingleHashes(text: Column, n: Int, mod: Long): Column =
    registered(SHINGLE_HASHES, text, lit(n), lit(mod))

  /** All random-hyperplane LSH band bit-values in one native pass (see
    * HyperplaneBits); planes derived from (seed, dim-of-row). */
  def hyperplaneBits(vec: Column, bands: Int, rowsPerBand: Int,
      seed: Long): Column =
    registered(HYPERPLANE_BITS, vec, lit(bands), lit(rowsPerBand), lit(seed))

  /** Bounded top-k aggregate: best-first array<struct<score,id>>, with
    * map-side partial aggregation (≤k rows per group per partition hit
    * the shuffle — see BoundedTopK). */
  def topK(score: Column, id: Column, k: Int): Column =
    registered(TOP_K, score, id, lit(k))

  /** Mergeable Misra-Gries heavy-hitter sketch: struct<n, candidates>
    * with every item of frequency > n/k guaranteed present (see
    * MisraGries — a candidate generator for an exact second pass). */
  def misraGries(item: Column, k: Int): Column =
    registered(MISRA_GRIES, item, lit(k))

  /** Nearest-centroid index by cosine over a packed codebook (see
    * NearestCentroidIdx); -1 for an empty codebook. */
  def nearestCentroidIdx(vec: Column, vecNorm: Column, centroidVecs: Column,
      centroidNorms: Column): Column =
    registered(NEAREST_CENTROID, vec, vecNorm, centroidVecs, centroidNorms)

  /** Top-`probes` centroid array positions by cosine over a packed
    * codebook, descending similarity, ties to the smaller position
    * (see TopCentroidIdxs); element 0 == nearestCentroidIdx. */
  def topCentroidIdxs(vec: Column, vecNorm: Column, centroidVecs: Column,
      centroidNorms: Column, probes: Column): Column =
    registered(TOP_CENTROIDS, vec, vecNorm, centroidVecs, centroidNorms,
      probes)

  /** Run-length token collapse in one native pass: struct<clean, n_raw,
    * n_kept> (see CollapseRuns). */
  def collapseRuns(text: Column): Column = registered(COLLAPSE_RUNS, text)

  /** Control-strip + whitespace-collapse + Unicode NFC in one native
    * pass (see NormalizeText). */
  def normalizeText(text: Column): Column =
    registered(NORMALIZE_TEXT, text)

  /** Luhn-validated payment-card redaction in one native pass:
    * struct<clean, n_cards> (see LuhnScrub). */
  def luhnScrub(text: Column): Column = registered(LUHN_SCRUB, text)

  /** Jaro-Winkler similarity over UTF-8 bytes, DuckDB-parity semantics
    * (see JaroWinkler). */
  def jaroWinkler(a: Column, b: Column): Column =
    registered(JARO_WINKLER, a, b)

  /** DEFLATE-compressed UTF-8 byte count, codegen'd (see DeflateSize). */
  def deflateSize(text: Column): Column =
    registered(DEFLATE_SIZE, text)

  /** Repetition counters in one native pass: struct<n_bigrams,
    * max_bigram_count, n_trigrams, n_distinct_trigrams, max_run> (see
    * RepetitionStats). */
  def repetitionStats(text: Column): Column =
    registered(REPETITION_STATS, text)

  /** Doc-profile counters in one native pass: struct<n_tokens,
    * token_len_sum, stopword_hits, en_hits, n_subtokens, alpha_chars>
    * (see DocProfileStats). */
  def docProfileStats(text: Column): Column =
    registered(DOC_PROFILE_STATS, text)

  /** Bloom filter of a LONG column as a binary aggregate (Spark's
    * BloomFilterAggregate — mergeable, so partial aggregation applies;
    * the filter itself is a broadcastable bitset). */
  def bloomAgg(item: Column, expectedItems: Long, numBits: Long): Column =
    registered(BLOOM_AGG, item, lit(expectedItems), lit(numBits))

  /** Membership probe against a bloomAgg bitset: false-positive-only
    * (never false-negative). */
  def bloomMightContain(bloom: Column, item: Column): Column =
    registered(BLOOM_MIGHT_CONTAIN, bloom, item)

  /** Whole-row bounded top-k aggregate: array of `value` payloads for
    * the k smallest `orderKey`s per group (see RowTopK — the aggregate
    * the rank-rewrite rule targets, usable directly too). */
  def rowTopK(orderKey: Column, value: Column, k: Int): Column =
    registered(ROW_TOP_K, orderKey, value, lit(k))

  /** Nearest-centroid PQ code (array position) of one subvector by
    * squared L2 (see PqSubArgmin); -1 for an empty centroid list. */
  def pqSubArgmin(sv: Column, cents: Column): Column =
    registered(PQ_SUB_ARGMIN, sv, cents)

  /** All m PQ codes of a vector against the packed codebook in one
    * native two-level loop (see PqArgminCodes). */
  def pqCodes(vec: Column, codebook: Column): Column =
    registered(PQ_CODES, vec, codebook)

  /** BPE tokens of a document against rank-ordered "left right" merge
    * rules (see BpeSegment). */
  def bpeSegment(text: Column, rules: Column): Column =
    registered(BPE_SEGMENT, text, rules)
}
