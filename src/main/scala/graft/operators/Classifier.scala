package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions

/** Model-in-the-loop quality classification — the missing tier between
  * the rule-based gates (q64/q105) and a real fastText/BERT filter:
  * a linear (logistic) model over cheap, SQL-expressible text features,
  * with BOTH halves of the lifecycle as engine operators:
  *
  *  - [[scoreQualityLogit]] (q185): INFERENCE with a fixed, published
  *    weight vector. Scoring is one map-side expression chain per doc
  *    plus one bounded per-source aggregate — the shape CCNet/C4 used
  *    to apply their quality LMs corpus-wide.
  *  - [[trainQualityLogit]] (x35): TRAINING by full-batch gradient
  *    descent where each iteration is ONE Spark aggregate producing the
  *    (d+1)-dimensional gradient + scalar loss/accuracy; the driver
  *    holds only the weight vector. This is the textbook data-parallel
  *    GD decomposition (gradient of a sum = sum of per-row gradients),
  *    so the per-iteration cost at 100 TB is a map-side partial
  *    aggregate — no parameter server, no shuffle wider than
  *    (d+2) doubles per partition.
  *
  * Engine parity (q185 is oracle-checked): every feature is an exact
  * integer ratio divided once in IEEE double, rounded to 6 decimals and
  * cast to DECIMAL(12,6) (the q140 libm discipline); the score is then
  * an EXACT decimal dot product with DECIMAL(6,4) weights, so per-doc
  * scores, threshold counts and decimal score sums are bit-identical
  * regardless of row order or partitioning. The only doubles are the
  * two final per-source divisions, rounded to 12.
  *
  * Reference anchor: the reference's transform tier filters on
  * rule-based validity (etl/etl.py:224-297); this operator family is
  * the scaled-up version of that gate for LLM corpus curation.
  */
object Classifier {

  /** Fixed inference weights for q185 — intercept, ttr, stopword
    * fraction, digit density, chars-per-token. Signs follow the
    * standard quality heuristics (function words up, digit walls down,
    * very long "tokens" = markup/base64 down). */
  val DefaultWeights: Seq[(String, BigDecimal)] = Seq(
    "intercept" -> BigDecimal("-1.5000"),
    "f_ttr" -> BigDecimal("2.0000"),
    "f_stop" -> BigDecimal("6.0000"),
    "f_digit" -> BigDecimal("-8.0000"),
    "f_cpt" -> BigDecimal("-0.1000"))

  /** Feature/weight decimal widths are deliberately NARROW: Spark's
    * decimal addition grows precision by one digit per term, and once a
    * chain hits the 38-digit cap `allowPrecisionLoss` silently drops
    * scale (the score would quietly lose its low digits and diverge
    * from the oracle's exact HUGEINT-backed decimals — measured as a
    * 1e-7 drift before narrowing). (12,6) features × (6,4) weights
    * peak at DECIMAL(23,10) across the whole dot product. */
  private val FeatDec = DecimalType(12, 6)
  private val WeightDec = DecimalType(6, 4)

  /** Per-doc feature columns (map-side only; no explode — the token
    * array is built once and folded with array functions). Each
    * feature: exact-int ratio → one IEEE division → round 6 →
    * DECIMAL(18,6), identical on Spark and the oracle. */
  private def featureCols: Seq[(String, Column)] = {
    val toks = TextFunctions.tokens(col("text"))
    val nTok = size(toks).cast("long")
    val nChars = length(col("text")).cast("long")
    val stops = TextOps.ProfileStopwords
    def ratio(num: Column, den: Column): Column =
      when(den > 0, round(num.cast("double") / den.cast("double"), 6))
        .otherwise(lit(0d))
        .cast(FeatDec)
    Seq(
      "f_ttr" -> ratio(size(array_distinct(toks)).cast("long"), nTok),
      "f_stop" -> ratio(
        size(filter(toks, t => t.isin(stops.map(lit): _*))).cast("long"),
        nTok),
      "f_digit" -> ratio(
        (nChars - length(regexp_replace(col("text"), "[0-9]", ""))
          .cast("long")),
        nChars),
      "f_cpt" -> ratio(nChars, nTok))
  }

  /** Exact decimal score column from [[featureCols]] + a weight map. */
  private def scoreCol(weights: Seq[(String, BigDecimal)]): Column = {
    val wmap = weights.toMap
    featureCols.foldLeft(
      lit(wmap("intercept").underlying()).cast(WeightDec)
        .cast(DecimalType(19, 10))) {
      case (acc, (name, f)) =>
        acc + f * lit(wmap(name).underlying()).cast(WeightDec)
    }
  }

  /** q185: score every document with the fixed linear quality model and
    * report per source: docs, docs passing the score>0 gate, pass rate
    * and mean score.
    *
    * Scale shape: ONE scan — features and the decimal score are
    * per-row expressions inside whole-stage codegen; the aggregate is
    * map-side partial to |sources| rows (counts + one exact decimal
    * sum). Nothing downstream of the scan is data-sized. */
  def scoreQualityLogit(docs: DataFrame,
      weights: Seq[(String, BigDecimal)] = DefaultWeights): DataFrame =
    docs
      .select(col("source"), scoreCol(weights).as("_score"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("_score") > 0, lit(1))).as("n_pass"),
        sum(col("_score")).as("_sum_score"))
      .select(col("source"), col("n_docs"), col("n_pass"),
        round(col("n_pass").cast("double") /
          col("n_docs").cast("double"), 12).as("pass_rate"),
        round(col("_sum_score").cast("double") /
          col("n_docs").cast("double"), 12).as("mean_score"))
      .orderBy(col("source"))

  /** The exact decimal score as a reusable Column (the streaming
    * quality monitor scores batches at the door with it). */
  def scoreColumn(
      weights: Seq[(String, BigDecimal)] = DefaultWeights): Column =
    scoreCol(weights)

  /** Model-based gate: keep documents whose exact decimal quality
    * score exceeds `threshold` — the filter form of q185's scorer, a
    * pure map-side predicate (no join, no aggregate) that
    * Curation.pipeline stacks after its rule gate (CCNet's rules-then-
    * model ordering). */
  def filterByScore(docs: DataFrame, threshold: BigDecimal,
      weights: Seq[(String, BigDecimal)] = DefaultWeights): DataFrame =
    docs.filter(scoreCol(weights) >
      lit(threshold.underlying()).cast(DecimalType(19, 10)))

  /** q189: Kendall tau-a rank stability between two per-source
    * orderings — by token VOLUME and by mean QUALITY score. The
    * curation question it answers: does spending more budget on a
    * source buy more quality, or are the two rankings uncorrelated
    * (τ≈0) / inverted (τ<0)? A mix designed on volume alone (q172's
    * α-weights) should be re-examined when τ diverges from the value
    * this audit pinned at design time.
    *
    * Determinism: volume is an exact BIGINT; the quality key is the
    * round-12 mean score (bit-identical cross-engine — q185's proven
    * value), so every pairwise comparison is exact. Scale shape: ONE
    * corpus scan folds to |sources| rows; the pair comparison is a
    * |sources|² broadcast nested-loop over that METADATA frame (20
    * sources → 190 pairs), never data-sized. */
  def sourceRankStability(docs: DataFrame): DataFrame = {
    val per = docs
      .select(col("source"),
        TextFunctions.tokenCount(col("text")).as("_nt"),
        scoreCol(DefaultWeights).as("_score"))
      .groupBy(col("source"))
      .agg(sum(col("_nt")).as("toks"), count(lit(1)).as("_n"),
        sum(col("_score")).as("_ss"))
      .select(col("source"), col("toks"),
        round(col("_ss").cast("double") / col("_n").cast("double"), 12)
          .as("mscore"))
    val a = per.select(col("source").as("sa"), col("toks").as("ta"),
      col("mscore").as("qa"))
    val b = per.select(col("source").as("sb"), col("toks").as("tb"),
      col("mscore").as("qb"))
    a.crossJoin(broadcast(b)).filter(col("sa") < col("sb"))
      .select(
        (col("ta") > col("tb")).as("_agt"),
        (col("ta") < col("tb")).as("_alt"),
        (col("qa") > col("qb")).as("_bgt"),
        (col("qa") < col("qb")).as("_blt"))
      .agg(count(lit(1)).as("n_pairs"),
        count(when((col("_agt") && col("_bgt")) ||
          (col("_alt") && col("_blt")), lit(1))).as("concordant"),
        count(when((col("_agt") && col("_blt")) ||
          (col("_alt") && col("_bgt")), lit(1))).as("discordant"))
      .select(col("n_pairs"), col("concordant"), col("discordant"),
        (col("n_pairs") - col("concordant") - col("discordant"))
          .as("tied"),
        round((col("concordant") - col("discordant")).cast("double") /
          col("n_pairs").cast("double"), 12).as("tau_a"))
  }

  /** q190: cross-modal audit — Pearson correlation between the TEXT
    * quality score and the EMBEDDING peakedness (max |coordinate|),
    * per label. On a unit-normalized corpus the norm is a constant, so
    * peakedness is the natural per-vector health scalar: near-one-hot
    * vectors (peak → 1) usually mean a degenerate encoder output; if
    * peak correlates with the text-side quality score, one gate
    * partially subsumes the other, and if corr ≈ 0 they are
    * independent signals worth stacking.
    *
    * Determinism: both variables become exact INTEGERS before any
    * aggregation — the decimal score scaled by 1e10 (it is exact at
    * scale 10 by construction; the double round-trip's absolute error
    * ≪ 0.5 so round() recovers it), the peak (exact float→double max)
    * rounded to 6dp and scaled by 1e6 — so the five moments are exact
    * DECIMAL(38,0) sums and the correlation (scale-invariant, so the
    * 1e10/1e6 factors cancel) is one fixed double chain, round 12
    * (q95's discipline). Scale shape: one scan per side projected to
    * (id, int), a doc_id-keyed equi-join carrying two integers, and a
    * |labels|-row moment fold. */
  def qualityPeakCorrelation(docs: DataFrame, emb: DataFrame)
      : DataFrame = {
    val d0 = DecimalType(18, 0)
    // score is exact at scale 10; ×1e10 is an integer ≤ ~1e12, and the
    // double round-trip's relative error (~1e-16·1e12 = 1e-4) is far
    // below 0.5, so round() recovers the exact integer on both engines
    // (a direct DECIMAL multiply overflows DuckDB's int64 internal)
    val xi = round(scoreCol(DefaultWeights).cast("double") *
      lit(1.0e10)).cast("long")
    val peak = array_max(transform(col("embedding"),
      v => abs(v.cast("double"))))
    val yi = (round(peak, 6).cast(DecimalType(12, 6)) * lit(1000000L))
      .cast("long")
    val dd = docs.select(col("doc_id"), xi.as("_xi"))
    val ee = emb.select(col("vec_id").as("doc_id"), col("label"),
      yi.as("_yi"))
    dd.join(ee, Seq("doc_id"))
      .select(col("label"), col("_xi").cast(d0).as("_x"),
        col("_yi").cast(d0).as("_y"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(col("_x")).cast("double").as("sx"),
        sum(col("_y")).cast("double").as("sy"),
        sum(col("_x") * col("_y")).cast("double").as("sxy"),
        sum(col("_x") * col("_x")).cast("double").as("sxx"),
        sum(col("_y") * col("_y")).cast("double").as("syy"))
      .select(col("label"), col("n"),
        // degenerate groups (n=1 or a zero-variance side) have no
        // defined correlation → NULL, mirrored in the oracle's CASE
        when((col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
          (col("n") * col("syy") - col("sy") * col("sy")) > 0,
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), 12))
          .as("corr_quality_peak"),
        round(col("sx") / col("n") / lit(10000000000.0), 12)
          .as("mean_score"),
        round(col("sy") / col("n") / lit(1000000.0), 12)
          .as("mean_peak"))
      .orderBy(col("label"))
  }

  /** x35: full-batch logistic-regression TRAINING on the corpus with
    * weak labels (default: lang == "en"), returning the per-iteration
    * training curve plus the final weights as one tidy frame:
    * (iter, loss, accuracy, intercept, w_ttr, w_stop, w_digit, w_cpt).
    *
    * Each iteration evaluates sigmoid margins inside whole-stage
    * codegen and folds ONE aggregate of d+3 doubles (d gradient
    * components + bias gradient + loss + correct-count); the driver
    * does the O(d) weight update. Iteration state never exceeds d+3
    * numbers per partition — at 100 TB each GD step is exactly one
    * map-side-partial pass, the same cost as a count(*).
    *
    * Numerics: softplus is computed in the stable max(s,0)+log1p(e^-|s|)
    * form; double partial sums make the curve deterministic only up to
    * float associativity, which is why x35 is registered rows-only and
    * the spec asserts CONVERGENCE properties (loss decreases, separable
    * data reaches accuracy 1) rather than bit-exact weights. Features
    * are deliberately unnormalized (same columns q185 scores), so the
    * default lr is conservative: full-batch descent is guaranteed for
    * lr ≤ 4 / mean‖x‖², ≈ 0.12 on the harness corpus where the
    * chars-per-token feature dominates the norm. */
  def trainQualityLogit(docs: DataFrame, iters: Int = 25,
      lr: Double = 0.1,
      label: Column = (col("lang") === "en").cast("double")): DataFrame = {
    require(iters > 0, "iters must be positive")
    val spark = docs.sparkSession
    val names = "f_ttr" :: "f_stop" :: "f_digit" :: "f_cpt" :: Nil
    // null-label rows are excluded BEFORE the persist: sum() skips
    // nulls, so a null _y would contribute nothing to the gradient or
    // loss while still counting in n — silently damping the effective
    // step size and deflating loss/accuracy (r12 advisor finding)
    val feats = docs.select(
      (featureCols.map { case (n, c) => c.cast("double").as(n) } :+
        label.as("_y")): _*)
      .filter(col("_y").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val d = names.length
      var w = Array.fill(d + 1)(0.0) // bias :: feature weights
      val history = Seq.newBuilder[(Int, Double, Double, Seq[Double])]
      var it = 0
      while (it <= iters) {
        val margin = names.zipWithIndex.foldLeft(lit(w(0))) {
          case (acc, (n, i)) => acc + col(n) * lit(w(i + 1))
        }
        // p - y drives the gradient; stable softplus(±margin) the loss
        val p = lit(1.0) / (lit(1.0) + exp(-margin))
        val signed = when(col("_y") > 0.5, -margin).otherwise(margin)
        val lossTerm = greatest(signed, lit(0.0)) +
          log1p(exp(-abs(signed)))
        val correct = when((p > 0.5) === (col("_y") > 0.5), 1L)
        val aggs =
          (sum(p - col("_y")).as("g0") +:
            names.zipWithIndex.map { case (n, i) =>
              sum((p - col("_y")) * col(n)).as(s"g${i + 1}") }) ++
          Seq(sum(lossTerm).as("loss"), count(lit(1)).as("n"),
            count(correct).as("ok"))
        val row = feats.agg(aggs.head, aggs.tail: _*).head()
        val n = row.getAs[Long]("n").toDouble
        val loss = row.getAs[Double]("loss") / n
        val acc = row.getAs[Long]("ok").toDouble / n
        history += ((it, loss, acc, w.toSeq))
        if (it < iters) // last pass evaluates the final weights only
          w = w.indices.map(i =>
            w(i) - lr * row.getAs[Double](s"g$i") / n).toArray
        it += 1
      }
      import spark.implicits._
      history.result()
        .map { case (i, l, a, ws) =>
          (i, l, a, ws(0), ws(1), ws(2), ws(3), ws(4)) }
        .toDF("iter", "loss", "accuracy", "intercept", "w_ttr",
          "w_stop", "w_digit", "w_cpt")
        .orderBy(col("iter"))
    } finally feats.unpersist()
  }

  /** q198: model-vs-rules calibration table — q185's classifier score
    * cut into per-source deciles (score desc, doc_id tiebreak), each
    * bin reporting how often the INDEPENDENT q64 rule gate agrees.
    * A calibrated model shows rule_pass_rate falling monotonically
    * from bin 1 to bin nBins; a flat column means the score carries
    * no signal the rules see, and an inversion means the threshold
    * sits on the wrong side — the reliability diagram (Niculescu-
    * Mizil & Caruana 2005) with the rule gate standing in for labels,
    * read before replacing rules with the model in the pipeline gate.
    *
    * Determinism: the bin ORDER key is the exact decimal score with
    * doc_id tiebreak (bit-reproducible); bin means divide exact
    * decimal sums once, round 12; agreement rates are exact-count
    * divisions, round 12.
    *
    * Scale shape: flags + score are ONE map-side projection (q64's
    * scan); only the |docs| metadata frame (doc_id, source, decimal,
    * boolean) enters the per-source ntile window — partitioned by
    * source, so it parallelizes (q192's CCNet argument); output is
    * |sources|·nBins rows. */
  def calibrationReport(docs: DataFrame, nBins: Int = 10,
      weights: Seq[(String, BigDecimal)] = DefaultWeights): DataFrame = {
    require(nBins >= 2, "nBins must be at least 2")
    val scored = TextOps.withQualityPass(docs)
      .select(col("doc_id"), col("source"), col("rule_pass"),
        scoreCol(weights).as("_score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("_score").desc, col("doc_id"))
    scored
      .withColumn("bin", ntile(nBins).over(w).cast("long"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_score")).as("_ss"),
        count(when(col("rule_pass"), lit(1))).as("_np"),
        min(col("_score")).as("_lo"), max(col("_score")).as("_hi"))
      .select(col("source"), col("bin"), col("n_docs"),
        round(col("_ss").cast("double") /
          col("n_docs").cast("double"), 12).as("mean_score"),
        round(col("_np").cast("double") /
          col("n_docs").cast("double"), 12).as("rule_pass_rate"),
        round(col("_lo").cast("double"), 12).as("lo_score"),
        round(col("_hi").cast("double"), 12).as("hi_score"))
      .orderBy(col("source"), col("bin"))
  }
}
