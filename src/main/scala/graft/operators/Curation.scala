package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TextFunctions}

/** The end-to-end curation pipeline a training-data run actually
  * executes, composed from the operators this engine exposes — in the
  * standard order (each stage shrinks or canonicalizes the next
  * stage's input):
  *
  *   0. canonicalization (TextOps.markupCleanText — tag strip + entity
  *      decode; then functions.NormalizeText — control-strip +
  *      whitespace-collapse + Unicode NFC): every later stage measures
  *      and hashes ONE byte form per logical character — without NFC,
  *      a composed/decomposed pair of the same document can never
  *      dedup (their shingle hashes differ),
  *   1. quality filter (TextOps.filterQuality — map-side rule flags;
  *      rejects never reach anything expensive),
  *   2. PII scrub (TextOps.piiCleanText rewriting `text` in place —
  *      map-side codegen'd regexps),
  *   3. near-dup dedup on the SCRUBBED text (MinHash+LSH pairs →
  *      connected components → canonical min-id survivor — the q49
  *      pipeline on its scale path; scrubbing first means two docs
  *      differing only in redacted PII dedup as the near-dups they
  *      are),
  *   4. sequence packing (TextOps.packSequences — per-source token
  *      streams cut into fixed packs).
  *
  * Registered as x15: hashes are engine-seeded (rows-only in the
  * oracle); stage-consistency properties live in CurationSpec. At
  * 100 TB every stage keeps its own scale shape (documented at each
  * operator) and the composition adds no new shuffle beyond the
  * stages' own.
  */
object Curation {

  /** Stages 0–2 (canonicalize, quality gate, in-place PII scrub) as one
    * map-side transform — the SHARED front half of the batch pipeline
    * and of the streaming ingestion path
    * (StreamingDedup.runCurationAvailableNow applies this per
    * micro-batch, so streaming and batch curation run the identical
    * stages in the identical order: normalize BEFORE the gate so rule
    * statistics measure canonical text, scrub AFTER the gate so rule
    * statistics see un-redacted text, scrub BEFORE dedup so docs
    * differing only in redacted PII collapse as near-dups). */
  def prepare(docs: DataFrame): DataFrame =
    // unsplittable-input guard (guide §2.5): four regex scrub passes +
    // rule metrics per row — the pipeline's dominant map stage, and
    // the persisted scrubbed frame downstream inherits this
    // partitioning (x15: oneTaskShare 0.72 before)
    TextOps.filterQuality(
      ScanParallelism.widen(docs, "doc_id").withColumn("text",
        graft.functions.GraftFunctions.normalizeText(
          TextOps.markupCleanText(col("text")))))
      .withColumn("text", TextOps.piiCleanText(col("text")))

  def pipeline(docs: DataFrame, packTokens: Long = 256L,
      minJ: Double = 0.7, bands: Int = 16,
      stripBoilerplateMinDocs: Option[Int] = None,
      classifierGate: Option[BigDecimal] = None): DataFrame = {
    // Optional line-level boilerplate removal (q168's transform)
    // BETWEEN scrub and dedup — RefinedWeb's stage order: strip the
    // recurring headers/footers first so near-dup similarity is
    // computed over content, not shared boilerplate. None (the
    // default, and x15's registered form) skips the stage entirely.
    val base0 = stripBoilerplateMinDocs match {
      case None => prepare(docs)
      case Some(m) =>
        val p = prepare(docs)
        p.drop("text").join(
          TextOps.stripBoilerplateLines(p, minDocs = m)
            .select(col("doc_id"), col("text_clean").as("text")),
          Seq("doc_id"), "inner")
    }
    // Optional model-based gate (q185's linear score) stacked AFTER
    // the rule gate and boilerplate strip, so the model scores the
    // text the corpus will actually train on — the CCNet ordering
    // (rules first, model second). Map-side filter: the score is a
    // row expression; no extra pass, no join. None (the default, and
    // x15's registered form) keeps the pipeline rule-only.
    val base = classifierGate match {
      case None => base0
      case Some(thr) => Classifier.filterByScore(base0, thr)
    }
    // persisted: the scrubbed frame feeds three plan consumers (LSH
    // signatures, candidate verification re-shingle, final anti-join) —
    // without it the gate + four-regex scrub re-run per consumer (same
    // bounded cache-lifecycle note as NearDup.minHashLshPairs)
    val scrubbed = base
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = NearDup
      .minHashLshPairs(scrubbed, bands = bands, minJ = minJ)
      .select(col("a_id"), col("b_id"))
    val deduped = NearDup.dedupByClusters(scrubbed,
      NearDup.duplicateClusters(pairs))
    TextOps.packSequences(deduped, packTokens)
  }

  // ------------------------------- training-mix construction (L99-L101)

  /** Deterministic per-source downsampling at configured percent rates —
    * the data-MIXING primitive (down-weight a bulk crawl, keep a
    * high-quality source whole) in its reproducible form: membership is
    * `doc_id mod 100 < rate(source)`, a pure function of the row, so
    * the same recipe yields the same sample on every run, engine, and
    * partitioning (the property `sample()` cannot give and a training-
    * data audit requires).
    *
    * Scale shape: one map-side filter — the rate lookup folds to a
    * literal CASE over the (tiny, driver-known) rate list; no shuffle
    * except the final presentation sort. At 100 TB this runs at scan
    * speed with the filter pushed to parquet row-group pruning on
    * doc_id where the layout allows. */
  def sampleBySourceRate(docs: DataFrame, rates: Seq[(String, Int)],
      defaultRate: Int): DataFrame = {
    require((defaultRate +: rates.map(_._2))
      .forall(r => r >= 0 && r <= 100), "rates are percents in [0,100]")
    val rate = rates.foldLeft(lit(defaultRate)) {
      case (acc, (s, r)) => when(col("source") === s, lit(r)).otherwise(acc)
    }
    docs.filter(pmod(col("doc_id"), lit(100L)) < rate)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Per-source TOKEN-budget allocation — the mixing recipe's second
    * half: each source contributes its earliest documents (doc_id
    * order = ingestion order) until its own token budget is spent. The
    * q46 shape (windowed running sum, ROWS UNBOUNDED PRECEDING) with a
    * per-source budget instead of one global constant and arrival
    * order instead of longest-first.
    *
    * Scale shape: one shuffle on source for the window; budgets fold
    * to a literal CASE. Skew note: a single source's stream lands in
    * one window partition — at 100 TB feed this the post-sampling
    * corpus (sampleBySourceRate) or range-partition within source on
    * doc_id and prefix-sum per range (the q53 sharded-packing trade). */
  def allocateTokenBudget(docs: DataFrame, budgets: Seq[(String, Long)],
      defaultBudget: Long): DataFrame = {
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (s, b)) => when(col("source") === s, lit(b)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("doc_id"))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .orderBy(col("source"), col("doc_id"))
  }

  /** Deterministic train/validation/test assignment report: split by
    * `doc_id mod 10` (0-7 train, 8 validation, 9 test — the
    * reproducible 80/10/10), aggregated to the per-(split, source)
    * document and token counts a training run records as its data
    * card. Hash-mod assignment keeps membership stable under corpus
    * growth: adding documents never moves an existing one across
    * splits (a re-shuffled random split would — leakage between
    * checkpointed runs).
    *
    * Scale shape: map-side split tag + one partial+final aggregate on
    * (split, source) — 3·|sources| output rows. */
  def splitAssignment(docs: DataFrame): DataFrame = {
    val m = pmod(col("doc_id"), lit(10L))
    docs
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .as("n_tokens"),
        when(m < 8, lit("train"))
          .when(m === 8, lit("validation"))
          .otherwise(lit("test")).as("split"))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))
      .orderBy(col("split"), col("source"))
  }

  /** Train→test n-gram contamination audit — the decontamination pass
    * every held-out split needs before its numbers mean anything: for
    * each TEST document (splitAssignment's rule, doc_id mod 10 == 9),
    * the fraction of its distinct n-token shingles that also occur
    * anywhere in the TRAIN split (mod ≤ 7). A high rate means the
    * "held-out" document leaks through the model's training set and
    * its eval loss is memorization, not generalization (the GPT-3
    * 13-gram overlap check; n = 8 here over whitespace tokens).
    *
    * Exactness trade (q71's): grams join as STRINGS so the oracle can
    * reproduce the statistic verbatim — counts are the output, so a
    * hash collision would CORRUPT them rather than add a verifiable
    * candidate; the 64-bit-hashed swap (x22's trade) is the documented
    * 100 TB variant, where a collision perturbs a rate by ~1/n_grams.
    *
    * Scale shape: the train gram table dedups with one map-side-
    * combined distinct (vocabulary-shaped, far sub-corpus); the test
    * side explodes only the 10% test slice; one semi join on gram
    * shuffles each stream once; per-doc accounting is a bounded
    * aggregate. Nothing all-pairs, nothing data-sized on the driver. */
  def splitContamination(docs0: DataFrame, n: Int = 8): DataFrame = {
    require(n >= 1, "n must be positive")
    // unsplittable-input guard (guide §2.5): materializing 8-token
    // gram strings per position is the dominant CPU (StageProbe r17:
    // oneTaskShare = 1.00, a single 6.3 s one-task gram build)
    val docs = ScanParallelism.widen(docs0, "doc_id")
    val withSplit = docs.select(col("doc_id"),
      TextFunctions.shingles(col("text"), n).as("_g"),
      pmod(col("doc_id"), lit(10L)).as("_m"))
    // NO .distinct() on the train grams: left_semi already has
    // exists-semantics, so a distinct would only add a full extra
    // shuffle+aggregate of the dominant (80%-of-corpus) gram stream —
    // measured 7.4 s → 5.4 s at sf0.1 when removed
    val trainGrams = withSplit.filter(col("_m") <= 7)
      .select(explode(col("_g")).as("_gr"))
    val testDocs = withSplit.filter(col("_m") === 9)
    val contaminated = testDocs
      .select(col("doc_id"), explode(col("_g")).as("_gr"))
      .join(trainGrams, Seq("_gr"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("_n_cont"))
    testDocs
      .select(col("doc_id"), size(col("_g")).cast("long").as("n_grams"))
      .join(contaminated, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("_n_cont"), lit(0L)).as("n_contaminated"),
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(coalesce(col("_n_cont"), lit(0L)).cast("double") /
            col("n_grams").cast("double"))
          .as("contamination_rate"))
      .orderBy(col("doc_id"))
  }

  /** splitContamination's 100 TB twin — the x10/x22 trades composed at
    * the split level: train grams never cross a shuffle as strings (or
    * at all). Each train gram hashes to 64 bits MAP-SIDE (xxhash64)
    * and folds into a mergeable BLOOM partial aggregate whose only
    * shuffled bytes are the per-partition bitsets; the reduced filter
    * broadcasts back as a scalar subquery and the 10% test slice
    * probes it map-side — so the 80%-of-corpus train slice (doc_id
    * mod 10 ≤ 7, matching exact q114's train/val/test = 8/1/1 split),
    * the dominant train stream and q114's dominant cost, contributes
    * ZERO shuffle rows. Error is ONE-SIDED
    * on top of the 2⁻⁶⁴-scale hash-collision risk: blooms have no
    * false negatives, so per-doc n_contaminated (and the rate) can
    * only be OVERSTATED — every doc q114 flags at a given rate is
    * flagged here too (CurationSpec pins the per-doc superset
    * property). Reach for this when the decision is "drop if
    * contaminated" and a small over-drop is acceptable; q114 stays the
    * exact oracle baseline. */
  def splitContaminationApprox(docs: DataFrame, n: Int = 8,
      expectedItems: Long = 1L << 20, numBits: Long = 1L << 23)
      : DataFrame = {
    require(n >= 1, "n must be positive")
    // native distinct gram HASHES (one codegen pass per row) — never
    // the string grams: materializing 8-token strings per position is
    // the dominant CPU of the exact q114 (its oracle-reproducibility
    // price); the twin rides 63-bit hashes end to end (x22's trade —
    // same distinct-set semantics, so per-doc counts are identical
    // modulo 2^-64-scale collisions)
    val withSplit = ScanParallelism.widen(docs, "doc_id")
      .select(col("doc_id"),
        GraftFunctions.shingleHashes(col("text"), n, Long.MaxValue)
          .as("_g"),
        pmod(col("doc_id"), lit(10L)).as("_m"))
    val bloom = withSplit.filter(col("_m") <= 7)
      .select(explode(col("_g")).as("_h"))
      .agg(graft.functions.GraftFunctions.bloomAgg(col("_h"),
        expectedItems, numBits).as("_bf"))
      .scalar()
    withSplit.filter(col("_m") === 9)
      // explode_outer keeps zero-gram docs (q114 reports them with
      // rate 0.0); the probe runs map-side on the exploded rows and
      // the groupBy's PARTIAL aggregate collapses them before the
      // shuffle — per-doc partial counts, not gram rows, cross it
      .select(col("doc_id"), explode_outer(col("_g")).as("_gr"))
      .groupBy(col("doc_id"))
      .agg(count(col("_gr")).as("n_grams"),
        count(when(graft.functions.GraftFunctions.bloomMightContain(
          bloom, col("_gr")), lit(1))).as("n_contaminated"))
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(col("n_contaminated").cast("double") /
            col("n_grams").cast("double"))
          .as("contamination_rate"))
      .orderBy(col("doc_id"))
  }

  // ------------------------- retrieval / serving preparation (L102-L105)

  /** Overlapping token-window chunking — the RAG/serving prep step that
    * cuts each document into fixed `chunkSize`-token windows advancing
    * by `stride` tokens (chunkSize − stride tokens of overlap, so no
    * answer span is ever split across a boundary without also appearing
    * whole in one chunk). Chunk starts run 0, stride, 2·stride, …; a
    * trailing start whose window would add no NEW tokens (the previous
    * window already reached end-of-document) is not emitted, so every
    * chunk contributes at least one fresh token and the cover is exact.
    * Zero-token documents produce no chunks.
    *
    * Deterministic: chunk_id = start / stride — a pure function of the
    * row, stable across engines, partitionings, and corpus growth
    * (downstream embedding caches key on (doc_id, chunk_id)).
    *
    * Scale shape: map-side explode — output rows ≈ n_tokens / stride
    * per document, no shuffle except the presentation sort; at 100 TB
    * this runs at scan speed and the fan-out is bounded by the
    * documents' own token mass (≤ chunkSize/stride × corpus tokens). */
  def chunkDocuments(docs: DataFrame, chunkSize: Int = 32,
      stride: Int = 24): DataFrame = {
    require(chunkSize >= 1, "chunkSize must be positive")
    require(stride >= 1 && stride <= chunkSize,
      "stride must be in [1, chunkSize]")
    docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("_t"))
      .withColumn("_n", size(col("_t")))
      .filter(col("_n") > 0)
      .select(col("doc_id"), col("_t"), col("_n"),
        explode(sequence(lit(0), col("_n") - 1, lit(stride)))
          .as("chunk_start"))
      // drop redundant trailing windows: previous window (start−stride)
      // already covered to end-of-doc iff start + (chunkSize − stride) ≥ n
      .filter(col("chunk_start") === 0 ||
        col("chunk_start") + lit(chunkSize - stride) < col("_n"))
      .select(col("doc_id"),
        (col("chunk_start") / stride).cast("long").as("chunk_id"),
        col("chunk_start").cast("long").as("chunk_start"),
        least(lit(chunkSize), col("_n") - col("chunk_start"))
          .cast("long").as("chunk_len"),
        array_join(
          slice(col("_t"), col("chunk_start") + 1, lit(chunkSize)),
          " ").as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Adaptive per-source quality gate: keep the top `keepFrac` fraction
    * of each source's documents by distinct-token diversity (q70's
    * score) — the data-curation policy "keep the best quarter of every
    * source" (a fixed global score threshold would empty a noisy crawl
    * and keep all of a clean one; a fixed per-source COUNT (q70) ignores
    * source size). Cutoff = ceil(|source| · keepFrac), so every source
    * keeps at least one document.
    *
    * keepFrac should be an exactly-representable binary fraction (0.25,
    * 0.5, …) so the ceil boundary is engine-independent.
    *
    * Scale shape: one shuffle on source; the rank window within a
    * source is the usual single-partition caveat — at 100 TB switch to
    * the threshold form (approx quantile of the score per source →
    * map-side filter; x12's sketch trade) and accept the ±ε boundary. */
  def adaptiveQualityGate(docs: DataFrame, keepFrac: Double = 0.25)
      : DataFrame = {
    require(keepFrac > 0.0 && keepFrac <= 1.0, "keepFrac must be in (0,1]")
    val toks = TextFunctions.tokens(col("text"))
    val diversity = when(size(toks) === 0, lit(0.0))
      .otherwise(size(array_distinct(toks)).cast("double") / size(toks))
    val wRank = Window.partitionBy(col("source"))
      .orderBy(col("diversity").desc, col("doc_id"))
    val wAll = Window.partitionBy(col("source"))
    docs
      .select(col("doc_id"), col("source"), diversity.as("diversity"))
      .withColumn("quality_rank", row_number().over(wRank).cast("long"))
      .withColumn("n_source", count(lit(1)).over(wAll).cast("long"))
      .filter(col("quality_rank") <=
        ceil(col("n_source").cast("double") * keepFrac))
      .select(col("doc_id"), col("source"),
        round(col("diversity"), 12).as("diversity"),
        col("quality_rank"), col("n_source"))
      .orderBy(col("doc_id"))
  }

  /** Curriculum-interleave training schedule: documents ranked by
    * quality (q105's distinct-token diversity) WITHIN each source,
    * then interleaved round-robin across sources — rank-1 docs of
    * every source first, then rank 2, … — so a sequential reader sees
    * highest-quality-first AND source-balanced data from step one
    * (quality curriculum + mixture stratification in one ordering;
    * anti-curriculum = read the schedule backwards).
    *
    * The schedule position is ARITHMETIC — (rank−1)·|sources| +
    * source_index — from a broadcast |sources|-row index table, never
    * a global row_number: a total-order window over the corpus is the
    * one-reducer serialization q126 exorcised. Positions are unique
    * and monotone in (rank, source); sources that exhaust early leave
    * gaps, which a consumer streams past (ordering, not density, is
    * the contract).
    *
    * Scale shape: one per-source rank window (partitioned, spreads
    * across the cluster), one broadcast join against the tiny source
    * index, map-side position arithmetic; the output sort is the
    * ordinary result-delivery sort every oracle query carries. */
  def curriculumSchedule(docs: DataFrame): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val diversity = when(size(toks) === 0, lit(0.0))
      .otherwise(size(array_distinct(toks)).cast("double") / size(toks))
    val wRank = Window.partitionBy(col("source"))
      .orderBy(col("diversity").desc, col("doc_id"))
    val srcIdx = docs.select(col("source")).distinct()
      .withColumn("_sidx",
        (row_number().over(Window.orderBy(col("source"))) - 1)
          .cast("long"))
    val nSrc = srcIdx.agg(count(lit(1)).as("_ns")).scalar()
    docs
      .select(col("doc_id"), col("source"), diversity.as("diversity"))
      .withColumn("quality_rank", row_number().over(wRank).cast("long"))
      .join(broadcast(srcIdx), Seq("source"))
      .select(col("doc_id"), col("source"),
        round(col("diversity"), 12).as("diversity"),
        col("quality_rank"),
        ((col("quality_rank") - 1) * nSrc + col("_sidx"))
          .as("position"))
      .orderBy(col("position"))
  }

  /** Temperature-weighted source-mixing table (the mT5/CC-100 α-
    * sampling rule, α = 1/2): sampling weight ∝ n_tokens^α, so
    * low-resource sources up-sample relative to their raw share and
    * head sources damp — the mixture a multilingual/multi-domain
    * pretraining run draws from instead of raw proportions. Output
    * per source: token counts, raw share, the α-weight, and the boost
    * factor (weight / raw share; > 1 = up-sampled).
    *
    * α is FIXED at 1/2 because sqrt is IEEE-exactly-rounded on every
    * engine — pow(x, α) for general α is libm-approximated and two
    * engines may disagree in the last ulp (the determinism discipline
    * the docstrings call "bit-identical cross-engine"). The rounded
    * sqrt weights sum as exact decimals (order-independent), and each
    * share is ONE double division of decimal-exact operands.
    *
    * Scale shape: one partial+final per-source token aggregate
    * touches the corpus; weights, totals, boosts all fold on
    * |sources| rows. */
  def sourceMixWeights(docs: DataFrame): DataFrame = {
    val d386 = org.apache.spark.sql.types.DecimalType(38, 6)
    val st = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col("text"))).as("n_tokens"))
      .withColumn("_w",
        round(sqrt(col("n_tokens").cast("double")), 6).cast(d386))
    st.crossJoin(broadcast(st.agg(
        sum(col("_w")).as("_wtot"),
        sum(col("n_tokens")).as("_ttot"))))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") /
          col("_ttot").cast("double"), 12).as("raw_share"),
        round(col("_w").cast("double") /
          col("_wtot").cast("double"), 12).as("weight"),
        round((col("_w").cast("double") / col("_wtot").cast("double")) /
          (col("n_tokens").cast("double") / col("_ttot").cast("double")),
          12).as("boost"))
      .orderBy(col("source"))
  }

  /** Epoch-allocation plan — the step AFTER [[sourceMixWeights]]: given
    * a total training-token budget, how many tokens (and therefore how
    * many EPOCHS — repeat passes) to draw from each source under the
    * α = 1/2 mixing weights, with the repeat count capped at
    * `maxEpochs` (the data-constrained-scaling rule of thumb that
    * repeating a source beyond ~4 epochs stops helping). Per source:
    * the weight-implied target tokens, the epoch count that target
    * implies, the cap-clipped epochs actually granted, the resulting
    * planned tokens, and the shortfall a capped source returns to the
    * budget (a report, not an iterative waterfill — the re-spend
    * decision is the caller's).
    *
    * Determinism: weights are the q172 rounded-sqrt decimals; target
    * tokens and epoch ratios are single double operations on
    * decimal-exact operands. Token-scale outputs (O(budget) values)
    * round to 4 decimals and the O(1) epoch ratios to 12 — both
    * leave the last ulp of a double outside the rounded digits, so
    * an engine pair differing in the final bit of a division still
    * emits identical rows. The budget enters as an exact long.
    *
    * Scale shape: one per-source token aggregate touches the corpus;
    * every allocation column folds on the |sources|-row table. */
  def epochAllocation(docs: DataFrame, tokenBudget: Long,
      maxEpochs: Int = 4): DataFrame = {
    val d386 = org.apache.spark.sql.types.DecimalType(38, 6)
    val st = docs.groupBy(col("source"))
      .agg(sum(TextFunctions.tokenCount(col("text"))).as("n_tokens"))
      .withColumn("_w",
        round(sqrt(col("n_tokens").cast("double")), 6).cast(d386))
    val target = col("_w").cast("double") / col("_wtot").cast("double") *
      lit(tokenBudget).cast("double")
    val epochsRaw = target / col("n_tokens").cast("double")
    val epochs = least(epochsRaw, lit(maxEpochs).cast("double"))
    st.crossJoin(broadcast(st.agg(sum(col("_w")).as("_wtot"))))
      .select(col("source"), col("n_tokens"),
        round(target, 4).as("target_tokens"),
        round(epochsRaw, 12).as("epochs_uncapped"),
        round(epochs, 12).as("epochs"),
        round(epochs * col("n_tokens").cast("double"), 4)
          .as("planned_tokens"),
        round(greatest(target - epochs * col("n_tokens").cast("double"),
          lit(0.0)), 4).as("shortfall"))
      .orderBy(col("source"))
  }

  /** Per-source dataset card — the summary table a corpus release ships
    * (HuggingFace dataset-card / Datasheets-for-Datasets shape): doc and
    * token counts, mean document length, language breadth, and each
    * source's share of total corpus tokens.
    *
    * Scale shape: one partial+final aggregate on source (|sources|
    * output rows); the share denominator window-sums over the
    * post-aggregate rows only — the q99 ratio-to-report trick, never a
    * second pass over the corpus. */
  def datasetCard(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), col("lang"), col("n_chars"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        max(col("n_chars")).as("max_chars"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") /
          col("n_docs").cast("double"), 12).as("avg_tokens"),
        col("n_langs"), col("max_chars"),
        round(col("n_tokens").cast("double") /
          sum(col("n_tokens")).over(Window.partitionBy())
            .cast("double"), 12).as("token_share"))
      .orderBy(col("source"))

  /** Deterministic pseudo-shuffled shard assignment — the training-order
    * materialization: each train-split document gets a shard (which
    * output file it lands in) and a position within that shard, ordered
    * by a Knuth multiplicative-hash mix of doc_id (2654435761 = ⌊2³²/φ⌋)
    * so consecutive doc_ids scatter across shards and within-shard order
    * is decorrelated from ingestion order — the "global shuffle" a
    * training run needs, but reproducible: pure integer arithmetic, no
    * seed state, same layout on every run and engine.
    *
    * Scale shape: one shuffle on shard + a per-shard order window. The
    * per-shard sort is not overhead — it IS the output contract (a
    * training shard is consumed sequentially, so it must be written
    * totally ordered); size nShards to the cluster so each shard's sort
    * fits an executor. */
  /** Systematic weight-proportional sampling: order documents by
    * doc_id, accumulate weight (`n_chars` — the training-cost proxy),
    * and keep every document whose cumulative weight crosses a
    * multiple of totalWeight/sampleN. Inclusion probability is
    * proportional to weight — the quality/cost-weighted downsample a
    * mixture recipe wants — with NONE of the RNG the u^(1/w)
    * exponential-key reservoir needs: pure integer arithmetic
    * (`(cum·n) div W` strictly increasing at a selected row), so
    * membership is bit-reproducible on every engine, partitioning and
    * run. A document heavier than the step is selected exactly once
    * (never duplicated), so the sample size is ≤ sampleN.
    *
    * Scale shape: the TWO-PHASE PREFIX SUM (enumerateCorpus' pattern,
    * one level up): doc_ids split into contiguous `shardWidth` ranges,
    * the cumulative-weight window runs PER SHARD (parallel, bounded
    * partitions), per-shard totals fold to cumulative offsets over
    * |shards| rows (metadata: n_docs/shardWidth), and the offset
    * broadcasts back — the global cumulative sum is offset + local
    * cum, bit-identical to a single global window at ANY shard width,
    * without ever serializing the corpus through one reducer. The
    * selection predicate itself is map-side. At corpus sizes where
    * even |shards| outgrows one window partition, recurse: shard the
    * shard table the same way. Weight products stay in LONG here;
    * cum·n overflows past ~9e18 — the DECIMAL(38,0) swap is
    * mechanical. */
  def systematicWeightedSample(docs: DataFrame, sampleN: Int = 100,
      shardWidth: Long = 1L << 16): DataFrame = {
    require(sampleN > 0, "sampleN must be positive")
    require(shardWidth > 0, "shardWidth must be positive")
    val base = docs
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("_shard", expr(s"doc_id div $shardWidth"))
    val perShard = Window.partitionBy(col("_shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-shard totals → exclusive cumulative offsets; the window here
    // runs over |shards| rows only (metadata, whatever the corpus size)
    val offsets = base.groupBy(col("_shard"))
      .agg(sum(col("n_chars")).as("_w"))
      .withColumn("_offset",
        coalesce(sum(col("_w")).over(
          Window.orderBy(col("_shard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_shard"), col("_offset"))
    val total = docs.agg(sum(col("n_chars")).as("_W"))
    base
      .withColumn("_lcum", sum(col("n_chars")).over(perShard))
      .join(broadcast(offsets), Seq("_shard"))
      .withColumn("_cum", col("_offset") + col("_lcum"))
      .crossJoin(broadcast(total))
      .filter(expr(s"(_cum * $sampleN) div _W") >
        expr(s"((_cum - n_chars) * $sampleN) div _W"))
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Largest-remainder apportionment of a global document budget
    * across sources: each source's exact share B·n_s/N splits into an
    * integer base `(B·n_s) div N` plus a remainder; the leftover
    * `B − Σ base` seats go to the largest remainders (source
    * tie-break). The quota table a mixture recipe computes BEFORE
    * selecting documents (q70 takes a quota as given; this derives
    * one): quotas sum to EXACTLY the budget — the property
    * independent per-source rounding cannot give — and every step is
    * integer arithmetic, so the allocation is engine- and
    * partitioning-exact.
    *
    * Scale shape: one |sources|-bounded count aggregate; the ranking
    * window runs over |sources| rows — metadata, whatever the corpus
    * size. Products stay in LONG (B·n_s overflows past ~9e18; the
    * DECIMAL(38,0) swap is mechanical). */
  def apportionQuota(docs: DataFrame, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    // |sources| rows, but derived from a full corpus scan — persist so
    // the total/leftover re-reads hit the tiny aggregate, not the scan
    // Caching contract: the returned frame is lazy over this
    // |sources|-row entry — evictable, swept by one-shot runners
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withTotal = counts.crossJoin(broadcast(
      counts.agg(sum(col("n_docs")).as("_N"))))
      .withColumn("_base", expr(s"($budget * n_docs) div _N"))
      .withColumn("_rem", expr(s"($budget * n_docs) % _N"))
    withTotal
      .crossJoin(broadcast(withTotal.agg(
        (lit(budget) - sum(col("_base"))).as("_L"))))
      .withColumn("_rk", row_number().over(
        Window.orderBy(col("_rem").desc, col("source"))))
      .select(col("source"), col("n_docs"),
        (col("_base") + when(col("_rk") <= col("_L"), 1L).otherwise(0L))
          .as("quota"))
      .orderBy(col("source"))
  }

  /** Contiguous global enumeration (gid = 0,1,2,… in (source, doc_id)
    * order) WITHOUT a global single-partition window — the two-phase
    * prefix-sum pattern: per-source row numbers run in parallel
    * (window partitioned by source), per-source counts fold to
    * cumulative offsets over |sources| rows (metadata), and the offset
    * broadcasts back. Exactly row_number() over the global order, at
    * scale a global window cannot run. Training pipelines need this
    * for stable example ids / shard manifests (monotonically
    * increasing ids are neither contiguous nor reproducible across
    * partitionings).
    *
    * Scale shape: one shuffle on source + a broadcast offset join. A
    * single mega-source serializes its own window partition — the
    * documented swap is the same trick one level down: range-split
    * the source on doc_id, enumerate per range, offset per range. */
  def enumerateCorpus(docs: DataFrame): DataFrame = {
    val perSource = Window.partitionBy(col("source"))
      .orderBy(col("doc_id"))
    val numbered = docs.select(col("doc_id"), col("source"))
      .withColumn("_rn", row_number().over(perSource).cast("long"))
    // counts come from the raw scan (column-pruned to `source`), not
    // from `numbered` — don't make the offset pass pay for the window
    val offsets = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_offset",
        coalesce(sum(col("_n")).over(
          Window.orderBy(col("source"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("_offset"))
    numbered
      .join(broadcast(offsets), Seq("source"))
      .select(col("doc_id"), col("source"),
        (col("_offset") + col("_rn") - 1).as("gid"))
      .orderBy(col("gid"))
  }

  def interleaveShards(docs: DataFrame, nShards: Int = 8): DataFrame = {
    require(nShards >= 1, "nShards must be positive")
    val mixed = pmod(col("doc_id") * lit(2654435761L), lit(4294967296L))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("_mix"), col("doc_id"))
    docs
      .select(col("doc_id"), mixed.as("_mix"))
      .withColumn("shard", pmod(col("_mix"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }
  /** Neyman-optimal stratified sample allocation: each source's share
    * of a `budget` draws is proportional to N_s·σ_s (population size
    * × length std-dev) — the minimum-variance allocation for
    * estimating corpus statistics from a sample (Neyman 1934), and
    * the principled alternative to q128's proportional quotas when
    * strata differ in spread (a high-variance crawl needs MORE
    * samples per document than a uniform one).
    *
    * Determinism discipline: moments ride exact DECIMAL(38,0) sums
    * (products via DECIMAL(19,0) casts so no width-38 overflow
    * rescaling); σ derives identically on every engine; the weight
    * N·σ rounds to 6 decimals and SCALES TO AN INTEGER (×10⁶), so
    * the base/remainder split and largest-remainder seats are pure
    * integer arithmetic (q128's apportionment, on Neyman weights).
    * Degenerate all-zero-variance corpora have Σw = 0 and yield null
    * quotas (guard upstream).
    *
    * Scale shape: one bounded per-source moment aggregate touches the
    * corpus; weights, totals, ranking all run on |sources| rows. */
  def neymanAllocation(docs: DataFrame, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val stats = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast(d19).cast(d38)).as("_s1"),
        sum((col("n_chars").cast(d19) * col("n_chars").cast(d19))
          .cast(d38)).as("_s2"))
      .select(col("source"), col("n_docs"),
        sqrt((col("_s2").cast("double") -
          col("_s1").cast("double") * col("_s1").cast("double") /
            col("n_docs")) / col("n_docs")).as("_std"))
    // persisted (|sources| rows): feeds the Σw fold AND the returned
    // frame. Caching contract: returned frame is lazy over the entry —
    // evictable, swept by one-shot runners (sourceOverlap's note)
    val st = stats.select(col("source"), col("n_docs"),
      round(col("_std"), 12).as("std_chars"),
      (round(col("n_docs") * col("_std"), 6) * lit(1000000))
        .cast(d38).as("_w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Overflow guard for the apportionment product: budget (≤ 18
    // digits) × weight must fit DECIMAL(38,0), so the integer weights
    // are pre-scaled by ONE shared power of ten sized off Σw's digit
    // count (Σw ≤ 10¹⁸ after the shift ⇒ every wᵢ fits DECIMAL(19,0)
    // and the product precision is 18+19+1 = 38, exact). Quotas depend
    // only on weight RATIOS, so at corpora where the shift is 0 (all
    // test scales; Σw < 10¹⁸ means N·σ·10⁶ summed under a quintillion)
    // the result is bit-identical to the unscaled form; past the cliff
    // the div drops shared low-order digits instead of silently
    // nulling the quotas (the pre-r12 CAST(_w AS DECIMAL(19,0))
    // overflowed to NULL once any N·σ·10⁶ reached 10¹⁹). The power of
    // ten is built by string concat, not pow(): doubles above 2⁵³
    // cannot represent 10ⁿ exactly.
    val tot = st.agg(sum(col("_w")).as("_wtot"))
      .withColumn("_pow",
        expr("CAST(concat('1', repeat('0', " +
          "greatest(0, length(CAST(_wtot AS STRING)) - 18))) " +
          "AS DECIMAL(38,0))"))
    val scaled = st.crossJoin(broadcast(tot))
      .withColumn("_w2", expr("_w div _pow"))
    val tot2 = scaled.agg(sum(col("_w2")).as("_wtot2"))
    val based = scaled.crossJoin(broadcast(tot2))
      .withColumn("_base",
        expr(s"(CAST($budget AS DECIMAL(18,0)) * CAST(_w2 AS DECIMAL(19,0))) div _wtot2")
          .cast("long"))
      .withColumn("_rem",
        expr(s"(CAST($budget AS DECIMAL(18,0)) * CAST(_w2 AS DECIMAL(19,0))) % _wtot2"))
    based
      .crossJoin(broadcast(based.agg(
        (lit(budget) - sum(col("_base"))).as("_L"))))
      .withColumn("_rk", row_number().over(
        Window.orderBy(col("_rem").desc, col("source"))))
      .select(col("source"), col("n_docs"), col("std_chars"),
        (col("_base") + when(col("_rk") <= col("_L"), 1L).otherwise(0L))
          .as("quota"))
      .orderBy(col("source"))
  }

  /** Dedup savings projection per source: how many tokens the q49
    * transitive near-dup dedup would REMOVE — the "is this dedup run
    * worth its compute" estimate a curation pipeline prices before
    * committing, and the per-source attribution of where duplication
    * lives (pairs with q91's doc-level dup rate; this is the
    * TOKEN-weighted view that actually maps to training cost).
    *
    * Scale shape: inherits the q29→q47 pair/CC shapes; the savings
    * accounting adds one hash join of the corpus against the (far
    * sub-corpus) loser set and one bounded per-source fold. */
  def dedupSavings(docs: DataFrame, n: Int = 3, minJ: Double = 0.7)
      : DataFrame = {
    val losers = NearDup.duplicateClusters(
        NearDup.jaccardPairs(docs, n, minJ))
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"), lit(1).as("_drop"))
    docs
      .select(col("doc_id"), col("source"),
        TextFunctions.tokenCount(col("text")).as("_nt"))
      .join(losers, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_nt")).as("n_tokens"),
        count(col("_drop")).as("n_dropped"),
        coalesce(sum(when(col("_drop").isNotNull, col("_nt"))), lit(0L))
          .as("dropped_tokens"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_dropped"), col("dropped_tokens"),
        round(col("dropped_tokens").cast("double") /
          col("n_tokens").cast("double"), 12).as("savings_frac"))
      .orderBy(col("source"))
  }

  /** q191: DSIR-style importance selection (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling") with
    * word-unigram features: train add-one-smoothed unigram LMs over a
    * TARGET slice (docs whose `lang` matches `targetLang` — the
    * practitioner's "domain I want more of") and over the RAW corpus,
    * weight every document by its summed per-token log-likelihood
    * ratio, and gate on weight > 0 ("more target-like than
    * corpus-like"). Reported per source: docs, selected docs, selection
    * rate, and token-weighted mean log-ratio overall / selected — the
    * audit of which sources the importance weights would up/down-weight
    * before committing a resampled mix. (True DSIR resamples
    * proportionally to the weight; the deterministic gate is the
    * oracle-checkable core — a sampled variant would ride the q126
    * systematic-sampling machinery with these weights as input.)
    *
    * Determinism (oracle hash-compares): both probabilities share one
    * vocabulary (the corpus's), each per-TYPE log ratio rounds to 6
    * decimals into DECIMAL(18,6) before any sum (q113's libm
    * discipline — a 1-ulp libm divergence only matters within ~1e-16
    * of a rounding boundary), per-doc and per-source sums are exact
    * decimal folds, and the gate compares the exact decimal sum to 0.
    * Docs with zero tokens never enter the token stream and are
    * excluded (q113's semantics).
    *
    * Scale shape: q52/q113's — the frequency aggregate is map-side
    * combined and vocab-bounded, the totals row broadcasts, the
    * per-type ratio table is vocab-bounded, and the token stream
    * shuffles ONCE on token for the join-back, then folds to |docs|
    * and |sources| rows. Nothing downstream of the scan is wider than
    * the token stream; no global sort. Caching contract: the token
    * stream persists (MEMORY_AND_DISK, evictable) because the LM
    * build and the join-back both read it; the returned frame is lazy
    * over that entry, so a long-lived session unpersists after
    * consuming the result. */
  def dsirSelection(docs: DataFrame, targetLang: String = "en")
      : DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val toks = docs
      .select(col("doc_id"), col("source"),
        (col("lang") === lit(targetLang)).as("_tgt"),
        explode(TextFunctions.tokens(col("text"))).as("token"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val freq = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("_cr"),
        count(when(col("_tgt"), lit(1))).as("_ct"))
    val tot = freq.agg(sum(col("_cr")).as("_Nr"),
      sum(col("_ct")).as("_Nt"), count(lit(1)).as("_V"))
    val lr = round(
      log10((col("_ct") + 1).cast("double") /
        (col("_Nt") + col("_V")).cast("double")) -
      log10((col("_cr") + 1).cast("double") /
        (col("_Nr") + col("_V")).cast("double")), 6).cast(dec)
    val term = freq.crossJoin(broadcast(tot))
      .select(col("token"), lr.as("_lr"))
    toks
      .join(term, "token")
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("_lr")).as("_s"), count(lit(1)).as("_n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("_s") > 0, lit(1))).as("n_selected"),
        sum(col("_s")).as("_sw_all"), sum(col("_n")).as("_nt_all"),
        sum(when(col("_s") > 0, col("_s"))).as("_sw_sel"),
        sum(when(col("_s") > 0, col("_n"))).as("_nt_sel"))
      .select(col("source"), col("n_docs"), col("n_selected"),
        round(col("n_selected").cast("double") /
          col("n_docs").cast("double"), 12).as("sel_rate"),
        round(col("_sw_all").cast("double") /
          col("_nt_all").cast("double"), 12).as("mean_lr_token"),
        when(col("_nt_sel") > 0,
          round(col("_sw_sel").cast("double") /
            col("_nt_sel").cast("double"), 12)).as("mean_lr_selected"))
      .orderBy(col("source"))
  }

  /** Corpus snapshot diff (q186): reconcile two corpus versions by
    * content FINGERPRINT and report per source how many documents were
    * added / removed / changed / unchanged plus the churn fraction —
    * the pre-flight a retraining run reads to decide whether a new
    * crawl drop warrants re-deduplication (high churn) or an
    * incremental append (low churn). md5 rather than raw text equality
    * because at 100 TB the reconciliation join must carry a 16-byte
    * fingerprint per doc, never the document bodies.
    *
    * Scale shape: each side is ONE scan projected to (doc_id, source,
    * md5) — the full-outer join shuffles 3 narrow columns keyed on
    * doc_id (co-locatable under bucketing for repeated diffs), then one
    * bounded |sources|-row aggregate. Classification is a map-side CASE
    * over null-ness + hash equality. */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    def fp(df: DataFrame, tag: String): DataFrame =
      df.select(col("doc_id"),
        col("source").as(s"_src_$tag"),
        md5(col("text")).as(s"_h_$tag"))
    fp(oldDocs, "o").join(fp(newDocs, "n"), Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("_src_n"), col("_src_o")).as("source"),
        when(col("_h_o").isNull, "added")
          .when(col("_h_n").isNull, "removed")
          .when(col("_h_o") === col("_h_n"), "unchanged")
          .otherwise("changed").as("_st"))
      .groupBy(col("source"))
      .agg(count(when(col("_st") === "added", lit(1))).as("n_added"),
        count(when(col("_st") === "removed", lit(1))).as("n_removed"),
        count(when(col("_st") === "changed", lit(1))).as("n_changed"),
        count(when(col("_st") === "unchanged", lit(1)))
          .as("n_unchanged"))
      .select(col("source"), col("n_added"), col("n_removed"),
        col("n_changed"), col("n_unchanged"),
        round((col("n_added") + col("n_removed") + col("n_changed"))
          .cast("double") /
          (col("n_added") + col("n_removed") + col("n_changed") +
            col("n_unchanged")).cast("double"), 12).as("churn_frac"))
      .orderBy(col("source"))
  }


  /** q209: deterministic quality-weighted corpus sample — the
    * Efraimidis–Spirakis A-ES scheme (Efraimidis & Spirakis 2006):
    * each doc draws u ~ Uniform(0,1] and ranks by key = u^(1/w); the
    * per-source top-k by key is a weighted sample WITHOUT replacement
    * where selection probability is proportional to weight. Weight
    * here is n_chars+1 (longer docs proportionally likelier — the
    * shape used to bias a pretraining mix toward substantive pages;
    * +1 keeps empty docs drawable). u comes from the engine-shared
    * counter LCG convention (q193): u = (h+1)/(2^31+1) with
    * h = (abs(doc_id)·1103515245 + 12345) mod 2^31 — no RNG state, so
    * the "sample" is a pure function of the table and replays
    * identically on both engines and any partitioning.
    *
    * Determinism: integer LCG exactly mirrored in SQL; the ONLY
    * float steps are one pow per row and the rank compare — a rank
    * flip needs two keys within ~1 ulp of each other, vanishing on
    * 31-bit-distinct u values. Published key rounds to 12.
    *
    * Scale shape: the naive form (one window over each source
    * partition) serializes every row of a source through one reducer.
    * This runs the LOSSLESS two-phase prune instead: phase 1 ranks
    * within (source, shard) — doc_id mod `shards`, map-parallel — and
    * keeps k per shard (a global top-k member is necessarily top-k in
    * its own shard, so the prune drops no candidate); phase 2
    * exact-ranks the ≤ shards·k survivors per source. Output is
    * IDENTICAL to the naive window (CurationSpec pins it); the
    * per-source reducer sees bounded rows at any corpus size.
    *
    * The phase-2 bound is the PRODUCT shards·k, so `shards` is a
    * ceiling, not a constant: the effective shard count is
    * min(shards, max(1, PHASE2_CAP/k)), keeping the per-source
    * phase-2 reducer under ~PHASE2_CAP rows for any k the caller
    * asks for (at k ≥ PHASE2_CAP the prune degenerates to one shard
    * = the naive window, which is also the correct trade there —
    * a top-k that big IS the reducer's output). Output is shard-
    * count-invariant (the prune is lossless), so the derivation
    * never changes results, only the plan shape. */
  def weightedSample(docs: DataFrame, k: Int = 50,
      shards: Int = 32): DataFrame = {
    require(k >= 1, "k must be positive")
    require(shards >= 1, "shards must be positive")
    // cap the phase-2 per-source reducer input at ~64k rows
    val Phase2Cap = 65536
    val effShards = math.min(shards, math.max(1, Phase2Cap / k))
    val two31 = 2147483648L
    val h = pmod(pmod(abs(col("doc_id")), lit(two31)) * lit(1103515245L) +
      lit(12345L), lit(two31))
    val u = (h + lit(1L)).cast("double") / lit((two31 + 1).toDouble)
    val key = pow(u, lit(1.0) / (col("n_chars") + lit(1L)).cast("double"))
    val keyed = docs.select(col("source"), col("doc_id"), col("n_chars"),
      key.as("_key"),
      pmod(abs(col("doc_id")), lit(effShards.toLong)).as("_shard"))
    val wShard = Window.partitionBy(col("source"), col("_shard"))
      .orderBy(col("_key").desc, col("doc_id"))
    val pruned = keyed
      .withColumn("_srk", row_number().over(wShard))
      .filter(col("_srk") <= k)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("_key").desc, col("doc_id"))
    pruned
      .withColumn("_rk", row_number().over(w).cast("long"))
      .filter(col("_rk") <= k)
      .select(col("source"), col("doc_id"), col("n_chars"),
        round(col("_key"), 12).as("sample_key"), col("_rk").as("rank"))
      .orderBy(col("source"), col("rank"))
  }

  /** The naive single-window form of weightedSample — kept private
    * as the spec's equality oracle for the two-phase prune. */
  private[operators] def weightedSampleNaive(docs: DataFrame,
      k: Int): DataFrame = {
    val two31 = 2147483648L
    val h = pmod(pmod(abs(col("doc_id")), lit(two31)) * lit(1103515245L) +
      lit(12345L), lit(two31))
    val u = (h + lit(1L)).cast("double") / lit((two31 + 1).toDouble)
    val key = pow(u, lit(1.0) / (col("n_chars") + lit(1L)).cast("double"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("_key").desc, col("doc_id"))
    docs.select(col("source"), col("doc_id"), col("n_chars"),
        key.as("_key"))
      .withColumn("_rk", row_number().over(w).cast("long"))
      .filter(col("_rk") <= k)
      .select(col("source"), col("doc_id"), col("n_chars"),
        round(col("_key"), 12).as("sample_key"), col("_rk").as("rank"))
      .orderBy(col("source"), col("rank"))
  }

  /** q215: training-mixture plan with temperature smoothing — the
    * per-source sampling schedule a multi-source pretraining run
    * derives before the first batch: target share ∝ (natural token
    * mass)^α with α = 0.5 (the multinomial temperature smoothing of
    * multilingual LM training — mBERT/XLM-R's exponent: big sources
    * are damped, small sources boosted, without ever inverting the
    * order), scaled to a total token `budget`. Per source: natural
    * tokens, natural vs target share, the planned token count, the
    * sampling rate (> 1 means UPSAMPLING), and the epoch count
    * (ceil of the rate — how many passes over the source the plan
    * implies; the "how many times will we repeat the small corpus"
    * number the data-repetition literature warns about).
    *
    * Determinism: token counts are exact integer sums; α = 0.5 makes
    * the smoothing a SQRT — correctly rounded IEEE on every engine
    * (no libm variance at all); each sqrt rounds 9 dp into
    * DECIMAL(28,9) before the order-free Σ; shares and rates round
    * 12; planned tokens floor an exact double chain.
    *
    * Scale shape: ONE map-side token-count scan folds to a bounded
    * per-source aggregate; every derivation after runs on |sources|
    * rows with the one-row Σ broadcast.
    *
    * Edge contract: a source with ZERO tokens gets weight 0 (sqrt(0)),
    * planned_tokens 0 and a NULL sample_rate/epochs (0/0 — there is
    * nothing to sample); budget 0 plans 0 everywhere. */
  /** q222: DEDUP-AWARE mixture plan — the composition the q215/q216
    * pair exists for: q215 consuming RAW token counts over-weights a
    * duplicate-heavy crawl (its usable mass is smaller than its disk
    * mass), so this plan runs the same α=0.5 temperature smoothing
    * over the NEAR-DUP-SURVIVING token mass (q216's min-id-survivor
    * accounting: q29 pairs → q47 CC → q49 policy). The report carries
    * both masses and the retention ratio, so the delta against the
    * raw-count plan is visible per source; sample_rate and epochs
    * divide the EFFECTIVE mass — an epochs value of 2 now honestly
    * means "the deduped source repeats twice", which the raw-count
    * plan understated by exactly the retention factor.
    *
    * A fully-duplicated source (zero surviving tokens) gets zero
    * weight, zero planned tokens, and NULL rate/epochs — it must not
    * silently absorb budget the survivors can use.
    *
    * Determinism and scale shape: q216's inverted-index + pointer-
    * jumping feeds a |sources|-row frame; everything after is q215's
    * math verbatim (correctly-rounded IEEE sqrt rounds 9 dp into
    * DECIMAL(28,9), shares/rates round 12, planned tokens floor the
    * identical double chain). */
  def mixturePlanEffective(docs: DataFrame, budget: Long, n: Int = 3,
      minJ: Double = 0.7): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val dec = org.apache.spark.sql.types.DecimalType(28, 9)
    val perSource = NearDup.effectiveTokens(docs, n, minJ)
      .select(col("source"), col("n_tokens_raw"),
        col("n_tokens_kept").as("n_tokens_eff"), col("token_retention"),
        round(sqrt(col("n_tokens_kept").cast("double")), 9).cast(dec)
          .as("_w"))
    val tot = perSource.agg(sum(col("n_tokens_eff")).as("_ntot"),
      sum(col("_w")).as("_wtot"))
    perSource.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens_raw"), col("n_tokens_eff"),
        col("token_retention"),
        round(col("n_tokens_eff").cast("double") /
          col("_ntot").cast("double"), 12).as("natural_share"),
        round(col("_w").cast("double") /
          col("_wtot").cast("double"), 12).as("target_share"),
        floor(lit(budget.toDouble) * col("_w").cast("double") /
          col("_wtot").cast("double")).cast("long").as("planned_tokens"))
      .withColumn("sample_rate",
        when(col("n_tokens_eff") > 0L,
          round(col("planned_tokens").cast("double") /
            col("n_tokens_eff").cast("double"), 12))
          .otherwise(lit(null).cast("double")))
      .withColumn("epochs",
        when(col("n_tokens_eff") > 0L,
          ceil(col("sample_rate")).cast("long"))
          .otherwise(lit(null).cast("long")))
      .orderBy(col("source"))
  }

  def mixturePlan(docs: DataFrame, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val dec = org.apache.spark.sql.types.DecimalType(28, 9)
    val perSource = docs.groupBy(col("source"))
      .agg(sum(TextFunctions.tokenCount(col("text")).cast("long"))
        .as("n_tokens"))
      .select(col("source"), col("n_tokens"),
        round(sqrt(col("n_tokens").cast("double")), 9).cast(dec)
          .as("_w"))
    val tot = perSource.agg(sum(col("n_tokens")).as("_ntot"),
      sum(col("_w")).as("_wtot"))
    perSource.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"),
        round(col("n_tokens").cast("double") /
          col("_ntot").cast("double"), 12).as("natural_share"),
        round(col("_w").cast("double") /
          col("_wtot").cast("double"), 12).as("target_share"),
        floor(lit(budget.toDouble) * col("_w").cast("double") /
          col("_wtot").cast("double")).cast("long").as("planned_tokens"))
      .withColumn("sample_rate",
        round(col("planned_tokens").cast("double") /
          col("n_tokens").cast("double"), 12))
      .withColumn("epochs", ceil(col("sample_rate")).cast("long"))
      .orderBy(col("source"))
  }

}
