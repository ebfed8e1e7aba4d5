package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    TextOps.filterQuality(
      docs.withColumn("text",
        graft.functions.GraftFunctions.normalizeText(
          TextOps.markupCleanText(col("text")))))
      .withColumn("text", TextOps.piiCleanText(col("text")))

  def pipeline(docs: DataFrame, packTokens: Long = 256L,
      minJ: Double = 0.7, bands: Int = 16): DataFrame = {
    // persisted: the scrubbed frame feeds three plan consumers (LSH
    // signatures, candidate verification re-shingle, final anti-join) —
    // without it the gate + four-regex scrub re-run per consumer (same
    // bounded cache-lifecycle note as NearDup.minHashLshPairs)
    val scrubbed = prepare(docs)
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
}
