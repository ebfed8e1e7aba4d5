package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TextFunctions}

/** Text-analysis operators over the `documents` table — the LLM-data-
  * pipeline half of the north star (token budgeting, quality scoring,
  * language ID, content fingerprinting). Everything is a native Column
  * expression tree (TextFunctions) inside ordinary aggregate/project
  * plans, so each query is one scan + (at most) one shuffle:
  *
  *  - per-doc profiles are pure map-side projections — no shuffle at all,
  *    embarrassingly parallel at 100 TB;
  *  - per-group stats are partial+final hash aggregates on low-cardinality
  *    keys (source/lang) — the map-side combine shrinks the shuffle to
  *    #groups × #partitions rows;
  *  - token frequency is the only data-sized shuffle (explode + group by
  *    token) and ends in a TakeOrderedAndProject for the top-k.
  */
object TextOps {

  /** Stopword list shared with the DuckDB oracle — keep in sync with
    * SparkEntry.oracleSql. */
  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Corpus stats per source: doc/char/token totals (SURVEY §2.5 A1/A2
    * generalized to the documents table). */
  def docStatsBySource(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(TextFunctions.tokenCount(col("text"))).as("total_tokens"),
        max(col("n_chars")).as("max_chars"),
        min(col("n_chars")).as("min_chars"))
      .orderBy(col("source"))

  /** Per-language corpus profile. The alpha ratio is a ratio of integer
    * SUMS (not an average of per-doc doubles), so the result is exact and
    * independent of accumulation order — reproducible at any parallelism. */
  def langProfile(docs: DataFrame): DataFrame = {
    val alphaChars =
      length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long")
    docs.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        sum(alphaChars).as("alpha_chars"),
        sum(TextFunctions.tokenCount(col("text"))).as("total_tokens"))
      .withColumn("alpha_pct",
        col("alpha_chars").cast("double") / col("total_chars"))
      .orderBy(col("lang"))
  }

  /** Per-document quality/token profile: the feature vector a training-
    * data pipeline filters on. The profile computation itself is a pure
    * map-side projection; the trailing ORDER BY exists for verification
    * determinism and is the plan's only exchange (PlanSpec asserts this)
    * — drop it when composing into a pipeline. Every double column is a
    * single division of exact integers, so values are bit-identical
    * across engines and partitionings. */
  def docProfile(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"),
      TextFunctions.subTokenCount(col("text")).as("n_subtokens"),
      TextFunctions.approxBpeTokenCount(col("text")).as("n_bpe_est"),
      TextFunctions.alphaRatio(col("text")).as("alpha_ratio"),
      TextFunctions.meanTokenLength(col("text")).as("mean_token_len"),
      TextFunctions.stopwordRatio(col("text"), DefaultStopwords)
        .as("stopword_ratio"),
      TextFunctions.langIdHeuristic(col("text")).as("lang_guess"))
      .orderBy(col("doc_id"))

  /** Global token frequency, top k. The one genuinely data-sized shuffle
    * in this module: explode to (token) then hash-aggregate; partial
    * aggregation collapses each map partition to its distinct tokens
    * before the shuffle, and the final top-k is TakeOrderedAndProject. */
  def tokenFrequency(docs: DataFrame, k: Int): DataFrame =
    docs.select(explode(TextFunctions.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Deterministic train/val/test assignment by CONTENT hash — the
    * reproducible-split primitive of a training pipeline: the same
    * document lands in the same split on every run, every engine, any
    * partitioning (unlike rand()-based sampling), and near-identical
    * re-crawls move together only if byte-identical. Buckets: rolling
    * hash mod 100 → [0,train) train, [train,train+val) val, rest test.
    * Map-side projection + tiny aggregate. */
  def trainValTestSplit(spark: SparkSession, docs: DataFrame,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = pmod(GraftFunctions.rollingHash(spark, col("text")),
      lit(100L))
    docs
      .withColumn("split",
        when(bucket < trainPct, lit("train"))
          .when(bucket < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("split"))
  }

  /** EXACT heavy-hitter tokens at sketch cost: all tokens whose
    * frequency strictly exceeds n/k of the corpus (n = total token
    * occurrences), computed in two passes —
    *  1. a mergeable Misra-Gries sketch (native MisraGries aggregate)
    *     whose partial state is ≤k counters per partition regardless of
    *     input size, guaranteed to emit every true heavy hitter as a
    *     candidate;
    *  2. an exact count restricted to the ≤k candidates (the one-row
    *     sketch broadcasts; non-candidates are filtered map-side before
    *     the aggregation, so the shuffle carries ≤k distinct keys).
    * The final answer equals plain `GROUP BY token HAVING count*k > n`
    * — bit-exact and independent of merge order (any candidate superset
    * yields the same rows) — but where exact global token frequency
    * (q27's shape) shuffles every distinct token, this shuffles O(k).
    * Same sketch-then-verify shape as the LSH dedup paths. */
  def heavyHitterTokens(docs: DataFrame, k: Int = 100): DataFrame = {
    val toks = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("token"))
    val sketch = toks
      .agg(GraftFunctions.misraGries(col("token"), k).as("mg"))
      .select(col("mg.n").as("_n"), col("mg.candidates").as("_cand"))
    toks
      .crossJoin(broadcast(sketch))
      .filter(array_contains(col("_cand"), col("token")))
      .groupBy(col("token"), col("_n"))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") * k > col("_n"))
      .select(col("token"), col("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token"))
  }

  /** Token-budget corpus selection: per source, admit documents
    * longest-first until the cumulative whitespace-token count reaches
    * `budgetTokens` — the "fill the training mix to N tokens per source"
    * primitive of corpus assembly. Deterministic: ordering is
    * (n_tokens DESC, doc_id) so reruns and engines agree; a doc that
    * would overflow the budget is excluded (and so is everything after
    * it in that source's order — a prefix, not a knapsack).
    *
    * One shuffle on source + one linear window pass per source. The
    * running sum is a rows-unbounded-preceding frame, so it streams —
    * no per-group buffering. Per-source sort is the scale cost: with
    * billions of docs in one source, first cut the tail map-side with an
    * approx_percentile token-count threshold, then run this on the
    * survivors (same pattern as q32/x07 exact-vs-sketch). */
  def selectWithinTokenBudget(docs: DataFrame,
      budgetTokens: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("n_tokens").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .select(col("doc_id"), col("source"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetTokens)
      .orderBy(col("source"), col("cum_tokens"), col("doc_id"))
  }

  /** Keyword search: documents whose whitespace-token set contains
    * `term` — the Spark form of the reference's core access path, the
    * GIN-indexed to_tsvector keyword query (init.sql:20; keyword-driven
    * search etl/etl.py:182-222). Token membership implies substring
    * containment, so a `text CONTAINS term` conjunct is added first: it
    * is PUSHED INTO the parquet scan (StringContains page/row-group
    * pruning — PlanSpec asserts), and the exact tokenized check runs only
    * on surviving rows. Map-side except the verification ORDER BY. */
  def searchByToken(docs: DataFrame, term: String): DataFrame = {
    require(term.nonEmpty && !term.exists(_.isWhitespace),
      "term must be a single non-empty token")
    docs
      .filter(col("text").contains(term))
      .filter(array_contains(TextFunctions.tokens(col("text")), term))
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Phrase search: documents containing `phrase`'s words CONSECUTIVELY
    * as whitespace tokens (n-gram shingle membership, n = phrase length —
    * whitespace-RUN differences don't break the match, unlike a raw
    * substring test). Every word is itself a token, hence a substring:
    * each `contains` conjunct is scan-pushed. The consecutive-token test
    * compiles to ONE codegen'd regexp per surviving row — exactly
    * equivalent to membership in TextFunctions.shingles(text, n):
    * tokens are maximal space-free runs, so consecutive tokens are
    * separated by " +", the phrase head is preceded by start-of-input or
    * a space, and the tail is followed by a space or end-of-input (`\z`,
    * NOT `$` — Java's `$` also matches before a final newline, which
    * would falsely match a trailing token like "scan\n"). */
  def searchByPhrase(docs: DataFrame, phrase: String): DataFrame = {
    val words = phrase.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    require(words.nonEmpty, "phrase must contain at least one word")
    val pattern = "(^| )" +
      words.map(java.util.regex.Pattern.quote).mkString(" +") + "( |\\z)"
    words.foldLeft(docs)((d, w) => d.filter(col("text").contains(w)))
      .filter(col("text").rlike(pattern))
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Content fingerprints per document: md5 of whitespace-normalized text
    * (engine-portable) + the codegen'd polynomial rolling hash (native
    * Catalyst expression graft.functions.RollingHash). Map-side except
    * the verification ORDER BY — drop it for pipeline use. */
  def fingerprints(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      TextFunctions.fingerprint(col("text")).as("fp"),
      GraftFunctions.rollingHash(spark, col("text")).as("rh"))
      .orderBy(col("doc_id"))
}
