package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for LLM-data pipelines (north-star ops
  * beyond the reference: language ID, quality scoring, token counting,
  * fingerprinting, shingling). All native Column expression trees —
  * whole-stage codegen, no UDFs, trivially partition-parallel.
  */
object TextFunctions {

  /** Canonical stopword list — shared by the Column trees, the native
    * DocProfileStats expression, and (via TextOps.DefaultStopwords) the
    * DuckDB oracle SQL. */
  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Marker tokens for the 'en' language heuristic (langIdHeuristic). */
  val EnMarkers: Seq[String] = Seq("the", "a", "of", "and")

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  def tokenCount(text: Column): Column =
    size(tokens(text)).cast("long")

  /** Sub-word tokens: split on non-alphanumeric runs after lowercasing —
    * a cheap BPE-ish proxy for token-budget estimation. */
  def subTokenCount(text: Column): Column =
    size(filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")).cast("long")

  /** ~4 chars/token heuristic used for LLM budget estimates. */
  def approxBpeTokenCount(text: Column): Column =
    ceil(length(text).cast("double") / 4.0).cast("long")

  /** Fraction of whitespace tokens that appear in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    stopwordRatioOf(tokens(text), stopwords)

  /** stopwordRatio over an already-materialized token array (pass the
    * attribute, not the tokens() tree, when the array is reused). */
  def stopwordRatioOf(toks: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(filter(toks, t => array_contains(sw, t)))
        .cast("double") / size(toks))
  }

  /** Fraction of characters that are ASCII letters. */
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
          length(text))

  /** Mean whitespace-token length. */
  def meanTokenLength(text: Column): Column =
    meanTokenLengthOf(tokens(text))

  /** meanTokenLength over an already-materialized token array. */
  def meanTokenLengthOf(toks: Column): Column =
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t))
          .cast("double") / size(toks))

  /** Marker-word language heuristic: the language whose marker set hits
    * the most tokens wins; 'und' when nothing matches. Deterministic and
    * SQL-expressible, so it oracles cleanly. */
  def langIdHeuristic(text: Column): Column = {
    val toks = tokens(lower(text))
    def hits(markers: Seq[String]): Column =
      size(filter(toks, t => array_contains(array(markers.map(lit): _*), t)))
    val en = hits(EnMarkers)
    when(size(toks) === 0, lit("und"))
      .when(en > 0, lit("en"))
      .otherwise(lit("und"))
  }

  /** Whitespace-normalized lowercase form for near-identity dedup. */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** 128-bit content fingerprint of the normalized text (md5 hex — same
    * digest on any engine, unlike engine-native hash functions). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Distinct word n-gram shingles: ["a b c d e", ...]. Guarded for
    * short documents (sequence() would go descending on size < n). */
  def shingles(text: Column, n: Int): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(1), size(w) - (n - 1)),
        i => array_join(slice(w, i, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Word n-grams WITH multiplicity (shingles() is distinct-set
    * semantics; repetition metrics must count repeats). `toks` must be a
    * MATERIALIZED array attribute, not the tokens() tree — a lambda over
    * the tree would re-evaluate the split per element reference. */
  def ngramsWithMultiplicity(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Fraction of n-gram occurrences that are repeats of an earlier one
    * (1 - distinct/total; 0 for docs shorter than n tokens) — the
    * Gopher-style "duplicate n-gram fraction" repetition signal. */
  def dupNgramFrac(toks: Column, n: Int): Column = {
    val g = ngramsWithMultiplicity(toks, n)
    when(size(g) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(g)).cast("double") / size(g))
  }

  /** Longest run of consecutive identical tokens (0 for empty docs) —
    * the stutter signal behind TextOps.collapseTokenRuns. One
    * left-to-right fold: state (prev, run, best); interpreted HOF —
    * per-row O(len), native-Expression upgrade path as collapseTokenRuns
    * had before CollapseRuns. */
  def maxTokenRun(toks: Column): Column =
    aggregate(toks,
      struct(lit("").as("p"), lit(0L).as("r"), lit(0L).as("b")),
      (acc, t) => {
        val run = when(t === acc.getField("p"),
          acc.getField("r") + 1L).otherwise(lit(1L))
        struct(t.as("p"), run.as("r"),
          greatest(run, acc.getField("b")).as("b"))
      },
      acc => acc.getField("b"))

  /** Fraction of bigram occurrences taken by the single most frequent
    * bigram (0 for docs under 2 tokens) — Gopher's "top n-gram
    * fraction". Longest run in the SORTED bigram array = the max
    * multiplicity, so one sort + one fold, no per-doc group-by. */
  def topBigramFrac(toks: Column): Column = {
    val bg = ngramsWithMultiplicity(toks, 2)
    when(size(bg) === 0, lit(0.0))
      .otherwise(maxTokenRun(array_sort(bg)).cast("double") / size(bg))
  }

  /** Polynomial rolling hash over codepoints: h = (h*31 + cp) mod 1e9+7.
    * Expression-tree form (see also graft.functions.RollingHash, the
    * codegen'd native Expression used on the hot path). */
  def rollingHash(text: Column): Column =
    aggregate(
      transform(split(text, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, cp) => (acc * 31 + cp) % 1000000007L)
}
