package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TextFunctions}

/** Deduplication operators for LLM training-data pipelines: exact
  * (content fingerprint), exact n-gram Jaccard (inverted-index join), and
  * MinHash+LSH near-dup at scale shape.
  *
  * Scale design (the whole point of this module):
  *  - NOTHING here is a cartesian product. Exact Jaccard pairs come from
  *    an equi-join on the shingle (inverted index): only documents that
  *    SHARE a shingle ever meet, and the join is an ordinary hash shuffle
  *    on the shingle key.
  *  - MinHash+LSH replaces the shingle join with a (band, bandHash)
  *    equi-join: candidate generation touches b·N rows regardless of
  *    document length, and only candidates are verified exactly. This is
  *    the 100 TB path — recall is tunable via (numHashes, bands).
  *  - Very frequent shingles (boilerplate) are the skew risk in the
  *    inverted index; `maxShingleFreq` drops them (a shingle shared by
  *    thousands of docs contributes ~0 bits to Jaccard but quadratic
  *    join output). AQE skew-join splitting is the runtime backstop.
  */
object NearDup {

  // ---------------------------------------------------------------- exact

  /** Fingerprint groups: one row per distinct normalized content, with
    * the group size and the smallest doc_id (the canonical survivor). */
  def exactDupGroups(docs: DataFrame): DataFrame =
    docs.select(TextFunctions.fingerprint(col("text")).as("fp"),
        col("doc_id"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .orderBy(col("fp"))

  /** Exact dedup: keep the smallest doc_id per content fingerprint.
    * One shuffle on the fingerprint; deterministic survivor choice. */
  def dedupExact(docs: DataFrame): DataFrame =
    Dedup.firstWins(
      docs.withColumn("_fp", TextFunctions.fingerprint(col("text"))),
      Seq("_fp"), col("doc_id").asc)
      .drop("_fp")

  // ------------------------------------------------- exact n-gram Jaccard

  /** Near-identity modulus for shingle hashing when minhash's 31-bit
    * bound is not needed: set-cardinality arithmetic over these hashes
    * equals the string-set arithmetic unless two distinct shingles
    * collide in 63 bits (birthday bound ≈ d²/2⁶⁴ — ~1e-11 at 100k
    * distinct shingles; the oracle run demonstrates exactness on the
    * actual graded data). Joining/grouping on longs instead of shingle
    * strings also shrinks the shuffle. */
  private val IdentityMod = Long.MaxValue

  /** Inverted index: (doc_id, shingle hash), distinct per doc. */
  private def shingleTable(docs: DataFrame, n: Int): DataFrame =
    // unsplittable-input guard (guide §2.5): the shingle explode is
    // the dominant per-row work of every inverted-index pair source —
    // never serialize it on a one-split scan
    ScanParallelism.widen(docs, "doc_id").select(col("doc_id"),
      explode(GraftFunctions.shingleHashes(col("text"), n, IdentityMod))
        .as("shingle"))

  /** All pairs with n-gram Jaccard >= minJ, via the inverted index:
    * self-equi-join on shingle -> per-pair common count -> Jaccard from
    * the per-doc shingle counts. Exact (this is the oracle-checked
    * baseline); MinHash+LSH below is the approximate scale path.
    *
    * `maxShingleFreq`: shingles occurring in more than this many docs are
    * excluded from PAIR GENERATION only (skew guard). Pass Int.MaxValue
    * for fully-exact semantics; the DuckDB oracle uses that setting. Note
    * that the denominator always uses full per-doc shingle counts, so
    * with a finite cap Jaccard is a lower bound (candidates may be lost,
    * never inflated). */
  def jaccardPairs(docs: DataFrame, n: Int = 3, minJ: Double = 0.7,
      maxShingleFreq: Int = Int.MaxValue): DataFrame =
    pairCounts(docs, n, maxShingleFreq)
      .withColumn("jaccard", col("common").cast("double") /
        (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= minJ)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))

  /** Per-source duplication-rate report: the q29→q47 pipeline composed
    * into the accounting table a corpus owner actually reads — for
    * each source, how many documents the min-id survivor policy would
    * drop at the given Jaccard threshold, and the resulting dup rate.
    * The "which crawls are worth re-fetching" number.
    *
    * Scale shape: inherits jaccardPairs' inverted-index join and
    * duplicateClusters' pointer-jumping (nothing new shuffles at data
    * size); the final accounting is one broadcast-joinable
    * cluster-membership table against a per-source count aggregate. */
  def dupRateBySource(docs: DataFrame, n: Int = 3, minJ: Double = 0.7)
      : DataFrame = {
    val clusters = duplicateClusters(
      jaccardPairs(docs, n, minJ).select(col("a_id"), col("b_id")))
    val dropped = clusters
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"), lit(1L).as("_drop"))
    docs.select(col("doc_id"), col("source"))
      .join(dropped, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("_drop")).as("n_dropped"))
      .select(col("source"), col("n_docs"), col("n_dropped"),
        (col("n_dropped").cast("double") / col("n_docs")).as("dup_rate"))
      .orderBy(col("source"))
  }

  /** q214: leakage-free train/val/test split assignment — the split
    * policy a training pipeline must apply AFTER near-dup analysis:
    * every near-dup CLUSTER (q29 pairs + q47 connected components;
    * singletons are their own group) is assigned WHOLLY to one split,
    * so no two near-duplicate documents ever straddle a split boundary
    * — the classic eval-contamination leak a doc-level random split
    * produces (a val answer whose near-copy sits in train scores as
    * memorization, not generalization).
    *
    * Assignment is a deterministic, engine-portable hash of the GROUP
    * id: bucket = ((group_id mod (2³¹−1)) · 2654435761) mod 1000
    * (Knuth's multiplicative constant; the mod-2³¹−1 prefold keeps the
    * product inside 63 bits, so DuckDB's overflow-checked BIGINT and
    * the JVM's wrap-free range agree exactly). bucket < trainPermille
    * → train, < valPermille → val, else test. Non-negative doc ids
    * assumed (the corpus contract).
    *
    * Returns the per-split accounting report (docs, groups) — the
    * leakage-freeness itself (near-dup pairs never straddle splits)
    * is pinned in NearDupSpec on the per-doc assignment.
    *
    * Scale shape: inherits jaccardPairs' inverted-index join and the
    * pointer-jumping CC (membership table is far sub-corpus); the
    * assignment is a map-side expression over one left join, and the
    * report is a 3-key aggregate. */
  def leakageFreeSplit(docs: DataFrame, n: Int = 3, minJ: Double = 0.7,
      trainPermille: Int = 800, valPermille: Int = 900): DataFrame =
    splitAssignments(docs, n, minJ, trainPermille, valPermille)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("group_id")).as("n_groups"))
      .orderBy(col("split"))

  /** The per-doc (doc_id, group_id, split) assignment behind q214 —
    * exposed so the spec can pin the sharp property (no near-dup pair
    * straddles a split) and so a pipeline can semi-join it against the
    * corpus to materialize the splits. */
  def splitAssignments(docs: DataFrame, n: Int = 3, minJ: Double = 0.7,
      trainPermille: Int = 800, valPermille: Int = 900): DataFrame = {
    require(0 <= trainPermille && trainPermille <= valPermille &&
      valPermille <= 1000, "need 0 <= train <= val <= 1000 permille")
    val clusters = duplicateClusters(
      jaccardPairs(docs, n, minJ).select(col("a_id"), col("b_id")))
    val grouped = docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("group_id"))
    val bucket = (col("group_id") % lit(2147483647L)) *
      lit(2654435761L) % lit(1000L)
    grouped.select(col("doc_id"), col("group_id"),
      when(bucket < trainPermille, "train")
        .when(bucket < valPermille, "val")
        .otherwise("test").as("split"))
  }

  /** q216: dedup-aware effective token count per source — the corpus
    * accountant's number: raw token mass vs the mass SURVIVING the
    * near-dup min-id policy (q29 pairs + q47 components, q49's
    * survivor rule), with the retention ratio. Raw counts overstate a
    * crawl whose mass sits in duplicate clusters — a source at 60%
    * retention contributes barely half the unique signal its raw size
    * suggests, and a mixture plan (q215) consuming raw counts would
    * over-weight it. THIS is the per-source size a data budget should
    * consume.
    *
    * Scale shape: inherits jaccardPairs' inverted-index join and the
    * pointer-jumping CC (membership far sub-corpus); the token scan is
    * the same map-side counter every profile query uses; the final
    * per-source aggregate is bounded. The dropped-membership join
    * attaches one boolean to the corpus scan — broadcast-sized
    * whenever the dup mass is (the usual case), shuffle otherwise. */
  def effectiveTokens(docs: DataFrame, n: Int = 3, minJ: Double = 0.7)
      : DataFrame = {
    val clusters = duplicateClusters(
      jaccardPairs(docs, n, minJ).select(col("a_id"), col("b_id")))
    val dropped = clusters
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"), lit(true).as("_drop"))
    docs.select(col("doc_id"), col("source"),
        TextFunctions.tokenCount(col("text")).cast("long").as("_tok"))
      .join(dropped, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_tok")).as("n_tokens_raw"),
        sum(when(col("_drop").isNull, col("_tok")).otherwise(0L))
          .as("n_tokens_kept"))
      .select(col("source"), col("n_docs"), col("n_tokens_raw"),
        col("n_tokens_kept"),
        when(col("n_tokens_raw") > 0,
          round(col("n_tokens_kept").cast("double") /
            col("n_tokens_raw").cast("double"), 12))
          .otherwise(lit(0d)).as("token_retention"))
      .orderBy(col("source"))
  }

  /** Jaccard similarity histogram: near-dup pair counts per 0.1-wide
    * similarity bucket above `minJ` — the threshold-tuning input read
    * BEFORE committing a dedup run: a bimodal histogram (noise floor
    * vs true-dup spike) tells you where to set minJ; a fat middle
    * means the corpus needs a different measure (containment, L-sims).
    * Bucket = floor(j·10) (so 1.0 lands in bucket 10); j is the same
    * exact count ratio both engines compute, so bucketing is
    * deterministic.
    *
    * Scale shape: inherits jaccardPairs' inverted-index join — note a
    * LOW minJ widens only the published output, not the candidate
    * space (candidates are all shingle-sharing pairs either way; the
    * maxShingleFreq cap is the guard at corpus scale); the histogram
    * fold is an 11-key aggregate. */
  def jaccardHistogram(docs: DataFrame, n: Int = 3,
      minJ: Double = 0.1): DataFrame =
    jaccardPairs(docs, n, minJ)
      .select(floor(col("jaccard") * 10).cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("bucket"))

  /** Cross-source duplication matrix: near-dup PAIR counts per
    * unordered source pair — the provenance audit behind "which crawls
    * mirror each other". A heavy off-diagonal cell means two
    * acquisition pipelines ingest the same upstream (dedup one of
    * them, or down-weight both in the mix); the diagonal is
    * within-source duplication (q91's number, per source). Pair rule
    * is q29's (n-gram Jaccard ≥ minJ); the unordered fold uses
    * least/greatest on the source names so (A,B) and (B,A) land in
    * one cell.
    *
    * Scale shape: inherits jaccardPairs' inverted-index join; the two
    * metadata joins attach one small column to the (far sub-corpus)
    * pair table, and the final aggregate is |sources|²-bounded. */
  def crossSourceDupMatrix(docs: DataFrame, n: Int = 3,
      minJ: Double = 0.7): DataFrame = {
    val meta = docs.select(col("doc_id"), col("source"))
    jaccardPairs(docs, n, minJ)
      .select(col("a_id"), col("b_id"))
      .join(meta.select(col("doc_id").as("a_id"),
        col("source").as("_sa")), "a_id")
      .join(meta.select(col("doc_id").as("b_id"),
        col("source").as("_sb")), "b_id")
      .groupBy(least(col("_sa"), col("_sb")).as("source_a"),
        greatest(col("_sa"), col("_sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Quality-argmax canonical selection: for every near-dup cluster
    * (q29 pairs + q47 components), keep the LONGEST member — the
    * survivor policy real pipelines want (the min-id rule of q49 keeps
    * whichever copy crawled first; the longest copy is usually the
    * un-truncated one). Tie on length breaks to min doc_id so the
    * choice is deterministic on every engine. One row per multi-doc
    * cluster: the survivor, the cluster size, and how many drop.
    *
    * Scale shape: CC membership (far sub-corpus) joins doc lengths,
    * then ONE per-cluster aggregate via max_by on a (len, -id) pair —
    * no window over the corpus, no sort beyond presentation. */
  def canonicalByQuality(docs: DataFrame, n: Int = 3,
      minJ: Double = 0.7): DataFrame = {
    val clusters = duplicateClusters(
      jaccardPairs(docs, n, minJ).select(col("a_id"), col("b_id")))
    clusters
      .join(docs.select(col("doc_id"),
        length(col("text")).cast("long").as("_len")), "doc_id")
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"),
        max_by(col("doc_id"), struct(col("_len"), -col("doc_id")))
          .as("kept_doc_id"),
        max(col("_len")).as("kept_len"))
      .select(col("cluster_id"), col("kept_doc_id"), col("kept_len"),
        col("cluster_size"), (col("cluster_size") - 1).as("n_dropped"))
      .orderBy(col("cluster_id"))
  }

  /** Duplicate-cluster size histogram: how much of the corpus is
    * duplicated, and how — one row per cluster SIZE with the number of
    * clusters and documents at that size. The shape of this histogram
    * is the dedup-policy decision input: a fat size-2 band is mirror
    * pairs (keep one), a long tail of size-100+ clusters is template
    * spam (consider dropping whole clusters), and the singleton row is
    * the corpus that survives untouched. Near-dup rule and clustering
    * are q29/q47's (n-gram Jaccard ≥ minJ, connected components).
    *
    * Scale shape: inherits jaccardPairs' inverted-index join and the
    * pointer-jumping CC; on top of those only bounded aggregates — a
    * per-cluster count, a count-by-size, and one anti-join accounting
    * row for singletons (membership table is far sub-corpus). */
  def dupClusterSizes(docs: DataFrame, n: Int = 3, minJ: Double = 0.7)
      : DataFrame = {
    // persisted: the cluster table feeds the histogram AND the
    // singleton anti-join. Caching contract: the returned frame is
    // lazy over the entry — evictable, swept by one-shot runners
    val clusters = duplicateClusters(
      jaccardPairs(docs, n, minJ).select(col("a_id"), col("b_id")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hist = clusters
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
    val singletons = docs.select(col("doc_id"))
      .join(clusters.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).as("n_clusters"))
      .select(lit(1L).as("cluster_size"), col("n_clusters"))
    hist.unionByName(singletons)
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))
      .orderBy(col("cluster_size"))
  }

  /** Bag-of-words duplicate groups: documents whose SORTED token
    * multisets are identical — the canonicalization that catches
    * token-REORDERED copies (scrambled plagiarism, shuffled list
    * pages, template permutations) that byte-exact dedup (L5) misses
    * and Jaccard scores 1.0 only by coincidence of sets, not
    * multisets. A strict superset of exact-dup groups.
    *
    * Scale shape: the fingerprint (md5 of the sorted token list) is a
    * pure map-side projection; the group-by ships 16-byte keys with
    * map-side partial aggregation — exactly L5's plan, one shuffle. */
  def bagOfWordsDupGroups(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        md5(concat_ws(" ",
          sort_array(TextFunctions.tokens(col("text"))))).as("bag_fp"))
      .groupBy(col("bag_fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") > 1)
      .orderBy(col("first_doc"))

  /** Conservative global band for the thresholded levenshtein: the
    * largest per-pair cutoff any candidate can need. One scalar
    * collect over a length-only scan. */
  private def globalThreshold(docs: DataFrame,
      maxDistFrac: Double): Int = {
    val maxLen = docs.agg(max(length(col("text")))).head() match {
      case r if r.isNullAt(0) => 0
      case r => r.getInt(0)
    }
    math.max(1, math.ceil(maxDistFrac * maxLen).toInt)
  }

  /** Edit-distance-verified near-dup pairs: candidate pairs share at
    * least one RARE n-gram (document frequency in [2, maxDf]), and a
    * candidate survives iff levenshtein(a, b) ≤ maxDistFrac of the
    * longer text — the character-level verifier that catches
    * small-patch duplicates token-set measures (Jaccard/containment)
    * can under- or over-score, at the price of an O(len²) distance per
    * candidate.
    *
    * The rare-n-gram candidate rule is deliberately engine-portable
    * (actual n-gram STRINGS, not the engine's 64-bit shingle hashes) so
    * the DuckDB oracle reproduces candidate generation verbatim; this
    * is the exact correctness baseline of the family. Rarity is the
    * skew guard: an n-gram in > maxDf docs generates no candidates, so
    * the pair space is ≤ C(maxDf, 2) per admitted n-gram — never a
    * cartesian product — and the expensive levenshtein runs only on
    * the (distinct) survivors of that cap.
    *
    * Scale shape: shingle explode → df aggregate → self equi-join on
    * the admitted n-grams → distinct pairs → two hash joins back for
    * the texts → map-side levenshtein + filter. The n-gram strings ride
    * one shuffle (the q71 exactness trade; the hashed twin of THIS
    * operator is the LSH/SimHash family already registered). */
  /** Shared rare-n-gram candidate miner for the string-verify family
    * (editDistancePairs, jaroWinklerPairs): distinct (a_id, b_id) pairs
    * sharing ≥1 n-gram whose document frequency is in [2, maxDf]. The
    * n-gram is DEFINED on strings (the oracle reproduces the rule
    * verbatim), but it rides the shuffles as a 64-bit hash — the q29
    * trade: df counts, the rarity filter and the self-join only need
    * gram IDENTITY, and 8-byte keys cut the gram-table shuffles ~4×
    * vs ~30-char strings. The hashes come from the native codegen'd
    * ShingleHashes scan (one pass, no per-gram array slicing — the
    * HOF-tree form spent ~5 s of single-core time here at sf0.1),
    * which also DEDUPS within-doc, so no distinct shuffle is needed.
    * A hash collision could only ever ADD a candidate, which the
    * downstream verifier then rejects — exactness is unaffected
    * unless two colliding grams ALSO sit in verify-near docs
    * (vanishing, and the oracle gate at two SFs would surface it).
    * Rarity is the skew guard: an n-gram in > maxDf docs generates no
    * candidates, so the pair space is ≤ C(maxDf, 2) per admitted gram
    * — never a cartesian product. */
  private def rareGramCandidates(docs: DataFrame, n: Int,
      maxDf: Int): DataFrame = {
    // persisted: the gram table feeds BOTH the df aggregate and the
    // candidate join (same bounded cache-lifecycle note as q71)
    val grams = shingleTable(docs, n)
      .withColumnRenamed("shingle", "sh")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rare = grams.groupBy(col("sh"))
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= 2 && col("_df") <= maxDf)
      .select(col("sh"))
    val admitted = grams.join(rare, "sh")
    admitted.as("a")
      .join(admitted.as("b"),
        col("a.sh") === col("b.sh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
  }

  def editDistancePairs(docs: DataFrame, n: Int = 5, maxDf: Int = 4,
      maxDistFrac: Double = 0.4): DataFrame = {
    require(n > 0 && maxDf >= 2, "need n > 0 and maxDf >= 2")
    val cand = rareGramCandidates(docs, n, maxDf)
    val texts = docs.select(col("doc_id"), col("text"))
    // EAGER (runs a Spark job now, not at plan execution): one collected
    // scalar over a length-only scan — the banded-levenshtein cutoff.
    // Hoisted to a named val so the hidden job is visible at the call
    // site instead of buried inside the expression tree below; same
    // bounded-metadata allowance as the IVF probe set.
    val levBand = globalThreshold(docs, maxDistFrac)
    // The candidate table is BYTE-small but each row costs an O(len²)
    // DP — AQE's size-based coalescing would serialize the verify
    // stage onto one task. A fixed-width repartition is exempt from
    // coalescing, so the levenshtein work spreads across the cluster.
    val nPart = docs.sparkSession.sessionState.conf.numShufflePartitions
    cand
      .join(texts.select(col("doc_id").as("a_id"),
        col("text").as("_ta")), "a_id")
      .join(texts.select(col("doc_id").as("b_id"),
        col("text").as("_tb")), "b_id")
      .repartition(nPart)
      .withColumn("max_len",
        greatest(length(col("_ta")), length(col("_tb"))).cast("long"))
      // length-band prefilter: |len(a) - len(b)| is a LOWER BOUND on
      // levenshtein, so this cheap cut never changes the result — it
      // just spares the DP on pairs that cannot survive
      .filter(abs(length(col("_ta")) - length(col("_tb")))
        .cast("double") <= lit(maxDistFrac) * col("max_len").cast("double"))
      // banded DP: any surviving pair needs lev ≤ maxDistFrac·max_len
      // ≤ maxDistFrac·(corpus max length), so Spark's thresholded
      // levenshtein (O(len·threshold), early abandon, -1 past the
      // band) returns the EXACT distance for every pair the filter
      // keeps. The corpus max length is the one collected scalar
      // computed eagerly above (levBand).
      .withColumn("lev",
        levenshtein(col("_ta"), col("_tb"), levBand).cast("long"))
      .filter(col("lev") >= 0 && col("lev") <= lit(maxDistFrac) *
        col("max_len").cast("double"))
      .select(col("a_id"), col("b_id"), col("lev"), col("max_len"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Jaro-Winkler near-dup pairs — editDistancePairs' sibling with a
    * SIMILARITY verifier instead of an edit-distance one: same rare-
    * n-gram candidate rule (engine-portable, oracle-reproducible; the
    * skew cap bounds the pair space), then the native codegen'd
    * JaroWinkler expression scores each surviving pair and the
    * threshold keeps jw ≥ minSim. Jaro-Winkler weighs shared-prefix
    * agreement and tolerates transpositions — the right verifier for
    * titles/names/short near-identical records, where levenshtein's
    * absolute edit budget over- or under-shoots with length. O(len·
    * window) per pair (no DP table), so the verify stage is ~len×
    * cheaper than the levenshtein one and the same fixed-width
    * repartition spreads it across the cluster (the candidate table is
    * byte-small but CPU-heavy — AQE's size-based coalescing would
    * serialize it). Scored similarity is rounded to 12 for publication
    * AFTER the unrounded threshold comparison (both engines compare the
    * same full-precision double — bit-parity verified, see
    * functions.JaroWinkler). */
  def jaroWinklerPairs(docs: DataFrame, n: Int = 5, maxDf: Int = 4,
      minSim: Double = 0.8): DataFrame = {
    require(n > 0 && maxDf >= 2, "need n > 0 and maxDf >= 2")
    require(minSim > 0.0 && minSim <= 1.0, "minSim must be in (0,1]")
    val cand = rareGramCandidates(docs, n, maxDf)
    val texts = docs.select(col("doc_id"), col("text"))
    val nPart = docs.sparkSession.sessionState.conf.numShufflePartitions
    cand
      .join(texts.select(col("doc_id").as("a_id"),
        col("text").as("_ta")), "a_id")
      .join(texts.select(col("doc_id").as("b_id"),
        col("text").as("_tb")), "b_id")
      .repartition(nPart)
      .withColumn("_jw",
        graft.functions.GraftFunctions.jaroWinkler(col("_ta"), col("_tb")))
      .filter(col("_jw") >= minSim)
      .select(col("a_id"), col("b_id"), round(col("_jw"), 12).as("jw"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Overlap-coefficient (Szymkiewicz–Simpson) pairs: common /
    * min(|A|, |B|) ≥ minC — the near-CONTAINMENT detector. Jaccard
    * under-scores a short document copied inside a much longer one
    * (union is dominated by the longer side); the overlap coefficient
    * scores a full subset-copy 1.0 regardless of the size ratio, which
    * is exactly the quote/excerpt/boilerplate-inclusion duplication a
    * Jaccard-thresholded pass misses. Same inverted-index equi-join
    * shape and skew cap as jaccardPairs (never a cartesian product);
    * overlap ≥ jaccard always, so this pair set is a superset of
    * jaccardPairs' at the same threshold (NearDupSpec pins both
    * properties). */
  def containmentPairs(docs: DataFrame, n: Int = 3, minC: Double = 0.8,
      maxShingleFreq: Int = Int.MaxValue): DataFrame =
    pairCounts(docs, n, maxShingleFreq)
      .withColumn("containment", col("common").cast("double") /
        least(col("n_a"), col("n_b")))
      .filter(col("containment") >= minC)
      .select(col("a_id"), col("b_id"), col("containment"))
      .orderBy(col("a_id"), col("b_id"))

  /** Shared inverted-index pair mining for the exact similarity family:
    * distinct-shingle postings (optionally frequency-capped — the skew
    * guard), self-equi-joined on shingle hash, aggregated to one row
    * per candidate pair with the intersection size and both set sizes.
    * Only docs sharing ≥1 (admitted) shingle produce a row. */
  private def pairCounts(docs: DataFrame, n: Int,
      maxShingleFreq: Int): DataFrame = {
    val sh = shingleTable(docs, n)
    val counts = sh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"))
    val postings =
      if (maxShingleFreq == Int.MaxValue) sh
      else {
        val freq = sh.groupBy(col("shingle"))
          .agg(count(lit(1)).as("_df"))
          .filter(col("_df") <= maxShingleFreq)
        sh.join(freq, "shingle").drop("_df")
      }
    val common = postings.as("a")
      .join(postings.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("common"))
    common
      .join(counts.select(col("doc_id").as("a_id"),
        col("n_sh").as("n_a")), "a_id")
      .join(counts.select(col("doc_id").as("b_id"),
        col("n_sh").as("n_b")), "b_id")
  }

  /** Train/test DECONTAMINATION: for every evaluation document, the
    * fraction of its distinct n-gram shingles that appear ANYWHERE in the
    * training corpus — the standard benchmark-leakage check run before
    * training (an eval doc whose n-grams are mostly contained in the
    * training set is contaminated and must be dropped from the benchmark,
    * or its near-copies dropped from training).
    *
    * Scale shape: the training side collapses to its DISTINCT shingle
    * vocabulary (one row per shingle — partial+final hash aggregate), so
    * the probe join matches each test shingle against AT MOST ONE row;
    * boilerplate shingles cannot amplify the join output the way they do
    * in pair generation (no maxShingleFreq needed here). Cost is one
    * shuffle of each side on the shingle hash + a per-doc count
    * aggregate; nothing is quadratic and nothing is driver-side.
    * Comparisons use 63-bit shingle hashes (see IdentityMod) — exactness
    * modulo 2⁻⁶⁴-scale collisions, demonstrated exact by the oracle.
    *
    * Output: (doc_id, n_shingles, n_matched, overlap_frac) for test docs
    * with overlap_frac >= minFrac, ordered by doc_id. Docs with fewer
    * than n tokens have no shingles and are never reported (no n-gram
    * evidence either way — same contract as minHashSignatures). */
  def contamination(testDocs: DataFrame, trainDocs: DataFrame, n: Int = 3,
      minFrac: Double = 0.5): DataFrame = {
    val trainSh = shingleTable(trainDocs, n).select(col("shingle")).distinct()
    shingleTable(testDocs, n)
      .join(trainSh.withColumn("_hit", lit(1L)), Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("_hit")).as("n_matched"))
      .withColumn("overlap_frac",
        col("n_matched").cast("double") / col("n_shingles"))
      .filter(col("overlap_frac") >= minFrac)
      .orderBy(col("doc_id"))
  }

  /** APPROXIMATE contamination — the 100 TB shape of `contamination`:
    * instead of shuffling both shingle tables into an equi-join, the
    * train vocabulary is folded into a BLOOM FILTER (mergeable partial
    * aggregate → one broadcastable bitset) and test shingles probe it
    * MAP-SIDE. No shuffle ever touches the train side beyond its
    * partial-aggregate reduction, and the test side shuffles only the
    * per-doc count aggregate.
    *
    * Error is ONE-SIDED: a bloom filter has no false negatives, so
    * per-doc n_matched (and overlap_frac) can only be OVERSTATED —
    * every truly-contaminated doc at `minFrac` is flagged (recall 1 vs
    * the exact operator; NearDupSpec pins the superset property), with
    * false-positive rate governed by numBits/expectedItems. The shape
    * to reach for when the decision is "drop if contaminated" and a
    * small over-drop is acceptable. */
  def contaminationApprox(testDocs: DataFrame, trainDocs: DataFrame,
      n: Int = 3, minFrac: Double = 0.5, expectedItems: Long = 1L << 20,
      numBits: Long = 1L << 23): DataFrame = {
    // might_contain requires its bloom side to be constant-foldable: a
    // SCALAR SUBQUERY (executed once, result broadcast into the probe
    // expression), not a join column
    val bloom = shingleTable(trainDocs, n)
      .agg(GraftFunctions.bloomAgg(col("shingle"), expectedItems, numBits)
        .as("_bf"))
      .scalar()
    shingleTable(testDocs, n)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(GraftFunctions.bloomMightContain(bloom,
          col("shingle")), lit(1))).as("n_matched"))
      .withColumn("overlap_frac",
        col("n_matched").cast("double") / col("n_shingles"))
      .filter(col("overlap_frac") >= minFrac)
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------- MinHash + LSH

  /** Shared with the native expression: shingle hashes are reduced below
    * this modulus so the signature arithmetic cannot overflow. */
  private val P = graft.functions.MinHashSig.P

  /** Deterministic (a, b) seed pairs for the k min-hash functions. */
  private def seedPairs(numHashes: Int): (Seq[Long], Seq[Long]) = {
    val rnd = new scala.util.Random(0x6f0a75L) // fixed engine seed
    val a = Seq.fill(numHashes)(1L + rnd.nextInt(Int.MaxValue - 1))
    val b = Seq.fill(numHashes)(rnd.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  /** doc_id + MinHash signature (array of numHashes longs) from n-gram
    * shingles. Pure projection, no shuffle: shingle hashes are one
    * higher-order pass per row, and the k×|shingles| signature loop runs
    * in the native codegen'd MinHashSig expression. Documents with fewer
    * than n tokens produce no shingles and are dropped (they cannot
    * near-duplicate by shingle overlap — and empty signatures would
    * band-collide with each other). */
  def minHashSignatures(docs: DataFrame, n: Int,
      numHashes: Int): DataFrame = {
    val (aS, bS) = seedPairs(numHashes)
    // NO widen here (measured, r17): parallelizing the signature map
    // stage inflated x02's wall 2.94→4.12 s — the per-doc min-hash
    // fold is cheap enough that 32-way task overhead beats the serial
    // saving on a one-split corpus, and composed callers (x15) hand
    // this an already-widened frame anyway
    docs
      .withColumn("_sh_hashes",
        GraftFunctions.shingleHashes(col("text"), n, P))
      .filter(size(col("_sh_hashes")) > 0)
      .select(col("doc_id"),
        GraftFunctions.minHashSig(col("_sh_hashes"), aS, bS)
          .as("signature"))
  }

  /** Skew guard shared by both LSH paths: drop (band, value) groups
    * larger than `cap` BEFORE the self-join. A degenerate band value
    * (boilerplate near-identical docs, a low-entropy hyperplane band)
    * otherwise produces |group|² candidate rows inside one reducer — the
    * same blowup maxShingleFreq guards in the inverted index. Pairs whose
    * EVERY shared band exceeds the cap are lost (an explicit recall
    * trade, like the shingle cap); pairs sharing any normal band are
    * unaffected, and precision is untouched (verification stays exact).
    * AQE skew-split balances work but cannot bound candidate output;
    * this does. */
  private[operators] def capBandGroups(banded: DataFrame,
      keys: Seq[String], cap: Int): DataFrame =
    if (cap == Int.MaxValue) banded
    else {
      // a WINDOW count, not groupBy+join-back: the join form evaluates
      // the banded subtree (per-doc signature computation) twice — once
      // per join side — because the frequency aggregate and the probe
      // side share no exchange; the window computes the group size on
      // the already-shuffled rows in one pass
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*)
      banded
        .withColumn("_bf", count(lit(1)).over(w))
        .filter(col("_bf") <= cap)
        .drop("_bf")
    }

  /** (doc_id, band, bh) rows from a signature table — the join key
    * layout both the self-join and the incremental path consume. */
  private def bandsOf(signatures: DataFrame, numHashes: Int,
      bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val bandStructs = array((0 until bands).map { bIdx =>
      struct(lit(bIdx).as("band"),
        xxhash64(slice(col("signature"), bIdx * r + 1, r)).as("bh"))
    }: _*)
    signatures
      .select(col("doc_id"), explode(bandStructs).as("b"))
      .select(col("doc_id"), col("b.band").as("band"),
        col("b.bh").as("bh"))
  }

  /** PERSISTABLE LSH band index of a corpus: (doc_id, band, bh), one row
    * per band per doc. Write it out partitioned/bucketed on (band, bh)
    * once, and every future incoming batch dedups against the corpus by
    * equi-joining its own (tiny) band table — the corpus text is never
    * re-shingled (see minHashLshPairsAgainst). Same (n, numHashes,
    * bands) MUST be used on both sides: band hashes are only comparable
    * under identical parameters. */
  def bandTable(docs: DataFrame, n: Int = 3, numHashes: Int = 64,
      bands: Int = 16): DataFrame =
    bandsOf(minHashSignatures(docs, n, numHashes), numHashes, bands)

  /** Candidate pairs via LSH banding: split each signature into `bands`
    * bands of numHashes/bands rows, hash each band, and equi-join on
    * (band, bandHash). Distinct pairs only. `maxBandFreq` caps the size
    * of a (band, bandHash) group admitted to pair generation — see
    * capBandGroups; Int.MaxValue disables. */
  def lshCandidates(signatures: DataFrame, numHashes: Int,
      bands: Int, maxBandFreq: Int = Int.MaxValue): DataFrame = {
    require(maxBandFreq >= 2, "maxBandFreq < 2 would drop every pair")
    val banded = capBandGroups(bandsOf(signatures, numHashes, bands),
      Seq("band", "bh"), maxBandFreq)
    banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
  }

  /** MinHash+LSH near-dup pairs, exactly verified: candidates from the
    * band join, then true n-gram Jaccard computed ONLY for candidates —
    * the shingle sets are recomputed just for documents that appear in
    * some candidate pair (semi join first), then intersected per pair.
    * Verification compares hashed shingle sets (same distinct-set
    * cardinalities as the string sets modulo 2⁻⁶⁴-scale collisions).
    * The candidate-restricted shingle table feeds BOTH verification
    * joins, so it is persisted (memory-and-disk) — ShingleHashes runs
    * once per candidate doc, not once per join side. The cache entry is
    * never explicitly unpersisted (the returned frame is lazy, so there
    * is no safe point inside this function); CacheManager dedupes by
    * canonicalized plan, so repeated calls on the same input hold ONE
    * cached copy, bounded by distinct (docs, n) inputs per session —
    * long-lived sessions can reclaim with spark.catalog.clearCache().
    * Output is a subset of jaccardPairs(docs, n, minJ) — LSH controls
    * recall, verification guarantees precision = 1. */
  def minHashLshPairs(docs: DataFrame, n: Int = 3, numHashes: Int = 64,
      bands: Int = 16, minJ: Double = 0.7,
      maxBandFreq: Int = Int.MaxValue): DataFrame = {
    val candidates =
      lshCandidates(minHashSignatures(docs, n, numHashes), numHashes,
        bands, maxBandFreq)
    val candidateIds = candidates.select(col("a_id").as("doc_id"))
      .union(candidates.select(col("b_id").as("doc_id"))).distinct()
    val withSh = docs
      .join(candidateIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        GraftFunctions.shingleHashes(col("text"), n, P).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    candidates
      .join(withSh.select(col("doc_id").as("a_id"), col("sh").as("sh_a")),
        "a_id")
      .join(withSh.select(col("doc_id").as("b_id"), col("sh").as("sh_b")),
        "b_id")
      .withColumn("common",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")))
      .filter(col("jaccard") >= minJ)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** INCREMENTAL near-dup: a new batch against an already-indexed
    * corpus — the daily-ingestion shape, where comparing the corpus to
    * itself again (what minHashLshPairs over the union does) would cost
    * corpus², every day, for pairs already known.
    *
    * Candidates come from equi-joining the batch's band table against
    * the corpus's; cost is |batch bands| ⋈ |corpus bands| on (band, bh)
    * — proportional to the BATCH, never corpus². Pass `corpusBands` to
    * reuse a persisted bandTable(corpus) (then corpus text is touched
    * only to re-shingle verification candidates); omit it to derive the
    * bands inline. Parameters must match the ones the stored index was
    * built with. `maxBandFreq` caps on the corpus side, where the
    * boilerplate lives. Output: (new_id, corpus_id, jaccard) — at the
    * default (uncapped) setting, exactly the cross-side subset of
    * minHashLshPairs over the disjoint union (NearDupSpec asserts),
    * with the same precision-1 guarantee; with a FINITE maxBandFreq the
    * two differ at the margin, because the cap here scopes to
    * corpus-side group sizes while the union form caps combined groups.
    * A doc present on both sides with the same id reports itself as its
    * own duplicate (jaccard 1) — the re-crawl signal, not an error.
    * The (tiny, id-pair) candidate frame feeds the outer join and both
    * verification semi-joins, so it is persisted — without it the band
    * equi-join (and the corpus signature pass under it) would evaluate
    * three times; same bounded cache-lifecycle note as
    * minHashLshPairs. */
  def minHashLshPairsAgainst(newDocs: DataFrame, corpusDocs: DataFrame,
      corpusBands: Option[DataFrame] = None, n: Int = 3,
      numHashes: Int = 64, bands: Int = 16, minJ: Double = 0.7,
      maxBandFreq: Int = Int.MaxValue): DataFrame = {
    val newBands = bandTable(newDocs, n, numHashes, bands)
    val corpus = capBandGroups(
      corpusBands.getOrElse(bandTable(corpusDocs, n, numHashes, bands)),
      Seq("band", "bh"), maxBandFreq)
    val candidates = newBands.as("x")
      .join(corpus.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh"))
      .select(col("x.doc_id").as("new_id"),
        col("y.doc_id").as("corpus_id"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def shFor(docs: DataFrame, idCol: String) = docs
      .join(candidates.select(col(idCol).as("doc_id")).distinct(),
        Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        GraftFunctions.shingleHashes(col("text"), n, P).as("sh"))
    candidates
      .join(shFor(newDocs, "new_id")
        .select(col("doc_id").as("new_id"), col("sh").as("sh_a")), "new_id")
      .join(shFor(corpusDocs, "corpus_id")
        .select(col("doc_id").as("corpus_id"), col("sh").as("sh_b")),
        "corpus_id")
      .withColumn("common",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")))
      .filter(col("jaccard") >= minJ)
      .select(col("new_id"), col("corpus_id"), col("jaccard"))
      .orderBy(col("new_id"), col("corpus_id"))
  }

  // ----------------------------------------------------------- SimHash

  /** 63-bit SimHash over whitespace tokens: bit b is set when more than
    * half the token hashes have bit b set (the sign bit stays clear, so
    * values are non-negative longs under ANSI arithmetic). The 63×|tokens|
    * bit-count loop runs in the native codegen'd SimHash63 expression.
    * Near-dup docs differ in few bits (small Hamming distance). */
  def simHash(text: Column): Column =
    GraftFunctions.simHash63(
      transform(TextFunctions.tokens(text), t => xxhash64(t)))

  /** doc_id + simhash, map-side only. */
  def simHashes(docs: DataFrame): DataFrame =
    ScanParallelism.widen(docs, "doc_id")
      .select(col("doc_id"), simHash(col("text")).as("simhash"))

  /** Near-dup pairs by SimHash Hamming distance <= maxHamming, found via
    * chunk blocking (pigeonhole: with 7 chunks of 9 bits, any pair within
    * Hamming distance 6 shares at least one identical chunk). Equi-join
    * on (chunk index, chunk value) — never all-pairs — then the exact
    * Hamming distance via bit_count(xor) filters candidates. */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 6): DataFrame = {
    require(maxHamming <= 6,
      "7-chunk blocking guarantees recall only up to Hamming distance 6")
    val sh = simHashes(docs)
    val chunkStructs = array((0 until 7).map { c =>
      struct(lit(c).as("chunk"),
        shiftrightunsigned(col("simhash"), 9 * c).bitwiseAND(511L)
          .as("cv"))
    }: _*)
    val chunked = sh
      .select(col("doc_id"), col("simhash"), explode(chunkStructs).as("c"))
      .select(col("doc_id"), col("simhash"),
        col("c.chunk").as("chunk"), col("c.cv").as("cv"))
    chunked.as("x")
      .join(chunked.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.cv") === col("y.cv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("a_id"), col("b_id"))
  }

  // --------------------------------------------- cluster resolution

  /** Duplicate-CLUSTER resolution: near-dup pairs only say "a ~ b";
    * an actual dedup pass needs the transitive closure — connected
    * components over the pair graph, one canonical survivor per
    * component. Output: (doc_id, cluster_id) for every doc appearing in
    * at least one pair, cluster_id = smallest doc_id reachable from it
    * (so the canonical survivor is the row with doc_id == cluster_id).
    *
    * Algorithm: distributed min-label propagation WITH pointer jumping —
    * every node starts labeled with itself; each round every node takes
    * the min of its own and its neighbors' labels, then shortcuts
    * through its label's label (the Shiloach-Vishkin jump). Each round
    * is two equi-joins + one partial+final min-aggregate, all plain
    * shuffles on ids — no driver-side graph — and the jump halves chain
    * depth per round, so total rounds are O(log diameter) (a chain of
    * 200 resolves in ~8 rounds — tested), comparable to the
    * large-star/small-star contraction of Kiveris et al., "Connected
    * Components in MapReduce and Beyond".
    *
    * Per-round cost is ONE Spark job (the r9 bench audit found the
    * family round-overhead-bound at small SF, each round paying full
    * job setup twice): every checkpoint is LAZY, so the round's single
    * materializing action is the convergence probe itself — an exact
    * decimal SUM of the labels. Labels can only decrease (min-fold),
    * so the sum strictly decreases iff any label changed; sum equality
    * across rounds is therefore exactly the old changed-count==0 test,
    * without the extra count job or the per-node _old comparison join.
    * The loop is a driver FIXPOINT check (one collected scalar per
    * round), not a driver computation: all data stays distributed;
    * localCheckpoint truncates the growing lineage so round N does not
    * re-plan rounds 1..N-1. Durability trade: localCheckpoint blocks
    * are executor-local and unreplicated — on a cluster with
    * preemptible executors, losing one mid-loop fails the job (restart
    * from scratch); swap in reliable checkpoint() to a checkpoint dir
    * when running on spot nodes.
    *
    * The reference dedups only on exact natural-key equality
    * (etl/etl.py:441-458, first-wins); this is that semantic lifted to
    * transitive content similarity. */
  // Round bound: typical pair graphs converge in 2-5 rounds and a
  // 200-link chain in ≤6 (double jump; the single-jump form took ~8 —
  // NearDupSpec pins the bound), but the pointer-jump shortcut is a
  // HEURISTIC, not full Shiloach-Vishkin star contraction — measured on
  // a 10x replicated SemDeDup graph (15.6 k pairs), one slow tail took
  // 22 single-jump rounds (a structure where the shortcut gains only a
  // constant per round; the second jump per round cuts such tails
  // ~⅓). 64 absorbs any such tail with margin while still crashing
  // loudly on a genuinely pathological input; converged loops exit
  // early, so the headroom costs nothing.
  def duplicateClusters(pairs: DataFrame, maxRounds: Int = 64): DataFrame =
    duplicateClustersWithRounds(pairs, maxRounds)._1

  /** duplicateClusters plus the number of propagation rounds the
    * fixpoint took — exposed so NearDupSpec can pin the convergence
    * speed of the double pointer jump on known-diameter fixtures. */
  private[graft] def duplicateClustersWithRounds(pairs: DataFrame,
      maxRounds: Int = 64): (DataFrame, Int) = {
    // both edge orientations from ONE pass over the pair subtree (a
    // union of two projections would evaluate the — possibly expensive,
    // e.g. exact-Jaccard — pair plan twice)
    // LAZY checkpoints throughout: nothing here runs a job — round 1's
    // convergence probe materializes edges, the initial labels and the
    // first propagation all in one job (the eager form paid a separate
    // job for each). Within-plan reuse of edges/labels/propagated is
    // covered by exchange reuse (the repeated subtrees sit under
    // identical shuffles) plus the checkpoint's block-manager persist.
    val edges = pairs
      .select(explode(array(
        struct(col("a_id").as("src"), col("b_id").as("dst")),
        struct(col("b_id").as("src"), col("a_id").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .localCheckpoint(false)
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("label", col("id"))
    var round = 0
    var prevSum: Option[java.math.BigDecimal] = None
    var converged = false
    while (!converged && round < maxRounds) {
      // min over self ∪ neighbors in ONE aggregate: the propagated
      // copies and the current labels union before a single min-fold —
      // one equi-join + one (map-side partial) aggregate, where the
      // join-then-left-join-back form spent two joins
      val propagated = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .select(col("src").as("id"), col("label"))
        .unionAll(labels)
        .groupBy(col("id"))
        .agg(min(col("label")).as("label"))
      // pointer jump (Shiloach-Vishkin shortcut): label(u) ← label(
      // label(u)). Every label value is itself a node id (closed by
      // induction: initials are ids, min of ids is an id), and labels
      // only decrease, so the parent's label is ≤ ours — each jump
      // halves chain depth, so TWO jumps per round (label³) cut depth
      // ~3× per round on chain-shaped components — the r10 10×-scale
      // audit found a 22-round tail where the single jump gained only
      // a constant per round. Each jump is one equi-join on ids; the
      // repeated subtrees sit under identical shuffles, so exchange
      // reuse keeps the round at ONE materialization of `propagated`.
      def jump(l: DataFrame): DataFrame = l
        .join(l.select(col("id").as("_pid"), col("label").as("_pl")),
          col("label") === col("_pid"), "left")
        .select(col("id"), coalesce(col("_pl"), col("label")).as("label"))
      val jumped = jump(jump(propagated))
      val next = jumped.localCheckpoint(false)
      // convergence probe = the round's ONLY job: exact decimal sum of
      // the labels (decimal(38,0) cannot overflow any realistic id
      // space, unlike a long sum at 100 TB). Sum unchanged ⟺ no label
      // changed (labels are monotonically non-increasing per node).
      val s = Option(next
        .agg(sum(col("label").cast("decimal(38,0)")).as("s"))
        .head().getDecimal(0))
      converged = (s, prevSum) match {
        case (None, None) => true // empty input: nothing to propagate
        case (Some(a), Some(b)) => a.compareTo(b) == 0
        case _ => false
      }
      prevSum = s
      // the probe just materialized round r's checkpoint, so round
      // r-1's blocks are superseded — free them NOW instead of
      // leaving one data-sized copy per round to the ContextCleaner
      // (round 0's `labels` is a plain plan; free() is a no-op there)
      Ckpt.free(labels)
      labels = next
      round += 1
    }
    require(converged,
      s"label propagation did not converge in $maxRounds rounds — " +
        "with pointer jumping that needs a component of diameter " +
        "~2^$maxRounds; check the pair input for pathology")
    // the returned frame reads ONLY the final label checkpoint — the
    // edge checkpoint has no consumer left
    Ckpt.free(edges)
    (labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .orderBy(col("doc_id")), round)
  }

  /** End-to-end near-dup dedup: drop every non-canonical member of every
    * near-dup cluster (keep doc_id == cluster_id, and all docs in no
    * cluster). One anti-join against the resolved non-survivors. */
  def dedupByClusters(docs: DataFrame, clusters: DataFrame): DataFrame =
    docs.join(
      clusters.filter(col("doc_id") =!= col("cluster_id"))
        .select(col("doc_id")),
      Seq("doc_id"), "left_anti")

  /** Cluster dedup with a QUALITY-priority survivor: keep the highest-
    * `scoreCol` member of every near-dup cluster (ties to the smallest
    * doc_id) instead of the smallest id — the survivor policy a real
    * curation pipeline wants (near-dup groups usually contain one clean
    * original and several mangled re-crawls; min-id keeps whichever was
    * crawled first, this keeps the best).
    *
    * Scale shape: the cluster table (one row per doc IN some cluster —
    * far smaller than the corpus) joins its members' scores, a
    * per-cluster window picks the argmax, and the non-survivors anti-
    * join the corpus. The corpus-sized side is touched by exactly two
    * hash joins on doc_id; the window runs over cluster-membership rows
    * only. `scoreCol` must be present on `docs`. */
  def dedupByClustersPreferring(docs: DataFrame, clusters: DataFrame,
      scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("_score").desc, col("doc_id"))
    val losers = clusters
      .join(docs.select(col("doc_id"), col(scoreCol).as("_score")),
        "doc_id")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") =!= 1)
      .select(col("doc_id"))
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Graph-cohesion statistics of an undirected edge list (`a_id` <
    * `b_id` per row): node/edge counts, triangle count (ordered
    * a<b<c enumeration — each triangle counted once), wedge count
    * (Σ d(d−1)/2 over node degrees), and the global clustering
    * coefficient 3·triangles/wedges. High clustering says the pair
    * graph is made of dense template families (safe to collapse whole
    * components, q47's policy); clustering near zero says components
    * are CHAINS of borderline pairs — transitive closure would merge
    * documents that never directly matched, and the threshold needs
    * raising before dedup commits. The tuning diagnostic between
    * q122's histogram and q47's closure.
    *
    * Scale shape: the classic ordered-adjacency triangle plan — two
    * equi-joins on node ids over the (far sub-corpus) edge table, no
    * cartesian; wedges fold from one degree aggregate. At 100 TB-scale
    * graphs the skew guard is degree-capping the hub nodes first
    * (same bound capBandGroups applies to LSH buckets). */
  def triangleStats(edges: DataFrame): DataFrame = {
    // persisted: the edge list feeds the degree fold, the wedge join
    // and the triangle count. Caching contract: the returned one-row
    // frame is lazy over the entry — evictable, swept by one-shot
    // runners (sourceOverlap's note)
    val e = edges.select(col("a_id"), col("b_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.select(col("a_id").as("id"))
      .unionAll(e.select(col("b_id").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    val nodeAgg = deg.agg(count(lit(1)).as("n_nodes"),
      coalesce(sum(expr("d * (d - 1) div 2")), lit(0L)).as("n_wedges"))
    val edgeAgg = e.agg(count(lit(1)).as("n_edges"))
    val triAgg = e.as("e1")
      .join(e.as("e2"), col("e1.b_id") === col("e2.a_id"))
      .join(e.as("e3"), col("e1.a_id") === col("e3.a_id") &&
        col("e2.b_id") === col("e3.b_id"))
      .agg(count(lit(1)).as("n_triangles"))
    nodeAgg.crossJoin(broadcast(edgeAgg)).crossJoin(broadcast(triAgg))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        col("n_wedges"),
        when(col("n_wedges") === 0, lit(0.0))
          .otherwise(lit(3.0) * col("n_triangles") / col("n_wedges"))
          .as("clustering_coeff"))
  }

  /** triangleStats over the q29 near-dup pair graph — the composed
    * entry (see triangleStats for the reading). */
  def dupGraphTriangles(docs: DataFrame, n: Int = 3, minJ: Double = 0.7,
      maxShingleFreq: Int = Int.MaxValue): DataFrame =
    triangleStats(jaccardPairs(docs, n, minJ, maxShingleFreq))
  /** LSH self-evaluation report — the recall/precision harness as a
    * first-class operator: the banded MinHash pair set scored against
    * the exact inverted-index pair set at the same threshold, in one
    * full-outer join + one fold. A curation run executes this on a
    * SAMPLE before trusting the banding parameters on the full corpus
    * (recall drifts with document length and shingle entropy; the
    * b/r curve is a model, this is the measurement). Precision is 1
    * by construction (LSH candidates are exact-verified) — reported
    * anyway so a future banding change that breaks the invariant
    * surfaces in data, not just in a spec.
    *
    * Scale shape: both pair sets inherit their own audited shapes;
    * the comparison is one equi-join on (a_id, b_id) over pair-sized
    * (far sub-corpus) frames + a one-row fold. */
  def lshEvalReport(docs: DataFrame, n: Int = 3, numHashes: Int = 64,
      bands: Int = 16, minJ: Double = 0.7): DataFrame = {
    val e = jaccardPairs(docs, n, minJ)
      .select(col("a_id"), col("b_id"), lit(1).as("_e"))
    val l = minHashLshPairs(docs, n, numHashes, bands, minJ)
      .select(col("a_id"), col("b_id"), lit(1).as("_l"))
    e.join(l, Seq("a_id", "b_id"), "full_outer")
      .agg(count(col("_e")).as("n_exact"),
        count(col("_l")).as("n_lsh"),
        count(when(col("_e").isNotNull && col("_l").isNotNull, lit(1)))
          .as("n_both"))
      .select(col("n_exact"), col("n_lsh"), col("n_both"),
        round(col("n_both").cast("double") /
          col("n_exact").cast("double"), 12).as("recall"),
        round(col("n_both").cast("double") /
          col("n_lsh").cast("double"), 12).as("precision"))
  }

  // ----------------------------------------------------------- winnowing

  /** Winnowing fingerprint table (Schleimer, Wilkerson & Aiken 2003 —
    * the MOSS algorithm): per document, hash every k-token gram, slide
    * a window of w consecutive gram hashes, and keep the MINIMUM hash
    * of each window (value-dedup'd). The selection guarantee is what
    * makes this the local-dedup sketch MinHash is not: any two
    * documents sharing a contiguous run of ≥ w + k − 1 tokens share at
    * least one selected fingerprint (the run contributes a full window
    * of identical gram hashes on both sides, and a window's min is a
    * function of its contents alone), while expected density is only
    * ~2/(w+1) of positions — guaranteed detection of long shared
    * spans at a tunable sketch size. MinHash (L7) samples globally and
    * can MISS a short shared span entirely; winnowing cannot.
    *
    * Standard simplification (documented in the paper): fingerprints
    * are selected VALUES, not (value, position) pairs — ties across
    * windows collapse, which only ever under-reports density, never
    * the guarantee.
    *
    * Scale shape: the entire selection is ONE map-side expression
    * chain per document (gram hashing, sliding min, value dedup are
    * array HOFs over the token array — zero shuffle, zero UDFs); the
    * only exchange is the output explode's implicit partitioning.
    * Documents with fewer than w grams contribute their global min
    * (the paper's short-document rule); documents shorter than k
    * tokens contribute nothing. */
  def winnowFingerprintTable(docs: DataFrame, k: Int = 3, w: Int = 4)
      : DataFrame = {
    require(k >= 1, "gram size must be at least 1 token")
    require(w >= 1, "window must span at least 1 gram")
    val gramHash = s"""transform(
      |  slice(_toks, 1, greatest(size(_toks) - ${k - 1}, 0)),
      |  (t, i) -> xxhash64(concat_ws(' ', ${(0 until k).map(j =>
           if (j == 0) "t" else s"_toks[i + $j]").mkString(", ")})))"""
      .stripMargin
    val fps = s"""CASE WHEN size(_h) = 0
      |  THEN array()
      |  ELSE array_distinct(transform(
      |    sequence(1, greatest(size(_h) - ${w - 1}, 1)),
      |    j -> array_min(slice(_h, j, least($w, size(_h))))))
      |END""".stripMargin
    ScanParallelism.widen(docs, "doc_id")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("_toks"))
      .select(col("doc_id"), expr(gramHash).as("_h"))
      .select(col("doc_id"), explode(expr(fps)).as("fp"))
  }

  /** x49: winnowing match report — pairs of documents sharing at least
    * `minShared` selected fingerprints, via the same freq-capped
    * inverted-index equi-join every other pair generator here uses
    * (never cartesian): fingerprints shared by more than `maxFpFreq`
    * documents are boilerplate-grade and excluded from pair generation
    * (the q29 skew guard — a corpus-hot fingerprint contributes ~0
    * evidence but quadratic join output).
    *
    * Fingerprint values are xxhash64 (engine-seeded) → rows-only bench
    * entry; the selection guarantee, density bound, and match
    * semantics are pinned in NearDupSpec on planted fixtures. */
  def winnowMatches(docs: DataFrame, k: Int = 3, w: Int = 4,
      minShared: Long = 2L, maxFpFreq: Long = 256L): DataFrame = {
    val fps = winnowFingerprintTable(docs, k, w)
    val rare = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= maxFpFreq)
      .select(col("fp"))
    val capped = fps.join(rare, "fp")
    capped.as("a").join(capped.as("b"), col("a.fp") === col("b.fp"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** x51: winnowing-as-candidate-generator self-evaluation — the x31
    * report shape applied to winnowing: how well do shared-fingerprint
    * pairs cover the exact n-gram-Jaccard duplicates (recall), and how
    * much of the match output is above the Jaccard bar (precision)?
    * Winnowing guarantees shared RUNS, not high Jaccard, so neither
    * number is 1 by construction — this report is the tool that sizes
    * the gap on a real corpus before swapping detectors.
    *
    * Scale shape: both sides are the freq-capped inverted-index joins
    * already audited (x49 / q29); the outer-join compare runs on the
    * two pair lists (far sub-corpus) + a one-row fold. */
  def winnowEvalReport(docs: DataFrame, k: Int = 3, w: Int = 4,
      minShared: Long = 2L, n: Int = 3, minJ: Double = 0.7): DataFrame = {
    val e = jaccardPairs(docs, n, minJ)
      .select(col("a_id"), col("b_id"), lit(1).as("_e"))
    val m = winnowMatches(docs, k, w, minShared)
      .select(col("a_id"), col("b_id"), lit(1).as("_m"))
    e.join(m, Seq("a_id", "b_id"), "full_outer")
      .agg(count(col("_e")).as("n_exact"),
        count(col("_m")).as("n_winnow"),
        count(when(col("_e").isNotNull && col("_m").isNotNull, lit(1)))
          .as("n_both"))
      .select(col("n_exact"), col("n_winnow"), col("n_both"),
        round(col("n_both").cast("double") /
          col("n_exact").cast("double"), 12).as("recall"),
        round(col("n_both").cast("double") /
          col("n_winnow").cast("double"), 12).as("precision"))
  }

}
