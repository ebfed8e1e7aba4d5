package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's analytics read path (SURVEY §3 EP3): the
  * `job_statistics` / `recent_job_postings` views (init.sql:44-70), the
  * get_statistics query (etl/etl.py:527-547) and monitor.sh's UNION ALL
  * report — generalized over (df, keyCol, tsCol) so the same operators run
  * on the TPC-H-ish harness tables (SURVEY §7.4).
  *
  * All are single-pass aggregates: conditional counts share one scan
  * (count(CASE WHEN ...)), countDistinct adds a partial/final expand —
  * at 100 TB swap in approx_count_distinct (HLL) via `approx = true`.
  */
object Analytics {

  /** job_statistics (init.sql:60-70): one row of totals, distincts,
    * recency-bucketed conditional counts, min/max timestamps. */
  def statistics(df: DataFrame, orgCol: String, deptCol: String,
      tsCol: String, approx: Boolean = false): DataFrame = {
    val distinctOf = (c: String) =>
      if (approx) approx_count_distinct(col(c), 0.01)
      else countDistinct(col(c))
    df.agg(
      count(lit(1)).as("total_jobs"),
      distinctOf(orgCol).as("unique_organizations"),
      distinctOf(deptCol).as("unique_departments"),
      count(when(col(tsCol) >= current_date().cast("timestamp"), 1))
        .as("jobs_today"),
      count(when(col(tsCol) >=
        date_sub(current_date(), 7).cast("timestamp"), 1))
        .as("jobs_this_week"),
      count(when(col(tsCol) >=
        date_sub(current_date(), 30).cast("timestamp"), 1))
        .as("jobs_this_month"),
      max(col(tsCol)).as("latest_job_posted"),
      min(col(tsCol)).as("earliest_job_posted"))
  }

  /** recent_job_postings view (init.sql:44-57): 30-day filter, projection,
    * newest first. */
  def recent(df: DataFrame, tsCol: String, days: Int = 30,
      projection: Seq[String] = Nil): DataFrame = {
    val filtered = df.filter(
      col(tsCol) >= date_sub(current_date(), days).cast("timestamp"))
    val projected =
      if (projection.isEmpty) filtered
      else filtered.select(projection.map(col): _*)
    projected.orderBy(col(tsCol).desc)
  }

  /** Group-by count, largest groups first (test_performance.py:377). */
  def countByGroup(df: DataFrame, groupCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(groupCol))

  /** Top-k most recent rows (monitor.sh:44-58, test.sh:84). */
  def topKRecent(df: DataFrame, tsCol: String, k: Int): DataFrame =
    df.orderBy(col(tsCol).desc).limit(k)

  /** monitor.sh's UNION ALL (metric, value) report over arbitrary named
    * frames. */
  def metricsReport(metrics: (String, DataFrame)*): DataFrame =
    metrics.map { case (name, df) =>
      df.agg(count(lit(1)).as("value")).select(lit(name).as("metric"),
        col("value"))
    }.reduce(_ unionByName _).orderBy(col("metric"))

  /** Key-skew profile: the distribution of per-key row counts for a
    * prospective shuffle/join key — the diagnostic that decides
    * between a plain shuffle join, salting, and AQE skew handling
    * BEFORE the 100 TB job runs. One row: key cardinality, total rows,
    * the heaviest key's share, exact count percentiles, and the
    * max/median ratio (the salting trigger).
    *
    * Determinism: every statistic is an exact integer or one division
    * of exact integers/percentile values.
    *
    * Scale shape: per-key counts partial-aggregate map-side; the
    * second aggregate runs over key-cardinality-sized data. The exact
    * percentile is the correctness baseline (same q32/x07 trade —
    * swap percentile_approx at a 10^9-key cardinality). */
  /** Modality-coverage audit: the referential-integrity report between
    * the text corpus and its embedding table — matched ids, text
    * without vectors (embedding backlog), vectors without text
    * (orphaned index entries), and the coverage ratio. The pre-flight
    * for any hybrid retrieval or embedding-dedup run: a silent
    * coverage gap biases every downstream similarity statistic.
    *
    * Scale shape: one full-outer equi-join on unique ids (two id-only
    * streams shuffle once; AQE handles the size imbalance) folded
    * straight into a single-row aggregate — nothing wider than an id
    * ever moves. */
  def modalityCoverage(docs: DataFrame, emb: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id").as("id"), lit(1L).as("_d"))
    val e = emb.select(col("vec_id").as("id"), lit(1L).as("_e"))
    d.join(e, Seq("id"), "full_outer")
      .agg(count(col("_d")).as("n_docs"),
        count(col("_e")).as("n_vecs"),
        count(when(col("_d").isNotNull && col("_e").isNotNull, lit(1)))
          .as("n_matched"),
        count(when(col("_e").isNull, col("_d"))).as("n_docs_only"),
        count(when(col("_d").isNull, col("_e"))).as("n_vecs_only"))
      .withColumn("doc_coverage",
        col("n_matched").cast("double") / col("n_docs").cast("double"))
  }

  /** q193: Poisson-bootstrap uncertainty for a per-source corpus
    * statistic (mean document length) — the single-pass bootstrap of
    * Chamandy et al. 2012 ("Estimating uncertainty for massive data
    * streams", the production pattern at terabyte scale): instead of
    * resampling the corpus B times, each row draws a Poisson(1)
    * replication count per replicate from a counter-based hash of
    * (doc_id, replicate), so all B resampled means come out of ONE
    * scan as weighted aggregates. The spread of the B replicate means
    * is the sampling-noise yardstick a drift monitor (q139/q140)
    * needs before calling a shift real.
    *
    * Engine-portable randomness: a two-step LCG (Knuth/glibc constants
    * 1103515245/12345) on (doc_id mod 2^31, replicate), all arithmetic
    * in BIGINT mod 2^31 (products ≤ 2^61 — no overflow under ANSI on
    * either engine), thresholded at floor(cdf·2^31) into k ∈ {0,1,2,3}
    * — the Poisson(1) pmf with the ≥3 tail lumped at 3 (mass 0.0803;
    * truncation shifts the mean replication to 0.98, immaterial for a
    * spread estimate and identical on both engines). Replicate means
    * divide exact integer sums once (round 12); the published bounds
    * are ORDER STATISTICS of the B rounded means (min / lower-median /
    * max — never a float re-sum, so no association-order hazard).
    * With B=32, min..max spans ≈ the central 94% of the bootstrap
    * distribution.
    *
    * Scale shape: the replicate explode widens the scan by B rows of
    * four narrow columns (source, b, k, len), partial-aggregates
    * map-side to |sources|·B rows, and everything after — the window
    * rank over replicate means included — is metadata-sized. */
  def bootstrapLengthCi(docs: DataFrame, reps: Int = 32): DataFrame = {
    val two31 = 2147483648L
    // floor(cdf_Poisson(1)(k) * 2^31) for k = 0, 1, 2
    val (t0, t1, t2) = (790015084L, 1580030168L, 1975037710L)
    val base = docs.select(col("source"), col("doc_id"), col("n_chars"))
    val perSource = base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("_sc"))
      .select(col("source"), col("n_docs"),
        round(col("_sc").cast("double") /
          col("n_docs").cast("double"), 12).as("mean_len"))
    // abs() before the modulus: Spark's pmod and the oracle's `%`
    // agree only on non-negative seeds (pmod wraps negatives up,
    // `%` keeps their sign), so the seed is made non-negative the
    // same way on BOTH engines — the pairing is sign-robust instead
    // of relying on the harness' non-negative doc_ids (r12 advisor)
    val s1 = pmod(pmod(abs(col("doc_id")), lit(two31)) * lit(1103515245L) +
      col("b") * lit(12345L) + lit(12345L), lit(two31))
    val h = pmod(s1 * lit(1103515245L) + lit(12345L), lit(two31))
    val k = when(h < t0, lit(0L)).when(h < t1, lit(1L))
      .when(h < t2, lit(2L)).otherwise(lit(3L))
    val repMeans = base
      .select(col("source"), col("doc_id"), col("n_chars"),
        explode(sequence(lit(0L), lit(reps - 1L))).as("b"))
      .select(col("source"), col("b"), k.as("_k"), col("n_chars"))
      .groupBy(col("source"), col("b"))
      .agg(sum(col("_k")).as("_kn"),
        sum(col("_k") * col("n_chars")).as("_ks"))
      .filter(col("_kn") > 0)
      .select(col("source"), col("b"),
        round(col("_ks").cast("double") /
          col("_kn").cast("double"), 12).as("_m"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("_m"), col("b"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
    repMeans
      .withColumn("_rn", row_number().over(w))
      .withColumn("_nv", count(lit(1)).over(wAll))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_reps"),
        min(col("_m")).as("boot_min"),
        max(when(col("_rn") ===
            floor((col("_nv") + 1).cast("double") / 2.0).cast("long"),
          col("_m"))).as("boot_med"),
        max(col("_m")).as("boot_max"))
      .join(perSource, Seq("source"))
      .select(col("source"), col("n_docs"), col("mean_len"),
        col("n_reps"), col("boot_min"), col("boot_med"),
        col("boot_max"))
      .orderBy(col("source"))
  }

  def keySkewProfile(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("n")).cast("long").as("n_rows"),
        max(col("n")).as("max_n"),
        percentile(col("n"), lit(0.5)).as("p50_n"),
        percentile(col("n"), lit(0.99)).as("p99_n"))
      .select(col("n_keys"), col("n_rows"), col("max_n"),
        col("p50_n"), col("p99_n"),
        (col("max_n").cast("double") / col("n_rows"))
          .as("top1_share"),
        (col("max_n").cast("double") / col("p50_n")).as("skew_ratio"))
}
