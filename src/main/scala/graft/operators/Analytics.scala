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
}
