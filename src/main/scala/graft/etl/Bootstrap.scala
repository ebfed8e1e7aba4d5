package graft.etl

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

import graft.model.JobPosting

/** DDL bootstrap (reference: init.sql via create_tables(),
  * etl/etl.py:381-400 — SURVEY §2.1 S8): registers the `job_postings`
  * table plus the `recent_job_postings` / `job_statistics` views so the
  * same SQL the reference serves from PostgreSQL runs through Catalyst.
  *
  * Differences from init.sql, by design: no indexes (physical-access
  * hints — Spark's analogue is partition/file layout, not a CREATE
  * INDEX), no updated_at trigger (the merge sink stamps it — see
  * Upsert), and SERIAL id is omitted (position_uri is the natural key;
  * SURVEY §7.3). Views follow init.sql:44-70 column-for-column.
  */
object Bootstrap {

  /** View DDL, Spark SQL dialect (init.sql:44-57, 60-70; `id` dropped). */
  val recentJobPostingsDdl: String =
    """CREATE OR REPLACE TEMPORARY VIEW recent_job_postings AS
      |SELECT position_title, position_location, position_remuneration,
      |       organization_name, department_name, job_category,
      |       created_at, updated_at
      |FROM job_postings
      |WHERE created_at >= CAST(date_sub(current_date(), 30) AS TIMESTAMP)
      |ORDER BY created_at DESC""".stripMargin

  val jobStatisticsDdl: String =
    """CREATE OR REPLACE TEMPORARY VIEW job_statistics AS
      |SELECT COUNT(*) AS total_jobs,
      |       COUNT(DISTINCT organization_name) AS unique_organizations,
      |       COUNT(DISTINCT department_name) AS unique_departments,
      |       COUNT(CASE WHEN created_at >=
      |         CAST(current_date() AS TIMESTAMP) THEN 1 END) AS jobs_today,
      |       COUNT(CASE WHEN created_at >=
      |         CAST(date_sub(current_date(), 7) AS TIMESTAMP) THEN 1 END)
      |         AS jobs_this_week,
      |       COUNT(CASE WHEN created_at >=
      |         CAST(date_sub(current_date(), 30) AS TIMESTAMP) THEN 1 END)
      |         AS jobs_this_month,
      |       MAX(created_at) AS last_job_date,
      |       MIN(created_at) AS first_job_date
      |FROM job_postings""".stripMargin

  /** Register job_postings over the sink path (empty-with-schema when the
    * first run has not happened yet) and create both views. Idempotent. */
  def apply(spark: SparkSession, targetPath: String): Unit = {
    table(spark, targetPath).createOrReplaceTempView("job_postings")
    spark.sql(recentJobPostingsDdl)
    spark.sql(jobStatisticsDdl)
  }

  /** The job_postings table: the parquet snapshot, or an empty frame with
    * the canonical schema before the first run (CREATE TABLE IF NOT
    * EXISTS semantics). */
  def table(spark: SparkSession, targetPath: String): DataFrame = {
    // snapshot schema = JobPosting + the two sink-managed timestamps
    val postingSchema = Encoders.product[JobPosting].schema
      .add("created_at", "timestamp").add("updated_at", "timestamp")
    if (java.nio.file.Files.exists(
        java.nio.file.Paths.get(targetPath, "_SUCCESS")))
      spark.read.parquet(targetPath)
    else
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        postingSchema)
  }
}
