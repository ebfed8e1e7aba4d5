package graft.etl

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Dedup, Upsert}
import graft.sources.UsaJobsClient
import graft.sources.UsaJobsClient.{PageCounts, Transport}

/** End-to-end orchestration of the reference's ETL run (SURVEY §3 EP1:
  * main() → ETLService.run(), etl/etl.py:587-692): drain pages → curate
  * (explode/project/validate) → first-wins dedup → upsert → statistics,
  * with run counters.
  *
  * Differences from the reference, by design (Spark execution model):
  * the per-page Python loop becomes a single lazy plan over the union of
  * page documents; validation/dedup/stats are Catalyst-optimized plan
  * stages rather than driver-side passes; the only materialization is the
  * sink write. Run metrics ride that single action as `Observation`s —
  * extracted/valid counts cost no extra scan — and the pagination
  * counters in the drain loop are parsed driver-side with Jackson (no
  * Spark job per fetched page).
  */
object EtlJob {

  /** Run summary — mirrors the reference's self.metrics + run result
    * (etl/etl.py:571-578, 674-682). jobsValid counts postings that passed
    * validation BEFORE key-dedup (the reference's total_jobs_extracted
    * semantics); jobsLoaded is the post-dedup merge total; errors carries
    * the F7-triaged per-page failures (the run completes despite them). */
  case class RunSummary(pagesFetched: Int, jobsExtracted: Long,
      jobsValid: Long, jobsLoaded: Long, inserted: Long, updated: Long,
      durationSec: Double, errors: Seq[String] = Nil)

  case class Config(keyword: String = "data engineering",
      location: Option[String] = None, maxPages: Int = 20,
      resultsPerPage: Int = 500, targetPath: String = "/tmp/graft_jobs",
      metadataPath: Option[String] = None)

  object Config {
    /** Environment-driven config (reference: etl/etl.py:594-599 +
      * .env.example): SEARCH_KEYWORD, SEARCH_LOCATION, MAX_PAGES, plus
      * engine-side target paths. Injectable env map for tests. */
    def fromEnv(env: Map[String, String] = sys.env): Config = Config(
      keyword = env.getOrElse("SEARCH_KEYWORD", "data engineering"),
      location = env.get("SEARCH_LOCATION").filter(_.nonEmpty),
      maxPages = env.get("MAX_PAGES").map(_.trim.toInt).getOrElse(20),
      resultsPerPage =
        env.get("RESULTS_PER_PAGE").map(_.trim.toInt).getOrElse(500),
      targetPath = env.getOrElse("GRAFT_TARGET_PATH", "/tmp/graft_jobs"),
      metadataPath = env.get("GRAFT_METADATA_PATH").filter(_.nonEmpty))
  }

  /** Full run against an injectable transport (fixtures in tests, HTTP in
    * production). */
  def run(spark: SparkSession, transport: Transport, config: Config,
      rateLimitMs: Long = 0): RunSummary = {
    val t0 = System.nanoTime()

    // Extract: driver-side drain with retry/breaker/rate-limit (S1-S5).
    val limiter =
      if (rateLimitMs > 0) Some(new UsaJobsClient.RateLimiter(rateLimitMs))
      else None
    val drained = UsaJobsClient.drainPages(transport, pageCounts,
      config.keyword, config.location, config.maxPages,
      config.resultsPerPage, limiter,
      Some(new UsaJobsClient.CircuitBreaker()))

    try {
      // Transform: ONE lazy plan over all pages (P1-P7, F1, D1), with
      // observation points at explode (extracted) and post-validation
      // (valid) — both resolved by the sink write, the run's only action.
      val raw = Curate.fromJsonStrings(spark, drained.pages)
      val obsExtracted = Observation("extracted")
      val obsValid = Observation("valid")
      val curated = Curate.curateItems(
          Curate.items(raw).observe(obsExtracted, count(lit(1)).as("n")))
        .observe(obsValid, count(lit(1)).as("n"))
      val deduped = Dedup.firstWinsByArrival(curated, Seq("position_uri"))

      // Load: merge with insert/update accounting (S7, D2, D3).
      val stats = Upsert.mergeParquet(spark, deduped, config.targetPath,
        "position_uri")

      val summary = RunSummary(drained.pages.size,
        obsExtracted.get("n").asInstanceOf[Long],
        obsValid.get("n").asInstanceOf[Long],
        stats.total, stats.inserted, stats.updated,
        (System.nanoTime() - t0) / 1e9, drained.errors)
      config.metadataPath.foreach(p => RunMetadata.append(spark, p,
        stats.total, status = "success", errors = drained.errors))
      summary
    } catch {
      case e: Throwable =>
        // best-effort: the run-log append must never mask the root cause
        try config.metadataPath.foreach(p => RunMetadata.append(spark, p,
          0L, status = "failed",
          errors = drained.errors :+ String.valueOf(e.getMessage)))
        catch { case meta: Throwable => e.addSuppressed(meta) }
        throw e
    }
  }

  /** Post-run statistics over the sink table (EP3). */
  def statistics(spark: SparkSession, targetPath: String): DataFrame =
    Analytics.statistics(spark.read.parquet(targetPath),
      "organization_name", "department_name", "created_at")

  private val mapper = new ObjectMapper()

  /** Pagination counters, parsed on the driver with Jackson (~µs) —
    * the drain loop must never launch a Spark job per page. */
  private[etl] def pageCounts(payload: String): PageCounts = {
    val sr = mapper.readTree(payload).path("SearchResult")
    PageCounts(sr.path("SearchResultCount").asLong(0L),
      sr.path("SearchResultCountAll").asLong(0L))
  }
}
