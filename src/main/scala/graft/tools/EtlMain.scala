package graft.tools

import graft.GraftSession
import graft.etl.{Bootstrap, EtlJob}
import graft.sources.UsaJobsClient

/** Production entry point (reference: main() → ETLService.run(),
  * etl/etl.py:695-714): env-driven config, real HTTP transport with the
  * API key, DDL bootstrap, one ETL run, run-metadata append (inside
  * EtlJob when GRAFT_METADATA_PATH is set), summary on stdout.
  *
  * Environment (reference .env.example): USAJOBS_API_KEY (required),
  * SEARCH_KEYWORD, SEARCH_LOCATION, MAX_PAGES, API_DELAY (seconds,
  * default 1.5), GRAFT_TARGET_PATH, GRAFT_METADATA_PATH.
  */
object EtlMain {
  def main(args: Array[String]): Unit = {
    val apiKey = sys.env.getOrElse("USAJOBS_API_KEY", {
      System.err.println("USAJOBS_API_KEY is required")
      sys.exit(2)
    })
    val config = EtlJob.Config.fromEnv()
    val rateLimitMs =
      (sys.env.getOrElse("API_DELAY", "1.5").toDouble * 1000).toLong

    val log = sys.env.get("GRAFT_LOG_FILE")
      .map(graft.etl.JsonLog.fileSink)
      .getOrElse(new graft.etl.JsonLog.Sink())
    val spark = GraftSession.local()
    try {
      log.info("etl", s"Starting ETL run: keyword='${config.keyword}' " +
        s"maxPages=${config.maxPages}")
      Bootstrap(spark, config.targetPath) // S8: table + views
      val summary = EtlJob.run(spark, UsaJobsClient.HttpTransport(apiKey),
        config, rateLimitMs)
      summary.errors.foreach(log.error("etl", _))
      log.info("etl", s"ETL run complete: $summary")
      println(s"SUMMARY $summary")
      spark.sql("SELECT * FROM job_statistics").show(truncate = false)
    } finally spark.stop()
  }
}
