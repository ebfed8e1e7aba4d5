package graft.etl

import java.nio.file.Files

import graft.SparkSuite
import graft.sources.UsaJobsClient.PageRequest

/** End-to-end run: fixture transport → curate → dedup → upsert → stats,
  * asserting the reference's golden pipeline numbers
  * (tests/test_integration.py:153-166, 446-578 / FIXTURES.md §4). */
class EtlJobSpec extends SparkSuite {

  private lazy val fixtureJson = new String(Files.readAllBytes(
    java.nio.file.Paths.get(
      getClass.getResource("/usajobs_page.json").getPath)))
  private val emptyJson =
    """{"SearchResult": {"SearchResultCount": 0, "SearchResultCountAll": 0,
      |"SearchResultItems": []}}""".stripMargin

  private def freshTarget(): String = {
    val d = Files.createTempDirectory("graft_etl").toFile
    d.delete()
    d.getAbsolutePath
  }

  test("full run on the 2-item fixture: extract, load, statistics") {
    val target = freshTarget()
    // fixture page says Count=2 of CountAll=100 → partial page stops drain
    val transport = (r: PageRequest) =>
      if (r.page == 1) fixtureJson else emptyJson
    val summary = EtlJob.run(spark, transport,
      EtlJob.Config(targetPath = target))

    assert(summary.pagesFetched == 1)
    assert(summary.jobsExtracted == 2)
    assert(summary.jobsValid == 2)
    assert(summary.jobsLoaded == 2)
    assert(summary.inserted == 2 && summary.updated == 0)

    // statistics golden values (test_integration.py:153-166)
    val stats = EtlJob.statistics(spark, target).head
    assert(stats.getAs[Long]("total_jobs") == 2)
    assert(stats.getAs[Long]("unique_organizations") == 2)
    assert(stats.getAs[java.sql.Timestamp]("latest_job_posted") != null)
    assert(stats.getAs[java.sql.Timestamp]("earliest_job_posted") != null)
  }

  test("second run over the same data updates instead of inserting") {
    val target = freshTarget()
    val transport = (_: PageRequest) => fixtureJson
    // CountAll=100 in fixture; single page of 2 < 500 stops on partial
    val first = EtlJob.run(spark, transport,
      EtlJob.Config(targetPath = target))
    assert(first.inserted == 2)
    val second = EtlJob.run(spark, transport,
      EtlJob.Config(targetPath = target))
    assert(second.inserted == 0 && second.updated == 2)
    assert(spark.read.parquet(target).count() == 2)
  }

  test("empty API response yields an empty, successful run") {
    val target = freshTarget()
    val summary = EtlJob.run(spark, (_: PageRequest) => emptyJson,
      EtlJob.Config(targetPath = target))
    assert(summary.pagesFetched == 0 && summary.jobsValid == 0)
  }

  test("jobsValid counts pre-dedup validated rows; jobsLoaded post-dedup") {
    val target = freshTarget()
    // two pages with the SAME postings → extracted 4, valid 4, loaded 2.
    // resultsPerPage=2 makes the 2-item fixture a "full" page, so the
    // drain continues to page 2 and stops at maxPages.
    val transport = (r: PageRequest) =>
      if (r.page <= 2) fixtureJson else emptyJson
    val summary = EtlJob.run(spark, transport,
      EtlJob.Config(targetPath = target, maxPages = 2, resultsPerPage = 2))
    assert(summary.jobsExtracted == 4)
    assert(summary.jobsValid == 4)
    assert(summary.jobsLoaded == 2)
    assert(summary.inserted == 2 && summary.updated == 0)
  }

  test("page drain launches no Spark jobs (driver-side Jackson parse)") {
    // pageCounts itself must be pure driver code
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val pc = EtlJob.pageCounts(fixtureJson)
    assert(pc.resultCount == 2 && pc.resultCountAll == 100)
    assert(EtlJob.pageCounts("""{"no":"searchresult"}""")
      == graft.sources.UsaJobsClient.PageCounts(0, 0))
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "pageCounts must not launch Spark jobs")
  }
}
