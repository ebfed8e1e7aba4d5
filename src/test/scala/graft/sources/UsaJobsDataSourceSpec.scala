package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite
import graft.etl.Curate

/** DSv2 paginated source: page-per-partition planning, fixture replay
  * transport, and composition with the shared curation plan. */
class UsaJobsDataSourceSpec extends SparkSuite {

  private lazy val fixtureJson = new String(Files.readAllBytes(
    Paths.get(getClass.getResource("/usajobs_page.json").getPath)))

  private def pagesDir(n: Int): String = {
    val dir = Files.createTempDirectory("usajobs_pages")
    (1 to n).foreach(p =>
      Files.writeString(dir.resolve(s"page-$p.json"), fixtureJson))
    dir.toString
  }

  test("reads one row per existing page; missing pages yield no rows") {
    val df = spark.read.format("usajobs")
      .option("pages.dir", pagesDir(3))
      .option("maxPages", "10")
      .load()
    val rows = df.collect()
    assert(rows.length == 3) // pages 4..10 planned but empty
    assert(rows.map(_.getAs[Int]("page")).sorted.toSeq == Seq(1, 2, 3))
    assert(rows.forall(_.getAs[String]("payload").contains("SearchResult")))
  }

  test("column pruning reaches the source: a page-only projection " +
      "reads a payload-free schema and still sees every page row") {
    val df = spark.read.format("usajobs")
      .option("pages.dir", pagesDir(3))
      .option("maxPages", "5")
      .load()
      .select("page")
    val pages = df.collect().map(_.getAs[Int]("page")).sorted.toSeq
    assert(pages == Seq(1, 2, 3),
      "row existence (page returned data) must survive pruning")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("page") && !scan.contains("payload"),
      s"pruned scan must not carry payload: $scan")
  }

  test("page-per-partition: fetch parallelism equals maxPages") {
    val df = spark.read.format("usajobs")
      .option("pages.dir", pagesDir(2))
      .option("maxPages", "5")
      .load()
    assert(df.rdd.getNumPartitions == 5)
  }

  test("composes with the shared curation plan (same goldens)") {
    val raw = Curate.fromPayloads(
      spark.read.format("usajobs")
        .option("pages.dir", pagesDir(1))
        .option("maxPages", "3")
        .load())
    val rows = Curate(raw).orderBy("position_title").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("position_title") == "Data Engineer")
    assert(rows(0).getAs[String]("position_location") ==
      "Washington, DC, US")
    assert(rows(0).getAs[String]("position_remuneration") ==
      "$80,000 - $120,000 Per Year")
  }

  test("filter pushdown: keyword/location equality becomes the API " +
      "request parameter — rows echo it, the scan shows it pushed, and " +
      "no residual Filter survives in the plan") {
    val df = spark.read.format("usajobs")
      .option("pages.dir", pagesDir(2))
      .option("maxPages", "4")
      .option("keyword", "default kw")
      .load()
      .filter(org.apache.spark.sql.functions.col("keyword") === "data science")
      .filter(org.apache.spark.sql.functions.col("location") === "Texas")
    val rows = df.collect()
    // fixture transport ignores the request params, but the emitted
    // columns ARE the request: every row must carry the pushed values
    // (this is what makes full consumption semantically sound)
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String]("keyword") == "data science"))
    assert(rows.forall(_.getAs[String]("location") == "Texas"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("keyword"),
      s"pushed filters must be visible in the scan description: $plan")
    assert(!plan.contains("FilterExec") &&
      !plan.split('\n').exists(l => l.trim.startsWith("+- Filter") ||
        l.trim.startsWith("Filter")),
      s"consumed equality must leave no residual Filter: $plan")
  }

  test("filter pushdown: page bounds shrink the PLANNED partition set — " +
      "fewer pages are fetched at all") {
    import org.apache.spark.sql.functions.col
    val dir = pagesDir(5)
    def src = spark.read.format("usajobs")
      .option("pages.dir", dir).option("maxPages", "5").load()
    // page = 2 → exactly one partition planned (one fetch)
    val one = src.filter(col("page") === 2)
    assert(one.rdd.getNumPartitions == 1)
    assert(one.collect().map(_.getAs[Int]("page")).toSeq == Seq(2))
    // 2 <= page < 5 → three partitions
    val range = src.filter(col("page") >= 2 && col("page") < 5)
    assert(range.rdd.getNumPartitions == 3)
    assert(range.collect().map(_.getAs[Int]("page")).sorted.toSeq ==
      Seq(2, 3, 4))
    // contradictory equalities → zero partitions, correctly empty
    val none = src.filter(col("keyword") === "a")
      .filter(col("keyword") === "b")
    assert(none.collect().isEmpty)
    // extreme strict bounds must not wrap: page < Int.MinValue is
    // vacuously false (not "every page"), page > Int.MaxValue likewise.
    // These are fully pushed, so a wrapped bound would return rows.
    assert(src.filter(col("page") < Int.MinValue).collect().isEmpty,
      "page < Int.MinValue wrapped to a permissive bound")
    assert(src.filter(col("page") > Int.MaxValue).collect().isEmpty,
      "page > Int.MaxValue wrapped to a permissive bound")
  }

  test("limit pushdown: limit(n) clips the PLANNED page range — later " +
      "pages are never fetched, and the limit composes with page bounds") {
    import org.apache.spark.sql.functions.col
    val dir = pagesDir(5)
    def src = spark.read.format("usajobs")
      .option("pages.dir", dir).option("maxPages", "5").load()
    // the SCAN's planned partitions are what counts — limit(n).rdd
    // reflects the post-limit exchange, not the fetch plan
    def scanPartitions(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.size
      }.getOrElse(fail("no BatchScanExec in plan"))
    // limit 2 → two partitions planned (two fetches), rows = pages 1-2
    val two = src.limit(2)
    assert(scanPartitions(two) == 2)
    assert(two.collect().map(_.getAs[Int]("page")).sorted.toSeq ==
      Seq(1, 2))
    // pushed limit surfaces in the scan description
    assert(two.queryExecution.executedPlan.toString
      .contains("PushedLimit: 2"))
    // composes with a pushed page lower bound: start at 3, keep 2
    val mid = src.filter(col("page") >= 3).limit(2)
    assert(scanPartitions(mid) == 2)
    assert(mid.collect().map(_.getAs[Int]("page")).sorted.toSeq ==
      Seq(3, 4))
    // limit larger than the page range degrades to the full plan
    assert(scanPartitions(src.limit(99)) == 5)
  }

  test("live transport demands an api key") {
    val e = intercept[Exception] {
      spark.read.format("usajobs").option("maxPages", "1").load().collect()
    }
    assert(String.valueOf(e.getMessage).contains("api.key") ||
      String.valueOf(e.getCause.getMessage).contains("api.key"))
  }
}
