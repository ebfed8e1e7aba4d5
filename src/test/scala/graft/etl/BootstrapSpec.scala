package graft.etl

import java.nio.file.Files

import graft.SparkSuite
import graft.sources.UsaJobsClient.PageRequest

/** S8 DDL bootstrap + S9 run metadata + env config — the operational
  * tail of the reference (init.sql:44-80, etl/etl.py:594-599). */
class BootstrapSpec extends SparkSuite {

  private lazy val fixtureJson = new String(Files.readAllBytes(
    java.nio.file.Paths.get(
      getClass.getResource("/usajobs_page.json").getPath)))

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft_boot").toFile
    d.delete()
    d.getAbsolutePath
  }

  test("bootstrap before any run: views exist over an empty table") {
    Bootstrap(spark, freshDir())
    assert(spark.sql("SELECT * FROM job_postings").count() == 0)
    assert(spark.sql("SELECT * FROM recent_job_postings").count() == 0)
    val stats = spark.sql("SELECT * FROM job_statistics").head
    assert(stats.getAs[Long]("total_jobs") == 0L)
  }

  test("bootstrap after a run: job_statistics matches the analytics op") {
    val target = freshDir()
    EtlJob.run(spark, (_: PageRequest) => fixtureJson,
      EtlJob.Config(targetPath = target))
    Bootstrap(spark, target)
    val viaSql = spark.sql("SELECT * FROM job_statistics").head
    assert(viaSql.getAs[Long]("total_jobs") == 2L)
    assert(viaSql.getAs[Long]("unique_organizations") == 2L)
    assert(viaSql.getAs[Long]("jobs_today") == 2L)
    val recent = spark.sql("SELECT * FROM recent_job_postings").collect()
    assert(recent.length == 2)
    assert(recent.head.schema.fieldNames.contains("position_title"))
  }

  test("run metadata: success row appended per run; history newest-first") {
    val target = freshDir()
    val meta = freshDir()
    val cfg = EtlJob.Config(targetPath = target, metadataPath = Some(meta))
    EtlJob.run(spark, (_: PageRequest) => fixtureJson, cfg)
    EtlJob.run(spark, (_: PageRequest) => fixtureJson, cfg)
    val rows = RunMetadata.history(spark, meta).collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String]("status") == "success"))
    assert(rows.forall(_.getAs[Long]("jobs_processed") == 2L))
    assert(rows.forall(_.isNullAt(rows.head.fieldIndex("error_message"))))
  }

  test("run metadata: drain errors are recorded on the success row") {
    val target = freshDir()
    val meta = freshDir()
    val transport = (r: PageRequest) =>
      if (r.page == 1) fixtureJson
      else throw new RuntimeException("boom")
    // resultsPerPage=2 makes page 1 full → drain tries page 2 → triage
    EtlJob.run(spark, transport, EtlJob.Config(targetPath = target,
      maxPages = 2, resultsPerPage = 2, metadataPath = Some(meta)))
    val row = RunMetadata.history(spark, meta).head
    assert(row.getAs[String]("status") == "success")
    assert(row.getAs[String]("error_message").contains("page 2"))
  }

  test("JsonLog: structured line golden + dual stdout/file sink (S10)") {
    val line = JsonLog.format("INFO", "etl", "Starting \"run\" #1\n",
      "graft.etl", "run", 42, java.time.Instant.EPOCH)
    assert(line == """{"timestamp": "1970-01-01T00:00:00.000000", """ +
      """"level": "INFO", "logger": "etl", """ +
      """"message": "Starting \"run\" #1\n", "module": "graft.etl", """ +
      """"function": "run", "line": 42}""")
    // valid JSON with the reference's seven fields
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(Seq("timestamp", "level", "logger", "message", "module",
      "function", "line").forall(node.has))

    val f = Files.createTempDirectory("graft_log").resolve("logs/etl.log")
    val captured = Seq.newBuilder[String]
    val sink = new JsonLog.Sink(Some(f), captured += _)
    sink.info("etl", "one")
    sink.error("db", "two")
    assert(captured.result().size == 2)
    val onDisk = Files.readAllLines(f)
    assert(onDisk.size() == 2)
    assert(onDisk.get(1).contains("\"level\": \"ERROR\""))
  }

  test("Config.fromEnv mirrors the reference env contract") {
    val cfg = EtlJob.Config.fromEnv(Map(
      "SEARCH_KEYWORD" -> "scala spark",
      "SEARCH_LOCATION" -> "Chicago",
      "MAX_PAGES" -> "7",
      "GRAFT_TARGET_PATH" -> "/tmp/t",
      "GRAFT_METADATA_PATH" -> "/tmp/m"))
    assert(cfg == EtlJob.Config("scala spark", Some("Chicago"), 7, 500,
      "/tmp/t", Some("/tmp/m")))
    // defaults (etl/etl.py:594-599)
    val defaults = EtlJob.Config.fromEnv(Map.empty)
    assert(defaults.keyword == "data engineering")
    assert(defaults.location.isEmpty && defaults.maxPages == 20)
  }
}
