package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ParseExprs
import graft.model.{JobPosting, Schemas}

/** The reference's extract_job_data (etl/etl.py:224-297) as one declarative
  * Spark plan: explode the page items, project 10 fields with null-safe
  * defaults, validate, and (optionally) first-wins dedup. The whole
  * pipeline is a single whole-stage-codegen'd select over the exploded
  * array — no driver loop, no UDFs — so it parallelizes trivially over
  * pages/partitions at any scale.
  */
object Curate {

  /** Read raw API page documents (one JSON document per line/file) with the
    * explicit schema — PERMISSIVE mode mirrors the reference's
    * skip-bad-item-and-continue behavior (etl/etl.py:288-290). */
  def readRaw(spark: SparkSession, paths: String*): DataFrame =
    spark.read
      .schema(Schemas.rawApiResponse)
      .option("mode", "PERMISSIVE")
      .option("multiLine", "true")
      .json(paths: _*)

  /** Same, from already-fetched page payload strings. */
  def fromJsonStrings(spark: SparkSession, pages: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read
      .schema(Schemas.rawApiResponse)
      .option("mode", "PERMISSIVE")
      .json(spark.createDataset(pages))
  }

  /** From a `payload` string column (the DSv2 usajobs source output):
    * from_json with the explicit schema, then the same raw shape as
    * readRaw — so `Curate(fromPayloads(df))` shares the whole curation
    * plan with the driver-drain path. Parsing happens on executors,
    * partition-parallel. */
  def fromPayloads(pages: DataFrame): DataFrame =
    pages
      .select(from_json(col("payload"), Schemas.rawApiResponse).as("_root"))
      .select(col("_root.*"))

  /** Explode → project → validate. Output schema = JobPosting. */
  def apply(raw: DataFrame): DataFrame = curateItems(items(raw))

  /** The explode stage alone — exposed so callers (EtlJob) can attach an
    * `observe` node between explode and projection and count extracted
    * items on the same single action as the sink write. */
  def items(raw: DataFrame): DataFrame =
    raw.select(explode(col("SearchResult.SearchResultItems")).as("item"))

  /** Projection + validation over exploded items. */
  def curateItems(itemsDf: DataFrame): DataFrame = {
    val d: String => Column = f => col(s"item.MatchedObjectDescriptor.$f")
    itemsDf
      .select(
        trim(coalesce(d("PositionTitle"), lit(""))).as("position_title"),
        trim(coalesce(d("PositionURI"), lit(""))).as("position_uri"),
        ParseExprs.parseLocation(d("PositionLocation"))
          .as("position_location"),
        ParseExprs.parseRemuneration(d("PositionRemuneration"))
          .as("position_remuneration"),
        ParseExprs.parseDate(d("PositionStartDate")).as("position_start_date"),
        ParseExprs.parseDate(d("PositionEndDate")).as("position_end_date"),
        trim(coalesce(d("OrganizationName"), lit(""))).as("organization_name"),
        trim(coalesce(d("DepartmentName"), lit(""))).as("department_name"),
        // try_element_at: ANSI mode makes element_at on a present-but-empty
        // array throw; the reference treats [] as falsy and yields ""
        // (etl/etl.py:260-268).
        coalesce(try_element_at(d("JobCategory"), lit(1)).getField("Name"),
          lit("")).as("job_category"),
        coalesce(try_element_at(d("JobGrade"), lit(1)).getField("Code"),
          lit("")).as("job_grade"),
        current_timestamp().as("extracted_at"))
      .filter(ParseExprs.isValidPosting(col("position_title"),
        col("position_uri")))
  }

  /** Typed view of the curated layer for compile-time field checks. */
  def typed(spark: SparkSession, raw: DataFrame): Dataset[JobPosting] = {
    import spark.implicits._
    apply(raw).as[JobPosting]
  }
}
