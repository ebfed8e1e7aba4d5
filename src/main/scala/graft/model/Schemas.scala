package graft.model

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.types._

/** Curated job-posting record — mirrors the reference's central entity
  * (reference: etl/etl.py:96-128, table DDL init.sql:2-17). The Postgres
  * SERIAL id is intentionally dropped: position_uri is the natural key and
  * no reference test asserts id values (SURVEY.md §7.3).
  */
case class JobPosting(
    position_title: String,
    position_uri: String,
    position_location: String,
    position_remuneration: String,
    position_start_date: Option[Date],
    position_end_date: Option[Date],
    organization_name: Option[String],
    department_name: Option[String],
    job_category: Option[String],
    job_grade: Option[String],
    extracted_at: Timestamp)

/** Explicit schemas for the raw USAJOBS API document (schema-on-read with
  * every field nullable — the reference defaults every missing field,
  * etl/etl.py:229-268; fixture contract tests/conftest.py:132-181).
  */
object Schemas {

  val positionLocation: StructType = StructType(Seq(
    StructField("CityName", StringType),
    StructField("StateCode", StringType),
    StructField("CountryCode", StringType)))

  val positionRemuneration: StructType = StructType(Seq(
    StructField("MinimumRange", StringType),
    StructField("MaximumRange", StringType),
    StructField("RateIntervalCode", StringType)))

  val matchedObjectDescriptor: StructType = StructType(Seq(
    StructField("PositionTitle", StringType),
    StructField("PositionURI", StringType),
    StructField("PositionLocation", ArrayType(positionLocation)),
    StructField("PositionRemuneration", ArrayType(positionRemuneration)),
    StructField("OrganizationName", StringType),
    StructField("DepartmentName", StringType),
    StructField("PositionStartDate", StringType),
    StructField("PositionEndDate", StringType),
    StructField("JobCategory",
      ArrayType(StructType(Seq(StructField("Name", StringType))))),
    StructField("JobGrade",
      ArrayType(StructType(Seq(StructField("Code", StringType)))))))

  /** Top-level API response (reference: etl/etl.py:229-234, 617-659 uses
    * SearchResultCount/CountAll as pagination stop conditions). */
  val rawApiResponse: StructType = StructType(Seq(
    StructField("SearchResult", StructType(Seq(
      StructField("SearchResultCount", LongType),
      StructField("SearchResultCountAll", LongType),
      StructField("SearchResultItems", ArrayType(StructType(Seq(
        StructField("MatchedObjectDescriptor", matchedObjectDescriptor))))))))))
}
