package graft.etl

import java.sql.Date

import graft.SparkSuite

/** Curation pipeline against the canonical 2-item fixture
  * (tests/conftest.py:132-181 → src/test/resources/usajobs_page.json);
  * golden rows from tests/test_integration.py / FIXTURES.md §4. */
class CurateSpec extends SparkSuite {

  private lazy val fixture =
    getClass.getResource("/usajobs_page.json").getPath

  test("2-item fixture curates to 2 golden rows") {
    val rows = Curate(Curate.readRaw(spark, fixture))
      .orderBy("position_title").collect()
    assert(rows.length == 2)

    val r0 = rows(0)
    assert(r0.getAs[String]("position_title") == "Data Engineer")
    assert(r0.getAs[String]("position_uri") ==
      "https://www.usajobs.gov/job/12345")
    assert(r0.getAs[String]("position_location") == "Washington, DC, US")
    assert(r0.getAs[String]("position_remuneration") ==
      "$80,000 - $120,000 Per Year")
    assert(r0.getAs[Date]("position_start_date") ==
      Date.valueOf("2023-01-01"))
    assert(r0.getAs[Date]("position_end_date") ==
      Date.valueOf("2023-12-31"))
    assert(r0.getAs[String]("organization_name") == "Department of Defense")
    assert(r0.getAs[String]("department_name") ==
      "Defense Information Systems Agency")
    assert(r0.getAs[String]("job_category") == "Information Technology")
    assert(r0.getAs[String]("job_grade") == "GS-13")
    assert(r0.getAs[java.sql.Timestamp]("extracted_at") != null)

    val r1 = rows(1)
    assert(r1.getAs[String]("position_title") == "Senior Data Engineer")
    assert(r1.getAs[String]("position_location") == "Chicago, IL, US")
    assert(r1.getAs[String]("position_remuneration") ==
      "$95,000 - $140,000 Per Year")
    // fields absent from the fixture degrade to defaults, never crash
    assert(r1.getAs[Date]("position_start_date") == null)
    assert(r1.getAs[String]("job_category") == "")
    assert(r1.getAs[String]("job_grade") == "")
  }

  test("invalid items are filtered, valid ones survive (F1/F2)") {
    val mixed =
      """{"SearchResult": {"SearchResultCount": 3, "SearchResultCountAll": 3,
        |  "SearchResultItems": [
        |   {"MatchedObjectDescriptor": {"PositionTitle": "Good",
        |    "PositionURI": "https://x.gov/1"}},
        |   {"MatchedObjectDescriptor": {"PositionTitle": "",
        |    "PositionURI": "https://x.gov/2"}},
        |   {"MatchedObjectDescriptor": {"PositionTitle": "Bad URI",
        |    "PositionURI": "ftp://x.gov/3"}}]}}""".stripMargin
    val out = Curate(Curate.fromJsonStrings(spark, Seq(mixed)))
    assert(out.count() == 1)
    assert(out.head.getAs[String]("position_title") == "Good")
    // degraded fields on a minimal item
    assert(out.head.getAs[String]("position_location") ==
      "Location not specified")
    assert(out.head.getAs[String]("position_remuneration") == "Not specified")
  }

  test("empty JobCategory/JobGrade/arrays degrade to defaults under ANSI") {
    // the reference treats [] as falsy → "" (etl/etl.py:260-268); ANSI
    // element_at would throw INVALID_ARRAY_INDEX_IN_ELEMENT_AT here
    val emptyArrays =
      """{"SearchResult": {"SearchResultCount": 1, "SearchResultCountAll": 1,
        |  "SearchResultItems": [
        |   {"MatchedObjectDescriptor": {"PositionTitle": "Empty Arrays",
        |    "PositionURI": "https://x.gov/ea",
        |    "PositionLocation": [], "PositionRemuneration": [],
        |    "JobCategory": [], "JobGrade": []}}]}}""".stripMargin
    val rows = Curate(Curate.fromJsonStrings(spark, Seq(emptyArrays))).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("job_category") == "")
    assert(rows(0).getAs[String]("job_grade") == "")
    assert(rows(0).getAs[String]("position_location") ==
      "Location not specified")
    assert(rows(0).getAs[String]("position_remuneration") == "Not specified")
  }

  test("empty response curates to zero rows") {
    val empty =
      """{"SearchResult": {"SearchResultCount": 0,
        |"SearchResultCountAll": 0, "SearchResultItems": []}}""".stripMargin
    assert(Curate(Curate.fromJsonStrings(spark, Seq(empty))).count() == 0)
  }
}
