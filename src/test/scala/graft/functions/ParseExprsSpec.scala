package graft.functions

import java.sql.Date

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

import graft.SparkSuite

case class Loc(CityName: String, StateCode: String, CountryCode: String)
case class Rem(MinimumRange: String, MaximumRange: String,
    RateIntervalCode: String)

/** Golden parser behavior, verbatim from the reference's unit tier
  * (tests/test_unit.py:34-65, 184-229 — see FIXTURES.md §3). */
class ParseExprsSpec extends SparkSuite {
  import spark.implicits._

  private def evalLoc(v: Seq[Loc]): String =
    Seq(Tuple1(v)).toDF("locs")
      .select(ParseExprs.parseLocation(col("locs"))).head.getString(0)

  private def evalRem(v: Seq[Rem]): String =
    Seq(Tuple1(v)).toDF("rems")
      .select(ParseExprs.parseRemuneration(col("rems"))).head.getString(0)

  private def evalDate(v: String): Date =
    Seq(Tuple1(v)).toDF("d")
      .select(ParseExprs.parseDate(col("d"))).head.getAs[Date](0)

  private def evalValid(title: String, uri: String): Boolean =
    Seq((title, uri)).toDF("t", "u")
      .select(ParseExprs.isValidPosting(col("t"), col("u"))).head
      .getBoolean(0)

  test("location: single full location") {
    assert(evalLoc(Seq(Loc("Washington", "DC", "US"))) ==
      "Washington, DC, US")
  }
  test("location: empty array and null") {
    assert(evalLoc(Seq.empty) == "Location not specified")
    assert(evalLoc(null) == "Location not specified")
  }
  test("location: missing country defaults to US") {
    assert(evalLoc(Seq(Loc("Washington", "DC", null))) ==
      "Washington, DC, US")
  }
  test("location: city only") {
    assert(evalLoc(Seq(Loc("Paris", null, null))) == "Paris, US")
  }
  test("location: all parts empty") {
    assert(evalLoc(Seq(Loc("", "", ""))) == "Location not specified")
  }

  test("remuneration: full range") {
    assert(evalRem(Seq(Rem("80000", "120000", "Per Year"))) ==
      "$80,000 - $120,000 Per Year")
  }
  test("remuneration: minimum only") {
    assert(evalRem(Seq(Rem("80000", null, "Per Year"))) ==
      "$80,000+ Per Year")
  }
  test("remuneration: empty array and null") {
    assert(evalRem(Seq.empty) == "Not specified")
    assert(evalRem(null) == "Not specified")
  }
  test("remuneration: non-numeric value (ValueError path)") {
    assert(evalRem(Seq(Rem("abc", "120000", "Per Year"))) == "Not specified")
  }
  test("remuneration: int(float()) truncation toward zero") {
    assert(evalRem(Seq(Rem("80000.9", "120000.2", "Per Year"))) ==
      "$80,000 - $120,000 Per Year")
  }
  test("remuneration: empty interval keeps reference's trailing space") {
    assert(evalRem(Seq(Rem("80000", "120000", null))) ==
      "$80,000 - $120,000 ")
  }

  test("date: 7-fraction-digit ISO string") {
    assert(evalDate("2023-01-01T00:00:00.0000000") ==
      Date.valueOf("2023-01-01"))
  }
  test("date: Z suffix") {
    assert(evalDate("2023-06-15T12:30:00Z") == Date.valueOf("2023-06-15"))
  }
  test("date: invalid and null → null") {
    assert(evalDate("invalid-date") == null)
    assert(evalDate(null) == null)
  }

  test("validation matrix") {
    assert(evalValid("Data Engineer", "https://www.usajobs.gov/job/1"))
    assert(!evalValid("", "https://www.usajobs.gov/job/1"))
    assert(!evalValid("   ", "https://www.usajobs.gov/job/1"))
    assert(!evalValid("Data Engineer", ""))
    assert(!evalValid("Data Engineer", "invalid-uri"))
  }
}
