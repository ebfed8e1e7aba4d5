package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's three pure parsers + validation predicate, re-expressed
  * as native Column expression trees (reference: etl/etl.py:299-348 and
  * 116-124). No UDFs: every builder below compiles into whole-stage
  * codegen, so the hot transform path is a single generated loop over the
  * exploded items — the 100 TB-friendly shape (row-at-a-time Python in the
  * reference; vectorized codegen here).
  *
  * Golden behavior replicated exactly (tests/test_unit.py:184-229):
  *   [{Washington, DC, US}]            -> "Washington, DC, US"
  *   [] / null                          -> "Location not specified"
  *   {80000, 120000, Per Year}          -> "$80,000 - $120,000 Per Year"
  *   {80000, -, Per Year}               -> "$80,000+ Per Year"
  *   [] remuneration                    -> "Not specified"
  *   "2023-01-01T00:00:00.0000000"      -> date 2023-01-01
  *   "invalid-date" / null              -> null
  */
object ParseExprs {

  private val NOT_SPECIFIED = "Not specified"
  private val NO_LOCATION = "Location not specified"

  /** Location formatter (reference: _parse_location, etl/etl.py:299-313).
    * First array element; join the non-empty of [CityName, StateCode,
    * CountryCode (default "US" when absent)] with ", ". */
  def parseLocation(locations: Column): Column = {
    val loc = element_at(locations, 1)
    val parts = filter(
      array(
        coalesce(loc.getField("CityName"), lit("")),
        coalesce(loc.getField("StateCode"), lit("")),
        coalesce(loc.getField("CountryCode"), lit("US"))),
      p => p =!= "")
    when(locations.isNull || size(locations) === 0, lit(NO_LOCATION))
      .otherwise(
        when(size(parts) === 0, lit(NO_LOCATION))
          .otherwise(concat_ws(", ", parts)))
  }

  /** int(float(s)) of the reference (etl/etl.py:328-333): parse as double,
    * truncate toward zero; null when unparseable (→ "Not specified").
    * try_cast: ANSI mode is on engine-wide (fail-loud arithmetic), so the
    * null-on-bad-input contract is opted into exactly here. */
  private def intOfFloat(s: Column): Column = {
    val d = s.try_cast("double")
    when(d >= 0, floor(d)).otherwise(ceil(d)).try_cast("long")
  }

  private def thousands(v: Column): Column = format_number(v, 0)

  /** Remuneration formatter (reference: _parse_remuneration,
    * etl/etl.py:315-338). Note the reference appends the rate interval
    * even when empty (trailing space) — replicated verbatim. */
  def parseRemuneration(remunerations: Column): Column = {
    val rem = element_at(remunerations, 1)
    val minS = coalesce(rem.getField("MinimumRange"), lit(""))
    val maxS = coalesce(rem.getField("MaximumRange"), lit(""))
    val interval = coalesce(rem.getField("RateIntervalCode"), lit(""))
    val minV = intOfFloat(minS)
    val maxV = intOfFloat(maxS)
    when(remunerations.isNull || size(remunerations) === 0, lit(NOT_SPECIFIED))
      .when(minS =!= "" && maxS =!= "",
        when(minV.isNull || maxV.isNull, lit(NOT_SPECIFIED)) // ValueError path
          .otherwise(concat(lit("$"), thousands(minV), lit(" - $"),
            thousands(maxV), lit(" "), interval)))
      .when(minS =!= "",
        when(minV.isNull, lit(NOT_SPECIFIED))
          .otherwise(concat(lit("$"), thousands(minV), lit("+ "), interval)))
      .otherwise(lit(NOT_SPECIFIED))
  }

  /** ISO-8601 date parse with Z→+00:00 fixup and 7-digit-fraction
    * tolerance (reference: _parse_date, etl/etl.py:340-348). Spark string→
    * timestamp casting is already null-on-failure, matching the
    * None-on-ValueError contract. */
  def parseDate(dateString: Column): Column = {
    val fixed = regexp_replace(
      regexp_replace(dateString, "Z$", "+00:00"),
      "(\\.\\d{6})\\d+", "$1") // timestamps carry 7 fractional digits
    to_date(fixed.try_cast("timestamp"))
  }

  /** Validation predicate (reference: JobPosting.validate,
    * etl/etl.py:116-124): non-blank title, non-blank uri, uri starts with
    * "http". Applied to already-trimmed columns, as in the reference. */
  def isValidPosting(title: Column, uri: Column): Column =
    title.isNotNull && trim(title) =!= "" &&
      uri.isNotNull && trim(uri) =!= "" &&
      uri.startsWith("http")
}
