package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

/** Boundary semantics for the banded temporal range join (q45): the
  * bucket trick must be invisible — pairs that straddle a gap-bucket
  * boundary are found, interval endpoints are (open, closed], and no
  * pair is emitted twice. */
class EventOpsSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toSeq.map { case (id, u, t) => (id, u, ts(t)) }
      .toDF("event_id", "user_id", "ts")
  }

  test("rangeJoinWithin: (open, closed] endpoints, cross-bucket recall, " +
      "no duplicate pairs, users never mix") {
    // gap = 1 minute. Bucket width 60 s, epoch-aligned.
    val df = events(
      (1L, 7L, "2024-01-01 00:00:59"), // bucket 0 (59 s)
      (2L, 7L, "2024-01-01 00:01:30"), // bucket 1 — 31 s after e1: cross-bucket pair
      (3L, 7L, "2024-01-01 00:01:59"), // exactly 60 s after e1: boundary INCLUDED
      (4L, 7L, "2024-01-01 00:02:00"), // 61 s after e1: out of range for e1
      (5L, 7L, "2024-01-01 00:01:30"), // same instant as e2: diff 0 EXCLUDED
      (6L, 9L, "2024-01-01 00:01:00")  // other user: never pairs
    )
    val out = EventOps.rangeJoinWithin(df, gapMinutes = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val pairs = out.map { case (_, a, b, _) => (a, b) }
    assert(pairs.toSet == Set(
      (1L, 2L), (1L, 5L), (1L, 3L), // cross-bucket + inclusive far endpoint
      (2L, 3L), (2L, 4L), (5L, 3L), (5L, 4L),
      (3L, 4L)),
      s"got ${pairs.toSeq.sorted.mkString(", ")}")
    assert(pairs.length == pairs.distinct.length, "no pair emitted twice")
    val gap13 = out.find(t => t._2 == 1L && t._3 == 3L).get._4
    assert(gap13 == 60L, s"gap_seconds for the 60 s pair: $gap13")
    assert(out.forall(_._1 == 7L), "user 9 has no in-gap neighbor")
  }

  test("rangeJoinWithin: empty input and single event produce no rows") {
    assert(EventOps.rangeJoinWithin(
      events((1L, 1L, "2024-01-01 00:00:00")), 5).count() == 0)
  }
}
