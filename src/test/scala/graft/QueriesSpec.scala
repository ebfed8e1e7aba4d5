package graft

/** Smoke tier over the harness contract: every declared query runs on
  * sf0.001, every oracle entry points at a declared query, and the
  * flagship entry returns rows. (Exact value checking happens in the
  * DuckDB oracle gate — tools/check_oracle.py / driver CORRECTNESS.) */
class QueriesSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001 and is deterministic") {
      val df = fn(spark, sf)
      val first = df.collect()
      assert(first != null)
      // re-run: deterministic row multiset
      val second = fn(spark, sf).collect()
      assert(first.toSeq == second.toSeq, s"$name not deterministic")
    }
  }
}
