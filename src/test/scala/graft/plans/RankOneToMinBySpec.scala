package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Dedup

/** The rank-1 → min_by optimizer rule: fires where it provably agrees
  * with the window form, bails everywhere else, and the rewritten plan
  * has the partial-aggregate shape the window form lacks. The shared
  * test session is built by GraftSession, so the extension is installed
  * exactly as in the engine entry points — every other suite (and the
  * 58 oracle queries) runs WITH the rule active, which is the broad
  * regression net. */
class RankOneToMinBySpec extends SparkSuite {

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("firstWins rewrites to min_by: no Window in the optimized plan, " +
      "partial+final hash aggregate in the physical plan") {
    import spark.implicits._
    val df = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
      .toDF("seq", "k", "v")
    val deduped = Dedup.firstWins(df, Seq("k"), col("seq").asc)
    val opt = optimized(deduped)
    assert(!opt.contains("Window"), s"window must be rewritten:\n$opt")
    assert(opt.contains("min_by"), s"expected min_by aggregate:\n$opt")
    deduped.collect() // force physical planning + execution
    val phys = deduped.queryExecution.executedPlan.toString
    assert(phys.contains("HashAggregate") ||
      phys.contains("ObjectHashAggregate") ||
      phys.contains("SortAggregate"),
      s"aggregate execution expected:\n$phys")
    assert(!phys.contains("Window"), "no window exec may remain")
  }

  test("rewrite preserves first-wins semantics (vs hand-computed), " +
      "including desc numeric order and multi-column keys") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", "x", 10.0), (2L, "a", "x", 99.0), (3L, "a", "y", 5.0),
      (4L, "b", "x", 7.0), (5L, "b", "x", 7.0)) // order tie on (v) broken by seq
      .toDF("seq", "k1", "k2", "v")
    // asc arrival: first seq per (k1, k2)
    val first = Dedup.firstWins(df, Seq("k1", "k2"), col("seq").asc)
      .collect().map(_.getLong(0)).toSet
    assert(first == Set(1L, 3L, 4L))
    // desc value, seq tiebreak: max v per key group, ties -> min seq
    val best = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k1"), col("k2"))
        .orderBy(col("v").desc, col("seq").asc)
      df.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
    }
    val opt = optimized(best)
    assert(!opt.contains("Window") && opt.contains("min_by"),
      s"desc-numeric order must still rewrite:\n$opt")
    assert(best.collect().map(_.getLong(0)).toSet == Set(2L, 3L, 4L))
  }

  test("harness-data equivalence: firstWinsByArrival with the rule == " +
      "window result computed with the rule disabled") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("key", col("doc_id") % 7)
    val withRule = Dedup.firstWinsByArrival(docs, Seq("key"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // reference computation without any window/rank machinery: arrival
    // order of the parquet scan is the monotonic id order, so first-wins
    // per key is min doc-arrival; emulate with a groupBy min over the
    // same sequence column
    val seqd = docs.withColumn("_seq", monotonically_increasing_id())
    val expected = seqd
      .join(seqd.groupBy(col("key")).agg(min(col("_seq")).as("_seq")),
        Seq("key", "_seq"), "left_semi")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(withRule == expected)
  }

  test("bails out: rank <= 2, nullable order key, non-numeric desc") {
    import spark.implicits._
    val df = Seq((1L, "a", "s1"), (2L, "a", "s2"), (3L, "b", "s3"))
      .toDF("seq", "k", "s")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("seq").asc)
    // rank <= 2 keeps two rows — must NOT rewrite
    val top2 = df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 2)
    assert(optimized(top2).contains("Window"))
    assert(top2.count() == 3L)
    // nullable order key — must NOT rewrite (null sort order differs)
    val nullableKey = df
      .withColumn("nk", when(col("seq") > 1, col("seq")))
    val wN = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("nk").asc)
    val viaNullable = nullableKey
      .withColumn("_rn", row_number().over(wN)).filter(col("_rn") === 1)
    assert(optimized(viaNullable).contains("Window"))
    // descending STRING order — not negatable, must NOT rewrite
    val wS = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("s").desc)
    val viaStringDesc = df
      .withColumn("_rn", row_number().over(wS)).filter(col("_rn") === 1)
    assert(optimized(viaStringDesc).contains("Window"))
    assert(viaStringDesc.collect().map(_.getLong(0)).toSet == Set(2L, 3L))
  }
}
