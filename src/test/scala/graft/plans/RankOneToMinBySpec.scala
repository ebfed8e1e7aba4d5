package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Dedup

/** The rank-1 → min_by optimizer rule: fires where it provably agrees
  * with the window form, bails everywhere else, and the rewritten plan
  * has the partial-aggregate shape the window form lacks. The shared
  * test session is built by GraftSession, so the extension is installed
  * exactly as in the engine entry points — every other suite (and all
  * 60 oracle queries) runs WITH the rule active, which is the broad
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

  test("rank <= k rewrites to the bounded row top-k aggregate, rank " +
      "recovered from array position, results identical to the window") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 30.0), (2L, "a", 10.0), (3L, "a", 20.0),
      (4L, "b", 5.0), (5L, "b", 50.0), (6L, "c", 1.0))
      .toDF("seq", "k", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("v").desc, col("seq").asc)
    val top2 = df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 2)
    val opt = optimized(top2)
    assert(!opt.contains("Window") && opt.contains("graft_row_top_k"),
      s"rank<=2 must rewrite to the bounded aggregate:\n$opt")
    val got = top2.collect()
      .map(r => (r.getLong(0), r.getInt(3))).toSet
    // per key, two highest v: a -> seq 1 (rank 1), 3 (rank 2);
    // b -> 5, 4; c -> 6 (only one row, rank 1)
    assert(got == Set((1L, 1), (3L, 2), (5L, 1), (4L, 2), (6L, 1)))
  }

  test("rank <= k on harness data equals the window computed without " +
      "the rewrite (q08 shape, multi-partition)") {
    val orders = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "orders")
    def viaRank(k: Int) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
    }
    val rewritten = viaRank(2)
    assert(!optimized(rewritten).contains("Window"))
    val got = rewritten.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // reference: compute ranks driver-side from the raw rows
    val expected = orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
      .toSeq
      .flatMap { case (ck, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(2).zipWithIndex
          .map { case (t, i) => (ck, t._2, i + 1) }.toSeq
      }.toSet
    assert(got == expected)
  }

  test("nullable order keys rewrite with exact NULLS FIRST/LAST " +
      "semantics (explicit flag field, window parity)") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"))
      .toDF("seq", "k")
      .withColumn("nk", when(col("seq") > 1, col("seq"))) // null at seq=1
    def rank1(order: org.apache.spark.sql.Column) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(order)
      df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
    }
    // asc = NULLS FIRST by default: the null row wins group a
    val nf = rank1(col("nk").asc)
    assert(!optimized(nf).contains("Window"),
      s"nullable asc must rewrite:\n${optimized(nf)}")
    assert(nf.collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    // asc NULLS LAST: the smallest non-null wins group a
    val nl = rank1(col("nk").asc_nulls_last)
    assert(!optimized(nl).contains("Window"))
    assert(nl.collect().map(_.getLong(0)).toSet == Set(2L, 4L))
  }

  test("NaN under descending float keys ranks FIRST, matching window " +
      "semantics (explicit NaN flag in the rewritten key)") {
    import spark.implicits._
    val df = Seq((1L, "a", 5.0), (2L, "a", Double.NaN), (3L, "a", 7.0),
      (4L, "b", 1.0)).toDF("seq", "k", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("v").desc, col("seq").asc)
    val rank1 = df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
    assert(!optimized(rank1).contains("Window"))
    // Spark orders NaN greatest in both directions: desc ranks the NaN
    // row first — the rewrite must agree, not bury it via negation
    assert(rank1.collect().map(_.getLong(0)).toSet == Set(2L, 4L))
    val top2 = df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 2)
    assert(!optimized(top2).contains("Window"))
    assert(top2.collect().map(r => (r.getLong(0), r.getInt(3))).toSet ==
      Set((2L, 1), (3L, 2), (4L, 1)))
  }

  test("global (no PARTITION BY) rank-1 over runtime-empty input " +
      "yields zero rows, not a spurious null row") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < -5) // empty at runtime, not foldable
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("doc_id").asc)
    val first = docs.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
    assert(!optimized(first).contains("Window"),
      "global rank-1 should take the top-k path, not stay a window")
    assert(first.count() == 0L,
      "empty input must yield zero rows, not an all-null aggregate row")
  }

  test("flipped literal form `1 >= rn` rewrites like `rn <= 1`") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("seq", "k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("seq").asc)
    val flipped = df.withColumn("_rn", row_number().over(w))
      .filter(lit(1) >= col("_rn"))
    assert(!optimized(flipped).contains("Window"))
    assert(flipped.collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("bails out: integral desc (ANSI negation), non-numeric desc, " +
      "k over cap") {
    import spark.implicits._
    val df = Seq((1L, "a", "s1"), (2L, "a", "s2"), (3L, "b", "s3"))
      .toDF("seq", "k", "s")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("seq").asc)
    // k beyond RowTopK.MaxK — must NOT rewrite
    val topBig = df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 100000)
    assert(optimized(topBig).contains("Window"))
    assert(topBig.count() == 3L)
    // descending LONG order — ANSI negation of MinValue would throw
    // where the sort succeeds; must NOT rewrite
    val wL = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("seq").desc)
    val viaLongDesc = df
      .withColumn("_rn", row_number().over(wL)).filter(col("_rn") === 1)
    assert(optimized(viaLongDesc).contains("Window"))
    assert(viaLongDesc.collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    // descending STRING order — not negatable, must NOT rewrite
    val wS = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("s").desc)
    val viaStringDesc = df
      .withColumn("_rn", row_number().over(wS)).filter(col("_rn") === 1)
    assert(optimized(viaStringDesc).contains("Window"))
    assert(viaStringDesc.collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    // NONDETERMINISTIC order key (random-sample-per-group idiom): the
    // analyzer extracts rand() into a _w0 projection BELOW the window,
    // so the order key the rule sees is a plain (deterministic)
    // attribute over a materialized draw — the rewrite fires and is
    // safe (one draw per row, no re-evaluation). The rule's
    // `deterministic` guard remains as defense-in-depth for hand-built
    // plans whose orderSpec embeds the nondeterministic expression raw.
    val wR = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(rand(7).asc)
    val viaRand = df
      .withColumn("_rn", row_number().over(wR)).filter(col("_rn") === 1)
    assert(!optimized(viaRand).contains("Window"))
    assert(viaRand.count() == 2L) // one survivor per group either way
  }
}
