package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite

/** First-wins dedup (SURVEY §2.4 D1) — unit + property tests:
  * output keys unique; first arrival survives; idempotent. */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  test("first occurrence in arrival order wins") {
    val df = Seq(
      ("u1", "first"), ("u2", "second"), ("u1", "dup-late"), ("u3", "third"),
      ("u2", "dup-later")).toDF("key", "payload")
    val out = Dedup.firstWinsByArrival(df, Seq("key"))
      .orderBy("key").as[(String, String)].collect()
    assert(out.toSeq == Seq(("u1", "first"), ("u2", "second"),
      ("u3", "third")))
  }

  test("property: keys unique and preserved; dedup idempotent") {
    val keyGen = Gen.listOfN(60, Gen.oneOf("a", "b", "c", "d", "e", "f"))
    (0 until 10).foreach { i =>
      val keys = keyGen.apply(Gen.Parameters.default, Seed(42L + i)).get
      val df = keys.zipWithIndex.map { case (k, j) => (k, j) }
        .toDF("key", "payload")
      val out = Dedup.firstWinsByArrival(df, Seq("key"))
      val collected = out.as[(String, Int)].collect().toMap
      assert(collected.keySet == keys.toSet)
      // first-wins: payload is the minimum index per key
      val expected = keys.zipWithIndex.groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).min }
      assert(collected == expected)
      assert(Dedup.firstWinsByArrival(out, Seq("key")).count() ==
        out.count())
    }
  }

  test("keepMinBy keeps deterministic row per key") {
    val df = Seq(("k1", 5, "x"), ("k1", 2, "y"), ("k2", 9, "z"))
      .toDF("key", "rank", "payload")
    val out = Dedup.keepMinBy(df, "key", "rank")
      .orderBy("key").as[(String, Int, String)].collect()
    assert(out.toSeq == Seq(("k1", 2, "y"), ("k2", 9, "z")))
  }
}
