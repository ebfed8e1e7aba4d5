package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.NearDup

/** The scale-curve generator's load-bearing invariant: replication
  * must produce ZERO cross-copy candidate pairs — otherwise the "true
  * pair output grows linearly in k" premise the k× wall-time curve
  * rests on is broken. ADVICE r9 flagged that the original [a-z]-only
  * rotation left digit/uppercase-only tokens byte-identical across
  * copies; the alphabet now covers [a-zA-Z0-9] and this spec pins it
  * directly on exactly such tokens. */
class ScaleGenSpec extends SparkSuite {
  import spark.implicits._

  private def fixture = Seq(
    // near-dup pair INSIDE each copy, built from tokens with no
    // lowercase letters at all — the ADVICE counterexample class
    (1L, "NASA 12345 67890 ALPHA 999 BRAVO 123 456 789 000 111"),
    (2L, "NASA 12345 67890 ALPHA 999 BRAVO 123 456 789 000 222"),
    (3L, "the quick brown fox jumps over the lazy dog repeatedly here"))
    .toDF("doc_id", "text")
    .withColumn("lang", lit("en"))
    .withColumn("source", lit("s"))
    .withColumn("n_chars", length(col("text")))

  test("per-copy alphabets are pairwise distinct on every segment " +
      "(lower, upper, digits)") {
    val maps = (0 until 26).map(ScaleGen.toAlphabet)
    assert(maps.distinct.size == 26)
    assert(maps.map(_.take(26)).distinct.size == 26, "lowercase")
    assert(maps.map(_.slice(26, 52)).distinct.size == 26, "uppercase")
    assert(maps.map(_.takeRight(10)).distinct.size == 26, "digits")
    assert(ScaleGen.toAlphabet(0) ==
      "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
      "copy 0 is the identity")
  }

  test("replicateDocs yields zero cross-copy pairs and exactly k x " +
      "the within-copy pairs, even for digit/uppercase-only tokens") {
    val k = 4
    val rep = ScaleGen.replicateDocs(fixture, k)
    assert(rep.count() == fixture.count() * k)
    // a LOW threshold so even weak cross-copy overlap would surface
    val pairs = NearDup.jaccardPairs(rep, n = 2, minJ = 0.1)
      .select(col("a_id"), col("b_id")).collect()
    val copyOf = (id: Long) => id / ScaleGen.IdStride
    val cross = pairs.filter(r =>
      copyOf(r.getLong(0)) != copyOf(r.getLong(1)))
    assert(cross.isEmpty,
      s"cross-copy candidate pairs exist: ${cross.mkString(", ")}")
    val base = NearDup.jaccardPairs(fixture, n = 2, minJ = 0.1).count()
    assert(base > 0, "fixture must contain a within-copy pair")
    assert(pairs.length == base * k,
      s"true pair output must grow linearly: ${pairs.length} vs $base*$k")
  }
}
