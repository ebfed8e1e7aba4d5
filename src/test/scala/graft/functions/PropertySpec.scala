package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite

/** Property tests for the native expressions: each property generates a
  * batch of random inputs (fixed seed, reproducible), evaluates BOTH the
  * native codegen'd expression and its portable reference form in ONE
  * DataFrame pass, and asserts bit-equality row by row. */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).map(i => g.apply(Gen.Parameters.default, Seed(seed + i)).get)

  /** Unicode-heavy strings: ASCII, Latin-1, CJK, and supplementary-plane
    * codepoints (surrogate pairs) mixed freely. */
  private val unicodeString: Gen[String] = Gen.listOf(Gen.frequency(
    5 -> Gen.choose(32, 126), // ASCII incl space
    2 -> Gen.choose(0xC0, 0x2FF), // Latin extended
    2 -> Gen.choose(0x4E00, 0x9FFF), // CJK
    1 -> Gen.choose(0x1F300, 0x1F6FF) // supplementary (emoji)
  )).map(_.flatMap(Character.toChars(_).toSeq).mkString)

  test("property: rollingHash tree == native on arbitrary unicode") {
    val inputs = sample(unicodeString, 200, 1L)
    val rows = inputs.toDF("text").select(
      TextFunctions.rollingHash(col("text")).as("tree"),
      GraftFunctions.rollingHash(spark, col("text")).as("native")).collect()
    rows.zip(inputs).foreach { case (r, s) =>
      assert(r.getLong(0) == r.getLong(1), s"mismatch for ${s.take(40)}")
    }
  }

  test("property: DocProfileStats counters == HOF trees on arbitrary " +
      "unicode docs (case mapping, surrogates, mixed separators)") {
    val doc: Gen[String] = Gen.listOf(Gen.frequency(
      4 -> Gen.oneOf("the", "a", "The", "cat", "X1", "d-e_f", "123"),
      2 -> Gen.const(""),
      1 -> unicodeString.map(_.replace(" ", ""))))
      .map(_.mkString(" "))
    val inputs = sample(doc, 200, 11L)
    val st = GraftFunctions.docProfileStats(col("text"))
    val toks = TextFunctions.tokens(col("text"))
    val rows = inputs.toDF("text").select(
      st.getField("n_tokens").as("na"),
      size(toks).cast("long").as("ha"),
      st.getField("token_len_sum").as("nb"),
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("hb"),
      st.getField("stopword_hits").as("nc"),
      size(filter(toks, t => array_contains(
        array(TextFunctions.DefaultStopwords.map(lit): _*), t)))
        .cast("long").as("hc"),
      st.getField("en_hits").as("nd"),
      size(filter(TextFunctions.tokens(lower(col("text"))),
        t => array_contains(
          array(TextFunctions.EnMarkers.map(lit): _*), t)))
        .cast("long").as("hd"),
      st.getField("n_subtokens").as("ne"),
      TextFunctions.subTokenCount(col("text")).as("he"),
      st.getField("alpha_chars").as("nf"),
      length(regexp_replace(col("text"), "[^A-Za-z]", ""))
        .cast("long").as("hf")).collect()
    rows.zip(inputs).foreach { case (r, s) =>
      Seq("a", "b", "c", "d", "e", "f").foreach { k =>
        assert(r.getAs[Long]("n" + k) == r.getAs[Long]("h" + k),
          s"counter $k mismatch for '${s.take(60)}'")
      }
    }
  }

  test("property: RepetitionStats == reference Scala counters on " +
      "arbitrary token sequences (incl. stutter-heavy)") {
    // small vocab + duplication bias so runs and repeated n-grams occur
    val doc: Gen[String] = Gen.listOf(Gen.frequency(
      6 -> Gen.oneOf("a", "b", "cc", "ddd", "e"),
      2 -> Gen.const(""), // consecutive spaces when joined
      1 -> unicodeString.map(_.replace(" ", ""))))
      .map(_.mkString(" "))
    val inputs = sample(doc, 200, 7L)
    def ref(text: String): (Long, Long, Long, Long, Long) = {
      val toks = text.split(" ").filter(_.nonEmpty).toSeq
      val bgs = toks.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSeq
      val tgs = toks.sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSeq
      val maxRun =
        if (toks.isEmpty) 0L
        else {
          var best = 1; var cur = 1
          toks.sliding(2).foreach {
            case Seq(x, y) =>
              cur = if (x == y) cur + 1 else 1
              best = math.max(best, cur)
            case _ => ()
          }
          best.toLong
        }
      (bgs.length.toLong,
        if (bgs.isEmpty) 0L
        else bgs.groupBy(identity).values.map(_.length).max.toLong,
        tgs.length.toLong, tgs.distinct.length.toLong, maxRun)
    }
    val st = GraftFunctions.repetitionStats(col("text"))
    val rows = inputs.toDF("text").select(
      st.getField("n_bigrams"), st.getField("max_bigram_count"),
      st.getField("n_trigrams"), st.getField("n_distinct_trigrams"),
      st.getField("max_run")).collect()
    rows.zip(inputs).foreach { case (r, s) =>
      val expected = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(expected == ref(s), s"mismatch for '${s.take(60)}'")
    }
  }

  test("property: ShingleHashes == HOF tree on arbitrary token lists") {
    val doc: Gen[String] = Gen.listOf(Gen.frequency(
      4 -> Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "yy"),
      1 -> Gen.const(""), // consecutive spaces when joined
      1 -> unicodeString.map(_.replace(" ", "")))
    ).map(_.mkString(" "))
    val inputs = sample(doc, 150, 2L)
    val p = 2147483647L
    val rows = inputs.toDF("text").select(
      transform(TextFunctions.shingles(col("text"), 3),
        s => pmod(xxhash64(s), lit(p))).as("tree"),
      GraftFunctions.shingleHashes(col("text"), 3, p).as("native")).collect()
    rows.zip(inputs).foreach { case (r, s) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"mismatch for '${s.take(60)}'")
    }
  }

  test("property: VectorDot == portable tree on arbitrary float vectors") {
    val vec: Gen[Seq[Float]] = Gen.listOfN(16,
      Gen.chooseNum(-1e6f, 1e6f)).map(_.toSeq)
    val pairs = sample(Gen.zip(vec, vec), 200, 3L)
    val rows = pairs.toDF("a", "b").select(
      VectorFunctions.dot(col("a"), col("b")).as("tree"),
      GraftFunctions.vectorDot(col("a"), col("b")).as("native")).collect()
    rows.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("property: PqArgminCodes / PqSubArgmin == portable argmin tree " +
      "on random vectors and codebooks (coarse values force ties)") {
    // The portable reference is the exact HOF tree the native
    // expressions replaced (VectorOps pre-round-7): per-subspace
    // zip_with/aggregate squared-L2 fold, array_min over struct<d,i>
    // (first-min ties), slice-derived subvectors.
    def l2sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(
        zip_with(a, b, (x, y) => {
          val d = x.cast("double") - y.cast("double")
          d * d
        }),
        lit(0.0), (acc, d) => acc + d)
    def argminPos(cents: org.apache.spark.sql.Column,
        sv: org.apache.spark.sql.Column) =
      array_min(transform(cents, (c, i) =>
        struct(l2sq(sv, c).as("d"), i.as("i")))).getField("i")
    val m = 4
    val dim = 8 // subDim = 2
    // coarse value set → duplicate centroids and equidistant ties are
    // common, exercising the first-min tie-break on both sides
    val coarse = Gen.oneOf(-1.0f, 0.0f, 0.5f, 1.0f, 2.0f)
    val vecGen: Gen[Seq[Float]] = Gen.listOfN(dim, coarse).map(_.toSeq)
    val centGen: Gen[Seq[Float]] = Gen.listOfN(dim / m, coarse).map(_.toSeq)
    val cbGen: Gen[Seq[Seq[Seq[Float]]]] =
      Gen.listOfN(m, Gen.choose(1, 5).flatMap(k =>
        Gen.listOfN(k, centGen).map(_.toSeq))).map(_.toSeq)
    val inputs = sample(Gen.zip(vecGen, cbGen), 200, 11L)
    val subDim = floor(size(col("embedding")) / m).cast("int")
    val rows = inputs.toDF("embedding", "cb").select(
      transform(sequence(lit(0), lit(m - 1)), s =>
        argminPos(element_at(col("cb"), s + 1),
          slice(col("embedding"), s * subDim + 1, subDim))).as("tree"),
      GraftFunctions.pqCodes(col("embedding"), col("cb")).as("native"),
      // the train-path scalar: subspace 0's argmin on the first slice
      argminPos(element_at(col("cb"), 1),
        slice(col("embedding"), lit(1), subDim)).as("tree0"),
      GraftFunctions.pqSubArgmin(
        slice(col("embedding"), lit(1), subDim),
        element_at(col("cb"), 1)).as("native0")).collect()
    rows.zip(inputs).foreach { case (r, (v, cb)) =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1),
        s"codes mismatch for vec=$v cb=$cb")
      assert(r.getInt(2) == r.getInt(3),
        s"sub-argmin mismatch for vec=$v cb=${cb.head}")
    }
  }

  test("property: TopCentroidIdxs — element 0 == nearestCentroidIdx, " +
      "order == a driver-side stable sort by (sim desc, position), on " +
      "random vectors and codebooks (coarse values force ties)") {
    val dim = 6
    val coarse = Gen.oneOf(-1.0f, 0.0f, 0.5f, 1.0f)
    val vecGen: Gen[Seq[Float]] = Gen.listOfN(dim, coarse).map(_.toSeq)
    val cbGen: Gen[Seq[Seq[Float]]] = Gen.choose(1, 6)
      .flatMap(k => Gen.listOfN(k, vecGen)).map(_.toSeq)
    val inputs = sample(Gen.zip(vecGen, cbGen), 200, 17L)
    def normD(v: Seq[Float]): Double =
      math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    val probes = 3
    val rows = inputs.toDF("embedding", "cb").select(
      GraftFunctions.topCentroidIdxs(col("embedding"),
        sqrt(aggregate(col("embedding"), lit(0.0),
          (a, x) => a + x.cast("double") * x.cast("double"))),
        col("cb"),
        transform(col("cb"), c => sqrt(aggregate(c, lit(0.0),
          (a, x) => a + x.cast("double") * x.cast("double")))),
        lit(probes)).as("top"),
      GraftFunctions.nearestCentroidIdx(col("embedding"),
        sqrt(aggregate(col("embedding"), lit(0.0),
          (a, x) => a + x.cast("double") * x.cast("double"))),
        col("cb"),
        transform(col("cb"), c => sqrt(aggregate(c, lit(0.0),
          (a, x) => a + x.cast("double") * x.cast("double")))))
        .as("nearest")).collect()
    rows.zip(inputs).foreach { case (r, (v, cb)) =>
      val top = r.getSeq[Int](0)
      // driver-side reference: sims in NearestCentroidIdx's exact
      // arithmetic (left-to-right double accumulation), stable sort
      val en = normD(v)
      val sims = cb.map { c =>
        val acc = v.zip(c).foldLeft(0.0) { case (a, (x, y)) =>
          a + x.toDouble * y.toDouble }
        val denom = en * normD(c)
        if (denom == 0.0) -2.0 else acc / denom
      }
      // stable sortWith + primitive > : -0.0 and 0.0 compare equal
      // (as in the native dcmp), so ties keep index order
      val expect = sims.zipWithIndex
        .sortWith((a, b) => a._1 > b._1)
        .take(probes).map(_._2)
      assert(top == expect, s"top-$probes mismatch for vec=$v cb=$cb: " +
        s"$top vs $expect (sims $sims)")
      assert(top.head == r.getInt(1),
        "element 0 must equal the argmax expression")
    }
  }

  test("property: remuneration renders $min - $max for arbitrary ranges") {
    val range = Gen.zip(Gen.chooseNum(0, 900000), Gen.chooseNum(0, 900000))
    val cases = sample(range, 80, 4L)
    val df = cases.map { case (lo, hi) => (lo.toString, hi.toString) }
      .toDF("minS", "maxS")
      .select(ParseExprs.parseRemuneration(array(struct(
        col("minS").as("MinimumRange"), col("maxS").as("MaximumRange"),
        lit("Per Year").as("RateIntervalCode")))).as("r"))
    val expected = cases.map { case (lo, hi) =>
      f"$$$lo%,d - $$$hi%,d Per Year"
    }
    df.collect().map(_.getString(0)).zip(expected).foreach { case (got, want) =>
      assert(got == want)
    }
  }

  test("property: BoundedTopK keeps exactly the k best for random scores") {
    val scores = sample(Gen.chooseNum(-1000.0, 1000.0), 500, 5L)
    val df = scores.zipWithIndex
      .map { case (s, i) => (i.toLong % 4, s, i.toLong) }
      .toDF("g", "score", "id")
    val got = df.groupBy(col("g"))
      .agg(GraftFunctions.topK(col("score"), col("id"), 7).as("tk"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(e => (e.getDouble(0), e.getLong(1)))).toMap
    val expected = scores.zipWithIndex
      .map { case (s, i) => (i.toLong % 4, s, i.toLong) }
      .groupBy(_._1)
      .map { case (g, rows) =>
        g -> rows.map(t => (t._2, t._3))
          .sortBy { case (s, id) => (-s, id) }.take(7)
      }
    assert(got == expected)
  }
}
