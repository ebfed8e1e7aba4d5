package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Linear quality model: exact-decimal inference + distributed GD
  * training (q185 / x35). */
class ClassifierSpec extends SparkSuite {

  test("scoreQualityLogit: hand-computed score and gate on a " +
      "two-doc fixture") {
    import spark.implicits._
    // doc 1: "the the of data" → n_tok=4 nc=15 distinct=3
    //   f_ttr=0.75 f_stop=0.75 f_digit=0 f_cpt=3.75
    //   score = -1.5 + 2*0.75 + 6*0.75 - 8*0 - 0.1*3.75 = 4.125 > 0
    // doc 2: "12345 67890"    → n_tok=2 nc=11 distinct=2
    //   f_ttr=1 f_stop=0 f_digit=round(10/11,6)=0.909091 f_cpt=5.5
    //   score = -1.5 + 2 + 0 - 7.272728 - 0.55 = -7.322728 < 0
    val docs = Seq(
      (1L, "s1", "the the of data"),
      (2L, "s1", "12345 67890")
    ).toDF("doc_id", "source", "text")
    val out = Classifier.scoreQualityLogit(docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Long]("n_pass") == 1L)
    assert(r.getAs[Double]("pass_rate") == 0.5)
    // mean = (4.125 + (-7.322728)) / 2 = -1.598864
    assert(math.abs(r.getAs[Double]("mean_score") - (-1.598864)) < 1e-9,
      s"mean_score = ${r.getAs[Double]("mean_score")}")
  }

  test("scoreQualityLogit: empty text contributes intercept-only " +
      "score, no division blowup") {
    import spark.implicits._
    val docs = Seq((1L, "s1", "")).toDF("doc_id", "source", "text")
    val r = Classifier.scoreQualityLogit(docs).collect().head
    assert(r.getAs[Long]("n_pass") == 0L)
    assert(r.getAs[Double]("mean_score") == -1.5)
  }

  test("trainQualityLogit: first gradient step matches the " +
      "hand-computed full-batch gradient at w = 0") {
    import spark.implicits._
    // At w=0 every margin is 0 → p = 0.5, so grad_j = mean((0.5-y)·x_j)
    // and loss = ln 2. Labels: doc1 en (y=1), doc2 de (y=0).
    val docs = Seq(
      (1L, "en", "s1", "the the of data"),
      (2L, "de", "s1", "12345 67890")
    ).toDF("doc_id", "lang", "source", "text")
    val hist = Classifier.trainQualityLogit(docs, iters = 1, lr = 1.0)
      .collect().sortBy(_.getAs[Int]("iter"))
    assert(hist.length == 2)
    val it0 = hist(0)
    assert(math.abs(it0.getAs[Double]("loss") - math.log(2)) < 1e-12)
    assert(it0.getAs[Double]("intercept") == 0.0)
    // features: doc1 (0.75, 0.75, 0, 3.75) y=1; doc2 (1, 0, 0.909091,
    // 5.5) y=0. grad = ((0.5-1)*x1 + (0.5-0)*x2)/2, update = -lr*grad.
    val it1 = hist(1)
    def g(a: Double, b: Double) = -1.0 * ((-0.5 * a) + (0.5 * b)) / 2.0
    assert(math.abs(it1.getAs[Double]("intercept") - g(1, 1)) < 1e-9)
    assert(math.abs(it1.getAs[Double]("w_ttr") - g(0.75, 1.0)) < 1e-9)
    assert(math.abs(it1.getAs[Double]("w_stop") - g(0.75, 0.0)) < 1e-9)
    assert(math.abs(it1.getAs[Double]("w_digit") - g(0.0, 0.909091))
      < 1e-9)
    assert(math.abs(it1.getAs[Double]("w_cpt") - g(3.75, 5.5)) < 1e-9)
  }

  test("trainQualityLogit: loss decreases monotonically and a " +
      "separable corpus reaches accuracy 1") {
    import spark.implicits._
    // Separable on f_digit: "en" docs all-words, "xx" docs all-digits.
    val docs = ((1 to 20).map(i =>
        (i.toLong, "en", "s1", s"the quick word$i of data here")) ++
      (21 to 40).map(i =>
        (i.toLong, "xx", "s1", s"$i ${i * 7} ${i * 13} ${i * 29}")))
      .toDF("doc_id", "lang", "source", "text")
    // lr below the 1/L descent bound for these feature magnitudes
    // (L ≈ mean ||x||² / 4 ≈ 4.2) so monotone decrease is guaranteed
    val hist = Classifier.trainQualityLogit(docs, iters = 80, lr = 0.2)
      .collect().sortBy(_.getAs[Int]("iter"))
    assert(hist.length == 81)
    val losses = hist.map(_.getAs[Double]("loss"))
    losses.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-12, s"loss went up: $a -> $b") }
    assert(hist.last.getAs[Double]("accuracy") == 1.0,
      s"final accuracy = ${hist.last.getAs[Double]("accuracy")}")
    // the separating feature carries negative weight (digits = not-en)
    assert(hist.last.getAs[Double]("w_digit") < 0)
  }

  test("sourceRankStability: hand-built 3-source fixture — one " +
      "quality/volume inversion gives tau = 1/3") {
    import spark.implicits._
    // volumes: sA 2 < sB 6 < sC 9 tokens; mean scores: sA (digit
    // wall) < sC < sB (pure distinct stopwords) — so (B,C) is the
    // only discordant pair: tau = (2-1)/3
    val docs = Seq(
      (1L, "sA", "11111 22222"),
      (2L, "sB", "the of and to in is"),
      (3L, "sC", "the of and to the of and to the")
    ).toDF("doc_id", "source", "text")
    val r = Classifier.sourceRankStability(docs).collect().head
    assert(r.getAs[Long]("n_pairs") == 3L)
    assert(r.getAs[Long]("concordant") == 2L)
    assert(r.getAs[Long]("discordant") == 1L)
    assert(r.getAs[Long]("tied") == 0L)
    assert(math.abs(r.getAs[Double]("tau_a") - 1.0 / 3.0) < 1e-9)
  }

  test("sourceRankStability: equal-volume sources count as tied " +
      "pairs, excluded from tau's numerator") {
    import spark.implicits._
    val docs = Seq(
      (1L, "sA", "one two three"),
      (2L, "sB", "the of and")
    ).toDF("doc_id", "source", "text") // both 3 tokens → volume tie
    val r = Classifier.sourceRankStability(docs).collect().head
    assert(r.getAs[Long]("n_pairs") == 1L)
    assert(r.getAs[Long]("tied") == 1L)
    assert(r.getAs[Double]("tau_a") == 0.0)
  }

  test("qualityPeakCorrelation: two-point labels give corr exactly " +
      "±1; means hand-checked") {
    import spark.implicits._
    // label 0: score order (doc1 low, doc2 high) matches peak order
    // → corr 1; label 1: same scores, peak order inverted → corr −1
    val docs = Seq(
      (1L, "s1", "12345 67890"), (2L, "s1", "the the of data"),
      (3L, "s1", "12345 67890"), (4L, "s1", "the the of data")
    ).toDF("doc_id", "source", "text")
    val emb = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(2f, 0f), 0),
      (3L, Seq(2f, 0f), 1), (4L, Seq(1f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Classifier.qualityPeakCorrelation(docs, emb).collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("corr_quality_peak"),
          r.getAs[Double]("mean_score"),
          r.getAs[Double]("mean_peak")))).toMap
    assert(out(0)._1 == 2L)
    assert(math.abs(out(0)._2 - 1.0) < 1e-12, s"corr ${out(0)._2}")
    assert(math.abs(out(1)._2 + 1.0) < 1e-12, s"corr ${out(1)._2}")
    // mean score = (−7.322728 + 4.125)/2 (the first test's values)
    assert(math.abs(out(0)._3 - (-1.598864)) < 1e-9)
    assert(out(0)._4 == 1.5 && out(1)._4 == 1.5)
  }

  test("trainQualityLogit: runs on the harness documents table and " +
      "improves over the iter-0 baseline") {
    val docs = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "documents")
    val hist = Classifier.trainQualityLogit(docs, iters = 8)
      .collect().sortBy(_.getAs[Int]("iter"))
    assert(hist.length == 9)
    assert(hist.last.getAs[Double]("loss") <
      hist.head.getAs[Double]("loss"))
  }

  test("calibrationReport: hand-built high/low-score pair splits into " +
      "bins with the expected agreement and hand-computed mean") {
    import spark.implicits._
    // docA: 3 stopwords + 27 distinct fillers -> rules pass; score =
    // -1.5 + 2*f_ttr + 6*f_stop - 8*f_digit - 0.1*f_cpt
    //     = -1.5 + 2*1.0 + 6*0.1 - 0 - 0.1*round(116/30, 6)
    //     = 0.7133333
    // docB: a 2-token digit wall -> too_short fails; score ~ -8
    // letter-only 3-char fillers: a digit in a filler would charge
    // f_digit and sink the score
    val docA = ("the a of" +: (1 to 27).map(i =>
      s"x${('a' + (i - 1) / 26).toChar}${('a' + (i - 1) % 26).toChar}"))
      .mkString(" ")
    val docB = "9999 9999"
    val docs = Seq((1L, "s1", docA), (2L, "s1", docB))
      .toDF("doc_id", "source", "text")
    val out = Classifier.calibrationReport(docs, nBins = 2).collect()
      .map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("mean_score"),
          r.getAs[Double]("rule_pass_rate")))).toMap
    assert(out.keySet == Set(1L, 2L))
    val (n1, m1, p1) = out(1L)
    val (n2, m2, p2) = out(2L)
    assert(n1 == 1L && n2 == 1L)
    assert(math.abs(m1 - 0.7133333) < 1e-6, s"bin-1 mean: $m1")
    assert(p1 == 1.0 && p2 == 0.0,
      "the rule gate must agree with the model's ordering here")
    assert(m1 > m2, "bin 1 must hold the higher scores")
  }

  test("calibrationReport: harness corpus — bins partition each " +
      "source near-equally, rates bounded, means non-increasing") {
    val docs = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "documents")
    val rows = Classifier.calibrationReport(docs, nBins = 4).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val byBin = rs.sortBy(_.getAs[Long]("bin"))
      val sizes = byBin.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1, s"$src ntile sizes: $sizes")
      val means = byBin.map(_.getAs[Double]("mean_score"))
      assert(means.zip(means.tail).forall { case (a, b) => a >= b },
        s"$src bin means must not increase: ${means.toSeq}")
      byBin.foreach { r =>
        val rate = r.getAs[Double]("rule_pass_rate")
        assert(rate >= 0.0 && rate <= 1.0)
        assert(r.getAs[Double]("lo_score") <= r.getAs[Double]("hi_score"))
      }
    }
  }
}
