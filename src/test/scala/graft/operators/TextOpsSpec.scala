package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import org.scalactic.Tolerance._

import graft.SparkSuite
import graft.functions.{GraftFunctions, TextFunctions}

/** Goldens for every TextFunctions op + the TextOps query shapes.
  * Golden values are hand-computed (and, for the rolling hash, cross-
  * checked against DuckDB's list_reduce on the same recurrence). */
class TextOpsSpec extends SparkSuite {

  private def one(text: String): DataFrame = {
    import spark.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
  }

  private def evalStr(text: String, c: org.apache.spark.sql.Column): String =
    one(text).select(c.cast("string")).head.getString(0)

  test("tokens / tokenCount drop empty tokens") {
    assert(evalStr("a  b c", TextFunctions.tokenCount(col("text"))) == "3")
    assert(evalStr("", TextFunctions.tokenCount(col("text"))) == "0")
    assert(evalStr("   ", TextFunctions.tokenCount(col("text"))) == "0")
  }

  test("subTokenCount splits on non-alphanumeric runs") {
    assert(evalStr("Hello, world! 42",
      TextFunctions.subTokenCount(col("text"))) == "3")
    assert(evalStr("one-two_three",
      TextFunctions.subTokenCount(col("text"))) == "3")
  }

  test("approxBpeTokenCount is ceil(chars/4)") {
    assert(evalStr("abcdefgh",
      TextFunctions.approxBpeTokenCount(col("text"))) == "2")
    assert(evalStr("abcdefghi",
      TextFunctions.approxBpeTokenCount(col("text"))) == "3")
  }

  test("alphaRatio counts ASCII letters only") {
    assert(evalStr("ab12", TextFunctions.alphaRatio(col("text"))) == "0.5")
    assert(evalStr("", TextFunctions.alphaRatio(col("text"))) == "0.0")
  }

  test("meanTokenLength") {
    assert(evalStr("ab abcd",
      TextFunctions.meanTokenLength(col("text"))) == "3.0")
    assert(evalStr("", TextFunctions.meanTokenLength(col("text"))) == "0.0")
  }

  test("stopwordRatio") {
    assert(evalStr("the cat",
      TextFunctions.stopwordRatio(col("text"), TextOps.DefaultStopwords))
      == "0.5")
  }

  test("langIdHeuristic: en markers, else und") {
    assert(evalStr("The cat sat on a mat",
      TextFunctions.langIdHeuristic(col("text"))) == "en")
    assert(evalStr("xyz qqq zzz",
      TextFunctions.langIdHeuristic(col("text"))) == "und")
    assert(evalStr("", TextFunctions.langIdHeuristic(col("text"))) == "und")
  }

  test("normalized collapses whitespace, trims, lowercases") {
    assert(evalStr("  A  b\t c ", TextFunctions.normalized(col("text")))
      == "a b c")
  }

  test("fingerprint is md5 of the normalized text") {
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("a b c".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(evalStr("  A  b\t c ", TextFunctions.fingerprint(col("text")))
      == expected)
  }

  test("maxTokenRun: longest stutter; empty doc → 0") {
    def run(t: String): String =
      evalStr(t, TextFunctions.maxTokenRun(TextFunctions.tokens(col("text"))))
    assert(run("a b b b c c") == "3")
    assert(run("a b c") == "1")
    assert(run("") == "0")
  }

  test("dupNgramFrac: repeated trigram fraction; short docs → 0") {
    def f(t: String): String =
      evalStr(t, TextFunctions.dupNgramFrac(TextFunctions.tokens(col("text")), 3))
    // "a b c a b c a b c": 7 trigrams, 3 distinct → 1 - 3/7
    assert(f("a b c a b c a b c").toDouble === (1.0 - 3.0 / 7.0) +- 1e-15)
    assert(f("a b c d") == "0.0")
    assert(f("a b") == "0.0")
  }

  test("topBigramFrac: most frequent bigram share; short docs → 0") {
    def f(t: String): String =
      evalStr(t, TextFunctions.topBigramFrac(TextFunctions.tokens(col("text"))))
    // "x y x y z": bigrams (x y),(y x),(x y),(y z) → top 2 of 4
    assert(f("x y x y z") == "0.5")
    assert(f("a") == "0.0")
  }

  test("native DocProfileStats == portable HOF profile on the harness " +
      "corpus and edge cases (all seven q26 columns)") {
    import spark.implicits._
    val edge = Seq("", " ", "a", "The cat", "the a of and", "x1-y2_z3",
      "ABC def 123", "  padded  the  ").zipWithIndex
      .map { case (t, i) => (i.toLong + 1000L, t) }.toDF("doc_id", "text")
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    Seq(edge, corpus).foreach { docs =>
      val native = TextOps.docProfile(docs).collect()
      val hof = docs.select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.subTokenCount(col("text")).as("n_subtokens"),
        TextFunctions.approxBpeTokenCount(col("text")).as("n_bpe_est"),
        TextFunctions.alphaRatio(col("text")).as("alpha_ratio"),
        TextFunctions.meanTokenLength(col("text")).as("mean_token_len"),
        TextFunctions.stopwordRatio(col("text"), TextOps.DefaultStopwords)
          .as("stopword_ratio"),
        TextFunctions.langIdHeuristic(col("text")).as("lang_guess"))
        .orderBy(col("doc_id")).collect()
      assert(native.toSeq == hof.toSeq)
    }
  }

  test("native RepetitionStats == portable HOF metrics on the harness " +
      "corpus and edge cases") {
    import spark.implicits._
    val edge = Seq("", " ", "a", "a a", "a  a a", "x y x y z",
      "a b c a b c a b c").zipWithIndex
      .map { case (t, i) => (i.toLong + 1000L, t) }.toDF("doc_id", "text")
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    Seq(edge, corpus).foreach { docs =>
      val toks = TextFunctions.tokens(col("text"))
      val st = GraftFunctions.repetitionStats(col("text"))
      // guarded fractions exactly as repetitionProfile computes them
      val nativeDup = when(st.getField("n_trigrams") === 0L, lit(0.0))
        .otherwise(lit(1.0) -
          st.getField("n_distinct_trigrams").cast("double") /
            st.getField("n_trigrams"))
      val nativeTop = when(st.getField("n_bigrams") === 0L, lit(0.0))
        .otherwise(st.getField("max_bigram_count").cast("double") /
          st.getField("n_bigrams"))
      val rows = docs.select(
        st.getField("n_trigrams").as("native_ntg"),
        st.getField("max_run").as("native_run"),
        nativeDup.as("native_dup"),
        nativeTop.as("native_top"),
        size(TextFunctions.ngramsWithMultiplicity(toks, 3))
          .cast("long").as("hof_ntg"),
        TextFunctions.maxTokenRun(toks).as("hof_run"),
        TextFunctions.dupNgramFrac(toks, 3).as("hof_dup"),
        TextFunctions.topBigramFrac(toks).as("hof_top")).collect()
      rows.foreach { r =>
        assert(r.getAs[Long]("native_ntg") == r.getAs[Long]("hof_ntg"))
        assert(r.getAs[Long]("native_run") == r.getAs[Long]("hof_run"))
        assert(r.getAs[Double]("native_dup") == r.getAs[Double]("hof_dup"))
        assert(r.getAs[Double]("native_top") == r.getAs[Double]("hof_top"))
      }
    }
  }

  test("repetitionProfile goldens") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b c a b c"), // dup trigrams, top bigram (a b)=3/8
      (2L, "w w w w x")          // max_run 4
    ).toDF("doc_id", "text")
    val r = TextOps.repetitionProfile(docs).collect()
    assert(r(0).getAs[Long]("n_trigrams") == 7L)
    assert(r(0).getAs[Double]("dup_trigram_frac") === (1.0 - 3.0 / 7.0) +- 1e-15)
    assert(r(0).getAs[Double]("top_bigram_frac") == 3.0 / 8.0)
    assert(r(0).getAs[Long]("max_run") == 1L)
    assert(r(1).getAs[Long]("max_run") == 4L)
  }

  test("boilerplateFraction: shared shingles flagged at minDocs") {
    import spark.implicits._
    // "p q r" appears in all 3 docs; each doc also has a private shingle
    val docs = Seq(
      (1L, "p q r s"), (2L, "p q r t"), (3L, "p q r u")
    ).toDF("doc_id", "text")
    val r = TextOps.boilerplateFraction(docs, n = 3, minDocs = 3).collect()
    assert(r.length == 3)
    r.foreach { row =>
      assert(row.getAs[Long]("n_shingles") == 2L)
      assert(row.getAs[Long]("n_boiler") == 1L)
      assert(row.getAs[Double]("boiler_frac") == 0.5)
    }
  }

  test("boilerplateFractionApprox: same shingle universe as exact, " +
      "n_boiler is a superset count (bloom one-sided), equal on the " +
      "harness fixture at default bits") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = TextOps.boilerplateFraction(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_boiler"))).toMap
    val approx = TextOps.boilerplateFractionApprox(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_boiler"))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (id, (nSh, nBoil)) =>
      val (aSh, aBoil) = approx(id)
      assert(aSh == nSh, s"doc $id shingle universe must match")
      assert(aBoil >= nBoil, s"doc $id: bloom must never miss a member")
      // 2^23 bits vs a few thousand members → FP-free on this fixture
      assert(aBoil == nBoil, s"doc $id: expected no false positives")
    }
  }

  test("stripBoilerplateLines: lines shared by >= minDocs docs are " +
      "removed, text rebuilds in original order, short tail lines " +
      "count, an all-boilerplate doc keeps an empty text") {
    import spark.implicits._
    // w=2 lines. "HDR FOOT" is the planted boilerplate (3 docs, each
    // aligned at position 0); every doc also has private content.
    // doc 4 is ONLY boilerplate; doc 5 has an odd-length tail line.
    val docs = Seq(
      (1L, "HDR FOOT alpha beta gamma delta"),
      (2L, "HDR FOOT beta alpha"),
      (3L, "HDR FOOT delta gamma epsilon"),
      (4L, "HDR FOOT"),
      (5L, "zeta eta theta")).toDF("doc_id", "text")
    val out = TextOps.stripBoilerplateLines(docs, w = 2, minDocs = 3)
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("n_lines"),
        r.getAs[Long]("n_removed"), r.getAs[String]("text_clean")))
      .toMap
    assert(out(1L) == ((3L, 1L, "alpha beta gamma delta")))
    assert(out(2L) == ((2L, 1L, "beta alpha")))
    // doc 3's tail "epsilon" is a 1-token line, kept in order
    assert(out(3L) == ((3L, 1L, "delta gamma epsilon")))
    assert(out(4L) == ((1L, 1L, "")), "all-boiler doc must stay, empty")
    assert(out(5L) == ((2L, 0L, "zeta eta theta")),
      "clean doc must round-trip byte-identically")
  }

  test("stripBoilerplateLines: alignment is per-document — the same " +
      "tokens at a different line offset are a DIFFERENT line") {
    import spark.implicits._
    // "p q" aligned in docs 1,2 but doc 3 carries it at offset 1 ->
    // its aligned lines are "x p" / "q y", so df("p q") stays 2 < 3
    val docs = Seq(
      (1L, "p q a b"), (2L, "p q c d"), (3L, "x p q y")
    ).toDF("doc_id", "text")
    val out = TextOps.stripBoilerplateLines(docs, w = 2, minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_removed"))
      .toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L),
      "misaligned repeats must not reach the df threshold")
  }

  test("stripBoilerplateLinesApprox: removal is a superset of exact " +
      "(bloom one-sided), kept text a subsequence; identical on the " +
      "harness fixture at default bits") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = TextOps.stripBoilerplateLines(docs).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_lines"),
        r.getAs[Long]("n_removed"), r.getAs[String]("text_clean")))
      .toMap
    val approx = TextOps.stripBoilerplateLinesApprox(docs).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_lines"),
        r.getAs[Long]("n_removed"), r.getAs[String]("text_clean")))
      .toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (id, (nl, nr, txt)) =>
      val (anl, anr, atxt) = approx(id)
      assert(anl == nl, s"doc $id: line universe must match")
      assert(anr >= nr, s"doc $id: bloom must never under-remove")
      // subsequence: every kept-by-approx line was kept by exact
      val kept = txt.split(' ').filter(_.nonEmpty)
      val akept = atxt.split(' ').filter(_.nonEmpty)
      assert(akept.length <= kept.length &&
        akept.diff(kept).isEmpty,
        s"doc $id: approx text must be a sub-multiset of exact's")
      // 2^23 bits vs a few thousand lines → FP-free on this fixture
      assert((anr, atxt) == ((nr, txt)),
        s"doc $id: expected no false positives at default bits")
    }
  }

  test("qualityGate: each rule family fires independently") {
    import spark.implicits._
    // 40 distinct tokens incl. one stopword: passes every gate
    val pass = ("the" +: (1 to 39).map(i => s"w$i")).mkString(" ")
    // 44 tokens, "the fox" cycle → dup-trigram frac ≫ cap, run of 4
    val rep = ("the fox " * 20).trim + " go go go go"
    // 30 distinct tokens, zero stopwords → fails quality only
    val qual = (1 to 30).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      ("s1", pass),          // passes all gates
      ("s1", "a short one"), // 3 tokens → fails length only
      ("s1", rep),           // fails repetition only
      ("s1", qual)           // fails quality only
    ).toDF("source", "text")
    val r = TextOps.qualityGate(docs).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("n_docs") == 4L)
    assert(row.getAs[Long]("fail_len") == 1L)
    assert(row.getAs[Long]("fail_rep") == 1L)
    assert(row.getAs[Long]("fail_quality") == 1L)
    assert(row.getAs[Long]("n_pass") == 1L)
    assert(row.getAs[Double]("pass_rate") == 0.25)
  }

  test("scrubPii: planted PII redacted with typed tokens; counts are " +
      "per-category on the original text; clean text untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail bob@example.com or alice.smith+x@corp.co.uk please"),
      (2L, "server 10.0.0.1 and 192.168.255.254 up"),
      (3L, "ssn 123-45-6789 on file"),
      (4L, "call +1 (555) 123-4567 or 555-123-4567 today"),
      (5L, "nothing sensitive here at all"),
      (6L, "revenues for 1990 2000 2010 grew")
    ).toDF("doc_id", "text")
    val r = TextOps.scrubPii(docs).collect()
      .map(row => row.getAs[Long]("doc_id") -> row).toMap
    assert(r(1).getAs[Long]("n_emails") == 2L)
    assert(r(1).getAs[String]("clean_text") ==
      "mail [EMAIL] or [EMAIL] please")
    assert(r(2).getAs[Long]("n_ips") == 2L)
    assert(r(2).getAs[String]("clean_text") == "server [IP] and [IP] up")
    assert(r(3).getAs[Long]("n_ids") == 1L)
    // the anchored phone shape (leading + or hyphenated NANP tail) does
    // NOT fire on the 3-2-4 ssn shape — categories stay disjoint here
    assert(r(3).getAs[Long]("n_phones") == 0L)
    assert(r(3).getAs[String]("clean_text") == "ssn [ID] on file")
    assert(r(4).getAs[Long]("n_phones") == 2L)
    assert(r(4).getAs[String]("clean_text") ==
      "call [PHONE] or [PHONE] today")
    assert(r(5).getAs[String]("clean_text") ==
      "nothing sensitive here at all")
    assert(r(5).getAs[Long]("n_emails") +
      r(5).getAs[Long]("n_ips") + r(5).getAs[Long]("n_ids") +
      r(5).getAs[Long]("n_phones") == 0L)
    // plain numeric runs are not phone-shaped — never redacted
    assert(r(6).getAs[Long]("n_phones") == 0L)
    assert(r(6).getAs[String]("clean_text") ==
      "revenues for 1990 2000 2010 grew")
  }

  test("shingles: distinct n-grams; short docs yield empty array") {
    assert(evalStr("a b c d", TextFunctions.shingles(col("text"), 2))
      == "[a b, b c, c d]")
    assert(evalStr("a b", TextFunctions.shingles(col("text"), 3)) == "[]")
    assert(evalStr("a b a b a b", TextFunctions.shingles(col("text"), 2))
      == "[a b, b a]")
  }

  test("rollingHash golden: cross-engine constant for 'hello world'") {
    // DuckDB: list_reduce over unicode codepoints gives 204910434
    assert(evalStr("hello world",
      TextFunctions.rollingHash(col("text"))) == "204910434")
    assert(evalStr("hello world",
      GraftFunctions.rollingHash(spark, col("text"))) == "204910434")
    assert(evalStr("", TextFunctions.rollingHash(col("text"))) == "0")
    assert(evalStr("", GraftFunctions.rollingHash(spark, col("text"))) == "0")
  }

  test("rollingHash: expression tree and native expression agree " +
      "(ASCII + BMP + supplementary planes)") {
    import spark.implicits._
    val samples = Seq("", "a", "hello world", "Hello, World! 123",
      "café naïve", // Latin-1 accents
      "日本語テスト", // CJK (BMP)
      new String(Character.toChars(0x1F600)) + " emoji " +
        new String(Character.toChars(0x1F680)), // supplementary plane
      "mixed é日" + new String(Character.toChars(0x10400)))
    val df = samples.toDF("text")
    val both = df.select(
      TextFunctions.rollingHash(col("text")).as("tree"),
      GraftFunctions.rollingHash(spark, col("text")).as("native")).collect()
    both.zip(samples).foreach { case (r, s) =>
      assert(r.getLong(0) == r.getLong(1),
        s"tree=${r.getLong(0)} native=${r.getLong(1)} for '$s'")
    }
  }

  test("native RollingHash: interpreted eval matches codegen result") {
    import graft.functions.RollingHash
    import org.apache.spark.unsafe.types.UTF8String
    val s = "The quick brown fox é日"
    val interpreted = RollingHash(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(s))).eval(null)
    val viaPlan = evalStr(s, GraftFunctions.rollingHash(spark, col("text")))
    assert(interpreted.toString == viaPlan)
  }

  test("docProfile over a tiny frame: all features in one projection") {
    val out = TextOps.docProfile(one("the cat sat")).collect()(0)
    assert(out.getAs[Long]("n_tokens") == 3L)
    assert(out.getAs[String]("lang_guess") == "en")
    assert(out.getAs[Double]("stopword_ratio") == 1.0 / 3)
  }

  test("tokenFrequency: counts and deterministic tie-break") {
    import spark.implicits._
    val docs = Seq((1L, "b a a"), (2L, "b c")).toDF("doc_id", "text")
    val rows = TextOps.tokenFrequency(docs, 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }

  test("selectWithinTokenBudget: longest-first prefix per source, " +
      "overflow doc excluded, oversized-head source selects nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e", "s1"),   // 5 tokens
      (2L, "a b c", "s1"),       // 3 tokens
      (3L, "a b", "s1"),         // 2 tokens — would overflow budget 9
      (4L, "a b c d e f g h i j k l", "s2"), // 12 > budget: nothing fits
      (5L, "", "s3")             // zero tokens
    ).toDF("doc_id", "text", "source")
    val out = TextOps.selectWithinTokenBudget(docs, 9L).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(3)))
    // s1: 5 then 5+3=8 fit, 8+2=10 > 9 excluded; s2: 12 > 9, prefix
    // empty; s3: the zero-token doc "fits" trivially (cum 0 <= 9)
    assert(out.toSeq == Seq(("s1", 1L, 5L), ("s1", 2L, 8L),
      ("s3", 5L, 0L)))
  }

  test("heavyHitterTokens: exact result under sketch pressure (k much " +
      "smaller than vocab), independent of partitioning") {
    import spark.implicits._
    // skewed corpus: 3 heavy tokens + a 200-word noise vocab, so k=10
    // counters constantly decrement and evict noise
    val noise = (0 until 200).map(i => s"w$i")
    val words = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until 400).foreach(_ => words += "hot1")
    (0 until 300).foreach(_ => words += "hot2")
    (0 until 250).foreach(_ => words += "hot3")
    (0 until 1000).foreach(i => words += noise(i % 200))
    // deterministic shuffle so heavy tokens aren't clustered
    val mixed = words.zipWithIndex
      .sortBy { case (w, i) => (i * 2654435761L) % 1952 }
      .map(_._1)
    val docs = mixed.grouped(13).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")

    // n = 1950; threshold n/k = 195: hot1/hot2/hot3 qualify (400/300/250),
    // every noise word has 5 occurrences
    val expected = Set(("hot1", 400L), ("hot2", 300L), ("hot3", 250L))
    for (parts <- Seq(1, 7, 32)) {
      val got = TextOps.heavyHitterTokens(docs.repartition(parts), k = 10)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expected, s"at $parts partitions: $got")
    }
  }

  test("heavyHittersBySource: per-source thresholds are independent — " +
      "a token heavy in one source is invisible to the others") {
    import spark.implicits._
    // srcA: "hot" is 12/30 tokens (> 30/5); srcB: "hot" appears once in
    // 30 tokens (well under 30/5) while "warm" is 12/30. A global
    // threshold would merge these; per-source must separate them.
    val a = (0 until 6).map(i =>
      (i.toLong, "srcA", "hot hot w" + i + " w" + i + " w" + i))
    val b = (0 until 6).map(i =>
      (10L + i, "srcB",
        (if (i == 0) "hot" else "v" + i) + " warm warm u" + i + " u" + i))
    val docs = (a ++ b).toDF("doc_id", "source", "text")
    for (parts <- Seq(1, 7)) {
      val got = TextOps.heavyHittersBySource(docs.repartition(parts), k = 5)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(got == Set(("srcA", "hot", 12L), ("srcB", "warm", 12L)),
        s"at $parts partitions: $got")
    }
  }

  test("misraGries sketch: candidate list bounded by k and contains " +
      "every true heavy hitter") {
    import spark.implicits._
    val docs = Seq.tabulate(50)(i =>
      (i.toLong, if (i % 2 == 0) "big big big small" + i else "big mid mid"))
      .toDF("doc_id", "text")
    val row = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token"))
      .agg(GraftFunctions.misraGries(col("token"), 5).as("mg"))
      .select(col("mg.n"), col("mg.candidates")).head
    val n = row.getLong(0)
    val cand = row.getSeq[String](1)
    assert(n == 50L * 3 + 25L)
    assert(cand.size <= 5, s"candidate list exceeds k: $cand")
    // big: 100 occurrences, mid: 50 — both > n/5 = 35 → guaranteed
    assert(cand.contains("big") && cand.contains("mid"), cand.toString)
  }

  test("searchByToken / searchByPhrase: membership semantics on " +
      "boundary-adversarial texts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "table scan wins"),          // phrase at start
      (2L, "a full table scan"),        // phrase at end
      (3L, "a table  scan b"),          // multi-space separator still 2 tokens
      (4L, "a table\nscan b"),          // newline is NOT a separator: 1 token
      (5L, "full table scan\n"),        // trailing newline glues to last token
      (6L, "tables scans"),             // substring but not token match
      (7L, "scan table"),               // wrong order
      (8L, "table"), (9L, ""), (10L, "   "),
      (11L, "x table scan"), (12L, "table+scan q")
    ).toDF("doc_id", "text")
      .withColumn("source", lit("s")).withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))

    val phraseIds = TextOps.searchByPhrase(docs, "table scan")
      .collect().map(_.getLong(0)).toSet
    // doc 4: "table\nscan" is ONE token; doc 5: last token is "scan\n" —
    // Java's `$` would falsely admit it, `\z` must not.
    assert(phraseIds == Set(1L, 2L, 3L, 11L))

    val tokenIds = TextOps.searchByToken(docs, "table")
      .collect().map(_.getLong(0)).toSet
    assert(tokenIds == Set(1L, 2L, 3L, 5L, 7L, 8L, 11L))

    // regex form == shingle-membership definition, on every doc
    val viaShingles = docs
      .filter(array_contains(
        TextFunctions.shingles(col("text"), 2), "table scan"))
      .collect().map(_.getLong(0)).toSet
    assert(viaShingles == phraseIds)

    // metacharacters in the phrase are quoted, not interpreted
    val meta = TextOps.searchByPhrase(docs, "table+scan q")
      .collect().map(_.getLong(0)).toSet
    assert(meta == Set(12L))
  }

  test("tfidfTopTerms: rare term outranks frequent term at equal tf; " +
      "scores are the exact linear-idf values; k truncates") {
    import spark.implicits._
    // 3 docs; 'common' appears in all (df=3), 'rare' only in doc 1 (df=1)
    val docs = Seq(
      (1L, "common rare common rare"),
      (2L, "common other"),
      (3L, "common thing")).toDF("doc_id", "text")
    val out = TextOps.tfidfTopTerms(docs, k = 2).collect()
    val d1 = out.filter(_.getAs[Long]("doc_id") == 1L)
    assert(d1.map(_.getAs[String]("token")).toSeq == Seq("rare", "common"))
    // rare: tf=2, df=1, N=3 -> 6.0 ; common: tf=2, df=3 -> 2.0
    assert(d1(0).getAs[Double]("score") == 6.0)
    assert(d1(1).getAs[Double]("score") == 2.0)
    assert(d1(0).getAs[Long]("rank") == 1L)
    // every doc emits at most k rows
    assert(out.groupBy(_.getAs[Long]("doc_id")).values.forall(_.length <= 2))
    // deterministic tie-break: doc 2's two tokens tie on tf=1 only when
    // scores differ by df; 'other' (df=1) must outrank 'common' (df=3)
    val d2 = out.filter(_.getAs[Long]("doc_id") == 2L)
    assert(d2.map(_.getAs[String]("token")).toSeq == Seq("other", "common"))
  }

  test("packSequences: offsets are contiguous per source, pack ids are " +
      "exact integer division, straddling docs span packs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "a b c"),        // 3 tokens, start 0, pack 0
      (2L, "s1", "d e f g"),      // 4 tokens, start 3, packs 0..1 (B=5)
      (3L, "s1", ""),             // 0 tokens: dropped
      (4L, "s1", "h i"),          // 2 tokens, start 7, pack 1
      (5L, "s2", "x y z w v u")   // independent stream: start 0, packs 0..1
    ).map { case (id, src, text) => (id, text, src) }
      .toDF("doc_id", "text", "source")
    val out = TextOps.packSequences(docs, packTokens = 5L).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 4L, 5L))
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Long]("start_offset") == 0L)
    assert(byId(1L).getAs[Long]("pack_first") == 0L)
    assert(byId(1L).getAs[Long]("pack_last") == 0L)
    assert(byId(2L).getAs[Long]("start_offset") == 3L)
    assert(byId(2L).getAs[Long]("pack_first") == 0L)
    assert(byId(2L).getAs[Long]("pack_last") == 1L) // tokens 3..6 straddle
    assert(byId(4L).getAs[Long]("start_offset") == 7L)
    assert(byId(4L).getAs[Long]("pack_first") == 1L)
    assert(byId(5L).getAs[Long]("start_offset") == 0L) // per-source stream
    assert(byId(5L).getAs[Long]("pack_last") == 1L)
    // invariant on the harness table: within a source, start_offset ==
    // previous start + previous n_tokens (stream has no gaps or overlaps)
    val sf = TextOps.packSequences(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), 512L)
      .collect()
    sf.groupBy(_.getAs[String]("source")).values.foreach { rows =>
      val ordered = rows.sortBy(_.getAs[Long]("doc_id"))
      ordered.sliding(2).foreach {
        case Array(p, n) =>
          assert(n.getAs[Long]("start_offset") ==
            p.getAs[Long]("start_offset") + p.getAs[Long]("n_tokens"))
        case _ =>
      }
    }
  }

  /** Driver-side reference BPE over a word-frequency table — the
    * classic algorithm, independently implemented for equivalence. */
  private def refBpe(wordCounts: Seq[(String, Long)],
      n: Int): Seq[(String, String)] = {
    def mergeLR(s: Vector[String], l: String, r: String): Vector[String] = {
      val acc = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        if (i < s.length - 1 && s(i) == l && s(i + 1) == r) {
          acc += (l + r); i += 2
        } else { acc += s(i); i += 1 }
      }
      acc.toVector
    }
    var syms = wordCounts.map { case (w, c) =>
      (w.map(_.toString).toVector, c)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var k = 0
    var dry = false
    while (k < n && !dry) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      syms.foreach { case (s, c) =>
        s.sliding(2).filter(_.size == 2).foreach(p =>
          counts((p(0), p(1))) += c)
      }
      if (counts.isEmpty) dry = true
      else {
        val ((l, r), _) = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        out += ((l, r))
        syms = syms.map { case (s, c) => (mergeLR(s, l, r), c) }
        k += 1
      }
    }
    out.toSeq
  }

  test("bpeTrain == independent reference BPE on the classic fixture; " +
      "bpeSegment reproduces the training end-state per word and " +
      "round-trips the text") {
    import spark.implicits._
    // the BPE-paper fixture: low x5, lower x2, newest x6, widest x3
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = words.grouped(4).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val merges = TextOps.bpeTrain(docs, nMerges = 8)
    val got = merges.orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val expect = refBpe(
      Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 8)
    assert(got == expect, s"merge table diverged: $got vs $expect")
    // first merges must be the textbook ones: (e,s) then (es,t)
    assert(got.take(2) == Seq(("e", "s"), ("es", "t")))
    // segmentation reproduces the training end-state for every word
    val trained = TextOps.bpeTrainSymbols(docs, merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val wordDf = trained.keys.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toSeq.toDF("doc_id", "text")
    val seg = TextOps.bpeSegment(wordDf, merges).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val byId = wordDf.collect().map(r => r.getLong(0) -> r.getString(1))
    byId.foreach { case (id, w) =>
      assert(seg(id) == trained(w),
        s"'$w': segment ${seg(id)} != trained ${trained(w)}")
      assert(seg(id).mkString == w, s"'$w' must round-trip")
    }
  }

  test("bpeTrain maxVocab: capped table that really drops words still " +
      "reproduces the uncapped merge table when the drop mass is below " +
      "every decision margin; the cap bounds what reaches the driver") {
    import spark.implicits._
    // the classic fixture plus 12 SINGLETON junk words ("AB".."WX":
    // uppercase, so they share no symbol pair with the lowercase
    // fixture, and pairwise-disjoint, so each junk pair has count 1).
    // The per-pair truncation condition holds: every dropped word's
    // pair mass (1) is below every winning merge's count (≥3), so the
    // capped table must equal the uncapped one
    val junk = (0 until 12).map(i =>
      "" + ('A' + 2 * i).toChar + ('B' + 2 * i).toChar)
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest") ++ junk
    val docs = words.grouped(4).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val uncapped = TextOps.bpeTrain(docs, nMerges = 8)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    // cap keeps the 4 real words (counts 6,5,3,2) and drops ALL junk
    // (count-1 tail, tie-broken deterministically by word)
    val capped = TextOps.bpeTrain(docs, nMerges = 8, maxVocab = 4)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(capped == uncapped,
      s"cap must not change the merge table here: $capped vs $uncapped")
    // and the capped variant matches the no-junk corpus exactly (the
    // kept set IS the 4 fixture words)
    val clean = words.filterNot(junk.contains)
    val cleanDocs = clean.grouped(4).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val cleanTrained = TextOps.bpeTrain(cleanDocs, nMerges = 8)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(capped == cleanTrained)
  }

  test("bpeFertility: per-source ratios equal the bpeSegment " +
      "composition; a source the merges fit has lower fertility than " +
      "one they never saw") {
    import spark.implicits._
    // srcA repeats the fixture words the merges are trained on; srcB
    // is character-soup the merge table never saw (falls back toward
    // per-character tokens → higher fertility)
    val docs = Seq(
      (0L, "srcA", "low low lower newest"),
      (1L, "srcA", "newest widest low"),
      (2L, "srcB", "zq xv kj pq")
    ).toDF("doc_id", "source", "text")
    val merges = TextOps.bpeTrain(docs, nMerges = 8)
    val out = TextOps.bpeFertility(docs, merges).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    // composition: token totals from bpeSegment, words/chars by hand
    // (srcA: 4+3 words, (3+3+5+6)+(6+6+3)=32 non-space chars;
    //  srcB: 4 words, 8 chars)
    val seg = TextOps.bpeSegment(docs, merges).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val aToks = seg(0L) + seg(1L)
    assert(out("srcA") == ((7L, aToks, aToks.toDouble / 7L,
      32.0 / aToks)))
    assert(out("srcB") == ((4L, seg(2L), seg(2L).toDouble / 4L,
      8.0 / seg(2L))))
    assert(out("srcB")._3 > out("srcA")._3,
      "unseen character-soup must have higher fertility")
  }

  test("bpeSegment == training end-state on harness docs (sf0.001), " +
      "multi-word documents tokenize in order") {
    import spark.implicits._
    val sfDocs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = TextOps.bpeTrain(sfDocs, nMerges = 12)
    assert(merges.count() == 12)
    val trained = TextOps.bpeTrainSymbols(sfDocs, merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val seg = TextOps.bpeSegment(sfDocs, merges)
    val rows = seg.collect()
    assert(rows.length == sfDocs.count())
    // per-document tokens == concatenation of each word's trained
    // segmentation, in document order
    val texts = sfDocs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(50).foreach { r =>
      val docWords = texts(r.getLong(0)).split("\\s+").filter(_.nonEmpty)
      val expect = docWords.flatMap(w => trained(w)).toSeq
      assert(r.getSeq[String](1) == expect,
        s"doc ${r.getLong(0)} tokens diverge from trained segmentation")
    }
  }

  test("bpeTrain launches no per-merge Spark jobs: job count is " +
      "independent of nMerges (the corpus is scanned exactly once and " +
      "the merge loop runs on the driver)") {
    import spark.implicits._
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = words.grouped(4).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text").localCheckpoint()
    val sc = spark.sparkContext
    // the status tracker is listener-fed (async), so poll to a fixpoint
    def jobsInGroup(g: String): Int = {
      var prev = -1
      var cur = sc.statusTracker.getJobIdsForGroup(g).length
      var spins = 0
      while (cur != prev && spins < 50) {
        prev = cur
        Thread.sleep(200)
        cur = sc.statusTracker.getJobIdsForGroup(g).length
        spins += 1
      }
      cur
    }
    def trainJobs(n: Int): Int = {
      val group = s"bpe-train-jobs-$n"
      sc.setJobGroup(group, "bpeTrain job-count pin")
      try TextOps.bpeTrain(docs, nMerges = n).count()
      finally sc.clearJobGroup()
      jobsInGroup(group)
    }
    val j2 = trainJobs(2)
    val j12 = trainJobs(12)
    assert(j2 == j12,
      s"job count must not scale with nMerges: $j2 jobs at 2 merges " +
        s"vs $j12 at 12 — the merge loop is launching cluster work")
  }

  test("BPE train/segment agree on supplementary-plane text: symbols " +
      "are code points on both paths, rules never split a surrogate " +
      "pair, segmentation round-trips") {
    import spark.implicits._
    val emoji = "😀" // U+1F600, a surrogate pair in UTF-16
    val word = emoji + "ab"
    val docs = Seq((0L, s"$word $word $emoji$emoji"))
      .toDF("doc_id", "text")
    val merges = TextOps.bpeTrain(docs, nMerges = 3)
    val rules = merges.orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // every learned symbol is a well-formed string: surrogates only in
    // matched pairs (a code-unit symbolizer would learn lone halves)
    rules.foreach { case (l, r) =>
      Seq(l, r).foreach { s =>
        var i = 0
        while (i < s.length) {
          val ch = s.charAt(i)
          if (Character.isHighSurrogate(ch)) {
            assert(i + 1 < s.length &&
              Character.isLowSurrogate(s.charAt(i + 1)),
              s"unpaired high surrogate in learned symbol '$s'")
            i += 2
          } else {
            assert(!Character.isLowSurrogate(ch),
              s"unpaired low surrogate in learned symbol '$s'")
            i += 1
          }
        }
      }
    }
    // the frequency-2 pairs merge before the frequency-1 emoji pair,
    // and the emoji participates in a merge as a WHOLE code point
    assert(rules.head == (("a", "b")))
    assert(rules.contains((emoji, "ab")))
    // segmentation reproduces the training end-state (the cross-path
    // consistency a code-unit segmenter breaks on non-BMP input) and
    // round-trips the text
    val trained = TextOps.bpeTrainSymbols(docs, merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val seg = TextOps.bpeSegment(docs, merges).collect().head
      .getSeq[String](1)
    assert(seg == trained(word) ++ trained(word) ++ trained(emoji + emoji))
    assert(seg.mkString == word + word + emoji + emoji)
  }

  test("exactSubstrProfile: planted duplicate spans are found, " +
      "overlapping spans merge (coverage never double-counts), and " +
      "unique/short docs report zero") {
    import spark.implicits._
    // doc 0 and 1 share the 5-token span "a b c d e"; doc 2 contains
    // it TWICE with a 2-token overlap shift (positions 1 and 4 share
    // tokens); doc 3 is all-unique; doc 4 is too short for any 5-gram
    val docs = Seq(
      (0L, "a b c d e x1 y1 z1 w1 v1"),
      (1L, "p1 q1 a b c d e r1 s1"),
      (2L, "a b c a b c d e f g"),
      (3L, "u1 u2 u3 u4 u5 u6 u7"),
      (4L, "t1 t2 t3")).toDF("doc_id", "text")
    val got = TextOps.exactSubstrProfile(docs, n = 5, minCount = 2L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // doc 0: span at pos 1 → 5 of 10 tokens covered
    assert(got(0L) == ((10L, 1L, 5L, 0.5)))
    // doc 1: span at pos 3 → 5 of 9 tokens
    assert(got(1L) == ((9L, 1L, 5L, 5.0 / 9.0)))
    // doc 2: "a b c d e" at pos 4; also "b c d e f"/"c d e f g"? those
    // occur once each — only grams with corpus count >= 2 count.
    // Additionally "a b c ..." 5-grams starting at pos 1: "a b c a b"
    // occurs once. So coverage = 5 tokens from pos 4.
    assert(got(2L) == ((10L, 1L, 5L, 0.5)))
    assert(got(3L) == ((7L, 0L, 0L, 0.0)))
    assert(got(4L) == ((3L, 0L, 0L, 0.0)))
    // overlap merge: two copies of the same 6-token run in one doc —
    // adjacent duplicated 5-grams (pos 1, 2) must merge to 6 covered
    // tokens, not 10
    val overlap = Seq(
      (0L, "m n o p q r"),
      (1L, "m n o p q r")).toDF("doc_id", "text")
    val o = TextOps.exactSubstrProfile(overlap, n = 5, minCount = 2L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(o(0L) == ((2L, 6L)) && o(1L) == ((2L, 6L)),
      s"overlapping spans must merge: $o")
  }

  test("exactSubstrProfileApprox == exactSubstrProfile row-for-row on " +
      "the planted fixture and the harness corpus (64-bit gram hashes " +
      "are collision-free at this size)") {
    import spark.implicits._
    val planted = Seq(
      (0L, "a b c d e x1 y1 z1 w1 v1"),
      (1L, "p1 q1 a b c d e r1 s1"),
      (2L, "a b c a b c d e f g"),
      (3L, "u1 u2 u3 u4 u5 u6 u7"),
      (4L, "t1 t2 t3")).toDF("doc_id", "text")
    val sfDocs =
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Seq(planted, sfDocs).foreach { docs =>
      val exact = TextOps.exactSubstrProfile(docs, n = 5, minCount = 2L)
        .collect().toSeq
      val hashed = TextOps.exactSubstrProfileApprox(docs, n = 5,
        minCount = 2L).collect().toSeq
      assert(hashed == exact,
        "hashed-gram profile must equal the exact profile")
    }
  }

  test("sampleMixture: rate 0 excludes, 100 keeps all, buckets match " +
      "the split hash, and the sample is partitioning-independent") {
    val sfDocs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rates = Map("src0" -> 100, "src1" -> 0)
    val out = TextOps.sampleMixture(spark, sfDocs, rates, defaultPct = 40)
      .collect()
    val bySrc = out.groupBy(_.getAs[String]("source"))
    val counts = sfDocs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate 100: every src0 doc kept; rate 0: no src1 doc survives
    assert(bySrc.get("src0").map(_.length.toLong) == counts.get("src0"))
    assert(!bySrc.contains("src1"))
    // default rate applies to unlisted sources, roughly proportionally
    // (deterministic hash, not random — just sanity-bound it)
    val src2Kept = bySrc.get("src2").map(_.length).getOrElse(0)
    assert(src2Kept > 0 && src2Kept < counts("src2"))
    // every kept row's bucket really is < its source's rate
    out.foreach { r =>
      val rate = rates.getOrElse(r.getAs[String]("source"), 40)
      assert(r.getAs[Long]("bucket") < rate)
    }
    // deterministic under repartitioning (content hash, not position)
    val re = TextOps.sampleMixture(spark, sfDocs.repartition(13), rates, 40)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(re.toSeq == out.map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSeq)
  }

  test("packSequencesSharded: one giant shard reproduces packSequences " +
      "exactly; small shards keep global pack ids disjoint and " +
      "monotone, with deterministic shard-boundary padding") {
    val sfDocs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // degenerate sharding (every doc_id in shard 0) must equal the
    // unsharded operator column-for-column — the padding-free base case
    val unsharded = TextOps.packSequences(sfDocs, 64L).collect().toSeq
    val one = TextOps.packSequencesSharded(sfDocs, 64L,
      shardDocs = 1000000L).drop("shard").collect().toSeq
    assert(one == unsharded)
    // real sharding: within a source, shard s's packs end strictly
    // before shard s+1's begin (fresh pack per shard), and pack_base
    // follows the ceil prefix sum exactly
    val sharded = TextOps.packSequencesSharded(sfDocs, 64L, shardDocs = 7L)
      .collect()
    sharded.groupBy(_.getAs[String]("source")).values.foreach { rows =>
      val byShard = rows.groupBy(_.getAs[Long]("shard")).toSeq.sortBy(_._1)
      byShard.sliding(2).foreach {
        case Seq((_, a), (_, b)) =>
          val aMax = a.map(_.getAs[Long]("pack_last")).max
          val bMin = b.map(_.getAs[Long]("pack_first")).min
          assert(aMax < bMin,
            s"shard packs must be disjoint: $aMax !< $bMin")
          // fresh pack per shard: the next shard's first pack is exactly
          // the prior base + ceil(shard tokens / packTokens)
          val aTokens = a.map(_.getAs[Long]("n_tokens")).sum
          val aBase = a.map(_.getAs[Long]("pack_first")).min
          assert(bMin == aBase + (aTokens + 63L) / 64L)
        case _ =>
      }
      // shard-local offsets remain gap-free in doc_id order
      byShard.foreach { case (_, rows) =>
        rows.sortBy(_.getAs[Long]("doc_id")).sliding(2).foreach {
          case Array(p, n) =>
            assert(n.getAs[Long]("start_offset") ==
              p.getAs[Long]("start_offset") + p.getAs[Long]("n_tokens"))
          case _ =>
        }
      }
    }
    // deterministic across input partitionings (the q66 contract)
    val repart = TextOps.packSequencesSharded(sfDocs.repartition(13), 64L,
      shardDocs = 7L).collect()
    assert(sharded.toSeq == repart.toSeq)
  }

  test("bigramFluency: hand-computed conditional probabilities, " +
      "in-order fold, short docs excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"), // bigrams: ab ba ab
      (2L, "a b c"),   // bigrams: ab bc
      (3L, "solo"),    // no bigrams -> excluded
      (4L, "")).toDF("doc_id", "text")
    // corpus: c(ab)=3 c(ba)=1 c(bc)=1 ; prefix: c(a.)=3 c(b.)=2
    // p(ab)=1.0 p(ba)=0.5 p(bc)=0.5
    val out = TextOps.bigramFluency(docs).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Long]("n_bigrams") == 3L)
    assert(byId(1L).getAs[Double]("mean_bigram_p") == (1.0 + 0.5 + 1.0) / 3)
    assert(byId(1L).getAs[Double]("min_p") == 0.5)
    assert(byId(2L).getAs[Long]("n_bigrams") == 2L)
    assert(byId(2L).getAs[Double]("mean_bigram_p") == (1.0 + 0.5) / 2)
    // repeated-bigram multiplicity counts (shingle-set semantics would
    // have given c(ab)=2): a fluent stutter scores HIGH, which is why
    // collapseTokenRuns runs before this in a curation pipeline
    assert(byId(1L).getAs[Double]("mean_bigram_p") > 0.8)
  }

  test("collapseTokenRuns: runs collapse to their first token, " +
      "non-adjacent repeats survive, counts reconcile") {
    import spark.implicits._
    val docs = Seq(
      (1L, "batch batch batch stream batch"),
      (2L, "a a a a a a"),
      (3L, "no repeats here"),
      (4L, "")).toDF("doc_id", "text")
    val out = TextOps.collapseTokenRuns(docs).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // adjacent run collapses; the later non-adjacent 'batch' survives
    assert(byId(1L).getAs[String]("clean_text") == "batch stream batch")
    assert(byId(1L).getAs[Long]("n_collapsed") == 2L)
    assert(byId(2L).getAs[String]("clean_text") == "a")
    assert(byId(2L).getAs[Long]("n_tokens") == 1L)
    assert(byId(3L).getAs[String]("clean_text") == "no repeats here")
    assert(byId(3L).getAs[Long]("n_collapsed") == 0L)
    assert(byId(4L).getAs[String]("clean_text") == "")
    assert(byId(4L).getAs[Long]("n_tokens") == 0L)
    // idempotence: collapsing a collapsed corpus changes nothing
    val once = TextOps.collapseTokenRuns(docs)
      .select(col("doc_id"), col("clean_text").as("text"))
    val twice = TextOps.collapseTokenRuns(once).collect()
    twice.foreach { r =>
      assert(r.getAs[Long]("n_collapsed") == 0L,
        s"doc ${r.getAs[Long]("doc_id")} changed on second pass")
    }
  }

  test("native CollapseRuns == the tokens/indexed-filter Column tree " +
      "on adversarial and random inputs (incl. interpreted eval)") {
    import spark.implicits._
    // deterministic generator over a space-heavy alphabet: runs, multi-
    // space gaps, leading/trailing spaces, non-space whitespace inside
    // tokens (NOT a separator), supplementary-plane chars
    val rnd = new scala.util.Random(0xc0115eedL)
    val atoms = Seq("a", "b", "ab", "a\nb", "𝔘𝔫", "x")
    val gen = (0 until 300).map { i =>
      val parts = Seq.fill(rnd.nextInt(12))(
        if (rnd.nextBoolean()) atoms(rnd.nextInt(atoms.length))
        else " " * (1 + rnd.nextInt(3)))
      (i.toLong, parts.mkString(rnd.nextInt(3) match {
        case 0 => "" case 1 => " " case _ => "  "
      }))
    }
    val edge = Seq((1000L, ""), (1001L, "   "), (1002L, "a"),
      (1003L, "a a"), (1004L, " a  a a "), (1005L, "aa a"))
    val docs = (gen ++ edge).toDF("doc_id", "text")
    val toks = TextFunctions.tokens(col("text"))
    val kept = filter(toks, (t, i) =>
      (i === 0) || not(t <=> try_element_at(toks, i)))
    val viaTree = docs.select(col("doc_id"),
      array_join(kept, " ").as("clean_text"),
      size(toks).cast("long").as("n_tokens_raw"),
      size(kept).cast("long").as("n_tokens"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val viaNative = TextOps.collapseTokenRuns(docs)
      .select(col("doc_id"), col("clean_text"), col("n_tokens_raw"),
        col("n_tokens"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(viaNative == viaTree)
    // interpreted path (eval without codegen) agrees too
    val cr = graft.functions.CollapseRuns(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(" a  a b b ")))
    val row = cr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(row.getUTF8String(0).toString == "a b")
    assert(row.getLong(1) == 4L && row.getLong(2) == 2L)
  }

  test("vocabularyGrowth: a shingle counts only at its first doc per " +
      "source; buckets partition by doc_id; cumulative sums per source") {
    import spark.implicits._
    // bucketDocs = 2 → docs {0,1} bucket 0, {2,3} bucket 1.
    // srcA doc0 introduces [a b c]; doc2 repeats it (no new shingle)
    // and introduces [b c d]. srcB doc1 independently introduces
    // [a b c] — per-source novelty, not global.
    val docs = Seq(
      (0L, "srcA", "a b c"),
      (2L, "srcA", "a b c d"),
      (1L, "srcB", "a b c"),
      (3L, "srcB", "a b c")
    ).toDF("doc_id", "source", "text")
    for (parts <- Seq(1, 5)) {
      val got = TextOps.vocabularyGrowth(docs.repartition(parts),
        n = 3, bucketDocs = 2L).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(got == Seq(
        ("srcA", 0L, 1L, 1L), ("srcA", 1L, 1L, 2L),
        ("srcB", 0L, 1L, 1L)),
        s"at $parts partitions: $got")
    }
  }

  test("vocabularyGrowth: docs shorter than n contribute nothing") {
    import spark.implicits._
    val docs = Seq((0L, "s", "a b"), (1L, "s", "")).toDF(
      "doc_id", "source", "text")
    assert(TextOps.vocabularyGrowth(docs, n = 3, bucketDocs = 10L)
      .count() == 0L)
  }

  test("normalizeText: NFC composition, control-char strip, whitespace " +
      "collapse, trim; canonical text unchanged") {
    import spark.implicits._
    val decomposed = "café"          // e + combining acute
    val composed = "café"             // precomposed é
    val docs = Seq(
      (1L, decomposed),
      (2L, composed),
      (3L, "a\tb\r\nc"),                   // tabs/newlines → single spaces
      (4L, "  lead  mid gap trail  "),
      (5L, "already canonical"),
      (6L, "")
    ).toDF("doc_id", "text")
    val out = TextOps.normalizeText(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(out(1L) == (composed, true),
      "decomposed sequence composes to NFC and flags changed")
    assert(out(2L) == (composed, false))
    assert(out(3L) == ("a b c", true))
    assert(out(4L) == ("lead mid gap trail", true))
    assert(out(5L) == ("already canonical", false))
    assert(out(6L) == ("", false))
  }

  test("stripMarkup: tags strip before entities decode; &amp; decodes " +
      "last (double-escape survives one level); tag count on original") {
    import spark.implicits._
    val docs = Seq(
      (1L, "<p>Hello <b>world</b></p>"),
      (2L, "a &amp;lt; b"),               // double-escaped: one level only
      (3L, "x &lt;tag&gt; y"),            // escaped markup is CONTENT
      (4L, "A&nbsp;B &#39;q&#39; &quot;r&quot;"),
      (5L, "spread < real > keeps loose angle brackets"),
      (6L, "no markup here")
    ).toDF("doc_id", "text")
    val out = TextOps.stripMarkup(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) == (4L, "Hello world"))
    assert(out(2L) == (0L, "a &lt; b"))
    assert(out(3L) == (0L, "x <tag> y"))
    assert(out(4L) == (0L, "A B 'q' \"r\""))
    // "< real >" IS tag-shaped ("<[^>]*>" matches "< real >"):
    assert(out(5L) == (1L, "spread keeps loose angle brackets"))
    assert(out(6L) == (0L, "no markup here"))
  }

  test("luhn card scrub: checksum decides; grouped forms redact as one " +
      "unit; near-miss lengths and failed checksums stay verbatim") {
    import spark.implicits._
    val docs = Seq(
      (1L, "pay 4111111111111111 now"),        // 16-digit valid
      (2L, "pay 4111 1111 1111 1111 now"),     // space-grouped valid
      (3L, "pay 4111-1111-1111-1111 now"),     // dash-grouped valid
      (4L, "pay 4222222222222 now"),           // 13-digit valid
      (5L, "amex 371449635398431 ok"),         // 15-digit valid
      (6L, "id 4111111111111112 fails luhn"),  // checksum fails → kept
      (7L, "order 123456789012 is short"),     // 12 digits → kept
      (8L, "ts 12345678901234567890 too long"),// 20 digits → kept
      (9L, "call 555-123-4567 re 4111111111111111"), // phone + card
      (10L, "no digits at all")
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
      GraftFunctions.luhnScrub(col("text")).as("s"))
      .select(col("doc_id"), col("s.clean"), col("s.n_cards")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("pay [CARD] now", 1L))
    assert(out(2L) == ("pay [CARD] now", 1L))
    assert(out(3L) == ("pay [CARD] now", 1L))
    assert(out(4L) == ("pay [CARD] now", 1L))
    assert(out(5L) == ("amex [CARD] ok", 1L))
    assert(out(6L) == ("id 4111111111111112 fails luhn", 0L))
    assert(out(7L) == ("order 123456789012 is short", 0L))
    assert(out(8L) == ("ts 12345678901234567890 too long", 0L))
    assert(out(9L) == ("call 555-123-4567 re [CARD]", 1L))
    assert(out(10L) == ("no digits at all", 0L))
  }

  test("scrubPiiAll: cards redact before the regex chain; the regex " +
      "chain alone is card-blind (the gap this closes); other " +
      "categories match scrubPii") {
    import spark.implicits._
    val docs = Seq(
      // A grouped card: the phone regex alone would eat its middle.
      (1L, "card 4111 1111 1111 1111 mail a@b.co ip 10.0.0.1 " +
        "ssn 123-45-6789 tel 555-123-4567"),
      (2L, "clean document")
    ).toDF("doc_id", "text")
    val out = TextOps.scrubPiiAll(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)), r.getString(6))).toMap
    assert(out(1L)._1 == ((1L, 1L, 1L, 1L, 1L)))
    assert(out(1L)._2 ==
      "card [CARD] mail [EMAIL] ip [IP] ssn [ID] tel [PHONE]")
    assert(out(2L) == (((0L, 0L, 0L, 0L, 0L)), "clean document"))
    // Premise: the regex chain alone is card-blind — the grouped card
    // passes through scrubPii verbatim (that is the detection gap
    // scrubPiiAll closes with the Luhn scan):
    val regexOnly = TextOps.scrubPii(docs).collect()
      .filter(_.getLong(0) == 1L).head.getString(5)
    assert(regexOnly.contains("4111 1111 1111 1111"),
      s"premise check: regex chain alone leaves the card: $regexOnly")
  }

  test("rankedSearch: summed undamped TF-IDF ranks hand corpus; " +
      "non-matching docs absent; k truncates") {
    import spark.implicits._
    val docs = Seq(
      (1L, "merge merge scan"),   // 2·(3/2) + 1·(3/1) = 6.0
      (2L, "merge"),              // 1·(3/2) = 1.5
      (3L, "window nothing")      // 1·(3/1) = 3.0
    ).toDF("doc_id", "text")
    val out = TextOps.rankedSearch(docs,
      Seq("merge", "scan", "window"), k = 2).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_terms"),
        r.getAs[Double]("score")))
    assert(out.toSeq == Seq((1L, 2L, 6.0), (3L, 1L, 3.0)),
      s"got ${out.mkString(", ")}")
  }

  test("rankFusion: RRF fuses the TF-IDF and raw-tf pools — rankers " +
      "disagree, reciprocal sums decide, ties break by doc_id, " +
      "no-term docs absent") {
    import spark.implicits._
    // df: merge 1 (rare), scan 3 (common). TF-IDF ranks d1 first
    // (2·5/1 = 10 vs d2's 4·5/3 ≈ 6.67); raw tf ranks d2 first (4 vs
    // 2) — so the two rankers invert, d1/d2 get mirrored (1,2)/(2,1)
    // ranks, identical RRF sums, and doc_id breaks the tie.
    val docs = Seq(
      (1L, "merge merge"),
      (2L, "scan scan scan scan"),
      (3L, "scan"),
      (4L, "scan"),
      (5L, "the")
    ).toDF("doc_id", "text")
    val out = TextOps.rankFusion(docs, Seq("merge", "scan", "window"),
      poolK = 50, k = 3).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L))
    val rrf = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Double]("rrf")).toMap
    assert(rrf(1L) == rrf(2L), "mirrored ranks, identical fusion score")
    def exp(r1: Int, r2: Int): Double =
      BigDecimal(1.0 / (60 + r1) + 1.0 / (60 + r2))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rrf(1L) == exp(1, 2))
    assert(rrf(3L) == exp(3, 3))
    assert(out.map(r => (r.getAs[Long]("rank_tfidf"),
      r.getAs[Long]("rank_tf"))).toSeq ==
      Seq((1L, 2L), (2L, 1L), (3L, 3L)))
  }

  test("tokenPmi: hand-computable PMI on a fixed bigram profile") {
    import spark.implicits._
    // "a b a b a b": bigrams ab×3, ba×2 (B=5); unigrams a×3, b×3 (T=6)
    val docs = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val out = TextOps.tokenPmi(docs, minCount = 1).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getAs[Long]("n_ab"), r.getAs[Double]("pmi")))).toMap
    def pmi(nab: Double): Double =
      BigDecimal(math.log((nab / 5.0) / ((3.0 / 6.0) * (3.0 / 6.0))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("a", "b")) == ((3L, pmi(3.0))))
    assert(out(("b", "a")) == ((2L, pmi(2.0))))
    assert(out.size == 2)
  }

  test("zipfSlope: hand-computable least squares on a fixed frequency " +
      "profile; natural-ish harness sources fit a negative slope") {
    import spark.implicits._
    // freqs a:4 b:2 c:1 → ranks 1,2,3; slope of ln(freq) on ln(rank)
    val docs = Seq((1L, "a a a a b b c", "s0"))
      .toDF("doc_id", "text", "source")
    val out = TextOps.zipfSlope(docs).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("vocab_size") == 3L)
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(4.0, 2.0, 1.0).map(math.log)
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val expected = BigDecimal((3 * sxy - sx * sy) / (3 * sxx - sx * sx))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head.getAs[Double]("zipf_slope") == expected)
    // harness corpus: every source's fitted slope is negative (token
    // frequencies decay in rank) with a sane magnitude
    val sf = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    TextOps.zipfSlope(sf).collect().foreach { r =>
      val s = r.getAs[Double]("zipf_slope")
      assert(s < 0.0 && s > -5.0, s"source ${r.getString(0)}: slope $s")
    }
  }

  test("unigramLogProb: hand-computed add-one-smoothed scores on a " +
      "3-token corpus; rare-token doc scores strictly lower") {
    import spark.implicits._
    // counts: a=2, b=2, c=1; N=5, V=3 → p(a)=p(b)=3/8, p(c)=2/8
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    def lp(num: Long, den: Long): BigDecimal =
      BigDecimal(math.log10(num.toDouble / den.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val lpA = lp(3, 8); val lpC = lp(2, 8)
    val out = TextOps.unigramLogProb(docs).collect()
    assert(out.length == 2)
    val d1 = out(0); val d2 = out(1)
    assert(d1.getAs[Long]("doc_id") == 1L && d1.getAs[Long]("n_tokens") == 3L)
    // expected values follow the engine's exact fp sequence:
    // decimal sum → cast double → IEEE divide by the double count
    assert(d1.getAs[Double]("avg_logp10") == (lpA * 3).toDouble / 3.0)
    assert(d1.getAs[Double]("min_logp10") == lpA.toDouble)
    assert(d2.getAs[Long]("n_tokens") == 2L)
    assert(d2.getAs[Double]("avg_logp10") == (lpA + lpC).toDouble / 2.0)
    assert(d2.getAs[Double]("min_logp10") == lpC.toDouble)
    // the rare-token doc is the lower-quality one under the LM proxy
    assert(d2.getAs[Double]("avg_logp10") < d1.getAs[Double]("avg_logp10"))
  }

  test("tokenBurstiness: bursty token scores VMR 0.5, evenly spread " +
      "token scores 0, sub-minDf tokens are excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x x rare"), (2L, "x"), (3L, "y y"), (4L, "y y")
    ).toDF("doc_id", "text")
    val out = TextOps.tokenBurstiness(docs, minDf = 2).collect()
      .map(r => (r.getString(0), r.getAs[Long]("df"),
        r.getAs[Long]("n_occurrences"), r.getAs[Double]("burstiness")))
      .toSeq
    // x: counts (3,1) → VMR = (2·10 − 16)/(2·4) = 0.5
    // y: counts (2,2) → VMR = (2·8 − 16)/(2·4) = 0
    assert(out == Seq(("x", 2L, 4L, 0.5), ("y", 2L, 4L, 0.0)))
  }

  test("langMismatchAudit: marker docs agree with 'en', markerless 'en' " +
      "docs mismatch, non-en labels always mismatch under the heuristic") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick fox", "en"),   // marker → pred en, agree
      (2L, "quick brown fox", "en"), // no marker → pred und, mismatch
      (3L, "der schnelle fuchs", "de") // pred und ≠ de → mismatch
    ).toDF("doc_id", "text", "lang")
    val out = TextOps.langMismatchAudit(docs).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_agree"), r.getAs[Double]("mismatch_rate"))).toSeq
    assert(out == Seq(("de", 1L, 0L, 1.0), ("en", 2L, 1L, 0.5)))
  }

  test("oovRateBySource: top-K vocabulary by count with token " +
      "tie-break; per-source OOV mass exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b c", "s1"),  // a:3 b:1 c:1 here
      (2L, "a a b b", "s2")     // corpus: a:5 b:3 c:1 → vocab {a,b}
    ).toDF("doc_id", "text", "source")
    val out = TextOps.oovRateBySource(docs, vocabK = 2).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_oov"), r.getAs[Double]("oov_rate"))).toSeq
    assert(out == Seq(("s1", 5L, 1L, 0.2), ("s2", 4L, 0L, 0.0)))
  }

  test("sourceDivergence: hand-computed smoothed-KL goldens over a " +
      "two-token vocabulary, realized vocab size in the smoothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b", "s1"),   // s1 counts: a=2 b=1
      (2L, "a b b b", "s2")  // s2 counts: a=1 b=3 → corpus a=3 b=4
    ).toDF("doc_id", "text", "source")
    // vocabK = 10 but only 2 realized tokens → V = 2 in the smoothing
    def term(cs: Long, ns: Long, c: Long): Double = {
      val psV = (cs + 1).toDouble / (ns + 2).toDouble
      val pcV = c.toDouble / 7.0
      BigDecimal(psV * math.log10(psV / pcV))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expS1 = term(2, 3, 3) + term(1, 3, 4)
    val expS2 = term(1, 4, 3) + term(3, 4, 4)
    val out = TextOps.sourceDivergence(docs, vocabK = 10).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_vocab_tokens"),
        r.getAs[Double]("kl_from_corpus"))).toSeq
    assert(out.map(t => (t._1, t._2)) == Seq(("s1", 3L), ("s2", 4L)))
    assert(math.abs(out(0)._3 - expS1) < 1e-12, s"${out(0)._3} vs $expS1")
    assert(math.abs(out(1)._3 - expS2) < 1e-12, s"${out(1)._3} vs $expS2")
    // a source mirroring the corpus mix diverges less than a skewed one
    assert(expS1 > 0 || expS2 > 0)
  }

  test("compressionProfile: repetitive source compresses far below the " +
      "high-entropy source, flag counts exact, ratios deterministic") {
    import spark.implicits._
    val rep = Array.fill(300)("spamspam").mkString(" ")
    val varied = (1 to 300)
      .map(i => java.lang.Long.toHexString(i * 2654435761L)).mkString(" ")
    val docs = Seq(
      (1L, rep, "rep"), (2L, varied, "var"), (3L, "", "var")
    ).toDF("doc_id", "text", "source")
    val out = TextOps.compressionProfile(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    // empty doc filtered: var still has exactly one measured doc
    assert(out("rep").getAs[Long]("n_docs") == 1L)
    assert(out("var").getAs[Long]("n_docs") == 1L)
    val repRatio = out("rep").getAs[Double]("avg_ratio")
    val varRatio = out("var").getAs[Double]("avg_ratio")
    assert(repRatio < 0.1, s"repetitive ratio $repRatio")
    assert(varRatio > 0.3, s"high-entropy ratio $varRatio")
    assert(repRatio > 0 && varRatio < 1.5)
    assert(out("rep").getAs[Long]("n_high_redundancy") == 1L)
    assert(out("var").getAs[Long]("n_high_redundancy") == 0L)
    // zlib output is deterministic for fixed input/level: re-run equal
    val again = TextOps.compressionProfile(docs).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("avg_ratio")).toMap
    assert(again("rep") == repRatio && again("var") == varRatio)
  }

  test("ksDriftBySource: hand-computed two-sample KS statistic and " +
      "smallest-length argmax") {
    import spark.implicits._
    // A lengths [1,1,3], B [5]; corpus CDF 1->.5, 3->.75, 5->1
    // F_A: 2/3, 1, 1 -> diffs 1/6, .25, 0 -> KS .25 at len 3
    // F_B: 0, 0, 1  -> diffs .5, .75, 0 -> KS .75 at len 3
    val docs = Seq(("A", "a"), ("A", "a"), ("A", "abc"), ("B", "abcde"))
      .toDF("source", "text")
    val out = TextOps.ksDriftBySource(docs).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_docs"),
        r.getAs[Double]("ks_stat"), r.getAs[Long]("at_len"))).toSeq
    assert(out == Seq(("A", 3L, 0.25, 3L), ("B", 1L, 0.75, 3L)),
      s"got $out")
  }

  test("ksDriftBySource: identical distributions give KS 0 per source") {
    import spark.implicits._
    val docs = Seq(("A", "ab"), ("A", "abcd"), ("B", "xy"), ("B", "wxyz"))
      .toDF("source", "text")
    val ks = TextOps.ksDriftBySource(docs).collect()
      .map(_.getAs[Double]("ks_stat")).toSeq
    assert(ks == Seq(0.0, 0.0), s"got $ks")
  }

  test("psiDriftBySource: single source IS the corpus -> psi exactly 0; " +
      "two disjoint length populations -> symmetric, drifted psi") {
    import spark.implicits._
    val solo = Seq(("A", "a"), ("A", "abc"), ("A", "abcde"))
      .toDF("source", "text")
    val s = TextOps.psiDriftBySource(solo).collect()
    assert(s.length == 1 && s.head.getAs[Double]("psi") == 0.0 &&
      s.head.getAs[Long]("n_docs") == 3L)
    // A all len 1, B all len 2: by symmetry psi_A == psi_B, and the
    // total separation must land far past the 0.25 "drifted" alarm
    val split = (Seq.fill(5)(("A", "a")) ++ Seq.fill(5)(("B", "ab")))
      .toDF("source", "text")
    val out = TextOps.psiDriftBySource(split).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("psi")).toMap
    assert(out("A") == out("B"), s"symmetry: $out")
    assert(out("A") > 0.25, s"disjoint populations must alarm: $out")
  }
  test("lexicalRichness: hand-computed TTR and hapax fraction") {
    import spark.implicits._
    val docs = Seq((1L, "a", "a b a"), (2L, "a", "b c"))
      .toDF("doc_id", "source", "text")
    val r = TextOps.lexicalRichness(docs).collect().head
    // tokens: a,b,a,b,c -> n=5, vocab {a:2, b:2, c:1} -> 3, hapax {c}
    assert(r.getAs[Long]("n_tokens") == 5L)
    assert(r.getAs[Long]("vocab") == 3L)
    assert(r.getAs[Long]("hapax") == 1L)
    assert(r.getAs[Double]("ttr") == 0.6)
    assert(math.abs(r.getAs[Double]("hapax_frac") - 1.0 / 3.0) < 1e-12)
  }

  test("charClassProfile: length-diff counting matches a hand count") {
    import spark.implicits._
    val docs = Seq((1L, "s", "Ab 12, c!"))
      .toDF("doc_id", "source", "text")
    val r = TextOps.charClassProfile(docs).collect().head
    assert(r.getAs[Long]("n_chars") == 9L)
    assert(r.getAs[Long]("n_punct") == 2L)  // , !
    assert(r.getAs[Long]("n_digit") == 2L)
    assert(r.getAs[Long]("n_upper") == 1L)
    assert(r.getAs[Long]("n_space") == 2L)
  }

  test("stopwordProfileCosine: a single source IS the corpus - " +
      "cosine exactly 1; two sources with disjoint stopword use " +
      "score below 1") {
    import spark.implicits._
    val one = Seq((1L, "s", "the a of and the"))
      .toDF("doc_id", "source", "text")
    val r1 = TextOps.stopwordProfileCosine(one).collect().head
    assert(r1.getAs[Long]("n_stop_tokens") == 5L)
    assert(r1.getAs[Double]("stopword_cosine") == 1.0)
    val two = Seq((1L, "s1", "the the the"), (2L, "s2", "of of and"))
      .toDF("doc_id", "source", "text")
    val r2 = TextOps.stopwordProfileCosine(two).collect()
      .map(r => r.getAs[Double]("stopword_cosine"))
    assert(r2.forall(c => c > 0.0 && c < 1.0), s"got ${r2.toSeq}")
  }

  test("letterEntropyBySource: single letter -> 0 bits; two balanced " +
      "letters -> 1 bit; case-insensitive") {
    import spark.implicits._
    val docs = Seq((1L, "s0", "aaAA"), (2L, "s1", "abAB"))
      .toDF("doc_id", "source", "text")
    val out = TextOps.letterEntropyBySource(docs).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_letters"),
        r.getAs[Double]("letter_entropy_bits"))).toSeq
    assert(out == Seq(("s0", 4L, 0.0), ("s1", 4L, 1.0)), s"got $out")
  }

  test("piiDensityBySource: planted email/url/digit-run all counted; " +
      "clean text counts zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s", "contact me at jo.doe+x@ex-ample.org or " +
        "https://ex.org/p?q=1 ref 123456789012 ok"),
      (2L, "s", "nothing personal here 1234")).toDF(
      "doc_id", "source", "text")
    val r = TextOps.piiDensityBySource(docs).collect().head
    assert(r.getAs[Long]("n_email") == 1L)
    assert(r.getAs[Long]("n_url") == 1L)
    assert(r.getAs[Long]("n_digit_run") == 1L)
  }
  test("docLengthOutliers: a single extreme doc is the only 3-sigma " +
      "outlier; a uniform source reports zero") {
    import spark.implicits._
    val docs = (Seq.fill(20)("x" * 10) :+ ("y" * 500)).zipWithIndex
      .map { case (t, i) => (i.toLong, "s0", t) }
    val uniform = (0 until 5).map(i => (100L + i, "s1", "z" * 10))
    val out = TextOps.docLengthOutliers((docs ++ uniform)
      .toDF("doc_id", "source", "text")).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_outliers"))).toSeq
    assert(out == Seq(("s0", 21L, 1L), ("s1", 5L, 0L)), s"got $out")
  }

  test("sourceTokenNovelty: exclusive vocabulary counted per source, " +
      "shared tokens excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s0", "alpha beta shared"),
      (2L, "s1", "gamma shared"),
      (3L, "s1", "gamma delta")).toDF("doc_id", "source", "text")
    val out = TextOps.sourceTokenNovelty(docs).collect()
      .map(r => (r.getString(0), r.getAs[Long]("vocab"),
        r.getAs[Long]("exclusive"),
        r.getAs[Double]("exclusive_share"))).toSeq
    // s0 vocab {alpha, beta, shared} - exclusive {alpha, beta};
    // s1 vocab {gamma, shared, delta} - exclusive {gamma, delta}
    assert(out == Seq(("s0", 3L, 2L, round2(2.0 / 3.0)),
      ("s1", 3L, 2L, round2(2.0 / 3.0))), s"got $out")
  }

  private def round2(v: Double): Double =
    BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
  test("bigramBackoffLogProb: seen train bigram scores C12/C1, an " +
      "unseen test bigram takes the alpha add-one unigram backoff") {
    import spark.implicits._
    // train docs (ids 0-7 cover mod<=7): "a b" x2 and "a c"
    // test doc (id 9): "a b" (seen) ... and "c d" (unseen bigram, d
    // unseen unigram)
    val docs = Seq(
      (0L, "a b"), (1L, "a b"), (2L, "a c"),
      (9L, "a b"), (19L, "c d")).toDF("doc_id", "text")
    val out = TextOps.bigramBackoffLogProb(docs).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_bigrams"),
        r.getAs[String]("split"), r.getAs[Double]("avg_logp10"))).toMap
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // train tokens: a,b,a,b,a,c -> C(a)=3 C(b)=2 C(c)=1, T=6, V=3
    // doc 9 "a b": seen bigram C(a,b)=2, C(a)=3 -> log10(2/3)
    assert(out(9L)._1 == 1L && out(9L)._2 == "test")
    assert(out(9L)._3 == r6(math.log10(2.0 / 3.0)))
    // doc 19 "c d": unseen bigram -> 0.4 * (C(d)+1)/(T+V) = 0.4*(0+1)/9
    assert(out(19L)._3 == r6(math.log10(0.4 / 9.0)))
    // train doc 2 "a c": seen C(a,c)=1/C(a)=3
    assert(out(2L)._2 == "train")
    assert(out(2L)._3 == r6(math.log10(1.0 / 3.0)))
  }

  test("collapseNgramRuns: aligned bigram-run goldens — repeats " +
      "collapse, unaligned echoes survive, empties pass through") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),        // → "a b"
      (2L, "a b a"),              // no aligned bigram repeat → kept
      (3L, "x a b a b a b y"),    // → "x a b y"
      (4L, "a a a"),              // no bigram repeat at n=2 → kept
      (5L, "")                    // empty → zeros
    ).toDF("doc_id", "text")
    val out = TextOps.collapseNgramRuns(docs, n = 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text_clean"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_removed"),
          r.getAs[Double]("removed_frac")))).toMap
    assert(out(1L) == (("a b", 6L, 4L,
      BigDecimal(4.0 / 6.0).setScale(12,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(out(2L) == (("a b a", 3L, 0L, 0.0)))
    assert(out(3L) == (("x a b y", 8L, 4L, 0.5)))
    assert(out(4L) == (("a a a", 3L, 0L, 0.0)))
    assert(out(5L) == (("", 0L, 0L, 0.0)))
  }

  test("collapseNgramRuns: trigram runs at n=3; chained repeats all " +
      "fold to the first block") {
    import spark.implicits._
    val docs = Seq((1L, "p q r p q r p q r s")).toDF("doc_id", "text")
    val r = TextOps.collapseNgramRuns(docs, n = 3).collect().head
    assert(r.getAs[String]("text_clean") == "p q r s")
    assert(r.getAs[Long]("n_removed") == 6L)
  }

  test("collapseNgramRuns at n=1 equals q54's CollapseRuns on the " +
      "harness corpus (clean text + counts)") {
    val docs = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "documents")
    val a = TextOps.collapseNgramRuns(docs, n = 1)
      .select(col("doc_id"), col("text_clean"), col("n_tokens"),
        col("n_removed"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    val b = TextOps.collapseTokenRuns(docs)
      .select(col("doc_id"), col("clean_text"), col("n_tokens_raw"),
        col("n_collapsed"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(a == b)
  }

  test("perplexityBuckets: identical docs split by doc_id tiebreak " +
      "into equal thirds with equal means") {
    import spark.implicits._
    val docs = (1 to 6).map(i => (i.toLong, "s1", "the quick fox"))
      .toDF("doc_id", "source", "text")
    val out = TextOps.perplexityBuckets(docs).collect()
      .map(r => r.getAs[String]("bucket") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("mean_logp10"))))
      .toMap
    assert(out.keySet == Set("head", "middle", "tail"))
    assert(out.values.forall(_._1 == 2L), s"uneven thirds: $out")
    // all docs share one score -> all bucket means identical
    assert(out.values.map(_._2).toSet.size == 1)
  }

  test("perplexityBuckets: common-token doc lands in head, " +
      "rare-token doc in tail; means strictly ordered") {
    import spark.implicits._
    // 'the' is corpus-frequent (appears 5x), qq/ww/zz are singletons:
    // doc 1 (all common) scores highest, doc 3 (all rare) lowest
    val docs = Seq(
      (1L, "sC", "the the"),
      (2L, "sC", "the zz"),
      (3L, "sC", "qq ww"),
      (4L, "sD", "the the the")
    ).toDF("doc_id", "source", "text")
    val rows = TextOps.perplexityBuckets(docs).collect()
    val c = rows.filter(_.getAs[String]("source") == "sC")
      .map(r => r.getAs[String]("bucket") ->
        r.getAs[Double]("mean_logp10")).toMap
    assert(c("head") > c("middle") && c("middle") > c("tail"),
      s"bucket means not ordered: $c")
    // the single-doc source still yields three buckets? ntile(3) over
    // one row assigns tile 1 only -> head alone
    val d = rows.filter(_.getAs[String]("source") == "sD")
    assert(d.map(_.getAs[String]("bucket")).toSeq == Seq("head"))
    assert(d.head.getAs[Long]("n_docs") == 1L)
  }

  test("ruleCooccurrence: hand-built fail sets give the expected " +
      "pair counts, marginals and lift") {
    import spark.implicits._
    // doc 1 "aa bb": 2 tokens -> too_short; sw = 0 < 0.01 ->
    // stopword_oob; mtl = 2.0 passes; no trigrams, no runs.
    // doc 2: 30 distinct tokens incl. one stopword -> passes all six.
    val clean = ("the" +: (1 to 29).map(i => f"tok$i%02d")).mkString(" ")
    val docs = Seq((1L, "s1", "aa bb"), (2L, "s1", clean))
      .toDF("doc_id", "source", "text")
    val out = TextOps.ruleCooccurrence(docs).collect()
      .map(r => (r.getAs[String]("rule_a"), r.getAs[String]("rule_b")) ->
        ((r.getAs[Long]("n_both"), r.getAs[Long]("n_a"),
          r.getAs[Long]("n_b"), r.getAs[Double]("lift")))).toMap
    assert(out.keySet == Set(
      ("stopword_oob", "stopword_oob"),
      ("stopword_oob", "too_short"),
      ("too_short", "too_short")), s"got ${out.keySet}")
    // N=2, n_a=n_b=n_both=1 -> lift = 1*2/(1*1) = 2
    assert(out(("stopword_oob", "too_short")) == ((1L, 1L, 1L, 2.0)))
    assert(out(("too_short", "too_short")) == ((1L, 1L, 1L, 2.0)))
  }

  test("ruleCooccurrence: independent rules across disjoint docs " +
      "co-occur never; diagonal counts are the q64-style fail counts") {
    import spark.implicits._
    // doc 1 fails ONLY length (too_short, stopwords/mtl in range):
    // 3 tokens, one stopword -> sw=1/3, mtl=(3+2+2)/3=2.33
    // doc 2 fails ONLY repetition: 30 tokens, 'xx' repeated 28x
    // (max_run 28 > 3, dup_trigram), stopword 'the' x2 -> sw=2/30,
    // mtl=2.03
    val d1 = "the aa bb"
    val d2 = (Seq("the", "the") ++ Seq.fill(28)("xx")).mkString(" ")
    val docs = Seq((1L, "s1", d1), (2L, "s1", d2))
      .toDF("doc_id", "source", "text")
    val out = TextOps.ruleCooccurrence(docs).collect()
      .map(r => (r.getAs[String]("rule_a"), r.getAs[String]("rule_b")) ->
        r.getAs[Long]("n_both")).toMap
    assert(out(("too_short", "too_short")) == 1L)
    assert(out(("dup_trigram", "long_run")) == 1L,
      "doc 2's two repetition rules must co-occur")
    assert(!out.contains(("long_run", "too_short")) &&
      !out.contains(("dup_trigram", "too_short")),
      "rules failing on DIFFERENT docs must not pair")
  }

  test("sourceLangMi: perfect source-language silos give MI = 1 bit; " +
      "proportional mixes give MI = 0") {
    import spark.implicits._
    val silo = Seq((1L, "en", "s1", "x"), (2L, "en", "s1", "x"),
      (3L, "de", "s2", "x"), (4L, "de", "s2", "x"))
      .toDF("doc_id", "lang", "source", "text")
    val r1 = TextOps.sourceLangMi(silo).collect().head
    assert(r1.getAs[Long]("n_docs") == 4L)
    assert(r1.getAs[Double]("mi_bits") == 1.0)
    assert(r1.getAs[Double]("h_source_bits") == 1.0 &&
      r1.getAs[Double]("h_lang_bits") == 1.0)
    val indep = Seq(
      (1L, "en", "s1"), (2L, "de", "s1"), (3L, "en", "s1"),
      (4L, "de", "s1"), (5L, "en", "s2"), (6L, "de", "s2"),
      (7L, "en", "s2"), (8L, "de", "s2"))
      .map { case (i, l, s) => (i, l, s, "x") }
      .toDF("doc_id", "lang", "source", "text")
    val r2 = TextOps.sourceLangMi(indep).collect().head
    assert(r2.getAs[Double]("mi_bits") == 0.0,
      s"independent grid must carry zero MI: $r2")
  }

  test("tokenLorenz: 1..10-token docs land one per decile with exact " +
      "shares and a cumulative share reaching 1") {
    import spark.implicits._
    val docs = (1 to 10).map(i =>
      (i.toLong, (1 to i).map(k => s"t$k").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = TextOps.tokenLorenz(docs).collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.length == 10)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("n_docs") == 1L)
      assert(r.getAs[Long]("n_tokens") == i + 1L)
    }
    val top = rows.last
    assert(math.abs(top.getAs[Double]("token_share") - 10.0 / 55) < 1e-9)
    assert(top.getAs[Double]("cum_token_share") == 1.0)
    // Lorenz monotonicity: shares rise with the decile
    val shares = rows.map(_.getAs[Double]("token_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
  }

  test("truncationLoss: hand-computed losses at a binding and a " +
      "non-binding context length") {
    import spark.implicits._
    val docs = Seq((1L, "aa bb"), (2L, "aa bb cc dd ee"))
      .toDF("doc_id", "text")
    val out = TextOps.truncationLoss(docs, contexts = Seq(3, 10))
      .collect().map(r => r.getAs[Long]("context_len") ->
        ((r.getAs[Long]("n_docs_truncated"),
          r.getAs[Double]("frac_docs_truncated"),
          r.getAs[Long]("tokens_lost"),
          r.getAs[Double]("frac_tokens_lost")))).toMap
    // C=3: doc 2 (5 tokens) loses 2 of the corpus's 7 tokens
    assert(out(3L) == ((1L, 0.5, 2L, 0.285714285714)), s"got $out")
    // C=10: nothing truncates
    assert(out(10L) == ((0L, 0.0, 0L, 0.0)))
  }

  test("bigramEntropyRate: a fully deterministic chain has H(W2|W1) = 0; " +
      "a fair binary continuation has exactly 1 bit") {
    import spark.implicits._
    val docs = Seq(
      // src0: 'a b a b a b' — every continuation is forced
      (1L, "src0", "a b a b a b"),
      // src1: after 'x', 'y' and 'z' each once — one fair bit
      (2L, "src1", "x y"),
      (3L, "src1", "x z")
    ).toDF("doc_id", "source", "text")
    val out = TextOps.bigramEntropyRate(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val f = out("src0")
    assert(f.getAs[Long]("n_bigrams") == 5L)
    assert(f.getAs[Long]("n_bigram_types") == 2L) // (a,b) and (b,a)
    assert(f.getAs[Double]("h_cond_bits") == 0.0,
      "forced continuations carry zero conditional entropy")
    // w1 stream = a,b,a,b,a → counts 3,2:
    // H1 = log2 5 − (3·log2 3 + 2·log2 2)/5
    val h1 = math.log(5) / math.log(2) -
      (3 * (math.log(3) / math.log(2)) + 2.0) / 5
    assert(math.abs(f.getAs[Double]("h_unigram_bits") - h1) < 1e-9)
    val u = out("src1")
    assert(u.getAs[Long]("n_bigrams") == 2L)
    assert(u.getAs[Double]("h_cond_bits") == 1.0,
      "two equally likely continuations = exactly one bit")
    assert(u.getAs[Double]("h_unigram_bits") == 0.0,
      "w1 is always 'x' — no unigram surprise")
  }

  test("bigramEntropyRateHashed (x45): exact-equal to q211 on a " +
      "collision-free corpus, and the strings are hashed BEFORE the " +
      "count-table shuffle") {
    // Entropy is invariant under injective relabeling: on any corpus
    // where xxhash64 is collision-free over the vocabulary (certain
    // here: ~10^3 distinct tokens vs 2^64 — P(collision) < 1e-12),
    // the hashed count multiset EQUALS the string count multiset, so
    // every output column must match q211 bit-for-bit.
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val exact = TextOps.bigramEntropyRate(docs).collect()
      .map(r => r.getString(0) -> r.toSeq.tail).toMap
    val hashed = TextOps.bigramEntropyRateHashed(docs).collect()
      .map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(exact.keySet == hashed.keySet)
    exact.foreach { case (src, want) =>
      assert(hashed(src) == want,
        s"x45 diverged from q211 on $src: ${hashed(src)} vs $want")
    }
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    // the narrow-shuffle claim: in the (pre-cache-substitution)
    // analyzed plan the count-table Aggregate's grouping keys w1/w2
    // are LONGs (the xxhash64 projection sits below the aggregate, so
    // the shuffle that implements it carries fixed-width longs, not
    // strings — Catalyst cannot hoist a projection above an aggregate
    // that groups on its output)
    import spark.implicits._
    val tiny = Seq((1L, "s", "a b c")).toDF("doc_id", "source", "text")
    val analyzed = TextOps.bigramEntropyRateHashed(tiny)
      .queryExecution.analyzed
    val countAggKeyTypes = analyzed.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.groupingExpressions.size == 3 =>
        a.groupingExpressions.map(_.dataType)
    }
    assert(countAggKeyTypes.nonEmpty, "count-table aggregate not found")
    countAggKeyTypes.foreach { types =>
      assert(types.count(_ ==
          org.apache.spark.sql.types.LongType) == 2,
        s"w1/w2 must shuffle as LONGs, got $types")
    }
  }

  test("bm25Search (q213): hand-computed scores on a tiny corpus; " +
      "saturation and length normalization behave") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"),   // dl 4: heavy tf(a), one b
      (2L, "a c"),       // dl 2: short doc, one a
      (3L, "d d d d d d") // dl 6: no query terms
    ).toDF("doc_id", "text")
    val out = TextOps.bm25Search(docs, Seq("a", "b"), k = 10).collect()
    // doc 3 matches nothing and must be absent
    assert(out.map(_.getAs[Long]("doc_id")).toSeq.sorted == Seq(1L, 2L))
    // replicate the engine's arithmetic exactly: idf = ln(1 + (N-df+.5)
    // /(df+.5)); tfnorm = tf*(k1+1)/(tf + k1*(1-b + b*dl/avgdl));
    // term rounds 9 (HALF_UP), per-doc decimal sum, final round 12
    def r(x: Double, s: Int): BigDecimal =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    val (k1, b) = (1.2, 0.75)
    val avgdl = 12.0 / 3.0
    def idf(df: Long): Double = math.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))
    def tfn(tf: Long, dl: Long): Double =
      tf.toDouble * (k1 + 1.0) /
        (tf.toDouble + k1 * ((1.0 - b) + b * dl.toDouble / avgdl))
    val want1 = (r(idf(2) * tfn(3, 4), 9) + r(idf(1) * tfn(1, 4), 9))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want2 = r(idf(2) * tfn(1, 2), 9)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byDoc = out.map(r_ => r_.getAs[Long]("doc_id") -> r_).toMap
    assert(byDoc(1L).getAs[Double]("score") == want1, s"got $byDoc")
    assert(byDoc(1L).getAs[Long]("n_terms") == 2L)
    assert(byDoc(1L).getAs[Long]("dl") == 4L)
    assert(byDoc(2L).getAs[Double]("score") == want2)
    // ranking: doc 1 (two terms, heavy tf) outscores doc 2
    assert(out.head.getAs[Long]("doc_id") == 1L)
    // saturation: tripling tf must gain LESS than 3x (vs undamped tf)
    assert(tfn(3, 4) < 3.0 * tfn(1, 4))
    // length normalization: same tf in a longer doc scores lower
    assert(tfn(1, 6) < tfn(1, 2))
  }

  test("readabilityBySource: hand-computed Flesch on known text; " +
      "fragment docs count one sentence; empty docs drop") {
    import spark.implicits._
    val docs = Seq(
      // 4 words, 2 sentences, syllable-run counts by [aeiouy]+:
      // "go on. we did." -> go(1) on(1) we(1) did(1) = 4
      (1L, "srcA", "go on. we did."),
      // headline fragment: no terminal punctuation -> 1 sentence;
      // "big data rocks" -> big(1) data(2) rocks(1) = 4 syllable runs
      (2L, "srcB", "big data rocks"),
      (3L, "srcC", "")
    ).toDF("doc_id", "source", "text")
    val out = TextOps.readabilityBySource(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(!out.contains("srcC"), "zero-word docs contribute nothing")
    val a = out("srcA")
    assert(a.getAs[Long]("n_words") == 4L &&
      a.getAs[Long]("n_sentences") == 2L &&
      a.getAs[Long]("n_syllables") == 4L)
    val expectA = 206.835 - 1.015 * (4.0 / 2.0) - 84.6 * (4.0 / 4.0)
    assert(math.abs(a.getAs[Double]("flesch_score") - expectA) < 1e-9)
    val b = out("srcB")
    assert(b.getAs[Long]("n_sentences") == 1L,
      "a fragment without terminal punctuation is one sentence")
    assert(b.getAs[Long]("n_syllables") == 4L)
  }

  test("heapsLawFit (q220): two-point OLS is the exact chord slope; " +
      "template floods pin beta to 0, all-new-type streams to 1; " +
      "single-point sources report NULL") {
    import spark.implicits._
    val docs = Seq(
      // srcA: bucket 0 (ids < 50) holds 2 tokens / 2 types, bucket 1
      // adds 4 tokens / 2 new types -> points (2,2), (6,4):
      // beta = (ln4 - ln2) / (ln6 - ln2) = ln2/ln3
      (0L, "srcA", "a b"),
      (50L, "srcA", "c d a b"),
      // srcB: same text every bucket -> vocabulary flat -> beta = 0
      (1L, "srcB", "t1 t2 t3"),
      (51L, "srcB", "t1 t2 t3"),
      (101L, "srcB", "t1 t2 t3"),
      // srcC: every token new, equal bucket mass -> V(n) = n -> beta 1
      (2L, "srcC", "u1 u2"),
      (52L, "srcC", "u3 u4"),
      (102L, "srcC", "u5 u6"),
      // srcD: one bucket only -> no slope
      (3L, "srcD", "z1 z2 z3")
    ).toDF("doc_id", "source", "text")
    val out = TextOps.heapsLawFit(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("srcA")
    assert(a.getAs[Long]("n_points") == 2L)
    val want = math.log(2) / math.log(3)
    // 1e-5, not 1e-7: points and finals round 6 dp (the r16 driver-
    // determinism coarsening), so the fit carries up to ~5e-6 error.
    assert(math.abs(a.getAs[Double]("heaps_beta") - want) < 1e-5,
      s"two-point slope: got ${a.getAs[Double]("heaps_beta")}, want $want")
    assert(out("srcB").getAs[Double]("heaps_beta") == 0.0,
      "constant vocabulary fits a flat power law exactly")
    // ... and bitwise POSITIVE zero: flat-vocabulary sources produce
    // beta = +/-1e-14 cancellation noise, and a rounded -0.0 is the
    // exact bit the driver's hash flagged for two rounds (DuckDB's
    // round emits -0.0, Spark's +0.0; == but not bit-equal). The
    // engine normalizes with `+ 0.0`; pin the raw sign bit here.
    assert(java.lang.Double.doubleToRawLongBits(
      out("srcB").getAs[Double]("heaps_beta")) == 0L,
      "flat-vocabulary beta must be bitwise +0.0, never -0.0")
    assert(math.abs(out("srcC").getAs[Double]("heaps_beta") - 1.0) < 1e-5,
      "V(n) = n fits beta = 1")
    assert(out("srcD").isNullAt(out("srcD").fieldIndex("heaps_beta")) &&
      out("srcD").isNullAt(out("srcD").fieldIndex("heaps_ln_k")),
      "a single growth point cannot anchor a power law")
    // ln K sanity on the exact-fit source: y = beta*x + lnK through
    // (ln2, ln2) -> lnK = ln2*(1 - beta)
    val lnk = math.log(2) * (1 - want)
    assert(math.abs(a.getAs[Double]("heaps_ln_k") - lnk) < 1e-5)
  }

  test("knBigramEntropy (q218): hand-computed interpolated KN golden, " +
      "and a forced chain keeps POSITIVE entropy (the discount reserve " +
      "q211's MLE estimate reports as exactly zero)") {
    import spark.implicits._
    def pKn(c: Double, c1: Double, n1f: Double, n1b: Double,
        nt: Double): Double =
      (c - 0.75) / c1 + ((0.75 * n1f) / c1) * (n1b / nt)
    def lg2(x: Double): Double = math.log(x) / math.log(2)
    val docs = Seq(
      // srcA 'a b a b a c': bigrams (a,b)x2 (b,a)x2 (a,c)x1 — N=5, nt=3
      // c1: a=3 (n1f=2), b=2 (n1f=1); n1b: a=1, b=1, c=1
      (1L, "srcA", "a b a b a c"),
      // srcB 'a b a b a b': (a,b)x3 (b,a)x2 — forced chain, N=5, nt=2
      (2L, "srcB", "a b a b a b"),
      // srcC: one token — no bigrams, must be ABSENT from the report
      (3L, "srcC", "solo")
    ).toDF("doc_id", "source", "text")
    val out = TextOps.knBigramEntropy(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(!out.contains("srcC"), "bigram-less sources contribute nothing")
    val a = out("srcA")
    assert(a.getAs[Long]("n_bigrams") == 5L)
    assert(a.getAs[Long]("n_bigram_types") == 3L)
    val hA = -(2 * lg2(pKn(2, 3, 2, 1, 3)) + 2 * lg2(pKn(2, 2, 1, 1, 3)) +
      1 * lg2(pKn(1, 3, 2, 1, 3))) / 5
    assert(math.abs(a.getAs[Double]("h_kn_bits") - hA) < 1e-8,
      s"KN golden: got ${a.getAs[Double]("h_kn_bits")}, want $hA")
    val b = out("srcB")
    // P(b|a) = 2.25/3 + (0.75/3)(1/2) = 0.875; P(a|b) = 0.8125
    val hB = -(3 * lg2(0.875) + 2 * lg2(0.8125)) / 5
    assert(math.abs(b.getAs[Double]("h_kn_bits") - hB) < 1e-8)
    assert(b.getAs[Double]("h_kn_bits") > 0.0,
      "KN reserves discounted mass: a forced chain scores ABOVE zero " +
        "bits, where the q211 MLE estimate reports exactly zero")
  }

  test("knBigramEntropy: observed-bigram KN probabilities per context " +
      "sum strictly below 1 (mass reserved for unseen continuations), " +
      "and entropy is non-negative") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s", "a b a c b c a b"),
      (2L, "s", "c a b b a")
    ).toDF("doc_id", "source", "text")
    val h = TextOps.knBigramEntropy(docs).collect().head
      .getAs[Double]("h_kn_bits")
    assert(h >= 0.0, "P <= c/c1 <= 1 forces non-negative entropy")
    // rebuild the model by hand to check the per-context mass property
    val pairs = Seq("a b a c b c a b", "c a b b a")
      .flatMap(t => { val w = t.split(" "); w.init.zip(w.tail) })
    val c12 = pairs.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val c1 = pairs.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val n1f = c12.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toDouble)
    val n1b = c12.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toDouble)
    val nt = c12.size.toDouble
    c1.keys.foreach { w1 =>
      val mass = c12.collect { case ((a, b), c) if a == w1 =>
        (c - 0.75) / c1(w1) + ((0.75 * n1f(w1)) / c1(w1)) * (n1b(b) / nt)
      }.sum
      assert(mass < 1.0 + 1e-12,
        s"context '$w1' over-allocates probability mass: $mass")
    }
  }

  test("packingEfficiency (q223): hand-computed fragmentation, padding " +
      "and truncation accounting at L=10") {
    import spark.implicits._
    def toks(n: Int, p: String): String =
      (1 to n).map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      // stream offsets: d1 [0,4) packs 0-0; d2 [4,12) packs 0-1 FRAG;
      // d3 [12,24) packs 1-2 FRAG and truncates under pad-per-doc
      (1L, "srcA", toks(4, "a")),
      (2L, "srcA", toks(8, "b")),
      (3L, "srcA", toks(12, "c")),
      // zero-token doc contributes nothing (q53's drop rule)
      (4L, "srcA", "")
    ).toDF("doc_id", "source", "text")
    val r = TextOps.packingEfficiency(docs, 10L).collect().head
    assert(r.getAs[Long]("n_docs") == 3L &&
      r.getAs[Long]("n_tokens") == 24L)
    assert(r.getAs[Long]("seqs_concat") == 3L &&
      r.getAs[Long]("frag_docs") == 2L)
    assert(r.getAs[Long]("seqs_pad") == 3L &&
      r.getAs[Long]("pad_tokens") == 8L &&
      r.getAs[Long]("trunc_tokens") == 2L)
    assert(r.getAs[Double]("concat_fill") == 0.8)
    assert(math.abs(r.getAs[Double]("pad_fill") - 22.0 / 30) < 1e-12)
  }

  test("knHeldOutScore (q221): hand-computed goldens for all three " +
      "scoring cases, OOV accounting, and exact per-context " +
      "normalization over seen continuations + UNK") {
    import spark.implicits._
    // train (id 0): model = q218's srcA fixture; val (id 8) hits the
    // seen-bigram case; test (id 9) hits unseen-bigram + OOV-context
    val docs = Seq(
      (0L, "s", "a b a b a c"),
      (8L, "s", "a b"),
      (9L, "s", "a z q")
    ).toDF("doc_id", "source", "text")
    val out = TextOps.knHeldOutScore(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    def lg2(x: Double): Double = math.log(x) / math.log(2)
    // model: c12 (a,b)=2 (b,a)=2 (a,c)=1; c1 a=3 b=2; n1f a=2 b=1;
    // n1b a=1 b=1 c=1; nt=3; V=3 -> Pc'(w) = (n1b+1)/7
    val pSeen = (2.0 - 0.75) / 3 + ((0.75 * 2) / 3) * (2.0 / 7) // P(b|a)
    val v = out("validation")
    assert(v.getAs[Long]("n_bigrams") == 1L &&
      v.getAs[Long]("n_oov_context") == 0L &&
      v.getAs[Long]("n_unseen_bigram") == 0L)
    assert(math.abs(v.getAs[Double]("h_kn_bits") - (-lg2(pSeen))) < 1e-8)
    val te = out("test")
    // (a,z): seen context, unseen bigram -> lam(a)*Pc'(z) = 0.5 * 1/7
    // (z,q): unseen context -> Pc'(q) = 1/7
    val hTest = -(lg2(0.5 * (1.0 / 7)) + lg2(1.0 / 7)) / 2
    assert(te.getAs[Long]("n_bigrams") == 2L &&
      te.getAs[Long]("n_oov_context") == 1L &&
      te.getAs[Long]("n_unseen_bigram") == 1L)
    assert(math.abs(te.getAs[Double]("h_kn_bits") - hTest) < 1e-8)
    val tr = out("train")
    assert(tr.getAs[Long]("n_bigrams") == 5L &&
      tr.getAs[Double]("h_kn_bits") >= 0.0)
    // exact normalization for seen context 'a': seen continuations
    // b, c + unseen-bigram mass for a and UNK sum to exactly 1
    val lamA = (0.75 * 2) / 3
    val mass = pSeen +                                 // P(b|a)
      ((1.0 - 0.75) / 3 + lamA * (2.0 / 7)) +          // P(c|a)
      lamA * (2.0 / 7) +                               // P(a|a) unseen
      lamA * (1.0 / 7)                                 // P(UNK|a)
    assert(math.abs(mass - 1.0) < 1e-12,
      s"seen-context probability must normalize exactly, got $mass")
  }

  test("stripDuplicateSpans (q219): a span pasted into a second doc is " +
      "cut there and kept at its first occurrence; clean docs ride " +
      "through untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e x1 x2"),
      (2L, "z1 a b c d e z2 z3"),
      (3L, "totally unrelated words here")
    ).toDF("doc_id", "text")
    val out = TextOps.stripDuplicateSpans(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_removed") == 0L &&
      out(1L).getAs[String]("text_clean") == "a b c d e x1 x2",
      "the canonical (lowest doc_id) occurrence keeps its tokens")
    assert(out(2L).getAs[Long]("n_removed") == 5L)
    assert(out(2L).getAs[String]("text_clean") == "z1 z2 z3")
    assert(out(2L).getAs[Double]("removed_frac") == 0.625)
    assert(out(3L).getAs[Long]("n_removed") == 0L &&
      out(3L).getAs[String]("text_clean") ==
        "totally unrelated words here")
  }

  test("stripDuplicateSpans: a span duplicated WITHIN one doc " +
      "self-dedups (first position wins)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e a b c d e")).toDF("doc_id", "text")
    val r = TextOps.stripDuplicateSpans(docs).collect().head
    assert(r.getAs[String]("text_clean") == "a b c d e")
    assert(r.getAs[Long]("n_removed") == 5L)
    assert(r.getAs[Double]("removed_frac") == 0.5)
  }

  test("stripDuplicateSpans: overlapping cut spans union — tokens are " +
      "never double-counted, and the union cuts once") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p q r s t u"),
      (2L, "w p q r s t u v")
    ).toDF("doc_id", "text")
    val out = TextOps.stripDuplicateSpans(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc2 hosts both duplicated 5-grams ('p q r s t' at pos 2,
    // 'q r s t u' at pos 3); their cut spans overlap on 3..6 and the
    // union removes positions 2..7 exactly once
    assert(out(2L).getAs[Long]("n_removed") == 6L)
    assert(out(2L).getAs[String]("text_clean") == "w v")
    assert(out(1L).getAs[Long]("n_removed") == 0L)
  }

  test("stripSavingsBySource (q224): cuts land at the LATER occurrence's " +
      "source; clean sources report zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "srcA", "a b c d e x1 x2"),      // canonical — untouched
      (2L, "srcB", "z1 a b c d e z2 z3"),   // hosts the later copy
      (3L, "srcC", "k1 k2 k3 k4 k5 k6")     // clean
    ).toDF("doc_id", "source", "text")
    val out = TextOps.stripSavingsBySource(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("srcA").getAs[Long]("tokens_removed") == 0L &&
      out("srcA").getAs[Long]("docs_changed") == 0L,
      "the canonical occurrence's source pays nothing")
    val b = out("srcB")
    assert(b.getAs[Long]("docs_changed") == 1L &&
      b.getAs[Long]("tokens_raw") == 8L &&
      b.getAs[Long]("tokens_removed") == 5L)
    assert(b.getAs[Double]("removal_rate") == 0.625)
    assert(out("srcC").getAs[Long]("tokens_removed") == 0L &&
      out("srcC").getAs[Double]("removal_rate") == 0.0)
  }

  test("stripDuplicateSpansApprox (x50): exact-equal to q219 on a " +
      "collision-free corpus (hashing is an injective relabeling of " +
      "the gram key there)") {
    // ~25k distinct 5-grams vs 2^64: P(any collision) < 1e-11, so the
    // hashed pipeline must reproduce q219 row for row
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val exact = TextOps.stripDuplicateSpans(docs).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    val hashed = TextOps.stripDuplicateSpansApprox(docs).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(exact.keySet == hashed.keySet)
    exact.foreach { case (id, want) =>
      assert(hashed(id) == want,
        s"x50 diverged from q219 on doc $id: ${hashed(id)} vs $want")
    }
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  test("stripDuplicateSpans: an exactly-duplicated doc is cut to the " +
      "empty string, not silently reverted; short docs are inert") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e"),
      (3L, "too short"),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = TextOps.stripDuplicateSpans(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("text_clean") == "a b c d e")
    assert(out(2L).getAs[String]("text_clean") == "")
    assert(out(2L).getAs[Long]("n_removed") == 5L)
    assert(out(2L).getAs[Double]("removed_frac") == 1.0)
    assert(out(3L).getAs[Long]("n_removed") == 0L &&
      out(3L).getAs[String]("text_clean") == "too short")
    assert(out(4L).getAs[Long]("n_tokens") == 0L &&
      out(4L).getAs[Double]("removed_frac") == 0.0)
  }

  test("knTrigramEntropy (q225): engine matches an independent " +
      "straight-line reference implementation, the per-context " +
      "discount-reserve identity holds to 1e-12, sub-trigram docs and " +
      "sources are inert, and a forced chain keeps positive entropy") {
    import spark.implicits._
    val D = 0.75
    // independent reference: plain Scala maps over token lists,
    // full-precision doubles — a different code path evaluating the
    // same Chen & Goodman recursion
    def refH(docTexts: Seq[String]): (Double, Long, Long) = {
      val tris = docTexts.map(_.split("\\s+").filter(_.nonEmpty).toSeq)
        .flatMap(ts => if (ts.length >= 3) ts.sliding(3).toList else Nil)
      val c123 = tris.groupBy(identity).map { case (k, v) =>
        k -> v.size.toLong }
      val keys = c123.keys.toSeq
      val ctx = keys.groupBy(_.take(2)).map { case (k, ks) =>
        k -> ((ks.map(c123).sum, ks.size.toLong)) }
      val n123 = keys.map(_.drop(1)).groupBy(identity).map {
        case (k, ks) => k -> ks.size.toLong }
      val mid = n123.keys.toSeq.groupBy(_.head).map { case (w2, ks) =>
        w2 -> ((ks.map(n123).sum, ks.size.toLong)) }
      val c3 = n123.keys.toSeq.groupBy(_(1)).map { case (w3, ks) =>
        w3 -> ks.size.toLong }
      val ntt = n123.size.toLong
      def lg2(x: Double): Double = math.log(x) / math.log(2)
      val n = c123.values.sum
      val h = -keys.map { k =>
        val c = c123(k).toDouble
        val (c12, n3f) = ctx(k.take(2))
        val p1 = c3(k(2)).toDouble / ntt.toDouble
        val (nmid, n2f) = mid(k(1))
        val p2 = (n123(k.drop(1)).toDouble - D) / nmid.toDouble +
          ((D * n2f.toDouble) / nmid.toDouble) * p1
        val p3 = (c - D) / c12.toDouble +
          ((D * n3f.toDouble) / c12.toDouble) * p2
        c * lg2(p3)
      }.sum / n.toDouble
      (h, n, c123.size.toLong)
      // reserve identity: per context the discounted seen mass plus
      // lambda re-spends to exactly 1
      }
    def reserveOk(docTexts: Seq[String]): Boolean = {
      val tris = docTexts.map(_.split("\\s+").filter(_.nonEmpty).toSeq)
        .flatMap(ts => if (ts.length >= 3) ts.sliding(3).toList else Nil)
      val c123 = tris.groupBy(identity).map { case (k, v) =>
        k -> v.size.toLong }
      c123.keys.toSeq.groupBy(_.take(2)).forall { case (_, ks) =>
        val c12 = ks.map(c123).sum.toDouble
        val seen = ks.map(k => (c123(k).toDouble - D) / c12).sum
        val lam = (D * ks.size.toDouble) / c12
        math.abs(seen + lam - 1.0) < 1e-12
      }
    }
    val aDocs = Seq("a b a b a", "x y z a b a")
    val dDocs = Seq("a b a b a b a b")
    val docs = (aDocs.zipWithIndex.map { case (t, i) =>
        (i.toLong, "srcA", t) } ++
      Seq((10L, "srcB", "a b c d"),
        (11L, "srcC", "p q"),
        (12L, "srcD", dDocs.head)))
      .toDF("doc_id", "source", "text")
    val out = TextOps.knTrigramEntropy(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(!out.contains("srcC"), "trigram-less sources are absent")
    for ((src, texts) <- Seq("srcA" -> aDocs,
        "srcB" -> Seq("a b c d"), "srcD" -> dDocs)) {
      val (h, n, nt) = refH(texts)
      val r = out(src)
      assert(r.getAs[Long]("n_trigrams") == n, s"$src trigram count")
      assert(r.getAs[Long]("n_trigram_types") == nt, s"$src type count")
      assert(math.abs(r.getAs[Double]("h_kn3_bits") - h) < 1e-6,
        s"$src: engine ${r.getAs[Double]("h_kn3_bits")} vs reference $h")
      assert(reserveOk(texts), s"$src reserve identity")
    }
    assert(out("srcD").getAs[Double]("h_kn3_bits") > 0.0,
      "KN reserves discounted mass: a forced chain scores above zero")
    assert(out("srcD").getAs[Double]("h_kn3_bits") <
      out("srcA").getAs[Double]("h_kn3_bits"),
      "a forced chain must score below a mixed corpus")
  }

  test("ffdPackReport (x52): hand-computed FFD optimum, oversize docs " +
      "truncate into dedicated full bins, capacity and bin-count " +
      "bounds hold, fill dominates pad-per-doc, zero-token docs are " +
      "inert, and shard boundaries are respected") {
    import spark.implicits._
    def text(n: Int): String = Seq.fill(n)("w").mkString(" ")
    // srcA lens 5,4,3,2,1 at L=6: FFD -> bins [5+1, 4+2, 3] = 3 bins,
    // the optimum (ceil(15/6) = 3); packed 15, pad 3
    val docs = Seq(
      (0L, "srcA", text(5)), (1L, "srcA", text(4)), (2L, "srcA", text(3)),
      (3L, "srcA", text(2)), (4L, "srcA", text(1)),
      // srcB: one oversize doc (10 > 6) + one tiny: trunc 4, the
      // oversize bin is exactly full, tiny gets its own bin
      (10L, "srcB", text(10)), (11L, "srcB", text(1)),
      // srcC: only a zero-token doc -> absent from the report
      (20L, "srcC", "")
    ).toDF("doc_id", "source", "text")
    val out = TextOps.ffdPackReport(docs, packTokens = 6L).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(!out.contains("srcC"), "zero-token-only sources are absent")
    val a = out("srcA")
    assert(a.getAs[Long]("n_docs") == 5L)
    assert(a.getAs[Long]("seqs_ffd") == 3L,
      s"FFD must hit the optimum 3 bins, got ${a.getAs[Long]("seqs_ffd")}")
    assert(a.getAs[Long]("packed_tokens") == 15L)
    assert(a.getAs[Long]("pad_tokens") == 3L)
    assert(a.getAs[Long]("trunc_tokens") == 0L)
    assert(math.abs(a.getAs[Double]("ffd_fill") - 15.0 / 18.0) < 1e-9)
    val b = out("srcB")
    assert(b.getAs[Long]("n_oversize") == 1L)
    assert(b.getAs[Long]("trunc_tokens") == 4L)
    assert(b.getAs[Long]("seqs_ffd") == 2L,
      "a truncated oversize doc fills its own bin; 6+1 > 6 forces two")
    assert(b.getAs[Long]("packed_tokens") == 7L)
    // bounds + dominance on the harness documents table
    val harness = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val rep = TextOps.ffdPackReport(harness, packTokens = 64L).collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val bins = r.getAs[Long]("seqs_ffd")
      val packed = r.getAs[Long]("packed_tokens")
      assert(packed <= bins * 64L,
        s"capacity violated for ${r.getString(0)}")
      assert(bins >= (packed + 63L) / 64L,
        s"bin count below the volume lower bound for ${r.getString(0)}")
      assert(bins <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("ffd_fill") >=
        r.getAs[Double]("pad_per_doc_fill") - 1e-12,
        "packing whole docs together can never fill WORSE than one " +
          "sequence per doc")
    }
    // determinism: byte-identical report across runs
    val rep2 = TextOps.ffdPackReport(harness, packTokens = 64L).collect()
    assert(rep.map(_.toSeq).toSeq == rep2.map(_.toSeq).toSeq)
    // shard boundaries: with shardDocs = 2, srcA's docs {0,1} and
    // {2,3} and {4} pack independently -> [5,4] needs 2 bins, [3,2]
    // fits one (5 <= 6), [1] one: 4 bins, vs 3 unsharded — the
    // documented cost of bounded state
    val sharded = TextOps.ffdPackReport(docs, packTokens = 6L,
      shardDocs = 2L).collect().map(r => r.getString(0) -> r).toMap
    assert(sharded("srcA").getAs[Long]("seqs_ffd") == 4L)
    assert(sharded("srcA").getAs[Long]("packed_tokens") == 15L,
      "sharding never changes the packed token mass")
  }

  test("knOrderLadder (q226): H1 matches a straight-line add-one " +
      "reference, H2/H3 are consistent with the component operators, " +
      "gains are positive on a context-rich corpus, and missing " +
      "orders propagate NULL into exactly their own columns") {
    import spark.implicits._
    val docs = Seq(
      // context-rich: trigram context nearly determines the next token
      (1L, "srcA", "a b c a b c a b c d e f d e f"),
      (2L, "srcA", "a b c d e f a b c"),
      // bigrams but no trigrams (all docs exactly 2 tokens)
      (10L, "srcB", "p q"), (11L, "srcB", "p q"),
      // no bigrams at all (two docs of one token each: N=2, V=2,
      // P(w) = 2/4 -> H1 = 1 bit exactly)
      (20L, "srcC", "solo"), (21L, "srcC", "uno")
    ).toDF("doc_id", "source", "text")
    val out = TextOps.knOrderLadder(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    // straight-line add-one H1 for srcA
    def h1Ref(texts: Seq[String]): Double = {
      val ws = texts.flatMap(_.split("\\s+").filter(_.nonEmpty))
      val c = ws.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = ws.size.toDouble; val v = c.size.toDouble
      -c.values.map(k => k.toDouble *
        (math.log((k + 1.0) / (n + v)) / math.log(2))).sum / n
    }
    val a = out("srcA")
    assert(math.abs(a.getAs[Double]("h1_bits") -
      h1Ref(Seq("a b c a b c a b c d e f d e f",
        "a b c d e f a b c"))) < 1e-6)
    // consistency with the component operators: h2 is the q218
    // pipeline rounded DIRECTLY at 9 dp (finalDp = 9 — the r15
    // advisor retired the round(round(·,12),9) double-round), so it
    // must be BIT-equal to the component at finalDp = 9 and within
    // 5e-10 of q218's published 12-dp value
    val h2c9 = TextOps.knBigramEntropy(docs, finalDp = 9).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("h_kn_bits")).toMap
    val h2c12 = TextOps.knBigramEntropy(docs).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("h_kn_bits")).toMap
    val h3c = TextOps.knTrigramEntropy(docs).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("h_kn3_bits")).toMap
    assert(a.getAs[Double]("h2_bits") == h2c9("srcA"))
    assert(math.abs(a.getAs[Double]("h2_bits") - h2c12("srcA")) < 5e-10)
    assert(a.getAs[Double]("h3_bits") == h3c("srcA"))
    // an order of context must EARN bits on this corpus
    assert(a.getAs[Double]("gain_bigram") > 0.0)
    assert(a.getAs[Double]("gain_trigram") > 0.0)
    val b = out("srcB")
    assert(b.getAs[Double]("h2_bits") == h2c9("srcB"))
    assert(b.isNullAt(b.fieldIndex("h3_bits")) &&
      b.isNullAt(b.fieldIndex("n_trigrams")) &&
      b.isNullAt(b.fieldIndex("gain_trigram")),
      "a trigram-less source reports NULL for exactly the h3 columns")
    assert(!b.isNullAt(b.fieldIndex("gain_bigram")))
    val cRow = out("srcC")
    assert(cRow.isNullAt(cRow.fieldIndex("h2_bits")) &&
      cRow.isNullAt(cRow.fieldIndex("gain_bigram")) &&
      cRow.isNullAt(cRow.fieldIndex("gain_trigram")),
      "a bigram-less source still reports H1 but no gains")
    assert(cRow.getAs[Double]("h1_bits") == 1.0)
  }

  test("knPerplexityBuckets (q227): hand-computed KN doc scores land " +
      "in ordered tertiles, the model is corpus-GLOBAL, and " +
      "bigram-less docs never enter") {
    import spark.implicits._
    // CORPUS-GLOBAL model over ALL six scored docs:
    //   bigrams (x,y)x3 (docs 1,2,10), (x,z)x1 (doc 3), (q,r)x2
    //   (docs 11,12) -> c1(x)=4, N1+(x.)=2; c1(q)=2, N1+(q.)=1;
    //   every continuation type unique -> N1+(.w)=1; nt=3, D=0.75
    //   P(y|x) = (3-.75)/4 + (.75*2/4)*(1/3) = 0.6875
    //   P(z|x) = (1-.75)/4 + (.75*2/4)*(1/3) = 0.1875
    //   P(r|q) = (2-.75)/2 + (.75*1/2)*(1/3) = 0.75
    // doc 4 ("solo") has no bigram and must not appear anywhere.
    // srcB's (x y) doc proves the model ignores source boundaries:
    // it scores EXACTLY srcA's (x y) bits — per-source training
    // (c(x,y)=1, c1(x)=1 within srcB) could not produce that.
    val docs = Seq(
      (1L, "srcA", "x y"), (2L, "srcA", "x y"), (3L, "srcA", "x z"),
      (4L, "srcA", "solo"),
      (10L, "srcB", "x y"), (11L, "srcB", "q r"), (12L, "srcB", "q r")
    ).toDF("doc_id", "source", "text")
    val out = TextOps.knPerplexityBuckets(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    def bits(p: Double): Double = -math.log(p) / math.log(2)
    val bitsXY = bits(0.6875)
    val bitsXZ = bits(0.1875)
    val bitsQR = bits(0.75)
    // srcA: three scored docs -> 1 per bucket, ascending bits
    assert(out(("srcA", "head")).getAs[Long]("n_docs") == 1L)
    assert(out(("srcA", "middle")).getAs[Long]("n_docs") == 1L)
    assert(out(("srcA", "tail")).getAs[Long]("n_docs") == 1L)
    assert(math.abs(out(("srcA", "head"))
      .getAs[Double]("mean_kn_bits") - bitsXY) < 1e-6,
      "head holds the most predictable doc (x y)")
    assert(math.abs(out(("srcA", "tail"))
      .getAs[Double]("mean_kn_bits") - bitsXZ) < 1e-6,
      "tail holds the rare-continuation doc (x z)")
    // the bigram-less doc 4 is excluded: bucket counts sum to 3
    assert(Seq("head", "middle", "tail")
      .map(b => out(("srcA", b)).getAs[Long]("n_docs")).sum == 3L,
      "a doc with < 2 tokens has no bigram events and never enters")
    // corpus-global model: srcB's boilerplate pair heads (0.415 bits),
    // and its (x y) doc lands in the TAIL at exactly srcA's bits
    assert(math.abs(out(("srcB", "head"))
      .getAs[Double]("mean_kn_bits") - bitsQR) < 1e-6)
    assert(math.abs(out(("srcB", "tail"))
      .getAs[Double]("mean_kn_bits") - bitsXY) < 1e-6,
      "one corpus model scores every source (not per-source training)")
    // lo <= mean <= hi within each bucket; buckets ordered across
    Seq("srcA", "srcB").foreach { s =>
      val hd = out((s, "head")); val tl = out((s, "tail"))
      assert(hd.getAs[Double]("lo_kn_bits") <=
        hd.getAs[Double]("mean_kn_bits") + 1e-9)
      assert(hd.getAs[Double]("hi_kn_bits") <=
        tl.getAs[Double]("lo_kn_bits") + 1e-9,
        s"$s: head's range must sit at or below tail's")
    }
  }

  test("knPerplexityRetention (q228): head+middle kept, the tail's " +
      "tokens dropped from the kept mass, unscorable docs counted " +
      "but outside the cut, and cut_bits is the worst KEPT score") {
    import spark.implicits._
    // q227's fixture: srcA docs 1,2 score bits(0.6875), doc 3 scores
    // bits(0.1875) (the tail); doc 4 is unscorable (1 token). srcB:
    // docs 11,12 score bits(0.75) (kept), doc 10 bits(0.6875) (tail).
    val docs = Seq(
      (1L, "srcA", "x y"), (2L, "srcA", "x y"), (3L, "srcA", "x z"),
      (4L, "srcA", "solo"),
      (10L, "srcB", "x y"), (11L, "srcB", "q r"), (12L, "srcB", "q r")
    ).toDF("doc_id", "source", "text")
    val out = TextOps.knPerplexityRetention(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    def bits(p: Double): Double = -math.log(p) / math.log(2)
    val a = out("srcA")
    assert(a.getAs[Long]("scored_docs") == 3L &&
      a.getAs[Long]("unscored_docs") == 1L,
      "doc 4 (one token) is counted unscorable, never scored")
    assert(a.getAs[Long]("scored_tokens") == 6L &&
      a.getAs[Long]("kept_tokens") == 4L &&
      a.getAs[Long]("kept_docs") == 2L,
      "the tail doc's 2 tokens leave the kept mass")
    assert(math.abs(a.getAs[Double]("kept_token_frac") - 4.0 / 6.0)
      < 1e-9)
    assert(math.abs(a.getAs[Double]("cut_bits") - bits(0.6875)) < 1e-6,
      "cut_bits = the worst kept doc's score (docs 1-2)")
    val b = out("srcB")
    assert(b.getAs[Long]("unscored_docs") == 0L)
    assert(b.getAs[Long]("kept_docs") == 2L &&
      b.getAs[Long]("kept_tokens") == 4L)
    assert(math.abs(b.getAs[Double]("cut_bits") - bits(0.75)) < 1e-6,
      "srcB keeps its two cheap (q r) docs; the (x y) doc is its tail")
  }

  test("chunkWithOverlap (q229): hand-computed windows — overlap " +
      "preserved across cuts, short docs emit themselves once, the " +
      "tail window is honest, empty docs emit nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "srcA", "t1 t2 t3 t4 t5 t6 t7"), // L=4,S=3: 3 windows
      (2L, "srcA", "a b"),                  // n <= L: itself, once
      (3L, "srcA", ""),                     // empty: nothing
      (4L, "srcA", "u1 u2 u3 u4 u5 u6")     // n=6: [1..4],[4..6]
    ).toDF("doc_id", "source", "text")
    val out = TextOps.chunkWithOverlap(docs, chunkTokens = 4,
      strideTokens = 3).collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(!byDoc.contains(3L), "zero-token docs emit nothing")
    val d1 = byDoc(1L).map(r => (r.getAs[Long]("chunk_id"),
      r.getAs[Long]("start_tok"), r.getAs[Long]("n_tok"),
      r.getAs[Boolean]("is_full"), r.getAs[String]("text_chunk")))
    assert(d1.toSeq == Seq(
      (0L, 0L, 4L, true, "t1 t2 t3 t4"),
      (1L, 3L, 4L, true, "t4 t5 t6 t7"),
      (2L, 6L, 1L, false, "t7")),
      s"stride-3 windows over 7 tokens share exactly 1 token: " +
        s"${d1.toSeq}")
    assert(byDoc(2L).map(_.getAs[String]("text_chunk")).toSeq ==
      Seq("a b"), "a doc shorter than the window emits itself once")
    assert(byDoc(4L).map(_.getAs[String]("text_chunk")).toSeq ==
      Seq("u1 u2 u3 u4", "u4 u5 u6"))
    // every token of doc 1 is covered by >= 1 window
    val covered = byDoc(1L).flatMap(r =>
      r.getAs[Long]("start_tok") until
        (r.getAs[Long]("start_tok") + r.getAs[Long]("n_tok"))).toSet
    assert(covered == (0L until 7L).toSet,
      "the start rule never drops a token between windows")
    // stride == chunk degenerates to disjoint partition (q53's cut)
    val disjoint = TextOps.chunkWithOverlap(docs, 4, 4).collect()
      .filter(_.getLong(0) == 1L)
      .map(r => r.getAs[String]("text_chunk")).toSeq
    assert(disjoint == Seq("t1 t2 t3 t4", "t5 t6 t7"))
    intercept[IllegalArgumentException] {
      TextOps.chunkWithOverlap(docs, 4, 5)
    }
  }
}
