package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** End-to-end curation pipeline: stage order and composition. */
class CurationSpec extends SparkSuite {

  private def mkDoc(extra: String): String =
    ("the" +: (1 to 39).map(i => s"w$i")).mkString(" ") + " " + extra

  test("pipeline: junk filtered, PII-only near-dups collapse after " +
      "scrubbing, survivors pack; equals the step-by-step composition") {
    import spark.implicits._
    val docs = Seq(
      // 1 and 2 differ ONLY in the email address — after scrubbing both
      // read "... contact [EMAIL] now" and dedup as the near-dups they are
      (1L, "s1", mkDoc("contact bob@example.com now")),
      (2L, "s1", mkDoc("contact alice@other.org now")),
      // passes quality, genuinely distinct content
      (3L, "s1", ("a" +: (100 to 138).map(i => s"v$i")).mkString(" ")),
      // run of 10 identical tokens → rejected by the quality gate
      (4L, "s1", Array.fill(10)("spam").mkString(" "))
    ).toDF("doc_id", "source", "text")

    val out = Curation.pipeline(docs, packTokens = 16L)
    val ids = out.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids == Set(1L, 3L),
      s"expected junk (4) gated, PII-twin (2) deduped; got $ids")

    // composition == running the stages by hand
    val byHand = {
      val q = Curation.prepare(docs)
      val pairs = NearDup.minHashLshPairs(q)
        .select(col("a_id"), col("b_id"))
      TextOps.packSequences(
        NearDup.dedupByClusters(q, NearDup.duplicateClusters(pairs)), 16L)
    }
    assert(out.collect().toSeq == byHand.collect().toSeq)

    // every survivor passes the gate on its original text
    val passing = TextOps.filterQuality(docs)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids.subsetOf(passing))
  }

  test("pipeline: NFC canonicalization happens before dedup — a " +
      "composed/decomposed pair of the same document collapses (it " +
      "cannot without stage 0: every shingle hash differs)") {
    import spark.implicits._
    // Identical documents where EVERY content token carries an e-acute;
    // 5 uses precomposed U+00E9 throughout, 6 the decomposed
    // e + U+0301. Byte-distinct everywhere, so without NFC the two
    // shingle sets are DISJOINT (every trigram contains an accented
    // token) and no dedup path can see the pair.
    val body = "the " + (0 until 39).map(i => s"w\u00e9$i").mkString(" ")
    val bodyDecomposed =
      "the " + (0 until 39).map(i => s"we\u0301$i").mkString(" ")
    assert(body != bodyDecomposed, "premise: byte-distinct inputs")
    val docs = Seq(
      (5L, "s1", body),
      (6L, "s1", bodyDecomposed)
    ).toDF("doc_id", "source", "text")
    val ids = Curation.pipeline(docs, packTokens = 16L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids == Set(5L), s"NFC twins must dedup to the min id; got $ids")

    // premise check: WITHOUT normalization the pair is invisible to
    // LSH (disjoint shingle sets — Jaccard 0)
    val gated = TextOps.filterQuality(docs)
      .withColumn("text", TextOps.piiCleanText(col("text")))
    assert(NearDup.minHashLshPairs(gated).count() == 0L,
      "premise: un-normalized NFC twins must NOT pair")
  }

  test("pipeline: the stripBoilerplate stage slots between scrub and " +
      "dedup — shared headers vanish from every survivor, and the " +
      "composed pipeline equals the step-by-step composition") {
    import spark.implicits._
    // Three gate-passing docs sharing one aligned 8-token header
    // (w=8 default lines), each followed by 32 private tokens — low
    // pairwise Jaccard, so none of them near-dup away.
    val header = "the hd1 hd2 hd3 hd4 hd5 hd6 hd7"
    def doc(tag: Int): String =
      header + " " + (0 until 32).map(i => s"c$tag$i").mkString(" ")
    val docs = Seq(
      (1L, "s1", doc(1)), (2L, "s1", doc(2)), (3L, "s1", doc(3))
    ).toDF("doc_id", "source", "text")

    val out = Curation.pipeline(docs, packTokens = 64L,
      stripBoilerplateMinDocs = Some(3)).collect()
    val ids = out.map(_.getAs[Long]("doc_id")).toSet
    assert(ids == Set(1L, 2L, 3L),
      s"distinct-content docs must all survive; got $ids")
    // packSequences reports n_tokens: 32 = the private content only —
    // the 8-token shared header was stripped from every survivor
    val nTok = out.map(_.getAs[Long]("n_tokens")).toSeq
    assert(nTok.forall(_ == 32L),
      s"header must be stripped before packing; got n_tokens $nTok")

    // composition == running the stages by hand
    val byHand = {
      val p = Curation.prepare(docs)
      val cleaned = p.drop("text").join(
        TextOps.stripBoilerplateLines(p, minDocs = 3)
          .select(col("doc_id"), col("text_clean").as("text")),
        Seq("doc_id"), "inner")
      val pairs = NearDup.minHashLshPairs(cleaned)
        .select(col("a_id"), col("b_id"))
      TextOps.packSequences(
        NearDup.dedupByClusters(cleaned,
          NearDup.duplicateClusters(pairs)), 64L)
    }
    assert(Curation.pipeline(docs, packTokens = 64L,
        stripBoilerplateMinDocs = Some(3)).collect().toSeq ==
      byHand.collect().toSeq)

    // default (None) keeps x15's registered behavior: header intact
    // (40 tokens per doc, not 32)
    val kept = Curation.pipeline(docs, packTokens = 64L).collect()
      .map(_.getAs[Long]("n_tokens")).toSeq
    assert(kept.forall(_ == 40L),
      s"without the stage the header must survive — x15 unchanged; " +
        s"got n_tokens $kept")
  }

  // ---- training-mix construction (q101-q103) ------------------------

  private def mixDocs(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val src = s"src${i % 4}"
      val text = (0 to i % 7).map(j => s"t${i}w$j").mkString(" ")
      (i.toLong, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("sampleBySourceRate: membership is doc_id mod 100 < rate, " +
      "stable under corpus growth") {
    val d1 = mixDocs(200)
    val s1 = Curation.sampleBySourceRate(d1,
      Seq("src0" -> 50, "src1" -> 0), defaultRate = 100)
      .collect().map(_.getLong(0)).toSet
    // src0 docs (id % 4 == 0): kept iff id % 100 < 50; src1 never;
    // src2/src3 always
    assert(s1.forall(id => id % 4 != 1))
    assert((0 until 200).filter(_ % 4 == 0)
      .forall(id => s1.contains(id.toLong) == (id % 100 < 50)))
    assert((0 until 200).filter(i => i % 4 >= 2)
      .forall(id => s1.contains(id.toLong)))
    // growth stability: the same ids survive in a doubled corpus
    val s2 = Curation.sampleBySourceRate(mixDocs(400),
      Seq("src0" -> 50, "src1" -> 0), defaultRate = 100)
      .collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s2) && s2.forall(id => id >= 200 || s1(id)),
      "membership of existing docs must not change when the corpus grows")
  }

  test("allocateTokenBudget: per-source running sum in doc_id order " +
      "never exceeds the source's budget; a later doc never changes " +
      "an earlier selection") {
    val d = mixDocs(120)
    val out = Curation.allocateTokenBudget(d,
      Seq("src0" -> 10L, "src1" -> 3L), defaultBudget = 6L).collect()
    val bySrc = out.groupBy(_.getString(1))
    bySrc.foreach { case (src, rows) =>
      val budget = src match {
        case "src0" => 10L; case "src1" => 3L; case _ => 6L }
      assert(rows.map(_.getLong(3)).max <= budget,
        s"$src cum_tokens exceeded $budget")
      // selected ids are a PREFIX of the source's doc_id order
      val ids = rows.map(_.getLong(0)).sorted
      val allIds = d.filter(col("source") === src)
        .select(col("doc_id")).collect().map(_.getLong(0)).sorted
      assert(ids.sameElements(allIds.take(ids.length)),
        s"$src selection must be an arrival-order prefix")
    }
    // stability: appending later docs never changes the earlier picks
    val out2 = Curation.allocateTokenBudget(mixDocs(240),
      Seq("src0" -> 10L, "src1" -> 3L), defaultBudget = 6L)
      .filter(col("doc_id") < 120).collect()
    assert(out2.map(_.getLong(0)).sorted
      .sameElements(out.map(_.getLong(0)).sorted))
  }

  test("splitAssignment: 80/10/10 by doc_id mod 10, counts partition " +
      "the corpus exactly") {
    val d = mixDocs(200)
    val rows = Curation.splitAssignment(d).collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total == 200L, "every doc lands in exactly one split")
    val bySplit = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit == Map("train" -> 160L, "validation" -> 20L,
      "test" -> 20L), s"got $bySplit")
    // token accounting matches the corpus total
    val tokTotal = rows.map(_.getLong(3)).sum
    val expected = (0 until 200).map(i => (i % 7) + 1).sum
    assert(tokTotal == expected.toLong)
  }

  test("chunkDocuments: stride grid with exact cover, overlap = " +
      "chunkSize - stride, redundant trailing window dropped, empty " +
      "doc chunk-free") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, "s1", (1 to 8).map(i => s"u$i").mkString(" ")), // == one window
      (3L, "s1", "only three tokens"),
      (4L, "s1", "   ") // zero tokens → no chunks
    ).toDF("doc_id", "source", "text")
    val out = Curation.chunkDocuments(docs, chunkSize = 8, stride = 6)
      .collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    // doc 1 (10 tokens): windows at 0 (len 8) and 6 (len 4, adds 9-10)
    val d1 = byDoc(1L).sortBy(_.getAs[Long]("chunk_id"))
    assert(d1.map(r => (r.getAs[Long]("chunk_id"),
      r.getAs[Long]("chunk_start"), r.getAs[Long]("chunk_len"))).toSeq ==
      Seq((0L, 0L, 8L), (1L, 6L, 4L)))
    assert(d1(0).getAs[String]("chunk_text") ==
      (1 to 8).map(i => s"t$i").mkString(" "))
    assert(d1(1).getAs[String]("chunk_text") ==
      (7 to 10).map(i => s"t$i").mkString(" "))
    // doc 2 (exactly 8 tokens): the start-6 window adds nothing → dropped
    assert(byDoc(2L).length == 1 &&
      byDoc(2L).head.getAs[Long]("chunk_len") == 8L)
    // doc 3 shorter than one window: single chunk of its full length
    assert(byDoc(3L).length == 1 &&
      byDoc(3L).head.getAs[Long]("chunk_len") == 3L)
    assert(!byDoc.contains(4L))
    // cover property: every token index [0, n) is inside some window
    d1.foreach { r =>
      assert(r.getAs[Long]("chunk_start") + r.getAs[Long]("chunk_len")
        <= 10L)
    }
    val covered = d1.flatMap(r => r.getAs[Long]("chunk_start") until
      (r.getAs[Long]("chunk_start") + r.getAs[Long]("chunk_len"))).toSet
    assert(covered == (0L until 10L).toSet)
  }

  test("adaptiveQualityGate: each source keeps ceil(n * frac) of its " +
      "own best — a tiny source keeps its one doc, ranks are " +
      "diversity-descending") {
    import spark.implicits._
    // s1: 8 docs, 8 tokens each, diversity (8-i+min(i,1))/8 — docs 0
    // and 1 tie at 1.0 (tie-break by doc_id), the rest strictly lower;
    // keepFrac 0.25 → ceil(2) = top 2. s2: one mediocre doc →
    // ceil(0.25) = 1, kept despite a score the s1 cutoff would drop.
    val s1 = (0 until 8).map { i =>
      val distinct = (0 until 8 - i).map(j => s"d$j")
      val text = (distinct ++ Seq.fill(i)("pad")).mkString(" ")
      (i.toLong, "s1", text)
    }
    val docs = (s1 :+ (100L, "s2", "x x x x x x x x"))
      .toDF("doc_id", "source", "text")
    val out = Curation.adaptiveQualityGate(docs, keepFrac = 0.25)
      .collect()
    val bySrc = out.groupBy(_.getAs[String]("source"))
    assert(bySrc("s1").map(_.getAs[Long]("doc_id")).sorted.toSeq ==
      Seq(0L, 1L), s"top-2 most diverse of s1")
    assert(bySrc("s1").forall(_.getAs[Long]("n_source") == 8L))
    assert(bySrc("s2").map(_.getAs[Long]("doc_id")).toSeq == Seq(100L))
    assert(bySrc("s2").head.getAs[Double]("diversity") == 0.125)
    out.foreach(r => assert(r.getAs[Long]("quality_rank") <=
      math.ceil(r.getAs[Long]("n_source") * 0.25).toLong))
  }

  test("datasetCard: per-source accounting exact, token shares sum " +
      "to 1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "en", 10L, "a b c"),
      (2L, "s1", "de", 24L, "d e"),
      (3L, "s2", "en", 7L, "f g h i j")
    ).toDF("doc_id", "source", "lang", "n_chars", "text")
    val rows = Curation.datasetCard(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val s1 = rows("s1")
    assert(s1.getAs[Long]("n_docs") == 2L)
    assert(s1.getAs[Long]("n_tokens") == 5L)
    assert(s1.getAs[Double]("avg_tokens") == 2.5)
    assert(s1.getAs[Long]("n_langs") == 2L)
    assert(s1.getAs[Long]("max_chars") == 24L)
    assert(s1.getAs[Double]("token_share") == 0.5)
    assert(rows("s2").getAs[Double]("token_share") == 0.5)
  }

  test("interleaveShards: a permutation (every doc exactly once), " +
      "contiguous positions per shard, deterministic across runs, " +
      "order decorrelated from doc_id") {
    val d = mixDocs(200)
    val out = Curation.interleaveShards(d, nShards = 8).collect()
    assert(out.length == 200)
    assert(out.map(_.getAs[Long]("doc_id")).toSet == (0L until 200L).toSet)
    out.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val pos = rows.map(_.getAs[Long]("pos")).sorted.toSeq
      assert(pos == (1L to rows.length).toSeq, "contiguous 1..n per shard")
    }
    assert(out.map(_.getAs[Long]("shard")).distinct.length > 1,
      "the mix actually spreads docs across shards")
    // reproducible: a second run yields the identical layout
    val again = Curation.interleaveShards(d, nShards = 8).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
    // matches the hand-computed Knuth mix for a spot-checked shard
    val mix = (id: Long) => java.lang.Math.floorMod(
      id * 2654435761L, 4294967296L)
    val expected0 = (0L until 200L).filter(mix(_) % 8 == 0)
      .sortBy(id => (mix(id), id))
    val got0 = out.filter(_.getAs[Long]("shard") == 0L)
      .sortBy(_.getAs[Long]("pos")).map(_.getAs[Long]("doc_id")).toSeq
    assert(got0 == expected0)
  }

  test("splitContamination: leaked 8-gram flagged, validation split " +
      "contributes nothing, test-test overlap does not count, short " +
      "test docs report rate 0") {
    import spark.implicits._
    val eightTok = "t1 t2 t3 t4 t5 t6 t7 t8"
    val docs = Seq(
      (0L, eightTok + " x9 x10"),        // train: 3 grams incl. the leak
      (8L, "v1 v2 v3 v4 v5 v6 v7 v8"),   // validation: NOT train
      (9L, eightTok),                     // test: 1 gram, leaked
      (19L, "u1 u2 u3 u4 u5 u6 u7 u8"),  // test: clean
      (29L, "too short"),                 // test: no 8-gram at all
      (39L, "v1 v2 v3 v4 v5 v6 v7 v8")   // test: matches VAL only
    ).toDF("doc_id", "text")
    val out = Curation.splitContamination(docs, n = 8).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_contaminated"),
        r.getAs[Double]("contamination_rate"))).toSeq
    assert(out == Seq(
      (9L, 1L, 1L, 1.0),
      (19L, 1L, 0L, 0.0),
      (29L, 0L, 0L, 0.0),
      (39L, 1L, 0L, 0.0)))
  }

  test("systematicWeightedSample: equal weights select every W/n-th " +
      "crossing; a heavy doc spanning two steps is kept exactly once") {
    import spark.implicits._
    // equal weights: W=40, n=2 → step 20; cum 10,20,30,40 crosses at
    // docs 2 and 4
    val eq = Seq((1L, "s", 10L), (2L, "s", 10L),
      (3L, "s", 10L), (4L, "s", 10L)).toDF("doc_id", "source", "n_chars")
    val got = Curation.systematicWeightedSample(eq, sampleN = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 4L), s"got $got")
    // heavy middle doc: W=40, n=3; cum 5,35,40 → scaled 0,2,3 with
    // prefixes 0,0,2 — doc 2 crosses TWO boundaries but appears once,
    // so the sample is 2 < n docs
    val heavy = Seq((1L, "s", 5L), (2L, "s", 30L), (3L, "s", 5L))
      .toDF("doc_id", "source", "n_chars")
    val got2 = Curation.systematicWeightedSample(heavy, sampleN = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(got2 == Seq(2L, 3L), s"got $got2")
    // zero-weight docs can never be selected
    val zero = Seq((1L, "s", 0L), (2L, "s", 10L))
      .toDF("doc_id", "source", "n_chars")
    val got3 = Curation.systematicWeightedSample(zero, sampleN = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(got3 == Seq(2L), s"got $got3")
  }

  test("apportionQuota: largest-remainder seats, quotas sum to the " +
      "budget exactly, remainder ties break by source name") {
    import spark.implicits._
    // counts 5/3/2, budget 7: shares 3.5/2.1/1.4 → bases 3/2/1,
    // remainders 5/1/4 → the one leftover seat goes to s1
    val docs = ((1 to 5).map(i => (i.toLong, "s1")) ++
      (6 to 8).map(i => (i.toLong, "s2")) ++
      (9 to 10).map(i => (i.toLong, "s3"))).toDF("doc_id", "source")
    val out = Curation.apportionQuota(docs, budget = 7).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_docs"),
        r.getAs[Long]("quota"))).toSeq
    assert(out == Seq(("s1", 5L, 4L), ("s2", 3L, 2L), ("s3", 2L, 1L)))
    assert(out.map(_._3).sum == 7L)
    // equal remainders: seat goes to the lexicographically first source
    val tie = Seq((1L, "sa"), (2L, "sb")).toDF("doc_id", "source")
    val out2 = Curation.apportionQuota(tie, budget = 1).collect()
      .map(r => (r.getString(0), r.getAs[Long]("quota"))).toSeq
    assert(out2 == Seq(("sa", 1L), ("sb", 0L)))
  }

  test("enumerateCorpus: gid equals global row_number over " +
      "(source, doc_id) — contiguous from zero, no gaps") {
    import spark.implicits._
    val docs = Seq((10L, "b"), (5L, "a"), (7L, "a"), (1L, "b"))
      .toDF("doc_id", "source").repartition(3)
    val out = Curation.enumerateCorpus(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Long]("gid")))
      .toSeq
    assert(out == Seq((5L, "a", 0L), (7L, "a", 1L),
      (1L, "b", 2L), (10L, "b", 3L)))
  }

  test("systematicWeightedSample: two-phase prefix sum is shard-width-" +
      "invariant — widths 1/3/64/degenerate give byte-identical " +
      "selections on gappy doc_ids crossing every boundary") {
    import spark.implicits._
    // deterministic pseudo-random weights, ids with gaps so shard
    // populations are uneven and several shards are empty
    val docs = (0 until 60).map { i =>
      val id = i.toLong * 7 % 191 // gappy, non-monotone insert order
      (id, s"s${id % 3}", (id * 13 % 29) + 1)
    }.distinct.toDF("doc_id", "source", "n_chars")
    val ref = Curation.systematicWeightedSample(docs, sampleN = 11,
      shardWidth = Long.MaxValue) // degenerate: the single global window
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(ref.nonEmpty, "fixture must select something")
    for (w <- Seq(1L, 3L, 64L)) {
      val got = Curation.systematicWeightedSample(docs, sampleN = 11,
        shardWidth = w)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSeq
      assert(got == ref, s"shardWidth=$w diverged: $got vs $ref")
    }
  }

  test("splitContaminationApprox: per-doc superset of the exact q114 " +
      "(no false negatives), identical doc set and n_grams") {
    import spark.implicits._
    val eightTok = "t1 t2 t3 t4 t5 t6 t7 t8"
    val docs = (Seq(
      (0L, eightTok + " x9 x10"),
      (8L, "v1 v2 v3 v4 v5 v6 v7 v8"),
      (9L, eightTok),
      (19L, "u1 u2 u3 u4 u5 u6 u7 u8"),
      (29L, "too short"),
      (39L, "v1 v2 v3 v4 v5 v6 v7 v8")) ++
      // widen the gram population so the bloom is non-trivially loaded
      (0 until 40).map(i => (40L + i,
        (0 until 12).map(j => s"g${i}w$j").mkString(" "))))
      .toDF("doc_id", "text")
    val exact = Curation.splitContamination(docs, n = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val bloom = Curation.splitContaminationApprox(docs, n = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(exact.map(_._1) == bloom.map(_._1),
      "identical test-doc set in identical order")
    assert(exact.map(_._2) == bloom.map(_._2), "n_grams must agree")
    exact.zip(bloom).foreach { case ((id, _, e), (_, _, b)) =>
      assert(b >= e, s"doc $id: bloom count $b under exact $e — " +
        "a bloom filter must never produce a false negative")
    }
    // the known-leaked doc is flagged by both
    assert(bloom.find(_._1 == 9L).exists(_._3 >= 1L))
  }
  test("neymanAllocation: quotas track N*sigma and sum exactly to the " +
      "budget; a zero-variance source gets zero") {
    import spark.implicits._
    // s0: 4 docs, lengths {10,10,30,30} -> sigma 10, w = 40
    // s1: 2 docs, lengths {20,20} -> sigma 0, w = 0
    // s2: 2 docs, lengths {0,40} -> sigma 20, w = 40
    val docs = (Seq(10L, 10L, 30L, 30L).zipWithIndex.map { case (c, i) =>
      (i.toLong, "s0", c) } ++
      Seq((10L, "s1", 20L), (11L, "s1", 20L),
        (20L, "s2", 0L), (21L, "s2", 40L)))
      .toDF("doc_id", "source", "n_chars")
    val out = Curation.neymanAllocation(docs, budget = 7)
      .collect().map(r => (r.getString(0), r.getAs[Long]("quota"))).toSeq
    // weights 40 : 0 : 40 -> exact shares 3.5 / 0 / 3.5; largest
    // remainder gives the extra seat to s0 (tie-break on source name)
    assert(out == Seq(("s0", 4L), ("s1", 0L), ("s2", 3L)), s"got $out")
    assert(out.map(_._2).sum == 7L, "quotas must sum exactly to budget")
  }

  test("neymanAllocation: survives the N*sigma*1e6 >= 1e19 weight " +
      "cliff — quotas stay non-null, proportional, and sum to budget") {
    import spark.implicits._
    // sigma ~ 5e14 per source pushes w = round(N*sigma,6)*1e6 past
    // 1e21: the pre-r12 CAST(_w AS DECIMAL(19,0)) overflowed these to
    // NULL and every quota silently nulled. The shared power-of-ten
    // pre-scale must keep the apportionment exact in RATIO terms.
    val big = 1_000_000_000_000_000L // 1e15
    val docs = (Seq((0L, "s0", 0L), (1L, "s0", big),
      (2L, "s1", 0L), (3L, "s1", big),
      (4L, "s2", 0L), (5L, "s2", 3L * big))) // sigma 3x the others
      .toDF("doc_id", "source", "n_chars")
    val rows = Curation.neymanAllocation(docs, budget = 1000)
      .collect()
    val out = rows.map(r => (r.getString(0), r.getAs[Long]("quota"))).toSeq
    assert(rows.forall(!_.isNullAt(3)),
      s"quota overflowed to NULL past the weight cliff: $out")
    // weights 1 : 1 : 3 -> 200 / 200 / 600
    assert(out == Seq(("s0", 200L), ("s1", 200L), ("s2", 600L)),
      s"got $out")
  }

  test("curriculumSchedule: per-source quality rank, arithmetic " +
      "round-robin positions (rank-1 of every source before any " +
      "rank-2), unique and monotone — no global row_number") {
    import spark.implicits._
    val docs = Seq(
      // s0: doc 1 diversity 1.0 (3 distinct/3), doc 2 diversity 0.5
      (1L, "s0", "a b c"), (2L, "s0", "x x y y"),
      // s1: doc 3 diversity 1.0, doc 4 diversity 0.25
      (3L, "s1", "p q"), (4L, "s1", "z z z z"),
      // s2: single doc
      (5L, "s2", "m n o")).toDF("doc_id", "source", "text")
    val out = Curation.curriculumSchedule(docs).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getAs[Long]("quality_rank"), r.getAs[Long]("position")))
      .toSeq
    // 3 sources -> positions (rank-1)*3 + sidx; s0=0, s1=1, s2=2
    assert(out == Seq(
      (1L, "s0", 1L, 0L), (3L, "s1", 1L, 1L), (5L, "s2", 1L, 2L),
      (2L, "s0", 2L, 3L), (4L, "s1", 2L, 4L)), s"got $out")
    // every rank-1 position precedes every rank-2 position
    assert(out.map(_._4).distinct.size == out.size,
      "positions must be unique")
  }

  test("sourceMixWeights: weight ∝ sqrt(tokens) — low-resource " +
      "sources boost above 1, head sources damp, weights sum to 1") {
    import spark.implicits._
    // s0: 1 token, s1: 4 tokens -> sqrt weights 1 : 2
    val docs = Seq(
      (1L, "s0", "a"),
      (2L, "s1", "b c"), (3L, "s1", "d e")).toDF(
      "doc_id", "source", "text")
    val out = Curation.sourceMixWeights(docs).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("raw_share"), r.getAs[Double]("weight"),
        r.getAs[Double]("boost"))).toSeq
    def r12(v: Double): Double =
      BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    assert(out == Seq(
      ("s0", 1L, r12(0.2), r12(1.0 / 3), r12((1.0 / 3) / 0.2)),
      ("s1", 4L, r12(0.8), r12(2.0 / 3), r12((2.0 / 3) / 0.8))),
      s"got $out")
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-9,
      "weights must sum to 1")
    assert(out.head._5 > 1.0 && out.last._5 < 1.0,
      "small source up-samples, head source damps")
  }

  test("epochAllocation: weight-implied targets, epoch cap bites the " +
      "low-resource source, shortfall returns to the budget") {
    import spark.implicits._
    // s0: 1 token, s1: 4 tokens -> sqrt weights 1 : 2.
    // budget 9 -> targets 3 and 6; epochs 3.0 and 1.5; cap 2 clips s0.
    val docs = Seq(
      (1L, "s0", "a"),
      (2L, "s1", "b c"), (3L, "s1", "d e")).toDF(
      "doc_id", "source", "text")
    val out = Curation.epochAllocation(docs, tokenBudget = 9L,
      maxEpochs = 2).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("target_tokens"),
        r.getAs[Double]("epochs_uncapped"), r.getAs[Double]("epochs"),
        r.getAs[Double]("planned_tokens"),
        r.getAs[Double]("shortfall"))).toSeq
    assert(out == Seq(
      ("s0", 1L, 3.0, 3.0, 2.0, 2.0, 1.0),
      ("s1", 4L, 6.0, 1.5, 1.5, 6.0, 0.0)), s"got $out")
  }

  test("dedupSavings: dropped tokens are exactly the non-canonical " +
      "dup members' tokens, clean sources save nothing") {
    import spark.implicits._
    val dup = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, "s0", dup), (2L, "s0", dup + " zeta"), // near-dups, 1 kept
      (3L, "s1", "unique one two three four")).toDF(
      "doc_id", "source", "text")
    val out = Curation.dedupSavings(docs, n = 3, minJ = 0.7).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_dropped"),
        r.getAs[Long]("dropped_tokens"))).toSeq
    // cluster {1,2}: canonical 1, dropped 2 (6 tokens)
    assert(out == Seq(("s0", 1L, 6L), ("s1", 0L, 0L)), s"got $out")
  }

  test("pipeline: classifier gate drops a digit-wall doc the rule " +
      "gate passes; equals the by-hand composition") {
    import spark.implicits._
    // doc 2: 39 distinct 5-digit tokens + one "the" — passes every
    // RULE (length, sw=0.025 ≥ 0.01, mtl≈4.9, no runs) but its linear
    // quality score is ≈ −6.5 (digit density ~0.82): the model gate
    // catches what the rules cannot.
    val digitWall = ("the" +: (10001 to 10039).map(_.toString))
      .mkString(" ")
    // digit-free filler (mkDoc's w1..w39 carry digits, which the
    // model gate would — correctly — also penalize)
    val wordDoc = ("the" +: (0 until 39).map(i =>
      s"${('a' + i % 26).toChar}${('a' + i / 26).toChar}x"))
      .mkString(" ") + " alpha beta"
    val docs = Seq(
      (1L, "s1", wordDoc),
      (2L, "s1", digitWall)
    ).toDF("doc_id", "source", "text")
    val out = Curation.pipeline(docs, packTokens = 16L,
      classifierGate = Some(BigDecimal(0)))
    val ids = out.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids == Set(1L),
      s"expected the digit wall (2) model-gated; got $ids")
    // without the gate both survive (the rules alone pass the wall)
    val noGate = Curation.pipeline(docs, packTokens = 16L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(noGate == Set(1L, 2L), s"got $noGate")
    // composition == running the stages by hand
    val byHand = {
      val q = Classifier.filterByScore(Curation.prepare(docs),
        BigDecimal(0))
      val pairs = NearDup.minHashLshPairs(q)
        .select(col("a_id"), col("b_id"))
      TextOps.packSequences(
        NearDup.dedupByClusters(q, NearDup.duplicateClusters(pairs)),
        16L)
    }
    assert(out.collect().toSeq == byHand.collect().toSeq)
  }

  test("snapshotDiff: added/removed/changed/unchanged classified per " +
      "source; churn fraction hand-checked") {
    import spark.implicits._
    val old = Seq(
      (1L, "s1", "alpha"), (2L, "s1", "beta"), (3L, "s1", "gamma"),
      (9L, "s2", "delta")
    ).toDF("doc_id", "source", "text")
    val nw = Seq(
      (2L, "s1", "beta"),       // unchanged
      (3L, "s1", "gamma v2"),   // changed
      (4L, "s1", "epsilon")     // added; 1 removed; s2's 9 removed
    ).toDF("doc_id", "source", "text")
    val out = Curation.snapshotDiff(old, nw).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_added"),
        r.getAs[Long]("n_removed"), r.getAs[Long]("n_changed"),
        r.getAs[Long]("n_unchanged"),
        r.getAs[Double]("churn_frac"))).toSeq
    assert(out == Seq(
      ("s1", 1L, 1L, 1L, 1L, 0.75),
      ("s2", 0L, 1L, 0L, 0L, 1.0)), s"got $out")
  }

  test("snapshotDiff: identical snapshots are all-unchanged with zero " +
      "churn") {
    import spark.implicits._
    val docs = Seq((1L, "s1", "alpha"), (2L, "s1", "beta"))
      .toDF("doc_id", "source", "text")
    val out = Curation.snapshotDiff(docs, docs).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_unchanged") == 2L)
    assert(out.head.getAs[Double]("churn_frac") == 0.0)
  }

  test("dsirSelection: hand-computed log-ratio gate on a two-doc " +
      "fixture — target-only token selects, non-target rejects") {
    import spark.implicits._
    // corpus: cr(aa)=2 cr(bb)=2, Nr=4, V=2; target (en): ct(aa)=2,
    // ct(bb)=0, Nt=2.
    // lr(aa) = r6(log10(3/4) - log10(3/6)) = r6(0.17609126) = 0.176091
    // lr(bb) = r6(log10(1/4) - log10(3/6)) = r6(-0.30103000) = -0.301030
    // docA (en, "aa aa"): s = 0.352182 > 0 -> selected
    // docB (de, "bb bb"): s = -0.602060 < 0 -> rejected
    val docs = Seq(
      (1L, "en", "sA", "aa aa"),
      (2L, "de", "sB", "bb bb")
    ).toDF("doc_id", "lang", "source", "text")
    val out = Curation.dsirSelection(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val a = out("sA")
    assert(a.getAs[Long]("n_docs") == 1L &&
      a.getAs[Long]("n_selected") == 1L)
    assert(a.getAs[Double]("sel_rate") == 1.0)
    assert(math.abs(a.getAs[Double]("mean_lr_token") - 0.176091) < 1e-9)
    assert(math.abs(a.getAs[Double]("mean_lr_selected") - 0.176091)
      < 1e-9)
    val b = out("sB")
    assert(b.getAs[Long]("n_selected") == 0L)
    assert(math.abs(b.getAs[Double]("mean_lr_token") + 0.301030) < 1e-9)
    assert(b.isNullAt(b.fieldIndex("mean_lr_selected")),
      "no selected docs -> mean_lr_selected must be NULL")
  }

  test("dsirSelection: runs on the harness table — rates in [0,1], " +
      "target-language sources select at a higher rate than average") {
    val docs = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "documents")
    val out = Curation.dsirSelection(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val rate = r.getAs[Double]("sel_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_selected") <= r.getAs[Long]("n_docs"))
    }
  }

  test("weightedSample: the two-phase shard prune is EXACTLY the naive " +
      "per-source window; weight bias holds on a planted fixture") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val fast = Curation.weightedSample(docs, k = 20)
      .collect().map(_.toSeq).toSeq
    val naive = Curation.weightedSampleNaive(docs, k = 20)
      .collect().map(_.toSeq).toSeq
    assert(fast == naive,
      "lossless prune: shard-local top-k must reproduce the global " +
        "window exactly")
    // two shard counts, same answer (the prune cannot depend on S)
    val other = Curation.weightedSample(docs, k = 20, shards = 7)
      .collect().map(_.toSeq).toSeq
    assert(other == naive)
    // weight bias: 5 huge docs among 200 tiny ones — u^(1/w) with
    // w ~ 10^6 sits within ~3e-5 of 1, a tiny doc needs u > 0.99997
    // to compete; on the fixed LCG draws all heavies are selected
    val planted = ((1L to 200L).map(i => (i, "s", 2L)) ++
      (1001L to 1005L).map(i => (i, "s", 2000000L)))
      .toDF("doc_id", "source", "n_chars")
    val sel = Curation.weightedSample(planted, k = 5)
      .collect().map(_.getLong(1)).toSet
    assert(sel == (1001L to 1005L).toSet,
      s"heavy docs must win the k=5 sample, got $sel")
    // LARGE k: the shard count derives down from the Phase2Cap/k
    // bound (k=100k > cap -> one shard = the naive window) and the
    // answer is still exactly the naive one — the caller can ask for
    // any k without the phase-2 reducer exceeding ~shards*k ~ 64k rows
    val bigK = Curation.weightedSample(docs, k = 100000)
      .collect().map(_.toSeq).toSeq
    val bigKNaive = Curation.weightedSampleNaive(docs, k = 100000)
      .collect().map(_.toSeq).toSeq
    assert(bigK == bigKNaive,
      "large-k sample must still equal the naive window")
  }

  test("mixturePlan (q215): sqrt smoothing damps the big source and " +
      "boosts the small one on a hand-computable corpus") {
    import spark.implicits._
    // srcA: 9 tokens total, srcB: 1 token -> sqrt weights 3 : 1
    val docs = Seq(
      (1L, "srcA", "a b c d e f g h i"),
      (2L, "srcB", "z")
    ).toDF("doc_id", "source", "text")
    val out = Curation.mixturePlan(docs, budget = 100L).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("srcA")
    assert(a.getAs[Long]("n_tokens") == 9L)
    assert(a.getAs[Double]("natural_share") == 0.9)
    assert(a.getAs[Double]("target_share") == 0.75) // 3/(3+1)
    assert(a.getAs[Long]("planned_tokens") == 75L)
    // big source DAMPED: planned share below natural share
    assert(a.getAs[Double]("target_share") <
      a.getAs[Double]("natural_share"))
    assert(a.getAs[Double]("sample_rate") ==
      BigDecimal(75.0 / 9.0).setScale(12,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(a.getAs[Long]("epochs") == 9L) // ceil(8.33..)
    val b = out("srcB")
    assert(b.getAs[Long]("planned_tokens") == 25L)
    // small source BOOSTED, heavily upsampled
    assert(b.getAs[Double]("target_share") >
      b.getAs[Double]("natural_share"))
    assert(b.getAs[Double]("sample_rate") == 25.0)
    assert(b.getAs[Long]("epochs") == 25L)
    // smoothing never INVERTS the order: srcA still gets more tokens
    assert(a.getAs[Long]("planned_tokens") >
      b.getAs[Long]("planned_tokens"))
  }

  test("mixturePlanEffective (q222): duplicate mass carries no weight, " +
      "epochs divide the EFFECTIVE tokens, and a zero-survivor source " +
      "gets zero plan and NULL rate") {
    import spark.implicits._
    val docs = Seq(
      // srcA: an exact-dup pair — doc 1 survives, doc 2's mass drops
      (1L, "srcA", "a b c d"),
      (2L, "srcA", "a b c d"),
      // srcB: unique — full retention
      (3L, "srcB", "p q r s"),
      // srcC: its only doc duplicates doc 1 with a HIGHER id — every
      // token of the source is non-surviving
      (4L, "srcC", "a b c d")
    ).toDF("doc_id", "source", "text")
    val out = Curation.mixturePlanEffective(docs, budget = 100L)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("srcA"); val b = out("srcB"); val c = out("srcC")
    assert(a.getAs[Long]("n_tokens_raw") == 8L &&
      a.getAs[Long]("n_tokens_eff") == 4L &&
      a.getAs[Double]("token_retention") == 0.5)
    assert(b.getAs[Long]("n_tokens_eff") == 4L &&
      b.getAs[Double]("token_retention") == 1.0)
    assert(c.getAs[Long]("n_tokens_eff") == 0L &&
      c.getAs[Double]("token_retention") == 0.0)
    // weights sqrt(4)=2, sqrt(4)=2, sqrt(0)=0: the survivors split the
    // budget evenly, the dead source gets NOTHING
    assert(a.getAs[Double]("target_share") == 0.5 &&
      b.getAs[Double]("target_share") == 0.5 &&
      c.getAs[Double]("target_share") == 0.0)
    assert(a.getAs[Long]("planned_tokens") == 50L &&
      b.getAs[Long]("planned_tokens") == 50L &&
      c.getAs[Long]("planned_tokens") == 0L)
    // sample_rate divides the EFFECTIVE mass: 50/4 = 12.5 -> 13 epochs
    // (the raw-count plan would have claimed 50/8 -> 7 for srcA)
    assert(a.getAs[Double]("sample_rate") == 12.5 &&
      a.getAs[Long]("epochs") == 13L)
    assert(c.isNullAt(c.fieldIndex("sample_rate")) &&
      c.isNullAt(c.fieldIndex("epochs")),
      "a zero-survivor source must report NULL, not a division artifact")
  }
}
