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
}
