package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end curation pipeline a training-data run actually
  * executes, composed from the operators this engine exposes — in the
  * standard order (each stage shrinks or canonicalizes the next
  * stage's input):
  *
  *   0. canonicalization (TextOps.markupCleanText — tag strip + entity
  *      decode; then functions.NormalizeText — control-strip +
  *      whitespace-collapse + Unicode NFC): every later stage measures
  *      and hashes ONE byte form per logical character — without NFC,
  *      a composed/decomposed pair of the same document can never
  *      dedup (their shingle hashes differ),
  *   1. quality filter (TextOps.filterQuality — map-side rule flags;
  *      rejects never reach anything expensive),
  *   2. PII scrub (TextOps.piiCleanText rewriting `text` in place —
  *      map-side codegen'd regexps),
  *   3. near-dup dedup on the SCRUBBED text (MinHash+LSH pairs →
  *      connected components → canonical min-id survivor — the q49
  *      pipeline on its scale path; scrubbing first means two docs
  *      differing only in redacted PII dedup as the near-dups they
  *      are),
  *   4. sequence packing (TextOps.packSequences — per-source token
  *      streams cut into fixed packs).
  *
  * Registered as x15: hashes are engine-seeded (rows-only in the
  * oracle); stage-consistency properties live in CurationSpec. At
  * 100 TB every stage keeps its own scale shape (documented at each
  * operator) and the composition adds no new shuffle beyond the
  * stages' own.
  */
object Curation {

  /** Stages 0–2 (canonicalize, quality gate, in-place PII scrub) as one
    * map-side transform — the SHARED front half of the batch pipeline
    * and of the streaming ingestion path
    * (StreamingDedup.runCurationAvailableNow applies this per
    * micro-batch, so streaming and batch curation run the identical
    * stages in the identical order: normalize BEFORE the gate so rule
    * statistics measure canonical text, scrub AFTER the gate so rule
    * statistics see un-redacted text, scrub BEFORE dedup so docs
    * differing only in redacted PII collapse as near-dups). */
  def prepare(docs: DataFrame): DataFrame =
    TextOps.filterQuality(
      docs.withColumn("text",
        graft.functions.GraftFunctions.normalizeText(
          TextOps.markupCleanText(col("text")))))
      .withColumn("text", TextOps.piiCleanText(col("text")))

  def pipeline(docs: DataFrame, packTokens: Long = 256L,
      minJ: Double = 0.7, bands: Int = 16): DataFrame = {
    // persisted: the scrubbed frame feeds three plan consumers (LSH
    // signatures, candidate verification re-shingle, final anti-join) —
    // without it the gate + four-regex scrub re-run per consumer (same
    // bounded cache-lifecycle note as NearDup.minHashLshPairs)
    val scrubbed = prepare(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = NearDup
      .minHashLshPairs(scrubbed, bands = bands, minJ = minJ)
      .select(col("a_id"), col("b_id"))
    val deduped = NearDup.dedupByClusters(scrubbed,
      NearDup.duplicateClusters(pairs))
    TextOps.packSequences(deduped, packTokens)
  }
}
