package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.NearDup

/** Streaming winnowing match detection — the incremental form of
  * NearDup.winnowMatches (x49) and the fourth member of the
  * incremental-dedup family (LSH text, cosine embedding, exact spans,
  * now guaranteed-run clone detection). Documents land as parquet;
  * each micro-batch:
  *
  *  1. computes its winnowing fingerprints (map-side, zero shuffle —
  *     the x49 selection);
  *  2. matches WITHIN the batch and AGAINST the accumulated
  *     fingerprint index by the same fp equi-join — cost ∝ batch
  *     fingerprints, never corpus text;
  *  3. appends the match report to `matchesPath` and the batch's
  *     fingerprints to the index, so the next batch probes an index
  *     that already covers this one.
  *
  * Parity theorem (pinned in StreamingSpec): with arrival-ordered
  * doc_ids and NO frequency cap, the UNION of per-batch match reports
  * EQUALS the batch winnowMatches of the concatenated corpus, pair
  * for pair including n_shared — fingerprints are a function of
  * content alone, and a pair (a, b) with a before b is fully visible
  * the moment b's batch processes (a's fingerprints are indexed, or
  * in the same batch). With a finite `maxFpFreq` the incremental run
  * evaluates the cap against the CORPUS-SO-FAR: a fingerprint that
  * only becomes boilerplate-hot in a later batch has already emitted
  * its early pairs, so incremental output is a SUPERSET of the
  * final-corpus batch run — the conservative direction for a dedup
  * candidate generator, documented rather than hidden.
  *
  * Exactly-once: both sinks write `batch=<id>` subdirectories with
  * mode Overwrite, and accumulated reads see only batches STRICTLY
  * EARLIER than the current batchId (StreamingDedup's layout) — a
  * replayed batch therefore probes exactly the index it saw the
  * first time, even when later batches have since committed, so the
  * frequency cap evaluates against the identical corpus-so-far and
  * replay is bit-exact in BOTH uncapped and capped modes (the r14
  * advisory: with current-id-only exclusion a capped replay saw the
  * later batches' fingerprints, tripped the cap early, and overwrote
  * its own dir with a subset of its original pairs). The later-id
  * guard on cross-matches is kept as belt-and-braces: under the
  * arrival-order contract every index doc id is already smaller than
  * every batch doc id, so it drops nothing in normal operation. */
object StreamingWinnow {

  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      matchesPath: String, fpIndexPath: String, k: Int, w: Int,
      minShared: Long, maxFpFreq: Long): Unit = {
    val s = batch.sparkSession
    val fps = NearDup.winnowFingerprintTable(batch.localCheckpoint(), k, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val index = StreamingDedup.readAccumulated(s, fpIndexPath, batchId)
    // the frequency cap counts the corpus-so-far: index df + batch df
    val combined = index match {
      case Some(ix) => ix.select(col("doc_id"), col("fp")).unionByName(fps)
      case None => fps
    }
    val rare = combined.groupBy(col("fp"))
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= maxFpFreq)
      .select(col("fp"))
    val cappedBatch = fps.join(rare, "fp")
    val within = cappedBatch.as("a")
      .join(cappedBatch.as("b"), col("a.fp") === col("b.fp"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
    // the batch doc must be the LATER id: under the arrival-order
    // contract this loses nothing, and it makes REPLAY exact — a
    // replayed batch sees later batches' fingerprints in the index,
    // and without this guard it would re-emit pairs those batches
    // already own (its own docs all carry smaller ids, so the guard
    // drops exactly the foreign pairs)
    val cross = index match {
      case Some(ix) =>
        val cappedIx = ix.select(col("doc_id"), col("fp")).join(rare, "fp")
        cappedIx.as("a").join(cappedBatch.as("b"),
            col("a.fp") === col("b.fp"))
          .filter(col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      case None => within.limit(0)
    }
    within.unionByName(cross)
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .write.mode("overwrite")
      .parquet(StreamingDedup.subdir(matchesPath, batchId))
    fps.write.mode("overwrite")
      .parquet(StreamingDedup.subdir(fpIndexPath, batchId))
    fps.unpersist(blocking = false)
  }

  /** Run one AvailableNow pass over a landing directory of parquet
    * document files. `schema` must cover (doc_id LONG, text STRING). */
  def runAvailableNow(spark: SparkSession, landingDir: String,
      matchesPath: String, fpIndexPath: String, checkpointDir: String,
      schema: org.apache.spark.sql.types.StructType, k: Int = 3,
      w: Int = 4, minShared: Long = 2L, maxFpFreq: Long = 256L)
      : StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(landingDir)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          processBatch(batch, batchId, matchesPath, fpIndexPath,
            k, w, minShared, maxFpFreq)
      }
      .start()
    q.awaitTermination()
    q
  }
}
