package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.VectorOps

/** Streaming EMBEDDING ingestion with incremental cosine near-dup
  * dedup — the vector-space twin of StreamingDedup (SURVEY L58 over
  * L13/L27's layout): embedding rows land as parquet files, and each
  * micro-batch is
  *
  *  1. deduplicated WITHIN itself (cosine-LSH pairs → connected
  *     components → canonical min-id survivor — dedupEmbeddings'
  *     default path; a batch is small, so this is cheap), then
  *  2. probed against the ACCUMULATED corpus via its persisted
  *     hyperplane band index (cosineLshJoinAgainst — cost ∝ batch,
  *     never corpus²; corpus embeddings are only joined for candidate
  *     verification), then
  *  3. surviving novel vectors append to the corpus alongside their
  *     band rows (hyperplaneBandTable), so the next batch probes an
  *     index that already covers this one.
  *
  * Exactly-once follows StreamingDedup's idempotent-foreachBatch
  * layout verbatim: every output lands in a `batch=<id>` subdirectory
  * with mode Overwrite, and the accumulated read EXCLUDES the batch
  * being (re)written, so a checkpoint-retry replay overwrites its own
  * output instead of duplicating it or self-deduplicating to nothing.
  *
  * At 100 TB the band index is what makes this sustainable: the full
  * embedding corpus is never re-hashed per batch — band signatures are
  * computed once at ingestion and persisted as plain parquet.
  */
object StreamingEmbeddingDedup {

  /** Dedup one closed batch against itself and (if present) the
    * accumulated corpus; returns the novel canonical vectors. Pure
    * batch logic — shared by the foreachBatch body and direct callers. */
  private[streaming] def novelVectors(batch: DataFrame,
      corpus: Option[DataFrame], corpusBands: Option[DataFrame],
      threshold: Double, bands: Int, rowsPerBand: Int): DataFrame = {
    val canon = VectorOps.dedupEmbeddings(batch, threshold,
      pairs = Some(VectorOps.cosineLshJoin(batch, threshold, bands,
        rowsPerBand)))
    corpus match {
      case None => canon
      case Some(c) =>
        val dupOfCorpus = VectorOps.cosineLshJoinAgainst(canon, c,
          threshold, corpusBands, bands, rowsPerBand)
          .select(col("new_id").as("vec_id")).distinct()
        canon.join(dupOfCorpus, Seq("vec_id"), "left_anti")
    }
  }

  /** Run one AvailableNow pass over a landing directory of parquet
    * embedding files: land → in-batch dedup → corpus probe → append
    * novel vectors + their band rows. Returns after the pass completes.
    * `schema` must cover at least (vec_id LONG, embedding ARRAY<FLOAT>). */
  def runAvailableNow(spark: SparkSession, landingDir: String,
      corpusPath: String, bandIndexPath: String, checkpointDir: String,
      schema: org.apache.spark.sql.types.StructType,
      threshold: Double = 0.9, bands: Int = 12, rowsPerBand: Int = 3)
      : StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(landingDir)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          processBatch(batch, batchId, corpusPath, bandIndexPath,
            threshold, bands, rowsPerBand)
      }
      .start()
    q.awaitTermination()
    q
  }

  /** End-to-end ingestion surface (the x23 entry): split a static
    * embeddings table into two landing drops by vec_id parity, run one
    * AvailableNow pass after each (two real micro-batches through the
    * checkpointed stream — batch 2 probes the band index batch 1
    * persisted), and return the accumulated deduped corpus. Fresh temp
    * dirs per call so bench/verify re-runs are independent. The
    * replay-idempotence and batch-parity properties of the underlying
    * runner are pinned in StreamingSpec. */
  def ingestStatic(spark: SparkSession, emb: DataFrame,
      threshold: Double = 0.9): DataFrame = {
    // scratch lifecycle: the returned corpus frame reads LAZILY from
    // these dirs, so they must survive the call — Scratch deletes them
    // at JVM exit instead of leaking across bench/verify runs
    val base = Scratch.scratch("graft_emb_ingest")
    val landing = base + "/landing"
    val corpus = base + "/corpus"
    val bandIdx = base + "/bands"
    val ckpt = base + "/ckpt"
    emb.filter(col("vec_id") % 2 === 0)
      .write.mode("append").parquet(landing)
    runAvailableNow(spark, landing, corpus, bandIdx, ckpt, emb.schema,
      threshold)
    emb.filter(col("vec_id") % 2 =!= 0)
      .write.mode("append").parquet(landing)
    runAvailableNow(spark, landing, corpus, bandIdx, ckpt, emb.schema,
      threshold)
    spark.read.option("recursiveFileLookup", "true").parquet(corpus)
      .orderBy(col("vec_id"))
  }

  /** End-to-end MAINTENANCE surface (the x26 entry): the full
    * lifecycle a long-running vector store actually exercises, in
    * order —
    *
    *  1. ingest three micro-batches (vec_id mod 3 splits) through the
    *     checkpointed dedup stream;
    *  2. after batch 1, train the IVF codebook on the accumulated
    *     corpus and build the materialized bucket-partitioned index
    *     (writeIvfIndex);
    *  3. after each later batch, append ONLY that batch's novel
    *     vectors to the index against the FIXED codebook
    *     (appendToIvfIndex — ingestion ∝ batch, never a re-index);
    *  4. compact the corpus's accumulated `batch=<id>` layout
    *     (StreamingDedup.compactAccumulated — the small-file answer;
    *     with three closed batch dirs it folds the two oldest);
    *  5. search the appended index (annIvfIndexed — dynamic partition
    *     pruning over the probed buckets) for the corpus's five
    *     smallest vec_ids.
    *
    * Returns the search result (q_id, n_id, cosine, rank) — the
    * driver's rows-only gate proves the maintained index still
    * answers; StreamingSpec pins the sharp property (search over
    * append+compact == search over a from-scratch rebuild of the same
    * corpus). Engine-seeded layout + temp dirs → no SQL oracle.
    *
    * Measurement: each lifecycle stage's wall time lands in
    * target/stage_journal.jsonl (StageJournal) — the bench entry's
    * composite number is only attributable with the breakdown; the
    * returned search frame is lazy, so its cost is the entry wall
    * minus the journaled stages. */
  def maintainStatic(spark: SparkSession, emb: DataFrame,
      threshold: Double = 0.9, k: Int = 5, nprobe: Int = 2): DataFrame = {
    // scratch lifecycle: see ingestStatic — deleted at JVM exit
    val base = Scratch.scratch("graft_emb_maint")
    val landing = base + "/landing"
    val corpus = base + "/corpus"
    val bandIdx = base + "/bands"
    val ckpt = base + "/ckpt"
    val index = base + "/ivf"
    val stages = scala.collection.mutable.Buffer.empty[(String, Double)]
    def timed[A](name: String)(f: => A): A =
      graft.StageJournal.time(stages, name)(f)
    def drop(mod: Int): Unit = {
      emb.filter(col("vec_id") % 3 === mod)
        .write.mode("append").parquet(landing)
      runAvailableNow(spark, landing, corpus, bandIdx, ckpt, emb.schema,
        threshold)
    }
    def batchDir(id: Long): DataFrame =
      spark.read.parquet(StreamingDedup.subdir(corpus, id))
    timed("ingest_b0")(drop(0))
    // codebook trained ONCE on the initial corpus, then held fixed —
    // the append==rebuild identity requires a shared codebook (the
    // standard IVF maintenance contract; retrain+rebuild is the
    // documented drift cadence, not part of the steady-state path)
    val centroids = timed("train_codebook")(
      VectorOps.labelCentroids(batchDir(0L)).localCheckpoint())
    timed("index_build")(VectorOps.writeIvfIndex(batchDir(0L), centroids,
      index))
    timed("ingest_b1")(drop(1))
    timed("index_append_b1")(
      VectorOps.appendToIvfIndex(batchDir(1L), centroids, index))
    timed("ingest_b2")(drop(2))
    timed("index_append_b2")(
      VectorOps.appendToIvfIndex(batchDir(2L), centroids, index))
    timed("compact")(StreamingDedup.compactAccumulated(spark, corpus))
    val corpusAll = spark.read
      .option("recursiveFileLookup", "true").parquet(corpus)
    // bounded metadata: five query ids off the corpus head (the same
    // allowance as the IVF probe set)
    val queryIds = timed("query_ids")(corpusAll.select(col("vec_id"))
      .orderBy(col("vec_id")).limit(k)
      .collect().map(_.getLong(0)).toSeq)
    graft.StageJournal.record("x26_vector_store_maintenance",
      stages.toSeq)
    VectorOps.annIvfIndexed(spark, index, corpusAll, queryIds, k,
      nprobe, centroids)
  }

  /** One micro-batch's work — extracted so replay idempotence is
    * directly testable. Accumulated reads EXCLUDE this batchId's own
    * subdirectories (StreamingDedup.readAccumulated's contract). */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      corpusPath: String, bandIndexPath: String, threshold: Double,
      bands: Int, rowsPerBand: Int): Unit = {
    val s = batch.sparkSession
    // pin the streamed batch: it feeds the LSH self-join, the corpus
    // probe and the final anti-join
    val pinned = batch.localCheckpoint()
    val novel = novelVectors(pinned,
      StreamingDedup.readAccumulated(s, corpusPath, batchId),
      StreamingDedup.readAccumulated(s, bandIndexPath, batchId),
      threshold, bands, rowsPerBand)
      .localCheckpoint() // band rows below must see the SAME survivors
    novel.write.mode("overwrite")
      .parquet(StreamingDedup.subdir(corpusPath, batchId))
    VectorOps.hyperplaneBandTable(novel, bands, rowsPerBand)
      .write.mode("overwrite")
      .parquet(StreamingDedup.subdir(bandIndexPath, batchId))
  }
}
