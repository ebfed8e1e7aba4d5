package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Curation, NearDup, TextOps}

/** Streaming corpus ingestion with INCREMENTAL near-dup dedup — the
  * continuous form of the daily-batch shape in
  * NearDup.minHashLshPairsAgainst (SURVEY §2.10a L27): documents land as
  * parquet files, and each micro-batch is
  *
  *  1. deduplicated WITHIN itself (LSH pairs → connected components →
  *     canonical survivor — the batch-local q49 pipeline; a batch is
  *     small, so this is cheap), then
  *  2. probed against the ACCUMULATED corpus via its persisted LSH band
  *     index — cost ∝ batch, never corpus², and corpus text is only
  *     re-shingled for verification candidates — then
  *  3. the surviving novel documents are appended to the corpus
  *     alongside their band-index rows, so the next batch probes an
  *     index that already covers this one.
  *
  * Exactly-once: every output is written to a `batch=<id>`
  * subdirectory with mode Overwrite, so a replayed micro-batch (crash
  * between the two writes, checkpoint retry) overwrites its own output
  * instead of duplicating it — the standard idempotent-foreachBatch
  * layout. Readers take the union of subdirectories
  * (recursiveFileLookup), which is also how this runner reads the
  * corpus back for probing.
  *
  * At 100 TB the corpus/band paths are object-storage prefixes; the
  * band index is the thing that makes this sustainable — the full
  * corpus text is never re-scanned per batch (only candidate
  * verification touches it, by doc_id equi-join).
  */
object StreamingDedup {

  private[streaming] def subdir(root: String, batchId: Long): String =
    s"$root/batch=$batchId"

  /** Accumulated state = the union of every batch subdirectory EXCEPT
    * the one being (re)written. Excluding the current batchId is what
    * makes replay idempotent: a replayed batch must never see its own
    * prior (possibly partial) output as "the corpus", or it would flag
    * every one of its docs as a self-duplicate and overwrite the batch
    * dir with an empty result. Listing goes through the Hadoop
    * FileSystem of the path (java.io.File would silently report
    * non-local prefixes — s3://, hdfs:// — as absent and skip corpus
    * dedup entirely). */
  private[streaming] def readAccumulated(spark: SparkSession, root: String,
      excludeBatchId: Long): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(root)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) None
    else {
      val parts = fs.listStatus(path).toSeq
        .filter(_.isDirectory)
        .map(_.getPath)
        .filter(_.getName != s"batch=$excludeBatchId")
        // Hadoop hidden-path convention: compaction stages its
        // consolidated output under a _-prefixed dir; readers must
        // never see an in-flight staging copy
        .filterNot(p => p.getName.startsWith("_") ||
          p.getName.startsWith("."))
        .map(_.toString)
      if (parts.isEmpty) None
      else Some(spark.read
        .option("recursiveFileLookup", "true")
        .parquet(parts: _*))
    }
  }

  /** Compact the accumulated `batch=<id>` layout: fold every CLOSED
    * batch directory except the newest into a single consolidated
    * directory under the smallest folded id — the small-file answer
    * for long-running ingestion (thousands of tiny per-batch files
    * otherwise dominate listing + scan setup at 100 TB).
    *
    * Correctness under the exactly-once layout:
    *  - the newest batch dir is NEVER folded — it is the only one a
    *    checkpoint retry can replay, and replay overwrites its own
    *    `batch=<id>` dir, which must still exist as written;
    *  - folded data keeps a real `batch=<minId>` name, and
    *    readAccumulated excludes only the CURRENT batch id (always
    *    newer than every folded id), so compacted rows are never
    *    accidentally excluded;
    *  - the consolidated copy is staged under a _-prefixed dir
    *    (hidden from readAccumulated) and swapped in by delete+rename;
    *    a crash before the rename loses no source dirs, a crash after
    *    the deletes but before the rename leaves the data recoverable
    *    in the staging dir (the narrow non-atomic window object
    *    stores impose without a manifest — same trade as Upsert's
    *    snapshot swap).
    *
    * Returns the number of directories folded (0 = nothing to do). */
  def compactAccumulated(spark: SparkSession, root: String,
      targetPartitions: Int = 1): Int = {
    val path = new org.apache.hadoop.fs.Path(root)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) return 0
    val batchIds = fs.listStatus(path).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .sorted
    if (batchIds.length <= 2) return 0
    val fold = batchIds.dropRight(1)
    val staging = new org.apache.hadoop.fs.Path(root, "_compacting")
    fs.delete(staging, true)
    spark.read
      .option("recursiveFileLookup", "true")
      .parquet(fold.map(id => subdir(root, id)): _*)
      .coalesce(targetPartitions)
      .write.mode("overwrite").parquet(staging.toString)
    fold.foreach(id =>
      fs.delete(new org.apache.hadoop.fs.Path(subdir(root, id)), true))
    fs.rename(staging,
      new org.apache.hadoop.fs.Path(subdir(root, fold.min)))
    fold.length
  }

  /** Dedup one closed batch against itself and (if present) the
    * accumulated corpus; returns the novel canonical documents. Pure
    * batch logic — shared by the foreachBatch body and direct callers. */
  private[streaming] def novelDocs(batch: DataFrame,
      corpus: Option[DataFrame], corpusBands: Option[DataFrame],
      n: Int, numHashes: Int, bands: Int, minJ: Double): DataFrame = {
    val inBatchPairs =
      NearDup.minHashLshPairs(batch, n, numHashes, bands, minJ)
        .select(col("a_id"), col("b_id"))
    val canon = NearDup.dedupByClusters(batch,
      NearDup.duplicateClusters(inBatchPairs))
    corpus match {
      case None => canon
      case Some(c) =>
        val dupOfCorpus = NearDup.minHashLshPairsAgainst(
          canon, c, corpusBands, n, numHashes, bands, minJ)
          .select(col("new_id").as("doc_id")).distinct()
        canon.join(dupOfCorpus, Seq("doc_id"), "left_anti")
    }
  }

  /** Run one AvailableNow pass over a landing directory of parquet
    * document files: land → in-batch dedup → corpus probe → append
    * novel docs + their band rows. Returns after the pass completes.
    * `schema` must cover at least (doc_id LONG, text STRING). */
  def runAvailableNow(spark: SparkSession, landingDir: String,
      corpusPath: String, bandIndexPath: String, checkpointDir: String,
      schema: org.apache.spark.sql.types.StructType,
      n: Int = 3, numHashes: Int = 64, bands: Int = 16,
      minJ: Double = 0.7,
      qualityFilter: Option[DataFrame => DataFrame] = None)
      : StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(landingDir)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          processBatch(batch, batchId, corpusPath, bandIndexPath,
            n, numHashes, bands, minJ, qualityFilter)
      }
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming form of Curation.pipeline — full parity with the batch
    * curation order (gate → scrub → dedup → pack):
    *
    *  - per micro-batch, Curation.prepare applies the SAME quality gate
    *    and in-place PII scrub the batch pipeline runs (scrub before
    *    dedup, so docs differing only in redacted PII collapse), then
    *    the incremental LSH dedup ingests the survivors;
    *  - after the AvailableNow pass drains, the ACCUMULATED canonical
    *    corpus is packed. Packing runs over the final state rather than
    *    per batch for the same reason the batch pipeline packs LAST:
    *    pack assignment is a whole-corpus, order-sensitive prefix sum —
    *    a per-batch packing would renumber every time a later batch
    *    lands. (For a corpus too large to renumber, packSequencesSharded
    *    bounds the blast radius to a shard.)
    *
    * Returns the packed assignment over the accumulated corpus; with
    * the same documents and batch split ordered by doc_id, its rows
    * equal Curation.pipeline's (StreamingSpec pins the equality). */
  def runCurationAvailableNow(spark: SparkSession, landingDir: String,
      corpusPath: String, bandIndexPath: String, checkpointDir: String,
      schema: org.apache.spark.sql.types.StructType,
      packTokens: Long = 256L, n: Int = 3, numHashes: Int = 64,
      bands: Int = 16, minJ: Double = 0.7): DataFrame = {
    runAvailableNow(spark, landingDir, corpusPath, bandIndexPath,
      checkpointDir, schema, n, numHashes, bands, minJ,
      qualityFilter = Some(Curation.prepare(_)))
    val corpus = readAccumulated(spark, corpusPath, excludeBatchId = -1L)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    TextOps.packSequences(corpus, packTokens)
  }

  /** One micro-batch's work — extracted so replay idempotence is
    * directly testable (calling this twice with the same batchId must
    * leave the same corpus). The accumulated reads EXCLUDE this
    * batchId's own subdirectories (see readAccumulated). */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      corpusPath: String, bandIndexPath: String, n: Int, numHashes: Int,
      bands: Int, minJ: Double,
      qualityFilter: Option[DataFrame => DataFrame] = None): Unit = {
    val s = batch.sparkSession
    // the batch is consumed by several joins below — pin it so the
    // streaming source isn't re-planned per consumer. The quality
    // pre-filter (e.g. TextOps.filterQuality) runs BEFORE the pin — the
    // standard curation order: rejected docs never reach dedup, the
    // corpus, or the band index (shrinking every later batch's probe
    // work), and checkpointing the FILTERED frame means the gate runs
    // once instead of per consumer and junk rows are never materialized
    val pinned = qualityFilter.map(f => f(batch)).getOrElse(batch)
      .localCheckpoint()
    val novel = novelDocs(pinned,
      readAccumulated(s, corpusPath, batchId),
      readAccumulated(s, bandIndexPath, batchId),
      n, numHashes, bands, minJ)
      .localCheckpoint() // bands below must see the SAME survivors
    novel.write.mode("overwrite")
      .parquet(subdir(corpusPath, batchId))
    NearDup.bandTable(novel, n, numHashes, bands)
      .write.mode("overwrite")
      .parquet(subdir(bandIndexPath, batchId))
  }
}
