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

  /** Accumulated state = the union of every batch subdirectory whose
    * id is STRICTLY EARLIER than `excludeBatchId` (pass -1 to read
    * everything — the non-replay reader path). Excluding the current
    * batchId is what makes replay idempotent: a replayed batch must
    * never see its own prior (possibly partial) output as "the
    * corpus", or it would flag every one of its docs as a
    * self-duplicate and overwrite the batch dir with an empty result.
    * Excluding LATER ids too (not merely the current one — the r14
    * advisory) is what makes replay bit-exact under a finite
    * frequency cap: a batch replayed after later batches committed
    * otherwise evaluates its cap/dedup against an index that includes
    * those later batches and overwrites its own `batch=<id>` dir with
    * a SUBSET of the pairs it originally emitted. Strictly-earlier
    * reads reconstruct exactly the original prior state. Compaction
    * stays compatible: folded dirs keep `batch=<minFoldedId>` names,
    * and the newest (only replayable) batch is never folded, so every
    * folded id is strictly earlier than any id a retry can replay.
    * Listing goes through the Hadoop FileSystem of the path
    * (java.io.File would silently report non-local prefixes — s3://,
    * hdfs:// — as absent and skip corpus dedup entirely). */
  private[streaming] def readAccumulated(spark: SparkSession, root: String,
      excludeBatchId: Long): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(root)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) None
    else {
      val parts = fs.listStatus(path).toSeq
        .filter(_.isDirectory)
        .map(_.getPath)
        .filter { p =>
          // keep only strictly-earlier batch ids (see scaladoc); a
          // non-batch= dir name never matches the layout and is kept
          // for the hidden-prefix filter below to adjudicate
          excludeBatchId < 0 || {
            val n = p.getName
            !n.startsWith("batch=") ||
              scala.util.Try(n.stripPrefix("batch=").toLong)
                .toOption.forall(_ < excludeBatchId)
          }
        }
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
    *    (hidden from readAccumulated) and swapped in by delete+rename.
    *    The swap is crash-safe via a fold MANIFEST written into the
    *    staging dir after the parquet write: on entry, a staging dir
    *    carrying both _SUCCESS and the manifest whose source batch
    *    dirs are (even partly) already deleted is the ONLY complete
    *    copy of the folded data, so the interrupted swap is COMPLETED
    *    (remaining sources deleted, staging renamed into place)
    *    instead of the staging copy being discarded; a staging dir
    *    whose sources are all intact — or with no _SUCCESS/manifest —
    *    is redundant (possibly stale or partial) and is the only case
    *    that gets deleted.
    *
    * Returns the number of directories folded (0 = nothing to do). */
  def compactAccumulated(spark: SparkSession, root: String,
      targetPartitions: Int = 1): Int = {
    val path = new org.apache.hadoop.fs.Path(root)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) return 0
    val staging = new org.apache.hadoop.fs.Path(root, "_compacting")
    // Crash recovery BEFORE anything else: never delete the staging
    // dir while it may be the only copy of previously-folded data.
    if (fs.exists(staging)) {
      readFoldManifest(fs, staging) match {
        case Some(ids) if fs.exists(
            new org.apache.hadoop.fs.Path(staging, "_SUCCESS")) &&
            ids.exists(id => !fs.exists(
              new org.apache.hadoop.fs.Path(subdir(root, id)))) =>
          // prior run crashed mid-swap (some sources already gone):
          // the staging copy is the only complete one — finish the
          // swap, then fall through to (maybe) fold newer batches
          completeSwap(fs, root, staging, ids)
        case _ =>
          // sources all intact (crash before any delete) or staging
          // incomplete (no _SUCCESS / no manifest): the staging copy
          // is redundant or partial — safe to discard
          fs.delete(staging, true)
      }
    }
    // list AFTER recovery so a just-recovered batch=<minId> is seen
    val batchIds = fs.listStatus(path).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .sorted
    if (batchIds.length <= 2) return 0
    val fold = batchIds.dropRight(1)
    spark.read
      .option("recursiveFileLookup", "true")
      .parquet(fold.map(id => subdir(root, id)): _*)
      .coalesce(targetPartitions)
      .write.mode("overwrite").parquet(staging.toString)
    writeFoldManifest(fs, staging, fold)
    completeSwap(fs, root, staging, fold)
    fold.length
  }

  /** Fold manifest: the batch ids a staging copy was built from, one
    * per line, under a _-prefixed name (invisible to parquet readers).
    * Written AFTER the parquet write — its presence together with
    * _SUCCESS means "staging holds a complete copy of exactly these
    * batch dirs", which is what recovery keys on. */
  private val FoldManifestName = "_GRAFT_FOLD"

  private[streaming] def writeFoldManifest(
      fs: org.apache.hadoop.fs.FileSystem,
      staging: org.apache.hadoop.fs.Path, ids: Seq[Long]): Unit = {
    val out = fs.create(
      new org.apache.hadoop.fs.Path(staging, FoldManifestName), true)
    try out.write(ids.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  private[streaming] def readFoldManifest(
      fs: org.apache.hadoop.fs.FileSystem,
      staging: org.apache.hadoop.fs.Path): Option[Seq[Long]] = {
    val p = new org.apache.hadoop.fs.Path(staging, FoldManifestName)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(buf)
        val txt = new String(buf, "UTF-8")
        Some(txt.split("\n").toSeq.filter(_.nonEmpty).map(_.trim.toLong))
      } finally in.close()
    }
  }

  /** Second half of the compaction swap — delete the folded source
    * dirs, then rename staging into place as batch=<minId>. Idempotent
    * (already-deleted sources are skipped), so it serves both the
    * normal path and crash recovery. The rename RESULT is checked:
    * HDFS-style filesystems report some failures as `false` rather
    * than an exception, and ignoring that would leave the folded rows
    * invisible to readAccumulated (hidden _-dir) after their sources
    * were already deleted — silent data loss. On a false return the
    * manifest is still in the staging dir, so a retry re-enters
    * recovery and tries the swap again. */
  private[streaming] def completeSwap(fs: org.apache.hadoop.fs.FileSystem,
      root: String, staging: org.apache.hadoop.fs.Path,
      ids: Seq[Long]): Unit = {
    ids.foreach(id =>
      fs.delete(new org.apache.hadoop.fs.Path(subdir(root, id)), true))
    val dest = new org.apache.hadoop.fs.Path(subdir(root, ids.min))
    if (!fs.rename(staging, dest))
      sys.error(s"compactAccumulated: rename $staging -> $dest returned " +
        "false; folded data preserved in the staging dir — re-run to retry")
    // the manifest rides THROUGH the rename (deleting it earlier would
    // reopen the loss window: a crash between manifest-delete and
    // rename leaves an unidentifiable staging dir that recovery would
    // discard) and is removed from the destination afterwards — purely
    // cosmetic there (recovery only ever looks under _compacting, and
    // parquet readers ignore _-prefixed files), so best-effort
    fs.delete(new org.apache.hadoop.fs.Path(dest, FoldManifestName),
      false)
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
    * leave the same corpus). The accumulated reads see only batches
    * STRICTLY EARLIER than this batchId (see readAccumulated) — a
    * replay reconstructs exactly its original prior state even after
    * later batches commit. (Survivor symmetry already protected this
    * job under the old current-id-only exclusion: a later survivor is
    * by definition not a near-dup of any earlier corpus doc, so an
    * earlier batch's replay could never match one — the strictly-
    * earlier read makes the property structural.) */
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
