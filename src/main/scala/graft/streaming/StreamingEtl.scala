package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.etl.Curate
import graft.operators.Upsert

/** Structured Streaming variant of the ETL pipeline (SURVEY §2.10 — the
  * reference lists "Real-time Processing" as future work; here the SAME
  * curation plan runs incrementally): a landing directory of raw page
  * JSON files is the stream source, curation is the identical stateless
  * explode/project/validate plan, in-stream dedup uses a watermark, and
  * the sink is the same merge (via foreachBatch, so each micro-batch
  * upserts transactionally into the snapshot).
  *
  * `Trigger.AvailableNow` turns the stream into an incremental batch:
  * process everything new since the last checkpoint, then stop — the
  * scheduled-daily semantics of the reference with exactly-once file
  * tracking for free. At scale the landing dir is object storage and
  * maxFilesPerTrigger bounds micro-batch size.
  */
object StreamingEtl {

  /** Raw page payload stream: one row per landed file (wholetext — a
    * page payload is one JSON document, not JSON-lines). */
  def pageFileStream(spark: SparkSession, landingDir: String): DataFrame =
    spark.readStream
      .format("text")
      .option("wholetext", "true")
      .load(landingDir)
      .select(col("value").as("payload"))

  /** The shared curation plan over the stream — stateless, so it runs
    * identically in batch and streaming. */
  def curatedStream(spark: SparkSession, landingDir: String): DataFrame =
    Curate(Curate.fromPayloads(pageFileStream(spark, landingDir)))

  /** In-stream key dedup: drop repeats of position_uri arriving within
    * the watermark horizon (state is bounded by the watermark — the
    * streaming twin of the batch first-wins dedup). */
  def dedupedStream(curated: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    curated
      .withWatermark("extracted_at", watermark)
      .dropDuplicatesWithinWatermark(Seq("position_uri"))

  /** Run one AvailableNow pass: land → curate → dedup → merge into the
    * parquet snapshot. Returns after the pass completes. */
  def runAvailableNow(spark: SparkSession, landingDir: String,
      targetPath: String, checkpointDir: String): StreamingQuery = {
    val q = dedupedStream(curatedStream(spark, landingDir))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          Upsert.mergeParquet(batch.sparkSession, batch, targetPath,
            "position_uri"): Unit
      }
      .start()
    q.awaitTermination()
    q
  }
}
