package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Layout

/** Streaming incremental Z-order maintenance: drain a landing
  * directory of parquet delta files into a `zOrderWriteIndexed` table
  * via foreachBatch → `Layout.zOrderAppend` — clustered-table
  * ingestion as a STREAM. Each micro-batch pays exactly the x44 cost
  * (map-side coding against the frozen cut grid, footer-metadata
  * dirty-tile selection, delta + dirty-tile rewrite), so steady-state
  * ingestion cost ∝ batch + touched tiles, never the table; and each
  * batch lands as ONE manifest commit, so a reader through
  * `readZOrdered` sees a consistent snapshot at every instant — the
  * batch either fully visible or fully absent, never partial.
  *
  * Exactly-once under replay: Spark re-runs a micro-batch whose
  * foreachBatch completed but whose checkpoint commit didn't land
  * (the standard at-least-once seam). `zOrderAppend` is NOT naturally
  * idempotent (a replayed append would duplicate rows), so each batch
  * commits with `tag = "batch-<id>"` INSIDE the manifest's atomic
  * rename, and the body skips any batch whose id already equals
  * `Layout.lastCommitTag` — "tag visible" and "rows visible" cannot
  * diverge, because they are the same rename. Compaction carries the
  * tag forward, so running `zOrderCompact` between batches does not
  * blind the guard. Single writer (this stream) per table, as
  * everywhere in the Layout commit protocol.
  */
object StreamingZOrder {

  /** One micro-batch's work — extracted so replay idempotence is
    * directly testable: a second call with the same batchId is a
    * provable no-op. */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      tablePath: String): Unit = {
    val spark = batch.sparkSession
    val tag = s"batch-$batchId"
    if (!batch.isEmpty &&
        !Layout.lastCommitTag(spark, tablePath).contains(tag)) {
      Layout.zOrderAppend(spark, batch, tablePath, Some(tag))
      ()
    }
  }

  /** Run one AvailableNow pass: every delta file in `landingDir`
    * appends into the maintained table, one manifest commit per
    * micro-batch. Returns after the pass drains. `schema` must cover
    * the table's payload columns (the z_code is derived per batch
    * from the frozen cuts). */
  def runAvailableNow(spark: SparkSession, landingDir: String,
      tablePath: String, checkpointDir: String,
      schema: org.apache.spark.sql.types.StructType): StreamingQuery = {
    val q = spark.readStream.schema(schema).parquet(landingDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, tablePath)
      }
      .start()
    q.awaitTermination()
    q
  }
}
