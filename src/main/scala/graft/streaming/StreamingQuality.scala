package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Classifier

/** Streaming quality-gate monitor — q185's streaming twin: each
  * arriving micro-batch of documents is scored by the linear quality
  * model AT THE DOOR and a ledger row (docs, pass count, pass rate,
  * mean score, alert flag) is appended before the batch proceeds into
  * curation. The operational question it answers: did a crawler
  * regression / format change just flood the pipe with junk? A
  * pass-rate collapse fires the alert on the batch that caused it, not
  * after the corpus is poisoned.
  *
  * Scale notes: the per-batch audit is ONE bounded aggregate (three
  * numbers) over the batch — the score is a map-side expression
  * (q185's exact decimal chain), so monitor cost is a count(*)-shaped
  * pass per batch and ledger state is |batches| metadata rows. The
  * monitor holds NO cross-batch state (each batch audited
  * independently against the fixed threshold), so it runs indefinitely.
  */
object StreamingQuality {

  /** One micro-batch's ledger row. */
  case class QualityBatch(batch_id: Long, n_docs: Long, n_pass: Long,
      pass_rate: Double, mean_score: Double, alert: Boolean)

  /** One micro-batch's audit — extracted so StreamingSpec can pin
    * ledger == direct computation on a slice. Empty batches audit as
    * zero-rate alerts (a silent pipe is an incident too). */
  private[streaming] def auditBatch(batch: DataFrame, batchId: Long,
      minPassRate: Double): QualityBatch = {
    val r = batch
      .select(Classifier.scoreColumn().as("_s"))
      .agg(count(lit(1)).as("n"),
        count(when(col("_s") > 0, lit(1))).as("p"),
        sum(col("_s")).as("ss"))
      .head()
    val n = r.getAs[Long]("n")
    val p = r.getAs[Long]("p")
    def r12(v: Double): Double =
      BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_EVEN)
        .toDouble
    val rate = if (n == 0) 0.0 else p.toDouble / n
    val mean =
      if (n == 0) 0.0
      else r.getDecimal(2).doubleValue() / n
    QualityBatch(batchId, n, p, r12(rate), r12(mean),
      rate < minPassRate)
  }

  /** Static harness (the x38 entry): the documents table replayed in
    * `nBatches` deterministic doc_id-mod drops, each a checkpointed
    * AvailableNow micro-batch (one file per drop + maxFilesPerTrigger=1
    * — the enforced one-batch-per-drop invariant, x30's discipline);
    * returns the ordered ledger. Scratch dirs are disposed eagerly
    * after the bounded ledger is collected. */
  def qualityGateStatic(spark: SparkSession, docs: DataFrame,
      nBatches: Int = 3, minPassRate: Double = 0.02): DataFrame = {
    require(nBatches >= 1, "nBatches must be positive")
    val base = Scratch.scratch("graft_quality_gate")
    val landing = base + "/landing"
    val ledger = base + "/ledger"
    val ckpt = base + "/ckpt"
    val src = docs.select(col("doc_id"), col("text"))
    // try/finally: a failing stream or collect must still dispose the
    // landing/ledger/checkpoint scratch (r12 advisor — the success-
    // path-only dispose leaked the directory tree on any error)
    val rows =
      try {
        (0 until nBatches).foreach { i =>
          src.filter(pmod(col("doc_id"), lit(nBatches.toLong)) === i)
            .coalesce(1).write.mode("append").parquet(landing)
          spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", "1").parquet(landing)
            .writeStream
            .trigger(
              org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .option("checkpointLocation", ckpt)
            .foreachBatch { (batch: DataFrame, batchId: Long) =>
              val row = auditBatch(batch, batchId, minPassRate)
              val sp = batch.sparkSession
              import sp.implicits._
              Seq(row).toDS().write.mode("append").parquet(ledger)
              ()
            }
            .start().awaitTermination()
        }
        import spark.implicits._
        spark.read.parquet(ledger).as[QualityBatch]
          .collect().sortBy(_.batch_id).toSeq
      } finally Scratch.dispose(base)
    import spark.implicits._
    rows.toDS().toDF().orderBy(col("batch_id"))
  }
}
