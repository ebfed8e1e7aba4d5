package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.LogicalRDD

/** Block-manager lifecycle for localCheckpoint CHAINS (the iterative
  * loops: connected-components label propagation, Lloyd steps, the
  * BPE fold helper). Each iteration's checkpoint supersedes the
  * previous one, but Spark only reclaims superseded blocks when the
  * ContextCleaner eventually GCs the RDD — in a long-lived session
  * the chain accumulates one full data-sized copy per round. These
  * helpers free a superseded checkpoint EXPLICITLY, the moment the
  * round that consumed it has materialized its successor.
  *
  * Only ever call this on a frame whose consumers have all RUN (the
  * next round's checkpoint is eager, or the convergence probe already
  * executed) — an unpersisted localCheckpoint block is gone, not
  * recomputable (that is the localCheckpoint durability trade). */
private[graft] object Ckpt {

  /** The checkpointed RDD behind a localCheckpoint'd Dataset, if the
    * frame really is one — the ROOT of the analyzed plan must be the
    * LogicalRDD. Never collectFirst into the tree: a derived plan
    * (e.g. round 0's labels, built FROM the edges checkpoint) nests
    * OTHER frames' LogicalRDDs, and freeing those unpersists blocks
    * the loop still reads every round. */
  private def rddOf(df: Dataset[_]) =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  /** Free a superseded checkpoint's blocks (non-blocking; no-op on a
    * frame that is not a localCheckpoint). */
  def free(df: Dataset[_]): Unit =
    rddOf(df).foreach(_.unpersist(blocking = false))

  /** Chain step: checkpoint `next` EAGERLY, then free `prev`'s blocks
    * (safe exactly because the eager checkpoint just materialized
    * everything that read them). Returns the new checkpoint. */
  def advance(prev: DataFrame, next: DataFrame): DataFrame = {
    val ck = next.localCheckpoint(true)
    free(prev)
    ck
  }
}
