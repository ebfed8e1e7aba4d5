package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-dedup operators (reference: in-batch first-wins dedup on
  * position_uri, etl/etl.py:452-465 — SURVEY §2.4 D1).
  *
  * Scale notes: first-wins is a window row_number over the key — one
  * shuffle on the key, constant state per key (Catalyst plans it as
  * sort-within-partition + running row_number, no buffering of the whole
  * group). `dropDuplicates` alone would be cheaper but keeps an arbitrary
  * row; the reference's semantics are order-sensitive, so we capture
  * arrival order BEFORE any repartitioning with
  * monotonically_increasing_id (partition-major, row-minor — preserves
  * source order for file/page reads).
  */
object Dedup {

  /** First occurrence in `orderBy` order wins, per key. */
  def firstWins(df: DataFrame, keys: Seq[String], orderBy: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** First-wins in arrival (source) order — the reference's exact
    * semantics for a batch accumulated across API pages. */
  def firstWinsByArrival(df: DataFrame, keys: Seq[String]): DataFrame = {
    val withSeq = df.withColumn("_seq", monotonically_increasing_id())
    firstWins(withSeq, keys, col("_seq")).drop("_seq")
  }

  /** Exact dedup by key, keeping the row with the smallest tiebreaker —
    * deterministic without any arrival-order dependence. */
  def keepMinBy(df: DataFrame, key: String, tiebreak: String): DataFrame =
    firstWins(df, Seq(key), col(tiebreak).asc)
}
