package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators — the 100 TB levers that don't change query
  * results, only where the bytes live and which shuffles disappear:
  *
  *  - BUCKETING: writing both join sides bucketed (and sorted) by the
  *    join key makes every future equi-join on that key shuffle-free —
  *    bucket i joins bucket i, per task. This is THE amortization play
  *    for fact tables joined repeatedly on the same key: pay one shuffle
  *    at write time, never again at read time. (LayoutSpec asserts the
  *    no-exchange plan.)
  *
  *  - SALTING: a skewed hot key floods one reducer in a shuffle join.
  *    Salting splits each key into `salts` sub-keys: the large side
  *    scatters uniformly (hash-derived salt), the smaller side is
  *    replicated `salts`× so every sub-key can still match. Result is
  *    row-identical to the plain join; the hot key's work spreads over
  *    `salts` tasks. AQE's skew-join splitting is the runtime fallback;
  *    explicit salting is the deterministic, plan-time version.
  */
object Layout {

  /** Write `df` as a bucketed+sorted table (bucketBy requires the table
    * catalog; parquet files land under the session warehouse). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  /** Co-located equi-join of two same-bucketed tables: with equal bucket
    * counts on the join key, Catalyst plans a SortMergeJoin with ZERO
    * shuffle exchanges. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Date-partitioned write: the lakehouse layout for time-series facts.
    * Directory-level partition pruning means a day-bounded query opens
    * only the matching partition dirs — at 100 TB the difference between
    * scanning everything and scanning a day. (The reference's
    * created_at/extracted_at btree indexes, init.sql:22-24, map to
    * exactly this.) */
  def writePartitionedByDay(df: DataFrame, tsCol: String,
      path: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write
      .partitionBy("p_date")
      .mode("overwrite")
      .parquet(path)

  /** Skew-safe equi-join: `large` is salted by a uniform hash of its
    * whole row id-space; `small` is replicated `salts`× (one copy per
    * salt value); the join key becomes (key, salt). Row-identical to
    * large.join(small, key) for any salts >= 1. */
  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    // uniform deterministic salt: hash of ALL large-side columns plus the
    // source partition id. Without the partition id, fully IDENTICAL
    // duplicate rows (common in log/dedup inputs) all hash to one salt
    // and a hot key of repeated rows keeps its skew; mixing in
    // spark_partition_id() scatters those duplicates by where they live
    // while staying deterministic for a fixed input partitioning.
    val saltCol: Column =
      pmod(xxhash64((large.columns.map(col) :+ spark_partition_id())
        .toSeq: _*), lit(salts))
    val saltedLarge = large.withColumn("_salt", saltCol)
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedLarge
      .join(replicatedSmall, Seq(key, "_salt"))
      .drop("_salt")
  }
}
