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

  /** Morton (Z-order) code over quantile-bucketed key columns — the
    * multi-dimensional clustering key behind Delta/Iceberg OPTIMIZE
    * ZORDER: sorting by a single column gives perfect min/max
    * data-skipping on that column and NONE on any other; sorting by
    * the bit-interleaved bucket indexes gives GOOD skipping on every
    * participating column at once (each contiguous z-range is a small
    * hyper-rectangle of the key space, so parquet row-group min/max
    * stats stay narrow on all dimensions).
    *
    * Determinism: per-column bucket boundaries are the q32-pairing
    * exact quantiles (ONE bounded aggregate of (2^bits − 1) cut
    * doubles per column); bucket index = count of cutoffs below the
    * value; the interleave is pure integer div/mod arithmetic —
    * everything after the cut aggregate is map-side and
    * engine-exact.
    *
    * Scale shape: one bounded percentile aggregate + a 1-row
    * broadcast; the code itself is a per-row expression inside
    * whole-stage codegen. (The documented 100 TB swap for the exact
    * quantiles is the x07/x12 mergeable sketch — boundary placement
    * tolerates approximation; the CODE stays deterministic given the
    * cuts.) */
  def zOrderCode(df: DataFrame, cols: Seq[String], bits: Int = 4)
      : DataFrame = {
    require(cols.size >= 2, "z-order needs at least two columns")
    require(bits >= 1 && bits * cols.size <= 62, "code must fit a long")
    val nCuts = (1 << bits) - 1
    val fracs = array((1 to nCuts).map(k =>
      lit(k.toDouble / (1 << bits))): _*)
    val cuts = df.agg(
      percentile(col(cols.head).cast("double"), fracs)
        .as(s"_c_${cols.head}"),
      cols.tail.map(c =>
        percentile(col(c).cast("double"), fracs).as(s"_c_$c")): _*)
    val bucketed = df.crossJoin(broadcast(cuts))
    // bucket = how many cutoffs sit strictly below the value
    def bucket(c: String): Column =
      aggregate(col(s"_c_$c"),
        lit(0L),
        (acc, cut) => acc +
          when(col(c).cast("double") > cut, 1L).otherwise(0L))
    // interleave: bit i of column j lands at position i*|cols| + j
    // (column 0 takes the higher slot in each group). div/mod
    // arithmetic, not shift operators, so the SQL mirror is verbatim.
    val morton = (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        val weight = 1L << (i.toLong * cols.size + (cols.size - 1 - j))
        expr(s"((_b_$c div ${1L << i}) % 2) * ${weight}L")
      }
    }.reduce(_ + _)
    cols.foldLeft(bucketed) { (acc, c) =>
      acc.withColumn(s"_b_$c", bucket(c))
    }
      .withColumn("z_code", morton)
      .drop(cols.map(c => s"_c_$c") ++ cols.map(c => s"_b_$c"): _*)
  }

  /** q204: the z-cell locality report — per Morton code over
    * (l_orderkey, l_partkey): rows and the min/max RECTANGLE of both
    * keys. The point the numbers make: every cell's span is a narrow
    * slice of BOTH key ranges simultaneously — the property a
    * single-column sort cannot have — which is exactly what parquet
    * row-group min/max stats need for two-sided data skipping. */
  def zOrderCells(lineitem: DataFrame, bits: Int = 4): DataFrame =
    zOrderCode(lineitem.select(col("l_orderkey"), col("l_partkey")),
      Seq("l_orderkey", "l_partkey"), bits)
      .groupBy(col("z_code"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_orderkey")).as("min_orderkey"),
        max(col("l_orderkey")).as("max_orderkey"),
        min(col("l_partkey")).as("min_partkey"),
        max(col("l_partkey")).as("max_partkey"))
      .orderBy(col("z_code"))

  /** Physical Z-order write: range-partition by the Morton code (so
    * files tile the curve) and sort within partitions, then write.
    * Pay one clustering pass at write time; every later scan with a
    * selective predicate on ANY clustered column skips most row
    * groups via footer stats (LayoutSpec measures the per-file span
    * shrink vs a single-column sort on the same data). */
  def zOrderWrite(df: DataFrame, cols: Seq[String], path: String,
      bits: Int = 4, files: Int = 8): Unit =
    zOrderCode(df, cols, bits)
      .repartitionByRange(files, col("z_code"))
      .sortWithinPartitions(col("z_code"))
      .drop("z_code")
      .write.mode("overwrite").parquet(path)
}
