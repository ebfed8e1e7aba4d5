package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the harness-provided parquet tables (see /root/repo/TESTDATA.md).
  *
  * All engine operators take DataFrames, never paths, so the same plan runs
  * against any scale factor (or, on a real cluster, against a catalog table).
  * Reads are plain parquet scans: Catalyst pushes filters + prunes columns
  * into the scan, which is the scale story for 100 TB — never read more bytes
  * than the query needs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Normalize events.ts to a UTC-instant TIMESTAMP no matter which
    // physical flavor the harness writer emitted — the generator has
    // changed flavors across rounds and every event operator does
    // instant arithmetic (unix_micros rejects TIMESTAMP_NTZ outright):
    //  - TIMESTAMP(NANOS): with nanosAsLong=true Spark reads it as long;
    //    convert via integer div (never double: ns-since-epoch exceeds
    //    double's 2^53 exact range);
    //  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    //    TIMESTAMP_NTZ; the session timezone is pinned to UTC, so the
    //    cast reinterprets the same wall-clock micros as the identical
    //    instant DuckDB's epoch_us sees.
    if (name == "events")
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    else df
  }

  /** Register every table as a temp view so `spark.sql` queries work too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
