package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Run-metadata sink (reference: etl_metadata table, init.sql:73-80 —
  * SURVEY §2.1 S9): one appended row per ETL run with timestamp, row
  * count, status and error text. Parquet-append here (each run adds one
  * small file; at scale this would be a date-partitioned table or a JDBC
  * append — same one-row-per-run shape). */
object RunMetadata {

  val schema: StructType = StructType(Seq(
    StructField("last_run_at", TimestampType, nullable = false),
    StructField("jobs_processed", LongType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("error_message", StringType, nullable = true),
    StructField("created_at", TimestampType, nullable = false)))

  /** Append one run-log row. `errorMessage` joins the run's collected
    * errors (empty → null, as the reference leaves the column NULL). */
  def append(spark: SparkSession, path: String, jobsProcessed: Long,
      status: String, errors: Seq[String] = Nil): Unit = {
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val err = if (errors.isEmpty) null else errors.mkString("; ")
    val row = Row(now, jobsProcessed, status, err, now)
    spark.createDataFrame(
        java.util.Collections.singletonList(row), schema)
      .write.mode(SaveMode.Append).parquet(path)
  }

  /** Run history, newest first; empty-with-schema before the first run
    * (the reference's etl_metadata exists via DDL and reads zero rows). */
  def history(spark: SparkSession, path: String): DataFrame = {
    val base =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
        spark.read.schema(schema).parquet(path)
      else
        spark.createDataFrame(
          java.util.Collections.emptyList[Row](), schema)
    base.orderBy(col("last_run_at").desc)
  }
}
