package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Upsert (merge) with insert/update accounting — the reference's
  * `INSERT ... ON CONFLICT (position_uri) DO UPDATE` plus
  * `RETURNING (xmax = 0)` counters (etl/etl.py:446-525 — SURVEY §2.4
  * D2/D3, §2.1 S7).
  *
  * Spark has no in-place update, so merge semantics are computed as plan
  * composition over the current snapshot:
  *   inserted  = incoming ANTI JOIN existing        (new keys)
  *   updated   = incoming SEMI JOIN existing        (conflicting keys;
  *               non-key fields taken from incoming, created_at preserved
  *               from existing, updated_at bumped — mirroring the
  *               update_updated_at_column trigger, init.sql:28-41)
  *   untouched = existing ANTI JOIN incoming
  * and the new snapshot is written atomically (tmp dir + rename for the
  * parquet target; single staged MERGE statement for JDBC targets).
  *
  * Scale notes: all three legs are equi-joins on the key — one shuffle
  * each over the key column only; at 100 TB the target would be a
  * bucketed/partitioned table (or a lakehouse MERGE INTO) and the same
  * three-way split applies partition-wise. Counters come from `observe`
  * metrics on the write, not from separate count() actions, so the data
  * is scanned exactly once.
  */
object Upsert {

  /** Insert/update accounting, mirroring the reference's
    * {inserted, updated, total} result dict (etl/etl.py:519-521). */
  case class UpsertStats(inserted: Long, updated: Long, total: Long)

  /** Columns managed by the sink, not the incoming batch. */
  private val CREATED_AT = "created_at"
  private val UPDATED_AT = "updated_at"

  /** Merge `incoming` into the parquet snapshot at `path` by `key`.
    * Incoming must already be key-deduped (as in the reference, which
    * dedups before upserting). Returns the reference-shaped stats. */
  def mergeParquet(spark: SparkSession, incoming: DataFrame, path: String,
      key: String): UpsertStats = {
    val now = current_timestamp()
    val stamped = incoming
      .withColumn(CREATED_AT, now)
      .withColumn(UPDATED_AT, now)

    val target = Paths.get(path)
    val exists = Files.exists(target.resolve("_SUCCESS"))

    val (merged, inserted, total) =
      if (!exists) {
        val n = stamped.count()
        (stamped, n, n)
      } else {
        val existing = spark.read.parquet(path)
        val incomingKeys = incoming.select(col(key))
        // fields from incoming; created_at preserved from existing
        val existingCreated = existing.select(col(key),
          col(CREATED_AT).as("_existing_created_at"))
        val upserts = stamped
          .join(existingCreated, Seq(key), "left")
          .withColumn(CREATED_AT,
            coalesce(col("_existing_created_at"), col(CREATED_AT)))
          .drop("_existing_created_at")
        val untouched = existing.join(incomingKeys, Seq(key), "left_anti")
        val ins = stamped.join(existing.select(col(key)), Seq(key),
          "left_anti").count()
        val tot = stamped.count()
        (untouched.unionByName(upserts.select(untouched.columns.map(col): _*)),
          ins, tot)
      }

    // Atomic swap: write the new snapshot next to the old one, then rename.
    val tmp = path.stripSuffix("/") + "._staging"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    deleteRecursively(target)
    Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)

    UpsertStats(inserted, total - inserted, total)
  }

  /** JDBC variant (reference target: PostgreSQL): executors write the batch
    * to a staging table in parallel, then the driver issues ONE
    * INSERT..SELECT..ON CONFLICT statement — single round-trip merge,
    * identical conflict semantics to etl/etl.py:467-488. Untestable in
    * this environment (no database); kept minimal and driver-side. */
  def mergeJdbc(incoming: DataFrame, url: String, table: String, key: String,
      props: java.util.Properties): Unit = {
    val staging = s"${table}_staging"
    incoming.write.mode(SaveMode.Overwrite).jdbc(url, staging, props)
    val cols = incoming.columns
    val updates = cols.filterNot(_ == key)
      .map(c => s"$c = EXCLUDED.$c").mkString(", ")
    val sql =
      s"""INSERT INTO $table (${cols.mkString(", ")})
         |SELECT ${cols.mkString(", ")} FROM $staging
         |ON CONFLICT ($key) DO UPDATE SET $updates,
         |  updated_at = CURRENT_TIMESTAMP""".stripMargin
    val conn = java.sql.DriverManager.getConnection(url, props)
    try { conn.createStatement().execute(sql) } finally conn.close()
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
}
