package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Upsert (merge) with insert/update accounting — the reference's
  * `INSERT ... ON CONFLICT (position_uri) DO UPDATE` plus
  * `RETURNING (xmax = 0)` counters (etl/etl.py:446-525 — SURVEY §2.4
  * D2/D3, §2.1 S7).
  *
  * Spark has no in-place update, so merge semantics are ONE full-outer
  * join of incoming and the current snapshot on the key:
  *   key only in incoming  → insert (created_at = updated_at = now)
  *   key in both           → update (non-key fields from incoming,
  *               created_at preserved from existing, updated_at bumped —
  *               mirroring the update_updated_at_column trigger,
  *               init.sql:28-41)
  *   key only in existing  → untouched (existing row verbatim)
  * A single join = a single shuffle on the key, and each input is scanned
  * exactly once (upstream observe nodes fire once — EtlJob relies on
  * this). The new snapshot replaces the old via swap-then-delete: staging is
  * written beside the target, the live target is moved aside to a backup,
  * staging renamed in, and only then is the backup deleted (the backup is
  * restored if the swap itself fails). A crash at any point leaves either
  * the old snapshot or the new one on disk — CRASH-durable, but not
  * concurrent-reader-transparent: between the two renames the target
  * path itself briefly doesn't exist, so the protocol assumes a single
  * writer and no concurrent reader on the raw path. Readers that may
  * overlap a merge should go through readSnapshot, which falls back to
  * the still-complete ._backup copy during that window. (Local-FS
  * java.nio implementation — the sandbox target; on HDFS/S3 the same
  * two-rename protocol applies via the FileSystem API, and on a lakehouse
  * table this whole method is a transactional MERGE INTO.)
  *
  * Scale notes: all three legs are equi-joins on the key — one shuffle
  * each over the key column only; at 100 TB the target would be a
  * bucketed/partitioned table (or a lakehouse MERGE INTO) and the same
  * three-way split applies partition-wise. Counters come from an
  * `Observation` riding the single write action — the incoming batch is
  * scanned exactly once, never re-counted.
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
    val backupAtStart = Paths.get(path.stripSuffix("/") + "._backup")
    // Crash recovery: a previous run may have died between moving the
    // live snapshot aside and renaming staging in. If the target is
    // missing-or-incomplete but a complete backup exists, the backup IS
    // the snapshot — restore it before merging (otherwise this merge
    // would treat the table as empty and the pre-clean would delete the
    // only copy).
    if (!Files.exists(target.resolve("_SUCCESS")) &&
        Files.exists(backupAtStart.resolve("_SUCCESS"))) {
      deleteRecursively(target)
      Files.move(backupAtStart, target)
    }
    val exists = Files.exists(target.resolve("_SUCCESS"))
    val obs = Observation("upsert")

    val merged =
      if (!exists)
        stamped.observe(obs, count(lit(1)).as("total"),
          count(lit(1)).as("inserted"))
      else {
        val existing = spark.read.parquet(path)
        val dataCols = stamped.columns.filterNot(_ == key)
        val exRenamed = dataCols.foldLeft(existing) { (d, c) =>
          d.withColumnRenamed(c, s"_ex_$c")
        }
        val joined = stamped
          .withColumn("_inc", lit(true))
          .join(exRenamed, Seq(key), "full_outer")
        // _inc null => existing-only row; _ex_created_at null => new key.
        val observed = joined.observe(obs,
          count(when(col("_inc"), 1)).as("total"),
          count(when(col("_inc") && col(s"_ex_$CREATED_AT").isNull, 1))
            .as("inserted"))
        observed.select(stamped.columns.map {
          case `key` => col(key)
          case CREATED_AT =>
            coalesce(col(s"_ex_$CREATED_AT"), col(CREATED_AT)).as(CREATED_AT)
          case c =>
            when(col("_inc").isNotNull, col(c)).otherwise(col(s"_ex_$c")).as(c)
        }.toSeq: _*)
      }

    // Write staging beside the target, then swap-then-delete (see doc).
    val tmp = Paths.get(path.stripSuffix("/") + "._staging")
    val backup = Paths.get(path.stripSuffix("/") + "._backup")
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    deleteRecursively(backup) // leftover from an earlier crash, if any
    if (Files.exists(target)) Files.move(target, backup)
    try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: Throwable =>
        if (Files.exists(backup) && !Files.exists(target))
          Files.move(backup, target)
        throw e
    }
    deleteRecursively(backup)

    val total = obs.get("total").asInstanceOf[Long]
    val inserted = obs.get("inserted").asInstanceOf[Long]
    UpsertStats(inserted, total - inserted, total)
  }

  /** Bucket-partitioned merge — the 100 TB shape of mergeParquet. The
    * target is laid out as `_bucket=N/` partitions (N = hash of the key
    * mod numBuckets), so a merge:
    *   1. derives the buckets the incoming batch touches (≤ numBuckets
    *      ints on the driver);
    *   2. reads ONLY those partitions of the snapshot (partition
    *      pruning — untouched bytes are never read);
    *   3. full-outer-merges exactly as mergeParquet (same created_at/
    *      updated_at semantics, same Observation counters);
    *   4. rewrites ONLY the touched partitions via dynamic partition
    *      overwrite.
    * Merge cost is proportional to the INCOMING batch (times the bucket
    * fan-in), not the table size. Atomicity is per-partition (dynamic
    * overwrite swaps each partition dir); a torn multi-partition commit
    * re-heals on the next idempotent merge — the full-snapshot
    * mergeParquet remains the strictly-atomic option for small targets. */
  def mergeParquetBucketed(spark: SparkSession, incoming: DataFrame,
      path: String, key: String, numBuckets: Int = 64): UpsertStats = {
    val now = current_timestamp()
    // A merge with a DIFFERENT bucket count would prune to the new
    // bucketing's partitions while existing keys sit in differently-
    // numbered dirs — silent duplicate keys. The count is persisted with
    // the table on first write and validated on every later merge.
    val persisted = readBucketCount(Paths.get(path))
    val bucketOf = pmod(xxhash64(col(key)), lit(numBuckets.toLong))
    val stamped = incoming
      .withColumn(CREATED_AT, now)
      .withColumn(UPDATED_AT, now)
      .withColumn("_bucket", bucketOf)

    val target = Paths.get(path)
    // dynamic partition overwrite does not leave a root _SUCCESS marker —
    // presence of any bucket partition dir is the existence signal
    val exists = Files.exists(target) && {
      val s = Files.list(target)
      try s.anyMatch(p => p.getFileName.toString.startsWith("_bucket="))
      finally s.close()
    }
    // Validation only matters when DATA exists — a stamp without bucket
    // dirs (crash between stamp and first write, or a failed creation
    // retried with a different count) has no keys to strand, so it is
    // simply re-stamped below. With data present: a mismatched count
    // would prune to the wrong dirs (silent duplicate keys) → refuse;
    // an EXISTING layout without a stamp cannot be validated at all →
    // refuse rather than guess (adopting a pre-stamp table is explicit:
    // verify the original count, then stampBucketCount(path, n) once).
    if (exists) {
      require(persisted.nonEmpty,
        s"bucketed table at $path predates the _graft_buckets stamp; " +
          "its bucket count cannot be validated — verify the layout's " +
          "original numBuckets and call Upsert.stampBucketCount once")
      require(persisted.get == numBuckets,
        s"bucketed table at $path was written with " +
          s"numBuckets=${persisted.get}; merging with " +
          s"numBuckets=$numBuckets would strand existing keys in stale " +
          "bucket dirs (pass the original count)")
    }
    val obs = Observation()

    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val merged =
        if (!exists)
          stamped.observe(obs, count(lit(1)).as("total"),
            count(lit(1)).as("inserted"))
        else {
          val touched = stamped.select(col("_bucket")).distinct()
            .collect().map(_.getLong(0))
          val existing = spark.read.parquet(path)
            .filter(col("_bucket").isin(touched: _*)) // partition pruning
          val dataCols = stamped.columns.filterNot(c =>
            c == key || c == "_bucket")
          val exRenamed = dataCols.foldLeft(existing) { (d, c) =>
            d.withColumnRenamed(c, s"_ex_$c")
          }.drop("_bucket")
          val joined = stamped
            .withColumn("_inc", lit(true))
            .join(exRenamed, Seq(key), "full_outer")
          val observed = joined.observe(obs,
            count(when(col("_inc"), 1)).as("total"),
            count(when(col("_inc") && col(s"_ex_$CREATED_AT").isNull, 1))
              .as("inserted"))
          observed.select(stamped.columns.map {
            case `key` => col(key)
            case "_bucket" =>
              // recompute for existing-only rows (their stamped _bucket
              // is null on the existing side of the join)
              pmod(xxhash64(col(key)), lit(numBuckets.toLong)).as("_bucket")
            case CREATED_AT =>
              coalesce(col(s"_ex_$CREATED_AT"), col(CREATED_AT))
                .as(CREATED_AT)
            case c =>
              when(col("_inc").isNotNull, col(c)).otherwise(col(s"_ex_$c"))
                .as(c)
          }.toSeq: _*)
        }
      if (!exists && !persisted.contains(numBuckets)) {
        // stamp-first (and re-stamp on empty tables): if we crash
        // between stamp and data write, the stamp survives with no
        // bucket dirs — harmless, and a retry with a DIFFERENT count on
        // the still-empty table just overwrites it
        Files.createDirectories(target)
        writeBucketCount(target, numBuckets)
      }
      merged.write
        .partitionBy("_bucket")
        .mode(SaveMode.Overwrite)
        .parquet(path)
    } finally {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
    }

    val total = obs.get("total").asInstanceOf[Long]
    val inserted = obs.get("inserted").asInstanceOf[Long]
    UpsertStats(inserted, total - inserted, total)
  }

  /** The merge statement mergeJdbc issues — a pure string builder so the
    * SQL-assembly logic is golden-testable even though no database exists
    * in this environment. Mirrors the one correct Postgres form of the
    * reference's INSERT .. ON CONFLICT (position_uri) DO UPDATE
    * (etl/etl.py:467-488): every non-key column taken from EXCLUDED,
    * updated_at re-stamped by the merge itself. */
  def upsertSql(table: String, cols: Seq[String], key: String): String = {
    require(cols.contains(key), s"key $key missing from columns")
    val staging = s"${table}_staging"
    val updates = cols.filterNot(_ == key)
      .map(c => s"$c = EXCLUDED.$c").mkString(", ")
    s"""INSERT INTO $table (${cols.mkString(", ")})
       |SELECT ${cols.mkString(", ")} FROM $staging
       |ON CONFLICT ($key) DO UPDATE SET $updates,
       |  updated_at = CURRENT_TIMESTAMP""".stripMargin
  }

  /** The SQL:2003 MERGE equivalent of upsertSql — the dialect for
    * databases without Postgres' ON CONFLICT (Derby, Oracle, SQL
    * Server, DB2). Same semantics as mergeParquet's sink-managed
    * stamps: matched rows take every non-key staging column and a
    * re-stamped updated_at (created_at untouched → preserved);
    * unmatched rows insert the staging columns plus BOTH stamps
    * explicitly. The stamps are explicit rather than left to the
    * target's column DEFAULTs because Derby's MERGE NPEs when the
    * INSERT arm omits a TIMESTAMP DEFAULT CURRENT_TIMESTAMP column
    * (bisected in this sandbox: a default-omitting MERGE INSERT dies
    * in TypeId.getJDBCTypeId; the explicit form runs) — and explicit
    * stamps are dialect-portable anyway. Pure string builder,
    * golden-tested like upsertSql; runs END-TO-END in UpsertSpec. */
  def upsertSqlMerge(table: String, cols: Seq[String], key: String)
      : String = {
    require(cols.contains(key), s"key $key missing from columns")
    val staging = s"${table}_staging"
    val updates = cols.filterNot(_ == key)
      .map(c => s"$c = s.$c").mkString(", ")
    s"""MERGE INTO $table t
       |USING $staging s ON t.$key = s.$key
       |WHEN MATCHED THEN UPDATE SET $updates,
       |  updated_at = CURRENT_TIMESTAMP
       |WHEN NOT MATCHED THEN INSERT
       |  (${cols.mkString(", ")}, created_at, updated_at)
       |  VALUES (${cols.map(c => s"s.$c").mkString(", ")},
       |    CURRENT_TIMESTAMP, CURRENT_TIMESTAMP)""".stripMargin
  }

  /** JDBC variant (reference target: PostgreSQL): executors write the batch
    * to a staging table in parallel, then the driver issues ONE
    * merge statement — single round-trip, identical conflict semantics
    * to etl/etl.py:467-488. `dialect` picks the statement: "postgres"
    * (default) issues the reference's INSERT..ON CONFLICT; "merge"
    * issues the SQL:2003 MERGE INTO (Derby/Oracle/SQL Server class).
    * The merge leg runs END-TO-END in UpsertSpec against embedded
    * Derby (the JDBC engine Spark ships for its Hive metastore), so
    * staging write → merge → row-state semantics are
    * integration-tested, not just golden-tested; the Postgres
    * STATEMENT stays golden-tested (no Postgres server exists here —
    * the two texts differ only in conflict syntax). */
  def mergeJdbc(incoming: DataFrame, url: String, table: String, key: String,
      props: java.util.Properties, dialect: String = "postgres"): Unit = {
    incoming.write.mode(SaveMode.Overwrite)
      .jdbc(url, s"${table}_staging", props)
    val sql = dialect match {
      case "postgres" => upsertSql(table, incoming.columns.toSeq, key)
      case "merge" => upsertSqlMerge(table, incoming.columns.toSeq, key)
      case other => sys.error(
        s"unknown upsert dialect '$other' (postgres | merge)")
    }
    val conn = java.sql.DriverManager.getConnection(url, props)
    try { conn.createStatement().execute(sql) } finally conn.close()
  }

  /** Bucket-count metadata rides inside the table dir (underscore prefix:
    * parquet readers ignore it). */
  private val BUCKETS_FILE = "_graft_buckets"

  private def readBucketCount(target: Path): Option[Int] = {
    val f = target.resolve(BUCKETS_FILE)
    if (Files.exists(f))
      Some(new String(Files.readAllBytes(f), "UTF-8").trim.toInt)
    else None
  }

  private def writeBucketCount(target: Path, n: Int): Unit =
    Files.write(target.resolve(BUCKETS_FILE),
      n.toString.getBytes("UTF-8"))

  /** Adopt a pre-stamp bucketed layout: record its ORIGINAL bucket count
    * so future merges validate against it. The caller asserts the count
    * is the one the existing `_bucket=N` dirs were hashed with — a wrong
    * value here re-opens the silent-duplicate-key hole the stamp closes. */
  def stampBucketCount(path: String, numBuckets: Int): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    writeBucketCount(Paths.get(path), numBuckets)
  }

  /** Compact a bucketed table's small files: every incremental merge
    * rewrites its touched partitions with one file per shuffle task, so
    * a long-lived table accumulates files until scan planning (listing,
    * row-group overhead) dominates — the classic lakehouse small-files
    * problem. One repartition on _bucket lands each partition's rows in
    * a single task → a single file per bucket dir, swapped in through
    * the same dynamic-partition-overwrite path as the merge (per-
    * partition atomicity, bucket-count stamp untouched). Run it on a
    * maintenance cadence, not per merge. */
  def compactBucketed(spark: SparkSession, path: String): Unit = {
    require(readBucketCount(Paths.get(path)).nonEmpty,
      s"no _graft_buckets stamp at $path — not a bucketed merge table")
    val prevMode =
      spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // localCheckpoint materializes the table BEFORE the overwrite —
    // Spark (rightly) refuses a write whose plan still reads the
    // destination path, and the blocks also guard against reading
    // half-overwritten partitions mid-job
    try spark.read.parquet(path)
      .repartition(col("_bucket"))
      .localCheckpoint()
      .write.partitionBy("_bucket").mode(SaveMode.Overwrite).parquet(path)
    finally
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
  }

  /** Read the snapshot written by mergeParquet, tolerating an in-flight
    * swap: the swap-then-delete protocol (see class doc) has a window
    * where the live dir is mid-rename and only the `._backup` copy is
    * complete — this helper falls back to it instead of failing with
    * FileNotFound at read-DataFrame time.
    *
    * BEST-EFFORT, not a snapshot pin: the check-then-read is not atomic
    * against the merger — a job still scanning when the merge completes
    * and deletes `._backup` (or that passed the target check just before
    * the swap) can still fail mid-scan. The protocol's actual contract
    * is single-writer with reads BETWEEN merges; this fallback only
    * narrows the common races, it cannot eliminate them. For genuinely
    * concurrent readers use the bucketed layout (per-partition swaps) or
    * a table format with snapshot isolation. */
  /** SCD Type-2 merge: dimension history with [valid_from, valid_to)
    * row versioning — the warehouse-standard answer to "what did this
    * customer's record say LAST quarter", which the plain L-D2 upsert
    * (latest-wins) deliberately forgets.
    *
    * Semantics per key in `updates`: the currently-open row (valid_to
    * IS NULL) closes at `loadTs`, and a new open row starts at
    * `loadTs`. Keys absent from `updates` keep their open row; already-
    * closed history is untouched; keys new to the dimension simply
    * open. `current` must carry valid_from/valid_to; `updates` carries
    * the attribute columns only (same schema minus validity columns).
    *
    * Scale shape: one key-shuffled semi/anti join pair over only the
    * OPEN slice (history rows pass through untouched — at 100 TB,
    * partition the table by an is_open flag or valid_to date so the
    * closed majority is never rewritten), plus a union. Deterministic:
    * no generated timestamps — `loadTs` is caller-supplied. */
  def scd2Merge(current: DataFrame, updates: DataFrame, key: String,
      loadTs: org.apache.spark.sql.Column): DataFrame = {
    val attrCols = updates.columns.toSeq
    require(attrCols.contains(key), s"updates must carry the key '$key'")
    require(!attrCols.contains("valid_from") &&
      !attrCols.contains("valid_to"),
      "updates must not carry validity columns")
    val outCols = (attrCols ++ Seq("valid_from", "valid_to")).map(col)
    val updKeys = updates.select(col(key))
    val open = current.filter(col("valid_to").isNull)
    val closedNow = open
      .join(updKeys, Seq(key), "left_semi")
      .withColumn("valid_to", loadTs)
    val stillOpen = open.join(updKeys, Seq(key), "left_anti")
    val history = current.filter(col("valid_to").isNotNull)
    val opened = updates
      .withColumn("valid_from", loadTs)
      .withColumn("valid_to", lit(null).cast("timestamp"))
    Seq(history, closedNow, stillOpen, opened)
      .map(_.select(outCols: _*))
      .reduce(_ unionByName _)
      .orderBy(col(key), col("valid_from"), col("valid_to"))
  }

  /** scd2Merge against an `is_open`-PARTITIONED parquet table — the
    * 100 TB layout the in-memory operator's Scaladoc promises: the
    * closed majority of a dimension's history is never rewritten (its
    * files stay byte-identical across merges — UpsertSpec pins this),
    * only the open slice is.
    *
    * Layout: `path/is_open=true|false` via partitionBy. Per merge:
    *
    *   1. newly-closed versions APPEND to the closed partition (append
    *      adds files; existing history files are untouched);
    *   2. the open partition is REWRITTEN (still-open rows + the new
    *      open versions) through dynamic partition overwrite — the
    *      same per-partition swap mergeParquetBucketed uses.
    *
    * Work per merge ∝ open-slice size + batch size, independent of
    * history size: the only reads are the open partition (partition-
    * pruned) and the closed partition FILTERED to valid_to == loadTs
    * (the crash-retry guard below; parquet min/max stats prune it to
    * ~nothing on a healthy table).
    *
    * Crash contract (two writes, same per-partition atomicity trade as
    * mergeParquetBucketed): a crash between the append and the
    * overwrite leaves the newly-closed versions recorded while their
    * keys are still open — re-running the SAME merge (same updates,
    * same loadTs) heals exactly: the retry guard anti-joins the
    * to-close rows against closed rows already recorded at this
    * loadTs on (key, valid_from), so nothing duplicates, and the open
    * overwrite then completes the swap. Deterministic: `loadTs` is
    * caller-supplied, never generated. */
  def scd2MergeParquet(spark: SparkSession, path: String,
      updates: DataFrame, key: String,
      loadTs: org.apache.spark.sql.Column): Unit = {
    val attrCols = updates.columns.toSeq
    require(attrCols.contains(key), s"updates must carry the key '$key'")
    require(!attrCols.contains("valid_from") &&
      !attrCols.contains("valid_to") && !attrCols.contains("is_open"),
      "updates must not carry validity/partition columns")
    val outCols = (attrCols ++ Seq("valid_from", "valid_to")).map(col)
    val opened = updates
      .withColumn("valid_from", loadTs)
      .withColumn("valid_to", lit(null).cast("timestamp"))

    val target = Paths.get(path)
    val exists = Files.exists(target) && {
      val s = Files.list(target)
      try s.anyMatch(p => p.getFileName.toString.startsWith("is_open="))
      finally s.close()
    }
    if (!exists) {
      opened.select(outCols: _*)
        .withColumn("is_open", lit(true))
        .write.partitionBy("is_open").mode(SaveMode.Overwrite).parquet(path)
      return
    }

    // pin the open slice BEFORE the overwrite below: Spark refuses a
    // write whose plan still reads the destination, and the pin also
    // guards against reading a half-swapped partition mid-job (same
    // reasoning as compactBucketed)
    // partition-column values are not type-inferred as booleans by
    // Spark's partition discovery — compare as string
    val isOpen = col("is_open").cast("string") === "true"
    val open = spark.read.parquet(path)
      .filter(isOpen).drop("is_open")
      .select(outCols: _*)
      .localCheckpoint()
    val updKeys = updates.select(col(key))
    val closedNow = open
      .join(updKeys, Seq(key), "left_semi")
      .withColumn("valid_to", loadTs)
    // crash-retry guard: versions already closed AT THIS loadTs (only
    // a replayed merge produces any) must not append twice
    val alreadyClosed = spark.read.parquet(path)
      .filter(!isOpen)
      .filter(col("valid_to") === loadTs)
      .select(col(key), col("valid_from"))
    val toAppend = closedNow
      .join(alreadyClosed, Seq(key, "valid_from"), "left_anti")
      .select(outCols: _*)
      .withColumn("is_open", lit(false))
      .localCheckpoint() // the append's plan also reads `path`
    toAppend.write.partitionBy("is_open").mode(SaveMode.Append)
      .parquet(path)

    val stillOpen = open.join(updKeys, Seq(key), "left_anti")
    val newOpen = stillOpen.select(outCols: _*)
      .unionByName(opened.select(outCols: _*))
      .withColumn("is_open", lit(true))
    val prevMode =
      spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try newOpen.write.partitionBy("is_open").mode(SaveMode.Overwrite)
      .parquet(path)
    finally
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
  }

  /** Read back an scd2MergeParquet table as the plain
    * (attrs, valid_from, valid_to) frame scd2Merge returns. */
  def readScd2(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("is_open")

  def readSnapshot(spark: SparkSession, path: String): DataFrame = {
    val target = Paths.get(path)
    val backup = Paths.get(path.stripSuffix("/") + "._backup")
    if (Files.exists(target.resolve("_SUCCESS")))
      spark.read.parquet(path)
    else if (Files.exists(backup.resolve("_SUCCESS")))
      spark.read.parquet(backup.toString)
    else
      spark.read.parquet(path) // surface the real error for a missing table
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
}
