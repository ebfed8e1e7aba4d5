package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** Upsert merge semantics + stats, mirroring the reference's integration
  * tier (tests/test_integration.py:70-151 — insert {2,0,2}; update path
  * keeps row count, changes fields, preserves created_at, bumps
  * updated_at; re-run idempotence). */
class UpsertSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft_upsert").toFile
    d.delete() // Upsert creates it via the staged rename
    d.getAbsolutePath
  }

  test("initial load inserts all rows: {2, 0, 2}") {
    val path = freshDir()
    val batch = Seq(("https://x.gov/1", "Data Engineer", "DoD"),
      ("https://x.gov/2", "Analyst", "DoT"))
      .toDF("position_uri", "position_title", "organization_name")
    val stats = Upsert.mergeParquet(spark, batch, path, "position_uri")
    assert(stats == Upsert.UpsertStats(2, 0, 2))
    assert(spark.read.parquet(path).count() == 2)
  }

  test("conflict updates fields, preserves created_at, bumps updated_at") {
    val path = freshDir()
    val first = Seq(("https://x.gov/1", "Original Title"))
      .toDF("position_uri", "position_title")
    Upsert.mergeParquet(spark, first, path, "position_uri")
    val before = spark.read.parquet(path)
      .select("created_at", "updated_at").head
    Thread.sleep(1100) // timestamp resolution guard

    val second = Seq(("https://x.gov/1", "Updated Title"),
      ("https://x.gov/3", "Brand New")).toDF("position_uri", "position_title")
    val stats = Upsert.mergeParquet(spark, second, path, "position_uri")
    assert(stats == Upsert.UpsertStats(1, 1, 2))

    val rows = spark.read.parquet(path).orderBy("position_uri").collect()
    assert(rows.length == 2)
    val updated = rows(0)
    assert(updated.getAs[String]("position_title") == "Updated Title")
    assert(updated.getAs[Timestamp]("created_at") ==
      before.getAs[Timestamp]("created_at"))
    assert(updated.getAs[Timestamp]("updated_at")
      .after(before.getAs[Timestamp]("updated_at")))
  }

  test("re-upserting the same batch is idempotent: inserted=0") {
    val path = freshDir()
    val batch = Seq(("https://x.gov/1", "A"), ("https://x.gov/2", "B"))
      .toDF("position_uri", "position_title")
    Upsert.mergeParquet(spark, batch, path, "position_uri")
    val again = Upsert.mergeParquet(spark, batch, path, "position_uri")
    assert(again.inserted == 0)
    assert(again.updated == 2)
    assert(spark.read.parquet(path).count() == 2)
  }

  test("counters ride the single write action — the incoming plan " +
      "executes exactly once") {
    val path = freshDir()
    Upsert.mergeParquet(spark,
      Seq(("https://x.gov/1", "A")).toDF("position_uri", "position_title"),
      path, "position_uri")
    // count upstream-plan executions on the merge path via an accumulator
    // bumped per incoming row
    val acc = spark.sparkContext.longAccumulator("incoming_rows_seen")
    val incoming = Seq(("https://x.gov/1", "A2"), ("https://x.gov/2", "B"))
      .toDF("position_uri", "position_title")
      .map { r => acc.add(1); r }(
        org.apache.spark.sql.Encoders.row(
          new org.apache.spark.sql.types.StructType()
            .add("position_uri", "string").add("position_title", "string")))
      .toDF("position_uri", "position_title")
    val stats = Upsert.mergeParquet(spark, incoming, path, "position_uri")
    assert(stats == Upsert.UpsertStats(1, 1, 2))
    assert(acc.value == 2L,
      s"incoming scanned ${acc.value} rows — plan executed more than once")
  }

  test("bucketed merge: accounting matches, untouched partitions " +
      "are not rewritten") {
    val path = freshDir()
    val batch = (1 to 40)
      .map(i => (s"https://x.gov/$i", s"Job $i"))
      .toDF("position_uri", "position_title")
    val first = Upsert.mergeParquetBucketed(spark, batch, path,
      "position_uri", numBuckets = 8)
    assert(first == Upsert.UpsertStats(40, 0, 40))
    val table = spark.read.parquet(path)
    assert(table.count() == 40)

    // capture per-partition file listings before the incremental merge
    def partitionFiles(): Map[String, Set[String]] = {
      val root = java.nio.file.Paths.get(path)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(root).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("_bucket="))
        .map { p =>
          p.getFileName.toString ->
            java.nio.file.Files.list(p).iterator().asScala
              .map(_.getFileName.toString).toSet
        }.toMap
    }
    val before = partitionFiles()
    assert(before.size > 1, "batch should span several buckets")

    // one update + one insert -> at most 2 buckets rewritten
    val delta = Seq(("https://x.gov/1", "Job 1 UPDATED"),
      ("https://x.gov/999", "Brand New"))
      .toDF("position_uri", "position_title")
    val second = Upsert.mergeParquetBucketed(spark, delta, path,
      "position_uri", numBuckets = 8)
    assert(second == Upsert.UpsertStats(1, 1, 2))

    val after = partitionFiles()
    val unchanged = before.keySet.intersect(after.keySet)
      .count(k => before(k) == after(k))
    assert(unchanged >= before.size - 2,
      s"only touched buckets may be rewritten: $before vs $after")

    val merged = spark.read.parquet(path)
    assert(merged.count() == 41)
    assert(merged.filter(col("position_uri") === "https://x.gov/1")
      .head.getAs[String]("position_title") == "Job 1 UPDATED")
  }

  test("bucketed merge preserves created_at on update, like mergeParquet") {
    val path = freshDir()
    val b1 = Seq(("https://x.gov/1", "A")).toDF("position_uri",
      "position_title")
    Upsert.mergeParquetBucketed(spark, b1, path, "position_uri", 4)
    val created = spark.read.parquet(path).head.getAs[Timestamp]("created_at")
    Thread.sleep(1100)
    val b2 = Seq(("https://x.gov/1", "B")).toDF("position_uri",
      "position_title")
    Upsert.mergeParquetBucketed(spark, b2, path, "position_uri", 4)
    val row = spark.read.parquet(path).head
    assert(row.getAs[String]("position_title") == "B")
    assert(row.getAs[Timestamp]("created_at") == created)
    assert(row.getAs[Timestamp]("updated_at").after(created))
  }

  test("upsertSqlMerge golden: the SQL:2003 MERGE INTO mirror of the " +
      "ON CONFLICT form") {
    val sql = Upsert.upsertSqlMerge("job_postings",
      Seq("position_uri", "position_title"), "position_uri")
    assert(sql ==
      """MERGE INTO job_postings t
        |USING job_postings_staging s ON t.position_uri = s.position_uri
        |WHEN MATCHED THEN UPDATE SET position_title = s.position_title,
        |  updated_at = CURRENT_TIMESTAMP
        |WHEN NOT MATCHED THEN INSERT
        |  (position_uri, position_title, created_at, updated_at)
        |  VALUES (s.position_uri, s.position_title,
        |    CURRENT_TIMESTAMP, CURRENT_TIMESTAMP)""".stripMargin)
    intercept[IllegalArgumentException] {
      Upsert.upsertSqlMerge("t", Seq("a", "b"), "missing")
    }
  }

  test("mergeJdbc END-TO-END on embedded Derby: staging write, merge, " +
      "insert/update row states, created_at preserved, updated_at " +
      "bumped (the reference's test_integration.py:70-151 semantics)") {
    // Derby ships in /opt/spark/jars (Spark's metastore engine) — a
    // REAL JDBC database, in-process, no server needed. In-memory URL
    // so nothing touches disk; local-mode executors share the JVM so
    // the parallel staging write reaches the same store.
    val url = "jdbc:derby:memory:graft_upsert_it;create=true"
    val props = new java.util.Properties()
    // staging is CREATED by the Spark JDBC writer; force VARCHAR keys
    // (the default String mapping is CLOB, which Derby cannot compare
    // in the MERGE's ON clause). Column names are UPPERCASE throughout:
    // the Spark writer QUOTES identifiers at CREATE time, so staged
    // columns keep the DataFrame's exact case, while the merge text
    // references them unquoted — on Derby unquoted folds to uppercase,
    // so the DataFrame case must match that fold
    props.setProperty("createTableColumnTypes",
      "POSITION_URI VARCHAR(256), POSITION_TITLE VARCHAR(256)")
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      // no DEFAULT CURRENT_TIMESTAMP on the stamps: upsertSqlMerge
      // manages both explicitly (mergeParquet's sink-managed-stamp
      // contract), and Derby's MERGE has a bug — an UPDATE arm
      // assigning CURRENT_TIMESTAMP to a column whose DEFAULT is
      // CURRENT_TIMESTAMP dies in an engine NPE (bisected here;
      // default-free targets and explicit inserts run fine)
      conn.createStatement().execute(
        """CREATE TABLE job_postings (
          |  POSITION_URI VARCHAR(256) PRIMARY KEY,
          |  POSITION_TITLE VARCHAR(256),
          |  created_at TIMESTAMP,
          |  updated_at TIMESTAMP)""".stripMargin)

      val b1 = Seq(("https://x.gov/1", "Data Engineer"),
        ("https://x.gov/2", "Analyst"))
        .toDF("POSITION_URI", "POSITION_TITLE")
      Upsert.mergeJdbc(b1, url, "job_postings", "POSITION_URI", props,
        dialect = "merge")
      def snapshot(): Map[String, (String, Timestamp, Timestamp)] = {
        val rs = conn.createStatement().executeQuery(
          "SELECT position_uri, position_title, created_at, updated_at " +
            "FROM job_postings")
        val out = scala.collection.mutable.Map
          .empty[String, (String, Timestamp, Timestamp)]
        while (rs.next()) out(rs.getString(1)) =
          (rs.getString(2), rs.getTimestamp(3), rs.getTimestamp(4))
        out.toMap
      }
      val s1 = snapshot()
      assert(s1.size == 2)
      assert(s1("https://x.gov/1")._1 == "Data Engineer")
      assert(s1("https://x.gov/2")._1 == "Analyst")
      val created1 = s1("https://x.gov/1")._2

      Thread.sleep(50) // make the updated_at bump observable
      val b2 = Seq(("https://x.gov/1", "Senior Data Engineer"),
        ("https://x.gov/3", "Scientist"))
        .toDF("POSITION_URI", "POSITION_TITLE")
      Upsert.mergeJdbc(b2, url, "job_postings", "POSITION_URI", props,
        dialect = "merge")
      val s2 = snapshot()
      assert(s2.size == 3, "1 update + 1 insert on a 2-row table")
      assert(s2("https://x.gov/1")._1 == "Senior Data Engineer")
      assert(s2("https://x.gov/2")._1 == "Analyst", "untouched row")
      assert(s2("https://x.gov/1")._2 == created1,
        "created_at preserved on update")
      assert(s2("https://x.gov/1")._3.after(s2("https://x.gov/1")._2),
        "updated_at bumped past created_at")
      // idempotence: re-merging the same batch keeps the row count
      Upsert.mergeJdbc(b2, url, "job_postings", "POSITION_URI", props,
        dialect = "merge")
      assert(snapshot().size == 3)
      // the unknown-dialect guard
      val e = intercept[RuntimeException] {
        Upsert.mergeJdbc(b2, url, "job_postings", "POSITION_URI", props,
          dialect = "nope")
      }
      assert(e.getMessage.contains("unknown upsert dialect"))
    } finally {
      conn.close()
      // drop the in-memory database so reruns in the same JVM start clean
      try java.sql.DriverManager.getConnection(
        "jdbc:derby:memory:graft_upsert_it;drop=true")
      catch { case _: java.sql.SQLException => () } // drop "fails" by design
    }
  }

  test("upsertSql golden: the reference's ON CONFLICT form verbatim") {
    // mirrors etl/etl.py:467-488 — the one correct Postgres merge shape
    val sql = Upsert.upsertSql("job_postings",
      Seq("position_uri", "position_title", "organization_name"),
      "position_uri")
    assert(sql ==
      """INSERT INTO job_postings (position_uri, position_title, organization_name)
        |SELECT position_uri, position_title, organization_name FROM job_postings_staging
        |ON CONFLICT (position_uri) DO UPDATE SET position_title = EXCLUDED.position_title, organization_name = EXCLUDED.organization_name,
        |  updated_at = CURRENT_TIMESTAMP""".stripMargin)
    intercept[IllegalArgumentException] {
      Upsert.upsertSql("t", Seq("a", "b"), "missing")
    }
  }

  test("bucketed merge refuses a different numBuckets than the table " +
      "was written with") {
    val path = freshDir()
    val b1 = Seq(("https://x.gov/1", "Engineer"))
      .toDF("position_uri", "position_title")
    Upsert.mergeParquetBucketed(spark, b1, path, "position_uri", 4)
    val b2 = Seq(("https://x.gov/2", "Analyst"))
      .toDF("position_uri", "position_title")
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeParquetBucketed(spark, b2, path, "position_uri", 8)
    }
    assert(e.getMessage.contains("numBuckets=4"))
    // the original count still merges fine
    val s = Upsert.mergeParquetBucketed(spark, b2, path, "position_uri", 4)
    assert(s == Upsert.UpsertStats(1, 0, 1))
    assert(spark.read.parquet(path).count() == 2)
  }

  test("bucketed merge refuses an UNSTAMPED existing layout; " +
      "stampBucketCount adopts it") {
    val path = freshDir()
    val b1 = Seq(("https://x.gov/1", "Engineer"))
      .toDF("position_uri", "position_title")
    Upsert.mergeParquetBucketed(spark, b1, path, "position_uri", 4)
    // simulate a pre-stamp table (or a legacy layout): drop the stamp
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(path).resolve("_graft_buckets"))
    val b2 = Seq(("https://x.gov/2", "Analyst"))
      .toDF("position_uri", "position_title")
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeParquetBucketed(spark, b2, path, "position_uri", 8)
    }
    assert(e.getMessage.contains("stampBucketCount"))
    Upsert.stampBucketCount(path, 4)
    val s = Upsert.mergeParquetBucketed(spark, b2, path, "position_uri", 4)
    assert(s == Upsert.UpsertStats(1, 0, 1))
    assert(spark.read.parquet(path).count() == 2)
  }

  test("bucketed creation stamps BEFORE the data write (crash between " +
      "the two leaves a stamped empty table the next merge heals)") {
    val path = freshDir()
    // simulate the post-stamp/pre-data crash state
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    Upsert.stampBucketCount(path, 4)
    val b = Seq(("https://x.gov/1", "Engineer"))
      .toDF("position_uri", "position_title")
    val s = Upsert.mergeParquetBucketed(spark, b, path, "position_uri", 4)
    assert(s == Upsert.UpsertStats(1, 0, 1))
    assert(spark.read.parquet(path).count() == 1)
  }

  test("compactBucketed: one file per bucket dir afterwards, identical " +
      "rows, stamp preserved") {
    val path = freshDir()
    // three merges -> multiple files accumulate in touched bucket dirs
    (1 to 3).foreach { i =>
      val b = Seq((s"https://x.gov/$i", s"Title$i"))
        .toDF("position_uri", "position_title")
      Upsert.mergeParquetBucketed(spark, b, path, "position_uri", 2)
    }
    val before = spark.read.parquet(path).collect()
      .map(r => (r.getAs[String]("position_uri"),
        r.getAs[String]("position_title"))).toSet
    Upsert.compactBucketed(spark, path)
    val root = java.nio.file.Paths.get(path)
    val bucketDirs = java.nio.file.Files.list(root).iterator()
    val perDir = scala.collection.mutable.Map.empty[String, Int]
    bucketDirs.forEachRemaining { d =>
      if (d.getFileName.toString.startsWith("_bucket=")) {
        val files = java.nio.file.Files.list(d).iterator()
        var n = 0
        files.forEachRemaining(f =>
          if (f.getFileName.toString.endsWith(".parquet")) n += 1)
        perDir(d.getFileName.toString) = n
      }
    }
    assert(perDir.nonEmpty && perDir.values.forall(_ == 1),
      s"expected exactly one parquet file per bucket dir: $perDir")
    val after = spark.read.parquet(path).collect()
      .map(r => (r.getAs[String]("position_uri"),
        r.getAs[String]("position_title"))).toSet
    assert(after == before)
    // stamp survives, so merges keep validating
    val s = Upsert.mergeParquetBucketed(spark,
      Seq(("https://x.gov/9", "T9")).toDF("position_uri", "position_title"),
      path, "position_uri", 2)
    assert(s == Upsert.UpsertStats(1, 0, 1))
  }

  test("a failed first write never locks an EMPTY table to its bucket " +
      "count — a retry with a different count re-stamps") {
    val path = freshDir()
    // crash state again, but the retry picks a DIFFERENT count: with no
    // data there are no keys to strand, so it must succeed and re-stamp
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    Upsert.stampBucketCount(path, 64)
    val b = Seq(("https://x.gov/1", "Engineer"))
      .toDF("position_uri", "position_title")
    val s = Upsert.mergeParquetBucketed(spark, b, path, "position_uri", 8)
    assert(s == Upsert.UpsertStats(1, 0, 1))
    // the re-stamp is authoritative once data exists
    val b2 = Seq(("https://x.gov/2", "Analyst"))
      .toDF("position_uri", "position_title")
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeParquetBucketed(spark, b2, path, "position_uri", 64)
    }
    assert(e.getMessage.contains("numBuckets=8"))
  }

  test("readSnapshot falls back to the ._backup copy mid-swap") {
    val path = freshDir()
    val batch = Seq(("https://x.gov/1", "Engineer"))
      .toDF("position_uri", "position_title")
    Upsert.mergeParquet(spark, batch, path, "position_uri")
    // simulate the mid-swap window: live dir moved aside, staging not yet in
    val target = java.nio.file.Paths.get(path)
    val backup = java.nio.file.Paths.get(path + "._backup")
    Files.move(target, backup)
    assert(Upsert.readSnapshot(spark, path).count() == 1)
    Files.move(backup, target) // restore for hygiene
    assert(Upsert.readSnapshot(spark, path).count() == 1)
  }

  test("crash between swap moves: next merge restores the backup first") {
    val path = freshDir()
    val batch = Seq(("https://x.gov/1", "A"), ("https://x.gov/2", "B"))
      .toDF("position_uri", "position_title")
    Upsert.mergeParquet(spark, batch, path, "position_uri")
    // simulate dying after move(target, backup) but before
    // move(staging, target): the live snapshot sits in ._backup only
    Files.move(java.nio.file.Paths.get(path),
      java.nio.file.Paths.get(path + "._backup"))
    val delta = Seq(("https://x.gov/3", "C"))
      .toDF("position_uri", "position_title")
    val stats = Upsert.mergeParquet(spark, delta, path, "position_uri")
    // the backup was restored, so this is a MERGE, not a fresh load
    assert(stats == Upsert.UpsertStats(1, 0, 1))
    val rows = spark.read.parquet(path)
    assert(rows.count() == 3, "old snapshot rows must survive the crash")
    assert(!Files.exists(java.nio.file.Paths.get(path + "._backup")))
  }

  test("a failed swap restores the previous snapshot (no empty window)") {
    val path = freshDir()
    val batch = Seq(("https://x.gov/1", "A")).toDF("position_uri",
      "position_title")
    Upsert.mergeParquet(spark, batch, path, "position_uri")
    // leave a stale backup behind to prove pre-clean handles leftovers
    Files.createDirectory(java.nio.file.Paths.get(path + "._backup"))
    val again = Upsert.mergeParquet(spark,
      Seq(("https://x.gov/2", "B")).toDF("position_uri", "position_title"),
      path, "position_uri")
    assert(again.inserted == 1)
    assert(spark.read.parquet(path).count() == 2)
    assert(!Files.exists(java.nio.file.Paths.get(path + "._backup")))
    assert(!Files.exists(java.nio.file.Paths.get(path + "._staging")))
  }

  test("scd2Merge: two rounds build a correct version history — open " +
      "rows close at load ts, untouched keys stay open, closed " +
      "history is never rewritten") {
    import org.apache.spark.sql.functions.lit
    def ts(s: String) = Timestamp.valueOf(s)
    val t0 = lit("2024-01-01 00:00:00").cast("timestamp")
    val t1 = lit("2024-02-01 00:00:00").cast("timestamp")
    val t2 = lit("2024-03-01 00:00:00").cast("timestamp")
    val dim0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .withColumn("valid_from", t0)
      .withColumn("valid_to", lit(null).cast("timestamp"))
    // round 1: k=1 changes; round 2: k=1 changes again, k=3 appears
    val r1 = Upsert.scd2Merge(dim0,
      Seq((1L, "a2")).toDF("k", "v"), "k", t1)
    val r2 = Upsert.scd2Merge(r1,
      Seq((1L, "a3"), (3L, "c")).toDF("k", "v"), "k", t2)
    val rows = r2.collect().map(r => (r.getLong(0), r.getString(1),
      Option(r.getTimestamp(2)), Option(r.getTimestamp(3)))).toSet
    assert(rows == Set(
      (1L, "a", Some(ts("2024-01-01 00:00:00")),
        Some(ts("2024-02-01 00:00:00"))),
      (1L, "a2", Some(ts("2024-02-01 00:00:00")),
        Some(ts("2024-03-01 00:00:00"))),
      (1L, "a3", Some(ts("2024-03-01 00:00:00")), None),
      (2L, "b", Some(ts("2024-01-01 00:00:00")), None),
      (3L, "c", Some(ts("2024-03-01 00:00:00")), None)),
      s"got ${rows.mkString("\n")}")
    // exactly one open row per live key, always
    val open = rows.filter(_._4.isEmpty).map(_._1)
    assert(open == Set(1L, 2L, 3L))
  }

  // ---- scd2MergeParquet: the is_open-partitioned writer ------------

  private def ts(s: String) = Timestamp.valueOf(s)
  private def lts(s: String) =
    org.apache.spark.sql.functions.lit(s).cast("timestamp")

  private def scd2Rows(path: String): Set[(Long, String,
      Option[Timestamp], Option[Timestamp])] =
    Upsert.readScd2(spark, path)
      .select(col("k"), col("v"), col("valid_from"), col("valid_to"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getTimestamp(2)), Option(r.getTimestamp(3)))).toSet

  /** (relative file name → md5) of every parquet file in the closed
    * partition. */
  private def closedFiles(path: String): Map[String, String] = {
    val dir = java.nio.file.Paths.get(path, "is_open=false")
    if (!Files.exists(dir)) Map.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .map { p =>
          val md = java.security.MessageDigest.getInstance("MD5")
          dir.relativize(p).toString ->
            md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
        }.toMap
    }
  }

  test("scd2MergeParquet: merges equal the in-memory scd2Merge, and " +
      "closed-history files are byte-identical across later merges") {
    val path = freshDir()
    val t0 = lts("2024-01-01 00:00:00"); val t1 = lts("2024-02-01 00:00:00")
    val t2 = lts("2024-03-01 00:00:00")
    import spark.implicits._
    // initial load, then two update rounds (same fixture as the
    // in-memory test above)
    Upsert.scd2MergeParquet(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "k", t0)
    Upsert.scd2MergeParquet(spark, path,
      Seq((1L, "a2")).toDF("k", "v"), "k", t1)
    // snapshot the closed partition BEFORE the next merge
    val before = closedFiles(path)
    assert(before.nonEmpty, "round 1 must have closed (1,a)")
    Upsert.scd2MergeParquet(spark, path,
      Seq((1L, "a3"), (3L, "c")).toDF("k", "v"), "k", t2)
    // every pre-existing history file survived the merge byte-identical
    val after = closedFiles(path)
    before.foreach { case (name, hash) =>
      assert(after.get(name).contains(hash),
        s"history file $name was rewritten by the merge")
    }
    assert(after.size > before.size, "the newly closed version appends")
    // final content equals the in-memory operator on the same rounds
    assert(scd2Rows(path) == Set(
      (1L, "a", Some(ts("2024-01-01 00:00:00")),
        Some(ts("2024-02-01 00:00:00"))),
      (1L, "a2", Some(ts("2024-02-01 00:00:00")),
        Some(ts("2024-03-01 00:00:00"))),
      (1L, "a3", Some(ts("2024-03-01 00:00:00")), None),
      (2L, "b", Some(ts("2024-01-01 00:00:00")), None),
      (3L, "c", Some(ts("2024-03-01 00:00:00")), None)))
  }

  test("scd2MergeParquet: a crashed merge (closed rows appended, open " +
      "partition not yet swapped) heals exactly on retry — no " +
      "duplicate closed versions") {
    val path = freshDir()
    val t0 = lts("2024-01-01 00:00:00"); val t1 = lts("2024-02-01 00:00:00")
    import spark.implicits._
    Upsert.scd2MergeParquet(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "k", t0)
    // simulate the crash window: the to-close version of k=1 is already
    // in the closed partition, but k=1 is STILL open at t0 (the open
    // overwrite never ran)
    Seq((1L, "a")).toDF("k", "v")
      .withColumn("valid_from", t0)
      .withColumn("valid_to", t1)
      .withColumn("is_open", org.apache.spark.sql.functions.lit(false))
      .write.partitionBy("is_open")
      .mode(org.apache.spark.sql.SaveMode.Append).parquet(path)
    // retry of the same merge
    Upsert.scd2MergeParquet(spark, path,
      Seq((1L, "a2")).toDF("k", "v"), "k", t1)
    assert(scd2Rows(path) == Set(
      (1L, "a", Some(ts("2024-01-01 00:00:00")),
        Some(ts("2024-02-01 00:00:00"))),
      (1L, "a2", Some(ts("2024-02-01 00:00:00")), None),
      (2L, "b", Some(ts("2024-01-01 00:00:00")), None)),
      "retry must not duplicate the closed version")
  }
}
