package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Physical-layout guarantees: bucketed joins are shuffle-free, salted
  * joins are result-identical to plain joins. */
class LayoutSpec extends SparkSuite with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("bucketed co-located join plans ZERO shuffle exchanges") {
    val dir = "/root/testdata/sf0.001"
    // the in-memory catalog forgets tables between JVMs but their files
    // persist under the warehouse — clear both
    Seq("orders_bkt", "customer_bkt").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = java.nio.file.Paths.get("/tmp/graft_warehouse", tbl)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Layout.writeBucketed(
      spark.read.parquet(s"$dir/orders.parquet"),
      "orders_bkt", "o_custkey", 8)
    Layout.writeBucketed(
      spark.read.parquet(s"$dir/customer.parquet")
        .withColumnRenamed("c_custkey", "o_custkey"),
      "customer_bkt", "o_custkey", 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined =
        Layout.bucketedJoin(spark, "orders_bkt", "customer_bkt", "o_custkey")
      joined.collect()
      val exchanges = collect(joined.queryExecution.executedPlan) {
        case e: ShuffleExchangeLike => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join must not shuffle, found ${exchanges.size} exchanges")
      // same result as the plain (shuffling) join
      val plain = spark.read.parquet(s"$dir/orders.parquet")
        .join(spark.read.parquet(s"$dir/customer.parquet")
          .withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
      assert(joined.count() == plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("date-partitioned layout: a day filter prunes to one partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bydate")
      .toString + "/events"
    // Tables.load normalizes whichever physical ts flavor the harness
    // writer emitted (NANOS-as-long or MICROS NTZ) to an instant
    val events = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "events")
    Layout.writePartitionedByDay(events, "ts", dir)
    val nDays = spark.read.parquet(dir)
      .select(org.apache.spark.sql.functions.countDistinct(col("p_date")))
      .head.getLong(0)
    assert(nDays > 1, "need multiple day partitions for the pruning test")

    val day = spark.read.parquet(dir).select(col("p_date")).head.getDate(0)
    val pruned = spark.read.parquet(dir).filter(col("p_date") === day)
    // directory pruning: the scan reads only the matching partition
    val files = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.selectedPartitions.partitionCount
      }
    assert(files.contains(1),
      s"expected exactly one selected partition, got $files")
    assert(pruned.count() > 0)
  }

  test("saltedEquiJoin is row-identical to the plain join under skew") {
    // skew: 90% of the large side hits key 1
    val large = (1L to 2000L)
      .map(i => (if (i % 10 == 0) i % 7 else 1L, s"row$i"))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "warm"), (3L, "cold"))
      .toDF("k", "label")

    val plain = large.join(small, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    val salted = Layout.saltedEquiJoin(large, small, "k", salts = 16)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    assert(salted.toSeq == plain.toSeq)
    assert(plain.nonEmpty)
  }

  test("salt distribution actually spreads the hot key") {
    val large = (1L to 1000L).map(i => (1L, s"row$i")).toDF("k", "payload")
    val counts = large
      .withColumn("_salt",
        pmod(xxhash64(col("k"), col("payload")), lit(16)))
      .groupBy("_salt").count().collect().map(_.getLong(1))
    assert(counts.length == 16, "all 16 salt buckets populated")
    assert(counts.max < 1000 / 16 * 3, "no salt bucket dominates")
  }

  test("zOrderCode: every cell is a bounded rectangle and codes cover " +
      "the full grid on uniform keys") {
    val n = 4096
    val df = (0 until n).map(i => (i.toLong, ((i * 2654435761L) %
      n).toLong)).toDF("l_orderkey", "l_partkey")
    val cells = Layout.zOrderCells(df).collect()
    assert(cells.length == 256, s"16x16 grid expected: ${cells.length}")
    cells.foreach { r =>
      val so = r.getAs[Long]("max_orderkey") - r.getAs[Long]("min_orderkey")
      val sp = r.getAs[Long]("max_partkey") - r.getAs[Long]("min_partkey")
      // each cell is one quantile bucket per dimension: span <= ~n/16
      assert(so <= n / 16 && sp <= n / 16,
        s"cell ${r.getAs[Long]("z_code")} spans $so x $sp")
    }
  }

  test("zOrderWrite: per-file spans stay narrow on BOTH dimensions " +
      "where a single-column sort leaves the second dimension " +
      "file-spanning") {
    val n = 4096
    val df = (0 until n).map(i => (i.toLong, ((i * 2654435761L) %
      n).toLong)).toDF("l_orderkey", "l_partkey")
    val zDir = "/tmp/graft_zorder_test"
    val sDir = "/tmp/graft_sorted_test"
    Layout.zOrderWrite(df, Seq("l_orderkey", "l_partkey"), zDir,
      files = 8)
    df.repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(sDir)
    def avgPartkeySpan(path: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col("l_partkey")) - min(col("l_partkey")))
          .as("span"))
        .collect().map(_.getAs[Long]("span").toDouble)
      spans.sum / spans.length
    }
    val zSpan = avgPartkeySpan(zDir)
    val sSpan = avgPartkeySpan(sDir)
    // hash-scattered partkey: a range-sort on orderkey leaves every
    // file spanning ~the full partkey range; z-order halves+ it
    assert(sSpan > 0.9 * n,
      s"baseline files should span partkey fully: $sSpan")
    assert(zSpan < 0.7 * sSpan,
      s"z-order must shrink the second dimension: $zSpan vs $sSpan")
  }

  test("zOrderAppend: rewrites ONLY the curve tiles the delta touches; " +
      "incremental result == full membership; clean files untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zappend")
      .toFile.getAbsolutePath
    val table = dir + "/ztable"
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
    val base = li.filter(col("l_orderkey") > 1000L)
    val delta = li.filter(col("l_orderkey") <= 1000L)
    assert(delta.count() > 0 && base.count() > 0)
    Layout.zOrderWriteIndexed(base, Seq("l_orderkey", "l_partkey"),
      table, bits = 4, files = 6)
    def files(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(table))
        .iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
    }
    val before = files()
    val report = Layout.zOrderAppend(spark, delta, table).head()
    assert(report.getAs[Long]("n_files_before") == 6L)
    val nDirty = report.getAs[Long]("n_dirty")
    val nClean = report.getAs[Long]("n_clean")
    assert(nDirty >= 1L, "the delta must touch at least one tile")
    assert(nClean >= 1L,
      "a narrow-key delta must leave some curve tiles clean — " +
        s"dirty=$nDirty clean=$nClean")
    assert(report.getAs[Long]("n_delta_rows") == delta.count())
    // clean files survive by identity (same name, same mtime)
    val after = files()
    val untouched = before.keySet.intersect(after.keySet)
      .count(k => before(k) == after(k))
    assert(untouched == nClean,
      s"clean files must not be rewritten: $untouched vs $nClean")
    // incremental result == full membership (the table keeps z_code —
    // compare the payload columns as sorted multisets). readZOrdered is
    // the maintained-table read contract (through the manifest) …
    val got = Layout.readZOrdered(spark, table)
      .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
      .collect().map(_.toSeq).sortBy(_.toString)
    val want = base.unionByName(delta)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(got.length == want.length)
    assert(got.sameElements(want), "row multiset must match base+delta")
    // … and after a COMPLETED append (cleanup done) the plain directory
    // read agrees — no debris outlives the append
    assert(spark.read.parquet(table).count() == want.length.toLong)
    // a second append of an ALREADY-covered code range is idempotent
    // in accounting terms: still bounded by the file count
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("zOrderAppend range derivation is parquet-FOOTER metadata only: " +
      "zero Spark jobs, values identical to a full scan of the table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zranges")
      .toFile.getAbsolutePath
    val table = dir + "/ztable"
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
    Layout.zOrderWriteIndexed(li, Seq("l_orderkey", "l_partkey"),
      table, bits = 4, files = 6)
    // ground truth the expensive way: scan every row per file
    val scanned = spark.read.parquet(table)
      .withColumn("_f", input_file_name())
      .groupBy(col("_f"))
      .agg(min(col("z_code")).as("lo"), max(col("z_code")).as("hi"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => new java.io.File(
          new java.net.URI(r.getString(0)).getPath).getName ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val ranges =
      try {
        val r = Layout.liveFileRanges(spark, table)
        Thread.sleep(1000) // listener bus is async — let events drain
        r
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs.get() == 0,
      s"footer range derivation must launch NO Spark jobs, saw ${jobs.get()}")
    assert(ranges.size == 6)
    ranges.foreach { case (name, lo, hi, n) =>
      val (slo, shi, sn) = scanned(name)
      assert(lo == slo && hi == shi && n == sn,
        s"footer range for $name = ($lo,$hi,$n), scan says ($slo,$shi,$sn)")
    }
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("zOrderAppend reads NO clean-file rows: total records read is " +
      "bounded by the delta and the dirty tiles") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zscan")
      .toFile.getAbsolutePath
    val table = dir + "/ztable"
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
    // a delta in the LOW CORNER of both key ranges — it codes to a few
    // adjacent curve tiles, leaving most files clean
    val isDelta = col("l_orderkey") <= 150L && col("l_partkey") <= 40L
    val base = li.filter(!isDelta)
    // pin the delta outside parquet: its own reads must not pollute the
    // append's input metrics
    val delta = li.filter(isDelta).localCheckpoint()
    val nBase = base.count()
    val nDelta = delta.count()
    assert(nDelta > 0)
    Layout.zOrderWriteIndexed(base, Seq("l_orderkey", "l_partkey"),
      table, bits = 4, files = 12)
    val read = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        Option(te.taskMetrics).foreach(m =>
          read.addAndGet(m.inputMetrics.recordsRead))
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val report =
      try {
        val r = Layout.zOrderAppend(spark, delta, table).head()
        Thread.sleep(1000) // async listener bus
        r
      } finally spark.sparkContext.removeSparkListener(listener)
    val dirtyRows =
      report.getAs[Long]("n_rewritten_rows") - report.getAs[Long]("n_delta_rows")
    val cleanRows = nBase - dirtyRows
    // the append touches the delta a handful of times (distinct-code
    // collect, count, range sampling, write) and each dirty row twice
    // (range sampling + write); clean rows NEVER
    val bound = 6 * nDelta + 3 * dirtyRows + 256
    assert(read.get() <= bound,
      s"append read ${read.get()} records — clean files were scanned " +
        s"(delta=$nDelta dirty=$dirtyRows bound=$bound)")
    // teeth: if the old full-table range scan were still in place, the
    // clean rows alone would blow the bound
    assert(cleanRows > bound,
      s"test has no teeth: clean=$cleanRows <= bound=$bound — narrow " +
        "the delta or add files")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("zOrderAppend commit protocol: a reader at EVERY injected crash " +
      "point sees a complete table; retry converges and vacuums debris") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zcrash")
      .toFile.getAbsolutePath
    val table = dir + "/ztable"
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
    val base = li.filter(col("l_orderkey") > 1000L)
    val delta1 = li.filter(col("l_orderkey") <= 500L)
    val delta2 = li.filter(col("l_orderkey") > 500L &&
      col("l_orderkey") <= 1000L)
    def payload(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.select(col("l_orderkey"), col("l_partkey"),
          col("l_extendedprice"))
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val baseRows = payload(base)
    Layout.zOrderWriteIndexed(base, Seq("l_orderkey", "l_partkey"),
      table, bits = 4, files = 6)
    // CRASH 1: after staged parts moved in, BEFORE the manifest commit.
    // A reader sees the OLD table, complete — not one missing rows.
    val e1 = intercept[IllegalStateException] {
      Layout.zOrderAppendImpl(spark, delta1, table, "before-commit")
    }
    assert(e1.getMessage.contains("before-commit"))
    assert(payload(Layout.readZOrdered(spark, table)) == baseRows,
      "reader before the commit instant must see the old complete table")
    // the moved-in orphans ARE on disk — exactly why the read contract
    // goes through the manifest
    assert(spark.read.parquet(table).count() > baseRows.length.toLong,
      "crash debris should exist on disk (else this test tests nothing)")
    // CRASH 2 (retry of the same delta): commit lands, crash BEFORE
    // cleanup. A reader sees the NEW table, complete — dirty files are
    // still on disk but unreferenced.
    val e2 = intercept[IllegalStateException] {
      Layout.zOrderAppendImpl(spark, delta1, table, "before-cleanup")
    }
    assert(e2.getMessage.contains("before-cleanup"))
    val want1 = payload(base.unionByName(delta1))
    assert(payload(Layout.readZOrdered(spark, table)) == want1,
      "reader after the commit instant must see the new complete table")
    // NORMAL append on top of the debris: vacuums it, converges
    val report = Layout.zOrderAppend(spark, delta2, table).head()
    assert(report.getAs[Long]("n_delta_rows") == delta2.count())
    val want2 = payload(base.unionByName(delta1).unionByName(delta2))
    assert(payload(Layout.readZOrdered(spark, table)) == want2,
      "post-vacuum table must hold exactly base+delta1+delta2")
    // cleanup ran: the directory holds ONLY the live files (+ metadata),
    // so even a plain directory read agrees
    assert(spark.read.parquet(table).count() == want2.length.toLong,
      "vacuum + cleanup must leave no unreferenced data files")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("footerStats (x46): per-(file, column) rows/nulls/min/max agree " +
      "with a full scan; string columns render; bytes are positive") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fstats")
      .toFile.getAbsolutePath
    val table = dir + "/t"
    // multi-file table with a null-bearing long column and a string
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, lit(null).cast("long"))
          .otherwise(col("o_totalprice").cast("long")).as("price_n"),
        col("o_orderpriority"))
      .repartition(4, col("o_orderkey"))
      .write.parquet(table)
    val stats = Layout.footerStats(spark, table).collect()
      .map(r => (r.getAs[String]("file"), r.getAs[String]("column")) -> r)
      .toMap
    val scanned = spark.read.parquet(table)
      .withColumn("_f", input_file_name())
      .groupBy(col("_f"))
      .agg(count(lit(1)).as("rows"),
        sum(when(col("price_n").isNull, 1L).otherwise(0L)).as("nulls"),
        min(col("price_n")).as("lo"), max(col("price_n")).as("hi"),
        min(col("o_orderkey")).as("klo"), max(col("o_orderkey")).as("khi"),
        min(col("o_orderpriority")).as("slo"),
        max(col("o_orderpriority")).as("shi"))
      .collect()
      .map(r => new java.io.File(
        new java.net.URI(r.getString(0)).getPath).getName -> r)
      .toMap
    assert(scanned.size == 4)
    scanned.foreach { case (f, r) =>
      val p = stats((f, "price_n"))
      assert(p.getAs[Long]("rows") == r.getAs[Long]("rows"))
      assert(p.getAs[Long]("n_nulls") == r.getAs[Long]("nulls"))
      assert(p.getAs[Boolean]("has_stats"))
      assert(p.getAs[Double]("min_num") == r.getAs[Long]("lo").toDouble)
      assert(p.getAs[Double]("max_num") == r.getAs[Long]("hi").toDouble)
      val k = stats((f, "o_orderkey"))
      assert(k.getAs[Double]("min_num") == r.getAs[Long]("klo").toDouble)
      assert(k.getAs[Double]("max_num") == r.getAs[Long]("khi").toDouble)
      // string stats render as the scanned min/max (short values —
      // no writer truncation) and carry NO numeric twin
      val s = stats((f, "o_orderpriority"))
      assert(s.getAs[String]("min_val") == r.getAs[String]("slo"))
      assert(s.getAs[String]("max_val") == r.getAs[String]("shi"))
      assert(s.isNullAt(s.fieldIndex("min_num")))
      assert(p.getAs[Long]("compressed_bytes") > 0 &&
        p.getAs[Long]("uncompressed_bytes") > 0)
    }
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("pruneAudit: skippable files verifiably contain ZERO matching " +
      "rows, and a clustered layout makes most files skippable") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prune")
      .toFile.getAbsolutePath
    val table = dir + "/zt"
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
    Layout.zOrderWrite(li, Seq("l_orderkey", "l_partkey"), table,
      files = 10)
    val (lo, hi) = (100.0, 600.0) // narrow l_orderkey band
    val audit = Layout.pruneAudit(spark, table, "l_orderkey", lo, hi)
      .head()
    assert(audit.getAs[Long]("n_files") == 10)
    // Teeth: RELATIVE, not an absolute file count. zOrderWrite splits
    // files with repartitionByRange, whose SAMPLED boundaries make the
    // per-file orderkey spans nondeterministic — an absolute "skip >= 5
    // of 10" got 4 in one full-suite run and 5-8 in isolation on
    // byte-identical code. What the operator GUARANTEES is that the
    // z-order layout localizes the band where a layout clustered on the
    // OTHER dimension cannot: a partkey-sorted 10-file layout scatters
    // l_orderkey across every file (~500 uniform keys/file; P(file
    // avoids an 8%-of-keyspace band) ~ 0.92^500 ~ 0), so its audit
    // skips 0 files and z-order's must strictly beat it.
    val baseTable = dir + "/base"
    li.repartitionByRange(10, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(baseTable)
    val baseAudit = Layout.pruneAudit(spark, baseTable, "l_orderkey",
      lo, hi).head()
    assert(audit.getAs[Long]("n_skippable") >
        baseAudit.getAs[Long]("n_skippable"),
      s"z-order must localize the band strictly better than the " +
        s"partkey-clustered layout: z=${audit.getAs[Long]("n_skippable")}" +
        s" base=${baseAudit.getAs[Long]("n_skippable")}")
    assert(audit.getAs[Long]("n_skippable") >= 1L)
    assert(audit.getAs[Double]("skippable_frac") > 0.0)
    // correctness: files the audit calls skippable hold NO matching rows
    val stats = Layout.footerStats(spark, table)
      .filter(col("column") === "l_orderkey").collect()
    val skippable = stats.filter { r =>
      r.getAs[Boolean]("has_stats") &&
        (r.getAs[Double]("max_num") < lo || r.getAs[Double]("min_num") > hi)
    }.map(_.getAs[String]("file"))
    assert(skippable.length == audit.getAs[Long]("n_skippable"))
    val inSkipped = spark.read.parquet(skippable.map(table + "/" + _): _*)
      .filter(col("l_orderkey") >= lo && col("l_orderkey") <= hi)
      .count()
    assert(inSkipped == 0L,
      "a skippable file must contain zero rows matching the predicate")
    // completeness: the matching rows all live in the kept files
    val kept = stats.map(_.getAs[String]("file")).toSet -- skippable.toSet
    val inKept = spark.read.parquet(kept.toSeq.map(table + "/" + _): _*)
      .filter(col("l_orderkey") >= lo && col("l_orderkey") <= hi)
      .count()
    val total = li.filter(col("l_orderkey") >= lo &&
      col("l_orderkey") <= hi).count()
    assert(inKept == total, "kept files must hold every matching row")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("zOrderCompact (x47): folds only sub-target files, preserves the " +
      "row multiset, leaves large files untouched, and no-ops at " +
      "steady state") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zcompact")
      .toFile.getAbsolutePath
    val table = dir + "/ztable"
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
    def dataFiles(): Map[String, Long] =
      new java.io.File(table).listFiles()
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
        .map(f => f.getName -> f.lastModified()).toMap
    // 12 files of ~500 rows each — all below a 2000-row target
    Layout.zOrderWriteIndexed(li, Seq("l_orderkey", "l_partkey"),
      table, bits = 4, files = 12)
    val want = Layout.readZOrdered(spark, table)
      .collect().map(_.toSeq).sortBy(_.toString)
    val report = Layout.zOrderCompact(spark, table, targetRows = 2000L)
      .head()
    assert(report.getAs[Long]("n_small_folded") == 12L,
      s"all 12 sub-target files must fold, got $report")
    assert(report.getAs[Long]("n_files_after") <
      report.getAs[Long]("n_files_before"),
      "compaction must reduce the file count")
    // row multiset preserved, through the manifest AND the plain dir
    val got = Layout.readZOrdered(spark, table)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(got.length == want.length && got.sameElements(want),
      "compaction must preserve the row multiset")
    assert(spark.read.parquet(table).count() == want.length.toLong,
      "cleanup must leave no unreferenced data files")
    assert(dataFiles().size ==
      report.getAs[Long]("n_files_after").toInt)
    // steady state: every file is now AT/ABOVE a smaller target — the
    // second compact must no-op and touch NOTHING (names + mtimes)
    val before = dataFiles()
    val again = Layout.zOrderCompact(spark, table, targetRows = 1500L)
      .head()
    assert(again.getAs[Long]("n_rows_rewritten") == 0L &&
      again.getAs[Long]("n_small_folded") == 0L,
      s"compact over at-target files must no-op, got $again")
    val after = dataFiles()
    assert(after == before,
      "a no-op compact must leave every data file untouched")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("zOrderCompact commit protocol: reader at the injected crash " +
      "points sees a complete table; retry converges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zcc")
      .toFile.getAbsolutePath
    val table = dir + "/ztable"
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
    Layout.zOrderWriteIndexed(li, Seq("l_orderkey", "l_partkey"),
      table, bits = 4, files = 8)
    val want = Layout.readZOrdered(spark, table)
      .collect().map(_.toSeq).sortBy(_.toString)
    val e1 = intercept[IllegalStateException] {
      Layout.zOrderCompactImpl(spark, table, 100000L, "before-commit")
    }
    assert(e1.getMessage.contains("before-commit"))
    assert(Layout.readZOrdered(spark, table)
      .collect().map(_.toSeq).sortBy(_.toString).sameElements(want),
      "reader before the commit sees the OLD complete table")
    val e2 = intercept[IllegalStateException] {
      Layout.zOrderCompactImpl(spark, table, 100000L, "before-cleanup")
    }
    assert(e2.getMessage.contains("before-cleanup"))
    assert(Layout.readZOrdered(spark, table)
      .collect().map(_.toSeq).sortBy(_.toString).sameElements(want),
      "reader after the commit sees the NEW complete table")
    // normal retry on top of the debris: vacuums, converges, and the
    // directory ends clean
    Layout.zOrderCompact(spark, table, 100000L)
    assert(Layout.readZOrdered(spark, table)
      .collect().map(_.toSeq).sortBy(_.toString).sameElements(want))
    assert(spark.read.parquet(table).count() == want.length.toLong)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("zOrderAppend refuses a table without frozen cuts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zplain")
      .toFile.getAbsolutePath
    val table = dir + "/plain"
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    Layout.zOrderWrite(li, Seq("l_orderkey", "l_partkey"), table)
    val e = intercept[IllegalArgumentException] {
      Layout.zOrderAppend(spark, li.limit(5), table)
    }
    assert(e.getMessage.contains("zOrderWriteIndexed"))
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }
}
