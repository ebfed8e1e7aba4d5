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
    // unsplittable-input guard (guide §2.5): the per-row bucket fold
    // (2×15 cut comparisons) + morton interleave over the whole fact
    // table serializes on a one-split scan; two narrow longs per row
    // make the guarded fan-out shuffle trivially cheap
    zOrderCode(ScanParallelism.widen(
        lineitem.select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey"),
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

  /** Frozen-cuts metadata for incrementally-maintained Z-order tables
    * (underscore prefix: parquet readers ignore it). */
  private val ZCUTS_FILE = "_graft_zcuts"

  /** Versioned live-file manifests — the table's commit pointer.
    * `_graft_zmanifest-<version>` lists the data files a reader may
    * see; the HIGHEST version is the table's current state, and a
    * manifest becomes visible by ONE atomic rename, so a reader (or a
    * crash) at any instant resolves to exactly one complete file set —
    * never a table missing rows mid-swap. Underscore prefix: plain
    * `spark.read.parquet(dir)` ignores the manifests (it sees live +
    * any not-yet-vacuumed superseded files; the maintained-table read
    * contract is readZOrdered). */
  private val MANIFEST_PREFIX = "_graft_zmanifest-"

  private def manifestVersion(name: String): Option[Long] =
    if (name.startsWith(MANIFEST_PREFIX))
      scala.util.Try(name.drop(MANIFEST_PREFIX.length).toLong).toOption
    else None

  private def hadoopFs(spark: SparkSession, path: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def readUtf8(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** Write bytes to a dot-prefixed temp name, then publish by ONE
    * rename — the manifest commit point (rename is atomic on HDFS and
    * on the local FS; the destination name never pre-exists because
    * versions only grow). */
  private def writeAtomic(fs: org.apache.hadoop.fs.FileSystem,
      dst: org.apache.hadoop.fs.Path, text: String): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(dst.getParent,
      "." + dst.getName + ".tmp-" + java.util.UUID.randomUUID())
    val out = fs.create(tmp, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
    require(fs.rename(tmp, dst), s"atomic publish failed: $tmp -> $dst")
  }

  /** (current version, live data-file names) from the highest
    * manifest. Lines starting with '#' are commit METADATA (the
    * streaming exactly-once tag rides inside the same atomic rename
    * as the file list), not file names. */
  private def latestManifest(fs: org.apache.hadoop.fs.FileSystem,
      table: org.apache.hadoop.fs.Path): (Long, Seq[String]) = {
    val versions = fs.listStatus(table).toSeq
      .flatMap(s => manifestVersion(s.getPath.getName))
    require(versions.nonEmpty,
      s"$table has no $MANIFEST_PREFIX* commit pointer — not an " +
        "incrementally-maintained table (write it with zOrderWriteIndexed)")
    val v = versions.max
    val text = readUtf8(fs,
      new org.apache.hadoop.fs.Path(table, manifestName(v)))
    (v, text.split("\n").toSeq
      .filter(l => l.nonEmpty && !l.startsWith("#")))
  }

  /** The commit tag of the CURRENT manifest, if the last append
    * carried one — the streaming exactly-once seam: a replayed
    * micro-batch compares its batch id against this before appending
    * (the tag is committed in the SAME atomic rename as the file
    * list, so "tag visible" and "rows visible" cannot diverge). */
  def lastCommitTag(spark: SparkSession, path: String): Option[String] = {
    val (fs, table) = hadoopFs(spark, path)
    val versions = fs.listStatus(table).toSeq
      .flatMap(s => manifestVersion(s.getPath.getName))
    require(versions.nonEmpty,
      s"$table has no $MANIFEST_PREFIX* commit pointer")
    manifestTag(fs, table, versions.max)
  }

  private def manifestTag(fs: org.apache.hadoop.fs.FileSystem,
      table: org.apache.hadoop.fs.Path, version: Long): Option[String] =
    readUtf8(fs, new org.apache.hadoop.fs.Path(table,
        manifestName(version)))
      .split("\n").toSeq
      .find(_.startsWith("#tag:")).map(_.drop("#tag:".length))

  private def manifestName(version: Long): String =
    f"$MANIFEST_PREFIX$version%08d"

  /** Vacuum debris from a crashed prior append/compact: data files not
    * in the current manifest (orphaned staged moves, undeleted
    * superseded files), superseded manifests, and stale sibling
    * staging dirs. Single-writer contract: everything deleted here is
    * unreferenced by the current commit pointer. */
  private def vacuumDebris(fs: org.apache.hadoop.fs.FileSystem,
      table: org.apache.hadoop.fs.Path, version: Long,
      live: Seq[String]): Unit = {
    val liveSet = live.toSet
    fs.listStatus(table).foreach { st =>
      val n = st.getPath.getName
      val superseded = manifestVersion(n).exists(_ < version)
      val orphan = st.isFile && !liveSet(n) && !n.startsWith("_") &&
        !n.startsWith(".")
      if (superseded || orphan) fs.delete(st.getPath, false)
    }
    val stagingPrefix = table.getName + ".zappend-staging-"
    Option(table.getParent).filter(p => fs.exists(p)).foreach { parent =>
      fs.listStatus(parent).foreach { st =>
        if (st.isDirectory && st.getPath.getName.startsWith(stagingPrefix))
          fs.delete(st.getPath, true)
      }
    }
  }

  /** Read an incrementally-maintained Z-order table THROUGH its
    * manifest — the consistent-snapshot read path: the file list comes
    * from the highest committed manifest, so a concurrent zOrderAppend
    * (or its crash debris) is invisible until its one-rename commit. */
  def readZOrdered(spark: SparkSession, path: String): DataFrame = {
    val (fs, table) = hadoopFs(spark, path)
    val (_, live) = latestManifest(fs, table)
    spark.read.parquet(live.map(n =>
      new org.apache.hadoop.fs.Path(table, n).toString): _*)
  }

  /** Per-file [min,max] z_code range + row count from the parquet
    * FOOTER — file-count metadata reads, ZERO data-row scans (the
    * lakehouse contract x44's docstring promises: clean files are
    * never read past their footer). A file whose z_code chunk lacks
    * stats degrades to the always-dirty range (conservative: it gets
    * rewritten, never silently skipped); an empty file reports the
    * never-dirty empty range. */
  private def footerRange(conf: org.apache.hadoop.conf.Configuration,
      file: org.apache.hadoop.fs.Path): (Long, Long, Long) = {
    import scala.jdk.CollectionConverters._
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      var n = 0L
      var lo = Long.MaxValue
      var hi = Long.MinValue
      var statsOk = true
      reader.getFooter.getBlocks.asScala.foreach { b =>
        n += b.getRowCount
        b.getColumns.asScala
          .find(_.getPath.toDotString == "z_code") match {
          case Some(c) =>
            val st: org.apache.parquet.column.statistics.Statistics[_] =
              c.getStatistics
            if (st == null || st.isEmpty || !st.hasNonNullValue)
              statsOk = false
            else {
              lo = math.min(lo,
                st.genericGetMin.asInstanceOf[java.lang.Long].longValue)
              hi = math.max(hi,
                st.genericGetMax.asInstanceOf[java.lang.Long].longValue)
            }
          case None => statsOk = false
        }
      }
      if (n == 0L) (Long.MaxValue, Long.MinValue, 0L)
      else if (!statsOk) (Long.MinValue, Long.MaxValue, n)
      else (lo, hi, n)
    } finally reader.close()
  }

  /** The quantile cut grid zOrderCode derives — collected (bounded:
    * |cols| × (2^bits − 1) doubles) so an INDEXED table can freeze it
    * at write time and code later appends against the ORIGINAL grid
    * (codes from different grids are not comparable). */
  private def collectCuts(df: DataFrame, cols: Seq[String], bits: Int)
      : Seq[(String, Seq[Double])] = {
    val nCuts = (1 << bits) - 1
    val fracs = array((1 to nCuts).map(k =>
      lit(k.toDouble / (1 << bits))): _*)
    val row = df.agg(
      percentile(col(cols.head).cast("double"), fracs)
        .as(s"_c_${cols.head}"),
      cols.tail.map(c =>
        percentile(col(c).cast("double"), fracs).as(s"_c_$c")): _*)
      .head()
    cols.map(c => c -> row.getSeq[Double](row.fieldIndex(s"_c_$c")))
  }

  /** Map-side Morton coding against a FROZEN cut grid — no percentile
    * pass, the cuts ride as array literals inside codegen. */
  private def codeWithCuts(df: DataFrame,
      cuts: Seq[(String, Seq[Double])]): DataFrame = {
    val cols = cuts.map(_._1)
    def bucket(c: String, cs: Seq[Double]): Column =
      aggregate(array(cs.map(lit): _*), lit(0L),
        (acc, cut) => acc +
          when(col(c).cast("double") > cut, 1L).otherwise(0L))
    val n = cuts.head._2.size + 1
    require((n & (n - 1)) == 0, "cut count must be 2^bits - 1")
    val bits = java.lang.Integer.numberOfTrailingZeros(n)
    val morton = (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        val weight = 1L << (i.toLong * cols.size + (cols.size - 1 - j))
        expr(s"((_b_$c div ${1L << i}) % 2) * ${weight}L")
      }
    }.reduce(_ + _)
    cuts.foldLeft(df) { case (acc, (c, cs)) =>
      acc.withColumn(s"_b_$c", bucket(c, cs))
    }
      .withColumn("z_code", morton)
      .drop(cols.map(c => s"_b_$c"): _*)
  }

  /** Z-order write for a table that will take INCREMENTAL appends:
    * same range-partitioned curve tiling as zOrderWrite, but the
    * z_code column is KEPT in the files (per-file code ranges are
    * then a parquet-FOOTER read away — zero data rows), the quantile
    * cut grid is FROZEN beside the table so appends code new rows
    * against the original grid, and the live file set is committed
    * as manifest version 0 (readZOrdered reads through it). */
  def zOrderWriteIndexed(df: DataFrame, cols: Seq[String], path: String,
      bits: Int = 4, files: Int = 8): Unit = {
    require(cols.size >= 2, "z-order needs at least two columns")
    require(bits >= 1 && bits * cols.size <= 62, "code must fit a long")
    val cuts = collectCuts(df, cols, bits)
    codeWithCuts(df, cuts)
      .repartitionByRange(files, col("z_code"))
      .sortWithinPartitions(col("z_code"))
      .write.mode("overwrite").parquet(path)
    val (fs, table) = hadoopFs(df.sparkSession, path)
    val text = cuts.map { case (c, cs) =>
      c + ":" + cs.mkString(",") }.mkString("\n")
    writeAtomic(fs, new org.apache.hadoop.fs.Path(table, ZCUTS_FILE), text)
    val parts = fs.listStatus(table).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("part-")).sorted
    writeAtomic(fs, new org.apache.hadoop.fs.Path(table, manifestName(0L)),
      parts.mkString("\n"))
  }

  private def readCuts(fs: org.apache.hadoop.fs.FileSystem,
      table: org.apache.hadoop.fs.Path): Seq[(String, Seq[Double])] = {
    val f = new org.apache.hadoop.fs.Path(table, ZCUTS_FILE)
    require(fs.exists(f),
      s"$table is not an indexed z-order table (no $ZCUTS_FILE — " +
        "write it with zOrderWriteIndexed)")
    readUtf8(fs, f)
      .split("\n").toSeq.map { line =>
        val Array(c, cs) = line.split(":", 2)
        c -> cs.split(",").toSeq.map(_.toDouble)
      }
  }

  /** The append leg's range source, exposed for the spec: per live
    * file (name, z_code min, z_code max, rows) — pure driver-side
    * footer metadata, launches ZERO Spark jobs and reads ZERO data
    * rows (LayoutSpec pins both, plus value-parity with a full-scan
    * computation of the same ranges). */
  private[graft] def liveFileRanges(spark: SparkSession, path: String)
      : Seq[(String, Long, Long, Long)] = {
    val (fs, table) = hadoopFs(spark, path)
    val (_, live) = latestManifest(fs, table)
    val conf = spark.sparkContext.hadoopConfiguration
    live.map { name =>
      val (lo, hi, n) =
        footerRange(conf, new org.apache.hadoop.fs.Path(table, name))
      (name, lo, hi, n)
    }
  }

  /** x44: INCREMENTAL Z-order maintenance — the OPTIMIZE-incremental
    * a lakehouse table needs: merge an append batch into an indexed
    * Z-order table while rewriting ONLY the files whose code range
    * the batch actually touches. Full re-clustering pays one sort of
    * the WHOLE table per append; this pays one sort of (delta +
    * dirty files), and a delta that lands in a narrow key rectangle
    * dirties a narrow set of curve tiles — the whole point of
    * range-tiling the curve at write time.
    *
    * Mechanics: the delta codes map-side against the frozen cut grid;
    * per-file [min,max] code ranges come from the parquet FOOTERS of
    * the manifest's live files (file-count metadata reads — clean
    * files contribute ZERO data-row reads to an append, the
    * lakehouse contract; LayoutSpec pins it with scan metrics). A
    * file is dirty iff its range contains one of the delta's
    * ≤ 2^(bits·|cols|) distinct codes — binary search of the sorted
    * code set per file, O(files · log codes) on the driver (the
    * file LIST is driver-resident either way; at a file count where
    * that matters the listing itself moves to a metastore). Dirty
    * rows + delta re-sort and land as fresh curve-sorted files.
    *
    * Commit protocol (single writer; readers any time): staged parts
    * write to a UUID-suffixed staging dir → move into the table dir
    * under fresh names (invisible: not in any manifest) → commit ONE
    * atomic manifest rename → only then delete dirty files and
    * superseded manifests. A reader through readZOrdered therefore
    * sees the OLD complete table before the commit instant and the
    * NEW complete table after it — never a table missing the dirty
    * rows, never transient duplicates. A crash before the commit
    * leaves the old manifest current (orphaned staged files are
    * vacuumed by the next append); a crash after it leaves the new
    * table current (undeleted dirty files are unreferenced and
    * likewise vacuumed). All file ops go through the Hadoop
    * FileSystem API — the same code path works on HDFS/object-store
    * filesystems, not just file://.
    *
    * Returns the one-row maintenance report (file and row
    * accounting) — the spec pins incremental == full-rebuild row
    * multiset, clean-file untouchedness, zero clean-row reads, and
    * reader-visible completeness at every injected crash point. */
  def zOrderAppend(spark: SparkSession, delta: DataFrame, path: String,
      tag: Option[String] = None): DataFrame =
    zOrderAppendImpl(spark, delta, path, failAt = "", tag)

  /** Test seam: `failAt` ∈ {"before-commit", "before-cleanup"} throws
    * at that point so the spec can pin what a reader (and a retry)
    * sees on either side of the commit instant. */
  private[graft] def zOrderAppendImpl(spark: SparkSession,
      delta: DataFrame, path: String, failAt: String,
      tag: Option[String] = None): DataFrame = {
    def maybeFail(point: String): Unit =
      if (failAt == point)
        throw new IllegalStateException(s"injected failpoint: $point")
    val (fs, table) = hadoopFs(spark, path)
    val conf = spark.sparkContext.hadoopConfiguration
    val cuts = readCuts(fs, table)
    val (version, live) = latestManifest(fs, table)
    vacuumDebris(fs, table, version, live)
    val coded = codeWithCuts(delta, cuts)
    val deltaCodes = coded.select(col("z_code")).distinct()
      .collect().map(_.getLong(0)).sorted // ≤ 2^(bits·|cols|) values
    // per-file ranges from footers: metadata only, no row reads
    val ranges = live.map { name =>
      val (lo, hi, n) =
        footerRange(conf, new org.apache.hadoop.fs.Path(table, name))
      (name, lo, hi, n)
    }
    def touches(lo: Long, hi: Long): Boolean = {
      val i = java.util.Arrays.binarySearch(deltaCodes, lo)
      val at = if (i >= 0) i else -i - 1 // first code >= lo
      at < deltaCodes.length && deltaCodes(at) <= hi
    }
    val dirty = ranges.filter { case (_, lo, hi, _) =>
      touches(lo, hi) }.map(_._1).toSet
    val nDeltaRows = coded.count()
    val merged =
      if (dirty.isEmpty) coded
      else spark.read.parquet(dirty.toSeq.sorted.map(n =>
          new org.apache.hadoop.fs.Path(table, n).toString): _*)
        .unionByName(coded)
    val nRewritten = nDeltaRows +
      ranges.filter(r => dirty(r._1)).map(_._4).sum
    val staging = new org.apache.hadoop.fs.Path(
      path + ".zappend-staging-" + java.util.UUID.randomUUID())
    val newFiles = math.max(1, dirty.size)
    merged
      .repartitionByRange(newFiles, col("z_code"))
      .sortWithinPartitions(col("z_code"))
      .write.mode("overwrite").parquet(staging.toString)
    commitSwap(fs, table, staging, version, live, dirty, maybeFail, tag)
    import spark.implicits._
    Seq((ranges.length.toLong, dirty.size.toLong,
        (ranges.length - dirty.size).toLong, nDeltaRows,
        nRewritten))
      .toDF("n_files_before", "n_dirty", "n_clean", "n_delta_rows",
        "n_rewritten_rows")
  }

  /** The shared staged-swap COMMIT (zOrderAppend + zOrderCompact):
    * move the staged part files into the table under fresh names
    * (invisible — not in any committed manifest), publish
    * live′ = (live − replaced) + moved by ONE atomic manifest rename,
    * then — only after the commit — delete the replaced files, the
    * superseded manifest and the staging dir. A crash before the
    * commit leaves the old manifest current; a crash after it leaves
    * only vacuumable debris (single-writer contract; the failpoint
    * seam is what the LayoutSpec crash tests drive). */
  private def commitSwap(fs: org.apache.hadoop.fs.FileSystem,
      table: org.apache.hadoop.fs.Path,
      staging: org.apache.hadoop.fs.Path, version: Long,
      live: Seq[String], replaced: Set[String],
      maybeFail: String => Unit,
      tag: Option[String] = None): Seq[String] = {
    val movedIn = fs.listStatus(staging).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      .map { p =>
        val dst = new org.apache.hadoop.fs.Path(table,
          "zappend-" + java.util.UUID.randomUUID() + ".parquet")
        require(fs.rename(p, dst), s"staging move failed: $p -> $dst")
        dst.getName
      }
    maybeFail("before-commit")
    // THE commit instant: one atomic rename publishes the new file set
    // (and the commit tag, inseparably — the exactly-once guarantee)
    writeAtomic(fs,
      new org.apache.hadoop.fs.Path(table, manifestName(version + 1)),
      (tag.map("#tag:" + _).toSeq ++
        (live.filterNot(replaced) ++ movedIn).sorted).mkString("\n"))
    maybeFail("before-cleanup")
    // cleanup AFTER the commit: everything deleted here is already
    // unreferenced, so a crash mid-cleanup only leaves vacuumable debris
    replaced.foreach(n =>
      fs.delete(new org.apache.hadoop.fs.Path(table, n), false))
    fs.delete(new org.apache.hadoop.fs.Path(table, manifestName(version)),
      false)
    fs.delete(staging, true)
    movedIn
  }

  /** x47: small-file COMPACTION for an incrementally-maintained
    * Z-order table — the OPTIMIZE half x44's appends eventually need:
    * every append rewrites its dirty tiles into fresh files, so a
    * long run of narrow deltas accretes small files and scan task
    * counts grow without data growing. Compaction re-tiles ONLY the
    * live files below `targetRows` (footer row counts decide — pure
    * metadata, files at/above target are never read or touched) into
    * ⌈small-rows / targetRows⌉ curve-sorted files, and commits
    * through the SAME versioned-manifest protocol as zOrderAppend:
    * stage under a UUID dir → move in → ONE atomic manifest rename →
    * delete old last. Readers via readZOrdered see the old complete
    * table before the commit instant and the new complete table
    * after; a crash on either side converges on retry (vacuum).
    *
    * A no-op (fewer than two small files) returns the report without
    * writing anything — idempotent at steady state.
    *
    * Returns one row: files before/after, small files folded, rows
    * rewritten. Cost ∝ the small files' rows — never the table. */
  def zOrderCompact(spark: SparkSession, path: String,
      targetRows: Long = 1L << 20): DataFrame =
    zOrderCompactImpl(spark, path, targetRows, failAt = "")

  private[graft] def zOrderCompactImpl(spark: SparkSession, path: String,
      targetRows: Long, failAt: String): DataFrame = {
    require(targetRows > 0, "targetRows must be positive")
    def maybeFail(point: String): Unit =
      if (failAt == point)
        throw new IllegalStateException(s"injected failpoint: $point")
    val (fs, table) = hadoopFs(spark, path)
    val conf = spark.sparkContext.hadoopConfiguration
    val (version, live) = latestManifest(fs, table)
    vacuumDebris(fs, table, version, live)
    // footer row counts only — no data rows decide the plan
    val ranges = live.map { name =>
      val (_, _, n) =
        footerRange(conf, new org.apache.hadoop.fs.Path(table, name))
      (name, n)
    }
    val small = ranges.filter(_._2 < targetRows)
    val smallRows = small.map(_._2).sum
    import spark.implicits._
    def report(after: Long, folded: Long, rewritten: Long) =
      Seq((live.size.toLong, after, folded, rewritten))
        .toDF("n_files_before", "n_files_after", "n_small_folded",
          "n_rows_rewritten")
    if (small.size < 2) return report(live.size.toLong, 0L, 0L)
    val newFiles = math.max(1L,
      (smallRows + targetRows - 1) / targetRows).toInt
    val staging = new org.apache.hadoop.fs.Path(
      path + ".zappend-staging-" + java.util.UUID.randomUUID())
    spark.read.parquet(small.map(_._1).sorted.map(n =>
        new org.apache.hadoop.fs.Path(table, n).toString): _*)
      .repartitionByRange(newFiles, col("z_code"))
      .sortWithinPartitions(col("z_code"))
      .write.mode("overwrite").parquet(staging.toString)
    // carry the previous append's commit tag FORWARD: compaction is
    // content-neutral, and losing the tag would blind a streaming
    // replay guard that compares its batch id against lastCommitTag
    val moved = commitSwap(fs, table, staging, version, live,
      small.map(_._1).toSet, maybeFail, manifestTag(fs, table, version))
    report((live.size - small.size + moved.size).toLong,
      small.size.toLong, smallRows)
  }

  /** x46: parquet footer statistics as a FIRST-CLASS INPUT — the
    * per-(file, column) metadata table a lakehouse planner reads
    * before touching any data: row/null counts, min/max (rendered as
    * strings, plus nullable DOUBLE twins for numeric columns so
    * pruning math composes), and compressed/uncompressed byte sizes.
    * The general form of x44's footerRange: the whole audit costs one
    * footer read per file — ZERO data rows — and feeds storage audits
    * (per-column compression ratios), layout audits (clustered-column
    * span per file), and scan-pruning decisions (pruneAudit).
    *
    * Scale shape: the driver holds only the FILE LIST (zOrderAppend's
    * allowance — at a file count where the listing itself is too
    * large, it comes from a metastore); the footer reads run ON
    * EXECUTORS via mapPartitions over that list (one metadata
    * round-trip per file, embarrassingly parallel — 100 k files are
    * 100 k parallel footer fetches, never a driver loop), and
    * row-group stats fold per (file, column) as they stream.
    *
    * Stats semantics: has_stats means min/max are USABLE (every row
    * group carried non-empty stats with a non-null value); a column
    * with missing or all-null stats reports has_stats=false and null
    * min/max — conservative, never silently skippable. String min/max
    * are as-written by the writer (the format spec allows truncation
    * of long binary stats). n_nulls is null when any row group lacked
    * stats.
    *
    * Directory contract: FLAT parquet dirs (a plain Spark write or a
    * manifest-maintained table) — hive-partitioned subdirectory trees
    * need their leaf dirs audited per partition (which is how a
    * partition-pruned audit should read anyway). */
  def footerStats(spark: SparkSession, path: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val (fs, dir) = hadoopFs(spark, path)
    val dirIsFile = fs.getFileStatus(dir).isFile
    val files: Seq[String] =
      if (dirIsFile) Seq(dir.getName)
      else fs.listStatus(dir).toSeq
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
        .map(_.getPath.getName).sorted
    val base = if (dirIsFile) dir.getParent.toString else dir.toString
    val confKv = spark.sparkContext.hadoopConfiguration.iterator()
      .asScala.map(e => e.getKey -> e.getValue).toVector
    val bConf = spark.sparkContext.broadcast(confKv)
    import spark.implicits._
    val slots = math.max(1, math.min(files.size,
      spark.sparkContext.defaultParallelism))
    spark.createDataset(files)
      .repartition(slots)
      .mapPartitions { names =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        bConf.value.foreach { case (k, v) => conf.set(k, v) }
        names.flatMap(n => Layout.readFooterStats(conf, base, n))
      }
      .toDF()
      .orderBy(col("file"), col("column"))
  }

  /** One file's footer → per-column stat rows (executor-side). */
  private[operators] def readFooterStats(
      conf: org.apache.hadoop.conf.Configuration, base: String,
      name: String): Seq[FooterColStat] = {
    import scala.jdk.CollectionConverters._
    val p = new org.apache.hadoop.fs.Path(base, name)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val acc = scala.collection.mutable.LinkedHashMap
        .empty[String, ColAcc]
      blocks.foreach { b =>
        b.getColumns.asScala.foreach { c =>
          val key = c.getPath.toDotString
          val a = acc.getOrElseUpdate(key,
            new ColAcc(c.getPrimitiveType))
          a.add(c)
        }
      }
      acc.toSeq.map { case (column, a) => a.result(name, column, rows) }
    } finally reader.close()
  }

  /** Scan-pruning audit over footer stats: for a numeric column and a
    * closed predicate range [lo, hi], which files a planner can SKIP
    * outright (file max < lo or file min > hi — no row can possibly
    * match) and what fraction of rows/bytes that saves. Files without
    * usable stats are conservatively unskippable. Pure metadata —
    * composes on footerStats' output, no data rows read; the
    * correctness side (skipped files contain ZERO matching rows) is
    * pinned in LayoutSpec by actually scanning the skipped files. */
  def pruneAudit(spark: SparkSession, path: String, column: String,
      lo: Double, hi: Double): DataFrame = {
    val st = footerStats(spark, path)
      .filter(col("column") === column)
    val skip = coalesce(col("has_stats") &&
      (col("max_num") < lit(lo) || col("min_num") > lit(hi)), lit(false))
    st.agg(
        count(lit(1)).as("n_files"),
        sum(when(skip, 1L).otherwise(0L)).as("n_skippable"),
        sum(col("rows")).as("rows_total"),
        sum(when(skip, col("rows")).otherwise(0L)).as("rows_skippable"),
        sum(col("compressed_bytes")).as("bytes_total"),
        sum(when(skip, col("compressed_bytes")).otherwise(0L))
          .as("bytes_skippable"))
      .select(lit(column).as("column"), lit(lo).as("lo"), lit(hi).as("hi"),
        col("n_files"), col("n_skippable"), col("rows_total"),
        col("rows_skippable"), col("bytes_total"), col("bytes_skippable"),
        when(col("rows_total") > 0,
          round(col("rows_skippable").cast("double") /
            col("rows_total").cast("double"), 12))
          .otherwise(lit(0d)).as("skippable_frac"))
  }
}

/** One (file, column) row of the x46 footer-stats audit. */
case class FooterColStat(file: String, column: String, rows: Long,
    n_nulls: Option[Long], has_stats: Boolean, min_val: Option[String],
    max_val: Option[String], min_num: Option[Double],
    max_num: Option[Double], compressed_bytes: Long,
    uncompressed_bytes: Long)

/** Streaming per-column fold over a file's row-group chunks
  * (executor-side, Layout.readFooterStats). */
private[operators] final class ColAcc(
    prim: org.apache.parquet.schema.PrimitiveType) {
  private var merged: org.apache.parquet.column.statistics.Statistics[_] =
    null
  private var statsOk = true
  private var compressed = 0L
  private var uncompressed = 0L

  def add(c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData)
      : Unit = {
    compressed += c.getTotalSize
    uncompressed += c.getTotalUncompressedSize
    val st: org.apache.parquet.column.statistics.Statistics[_] =
      c.getStatistics
    if (st == null || st.isEmpty) statsOk = false
    else if (merged == null) merged = st.copy()
    else {
      // Statistics[T <: Comparable[T]] with an existential T: the two
      // chunks of ONE column always carry the same concrete T, so the
      // raw-typed reflective-free cast below is safe by construction
      type S = org.apache.parquet.column.statistics.Statistics[
        java.lang.Long]
      merged.asInstanceOf[S].mergeStatistics(st.asInstanceOf[S])
    }
  }

  private def render(v: AnyRef): String = v match {
    case b: org.apache.parquet.io.api.Binary =>
      prim.getLogicalTypeAnnotation match {
        case _: org.apache.parquet.schema.LogicalTypeAnnotation
            .StringLogicalTypeAnnotation => b.toStringUsingUTF8
        case _ => "0x" + b.getBytes.map(x => f"$x%02x").mkString
      }
    case x => String.valueOf(x)
  }

  private def asNum(v: AnyRef): Option[Double] = v match {
    case n: java.lang.Long => Some(n.doubleValue)
    case n: java.lang.Integer => Some(n.doubleValue)
    case n: java.lang.Double => Some(n.doubleValue)
    case n: java.lang.Float => Some(n.doubleValue)
    case _ => None
  }

  def result(file: String, column: String, rows: Long): FooterColStat = {
    val usable = statsOk && merged != null && merged.hasNonNullValue
    FooterColStat(file, column, rows,
      if (statsOk && merged != null) Some(merged.getNumNulls) else None,
      usable,
      if (usable) Some(render(merged.genericGetMin
        .asInstanceOf[AnyRef])) else None,
      if (usable) Some(render(merged.genericGetMax
        .asInstanceOf[AnyRef])) else None,
      if (usable) asNum(merged.genericGetMin.asInstanceOf[AnyRef])
      else None,
      if (usable) asNum(merged.genericGetMax.asInstanceOf[AnyRef])
      else None,
      compressed, uncompressed)
  }
}
