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
    * manifest. */
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
    (v, text.split("\n").toSeq.filter(_.nonEmpty))
  }

  private def manifestName(version: Long): String =
    f"$MANIFEST_PREFIX$version%08d"

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
            val st = c.getStatistics
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
    * then one bounded aggregate away — on a lakehouse they come from
    * footer stats) and the quantile cut grid is FROZEN beside the
    * table, so appends code new rows against the original grid. */
  def zOrderWriteIndexed(df: DataFrame, cols: Seq[String], path: String,
      bits: Int = 4, files: Int = 8): Unit = {
    require(cols.size >= 2, "z-order needs at least two columns")
    require(bits >= 1 && bits * cols.size <= 62, "code must fit a long")
    val cuts = collectCuts(df, cols, bits)
    codeWithCuts(df, cuts)
      .repartitionByRange(files, col("z_code"))
      .sortWithinPartitions(col("z_code"))
      .write.mode("overwrite").parquet(path)
    val text = cuts.map { case (c, cs) =>
      c + ":" + cs.mkString(",") }.mkString("\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path).resolve(ZCUTS_FILE),
      text.getBytes("UTF-8"))
  }

  private def readCuts(path: String): Seq[(String, Seq[Double])] = {
    val f = java.nio.file.Paths.get(path).resolve(ZCUTS_FILE)
    require(java.nio.file.Files.exists(f),
      s"$path is not an indexed z-order table (no $ZCUTS_FILE — " +
        "write it with zOrderWriteIndexed)")
    new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      .split("\n").toSeq.map { line =>
        val Array(c, cs) = line.split(":", 2)
        c -> cs.split(",").toSeq.map(_.toDouble)
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
    * per-file [min,max] code ranges come from ONE bounded aggregate
    * over the z_code column (file-count rows — a lakehouse reads
    * them from footer stats instead); a file is dirty iff its range
    * contains one of the delta's ≤ 2^(bits·|cols|) distinct codes.
    * Dirty rows + delta re-sort and land as fresh curve-sorted files
    * (staged write, then swap — a crash before the swap leaves the
    * original table intact, the stale staging dir is overwrite-
    * reclaimed on retry). Clean files are NOT rewritten or read past
    * their bounded range aggregate.
    *
    * Returns the one-row maintenance report (file and row
    * accounting) — the spec pins incremental == full-rebuild row
    * multiset and clean-file untouchedness. */
  def zOrderAppend(spark: SparkSession, delta: DataFrame, path: String)
      : DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val cuts = readCuts(path)
    val coded = codeWithCuts(delta, cuts)
    val deltaCodes = coded.select(col("z_code")).distinct()
      .collect().map(_.getLong(0)).toSet // ≤ 2^(bits·|cols|) values
    val existing = spark.read.parquet(path)
      .withColumn("_f", input_file_name())
    val ranges = existing.groupBy(col("_f"))
      .agg(min(col("z_code")).as("_lo"), max(col("z_code")).as("_hi"),
        count(lit(1)).as("_n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val dirty = ranges.filter { case (_, lo, hi, _) =>
      deltaCodes.exists(c => c >= lo && c <= hi) }.map(_._1).toSet
    val nDeltaRows = coded.count()
    val dirtyRows = existing.filter(col("_f").isin(dirty.toSeq: _*))
      .drop("_f")
    val merged = dirtyRows.unionByName(coded)
    val nRewritten = nDeltaRows +
      ranges.filter(r => dirty(r._1)).map(_._4).sum
    val staging = path + ".zappend-staging"
    val newFiles = math.max(1, dirty.size)
    merged
      .repartitionByRange(newFiles, col("z_code"))
      .sortWithinPartitions(col("z_code"))
      .write.mode("overwrite").parquet(staging)
    // swap: remove the dirty files, move the staged parts in
    dirty.foreach { uri =>
      Files.deleteIfExists(Paths.get(new java.net.URI(uri).getPath))
    }
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(staging)).iterator().asScala.toSeq
      .filter(_.getFileName.toString.startsWith("part-"))
      .foreach { p =>
        Files.move(p,
          Paths.get(path).resolve(
            "zappend-" + java.util.UUID.randomUUID() + ".parquet"),
          StandardCopyOption.ATOMIC_MOVE)
      }
    Files.walk(Paths.get(staging)).iterator().asScala.toSeq.reverse
      .foreach(Files.deleteIfExists(_))
    import spark.implicits._
    Seq((ranges.length.toLong, dirty.size.toLong,
        (ranges.length - dirty.size).toLong, nDeltaRows,
        nRewritten))
      .toDF("n_files_before", "n_dirty", "n_clean", "n_delta_rows",
        "n_rewritten_rows")
  }
}
