package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession configuration for the engine's entry points.
  *
  * Scale-relevant settings:
  *  - AQE on: runtime coalescing of shuffle partitions + skew-join splitting,
  *    which is the 100 TB safety net for skewed keys;
  *  - shuffle partitions sized to the local core count (the driver contract
  *    runs local[N]; on a real cluster this would be ~2-3x total cores or
  *    left to AQE);
  *  - UTC session timezone for oracle parity;
  *  - nanosAsLong: the harness events table carries TIMESTAMP(NANOS), which
  *    Spark's vectorized parquet reader refuses by default; we read it as
  *    long and convert (graft.sources.Tables handles the µs conversion).
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      // engine optimizer extensions (rank-1-per-group → min_by rewrite)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // InferFiltersFromGenerate synthesizes size(arr)>0/isnotnull
      // filters under every explode; when the array is COMPUTED
      // (tokens/shingles/n-gram transforms — this engine's dominant
      // shape), filter pushdown inlines the whole array expression a
      // second time below the exchange, re-tokenizing the corpus on
      // the scan stage (measured r17: a duplicated 3.6 s one-task
      // gram build in q114; same pattern in every explode-of-computed-
      // array plan). The rule only pays off when the filter can prune
      // a STORED column at the source, which never applies here —
      // excluded as a pure plan optimization (no result change).
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // guide §3.1/§9: allow shuffled-hash when its size conditions
      // hold (no sort on either side); AQE still plans/validates the
      // choice at runtime. Join STRATEGY never changes results.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      // ScanParallelism.widen's data-size term: one fan-out task per
      // this many bytes of leaf input (guide §2, partition
      // right-sizing — r17's unconditional defaultParallelism target
      // over-fanned small inputs; see ScanParallelism.scala). The env
      // override exists for local A/B sweeps only; the driver never
      // sets it.
      .config("spark.graft.widen.bytesPerTask",
        sys.env.getOrElse("SPARK_GRAFT_WIDEN_BPT", "32768"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
