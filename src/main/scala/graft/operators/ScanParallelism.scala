package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Scale-adaptive scan-parallelism floor (optimization guide §2.5,
  * "input skew: one huge unsplittable file → repartition immediately
  * after the read").
  *
  * The harness fixtures are SINGLE-ROW-GROUP parquet, so every
  * scan-rooted stage runs as ONE task no matter what
  * maxPartitionBytes says — a parquet row group is indivisible, and
  * minPartitionNum would only add empty splits around it. For
  * operators whose per-row work dominates their bytes (tokenize +
  * n-gram explode + count), that serializes the heaviest stage of the
  * plan on one core while the other 31 idle: StageProbe (r17) measured
  * oneTaskShare = 1.00 on q114/q221/q227 and 0.5–0.75 on
  * q216/q219/x15/x19 at sf0.1. It also turns the shared persisted
  * frames (bigram streams, gram tables) into single-partition caches,
  * so the concurrent broadcast-build jobs that hang off them serialize
  * behind one block lock (five back-to-back ~3.9 s one-task stages
  * inside a single q227 run).
  *
  * `widen` redistributes the input by a DETERMINISTIC key — but ONLY
  * when the frame's own partitioning is below the target, and the
  * target is sized to the DATA, not the core count:
  *
  *   target = min(defaultParallelism, ceil(inputBytes / bytesPerTask))
  *
  * The r17 form used defaultParallelism unconditionally and the r17
  * driver's 8-core scaling run showed why that over-fans: 14 widened
  * entries ran FASTER at 8 cores than 32 (q219 ratio 0.49, q218 0.42 —
  * a 580 KB corpus split 32 ways is ~18 KB per task, so per-task
  * overhead, 32× shuffle blocks and 32-partition persisted caches cost
  * more than the extra cores buy). The input-size term caps the
  * fan-out at one task per `spark.graft.widen.bytesPerTask` of leaf
  * input (default 32 KB — A/B-measured at sf0.1 across a
  * 16/32/64/128 KB sweep, see OPTIMIZATION_r18.md; production corpora
  * never hit this clamp because the defaultParallelism term saturates
  * first).
  *
  * On a real many-file corpus (splits ≥ cores) the partitioning guard
  * makes widen a provable no-op: no exchange is ever added at 100 TB,
  * and the local exchange it does add carries the raw (sub-MB)
  * document bytes exactly once before the fan-out work. Both terms
  * follow the session (core count and scanned bytes), so the driver's
  * lower-core bench runs scale the same way — nothing here is a
  * local[32] constant.
  *
  * Never apply this to scan-bound aggregates (the q01 class): there
  * the shuffle would ship roughly the same bytes the scan read and
  * the per-row work is too cheap to amortize it (the verify skill's
  * standing note). It belongs in front of tokenize/explode/hash
  * pipelines where each input byte fans out into many rows of work.
  *
  * Determinism: hash-partitioning by an explicit key column is stable
  * across retries and runs (no round-robin, no rand()); every caller
  * keys by the row's primary id. A caller whose preferred key is
  * absent gets its frame back unchanged (the r17 all-columns fallback
  * hashed full document text as the partition key and would fail
  * analysis on a map column — ADVICE r17). Results are unaffected —
  * every downstream aggregate in this codebase is partition-order-free
  * by the oracle-parity design (exact decimal sums, explicit tiebreak
  * orderings).
  */
object ScanParallelism {
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode,
    LogicalPlan, Project, SubqueryAlias}

  /** Is the frame a narrow Project/Filter chain over a single leaf
    * relation? Only then can its partitioning be below the session
    * parallelism (any join/aggregate/repartition upstream implies an
    * exchange whose partition count already tracks
    * spark.sql.shuffle.partitions) — and only then is `.rdd` cheap to
    * consult: on a composed plan, converting to RDD under AQE
    * MATERIALIZES the upstream query stages (measured: a 16 s job fired
    * from this guard inside x15 before this check existed). */
  private def narrowOverLeaf(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    case prj: Project => narrowOverLeaf(prj.child)
    case f: Filter => narrowOverLeaf(f.child)
    case s: SubqueryAlias => narrowOverLeaf(s.child)
    case _ => false
  }

  /** Leaf input size in bytes, from the ANALYZED plan's relation
    * statistics (file-size metadata — no job, no split enumeration;
    * ADVICE r17 flagged the `.rdd` guard's planning cost, so the
    * size term comes from stats and `.rdd` is consulted only when a
    * fan-out is actually warranted). */
  private def leafBytes(p: LogicalPlan): BigInt =
    p.collectLeaves().map(_.stats.sizeInBytes).sum

  /** Fan-out width for `bytes` of leaf input: one task per
    * `spark.graft.widen.bytesPerTask` (conf, default 64 KB), capped by
    * the session's default parallelism. */
  private def targetFor(df: DataFrame, bytes: BigInt): Int = {
    val sc = df.sparkSession.sparkContext
    val perTask = BigInt(df.sparkSession.conf
      .get("spark.graft.widen.bytesPerTask", "32768").toLong.max(1L))
    val byData = (bytes + perTask - 1) / perTask
    byData.min(BigInt(sc.defaultParallelism)).toInt
  }

  /** Repartition `df` by the first of `preferred` key columns present
    * to min(defaultParallelism, leaf-input-bytes / bytesPerTask), but
    * only when the frame is a narrow chain over one leaf AND its scan
    * partitioning is below that target. No present key → no-op. */
  def widen(df: DataFrame, preferred: String*): DataFrame = {
    val keys = preferred.filter(df.columns.contains).map(col)
    if (keys.isEmpty || !narrowOverLeaf(df.queryExecution.analyzed)) df
    else {
      val target = targetFor(df, leafBytes(df.queryExecution.analyzed))
      if (target <= 1 || df.rdd.getNumPartitions >= target) df
      else df.repartition(target, keys: _*)
    }
  }
}
