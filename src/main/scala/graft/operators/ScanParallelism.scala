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
  * `widen` redistributes the input by a DETERMINISTIC key to the
  * session's default parallelism — but ONLY when the frame's own
  * partitioning is below it. On a real many-file corpus (splits ≥
  * cores) the guard makes it a provable no-op: no exchange is ever
  * added at 100 TB, and the local exchange it does add carries the
  * raw (sub-MB) document bytes exactly once before the fan-out work.
  * The target is `sparkContext.defaultParallelism`, so the driver's
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
  * keys by the row's primary id. Results are unaffected — every
  * downstream aggregate in this codebase is partition-order-free by
  * the oracle-parity design (exact decimal sums, explicit tiebreak
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

  /** Repartition `df` to the session's default parallelism by the
    * first of `preferred` key columns present (falling back to ALL
    * columns — still deterministic), but only when the frame is a
    * narrow chain over one leaf AND its scan partitioning is below
    * the target. */
  def widen(df: DataFrame, preferred: String*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (target <= 1 || !narrowOverLeaf(df.queryExecution.analyzed)) df
    else if (df.rdd.getNumPartitions >= target) df
    else {
      val keys = preferred.filter(df.columns.contains) match {
        case ks if ks.nonEmpty => ks.map(col)
        case _ => df.columns.toSeq.map(col)
      }
      df.repartition(target, keys: _*)
    }
  }
}
