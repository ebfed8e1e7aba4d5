package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Physical-plan regression tests: the scale properties the engine
  * promises (filter pushdown, column pruning, broadcast choices, codegen
  * spans, shuffle counts) asserted against the actual executed plans at
  * sf0.001 — so a plan regression fails CI, not just the bench. */
class PlanSpec extends SparkSuite with AdaptiveSparkPlanHelper {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  /** Execute (to finalize AQE) and render the final plan. */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  /** Is this exchange exactly ScanParallelism.widen's guarded input
    * fan-out — an explicit REPARTITION_BY_NUM sitting DIRECTLY over
    * the file scan (narrow map-side chain, no other exchange below)?
    * The r17 pins string-matched REPARTITION_BY_NUM alone, which
    * would also tolerate a future mid-pipeline explicit repartition —
    * the exact regression class the pins guard (ADVICE r17). */
  private def widenFanOut(
      e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike)
      : Boolean =
    e.toString.contains("REPARTITION_BY_NUM") &&
      collect(e.child) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.nonEmpty &&
      collect(e.child) {
        case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => x
      }.isEmpty

  test("q02: filters and projection reach the parquet scan") {
    val plan = finalPlan(q("q02_filter_project"))
    assert(plan.contains("PushedFilters: ["),
      "scan must carry pushed filters")
    assert(plan.contains("IsNotNull(l_shipdate)") ||
      plan.contains("GreaterThanOrEqual(l_shipdate"),
      s"l_shipdate predicate must be pushed")
    // column pruning: the scan reads only the 5 referenced columns
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") &&
      !readSchema.contains("l_partkey"),
      s"scan must not read unused columns: $readSchema")
  }

  test("q05: tiny dims broadcast; customer joined by AQE's choice, " +
      "not a forced broadcast") {
    val df = q("q05_revenue_by_nation")
    val plan = finalPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      "nation/region/supplier should broadcast")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "no nested-loop fallback in an equi-join star")
  }

  test("q01: aggregation runs inside whole-stage codegen") {
    val df = q("q01_pricing_summary")
    val plan = finalPlan(df)
    val codegenStages = collect(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.nonEmpty, "no WholeStageCodegen stage found")
    assert(plan.contains("HashAggregate"),
      "partial+final hash aggregate expected")
  }

  test("q26 doc profile: the only exchange is the verification sort") {
    val df = q("q26_doc_profile")
    df.collect()
    val exchanges = collect(df.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size == 1,
      s"profile computation must be map-side; found ${exchanges.size} " +
        "exchanges (1 expected for the output ORDER BY)")
  }

  test("q30 ANN: query side broadcast; one shuffle for the ranking") {
    val df = q("q30_ann_topk")
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("BroadcastNestedLoopJoin") ||
      plan.toString.contains("BroadcastExchange"),
      "query vectors must be broadcast, data side never shuffled for the join")
    val exchanges = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.filterNot(widenFanOut)
    // ScanParallelism.widen's guarded input fan-out (raw scan rows,
    // no-op on a many-file corpus) is tolerated above the scan
    assert(exchanges.size <= 2,
      s"expected ≤2 shuffles (rank by q_id + output sort), got ${exchanges.size}")
  }

  test("q38 as-of join: one shuffle on user_id plus the output sort — " +
      "never a range-join explosion") {
    val df = q("q38_asof_click_before_purchase")
    df.collect()
    val plan = df.queryExecution.executedPlan
    val exchanges = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size <= 2,
      s"expected ≤2 shuffles (window partition + order), got ${exchanges.size}")
    assert(!plan.toString.contains("CartesianProduct") &&
      !plan.toString.contains("BroadcastNestedLoopJoin"),
      "as-of must not plan a product join")
  }

  test("q43 keyword search: the substring pre-filter reaches the parquet " +
      "scan") {
    val plan = finalPlan(q("q43_keyword_search"))
    assert(plan.contains("StringContains(text,merge)"),
      s"text CONTAINS term must be pushed to the scan")
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text") || readSchema.contains("text:string"),
      "scan reads only referenced columns")
  }

  test("ivfAssign: zero shuffles touch the vector side (map-side argmax " +
      "over the broadcast codebook)") {
    import graft.operators.VectorOps
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val out = VectorOps.ivfAssign(emb, VectorOps.labelCentroids(emb))
    out.collect()
    val exchanges = collect(out.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    // the tiny centroid codebook may aggregate through an exchange; the
    // 100 TB invariant is that NO exchange subtree contains the full
    // embeddings scan (the previous row_number argmax shuffled
    // n_vectors × n_centroids rows)
    val vectorSideShuffles = exchanges.filter { e =>
      collect(e) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.schema.fieldNames.contains("vec_id") &&
              s.schema.fieldNames.contains("embedding") => s
      }.nonEmpty
    }
    assert(vectorSideShuffles.isEmpty,
      s"vector-side rows must not shuffle in ivfAssign; found " +
        s"${vectorSideShuffles.size} exchange(s) over the embeddings scan")
  }

  test("q45 range join: banded to an equi-join — never a product join, " +
      "and the range is re-checked as a post-join filter") {
    val df = q("q45_range_join_pairs")
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(!plan.toString.contains("CartesianProduct") &&
      !plan.toString.contains("BroadcastNestedLoopJoin"),
      "banded range join must plan as an equi-join on (user, bucket)")
    val exchanges = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size <= 3,
      s"expected ≤3 shuffles (2 join sides + output sort), got " +
        s"${exchanges.size}")
  }

  test("q46 token-budget selection: one shuffle per window partition " +
      "plus the output sort; scan reads only the referenced columns") {
    val df = q("q46_token_budget_selection")
    df.collect()
    val plan = df.queryExecution.executedPlan
    val exchanges = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size <= 2,
      s"expected ≤2 shuffles (window + order), got ${exchanges.size}")
    val readSchema = plan.toString.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("n_chars") && !readSchema.contains("lang"),
      s"scan must prune unused columns: $readSchema")
  }

  test("q48 heavy hitters: MG sketch aggregates via ObjectHashAggregate " +
      "with a partial stage (≤k counters per partition hit the shuffle)") {
    val df = q("q48_heavy_hitter_tokens")
    df.collect()
    val plan = df.queryExecution.executedPlan
    val objAggs = collect(plan) {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }
    assert(objAggs.size >= 2,
      "MG must run as partial+final ObjectHashAggregate, not sort-based")
    val exchanges = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size <= 4,
      s"sketch + exact count + sort should need ≤4 shuffles, got " +
        s"${exchanges.size}")
  }

  test("q73 grouped heavy hitters: grouped MG sketch is ObjectHashAgg " +
      "and the candidate table reaches the verify pass by broadcast") {
    val df = q("q73_heavy_hitters_by_source")
    df.collect()
    val plan = df.queryExecution.executedPlan
    val objAggs = collect(plan) {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }
    assert(objAggs.size >= 2,
      "grouped MG must run as partial+final ObjectHashAggregate")
    val bcasts = collect(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bcasts.nonEmpty,
      "the sources×k candidate table must broadcast — a shuffle join " +
        "would re-shuffle the full token stream")
    assert(!plan.toString.contains("SortMergeJoin"),
      "verify pass must not sort-merge the corpus-sized token side")
  }

  test("x09 incremental LSH: candidate generation is an equi-join on " +
      "(band, bh) — never a product of batch × corpus") {
    val df = q("x09_incremental_lsh")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "incremental dedup must never plan a product join")
  }

  test("x02 MinHash: signatures are map-side (no exchange before banding)") {
    import graft.operators.NearDup
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sigs = NearDup.minHashSignatures(docs, 3, 64)
    sigs.collect()
    val exchanges = collect(sigs.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    // the only tolerated exchange is ScanParallelism.widen's guarded
    // input fan-out (REPARTITION_BY_NUM of the RAW doc rows straight
    // off the one-split scan — a no-op on a many-file corpus); the
    // pin's intent is that SIGNATURES/shingles never shuffle
    val nonWiden = exchanges.filterNot(widenFanOut)
    assert(nonWiden.isEmpty,
      "signature computation must not shuffle")
  }

  test("q51 contamination: equi-join on the shingle hash — never a " +
      "product — and the probe is a hash join against a distinct " +
      "vocabulary (aggregated, so boilerplate cannot amplify)") {
    val df = q("q51_contamination")
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(!plan.toString.contains("CartesianProduct") &&
      !plan.toString.contains("BroadcastNestedLoopJoin"),
      "contamination probe must be an equi-join on the shingle hash")
    // the train side must aggregate (distinct) before the join: a
    // HashAggregate must feed the join's build side
    assert(plan.toString.contains("HashAggregate"),
      "train vocabulary must be de-duplicated before the probe join")
  }

  test("q53 pack sequences: one window shuffle + the output sort; " +
      "the scan prunes to the three referenced columns") {
    val df = q("q53_pack_sequences")
    df.collect()
    val plan = df.queryExecution.executedPlan
    val exchanges = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size <= 2,
      s"expected ≤2 shuffles (window + order), got ${exchanges.size}")
    val readSchema = plan.toString.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("n_chars") && !readSchema.contains("lang"),
      s"scan must prune unused columns: $readSchema")
  }

  test("q54 collapse runs: pure map-side projection — the only " +
      "exchange is the verification sort") {
    val df = q("q54_collapse_token_runs")
    df.collect()
    val exchanges = collect(df.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size == 1,
      s"run collapse must be map-side; found ${exchanges.size} exchanges")
  }

  test("x10 bloom contamination: train side reaches the probe as a " +
      "subquery bitset — the test-side plan has NO join at all") {
    val df = q("x10_bloom_contamination")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      "the probe must be a map-side might_contain, not any join form")
    // the only exchange on the test side is the per-doc count aggregate
    // (+ output sort); the train side lives in a separate subquery stage
    val exchanges = collect(df.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size <= 2,
      s"test side should shuffle only doc-count + sort, got " +
        s"${exchanges.size}")
  }

  test("q08 top-k per customer: the rank filter is rewritten to the " +
      "bounded row-top-k aggregate — no window in the executed plan") {
    val df = q("q08_top_orders_per_customer")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "rank<=k must plan as the partial-aggregable rewrite")
    assert(plan.contains("graft_row_top_k"),
      s"expected the RowTopK aggregate in:\n${plan.take(2000)}")
    val objAggs = collect(df.queryExecution.executedPlan) {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }
    assert(objAggs.size >= 2,
      "RowTopK must run as partial+final ObjectHashAggregate")
  }

  test("q70 per-source quota: the rank filter rewrites to the bounded " +
      "row-top-k aggregate on the documents side too — no window, " +
      "map-side partial before the source exchange") {
    val df = q("q70_source_quota")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "the per-domain cap must plan as the partial-aggregable rewrite " +
        "(a window would sort every hot domain in one reducer)")
    assert(plan.contains("graft_row_top_k"),
      s"expected the RowTopK aggregate in:\n${plan.take(2000)}")
    val objAggs = collect(df.queryExecution.executedPlan) {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }
    assert(objAggs.size >= 2,
      "RowTopK must run as partial+final ObjectHashAggregate")
  }

  test("x11 LSH embedding dedup: no product join anywhere — pair mining " +
      "is the band equi-join, and the end-to-end stitch stays hash-join") {
    // the pair source itself (this is what replaced q55's registered
    // crossJoin default at scale)
    import graft.operators.VectorOps
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val pairs = VectorOps.cosineLshJoin(emb, 0.45)
    pairs.collect()
    val pairPlan = pairs.queryExecution.executedPlan.toString
    assert(!pairPlan.contains("CartesianProduct") &&
      !pairPlan.contains("BroadcastNestedLoopJoin"),
      "LSH pair mining must be the (band, bits) equi-join, never all-pairs")
    // and the registered x11 entry end-to-end (its final stitch joins
    // clusters back to the corpus; iterative CC stages are checkpointed
    // out of this plan but are themselves equi-join-only — NearDupSpec)
    val df = q("x11_embedding_dedup_lsh")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "x11's registered plan must contain no product join")
  }

  test("q57 bigram fluency: no per-doc collect_list buffer — the ordered " +
      "sum runs as a running-frame window (spillable partition buffer)") {
    val df = q("q57_bigram_fluency")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"),
      "q57 must not buffer a whole document in one aggregation buffer")
    assert(plan.contains("Window"),
      "ordered per-doc sum must run as a window running frame")
  }

  test("q61 salted join: the hot key's rows spread across multiple " +
      "reducer partitions (no single-reducer hot spot)") {
    import graft.operators.Layout
    import org.apache.spark.sql.functions.{col, lit, when, spark_partition_id}
    // pin the shuffle-join path: broadcast or AQE partition coalescing
    // would hide the salt spread at this tiny SF
    val conf = spark.conf
    val prevB = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = conf.get("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")
      val li = spark.read.parquet(s"$dir/lineitem.parquet").select(
        when(col("l_orderkey") % 4 === 0, lit(0L))
          .otherwise(col("l_orderkey") % 25).as("k"),
        col("l_extendedprice"))
      val dim = spark.read.parquet(s"$dir/nation.parquet").select(
        col("n_nationkey").cast("long").as("k"), col("n_name"))
      val joined = Layout.saltedEquiJoin(li, dim, "k", salts = 8)
      val hotParts = joined.filter(col("k") === 0L)
        .select(spark_partition_id().as("p")).distinct().count()
      assert(hotParts > 1,
        s"hot key 0 must land on >1 reducer partition, got $hotParts")
      // row-identity to the plain join (the salted join's contract)
      val plain = li.join(dim, "k")
      assert(joined.count() == plain.count())
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("q52 tf-idf: doc-count side is broadcast (no shuffle for N), " +
      "df computed from the tf table, bounded shuffle count") {
    val df = q("q52_tfidf_top_terms")
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("BroadcastExchange") ||
      plan.toString.contains("BroadcastNestedLoopJoin"),
      "the one-row corpus count must broadcast, never shuffle-join")
    val exchanges = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    // tf agg + token window + doc window + output sort, plus the
    // SinglePartition exchange of the one-row corpus count (carries
    // O(#partitions) rows — not data-sized)
    assert(exchanges.size <= 5,
      s"tf agg + df window + rank window + sort + count should need " +
        s"≤5 shuffles, got ${exchanges.size}")
  }

  test("q62 repetition profile: per-doc metrics are map-side folds — " +
      "the only exchange is the verification sort (no corpus-wide " +
      "n-gram shuffle for a per-doc statistic)") {
    val df = q("q62_repetition_profile")
    df.collect()
    val exchanges = collect(df.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size == 1,
      s"repetition metrics must be map-side; found ${exchanges.size} " +
        "exchanges (1 expected for the output ORDER BY)")
  }

  test("q63 boilerplate fraction: document frequency joins back on the " +
      "shingle hash — never a product join, and df is aggregated " +
      "before the join (partial+final, skew-splittable)") {
    val df = q("q63_boilerplate_fraction")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "df join-back must be an equi-join on the shingle")
    assert(plan.contains("HashAggregate"),
      "document frequency must aggregate before the join-back")
  }

  test("x13 PQ search: queries+LUT and codebook broadcast — the encoded " +
      "scan is never shuffled before the bounded ranking, and the " +
      "exact re-rank joins only the shortlist") {
    val df = q("x13_ann_pq")
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("BroadcastNestedLoopJoin") ||
      plan.toString.contains("BroadcastExchange"),
      "the ADC pass must broadcast the query LUTs over the code scan")
    // training (tiny, m·k-bounded aggregates) is checkpointed out of this
    // plan; what remains: approx rank by q_id, shortlist joins, final
    // rank + output sort — all bounded by refine·k·|queries| rows
    val exchanges = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size <= 6,
      s"PQ search shuffles must be candidate-bounded, got ${exchanges.size}")
  }

  test("q66 sharded packing: every window is partitioned — the doc-level " +
      "running sum keys on (source, shard), so no window serializes a " +
      "whole source, let alone the corpus") {
    val df = q("q66_pack_sequences_sharded")
    df.collect()
    val windows = collect(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected window nodes in the packing plan")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned window would serialize the corpus: $w"))
    // the heavy (doc-level) window must key on BOTH source and shard —
    // that is the parallelism claim of the sharded design
    assert(windows.exists(_.partitionSpec.size == 2),
      "doc-level running sum must partition by (source, shard)")
  }

  test("q67 containment pairs: inverted-index equi-join only — never a " +
      "product join (the q29 family shape)") {
    val df = q("q67_containment_pairs")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "containment pair mining must stay the shingle equi-join")
  }

  test("q69 vocabulary: exact distinct partial-aggregates before the " +
      "shuffle; x17's sketch plan has no expand/distinct shuffle") {
    val exact = q("q69_source_vocabulary")
    exact.collect()
    // count_distinct plans an Expand + two-phase agg: partial_count on
    // (source, shingle) runs map-side before any exchange
    val exactPlan = exact.queryExecution.executedPlan.toString
    assert(exactPlan.contains("HashAggregate") ||
      exactPlan.contains("ObjectHashAggregate"),
      s"expected hash aggregation in: ${exactPlan.take(1500)}")
    val approx = q("x17_source_vocabulary_approx")
    approx.collect()
    val approxPlan = approx.queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"),
      "the HLL twin must not plan the distinct Expand")
    val exchanges = collect(approx.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size <= 2,
      s"sketch path: one partial+final agg exchange plus the output " +
        s"sort at most, got ${exchanges.size}")
  }

  test("x14 bloom boilerplate: the probe side has NO join — the " +
      "vocabulary arrives as a scalar-subquery bitset") {
    val df = q("x14_boilerplate_bloom")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      "probe must be a map-side might_contain, never a join form")
  }

  test("q64 quality gate: per-doc rule flags are map-side — exchanges " +
      "are only the tiny per-source aggregate + output sort") {
    val df = q("q64_quality_gate")
    df.collect()
    val exchanges = collect(df.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size <= 2,
      s"gate must be map-side + one aggregate; got ${exchanges.size}")
  }

  test("q74 transitions: one user_id window shuffle feeds a bounded " +
      "aggregate — the normalizing window never touches event-sized " +
      "data, and nothing joins") {
    val df = q("q74_event_transitions")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "transition matrix must not join")
    assert(plan.contains("HashAggregate"),
      "pair counts must partial+final hash aggregate")
    val exchanges = collect(df.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    // user window + pair aggregate + type-normalizing window + sort;
    // all but the first run over ≤ #event_types² rows
    assert(exchanges.size <= 4,
      s"unexpected exchange count ${exchanges.size}")
  }

  test("q77 normalize / x20 card scrub: pure map-side projections — " +
      "the only exchange is the output sort") {
    for (name <- Seq("q77_normalize_text", "x20_pii_scrub_cards")) {
      val df = q(name)
      df.collect()
      val exchanges = collect(df.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
          e
      }
      assert(exchanges.size <= 1,
        s"$name must be map-side; found ${exchanges.size} exchanges")
      assert(!df.queryExecution.executedPlan.toString.contains("Join"),
        s"$name must not join")
    }
  }

  test("q76 vocabulary growth: the shingle min-aggregate partial-" +
      "aggregates map-side; the cumulative window runs post-rollup " +
      "(never over shingle-sized data)") {
    val df = q("q76_vocabulary_growth")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "growth curve must not join")
    assert(plan.contains("HashAggregate"),
      "min(first_doc) must be a partial+final hash aggregate")
    // shingle agg + bucket agg + source window + sort — the first is
    // the only one carrying shingle-sized data
    val exchanges = collect(df.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size <= 4,
      s"unexpected exchange count ${exchanges.size}")
  }

  test("q82 edit-distance pairs: candidates come from the rare-gram " +
      "equi-join — never a cartesian or nested-loop product") {
    val df = q("q82_edit_distance_pairs")
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct"),
      "candidate generation must be the inverted-index equi-join")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "no all-pairs fallback")
  }

  test("q83 outliers: the bounded per-type stats broadcast back over " +
      "one events scan — no second data-sized shuffle") {
    val df = q("q83_value_outliers")
    val plan = finalPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      "per-type stats (≤ #event_types rows) must broadcast")
  }

  test("q79 retention: cohort sizes broadcast; the data-sized " +
      "exchanges are the user-keyed aggregates") {
    val df = q("q79_retention_cohorts")
    val plan = finalPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      "cohort-size join must broadcast the bounded weeks table")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q100 top-k with ties: the kth price is a TakeOrdered broadcast " +
      "pre-cut — the rank window never sees the full fact table") {
    val df = q("q100_top_orders_with_ties")
    df.collect()
    val exec = df.queryExecution.executedPlan
    val plan = exec.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "kth-price threshold must come from a bounded top-k")
    // the rank window's input is the ≥-threshold survivors (k + ties),
    // not the orders scan: every window operator in the plan sits
    // above the broadcast threshold join
    val windows = collect(exec) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(collect(w.child) {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      }.nonEmpty, "window input must be the post-threshold join")
    }
    // bonus defense Spark 4 adds on its own: rank ≤ k plans a
    // partial+final WindowGroupLimit, so each map task ships at most
    // k rows to the single-partition sort even WITHOUT the pre-cut
    assert(plan.contains("WindowGroupLimit"),
      "rank-limit pushdown must appear in the executed plan")
  }

  test("q101 mix sample: pure map-side filter — the only exchange is " +
      "the presentation sort, no join, no aggregate") {
    val df = q("q101_source_mix_sample")
    df.collect()
    val plan = df.queryExecution.executedPlan
    val exchanges = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size == 1,
      s"sampling must run at scan speed; got ${exchanges.size} " +
        "exchanges (1 expected for the output ORDER BY)")
    assert(!plan.toString.contains("Join"),
      "the rate lookup must fold to a literal CASE, never a join")
  }

  test("q103 split report: map-side tag + one aggregate shuffle + " +
      "output sort, nothing else") {
    val df = q("q103_split_assignment")
    df.collect()
    val exchanges = collect(df.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size <= 2,
      s"expected ≤2 shuffles (group-by + order), got ${exchanges.size}")
  }

  test("q114 contamination: train grams reach the semi join with NO " +
      "distinct pre-aggregate (semi has exists-semantics already)") {
    val plan = finalPlan(q("q114_split_contamination"))
    assert(plan.contains("LeftSemi"), "train membership must be a semi join")
    // a .distinct() would surface as an aggregate keyed on the gram
    // alone — the wasted extra shuffle of the dominant stream
    assert(!plan.contains("keys=[_gr"),
      s"no gram-keyed aggregate may precede the semi join")
  }

  test("q113 unigram logprob: the one-row corpus totals broadcast — " +
      "the token stream shuffles once for freq and once per doc") {
    val plan = finalPlan(q("q113_unigram_logprob"))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "N+V totals must reach rows via a one-row broadcast")
    assert(!plan.contains("CartesianProduct"),
      "nothing data-sized may cross-join")
  }

  test("q118 canonical-by-quality: survivor via ONE max_by aggregate — " +
      "no window over the corpus, no product join") {
    val plan = finalPlan(q("q118_canonical_by_quality"))
    assert(!plan.contains("Window"),
      "survivor selection must not sort cluster members in a window")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q116 cross-source matrix: pair mining and metadata attachment " +
      "are equi-joins only") {
    val plan = finalPlan(q("q116_cross_source_dups"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "every join must be an equi-join")
  }

  test("q119 rebalance: the minority-count row broadcasts; exactly one " +
      "rank window partitioned by label") {
    val df = q("q119_rebalance_labels")
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("BroadcastNestedLoopJoin"),
      "the one-row target must broadcast")
    val windows = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    assert(windows.nonEmpty && windows.forall(
      _.toString.contains("label")),
      "the only window runs per label")
  }

  test("q134 gini: the rank window runs on the per-customer aggregate " +
      "(never the fact table) and partitions by segment") {
    val df = q("q134_revenue_gini")
    df.collect()
    val plan = df.queryExecution.executedPlan
    val windows = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected the rank window")
    windows.foreach { w =>
      assert(w.toString.contains("c_mktsegment"),
        "rank window must partition by segment")
      assert(w.child.toString.contains("HashAggregate"),
        "window input must be the per-customer aggregate, not raw orders")
    }
    assert(!plan.toString.contains("CartesianProduct"))
  }

  test("q135 streaks: every window partitions by customer — no global " +
      "single-partition window anywhere") {
    val df = q("q135_order_streaks")
    df.collect()
    val windows = collect(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(
      _.toString.contains("o_custkey")),
      "all windows must be per-customer")
  }

  test("q137 chi-square / q139 KS: the only non-equi join is the " +
      "broadcast cross of the bounded category/support lists") {
    for (name <- Seq("q137_chi_square", "q139_ks_drift")) {
      val plan = finalPlan(q(name))
      assert(!plan.contains("CartesianProduct"),
        s"$name must broadcast its bounded cross join")
      assert(plan.contains("BroadcastNestedLoopJoin"),
        s"$name grid construction should be a broadcast cross")
    }
  }

  test("q138 benford: share window sees only the 9-row digit " +
      "aggregate") {
    val df = q("q138_benford")
    df.collect()
    val windows = collect(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(
      _.child.toString.contains("HashAggregate")),
      "window input must be the digit aggregate, not raw orders")
  }

  test("q126 weighted sample: no data-sized window is unpartitioned — " +
      "the corpus cumsum runs per shard; the only global window sits " +
      "on the |shards| aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate,
      Window => LWindow}
    val df = q("q126_weighted_sample")
    df.collect()
    val lp = df.queryExecution.optimizedPlan
    val windows = lp.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "the two-phase prefix sum needs windows")
    val unpartitionedOverData = windows.filter(w =>
      w.partitionSpec.isEmpty &&
        w.child.collectFirst { case _: Aggregate => () }.isEmpty)
    assert(unpartitionedOverData.isEmpty,
      "an unpartitioned window over non-aggregated input serializes " +
        s"the corpus through one reducer: $unpartitionedOverData")
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "the corpus-sized cumulative window must be shard-partitioned")
  }

  test("x29 split-contamination bloom: train grams reach the probe as " +
      "a scalar-subquery bitset — no join on the probe side, no " +
      "train-gram shuffle") {
    val plan = finalPlan(q("x29_split_contamination_bloom"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Cartesian"),
      s"probe must be map-side (bloom in a scalar subquery), got:\n$plan")
  }
  test("q155 returned-revenue star: the returnflag filter reaches the " +
      "lineitem scan, nation broadcasts, top-20 is TakeOrdered") {
    val plan = finalPlan(q("q155_returned_revenue"))
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("EqualTo(l_returnflag,R)"),
      s"selective filter must reach the parquet scan:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-20 must fold as TakeOrderedAndProject, never a global sort")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q158 brand-tier revenue: the quantity disjunct bounds reach " +
      "the lineitem scan and the part-only conjuncts prune the " +
      "dimension before the join") {
    val plan = finalPlan(q("q158_brand_tier_revenue"))
    // the OR of quantity bands implies l_quantity BETWEEN 1 AND 40 -
    // Spark pushes at least the non-null constraint plus Or(...) over
    // quantity to the fact scan
    assert(plan.contains("IsNotNull(l_quantity)") ||
      plan.contains("Or(And("),
      s"quantity constraints should reach the fact scan:\n$plan")
    assert(plan.contains("IsNotNull(p_brand)") ||
      plan.contains("In(p_brand") || plan.contains("Or(And(EqualTo(p_brand"),
      s"part conjuncts should prune the dimension scan:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
  test("q145/q143 profile family: every window runs over aggregated " +
      "metadata, never raw documents") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate,
      Window => LWindow}
    for (name <- Seq("q145_letter_entropy", "q143_stopword_cosine")) {
      val df = q(name)
      df.collect()
      val lp = df.queryExecution.optimizedPlan
      val bad = lp.collect { case w: LWindow
          if w.child.collectFirst { case _: Aggregate => () }.isEmpty => w }
      assert(bad.isEmpty,
        s"$name: windows must sit on aggregate (metadata) frames: $bad")
    }
  }

  test("q150 length outliers: two-pass moment audit - the stats side " +
      "broadcasts, no window anywhere") {
    val df = q("q150_doc_length_outliers")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "the moment audit needs no window at all")
    assert(plan.contains("BroadcastHashJoin"),
      "per-source stats must broadcast back to the scan")
  }

  test("q159 bigram LM: scoring stream takes hash joins against the " +
      "vocab tables - no cartesian, no window") {
    val df = q("q159_bigram_backoff")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "LM scoring must never plan a product join")
    assert(!plan.contains("Window"),
      "per-doc accounting is an aggregate, not a window")
  }

  test("q162 Neyman allocation: the corpus is touched by ONE " +
      "aggregate; ranking windows run on the |sources| frame") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate,
      Window => LWindow}
    val df = q("q162_neyman_allocation")
    df.collect()
    val lp = df.queryExecution.optimizedPlan
    val bad = lp.collect { case w: LWindow
        if w.child.collectFirst { case _: Aggregate => () }.isEmpty => w }
    assert(bad.isEmpty,
      s"allocation windows must run over the per-source aggregate: $bad")
  }

  test("q164 session PMI: the type-pair self-join keys on (user, " +
      "session) — equi-join by construction, never a product") {
    val df = q("q164_session_type_pmi")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "pair mining must never be a product join")
    // the data-sized self-join must hash on the (user, session) key —
    // the only nested-loop allowed is the one-row broadcast of the
    // session total (the scalar N in the PMI denominator)
    assert(plan.linesIterator.exists(l =>
      (l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin") ||
        l.contains("ShuffledHashJoin")) && l.contains("user_id")),
      s"type-pair self-join must be an equi-join keyed on the session")
    assert(plan.contains("HashAggregate"),
      "pair counts must partial-aggregate before any exchange")
  }

  test("q166 market basket: the pair self-join keys on l_orderkey — " +
      "equi-join with fan-out bounded by items per order, and the " +
      "top-k is TakeOrderedAndProject, never a global sort") {
    val df = q("q166_bought_together")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "basket pairs must join on the order key, never catalog²")
    assert(plan.contains("TakeOrderedAndProject"),
      "the top-20 must be a bounded TakeOrderedAndProject")
  }

  test("q168 strip boilerplate: df joins back on the line (equi-join, " +
      "partial-aggregated) — q63's shape carried into the transform") {
    val df = q("q168_strip_boilerplate")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "membership marking must be an equi-join on the line")
    assert(plan.contains("HashAggregate"),
      "document frequency must aggregate before the join-back")
    assert(!plan.contains("Window"),
      "the per-doc rebuild is an aggregate (bounded collect_list + " +
        "array_sort), never a data-sized window")
  }

  test("q169 volume shipping: nation legs broadcast, the fact joins " +
      "hash on keys — no product join for the disjunctive pair") {
    val df = q("q169_volume_shipping")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "the disjunctive nation-pair filter must not degrade any join " +
        "to a product form")
    assert(plan.contains("BroadcastHashJoin"),
      "the nation-bound dimension legs must broadcast")
  }

  test("q170 market share: the p_type filter prunes the part build " +
      "side BEFORE its broadcast join, and the share is one aggregate " +
      "(no aggregate-vs-aggregate self-join)") {
    val df = q("q170_market_share")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "star joins must stay hash equi-joins")
    // the filtered part table reaches its scan with the type predicate
    assert(plan.contains("p_type"),
      "p_type must appear in the plan (filter pushed toward the scan)")
    val aggCount = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(aggCount <= 6,
      s"share must fold in ONE partial+final aggregate pair per side, " +
        s"not a self-joined aggregate cascade; got $aggCount HashAggregates")
  }

  test("q171 curriculum: the only unpartitioned window runs over the " +
      "|sources| index frame — positions are arithmetic, never a " +
      "global row_number over the corpus") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate,
      Window => LWindow}
    val df = q("q171_curriculum_schedule")
    df.collect()
    val lp = df.queryExecution.optimizedPlan
    val bad = lp.collect { case w: LWindow
        if w.partitionSpec.isEmpty &&
          w.child.collectFirst { case _: Aggregate => () }.isEmpty => w }
    assert(bad.isEmpty,
      s"unpartitioned windows must sit on the distinct-source " +
        s"(aggregate) frame only: $bad")
  }

  test("q173 forecast revenue: all three predicates reach the parquet " +
      "scan and the sum folds map-side to one row") {
    val df = q("q173_forecast_revenue")
    val plan = finalPlan(df)
    assert(plan.contains("PushedFilters: ["),
      "scan must carry pushed filters")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") ||
      plan.contains("IsNotNull(l_shipdate)"),
      "the shipdate band must be pushed")
    // the full filter list is truncated in the rendered plan; the
    // quantity cap's presence shows through its IsNotNull guard and
    // the DataFilters clause
    assert(plan.contains("IsNotNull(l_quantity)") &&
      plan.contains("isnotnull(l_quantity"),
      s"the quantity cap must be pushed: $plan")
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey") &&
      !readSchema.contains("l_partkey"),
      s"scan must read only the referenced columns: $readSchema")
  }

  test("q174 late-priority check: the EXISTS runs as ONE left-semi " +
      "join keyed on orderkey — never a product join, and lineitem " +
      "ships only two columns") {
    val df = q("q174_late_priority_orders")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      "the EXISTS must decorrelate to a left-semi join")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "the compound lateness condition must ride the orderkey " +
        "equi-join, not degrade it to a product form")
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema"))
      .find(_.contains("l_shipdate")).getOrElse("")
    assert(!readSchema.contains("l_quantity") &&
      !readSchema.contains("l_extendedprice"),
      s"lineitem must ship only (orderkey, shipdate): $readSchema")
  }

  test("q177 min-cost supplier: the type/size filter prunes the part " +
      "build BEFORE its broadcast and the min join-back stays an " +
      "equi-join") {
    val df = q("q177_min_cost_supplier")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "the decorrelated min join-back must stay a hash equi-join")
    assert(plan.contains("BroadcastHashJoin"),
      "the pruned part/supplier dims must broadcast")
    assert(plan.contains("p_type") && plan.contains("p_size"),
      "the part filter must sit on the build side of the plan")
  }

  test("q181 large-volume orders: the HAVING filters before the " +
      "dimension joins and the top-k is TakeOrderedAndProject") {
    val df = q("q181_large_volume_orders")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "orderBy+limit must plan as TakeOrderedAndProject, not a " +
        "global sort")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "attribution joins must stay keyed equi-joins")
  }

  test("q183 sole-late supplier: the EXISTS/NOT-EXISTS pair costs " +
      "ZERO fact self-joins — lineitem is scanned at most twice " +
      "(stats + late pairs), never joined against itself per subquery") {
    val df = q("q183_sole_late_supplier")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "all joins must stay keyed equi-joins")
    // count scans in the FINAL plan only — the AQE rendering repeats
    // every node once more under "== Initial Plan ==".
    val finalSection = plan.split("== Initial Plan ==").head
    val lineitemScans = finalSection.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("lineitem"))
    assert(lineitemScans <= 2,
      s"the textbook plan re-scans lineitem per correlated subquery; " +
        s"this shape allows at most 2 scans, got $lineitemScans")
  }

  test("x33 bloom strip-boilerplate: the rebuild side has NO join — " +
      "the vocabulary arrives as a scalar-subquery bitset (x14's " +
      "delivery for the removal transform)") {
    val df = q("x33_strip_boilerplate_bloom")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the ONLY join-free plan form: membership is a map-side
    // might_contain probe (the df-threshold subquery aggregates but
    // never joins against the doc-line stream)
    assert(!plan.contains("Join"),
      "rebuild must probe the bloom map-side, never join by line")
  }

  test("q185 quality logit: inference is ONE scan — features and the " +
      "decimal dot product are row expressions; no join, ≤2 shuffles " +
      "(aggregate + output sort)") {
    val df = q("q185_quality_logit")
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(!plan.toString.contains("Join"),
      "scoring must not join — weights are literals in the projection")
    val exchanges = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size <= 2,
      s"expected ≤2 shuffles (per-source aggregate + order), got " +
        s"${exchanges.size}")
    val scans = plan.toString.split("== Initial Plan ==").head
      .linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected exactly one documents scan, got $scans")
  }

  test("q187 forget-users: the request list broadcasts — the fact " +
      "scan is never shuffled for the membership join") {
    val df = q("q187_forget_users")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "request list must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "fact side must not sort-merge for a human-scale request list")
  }

  test("q186 snapshot diff: fingerprint reconciliation is a keyed " +
      "full-outer join — no product joins; the join input carries md5 " +
      "projections, not text") {
    val df = q("q186_snapshot_diff")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "reconciliation must stay a keyed join")
    assert(plan.contains("FullOuter"), "full-outer reconciliation")
    // projection pruning: the exchanges feeding the join must not
    // carry the raw text column (the md5 is computed pre-shuffle)
    val finalSection = plan.split("== Initial Plan ==").head
    val exchangeLines = finalSection.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchangeLines.nonEmpty)
    assert(!exchangeLines.exists(_.contains("text#")),
      s"join shuffle must carry fingerprints, not text: $exchangeLines")
  }

  test("q188 n-gram run removal: the native expression keeps the plan " +
      "window-free — zero shuffles beyond the output sort") {
    val df = q("q188_collapse_ngram_runs")
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(!plan.toString.contains("Window"),
      "the positional rule must run as a map-side expression, not " +
        "the oracle's 3-window plan")
    val exchanges = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size <= 1,
      s"expected ≤1 shuffle (output sort only), got ${exchanges.size}")
  }

  test("q195 rule co-occurrence: pair fan-out stays inside the " +
      "projection — no join touches the document stream") {
    val df = q("q195_rule_cooccurrence")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "rule pairs must never be a product join")
    assert(!plan.contains("SortMergeJoin"),
      "every join runs on the |rules|²-bounded pair/marginal tables " +
        "and must broadcast — a sort-merge means a data-sized join " +
        "crept in")
    assert(plan.contains("HashAggregate"),
      "pair counts must partial-aggregate before the exchange")
  }

  test("q197 kNN hubness: the query panel broadcasts (nested-loop on " +
      "the broadcast side only) and ranking is the bounded-heap " +
      "aggregate, never a window") {
    val df = q("q197_knn_hubness")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "panel scoring must broadcast, never a partitioned product")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the bounded panel must ride a broadcast nested loop")
    assert(!plan.contains("Window"),
      "top-k must be the bounded-heap aggregate (graft_row_top_k), " +
        "never a data-sized rank window")
  }

  test("q201 RFM: rank-binning via broadcast quantile CUTOFFS — no " +
      "ntile window anywhere in the plan") {
    val df = q("q201_rfm_segments")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "RFM codes must come from cutoff compares, never a rank window")
    assert(plan.contains("BroadcastExchange"),
      "the 9-double cut table must broadcast")
  }

  test("q204 z-order cells: one bounded cut aggregate broadcast back; " +
      "no join wider than the broadcast, no window") {
    val df = q("q204_zorder_cells")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "morton binning is map-side")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"),
      "the only join is the 1-row cut broadcast")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      "cuts must ride a broadcast")
  }

  test("q198 calibration: flags+score are one projection — the ntile " +
      "window is source-partitioned, never unpartitioned") {
    val df = q("q198_classifier_calibration")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val finalPart = plan.split("== Initial Plan ==").head
    val unpartitioned = finalPart.linesIterator.exists(l =>
      l.contains("Window") && l.contains("ntile") &&
        !l.contains("source"))
    assert(!unpartitioned,
      "calibration bins must partition by source (parallel windows)")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q207 source-lang MI: every join after the grid aggregate is " +
      "a broadcast — no data-sized exchange beyond the first") {
    val df = q("q207_source_lang_mi")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      "marginal/total joins run on the bounded grid and must broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q196 bot regularity: one user-keyed window pass, then only " +
      "bounded aggregates — no join anywhere") {
    val df = q("q196_bot_regularity")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "the triage is window + aggregates")
    // AQE's toString appends the initial plan — count the final only
    val windows = plan.split("== Initial Plan ==").head.linesIterator
      .count(l => l.contains("Window") && l.contains("lag("))
    assert(windows == 1, s"exactly one lag window expected, got $windows")
    assert(plan.contains("HashAggregate"),
      "per-user moments must partial-aggregate")
  }

  test("q209 weighted sample: both rank windows are (source[, shard])-" +
      "partitioned — no unpartitioned global window; no join at all") {
    val df = q("q209_weighted_sample")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val finalPart = plan.split("== Initial Plan ==").head
    // every Window node must carry a partition spec (the two-phase
    // prune: (source, _shard) then (source)) — an unpartitioned window
    // would serialize the corpus through one reducer
    val unpartitioned = finalPart.linesIterator.exists(l =>
      l.contains("Window") && !l.contains("windowspecdefinition(source"))
    assert(!unpartitioned,
      "every rank window must partition by source (or source, shard)")
    assert(!plan.contains("Join"), "the sample is hash + windows only")
  }

  test("q210 audience overlap: the pair join keys on user_id after ONE " +
      "distinct presence fold; per-type counts ride broadcasts") {
    val df = q("q210_type_audience_overlap")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "the pair space comes from the user-keyed equi-join")
    assert(plan.contains("BroadcastExchange"),
      "the |types|-row count table must broadcast back")
  }

  test("x43 HLL overlap: one sketch aggregate over the corpus; the " +
      "pairwise stage is a broadcast nested loop on |types| rows — " +
      "nothing corpus-sized past the sketches") {
    val df = q("x43_hll_type_overlap")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hll_sketch_agg") ||
      plan.contains("HllSketchAgg"),
      "the DataSketches aggregate must be in the plan")
    assert(!plan.contains("SortMergeJoin"),
      "the |types|-row pair stage must not shuffle-join")
    // exactly one data-sized exchange: the sketch aggregate's partial
    // -> final (everything after runs on |types| rows)
    val exchanges = plan.split("== Initial Plan ==").head.linesIterator
      .count(l => l.trim.startsWith("Exchange hashpartitioning"))
    assert(exchanges <= 1,
      s"only the sketch aggregate may shuffle, got $exchanges")
  }

  test("q213 BM25: top-k is a TakeOrdered (never a global sort), the " +
      "df/corpus scalars broadcast, and no product join appears") {
    val plan = finalPlan(q("q213_bm25_search"))
    assert(plan.contains("TakeOrderedAndProject"),
      "the final top-k must be TakeOrderedAndProject")
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastQueryStage"),
      "df and the (N, avgdl) scalar must broadcast")
    assert(!plan.contains("CartesianProduct"),
      "BM25 must not plan a cartesian (the scalar crossJoin is a " +
        "broadcast nested loop over ONE row, never a product of data)")
  }

  test("q214 leakage-free split: the pair stage is the inverted-index " +
      "equi-join — no product join anywhere in the plan") {
    val plan = finalPlan(q("q214_leakage_free_split"))
    assert(!plan.contains("CartesianProduct"),
      "split assignment inherits q29's no-cartesian contract")
  }

  test("q217 embedding diversity: NO join of data against data — the " +
      "only joins touch |labels|-row aggregates") {
    val df = q("q217_embedding_diversity")
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(!plan.toString.contains("CartesianProduct") &&
      !plan.toString.contains("BroadcastNestedLoopJoin"),
      "the centroid-norm identity needs no pair join")
    // the explode shuffle is the ONLY N*d-sized exchange; the final
    // join runs on |labels| rows (broadcast or tiny hash)
    val exchanges = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    // the N*d explode aggregate, the per-label fold, the n_vecs
    // aggregate, and the |labels|-row final join — nothing else
    assert(exchanges.size <= 4,
      s"explode agg + bounded-label stages only, got ${exchanges.size}")
  }

  test("q218 KN entropy: per-source totals BROADCAST into the scoring " +
      "join; no product join anywhere") {
    val df = q("q218_kn_bigram_entropy")
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "the scoring join is count-table x its own marginals — equi only")
    assert(plan.contains("BroadcastHashJoin"),
      "the |sources|-row totals frame must broadcast, not shuffle")
  }

  test("q219 strip dup spans: no product join; no corpus-keyed window " +
      "(canonical positions derive by AGGREGATE, the hot-gram-safe form)") {
    val df = q("q219_strip_dup_spans")
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "span removal joins only on gram / (doc_id, tokpos) keys")
    // a Window over gram would pile every occurrence of a hot gram
    // into one partition; the aggregate form partial-combines map-side
    val windows = collect(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty,
      s"no window operator expected in the removal pipeline: $windows")
  }

  test("q221 held-out KN: scoring joins are equi-joins; the only " +
      "nested-loop is the one-row broadcast totals") {
    val df = q("q221_kn_heldout")
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(!plan.toString.contains("CartesianProduct"),
      "held-out scoring must never product-join data against data")
    val bnlj = collect(plan) {
      case j: org.apache.spark.sql.execution.joins
          .BroadcastNestedLoopJoinExec => j
    }
    assert(bnlj.size <= 1,
      s"only the broadcast totals row may nested-loop, got ${bnlj.size}")
  }

  test("q222 dedup-aware mixture plan: inherits the inverted-index " +
      "pair join — no product join anywhere") {
    val plan = finalPlan(q("q222_mixture_plan_effective"))
    assert(!plan.contains("CartesianProduct"),
      "effective-token accounting inherits q29's no-cartesian contract")
  }

  test("x49 winnowing: fingerprint selection is MAP-SIDE (no exchange " +
      "below the fingerprint table), and the match join is the capped " +
      "inverted-index equi-join") {
    import graft.operators.NearDup
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val fps = NearDup.winnowFingerprintTable(docs)
    fps.collect()
    val fpExchanges = collect(fps.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.filterNot(widenFanOut)
    // ScanParallelism.widen's guarded input fan-out (raw doc rows off
    // the one-split scan) is tolerated; fingerprints themselves never
    // shuffle below the table
    assert(fpExchanges.isEmpty,
      "gram hashing, sliding min, and value dedup are array HOFs — " +
        s"zero shuffles, got ${fpExchanges.size}")
    val plan = finalPlan(q("x49_winnow_matches"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "pair generation must stay an equi-join on the fingerprint")
  }

  test("q225 trigram KN: all scoring joins are equi-joins, the " +
      "per-source totals BROADCAST, and no window appears anywhere " +
      "(every marginal is an aggregate of the one count table)") {
    val df = q("q225_kn_trigram_entropy")
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "the recursion scores via key-bounded equi-joins only")
    assert(plan.contains("BroadcastHashJoin"),
      "the |sources|-row totals frame must broadcast, not shuffle")
    val windows = collect(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty,
      s"continuation counts derive by AGGREGATE, never a window: $windows")
  }

  test("x52 FFD packing: the fold is MAP-SIDE over the bounded shard " +
      "collect — exactly the per-shard and per-source aggregate " +
      "exchanges, no join, no window") {
    val df = q("x52_ffd_pack_report")
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(!plan.toString.contains("Join"),
      "packing never joins data against data")
    val windows = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, "no window in the packing plan")
    val exchanges = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size <= 3,
      s"(source, shard) collect + source report (+ final sort) are the " +
        s"only exchanges, got ${exchanges.size}")
  }

  test("q226 order ladder: inherits the component no-cartesian " +
      "contracts; the ladder joins key on source only") {
    val plan = finalPlan(q("q226_kn_order_ladder"))
    assert(!plan.contains("CartesianProduct"),
      "three entropy pipelines + two |sources|-row joins — equi only")
  }

  test("q226 order ladder tokenizes the corpus ONCE: all three " +
      "component pipelines read the persisted token frame (r16 " +
      "verdict: three independent corpus scans + tokenizations)") {
    val df = q("q226_kn_order_ladder")
    df.collect()
    val plan = df.queryExecution.executedPlan
    val cacheScans = collect(plan) {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
        => s
    }
    assert(cacheScans.size >= 3,
      s"unigram/bigram/trigram explodes must all scan the shared " +
        s"token cache, got ${cacheScans.size} cache scans")
    val fileScans = collect(plan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(fileScans.isEmpty,
      s"the documents source is read only through the token cache — " +
        s"a file scan in the final plan means a pipeline re-tokenizes: " +
        s"${fileScans.map(_.nodeName)}")
  }

  test("q227 KN perplexity buckets: scoring joins are equi-joins, the " +
      "1-row totals broadcast, and the ONLY window is the per-source " +
      "ntile over the per-doc metadata frame (never a global sort)") {
    val df = q("q227_kn_perplexity_buckets")
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct"),
      "model statistics join back by key; the totals row broadcasts")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      "the 1-row nt totals frame must arrive as a broadcast")
    val windows = collect(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size == 1, s"exactly the ntile window: $windows")
    assert(windows.head.partitionSpec.nonEmpty,
      "the ntile window must partition by source — a global " +
        "single-partition window would serialize the corpus")
  }

  test("q228 KN retention: inherits q227's contracts — no cartesian " +
      "beyond the broadcast totals, one source-partitioned ntile " +
      "window, and the report joins are |sources|-row frames") {
    val df = q("q228_kn_retention")
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct"),
      "scoring joins key-bounded; the full-outer report join keys " +
        "on source")
    val windows = collect(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size == 1 && windows.head.partitionSpec.nonEmpty,
      s"exactly the per-source ntile window: $windows")
  }

  test("q229 chunk-with-overlap: one map-side transform/explode — no " +
      "join, no window, no aggregate; the only exchange is the " +
      "verification sort") {
    val df = q("q229_chunk_overlap")
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(!plan.toString.contains("Join"),
      "chunking consults no corpus-wide state")
    val windows = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, "positional arithmetic, never a window")
    val exchanges = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size <= 1,
      s"only the output sort may exchange, got ${exchanges.size}")
  }
}
