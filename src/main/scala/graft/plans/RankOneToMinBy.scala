package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, IntegerType}

import graft.functions.RowTopK

/** Optimizer rule: rewrite the "rank ≤ k per group" window patterns
  *
  *   Filter(rn = 1,  Window(rn <- row_number() OVER (PARTITION p ORDER o)))
  *   Filter(rn <= k, Window(rn <- row_number() OVER (PARTITION p ORDER o)))
  *
  * into partial-aggregable forms:
  *
  *   Project(fields of _top1, rn <- 1,
  *     Aggregate(p, min_by(struct(*), orderKey(o)) AS _top1))          k = 1
  *   Project(fields of _col, rn <- _pos + 1,
  *     Generate(posexplode(_topk),
  *       Aggregate(p, graft_row_top_k(orderKey(o), struct(*), k))))    k ≥ 2
  *
  * Why it matters at 100 TB: the window form shuffles EVERY row on p and
  * sorts each partition before discarding all but one row per group —
  * there is no map-side reduction, and a hot key's entire history passes
  * through one reducer (Spark's WindowGroupLimit trims the sort but not
  * the shuffle). The aggregate form combines map-side to ONE row per
  * group per partition before the exchange — the same partial-agg shape
  * every other engine aggregate here relies on — and AQE can split what
  * little skew remains. This is the plan that makes first-wins key dedup
  * (reference semantics etl/etl.py:452-465, Dedup.firstWins) sustainable
  * on a corpus-sized key stream.
  *
  * Semantics: row_number picks exactly one row per group under the given
  * order; min_by picks the row with the least ordering key. The rewrite
  * therefore fires only when they provably agree:
  *  - the single window function is row_number() and the filter keeps
  *    rank 1 exactly (`= 1` / `<= 1`) or a bounded prefix (`<= k`);
  *  - every ORDER BY key folds into an ascending min_by/top-k key:
  *    ascending keys directly, descending FRACTIONAL/decimal keys by
  *    negation (integral descent bails — ANSI negation of MinValue
  *    throws where a sort succeeds), nullable keys via an explicit
  *    NULLS FIRST/LAST flag field;
  *  - partition keys are plain attributes.
  * On order-key ties both forms keep one arbitrary row (Spark's window
  * sort is not stable across partitionings either), so determinism
  * claims are unchanged: unique full order keys (e.g. firstWins' arrival
  * sequence) stay deterministic, tied keys were never deterministic.
  *
  * The rule registers through SparkSessionExtensions (GraftExtensions) —
  * it joins the operator-optimization fixed point, runs before Spark's
  * own InferWindowGroupLimit, and is convergent (the rewritten subtree
  * contains no Window to re-match).
  */
object RankOneToMinBy extends Rule[LogicalPlan] {

  private def isOneLit(e: Expression): Boolean = e match {
    case Literal(v: Int, _) => v == 1
    case _ => false
  }

  /** The rank bound the filter imposes on `attr`, if the condition has
    * exactly the shape rank-prefix filters take: `rn = 1` (either
    * side), `rn <= k`, or `k >= rn`. `rn = k` for k >= 2 means
    * "exactly rank k" and never matches. */
  private def rankBound(cond: Expression): Option[(ExprId, Int)] =
    cond match {
      case EqualTo(a: AttributeReference, l) if isOneLit(l) =>
        Some((a.exprId, 1))
      case EqualTo(l, a: AttributeReference) if isOneLit(l) =>
        Some((a.exprId, 1))
      case LessThanOrEqual(a: AttributeReference, Literal(k: Int, _))
          if k >= 1 => Some((a.exprId, k))
      case GreaterThanOrEqual(Literal(k: Int, _), a: AttributeReference)
          if k >= 1 => Some((a.exprId, k))
      case _ => None
    }

  /** Ascending key fields for one sort order, such that plain ascending
    * comparison reproduces the window's (direction, null ordering)
    * exactly:
    *  - ascending keys pass through; descending keys negate, allowed
    *    only for double/float/decimal (ANSI negation of an integral
    *    MinValue would throw where the window sort succeeds — bail);
    *  - a NULLABLE key gains an explicit 0/1 null flag in front,
    *    ordered per the window's NULLS FIRST/LAST, so the value field
    *    is only ever compared between two non-null (or two null) rows —
    *    no reliance on any engine-internal null-comparison convention;
    *  - a DESCENDING double/float key also gains a NaN flag: Spark
    *    orders NaN greatest in BOTH directions, so a descending sort
    *    ranks NaN first — but negation does not move NaN, so without
    *    the flag the negated key would rank it last.
    */
  private def minByKey(s: SortOrder): Option[Seq[Expression]] = {
    val e = s.child
    def withNullFlag(keys: Seq[Expression]): Seq[Expression] =
      if (!e.nullable) keys
      else {
        val nullSortsFirst = s.nullOrdering == NullsFirst
        val flag = If(IsNull(e),
          Literal(if (nullSortsFirst) 0 else 1),
          Literal(if (nullSortsFirst) 1 else 0))
        flag +: keys
      }
    s.direction match {
      case Ascending => Some(withNullFlag(Seq(e)))
      case Descending if e.dataType == DoubleType ||
          e.dataType == FloatType =>
        // NaN sorts greatest → first under DESC; flag 0 pulls it ahead
        // of every negated real value. IsNaN(null) is false — null rows
        // are already segregated by the null flag in front.
        Some(withNullFlag(Seq(
          If(IsNaN(e), Literal(0), Literal(1)), UnaryMinus(e))))
      case Descending if e.dataType.isInstanceOf[DecimalType] =>
        Some(withNullFlag(Seq(UnaryMinus(e))))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
          part, order, child, _)) =>
      // evaluate the bound and per-key foldings ONCE; anything
      // disqualifying returns the filter untouched
      val bound = rankBound(cond)
      val keyFields = order.map(minByKey)
      val applicable =
        bound.exists { case (id, k) =>
          id == alias.exprId && k <= RowTopK.MaxK
        } &&
          part.forall(_.isInstanceOf[AttributeReference]) &&
          order.nonEmpty &&
          // a nondeterministic key (random-sample-per-group idiom) must
          // keep the window plan: the flag fields re-evaluate the key
          // expression, so flag and value would come from different
          // draws — the same reason Spark's own rules guard duplication
          // on `deterministic`
          order.forall(_.child.deterministic) &&
          keyFields.forall(_.isDefined) &&
          child.output.nonEmpty
      if (!applicable) f
      else rewrite(bound.get._2, alias, part,
        keyFields.flatMap(_.get), child)
  }

  private def rewrite(k: Int, alias: Alias, part: Seq[Expression],
      keys: Seq[Expression], child: LogicalPlan): LogicalPlan = {
    val orderKey = if (keys.length == 1) keys.head else CreateStruct(keys)
    if (k == 1 && part.nonEmpty) {
        // ---- rank = 1, grouped → min_by -------------------------------
        // (a GROUPING-LESS min_by aggregate would emit one spurious
        // all-null row over runtime-empty input where the window emits
        // zero — global rank-1 takes the top-k path below, whose empty
        // array explodes to zero rows)
        val top = Alias(
          AggregateExpression(
            MinBy(CreateStruct(child.output), orderKey),
            Complete, isDistinct = false),
          "_graft_top1")()
        val topAttr = top.toAttribute
        // restore the original output attributes (same exprIds) from the
        // kept row's struct; the rank column is the constant 1 it was
        // filtered to, under its original exprId
        val restored = child.output.zipWithIndex.map { case (a, i) =>
          Alias(GetStructField(topAttr, i, Some(a.name)), a.name)(
            exprId = a.exprId)
        }
        val rnOut = Alias(Literal(1), alias.name)(exprId = alias.exprId)
        Project(restored :+ rnOut, Aggregate(part, Seq(top), child))
      } else {
        // ---- rank <= k → bounded row top-k + posexplode ---------------
        // Same shuffle economics, k rows per group per map task
        // (functions.RowTopK); rank recovered from the ascending array
        // position. Also the safe shape for k = 1 with no PARTITION BY.
        val valueStruct = CreateStruct(child.output)
        val top = Alias(
          AggregateExpression(
            RowTopK(orderKey, valueStruct, Literal(k)),
            Complete, isDistinct = false),
          "_graft_topk")()
        val topAttr = top.toAttribute
        val posAttr =
          AttributeReference("_graft_pos", IntegerType, nullable = false)()
        val colAttr = AttributeReference("_graft_col", valueStruct.dataType,
          nullable = false)()
        val gen = Generate(PosExplode(topAttr),
          unrequiredChildIndex = Seq(0), outer = false, qualifier = None,
          generatorOutput = Seq(posAttr, colAttr),
          Aggregate(part, Seq(top), child))
        val restored = child.output.zipWithIndex.map { case (a, i) =>
          Alias(GetStructField(colAttr, i, Some(a.name)), a.name)(
            exprId = a.exprId)
        }
        val rnOut = Alias(Add(posAttr, Literal(1)), alias.name)(
          exprId = alias.exprId)
        Project(restored :+ rnOut, gen)
    }
  }
}

/** Engine extensions entry point:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (GraftSession wires it for every engine session). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => RankOneToMinBy)
}
