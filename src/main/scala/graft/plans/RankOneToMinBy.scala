package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.NumericType

/** Optimizer rule: rewrite the "rank-1 per group" window pattern
  *
  *   Filter(rn = 1, Window(rn <- row_number() OVER (PARTITION p ORDER o)))
  *
  * into a partial-aggregable min_by:
  *
  *   Project(fields of _top1, rn <- 1,
  *     Aggregate(p, min_by(struct(*), orderKey(o)) AS _top1))
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
  *    exactly rank 1 (`= 1` either side, or `<= 1`);
  *  - every ORDER BY key is non-nullable, and descending keys are
  *    numeric (negated to fold into the ascending min_by key) — null
  *    ordering and non-numeric descent bail out;
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

  /** The attribute whose rank the filter pins to 1, if the condition has
    * exactly that shape. */
  private def rankOneAttr(cond: Expression): Option[ExprId] = cond match {
    case EqualTo(a: AttributeReference, l) if isOneLit(l) => Some(a.exprId)
    case EqualTo(l, a: AttributeReference) if isOneLit(l) => Some(a.exprId)
    case LessThanOrEqual(a: AttributeReference, l) if isOneLit(l) =>
      Some(a.exprId)
    case _ => None
  }

  /** Ascending min_by key for one sort order: ascending non-nullable
    * keys pass through, descending non-nullable NUMERIC keys negate;
    * everything else disqualifies the rewrite. */
  private def minByKey(s: SortOrder): Option[Expression] = s match {
    case SortOrder(e, Ascending, _, _) if !e.nullable => Some(e)
    case SortOrder(e, Descending, _, _)
        if !e.nullable && e.dataType.isInstanceOf[NumericType] =>
      Some(UnaryMinus(e))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
          part, order, child, _))
        if rankOneAttr(cond).contains(alias.exprId) &&
          part.forall(_.isInstanceOf[AttributeReference]) &&
          order.nonEmpty && order.forall(minByKey(_).isDefined) &&
          child.output.nonEmpty =>
      val keys = order.map(minByKey(_).get)
      val orderKey = if (keys.length == 1) keys.head else CreateStruct(keys)
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
  }
}

/** Engine extensions entry point:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (GraftSession wires it for every engine session). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => RankOneToMinBy)
}
