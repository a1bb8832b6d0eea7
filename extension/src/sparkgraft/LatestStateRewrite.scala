// SURVEY §4.2 stretch item: a real Catalyst extension (injected via
// spark.sql.extensions) demonstrating an engine-level rewrite Spark does
// not perform itself.
//
// Rule: the "latest state" pattern — rank-1 row_number window + filter —
// becomes a max_by/min_by hash aggregate:
//
//   Project [cols...]                      Project [cols...]
//     Filter (rn = 1 [AND rest])             Filter [rest]
//       Window [row_number()          =>       Project [row.col1, ...]
//               PARTITION BY k                   Aggregate [k] [max_by(
//               ORDER BY o DESC] rn                struct(cols), o)]
//
// Why it matters at scale: the window form shuffles on k and then SORTS
// every partition (Exchange + Sort + Window), while the aggregate form is
// a two-phase hash aggregate — partial max_by on the map side collapses
// each partition to one row per key BEFORE the shuffle, so the exchange
// ships keys, not history. For CDC latest-state over a 100 TB changelog
// (many events per key) the map-side combine is the difference between
// shuffling the changelog and shuffling the snapshot.
//
// Semantics notes (rule bails otherwise):
// - single row_number window expression, single ORDER BY key;
// - the filter must pin rn = 1; other conjuncts stay as a Filter above;
// - no parent may reference rn (the rule matches the Project that drops
//   it and requires rn unused in the projection / residual filter);
// - ties: row_number and max_by both pick an unspecified row among
//   order-key ties, so the rewrite preserves the (already
//   nondeterministic) tie behavior;
// - NULL order keys: max_by/min_by SKIP null keys while row_number ranks
//   them per the SortOrder's null ordering (Spark default ASC = NULLS
//   FIRST would make rn=1 a NULL-keyed row), and an all-NULL group keeps
//   a real row under row_number but collapses to a NULL struct under the
//   aggregate. No null-ordering flag fixes the all-NULL-group case, so
//   the rule REQUIRES a provably non-nullable order key and keeps the
//   Window plan otherwise (CDC offsets are non-nullable, so the target
//   pattern still rewrites).
package sparkgraft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy, AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

object LatestStateRewrite extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  private def isRankOne(e: Expression, rn: Attribute): Boolean = e match {
    case EqualTo(a: Attribute, Literal(1, _)) => a.semanticEquals(rn)
    case EqualTo(Literal(1, _), a: Attribute) => a.semanticEquals(rn)
    case _                                    => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(plist, f @ Filter(cond, w: Window))
        if w.windowExpressions.size == 1 =>
      w.windowExpressions.head match {
        case rnAlias @ Alias(
              WindowExpression(
                RowNumber(),
                WindowSpecDefinition(part, Seq(order), _)
              ),
              _
            ) if part.nonEmpty =>
          val rnAttr = rnAlias.toAttribute
          val conjuncts = splitConjuncts(cond)
          val (rankConds, rest) = conjuncts.partition(isRankOne(_, rnAttr))
          val restRefsRn = rest.exists(_.references.contains(rnAttr))
          val plistRefsRn = plist.exists(_.references.contains(rnAttr))
          // max_by/min_by ignore NULL order keys; row_number ranks them.
          // A nullable key can therefore select a different row (or keep
          // an all-NULL group the aggregate would null out) — bail.
          if (rankConds.isEmpty || restRefsRn || plistRefsRn ||
              order.child.nullable) {
            p
          } else {
            val child = w.child
            val cols = child.output
            val struct = CreateStruct(cols)
            val picker = order.direction match {
              case Descending => MaxBy(struct, order.child)
              case Ascending  => MinBy(struct, order.child)
            }
            val aggExpr = AggregateExpression(picker, Complete, isDistinct = false)
            val rowAlias = Alias(aggExpr, "__latest_row")()
            val agg = Aggregate(part, Seq(rowAlias), child)
            val rowAttr = rowAlias.toAttribute
            // Re-expose every child column under its ORIGINAL exprId so
            // the residual filter and the projection resolve unchanged.
            val expanded = cols.zipWithIndex.map { case (a, i) =>
              Alias(GetStructField(rowAttr, i, Some(a.name)), a.name)(
                exprId = a.exprId,
                qualifier = a.qualifier
              )
            }
            val expandedPlan = Project(expanded, agg)
            val filtered =
              if (rest.isEmpty) expandedPlan
              else Filter(rest.reduce(And), expandedPlan)
            Project(plist, filtered)
          }
        case _ => p
      }
  }
}

class SparkGraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule((_: SparkSession) => LatestStateRewrite)
  }
}
