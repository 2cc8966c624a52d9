package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule — the last rung of the extension ladder beside the
  * codegen expressions, the typed aggregates, the V2 source, and the
  * [[TopKPerKey]] plan+strategy: rewrite the standard SQL top-k idiom
  *
  *   ... row_number() OVER (PARTITION BY key ORDER BY ord) AS rn ...
  *   WHERE/QUALIFY rn <= k
  *
  * into the [[TopKPerKey]] logical node, so SQL-form queries get the
  * partial/final bounded-heap plan the Scala API gets — at most k rows
  * per (map partition, key) cross the exchange, and the reduce side
  * re-heaps instead of sorting each hash partition's full row set.
  * (Spark's own InferWindowGroupLimit, 3.5+, also map-side-limits this
  * pattern but keeps the shuffle-then-sort Window; this rule replaces
  * the operator entirely, and makes the SQL and API forms provably the
  * same plan — PlanSpec pins it.)
  *
  * Deliberately narrow — the rewrite fires only when ALL of:
  *  - the Window computes EXACTLY ONE expression: an aliased
  *    `row_number()` with the standard (UNBOUNDED PRECEDING,
  *    CURRENT ROW) row frame;
  *  - the partition spec is non-empty (a global top-k has no key to
  *    cluster by — Spark's TakeOrderedAndProject already owns that);
  *  - the filter is a single comparison binding that row number to a
  *    positive integer literal (`rn <= k`, `rn < k`, `k >= rn`,
  *    `k > rn`, `rn = 1`);
  *  - k ≤ [[TopKRewrite.MaxK]] — the heap holds k rows per key per
  *    partition, so a pathological `rn <= 10_000_000` keeps the sort
  *    formulation, whose memory is bounded by spill.
  *
  * Ties beyond the ORDER BY are broken arbitrarily — exactly the
  * `row_number` contract the window formulation already has.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  val MaxK = 10000

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType)) if a.semanticEquals(rn) => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, IntegerType)) if a.semanticEquals(rn) => Some(v - 1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(v - 1)
    case EqualTo(a: Attribute, Literal(v: Int, IntegerType)) if v == 1 && a.semanticEquals(rn) => Some(1)
    case EqualTo(Literal(v: Int, IntegerType), a: Attribute) if v == 1 && a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) if w.windowExpressions.size == 1 =>
      w.windowExpressions.head match {
        case a @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(ps, os,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)
            if ps.nonEmpty && os.nonEmpty =>
          limitOf(cond, a.toAttribute) match {
            case Some(k) if k >= 1 && k <= MaxK =>
              // user rules run AFTER the built-in batches, so Spark's
              // InferWindowGroupLimit (3.5+) has usually already put a
              // logical WindowGroupLimit under the Window; the heaps
              // subsume its per-key limiting, and keeping it would keep
              // its sort-based physical pipeline too — unwrap it
              val child = w.child match {
                case wgl: WindowGroupLimit => wgl.child
                case c => c
              }
              TopKPerKey(ps, os, k, a.toAttribute, child)
            case _ => f
          }
        case _ => f
      }
  }
}
