package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: auto-bin interval-overlap theta joins.
  *
  * A join whose only condition is the half-open overlap predicate
  *
  *   a.start < b.end AND b.start < a.end
  *
  * has no equi-key, so Spark plans BroadcastNestedLoopJoin — quadratic
  * compare volume and a broadcast-or-bust memory profile. This rule
  * rewrites it into the plan [[graft.ops.JoinOps.intervalOverlapJoin]]
  * hand-writes: explode both sides into fixed-width bins (a Generate of
  * `sequence(start div w, (end-1) div w)`), equi-join on the bin id
  * with the original predicate as a residual, and dedup multi-bin pairs
  * with the PBSM report-once filter (`bin = greatest(a.start, b.start)
  * div w`) instead of a data-sized distinct. The user writes the
  * declarative theta join; the optimizer supplies the scale-safe plan.
  *
  * Deliberately narrow — fires only when ALL of:
  *  - the join is INNER with EXACTLY the two-conjunct overlap condition
  *    over four plain `LongType` attribute references, two per side
  *    (either conjunct order, either comparison orientation);
  *  - `spark.graft.intervalJoin.binWidth` is set to a positive long —
  *    bin width is a data-dependent choice (span/selectivity tradeoff),
  *    so the rewrite is opt-in per session/query, never guessed;
  *  - both "interval" column pairs come from DISTINCT sides (a
  *    condition mixing sides per bound is not an interval overlap).
  *
  * The rewrite preserves the join's exact output attributes (a final
  * Project drops the bin columns), so it is observationally identical
  * to the nested-loop plan — PlanSpec pins both the rewrite firing and
  * result equality against the un-rewritten form.
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] {

  val BinWidthConf = "spark.graft.intervalJoin.binWidth"

  /** Normalize `x < y` / `y > x` to (lo, hi). */
  private def asLt(e: Expression): Option[(Attribute, Attribute)] = e match {
    case LessThan(a: AttributeReference, b: AttributeReference) => Some((a, b))
    case GreaterThan(a: AttributeReference, b: AttributeReference) => Some((b, a))
    case _ => None
  }

  /** Match (aStart, aEnd, bStart, bEnd) with a* from `left`, b* from
    * `right`, all LongType.
    */
  private def overlapBounds(cond: Expression, left: LogicalPlan,
                            right: LogicalPlan): Option[(Attribute, Attribute, Attribute, Attribute)] = {
    def side(a: Attribute): Option[Boolean] = // true = left
      if (left.outputSet.contains(a)) Some(true)
      else if (right.outputSet.contains(a)) Some(false)
      else None
    cond match {
      case And(c1, c2) =>
        (asLt(c1), asLt(c2)) match {
          case (Some((lo1, hi1)), Some((lo2, hi2)))
              if Seq(lo1, hi1, lo2, hi2).forall(_.dataType == LongType) =>
            (side(lo1), side(hi1), side(lo2), side(hi2)) match {
              // (aS < bE) AND (bS < aE)
              case (Some(true), Some(false), Some(false), Some(true)) =>
                Some((lo1, hi2, lo2, hi1))
              // (bS < aE) AND (aS < bE)
              case (Some(false), Some(true), Some(true), Some(false)) =>
                Some((lo2, hi1, lo1, hi2))
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }
  }

  private def binOf(e: Expression, w: Literal): Expression = IntegralDivide(e, w)

  private def binned(child: LogicalPlan, start: Attribute, end: Attribute,
                     w: Literal): (LogicalPlan, Attribute) = {
    // INTERVAL SEMANTICS, enforced not assumed: a row with start >= end
    // is an empty interval and can never match — but the raw predicate
    // pair WOULD accept some such rows, and Sequence over an inverted
    // range silently generates DESCENDING bins, which breaks the
    // report-once ownership argument. Enabling the binWidth conf is the
    // caller's assertion that the columns are intervals; the filter
    // makes the resulting semantics (empty intervals match nothing)
    // explicit and deterministic either way.
    val wellFormed = Filter(LessThan(start, end), child)
    // Sequence is TimeZoneAwareExpression: expressions minted inside the
    // optimizer never meet ResolveTimeZone, so the zone must be set here
    // or the plan trips the became-unresolved validation (integral
    // sequences never USE it, but `resolved` still requires it)
    val gen = Explode(new Sequence(
      binOf(start, w), binOf(Subtract(end, Literal(1L)), w), None,
      Some(conf.sessionLocalTimeZone)))
    val binAttr = AttributeReference("_graft_bin", LongType, nullable = false)()
    (Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(binAttr), wellFormed), binAttr)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = scala.util.Try(conf.getConfString(BinWidthConf, "0").toLong)
      .getOrElse(0L)
    if (width <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        overlapBounds(cond, left, right) match {
          case Some((aS, aE, bS, bE)) =>
            val w = Literal(width, LongType)
            val (genL, binL) = binned(left, aS, aE, w)
            val (genR, binR) = binned(right, bS, bE, w)
            val joined = Join(genL, genR, Inner,
              Some(And(EqualTo(binL, binR), cond)), hint)
            // report-once: only the bin holding the overlap's start emits
            val once = Filter(
              EqualTo(binL, binOf(Greatest(Seq(aS, bS)), w)), joined)
            Project(j.output, once)
          case None => j
        }
    }
  }
}
