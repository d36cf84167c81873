package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: turn a pure range join
  *
  * {{{ points JOIN ranges ON p >= lo AND p <= hi }}}
  *
  * into a bucketed equi-join. Without an equi key Spark can only plan a
  * (Broadcast)NestedLoopJoin — O(|points| × |ranges|) comparisons, the
  * classic scale killer for GeoIP-style interval lookups. The rewrite
  * explodes each range row into the 2^bits-wide buckets it covers and adds
  * `(p >> bits) = bucket` to the condition, so the planner picks a hash
  * equi-join: each point probes exactly one bucket, each range is
  * replicated ~(span/2^bits + 1) times. For narrow ranges (GeoIP /16s,
  * sessions, time intervals) the replication factor is ~1.
  *
  * Correctness: for a matching pair, `p >> bits` falls in
  * `[lo >> bits, hi >> bits]`, and the exploded buckets of that range are
  * distinct — so every original match survives exactly once, and the
  * original range predicate (kept in the condition) prunes false bucket
  * collisions. Arithmetic shift floors toward -inf, so negative keys
  * bucket correctly. Rows with NULL or inverted (lo > hi) ranges match
  * nothing in the original join; `sequence()` yields NULL/empty for them
  * and the non-outer Generate drops the row — same result.
  *
  * Applied only when:
  *  - the join has NO cross-side equality conjunct already (an equi key
  *    means the planner already has a hash join — and it also makes the
  *    rule's own output a fixpoint);
  *  - exactly the preserved-side rows survive: Inner/LeftSemi/LeftAnti
  *    always, LeftOuter only when the ranges sit on the right (exploding
  *    the preserved side would drop its empty-range rows), RightOuter
  *    mirrored;
  *  - point and bounds are deterministic, same-typed int/long expressions
  *    each referencing exactly one side.
  *
  * Tuning: spark.graft.rangeJoin.enabled (default true),
  * spark.graft.rangeJoin.bucketBits (default 16 — /16 for IPv4, 65 s for
  * millisecond timestamps).
  *
  * Reference behavior analogue: core/aggregator.go:62-66 does a per-event
  * O(1) mmdb lookup; this rule gives the declarative join the same
  * hash-lookup shape without the caller hand-bucketing (GeoIp.enrich
  * remains the explicit form).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rangeJoin.enabled", "true").toBoolean
  private def bucketBits: Int =
    conf.getConfString("spark.graft.rangeJoin.bucketBits", "16").toInt

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** (point, bound) if c is `point >= bound` (resp. `point <= bound` when
    * lower=false), in either written direction, with strict variants. */
  private def boundOf(c: Expression, lower: Boolean): Option[(Expression, Expression)] =
    c match {
      case GreaterThanOrEqual(p, b) if lower => Some((p, b))
      case GreaterThan(p, b) if lower => Some((p, b))
      case LessThanOrEqual(b, p) if lower => Some((p, b))
      case LessThan(b, p) if lower => Some((p, b))
      case LessThanOrEqual(p, b) if !lower => Some((p, b))
      case LessThan(p, b) if !lower => Some((p, b))
      case GreaterThanOrEqual(b, p) if !lower => Some((p, b))
      case GreaterThan(b, p) if !lower => Some((p, b))
      case _ => None
    }

  private def sideOf(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Boolean] =
    if (e.references.isEmpty || !e.deterministic) None
    else if (e.references.subsetOf(left.outputSet)) Some(true)
    else if (e.references.subsetOf(right.outputSet)) Some(false)
    else None

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(left, right, joinType, Some(cond), hint)
          if rewritable(joinType) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) =>
            (sideOf(a, left, right), sideOf(b, left, right)) match {
              case (Some(x), Some(y)) => x != y
              case _ => false
            }
          case _ => false
        }
        if (hasEqui) j
        else findRange(conjuncts, left, right) match {
          case Some((point, lo, hi, pointOnLeft))
              if explodableSideAllowed(joinType, pointOnLeft) =>
            val bits = bucketBits
            val rangeChild = if (pointOnLeft) right else left
            val bucket = AttributeReference("__range_bucket", point.dataType)()
            val gen = Generate(
              // timeZoneId must be set: Sequence is TimeZoneAware and stays
              // unresolved without it (plan validation rejects the rewrite).
              Explode(Sequence(
                ShiftRight(lo, Literal(bits)), ShiftRight(hi, Literal(bits)),
                None, Some(conf.sessionLocalTimeZone))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(bucket), child = rangeChild)
            val newCond = And(EqualTo(ShiftRight(point, Literal(bits)), bucket), cond)
            if (pointOnLeft) Join(left, gen, joinType, Some(newCond), hint)
            else Join(gen, right, joinType, Some(newCond), hint)
          case _ => j
        }
    }

  private def rewritable(t: JoinType): Boolean = t match {
    case Inner | LeftSemi | LeftAnti | LeftOuter | RightOuter => true
    case _ => false
  }

  /** The exploded (range) side must not be a preserved outer side. */
  private def explodableSideAllowed(t: JoinType, pointOnLeft: Boolean): Boolean =
    t match {
      case Inner => true
      case LeftSemi | LeftAnti | LeftOuter => pointOnLeft // ranges on right
      case RightOuter => !pointOnLeft // ranges on left
      case _ => false
    }

  /** Find (point, lo, hi, pointOnLeft): a lower and an upper bound on the
    * same point expression from one side, bounds from the other, all
    * same-typed integrals. */
  private def findRange(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    val lowers = conjuncts.flatMap(boundOf(_, lower = true))
    val uppers = conjuncts.flatMap(boundOf(_, lower = false))
    (for {
      (p1, lo) <- lowers
      (p2, hi) <- uppers
      if p1.semanticEquals(p2) && integral(p1) &&
        lo.dataType == p1.dataType && hi.dataType == p1.dataType
      pSide <- sideOf(p1, left, right)
      loSide <- sideOf(lo, left, right)
      hiSide <- sideOf(hi, left, right)
      if loSide == hiSide && loSide != pSide
    } yield (p1, lo, hi, pSide)).headOption
  }
}
