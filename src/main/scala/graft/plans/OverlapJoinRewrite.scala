package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: turn a pure interval-OVERLAP join
  *
  * {{{ a JOIN b ON a.start <= b.end AND b.start <= a.end }}}
  *
  * into a bucketed hash equi-join ([[RangeJoinRewrite]]'s sibling for the
  * interval × interval case — that rule handles point × interval). Without
  * an equi key Spark can only plan a (Broadcast)NestedLoopJoin over
  * |a| × |b| pairs. Here BOTH sides explode into the 2^bits-wide buckets
  * their interval spans and candidates meet on bucket equality; each
  * originally-matching pair is kept EXACTLY ONCE by the first-shared-
  * bucket conjunct `bucket == greatest(minBucket_a, minBucket_b)` (both
  * bucket lists are contiguous, so the larger of the two minimums is the
  * unique first shared bucket). The original predicate stays in the
  * condition and prunes false bucket collisions, so the rewrite never
  * changes the result, only the plan.
  *
  * "Inverted" rows (start > end) still participate exactly as in the
  * original join: the predicate `aS <= bE AND bS <= aE` holds iff the
  * NORMALIZED intervals [min(s,e), max(s,e)] intersect (if they don't,
  * one of the two conjuncts is violated — the bucket lists are built
  * from least/greatest, so such rows explode and match correctly rather
  * than being dropped). NULL bounds match nothing in the original join;
  * the guard yields a NULL bucket list and the non-outer Generate drops
  * the row — same result under Inner.
  *
  * Applied only to Inner joins (both sides explode, so no side's
  * multiplicity may be "preserved"; semi/outer variants would duplicate
  * or drop preserved rows), with no existing cross-side equality
  * conjunct, on deterministic same-typed int/long bounds.
  *
  * KNOWN BEHAVIORAL TRADE-OFF: the pattern matches any Inner join whose
  * condition carries two opposite cross-side integral inequalities —
  * including a generic theta join over four unrelated columns, which is
  * semantically an overlap of the two (possibly inverted, hence the
  * least/greatest normalization) "intervals" those columns span. The
  * rewrite is always RESULT-correct for such queries, but rows whose
  * normalized span exceeds `maxBucketsPerInterval` buckets hit the
  * in-plan guard and fail loudly where the nested-loop plan would have
  * (slowly) succeeded. This is deliberate: at the scale this library
  * targets, the BNLJ over unrelated wide-range columns IS the failure,
  * and a conf-named error beats an unkillable O(|a|·|b|) stage. Escape
  * hatches, in preference order: raise
  * spark.graft.overlapJoin.bucketBits (wider buckets, fewer per row),
  * raise maxBucketsPerInterval, or set
  * spark.graft.overlapJoin.enabled=false for the session.
  *
  * Tuning: spark.graft.overlapJoin.enabled (default true),
  * spark.graft.overlapJoin.bucketBits (default 16),
  * spark.graft.overlapJoin.maxBucketsPerInterval (default 4096) — the
  * replication guard raises a conf-named error for pathologically wide
  * intervals instead of an opaque Sequence overflow, exactly like the
  * range-join rule.
  */
object OverlapJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.overlapJoin.enabled", "true").toBoolean
  // Default 2^12 bucket units: for epoch-SECOND bounds (the common case
  // in this engine's session/event data) that is ~68-minute buckets —
  // near typical session/outage lengths, so most intervals explode to
  // 1-2 buckets while false bucket collisions stay low. 2^16 buckets
  // (~18 h at second resolution) made every same-day interval a
  // candidate pair: measurably slower on the session-overlap parity
  // query with zero pruning benefit. Milli/micro-resolution users should
  // raise bucketBits accordingly (and the guard scales with it).
  private def bucketBits: Int =
    math.min(math.max(
      conf.getConfString("spark.graft.overlapJoin.bucketBits", "12").toInt, 2), 62)
  private def maxBuckets: Long =
    conf.getConfString("spark.graft.overlapJoin.maxBucketsPerInterval", "4096").toLong

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** (p, q) such that c is `p <= q` (or `p < q`), in either written
    * direction. */
  private def leOf(c: Expression): Option[(Expression, Expression)] = c match {
    case LessThanOrEqual(p, q) => Some((p, q))
    case LessThan(p, q) => Some((p, q))
    case GreaterThanOrEqual(q, p) => Some((p, q))
    case GreaterThan(q, p) => Some((p, q))
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
      case j @ Join(left, right, Inner, Some(cond), hint) =>
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
        else findOverlap(conjuncts, left, right) match {
          case Some((aS, aE, bS, bE)) =>
            val bits = bucketBits
            val aMin = Least(Seq(aS, aE))
            val aMax = Greatest(Seq(aS, aE))
            val bMin = Least(Seq(bS, bE))
            val bMax = Greatest(Seq(bS, bE))
            val bucketA = AttributeReference("__ov_bucket_a", aS.dataType)()
            val bucketB = AttributeReference("__ov_bucket_b", aS.dataType)()
            val genA = Generate(Explode(guardedSeq(aMin, aMax, bits)),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(bucketA), child = left)
            val genB = Generate(Explode(guardedSeq(bMin, bMax, bits)),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(bucketB), child = right)
            val firstShared = Greatest(Seq(
              ShiftRight(aMin, Literal(bits)), ShiftRight(bMin, Literal(bits))))
            val newCond = And(EqualTo(bucketA, bucketB),
              And(EqualTo(bucketA, firstShared), cond))
            // Output-preserving: the bucket attributes never leak upward.
            Project(j.output, Join(genA, genB, Inner, Some(newCond), hint))
          case None => j
        }
    }

  /** Guarded contiguous bucket list [lo >> bits .. hi >> bits]; NULL
    * bounds generate nothing, over-wide intervals fail with a conf-named
    * error (see [[RangeJoinRewrite]] — same contract). lo <= hi by
    * construction (least/greatest), so span >= 1 when non-NULL. */
  private def guardedSeq(lo: Expression, hi: Expression, bits: Int): Expression = {
    val loB = ShiftRight(lo, Literal(bits))
    val hiB = ShiftRight(hi, Literal(bits))
    val seq = Sequence(loB, hiB, None, Some(conf.sessionLocalTimeZone))
    val span = Add(
      Subtract(Cast(hiB, LongType), Cast(loB, LongType)), Literal(1L))
    CaseWhen(Seq(
      (IsNull(span), Literal.create(null, seq.dataType)),
      (LessThanOrEqual(span, Literal(maxBuckets)), seq)),
      Cast(new RaiseError(Literal(
        "graft overlap-join rewrite: an interval row spans more than " +
          s"spark.graft.overlapJoin.maxBucketsPerInterval=$maxBuckets " +
          s"buckets at bucketBits=$bits; raise maxBucketsPerInterval or " +
          "bucketBits, or set spark.graft.overlapJoin.enabled=false")),
        seq.dataType))
  }

  /** Find (aStart, aEnd, bStart, bEnd): two cross-side `<=` conjuncts of
    * opposite orientation — left-expr ≤ right-expr and right-expr ≤
    * left-expr — over deterministic same-typed integral expressions. */
  private def findOverlap(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Expression)] = {
    val les = conjuncts.flatMap(leOf)
    val sided = les.flatMap { case (p, q) =>
      for {
        ps <- sideOf(p, left, right)
        qs <- sideOf(q, left, right)
        if ps != qs && integral(p) && p.dataType == q.dataType
      } yield (p, q, ps)
    }
    (for {
      (aS, bEnd, pl) <- sided if pl // a.start <= b.end
      (bS, aEnd, pr) <- sided if !pr // b.start <= a.end
      if aS.dataType == bS.dataType
    } yield (aS, aEnd, bS, bEnd)).headOption
  }
}
