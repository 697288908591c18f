package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

/** Optimizer rule: comparisons against a micros-truncated nanos timestamp
  * (`timestamp_micros(x div 1000)`, the entry-view `time` column) are
  * mirrored as predicates on the raw nanos expression `x`, which — being a
  * plain source column — reaches the Parquet scan and prunes row groups.
  * A filter on the derived timestamp alone never pushes down.
  *
  * Runs after projection collapse, so it matches the inlined form the main
  * optimizer produces. `div` truncates toward ZERO, so for negative raw
  * values trunc(x/1000) can round UP — the mirrored bounds are widened by
  * 999ns on the open side to stay implied by the original predicate for
  * either sign (the original filter still applies exactly; the mirror only
  * needs to never exclude a row the original keeps):
  *   time >= T ⟹ x >= T*1000 - 999    time > T ⟹ x >= (T+1)*1000 - 999
  *   time <= T ⟹ x <= T*1000 + 999    time < T ⟹ x <= (T-1)*1000 + 999
  *   time = T  ⟹ T*1000 - 999 <= x <= T*1000 + 999
  *
  * Installed by [[graft.functions.GraftExtensions]] (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations`. The FQL compiler adds raw
  * predicates itself; semantic-equality dedup keeps this rule idempotent
  * alongside it.
  */
object RawTimePushdown extends Rule[LogicalPlan] {

  /** Matches `timestamp_micros(x div 1000)` → x (the raw nanos expr). */
  private object MicrosOfNanos {
    def unapply(e: Expression): Option[Expression] = e match {
      case m: MicrosToTimestamp => m.child match {
        case d: IntegralDivide if isThousand(d.right) => Some(d.left)
        case _ => None
      }
      case _ => None
    }
    private def isThousand(e: Expression): Boolean = e match {
      case Literal(v: Long, _) => v == 1000L
      case Literal(v: Int, _) => v == 1000
      case c: Cast => isThousand(c.child)
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val extra = conjuncts
        .flatMap(mirror)
        .filterNot(m => conjuncts.exists(_.semanticEquals(m)))
      if (extra.isEmpty) f
      else Filter(extra.foldLeft(cond)(And), child)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Mirrored conjuncts for one predicate — a LIST so EqualTo's two bounds
    * stay separate conjuncts: a fused And(ge, le) would be split right back
    * apart by splitConjuncts on the optimizer's next fixed-point iteration,
    * the semantic-equality dedup (which compares whole conjuncts) would
    * never match it, and the batch would re-add it forever (non-convergence
    * → maxIterations warning, duplicated predicates, and a hard failure
    * under spark.testing). */
  private def mirror(p: Expression): Seq[Expression] = {
    def us(l: Literal): Long = l.value.asInstanceOf[Long] // TimestampType = micros
    // saturating µs→ns: timestamp literals outside ±292 years of 1970
    // (years ~1677-2262) exceed Long nanos; a plain * 1000 WRAPS and the
    // mirrored bound silently excludes valid rows. Saturated bounds stay
    // implied by the original predicate (every stored raw-nanos value is a
    // representable Long, so `x >= Long.Max`/`x <= Long.Min` can only drop
    // rows the exact original filter drops too).
    def ns(usVal: Long): Long =
      if (usVal > Long.MaxValue / 1000L) Long.MaxValue
      else if (usVal < Long.MinValue / 1000L) Long.MinValue
      else usVal * 1000L
    def nsLo(usVal: Long): Long = { val n = ns(usVal); if (n <= Long.MinValue + 999L) Long.MinValue else n - 999L }
    def nsHi(usVal: Long): Long = { val n = ns(usVal); if (n >= Long.MaxValue - 999L) Long.MaxValue else n + 999L }
    def usP1(l: Literal): Long = { val u = us(l); if (u == Long.MaxValue) u else u + 1L }
    def usM1(l: Literal): Long = { val u = us(l); if (u == Long.MinValue) u else u - 1L }
    p match {
      case GreaterThanOrEqual(MicrosOfNanos(x), l @ Literal(_, TimestampType)) =>
        Seq(GreaterThanOrEqual(x, Literal(nsLo(us(l)))))
      case GreaterThan(MicrosOfNanos(x), l @ Literal(_, TimestampType)) =>
        Seq(GreaterThanOrEqual(x, Literal(nsLo(usP1(l)))))
      case LessThanOrEqual(MicrosOfNanos(x), l @ Literal(_, TimestampType)) =>
        Seq(LessThanOrEqual(x, Literal(nsHi(us(l)))))
      case LessThan(MicrosOfNanos(x), l @ Literal(_, TimestampType)) =>
        Seq(LessThanOrEqual(x, Literal(nsHi(usM1(l)))))
      case EqualTo(MicrosOfNanos(x), l @ Literal(_, TimestampType)) =>
        Seq(GreaterThanOrEqual(x, Literal(nsLo(us(l)))),
          LessThanOrEqual(x, Literal(nsHi(us(l)))))
      // literal-on-the-left flips
      case GreaterThanOrEqual(l @ Literal(_, TimestampType), MicrosOfNanos(x)) =>
        Seq(LessThanOrEqual(x, Literal(nsHi(us(l)))))
      case LessThanOrEqual(l @ Literal(_, TimestampType), MicrosOfNanos(x)) =>
        Seq(GreaterThanOrEqual(x, Literal(nsLo(us(l)))))
      case GreaterThan(l @ Literal(_, TimestampType), MicrosOfNanos(x)) =>
        Seq(LessThanOrEqual(x, Literal(nsHi(usM1(l)))))
      case LessThan(l @ Literal(_, TimestampType), MicrosOfNanos(x)) =>
        Seq(GreaterThanOrEqual(x, Literal(nsLo(usP1(l)))))
      case _ => Seq.empty
    }
  }
}
