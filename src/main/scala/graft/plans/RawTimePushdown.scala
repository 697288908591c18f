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

  private def mirror(p: Expression): Option[Expression] = {
    def us(l: Literal): Long = l.value.asInstanceOf[Long] // TimestampType = micros
    p match {
      case GreaterThanOrEqual(MicrosOfNanos(x), l @ Literal(_, TimestampType)) =>
        Some(GreaterThanOrEqual(x, Literal(us(l) * 1000L - 999L)))
      case GreaterThan(MicrosOfNanos(x), l @ Literal(_, TimestampType)) =>
        Some(GreaterThanOrEqual(x, Literal((us(l) + 1L) * 1000L - 999L)))
      case LessThanOrEqual(MicrosOfNanos(x), l @ Literal(_, TimestampType)) =>
        Some(LessThanOrEqual(x, Literal(us(l) * 1000L + 999L)))
      case LessThan(MicrosOfNanos(x), l @ Literal(_, TimestampType)) =>
        Some(LessThanOrEqual(x, Literal((us(l) - 1L) * 1000L + 999L)))
      case EqualTo(MicrosOfNanos(x), l @ Literal(_, TimestampType)) =>
        Some(And(GreaterThanOrEqual(x, Literal(us(l) * 1000L - 999L)),
          LessThanOrEqual(x, Literal(us(l) * 1000L + 999L))))
      // literal-on-the-left flips
      case GreaterThanOrEqual(l @ Literal(_, TimestampType), MicrosOfNanos(x)) =>
        Some(LessThanOrEqual(x, Literal(us(l) * 1000L + 999L)))
      case LessThanOrEqual(l @ Literal(_, TimestampType), MicrosOfNanos(x)) =>
        Some(GreaterThanOrEqual(x, Literal(us(l) * 1000L - 999L)))
      case GreaterThan(l @ Literal(_, TimestampType), MicrosOfNanos(x)) =>
        Some(LessThanOrEqual(x, Literal((us(l) - 1L) * 1000L + 999L)))
      case LessThan(l @ Literal(_, TimestampType), MicrosOfNanos(x)) =>
        Some(GreaterThanOrEqual(x, Literal((us(l) + 1L) * 1000L - 999L)))
      case _ => None
    }
  }
}
