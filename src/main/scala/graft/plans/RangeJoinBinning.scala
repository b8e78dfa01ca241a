package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DayTimeIntervalType, LongType}

/** Optimizer extension: automatic range-join binning.
  *
  * A join whose condition bounds one side's timestamp to a constant
  * window of the other's — `probe >= start AND probe < start + C` —
  * carries no equi-key for the interval, so Spark can only evaluate the
  * time bound AFTER pairing rows on whatever equality keys remain (or,
  * with none, as a nested loop). One hot equality key is then a full
  * per-key cross product no matter how far apart in time its rows are:
  * the k07 pattern, hand-written there, automated here.
  *
  * The rewrite quantizes time into C-sized buckets, explodes the START
  * side into its own and the next bucket (a probe inside [start,
  * start+C) can only land in those two — the same two-bucket argument
  * k07's scaladoc spells out), and conjoins an equi-predicate on the
  * bucket. The planner then extracts (…, bucket) as join keys, so the
  * shuffle co-locates only temporally adjacent rows; the original
  * condition stays in place as the post-join filter, which is what
  * makes the rewrite semantics-preserving row for row (the same
  * argument as Databricks' range-join binning hint, here as a
  * `Rule[LogicalPlan]`).
  *
  * Scope guards, each load-bearing:
  *  - OFF by default; enabled per session via `spark.graft.
  *    rangeJoinBinning=true` (SQLConf-scoped, read at optimize time).
  *    An automatic plan rewrite must be opt-in-able per workload, and
  *    the flag is what lets the spec compare both plans.
  *  - inner joins only; the exploded start side changes row
  *    multiplicity BEFORE the join, which an outer join's
  *    null-extension would observe.
  *  - batch only (`isStreaming` bails): stream-stream joins derive
  *    their state-eviction analysis from the original condition shape.
  *  - whole-second positive intervals only (bucket arithmetic runs on
  *    the floor-seconds cast; sub-second windows would need micro
  *    buckets).
  *  - the bucket column name is the re-entry guard: a join whose
  *    condition already references it was rewritten in a previous
  *    fixed-point pass.
  */
object RangeJoinBinning extends Rule[LogicalPlan] {
  val confKey = "spark.graft.rangeJoinBinning"
  private val binName = "__graft_bin"

  private def enabled: Boolean =
    SQLConf.get.getConfString(confKey, "false").toBoolean

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case other => Seq(other)
  }

  /** `t + <literal day-time interval>` as the analyzer resolves it
    * (TimestampAddInterval since Spark 4) → (t, interval micros). */
  private object PlusInterval {
    def unapply(e: Expression): Option[(Expression, Long)] = e match {
      case TimestampAddInterval(t,
          Literal(us: Long, _: DayTimeIntervalType), _) => Some((t, us))
      case _ => None
    }
  }

  /** floor(epoch-seconds / gap) — sign-correct for pre-1970 data:
    * the timestamp→long cast floors micros to seconds, and
    * (sec - pmod(sec, g)) is an exact multiple of g, so the integral
    * divide never rounds. */
  private def bucket(t: Expression, gapSec: Long): Expression = {
    val sec = Cast(t, LongType)
    val g = Literal(gapSec)
    IntegralDivide(Subtract(sec, Pmod(sec, g)), g)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !j.isStreaming &&
            !cond.references.exists(_.name == binName) =>
        val conj = splitConj(cond)
        val upper = conj.collectFirst {
          case LessThan(p: AttributeReference,
              PlusInterval(s: AttributeReference, us)) => (p, s, us)
          case GreaterThan(PlusInterval(s: AttributeReference, us),
              p: AttributeReference) => (p, s, us)
        }
        val bounded = upper.filter { case (p, s, _) =>
          conj.exists {
            case GreaterThanOrEqual(p2, s2) =>
              p2.semanticEquals(p) && s2.semanticEquals(s)
            case LessThanOrEqual(s2, p2) =>
              p2.semanticEquals(p) && s2.semanticEquals(s)
            case _ => false
          }
        }
        bounded match {
          case Some((p, s, us)) if us >= 1000000L && us % 1000000L == 0L =>
            val g = us / 1000000L
            val jb = AttributeReference(binName, LongType)()
            def explodedBins(start: Expression, child: LogicalPlan) = {
              val b = bucket(start, g)
              Generate(
                Explode(CreateArray(Seq(b, Add(b, Literal(1L))))),
                Nil, outer = false, None, Seq(jb), child)
            }
            if (left.outputSet.contains(s) && right.outputSet.contains(p))
              Project(j.output, Join(explodedBins(s, left), right, Inner,
                Some(And(cond, EqualTo(jb, bucket(p, g)))), hint))
            else if (right.outputSet.contains(s) &&
                left.outputSet.contains(p))
              Project(j.output, Join(left, explodedBins(s, right), Inner,
                Some(And(cond, EqualTo(bucket(p, g), jb))), hint))
            else j
          case _ => j
        }
    }
  }
}
