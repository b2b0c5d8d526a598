package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DateType, DoubleType, LongType, NumericType, TimestampType}

/** Optimizer rule: rewrite a pure point-in-interval INNER join
  * (`p >= lo AND p <= hi`, no equi conjunct) into the binned equi-join
  * of `graft.operators.IntervalJoin` — the declarative-API operator,
  * but applied automatically so `spark.sql("... ON p BETWEEN lo AND
  * hi")` and third-party DataFrame code get the scale path too.
  *
  * Without this rewrite Catalyst can only plan such a join as a
  * (Broadcast)NestedLoop — quadratic per executor once both sides are
  * fact-sized. The rewrite bins the axis (floor(x / w)), replicates
  * each interval to the bins it overlaps via `explode(sequence(...))`,
  * equi-joins on the bin, and re-applies the original predicate as a
  * partition-local residual filter. Every matching pair meets in
  * exactly one bin (the point's), so no dedup is needed and row
  * multiplicity is preserved.
  *
  * OPT-IN by design: a silent plan rewrite must never surprise a user,
  * so the rule is inert until `spark.graft.intervalJoin.binWidth` is
  * set to a positive width (in the axis column's natural units).
  * Registered through `GraftExtensions` (injectOptimizerRule); specs
  * exercise it via `spark.experimental.extraOptimizations`.
  */
case class BinnedIntervalJoinRule(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.intervalJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = session.conf.get(WidthConf, "0").toLong
    if (width <= 0) plan
    else plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint) if j.resolved =>
        // the point may live on either side; output column order is
        // preserved by the final Project either way
        matchRange(l, r, cond) match {
          case Some((p, lo, hi)) => rewrite(l, r, p, lo, hi, cond, hint, width)
          case None => matchRange(r, l, cond) match {
            case Some((p, lo, hi)) =>
              Project(l.output ++ r.output,
                rewrite(r, l, p, lo, hi, cond, hint, width))
            case None => j
          }
        }
    }
  }

  /** The join qualifies iff its condition is EXACTLY two conjuncts
    * forming lo <= p <= hi with the point on one side and both bounds
    * on the other, all on a binnable axis (numeric, date, or
    * timestamp — comparison coercion has already aligned the three to
    * one type by the time the optimizer sees them). Any equi conjunct
    * means Catalyst already has a hash-join key and the rewrite would
    * only add cost. */
  private def matchRange(l: LogicalPlan, r: LogicalPlan,
                         cond: Expression): Option[(Expression, Expression, Expression)] = {
    def numeric(e: Expression) = binnable(e.dataType)
    def fromL(e: Expression) = e.references.subsetOf(l.outputSet) && numeric(e)
    def fromR(e: Expression) = e.references.subsetOf(r.outputSet) && numeric(e)

    splitConjunctivePredicates(cond) match {
      case Seq(c1, c2) =>
        // normalize both conjuncts to (small <= big)
        def le(c: Expression): Option[(Expression, Expression)] = c match {
          case LessThanOrEqual(a, b) => Some((a, b))
          case GreaterThanOrEqual(a, b) => Some((b, a))
          case _ => None
        }
        (le(c1), le(c2)) match {
          // lo <= p  AND  p <= hi, point from left, bounds from right
          case (Some((lo, p1)), Some((p2, hi)))
              if p1.semanticEquals(p2) && fromL(p1) && fromR(lo) && fromR(hi) =>
            Some((p1, lo, hi))
          case (Some((p1, hi)), Some((lo, p2)))
              if p1.semanticEquals(p2) && fromL(p2) && fromR(lo) && fromR(hi) =>
            Some((p1, lo, hi))
          case _ => None
        }
      case _ => None
    }
  }

  private def binnable(dt: DataType): Boolean = dt match {
    case _: NumericType | DateType | TimestampType => true
    case _ => false
  }

  /** Temporal axes discretize on their natural integer grain — DAYS for
    * dates, SECONDS for timestamps (same convention as the declarative
    * `IntervalJoin.pointInInterval`), so `binWidth` keeps one meaning
    * across the SQL and DataFrame surfaces. */
  private def toLongAxis(e: Expression): Expression = e.dataType match {
    case DateType => Cast(UnixDate(e), LongType)
    case TimestampType => UnixSeconds(e)
    case _ => e
  }

  /** floor(x / width) — via double division, exact for |x| < 2^53
    * (epoch seconds/millis and harness keys are far below). */
  private def bin(x: Expression, width: Long): Expression =
    Floor(Divide(Cast(toLongAxis(x), DoubleType), Literal(width.toDouble)))

  private def rewrite(l: LogicalPlan, r: LogicalPlan, p: Expression,
                      lo: Expression, hi: Expression, cond: Expression,
                      hint: JoinHint, width: Long): LogicalPlan = {
    val binL = Alias(bin(p, width), "__graft_bin_p")()
    val newL = Project(l.output :+ binL, l)

    // Sequence is TimeZoneAwareExpression: analyzer-side ResolveTimeZone
    // never sees optimizer-injected expressions, so set the tz here or
    // the plan flips back to unresolved
    val gen = Explode(new Sequence(bin(lo, width), bin(hi, width))
      .withTimeZone(conf.sessionLocalTimeZone))
    // Generate.resolved demands the output attribute mirror the
    // generator's element schema exactly (type AND nullability)
    val elem = gen.elementSchema.fields.head
    val binR = AttributeReference("__graft_bin_i", elem.dataType, elem.nullable)()
    val newR = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(binR), child = r)

    val joined = Join(newL, newR, Inner,
      Some(EqualTo(binL.toAttribute, binR)), hint)
    // original condition re-applied partition-locally; bins projected away
    Project(l.output ++ r.output, Filter(cond, joined))
  }
}
