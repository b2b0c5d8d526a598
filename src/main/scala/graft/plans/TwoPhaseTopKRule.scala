package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the per-group top-k idiom
  * `row_number() OVER (PARTITION BY g ORDER BY o) ≤ k` into the
  * two-phase form of `graft.operators.GroupedTopK` — a local
  * per-(group, input-partition) rank that prunes to ≤ k survivors per
  * partition BEFORE the shuffle, then the exact final window over the
  * survivors. The naive plan funnels every row of a group through ONE
  * reducer; when groups are few and huge (per-probe ANN ranking,
  * per-language sampling) that single window IS the scale bottleneck.
  * The rewrite is answer-preserving for the same reason GroupedTopK
  * is: any group's global top-k is a subset of the union of its
  * per-partition top-ks under ANY partitioning. (Under order ties the
  * naive row_number is already partition-order nondeterministic; the
  * rewrite picks among the same tied candidates — the GroupedTopK
  * total-order caveat applies identically.)
  *
  * OPT-IN like [[BinnedIntervalJoinRule]]: inert until
  * `spark.graft.topk.twoPhase` is `true`. `spark.graft.topk.maxK`
  * (default 1000) bounds the k the rewrite fires for — survivors are
  * k × input-partitions rows, so an unbounded k would trade the
  * reducer funnel for a survivor explosion.
  *
  * Matched shape: Filter(rn ≤ k | rn < k | rn = k, Window(Seq(rn :=
  * row_number() OVER spec), ...)) where the window computes EXACTLY
  * the row_number and the filter compares it to an integer literal.
  * The rewrite keeps the original Window (same exprIds) as the final
  * exact rank, so downstream references resolve unchanged.
  */
case class TwoPhaseTopKRule(session: SparkSession) extends Rule[LogicalPlan] {

  val EnabledConf = "spark.graft.topk.twoPhase"
  val MaxKConf = "spark.graft.topk.maxK"
  private val LocalRn = "__graft_lrn"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (session.conf.get(EnabledConf, "false") != "true") return plan
    val maxK = session.conf.get(MaxKConf, "1000").toLong
    plan.transformUp {
      case f @ Filter(cond,
          w @ Window(Seq(rnAlias @ Alias(
            we @ WindowExpression(_: RowNumber, spec), _)), ps, os, child, _))
          // the two self-guards that keep fixpoint iterations from
          // stacking: never rewrite our own phase-1 window (its alias
          // IS LocalRn) and never re-split a final window whose child
          // is already the survivors shape
          if w.resolved && rnAlias.name != LocalRn &&
            !alreadyRewritten(child) =>
        boundOf(cond, rnAlias.toAttribute) match {
          case Some(k) if k > 0 && k <= maxK =>
            // phase 0: materialize the input partition id as a column
            val pidAlias = Alias(SparkPartitionID(), "__graft_pid")()
            val withPid = Project(child.output :+ pidAlias, child)
            // phase 1: local rank within (group, input partition) — at
            // most k rows per (group, partition) survive the filter,
            // and nothing has shuffled yet
            val localSpec = spec.copy(
              partitionSpec = spec.partitionSpec :+ pidAlias.toAttribute)
            val lrnAlias = Alias(we.copy(windowSpec = localSpec), LocalRn)()
            val w1 = Window(Seq(lrnAlias),
              ps :+ pidAlias.toAttribute, os, withPid, None)
            val f1 = Filter(
              LessThanOrEqual(lrnAlias.toAttribute, Literal(k.toInt)), w1)
            val survivors = Project(child.output, f1)
            // phase 2: the ORIGINAL window + filter over the survivors
            // — exact ranks, same exprIds, schema unchanged
            Filter(cond, w.copy(child = survivors))
          case _ => f
        }
    }
  }

  /** The rewrite's own final shape — the guard that keeps the rule
    * idempotent across fixpoint iterations. */
  private def alreadyRewritten(child: LogicalPlan): Boolean = child match {
    case Project(_, Filter(_, Window(Seq(Alias(_, LocalRn)), _, _, _, _))) => true
    case _ => false
  }

  /** k such that the filter keeps exactly ranks ≤ k (rn ≤ k, rn < k+1,
    * rn = k all prune identically when the ORIGINAL filter is
    * re-applied after the exact rank). */
  private def boundOf(cond: Expression, rn: Attribute): Option[Long] = {
    def lit(e: Expression): Option[Long] = e match {
      case Literal(v: Int, _) => Some(v.toLong)
      case Literal(v: Long, _) => Some(v)
      case _ => None
    }
    cond match {
      case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(rn) => lit(l)
      case LessThan(a: Attribute, l) if a.semanticEquals(rn) => lit(l).map(_ - 1)
      case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(rn) => lit(l)
      case GreaterThan(l, a: Attribute) if a.semanticEquals(rn) => lit(l).map(_ - 1)
      case EqualTo(a: Attribute, l) if a.semanticEquals(rn) => lit(l)
      case EqualTo(l, a: Attribute) if a.semanticEquals(rn) => lit(l)
      case _ => None
    }
  }
}
