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
          // the self-guards that keep fixpoint iterations from
          // stacking: never rewrite our own phase-1 window (its alias
          // IS LocalRn), never re-split a window that is ALREADY a
          // local phase (its partition spec carries a per-input-
          // partition id — ours or the declarative GroupedTopK's),
          // and never re-split a final window whose child is already
          // the survivors shape
          if w.resolved && rnAlias.name != LocalRn &&
            !isLocalPhase(rnAlias.name, ps) &&
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

  /** The declarative two-phase operator's phase-1 naming
    * (GroupedTopK.topK): its local rank alias and partition-id column.
    * The rule must treat GroupedTopK plans as already two-phase — the
    * session-wide posture runs this rule over EVERY registered query,
    * and re-splitting an already-localized rank only stacks windows
    * (caught by the q130/q141/q150 plan audits when the rule first
    * went session-wide). */
  private val GroupedTopKRn = "__lrn"
  private val PidNames = Set("__pid", "__graft_pid")

  /** A window whose partition spec already includes a per-input-
    * partition id IS a local phase — ours or the declarative one. */
  private def isLocalPhase(rnName: String, ps: Seq[Expression]): Boolean =
    rnName == GroupedTopKRn || ps.exists {
      case a: Attribute => PidNames(a.name)
      case _ => false
    }

  /** The survivors shape of EITHER two-phase form (this rule's or
    * GroupedTopK's) — the guard that keeps the rule idempotent across
    * fixpoint iterations and away from final windows that already
    * rank pruned survivors. Descends ONLY through the pass-through
    * shapes that can sit between the final window and its local phase:
    * Project (column pruning), Filter (the local rank cut), and
    * WindowGroupLimit (Spark's own InferWindowGroupLimit inserts one
    * below a rank-filtered window MID-fixpoint — without descending
    * through it, the injected copy of this rule re-split its own final
    * window on the next iteration). */
  @annotation.tailrec
  private def alreadyRewritten(child: LogicalPlan): Boolean = child match {
    case Window(Seq(Alias(_, n)), ps, _, _, _) =>
      n == LocalRn || n == GroupedTopKRn || ps.exists {
        case a: Attribute => PidNames(a.name)
        case _ => false
      }
    case p: Project => alreadyRewritten(p.child)
    case f: Filter => alreadyRewritten(f.child)
    case w: WindowGroupLimit => alreadyRewritten(w.child)
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
