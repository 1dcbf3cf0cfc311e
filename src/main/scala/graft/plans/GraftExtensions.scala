package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.{HintInfo, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.logical.BROADCAST
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Catalyst extension surface (SURVEY.md §7.3 preference (c)): a
  * `Rule[LogicalPlan]` injected via `SparkSessionExtensions`.
  *
  * BroadcastDimsRule encodes catalog knowledge Spark's size estimator
  * doesn't have: the tables in [[graft.sources.Tables.broadcastable]]
  * are dimension tables by CONSTRUCTION (region/nation/supplier are
  * bounded by the data model, not just small today), so any join
  * against them should broadcast that side regardless of the session's
  * autoBroadcastJoinThreshold — e.g. when an operator pipeline disables
  * auto-broadcast for a skew-sensitive stage, dimension joins must not
  * silently degrade to sort-merge. The rule sets the join's `JoinHint`
  * (what JoinSelection actually consults) when every leaf of a side is
  * a file scan of a broadcastable table and no explicit hint exists.
  */
case class BroadcastDimsRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def isDimScan(plan: LogicalPlan): Boolean = {
    val leaves = plan.collectLeaves()
    leaves.nonEmpty && leaves.forall {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.forall { p =>
          val name = p.getName
          graft.sources.Tables.broadcastable.exists(t => name == s"$t.parquet" || name == t)
        }
        case _ => false
      }
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, _, _, hint) =>
      val lh = hint.leftHint.orElse(
        if (isDimScan(left)) Some(HintInfo(strategy = Some(BROADCAST))) else None)
      val rh = hint.rightHint.orElse(
        if (isDimScan(right)) Some(HintInfo(strategy = Some(BROADCAST))) else None)
      if ((lh eq hint.leftHint) && (rh eq hint.rightHint)) j
      else j.copy(hint = JoinHint(lh, rh))
  }
}

/** Register with
  * `SparkSession.builder().withExtensions(GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(BroadcastDimsRule)
}

object GraftExtensions extends GraftExtensions
