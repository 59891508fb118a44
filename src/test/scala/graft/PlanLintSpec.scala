package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Plan lint over EVERY registry query: physical plans must never
  * contain the two shapes that silently stop scaling —
  *
  *  - a window with no partitioning (all rows funnel to one task;
  *    the "WindowExec: No Partition Defined" warning), and
  *  - a cartesian product (candidate generation must always be an
  *    equi-join).
  *
  * This is the automated form of the per-operator `.explain` audit:
  * a future query or rewrite that reintroduces either shape fails CI
  * instead of surfacing as a bench warning. Subquery plans are
  * traversed too. Known blind spot: plans a query builder EXECUTES
  * while constructing its result (`localCheckpoint`/`isEmpty` inside
  * Dedup.clusters' iteration, Paging's lazy checkpoint) are replaced
  * by RDD scans before the lint sees them — those interior shapes are
  * covered by their operators' own specs, not this lint.
  */
class PlanLintSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case _ => Nil
    }
    val subs = p.subqueries.flatMap(flatten)
    (p +: p.children.flatMap(flatten)) ++ inner ++ subs
  }

  SparkEntry.registry.foreach { q =>
    test(s"plan lint: ${q.name}") {
      val plan = q.fn(spark, sf).queryExecution.executedPlan
      val nodes = flatten(plan)
      val globalWindows = nodes.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w.nodeName
      }
      assert(globalWindows.isEmpty,
        s"${q.name} plans a global single-partition window")
      val cartesians = nodes.collect {
        case c: CartesianProductExec => c.nodeName
      }
      assert(cartesians.isEmpty, s"${q.name} plans a cartesian product")
    }
  }
}
