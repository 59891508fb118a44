package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, Project}

/** Input-parallelism spreading, shared by the operator modules. */
object Par {

  /** Spread a (possibly single-split) input across the cluster before
    * CPU-heavy per-row work (hashing / shingling / vector math dwarfs
    * the shuffle of the raw rows), GATED on the input's actual scan
    * parallelism (r15): `repartition(n)` always shuffles every row,
    * and on a real cluster whose scans already arrive with ≥
    * defaultParallelism splits it would pay a full shuffle of the
    * payload for nothing — or actively COALESCE parallelism down
    * (guide §2.4, the "repartition someone added for parallelism"
    * accidental exchange). When the input plan is narrow — a leaf scan
    * plus at most filters/projections, never an exchange — its
    * physical partition count is read (plain planning, no job: a
    * narrow plan gets no AQE wrapper, so `toRdd` stays lazy) and the
    * shuffle is SKIPPED when the scan is already parallel enough.
    * Non-narrow inputs keep the unconditional repartition: counting
    * their partitions under AQE would materialize upstream stages at
    * plan-build time.
    *
    * On the single-split bench fixtures the gate never fires (1
    * partition < defaultParallelism), so measured plans and timings
    * are unchanged; on production multi-split scans the repartition
    * disappears from the plan. Results are partitioning-independent
    * either way.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val narrow = df.queryExecution.optimizedPlan.collectFirst {
      case p if !p.isInstanceOf[LeafNode] && !p.isInstanceOf[Filter] &&
          !p.isInstanceOf[Project] => p
    }.isEmpty
    val wideEnough = narrow && scala.util.Try(
      df.queryExecution.toRdd.getNumPartitions).toOption
      .exists(_ >= target)
    if (wideEnough) df else df.repartition(target)
  }
}
