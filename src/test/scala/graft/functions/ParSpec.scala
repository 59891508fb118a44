package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pin of the gated fanOut (r15): the repartition must fire on
  * under-parallel narrow inputs (the single-split bench fixtures),
  * SKIP on narrow inputs already at ≥ defaultParallelism partitions
  * (the production multi-split scan — `repartition(n)` there is a full
  * payload shuffle that can even coalesce parallelism DOWN), and stay
  * unconditional on non-narrow plans, whose partition count cannot be
  * read without materializing AQE stages.
  */
class ParSpec extends SparkSpec {

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))

  test("fanOut skips the shuffle when a narrow input is already at " +
      ">= defaultParallelism partitions") {
    val target = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 1000, 1, target + 4).toDF("id")
    val out = Par.fanOut(wide)
    assert(out.rdd.getNumPartitions === target + 4)
    assert(exchanges(out) === 0, "no Exchange expected on the gated path")
    // narrow on top of the leaf stays gated too
    val filtered = wide.filter(col("id") % 2 === 0)
      .select(col("id"), (col("id") * 2).as("id2"))
    assert(exchanges(Par.fanOut(filtered)) === 0)
  }

  test("fanOut repartitions an under-parallel narrow input (the " +
      "single-split fixture case)") {
    val target = spark.sparkContext.defaultParallelism
    val slim = spark.range(0, 1000, 1, 1).toDF("id")
    val out = Par.fanOut(slim)
    assert(out.rdd.getNumPartitions === target)
  }

  test("fanOut keeps the unconditional repartition on non-narrow " +
      "plans (their width is not readable without running stages)") {
    val target = spark.sparkContext.defaultParallelism
    val agged = spark.range(0, 1000, 1, target + 4).toDF("id")
      .groupBy((col("id") % 10).as("k")).agg(count(lit(1)).as("n"))
    val out = Par.fanOut(agged)
    // the plan must contain the round-robin exchange fanOut adds
    assert(out.queryExecution.analyzed.toString
      .contains("Repartition"))
  }

  test("fanOut preserves rows and schema either way") {
    val target = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 100, 1, target + 1).toDF("id")
    val slim = spark.range(0, 100, 1, 1).toDF("id")
    assert(Par.fanOut(wide).collect().map(_.getLong(0)).sorted.toSeq ===
      (0L until 100L))
    assert(Par.fanOut(slim).collect().map(_.getLong(0)).sorted.toSeq ===
      (0L until 100L))
  }
}
