package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Adversarial-key-distribution coverage for the dedup family: the
  * uniform fixtures elsewhere never stress the two defenses the 100 TB
  * story leans on — the `maxShingleFreq` stop-shingle guard and AQE's
  * skew-join split — so this suite builds pathological hot keys and
  * asserts each defense where it actually applies.
  *
  * Division of labor (verified empirically below, not assumed):
  *  - AQE splits skewed partitions of a PLANNER-partitioned pair
  *    join (`skew=true` in the final adaptive plan);
  *  - AQE does NOT split through the user `repartition(col)` the
  *    operators use for exchange reuse — splitting would break the
  *    user-specified partitioning contract — so on that shape the
  *    frequency guard is the one and only skew defense, which is why
  *    it must bound the index BEFORE the join rather than relying on
  *    runtime re-planning.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Every doc shares the hot shingle "x y z"; every other shingle is
    * unique to its doc.
    */
  private def hotCorpus(n: Int) = (1 to n).map(i =>
    (i.toLong, s"x y z t${i}a t${i}b t${i}c t${i}d")).toDF("doc_id", "text")

  test("one hot shingle pairs the whole corpus; the guard removes it") {
    val docs = hotCorpus(300)
    // unguarded: the hot shingle alone generates all C(n,2) candidate
    // pairs — the quadratic blowup a boilerplate header causes at scale
    val unguarded = Dedup.jaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.0)
    assert(unguarded.count() === 300L * 299 / 2)
    // guarded: the hot shingle exceeds maxShingleFreq and is dropped
    // from the index; the remaining shingles are all unique, so the
    // candidate set collapses to zero — input bounded BEFORE the join
    val guarded = Dedup.jaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.0, maxShingleFreq = 10)
    assert(guarded.count() === 0)
    // the guard's plan shape: a broadcast anti-join against the tiny
    // hot-shingle set (never a shuffle of the corpus to subtract it)
    val plan = guarded.queryExecution.sparkPlan.toString
    assert(plan.contains("LeftAnti"), s"missing anti-join guard:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"hot-shingle subtraction should broadcast:\n$plan")
    // containment shares the same guarded core
    assert(Dedup.containmentPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.0, maxShingleFreq = 10).count() === 0)
  }

  test("guard keeps true near-dups while dropping the hot shingle") {
    // two genuine near-dups buried in a hot-shingle corpus: the guard
    // must drop the boilerplate WITHOUT losing the real pair
    val docs = hotCorpus(100)
      .union(Seq(
        (900L, "pack my box with five dozen liquor jugs today"),
        (901L, "pack my box with five dozen liquor jugs tonight"))
        .toDF("doc_id", "text"))
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5, maxShingleFreq = 10)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSeq === Seq((900L, 901L)))
  }

  test("AQE splits planner-partitioned skew; NOT the reused exchange") {
    withConf(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // the pair-join shape with partitioning left to the planner: one
      // hot key dominates a shuffle partition → AQE marks and splits it
      val lhs = spark.range(0, 12000).select(
        when($"id" < 10000, lit("HOT"))
          .otherwise(concat(lit("k"), $"id")).as("sh"),
        $"id".as("did"))
      val rhs = spark.range(0, 1000).select(
        when($"id" < 20, lit("HOT"))
          .otherwise(concat(lit("r"), $"id")).as("sh"),
        $"id".as("other"))
      val planner = lhs.join(rhs, "sh")
      planner.queryExecution.toRdd.count()
      val plannerPlan = planner.queryExecution.executedPlan.toString
      assert(plannerPlan.contains("isFinalPlan=true"))
      assert(plannerPlan.contains("skew=true"),
        s"AQE did not split the skewed join:\n$plannerPlan")

      // the operators' exchange-reuse shape (repartition on the join
      // key, self-join): AQE must respect the user partitioning and
      // does NOT split — evidence that maxShingleFreq, not runtime
      // re-planning, is the defense on this path
      val small = spark.range(0, 2600).select(
        when($"id" < 2000, lit("HOT"))
          .otherwise(concat(lit("k"), $"id")).as("sh"),
        $"id".as("did"))
        .repartition($"sh")
      val reused = small.as("a").join(small.as("b"),
        $"a.sh" === $"b.sh" && $"a.did" < $"b.did")
      reused.queryExecution.toRdd.count()
      val reusedPlan = reused.queryExecution.executedPlan.toString
      assert(reusedPlan.contains("isFinalPlan=true"))
      assert(!reusedPlan.contains("skew=true"))
    }
  }
}
