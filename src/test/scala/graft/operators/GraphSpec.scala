package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("degrees counts both sides, zero-filled") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.degrees(e, "src", "dst")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Seq((1L, 2L, 0L), (2L, 1L, 1L), (3L, 0L, 2L)))
  }

  test("pageRank on a 2-cycle is the uniform fixed point") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.pageRank(e, "src", "dst", iters = 3)
      .select("node", "pr_fx").as[(Long, Long)].collect().toMap
    // n=2: teleport 75e9 + 0.85 * 5e11 = 5e11 every iteration
    assert(got === Map(1L -> 500000000000L, 2L -> 500000000000L))
  }

  test("pageRank concentrates mass on a sink-with-return hub") {
    // star: spokes point at hub, hub returns to one spoke
    val e = Seq((1L, 9L), (2L, 9L), (3L, 9L), (9L, 1L))
      .toDF("src", "dst")
    val pr = Graph.pageRank(e, "src", "dst", iters = 3)
      .select("node", "pr").as[(Long, Double)].collect().toMap
    assert(pr(9L) > pr(1L) && pr(1L) > pr(2L))
    assert(pr(2L) === pr(3L))
    // total mass stays ~1 (integer-div leakage only)
    assert(math.abs(pr.values.sum - 1.0) < 1e-3)
  }

  test("pageRank rejects dangling nodes") {
    val e = Seq((1L, 2L)).toDF("src", "dst") // 2 has no out-edge
    val ex = intercept[IllegalArgumentException] {
      Graph.pageRank(e, "src", "dst", iters = 1)
    }
    assert(ex.getMessage.contains("out-edge"))
  }

  test("hits: authority concentrates on the pointed-at node") {
    // spokes 1,2,3 -> 9; 9 -> 1. 9 is the authority, spokes are hubs.
    val e = Seq((1L, 9L), (2L, 9L), (3L, 9L), (9L, 1L))
      .toDF("src", "dst")
    val r = Graph.hits(e, "src", "dst", iters = 2)
      .select("node", "hub_fx", "auth_fx")
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(9L)._2 > r(1L)._2)             // 9 is the top authority
    assert(r(1L)._1 === r(2L)._1)           // symmetric spokes tie
    assert(r(2L)._1 > 0 && r(2L)._2 === 0)  // pure hub: no in-edges
  }

  test("hits is deterministic across repartitionings") {
    val e = (0L until 200L).map(i => (i % 16, (i * 7 + 3) % 16))
      .filter(p => p._1 != p._2).distinct.toDF("src", "dst")
    val a = Graph.hits(e, "src", "dst", iters = 2)
      .select("node", "hub_fx", "auth_fx")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = Graph.hits(e.repartition(13), "src", "dst", iters = 2)
      .select("node", "hub_fx", "auth_fx")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  private def fixture200 = (0L until 200L)
    .map(i => (i % 16, (i * 7 + 3) % 16))
    .filter(p => p._1 != p._2).distinct.toDF("src", "dst")

  test("pageRankWarm: warm(2, seed=cold(2)) is bit-identical to cold(4)") {
    val e = fixture200
    val seed = Graph.pageRank(e, "src", "dst", iters = 2)
      .select("node", "pr_fx")
    val warm = Graph.pageRankWarm(e, "src", "dst", iters = 2, seed)
      .select("node", "pr_fx").as[(Long, Long)].collect().toMap
    val cold = Graph.pageRank(e, "src", "dst", iters = 4)
      .select("node", "pr_fx").as[(Long, Long)].collect().toMap
    assert(warm === cold)
  }

  test("pageRankWarm: nodes absent from the seed enter at teleport, " +
      "seeded nodes carry their previous rank") {
    // G1 = 2-cycle (uniform fixed point 5e11 each); G2 adds node 3
    val g2 = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val seed = Graph.pageRank(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"),
      "src", "dst", iters = 3).select("node", "pr_fx")
    // iters = 0 exposes the start vector itself
    val warm0 = Graph.pageRankWarm(g2, "src", "dst", iters = 0, seed)
      .select("node", "pr_fx").as[(Long, Long)].collect().toMap
    assert(warm0(1L) === 500000000000L && warm0(2L) === 500000000000L)
    assert(warm0(3L) === (15L * Graph.PrScale) / (100L * 3))
  }

  test("hitsWarm: warm(1, seed=cold(1).hub) is bit-identical to cold(2)") {
    val e = fixture200
    val seed = Graph.hits(e, "src", "dst", iters = 1)
      .select("node", "hub_fx")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.select("node", "hub_fx", "auth_fx")
        .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3)))
        .toMap
    assert(m(Graph.hitsWarm(e, "src", "dst", iters = 1, seed)) ===
      m(Graph.hits(e, "src", "dst", iters = 2)))
  }

  test("hits exact-fixed-point early exit: a deep-iteration run " +
      "stops at convergence + 1, bit-identical to the full run, " +
      "and ext_hits' cold iters=2 shape never pays the check") {
    val e = fixture200
    def m(df: org.apache.spark.sql.DataFrame) =
      df.select("node", "hub_fx", "auth_fx")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val (full2, exec2) =
      Graph.hitsFromCounted(e, "src", "dst", 2, None)
    assert(exec2 === 2) // cold start, nothing to skip at iters=2
    val (deep, execDeep) =
      Graph.hitsFromCounted(e, "src", "dst", 12, None)
    // the dense fixture converges fast; the exit must fire well
    // before 12 and the result must equal the honest full unroll
    assert(execDeep < 12, "early exit never fired")
    assert(m(deep) === m(Graph.hits(e, "src", "dst",
      iters = execDeep)))
    // a warm start FROM the converged state exits after the single
    // iteration that proves the fixed point
    val seed = deep.select("node", "hub_fx")
    val (warm, execWarm) =
      Graph.hitsFromCounted(e, "src", "dst", 5, Some(seed))
    assert(execWarm === 1)
    assert(m(warm) === m(deep))
  }

  test("pageRank is deterministic across repartitionings") {
    val e = (0L until 200L).map(i => (i % 16, (i * 7 + 3) % 16))
      .filter(p => p._1 != p._2).distinct.toDF("src", "dst")
    val a = Graph.pageRank(e, "src", "dst", iters = 3)
      .select("node", "pr_fx").as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(e.repartition(13), "src", "dst", iters = 3)
      .select("node", "pr_fx").as[(Long, Long)].collect().toMap
    assert(a === b)
  }
}
