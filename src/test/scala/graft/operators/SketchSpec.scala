package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def distinctDf(n: Int, dupFactor: Int = 1) =
    (0 until n).flatMap(i => Seq.fill(dupFactor)(("g", s"value-$i")))
      .toDF("g", "v")

  test("estimate within 5% across cardinalities (4096 registers)") {
    for (n <- Seq(100, 1000, 5000, 40000)) {
      val est = Sketch.hllDistinct(distinctDf(n), col("v"), Seq("g"))
        .select("approx_distinct").as[Long].head()
      val relErr = math.abs(est - n).toDouble / n
      assert(relErr < 0.05, s"n=$n est=$est relErr=$relErr")
    }
  }

  test("duplicates do not move the estimate") {
    val once = Sketch.hllDistinct(distinctDf(2000), col("v"), Seq("g"))
      .select("approx_distinct").as[Long].head()
    val dup = Sketch.hllDistinct(distinctDf(2000, dupFactor = 5),
        col("v"), Seq("g"))
      .select("approx_distinct").as[Long].head()
    assert(once == dup)
  }

  test("merged shard registers equal the direct registers") {
    val df = distinctDf(8000)
      .withColumn("shard", pmod(crc32(col("v")), lit(7)))
    val direct = Sketch.hllRegisters(df, col("v"), Seq("g"))
      .orderBy("bucket").as[(String, Long, Int)].collect()
    val merged = Sketch.hllMerge(
        Sketch.hllRegisters(df, col("v"), Seq("g", "shard")), Seq("g"))
      .orderBy("bucket").as[(String, Long, Int)].collect()
    assert(direct.sameElements(merged))
  }

  test("register invariants: bucket in [0,4096), reg in [1,49]") {
    val regs = Sketch.hllRegisters(distinctDf(3000), col("v"), Seq("g"))
    val bad = regs.filter(col("bucket") < 0 || col("bucket") >= 4096 ||
      col("reg") < 1 || col("reg") > 49).count()
    assert(bad == 0)
    assert(regs.count() <= 4096)
  }

  test("multi-group estimates are independent") {
    val df = ((0 until 500).map(i => ("a", s"x$i")) ++
      (0 until 3000).map(i => ("b", s"y$i"))).toDF("g", "v")
    val ests = Sketch.hllDistinct(df, col("v"), Seq("g"))
      .as[(String, Long)].collect().toMap
    assert(math.abs(ests("a") - 500).toDouble / 500 < 0.05)
    assert(math.abs(ests("b") - 3000).toDouble / 3000 < 0.05)
  }
}
