package graft.operators

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("winsorize: values clip into their own group's quantiles") {
    // group a: 0..100 with one wild outlier; group b untouched range
    val rows = ((0 to 100).map(i => ("a", i.toDouble)) :+ ("a", 1e9)) ++
      (0 to 10).map(i => ("b", i.toDouble))
    val out = Stats.winsorize(rows.toDF("k", "v"), "k", "v",
        lo = 0.0, hi = 0.95)
      .select($"k", $"v", $"clipped")
      .as[(String, Double, Double)].collect()
    val a = out.filter(_._1 == "a")
    // p95 of the 102 sorted values interpolates between 95 and 96:
    // position 0.95*101 = 95.95 → the billion-scale outlier clips there
    assert(math.abs(a.map(_._3).max - 95.95) < 1e-9)
    // below-hi values pass through unchanged
    assert(a.filter(_._2 <= 90).forall(r => r._3 === r._2))
    // group b's own p95 applies, not group a's
    val b = out.filter(_._1 == "b")
    assert(b.map(_._3).max === 9.5) // quantile_cont(0..10, 0.95)
  }

  test("winsorize: lo bound lifts the low tail") {
    val out = Stats.winsorize(
        (0 to 10).map(i => ("g", i.toDouble)).toDF("k", "v"),
        "k", "v", lo = 0.5, hi = 1.0)
      .select($"clipped").as[Double].collect()
    assert(out.min === 5.0) // median of 0..10
    assert(out.max === 10.0)
  }

  test("winsorize: rejects inverted bounds") {
    intercept[IllegalArgumentException] {
      Stats.winsorize(Seq(("g", 1.0)).toDF("k", "v"), "k", "v", 0.9, 0.1)
    }
  }
}
