package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave on the driver. */
  private def zRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue2 matches the reference interleave on a value grid") {
    val pts = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val out = pts.toDF("a", "b")
      .select($"a", $"b", Layout.zValue2($"a", $"b", bits = 4).as("z"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (a, b, z) => assert(z === zRef(a, b, 4)) }
    // the interleave is a bijection on the grid
    assert(out.map(_._3).distinct.length === pts.length)
  }

  test("zValue2 masks out-of-range bits instead of corrupting order") {
    val out = Seq((1024L + 5L, 3L)).toDF("a", "b")
      .select(Layout.zValue2($"a", $"b", bits = 10).as("z"))
      .as[Long].head()
    assert(out === zRef(5L, 3L, 10)) // high bits of a ignored
  }

  test("zValue2 rejects bit widths that overflow a long") {
    intercept[IllegalArgumentException] {
      Layout.zValue2(lit(1L), lit(1L), bits = 32)
    }
  }

  test("clusterByZOrder: partitions hold disjoint sorted z-ranges") {
    val df = spark.range(4096).select(
      ($"id" % 64).as("x"), ($"id" / 64).cast("long").as("y"))
    val clustered = Layout.clusterByZOrder(df, $"x", $"y", bits = 6,
      numPartitions = 4)
    val ranges = clustered
      .select(spark_partition_id().as("p"), $"z_value")
      .groupBy($"p")
      .agg(min($"z_value").as("lo"), max($"z_value").as("hi"),
        count(lit(1)).as("n"))
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(ranges.map(_._4).sum === 4096L)
    // ranges are disjoint and ordered: each partition's lo exceeds the
    // previous partition's hi (range partitioning on the z key)
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(b._2 > a._3)
      case _           => ()
    }
    // z-locality is a property of the KEY, not of the sampled
    // partition boundaries (repartitionByRange samples with a random
    // seed, so a partition may straddle a quadrant and legitimately
    // span the full x range): within every fixed 4-bit z prefix, both
    // dimensions are confined to a 16-wide band — an interleave that
    // dropped either dimension's bits would leave that dimension's
    // spread at the full 63 for some prefix
    val spread = clustered
      .select(shiftright($"z_value", 8).as("zp"), $"x", $"y")
      .groupBy($"zp")
      .agg((max($"x") - min($"x")).as("dx"), (max($"y") - min($"y")).as("dy"))
      .as[(Long, Long, Long)].collect()
    assert(spread.map(_._2).max <= 15L, s"x not clustered: ${spread.toSeq}")
    assert(spread.map(_._3).max <= 15L, s"y not clustered: ${spread.toSeq}")
  }
}
