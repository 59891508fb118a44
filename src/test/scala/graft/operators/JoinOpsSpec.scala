package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketized tables join without a shuffle exchange") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Seq("bkt_a", "bkt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      if (loc.exists()) rm(loc)
    }
    JoinOps.bucketize(a, "bkt_a", "k", 8)
    JoinOps.bucketize(b, "bkt_b", "k", 8)
    val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == 1000)
  }

  test("saltedJoin equals the plain join on skewed data") {
    // 90% of big-side rows share one hot key
    val big = (1 to 2000).map(i =>
      (if (i <= 1800) 1L else i.toLong, i.toLong)).toDF("k", "row_id")
    val small = Seq((1L, "hot"), (1900L, "cold")).toDF("k", "label")
    val plain = big.join(small, "k")
      .select("k", "row_id", "label").collect().toSet
    val salted = JoinOps.saltedJoin(big, small, "k", "row_id", 8)
      .select("k", "row_id", "label").collect().toSet
    assert(salted == plain)
    assert(plain.count(_.getString(2) == "hot") == 1800)
  }

  test("saltedJoin spreads a hot key across salt partitions") {
    val big = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "row_id")
    val spread = big.withColumn("__salt",
      pmod(xxhash64($"row_id"), lit(8)))
      .groupBy("__salt").count().collect()
    assert(spread.length == 8) // all 8 sub-keys used
    assert(spread.map(_.getLong(1)).max < 1000) // no single bucket holds all
  }
}
