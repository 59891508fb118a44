package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.unsafe.types.UTF8String

/** Bit-parity of the string-keyed bounded-heap top-k against the window
  * formulation it claims to match, plus the serde and byte-order paths
  * the oracle queries (ASCII tokens) never exercise.
  */
class TopKByScoreStrSpec extends SparkSpec {
  import spark.implicits._

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val topk = Bridge.column(
      TopKByScoreStr(
        Bridge.expression(col("score").cast(DoubleType)),
        Bridge.expression(col("id")), k)
        .toAggregateExpression())
    df.agg(topk.as("t"))
      .select(posexplode(col("t")).as(Seq("pos", "x")))
      .select(col("x.id"), col("x.score"))
      .as[(String, Double)].collect()
  }

  private def viaSort(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.orderBy(col("score").desc, col("id"))
      .select(col("id"), col("score"))
      .as[(String, Double)].take(k)

  test("matches ORDER BY score DESC, id over many partitions") {
    val df = spark.range(500)
      .select(concat(lit("tok"), col("id") % 37).as("id"),
        (col("id") % 11).cast(DoubleType).as("score"))
      .repartition(8)
    assert(viaAgg(df, 10) === viaSort(df, 10))
  }

  test("ties on score break by id ascending; k > n returns all") {
    val df = Seq(("b", 1.0), ("a", 1.0), ("c", 1.0)).toDF("id", "score")
    assert(viaAgg(df, 2) === Array(("a", 1.0), ("b", 1.0)))
    assert(viaAgg(df, 99).length === 3)
  }

  test("non-ASCII ids order by UTF-8 bytes (Spark's string order)") {
    // U+FF01 (ＡFULLWIDTH!) vs ASCII vs CJK: byte order != UTF-16 order
    // for supplementary chars; verify parity with Spark's own sort
    val df = Seq(("z", 1.0), ("中", 1.0), ("😀", 1.0),
      ("a", 1.0)).toDF("id", "score").repartition(3)
    assert(viaAgg(df, 3) === viaSort(df, 3))
  }

  test("serde roundtrip preserves buffer contents") {
    val e = TopKByScoreStr(
      Bridge.expression(lit(0.0)), Bridge.expression(lit("x")), 3)
    val buf = e.createAggregationBuffer()
    buf.offer(2.0, UTF8String.fromString("beta"))
    buf.offer(3.0, UTF8String.fromString("日本語"))
    buf.offer(1.0, UTF8String.fromString("alpha"))
    buf.offer(4.0, UTF8String.fromString("gamma")) // evicts alpha
    val back = e.deserialize(e.serialize(buf))
    assert(back.sortedDesc.toSeq === buf.sortedDesc.toSeq)
    assert(back.sortedDesc.map(_._2.toString).toSeq ===
      Seq("gamma", "日本語", "beta"))
  }

  test("NaN scores rank first, like Spark's DESC ordering") {
    val df = Seq(("n", Double.NaN), ("h", 9.0), ("l", 1.0))
      .toDF("id", "score").repartition(2)
    // compare ids only: NaN != NaN would fail tuple equality
    assert(viaAgg(df, 2).map(_._1) === viaSort(df, 2).map(_._1))
    assert(viaAgg(df, 2).head._1 === "n")
  }
}
