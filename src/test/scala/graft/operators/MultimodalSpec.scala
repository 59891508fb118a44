package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeBinary: schema appended, all input columns preserved") {
    val df = Seq((1L, "hello")).toDF("id", "t")
      .select($"id", encode($"t", "UTF-8").as("payload"), $"t")
    val out = Multimodal.decodeBinary(df, "payload")
    assert(out.columns.toSeq == Seq("id", "payload", "t", "decoded"))
    assert(out.schema("decoded").dataType == Multimodal.metaSchema)
  }

  test("decodeBinary: deterministic stub values and null passthrough") {
    val df = Seq((1L, Some("hello")), (2L, None))
      .toDF("id", "t")
      .select($"id", when($"t".isNotNull, encode($"t", "UTF-8")).as("payload"))
    val rows = Multimodal.decodeBinary(df, "payload")
      .select($"id", $"decoded").collect()
      .map(r => r.getLong(0) -> r.getStruct(1)).toMap
    val d1 = rows(1L)
    assert(d1.getLong(0) == 5L)              // n_bytes("hello")
    assert(d1.getInt(1) == 5 && d1.getInt(2) == 35 && d1.getInt(3) == 5)
    assert(d1.getSeq[Double](4).take(2) == Seq(104.0, 101.0)) // 'h','e'
    assert(rows(2L) == null)                 // null payload passes through
  }

  test("frameSample: every step-th frame, zero-frame assets drop out") {
    val assets = Seq((1L, 10), (2L, 0), (3L, 1)).toDF("id", "n_frames")
    val frames = Multimodal.frameSample(assets, "id", "n_frames", 4)
      .as[(Long, Int)].collect().toSet
    assert(frames == Set((1L, 0), (1L, 4), (1L, 8), (3L, 0)))
  }

  test("resizeDims: aspect-preserving integer scale with 0x0 guard") {
    val df = Seq((640, 480), (100, 400), (0, 0)).toDF("w", "h")
    val got = Multimodal.resizeDims(df, "w", "h", 256)
      .select("resized_w", "resized_h").as[(Int, Int)].collect().toSeq
    assert(got(0) == ((256, 192)))  // 640x480 → long edge 640 → 256
    assert(got(1) == ((64, 256)))   // portrait scales on height
    assert(got(2) == ((0, 0)))      // degenerate guard, no div-by-zero
  }

  test("decodeBinary survives repartitioning (per-partition batching)") {
    val df = (1 to 100).map(i => (i.toLong, "x" * i)).toDF("id", "t")
      .select($"id", encode($"t", "UTF-8").as("payload"))
    val out = Multimodal.decodeBinary(df.repartition(13), "payload")
      .select($"id", $"decoded.n_bytes").as[(Long, Long)]
      .collect().toMap
    assert(out.size == 100 && out.forall { case (i, n) => n == i })
  }
}
