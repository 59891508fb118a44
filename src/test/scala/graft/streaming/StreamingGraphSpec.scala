package graft.streaming

import graft.SparkSpec
import graft.operators.Graph
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

case class Edge(src: String, dst: String)

/** Incremental degree maintenance on MemoryStream: partials summed
  * across micro-batches match the batch Graph.degrees over the union
  * of edges, at-least-once replay is emit-once BOTH before and after
  * a compaction fold, and compaction preserves the merged view.
  */
class StreamingGraphSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private val b1 = Seq(Edge("a", "b"), Edge("a", "c"), Edge("b", "c"))
  private val b2 = Seq(Edge("c", "a"), Edge("d", "a"), Edge("d", "b"))

  private def merged(store: String): Map[String, (Long, Long)] =
    StreamingGraph.degrees(spark, store)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  private def batchParity(edges: Seq[Edge]): Map[String, (Long, Long)] =
    Graph.degrees(edges.toDF("src", "dst"), "src", "dst")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("streamed partials match batch degrees; replay is emit-once") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmp("deg_store")
    val src = MemoryStream[Edge]
    val q = StreamingGraph.degreeSink(src.toDF(), store, "src", "dst")
      .option("checkpointLocation", tmp("deg_ckpt")).start()
    try {
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val expect = batchParity(b1 ++ b2)
    assert(merged(store) === expect)
    // at-least-once redelivery of batch 1 rewrites identical bytes
    StreamingGraph.writeDegreeBatch(b2.toDF("src", "dst"), store,
      "src", "dst", 1L)
    assert(merged(store) === expect)
    // in-batch duplicate edges collapse like the batch operator's
    // distinct edge list
    StreamingGraph.writeDegreeBatch(
      (b2 ++ b2).toDF("src", "dst"), store, "src", "dst", 1L)
    assert(merged(store) === expect)
  }

  test("compaction folds partials; replay of a FOLDED batch is ignored") {
    val store = tmp("deg_store2")
    StreamingGraph.writeDegreeBatch(b1.toDF("src", "dst"), store,
      "src", "dst", 0L)
    StreamingGraph.writeDegreeBatch(b2.toDF("src", "dst"), store,
      "src", "dst", 1L)
    val expect = batchParity(b1 ++ b2)
    StreamingGraph.compactDegrees(spark, store)
    assert(merged(store) === expect, "fold must preserve the view")
    // replaying batch 1 AFTER it was folded re-creates its directory,
    // but it sits at/below the fold watermark — not double-counted
    StreamingGraph.writeDegreeBatch(b2.toDF("src", "dst"), store,
      "src", "dst", 1L)
    assert(merged(store) === expect)
    // new batches after the fold still count
    val b3 = Seq(Edge("e", "a"))
    StreamingGraph.writeDegreeBatch(b3.toDF("src", "dst"), store,
      "src", "dst", 2L)
    assert(merged(store) === batchParity(b1 ++ b2 ++ b3))
    // a second fold (now including batch 2) stays correct
    StreamingGraph.compactDegrees(spark, store)
    assert(merged(store) === batchParity(b1 ++ b2 ++ b3))
  }
}
