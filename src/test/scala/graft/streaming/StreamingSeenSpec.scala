package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** Seen-key gate: repeats across batches are dropped, replay of a
  * batch returns the IDENTICAL fresh set (not empty), compaction
  * preserves membership, and new keys still pass after a fold.
  */
class StreamingSeenSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("seen_store").toString

  private def gate(store: String, id: Long, urls: String*): Set[String] =
    StreamingSeen.unseenAndRecord(
        urls.toDF("url").withColumn("payload",
          org.apache.spark.sql.functions.length($"url")),
        "url", store, id)
      .select("url").as[String].collect().toSet

  test("cross-batch dedup with replay-stable emissions") {
    val store = tmp()
    assert(gate(store, 0L, "u/a", "u/b", "u/a") === Set("u/a", "u/b"))
    assert(gate(store, 1L, "u/b", "u/c") === Set("u/c"))
    // at-least-once replay of batch 1: same fresh set, NOT empty —
    // membership excludes the batch's own directory
    assert(gate(store, 1L, "u/b", "u/c") === Set("u/c"))
    assert(StreamingSeen.seenKeys(spark, store, "url")
      .as[String].collect().toSet === Set("u/a", "u/b", "u/c"))
    // fold to distinct keys; membership survives, new keys still pass
    StreamingSeen.compactSeen(spark, store, "url")
    assert(StreamingSeen.seenKeys(spark, store, "url")
      .as[String].collect().toSet === Set("u/a", "u/b", "u/c"))
    assert(gate(store, 2L, "u/c", "u/d") === Set("u/d"))
    assert(StreamingSeen.seenKeys(spark, store, "url")
      .as[String].collect().toSet ===
      Set("u/a", "u/b", "u/c", "u/d"))
  }

  test("membership survives a compaction crash between the swap renames") {
    val store = tmp()
    assert(gate(store, 0L, "u/a", "u/b") === Set("u/a", "u/b"))
    // simulate compactSeen dying after rename(live -> old), before
    // rename(tmp -> live): the live path is MISSING, the full store is
    // set aside — the old Try-based read saw this as an empty store,
    // re-emitted u/a and u/b, and the batch write recreated the store
    // root so the set-aside store was never restored
    val fs = new java.io.File(store)
    val aside = new java.io.File(store + ".__compact_old")
    assert(fs.renameTo(aside), "test setup: could not set the store aside")
    assert(gate(store, 1L, "u/a", "u/c") === Set("u/c"))
    assert(StreamingSeen.seenKeys(spark, store, "url")
      .as[String].collect().toSet === Set("u/a", "u/b", "u/c"))
    assert(!aside.exists(), "recovery must consume the set-aside store")
  }
}
