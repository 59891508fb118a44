package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * plan runs at sf0.001 (smoke), sf0.01 (DuckDB-oracle correctness) and
  * sf0.1 (bench) — and, unchanged, on a real cluster against partitioned
  * 100 TB tables (the reads below are plain `spark.read.parquet`, so
  * predicate pushdown / column pruning / partition pruning all apply).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
    // reader rejects; read the physical INT64 as epoch-nanos Long instead
    // (lossless here — the generator emits µs precision) and convert at
    // the edge (see events()). Dynamic SQLConf, safe to set per-read.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events with `ts` as epoch-nanos Long — use for range predicates that
    * must push down to the parquet scan (compare against nanos literals).
    */
  def eventsRaw(s: SparkSession, d: String): DataFrame = load(s, d, "events")

  /** Epoch-nanos literal for "yyyy-MM-dd" UTC midnight. */
  def dayNanos(day: String): Long =
    java.time.LocalDate.parse(day).atStartOfDay(java.time.ZoneOffset.UTC)
      .toInstant.toEpochMilli * 1000000L

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame =
    eventsRaw(s, d).withColumn("ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
