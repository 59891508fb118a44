package graft.tables

import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * plan runs at sf0.001 (smoke), sf0.01 (DuckDB-oracle correctness) and
  * sf0.1 (bench) — and, unchanged, on a real cluster against partitioned
  * 100 TB tables (the reads below are plain `spark.read.parquet`, so
  * predicate pushdown / column pruning / partition pruning all apply).
  *
  * `events.ts` encoding: the generator has shipped it both as
  * TIMESTAMP(NANOS) (which Spark reads as epoch-nanos Long under
  * `nanosAsLong`) and as TIMESTAMP(MICROS) (which Spark reads as
  * TIMESTAMP / TIMESTAMP_NTZ). The loaders below branch on the arrived
  * schema and normalize to ONE canonical shape — `ts` as epoch-nanos
  * Long — so every downstream operator and oracle is encoding-agnostic.
  * Day-range predicates must use [[eventsRangeNanos]], which filters on
  * the NATIVE scan column (nanos literals or timestamp literals, both
  * parquet-pushable) before the normalizing projection; a filter placed
  * above the projection would silently lose row-group skipping.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Legacy encoding support: TIMESTAMP(NANOS) is rejected by Spark's
    // vectorized reader; read the physical INT64 as epoch-nanos Long
    // (lossless — the generator emits µs precision). Dynamic SQLConf,
    // safe to set per-read; a MICROS file is unaffected by it.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Normalize a native-typed `ts` column to epoch-nanos Long.
    * Session timezone is UTC in every entry point (Verify/Bench/specs/
    * apps), so the NTZ→TZ cast reads the naive value as a UTC instant —
    * the same convention DuckDB's `epoch_us(ts)` applies on the oracle
    * side.
    */
  private def tsToNanos(dt: DataType): Column = dt match {
    case LongType         => col("ts") // already epoch-nanos
    case TimestampType    =>
      org.apache.spark.sql.functions.unix_micros(col("ts")) * 1000L
    case TimestampNTZType =>
      org.apache.spark.sql.functions
        .unix_micros(col("ts").cast(TimestampType)) * 1000L
    case other =>
      throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other")
  }

  /** events with `ts` as epoch-nanos Long regardless of the parquet
    * encoding. For day-range scans prefer [[eventsRangeNanos]] (filters
    * on the native column → parquet row-group skipping).
    */
  def eventsRaw(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case dt       => df.withColumn("ts", tsToNanos(dt))
    }
  }

  /** events restricted to `[loNanos, hiNanos)` with the range predicate
    * expressed against the NATIVE scan column type — epoch-nanos Long
    * literals or timestamp literals, both of which reach the parquet
    * reader as PushedFilters (row-group stats skipping on a year of
    * data) — then `ts` normalized to epoch-nanos Long.
    */
  def eventsRangeNanos(s: SparkSession, d: String,
                       loNanos: Long, hiNanos: Long): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.filter(col("ts") >= loNanos && col("ts") < hiNanos)
      case dt =>
        def tsLit(ns: Long): Column = dt match {
          case TimestampNTZType => lit(java.time.LocalDateTime.ofEpochSecond(
            ns / 1000000000L, (ns % 1000000000L).toInt,
            java.time.ZoneOffset.UTC))
          case _ => lit(java.time.Instant.ofEpochSecond(
            ns / 1000000000L, ns % 1000000000L))
        }
        df.filter(col("ts") >= tsLit(loNanos) && col("ts") < tsLit(hiNanos))
          .withColumn("ts", tsToNanos(dt))
    }
  }

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
