package graft.tools

import org.apache.spark.sql.functions._

/** Regenerates the (row-count, content-hash) pins TablesSpec asserts:
  * `sbt "Test/runMain graft.tools.PinFixtures"` and paste the printed
  * map. Run it ONLY after deliberately accepting a fixture change —
  * the pins exist so a silent regeneration trips a spec, not so they
  * get refreshed reflexively.
  */
object PinFixtures {
  /** Order-independent content hash: XOR of per-row xxhash64 over the
    * row's JSON form with columns in sorted-name order (events first
    * normalized to the canonical epoch-nanos shape so the pin is
    * parquet-encoding-agnostic).
    */
  def tableHash(df: org.apache.spark.sql.DataFrame): Long = {
    val cols = df.columns.sorted.map(col).toIndexedSeq
    df.select(xxhash64(to_json(struct(cols: _*))).as("h"))
      .agg(expr("bit_xor(h)")).head().getLong(0)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.spark
    val dir = graft.SparkSpec.sf0001
    graft.tables.Tables.names.foreach { t =>
      val df =
        if (t == "events") graft.tables.Tables.eventsRaw(spark, dir)
        else graft.tables.Tables.load(spark, dir, t)
      println(s"""    "$t" -> (${df.count()}L, ${tableHash(df)}L),""")
    }
    spark.stop()
  }
}
