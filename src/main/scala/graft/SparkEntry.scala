package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine's full query surface is assembled from per-module
  * registries; each entry pairs a Spark plan with (when SQL-expressible)
  * the DuckDB oracle the driver hash-compares against.
  */
object SparkEntry {

  /** Every query the engine exposes. */
  def registry: Seq[Q] =
    graft.operators.ParityQueries.all ++
      graft.extensions.ExtensionQueries.all ++
      graft.extensions.CorpusQueries.all ++
      graft.extensions.SketchQueries.all ++
      graft.extensions.ProjectionQueries.all ++
      graft.extensions.ModelQueries.all ++
      graft.extensions.MultimodalQueries.all ++
      graft.extensions.WebQueries.all ++
      graft.extensions.HtmlQueries.all ++
      graft.extensions.GraphQueries.all ++
      graft.extensions.WarcQueries.all ++
      graft.extensions.ChatQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.find(_.name == "q1_agg").get.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
