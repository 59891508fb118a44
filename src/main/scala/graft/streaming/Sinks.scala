package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Serving-store sinks: the engine's replacement for the reference's
  * per-day Elasticsearch indexes with doc-id upsert (MyEsUtils.scala:
  * 69-79 — at-least-once delivery made effectively-once by keying).
  *
  * Here the serving store is a `dt`-partitioned parquet table written
  * via dynamic partition overwrite inside foreachBatch: each micro-batch
  * dedups on the primary key and overwrites only the partitions it
  * touches — idempotent under replay, and partition pruning serves the
  * publisher queries' per-day reads (the "index per day" access
  * pattern) for free.
  */
object Sinks {

  /** Write one micro-batch as a keyed upsert: rows merge into the
    * touched dt partitions by (pk, dt) — existing rows whose key is not
    * in the batch survive, batch rows win on collision (the ES doc-id
    * upsert contract). Only the partitions present in the batch are
    * rewritten (dynamic partition overwrite), so a day's serving data
    * accumulates across micro-batches instead of being replaced by the
    * latest batch.
    */
  def upsertBatch(batch: DataFrame, path: String, pk: String,
                  dtCol: String = "dt"): Unit = {
    val spark = batch.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val deduped = batch.dropDuplicates(pk, dtCol).persist()
    try {
      val merged =
        try {
          val touched = deduped.select(col(dtCol)).distinct()
          val survivors = spark.read.parquet(path)
            .join(broadcast(touched), Seq(dtCol), "left_semi")
            .join(deduped.select(col(pk), col(dtCol)),
              Seq(pk, dtCol), "left_anti")
          deduped.unionByName(survivors.select(deduped.columns.map(col): _*))
        } catch {
          // store missing or still empty → first write, nothing to merge
          case e: Exception
              if e.getMessage != null &&
                (e.getMessage.contains("PATH_NOT_FOUND") ||
                  e.getMessage.contains("Path does not exist") ||
                  e.getMessage.contains("UNABLE_TO_INFER_SCHEMA")) =>
            deduped
        }
      // materialize before writing: Spark refuses to overwrite a path
      // that still appears as a scan in the write's own plan
      merged.localCheckpoint()
        .write.mode(SaveMode.Overwrite)
        .partitionBy(dtCol)
        .parquet(path)
    } finally { deduped.unpersist(); () }
  }

  /** Attach the keyed-upsert sink to a streaming DataFrame with a
    * 5-second trigger (the reference's batch interval) and checkpoint.
    */
  def keyedParquetSink(df: DataFrame, path: String, pk: String,
                       checkpoint: String,
                       trigger: Trigger = Trigger.ProcessingTime("5 seconds"))
      : DataStreamWriter[Row] =
    df.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, _: Long) =>
        upsertBatch(batch, path, pk))

  /** Kafka sink (reference K1, MyKafkaUtils.scala:61-114): rows
    * serialized as JSON values; per-record topic routing via an
    * existing `topic` column (the CdcSplit fact branch) or a fixed
    * topic. Flush-before-commit, acks and idempotent produce are the
    * sink's own contract — none of the reference's hand-rolled producer
    * lifecycle survives.
    */
  def kafkaSink(df: DataFrame, servers: String, checkpoint: String,
                topic: Option[String] = None,
                trigger: Trigger = Trigger.ProcessingTime("5 seconds"))
      : DataStreamWriter[Row] = {
    val dataCols = df.columns.filter(_ != "topic").map(col)
    val payload =
      if (df.columns.contains("topic") && topic.isEmpty)
        df.select(col("topic"), to_json(struct(dataCols: _*)).as("value"))
      else
        df.select(to_json(struct(dataCols: _*)).as("value"))
    val w = payload.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
    topic.fold(w)(t => w.option("topic", t))
  }
}
