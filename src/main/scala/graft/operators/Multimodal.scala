package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction as *batched per-partition* transforms — the Scala
  * analog of `mapInPandas` (iterator-of-batches, one decoder init per
  * partition, vectorizable inner loop).
  *
  * The actual codec is STUBBED (no image/audio libs in this container):
  * [[decodeStub]] derives deterministic fake metadata/features from the
  * bytes. The Spark-side contract — schema, encoder, partition batching,
  * null passthrough — is real and tested; swapping in a real decoder
  * touches only the function body.
  *
  * Scale notes: decode is embarrassingly parallel and CPU-bound —
  * `repartition` to cores before the mapPartitions (no skew: payload
  * sizes are bounded), and keep features as fixed-width arrays so the
  * downstream similarity operators (see [[Similarity]]) apply unchanged.
  */
object Multimodal {

  /** Decoded-asset schema appended by [[decodeBinary]]. */
  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  /** STUB decoder — a real build replaces this body with an image/audio
    * codec call. Deterministic fake: dimensions from byte length,
    * features from the first bytes. Never throws; total on any payload.
    */
  def decodeStub(bytes: Array[Byte]): Row = {
    val n = bytes.length.toLong
    val feats = (0 until 8).map { i =>
      if (i < bytes.length) (bytes(i) & 0xff).toDouble else 0.0
    }.toArray
    Row(n, (n % 640).toInt, (n * 7 % 480).toInt, (n % 30).toInt, feats)
  }

  /** Decode a binary column into typed metadata + features, preserving
    * all input columns. Batched per partition; null payloads pass
    * through with null metadata.
    */
  def decodeBinary(df: DataFrame, binCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("decoded", metaSchema, nullable = true))
    val binIdx = inSchema.fieldIndex(binCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // one decoder init per partition would go here
      rows.map { r =>
        val payload = r.get(binIdx).asInstanceOf[Array[Byte]]
        val decoded = if (payload == null) null else decodeStub(payload)
        Row.fromSeq(r.toSeq :+ decoded)
      }
    }
  }

  /** Frame sampling: one row per every `step`-th frame of each asset
    * (the video-pipeline primitive — downstream per-frame decode /
    * embedding hangs off these rows). Assets with zero frames produce
    * no rows. Pure explode(sequence), fully distributed.
    */
  def frameSample(assets: DataFrame, idCol: String, nFramesCol: String,
                  step: Int): DataFrame =
    assets.select(col(idCol),
      explode(when(col(nFramesCol) > 0,
        sequence(lit(0), col(nFramesCol) - 1, lit(step)))
        .otherwise(array().cast("array<int>"))).as("frame_idx"))

  /** Aspect-preserving resize metadata: scale the longer edge to
    * `maxDim` in pure integer arithmetic (floor), so the result is
    * exactly reproducible in any SQL engine. Degenerate 0×0 assets
    * resolve via the greatest(...,1) guard.
    */
  def resizeDims(df: DataFrame, wCol: String, hCol: String,
                 maxDim: Int): DataFrame = {
    val longEdge = greatest(col(wCol), col(hCol), lit(1))
    df.withColumn("resized_w",
        floor(col(wCol) * maxDim / longEdge).cast("int"))
      .withColumn("resized_h",
        floor(col(hCol) * maxDim / longEdge).cast("int"))
  }

  /** Demo pipeline over the documents table: text bytes as the opaque
    * payload (stand-in for image bytes), decode, project flat metadata.
    * The flat projection is what the oracle checks (fake decode is
    * arithmetic on byte length / first bytes, so SQL-reproducible).
    */
  def documentAssets(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame =
    decodeBinary(
      docs.select(col(idCol), encode(col(textCol), "UTF-8").as("payload")),
      "payload")
      .select(col(idCol),
        col("decoded.n_bytes").as("n_bytes"),
        col("decoded.width").as("width"),
        col("decoded.height").as("height"),
        col("decoded.n_frames").as("n_frames"),
        element_at(col("decoded.features"), 1).as("f0"),
        element_at(col("decoded.features"), 2).as("f1"))
}
