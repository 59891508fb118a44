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
