package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteKnn]] — exact baseline: query × corpus cosine, per-query
  *    top-k via window rank. The corpus side is the big side; the query
  *    set is broadcast so the corpus never shuffles — at 100 TB this is
  *    one scan + map-side top-k (the window is partitioned by query id,
  *    whose cardinality = |queries|, so state is small).
  *  - [[lshKnn]] — scale path: random-hyperplane LSH buckets; each query
  *    only scores corpus vectors in its bucket. Recall < 1 by design;
  *    raise `planes` for precision, add band-OR (multiple tables) for
  *    recall. Bucket sizes are ~n/2^planes — tune planes so buckets fit
  *    an executor.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector (excluding self).
    * Output: (query_id, neighbor_id, rank, cosine).
    */
  def bruteKnn(corpus: DataFrame, queries: DataFrame,
               idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFns.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("int").as("rank"), col("cosine"))
  }

  /** LSH-bucketed ANN: score only same-bucket corpus vectors.
    * Output: (query_id, neighbor_id, rank, cosine) — per-query top-k
    * *within the bucket* (fewer than k rows when the bucket is small).
    */
  def lshKnn(corpus: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, k: Int,
             planes: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"),
      VectorFns.lshBucket(col(vecCol), planes).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"),
      VectorFns.lshBucket(col(vecCol), planes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFns.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("int").as("rank"), col("cosine"))
  }
}
