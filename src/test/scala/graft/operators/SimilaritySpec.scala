package graft.operators

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("bruteKnn: exact ranks on a hand-checkable corpus") {
    val embs = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.5f, 0.5f)),
      (3L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.bruteKnn(embs,
        embs.filter($"vec_id" === 0L), "vec_id", "embedding", k = 3)
      .select($"neighbor_id", $"rank").as[(Long, Int)].collect().toSeq
      .sortBy(_._2)
    assert(got == Seq((1L, 1), (2L, 2), (3L, 3)))
  }

  test("bruteKnn excludes self and caps at k") {
    val e = Tables.embeddings(spark, sf0001)
    val res = Similarity.bruteKnn(e, e.filter($"vec_id" < 5),
      "vec_id", "embedding", k = 5)
    val rows = res.collect()
    assert(rows.length == 25) // 5 queries × 5 neighbors
    assert(!rows.exists(r => r.getLong(0) == r.getLong(1)))
  }

  test("lshKnn results are a subset of brute-force candidates with " +
    "reasonable recall on the real embeddings") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter($"vec_id" < 50)
    val brute = Similarity.bruteKnn(e, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshKnn(e, q, "vec_id", "embedding", 5,
        planes = 4, tables = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // every LSH hit is a true pair of vectors (sanity)
    assert(lsh.nonEmpty)
    val recall = (lsh intersect brute).size.toDouble / brute.size
    // OR-amplified: 8 tables × 4 planes recovers most top-5 neighbors
    assert(recall > 0.4, s"recall=$recall")
  }
}
