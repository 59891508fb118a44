package graft.operators

import graft.SparkSpec
import graft.tables.Tables.embeddings
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  private lazy val e =
    embeddings(spark, sf0001).select("vec_id", "embedding").cache()

  test("pqCodes: one in-range code per (vector, subspace)") {
    val m = 8; val ksub = 16
    val codes = Pq.pqCodes(e, "vec_id", "embedding", m = m, ksub = ksub)
      .cache()
    val n = e.count()
    assert(codes.count() === n * m)
    assert(codes.select("vec_id", "sub").distinct().count() === n * m)
    val bad = codes.filter(col("code") < 0 || col("code") >= ksub).count()
    assert(bad === 0)
  }

  test("pqModel: codebooks carry dsub-dim double codewords, <= ksub cells") {
    val (cents, _) =
      Pq.pqModel(e, "vec_id", "embedding", m = 4, ksub = 16)
    val rows = cents.select(col("sub"), col("cell"), size(col("cv")).as("d"))
      .collect()
    assert(rows.length <= 4 * 16)
    assert(rows.forall(_.getInt(2) === 16))
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).distinct.length
      === rows.length)
  }

  test("pqKnn: ADC distances ascend with rank; self excluded") {
    val q = e.filter(col("vec_id") < 10)
    val r = Pq.pqKnn(e, q, "vec_id", "embedding", k = 5).cache()
    assert(r.filter(col("query_id") === col("neighbor_id")).count() === 0)
    val monotone = r.groupBy("query_id")
      .agg(min(col("adist")).as("lo"), max(col("adist")).as("hi"),
        min(when(col("rank") === 1, col("adist"))).as("r1"),
        max(when(col("rank") === 5, col("adist"))).as("r5"))
      .filter(col("r1") > col("r5")).count()
    assert(monotone === 0)
    assert(r.groupBy("query_id").count().collect().forall(_.getLong(1) === 5))
  }

  test("pqKnnRerank: shortlist + exact re-rank recovers most true " +
    "neighbors on the real embeddings") {
    val q = e.filter(col("vec_id") < 50)
    val brute = Similarity.bruteKnn(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
    // 16 subspaces x 16 codewords, 10% shortlist: measured 0.848 on
    // this fixed dataset (deterministic — the bound has slack only
    // against intentional fixture regeneration)
    val pq = Pq.pqKnnRerank(e, q, "vec_id", "embedding", k = 5,
        shortlist = 50, m = 16, ksub = 16)
      .select("query_id", "neighbor_id")
    val recall =
      brute.intersect(pq).count().toDouble / brute.count().toDouble
    assert(recall > 0.7, s"recall=$recall")
  }

  test("pqEncode under the corpus's own codebooks reproduces " +
      "pqModel's codes exactly (frozen-codebook append contract)") {
    import spark.implicits._
    val (cents, codes) = Pq.pqModel(e, "vec_id", "embedding",
      m = 4, ksub = 16, rounds = 2)
    val re = Pq.pqEncode(cents, e, "vec_id", "embedding", m = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vid"), col("sub").cast("long"),
        col("code").cast("long")).as[(Long, Long, Long)].collect().toSet
    assert(rows(codes) === rows(re))
  }

  test("ivfPqAgainstIndex over a full-coverage persisted index == " +
      "the one-shot ivfPqKnn") {
    import spark.implicits._
    val q = e.filter(col("vec_id") < 10)
    val oneShot = Pq.ivfPqKnn(e, q, "vec_id", "embedding", k = 5,
        cells = 16, nProbe = 4, m = 4, ksub = 16, rounds = 2)
      .as[(Long, Long, Int, Double)].collect().toSet
    val ix = Similarity.ivfIndex(e, "vec_id", "embedding", cells = 16)
    val (cents, codes) = Pq.pqModel(e, "vec_id", "embedding",
      m = 4, ksub = 16, rounds = 2)
    val viaIndex = Pq.ivfPqAgainstIndex(ix, cents, codes, q,
        "vec_id", "embedding", k = 5, nProbe = 4, m = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(viaIndex === oneShot)
  }

  test("pqKnnRerank scores match bruteKnn cosine on shared pairs") {
    val q = e.filter(col("vec_id") < 10)
    val brute = Similarity.bruteKnn(e, q, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    val pq = Pq.pqKnnRerank(e, q, "vec_id", "embedding", k = 5,
        shortlist = 50, m = 16, ksub = 16)
      .select(col("query_id"), col("neighbor_id"),
        col("cosine").as("pq_cos"))
    val joined = brute.join(pq, Seq("query_id", "neighbor_id")).cache()
    assert(joined.count() > 0)
    assert(joined.filter(col("cosine") =!= col("pq_cos")).count() === 0)
  }
}
