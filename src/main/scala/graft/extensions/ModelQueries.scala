package graft.extensions

import org.apache.spark.sql.functions._
import graft.Q
import graft.operators.Pq
import graft.tables.Tables.embeddings

/** Driver-checked queries for the learned-model operators: product
  * quantization ([[graft.operators.Pq]]). The oracles GENERATE
  * per-round mirrored CTEs from the same (m, ksub, rounds) constants
  * the engine runs with, the [[graft.extensions.ExtensionQueries]]
  * `ext_kmeans` technique — every codeword mean runs fixed-point and
  * every ADC sum is exact integer arithmetic, so codes and ranks are
  * bit-identical across engines.
  */
private[graft] object ModelQueries {

  import OracleSql.h32

  private val M = 4 // subspaces
  private val Ksub = 16 // codewords per subspace
  private val Rounds = 2
  private val Dsub = 16 // dims per subspace (64 / M)
  private val Shortlist = 50 // ADC shortlist the exact re-rank refines

  /** Sequential-fold squared L2 between a sliced float subvector and a
    * double codeword list (mirrors Pq.sqDist).
    */
  private def d2Sql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, ${Dsub + 1}), i -> " +
      s"(CAST($a[i] AS DOUBLE) - $b[i]) * (CAST($a[i] AS DOUBLE) - $b[i])))"

  /** Shared model CTEs: subvectors, hash-ordered seeds, `Rounds`
    * assign/recompute passes. Ends with cent$Rounds (codebooks) and
    * a$Rounds (final corpus codes).
    */
  private val pqModelSql: String = {
    val seedH = h32("CAST(vec_id AS VARCHAR)")
    def assignCte(r: Int) =
      s"""a$r AS (SELECT vid, sub, cell FROM (
         |  SELECT v.vec_id AS vid, v.sub, c.cell,
         |   row_number() OVER (PARTITION BY v.vec_id, v.sub
         |     ORDER BY ${d2Sql("v.sv", "c.cv")} ASC, c.cell) AS rn
         |  FROM sv v JOIN cent$r c ON c.sub = v.sub) WHERE rn = 1)"""
        .stripMargin
    def recomputeCte(r: Int) =
      s"""m$r AS (SELECT a.sub, a.cell, u.i,
         |   (CAST(${OracleSql.fxSql("CAST(v.sv[u.i] AS DOUBLE)",
                                     "1000000000.0")} AS DOUBLE)
         |    / 1000000000.0) / CAST(count(*) AS DOUBLE) AS mc
         |  FROM a$r a JOIN sv v ON v.vec_id = a.vid AND v.sub = a.sub,
         |   unnest(range(1, ${Dsub + 1})) AS u(i)
         |  GROUP BY a.sub, a.cell, u.i),
         |cent${r + 1} AS (SELECT sub, cell, list(mc ORDER BY i) AS cv
         |  FROM m$r GROUP BY sub, cell)""".stripMargin
    val body = (1 until Rounds)
      .map(r => s"${assignCte(r)},\n${recomputeCte(r)}")
      .mkString(",\n")
    s"""subs AS (SELECT unnest(range(0, $M)) AS sub),
       |sv AS (SELECT e.vec_id, s.sub,
       |   list_slice(e.embedding, s.sub * $Dsub + 1,
       |     s.sub * $Dsub + $Dsub) AS sv
       |  FROM embeddings e, subs s),
       |seedv AS (SELECT row_number() OVER (ORDER BY $seedH, vec_id) - 1
       |    AS cell, embedding
       |  FROM embeddings ORDER BY $seedH, vec_id LIMIT $Ksub),
       |cent1 AS (SELECT s.sub, d.cell,
       |   list_transform(list_slice(d.embedding, s.sub * $Dsub + 1,
       |     s.sub * $Dsub + $Dsub), x -> CAST(x AS DOUBLE)) AS cv
       |  FROM seedv d, subs s),
       |$body,
       |${assignCte(Rounds)}""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // The compressed corpus itself: every (vector, subspace) codeword
    // id — the 64-float -> m-byte artifact a 100 TB pipeline persists.
    Q("ext_pq_codes",
      s"""WITH $pqModelSql
         |SELECT vid AS vec_id, CAST(sub AS INT) AS sub,
         | CAST(cell AS INT) AS code
         |FROM a$Rounds ORDER BY vec_id, sub""".stripMargin) { (s, d) =>
      Pq.pqCodes(embeddings(s, d).select("vec_id", "embedding"),
          "vec_id", "embedding", m = M, ksub = Ksub, rounds = Rounds)
        .select(col("vec_id"), col("sub").cast("int").as("sub"),
          col("code").cast("int").as("code"))
        .orderBy(col("vec_id"), col("sub"))
    },

    // ADC top-5: queries score candidates by summing per-subspace
    // table distances over the codes — integer-exact, so rank order is
    // engine-independent.
    Q("ext_knn_pq",
      s"""WITH $pqModelSql,
         |dt AS (SELECT q.vec_id AS query_id, q.sub, c.cell,
         |   CAST(floor((${d2Sql("q.sv", "c.cv")}) * 1000000000.0 + 0.5)
         |     AS BIGINT) AS dfx
         |  FROM sv q JOIN cent$Rounds c ON c.sub = q.sub
         |  WHERE q.vec_id < 10),
         |adc AS (SELECT d.query_id, a.vid AS neighbor_id,
         |   CAST(sum(d.dfx) AS BIGINT) AS afx
         |  FROM a$Rounds a JOIN dt d ON d.sub = a.sub AND d.cell = a.cell
         |  WHERE d.query_id != a.vid
         |  GROUP BY 1, 2)
         |SELECT query_id, neighbor_id, rank,
         | CAST(afx AS DOUBLE) / 1000000000.0 AS adist FROM (
         | SELECT query_id, neighbor_id, afx,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY afx ASC, neighbor_id) AS INT) AS rank
         | FROM adc) WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      val e = embeddings(s, d).select("vec_id", "embedding")
      Pq.pqKnn(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, m = M, ksub = Ksub, rounds = Rounds)
        .orderBy(col("query_id"), col("rank"))
    },

    // The production serving path: ADC shortlists `Shortlist`
    // candidates from the compressed corpus, exact cosine re-ranks
    // only those (FAISS search-then-refine). The oracle mirrors both
    // stages — integer ADC cut, then the same sequential-fold cosine
    // every ext_knn gate uses.
    Q("ext_knn_pq_rerank", {
      def dot(x: String, y: String) =
        s"list_sum(list_transform(range(1, 65), i -> " +
          s"CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
      val cos = s"(${dot("ce.embedding", "qe.embedding")} / " +
        s"(sqrt(${dot("ce.embedding", "ce.embedding")}) * " +
        s"sqrt(${dot("qe.embedding", "qe.embedding")})))"
      s"""WITH $pqModelSql,
         |dt AS (SELECT q.vec_id AS query_id, q.sub, c.cell,
         |   CAST(floor((${d2Sql("q.sv", "c.cv")}) * 1000000000.0 + 0.5)
         |     AS BIGINT) AS dfx
         |  FROM sv q JOIN cent$Rounds c ON c.sub = q.sub
         |  WHERE q.vec_id < 10),
         |adc AS (SELECT d.query_id, a.vid AS neighbor_id,
         |   CAST(sum(d.dfx) AS BIGINT) AS afx
         |  FROM a$Rounds a JOIN dt d ON d.sub = a.sub AND d.cell = a.cell
         |  WHERE d.query_id != a.vid
         |  GROUP BY 1, 2),
         |short AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY afx ASC, neighbor_id) AS rn
         |  FROM adc) WHERE rn <= $Shortlist)
         |SELECT query_id, neighbor_id, rank, cosine FROM (
         | SELECT s.query_id, s.neighbor_id,
         |  CAST(row_number() OVER (PARTITION BY s.query_id
         |    ORDER BY $cos DESC, s.neighbor_id) AS INT) AS rank,
         |  $cos AS cosine
         | FROM short s
         | JOIN embeddings ce ON ce.vec_id = s.neighbor_id
         | JOIN embeddings qe ON qe.vec_id = s.query_id)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    }) { (s, d) =>
      val e = embeddings(s, d).select("vec_id", "embedding")
      Pq.pqKnnRerank(e, e.filter(col("vec_id") < 10), "vec_id",
          "embedding", k = 5, shortlist = Shortlist,
          m = M, ksub = Ksub, rounds = Rounds)
        .orderBy(col("query_id"), col("rank"))
    })
}
