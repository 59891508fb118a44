package graft.extensions

import org.apache.spark.sql.functions._
import graft.Q
import graft.operators.{Projection, Similarity}
import graft.tables.Tables.embeddings

/** Driver-checked queries for Johnson–Lindenstrauss embedding
  * compression ([[graft.operators.Projection]]): the projection itself,
  * and exact ANN run entirely in the compressed space — the 4×-cheaper
  * scan path a 100 TB embedding corpus would take. The oracle embeds
  * the SAME plan-time sign constants, so both gates are full
  * bit-for-bit hash matches.
  */
private[graft] object ProjectionQueries {

  private val InDim = 64
  private val OutDim = 16

  /** DuckDB list literal of the 16 projected dims for `embeddings`. */
  private def projListSql(alias: String): String =
    "list_value(" + (0 until OutDim)
      .map(j => Projection.oracleDim(s"$alias.embedding", InDim, OutDim, j))
      .mkString(", ") + ")"

  /** 16-dim cosine over projected lists (same shape as the 64-dim
    * oracle cosine the ext_knn gates already hash-match).
    */
  private def cosProjSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(range(1, ${OutDim + 1}), i -> " +
        s"$x[i] * $y[i]))"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  val all: Seq[Q] = Seq(

    // Flattened to scalar (vec_id, dim, value) rows: the driver's compare
    // harness hashes scalar cells only (an array column made this gate
    // unrunnable in round 6), and the flattened form bit-verifies every
    // projected double directly instead of transitively via the knn gate.
    Q("ext_rproj",
      s"""WITH p AS (SELECT e.vec_id, ${projListSql("e")} AS proj
         |  FROM embeddings e)
         |SELECT p.vec_id, CAST(d.dim AS INT) AS dim,
         |  p.proj[CAST(d.dim AS INT) + 1] AS value
         |FROM p, range($OutDim) d(dim)
         |ORDER BY vec_id, dim""".stripMargin) { (s, d) =>
      Projection.randomProject(
          embeddings(s, d).select("vec_id", "embedding"),
          "embedding", InDim, OutDim)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim", "value")))
        .orderBy(col("vec_id"), col("dim"))
    },

    Q("ext_rproj_knn", {
      val cos = cosProjSql("c.pv", "q.pv")
      s"""WITH p AS (SELECT e.vec_id, ${projListSql("e")} AS pv
         |  FROM embeddings e)
         |SELECT query_id, neighbor_id, rank, cosine FROM (
         | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  CAST(row_number() OVER (PARTITION BY q.vec_id
         |    ORDER BY $cos DESC, c.vec_id) AS INT) AS rank,
         |  $cos AS cosine
         | FROM p q JOIN p c ON q.vec_id != c.vec_id
         | WHERE q.vec_id < 10)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    }) { (s, d) =>
      val proj = Projection.randomProject(
        embeddings(s, d).select("vec_id", "embedding"),
        "embedding", InDim, OutDim)
      Similarity.bruteKnn(proj, proj.filter(col("vec_id") < 10),
          "vec_id", "proj", k = 5)
        .orderBy(col("query_id"), col("rank"))
    })
}
