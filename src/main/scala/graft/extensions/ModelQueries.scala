package graft.extensions

import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.TextFns
import graft.operators.{Paging, Pq, Relevance, Similarity, TextAnalysis}
import graft.tables.Tables.{documents, embeddings}

/** Driver-checked queries for the learned-model operators: product
  * quantization ([[graft.operators.Pq]]). The oracles GENERATE
  * per-round mirrored CTEs from the same (m, ksub, rounds) constants
  * the engine runs with, the [[graft.extensions.ExtensionQueries]]
  * `ext_kmeans` technique — every codeword mean runs fixed-point and
  * every ADC sum is exact integer arithmetic, so codes and ranks are
  * bit-identical across engines.
  */
private[graft] object ModelQueries {

  import OracleSql.{TOKS, h32}

  private val M = 4 // subspaces
  private val Ksub = 16 // codewords per subspace
  private val Rounds = 2
  private val Dsub = 16 // dims per subspace (64 / M)
  private val Shortlist = 50 // ADC shortlist the exact re-rank refines

  /** Sequential-fold 64-dim cosine (mirrors VectorFns.cosine — same
    * shape as ExtensionQueries' cosSql).
    */
  private def cos64Sql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(range(1, 65), i -> " +
        s"CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

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

  /** Incremental-PQ oracle CTEs: codebooks train on the RESIDENT
    * corpus only (`trainWhere`), the final encode assign runs over
    * every vector matching `encodeWhere` (default: all) — appending
    * under fixed codebooks must be indistinguishable from encoding
    * that set with the resident-trained model. Ends with
    * `enc(vid, sub, cell)`; `sva` (all subvectors) and
    * `cent$Rounds` stay visible for downstream CTEs.
    */
  private def pqIncSql(trainWhere: String,
                       encodeWhere: String = "TRUE"): String = {
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
       |sva AS (SELECT e.vec_id, s.sub,
       |   list_slice(e.embedding, s.sub * $Dsub + 1,
       |     s.sub * $Dsub + $Dsub) AS sv
       |  FROM embeddings e, subs s),
       |sv AS (SELECT * FROM sva WHERE $trainWhere),
       |seedv AS (SELECT row_number() OVER (ORDER BY $seedH, vec_id) - 1
       |    AS cell, embedding
       |  FROM embeddings WHERE $trainWhere
       |  ORDER BY $seedH, vec_id LIMIT $Ksub),
       |cent1 AS (SELECT s.sub, d.cell,
       |   list_transform(list_slice(d.embedding, s.sub * $Dsub + 1,
       |     s.sub * $Dsub + $Dsub), x -> CAST(x AS DOUBLE)) AS cv
       |  FROM seedv d, subs s),
       |$body,
       |enc AS (SELECT vid, sub, cell FROM (
       |  SELECT v.vec_id AS vid, v.sub, c.cell,
       |   row_number() OVER (PARTITION BY v.vec_id, v.sub
       |     ORDER BY ${d2Sql("v.sv", "c.cv")} ASC, c.cell) AS rn
       |  FROM sva v JOIN cent$Rounds c ON c.sub = v.sub
       |  WHERE $encodeWhere)
       | WHERE rn = 1)""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // PQ codes-appended ingestion: codebooks train on the resident
    // corpus (vec_id % 8 != 0), the newcomers (vec_id % 8 = 0) encode
    // via pqEncode under the FIXED codebooks. The oracle trains on
    // the residents and encodes everyone in one pass — any drift in
    // the frozen-codebook encode path breaks the hash.
    Q("ext_pq_append",
      s"""WITH ${pqIncSql("vec_id % 8 != 0")}
         |SELECT vid AS vec_id, CAST(sub AS INT) AS sub,
         | CAST(cell AS INT) AS code
         |FROM enc ORDER BY vec_id, sub""".stripMargin) { (s, d) =>
      val e = embeddings(s, d).select("vec_id", "embedding")
      val resident = e.filter(pmod(col("vec_id"), lit(8)) =!= 0)
      val (cents, residentCodes) = Pq.pqModel(resident, "vec_id",
        "embedding", m = M, ksub = Ksub, rounds = Rounds)
      val appended = Pq.pqEncode(cents,
        e.filter(pmod(col("vec_id"), lit(8)) === 0), "vec_id",
        "embedding", m = M)
      residentCodes.unionByName(appended)
        .select(col("vid").as("vec_id"), col("sub").cast("int").as("sub"),
          col("code").cast("int").as("code"))
        .orderBy(col("vec_id"), col("sub"))
    },

    // The FULL incremental IVF+PQ serving path (FAISS IVFADC, index
    // as data): coarse centroids from the initial installment
    // (residents < 256), postings grown via ivfAppend; PQ codebooks
    // frozen at the initial build, codes appended via pqEncode; a NEW
    // batch (vec_id % 8 = 0) probes nProbe cells and integer-exact
    // ADC ranks only those candidates. The oracle trains on the
    // initial installment, encodes/files ALL residents in one pass
    // and replays probing + ADC — drift anywhere in the
    // grown-index path breaks the hash.
    Q("ext_knn_ivfpq_incremental", {
      val (cells, nProbe) = (16, 4)
      val seedCos = cos64Sql("c.embedding", "s.s0")
      val probeCos = cos64Sql("q.embedding", "s.s0")
      s"""WITH ${pqIncSql("vec_id % 8 != 0 AND vec_id < 256",
            "v.vec_id % 8 != 0")},
         |seeds AS (SELECT vec_id AS cell0, embedding AS s0
         |  FROM embeddings WHERE vec_id % 8 != 0
         |  ORDER BY vec_id LIMIT $cells),
         |cc AS (SELECT neighbor_id, cell0 FROM (
         |  SELECT c.vec_id AS neighbor_id, s.cell0,
         |   row_number() OVER (PARTITION BY c.vec_id
         |     ORDER BY $seedCos DESC, s.cell0) AS rn
         |  FROM embeddings c, seeds s WHERE c.vec_id % 8 != 0)
         | WHERE rn = 1),
         |qp AS (SELECT query_id, cell0 FROM (
         |  SELECT q.vec_id AS query_id, s.cell0,
         |   row_number() OVER (PARTITION BY q.vec_id
         |     ORDER BY $probeCos DESC, s.cell0) AS rn
         |  FROM embeddings q, seeds s
         |  WHERE q.vec_id % 8 = 0 AND q.vec_id < 80)
         | WHERE rn <= $nProbe),
         |cand AS (SELECT qp.query_id, cc.neighbor_id
         |  FROM cc JOIN qp USING (cell0)
         |  WHERE qp.query_id != cc.neighbor_id),
         |dt AS (SELECT q.vec_id AS query_id, q.sub, c.cell,
         |   CAST(floor((${d2Sql("q.sv", "c.cv")}) * 1000000000.0 + 0.5)
         |     AS BIGINT) AS dfx
         |  FROM sva q JOIN cent$Rounds c ON c.sub = q.sub
         |  WHERE q.vec_id % 8 = 0 AND q.vec_id < 80),
         |adc AS (SELECT n.query_id, n.neighbor_id,
         |   CAST(sum(d.dfx) AS BIGINT) AS afx
         |  FROM cand n
         |  JOIN enc a ON a.vid = n.neighbor_id
         |  JOIN dt d ON d.query_id = n.query_id AND d.sub = a.sub
         |   AND d.cell = a.cell
         |  GROUP BY 1, 2)
         |SELECT query_id, neighbor_id, rank,
         | CAST(afx AS DOUBLE) / 1000000000.0 AS adist FROM (
         | SELECT query_id, neighbor_id, afx,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY afx ASC, neighbor_id) AS INT) AS rank
         | FROM adc) WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin
    }) { (s, d) =>
      val e = embeddings(s, d).select("vec_id", "embedding")
      val resident = e.filter(pmod(col("vec_id"), lit(8)) =!= 0)
      val initial = resident.filter(col("vec_id") < 256)
      val later = resident.filter(col("vec_id") >= 256)
      val ix0 = Similarity.ivfIndex(initial, "vec_id", "embedding",
        cells = 16)
      val ix = Similarity.IvfIndexFrames(ix0.centroids,
        ix0.postings.unionByName(
          Similarity.ivfAppend(ix0, later, "vec_id", "embedding")))
      val (cents, codes0) = Pq.pqModel(initial, "vec_id", "embedding",
        m = M, ksub = Ksub, rounds = Rounds)
      val codes = codes0.unionByName(
        Pq.pqEncode(cents, later, "vec_id", "embedding", m = M))
      Pq.ivfPqAgainstIndex(ix, cents, codes,
          e.filter(pmod(col("vec_id"), lit(8)) === 0 &&
            col("vec_id") < 80),
          "vec_id", "embedding", k = 5, nProbe = 4, m = M)
        .orderBy(col("query_id"), col("rank"))
    },

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
      val cos = cos64Sql("ce.embedding", "qe.embedding")
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
    },

    // IVF + PQ composed (FAISS IVFADC): coarse Voronoi cells bound
    // each query's candidates to nProbe cells; integer-exact ADC over
    // the PQ codes ranks only those. The serving shape of a 100 TB
    // vector corpus — candidates ∝ corpus·nProbe/cells, no raw vector
    // touched after indexing.
    Q("ext_knn_ivfpq", {
      val (cells, nProbe) = (16, 4)
      val seedCos = cos64Sql("c.embedding", "s.s0")
      val probeCos = cos64Sql("q.embedding", "s.s0")
      s"""WITH $pqModelSql,
         |seeds AS (SELECT vec_id AS cell0, embedding AS s0
         |  FROM embeddings WHERE vec_id < $cells),
         |cc AS (SELECT neighbor_id, cell0 FROM (
         |  SELECT c.vec_id AS neighbor_id, s.cell0,
         |   row_number() OVER (PARTITION BY c.vec_id
         |     ORDER BY $seedCos DESC, s.cell0) AS rn
         |  FROM embeddings c, seeds s) WHERE rn = 1),
         |qp AS (SELECT query_id, cell0 FROM (
         |  SELECT q.vec_id AS query_id, s.cell0,
         |   row_number() OVER (PARTITION BY q.vec_id
         |     ORDER BY $probeCos DESC, s.cell0) AS rn
         |  FROM embeddings q, seeds s WHERE q.vec_id < 10)
         | WHERE rn <= $nProbe),
         |cand AS (SELECT qp.query_id, cc.neighbor_id
         |  FROM cc JOIN qp USING (cell0)
         |  WHERE qp.query_id != cc.neighbor_id),
         |dt AS (SELECT q.vec_id AS query_id, q.sub, c.cell,
         |   CAST(floor((${d2Sql("q.sv", "c.cv")}) * 1000000000.0 + 0.5)
         |     AS BIGINT) AS dfx
         |  FROM sv q JOIN cent$Rounds c ON c.sub = q.sub
         |  WHERE q.vec_id < 10),
         |adc AS (SELECT n.query_id, n.neighbor_id,
         |   CAST(sum(d.dfx) AS BIGINT) AS afx
         |  FROM cand n
         |  JOIN a$Rounds a ON a.vid = n.neighbor_id
         |  JOIN dt d ON d.query_id = n.query_id AND d.sub = a.sub
         |   AND d.cell = a.cell
         |  GROUP BY 1, 2)
         |SELECT query_id, neighbor_id, rank,
         | CAST(afx AS DOUBLE) / 1000000000.0 AS adist FROM (
         | SELECT query_id, neighbor_id, afx,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY afx ASC, neighbor_id) AS INT) AS rank
         | FROM adc) WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin
    }) { (s, d) =>
      val e = embeddings(s, d).select("vec_id", "embedding")
      Pq.ivfPqKnn(e, e.filter(col("vec_id") < 10), "vec_id",
          "embedding", k = 5, cells = 16, nProbe = 4,
          m = M, ksub = Ksub, rounds = Rounds)
        .orderBy(col("query_id"), col("rank"))
    },

    // Multinomial Naive Bayes source classifier on a 20% md5-holdout:
    // train on the other 80%, predict each held-out doc's source. The
    // fastText/CCNet-style curation classifier in closed form — Bayes
    // training is pure aggregation, so the whole model AND every
    // prediction is bit-reproducible in SQL (fixed-point ln terms,
    // exact-integer argmax).
    Q("ext_nb_classify", {
      val h = h32("CAST(doc_id AS VARCHAR)")
      s"""WITH tr AS (SELECT source AS lab, unnest($TOKS) AS tok
         |  FROM documents WHERE $h % 100 >= 20),
         |clt AS (SELECT lab, tok, count(*) AS c FROM tr GROUP BY 1, 2),
         |v AS (SELECT count(DISTINCT tok) AS vv FROM clt),
         |lt AS (SELECT lab, CAST(sum(c) AS BIGINT) AS tl FROM clt
         |  GROUP BY 1),
         |dl AS (SELECT source AS lab, count(*) AS dlc FROM documents
         |  WHERE $h % 100 >= 20 GROUP BY 1),
         |dt AS (SELECT count(*) AS dtc FROM documents
         |  WHERE $h % 100 >= 20),
         |model AS (SELECT l.lab,
         |   CAST(floor((ln(CAST(d.dlc AS DOUBLE)) -
         |     ln(CAST(t.dtc AS DOUBLE))) * 1000000.0 + 0.5) AS BIGINT)
         |     AS pfx,
         |   CAST(floor(ln(CAST(l.tl + v.vv AS DOUBLE)) * 1000000.0 + 0.5)
         |     AS BIGINT) AS lfx
         |  FROM lt l JOIN dl d ON d.lab = l.lab, dt t, v),
         |lnc AS (SELECT lab, tok,
         |   CAST(floor(ln(CAST(c + 1 AS DOUBLE)) * 1000000.0 + 0.5)
         |     AS BIGINT) AS wfx FROM clt),
         |occ AS (SELECT doc_id, tok, count(*) AS m FROM (
         |  SELECT doc_id, unnest($TOKS) AS tok FROM documents
         |  WHERE $h % 100 < 20) GROUP BY 1, 2),
         |nd AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS n FROM occ
         |  GROUP BY 1),
         |hits AS (SELECT o.doc_id, l.lab,
         |   CAST(sum(o.m * l.wfx) AS BIGINT) AS hfx
         |  FROM occ o JOIN lnc l USING (tok) GROUP BY 1, 2),
         |sc AS (SELECT n.doc_id, m.lab,
         |   m.pfx + COALESCE(h.hfx, 0) - n.n * m.lfx AS sfx
         |  FROM nd n CROSS JOIN model m
         |  LEFT JOIN hits h ON h.doc_id = n.doc_id AND h.lab = m.lab)
         |SELECT s.doc_id, d.source, s.lab AS pred_source,
         | CAST(s.sfx AS DOUBLE) / 1000000.0 AS score
         |FROM (SELECT doc_id, lab, sfx, row_number() OVER (
         |   PARTITION BY doc_id ORDER BY sfx DESC, lab) AS rn FROM sc) s
         |JOIN documents d USING (doc_id)
         |WHERE s.rn = 1 ORDER BY s.doc_id""".stripMargin
    }) { (s, d) =>
      val docs = documents(s, d)
      val h = TextFns.hash32(col("doc_id").cast("string")) % 100
      TextAnalysis.nbClassify(docs.filter(h >= 20), docs.filter(h < 20),
          "source", "doc_id", "text")
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("pred_source"),
          col("score"))
        .orderBy(col("doc_id"))
    },

    // Okapi BM25 top-20 over the documents corpus — the production
    // ranking function behind ext_tfidf/w3's linear scorer. Constants
    // are interpolated from the SAME doubles the engine uses, and
    // every float op runs in the same order, so the scores (hence the
    // ranking) hash-match bit-for-bit.
    Q("ext_bm25", {
      val (k1, b) = (1.2, 0.75)
      val terms = Seq("data", "table", "scan")
      def term(t: String, df: String) =
        s"""CASE WHEN $df > 0 THEN
           |  (ln(1.0 + (CAST(n - $df AS DOUBLE) + 0.5) /
           |    (CAST($df AS DOUBLE) + 0.5))
           |   * (CAST(len(list_filter(tk, x -> x = '$t')) AS DOUBLE)
           |      * ${k1 + 1.0}))
           |  / (CAST(len(list_filter(tk, x -> x = '$t')) AS DOUBLE)
           |     + $k1 * (${1.0 - b} +
           |        ($b * CAST(len(tk) AS DOUBLE)) / avgdl))
           |  ELSE 0.0 END""".stripMargin
      val dfs = terms.zipWithIndex.map { case (t, i) =>
        s"sum(CASE WHEN list_contains($TOKS, '$t') THEN 1 ELSE 0 END)" +
          s" AS df$i"
      }.mkString(",\n  ")
      val scoreSum = terms.zipWithIndex
        .map { case (t, i) => s"(${term(t, s"df$i")})" }
        .mkString("(", " + ", ")")
      s"""WITH s AS (SELECT count(*) AS n,
         |  CAST(sum(len($TOKS)) AS BIGINT) AS sdl,
         |  $dfs
         | FROM documents),
         |s2 AS (SELECT *,
         |  CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE) AS avgdl FROM s),
         |sc AS (SELECT doc_id, $scoreSum AS score
         | FROM (SELECT doc_id, $TOKS AS tk FROM documents), s2)
         |SELECT doc_id, score, CAST(rn AS INT) AS rn FROM (
         | SELECT doc_id, score,
         |  row_number() OVER (ORDER BY score DESC, doc_id) AS rn
         | FROM sc WHERE score > 0)
         |WHERE rn <= 20 ORDER BY rn""".stripMargin
    }) { (s, d) =>
      val scored = Relevance.bm25(
          documents(s, d).select(col("doc_id"), col("text")),
          "text", "data table scan")
        .withColumn("__negscore", -col("score"))
      Paging.paginate(scored, Seq("__negscore", "doc_id"),
          from = 0, size = 20)
        .select(col("doc_id"), col("score"), col("rn"))
        .orderBy(col("rn"))
    },

    // Batch BM25 retrieval: five query rows (one with a vocabulary
    // miss, one single-term) ranked top-10 each over the corpus, the
    // multi-query counterpart of ext_bm25. Per-term scores quantize to
    // 1e-6 fixed point before the cross-row sum, so the oracle's
    // identical ln/tf/dl arithmetic (data-side df this time — nothing
    // interpolated) hash-matches the BIGINT scores exactly.
    Q("ext_bm25_batch",
      s"""WITH $bmBatchCtes
         |SELECT qid, doc_id, rank, score_fx FROM r
         |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin) { (s, d) =>
      Relevance.bm25Batch(
          documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", fixtureQueries(s), "qid", "qtext", k = 10)
        .orderBy(col("qid"), col("rank"))
    },

    // Retrieval evaluation over the SAME batch-BM25 run: recall@10,
    // MRR and nDCG@10 against arithmetic qrels (10 judged docs per
    // query, doc_id ≡ 3·qid mod 50). The oracle rebuilds the run CTE
    // and the metric arithmetic — DCG terms quantized to the identical
    // fixed point, recall/MRR/nDCG as single exact-integer divisions —
    // so every metric double hash-matches bit-for-bit.
    Q("ext_retrieval_metrics", {
      val ln2 = math.log(2.0)
      def dcgFx(rank: String) =
        s"CAST(floor((1.0 / (ln(CAST($rank + 1 AS DOUBLE)) / $ln2))" +
          " * 1000000.0 + 0.5) AS BIGINT)"
      s"""WITH $bmBatchCtes,
         |qr AS (SELECT (d.doc_id % 50) // 3 AS qid, d.doc_id
         |  FROM documents d
         |  WHERE d.doc_id % 50 <= 12 AND (d.doc_id % 50) % 3 = 0),
         |nr AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_rel
         |  FROM qr GROUP BY 1),
         |h AS (SELECT r.qid, CAST(count(*) AS BIGINT) AS hits,
         |  min(r.rank) AS minrank,
         |  CAST(sum(${dcgFx("r.rank")}) AS BIGINT) AS dcg_fx
         | FROM r JOIN qr ON r.qid = qr.qid AND r.doc_id = qr.doc_id
         | WHERE r.rank <= 10 GROUP BY 1),
         |i AS (SELECT nr.qid,
         |  CAST(sum(${dcgFx("g.i")}) AS BIGINT) AS idcg_fx
         | FROM nr, range(1, 11) g(i) WHERE g.i <= least(nr.n_rel, 10)
         | GROUP BY 1)
         |SELECT nr.qid, nr.n_rel,
         | CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
         | CAST(coalesce(h.hits, 0) AS DOUBLE) / CAST(nr.n_rel AS DOUBLE)
         |  AS recall,
         | CASE WHEN h.minrank IS NULL THEN 0.0
         |  ELSE 1.0 / CAST(h.minrank AS DOUBLE) END AS mrr,
         | CASE WHEN h.dcg_fx IS NULL THEN 0.0
         |  ELSE CAST(h.dcg_fx AS DOUBLE) / CAST(i.idcg_fx AS DOUBLE)
         |  END AS ndcg
         |FROM nr LEFT JOIN h ON nr.qid = h.qid
         | JOIN i ON nr.qid = i.qid
         |ORDER BY nr.qid""".stripMargin
    }) { (s, d) =>
      val run = Relevance.bm25Batch(
        documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", fixtureQueries(s), "qid", "qtext", k = 10)
      val m = pmod(col("doc_id"), lit(50))
      val qrels = documents(s, d)
        .filter(m <= 12 && pmod(m, lit(3)) === 0)
        .select(expr("(doc_id % 50) div 3").as("qid"), col("doc_id"))
      Relevance.retrievalMetrics(run, "qid", "doc_id", "rank",
          qrels, "qid", "doc_id", k = 10)
        .orderBy(col("qid"))
    })

  /** The five fixture retrieval queries shared by `ext_bm25_batch` and
    * `ext_retrieval_metrics` (one vocabulary miss, one single-term).
    */
  private def fixtureQueries(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq((0L, "data table"), (1L, "scan filter"),
      (2L, "hash join merge"), (3L, "vector stream"),
      (4L, "zzzunseen table")).toDF("qid", "qtext")
  }

  /** Shared oracle CTE chain mirroring [[Relevance.bm25Batch]] over
    * [[fixtureQueries]] — ends in `r(qid, doc_id, score_fx, rank)`.
    * Constants are interpolated from the SAME Scala doubles the engine
    * folds into its plan (k1+1.0 is NOT guaranteed to equal a literal
    * 2.2 bit-for-bit); df/ln run data-side in both engines.
    */
  private lazy val bmBatchCtes: String = {
    val (k1, b) = (1.2, 0.75)
    s"""t AS (SELECT doc_id, $TOKS AS tk FROM documents),
       |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(len(tk)) AS BIGINT) AS sdl FROM t),
       |q(qid, qtext) AS (VALUES
       |  (CAST(0 AS BIGINT), 'data table'),
       |  (CAST(1 AS BIGINT), 'scan filter'),
       |  (CAST(2 AS BIGINT), 'hash join merge'),
       |  (CAST(3 AS BIGINT), 'vector stream'),
       |  (CAST(4 AS BIGINT), 'zzzunseen table')),
       |qt AS (SELECT qid, u.x AS term
       |  FROM q, unnest(string_split(qtext, ' ')) u(x)),
       |tf AS (SELECT doc_id, u.x AS term,
       |  CAST(count(*) AS BIGINT) AS tf,
       |  any_value(len(tk)) AS dl
       | FROM t, unnest(tk) u(x)
       | WHERE u.x IN (SELECT DISTINCT term FROM qt)
       | GROUP BY 1, 2),
       |dfx AS (SELECT term, CAST(count(*) AS BIGINT) AS dft
       |  FROM tf GROUP BY 1),
       |sc AS (SELECT qt.qid, tf.doc_id,
       |  CAST(sum(CAST(floor(
       |   ((ln(1.0 + (CAST(s.n - dfx.dft AS DOUBLE) + 0.5) /
       |      (CAST(dfx.dft AS DOUBLE) + 0.5))
       |     * (CAST(tf.tf AS DOUBLE) * ${k1 + 1.0}))
       |    / (CAST(tf.tf AS DOUBLE) + $k1 * (${1.0 - b} +
       |       ($b * CAST(tf.dl AS DOUBLE)) /
       |        (CAST(s.sdl AS DOUBLE) / CAST(s.n AS DOUBLE)))))
       |   * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS score_fx
       | FROM tf JOIN dfx USING (term) JOIN qt USING (term), s
       | GROUP BY 1, 2),
       |r AS (SELECT qid, doc_id, score_fx, CAST(row_number() OVER (
       |   PARTITION BY qid ORDER BY score_fx DESC, doc_id) AS INT)
       |  AS rank FROM sc)""".stripMargin
  }
}
