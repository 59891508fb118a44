package graft.operators

import graft.functions.Cols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** ES-style lexical relevance scoring for match queries — the ordering
  * the reference's `detailByItem` gets from Elasticsearch `_score`
  * (publisher/.../PublisherMapperImpl.java:194: the page comes back in
  * relevance order). SURVEY §2.6 sanctioned deterministic key order as
  * the default; this operator closes the residual fidelity gap with a
  * score an external oracle can reproduce bit-for-bit:
  *
  *   score(row) = Σ_t  tf_t(text) · N / df_t      over query tokens t
  *
  * — term frequency × LINEAR inverse document frequency, the same
  * exactness trade as [[Corpus.tfidf]]: `ln` is not required to be
  * correctly rounded so a log-idf can differ across engines in the
  * last bit, while tf·N is an exact integer product and the single
  * division is the one rounding step. Ties order by the caller's key
  * columns, keeping the full ordering deterministic and hash-checkable.
  * Zero-score rows (no query token present) are dropped — a match
  * query never returns non-matching docs.
  *
  * Scale shape: ONE scalar aggregate computes N and every per-token df
  * in a single pass (a 1-row frame, broadcast onto the rows); the
  * score itself is a narrow projection. No token-keyed joins, no
  * windows — ordering is the caller's problem and should go through
  * [[Paging.paginate]] (TakeOrderedAndProject), never a global window.
  */
object Relevance {

  /** Append `score` to `df` and drop zero-score rows. Document
    * frequencies come from `corpus` when given (e.g. the whole day's
    * store while `df` is already match-filtered — ES computes idf over
    * the index, not the hit set), else from `df` itself. Term order in
    * the score sum is the query's token order — double addition is
    * order-sensitive, and a SQL oracle must add in the same order.
    */
  def scored(df: DataFrame, textCol: String, query: String,
             corpus: Option[DataFrame] = None): DataFrame = {
    val qs = query.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .distinct.toSeq
    require(qs.nonEmpty, "relevance needs a non-empty query")
    // withColumn REPLACES an existing `score` silently, and a column
    // named like the broadcast stats frame's would make the term
    // expressions ambiguous — same reserved-name contract as scd2
    val reserved = df.columns.toSet.intersect(
      Set("score", "__n") ++ qs.indices.map(i => s"__df_$i"))
    require(reserved.isEmpty,
      s"input columns collide with relevance's working columns: " +
        s"$reserved")
    val toks = Cols.tokens(col(textCol))
    val aggs = count(lit(1)).as("__n") +:
      qs.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(toks, t), 1L).otherwise(0L))
          .as(s"__df_$i")
      }
    val stats = corpus.getOrElse(df).agg(aggs.head, aggs.tail: _*)
    val termScores: Seq[Column] = qs.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(toks, x => x === t))
      when(col(s"__df_$i") > 0,
        (tf * col("__n")).cast(DoubleType) /
          col(s"__df_$i").cast(DoubleType))
        .otherwise(lit(0.0))
    }
    df.crossJoin(broadcast(stats))
      .withColumn("score", termScores.reduce(_ + _))
      .drop("__n" +: qs.indices.map(i => s"__df_$i"): _*)
      .filter(col("score") > 0)
  }

  /** Okapi BM25 relevance — the standard ranking function [[scored]]'s
    * linear-idf approximates (Robertson & Zaragoza, "The Probabilistic
    * Relevance Framework: BM25 and Beyond", 2009). Saturating tf and
    * length normalization make it the scorer an external search system
    * actually runs:
    *
    *   score = Σ_t ln(1 + (N − df_t + 0.5)/(df_t + 0.5))
    *             · tf_t·(k1+1) / (tf_t + k1·(1 − b + b·dl/avgdl))
    *
    * Determinism contract: every float step happens in the SAME
    * operation order on both engines — per-term expressions add in
    * query-token order, constants are interpolated from the same
    * doubles — so scores (and the ranking) are bit-identical, not just
    * close. Same scale shape as [[scored]]: ONE scalar aggregate
    * (N, Σdl, per-token df) broadcast onto the rows, then a narrow
    * projection; ordering goes through Paging's TakeOrdered.
    *
    * Zero-score rows (no query token present) are dropped.
    */
  def bm25(df: DataFrame, textCol: String, query: String,
           k1: Double = 1.2, b: Double = 0.75,
           corpus: Option[DataFrame] = None): DataFrame = {
    val qs = query.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .distinct.toSeq
    require(qs.nonEmpty, "bm25 needs a non-empty query")
    val reserved = df.columns.toSet.intersect(
      Set("score", "__n", "__sdl", "__avgdl") ++
        qs.indices.map(i => s"__df_$i"))
    require(reserved.isEmpty,
      s"input columns collide with bm25's working columns: $reserved")
    val toks = Cols.tokens(col(textCol))
    val aggs = Seq(count(lit(1)).as("__n"),
      sum(size(toks).cast("long")).as("__sdl")) ++
      qs.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(toks, t), 1L).otherwise(0L))
          .as(s"__df_$i")
      }
    val stats = corpus.getOrElse(df).agg(aggs.head, aggs.tail: _*)
    val avgdl =
      col("__sdl").cast(DoubleType) / col("__n").cast(DoubleType)
    val dl = size(toks).cast(DoubleType)
    val termScores: Seq[Column] = qs.zipWithIndex.map { case (t, i) =>
      val dfT = col(s"__df_$i")
      val tf = size(filter(toks, x => x === t)).cast(DoubleType)
      val idf = log(lit(1.0) +
        ((col("__n") - dfT).cast(DoubleType) + lit(0.5)) /
          (dfT.cast(DoubleType) + lit(0.5)))
      val denom = tf +
        lit(k1) * (lit(1.0 - b) + (lit(b) * dl) / col("__avgdl"))
      when(dfT > 0, (idf * (tf * lit(k1 + 1.0))) / denom)
        .otherwise(lit(0.0))
    }
    df.crossJoin(broadcast(stats))
      .withColumn("__avgdl", avgdl)
      .withColumn("score", termScores.reduce(_ + _))
      .drop("__n" +: "__sdl" +: "__avgdl" +:
        qs.indices.map(i => s"__df_$i"): _*)
      .filter(col("score") > 0)
  }

  /** Batch Okapi BM25 retrieval: the top-`k` corpus documents for
    * EVERY query row — the multi-query counterpart of [[bm25]], which
    * interpolates its (few) query terms into the plan and so cannot
    * serve a query TABLE. Hard-negative mining over text, RAG
    * candidate generation and eval-set retrieval all score query
    * batches. Output: `(qidCol, idCol, rank, score_fx)` — `score_fx`
    * is the per-(query, doc) BM25 sum in 1e-6 fixed point
    * ([[Cols.fxTerm]] per matched term, exact BIGINT sum: a raw
    * cross-ROW double sum would be partition-order-dependent). Queries
    * with no matching term return no rows (BM25 of an unmatched query
    * is empty, as in [[bm25]]'s zero-score drop).
    *
    * Scale shape: corpus stats (N, Σdl) are one driver scalar; the
    * query-term set broadcasts into the corpus token explode, so the
    * corpus filters to query terms BEFORE any aggregation; document
    * frequencies aggregate on the already-small tf frame; the final
    * per-(query, doc) rollup is an integer hash agg and the top-k is
    * the bounded-heap aggregate (map-side) — the corpus is never
    * broadcast, never windowed.
    */
  def bm25Batch(corpus: DataFrame, idCol: String, textCol: String,
                queries: DataFrame, qidCol: String, qTextCol: String,
                k1: Double = 1.2, b: Double = 0.75,
                k: Int = 10): DataFrame = {
    val base = corpus.select(col(idCol).as("__doc"),
      Cols.tokens(col(textCol)).as("__tk"))
    val st = base.agg(count(lit(1)),
      sum(size(col("__tk")).cast("long"))).head()
    val n = st.getLong(0)
    // read n BEFORE sdl: on an empty corpus the sum is null and
    // getLong would NPE ahead of the intended error
    require(n > 0, "bm25Batch needs a non-empty corpus")
    val sdl = st.getLong(1)
    val avgdl = sdl.toDouble / n.toDouble
    val qt = queries.select(col(qidCol).as("__qid"),
        explode(array_distinct(Cols.tokens(col(qTextCol))))
          .as("__term"))
      .filter(length(col("__term")) > 0)
    val terms = qt.select(col("__term")).distinct()
    val tf = base.select(col("__doc"),
        size(col("__tk")).cast(DoubleType).as("__dl"),
        explode(col("__tk")).as("__term"))
      .join(broadcast(terms), Seq("__term"))
      .groupBy(col("__doc"), col("__term"))
      .agg(count(lit(1)).cast(DoubleType).as("__tf"),
        first(col("__dl")).as("__dl"))
    val dft = tf.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    // float-op order mirrors bm25's termScores exactly — an oracle
    // must reproduce score_fx bit-for-bit
    val idf = log(lit(1.0) +
      ((lit(n) - col("__df")).cast(DoubleType) + lit(0.5)) /
        (col("__df").cast(DoubleType) + lit(0.5)))
    val denom = col("__tf") +
      lit(k1) * (lit(1.0 - b) + (lit(b) * col("__dl")) / lit(avgdl))
    val term = (idf * (col("__tf") * lit(k1 + 1.0))) / denom
    val perPair = tf.join(broadcast(dft), Seq("__term"))
      .join(broadcast(qt), Seq("__term"))
      .select(col("__qid"), col("__doc"),
        Cols.fxTerm(term, 1000000.0).as("__fx"))
      .groupBy(col("__qid"), col("__doc"))
      .agg(sum(col("__fx")).as("__score"))
    Similarity.topK(perPair.select(col("__qid").as("query_id"),
        col("__doc").as("neighbor_id"),
        col("__score").cast(DoubleType).as("cosine")), k)
      .select(col("query_id").as(qidCol), col("neighbor_id").as(idCol),
        col("rank"), col("cosine").cast("long").as("score_fx"))
  }

  /** Retrieval-run evaluation against relevance judgments — the
    * metric pass that closes the [[bm25Batch]] /
    * [[Similarity.hardNegatives]] loop (a retriever you can't score
    * you can't tune). One row per JUDGED query:
    * `(qidCol, n_rel, hits, recall, mrr, ndcg)` over the top-`k` of a
    * ranked run; queries judged but unmatched by the run report zeros
    * (silent drops would overstate the run). Duplicate (qid, doc)
    * pairs in either input are tolerated: qrels dedup exactly, run
    * rows dedup keeping the best (minimum) rank.
    *
    * Exactness: recall = hits/n_rel and MRR = 1/first-hit-rank are
    * single divisions of exact integers; each DCG term
    * 1/(ln(rank+1)/ln 2) quantizes to 1e-6 fixed point
    * ([[Cols.fxTerm]]) before the order-independent integer sum, and
    * nDCG is one further exact-integer division by the ideal DCG
    * built from the same quantized terms.
    *
    * Scale shape: the run is ≤ |queries|·k rows and qrels is
    * |queries|·judgments — two hash aggs and two equi-joins on
    * query-sized frames; nothing corpus-sized is touched.
    */
  def retrievalMetrics(run: DataFrame, qidCol: String, docCol: String,
                       rankCol: String, qrels: DataFrame,
                       qrelQidCol: String, qrelDocCol: String,
                       k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ln2 = math.log(2.0)
    def dcgTerm(rank: Column): Column =
      lit(1.0) / (log(rank.cast(DoubleType) + lit(1.0)) / lit(ln2))
    // both inputs dedup on (qid, doc) first: repeated qrel rows or a
    // run listing a doc twice would multiply through the equi-join and
    // inflate hits/n_rel/DCG (a doc can only be retrieved once — the
    // best/min rank is the one that scores)
    val rel = qrels.select(col(qrelQidCol).as("__qid"),
      col(qrelDocCol).as("__doc")).distinct()
    val nrel = rel.groupBy(col("__qid"))
      .agg(count(lit(1)).as("n_rel"))
    val hits = run.select(col(qidCol).as("__qid"),
        col(docCol).as("__doc"), col(rankCol).as("__rank"))
      .filter(col("__rank") <= k)
      .groupBy(col("__qid"), col("__doc"))
      .agg(min(col("__rank")).as("__rank"))
      .join(rel, Seq("__qid", "__doc"))
      .groupBy(col("__qid"))
      .agg(count(lit(1)).as("hits"),
        min(col("__rank")).as("__minrank"),
        sum(Cols.fxTerm(dcgTerm(col("__rank")), 1000000.0))
          .as("__dcg_fx"))
    val idcgFx = aggregate(
      sequence(lit(1L), least(col("n_rel"), lit(k.toLong))),
      lit(0L), (acc, i) => acc + Cols.fxTerm(dcgTerm(i), 1000000.0))
    nrel.join(hits, Seq("__qid"), "left_outer")
      .select(col("__qid").as(qidCol), col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast(DoubleType) /
          col("n_rel").cast(DoubleType)).as("recall"),
        when(col("__minrank").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("__minrank").cast(DoubleType))
          .as("mrr"),
        when(col("__dcg_fx").isNull, lit(0.0))
          .otherwise(col("__dcg_fx").cast(DoubleType) /
            idcgFx.cast(DoubleType)).as("ndcg"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard
    * hybrid-search ensembling step: merge ANY number of per-query
    * ranked runs (lexical BM25, dense ANN, ...) into one ranking by
    * summing `1 / (k0 + rank)` per (query, doc) across runs, k0 = 60
    * canonically. Rank-based, so the runs' score scales never need
    * calibrating — why RRF is the default fusion in production hybrid
    * retrieval. Input: `runs(queryCol, docCol, rankCol)` — the union
    * of the runs, one row per (run, query, doc); output: the fused
    * top-`k` per query as (query, doc, rrf_fx, rrf, rank), ties by
    * ascending doc.
    *
    * Determinism: each 1/(k0+rank) term is quantized to 1e-12 fixed
    * point ([[graft.functions.Cols.fxTerm]]; terms ≤ 1/(k0+1), so even
    * 10^6 runs per doc stay far inside 2^53) and summed as exact
    * integers — the fused order cannot depend on float add order, and
    * a SQL oracle reproduces it bit-for-bit.
    *
    * Scale shape: ONE hash aggregation keyed (query, doc) —
    * map-side combining — and one per-query window whose groups hold
    * only that query's fused candidates (≤ Σ run depths, hundreds).
    */
  def rrfFuse(runs: DataFrame, queryCol: String, docCol: String,
              rankCol: String, k: Int, k0: Int = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(k0 >= 0, s"k0 must be >= 0, got $k0")
    import org.apache.spark.sql.expressions.Window
    val term = lit(1.0) /
      (lit(k0.toDouble) + col(rankCol).cast(DoubleType))
    val fused = runs
      .groupBy(col(queryCol), col(docCol))
      .agg(sum(Cols.fxTerm(term, 1e12)).as("rrf_fx"))
    fused
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryCol))
          .orderBy(col("rrf_fx").desc, col(docCol)))
        .cast("int"))
      .filter(col("rank") <= k)
      .select(col(queryCol), col(docCol), col("rrf_fx"),
        (col("rrf_fx").cast(DoubleType) / lit(1e12)).as("rrf"),
        col("rank"))
  }
  /** Per-depth rank-biased-overlap contribution table: `T(m) =
    * Σ_{d=m..k} (1−p)·p^(d−1)/d`, 1e12 fixed-point — the TOTAL weight
    * an item entering the intersection at depth m adds to truncated
    * RBO. Computed ONCE driver-side with plain doubles and shared
    * with the SQL oracle as literals, so `pow` (which no engine
    * guarantees correctly rounded) never executes data-side in either
    * engine.
    */
  private[graft] def rboTable(p: Double, k: Int): Seq[(Int, Long)] = {
    val w = (1 to k).map(d => (1 - p) * math.pow(p, d - 1) / d)
    (1 to k).map { m =>
      val t = w.drop(m - 1).sum
      m -> math.floor(t * 1e12 + 0.5).toLong
    }
  }

  /** Rank-biased overlap (Webber et al., TOIS 2010) between two
    * ranked runs, truncated at depth `k` — the label-free ranker
    * comparison: "did swapping the embedding model / BM25 params
    * actually change what users see", weighted so rank-1 disagreement
    * matters most (weight (1−p)p^(d−1) at depth d; p = 0.9 ≈ the
    * top-10 carrying ~86 % of the mass). Per query:
    * `RBO@k = Σ_d (1−p)p^(d−1)·|A_d ∩ B_d|/d`, computed WITHOUT
    * per-depth set intersections: an item in both runs enters the
    * intersection at depth m = max(rank_A, rank_B) and contributes
    * the CLOSED per-m total [[rboTable]] — so the whole metric is one
    * (query, doc) equi-join, a ≤ k-row broadcast join and a
    * query-keyed hash agg; exact fixed-point sums, identical
    * cross-engine because the weight table is shared literally.
    * Queries present in either run report (0 overlap → rbo 0.0); one
    * row per query: (query, n_overlap, rbo). 1-based ranks; rows
    * past `k` ignore.
    */
  def rbo(runA: DataFrame, runB: DataFrame, queryCol: String,
          docCol: String, rankCol: String, p: Double = 0.9,
          k: Int = 20): DataFrame = {
    require(p > 0 && p < 1, s"p must be in (0, 1), got $p")
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    val sp = runA.sparkSession
    import sp.implicits._
    val t = broadcast(rboTable(p, k).toDF("__m", "__tfx"))
    def side(run: DataFrame, r: String): DataFrame =
      run.filter(col(rankCol) <= k && col(rankCol) >= 1)
        .select(col(queryCol), col(docCol), col(rankCol).as(r))
    val joined = side(runA, "__ra").join(side(runB, "__rb"),
        Seq(queryCol, docCol))
      .withColumn("__m",
        greatest(col("__ra"), col("__rb")).cast("int"))
      .join(t, "__m")
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_overlap"), sum(col("__tfx")).as("__s"))
    val queries = runA.select(col(queryCol))
      .union(runB.select(col(queryCol))).distinct()
    queries.join(joined, Seq(queryCol), "left")
      .na.fill(0L, Seq("n_overlap", "__s"))
      .select(col(queryCol), col("n_overlap"),
        (col("__s").cast(DoubleType) / 1e12).as("rbo"))
  }

}
