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

  /** Per-rank DCG discount table: `w(r) = 1/log2(r+1)`, 1e12
    * fixed-point — computed ONCE driver-side and shared with the SQL
    * oracle as literals (the [[rboTable]] pattern: `log` is not
    * guaranteed correctly rounded, so no transcendental ever executes
    * data-side in either engine).
    */
  private[graft] def dcgTable(k: Int): Seq[(Int, Long)] =
    (1 to k).map { r =>
      r -> math.floor(1e12 / (math.log(r + 1.0) / math.log(2.0))
        + 0.5).toLong
    }

  /** nDCG@k (Järvelin & Kekäläinen, TOIS 2002) over a judged run —
    * one row per (query, doc) with a 1-based `rankCol` (unique per
    * query) and an integer GRADED `relCol` ≥ 0: the ranking-quality
    * acceptance metric for a retrieval stack (exponential gains
    * 2^rel − 1, so a grade-3 hit at rank 1 dominates three grade-1
    * hits). This is [[retrievalMetrics]]' nDCG generalized to GRADES
    * and the annotated-run input shape (relevance as a column, not a
    * separate binary qrels table; binary 0/1 grades reduce to gains
    * of exactly 1, but the IDCG convention differs — the ideal here
    * re-ranks the query's own judged pool rather than assuming
    * n_rel perfect hits); use [[retrievalMetrics]] when judgments
    * live in a qrels table and one pass should also return
    * recall/MRR. `DCG@k = Σ_{r≤k} (2^rel − 1)·w(r)`; the IDEAL ranking
    * re-sorts the query's own judged documents by grade (zero-gain
    * docs contribute nothing at any position, so the ideal window
    * runs over `rel > 0` rows only — the pool a real run keeps
    * small). Gains are exact integers, discounts come from the
    * shared literal [[dcgTable]], products run in DECIMAL with
    * 19-digit factors, so both engines sum identical integers; the
    * one division closes. One row per query: (query, dcg, idcg,
    * ndcg) — ndcg null when the query has no relevant document
    * (nothing to rank). Grades above ~40 would overflow the 2^rel
    * long gain — grades are small ordinals by construction.
    *
    * Scale shape: two rank-bounded filters, a ≤ k-row broadcast
    * join each, one query-partitioned window over RELEVANT docs only
    * (groups ≤ judged-relevant per query), two query-keyed hash aggs,
    * one outer join onto the query spine. Nothing driver-side but
    * the k-row literal table.
    */
  def ndcgAtK(run: DataFrame, queryCol: String, rankCol: String,
              relCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val sp = run.sparkSession
    import sp.implicits._
    def d19(c: Column) = c.cast(DecimalType(19, 0))
    val t = broadcast(dcgTable(k).toDF("__r", "__wfx"))
    val gain = expr(s"shiftleft(1L, cast($relCol as int)) - 1L")
    val judged = run.filter(col(relCol).isNotNull &&
      col(relCol) >= 0 && col(rankCol) >= 1)
    val dcg = judged.filter(col(rankCol) <= k)
      .join(t, col(rankCol).cast("int") === col("__r"))
      .groupBy(col(queryCol))
      .agg(sum(d19(gain) * d19(col("__wfx"))).as("__dcg"))
    val ideal = judged.filter(col(relCol) > 0)
      .withColumn("__ir", row_number().over(
        Window.partitionBy(col(queryCol))
          .orderBy(col(relCol).desc)))
      .filter(col("__ir") <= k)
      .join(t, col("__ir") === col("__r"))
      .groupBy(col(queryCol))
      .agg(sum(d19(gain) * d19(col("__wfx"))).as("__idcg"))
    run.select(col(queryCol)).distinct()
      .join(dcg, Seq(queryCol), "left")
      .join(ideal, Seq(queryCol), "left")
      .select(col(queryCol),
        coalesce(col("__dcg").cast(DoubleType) / 1e12, lit(0.0))
          .as("dcg"),
        coalesce(col("__idcg").cast(DoubleType) / 1e12, lit(0.0))
          .as("idcg"),
        when(col("__idcg").isNotNull,
          // numerator coalesces to 0 (mirroring the oracle): a query
          // whose every judged row sits past k has an empty DCG group
          // but a REAL ideal — that's nDCG 0 (missed everything), not
          // the null reserved for "no relevant document"
          coalesce(col("__dcg").cast(DoubleType), lit(0.0)) /
            col("__idcg").cast(DoubleType)).as("ndcg"))
  }

  /** Mean reciprocal rank at depth `k` over the same judged-run shape
    * as [[ndcgAtK]] — the "how far does a user scroll to the first
    * good hit" metric: per query RR = 1/rank of the first relevant
    * document within the top k (0 when none — the standard MRR@k
    * miss convention, so absent queries PULL the mean down instead of
    * silently dropping). The AGGREGATE twin of [[retrievalMetrics]]'
    * per-query mrr: that one reports each JUDGED query;
    * this one folds the whole run — every query in it, judged or
    * not — to the single number a dashboard tracks. The reciprocal is one IEEE division
    * (exactly mirrored), per-query values fx-sum at 1e12. One row:
    * (n_queries, n_hit, mrr); mrr null when the run is empty.
    *
    * Scale shape: one filtered query-keyed hash agg (min rank), one
    * spine outer join, one 1-row agg.
    */
  def mrrAtK(run: DataFrame, queryCol: String, rankCol: String,
             relCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val first = run
      .filter(col(relCol).isNotNull && col(relCol) > 0 &&
        col(rankCol) >= 1 && col(rankCol) <= k)
      .groupBy(col(queryCol))
      .agg(min(col(rankCol)).as("__fr"))
    val rr = when(col("__fr").isNotNull,
      lit(1.0) / col("__fr").cast(DoubleType)).otherwise(lit(0.0))
    run.select(col(queryCol)).distinct()
      .join(first, Seq(queryCol), "left")
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("__fr").isNotNull, 1L).otherwise(0L)).as("n_hit"),
        Cols.fxSum(rr, 1e12).as("__s"))
      .select(col("n_queries"), col("n_hit"),
        when(col("n_queries") > 0,
          col("__s").cast(DoubleType) / 1e12 /
            col("n_queries").cast(DoubleType)).as("mrr"))
  }

  /** Recall@k over the same judged-run shape — per query, the share
    * of its relevant documents surfaced in the top k. Exact integer
    * counts; the one division closes. One row per query: (query,
    * n_rel_topk, n_rel, recall) — recall null when the query has no
    * relevant document. [[retrievalMetrics]]' recall on the
    * annotated-run shape: that one needs a separate qrels table and
    * reports judged queries only; this one keeps EVERY query in the
    * run on the spine (a query with no relevant docs reports null,
    * not absence — the "our judgments don't cover this query" signal).
    *
    * Scale shape: one query-keyed hash agg with conditional counts,
    * one spine outer join.
    */
  def recallAtK(run: DataFrame, queryCol: String, rankCol: String,
                relCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val rel = run.filter(col(relCol).isNotNull && col(relCol) > 0 &&
        col(rankCol) >= 1)
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_rel"),
        sum(when(col(rankCol) <= k, 1L).otherwise(0L))
          .as("n_rel_topk"))
    run.select(col(queryCol)).distinct()
      .join(rel, Seq(queryCol), "left")
      .na.fill(0L, Seq("n_rel", "n_rel_topk"))
      .select(col(queryCol), col("n_rel_topk"), col("n_rel"),
        when(col("n_rel") > 0,
          col("n_rel_topk").cast(DoubleType) /
            col("n_rel").cast(DoubleType)).as("recall"))
  }

}
