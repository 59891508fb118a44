package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def docs() = Seq(
    (1L, "spark spark spark spark spark spark spark spark"), // high tf, long
    (2L, "spark engine"), // low tf, short
    (3L, "spark spark engine"),
    (4L, "flink only here"),
    (5L, "nothing relevant at all whatsoever in this one longer doc")
  ).toDF("id", "text")

  test("bm25 drops zero-score docs and scores all matches") {
    val r = Relevance.bm25(docs(), "text", "spark").collect()
    assert(r.map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
  }

  test("bm25 tf saturation: 8x term repeats do not give 8x score") {
    val r = Relevance.bm25(docs(), "text", "spark")
      .select("id", "score")
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // doc 1 has 8 occurrences vs doc 3's 2, but BM25 saturates tf
    assert(r(1L) < 4 * r(3L))
    assert(r(1L) > 0 && r(3L) > 0)
  }

  test("bm25 length normalization: same tf, shorter doc wins") {
    val d = Seq(
      (10L, "spark is fast"),
      (11L, "spark is fast and also many many many more words here")
    ).toDF("id", "text")
    val r = Relevance.bm25(d, "text", "spark")
      .select("id", "score")
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(10L) > r(11L))
  }

  test("bm25 multi-term scores add; missing term contributes zero") {
    val one = Relevance.bm25(docs(), "text", "engine")
      .select("id", "score")
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val both = Relevance.bm25(docs(), "text", "engine nosuchterm")
      .select("id", "score")
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(one.keySet === both.keySet)
    one.foreach { case (id, s) => assert(both(id) === s) }
  }

  test("bm25 rejects reserved column collisions") {
    val bad = docs().withColumn("score", lit(1))
    intercept[IllegalArgumentException] {
      Relevance.bm25(bad, "text", "spark")
    }
  }

  test("bm25 idf orders rare terms above common ones at equal tf") {
    val d = Seq(
      (20L, "common rare"),
      (21L, "common word"),
      (22L, "common term"),
      (23L, "common thing")
    ).toDF("id", "text")
    val r = Relevance.bm25(d, "text", "common rare")
      .select("id", "score")
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // doc 20 matches both; the rare term must contribute more than
    // common does for the others
    assert(r(20L) > 2 * r(21L))
  }

  test("bm25Batch ranks each query like single-query bm25, drops " +
      "unmatched queries, fixed-point scores track the doubles") {
    val qs = Seq((0L, "spark"), (1L, "engine flink"),
      (2L, "zzznothinghere")).toDF("qid", "qtext")
    val got = Relevance.bm25Batch(docs(), "id", "text", qs,
        "qid", "qtext", k = 3)
      .select($"qid", $"id", $"rank", $"score_fx")
      .as[(Long, Long, Int, Long)].collect().toSeq
    // query 2 matches nothing -> no rows
    assert(!got.exists(_._1 == 2L))
    // query 0: same doc order as the single-query operator
    val single = Relevance.bm25(docs(), "text", "spark")
      .orderBy($"score".desc, $"id").select($"id")
      .as[Long].collect().toSeq
    val batch0 = got.filter(_._1 == 0L).sortBy(_._3).map(_._2)
    assert(batch0 === single.take(3))
    // fixed-point scores match the double scores to quantization
    val singleScores = Relevance.bm25(docs(), "text", "spark")
      .select($"id", $"score")
      .as[(Long, Double)].collect().toMap
    got.filter(_._1 == 0L).foreach { case (_, id, _, fx) =>
      assert(math.abs(fx - singleScores(id) * 1e6) <= 1.0,
        s"doc $id fx=$fx vs ${singleScores(id) * 1e6}")
    }
    // query 1 matches engine (docs 2,3) and flink (doc 4)
    assert(got.filter(_._1 == 1L).map(_._2).toSet === Set(2L, 3L, 4L))
  }

  test("retrievalMetrics: hand-computed recall/MRR/nDCG, zeros for a " +
      "judged query the run never matched") {
    val run = Seq((0L, 10L, 1), (0L, 20L, 2), (0L, 30L, 3))
      .toDF("qid", "doc", "rank")
    val qrels = Seq((0L, 20L), (0L, 99L), (1L, 50L))
      .toDF("qid", "doc")
    val got = Relevance.retrievalMetrics(run, "qid", "doc", "rank",
        qrels, "qid", "doc", k = 10)
      .as[(Long, Long, Long, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    val (q0, q1) = (got(0), got(1))
    assert(q0._2 === 2L && q0._3 === 1L)      // n_rel=2, hit d20@rank2
    assert(q0._4 === 0.5 && q0._5 === 0.5)    // recall, mrr
    // dcg = fx(1/log2(3)); idcg = fx(1/log2(2)) + fx(1/log2(3))
    val t3 = math.floor(1.0 / (math.log(3.0) / math.log(2.0))
      * 1e6 + 0.5)
    assert(q0._6 === t3 / (1000000.0 + t3))
    assert(q1 === ((1L, 1L, 0L, 0.0, 0.0, 0.0)))
  }

  test("retrievalMetrics: duplicate (qid, doc) pairs in run or qrels " +
      "never inflate hits/n_rel/DCG — run dups keep the best rank") {
    val run = Seq((0L, 10L, 1), (0L, 20L, 2), (0L, 30L, 3),
        (0L, 20L, 5)) // duplicate retrieval of d20 at a worse rank
      .toDF("qid", "doc", "rank")
    val qrels = Seq((0L, 20L), (0L, 20L), (0L, 99L), (1L, 50L), (1L, 50L))
      .toDF("qid", "doc") // duplicate judgments
    val got = Relevance.retrievalMetrics(run, "qid", "doc", "rank",
        qrels, "qid", "doc", k = 10)
      .as[(Long, Long, Long, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    // identical to the dup-free case above: n_rel=2, one hit at rank 2
    val (q0, q1) = (got(0), got(1))
    assert(q0._2 === 2L && q0._3 === 1L)
    assert(q0._4 === 0.5 && q0._5 === 0.5)
    val t3 = math.floor(1.0 / (math.log(3.0) / math.log(2.0))
      * 1e6 + 0.5)
    assert(q0._6 === t3 / (1000000.0 + t3))
    assert(q1 === ((1L, 1L, 0L, 0.0, 0.0, 0.0)))
  }

  test("ndcgAtK: hand graded value, perfect ranking exactly 1, " +
      "no-relevant query null, binary grades reduce to gain 1") {
    // q0: grade-1 at rank 1, grade-3 at rank 2, grade-0 at rank 3
    val run = Seq((0L, 1L, 1), (0L, 2L, 3), (0L, 3L, 0),
      (1L, 1L, 3), (1L, 2L, 1),  // q1: already ideal
      (2L, 1L, 0), (2L, 2L, 0))  // q2: nothing relevant
      .toDF("qid", "rnk", "rel")
    val got = Relevance.ndcgAtK(run, "qid", "rnk", "rel", k = 3)
      .as[(Long, Double, Double, Option[Double])]
      .collect().sortBy(_._1).toSeq
    val w = Relevance.dcgTable(3).map(_._2 / 1e12).toArray
    val dcg0 = 1 * w(0) + 7 * w(1)
    val idcg0 = 7 * w(0) + 1 * w(1)
    assert(math.abs(got(0)._2 - dcg0) < 1e-9)
    assert(math.abs(got(0)._3 - idcg0) < 1e-9)
    assert(math.abs(got(0)._4.get - dcg0 / idcg0) < 1e-9)
    assert(got(1)._4 === Some(1.0)) // ideal order: exact 1
    assert(got(2)._2 === 0.0 && got(2)._3 === 0.0 &&
      got(2)._4 === None)
    // binary 0/1 grades: gains are exactly 1 — nDCG matches the
    // hand formula with unit gains
    val bin = Seq((0L, 1L, 0), (0L, 2L, 1), (0L, 3L, 1))
      .toDF("qid", "rnk", "rel")
    val b = Relevance.ndcgAtK(bin, "qid", "rnk", "rel", k = 3)
      .as[(Long, Double, Double, Option[Double])].head()
    assert(math.abs(b._4.get - (w(1) + w(2)) / (w(0) + w(1))) < 1e-9)
    // a query whose every judged row sits PAST k has an empty top-k
    // but a real ideal: that's nDCG 0 (missed everything), not the
    // null reserved for "no relevant document"
    val deep = Seq((0L, 11L, 3), (0L, 12L, 1))
      .toDF("qid", "rnk", "rel")
    val dres = Relevance.ndcgAtK(deep, "qid", "rnk", "rel", k = 3)
      .as[(Long, Double, Double, Option[Double])].head()
    assert(dres._2 === 0.0 && dres._3 > 0 && dres._4 === Some(0.0))
  }

  test("mrrAtK: hand mean with the miss-zero convention; depth " +
      "cutoff turns a deep hit into a miss") {
    val run = Seq((0L, 1L, 0), (0L, 3L, 2),  // first hit rank 3
      (1L, 1L, 0), (1L, 2L, 0),              // no hit: rr 0
      (2L, 1L, 1))                           // hit at rank 1
      .toDF("qid", "rnk", "rel")
    val got = Relevance.mrrAtK(run, "qid", "rnk", "rel", k = 10)
      .as[(Long, Long, Option[Double])].head()
    assert(got._1 === 3L && got._2 === 2L)
    assert(math.abs(got._3.get - (1.0 / 3 + 0.0 + 1.0) / 3) < 1e-9)
    // k = 2 pushes q0's rank-3 hit out
    val cut = Relevance.mrrAtK(run, "qid", "rnk", "rel", k = 2)
      .as[(Long, Long, Option[Double])].head()
    assert(cut._2 === 1L)
    assert(math.abs(cut._3.get - 1.0 / 3) < 1e-9)
  }

  test("recallAtK: per-query coverage, unjudged query reports null " +
      "on the spine") {
    val run = Seq((0L, 1L, 1), (0L, 2L, 0), (0L, 11L, 2),
      (0L, 12L, 1),           // q0: 3 relevant, 1 in top-10
      (1L, 1L, 0), (1L, 2L, 0)) // q1: no relevant docs at all
      .toDF("qid", "rnk", "rel")
    val got = Relevance.recallAtK(run, "qid", "rnk", "rel", k = 10)
      .as[(Long, Long, Long, Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(got(0) === ((0L, 1L, 3L, Some(1.0 / 3))))
    assert(got(1) === ((1L, 0L, 0L, None)))
  }

  test("rbo: identical runs score the truncated-mass maximum, " +
      "disjoint runs 0, partial overlap matches a direct per-depth " +
      "evaluation, one-sided queries still report") {
    val p = 0.9; val k = 10
    // T(1) = Σ_{d=1..k} (1−p)p^(d−1)/d (the depth-1 entry sums every
    // per-depth weight INCLUDING the /d); `mass` = Σ d·w_d is the
    // full-k identical-run maximum
    val mass = (1 to k).map(d => (1 - p) * math.pow(p, d - 1)).sum
    val t1 = (1 to k).map(d => (1 - p) * math.pow(p, d - 1) / d).sum
    assert(math.abs(
      Relevance.rboTable(p, k).head._2 / 1e12 - t1) < 1e-9)
    val runA = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L),
      (2L, 10L, 1L), (3L, 77L, 1L))
      .toDF("q", "doc", "r")
    // q1: same set, ranks 1/2 swapped; q2: disjoint; q3: only in A
    val runB = Seq((1L, 20L, 1L), (1L, 10L, 2L), (1L, 30L, 3L),
      (2L, 99L, 1L))
      .toDF("q", "doc", "r")
    val got = Relevance.rbo(runA, runB, "q", "doc", "r", p, k)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // identical-run sanity: A vs A — each of q1's 3 docs enters at
    // its own rank, so rbo = T(1)+T(2)+T(3) (a SUB-k list cannot
    // reach the full truncated mass: X_d/d < 1 past the list end)
    val tbl = Relevance.rboTable(p, k).toMap
    val self = Relevance.rbo(runA, runA, "q", "doc", "r", p, k)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(math.abs(self(1L) -
      (tbl(1) + tbl(2) + tbl(3)) / 1e12) < 1e-9)
    assert(math.abs(self(2L) - tbl(1) / 1e12) < 1e-9)
    assert(self(1L) < mass)
    // q1 direct evaluation: docs 10,20 enter at depth 2, doc 30 at 3
    // → X_1 = 0, X_2 = 2, X_3.. = 3
    val w = (1 to k).map(d => (1 - p) * math.pow(p, d - 1) / d)
    val want = 2 * w(1) + 3 * w.drop(2).sum
    assert(got(1L)._2 === 3L)
    assert(math.abs(got(1L)._3 - want) < 1e-6)
    assert(got(2L) === ((2L, 0L, 0.0)))
    assert(got(3L) === ((3L, 0L, 0.0)))
  }

  test("rrfFuse: cross-run agreement outranks any single run; ties " +
      "break by ascending doc; exact fixed-point terms") {
    val runs = Seq(
      (1L, 10L, 1), (1L, 20L, 2), // run A
      (1L, 20L, 1), (1L, 30L, 2), // run B: d20 in both runs
      (2L, 40L, 1), (2L, 50L, 1)) // q2: two runs, rank-1 tie
      .toDF("q", "doc", "rank")
    val got = Relevance.rrfFuse(runs, "q", "doc", "rank", k = 3)
      .select("q", "doc", "rrf_fx", "rank")
      .as[(Long, Long, Long, Int)].collect()
      .sortBy(t => (t._1, t._4)).toSeq
    def fx(ranks: Int*) =
      ranks.map(r => math.floor(1.0 / (60.0 + r) * 1e12 + 0.5).toLong)
        .sum
    assert(got === Seq(
      (1L, 20L, fx(2, 1), 1), // 1/62 + 1/61 beats either alone
      (1L, 10L, fx(1), 2),
      (1L, 30L, fx(2), 3),
      (2L, 40L, fx(1), 1),    // equal scores: ascending doc
      (2L, 50L, fx(1), 2)))
  }
}
