package graft.props

import graft.SparkSpec
import graft.operators.Similarity
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based check of [[Similarity.annRecall]] against an
  * in-memory set model, over random ranked neighbor frames — ranks
  * beyond k, queries missing from one side, empty approx lists, and
  * partial overlaps all occur constantly at these sizes, which is
  * exactly where the rank filter, the left join and the shortfall
  * accounting could drift.
  *
  * Batched execution (the WinnowProps discipline): each trial packs
  * 40 random queries into ONE annRecall call/collect.
  */
object AnnRecallProps extends Properties("annRecall") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5) // 5 batches × 40 random queries

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val K = 5

  /** One query's ranked list: distinct neighbor ids paired with
    * distinct ranks drawn from 1..10 (so some rows sit beyond k).
    */
  private val listGen: Gen[Seq[(Long, Int)]] = for {
    n <- Gen.choose(0, 8)
    ids <- Gen.pick(n, 0L until 15L)
    ranks <- Gen.pick(n, 1 to 10)
  } yield ids.toSeq.zip(ranks.toSeq)

  private val trialGen: Gen[Seq[(Long, Seq[(Long, Int)], Seq[(Long, Int)])]] =
    Gen.sequence[Seq[(Long, Seq[(Long, Int)], Seq[(Long, Int)])],
        (Long, Seq[(Long, Int)], Seq[(Long, Int)])](
      (0L until 40L).map(q =>
        for { a <- listGen; e <- listGen } yield (q, a, e)))

  /** Reference: per query WITH exact rows at rank ≤ K,
    * (n_exact, n_overlap, recall).
    */
  private def model(
      qs: Seq[(Long, Seq[(Long, Int)], Seq[(Long, Int)])])
      : Map[Long, (Long, Long, Double)] =
    qs.flatMap { case (q, approx, exact) =>
      val e = exact.collect { case (id, r) if r <= K => id }.toSet
      val a = approx.collect { case (id, r) if r <= K => id }.toSet
      if (e.isEmpty) None
      else {
        val ov = (e intersect a).size
        Some(q -> ((e.size.toLong, ov.toLong, ov.toDouble / e.size)))
      }
    }.toMap

  property("matches the set model on random ranked frames") =
    Prop.forAll(trialGen) { qs =>
      val approx = qs.flatMap { case (q, a, _) =>
        a.map { case (id, r) => (q, id, r) } }
        .toDF("query_id", "neighbor_id", "rank")
      val exact = qs.flatMap { case (q, _, e) =>
        e.map { case (id, r) => (q, id, r) } }
        .toDF("query_id", "neighbor_id", "rank")
      val got = Similarity.annRecall(approx, exact, K)
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val want = model(qs)
      Prop(got == want) :| s"got=$got want=$want"
    }
}
