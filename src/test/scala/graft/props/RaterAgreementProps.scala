package graft.props

import graft.SparkSpec
import graft.operators.Stats
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based check of [[Stats.raterAgreement]] against a direct
  * in-memory evaluation of the leave-one-out consensus rule: random
  * rating tables with duplicate votes, sole raters and tied
  * consensus exercise the dedup, the drop rule and the
  * (count desc, category asc) tie-break.
  */
object RaterAgreementProps extends Properties("raterAgreement") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val ratingsGen: Gen[Seq[(Long, String, String)]] =
    Gen.sequence[Seq[Seq[(Long, String, String)]],
        Seq[(Long, String, String)]](
      (0L until 10L).map(item => for {
        n <- Gen.choose(0, 8) // 0/1 raters exercise the drop rule
        rows <- Gen.listOfN(n, for {
          rater <- Gen.oneOf("r1", "r2", "r3", "r4")
          cat <- Gen.oneOf("a", "b", "c")
        } yield (item, rater, cat)) // duplicate (item, rater) likely
      } yield rows)).map(_.flatten)

  private def model(rows: Seq[(Long, String, String)])
      : Map[String, (Long, Long, Double)] = {
    // one vote per (item, rater): the smallest category
    val votes = rows.groupBy(r => (r._1, r._2))
      .map { case ((it, rt), rs) => (it, rt, rs.map(_._3).min) }.toSeq
    val perRater = votes.groupBy(_._1).toSeq.flatMap {
      case (_, itemVotes) =>
        itemVotes.flatMap { case (_, rt, own) =>
          val others = itemVotes.filter(_._2 != rt)
          if (others.isEmpty) None
          else {
            val tally = others.groupBy(_._3).view
              .mapValues(_.size).toMap
            val mj = tally.toSeq.minBy { case (c, n) => (-n, c) }._1
            Some(rt -> (mj == own))
          }
        }
    }
    perRater.groupBy(_._1).map { case (rt, xs) =>
      val n = xs.size.toLong
      val ag = xs.count(_._2).toLong
      rt -> ((n, ag, ag.toDouble / n))
    }
  }

  property("matches the direct leave-one-out consensus evaluation") =
    Prop.forAll(ratingsGen) { rows =>
      val want = model(rows)
      val got =
        if (rows.isEmpty) Map.empty[String, (Long, Long, Double)]
        else Stats.raterAgreement(rows.toDF("item", "rater", "cat"),
            "item", "rater", "cat")
          .as[(String, Long, Long, Double)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      Prop(got == want) :| s"got=$got want=$want rows=$rows"
    }
}
