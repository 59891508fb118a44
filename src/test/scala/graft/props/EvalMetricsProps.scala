package graft.props

import graft.SparkSpec
import graft.operators.Stats
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based checks of the eval/label-QA metrics against
  * independent in-memory models:
  *
  *  - [[Stats.passAtK]] vs the EXACT binomial form
  *    1 − C(n−c, k)/C(n, k) computed with BigInt — an independent
  *    derivation of the product form the operator (and the paper)
  *    uses, so an off-by-one in the fold bounds cannot hide;
  *  - [[Stats.fleissKappa]] vs a direct in-memory evaluation of the
  *    Fleiss 1971 formulas over random rating tables — random
  *    category skew, under-rated items and all-agree items exercise
  *    the drop rule, the marginals and the κ edge cases.
  */
object EvalMetricsProps extends Properties("evalMetrics") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // ---- pass@k vs exact binomials ------------------------------------

  private val samplesGen: Gen[(Seq[(Long, Boolean)], Int)] = for {
    k <- Gen.choose(1, 4)
    rows <- Gen.sequence[Seq[(Long, Boolean)], (Long, Boolean)](
      (0 until 120).map(_ => for {
        p <- Gen.choose(0L, 14L)
        ok <- Gen.oneOf(true, false)
      } yield (p, ok)))
  } yield (rows, k)

  private def choose(n: Long, k: Long): BigInt =
    if (k < 0 || k > n) BigInt(0)
    else (0L until k).foldLeft(BigInt(1))((a, i) => a * (n - i) / (i + 1))

  property("passAtK matches the exact binomial estimator") =
    Prop.forAll(samplesGen) { case (rows, k) =>
      val got = Stats.passAtK(rows.toDF("problem", "passed"),
          "problem", "passed", k)
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val want = rows.groupBy(_._1).collect {
        case (p, rs) if rs.size >= k =>
          val n = rs.size.toLong
          val c = rs.count(_._2).toLong
          val miss = BigDecimal(choose(n - c, k)) / BigDecimal(choose(n, k))
          p -> ((n, c, (BigDecimal(1) - miss).toDouble))
      }
      val ok = got.keySet == want.keySet && got.forall { case (p, g) =>
        val w = want(p)
        g._1 == w._1 && g._2 == w._2 && math.abs(g._3 - w._3) < 1e-9
      }
      Prop(ok) :| s"k=$k got=$got want=$want"
    }

  // ---- Fleiss' kappa vs the direct formula --------------------------

  private val ratingsGen: Gen[Seq[(Long, String)]] =
    Gen.sequence[Seq[Seq[(Long, String)]], Seq[(Long, String)]](
      (0L until 12L).map(item => for {
        n <- Gen.choose(0, 6)
        cats <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
      } yield cats.map(item -> _))).map(_.flatten)

  private def fleissModel(rows: Seq[(Long, String)])
      : Option[(Long, Long, Double, Double, Option[Double])] = {
    val byItem = rows.groupBy(_._1).filter(_._2.size >= 2)
    if (byItem.isEmpty) None
    else {
      val pis = byItem.values.map { rs =>
        val ni = rs.size.toDouble
        val sq = rs.groupBy(_._2).values.map(g => g.size.toDouble * g.size)
          .sum
        (sq - ni) / (ni * (ni - 1))
      }
      val pBar = pis.sum / pis.size
      val nTotal = byItem.values.map(_.size).sum.toDouble
      val pe = byItem.values.flatten.groupBy(_._2).values
        .map(g => (g.size / nTotal) * (g.size / nTotal)).sum
      val kappa = if (pe == 1.0) None
        else Some((pBar - pe) / (1.0 - pe))
      Some((byItem.size.toLong, nTotal.toLong, pBar, pe, kappa))
    }
  }

  property("fleissKappa matches the direct Fleiss-1971 evaluation") =
    Prop.forAll(ratingsGen) { rows =>
      fleissModel(rows) match {
        case None =>
          // all items under-rated: the operator must still return its
          // one-row report with n_items = 0 and null metrics (the
          // deterministic StatsSpec twin pins the exact shape)
          val r = Stats.fleissKappa(rows.toDF("item", "cat"),
            "item", "cat").head()
          Prop(r.getLong(0) == 0L && r.isNullAt(2) && r.isNullAt(4)) :|
            s"degenerate report: $r"
        case Some((mi, mn, mpb, mpe, mk)) =>
          val r = Stats.fleissKappa(rows.toDF("item", "cat"),
            "item", "cat").head()
          val ok = r.getLong(0) == mi && r.getLong(1) == mn &&
            math.abs(r.getDouble(2) - mpb) < 1e-8 &&
            math.abs(r.getDouble(3) - mpe) < 1e-8 &&
            (mk match {
              case None => r.isNullAt(4)
              case Some(k) =>
                !r.isNullAt(4) && math.abs(r.getDouble(4) - k) < 1e-7
            })
          Prop(ok) :| s"got=$r want=($mi,$mn,$mpb,$mpe,$mk)"
      }
    }

  // ---- Krippendorff's alpha vs the direct nominal formula ------------

  private def alphaModel(rows: Seq[(Long, String)])
      : Option[(Long, Long, Option[Double])] = {
    val byItem = rows.groupBy(_._1).filter(_._2.size >= 2)
    if (byItem.isEmpty) None
    else {
      val n = byItem.values.map(_.size).sum.toLong
      val dObs = byItem.values.map { rs =>
        val m = rs.size.toDouble
        rs.groupBy(_._2).values
          .map(g => g.size * (m - g.size) / (m - 1)).sum
      }.sum
      val nc = byItem.values.flatten.groupBy(_._2).view
        .mapValues(_.size.toLong).toMap
      val de = nc.values.map(c => c * (n - c)).sum
      val alpha = if (de == 0L) None
        else Some(1.0 - (n - 1) * dObs / de.toDouble)
      Some((byItem.size.toLong, n, alpha))
    }
  }

  property("krippendorffAlpha matches the direct nominal-alpha " +
      "evaluation") =
    Prop.forAll(ratingsGen) { rows =>
      val r = Stats.krippendorffAlpha(rows.toDF("item", "cat"),
        "item", "cat").head()
      alphaModel(rows) match {
        case None =>
          Prop(r.getLong(0) == 0L && r.isNullAt(2)) :|
            s"degenerate report: $r"
        case Some((mi, mn, ma)) =>
          val ok = r.getLong(0) == mi && r.getLong(1) == mn &&
            (ma match {
              case None => r.isNullAt(2)
              case Some(a) =>
                !r.isNullAt(2) && math.abs(r.getDouble(2) - a) < 1e-7
            })
          Prop(ok) :| s"got=$r want=($mi,$mn,$ma)"
      }
    }
}
