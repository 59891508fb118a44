package graft.props

import graft.SparkSpec
import graft.operators.Stats
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based check of [[Stats.btStrengths]] against an in-memory
  * implementation of Hunter's MM update over random tournaments —
  * random win multiplicities, asymmetric match-ups and 1-3 iterations
  * exercise the denominator accumulation, the mean-1 renormalization
  * and the wins/total accounting. The model sums in plain doubles
  * while the operator sums fixed-point at 1e9, so strengths are
  * compared within 1e-5 (quantization is 5e-10 per term); wins and
  * comparison totals must match exactly.
  */
object BtProps extends Properties("btStrengths") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val N = 6 // items 0..5

  /** Random pairs on top of a seed cycle that guarantees every item
    * wins at least once (the standard BT identifiability
    * precondition — without it a zero-win pair divides by zero).
    */
  private val tournamentGen: Gen[(Seq[(Long, Long)], Int)] = for {
    extra <- Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, N - 1L), Gen.choose(0L, N - 1L)))
    iters <- Gen.choose(1, 3)
  } yield {
    val seed = (0 until N).map(i => (i.toLong, ((i + 1) % N).toLong))
    (seed ++ extra.filter { case (w, l) => w != l }, iters)
  }

  /** Reference MM fit, plain-double sums. */
  private def model(pairs: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Long, Long, Double)] = {
    val wins = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = pairs.groupBy(identity).view.mapValues(_.size).toSeq
      .flatMap { case ((w, l), c) => Seq((w, l) -> c, (l, w) -> c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val items = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    var s = items.map(_ -> 1.0).toMap
    (1 to iters).foreach { _ =>
      val raw = items.map { i =>
        val d = items.filter(j => n.contains((i, j)))
          .map(j => n((i, j)).toDouble / (s(i) + s(j))).sum
        i -> (wins.getOrElse(i, 0L).toDouble / d)
      }.toMap
      val total = raw.values.sum
      s = raw.view.mapValues(_ * items.size / total).toMap
    }
    items.map { i =>
      val nc = items.filter(j => n.contains((i, j)))
        .map(j => n((i, j)).toLong).sum
      i -> ((wins.getOrElse(i, 0L), nc, s(i)))
    }.toMap
  }

  property("matches the in-memory MM fit on random tournaments") =
    Prop.forAll(tournamentGen) { case (pairs, iters) =>
      val got = Stats.btStrengths(pairs.toDF("w", "l"), "w", "l", iters)
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val want = model(pairs, iters)
      val ok = got.keySet == want.keySet && got.forall { case (i, g) =>
        val w = want(i)
        g._1 == w._1 && g._2 == w._2 && math.abs(g._3 - w._3) < 1e-5
      }
      Prop(ok) :| s"got=$got want=$want"
    }
}
