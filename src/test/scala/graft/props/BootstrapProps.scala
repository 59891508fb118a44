package graft.props

import graft.SparkSpec
import graft.operators.Stats
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based checks of [[Stats.bootstrapCi]] against an
  * independent in-memory model:
  *
  *  - the Poisson(1) inverse-CDF thresholds are pinned to externally
  *    computed literals (floor(e⁻¹·Σ1/k!·2³²)), so a factorial or
  *    scaling slip in the operator's table cannot hide;
  *  - resample means are re-derived with java MD5 + plain Scala
  *    arithmetic (hash, weight cut, fixed-point quantization,
  *    percentile interpolation all re-implemented) and must match the
  *    engine bit-for-bit up to the percentile's last double op;
  *  - statistical behavior on a known-p Bernoulli fixture: the 95 %
  *    interval covers the data mean, covers the true p at large n,
  *    and TIGHTENS as n grows (the whole point of reporting a CI).
  */
object BootstrapProps extends Properties("bootstrapCi") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // externally computed: floor(P(W<=k) * 2^32), W ~ Poisson(1), k=0..7
  private val PinnedCdf = Seq(1580030168L, 3160060337L, 3950075421L,
    4213413783L, 4279248373L, 4292415291L, 4294609777L, 4294923276L)

  property("PoissonCdf32 equals the externally computed table") =
    Prop(Stats.PoissonCdf32 == PinnedCdf) :| s"got ${Stats.PoissonCdf32}"

  // ---- the independent model -----------------------------------------

  private def h32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  private def weight(u: Long): Long = {
    val k = PinnedCdf.indexWhere(u < _)
    if (k < 0) 8L else k.toLong
  }

  private def fx(x: Double): Long = math.floor(x * 1e9 + 0.5).toLong

  /** Spark `percentile` / DuckDB `quantile_cont` linear interpolation
    * over the non-null values.
    */
  private def pct(xs: Seq[Double], q: Double): Double = {
    val s = xs.sorted
    val pos = q * (s.size - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    s(lo) + (s(hi) - s(lo)) * (pos - lo)
  }

  private def modelCi(vals: Seq[(Long, Double)], b: Int)
      : (Long, Double, Double, Double) = {
    val n = vals.size.toLong
    val mean = (vals.map(v => fx(v._2)).sum.toDouble / 1e9) / n
    val means = (0 until b).flatMap { r =>
      val ws = vals.map { case (id, x) =>
        (weight(h32(s"$r:$id")), x)
      }
      val wn = ws.map(_._1).sum
      if (wn > 0)
        Some((ws.map { case (w, x) => fx(w.toDouble * x) }.sum
          .toDouble / 1e9) / wn)
      else None
    }
    (n, mean, pct(means, 0.025), pct(means, 0.975))
  }

  private val valsGen: Gen[(Seq[(Long, Double)], Int)] = for {
    n <- Gen.choose(20, 60)
    b <- Gen.choose(8, 32)
    xs <- Gen.listOfN(n, Gen.oneOf(0.0, 0.25, 0.5, 1.0))
  } yield (xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }, b)

  property("matches the independent MD5 + fixed-point + percentile " +
      "model") =
    Prop.forAll(valsGen) { case (vals, b) =>
      val got = Stats.bootstrapCi(vals.toDF("id", "x"), "id", "x", b)
        .as[(Long, Int, Double, Double, Double)].head()
      val (n, mean, lo, hi) = modelCi(vals, b)
      val ok = got._1 == n && got._2 == b &&
        math.abs(got._3 - mean) < 1e-12 &&
        math.abs(got._4 - lo) < 1e-9 && math.abs(got._5 - hi) < 1e-9
      Prop(ok) :| s"got=$got want=($n,$b,$mean,$lo,$hi)"
    }

  // ---- statistical behavior on a known-p fixture ----------------------

  /** Deterministic Bernoulli(0.4) draws — hash-based, no rand(). */
  private def bern(n: Int): Seq[(Long, Double)] =
    (0 until n).map(i =>
      (i.toLong, if (h32(s"v:$i") % 100 < 40) 1.0 else 0.0))

  property("95% interval covers the data mean and the true p at " +
      "large n, and tightens as n grows") = {
    def ci(n: Int) =
      Stats.bootstrapCi(bern(n).toDF("id", "x"), "id", "x", b = 100)
        .as[(Long, Int, Double, Double, Double)].head()
    val small = ci(60)
    val large = ci(600)
    val coversMean = small._4 <= small._3 && small._3 <= small._5 &&
      large._4 <= large._3 && large._3 <= large._5
    val coversTrueP = large._4 <= 0.4 && 0.4 <= large._5
    val tightens = (large._5 - large._4) < (small._5 - small._4)
    Prop(coversMean && coversTrueP && tightens) :|
      s"small=$small large=$large"
  }
}
