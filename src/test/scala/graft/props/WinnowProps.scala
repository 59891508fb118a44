package graft.props

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based check of [[TextAnalysis.winnow]] against an
  * independent in-memory model of the SIGMOD-03 algorithm (k-gram md5
  * hashes, sliding window, min with RIGHTMOST tie, repeated-pick
  * dedup), over random texts drawn from a small alphabet — small so
  * hash ties and repeated grams occur constantly, which is exactly
  * where the tie rule and the dedup can drift.
  *
  * Batched execution: each trial's documents carry the trial id and
  * ALL trials run through ONE DataFrame/collect (a per-trial Spark
  * job would dominate the suite's wall time — the DauEvictionProps
  * discipline, batch-side edition).
  */
object WinnowProps extends Properties("winnow") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5) // 5 batches × 60 random docs each

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val K = 3
  private val W = 3

  /** TextFns.hash32 twin: first 8 hex chars of md5 as a Long. */
  private def h32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(8), 16)
  }

  /** Reference winnowing: distinct (pos, fp) picks, 1-based pos. */
  private def model(text: String): Set[(Long, Long)] = {
    val t = text.toLowerCase
    val n = t.length - K + 1
    if (n < W) Set.empty
    else {
      val hs = (1 to n).map(i => h32(t.substring(i - 1, i - 1 + K)))
      (1 to n - W + 1).map { j =>
        var best = (Long.MaxValue, 0L)
        (j until j + W).foreach { i =>
          if (hs(i - 1) <= best._1) best = (hs(i - 1), i.toLong)
        }
        (best._2, best._1)
      }.toSet
    }
  }

  // tiny alphabet → dense gram repeats and hash ties within one text
  private val textGen: Gen[String] = for {
    len <- Gen.chooseNum(0, 40)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'A', ' '))
  } yield cs.mkString

  property("matches the in-memory SIGMOD-03 model on random texts") =
    Prop.forAll(Gen.listOfN(60, textGen)) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val got = TextAnalysis.winnow(docs, "id", "text", k = K, w = W)
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1)
        .map { case (id, rs) =>
          id -> rs.map(r => (r._2, r._3)).toSet
        }
        .withDefaultValue(Set.empty[(Long, Long)])
      texts.zipWithIndex.forall { case (t, i) =>
        val exp = model(t)
        val act = got(i.toLong)
        if (exp != act)
          println(s"MISMATCH doc $i text='$t' exp=$exp act=$act")
        exp == act
      }
    }
}
