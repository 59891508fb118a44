package graft.props

import graft.SparkSpec
import graft.operators.Corpus
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based check of [[Corpus.removeDuplicatedSpans]] against an
  * independent in-memory model, plus the IDEMPOTENCY contract:
  * re-running the operator on its own output removes nothing.
  *
  * The generator builds corpora of documents whose filler tokens are
  * globally unique (`u{doc}x{slot}`) with shared passages (length ≥ n,
  * drawn from a small pool) spliced between filler runs of ≥ 1 token.
  * That shape makes idempotency PROVABLE, not incidental: every gram
  * straddling a passage edge contains a unique filler token, so after
  * removal the newly-adjacent token runs can only form globally-unique
  * grams — while the passages themselves duplicate at arbitrary
  * alignments across documents, within one document, and at different
  * offsets, exactly the cases the positional frame must catch.
  */
object SpanTrimProps extends Properties("spanTrim") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val N = 3 // span length under test (small → dense coverage)

  // shared passage pool: lengths n .. n+2
  private val passages: Vector[Vector[String]] = Vector(
    Vector("sa", "sb", "sc"),
    Vector("ta", "tb", "tc", "td"),
    Vector("pa", "pb", "pc", "pd", "pe"))

  private case class DocPlan(fillerRuns: List[Int], passageIdx: List[Int])

  private val docGen: Gen[DocPlan] = for {
    nPass <- Gen.chooseNum(0, 3)
    pIdx <- Gen.listOfN(nPass, Gen.chooseNum(0, passages.size - 1))
    runs <- Gen.listOfN(nPass + 1, Gen.chooseNum(1, 4))
  } yield DocPlan(runs, pIdx)

  private val corpusGen: Gen[List[DocPlan]] =
    Gen.chooseNum(2, 6).flatMap(n => Gen.listOfN(n, docGen))

  private def renderDoc(d: Int, plan: DocPlan): String = {
    var slot = 0
    def fill(k: Int): Seq[String] =
      (0 until k).map { _ => slot += 1; s"u${d}x$slot" }
    val parts = plan.fillerRuns.zipAll(
      plan.passageIdx.map(passages(_)), 0, Vector.empty[String])
    parts.flatMap { case (k, p) => fill(k) ++ p }.mkString(" ")
  }

  /** Independent model of the operator: positional n-grams, global
    * (id, pos)-first winner per gram text, every other occurrence
    * marked, tokens covered by a marked position removed.
    */
  private def model(docs: Seq[(Long, String)], n: Int)
      : Map[Long, (String, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").toVector }.toMap
    val occ = for {
      (id, ts) <- toks.toSeq
      p <- 1 to ts.length - n + 1
    } yield (ts.slice(p - 1, p - 1 + n).mkString(" "), id, p)
    val winner = occ.groupBy(_._1)
      .map { case (g, os) => g -> os.map(o => (o._2, o._3)).min }
    val marked = occ.filter { case (g, id, p) => winner(g) != ((id, p)) }
      .map { case (_, id, p) => (id, p) }
    val removedT = marked
      .flatMap { case (id, p) => (p until p + n).map(id -> _) }.toSet
    toks.map { case (id, ts) =>
      val kept = ts.zipWithIndex.collect {
        case (t, i) if !removedT(id -> (i + 1)) => t }
      id -> ((kept.mkString(" "), ts.length.toLong,
        ts.indices.count(i => removedT(id -> (i + 1))).toLong,
        marked.count(_._1 == id).toLong))
    }
  }

  private def run(docs: Seq[(Long, String)], n: Int)
      : Map[Long, (String, Long, Long, Long)] =
    Corpus.removeDuplicatedSpans(docs.toDF("id", "text"), "id", "text", n)
      .select("id", "clean_text", "n_tokens", "n_removed_tokens",
        "n_removed_spans")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  property("matches the in-memory model AND is idempotent on its own " +
      "output") = Prop.forAll(corpusGen) { plans =>
    val docs = plans.zipWithIndex
      .map { case (p, d) => (d.toLong, renderDoc(d, p)) }
    val got = run(docs, N)
    val want = model(docs, N)
    val modelOk = got == want
    // idempotency: feed clean_text back through; nothing may be removed
    val again = run(docs.map { case (id, _) => (id, got(id)._1) }, N)
    val idemOk = again.forall { case (id, (txt, _, remT, remS)) =>
      txt == got(id)._1 && remT == 0L && remS == 0L }
    modelOk && idemOk
  }
}
