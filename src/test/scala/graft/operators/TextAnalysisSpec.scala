package graft.operators

import graft.SparkSpec

/** Repetition stats on hand-computed corpora (the oracle fixture checks
  * scale parity; these pin the semantics: multiplicity kept, short-doc
  * drop, degenerate repetition detected).
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("repetition measures duplicate n-gram mass with multiplicity") {
    val docs = Seq(
      // bigrams: "a b","b a","a b","b a","a b" → total 5,
      // top "a b"=3 → 0.6, all 5 occurrences duplicated → 1.0
      (1L, "a b a b a b"),
      // bigrams all distinct → top 1/4, dup 0
      (2L, "v w x y z"),
      // one token: no bigrams → absent from output
      (3L, "solo"),
      (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(docs, "doc_id", "text", n = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    assert(got(0) == ((1L, 5L, 0.6, 1.0)))
    assert(got(1) == ((2L, 4L, 0.25, 0.0)))
  }

  test("a fully-degenerate doc scores top_ngram_frac 1.0") {
    val docs = Seq((7L, Seq.fill(50)("spam").mkString(" ")))
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetition(docs, "doc_id", "text", n = 3)
      .head()
    assert(r.getLong(1) == 48L)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0)
  }

  test("codeProse: separates code-shaped text from prose") {
    val d = Seq(
      (1L, "int main() {\n  x = 1;\n  return x;\n}"),
      (2L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.codeProse(d, "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, Double, Double, Double, Double, String)].collect()
    // doc1: 4 lines; 2 indented ("  x…", "  return…") → 0.5;
    // every line ends in { ; ; } → term_frac 1.0; label code
    assert(out(0)._6 === "code")
    assert(out(0)._3 === 0.5 && out(0)._4 === 1.0)
    assert(out(0)._2 > 0)
    // pure prose: all three features exactly zero
    assert(out(1) === ((2L, 0.0, 0.0, 0.0, 0.0, "prose")))
  }

  test("sourceDrift: hand-checked TV distance and top token") {
    // A: tokens a,a,b (n=3); B: b,b,c (n=3); corpus a:2 b:3 c:1 (N=6)
    // TV(A) = ½(|2/3−1/3| + |1/3−1/2| + 1/6) = 1/3, top=a (diff 1/3)
    // TV(B) = ½(|2/3−1/2| + |1/3−1/6| + 1/3) = 1/3; b and c tie at
    // 1/6 in exact arithmetic but NOT in doubles (the two differences
    // land one ulp apart), and c's is the larger — the operator is
    // defined over IEEE doubles (as is the oracle), so c wins
    val d = Seq(("A", "a a b"), ("B", "b b c")).toDF("source", "text")
    val got = TextAnalysis.sourceDrift(d, "source", "text")
      .orderBy($"source")
      .as[(String, Long, Double, String, Double)].collect()
    assert(got.map(_._1).toSeq == Seq("A", "B"))
    assert(got.forall(_._2 == 3L))
    got.foreach(r => assert(math.abs(r._3 - 1.0 / 3) < 1e-9, r))
    assert(got(0)._4 == "a" && math.abs(got(0)._5 - 1.0 / 3) < 1e-12)
    assert(got(1)._4 == "c" && math.abs(got(1)._5 - 1.0 / 6) < 1e-12)
  }

  test("sourceDrift: identical distributions yield zero distance") {
    val d = Seq(("A", "x y"), ("B", "x y")).toDF("source", "text")
    val got = TextAnalysis.sourceDrift(d, "source", "text")
      .as[(String, Long, Double, String, Double)].collect()
    got.foreach { r => assert(r._3 == 0.0 && r._5 == 0.0) }
    // tie on diff=0 breaks to the lexicographically first token
    got.foreach(r => assert(r._4 == "x"))
  }

  test("sourceEntropy: hand-computed values") {
    val d = Seq(
      ("uniform4", "a b c d"),          // H = ln 4
      ("half", "a a b b"),              // H = ln 2
      ("degenerate", "a a a a a"),      // H = 0
      ("skew", "a a a b")               // H = ln4 - (3 ln 3)/4
    ).toDF("source", "text")
    val got = TextAnalysis.sourceEntropy(d, "source", "text")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("uniform4")._1 == 4)
    assert(math.abs(got("uniform4")._2 - math.log(4)) < 1e-5)
    assert(math.abs(got("half")._2 - math.log(2)) < 1e-5)
    assert(math.abs(got("degenerate")._2) < 1e-5)
    val skew = math.log(4) - 3 * math.log(3) / 4
    assert(math.abs(got("skew")._2 - skew) < 1e-5)
  }

  test("sourceEntropy is partition-invariant") {
    val d = (0 until 3000)
      .map(i => ("g", s"tok${i % 37} tok${i % 11} filler"))
      .toDF("source", "text")
    val one = TextAnalysis.sourceEntropy(d.repartition(1),
      "source", "text").as[(String, Long, Double)].head()
    val many = TextAnalysis.sourceEntropy(d.repartition(16),
      "source", "text").as[(String, Long, Double)].head()
    assert(one == many) // bit-identical, not approximately equal
  }

  test("charLmScore: hand-computed trigram model and smoothed nll") {
    // train/score = {ABCabc, abcd}: trigram counts abc:3, bca:1,
    // cab:1, bcd:1 (T = 4); contexts ab:3, bc:2, ca:1
    val d = Seq((1L, "ABCabc"), (2L, "abcd")).toDF("id", "text")
    val got = TextAnalysis.charLmScore(d, d, "id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L)._1 == 4 && got(2L)._1 == 2)
    // doc 2: abc → ln(3+4)−ln(3+1); bcd → ln(2+4)−ln(1+1)
    val exp2 = (math.log(7.0 / 4) + math.log(6.0 / 2)) / 2
    assert(math.abs(got(2L)._2 - exp2) < 1e-5)
    val exp1 = (2 * math.log(7.0 / 4) + // abc ×2
      math.log(6.0 / 2) + // bca: ctx bc
      math.log(5.0 / 2)) / 4 // cab: ctx ca
    assert(math.abs(got(1L)._2 - exp1) < 1e-5)
  }

  test("charLmScore: unseen trigrams smooth to ln(T); short docs drop") {
    val train = Seq((0L, "aaab")).toDF("id", "text") // aaa, aab; T = 2
    val score = Seq((1L, "zzzz"), (2L, "xy")).toDF("id", "text")
    val got = TextAnalysis.charLmScore(train, score, "id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // zzz ×2 fully unseen: nll = ln(0 + 2) − ln(0 + 1) = ln 2
    assert(got(1L)._1 == 2 && math.abs(got(1L)._2 - math.log(2)) < 1e-5)
    assert(!got.contains(2L)) // < 3 chars: no trigrams, drops out
  }

  test("scriptProfile: per-script counts/fractions; dominance is " +
      "strictly-greater with priority-order ties; no match = other") {
    val d = Seq(
      (1L, "abc"),            // pure latin
      (2L, "你好 abc"),       // mixed, latin wins 3 > 2
      (3L, "你好你好 ab"),    // han wins 4 > 2
      (4L, "123 !!"),         // no script chars at all
      (5L, "καλημέρα"),       // greek (lowest priority, only nonzero)
      (6L, "ab 你好"))        // exact tie 2 = 2 → latin (priority)
      .toDF("id", "text")
    val got = TextAnalysis.scriptProfile(d, "id", "text")
      .select("id", "n_chars", "n_latin", "n_han", "n_greek",
        "frac_latin", "dominant_script")
      .as[(Long, Long, Long, Long, Long, Double, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 3L, 3L, 0L, 0L, 1.0, "latin")))
    assert(got(2L)._2 === 6L && got(2L)._3 === 3L &&
      got(2L)._4 === 2L && got(2L)._7 === "latin")
    assert(got(3L)._7 === "han")
    assert(got(4L)._7 === "other")
    assert(got(5L)._5 === 8L && got(5L)._7 === "greek")
    assert(got(6L)._7 === "latin")
  }

  test("knBigramScore: hand-computed interpolated KN probabilities, " +
      "unseen context backs off to continuation, short docs drop") {
    // train "a b a c": bigrams {a b, b a, a c} each once; T = 3, V = 3
    // ctx a: c1 = 2, n1f = 2; ctx b: c1 = 1, n1f = 1
    // Pc(any seen w2) = (1+1)/(3+3+1) = 2/7
    val train = Seq((0L, "a b a c")).toDF("id", "text")
    val score = Seq((1L, "a b a c"), (2L, "z b"), (3L, "x"))
      .toDF("id", "text")
    val got = TextAnalysis.knBigramScore(train, score, "id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val pc = 2.0 / 7
    val pAb = (0.25 + 0.75 * 2 * pc) / 2 // P(b|a) = P(c|a)
    val pBa = 0.25 + 0.75 * 1 * pc       // P(a|b), c1 = 1
    val exp1 = (2 * -math.log(pAb) - math.log(pBa)) / 3
    assert(got(1L)._1 == 3 && math.abs(got(1L)._2 - exp1) < 1e-5)
    // "z b": context z unseen → pure continuation Pc(b) = 2/7
    assert(got(2L)._1 == 1 &&
      math.abs(got(2L)._2 + math.log(pc)) < 1e-5)
    assert(!got.contains(3L)) // single token: no bigrams
  }

  test("knBigramScore: continuation counts, not raw frequency, drive " +
      "the backoff (the 'francisco' property)") {
    // 'x' occurs 3x but ALWAYS after 'a'; 'y' occurs 3x after three
    // DIFFERENT contexts → Pc(y) > Pc(x) although frequencies tie
    val train = Seq((0L, "a x a x a x p y q y r y")).toDF("id", "text")
    val score = Seq((1L, "zz x"), (2L, "zz y")).toDF("id", "text")
    val got = TextAnalysis.knBigramScore(train, score, "id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got(1L) > got(2L),
      s"nll(x after unseen ctx) ${got(1L)} should exceed y's ${got(2L)}")
  }

  test("knBigramScore is partition-invariant (fx sums)") {
    val d = (0 until 500)
      .map(i => (i.toLong, s"tok${i % 11} tok${i % 7} tok${i % 5} end"))
      .toDF("id", "text")
    def run(p: Int) = TextAnalysis.knBigramScore(
        d.repartition(p), d.repartition(p), "id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(run(1) === run(16)) // bit-identical
  }

  test("knTrigramScore: hand-computed trigram KN with bigram backoff, " +
      "unseen (w1 w2) context backs off, short docs drop") {
    // train "a b c a b d": trigram types {a b c, b c a, c a b, a b d}
    // each once; ctx3("a b") = (c12t 2, n12f 2); mid23("b c") = 1;
    // midw2(b) = 2 (types a b c / a b d); bigram followers n1f(b) = 2
    // {c,d}; T = 4 bigram types, V = 4 → Pc(c) = (1+1)/(4+4+1) = 2/9
    val train = Seq((0L, "a b c a b d")).toDF("id", "text")
    val score = Seq((1L, "a b c"), (2L, "z b c"), (3L, "x y"))
      .toDF("id", "text")
    val got = TextAnalysis.knTrigramScore(train, score, "id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val pc = 2.0 / 9
    val pbo = (0.25 + 0.75 * 2 * pc) / 2 // Pbo(c|b)
    val p = (0.25 + 0.75 * 2 * pbo) / 2  // P(c|a b)
    assert(got(1L)._1 == 1 && math.abs(got(1L)._2 + math.log(p)) < 1e-5)
    // unseen context "z b" → pure backoff Pbo(c|b)
    assert(got(2L)._1 == 1 && math.abs(got(2L)._2 + math.log(pbo)) < 1e-5)
    // the seen trigram must score strictly better than the backoff
    assert(got(1L)._2 < got(2L)._2)
    assert(!got.contains(3L)) // two tokens: no trigrams
  }

  test("knTrigramScore is partition-invariant (fx sums)") {
    val d = (0 until 500)
      .map(i => (i.toLong, s"tok${i % 11} tok${i % 7} tok${i % 5} end"))
      .toDF("id", "text")
    def run(p: Int) = TextAnalysis.knTrigramScore(
        d.repartition(p), d.repartition(p), "id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(run(1) === run(16)) // bit-identical
  }

  test("KN self-scoring reuse: passing the SAME frame as train and " +
      "score (the registry shape) is bit-identical to passing two " +
      "content-equal frames (r15 — the reagg'd model counts must " +
      "match the second-explode path exactly)") {
    val rows = (0 until 200)
      .map(i => (i.toLong, s"tok${i % 11} tok${i % 7} tok${i % 5} end"))
    val one = rows.toDF("id", "text")     // self: train eq score
    val twoA = rows.toDF("id", "text")    // distinct instances,
    val twoB = rows.toDF("id", "text")    // same content
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(canon(TextAnalysis.knBigramScore(one, one, "id", "text")) ===
      canon(TextAnalysis.knBigramScore(twoA, twoB, "id", "text")))
    assert(canon(TextAnalysis.knTrigramScore(one, one, "id", "text")) ===
      canon(TextAnalysis.knTrigramScore(twoA, twoB, "id", "text")))
    assert(canon(TextAnalysis.knTrigramScore(one, one, "id", "text",
        minCount = 2)) ===
      canon(TextAnalysis.knTrigramScore(twoA, twoB, "id", "text",
        minCount = 2)))
  }

  test("winnow: rightmost tie rule, short docs drop, and the " +
      "shared-substring locality guarantee") {
    // all-equal hashes ("aaaa", k=2, w=2): grams at 1,2,3; each
    // window advances to its RIGHTMOST minimal position -> {2, 3}
    val ties = TextAnalysis.winnow(
        Seq((1L, "aaaa")).toDF("id", "text"), "id", "text", k = 2, w = 2)
      .as[(Long, Long, Long)].collect()
    assert(ties.map(_._2).toSet === Set(2L, 3L))
    assert(ties.map(_._3).distinct.length === 1) // one repeated hash
    // below k + w - 1 chars there is no full window
    assert(TextAnalysis.winnow(
      Seq((2L, "ab")).toDF("id", "text"), "id", "text",
      k = 2, w = 2).count() === 0)
    // the SIGMOD-03 guarantee: docs sharing a substring of length
    // >= k + w - 1 = 8 share at least one fingerprint VALUE
    val d = Seq(
      (10L, "xxxx SHARED-PASSAGE-HERE yyyy"),
      (11L, "aaaaaaaa SHARED-PASSAGE-HERE bbb"),
      (12L, "nothing in common at all")).toDF("id", "text")
    val fps = TextAnalysis.winnow(d, "id", "text", k = 5, w = 4)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(_._3).toSet }
    assert((fps(10L) intersect fps(11L)).nonEmpty)
    // and fingerprint values recompute from (pos, k-gram) exactly
    import org.apache.spark.sql.functions.{col, lit, lower}
    val re = TextAnalysis.winnow(d, "id", "text", k = 5, w = 4)
      .join(d, Seq("id"))
      .withColumn("expect", graft.functions.TextFns.hash32(
        lower(col("text")).substr(col("pos").cast("int"), lit(5))))
    assert(re.filter(col("fp") =!= col("expect")).count() === 0)
  }

  test("winnowMatches: passage-sharing pairs surface, hot boilerplate " +
      "fingerprints are gated, minShared cuts weak pairs") {
    val d = Seq(
      (1L, "AAAA unique-shared-long-passage-one BBBB"),
      (2L, "CCCC unique-shared-long-passage-one DDDD"),
      (3L, "totally different content here wxyz")).toDF("id", "text")
    val got = TextAnalysis.winnowMatches(d, "id", "text",
        k = 5, w = 4, minShared = 2, maxDocFreq = 100)
      .as[(Long, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2)).toSet === Set((1L, 2L)))
    assert(got.head._3 >= 2)
    // a fingerprint in EVERY doc is boilerplate: with maxDocFreq = 2
    // (< 3 docs) the shared-everywhere text stops creating pairs
    val boiler = Seq(
      (1L, "the same everywhere text block"),
      (2L, "the same everywhere text block"),
      (3L, "the same everywhere text block")).toDF("id", "text")
    assert(TextAnalysis.winnowMatches(boiler, "id", "text",
      k = 5, w = 4, minShared = 1, maxDocFreq = 2).count() === 0)
  }

  test("winnowSpans: a shared license block localizes to its extent " +
      "in each doc; n_shared agrees with winnowMatches") {
    // disjoint alphabets outside the block, so every shared
    // fingerprint derives from a 5-gram fully inside the block; no
    // 5-gram repeats INSIDE the block, so a matched fingerprint sits
    // at the same relative offset in both docs (the extent-shift
    // assertion below depends on that)
    val license = "distributed under the apache terms version two"
    val pre1 = "qqqq qqqq "   // block starts at pos 11 in doc 1
    val pre2 = "0123456789012345 " // and at pos 18 in doc 2
    val d = Seq(
      (1L, pre1 + license + " zz"),
      (2L, pre2 + license + " ww"),
      (3L, "totally unrelated body here")).toDF("id", "text")
    val spans = TextAnalysis.winnowSpans(d, "id", "text",
        k = 5, w = 4, minShared = 2, maxDocFreq = 100)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(spans.map(r => (r._1, r._2)) === Seq((1L, 2L)))
    val (_, _, nShared, aFrom, aTo, bFrom, bTo) = spans.head
    val s1 = pre1.length + 1
    val s2 = pre2.length + 1
    val lastGram = license.length - 5 // 0-based offset of last 5-gram
    assert(aFrom >= s1 && aTo <= s1 + lastGram,
      s"doc-1 span [$aFrom,$aTo] outside block [$s1,${s1 + lastGram}]")
    assert(bFrom >= s2 && bTo <= s2 + lastGram,
      s"doc-2 span [$bFrom,$bTo] outside block [$s2,${s2 + lastGram}]")
    // the two extents frame the SAME passage: identical relative size
    assert(aTo - aFrom === bTo - bFrom)
    val matches = TextAnalysis.winnowMatches(d, "id", "text",
        k = 5, w = 4, minShared = 2, maxDocFreq = 100)
      .as[(Long, Long, Long)].collect().toSeq
    assert(matches.map(_._3) === Seq(nShared))
  }

  test("knTrigramScore minCount: 1 is exact behavior; pruning every " +
      "type routes all mass through the bigram backoff (hand value)") {
    val train = Seq((1L, "x y x y x")).toDF("id", "text")
    val score = Seq((9L, "x y x")).toDF("id", "text")
    val exact = TextAnalysis.knTrigramScore(train, score, "id", "text")
      .as[(Long, Long, Double)].collect().toSeq
    val mc1 = TextAnalysis.knTrigramScore(train, score, "id", "text",
        minCount = 1)
      .as[(Long, Long, Double)].collect().toSeq
    assert(mc1 === exact)
    // minCount above every count empties the type table: c123 = 0,
    // nmid = 0, so p = pbo = pc(w3). Here cb = {"x y", "y x"}, T = 2,
    // V = 2, n1c(x) = 1 -> pc = (1+1)/(2+2+1) = 0.4
    val pruned = TextAnalysis.knTrigramScore(train, score, "id", "text",
        minCount = 100)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pruned.size === 1)
    val (_, nTri, nll) = pruned.head
    assert(nTri === 1L)
    assert(math.abs(nll - (-math.log(0.4))) < 1e-5, s"avg_nll=$nll")
  }

  test("oovRate: head tokens score 0, tail tokens count as OOV, " +
      "boundary ties break lexicographically") {
    // vocabSize=2: counts x:3 y:2 z:1 -> head {x, y}
    val d = Seq((1L, "x x y"), (2L, "x y z")).toDF("id", "text")
    val got = TextAnalysis.oovRate(d, "id", "text", vocabSize = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((3L, 0L, 0.0)))
    assert(got(2L)._1 == 3L && got(2L)._2 == 1L &&
      math.abs(got(2L)._3 - 1.0 / 3) < 1e-12)
    // tie at the boundary: a and b both count 1, vocabSize=1 after x
    // -> vocab {a} (lexicographic), b is OOV
    val t = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val tied = TextAnalysis.oovRate(t, "id", "text", vocabSize = 1)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(tied === Map(1L -> 0L, 2L -> 1L))
  }

  test("charLmScore is partition-invariant (fx sums)") {
    val d = (0 until 2000)
      .map(i => (i.toLong % 7, s"doc text ${i % 13} with shared runs"))
      .toDF("id", "text")
    def run(p: Int) = TextAnalysis.charLmScore(
        d.repartition(p), d.repartition(p), "id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(run(1) == run(16)) // bit-identical
  }

  test("sentences splits on terminator+space, keeps terminators") {
    val d = Seq((1L, "One. Two!  Three? trailing bit")).toDF("id", "t")
    val got = TextAnalysis.sentences(d, "id", "t")
      .select("sent_idx", "sentence").as[(Int, String)].collect().toSeq
    assert(got === Seq((0, "One."), (1, "Two!"), (2, "Three?"),
      (3, "trailing bit")))
  }

  test("sentences: single sentence and no-terminator text") {
    val d = Seq((1L, "just words no stop"), (2L, "Hi.")).toDF("id", "t")
    val got = TextAnalysis.sentences(d, "id", "t")
      .select("id", "sentence").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "just words no stop"), (2L, "Hi.")))
  }

  test("sentenceChunks never splits a sentence, concatenation inverts") {
    val text = (0 until 12).map(i => s"Sentence number $i ends here.")
      .mkString(" ")
    val d = Seq((1L, text)).toDF("id", "t")
    val chunks = TextAnalysis.sentenceChunks(d, "id", "t", maxChars = 80)
      .orderBy("chunk_id")
      .select("chunk_id", "n_sentences", "chunk_text")
      .as[(Int, Int, String)].collect().toSeq
    assert(chunks.size > 1)
    // every chunk is whole sentences; rejoining restores the doc
    assert(chunks.map(_._3).mkString(" ") === text)
    assert(chunks.map(_._2).sum === 12)
    // chunk ids are dense from 0
    assert(chunks.map(_._1) === chunks.indices.toSeq)
  }

  test("sentenceChunks is deterministic across repartitionings") {
    val d = (0L until 40L).map(i =>
        (i, (0 to (i % 5).toInt).map(j => s"S $j of $i.").mkString(" ")))
      .toDF("id", "t")
    def run(p: Int) = TextAnalysis.sentenceChunks(
        d.repartition(p), "id", "t", maxChars = 20)
      .select("id", "chunk_id", "chunk_text")
      .as[(Long, Int, String)].collect().sortBy(x => (x._1, x._2)).toSeq
    assert(run(1) === run(16))
  }

  test("markdownSections: preamble, levels, non-headers (#nospace, " +
      "7 hashes) stay body, header-opening doc has no sec 0") {
    val md = "pre a\npre b\n# One\nx\n### Three\n#nospace\n" +
      "####### seven\ny"
    val got = TextAnalysis.markdownSections(
        Seq((1L, md)).toDF("id", "text"), "id", "text")
      .select("sec_idx", "level", "heading", "body", "n_lines")
      .as[(Long, Int, Option[String], String, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (0L, 0, None, "pre a\npre b", 2L),
      (1L, 1, Some("One"), "x", 1L),
      (2L, 3, Some("Three"), "#nospace\n####### seven\ny", 3L)))
    val noPre = TextAnalysis.markdownSections(
        Seq((1L, "# H\nbody")).toDF("id", "text"), "id", "text")
      .select("sec_idx").as[Long].collect().toSet
    assert(noPre === Set(1L))
  }

  test("markdownSections: a # line inside a ``` fence is body, not a " +
      "header; headers after the fence closes still split") {
    val md = "# Top\n```bash\n# install deps\napt-get install x\n```\n" +
      "# Next\ny"
    val got = TextAnalysis.markdownSections(
        Seq((1L, md)).toDF("id", "text"), "id", "text")
      .select("sec_idx", "heading", "body")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, "Top", "```bash\n# install deps\napt-get install x\n```"),
      (2L, "Next", "y")))
  }

  test("tokenF1: clipped multiset overlap, hand P/R/F1, repeated " +
      "prediction tokens never score free") {
    val got = TextAnalysis.tokenF1(
        Seq((1L, "a b b c", "b c d"), (2L, "x y", "x y"),
          (3L, "q q q", "q")).toDF("id", "pred", "gold"),
        "id", "pred", "gold")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val r1 = got(1L) // common: b (clipped to 1) + c = 2
    assert(r1._2 === 4L && r1._3 === 3L && r1._4 === 2L)
    assert(r1._5 === Some(0.5))
    assert(math.abs(r1._6.get - 2.0 / 3) < 1e-12)
    assert(math.abs(r1._7.get - 4.0 / 7) < 1e-12)
    assert(got(2L)._7 === Some(1.0)) // exact match
    val r3 = got(3L) // q q q vs q: clip = 1, not 3
    assert(r3._4 === 1L && r3._5 === Some(1.0 / 3))
  }

  test("sentenceBleu: hand clipped n-gram precisions and log score, " +
      "perfect match scores 0 (bleu 1), zero high-order overlap " +
      "null, brevity penalty engages") {
    import graft.functions.Cols
    val got = TextAnalysis.sentenceBleu(
        Seq((1L, "the cat sat on the mat", "the cat sat on a mat"),
          (2L, "a b c d e", "a b c d e"),
          (3L, "a b c d", "a b c e"))
          .toDF("id", "pred", "gold"),
        "id", "pred", "gold", maxN = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    // (n_pred, n_gold, clip/tot 1..4)
    assert((r1.getLong(1), r1.getLong(2)) === ((6L, 6L)))
    assert((r1.getLong(3), r1.getLong(4)) === ((5L, 6L)))
    assert((r1.getLong(5), r1.getLong(6)) === ((3L, 5L)))
    assert((r1.getLong(7), r1.getLong(8)) === ((2L, 4L)))
    assert((r1.getLong(9), r1.getLong(10)) === ((1L, 3L)))
    val want = (math.log(5.0 / 6) + math.log(3.0 / 5) +
      math.log(2.0 / 4) + math.log(1.0 / 3)) / 4
    assert(math.abs(r1.getDouble(11) - want) < 1e-6)
    assert(math.abs(r1.getDouble(12) - math.exp(want)) < 1e-6)
    val r2 = got(2L) // identical: every p_n = 1, bp = 0
    assert(r2.getDouble(11) === 0.0 && r2.getDouble(12) === 1.0)
    assert(got(3L).isNullAt(11)) // 4-gram overlap 0: unsmoothed null
    // brevity: 2-token pred vs 3-token gold at maxN = 2 —
    // precisions are 1, so log_bleu IS the penalty 1 - 3/2
    val bp = TextAnalysis.sentenceBleu(
        Seq((1L, "the cat", "the cat sat")).toDF("id", "pred", "gold"),
        "id", "pred", "gold", maxN = 2)
      .collect().head
    assert(math.abs(bp.getDouble(7) - (-0.5)) < 1e-12)
  }

}
