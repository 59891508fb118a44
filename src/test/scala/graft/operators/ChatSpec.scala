package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChatSpec extends SparkSpec {
  import spark.implicits._

  private val turns = Seq(
    (1L, 0, "system", "be brief"),
    (1L, 1, "user", "hi"),
    (1L, 2, "assistant", "hello"),
    (1L, 3, "user", "more"),
    (1L, 4, "assistant", "ok"),
    (2L, 0, "user", "solo"),
    (2L, 1, "assistant", "yes")
  ).toDF("conv", "idx", "role", "text")

  test("renderConversations concatenates turns in index order") {
    val got = Chat.renderConversations(turns, "conv", "idx", "role",
        "text")
      .as[(Long, Int, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 5, "<|system|>be brief<|end|><|user|>hi<|end|>" +
        "<|assistant|>hello<|end|><|user|>more<|end|>" +
        "<|assistant|>ok<|end|>"),
      (2L, 2, "<|user|>solo<|end|><|assistant|>yes<|end|>")))
  }

  test("renderConversations is order-insensitive to input row order") {
    val shuffled = turns.orderBy(rand(7)).repartition(5)
    val a = Chat.renderConversations(turns, "conv", "idx", "role", "text")
      .as[(Long, Int, String)].collect().sortBy(_._1).toSeq
    val b = Chat.renderConversations(shuffled, "conv", "idx", "role",
        "text")
      .as[(Long, Int, String)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  test("assistantSpans slices back to exactly the turn text") {
    val spans = Chat.assistantSpans(turns, "conv", "idx", "role", "text")
    val rendered = Chat.renderConversations(turns, "conv", "idx",
        "role", "text")
      .select(col("conv"), col("text").as("full"))
    val ok = spans.join(rendered, Seq("conv"))
      .join(turns.select(col("conv"), col("idx"),
        col("text").as("turn")), Seq("conv", "idx"))
      .withColumn("slice",
        expr("substring(full, char_start + 1, char_end - char_start)"))
      .select("slice", "turn").as[(String, String)].collect()
    assert(ok.nonEmpty && ok.forall(p => p._1 === p._2))
  }

  test("preferencePairs picks max/min by (score, text), strict margin") {
    val resp = Seq(
      (1L, "a", 3), (1L, "b", 7), (1L, "c", 5),   // clear pair
      (2L, "x", 4), (2L, "y", 4),                  // no margin -> drop
      (3L, "only", 9)                              // single -> drop
    ).toDF("prompt", "text", "score")
    val got = Chat.preferencePairs(resp, "prompt", "text", "score")
      .select("prompt", "chosen", "rejected", "n_responses", "margin")
      .as[(Long, String, String, Int, Int)].collect().toSeq
    assert(got === Seq((1L, "b", "a", 3, 4)))
  }

  test("preferencePairs breaks score ties lexicographically") {
    val resp = Seq((1L, "zz", 5), (1L, "aa", 5), (1L, "mm", 2))
      .toDF("prompt", "text", "score")
    val r = Chat.preferencePairs(resp, "prompt", "text", "score")
      .select("chosen", "rejected").as[(String, String)].head()
    assert(r === (("zz", "mm")))
  }

  test("validateToolCalls flags valid/unknown/malformed/plain turns") {
    val turns = Seq(
      (1L, 0, "user", "find cats"),
      (1L, 1, "assistant", """{"tool":"search","args":{"q":"cats","k":"3"}}"""),
      (2L, 0, "assistant", """{"tool":"nuke","args":{}}"""),
      (3L, 0, "assistant", """{"tool":"search","args":"""),
      (4L, 0, "assistant", "plain prose answer")
    ).toDF("conv", "idx", "role", "text")
    val got = Chat.validateToolCalls(turns, "conv", "idx", "role",
        "text", allowed = Seq("search"))
      .select("conv", "is_call", "tool", "parsed_ok", "tool_known",
        "n_args")
      .as[(Long, Boolean, String, Boolean, Boolean, Int)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, true, "search", true, true, 2),
      (2L, true, "nuke", true, false, 0),
      (3L, true, "", false, false, -1),
      (4L, false, "", false, false, -1)))
  }

  test("assistantSpans returns only assistant turns, 0-based") {
    val got = Chat.assistantSpans(turns, "conv", "idx", "role", "text")
      .as[(Long, Int, Long, Long)].collect().sortBy(t => (t._1, t._2))
      .toSeq
    // conv 2: "<|user|>solo<|end|>" is 19 chars, "<|assistant|>" is 13
    assert(got.map(t => (t._1, t._2)) === Seq((1L, 2), (1L, 4), (2L, 1)))
    assert(got(2) === ((2L, 1, 32L, 35L)))
  }

  test("truncateToBudget: system always survives, longest fitting " +
      "suffix kept, crossing turn drops whole, flag per conversation") {
    // conv 1: system (2 tokens) + 3 user/assistant turns of 3 tokens
    // each (total 11). Budget 9: suffix budget 7 → the last TWO
    // non-system turns fit (6 ≤ 7); turn 1 would cross and drops
    // whole. conv 2: 2 turns of 3 tokens (total 6 ≤ 9) — untouched.
    // conv 3: system alone already over budget (10 tokens) — it still
    // survives, zero non-system turns kept, flagged truncated.
    val t = Seq(
      (1L, 0, "system", "be brief"),
      (1L, 1, "user", "first question here"),
      (1L, 2, "assistant", "first answer text"),
      (1L, 3, "user", "second question here"),
      (2L, 0, "user", "only question here"),
      (2L, 1, "assistant", "the answer text"),
      (3L, 0, "system", "a very long system prompt of ten whole tokens x"),
      (3L, 1, "user", "hi there")
    ).toDF("conv_id", "t", "role", "text")
    val out = Chat.truncateToBudget(t, "conv_id", "t", "role", "text",
        maxTokens = 9L)
      .select($"conv_id", $"t", $"role", $"truncated")
      .as[(Long, Int, String, Boolean)].collect().toSet
    assert(out === Set(
      (1L, 0, "system", true), (1L, 2, "assistant", true),
      (1L, 3, "user", true),
      (2L, 0, "user", false), (2L, 1, "assistant", false),
      (3L, 0, "system", true)))
    // n_tokens is the whitespace count of the turn's own text
    val nt = Chat.truncateToBudget(t, "conv_id", "t", "role", "text",
        maxTokens = 9L)
      .filter($"conv_id" === 1L && $"t" === 0)
      .select($"n_tokens").as[Long].head()
    assert(nt === 2L)
    // a zero budget keeps exactly the system turns
    val zero = Chat.truncateToBudget(t, "conv_id", "t", "role", "text",
        maxTokens = 0L)
      .select($"conv_id", $"t").as[(Long, Int)].collect().toSet
    assert(zero === Set((1L, 0), (3L, 0)))
  }

  test("linearizeTree: every leaf becomes one root-first path; " +
      "branches share their prefix") {
    // tree: 1(sys) -> 2(user) -> {3(asst), 4(asst)}; 5(sys) solo root
    val msgs = Seq(
      (1L, None, "system", "s1"),
      (2L, Some(1L), "user", "u2"),
      (3L, Some(2L), "assistant", "a3"),
      (4L, Some(2L), "assistant", "a4"),
      (5L, None, "system", "s5"))
      .toDF("msg_id", "parent_id", "role", "text")
    val got = Chat.linearizeTree(msgs, "msg_id", "parent_id", "role",
        "text", maxDepth = 5)
      .select($"conv_id", $"n_turns", $"complete",
        expr("transform(turns, t -> t.text)"))
      .as[(Long, Int, Boolean, Seq[String])].collect()
      .sortBy(_._1).toSeq
    assert(got === Seq(
      (3L, 3, true, Seq("s1", "u2", "a3")),
      (4L, 3, true, Seq("s1", "u2", "a4")),
      (5L, 1, true, Seq("s5"))))
  }

  test("linearizeTree: maxDepth cutoff and missing parents are " +
      "flagged incomplete, not silently truncated-as-complete") {
    val msgs = Seq(
      (1L, None, "system", "s1"),
      (2L, Some(1L), "user", "u2"),
      (3L, Some(2L), "assistant", "a3"),
      (9L, Some(99L), "user", "orphan")) // parent row missing
      .toDF("msg_id", "parent_id", "role", "text")
    val got = Chat.linearizeTree(msgs, "msg_id", "parent_id", "role",
        "text", maxDepth = 2)
      .select($"conv_id", $"n_turns", $"complete",
        expr("transform(turns, t -> t.text)"))
      .as[(Long, Int, Boolean, Seq[String])].collect()
      .sortBy(_._1).toSeq
    assert(got === Seq(
      (3L, 2, false, Seq("u2", "a3")), // cut at maxDepth: root missing
      (9L, 1, false, Seq("orphan"))))  // dangling parent pointer
  }

  test("linearizeTree: self-parents become roots; a pure 2-cycle has " +
      "no leaf and yields no rows (the documented silent-drop mode); " +
      "a cycle WITH an external child surfaces incomplete") {
    val msgs = Seq(
      (1L, Some(1L), "system", "selfloop"), // corrupt: own parent
      (2L, Some(3L), "user", "cycA"),       // pure 2-cycle: no output
      (3L, Some(2L), "user", "cycB"),
      (4L, Some(5L), "user", "cycC"),       // 2-cycle with a child...
      (5L, Some(4L), "user", "cycD"),
      (6L, Some(4L), "assistant", "tail"))  // ...surfaces via the child
      .toDF("msg_id", "parent_id", "role", "text")
    val got = Chat.linearizeTree(msgs, "msg_id", "parent_id", "role",
        "text", maxDepth = 4)
      .select($"conv_id", $"n_turns", $"complete",
        expr("transform(turns, t -> t.text)"))
      .as[(Long, Int, Boolean, Seq[String])].collect()
      .sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 1, true, Seq("selfloop")),
      // leaf 6 walks up 4 -> 5 -> 4 until maxDepth, flagged incomplete
      (6L, 4, false, Seq("cycC", "cycD", "cycC", "tail"))))
  }
}
