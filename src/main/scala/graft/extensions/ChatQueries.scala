package graft.extensions

import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.TextFns
import graft.operators.{Chat, Dedup, Fim}
import graft.tables.Tables.documents

/** Driver-checked queries for chat-template rendering and loss-mask
  * spans ([[graft.operators.Chat]]).
  *
  * Conversations are synthesized from doc_id arithmetic — 2/4/6
  * alternating user/assistant turns, a leading system turn on every
  * 4th conversation — so both engines derive the identical turn table;
  * the oracle renders with `string_agg(... ORDER BY t)` and re-derives
  * the span offsets with the same exclusive prefix sum of rendered
  * lengths. The engine-side `span_ok` column actually SLICES the
  * rendered conversation at the claimed offsets and compares to the
  * turn text, so a span defect fails the gate even though the oracle's
  * column is a constant TRUE.
  */
private[graft] object ChatQueries {

  private def s(c: org.apache.spark.sql.Column) = c.cast("string")

  private def turns(sp: org.apache.spark.sql.SparkSession, dir: String) = {
    val id = col("conv_id")
    val base = documents(sp, dir).select(
      col("doc_id").as("conv_id"),
      (pmod(col("doc_id"), lit(4)) === 0).as("hs"))
      .withColumn("total",
        lit(2) + pmod(id, lit(3)).cast("int") * 2 +
          when(col("hs"), 1).otherwise(0))
      .select(id, col("hs"),
        explode(sequence(lit(0), col("total") - 1)).as("t"))
    val off = when(col("hs"), 1).otherwise(0)
    base
      .withColumn("role",
        when(col("hs") && col("t") === 0, lit("system"))
          .when(pmod(col("t") - off, lit(2)) === 0, lit("user"))
          .otherwise(lit("assistant")))
      .withColumn("text",
        when(col("role") === "system",
          concat(lit("sys "), s(pmod(id, lit(5)))))
          .when(col("role") === "user",
            concat(lit("ask "), s(pmod(id, lit(7))), lit(" "),
              s(col("t"))))
          .otherwise(concat(lit("ans "), s(pmod(id, lit(11))),
            lit(" "), s(col("t")))))
  }

  /** Oracle CTE reconstructing the turn table and rendered segments. */
  private val oracleTurns: String =
    """t AS (SELECT d.doc_id, d.hs, r.i AS t
      |  FROM (SELECT doc_id, doc_id % 4 = 0 AS hs FROM documents) d,
      |   range(7) r(i)
      |  WHERE r.i < 2 + 2 * (d.doc_id % 3) +
      |   CASE WHEN d.hs THEN 1 ELSE 0 END),
      |r AS (SELECT doc_id, t,
      |  CASE WHEN hs AND t = 0 THEN 'system'
      |   WHEN (t - CASE WHEN hs THEN 1 ELSE 0 END) % 2 = 0 THEN 'user'
      |   ELSE 'assistant' END AS role,
      |  CASE WHEN hs AND t = 0
      |    THEN 'sys ' || CAST(doc_id % 5 AS VARCHAR)
      |   WHEN (t - CASE WHEN hs THEN 1 ELSE 0 END) % 2 = 0
      |    THEN 'ask ' || CAST(doc_id % 7 AS VARCHAR) || ' ' ||
      |     CAST(t AS VARCHAR)
      |   ELSE 'ans ' || CAST(doc_id % 11 AS VARCHAR) || ' ' ||
      |    CAST(t AS VARCHAR) END AS txt
      | FROM t),
      |seg AS (SELECT doc_id, t, role, txt,
      |  '<|' || role || '|>' || txt || '<|end|>' AS sg FROM r)""".stripMargin

  val all: Seq[Q] = Seq(

    // Template rendering: per-conversation ordered concatenation of
    // <|role|>text<|end|> segments (system turn included as a turn).
    Q("ext_chat_render",
      s"""WITH $oracleTurns
         |SELECT doc_id AS conv_id,
         | CAST(2 + 2 * (doc_id % 3) +
         |  CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS INT)
         |  AS n_turns,
         | string_agg(sg, '' ORDER BY t) AS text
         |FROM seg GROUP BY doc_id ORDER BY conv_id""".stripMargin) {
      (sp, dir) =>
        Chat.renderConversations(turns(sp, dir), "conv_id", "t",
            "role", "text")
          .orderBy(col("conv_id"))
    },

    // SFT corpus dedup composition: conversations rendered by the
    // REAL template engine collapse to exact duplicate groups — every
    // turn derives from k = conv_id % 100, so each of the 100 distinct
    // dialogues recurs across the corpus. The oracle rebuilds each
    // rendered string with string_agg, md5-hashes it directly
    // (normText is the identity on template output: already lowercase,
    // single-spaced, untrimmed ends) and re-derives canonical ids and
    // group sizes arithmetically.
    Q("ext_chat_dedup",
      """WITH g AS (SELECT doc_id % 100 AS k,
        |  CAST(count(*) AS BIGINT) AS group_size,
        |  CAST(min(doc_id) AS BIGINT) AS canonical_id
        | FROM documents GROUP BY 1),
        |seg AS (SELECT kk.k, r.i AS t,
        |  '<|' || (CASE WHEN r.i % 2 = 0 THEN 'user'
        |    ELSE 'assistant' END) || '|>' ||
        |  (CASE WHEN r.i % 2 = 0
        |    THEN 'ask ' || CAST(kk.k % 7 AS VARCHAR)
        |    ELSE 'ans ' || CAST(kk.k % 11 AS VARCHAR) END) ||
        |  ' ' || CAST(r.i AS VARCHAR) || '<|end|>' AS sg
        | FROM (SELECT DISTINCT k FROM g) kk, range(6) r(i)
        | WHERE r.i < 2 + 2 * (kk.k % 3)),
        |txt AS (SELECT k, string_agg(sg, '' ORDER BY t) AS rendered
        |  FROM seg GROUP BY 1)
        |SELECT md5(rendered) AS text_hash, canonical_id, group_size
        |FROM txt JOIN g USING (k)
        |ORDER BY canonical_id""".stripMargin) { (sp, dir) =>
      val id = col("conv_id")
      val k = pmod(id, lit(100))
      val turnsK = documents(sp, dir)
        .select(col("doc_id").as("conv_id"))
        .withColumn("total", lit(2) + pmod(k, lit(3)).cast("int") * 2)
        .select(id, explode(sequence(lit(0), col("total") - 1)).as("t"))
        .withColumn("role",
          when(pmod(col("t"), lit(2)) === 0, lit("user"))
            .otherwise(lit("assistant")))
        .withColumn("text",
          when(col("role") === "user",
            concat(lit("ask "), s(pmod(k, lit(7))), lit(" "),
              s(col("t"))))
            .otherwise(concat(lit("ans "), s(pmod(k, lit(11))),
              lit(" "), s(col("t")))))
      val rendered = Chat.renderConversations(turnsK, "conv_id", "t",
        "role", "text")
      Dedup.exact(rendered, "conv_id", "text")
        .select(col("text_hash"), col("canonical_id"),
          col("group_size"))
        .orderBy(col("canonical_id"))
    },

    // Loss-mask spans: 0-based [char_start, char_end) of each
    // assistant turn's text in the rendered conversation; span_ok is
    // an ACTUAL slice-and-compare on the engine side.
    Q("ext_chat_spans",
      s"""WITH $oracleTurns
         |SELECT conv_id, turn_idx, char_start,
         | CAST(char_start + tl AS BIGINT) AS char_end, TRUE AS span_ok
         |FROM (SELECT doc_id AS conv_id, CAST(t AS INT) AS turn_idx,
         |  role, length(txt) AS tl,
         |  CAST(coalesce(sum(length(sg)) OVER (PARTITION BY doc_id
         |    ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND
         |    1 PRECEDING), 0) + 13 AS BIGINT) AS char_start
         | FROM seg)
         |WHERE role = 'assistant'
         |ORDER BY conv_id, turn_idx""".stripMargin) { (sp, dir) =>
      val tt = turns(sp, dir)
      val spans = Chat.assistantSpans(tt, "conv_id", "t", "role", "text")
      val rendered = Chat.renderConversations(tt, "conv_id", "t",
          "role", "text")
        .select(col("conv_id"), col("text").as("__full"))
      spans
        .join(rendered, Seq("conv_id"))
        .join(tt.select(col("conv_id"), col("t"),
          col("text").as("__turn")), Seq("conv_id", "t"))
        .withColumn("span_ok",
          expr("substring(__full, char_start + 1, char_end - char_start)")
            === col("__turn"))
        .select(col("conv_id"), col("t").cast("int").as("turn_idx"),
          col("char_start"), col("char_end"), col("span_ok"))
        .orderBy(col("conv_id"), col("turn_idx"))
    },

    // PII-scrubbed SFT rendering — the composition a real SFT pipeline
    // runs (redact THEN render, so no raw PII survives into packed
    // training text): user turns carry a real synthesized email and
    // SSN through the real regex redaction; the oracle states the
    // expected post-redaction conversation outright, so a redaction
    // miss OR an over-redaction breaks the hash.
    Q("ext_chat_redact",
      s"""WITH $oracleTurns,
         |rt AS (SELECT doc_id, t,
         |  CASE WHEN role = 'user'
         |   THEN 'reach <EMAIL> or <SSN> turn ' || CAST(t AS VARCHAR)
         |   ELSE txt END AS txt, role FROM r),
         |seg2 AS (SELECT doc_id, t,
         |  '<|' || role || '|>' || txt || '<|end|>' AS sg FROM rt)
         |SELECT doc_id AS conv_id,
         | CAST(2 + 2 * (doc_id % 3) +
         |  CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS INT)
         |  AS n_turns,
         | string_agg(sg, '' ORDER BY t) AS text
         |FROM seg2 GROUP BY doc_id ORDER BY conv_id""".stripMargin) {
      (sp, dir) =>
        val id = col("conv_id")
        val userTxt = concat(
          lit("reach user"), s(pmod(id, lit(9))),
          lit("@mail"), s(pmod(id, lit(7))), lit(".com or "),
          s(pmod(id, lit(900)) + 100), lit("-"),
          s(pmod(id, lit(90)) + 10), lit("-"),
          s(pmod(id, lit(9000)) + 1000),
          lit(" turn "), s(col("t")))
        val withPii = turns(sp, dir).withColumn("text",
          when(col("role") === "user", userTxt).otherwise(col("text")))
        val scrubbed = withPii.withColumn("text",
          graft.operators.Pii.redact(col("text")))
        Chat.renderConversations(scrubbed, "conv_id", "t", "role",
            "text")
          .orderBy(col("conv_id"))
    },

    // Tool-call QA: assistant turns carry REAL JSON tool calls (valid,
    // unknown-tool, truncated-JSON and plain-text variants) through
    // the real from_json validation; the oracle states every expected
    // flag from the generator branch, so a parse that wrongly accepts
    // the truncated call or rejects a valid one breaks the hash.
    Q("ext_chat_tool_calls",
      s"""WITH $oracleTurns
         |SELECT doc_id AS conv_id, CAST(t AS INT) AS turn_idx,
         | doc_id % 5 != 4 AS is_call,
         | CASE doc_id % 5 WHEN 0 THEN 'search' WHEN 1 THEN 'calc'
         |  WHEN 2 THEN 'frobnicate' ELSE '' END AS tool,
         | doc_id % 5 IN (0, 1, 2) AS parsed_ok,
         | doc_id % 5 IN (0, 1) AS tool_known,
         | CAST(CASE doc_id % 5 WHEN 0 THEN 2 WHEN 1 THEN 1
         |  WHEN 2 THEN 0 ELSE -1 END AS INT) AS n_args
         |FROM r WHERE role = 'assistant'
         |ORDER BY conv_id, turn_idx""".stripMargin) { (sp, dir) =>
      val id = col("conv_id")
      val c = pmod(id, lit(5))
      val callTxt = when(c === 0, concat(
          lit("{\"tool\":\"search\",\"args\":{\"q\":\"q"),
          s(pmod(id, lit(9))), lit("\",\"k\":\"5\"}}")))
        .when(c === 1, concat(
          lit("{\"tool\":\"calc\",\"args\":{\"x\":\""),
          s(pmod(id, lit(7))), lit("\"}}")))
        .when(c === 2, lit("{\"tool\":\"frobnicate\",\"args\":{}}"))
        .when(c === 3, lit("{\"tool\":\"search\",\"args\":"))
        .otherwise(col("text"))
      val tt = turns(sp, dir).withColumn("text",
        when(col("role") === "assistant", callTxt).otherwise(col("text")))
      Chat.validateToolCalls(tt, "conv_id", "t", "role", "text",
          allowed = Seq("search", "calc"))
        .select(col("conv_id"), col("t").cast("int").as("turn_idx"),
          col("is_call"), col("tool"), col("parsed_ok"),
          col("tool_known"), col("n_args"))
        .orderBy(col("conv_id"), col("turn_idx"))
    },

    // Context-budget truncation: fit each conversation into 9 tokens
    // by keeping every system turn plus the longest suffix of
    // non-system turns that still fits (whole turns only — the
    // crossing turn drops; a training sample must fit the context
    // window). The fixture's 2/4/6-turn conversations land on both
    // sides of the budget, and the system-turn conversations exercise
    // the reserved-system-budget arithmetic. The oracle mirrors the
    // reverse prefix sum, the system reservation and the truncation
    // flag window-for-window.
    Q("ext_chat_trunc",
      s"""WITH $oracleTurns,
         |n AS (SELECT doc_id, t, role, txt,
         |  CAST(len(string_split_regex(lower(txt), '\\s+')) AS BIGINT)
         |   AS nt FROM r),
         |w AS (SELECT doc_id, t, role, txt, nt,
         |  sum(CASE WHEN role = 'system' THEN nt ELSE 0 END)
         |   OVER (PARTITION BY doc_id) AS sys_nt,
         |  sum(CASE WHEN role = 'system' THEN 0 ELSE nt END)
         |   OVER (PARTITION BY doc_id ORDER BY t DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |   AS rev_cum,
         |  sum(CASE WHEN role = 'system' THEN 0 ELSE 1 END)
         |   OVER (PARTITION BY doc_id) AS non_tot
         | FROM n),
         |k AS (SELECT *, (role = 'system' OR rev_cum <= 9 - sys_nt)
         |  AS keep FROM w),
         |f AS (SELECT *, sum(CASE WHEN keep AND role != 'system'
         |   THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id) AS non_kept
         | FROM k)
         |SELECT doc_id AS conv_id, CAST(t AS INT) AS turn_idx, role,
         | txt AS text, nt AS n_tokens, non_kept < non_tot AS truncated
         |FROM f WHERE keep ORDER BY conv_id, turn_idx""".stripMargin) {
      (sp, dir) =>
        Chat.truncateToBudget(turns(sp, dir), "conv_id", "t", "role",
            "text", maxTokens = 9L)
          .select(col("conv_id"), col("t").cast("int").as("turn_idx"),
            col("role"), col("text"), col("n_tokens"), col("truncated"))
          .orderBy(col("conv_id"), col("turn_idx"))
    },

    // DPO preference pairs over REAL document texts: ~5 responses per
    // prompt (doc_id % 101), scored by an md5-prefix hash both engines
    // derive identically; the oracle picks chosen/rejected with twin
    // row_number windows mirroring max(struct)/min(struct) tie order.
    Q("ext_dpo_pairs",
      """WITH r AS (SELECT doc_id % 101 AS prompt_id, text,
        |  CAST(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 13
        |   AS INT) AS score FROM documents),
        |w AS (SELECT prompt_id, text, score,
        |  row_number() OVER (PARTITION BY prompt_id
        |   ORDER BY score DESC, text DESC) AS rc,
        |  row_number() OVER (PARTITION BY prompt_id
        |   ORDER BY score ASC, text ASC) AS rr,
        |  count(*) OVER (PARTITION BY prompt_id) AS n FROM r),
        |c AS (SELECT prompt_id, text AS chosen, score AS chosen_score,
        |  n FROM w WHERE rc = 1),
        |j AS (SELECT prompt_id, text AS rejected,
        |  score AS rejected_score FROM w WHERE rr = 1)
        |SELECT c.prompt_id, chosen, chosen_score, rejected,
        | rejected_score, CAST(n AS INT) AS n_responses,
        | CAST(chosen_score - rejected_score AS INT) AS margin
        |FROM c JOIN j USING (prompt_id)
        |WHERE chosen_score > rejected_score
        |ORDER BY prompt_id""".stripMargin) { (sp, dir) =>
      val resp = documents(sp, dir).select(
        pmod(col("doc_id"), lit(101)).as("prompt_id"), col("text"),
        (TextFns.hash32(col("text")) % 13).cast("int").as("score"))
      Chat.preferencePairs(resp, "prompt_id", "text", "score")
        .orderBy(col("prompt_id"))
    },

    // Branching conversation-tree linearization: messages form
    // complete binary trees in blocks of 15 (heap indexing: node r's
    // parent is (r-1)/2, roots at r=0), so every ancestor chain is
    // CLOSED-FORM — node at path depth j is ((r+1) // 2^(dep-j)) - 1 —
    // and the oracle needs no recursion, while the Spark side runs the
    // REAL leaf discovery (anti-join) and iterative parent joins. The
    // tail block is truncated, so leaf discovery must handle interior
    // nodes whose children fall off the end of the table.
    Q("ext_chat_tree",
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |d AS (SELECT doc_id, doc_id // 15 AS b, doc_id % 15 AS r
        |  FROM documents),
        |lv AS (SELECT doc_id, b, r,
        |  CASE WHEN r = 0 THEN 0 WHEN r <= 2 THEN 1
        |   WHEN r <= 6 THEN 2 ELSE 3 END AS dep
        | FROM d CROSS JOIN nn
        | WHERE 2*r + 1 >= least(15, nn.n - b*15)),
        |t AS (SELECT doc_id, dep, j,
        |  b*15 + ((r+1) // (1 << (dep - j))) - 1 AS node
        | FROM lv, unnest(range(0, dep + 1)) u(j))
        |SELECT doc_id AS conv_id, CAST(dep + 1 AS INT) AS n_turns,
        | TRUE AS complete, CAST(j AS INT) AS turn_idx,
        | CASE WHEN j = 0 THEN 'system' WHEN j % 2 = 1 THEN 'user'
        |  ELSE 'assistant' END AS role,
        | 'm' || CAST(node AS VARCHAR) AS text
        |FROM t ORDER BY conv_id, turn_idx""".stripMargin) { (sp, dir) =>
      val id = col("doc_id")
      val r = pmod(id, lit(15))
      val msgs = documents(sp, dir).select(
        id.as("msg_id"),
        when(r === 0, lit(null).cast("long"))
          .otherwise(expr(
            "(doc_id div 15) * 15 + ((doc_id % 15) - 1) div 2"))
          .as("parent_id"),
        when(r === 0, lit("system"))
          .when(r <= 2 || r >= 7, lit("user"))
          .otherwise(lit("assistant")).as("role"),
        concat(lit("m"), s(id)).as("text"))
      Chat.linearizeTree(msgs, "msg_id", "parent_id", "role", "text",
          maxDepth = 4)
        .select(col("conv_id"), col("n_turns"), col("complete"),
          posexplode(col("turns")).as(Seq("turn_idx", "__t")))
        .select(col("conv_id"), col("n_turns"), col("complete"),
          col("turn_idx").cast("int").as("turn_idx"),
          col("__t.role").as("role"), col("__t.text").as("text"))
        .orderBy(col("conv_id"), col("turn_idx"))
    },

    // Fill-in-middle rewrite of REAL document texts (PSM order, 60%
    // apply rate): the oracle reproduces the md5-derived apply bit and
    // cut points and reassembles the identical <PRE>/<SUF>/<MID>
    // string from three substrs.
    Q("ext_fim",
      """WITH f AS (SELECT doc_id, text, length(text) AS len,
        |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':m'),
        |   1, 8) AS BIGINT) % 100 < 60 AS ap,
        |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':a'),
        |   1, 8) AS BIGINT) % (length(text) + 1) AS h1,
        |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':b'),
        |   1, 8) AS BIGINT) % (length(text) + 1) AS h2
        | FROM documents)
        |SELECT doc_id, ap AS fim_applied,
        | CAST(CASE WHEN ap THEN least(h1, h2) ELSE -1 END AS INT)
        |  AS cut_start,
        | CAST(CASE WHEN ap THEN greatest(h1, h2) ELSE -1 END AS INT)
        |  AS cut_end,
        | CASE WHEN ap THEN
        |  '<PRE>' || substr(text, 1, least(h1, h2)) ||
        |  '<SUF>' || substr(text, greatest(h1, h2) + 1,
        |    len - greatest(h1, h2)) ||
        |  '<MID>' || substr(text, least(h1, h2) + 1,
        |    greatest(h1, h2) - least(h1, h2))
        |  ELSE text END AS fim_text
        |FROM f ORDER BY doc_id""".stripMargin) { (sp, dir) =>
      Fim.fimTransform(
          documents(sp, dir).select(col("doc_id"), col("text")),
          "doc_id", "text", ratePct = 60)
        .select(col("doc_id"), col("fim_applied"), col("cut_start"),
          col("cut_end"), col("fim_text"))
        .orderBy(col("doc_id"))
    })
}
