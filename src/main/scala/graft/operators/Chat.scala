package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chat-template rendering and loss-mask spans — the SFT-data prep
  * stage: turn tables become packed training text, and the assistant
  * turns' character ranges become the spans a trainer unmasks for the
  * loss.
  *
  * Template: each turn renders as `<|role|>text<|end|>` and a
  * conversation is its turns concatenated in `idxCol` order (a system
  * turn is just a row with role `system`, so the operators need no
  * special-casing).
  *
  * Scale shape: rendering is ONE hash aggregation per conversation
  * (collect into an array, `array_sort` for determinism against
  * collect_list's arrival order, then a fold — conversations are
  * KB-sized so the per-group state is bounded); spans are ONE window
  * partitioned by conversation doing an exclusive prefix sum of
  * rendered-turn lengths. Both shuffle once on the conversation key
  * and nothing is driver-side.
  */
object Chat {

  /** `<|role|>text<|end|>` — one turn's rendered form. */
  def renderedTurn(role: Column, text: Column): Column =
    concat(lit("<|"), role, lit("|>"), text, lit("<|end|>"))

  /** One row per conversation: `(convCol, n_turns, text)` with turns
    * concatenated in `idxCol` order.
    */
  def renderConversations(df: DataFrame, convCol: String, idxCol: String,
                          roleCol: String, textCol: String): DataFrame =
    df.groupBy(col(convCol))
      .agg(count(lit(1)).cast("int").as("n_turns"),
        aggregate(
          array_sort(collect_list(struct(col(idxCol).as("i"),
            renderedTurn(col(roleCol), col(textCol)).as("r")))),
          lit(""), (acc, x) => concat(acc, x.getField("r"))).as("text"))

  /** Tool-call QA over assistant turns — the SFT-data validation step
    * that catches malformed function-calling examples before they
    * reach training: one row per assistant turn with `is_call` (the
    * text looks like a JSON object), `tool` (parsed name, empty when
    * absent), `parsed_ok` (JSON parsed and carried a tool name),
    * `tool_known` (name is in `allowed`) and `n_args` (-1 when
    * unparseable). Parsing is Spark-native `from_json` with an
    * explicit schema — a narrow codegen-adjacent projection, no UDF,
    * no shuffle.
    */
  def validateToolCalls(df: DataFrame, convCol: String, idxCol: String,
                        roleCol: String, textCol: String,
                        allowed: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("tool", StringType),
      StructField("args", MapType(StringType, StringType))))
    val parsed = from_json(col(textCol), schema)
    df.filter(col(roleCol) === "assistant")
      .withColumn("is_call", startswith(trim(col(textCol)), lit("{")))
      .withColumn("__tool",
        when(col("is_call"), parsed.getField("tool")))
      .withColumn("parsed_ok", col("is_call") && col("__tool").isNotNull)
      .withColumn("tool_known",
        col("parsed_ok") && col("__tool").isin(allowed: _*))
      .withColumn("n_args",
        when(col("parsed_ok"),
          coalesce(size(parsed.getField("args")), lit(0)))
          .otherwise(lit(-1)).cast("int"))
      .select(col(convCol), col(idxCol), col("is_call"),
        coalesce(col("__tool"), lit("")).as("tool"),
        col("parsed_ok"), col("tool_known"), col("n_args"))
  }

  /** Per-prompt preference pairs for DPO-style training: `chosen` is
    * the (score, text)-max response, `rejected` the min, and only
    * prompts with a strict score gap survive (a pair with no margin
    * teaches nothing). ONE hash aggregation — `max(struct)` /
    * `min(struct)` — per prompt; ties break lexicographically on the
    * response text so the pair is deterministic under any
    * partitioning.
    */
  def preferencePairs(df: DataFrame, promptCol: String, textCol: String,
                      scoreCol: String): DataFrame =
    df.groupBy(col(promptCol))
      .agg(
        max(struct(col(scoreCol).as("s"), col(textCol).as("t")))
          .as("__c"),
        min(struct(col(scoreCol).as("s"), col(textCol).as("t")))
          .as("__r"),
        count(lit(1)).cast("int").as("n_responses"))
      .select(col(promptCol),
        col("__c.t").as("chosen"), col("__c.s").as("chosen_score"),
        col("__r.t").as("rejected"), col("__r.s").as("rejected_score"),
        col("n_responses"))
      .filter(col("chosen_score") > col("rejected_score"))
      .withColumn("margin", col("chosen_score") - col("rejected_score"))

  /** 0-based character spans of the assistant turns' text (template
    * markers excluded) inside the rendered conversation: one row per
    * assistant turn, `(convCol, idxCol, char_start, char_end)` with
    * `char_end` exclusive — `substring(rendered, char_start + 1,
    * char_end - char_start)` is exactly the turn's text.
    */
  def assistantSpans(df: DataFrame, convCol: String, idxCol: String,
                     roleCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col(convCol)).orderBy(col(idxCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prev = coalesce(sum(length(renderedTurn(col(roleCol),
      col(textCol)))).over(w), lit(0L))
    val open = length(concat(lit("<|"), col(roleCol), lit("|>")))
    df.withColumn("char_start", prev + open)
      .withColumn("char_end", col("char_start") + length(col(textCol)))
      .filter(col(roleCol) === "assistant")
      .select(col(convCol), col(idxCol),
        col("char_start").cast("long").as("char_start"),
        col("char_end").cast("long").as("char_end"))
  }

  /** Context-budget truncation — the step between conversation
    * assembly ([[linearizeTree]] → turn tables) and packing
    * ([[graft.operators.Corpus.packSequences]]): fit each
    * conversation into `maxTokens` by keeping every SYSTEM turn plus
    * the longest SUFFIX of non-system turns (the most recent context
    * — dropping the head of a dialogue loses less than dropping its
    * tail) whose token total, system turns included, still fits.
    * Whole turns only — the boundary turn that would cross the budget
    * DROPS entirely (a hard cap, unlike [[Corpus.tokenQuotaByGroup]]'s
    * greedy fill: a training sample must fit the context window, so
    * "one over" is not an option; a split turn would train on a
    * half-utterance). If the system turns alone exceed the budget
    * they still all survive — the caller's invariant is "the system
    * prompt is never silently lost", and such conversations surface
    * via `truncated` with zero non-system turns kept.
    *
    * Output: one row per KEPT turn — the input columns plus
    * `n_tokens` (the turn's whitespace token count — swap in a
    * [[Corpus.bpeEncode]]-derived count upstream for tokenizer-true
    * budgeting, the [[Corpus.tokenQuotaByGroupCounts]] pattern) and
    * `truncated` (true on every row of a conversation that lost at
    * least one turn).
    *
    * Scale shape: one narrow token-count projection, then ONE
    * conversation-keyed hash-partitioned window computing the
    * reverse prefix sum (ORDER BY `idxCol` DESC) alongside the
    * unordered per-conversation aggregates (system token total,
    * non-system turn counts) — conversations are tens of turns, so
    * every window group is tiny; no join, nothing driver-side.
    */
  def truncateToBudget(df: DataFrame, convCol: String, idxCol: String,
                       roleCol: String, textCol: String,
                       maxTokens: Long): DataFrame = {
    require(maxTokens >= 0, s"maxTokens must be >= 0, got $maxTokens")
    import graft.functions.TextFns
    val conv = Window.partitionBy(col(convCol))
    // idxCol is expected unique per conversation (a turn ORDER); the
    // (role, length, hash-of-text) tiebreak makes the cumulative
    // sum — and therefore which boundary turn survives —
    // deterministic even when an upstream bug duplicates an index,
    // instead of varying with partitioning (exact-duplicate rows
    // remain interchangeable, which is output-identical either way).
    // Cheap fixed-width keys, NOT the raw text column: the tiebreak
    // only matters on duplicated indexes, so every healthy sort
    // should not be comparing message bodies
    val rev = conv.orderBy(col(idxCol).desc, col(roleCol).desc,
        length(col(textCol)).desc, xxhash64(col(textCol)).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isSys = col(roleCol) === "system"
    val n = df.withColumn("n_tokens",
      size(TextFns.toks(col(textCol))).cast("long"))
    val w = n
      .withColumn("__sys_nt",
        sum(when(isSys, col("n_tokens")).otherwise(0L)).over(conv))
      .withColumn("__rev_cum",
        sum(when(isSys, 0L).otherwise(col("n_tokens"))).over(rev))
      .withColumn("__non_tot",
        sum(when(isSys, 0L).otherwise(1L)).over(conv))
      .withColumn("__keep",
        isSys || col("__rev_cum") <= lit(maxTokens) - col("__sys_nt"))
    w.withColumn("__non_kept",
        sum(when(col("__keep") && !isSys, 1L).otherwise(0L)).over(conv))
      .filter(col("__keep"))
      .withColumn("truncated", col("__non_kept") < col("__non_tot"))
      .drop("__sys_nt", "__rev_cum", "__non_tot", "__keep", "__non_kept")
  }

  /** BRANCHING conversation-tree linearization — the SFT-prep step for
    * message tables where a turn can have multiple alternative
    * children (edit/regenerate trees): every LEAF becomes one training
    * sample whose turns are its root-to-leaf path. Input is one row
    * per message `(idCol, parentCol, roleCol, textCol)` with
    * `parentCol` null at roots; leaves are discovered (a message no
    * other message names as parent), so the caller passes the raw
    * table. Output is one row per leaf: `(conv_id = leaf id, n_turns,
    * complete, turns)` with `turns` the root-first
    * `array<struct<role, text>>` and `complete` false when an ancestor
    * chain was cut off by `maxDepth` or a missing parent row —
    * callers filter on it rather than training on truncated prefixes.
    *
    * Corrupt parent pointers: a SELF-parent row is treated as a root
    * of its own conversation (the pointer is neutralized, the message
    * is not lost). A pure parent-pointer CYCLE of length ≥ 2 with no
    * external child has NO leaf, so its members yield no output rows
    * at all — the one silent-drop mode; a cycle that does have an
    * external child surfaces as that child's `complete = false` path.
    * Exports that may contain multi-node cycles need an upstream
    * audit (e.g. diff distinct message ids against emitted path
    * coverage); detecting them here would cost a second full
    * propagation loop every call.
    *
    * Scale shape: one LAZY chain of `maxDepth` equi-joins of the path
    * frontier to the persisted message table on the parent key —
    * nothing materializes at call time, and the chain executes in a
    * single pipelined pass (each frontier feeds exactly the next
    * join, so no intermediate needs caching; only the message-table
    * invariant stays persisted, for the returned plan's lifetime —
    * the knBigramScore cb convention). Paths
    * carry their accumulated turns, so a path row is conversation-
    * sized, never corpus-sized. A viral shared ancestor (many leaves
    * under one root) is a hot join key on the MESSAGE side — the
    * build side of the hash join — so fan-out skew lands on the
    * probe side where AQE skew-split applies; depth is the bounded
    * dimension (chat trees are tens of turns, not thousands).
    */
  def linearizeTree(messages: DataFrame, idCol: String,
                    parentCol: String, roleCol: String, textCol: String,
                    maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val m = messages.select(col(idCol).as("__id"),
        when(col(parentCol) === col(idCol), lit(null))
          .otherwise(col(parentCol)).as("__parent"),
        col(roleCol).as("__role"), col(textCol).as("__text"))
      .persist(MEMORY_AND_DISK)
    val leaves = m.join(
      m.select(col("__parent").as("__id")).filter(col("__id").isNotNull),
      Seq("__id"), "left_anti")
    var paths = leaves.select(col("__id").as("conv_id"),
      col("__parent").as("__cur"),
      array(struct(col("__role").as("role"), col("__text").as("text")))
        .as("__turns"))
    // only `m` is a loop INVARIANT (persisted above — it is read by
    // the leaf discovery and by every iteration's join, and stays
    // pinned for the returned plan's lifetime, the knBigramScore cb
    // convention). The paths frames are deliberately NOT persisted:
    // each is consumed exactly once by the next iteration, so the
    // returned plan is one linear chain of `maxDepth` joins that
    // executes in a single pipelined pass — caching the intermediates
    // would either pin O(maxDepth) conversation-sized frames
    // (persist-only, the r9 leak) or force maxDepth eager count()
    // jobs at call time (persist+count+unpersist — measured 3.2x
    // slower end-to-end than the pipelined chain). Lazy like every
    // other operator; depth is bounded (tens of turns), so the plan
    // stays well inside Catalyst's comfortable size.
    (1 until maxDepth).foreach { _ =>
      paths = paths.join(
          m.select(col("__id").as("__cur"), col("__parent").as("__next"),
            struct(col("__role").as("role"), col("__text").as("text"))
              .as("__t")),
          Seq("__cur"), "left_outer")
        .select(col("conv_id"),
          when(col("__t").isNotNull, col("__next"))
            .otherwise(col("__cur")).as("__cur"),
          when(col("__t").isNotNull,
            concat(array(col("__t")), col("__turns")))
            .otherwise(col("__turns")).as("__turns"))
    }
    paths.select(col("conv_id"),
      size(col("__turns")).as("n_turns"),
      col("__cur").isNull.as("complete"),
      col("__turns").as("turns"))
  }
}
