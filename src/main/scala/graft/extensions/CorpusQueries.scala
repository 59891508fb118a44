package graft.extensions

import graft.Q
import graft.functions.TextFns
import graft.operators.{Corpus, Dedup, Layout, Stats, Temporal, TextAnalysis}
import graft.tables.Tables._
import org.apache.spark.sql.functions._

/** Registry wiring for the temporal operators (sessionization, as-of
  * join) and the corpus-curation operators (TF-IDF, deterministic
  * sampling/mixing, span duplication, vocabulary head, stopword
  * scrubbing) — each with an exact DuckDB oracle.
  *
  * Timestamp arithmetic runs on MICROSECONDS derived from the raw
  * epoch-nanos Long of the events scan (`ts div 1000`), mirrored by
  * DuckDB `epoch_us(ts)`: the events parquet carries sub-µs residue
  * that DuckDB floors away at scan time, so µs is the finest
  * resolution both engines agree on exactly (same pattern as
  * `pipe_log_split`'s `epoch_ns // 1000000`). Gap/lag arithmetic is
  * then exact integer on both sides.
  */
object CorpusQueries {

  /** 4 h session gap in microseconds. */
  private val GAP_US = 4L * 3600 * 1000000L

  // DuckDB-side tokenizer/hash/shingle macros — shared definitions
  // (see OracleSql: one source of truth across all oracle files)
  import OracleSql.{TOKS, fxSql, h32, shSql}

  /** Shared session-assignment CTE prefix (DuckDB side; mirrors
    * Temporal.sessionize over events at GAP_NS).
    */
  private val sessSql =
    s"""e AS (SELECT event_id, user_id, epoch_us(ts) AS tus FROM events),
       |m AS (SELECT event_id, user_id, tus,
       |  CASE WHEN lag(tus) OVER w IS NULL
       |       OR tus - lag(tus) OVER w > $GAP_US
       |  THEN 1 ELSE 0 END AS st
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
       |s AS (SELECT event_id, user_id, tus,
       |  CAST(sum(st) OVER (PARTITION BY user_id ORDER BY event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
       |    AS session_seq
       |  FROM m)""".stripMargin

  /** events with a `ts_us` epoch-micros column (exact DuckDB mirror —
    * see the class doc).
    */
  private def eventsUs(s: org.apache.spark.sql.SparkSession, d: String) =
    eventsRaw(s, d).withColumn("ts_us", expr("ts div 1000"))

  /** Shared BPE-training CTE prefix (DuckDB side; mirrors
    * Corpus.bpeTrain round by round): v0 is the wrapped-symbol word
    * vocabulary, then one (pair-count → argmax → replace-merge) trio
    * per round. Used by both the train and encode oracles so the
    * learned merges cannot fork between them. No line of the generated
    * text may begin with `|` — the caller's stripMargin would eat it.
    */
  private def bpeCtes(merges: Int): String = {
    val rounds = (1 to merges).map { i =>
      s"""p$i AS (SELECT p[1] AS lhs, p[2] AS rhs,
         |  CAST(sum(wc) AS BIGINT) AS pc
         | FROM (SELECT wc, unnest(list_transform(range(1, len(sy)),
         |    j -> [sy[j], sy[j+1]])) AS p
         |   FROM (SELECT wc, string_split(trim(s, chr(31)),
         |      chr(31) || chr(31)) AS sy FROM v${i - 1}))
         | GROUP BY 1, 2),
         |b$i AS (SELECT CAST($i AS INT) AS step, lhs, rhs,
         |  lhs || rhs AS merged, pc AS pair_count
         | FROM p$i ORDER BY pc DESC, lhs, rhs LIMIT 1),
         |v$i AS (SELECT wc, replace(s,
         |  chr(31) || lhs || chr(31) || chr(31) || rhs || chr(31),
         |  chr(31) || lhs || rhs || chr(31)) AS s
         | FROM v${i - 1}, b$i)""".stripMargin
    }.mkString(",\n")
    s"""v0 AS (SELECT
       |  regexp_replace(word, '(.)', chr(31) || '\\1' || chr(31), 'g')
       |    AS s,
       |  CAST(count(*) AS BIGINT) AS wc
       | FROM (SELECT unnest($TOKS) AS word FROM documents)
       | WHERE len(word) > 0 GROUP BY word),
       |$rounds""".stripMargin
  }

  /** UNION ALL of the per-round argmax rows (the merge table). */
  private def bpeUnion(merges: Int): String =
    (1 to merges).map(i => s"SELECT * FROM b$i").mkString(" UNION ALL ")

  val all: Seq[Q] = Seq(

    // ---- corpus growth / mixture diagnostics ---------------------------

    // Cross-corpus n-gram novelty: a doc's fraction of trigrams it is
    // the FIRST (min doc_id) to contribute — the diminishing-returns
    // curation signal. Oracle re-derives first-seen ownership over the
    // identical distinct-shingle sets; novelty is one exact integer
    // division cast to double on both engines.
    Q("ext_novelty_first",
      s"""WITH g AS (SELECT doc_id, unnest(${shSql(3)}) AS gram
         |  FROM documents),
         |f AS (SELECT gram, min(doc_id) AS first FROM g GROUP BY 1)
         |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         | CAST(sum(CASE WHEN f.first = g.doc_id THEN 1 ELSE 0 END)
         |   AS BIGINT) AS n_novel,
         | CAST(sum(CASE WHEN f.first = g.doc_id THEN 1 ELSE 0 END)
         |   AS DOUBLE) / CAST(count(*) AS DOUBLE) AS novelty
         |FROM g JOIN f USING (gram)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
      Corpus.noveltyScores(documents(s, d), "doc_id", "text", n = 3)
        .orderBy(col("doc_id"))
    },

    // Per-source unigram KL from the corpus blend: Σ p·ln(p/q), every
    // count integer-exact, terms 1e-9 fx-quantized before the exact
    // per-source sum — the mixture-skew diagnostic.
    Q("ext_source_kl", {
      val term = "(CAST(c AS DOUBLE) / CAST(ns AS DOUBLE)) * " +
        "ln((CAST(c AS DOUBLE) / CAST(ns AS DOUBLE)) / " +
        "(CAST(gc AS DOUBLE) / CAST(n AS DOUBLE)))"
      s"""WITH tk AS (SELECT source, unnest($TOKS) AS tok
         |  FROM documents),
         |st AS (SELECT source, tok, count(*) AS c FROM tk GROUP BY 1, 2),
         |g AS (SELECT tok, sum(c) AS gc FROM st GROUP BY 1),
         |nsx AS (SELECT source, sum(c) AS ns FROM st GROUP BY 1),
         |nt AS (SELECT sum(c) AS n FROM st),
         |t AS (SELECT st.source, st.c, nsx.ns, g.gc, nt.n
         |  FROM st JOIN g USING (tok) JOIN nsx USING (source)
         |  CROSS JOIN nt)
         |SELECT source, CAST(max(ns) AS BIGINT) AS n_tokens,
         | CAST(${fxSql(term, "1000000000.0")} AS DOUBLE) / 1000000000.0
         |   AS kl_nats
         |FROM t GROUP BY 1 ORDER BY source""".stripMargin
    }) { (s, d) =>
      Corpus.sourceTokenKl(documents(s, d), "source", "text")
        .orderBy(col("source"))
    },

    // Per-source Jensen-Shannon divergence from the blend — the
    // symmetric, [0, ln2]-bounded companion of ext_source_kl (KL
    // explodes on rare-token sources; JS thresholds stably). The
    // source-support terms are 1e-9 fx-quantized; the out-of-support
    // tail is the closed form 0.5*ln2*(1 - Q_s) over exact integer
    // counts, with ln2 the same 17-digit literal in both engines.
    Q("ext_js_divergence", {
      val p = "(CAST(c AS DOUBLE) / CAST(ns AS DOUBLE))"
      val q = "(CAST(gc AS DOUBLE) / CAST(n AS DOUBLE))"
      val m = s"(($p + $q) / 2.0)"
      val term = s"($p * ln($p / $m) + $q * ln($q / $m)) * 0.5"
      s"""WITH tk AS (SELECT source, unnest($TOKS) AS tok
         |  FROM documents),
         |st AS (SELECT source, tok, count(*) AS c FROM tk GROUP BY 1, 2),
         |g AS (SELECT tok, sum(c) AS gc FROM st GROUP BY 1),
         |nsx AS (SELECT source, sum(c) AS ns FROM st GROUP BY 1),
         |nt AS (SELECT sum(c) AS n FROM st),
         |t AS (SELECT st.source, st.c, nsx.ns, g.gc, nt.n
         |  FROM st JOIN g USING (tok) JOIN nsx USING (source)
         |  CROSS JOIN nt)
         |SELECT source, CAST(max(ns) AS BIGINT) AS n_tokens,
         | CAST(${fxSql(term, "1000000000.0")} AS DOUBLE) / 1000000000.0
         |  + (1.0 - CAST(sum(gc) AS DOUBLE) / CAST(max(n) AS DOUBLE))
         |    * 0.6931471805599453 * 0.5 AS js_nats
         |FROM t GROUP BY 1 ORDER BY source""".stripMargin
    }) { (s, d) =>
      Corpus.sourceTokenJs(documents(s, d), "source", "text")
        .orderBy(col("source"))
    },

    // Tokenizer fertility by source — BPE symbols paid per whitespace
    // word under the same shared 8-merge tokenizer: the table that
    // says WHICH sources whitespace budgeting misestimates and by how
    // much. Exact integer sums; the ratio is engine-portable integer
    // division in ppm.
    Q("ext_bpe_fertility", {
      val merges = 8
      val chain = (1 to merges).map { i =>
        s"""d$i AS (SELECT doc_id, replace(s,
           |  chr(31) || lhs || chr(31) || chr(31) || rhs || chr(31),
           |  chr(31) || lhs || rhs || chr(31)) AS s
           | FROM d${i - 1}, b$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${bpeCtes(merges)},
         |d0 AS (SELECT doc_id, regexp_replace(
         |  array_to_string($TOKS, ' '),
         |  '(\\S)', chr(31) || '\\1' || chr(31), 'g') AS s
         | FROM documents),
         |$chain,
         |enc AS (SELECT doc_id,
         |  CAST((len(s) - len(replace(s, chr(31), ''))) // 2
         |    AS BIGINT) AS n_bpe
         | FROM d$merges),
         |w AS (SELECT doc_id, source,
         |  CAST(len($TOKS) AS BIGINT) AS nw FROM documents)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(nw) AS BIGINT) AS n_ws,
         | CAST(sum(enc.n_bpe) AS BIGINT) AS n_bpe,
         | CASE WHEN sum(nw) > 0 THEN
         |  (CAST(sum(enc.n_bpe) AS BIGINT) * 1000000)
         |    // CAST(sum(nw) AS BIGINT)
         | ELSE 0 END AS fertility_ppm
         |FROM w JOIN enc USING (doc_id)
         |GROUP BY 1 ORDER BY source""".stripMargin
    }) { (s, d) =>
      val docs0 = documents(s, d)
      Corpus.tokenizerFertility(docs0, "source", "doc_id", "text",
          Corpus.bpeTrain(docs0, "text", merges = 8))
        .orderBy(col("source"))
    },

    // Neyman sample-size allocation over doc lengths — "how many of
    // my 500 review labels does each source get": n_h*sigma_h
    // weights, exact integer moments, the one sqrt + floor-division
    // mirrored op-for-op; zero-variance sources get 0 by design.
    Q("ext_neyman", {
      val sig = "sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) / " +
        "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))"
      s"""WITH u AS (SELECT source, CAST(length(text) AS BIGINT) AS x
         |  FROM documents WHERE text IS NOT NULL),
         |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(x) AS DOUBLE) AS sx,
         |  CAST(sum(x * x) AS DOUBLE) AS sxx
         | FROM u GROUP BY 1),
         |q AS (SELECT source, n, $sig AS sigma,
         |  CAST(floor(CAST(n AS DOUBLE) * $sig * 1000000.0 + 0.5)
         |   AS BIGINT) AS qq
         | FROM g),
         |t AS (SELECT CAST(coalesce(sum(qq), 0) AS BIGINT) AS tq
         | FROM q)
         |SELECT source, n, sigma,
         | CASE WHEN tq > 0 THEN
         |  CAST(floor(CAST(500 AS DOUBLE) * CAST(qq AS DOUBLE) /
         |   CAST(tq AS DOUBLE)) AS BIGINT)
         | ELSE 0 END AS alloc
         |FROM q, t ORDER BY source""".stripMargin
    }) { (s, d) =>
      Corpus.neymanAllocation(
          documents(s, d).select(col("source"),
            length(col("text")).as("len")),
          "source", "len", k = 500)
        .orderBy(col("source"))
    },

    // Uniform-target mixture reweighting (DoReMi-lite): sampling
    // weights ∝ 1/tok_s normalized, the denominator 1e12 fx-quantized
    // so normalization is order-independent on both engines.
    Q("ext_mix_weights",
      s"""WITH s AS (SELECT source,
         |   CAST(sum(len($TOKS)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1),
         |d AS (SELECT ${fxSql("1.0 / CAST(n_tokens AS DOUBLE)",
            "1000000000000.0")} AS q FROM s)
         |SELECT source, n_tokens,
         | (1.0 / CAST(n_tokens AS DOUBLE)) /
         |   (CAST(q AS DOUBLE) / 1000000000000.0) AS weight
         |FROM s, d ORDER BY source""".stripMargin) { (s, d) =>
      Corpus.mixtureWeights(documents(s, d), "source", "text")
        .orderBy(col("source"))
    },

    // Paragraph-level exact dedup with doc rewrite: paragraph breaks
    // are synthesized deterministically on both engines (every
    // literal ' table ' becomes a break), each distinct normalized
    // paragraph survives only at its minimum (doc, position), docs
    // reassemble in original order. The oracle replays the split,
    // the normText keying, the winner rule and the reassembly.
    Q("ext_par_dedup",
      s"""WITH d0 AS (SELECT doc_id,
         |   string_split(replace(text, ' table ', chr(10) || chr(10)),
         |     chr(10) || chr(10)) AS ps
         |  FROM documents),
         |p AS (SELECT doc_id, CAST(i AS INT) AS idx,
         |   ps[CAST(i AS INT) + 1] AS par
         |  FROM d0, unnest(range(0, len(ps))) u(i)),
         |p2 AS (SELECT doc_id, idx, par,
         |   md5(regexp_replace(trim(lower(par)), '\\s+', ' ', 'g'))
         |     AS key
         |  FROM p WHERE trim(par) != ''),
         |w AS (SELECT doc_id, idx, par FROM (
         |   SELECT p2.*, row_number() OVER (PARTITION BY key
         |     ORDER BY doc_id, idx) AS rn FROM p2) WHERE rn = 1),
         |c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pars
         |  FROM p2 GROUP BY 1),
         |r AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |   string_agg(par, chr(10) || chr(10) ORDER BY idx)
         |     AS clean_text
         |  FROM w GROUP BY 1)
         |SELECT c.doc_id, n_pars, coalesce(r.n_kept, 0) AS n_kept,
         | coalesce(r.clean_text, '') AS clean_text
         |FROM c LEFT JOIN r ON r.doc_id = c.doc_id
         |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
      val synth = documents(s, d).select(col("doc_id"),
        regexp_replace(col("text"), " table ", "\n\n").as("text"))
      Dedup.dedupParagraphs(synth, "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // ---- sessionization -------------------------------------------------
    Q("ext_sessionize",
      s"""WITH $sessSql
         |SELECT event_id, user_id, session_seq FROM s
         |ORDER BY event_id""".stripMargin) { (s, d) =>
      Temporal.sessionize(eventsUs(s, d), "user_id", "ts_us", "event_id",
          GAP_US)
        .select(col("event_id"), col("user_id"), col("session_seq"))
        .orderBy(col("event_id"))
    },

    Q("ext_session_stats",
      s"""WITH $sessSql
         |SELECT user_id, session_seq,
         | CAST(count(*) AS BIGINT) AS n_events,
         | min(event_id) AS first_ord,
         | min(tus) AS start_us, max(tus) AS end_us,
         | max(tus) - min(tus) AS duration_us
         |FROM s GROUP BY user_id, session_seq
         |ORDER BY user_id, session_seq""".stripMargin) { (s, d) =>
      Temporal.sessionStats(
          Temporal.sessionize(eventsUs(s, d), "user_id", "ts_us",
            "event_id", GAP_US),
          "user_id", "ts_us", "event_id")
        .withColumnsRenamed(Map("start_ts" -> "start_us",
          "end_ts" -> "end_us", "duration" -> "duration_us"))
        .orderBy(col("user_id"), col("session_seq"))
    },

    // ---- as-of join -----------------------------------------------------
    // For every purchase, the latest same-user click at-or-before it
    // (ties: same-ts click visible, greatest event_id wins). The oracle
    // states the SEMANTIC (per-purchase argmax over a range join); the
    // engine runs the scalable union-and-carry form — one shuffle, no
    // pair explosion.
    Q("ext_asof_join",
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus,
        |  event_type FROM events),
        |p AS (SELECT event_id AS purchase_id, user_id, tus FROM e
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id, tus AS ctus FROM e
        |  WHERE event_type = 'click'),
        |m AS (SELECT purchase_id, click_id, ctus,
        |   row_number() OVER (PARTITION BY purchase_id
        |     ORDER BY ctus DESC, click_id DESC) AS rn
        | FROM p JOIN c USING (user_id) WHERE ctus <= tus)
        |SELECT p.purchase_id AS purchase_id, m.click_id,
        | CAST(p.tus - m.ctus AS BIGINT) AS lag_us
        |FROM p LEFT JOIN (SELECT purchase_id, click_id, ctus FROM m
        |  WHERE rn = 1) m ON p.purchase_id = m.purchase_id
        |ORDER BY p.purchase_id""".stripMargin) { (s, d) =>
      val raw = eventsUs(s, d)
      val purchases = raw.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_us"))
      val clicks = raw.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("click_id"), col("ts_us").as("click_us"))
      Temporal.asofJoin(purchases, clicks, "user_id", "ts_us",
          rightOrd = "click_id", payload = Seq("click_id", "click_us"))
        .select(col("purchase_id"), col("click_id"),
          (col("ts_us") - col("click_us")).as("lag_us"))
        .orderBy(col("purchase_id"))
    },

    // ---- TF-IDF keywords ------------------------------------------------
    Q("ext_tfidf",
      s"""WITH tok AS (SELECT doc_id, unnest($TOKS) AS token
         |  FROM documents),
         |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         |  FROM tok GROUP BY 1, 2),
         |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df
         |  FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |r AS (SELECT doc_id, token, tf, df,
         |  CAST(tf * n AS DOUBLE) / CAST(df AS DOUBLE) AS score,
         |  CAST(row_number() OVER (PARTITION BY doc_id
         |    ORDER BY CAST(tf * n AS DOUBLE) / CAST(df AS DOUBLE) DESC,
         |      token) AS INT) AS kw_rank
         | FROM tf JOIN df USING (token), n)
         |SELECT doc_id, token, tf, df, score, kw_rank FROM r
         |WHERE kw_rank <= 3 ORDER BY doc_id, kw_rank""".stripMargin) {
      (s, d) =>
        Corpus.tfidf(documents(s, d), "doc_id", "text", topK = 3)
          .orderBy(col("doc_id"), col("kw_rank"))
    },

    // ---- deterministic sampling / source mixing -------------------------
    Q("ext_sample_hash",
      s"""SELECT doc_id, source FROM documents
         |WHERE ${h32("CAST(doc_id AS VARCHAR)")} % 100 < 10
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Corpus.sampleByHash(documents(s, d), "doc_id", pct = 10)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },

    Q("ext_mix_quota",
      s"""SELECT doc_id, source, mix_rank FROM (
         | SELECT doc_id, source,
         |  CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY ${h32("CAST(doc_id AS VARCHAR)")}, doc_id) AS INT)
         |    AS mix_rank
         | FROM documents)
         |WHERE mix_rank <= 10
         |ORDER BY source, mix_rank""".stripMargin) { (s, d) =>
      Corpus.quotaByGroup(documents(s, d), "source", "doc_id", quota = 10)
        .select(col("doc_id"), col("source"), col("mix_rank"))
        .orderBy(col("source"), col("mix_rank"))
    },

    // Markdown ATX-header segmentation: REAL markdown (optional
    // preamble, 1–3 sections at varying header levels, 1–2 body lines
    // each, and — every sixth doc — a ``` fenced code block whose
    // `# not a header` line must stay BODY of section 1, not split a
    // new section) through the real line parser + fence-aware
    // header-run window; the oracle regenerates every (doc, sec_idx,
    // level, heading, body, n_lines) row arithmetically.
    Q("ext_md_sections",
      """WITH d AS (SELECT doc_id FROM documents),
        |p AS (SELECT doc_id, 0 AS sec_idx, 0 AS level, '' AS heading,
        |  'intro ' || CAST(doc_id % 9 AS VARCHAR) AS body, 1 AS n_lines
        | FROM d WHERE doc_id % 4 != 0),
        |s AS (SELECT doc_id, i + 1 AS sec_idx,
        |  CAST(i % 3 + 1 AS INT) AS level,
        |  'Sec ' || CAST(i AS VARCHAR) || ' t' ||
        |   CAST(doc_id % 5 AS VARCHAR) AS heading,
        |  (CASE WHEN i % 2 = 0
        |   THEN 'line ' || CAST(i AS VARCHAR) || ' 0 v' || m
        |   ELSE 'line ' || CAST(i AS VARCHAR) || ' 0 v' || m ||
        |    chr(10) || 'line ' || CAST(i AS VARCHAR) || ' 1 v' || m
        |   END) ||
        |  (CASE WHEN i = 0 AND doc_id % 6 = 0
        |   THEN chr(10) || '```' || chr(10) || '# not a header v' ||
        |    m || chr(10) || '```' ELSE '' END) AS body,
        |  i % 2 + 1 +
        |   (CASE WHEN i = 0 AND doc_id % 6 = 0 THEN 3 ELSE 0 END)
        |   AS n_lines
        | FROM (SELECT doc_id, r.i, CAST(doc_id % 7 AS VARCHAR) AS m
        |   FROM d, range(3) r(i) WHERE r.i <= doc_id % 3))
        |SELECT doc_id, CAST(sec_idx AS BIGINT) AS sec_idx,
        | CAST(level AS INT) AS level, heading, body,
        | CAST(n_lines AS BIGINT) AS n_lines
        |FROM (SELECT * FROM p UNION ALL SELECT * FROM s)
        |ORDER BY doc_id, sec_idx""".stripMargin) { (sp, dir) =>
      val id = col("doc_id")
      def st(c: org.apache.spark.sql.Column) = c.cast("string")
      val secs = transform(sequence(lit(0L), pmod(id, lit(3))), i => {
        val hashes = when(pmod(i, lit(3)) === 0, lit("#"))
          .when(pmod(i, lit(3)) === 1, lit("##")).otherwise(lit("###"))
        val header = concat(hashes, lit(" Sec "), st(i), lit(" t"),
          st(pmod(id, lit(5))))
        val body = array_join(
          transform(sequence(lit(0L), pmod(i, lit(2))), j =>
            concat(lit("line "), st(i), lit(" "), st(j), lit(" v"),
              st(pmod(id, lit(7))))), "\n")
        val fenced = when(i === 0 && pmod(id, lit(6)) === 0,
          concat(body, lit("\n```\n# not a header v"),
            st(pmod(id, lit(7))), lit("\n```"))).otherwise(body)
        concat(header, lit("\n"), fenced)
      })
      val pre = when(pmod(id, lit(4)) =!= 0,
        concat(lit("intro "), st(pmod(id, lit(9))), lit("\n")))
        .otherwise(lit(""))
      val md = concat(pre, array_join(secs, "\n"))
      TextAnalysis.markdownSections(
          documents(sp, dir).select(id, md.as("md")), "doc_id", "md")
        .select(id, col("sec_idx"), col("level"),
          coalesce(col("heading"), lit("")).as("heading"), col("body"),
          col("n_lines"))
        .orderBy(id, col("sec_idx"))
    },

    // Content-addressed corpus manifest over 8 deterministic shards:
    // doc counts, token totals and the order-independent Σ-of-hash32
    // content fingerprint — the dataset-release artifact whose rows
    // must be byte-stable across engines, partitionings and runs. The
    // oracle re-derives shard ids, counts and fingerprint sums from
    // the same md5-prefix arithmetic.
    Q("ext_corpus_manifest",
      s"""SELECT ${h32("CAST(doc_id AS VARCHAR)")} % 8 AS shard,
         | CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(len($TOKS)) AS BIGINT) AS n_tokens,
         | CAST(sum(${h32("CAST(doc_id AS VARCHAR) || '|' || text")})
         |  AS BIGINT) AS content_fp
         |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin) {
      (s, d) =>
        Corpus.manifest(documents(s, d), "doc_id", "text", nShards = 8)
          .orderBy(col("shard"))
    },

    // Token-budgeted source quotas: each source fills a 600-token
    // budget in md5-priority order, the crossing doc kept (greedy
    // fill) — the token-weighted mixture knob row quotas can't
    // express. The oracle mirrors rank + running sum over the same
    // hash ordering.
    Q("ext_token_quota",
      s"""WITH s AS (SELECT doc_id, source,
         |  CAST(len($TOKS) AS BIGINT) AS n_tokens FROM documents),
         |c AS (SELECT doc_id, source, n_tokens,
         |  CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY ${h32("CAST(doc_id AS VARCHAR)")}, doc_id)
         |   AS INT) AS tok_rank,
         |  CAST(sum(n_tokens) OVER (PARTITION BY source
         |    ORDER BY ${h32("CAST(doc_id AS VARCHAR)")}, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |   AS BIGINT) AS cum_tokens
         | FROM s)
         |SELECT doc_id, source, tok_rank, n_tokens, cum_tokens FROM c
         |WHERE cum_tokens - n_tokens < 600
         |ORDER BY source, tok_rank""".stripMargin) { (s, d) =>
      Corpus.tokenQuotaByGroup(documents(s, d), "source", "doc_id",
          "text", tokenBudget = 600L)
        .select(col("doc_id"), col("source"), col("tok_rank"),
          col("n_tokens"), col("cum_tokens"))
        .orderBy(col("source"), col("tok_rank"))
    },

    // Stratified rates: up-weight low-resource zh/de, down-weight en,
    // trickle the rest — the mixture-control knob.
    Q("ext_sample_stratified",
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ${h32("CAST(doc_id AS VARCHAR)")} % 100 <
         |  (CASE WHEN lang = 'en' THEN 20 WHEN lang = 'zh' THEN 80
         |        WHEN lang = 'de' THEN 50 ELSE 5 END)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Corpus.sampleStratified(documents(s, d), "doc_id", "lang",
          Map("en" -> 20, "zh" -> 80, "de" -> 50), defaultPct = 5)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    },

    // Token-budget selection: fill 30k tokens with the "best" docs
    // (band = 50-band quantized n_chars, id-ordered within band) —
    // the scoring→packing bridge of a pretraining recipe.
    Q("ext_budget_select", {
      val (bands, budget) = (50, 30000)
      s"""WITH s AS (SELECT doc_id, n_chars,
         |  CAST(len($TOKS) AS BIGINT) AS n_tokens FROM documents),
         |mm AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM s),
         |b AS (SELECT s.*,
         |  CAST(((n_chars - lo) * $bands) // (hi - lo + 1) AS BIGINT)
         |    AS band FROM s, mm),
         |c AS (SELECT *, CAST(sum(n_tokens) OVER (ORDER BY band DESC, doc_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_tokens FROM b)
         |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, band,
         | n_tokens, cum_tokens, cum_tokens <= $budget AS kept
         |FROM c ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      Corpus.selectByBudget(documents(s, d), "doc_id", "n_chars",
          "text", budget = 30000L, bands = 50)
        .orderBy(col("doc_id"))
    },

    // ---- cross-document span duplication --------------------------------
    Q("ext_span_dedup",
      s"""WITH toks AS (SELECT doc_id, $TOKS AS t FROM documents),
         |pos AS (SELECT doc_id,
         |  unnest(list_transform(range(1, len(t) - 6),
         |    i -> array_to_string(t[i:i+7], ' '))) AS gram
         | FROM toks WHERE len(t) >= 8),
         |dpg AS (SELECT gram, count(*) AS n_docs FROM
         |  (SELECT DISTINCT doc_id, gram FROM pos) GROUP BY 1)
         |SELECT doc_id,
         | CAST(count(*) AS BIGINT) AS n_spans,
         | CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_dup_spans,
         | CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         |   / CAST(count(*) AS DOUBLE) AS dup_frac
         |FROM pos JOIN dpg USING (gram)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      Corpus.spanDuplication(documents(s, d), "doc_id", "text", n = 8)
        .orderBy(col("doc_id"))
    },

    // ---- cross-document duplicated-span REMOVAL -------------------------
    // ExactSubstr-style rewrite over the same positional 8-gram frame
    // ext_span_dedup measures: every duplicated gram position except
    // its global (id, pos)-first occurrence is removed, documents
    // re-assembled from the uncovered tokens. The oracle replays the
    // winner election with a window rank, the ×8 position fan-out and
    // the token-coverage anti-join in SQL.
    Q("ext_span_trim",
      s"""WITH t AS (SELECT doc_id, $TOKS AS t FROM documents),
         |pos AS (SELECT doc_id, CAST(i AS BIGINT) AS p,
         |   array_to_string(t[i:i+7], ' ') AS gram
         |  FROM t, unnest(range(1, len(t) - 6)) u(i)
         |  WHERE len(t) >= 8),
         |mk AS (SELECT doc_id, p, row_number() OVER (
         |   PARTITION BY gram ORDER BY doc_id, p) AS rn FROM pos),
         |marked AS (SELECT doc_id, p FROM mk WHERE rn > 1),
         |mc AS (SELECT doc_id, CAST(count(*) AS BIGINT)
         |   AS n_removed_spans FROM marked GROUP BY 1),
         |rem AS (SELECT DISTINCT doc_id, p + r.k AS ti
         |  FROM marked, range(0, 8) r(k)),
         |tok AS (SELECT doc_id, CAST(j AS BIGINT) AS ti, t[j] AS tk
         |  FROM t, unnest(range(1, len(t) + 1)) u(j)),
         |agg AS (SELECT tok.doc_id,
         |  coalesce(string_agg(CASE WHEN rem.ti IS NULL THEN tk END,
         |    ' ' ORDER BY tok.ti), '') AS clean_text,
         |  CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN rem.ti IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_removed_tokens
         | FROM tok LEFT JOIN rem
         |   ON tok.doc_id = rem.doc_id AND tok.ti = rem.ti
         | GROUP BY tok.doc_id)
         |SELECT a.doc_id, clean_text, n_tokens, n_removed_tokens,
         | coalesce(mc.n_removed_spans, 0) AS n_removed_spans
         |FROM agg a LEFT JOIN mc ON a.doc_id = mc.doc_id
         |ORDER BY a.doc_id""".stripMargin) { (s, d) =>
      Corpus.removeDuplicatedSpans(documents(s, d), "doc_id", "text",
          n = 8)
        .orderBy(col("doc_id"))
    },

    // ---- global vocabulary head -----------------------------------------
    Q("ext_vocab_topk",
      s"""WITH tok AS (SELECT unnest($TOKS) AS token FROM documents),
         |c AS (SELECT token, CAST(count(*) AS BIGINT) AS ct FROM tok
         |  GROUP BY 1)
         |SELECT token, ct, rn FROM (
         | SELECT token, ct,
         |  CAST(row_number() OVER (ORDER BY ct DESC, token) AS INT) AS rn
         | FROM c)
         |WHERE rn <= 50 ORDER BY rn""".stripMargin) { (s, d) =>
      Corpus.vocabTopK(documents(s, d), "text", k = 50)
        .orderBy(col("rn"))
    },

    // ---- pretraining sequence packing ------------------------------------
    // Concatenate all docs in id order, cut into 64-token sequences,
    // splitting docs at boundaries. The oracle states the semantics
    // with a global cumsum window; the engine computes the same
    // prefix-sum via the two-level zipWithIndex shape (bucketed
    // window + driver offsets) — no corpus-sized sequential pass.
    Q("ext_pack", {
      val L = 64
      s"""WITH t AS (SELECT doc_id, $TOKS AS tk FROM documents),
         |n AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n FROM t
         |  WHERE len(tk) >= 1),
         |o AS (SELECT doc_id, tk, n,
         |  CAST(coalesce(sum(n) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS BIGINT) AS off
         | FROM n),
         |p AS (SELECT doc_id, tk, n, off, CAST(s AS BIGINT) AS seq_id,
         |   CAST(greatest(s*$L - off, 0) AS BIGINT) AS st,
         |   CAST(least((s+1)*$L - off, n) AS BIGINT) AS en
         |  FROM o, unnest(range(off // $L, (off + n - 1) // $L + 1))
         |    AS u(s))
         |SELECT doc_id, seq_id,
         | st + 1 AS doc_tok_start,
         | off + st - seq_id*$L + 1 AS seq_tok_start,
         | en - st AS piece_len,
         | array_to_string(tk[st+1:en], ' ') AS piece_text
         |FROM p ORDER BY doc_id, seq_id""".stripMargin
    }) { (s, d) =>
      Corpus.packSequences(documents(s, d), "doc_id", "text", seqLen = 64)
        .orderBy(col("doc_id"), col("seq_id"))
    },

    // Attention boundaries (cu_seqlens) over the REAL packed output:
    // same packing CTE as ext_pack, then per-sequence piece ranks and
    // 0-based offsets plus doc open/close flags — the artifact a
    // block-diagonal-attention trainer consumes. is_doc_end via en = n
    // in the oracle vs the engine's max-seq-per-doc window: equal
    // because a doc's pieces carry strictly increasing seq_ids.
    Q("ext_pack_boundaries", {
      val L = 64
      s"""WITH t AS (SELECT doc_id, $TOKS AS tk FROM documents),
         |n AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n FROM t
         |  WHERE len(tk) >= 1),
         |o AS (SELECT doc_id, n,
         |  CAST(coalesce(sum(n) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS BIGINT) AS off
         | FROM n),
         |p AS (SELECT doc_id, n, off, CAST(s AS BIGINT) AS seq_id,
         |   CAST(greatest(s*$L - off, 0) AS BIGINT) AS st,
         |   CAST(least((s+1)*$L - off, n) AS BIGINT) AS en
         |  FROM o, unnest(range(off // $L, (off + n - 1) // $L + 1))
         |    AS u(s))
         |SELECT seq_id,
         | CAST(row_number() OVER (PARTITION BY seq_id
         |   ORDER BY off + st) - 1 AS INT) AS piece_idx,
         | doc_id,
         | off + st - seq_id*$L AS tok_start,
         | off + en - seq_id*$L AS tok_end,
         | st = 0 AS is_doc_start,
         | en = n AS is_doc_end,
         | CAST(count(*) OVER (PARTITION BY seq_id) AS INT) AS n_pieces
         |FROM p ORDER BY seq_id, piece_idx""".stripMargin
    }) { (s, d) =>
      Corpus.packBoundaries(
          Corpus.packSequences(documents(s, d), "doc_id", "text",
            seqLen = 64),
          "doc_id")
        .orderBy(col("seq_id"), col("piece_idx"))
    },

    // ---- context-window chunking ----------------------------------------
    // Sliding 40-token windows with 8 tokens of carried context
    // (stride 32): training-sequence prep over the documents table.
    Q("ext_chunk", {
      val (mx, ov) = (40, 8)
      val st = mx - ov
      s"""WITH t AS (SELECT doc_id, $TOKS AS tk FROM documents),
         |c AS (SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
         |  tk[ci*$st+1:ci*$st+$mx] AS ct
         | FROM t, unnest(range(0, greatest(
         |   CAST(ceil((len(tk) - $ov)/$st.0) AS INT), 1))) AS u(ci))
         |SELECT doc_id, chunk_idx, array_to_string(ct, ' ') AS chunk_text,
         | CAST(len(ct) AS BIGINT) AS n_chunk_tokens
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
    }) { (s, d) =>
      Corpus.chunk(documents(s, d), "doc_id", "text",
          maxTokens = 40, overlap = 8)
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // ---- deterministic train/val/test split ------------------------------
    Q("ext_splits",
      s"""SELECT doc_id,
         | CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
         |      ELSE 'test' END AS split
         |FROM (SELECT doc_id,
         |  ${h32("CAST(doc_id AS VARCHAR)")} % 100 AS h FROM documents)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Corpus.assignSplits(documents(s, d), "doc_id",
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id"))
    },

    // ---- per-group winsorization -----------------------------------------
    // Outlier clipping of event values into their type's exact
    // [p05, p95] (quantile parity proven by a8_percentiles).
    Q("ext_winsorize",
      """WITH q AS (SELECT event_type,
        |  quantile_cont(value, 0.05) AS p_lo,
        |  quantile_cont(value, 0.95) AS p_hi
        | FROM events GROUP BY 1)
        |SELECT event_id, e.event_type, value, p_lo, p_hi,
        | least(greatest(value, p_lo), p_hi) AS clipped
        |FROM events e JOIN q USING (event_type)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      Stats.winsorize(
          events(s, d).select(col("event_id"), col("event_type"),
            col("value")),
          "event_type", "value", lo = 0.05, hi = 0.95)
        .select(col("event_id"), col("event_type"), col("value"),
          col("p_lo"), col("p_hi"), col("clipped"))
        .orderBy(col("event_id"))
    },

    // ---- distribution profiling -----------------------------------------
    // Equi-width 20-bin histogram of event values (the threshold-
    // picking pass before clip/gate rules). Bounds are the exact
    // data min/max; the top edge closes into the last bin.
    Q("ext_histogram",
      """WITH mm AS (SELECT CAST(min(value) AS DOUBLE) AS lo,
        |  CAST(max(value) AS DOUBLE) AS hi FROM events),
        |b AS (SELECT least(19, CAST(floor((CAST(value AS DOUBLE) - lo)
        |    / ((hi - lo) / 20.0)) AS BIGINT)) AS bin, lo, hi
        | FROM events, mm WHERE value IS NOT NULL)
        |SELECT bin, lo + CAST(bin AS DOUBLE) * ((hi - lo) / 20.0)
        |   AS bin_lo,
        | lo + CAST(bin + 1 AS DOUBLE) * ((hi - lo) / 20.0) AS bin_hi,
        | CAST(count(*) AS BIGINT) AS ct
        |FROM b GROUP BY bin, lo, hi ORDER BY bin""".stripMargin) {
      (s, d) =>
      Stats.histogram(events(s, d).select(col("value")), "value",
          bins = 20)
        .orderBy(col("bin"))
    },

    // ---- per-group z-score standardization ------------------------------
    // Population mean/σ per event type via fixed-point moment sums
    // (fxSql/Cols.fxSum — order-independent), then a narrow
    // (v − μ)/σ projection; constant groups get z = 0.
    Q("ext_standardize", {
      val qs = fxSql("CAST(value AS DOUBLE)", "1000000.0")
      val qss = fxSql("CAST(value AS DOUBLE) * CAST(value AS DOUBLE)",
        "1000000.0")
      val mu = "CAST(qs AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE)"
      s"""WITH m AS (SELECT event_type, $qs AS qs, $qss AS qss,
         |  CAST(count(value) AS BIGINT) AS n FROM events GROUP BY 1),
         |t AS (SELECT event_type, $mu AS mu,
         |  sqrt(greatest(
         |    CAST(qss AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE)
         |      - ($mu) * ($mu), 0.0)) AS sigma
         | FROM m)
         |SELECT event_id, e.event_type, value, mu, sigma,
         | CASE WHEN sigma > 0.0
         |      THEN (CAST(value AS DOUBLE) - mu) / sigma ELSE 0.0 END
         |   AS z
         |FROM events e JOIN t USING (event_type)
         |ORDER BY event_id""".stripMargin
    }) { (s, d) =>
      Stats.standardize(
          events(s, d).select(col("event_id"), col("event_type"),
            col("value")),
          "event_type", "value")
        .select(col("event_id"), col("event_type"), col("value"),
          col("mu"), col("sigma"), col("z"))
        .orderBy(col("event_id"))
    },

    // ---- forward as-of join ----------------------------------------------
    // For every click, the EARLIEST same-user purchase at-or-after it
    // (ties: same-ts purchase visible, smallest event_id wins) — the
    // conversion-attribution mirror of ext_asof_join.
    Q("ext_asof_fwd",
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus,
        |  event_type FROM events),
        |c AS (SELECT event_id AS click_id, user_id, tus FROM e
        |  WHERE event_type = 'click'),
        |p AS (SELECT event_id AS purchase_id, user_id, tus AS ptus
        |  FROM e WHERE event_type = 'purchase'),
        |m AS (SELECT click_id, purchase_id, ptus,
        |   row_number() OVER (PARTITION BY click_id
        |     ORDER BY ptus, purchase_id) AS rn
        | FROM c JOIN p USING (user_id) WHERE ptus >= c.tus)
        |SELECT c.click_id, m.purchase_id,
        | CAST(m.ptus - c.tus AS BIGINT) AS lead_us
        |FROM c LEFT JOIN (SELECT click_id, purchase_id, ptus FROM m
        |  WHERE rn = 1) m ON c.click_id = m.click_id
        |ORDER BY c.click_id""".stripMargin) { (s, d) =>
      val raw = eventsUs(s, d)
      val clicks = raw.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts_us"))
      val purchases = raw.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("purchase_id"),
          col("ts_us").as("purchase_us"))
      Temporal.asofJoinForward(clicks, purchases, "user_id", "ts_us",
          rightOrd = "purchase_id",
          payload = Seq("purchase_id", "purchase_us"))
        .select(col("click_id"), col("purchase_id"),
          (col("purchase_us") - col("ts_us")).as("lead_us"))
        .orderBy(col("click_id"))
    },

    // ---- ordered funnel analysis ----------------------------------------
    // Per (user, session): view → click → purchase completed IN ORDER
    // (each step's timestamp must be at-or-after the previous step's);
    // a missed step nulls all later steps. Session assignment is the
    // same 4 h-gap sessionize proven by ext_sessionize.
    Q("ext_funnel",
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus,
         |  event_type FROM events),
         |m AS (SELECT event_id, user_id, tus, event_type,
         |  CASE WHEN lag(tus) OVER w IS NULL
         |       OR tus - lag(tus) OVER w > $GAP_US
         |  THEN 1 ELSE 0 END AS st
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
         |sx AS (SELECT user_id, tus, event_type,
         |  CAST(sum(st) OVER (PARTITION BY user_id ORDER BY event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
         |    AS session_seq
         |  FROM m),
         |f1 AS (SELECT user_id, session_seq,
         |  min(CASE WHEN event_type = 'view' THEN tus END) AS step1_ts
         | FROM sx GROUP BY 1, 2),
         |f2 AS (SELECT s.user_id, s.session_seq,
         |  min(step1_ts) AS step1_ts,
         |  min(CASE WHEN event_type = 'click' AND tus >= step1_ts
         |      THEN tus END) AS step2_ts
         | FROM sx s JOIN f1 USING (user_id, session_seq) GROUP BY 1, 2),
         |f3 AS (SELECT s.user_id, s.session_seq,
         |  min(step1_ts) AS step1_ts, min(step2_ts) AS step2_ts,
         |  min(CASE WHEN event_type = 'purchase' AND tus >= step2_ts
         |      THEN tus END) AS step3_ts
         | FROM sx s JOIN f2 USING (user_id, session_seq) GROUP BY 1, 2)
         |SELECT user_id, session_seq, step1_ts, step2_ts, step3_ts,
         | CAST((CASE WHEN step1_ts IS NOT NULL THEN 1 ELSE 0 END)
         |  + (CASE WHEN step2_ts IS NOT NULL THEN 1 ELSE 0 END)
         |  + (CASE WHEN step3_ts IS NOT NULL THEN 1 ELSE 0 END) AS INT)
         |   AS n_steps_reached
         |FROM f3 ORDER BY user_id, session_seq""".stripMargin) { (s, d) =>
      Temporal.funnel(
          Temporal.sessionize(eventsUs(s, d), "user_id", "ts_us",
            "event_id", GAP_US),
          Seq("user_id", "session_seq"), "ts_us", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy(col("user_id"), col("session_seq"))
    },

    // ---- retention cohorts ----------------------------------------------
    // Users bucketed by first-activity date; n_users per
    // (cohort, day_offset) is the classic retention curve.
    Q("ext_retention",
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS dt FROM events),
        |f AS (SELECT user_id, min(dt) AS cohort_dt FROM e GROUP BY 1),
        |o AS (SELECT DISTINCT e.user_id, cohort_dt,
        |  CAST(datediff('day', cohort_dt, dt) AS INT) AS day_offset
        | FROM e JOIN f USING (user_id))
        |SELECT strftime(cohort_dt, '%Y-%m-%d') AS cohort_dt, day_offset,
        | CAST(count(*) AS BIGINT) AS n_users
        |FROM o GROUP BY cohort_dt, day_offset
        |ORDER BY cohort_dt, day_offset""".stripMargin) { (s, d) =>
      Temporal.retention(
          events(s, d).select(col("user_id"), to_date(col("ts")).as("dt")),
          "user_id", "dt")
        .select(date_format(col("cohort_dt"), "yyyy-MM-dd").as("cohort_dt"),
          col("day_offset"), col("n_users"))
        .orderBy(col("cohort_dt"), col("day_offset"))
    },

    // ---- temporal holdout split + leakage report --------------------------
    // Train/eval by a max-date − 7d cutoff, with the cross-split
    // user-overlap count — the hindsight-leakage signal a group-aware
    // splitter drives to zero. Counts and the cutoff are exact date /
    // integer arithmetic on both engines.
    Q("ext_time_split",
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS dt FROM events),
        |c AS (SELECT max(dt) - 7 AS cut FROM e),
        |t AS (SELECT user_id,
        |  CASE WHEN dt >= cut THEN 'eval' ELSE 'train' END AS split
        | FROM e, c),
        |p AS (SELECT split, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        | FROM t GROUP BY 1),
        |o AS (SELECT 'overlap' AS split, CAST(0 AS BIGINT) AS n_events,
        |  CAST(count(*) AS BIGINT) AS n_users FROM
        |  (SELECT DISTINCT user_id FROM t WHERE split = 'train') a
        |  JOIN (SELECT DISTINCT user_id FROM t WHERE split = 'eval') b
        |   USING (user_id))
        |SELECT * FROM (SELECT * FROM p UNION ALL SELECT * FROM o)
        |ORDER BY split""".stripMargin) { (s, d) =>
      Temporal.holdoutReport(
          events(s, d).select(col("user_id"), to_date(col("ts")).as("dt")),
          "user_id", "dt", holdoutDays = 7)
        .orderBy(col("split"))
    },

    // ---- duplicate-span removal -----------------------------------------
    // C4-style remediation: 5-token blocks, keep the globally first
    // occurrence of each distinct block, re-assemble docs in order.
    Q("ext_despan", {
      val n = 5
      s"""WITH t AS (SELECT doc_id, $TOKS AS tk FROM documents),
         |b AS (SELECT doc_id, bi,
         |  array_to_string(tk[bi*$n+1:bi*$n+$n], ' ') AS btxt
         | FROM t, unnest(range(0, CAST(ceil(len(tk)/$n.0) AS INT)))
         |   AS u(bi)),
         |k AS (SELECT doc_id, bi, btxt,
         |  row_number() OVER (PARTITION BY btxt ORDER BY doc_id, bi)
         |    AS rn
         | FROM b)
         |SELECT doc_id,
         | coalesce(array_to_string(
         |   list(btxt ORDER BY bi) FILTER (rn = 1), ' '), '')
         |   AS clean_text,
         | CAST(count(*) AS BIGINT) AS n_blocks,
         | CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_removed
         |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      Corpus.removeDuplicateSpans(documents(s, d), "doc_id", "text", n = 5)
        .orderBy(col("doc_id"))
    },

    // ---- C4-style line cleaning -----------------------------------------
    // The synthetic corpus is single-line, so both engines derive the
    // same multi-line view first: the frequent token "line" becomes a
    // newline (plain left-to-right replace — identical semantics both
    // sides). Keep lines of >= 10 words; drop docs with < 2 kept lines.
    Q("ext_line_clean",
      s"""WITH t AS (SELECT doc_id, replace(text, ' line ', chr(10)) AS mt
         |  FROM documents),
         |c AS (SELECT doc_id,
         |  list_filter(string_split_regex(mt, '\\r?\\n'), l ->
         |    (CASE WHEN trim(l) = '' THEN 0
         |          ELSE len(string_split_regex(trim(l), '\\s+')) END) >= 10)
         |    AS kept,
         |  len(string_split_regex(mt, '\\r?\\n')) AS n_lines FROM t)
         |SELECT doc_id, array_to_string(kept, chr(10)) AS clean_text,
         | CAST(n_lines AS BIGINT) AS n_lines,
         | CAST(len(kept) AS BIGINT) AS n_kept
         |FROM c WHERE len(kept) >= 2 ORDER BY doc_id""".stripMargin) {
      (s, d) =>
      Corpus.cleanLines(
          documents(s, d).withColumn("text",
            expr("replace(text, ' line ', chr(10))")),
          "doc_id", "text", minWords = 10, minLines = 2)
        .orderBy(col("doc_id"))
    },

    // ---- corpus-global boilerplate-line removal -------------------------
    // Same derived multi-line view, split on two frequent tokens so
    // short repeated lines exist; any trimmed line present in > 3
    // distinct docs is boilerplate and removed from every doc.
    Q("ext_boilerplate",
      s"""WITH t AS (SELECT doc_id,
         |  replace(replace(text, ' line ', chr(10)), ' table ', chr(10))
         |    AS mt FROM documents),
         |l AS (SELECT doc_id, li, trim(ls[li+1]) AS line
         |  FROM (SELECT doc_id, string_split_regex(mt, '\\r?\\n') AS ls
         |    FROM t),
         |   unnest(range(0, len(ls))) AS u(li)),
         |d AS (SELECT line, count(DISTINCT doc_id) AS line_docs
         |  FROM l GROUP BY 1)
         |SELECT doc_id,
         | coalesce(array_to_string(
         |   list(line ORDER BY li) FILTER (line_docs <= 3), chr(10)), '')
         |   AS clean_text,
         | CAST(count(*) AS BIGINT) AS n_lines,
         | CAST(sum(CASE WHEN line_docs > 3 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_removed
         |FROM l JOIN d USING (line)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      Corpus.dropBoilerplateLines(
          documents(s, d).withColumn("text",
            expr(
              "replace(replace(text, ' line ', chr(10)), ' table ', chr(10))")),
          "doc_id", "text", maxDocFreq = 3)
        .orderBy(col("doc_id"))
    },

    // ---- benchmark decontamination --------------------------------------
    // Eval set = the deterministic 10% hash sample; train = the rest.
    // A train doc is contaminated when any of its distinct 5-grams
    // occurs anywhere in the eval set (GPT-3/PaLM overlap test).
    // Epoch-salted deterministic training order: 2 epochs × 4 shards,
    // both engines derive shard and in-shard position from the same
    // epoch-salted md5, so the full (doc, epoch) layout is hash-exact.
    Q("ext_epoch_shuffle",
      s"""WITH e AS (SELECT doc_id, r.i AS epoch
         |  FROM documents, range(2) r(i)),
         |h AS (SELECT doc_id, epoch,
         |  ${h32("CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")}
         |   AS hh FROM e)
         |SELECT doc_id, CAST(epoch AS INT) AS epoch,
         | CAST(hh % 4 AS INT) AS shard,
         | CAST(row_number() OVER (PARTITION BY epoch, hh % 4
         |   ORDER BY hh, doc_id) AS INT) AS pos
         |FROM h ORDER BY epoch, shard, pos""".stripMargin) { (s, d) =>
      Corpus.epochShuffle(documents(s, d).select(col("doc_id")),
          "doc_id", epochs = 2, shards = 4)
        .orderBy(col("epoch"), col("shard"), col("pos"))
    },

    // The audit-side contamination REPORT: which eval item leaked into
    // which train doc, with shared-gram counts and per-item coverage —
    // the stopgram guard (train doc-freq <= 50) exercised on both
    // sides so the pair join's fanout bound is itself under the gate.
    Q("ext_contamination_report", {
      val n = 5
      val samp = s"${h32("CAST(doc_id AS VARCHAR)")} % 100 < 10"
      s"""WITH tr AS (SELECT doc_id, ${shSql(n)} AS g FROM documents
         |  WHERE NOT ($samp) AND len($TOKS) >= $n),
         |ev AS (SELECT doc_id AS eval_id, ${shSql(n)} AS g
         |  FROM documents WHERE ($samp) AND len($TOKS) >= $n),
         |tg AS (SELECT doc_id, unnest(g) AS gram FROM tr),
         |rare AS (SELECT gram FROM tg GROUP BY gram
         |  HAVING count(*) <= 50),
         |eg AS (SELECT eval_id, unnest(g) AS gram FROM ev),
         |etot AS (SELECT eval_id, CAST(len(g) AS BIGINT)
         |  AS eval_n_grams FROM ev),
         |p AS (SELECT t.doc_id, e.eval_id,
         |  CAST(count(*) AS BIGINT) AS n_shared
         | FROM tg t JOIN rare USING (gram) JOIN eg e USING (gram)
         | GROUP BY 1, 2)
         |SELECT p.doc_id, p.eval_id, p.n_shared, etot.eval_n_grams,
         | CAST(n_shared AS DOUBLE) / CAST(eval_n_grams AS DOUBLE)
         |  AS eval_coverage
         |FROM p JOIN etot USING (eval_id)
         |ORDER BY doc_id, eval_id""".stripMargin
    }) { (s, d) =>
      val docs = documents(s, d)
      val samp = TextFns.hash32(col("doc_id").cast("string")) % 100 < 10
      Corpus.contaminationReport(
          docs.filter(!samp),
          docs.filter(samp).select(col("doc_id").as("eval_id"),
            col("text")),
          "doc_id", "eval_id", "text", n = 5, maxGramDocFreq = 50)
        .orderBy(col("doc_id"), col("eval_id"))
    },

    Q("ext_decontaminate", {
      val n = 5
      val samp = s"${h32("CAST(doc_id AS VARCHAR)")} % 100 < 10"
      s"""WITH tr AS (SELECT doc_id, ${shSql(n)} AS g FROM documents
         |  WHERE NOT ($samp) AND len($TOKS) >= $n),
         |eg AS (SELECT DISTINCT unnest(${shSql(n)}) AS gram
         |  FROM documents WHERE ($samp) AND len($TOKS) >= $n),
         |tg AS (SELECT doc_id, unnest(g) AS gram FROM tr),
         |hit AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit
         |  FROM tg JOIN eg USING (gram) GROUP BY 1)
         |SELECT t.doc_id, CAST(len(t.g) AS BIGINT) AS n_grams,
         | coalesce(h.n_hit, 0) AS n_hit,
         | CAST(coalesce(h.n_hit, 0) AS DOUBLE)
         |   / CAST(len(t.g) AS DOUBLE) AS hit_frac,
         | coalesce(h.n_hit, 0) > 0 AS contaminated
         |FROM tr t LEFT JOIN hit h USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin
    }) { (s, d) =>
      val docs = documents(s, d)
      val samp = TextFns.hash32(col("doc_id").cast("string")) % 100 < 10
      Corpus.decontaminate(docs.filter(!samp), docs.filter(samp),
          "doc_id", "text", n = 5)
        .orderBy(col("doc_id"))
    },

    // Same contract through the Bloom-prefiltered scale path: the
    // filter only prunes grams before the exact semi-join, so the
    // oracle is the SAME SQL as ext_decontaminate — approximation
    // never reaches the result, and the hash-compare proves it.
    Q("ext_decontaminate_bloom", {
      val n = 5
      val samp = s"${h32("CAST(doc_id AS VARCHAR)")} % 100 < 10"
      s"""WITH tr AS (SELECT doc_id, ${shSql(n)} AS g FROM documents
         |  WHERE NOT ($samp) AND len($TOKS) >= $n),
         |eg AS (SELECT DISTINCT unnest(${shSql(n)}) AS gram
         |  FROM documents WHERE ($samp) AND len($TOKS) >= $n),
         |tg AS (SELECT doc_id, unnest(g) AS gram FROM tr),
         |hit AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit
         |  FROM tg JOIN eg USING (gram) GROUP BY 1)
         |SELECT t.doc_id, CAST(len(t.g) AS BIGINT) AS n_grams,
         | coalesce(h.n_hit, 0) AS n_hit,
         | CAST(coalesce(h.n_hit, 0) AS DOUBLE)
         |   / CAST(len(t.g) AS DOUBLE) AS hit_frac,
         | coalesce(h.n_hit, 0) > 0 AS contaminated
         |FROM tr t LEFT JOIN hit h USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin
    }) { (s, d) =>
      val docs = documents(s, d)
      val samp = TextFns.hash32(col("doc_id").cast("string")) % 100 < 10
      Corpus.decontaminateBloom(docs.filter(!samp), "doc_id", "text",
          Corpus.evalGramIndex(docs.filter(samp), "text", n = 5), n = 5)
        .orderBy(col("doc_id"))
    },

    // ---- corpus-frequency rarity profile --------------------------------
    Q("ext_rare_tokens", {
      val dfMax = 2
      s"""WITH tok AS (SELECT doc_id, unnest($TOKS) AS token
         |  FROM documents),
         |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM
         |  (SELECT DISTINCT doc_id, token FROM tok) GROUP BY 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         | CAST(sum(CASE WHEN df <= $dfMax THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_rare,
         | CAST(sum(CASE WHEN df <= $dfMax THEN 1 ELSE 0 END) AS DOUBLE)
         |   / CAST(count(*) AS DOUBLE) AS rare_frac,
         | min(df) AS min_df
         |FROM tok JOIN df USING (token)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      Corpus.rareTokenStats(documents(s, d), "doc_id", "text", dfMax = 2)
        .orderBy(col("doc_id"))
    },

    // ---- SCD2 dim history -----------------------------------------------
    // Type-2 history of each user's event_type "state": consecutive
    // duplicates collapse, each version valid [its ts, next change's
    // ts) in epoch-µs, open-ended current version.
    Q("ext_scd2",
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |  event_type FROM events),
        |m AS (SELECT *, lag(event_type) OVER
        |  (PARTITION BY user_id ORDER BY event_id) AS pv FROM e),
        |c AS (SELECT * FROM m WHERE pv IS NULL OR pv <> event_type),
        |v AS (SELECT user_id, event_type, tus AS valid_from,
        |  lead(tus) OVER w AS valid_to,
        |  CAST(row_number() OVER w AS INT) AS version
        | FROM c WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
        |SELECT user_id, event_type, valid_from, valid_to, version,
        | valid_to IS NULL AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin) { (s, d) =>
      Temporal.scd2(
          eventsUs(s, d).select(col("user_id"), col("event_id"),
            col("ts_us"), col("event_type")),
          "user_id", "event_id", "ts_us", Seq("event_type"))
        .orderBy(col("user_id"), col("version"))
    },

    // ---- SCD2 interval join ---------------------------------------------
    // Facts (purchases) joined to the versioned browse-state dim built
    // by scd2 over the non-purchase events: each purchase picks the
    // state version whose [valid_from, valid_to) covers its timestamp.
    Q("ext_interval_join",
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |  event_type FROM events),
        |src AS (SELECT * FROM e WHERE event_type <> 'purchase'),
        |m AS (SELECT *, lag(event_type) OVER
        |  (PARTITION BY user_id ORDER BY event_id) AS pv FROM src),
        |c AS (SELECT * FROM m WHERE pv IS NULL OR pv <> event_type),
        |v AS (SELECT user_id, event_type AS state, tus AS valid_from,
        |  lead(tus) OVER (PARTITION BY user_id ORDER BY event_id)
        |    AS valid_to
        | FROM c),
        |f AS (SELECT event_id AS purchase_id, user_id, tus FROM e
        |  WHERE event_type = 'purchase')
        |SELECT f.purchase_id, f.user_id, v.state
        |FROM f LEFT JOIN v ON f.user_id = v.user_id
        |  AND f.tus >= v.valid_from
        |  AND (v.valid_to IS NULL OR f.tus < v.valid_to)
        |ORDER BY f.purchase_id""".stripMargin) { (s, d) =>
      val e = eventsUs(s, d)
      val dim = Temporal.scd2(
        e.filter(col("event_type") =!= "purchase")
          .select(col("user_id"), col("event_id"), col("ts_us"),
            col("event_type").as("state")),
        "user_id", "event_id", "ts_us", Seq("state"))
      val facts = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_us"))
      Temporal.intervalJoin(facts, dim, "user_id", "ts_us", Seq("state"))
        .select(col("purchase_id"), col("user_id"), col("state"))
        .orderBy(col("purchase_id"))
    },

    // ---- Z-order layout key ---------------------------------------------
    // Morton interleave of (user_id mod 1024, event_id mod 1024) — the
    // clustering key a z-ordered writer sorts by so parquet min-max
    // stats prune on BOTH dimensions.
    Q("ext_zorder", {
      val bits = 10
      val z = (0 until bits).map { i =>
        s"((x >> $i) & 1) * ${1L << (2 * i)} + " +
          s"((y >> $i) & 1) * ${1L << (2 * i + 1)}"
      }.mkString("(", " + ", ")")
      s"""SELECT event_id, $z AS z_value FROM
         | (SELECT event_id, user_id % 1024 AS x, event_id % 1024 AS y
         |  FROM events)
         |ORDER BY event_id""".stripMargin
    }) { (s, d) =>
      eventsRaw(s, d)
        .select(col("event_id"),
          Layout.zValue2(col("user_id") % 1024, col("event_id") % 1024,
            bits = 10).as("z_value"))
        .orderBy(col("event_id"))
    },

    // ---- unigram-LM perplexity proxy ------------------------------------
    // CCNet-style quality signal: add-one-smoothed unigram LM trained
    // on the corpus itself; per doc, the average negative
    // log-likelihood of its token occurrences. Cross-row sums run
    // fixed-point (fxSql/Cols.fxSum, µnat precision) — a raw double
    // sum would be partition-order dependent.
    Q("ext_lm_score",
      s"""WITH tok AS (SELECT doc_id, unnest($TOKS) AS token
         |  FROM documents),
         |c AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok
         |  GROUP BY 1),
         |t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
         |  CAST(count(*) AS BIGINT) AS v FROM c),
         |d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  ${fxSql("-ln(CAST(c + 1 AS DOUBLE) / CAST(n + v AS DOUBLE))",
             "1000000.0")} AS q
         | FROM tok JOIN c USING (token), t GROUP BY doc_id)
         |SELECT doc_id, n_tokens,
         | CAST(q AS DOUBLE) / 1000000.0 AS nll,
         | CAST(q AS DOUBLE) / 1000000.0 / CAST(n_tokens AS DOUBLE)
         |   AS avg_nll
         |FROM d ORDER BY doc_id""".stripMargin) { (s, d) =>
      Corpus.lmScore(documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // ---- Zipf-fit corpus diagnostic -------------------------------------
    // ln(count)-on-ln(rank) least squares over the top-50 vocabulary;
    // slope ≈ -1 is healthy natural language. Same fixed-point
    // aggregation; the closed-form slope/intercept arithmetic is
    // written in the identical operation order on both sides.
    Q("ext_zipf_fit", {
      val sc = "1000000000.0"
      s"""WITH tok AS (SELECT unnest($TOKS) AS token FROM documents),
         |c AS (SELECT token, CAST(count(*) AS BIGINT) AS ct FROM tok
         |  GROUP BY 1),
         |r AS (SELECT ct, CAST(row_number() OVER
         |  (ORDER BY ct DESC, token) AS INT) AS rn FROM c),
         |k AS (SELECT * FROM r WHERE rn <= 50),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n_ranks,
         |  ${fxSql("ln(CAST(rn AS DOUBLE))", sc)} AS qx,
         |  ${fxSql("ln(CAST(ct AS DOUBLE))", sc)} AS qy,
         |  ${fxSql("ln(CAST(rn AS DOUBLE)) * ln(CAST(ct AS DOUBLE))", sc)}
         |    AS qxy,
         |  ${fxSql("ln(CAST(rn AS DOUBLE)) * ln(CAST(rn AS DOUBLE))", sc)}
         |    AS qxx
         | FROM k),
         |f AS (SELECT n_ranks, CAST(n_ranks AS DOUBLE) AS n,
         |  CAST(qx AS DOUBLE) / $sc AS sx, CAST(qy AS DOUBLE) / $sc AS sy,
         |  CAST(qxy AS DOUBLE) / $sc AS sxy,
         |  CAST(qxx AS DOUBLE) / $sc AS sxx FROM s),
         |g AS (SELECT n_ranks, n, sx, sy,
         |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope FROM f)
         |SELECT n_ranks, slope, (sy - slope * sx) / n AS intercept
         |FROM g""".stripMargin
    }) { (s, d) =>
      Corpus.zipfFit(documents(s, d), "text", k = 50)
    },

    // ---- code-vs-prose routing ------------------------------------------
    // Format gate for a mixed crawl. The synthetic corpus is uniform
    // prose, so both engines derive the same mixed view first: every
    // 4th doc gets code-shaped punctuation (the frequent tokens "line"
    // and "table" become `;`+newline+indent and braces — same
    // plain-replace trick as ext_line_clean).
    Q("ext_code_detect",
      s"""WITH v AS (SELECT doc_id, CASE WHEN doc_id % 4 = 0
         |  THEN replace(replace(text, ' line ',
         |         ';' || chr(10) || '  '), ' table ', ' { t } ')
         |  ELSE text END AS text FROM documents),
         |f AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[{}();=\\[\\]<>]'))
         |    AS DOUBLE) AS sym,
         |  CAST(len(text) AS DOUBLE) AS n_chars,
         |  string_split_regex(text, '\\r?\\n') AS ls FROM v),
         |g AS (SELECT doc_id,
         |  CASE WHEN n_chars > 0 THEN sym / n_chars ELSE 0.0 END
         |    AS sym_frac,
         |  CAST(len(list_filter(ls, l -> regexp_matches(l, '^(\\t|  )')))
         |    AS DOUBLE) / CAST(len(ls) AS DOUBLE) AS indent_frac,
         |  CAST(len(list_filter(ls, l -> regexp_matches(l, '[;{}]$$')))
         |    AS DOUBLE) / CAST(len(ls) AS DOUBLE) AS term_frac
         | FROM f),
         |h AS (SELECT doc_id, sym_frac, indent_frac, term_frac,
         |  sym_frac * 5.0 + indent_frac * 2.0 + term_frac * 3.0
         |    AS code_score FROM g)
         |SELECT doc_id, sym_frac, indent_frac, term_frac, code_score,
         | CASE WHEN code_score >= 0.3 THEN 'code' ELSE 'prose' END
         |   AS label
         |FROM h ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.codeProse(
          documents(s, d).withColumn("text",
            when(col("doc_id") % 4 === 0,
              expr("replace(replace(text, ' line ', ';' || chr(10) " +
                "|| '  '), ' table ', ' { t } ')"))
              .otherwise(col("text"))),
          "doc_id", "text", threshold = 0.3)
        .orderBy(col("doc_id"))
    },

    // ---- stopword scrubbing ---------------------------------------------
    Q("ext_clean_stopwords", {
      val words = TextAnalysis.stopwords.toMap.apply("en")
      val list = words.mkString("['", "','", "']")
      s"""SELECT doc_id,
         | array_to_string(list_filter($TOKS,
         |   t -> NOT list_contains($list, t)), ' ') AS clean_text,
         | CAST(len($TOKS) - len(list_filter($TOKS,
         |   t -> NOT list_contains($list, t))) AS BIGINT) AS n_removed
         |FROM documents ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      Corpus.removeStopwords(documents(s, d), "doc_id", "text",
          TextAnalysis.stopwords.toMap.apply("en"))
        .orderBy(col("doc_id"))
    },

    // ---- importance-weighted domain filter (DSIR-style) -----------------
    // Target slice = English docs; 64 hashed-token feature buckets;
    // keep docs whose average per-token target/corpus likelihood
    // ratio exceeds 1 (all fixed-point integer math — see
    // Corpus.importanceFilter).
    Q("ext_importance",
      s"""WITH t AS (SELECT doc_id, lang = 'en' AS tgt,
         |  unnest($TOKS) AS token FROM documents),
         |b AS (SELECT doc_id, tgt,
         |  ${h32("token")} % 64 AS bucket FROM t),
         |pb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_raw,
         |  CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS n_tgt
         | FROM b GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_raw) AS BIGINT) AS tot_raw,
         |  CAST(sum(n_tgt) AS BIGINT) AS tot_tgt FROM pb),
         |w AS (SELECT bucket, CASE WHEN tot_tgt > 0
         |  THEN (n_tgt * tot_raw * 1000000) // (n_raw * tot_tgt)
         |  ELSE 0 END AS w FROM pb, tot),
         |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(w) AS BIGINT) AS affinity
         | FROM b JOIN w USING (bucket) GROUP BY doc_id)
         |SELECT doc_id, n_tokens, affinity,
         | affinity > n_tokens * 1000000 AS kept
         |FROM sc ORDER BY doc_id""".stripMargin) { (s, d) =>
      Corpus.importanceFilter(documents(s, d), "doc_id", "text",
          col("lang") === "en", buckets = 64, scale = 1000000L)
        .orderBy(col("doc_id"))
    },

    // ---- deterministic training-shard layout ----------------------------
    Q("ext_shards",
      s"""WITH s AS (SELECT doc_id,
         |  CAST(len($TOKS) AS BIGINT) AS n_tokens,
         |  ${h32("CAST(doc_id AS VARCHAR)")} AS h FROM documents),
         |a AS (SELECT doc_id, n_tokens, h % 16 AS shard,
         |  CAST(row_number() OVER (PARTITION BY h % 16
         |    ORDER BY h, doc_id) AS INT) AS pos,
         |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY h % 16
         |    ORDER BY h, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |   AS BIGINT) AS tok_offset
         | FROM s)
         |SELECT doc_id, n_tokens, shard, pos, tok_offset
         |FROM a ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.functions.TextFns
      Corpus.shardAssign(
          documents(s, d).select(col("doc_id"),
            size(TextFns.toks(col("text"))).cast("long").as("n_tokens")),
          "doc_id", "n_tokens", shards = 16)
        .select(col("doc_id"), col("n_tokens"), col("shard"),
          col("pos"), col("tok_offset"))
        .orderBy(col("doc_id"))
    },

    // ---- BPE tokenizer induction ----------------------------------------
    // 8 merges learned from the corpus vocabulary; the oracle unrolls
    // one CTE trio per round (pair counts → deterministic argmax →
    // replace-merge), the same generated-SQL pattern as ext_kmeans.
    // Words are unit-separator-wrapped strings in BOTH engines, so the
    // leftmost-non-overlapping merge is a plain replace() — identical
    // scanning semantics, no list machinery (see Corpus.bpeTrain).
    Q("ext_bpe_train", {
      val merges = 8
      s"""WITH ${bpeCtes(merges)}
         |SELECT * FROM (${bpeUnion(merges)}) ORDER BY step""".stripMargin
    }) { (s, d) =>
      Corpus.bpeTrain(documents(s, d), "text", merges = 8)
        .orderBy(col("step"))
    },

    // ---- BPE tokenizer application (compression measurement) ------------
    // Re-derives the same 8 merges (shared CTE prefix), applies them to
    // every document's wrapped text in step order, and counts symbols
    // before/after — the "token cost" of the learned tokenizer.
    Q("ext_bpe_encode", {
      val merges = 8
      val chain = (1 to merges).map { i =>
        s"""d$i AS (SELECT doc_id, replace(s,
           |  chr(31) || lhs || chr(31) || chr(31) || rhs || chr(31),
           |  chr(31) || lhs || rhs || chr(31)) AS s
           | FROM d${i - 1}, b$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${bpeCtes(merges)},
         |d0 AS (SELECT doc_id, regexp_replace(
         |  array_to_string($TOKS, ' '),
         |  '(\\S)', chr(31) || '\\1' || chr(31), 'g') AS s
         | FROM documents),
         |$chain
         |SELECT d0.doc_id,
         | (len(d0.s) - len(replace(d0.s, chr(31), ''))) // 2 AS n_sym,
         | (len(d$merges.s) - len(replace(d$merges.s, chr(31), ''))) // 2
         |   AS n_bpe,
         | CASE WHEN len(d0.s) > 0
         |  THEN (((len(d$merges.s) - len(replace(d$merges.s, chr(31),
         |    ''))) // 2) * 1000000)
         |    // ((len(d0.s) - len(replace(d0.s, chr(31), ''))) // 2)
         |  ELSE 0 END AS ratio_ppm
         |FROM d0 JOIN d$merges ON d0.doc_id = d$merges.doc_id
         |ORDER BY d0.doc_id""".stripMargin
    }) { (s, d) =>
      val docs0 = documents(s, d)
      Corpus.bpeEncode(docs0, "doc_id", "text",
          Corpus.bpeTrain(docs0, "text", merges = 8))
        .orderBy(col("doc_id"))
    },

    // ---- tokenizer-TRUE token quotas -------------------------------------
    // ext_token_quota meters whitespace tokens, but a training run
    // consumes TOKENIZER tokens — budgeting the wrong unit silently
    // re-weights the mixture toward whatever whitespace undercounts
    // (code, CJK, URLs). Here the same 8-merge BPE tokenizer is
    // learned (shared CTE prefix with ext_bpe_train/encode), applied,
    // and each source fills a 2500-BPE-symbol budget in the same
    // md5-priority order. The oracle replays the merges, the n_bpe
    // symbol counts and the rank + running-sum window.
    Q("ext_token_quota_bpe", {
      val merges = 8
      val budget = 2500
      val chain = (1 to merges).map { i =>
        s"""d$i AS (SELECT doc_id, replace(s,
           |  chr(31) || lhs || chr(31) || chr(31) || rhs || chr(31),
           |  chr(31) || lhs || rhs || chr(31)) AS s
           | FROM d${i - 1}, b$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${bpeCtes(merges)},
         |d0 AS (SELECT doc_id, regexp_replace(
         |  array_to_string($TOKS, ' '),
         |  '(\\S)', chr(31) || '\\1' || chr(31), 'g') AS s
         | FROM documents),
         |$chain,
         |enc AS (SELECT doc_id,
         |  (len(s) - len(replace(s, chr(31), ''))) // 2 AS n_tokens
         | FROM d$merges),
         |qs AS (SELECT d.doc_id, d.source,
         |  CAST(enc.n_tokens AS BIGINT) AS n_tokens
         | FROM documents d JOIN enc ON enc.doc_id = d.doc_id),
         |qc AS (SELECT doc_id, source, n_tokens,
         |  CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY ${h32("CAST(doc_id AS VARCHAR)")}, doc_id)
         |   AS INT) AS tok_rank,
         |  CAST(sum(n_tokens) OVER (PARTITION BY source
         |    ORDER BY ${h32("CAST(doc_id AS VARCHAR)")}, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |   AS BIGINT) AS cum_tokens
         | FROM qs)
         |SELECT doc_id, source, tok_rank, n_tokens, cum_tokens FROM qc
         |WHERE cum_tokens - n_tokens < $budget
         |ORDER BY source, tok_rank""".stripMargin
    }) { (s, d) =>
      val docs0 = documents(s, d)
      val enc = Corpus.bpeEncode(docs0, "doc_id", "text",
          Corpus.bpeTrain(docs0, "text", merges = 8))
        .select(col("doc_id"), col("n_bpe"))
      Corpus.tokenQuotaByGroupCounts(
          docs0.select(col("doc_id"), col("source"))
            .join(enc, Seq("doc_id")),
          "source", "doc_id", "n_bpe", tokenBudget = 2500L)
        .select(col("doc_id"), col("source"), col("tok_rank"),
          col("n_tokens"), col("cum_tokens"))
        .orderBy(col("source"), col("tok_rank"))
    },

    // Tokenizer-TRUE sequence packing: the same 8-merge BPE's n_bpe
    // counts drive the pack layout, so every cut lands where the
    // TOKENIZER's stream crosses the 96-symbol boundary — on code or
    // CJK a whitespace-packed "96-token" sequence would overflow or
    // starve a real context window 2-5x (CorpusSpec pins the
    // divergence on a code-heavy fixture). Layout only (no
    // piece_text — only the tokenizer can slice its own stream); the
    // oracle replays the merges, the n_bpe counts, the global offset
    // cumsum and the piece bounds.
    Q("ext_pack_bpe", {
      val merges = 8
      val L = 96
      val chain = (1 to merges).map { i =>
        s"""d$i AS (SELECT doc_id, replace(s,
           |  chr(31) || lhs || chr(31) || chr(31) || rhs || chr(31),
           |  chr(31) || lhs || rhs || chr(31)) AS s
           | FROM d${i - 1}, b$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${bpeCtes(merges)},
         |d0 AS (SELECT doc_id, regexp_replace(
         |  array_to_string($TOKS, ' '),
         |  '(\\S)', chr(31) || '\\1' || chr(31), 'g') AS s
         | FROM documents),
         |$chain,
         |nb AS (SELECT doc_id,
         |  CAST((len(s) - len(replace(s, chr(31), ''))) // 2
         |    AS BIGINT) AS n
         | FROM d$merges),
         |n AS (SELECT doc_id, n FROM nb WHERE n >= 1),
         |o AS (SELECT doc_id, n,
         |  CAST(coalesce(sum(n) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS BIGINT) AS off
         | FROM n),
         |p AS (SELECT doc_id, n, off, CAST(s AS BIGINT) AS seq_id,
         |   CAST(greatest(s*$L - off, 0) AS BIGINT) AS st,
         |   CAST(least((s+1)*$L - off, n) AS BIGINT) AS en
         |  FROM o, unnest(range(off // $L, (off + n - 1) // $L + 1))
         |    AS u(s))
         |SELECT doc_id, seq_id,
         | st + 1 AS doc_tok_start,
         | off + st - seq_id*$L + 1 AS seq_tok_start,
         | en - st AS piece_len
         |FROM p ORDER BY doc_id, seq_id""".stripMargin
    }) { (s, d) =>
      val docs0 = documents(s, d)
      val enc = Corpus.bpeEncode(docs0, "doc_id", "text",
          Corpus.bpeTrain(docs0, "text", merges = 8))
        .select(col("doc_id"), col("n_bpe"))
      Corpus.packSequencesCounts(enc, "doc_id", "n_bpe", seqLen = 96)
        .orderBy(col("doc_id"), col("seq_id"))
    },

    // Tokenizer-true release manifest: the same 8-merge tokenizer's
    // per-doc symbol counts roll into the shard token totals (what a
    // training recipe actually budgets against), while the content
    // fingerprint stays the count-independent Σ-hash32 over id|text.
    // Shares the BPE CTE prefix; the oracle re-derives shards, BPE
    // counts and fingerprint sums.
    Q("ext_manifest_bpe", {
      val merges = 8
      val chain = (1 to merges).map { i =>
        s"""d$i AS (SELECT doc_id, replace(s,
           |  chr(31) || lhs || chr(31) || chr(31) || rhs || chr(31),
           |  chr(31) || lhs || rhs || chr(31)) AS s
           | FROM d${i - 1}, b$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${bpeCtes(merges)},
         |d0 AS (SELECT doc_id, regexp_replace(
         |  array_to_string($TOKS, ' '),
         |  '(\\S)', chr(31) || '\\1' || chr(31), 'g') AS s
         | FROM documents),
         |$chain,
         |enc AS (SELECT doc_id,
         |  (len(s) - len(replace(s, chr(31), ''))) // 2 AS n_bpe
         | FROM d$merges)
         |SELECT ${h32("CAST(doc_id AS VARCHAR)")} % 8 AS shard,
         | CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(enc.n_bpe) AS BIGINT) AS n_tokens,
         | CAST(sum(${h32("CAST(doc_id AS VARCHAR) || '|' || text")})
         |  AS BIGINT) AS content_fp
         |FROM documents JOIN enc USING (doc_id)
         |GROUP BY 1 ORDER BY shard""".stripMargin
    }) { (s, d) =>
      val docs0 = documents(s, d)
      val enc = Corpus.bpeEncode(docs0, "doc_id", "text",
          Corpus.bpeTrain(docs0, "text", merges = 8))
        .select(col("doc_id"), col("n_bpe"))
      Corpus.manifestCounts(
          docs0.select(col("doc_id"), col("text")).join(enc, Seq("doc_id")),
          "doc_id", "text", "n_bpe", nShards = 8)
        .orderBy(col("shard"))
    },

    // ---- temperature-balanced source mixing -----------------------------
    // α = 0.5 sampling shares per source; sqrt is IEEE
    // correctly-rounded so both engines see the same double, then all
    // shares are exact integer division over ×1000-quantized values.
    Q("ext_temperature_mix",
      s"""WITH ps AS (SELECT source,
         |  CAST(sum(len($TOKS)) AS BIGINT) AS n_tokens
         | FROM documents GROUP BY source),
         |q AS (SELECT source, n_tokens,
         |  CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000 + 0.5)
         |   AS BIGINT) AS qv FROM ps),
         |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_n,
         |  CAST(sum(qv) AS BIGINT) AS tot_q FROM q)
         |SELECT source, n_tokens,
         | (n_tokens * 1000000) // tot_n AS cur_ppm,
         | (qv * 1000000) // tot_q AS tgt_ppm,
         | CASE WHEN (n_tokens * 1000000) // tot_n > 0
         |  THEN (((qv * 1000000) // tot_q) * 1000000)
         |        // ((n_tokens * 1000000) // tot_n)
         |  ELSE 0 END AS boost_ppm
         |FROM q, t ORDER BY source""".stripMargin) { (s, d) =>
      Corpus.temperatureMix(documents(s, d), "source", "text")
        .orderBy(col("source"))
    },

    // ---- cross-source score calibration ---------------------------------
    Q("ext_calibrate",
      s"""WITH c AS (SELECT doc_id, source, n_chars,
         |  CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY n_chars, doc_id) AS INT) AS cal_rank,
         |  CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS cal_n
         | FROM documents)
         |SELECT doc_id, source, n_chars, cal_rank, cal_n,
         | CAST(CASE WHEN cal_n > 1
         |   THEN ((cal_rank - 1) * 1000000) // (cal_n - 1)
         |   ELSE 0 END AS BIGINT) AS cal_ppm
         |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      Stats.calibrateByGroup(
          documents(s, d).select(col("doc_id"), col("source"),
            col("n_chars")),
          "source", "n_chars", "doc_id")
        .orderBy(col("doc_id"))
    },

    // ---- n-gram novelty (data-selection signal) ------------------------
    // Fraction of each doc's distinct 3-grams that no other doc has;
    // exact integer ppm, full hash gate.
    Q("ext_novelty",
      s"""WITH g AS (SELECT doc_id, unnest(${shSql(3)}) AS gram
         |  FROM documents),
         |df AS (SELECT gram, CAST(count(*) AS BIGINT) AS df
         |  FROM g GROUP BY 1),
         |per AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |    CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS novel
         |  FROM g JOIN df USING (gram) GROUP BY 1)
         |SELECT doc_id, n_grams, novel,
         |  CAST((novel * 1000000) // n_grams AS BIGINT) AS novelty_ppm
         |FROM per ORDER BY doc_id""".stripMargin) { (s, d) =>
      Corpus.ngramNovelty(documents(s, d), "doc_id", "text", n = 3)
        .orderBy(col("doc_id"))
    },

    // ---- deterministic weighted sampling (priority / A-ES) -------------
    // Inclusion probability proportional to n_chars; the md5-uniform +
    // fx-quantized ln + two correctly-rounded divisions make the draw
    // bit-identical cross-engine, so the gate is the full selection.
    Q("ext_sample_weighted", {
      val k = 100
      val twoPow60 = "1152921504606846976.0"
      s"""WITH s AS (SELECT doc_id, n_chars,
         |  CAST(floor(ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
         |      1, 15) AS BIGINT) + 1) / $twoPow60)
         |    * 1000000000000.0 + 0.5) AS BIGINT) AS lnfx
         | FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
         |sel AS (SELECT doc_id FROM (
         |  SELECT doc_id,
         |    CAST(-lnfx AS DOUBLE) / 1000000000000.0
         |      / CAST(n_chars AS DOUBLE) AS e
         |  FROM s ORDER BY e ASC, doc_id LIMIT $k))
         |SELECT doc_id, n_chars FROM documents JOIN sel USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      Corpus.sampleWeighted(
          documents(s, d).select(col("doc_id"), col("n_chars")),
          "doc_id", "n_chars", k = 100)
        .orderBy(col("doc_id"))
    }
  )
}
