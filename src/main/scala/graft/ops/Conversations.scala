package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.QueryDef
import graft.queries.QueryDef.t

/** Conversational / SFT data operators — the chat-corpus layer of the
  * training-data pipeline (multi-turn parse, per-turn dedup,
  * assistant-turn eval-decontamination, role-balance card).
  *
  * The reference pipeline has no chat surface
  * (/root/reference/csv-extractor/csv_extractor.py processes sensor CSVs),
  * so this family is pure ★ extension: the operators an SFT curation
  * run needs between raw conversations and a tune-ready dataset.
  *
  * Corpus derivation (the q93/q157/q164 injection discipline — the
  * injection lives in the QUERY layer; library callers on real chat
  * data pass their own turn frames to the ops): the testdata has no
  * chat column, so [[chatTurns]] derives one deterministic multi-turn
  * conversation per document — a canonical user greeting (by
  * conv_id % 4), a canonical assistant acknowledgement (by
  * conv_id % 3), then the document's words in [[TurnWords]]-word
  * turns, roles alternating user/assistant. The boilerplate turns
  * model the template mass every real SFT corpus carries (greeting /
  * ack strings repeated across thousands of conversations) and give
  * the dedup ops real duplicate structure; both engines build the
  * same table from the same CASE/slice arithmetic, so every op
  * oracles exactly.
  */
object Conversations {

  /** Content-turn width in words. */
  val TurnWords = 12

  /** Canonical boilerplate openers — the template mass. */
  val Greetings = Seq(
    "hello can you help me with this",
    "hi i have a question about the data",
    "hey quick question for you",
    "good morning i need some help")

  val Acks = Seq(
    "sure i can help with that",
    "of course happy to help",
    "certainly let me take a look")

  /** Benchmark passages for the decontamination op — EXACTLY
    * [[BenchSpanWords]] words each, so each passage is one span
    * fingerprint on both engines. */
  val BenchSpanWords = 13
  val BenchPassages = Seq(
    "which join strategy minimizes shuffle volume for a skewed key at petabyte scale",
    "name the partitioning that keeps an aggregation map side combined across a cluster")

  /** `CASE <sel> WHEN 0 THEN '<s0>' WHEN 1 ... END` — valid in both
    * Spark SQL and DuckDB (strings carry no quotes to escape). */
  private def caseOver(sel: String, options: Seq[String]): String =
    options.init.zipWithIndex
      .map { case (s, i) => s"WHEN $i THEN '$s'" }
      .mkString(s"CASE $sel ", " ", s" ELSE '${options.last}' END")

  // -------------------------------------------------------------------
  // Turn-table derivation
  // -------------------------------------------------------------------

  /** One conversation per document: (conv_id, turn_idx, role, text).
    * turn 0 = canonical user greeting, turn 1 = canonical assistant
    * ack, turns 2.. = the document's words in [[TurnWords]]-word
    * windows; role = even→user, odd→assistant.
    *
    * Scale shape: a stateless projection + explode above the scan —
    * row count is token volume over [[TurnWords]], no exchange at all;
    * every downstream op decides its own keying. */
  def chatTurns(docs: DataFrame): DataFrame = {
    val g = caseOver("conv_id % 4", Greetings)
    val a = caseOver("conv_id % 3", Acks)
    docs.select(col("doc_id").as("conv_id"), split(col("text"), " ").as("w"))
      .select(col("conv_id"), posexplode(expr(
        s"""concat(array($g, $a),
              transform(sequence(0, (size(w) - 1) div $TurnWords),
                i -> array_join(slice(w, i * $TurnWords + 1, $TurnWords), ' ')))""")))
      .select(col("conv_id"), col("pos").cast("long").as("turn_idx"),
        expr("CASE WHEN pos % 2 = 0 THEN 'user' ELSE 'assistant' END").as("role"),
        col("col").as("text"))
  }

  /** DuckDB twin of [[chatTurns]] as a CTE named `turns` over
    * `documents`. */
  def chatTurnsCte: String = {
    val g = caseOver("doc_id % 4", Greetings)
    val a = caseOver("doc_id % 3", Acks)
    s"""turns AS (
        SELECT conv_id, turn_idx,
          CASE WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
          text
        FROM (
          SELECT doc_id AS conv_id, CAST(0 AS BIGINT) AS turn_idx, $g AS text
          FROM documents
          UNION ALL
          SELECT doc_id, CAST(1 AS BIGINT), $a FROM documents
          UNION ALL
          SELECT doc_id, 2 + i,
            array_to_string(w[i * $TurnWords + 1 : i * $TurnWords + $TurnWords], ' ')
          FROM (SELECT doc_id, w,
                  unnest(range(0, (len(w) - 1) // $TurnWords + 1)) AS i
                FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))))"""
  }

  /** q251: the turn table itself plus per-turn word counts — the parse
    * every other op in the family composes over. */
  def chatTurnsQuery(spark: SparkSession, dir: String): DataFrame =
    chatTurns(t(spark, dir, "documents"))
      .withColumn("n_words", size(split(col("text"), " ")).cast("long"))

  val chatTurnsQuerySql: String =
    s"""WITH ${chatTurnsCte}
        SELECT conv_id, turn_idx, role, text,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
        FROM turns"""

  // -------------------------------------------------------------------
  // Per-turn dedup
  // -------------------------------------------------------------------

  /** q252: per-role turn-dedup card — [[Dedup.exact]]'s hash-group
    * discipline at TURN granularity: distinct-text counts, duplicate
    * mass and share, and the heaviest template's df, per role. The
    * go/no-go table before template stripping: boilerplate concentrates
    * in specific roles (greetings in user, acks in assistant), and the
    * dup share tells how much of the tune set is non-informative
    * repetition.
    *
    * Scale shape: one fp-keyed rollup of the turn stream (map-side
    * combined, int64 xxhash64 keys — the q99/q216 exchange discipline;
    * the oracle groups on md5, so a hash collision trips the driver
    * compare), then a role-keyed second agg of those rollup rows —
    * the q70 card shape; output is role-cardinality. */
  def turnDedupCard(docs: DataFrame): DataFrame =
    chatTurns(docs)
      .groupBy(col("role"), xxhash64(col("text")).as("fp"))
      .agg(count(lit(1)).as("n"))
      .groupBy("role")
      .agg(sum("n").as("n_turns"), count(lit(1)).as("n_distinct"),
        max("n").as("max_df"))
      .withColumn("n_dup_turns", expr("n_turns - n_distinct"))
      .withColumn("dup_share_micro", expr(
        "CAST((CAST(n_turns - n_distinct AS DECIMAL(38,0)) * 1000000) div n_turns AS BIGINT)"))
      .select("role", "n_turns", "n_distinct", "n_dup_turns", "max_df",
        "dup_share_micro")

  val turnDedupCardSql: String =
    s"""WITH ${chatTurnsCte},
      fpt AS (SELECT role, md5(text) AS fp, CAST(count(*) AS BIGINT) AS n
          FROM turns GROUP BY 1, 2)
      SELECT role, CAST(SUM(n) AS BIGINT) AS n_turns,
        CAST(count(*) AS BIGINT) AS n_distinct,
        CAST(SUM(n) - count(*) AS BIGINT) AS n_dup_turns,
        CAST(MAX(n) AS BIGINT) AS max_df,
        CAST((CAST(SUM(n) - count(*) AS HUGEINT) * 1000000) // SUM(n) AS BIGINT)
          AS dup_share_micro
      FROM fpt GROUP BY role"""

  /** Minimum distinct conversations for a turn text to count as a
    * template in q253. */
  val MinTemplateConvs = 25L

  /** q253: template discovery — the turn texts repeated across at least
    * [[MinTemplateConvs]] conversations, with occurrence counts and
    * in-role share. This is the actionable side of q252's card: the
    * strings a stripping pass would actually remove (and on this
    * corpus, exactly the injected greeting/ack boilerplate — the
    * oracle locks that the mine finds precisely the planted mass).
    *
    * Scale shape: a (role, text)-keyed rollup with the df filter ON the
    * rollup rows (templates are df-heavy by definition, so the output
    * is tiny even when the corpus is not); per-role totals broadcast
    * back. Grouping by raw TEXT is deliberate and A/B-measured: turns
    * are ≤ ~20 words, so the "int64 keys, never text" exchange
    * discipline (q99/q216 — written for KB-scale documents) does not
    * pay here — the fp-keyed form with text recovered via a second
    * pass measured 16.8 s (checkpointed stream) / 18.6 s (recomputed
    * stream) vs 15.1 s for this single-pass form at 100x; the
    * countDistinct, not the exchange payload, is the cost. */
  def turnTemplates(docs: DataFrame): DataFrame = {
    val turns = chatTurns(docs)
    val tot = turns.groupBy("role").agg(count(lit(1)).as("n_role_turns"))
    turns.groupBy("role", "text")
      .agg(countDistinct("conv_id").as("n_convs"), count(lit(1)).as("n_turns"))
      .filter(col("n_convs") >= MinTemplateConvs)
      .join(broadcast(tot), "role")
      .withColumn("share_micro", expr(
        "CAST((CAST(n_turns AS DECIMAL(38,0)) * 1000000) div n_role_turns AS BIGINT)"))
      .select("role", "text", "n_convs", "n_turns", "n_role_turns", "share_micro")
  }

  val turnTemplatesSql: String =
    s"""WITH ${chatTurnsCte},
      tot AS (SELECT role, CAST(count(*) AS BIGINT) AS n_role_turns
          FROM turns GROUP BY 1),
      tm AS (SELECT role, text, CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
            CAST(count(*) AS BIGINT) AS n_turns
          FROM turns GROUP BY 1, 2 HAVING count(DISTINCT conv_id) >= $MinTemplateConvs)
      SELECT tm.role, tm.text, tm.n_convs, tm.n_turns, tot.n_role_turns,
        CAST((CAST(tm.n_turns AS HUGEINT) * 1000000) // tot.n_role_turns AS BIGINT)
          AS share_micro
      FROM tm JOIN tot USING (role)"""

  // -------------------------------------------------------------------
  // Assistant-turn eval decontamination
  // -------------------------------------------------------------------

  /** q254: assistant-turn eval-decontamination —
    * [[Dedup.spanContamination]]'s exact n-gram discipline at TURN
    * granularity: flag every assistant turn containing a verbatim
    * [[BenchSpanWords]]-token span of a benchmark passage (the
    * "assistant memorized the eval answer" leak an SFT release must
    * strip — checking the ASSISTANT side only, because a user QUOTING
    * a benchmark question is fine; the model REPRODUCING its answer is
    * the contamination).
    *
    * The query layer plants the leak (q157 discipline): every
    * conversation with conv_id % 17 = 5 gets a benchmark passage
    * appended to assistant turn 3 (conversations too short for turn 3
    * are simply not injected — both engines agree by construction).
    * Library callers pass real turn frames + their benchmark set.
    *
    * Scale shape: span stream over assistant turns only (token volume),
    * equi-joined against the broadcast benchmark fingerprints; output
    * is flagged-turns-bounded — the drop list itself, never a pair
    * frame. */
  def assistantDecontam(spark: SparkSession, docs: DataFrame): DataFrame = {
    val bench = caseOver("conv_id % 2", BenchPassages)
    val injected = chatTurns(docs)
      .withColumn("text", expr(
        s"""CASE WHEN conv_id % 17 = 5 AND turn_idx = 3
              THEN concat(text, ' ', $bench) ELSE text END"""))
    val asst = injected.filter(col("role") === "assistant")
      .select(col("conv_id"), col("turn_idx"), col("text"))
    val spans = Dedup.spanFps(asst.withColumnRenamed("conv_id", "doc_id"),
        BenchSpanWords, Seq("doc_id", "turn_idx"))
      .withColumnRenamed("doc_id", "conv_id")
    val benchFps = spark.range(1)
      .select(explode(array(BenchPassages.map(lit): _*)).as("btext"))
      .select(md5(col("btext")).as("fp"))
    spans.join(broadcast(benchFps), "fp")
      .groupBy("conv_id", "turn_idx")
      .agg(count(lit(1)).as("n_bench_spans"))
  }

  val assistantDecontamSql: String = {
    val bench = caseOver("conv_id % 2", BenchPassages)
    val w = BenchSpanWords
    val benchRows = BenchPassages
      .map(p => s"SELECT md5('$p') AS fp").mkString(" UNION ALL ")
    s"""WITH ${chatTurnsCte},
      inj AS (SELECT conv_id, turn_idx, role,
            CASE WHEN conv_id % 17 = 5 AND turn_idx = 3
              THEN text || ' ' || $bench ELSE text END AS text
          FROM turns),
      asst AS (SELECT conv_id, turn_idx, string_split(text, ' ') AS toks
          FROM inj WHERE role = 'assistant'),
      spans AS (SELECT conv_id, turn_idx,
            md5(array_to_string(toks[i : i + ${w - 1}], ' ')) AS fp
          FROM (SELECT conv_id, turn_idx, toks,
                  unnest(range(1, greatest(len(toks) - ${w - 1} + 1, 1))) AS i
                FROM asst)),
      bench AS ($benchRows)
      SELECT conv_id, turn_idx, CAST(count(*) AS BIGINT) AS n_bench_spans
      FROM spans JOIN bench USING (fp) GROUP BY 1, 2"""
  }

  // -------------------------------------------------------------------
  // Role / turn-length balance card
  // -------------------------------------------------------------------

  /** q255: role-balance card — per role: turn and conversation counts,
    * word volume, exact micro mean words per turn, the longest turn,
    * and how many conversations END in this role (SFT tuning wants
    * assistant-terminated conversations; a corpus ending mid-question
    * trains the model to trail off). Last-turn role is parity of the
    * max turn_idx — no second scan of the turn stream.
    *
    * Scale shape: one role-keyed rollup (role × conv for the distinct
    * count) + one conv-keyed max for the ending role, both map-side
    * combined; output is role-cardinality. */
  def roleBalanceCard(docs: DataFrame): DataFrame =
    roleBalanceOnTurns(chatTurns(docs))

  /** The card over an EXPLICIT turn frame (conv_id, turn_idx, role,
    * text) — shared by batch q255 and the SFT-ingest streaming twin
    * ([[graft.streaming.SftStream.liveRoleBalance]] feeds it the
    * admitted shards). */
  private[graft] def roleBalanceOnTurns(turnFrame: DataFrame): DataFrame = {
    val turns = turnFrame
      .withColumn("n_words", size(split(col("text"), " ")).cast("long"))
    val ends = turns.groupBy("conv_id").agg(max("turn_idx").as("last_idx"))
      .select(expr(
        "CASE WHEN last_idx % 2 = 0 THEN 'user' ELSE 'assistant' END").as("role"))
      .groupBy("role").agg(count(lit(1)).as("n_convs_last"))
    turns.groupBy("role")
      .agg(count(lit(1)).as("n_turns"), countDistinct("conv_id").as("n_convs"),
        sum("n_words").as("n_words"), max("n_words").as("max_words"))
      .withColumn("avg_words_micro", expr(
        "CAST((CAST(n_words AS DECIMAL(38,0)) * 1000000) div n_turns AS BIGINT)"))
      .join(broadcast(ends), Seq("role"), "left")
      .withColumn("n_convs_last", coalesce(col("n_convs_last"), lit(0L)))
      .select("role", "n_turns", "n_convs", "n_words", "max_words",
        "avg_words_micro", "n_convs_last")
  }

  val roleBalanceCardSql: String =
    s"""WITH ${chatTurnsCte},
      tw AS (SELECT conv_id, turn_idx, role,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words FROM turns),
      ends AS (SELECT CASE WHEN MAX(turn_idx) % 2 = 0 THEN 'user'
              ELSE 'assistant' END AS role
          FROM tw GROUP BY conv_id),
      ec AS (SELECT role, CAST(count(*) AS BIGINT) AS n_convs_last
          FROM ends GROUP BY 1),
      card AS (SELECT role, CAST(count(*) AS BIGINT) AS n_turns,
            CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
            CAST(SUM(n_words) AS BIGINT) AS n_words,
            CAST(MAX(n_words) AS BIGINT) AS max_words,
            CAST((CAST(SUM(n_words) AS HUGEINT) * 1000000) // count(*) AS BIGINT)
              AS avg_words_micro
          FROM tw GROUP BY role)
      SELECT card.role, card.n_turns, card.n_convs, card.n_words,
        card.max_words, card.avg_words_micro,
        COALESCE(ec.n_convs_last, 0) AS n_convs_last
      FROM card LEFT JOIN ec USING (role)"""

  // -------------------------------------------------------------------
  // Packing, rendering, parroting
  // -------------------------------------------------------------------

  /** Per-turn template overhead in tokens (role tag + separator) for
    * the packing budget. */
  val TagTokens = 3L
  val PackCapacity = 256L

  /** q257: conversation packing — q72's streaming-packer shape at
    * CONVERSATION granularity: each conversation's SFT token budget is
    * its word count plus [[TagTokens]] per turn (chat-template
    * overhead an SFT batcher must budget, which document packing never
    * sees), and conversations pack whole into capacity-C bins in
    * conv_id order (a conversation must never split across sequences —
    * the loss mask would span sequence boundaries).
    *
    * Scale shape: the turn stream collapses to a conv-keyed rollup
    * first; the cumulative window runs per SOURCE over conv-level rows
    * (q72's distributed-window discipline — no global sort); output is
    * bins-bounded. */
  def packConversations(docs: DataFrame, capacity: Long = PackCapacity): DataFrame = {
    val ct = chatTurns(docs)
      .withColumn("n_words", size(split(col("text"), " ")).cast("long"))
      .groupBy("conv_id")
      .agg((sum("n_words") + count(lit(1)) * TagTokens).as("n_tok"))
      .join(docs.select(col("doc_id").as("conv_id"), col("source")), "conv_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("conv_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    ct.withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("bin", expr(s"(cum - n_tok) div $capacity"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_convs"), sum(col("n_tok")).as("n_tokens"),
        min(col("conv_id")).as("first_conv"), max(col("conv_id")).as("last_conv"))
      .withColumn("fill_micro", expr(
        s"CAST((CAST(n_tokens AS DECIMAL(38,0)) * 1000000) div $capacity AS BIGINT)"))
  }

  def packConversationsSql(capacity: Long = PackCapacity): String =
    s"""WITH ${chatTurnsCte},
      ct AS (SELECT conv_id,
            CAST(SUM(len(string_split(text, ' '))) + count(*) * $TagTokens AS BIGINT)
              AS n_tok
          FROM turns GROUP BY 1),
      cs AS (SELECT ct.conv_id, ct.n_tok, d.source
          FROM ct JOIN documents d ON d.doc_id = ct.conv_id),
      c AS (SELECT source, conv_id, n_tok,
            SUM(n_tok) OVER (PARTITION BY source ORDER BY conv_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM cs)
      SELECT source, CAST((cum - n_tok) // $capacity AS BIGINT) AS bin,
        CAST(count(*) AS BIGINT) AS n_convs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        MIN(conv_id) AS first_conv, MAX(conv_id) AS last_conv,
        CAST((CAST(SUM(n_tok) AS HUGEINT) * 1000000) // $capacity AS BIGINT)
          AS fill_micro
      FROM c GROUP BY 1, 2"""

  /** Role tags of the rendered chat template. */
  val UserTag = "<|user|>"
  val AsstTag = "<|assistant|>"

  /** q258: chat-template layout card — per conversation, the exact
    * rendered-string geometry an SFT tokenizer pipeline needs WITHOUT
    * materializing any string: rendered length (role tag + text + one
    * newline per turn), the assistant-content character mass the loss
    * mask covers, its micro fraction, and turn counts. A corpus whose
    * mask fraction is tiny trains mostly on prompts; this is the
    * screen that catches it. [[renderConversations]] materializes the
    * same layout for export and is spec-locked to these numbers.
    *
    * Scale shape: pure integer arithmetic in one conv-keyed rollup of
    * the turn stream; output is conversation-cardinality with 6 small
    * columns. */
  def chatRenderCard(docs: DataFrame): DataFrame =
    chatTurns(docs)
      .withColumn("tag_len",
        when(col("role") === "user", lit(UserTag.length.toLong))
          .otherwise(lit(AsstTag.length.toLong)))
      .withColumn("seg_len", col("tag_len") + length(col("text")).cast("long") + 1L)
      .groupBy("conv_id")
      .agg(count(lit(1)).as("n_turns"),
        expr("CAST(count_if(role = 'assistant') AS BIGINT)").as("n_asst_turns"),
        sum("seg_len").as("n_chars"),
        sum(when(col("role") === "assistant", length(col("text")).cast("long"))
          .otherwise(0L)).as("masked_chars"))
      .withColumn("mask_frac_micro", expr(
        "CAST((CAST(masked_chars AS DECIMAL(38,0)) * 1000000) div n_chars AS BIGINT)"))

  val chatRenderCardSql: String =
    s"""WITH ${chatTurnsCte},
      seg AS (SELECT conv_id, role,
            CAST(CASE WHEN role = 'user' THEN ${UserTag.length}
                 ELSE ${AsstTag.length} END + length(text) + 1 AS BIGINT) AS seg_len,
            CAST(length(text) AS BIGINT) AS text_len
          FROM turns)
      SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
        CAST(count(*) FILTER (WHERE role = 'assistant') AS BIGINT) AS n_asst_turns,
        CAST(SUM(seg_len) AS BIGINT) AS n_chars,
        CAST(SUM(CASE WHEN role = 'assistant' THEN text_len ELSE 0 END) AS BIGINT)
          AS masked_chars,
        CAST((CAST(SUM(CASE WHEN role = 'assistant' THEN text_len ELSE 0 END)
          AS HUGEINT) * 1000000) // SUM(seg_len) AS BIGINT) AS mask_frac_micro
      FROM seg GROUP BY conv_id"""

  /** The rendered training string per conversation (for export):
    * `<|role|>text\n` per turn in order. One conv-keyed exchange; the
    * packed-struct sort is the turn sort. Spec-locked: lengths equal
    * [[chatRenderCard]]'s n_chars exactly. */
  def renderConversations(turns: DataFrame): DataFrame =
    turns
      .withColumn("seg", concat(
        when(col("role") === "user", lit(UserTag)).otherwise(lit(AsstTag)),
        col("text"), lit("\n")))
      .groupBy("conv_id")
      .agg(sort_array(collect_list(struct(col("turn_idx"), col("seg")))).as("packed"))
      .select(col("conv_id"),
        expr("array_join(transform(packed, p -> p.seg), '')").as("rendered"))

  /** q259: assistant parroting screen — assistant turns whose text
    * VERBATIM repeats the immediately preceding user turn (a model
    * that echoes the prompt, or an annotation pipeline that pasted the
    * question as the answer; SFT on parrots teaches parroting). Exact
    * match via one lag window per conversation; the query layer plants
    * parrots on conv_id % 23 = 7 at turn 3 (the injection discipline —
    * organic word-salad parrots don't exist at 1x).
    *
    * Scale shape: one conv-keyed window over the turn stream (lag of
    * the previous turn's text), stateless compare, flagged-rows-bounded
    * output. */
  def parrotingScreen(docs: DataFrame): DataFrame = {
    val injected = chatTurns(docs)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("conv_id").orderBy("turn_idx")
    injected
      .withColumn("text", expr(
        """CASE WHEN conv_id % 23 = 7 AND turn_idx = 3
             THEN lag(text, 1) OVER (PARTITION BY conv_id ORDER BY turn_idx)
             ELSE text END"""))
      .withColumn("prev_text", lag("text", 1).over(w))
      .filter(col("role") === "assistant" && col("text") === col("prev_text"))
      .select(col("conv_id"), col("turn_idx"),
        size(split(col("text"), " ")).cast("long").as("n_words"))
  }

  val parrotingScreenSql: String =
    s"""WITH ${chatTurnsCte},
      inj AS (SELECT conv_id, turn_idx, role,
            CASE WHEN conv_id % 23 = 7 AND turn_idx = 3
              THEN lag(text, 1) OVER (PARTITION BY conv_id ORDER BY turn_idx)
              ELSE text END AS text
          FROM turns),
      lg AS (SELECT conv_id, turn_idx, role, text,
            lag(text, 1) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_text
          FROM inj)
      SELECT conv_id, turn_idx,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
      FROM lg WHERE role = 'assistant' AND text = prev_text"""

  // -------------------------------------------------------------------
  // JSONL chat ingest
  // -------------------------------------------------------------------

  /** The de-facto chat interchange schema: one conversation per JSONL
    * line, `{"conv_id": ..., "messages": [{"role": ..., "content":
    * ...}, ...]}` — read through [[graft.sources.JsonlCorpus]] with
    * this pinned schema (no inference pass, malformed lines
    * quarantined in `_corrupt_record`). */
  val ChatSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("conv_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("messages",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("role",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("content",
              org.apache.spark.sql.types.StringType)))))))

  val Roles = Seq("system", "user", "assistant")

  /** Parse a messages-array frame (the [[ChatSchema]] shape) into the
    * turn table every op in this family consumes: (conv_id, turn_idx,
    * role, text, valid_role). `valid_role` flags turns whose role is
    * outside {system, user, assistant} — kept as a column, not a
    * filter, so the caller decides between dropping and dead-lettering
    * (the JsonlCorpus quarantine discipline at TURN granularity).
    *
    * Scale shape: one `posexplode` above the scan — no exchange; the
    * JSONL parse itself is the splittable codegen'd json reader. */
  def fromMessages(convs: DataFrame): DataFrame =
    convs
      .select(col("conv_id"), posexplode(col("messages")))
      .select(col("conv_id"), col("pos").cast("long").as("turn_idx"),
        col("col.role").as("role"), col("col.content").as("text"))
      // <=> true, not a bare isin: a missing/null role yields NULL from
      // isin, which BOTH filter(valid_role) and filter(!valid_role)
      // drop — the malformed turn would vanish instead of dead-lettering
      .withColumn("valid_role", col("role").isin(Roles: _*) <=> lit(true))

  /** Inverse of [[fromMessages]]: fold a turn table back into one
    * messages-array row per conversation (for JSONL export via
    * [[graft.sources.JsonlCorpus.write]]). One conv-keyed exchange;
    * ordering inside the array is by turn_idx (sort_array on the
    * packed struct — turn_idx leads, so the struct sort IS the turn
    * sort). */
  def toMessages(turns: DataFrame): DataFrame =
    turns
      .groupBy("conv_id")
      .agg(sort_array(collect_list(struct(col("turn_idx"), col("role"), col("text"))))
        .as("packed"))
      .select(col("conv_id"),
        expr("transform(packed, p -> struct(p.role AS role, p.text AS content))")
          .as("messages"))

  // -------------------------------------------------------------------
  // q270: instruction-tag diversity card
  // -------------------------------------------------------------------

  /** q270: instruction-tag diversity — per source, the opening word of
    * each conversation's first CONTENT user turn as a cheap instruction
    * tag (the InsTag-style verb proxy), with distinct-tag count, the
    * dominant tag and its share, and inverse-Simpson tag diversity
    * (q233's exact discipline over tags). An SFT mix whose requests
    * start with the same few verbs trains a narrow instruction
    * distribution no matter how many rows it has.
    *
    * By [[chatTurns]] construction the first content turn (turn 2) is
    * the document's first [[TurnWords]] words, so the tag equals the
    * document's first word — the op reads it in a stateless projection
    * (spec-locked equal to the turn-derived tag); real chat corpora
    * pass their own turn frames.
    *
    * Scale shape: one (source, tag) rollup, then source-level rollups
    * of rollup rows (top tag via max-count + lexicographic min — no
    * window); output is source-cardinality. */
  def instructionTags(docs: DataFrame): DataFrame = {
    val tags = docs
      .select(col("source"), expr("split(text, ' ')[0]").as("tag"))
      .groupBy("source", "tag").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // tag-cardinality; feeds three source rollups
    val per = tags.groupBy("source").agg(
      sum("cnt").as("n_convs"),
      count(lit(1)).as("n_tags"),
      max("cnt").as("top_cnt"),
      sum(expr("CAST(cnt AS DECIMAL(38,0)) * cnt")).as("sum_sq"))
    val top = tags.join(per.select("source", "top_cnt"), "source")
      .filter(col("cnt") === col("top_cnt"))
      .groupBy("source").agg(min("tag").as("top_tag"))
    per.join(top, "source")
      .withColumn("top_share_micro", expr("(top_cnt * 1000000) div n_convs"))
      .withColumn("inv_simpson_micro", expr(
        "CAST((CAST(n_convs AS DECIMAL(38,0)) * n_convs * 1000000) div sum_sq AS BIGINT)"))
      .select("source", "n_convs", "n_tags", "top_tag",
        "top_share_micro", "inv_simpson_micro")
  }

  val instructionTagsSql: String =
    """WITH c AS (SELECT source, string_split(text, ' ')[1] AS tag,
          CAST(count(*) AS BIGINT) AS cnt
        FROM documents GROUP BY 1, 2),
      per AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_convs,
            CAST(count(*) AS BIGINT) AS n_tags,
            CAST(MAX(cnt) AS BIGINT) AS top_cnt,
            SUM(CAST(cnt AS HUGEINT) * cnt) AS sum_sq
          FROM c GROUP BY 1),
      top AS (SELECT c.source, MIN(tag) AS top_tag
          FROM c JOIN per ON per.source = c.source AND c.cnt = per.top_cnt
          GROUP BY 1)
      SELECT per.source, n_convs, n_tags, top_tag,
        CAST((top_cnt * 1000000) // n_convs AS BIGINT) AS top_share_micro,
        CAST((CAST(n_convs AS HUGEINT) * n_convs * 1000000) // sum_sq AS BIGINT)
          AS inv_simpson_micro
      FROM per JOIN top ON top.source = per.source"""

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q251_chat_turns",
      (s, d) => chatTurnsQuery(s, d), Some(chatTurnsQuerySql)),
    QueryDef("q252_turn_dedup_card",
      (s, d) => turnDedupCard(t(s, d, "documents")), Some(turnDedupCardSql)),
    QueryDef("q253_turn_templates",
      (s, d) => turnTemplates(t(s, d, "documents")), Some(turnTemplatesSql)),
    QueryDef("q254_asst_decontam",
      (s, d) => assistantDecontam(s, t(s, d, "documents")),
      Some(assistantDecontamSql)),
    QueryDef("q255_role_balance",
      (s, d) => roleBalanceCard(t(s, d, "documents")), Some(roleBalanceCardSql)),
    QueryDef("q257_conv_packing",
      (s, d) => packConversations(t(s, d, "documents")),
      Some(packConversationsSql())),
    QueryDef("q258_chat_render_card",
      (s, d) => chatRenderCard(t(s, d, "documents")), Some(chatRenderCardSql)),
    QueryDef("q259_parroting_screen",
      (s, d) => parrotingScreen(t(s, d, "documents")), Some(parrotingScreenSql)),
    QueryDef("q270_instruction_tags",
      (s, d) => instructionTags(t(s, d, "documents")), Some(instructionTagsSql)))
}
