package graft.ops

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.QueryDef
import graft.queries.QueryDef._

/** Document-cleaning operators for LLM training-data preparation (★ the
  * line-level siblings of the doc-level TextStats/Sampling/Dedup ops):
  * C4-style line filtering (Raffel et al. 2020, §2.2 of the T5 paper),
  * PII redaction, and corpus-wide line-level deduplication (the
  * RefinedWeb / Gopher "repeated passage" cleanup, applied at line
  * granularity across documents).
  *
  * All three are per-row scalar pipelines except the line dedup, whose
  * single shuffle is keyed by line content hash — the canonical
  * "aggregate by content, keep the first occurrence" shape that scales
  * linearly in total line count, never materializing a per-document
  * cross product.
  *
  * The synthetic word-salad corpus has no real newlines or PII, so the
  * line-based QUERIES pass a delimiter token (`" table "`) as the line
  * separator and q93 injects deterministic synthetic PII derived from
  * `doc_id` — the SAME expression in both engines, so the oracle stays a
  * strict hash compare. Library callers on real corpora pass `"\n"` and
  * skip the injection: the operators themselves are delimiter-agnostic.
  */
object Cleaning {

  /** Line separator stand-in used by the q92/q94 QUERIES on the
    * newline-free testdata corpus — the operator DEFAULTS are the real
    * C4 values ('\n', "javascript", "lorem ipsum"), so the plain
    * real-corpus call `cleanLines(docs)` applies genuine C4 rules; the
    * corpus stand-ins below are passed explicitly by the queries only. */
  val LineDelim = " table "
  val MinLineWords = 3
  /** Corpus stand-in for C4's "javascript" line marker. */
  val LineBlockToken = "slow"
  /** Corpus stand-in for C4's "lorem ipsum" document marker (hits ~5% of
    * the synthetic docs). */
  val DocBlockPhrase = "slow slow"

  /** Split into lines on a LITERAL delimiter (regex-quoted — callers pass
    * raw strings like "\n", not patterns). */
  private def linesOf(text: Column, delim: String): Column =
    split(text, Pattern.quote(delim))

  /** C4-style line-level cleanup: drop whole documents containing
    * `docBlockPhrase`; within survivors drop lines with fewer than
    * `minWords` words or containing the `lineBlockToken` word; drop
    * documents with no surviving lines. Kept lines are rejoined with
    * '\n'. One codegen'd projection per row — no shuffle, no UDF;
    * embarrassingly parallel at any corpus size.
    *
    * The real C4 also requires terminal punctuation per line; that
    * predicate is one more conjunct in the same `filter` lambda and is
    * omitted here only because the punctuation-free corpus would keep
    * zero lines. */
  def cleanLines(docs: DataFrame, delim: String = "\n",
      minWords: Int = MinLineWords, lineBlockToken: String = "javascript",
      docBlockPhrase: String = "lorem ipsum", keep: Seq[String] = Nil): DataFrame = {
    val passthru = keep.map(col)
    docs.filter(!col("text").contains(docBlockPhrase))
      .select(col("doc_id") +: passthru :+ linesOf(col("text"), delim).as("ls"): _*)
      .select(col("doc_id") +: passthru :+ size(col("ls")).cast("long").as("n_lines_in") :+
        filter(col("ls"), ln =>
          size(split(ln, " ")) >= minWords &&
            !array_contains(split(ln, " "), lineBlockToken)).as("kept"): _*)
      .filter(size(col("kept")) >= 1)
      .select(col("doc_id") +: passthru :+ col("n_lines_in") :+
        size(col("kept")).cast("long").as("n_lines_kept") :+
        array_join(col("kept"), "\n").as("text_clean"): _*)
  }

  val cleanLinesSql: String =
    s"""WITH base AS (SELECT doc_id, text FROM documents
          WHERE NOT contains(text, '$DocBlockPhrase')),
      l AS (SELECT doc_id, string_split(text, '$LineDelim') AS ls FROM base),
      k AS (SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines_in,
              list_filter(ls, ln -> len(string_split(ln, ' ')) >= $MinLineWords
                AND NOT list_contains(string_split(ln, ' '), '$LineBlockToken')) AS kept
            FROM l)
      SELECT doc_id, n_lines_in, CAST(len(kept) AS BIGINT) AS n_lines_kept,
        array_to_string(kept, chr(10)) AS text_clean
      FROM k WHERE len(kept) >= 1"""

  // --------------------------------------------------------------------
  // PII redaction. Regexes are kept inside the RE2 ∩ java.util.regex
  // common dialect (character classes, bounded repetition, \b — no
  // lookaround, no backreferences) so the DuckDB oracle applies the SAME
  // patterns. Replacements chain email → phone → IP, and each count is
  // taken on the text AS THE MATCHING STAGE SEES IT (n_phones counts the
  // post-email text, n_ips the post-phone text) — so every count equals
  // the number of <TOKEN>s actually substituted even when patterns nest
  // (an email local part like "user+1-555-1234@x.io" CONTAINS a
  // phone-shaped substring; the email replacement consumes it, and the
  // staged n_phones correctly reports 0).
  // --------------------------------------------------------------------

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redact emails / phone numbers / IPv4 addresses from `textCol`,
    * returning per-doc substitution counts and the redacted text. Pure
    * per-row regex projections — codegen'd, shuffle-free. */
  def redactPii(docs: DataFrame, textCol: Column): DataFrame =
    docs.withColumn("__t0", textCol)
      .withColumn("n_emails", regexp_count(col("__t0"), lit(EmailRe)).cast("long"))
      .withColumn("__t1", regexp_replace(col("__t0"), EmailRe, "<EMAIL>"))
      .withColumn("n_phones", regexp_count(col("__t1"), lit(PhoneRe)).cast("long"))
      .withColumn("__t2", regexp_replace(col("__t1"), PhoneRe, "<PHONE>"))
      .withColumn("n_ips", regexp_count(col("__t2"), lit(Ipv4Re)).cast("long"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
        regexp_replace(col("__t2"), Ipv4Re, "<IP>").as("text_redacted"))

  /** Deterministic synthetic-PII prefix for the q93 query: the testdata
    * corpus contains no '@', digits, or dots, so the query plants one
    * email, phone, and IP per document, derived from doc_id alone —
    * identically in both engines. */
  private val piiInjected: Column =
    concat(lit("contact user"), col("doc_id").cast("string"),
      lit("@example.com call +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
      lit(" ip 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
      lit("."), pmod(col("doc_id") * 7, lit(256)).cast("string"),
      lit(" "), col("text"))

  private val piiInjectedSql =
    """'contact user' || CAST(doc_id AS VARCHAR)
       || '@example.com call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
       || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
       || ' ' || text"""

  val redactPiiSql: String =
    s"""WITH inj AS (SELECT doc_id, $piiInjectedSql AS t0 FROM documents),
      s1 AS (SELECT doc_id, t0, regexp_replace(t0, '$EmailRe', '<EMAIL>', 'g') AS t1 FROM inj),
      s2 AS (SELECT doc_id, t0, t1, regexp_replace(t1, '$PhoneRe', '<PHONE>', 'g') AS t2 FROM s1)
      SELECT doc_id,
        CAST(len(regexp_extract_all(t0, '$EmailRe')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(t1, '$PhoneRe')) AS BIGINT) AS n_phones,
        CAST(len(regexp_extract_all(t2, '$Ipv4Re')) AS BIGINT) AS n_ips,
        regexp_replace(t2, '$Ipv4Re', '<IP>', 'g') AS text_redacted
      FROM s2"""

  // --------------------------------------------------------------------
  // Luhn-validated payment-card redaction: the checksum step every
  // serious PII scrubber runs on card-shaped digit runs — a bare
  // [0-9]{13,19} regex redacts order numbers, timestamps and tracking
  // ids wholesale (the classic false-positive class), while ~90% of
  // random digit runs FAIL the Luhn mod-10 check and must be left
  // intact. Token-wise evaluation: candidates are whitespace tokens
  // matching the card shape; only those passing Luhn are replaced.
  // Pure per-row lambda projection — codegen'd, shuffle-free — and the
  // checksum is exact integer arithmetic, so DuckDB mirrors bit-for-bit.
  // --------------------------------------------------------------------

  /** PII density report (q210): the per-source governance dashboard
    * above q93/q127's row-level redaction — token volume, the
    * sequential-chain PII counts (emails, then phones on the
    * email-redacted text, then IPs — q93's overlap-free semantics),
    * Luhn-VALID card tokens (q127's checksum, never the bare card-shape
    * regex), the combined rate per million tokens, and the share of
    * documents carrying any PII. The release-review number ("source X
    * ships 40 PII hits/Mtok") and the trend input for
    * redaction-regression alerts.
    *
    * Scale shape: one stateless chain of regexp/lambda passes per row
    * (the q93 and q127 shapes composed, scan-resident) + ONE
    * source-keyed partial-agg rollup. */
  def piiDensity(docs: DataFrame): DataFrame =
    docs
      .withColumn("ne", regexp_count(col("text"), lit(EmailRe)).cast("long"))
      .withColumn("__t1", regexp_replace(col("text"), EmailRe, "<EMAIL>"))
      .withColumn("np", regexp_count(col("__t1"), lit(PhoneRe)).cast("long"))
      .withColumn("__t2", regexp_replace(col("__t1"), PhoneRe, "<PHONE>"))
      .withColumn("ni", regexp_count(col("__t2"), lit(Ipv4Re)).cast("long"))
      .withColumn("nc", expr(
        s"CAST(size(filter(split(__t2, ' '), w -> ${isValidCard("w")})) AS BIGINT)"))
      .withColumn("n_toks", expr("CAST(size(split(text, ' ')) AS BIGINT)"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_toks").as("n_tokens"),
        sum("ne").as("n_emails"), sum("np").as("n_phones"),
        sum("ni").as("n_ips"), sum("nc").as("n_cards"),
        sum(when(col("ne") + col("np") + col("ni") + col("nc") > 0L, 1L)
          .otherwise(0L)).as("n_pii_docs"))
      .withColumn("pii_per_mtok",
        expr("((n_emails + n_phones + n_ips + n_cards) * 1000000L) div n_tokens"))
      .withColumn("pii_doc_share",
        col("n_pii_docs").cast("double") / col("n_docs").cast("double"))

  /** q210's deterministic mixed injection: each PII kind lands in its own
    * doc_id residue class (3/5/7/11), so sources differ in density and
    * most docs carry none — the q93/q127/q149 injection pattern. */
  private[graft] val piiMixInjected: Column = concat(
    when(pmod(col("doc_id"), lit(3)) === 0,
      concat(lit("contact u"), col("doc_id").cast("string"), lit("@example.com ")))
      .otherwise(lit("")),
    when(pmod(col("doc_id"), lit(5)) === 0,
      concat(lit("call +1-555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"), lit(" ")))
      .otherwise(lit("")),
    when(pmod(col("doc_id"), lit(7)) === 0,
      concat(lit("ip 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
        lit("."), pmod(col("doc_id") * 7, lit(256)).cast("string"), lit(" ")))
      .otherwise(lit("")),
    when(pmod(col("doc_id"), lit(11)) === 0,
      concat(lit("card "),
        lpad((col("doc_id") * 2654435761L % 10000000000000000L).cast("string"), 16, "0"),
        lit(" ")))
      .otherwise(lit("")),
    col("text"))

  private[graft] val piiMixInjectedSql =
    """(CASE WHEN doc_id % 3 = 0 THEN 'contact u' || CAST(doc_id AS VARCHAR) || '@example.com ' ELSE '' END)
       || (CASE WHEN doc_id % 5 = 0 THEN 'call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' ELSE '' END)
       || (CASE WHEN doc_id % 7 = 0 THEN 'ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || ' ' ELSE '' END)
       || (CASE WHEN doc_id % 11 = 0 THEN 'card ' || lpad(CAST((doc_id * 2654435761) % 10000000000000000 AS VARCHAR), 16, '0') || ' ' ELSE '' END)
       || text"""

  def piiDensitySql: String =
    s"""WITH inj AS (SELECT doc_id, source, $piiMixInjectedSql AS text FROM documents),
      s1 AS (SELECT source, text,
            CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS ne,
            regexp_replace(text, '$EmailRe', '<EMAIL>', 'g') AS t1
          FROM inj),
      s2 AS (SELECT source, text, ne,
            CAST(len(regexp_extract_all(t1, '$PhoneRe')) AS BIGINT) AS np,
            regexp_replace(t1, '$PhoneRe', '<PHONE>', 'g') AS t2
          FROM s1),
      s3 AS (SELECT source,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks, ne, np,
            CAST(len(regexp_extract_all(t2, '$Ipv4Re')) AS BIGINT) AS ni,
            CAST(len(list_filter(string_split(t2, ' '), x -> ${isValidCardSql("x")})) AS BIGINT) AS nc
          FROM s2),
      agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
            CAST(SUM(ne) AS BIGINT) AS n_emails, CAST(SUM(np) AS BIGINT) AS n_phones,
            CAST(SUM(ni) AS BIGINT) AS n_ips, CAST(SUM(nc) AS BIGINT) AS n_cards,
            CAST(SUM(CASE WHEN ne + np + ni + nc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_docs
          FROM s3 GROUP BY source)
      SELECT *,
        ((n_emails + n_phones + n_ips + n_cards) * 1000000) // n_tokens AS pii_per_mtok,
        CAST(n_pii_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS pii_doc_share
      FROM agg"""

  val CardShapeRe = "^[0-9]{13,19}$"

  /** Spark SQL predicate: token `w` (all digits) passes the Luhn mod-10
    * check. Standard doubling from the right: right-index r = len-i+1,
    * doubled iff r is even ⟺ (len - i) odd; digits of 2d = 2d - 9 when
    * 2d > 9. Guarded by the card-shape CASE at every call site, so the
    * digit cast never sees a non-digit (ANSI-safe). */
  private def luhnOk(w: String): String =
    s"""aggregate(sequence(1, length($w)), 0L, (acc, i) -> acc +
          (CASE WHEN (length($w) - i) % 2 = 1
            THEN (CASE WHEN 2 * CAST(substring($w, i, 1) AS INT) > 9
                  THEN 2 * CAST(substring($w, i, 1) AS INT) - 9
                  ELSE 2 * CAST(substring($w, i, 1) AS INT) END)
            ELSE CAST(substring($w, i, 1) AS INT) END)) % 10 = 0"""

  private def isValidCard(w: String): String =
    s"(CASE WHEN $w RLIKE '$CardShapeRe' THEN ${luhnOk(w)} ELSE false END)"

  /** Redact Luhn-valid card numbers from `textCol`; reports candidate and
    * valid counts per doc so the false-positive rate of the shape regex
    * is itself a corpus signal. The checksum lambda runs ONCE per token
    * (`__v` is a bound column): counts and the redaction both read the
    * precomputed validity array instead of re-folding the digits (the
    * QueryDef.spread discipline: never re-evaluate an expensive
    * expression inside multiple lambda pipelines; 100x A/B in
    * SCALE.md round-6). */
  def redactCards(docs: DataFrame, textCol: Column): DataFrame =
    docs.withColumn("__w", split(textCol, " "))
      .withColumn("__v", expr(s"transform(__w, w -> ${isValidCard("w")})"))
      .select(col("doc_id"),
        expr(s"CAST(size(filter(__w, w -> w RLIKE '$CardShapeRe')) AS BIGINT)")
          .as("n_card_candidates"),
        expr("CAST(size(filter(__v, v -> v)) AS BIGINT)").as("n_valid_cards"),
        expr("""array_join(zip_with(__w, __v,
            (w, v) -> CASE WHEN v THEN '<CARD>' ELSE w END), ' ')""")
          .as("text_redacted"))

  /** Deterministic card-shaped injections for q127 (the corpus has no
    * digit runs): two 16-digit tokens per doc derived from doc_id by
    * integer hashing — validity falls where the Luhn check says
    * (~1 in 10 random runs pass), identically in both engines, so the
    * query demonstrates true positives AND preserved false positives. */
  private val cardInjected: Column = concat(
    lit("card "), lpad((col("doc_id") * 2654435761L % 10000000000000000L).cast("string"), 16, "0"),
    lit(" ref "), lpad(((col("doc_id") * 1103515245L + 12345L) % 10000000000000000L).cast("string"), 16, "0"),
    lit(" "), col("text"))

  private val cardInjectedSql =
    """'card ' || lpad(CAST((doc_id * 2654435761) % 10000000000000000 AS VARCHAR), 16, '0')
       || ' ref ' || lpad(CAST((doc_id * 1103515245 + 12345) % 10000000000000000 AS VARCHAR), 16, '0')
       || ' ' || text"""

  private def luhnOkSql(w: String): String =
    s"""list_sum(list_transform(range(1, len($w) + 1), i ->
          CASE WHEN (len($w) - i) % 2 = 1
            THEN CASE WHEN 2 * CAST($w[i] AS INT) > 9
                 THEN 2 * CAST($w[i] AS INT) - 9
                 ELSE 2 * CAST($w[i] AS INT) END
            ELSE CAST($w[i] AS INT) END)) % 10 = 0"""

  private def isValidCardSql(w: String): String =
    s"(CASE WHEN regexp_full_match($w, '[0-9]{13,19}') THEN ${luhnOkSql(w)} ELSE false END)"

  val redactCardsSql: String =
    s"""WITH inj AS (SELECT doc_id, $cardInjectedSql AS t FROM documents),
      ws AS (SELECT doc_id, string_split(t, ' ') AS w FROM inj)
      SELECT doc_id,
        CAST(len(list_filter(w, x -> regexp_full_match(x, '[0-9]{13,19}'))) AS BIGINT) AS n_card_candidates,
        CAST(len(list_filter(w, x -> ${isValidCardSql("x")})) AS BIGINT) AS n_valid_cards,
        array_to_string(list_transform(w,
          x -> CASE WHEN ${isValidCardSql("x")} THEN '<CARD>' ELSE x END), ' ') AS text_redacted
      FROM ws"""

  // --------------------------------------------------------------------
  // Corpus-wide line dedup: every line keeps exactly its FIRST occurrence
  // (ordered by (doc_id, line_no)); later occurrences anywhere in the
  // corpus are dropped. This is the cross-document repeated-boilerplate
  // cleanup (headers, footers, navigation chrome) that doc-level MinHash
  // (q42) cannot see.
  // --------------------------------------------------------------------

  /** Line dedup across the whole corpus. Winner selection is ONE partial-
    * aggregated shuffle keyed by line content — `min(struct(doc_id,
    * line_no))` combines map-side, so the exchange carries one candidate
    * winner per distinct line per input partition, never the full
    * occurrence list (the row_number-window formulation would shuffle and
    * sort every occurrence; the oracle keeps that form — same total
    * order, so results are row-identical). The flag join is a shuffle
    * join on (line, doc_id, line_no); reassembly groups by doc_id.
    * Documents whose every line was dropped remain with n_kept = 0 and
    * empty text. */
  def dedupLines(docs: DataFrame, delim: String = "\n"): DataFrame = {
    // the q99 xxhash64 discipline: winner election only needs line
    // IDENTITY, so the detection rollup and the flag join key on int64
    // `lh` — line CONTENT never enters an exchange as a key (it still
    // rides the lines side once as reassembly payload, which no layout
    // can avoid). The ORACLE keeps the exact string form, so a 64-bit
    // collision (which could mis-elect a winner) fails the hash compare
    // instead of shipping.
    val lines = docs.select(col("doc_id"),
      posexplode(linesOf(col("text"), delim)).as(Seq("line_no", "line")))
      .withColumn("lh", xxhash64(col("line")))
    val winners = lines.groupBy("lh")
      .agg(min(struct(col("doc_id"), col("line_no"))).as("w"))
      .select(col("lh"), col("w.doc_id").as("doc_id"),
        col("w.line_no").as("line_no"), lit(true).as("keep"))
    lines.join(winners, Seq("lh", "doc_id", "line_no"), "left")
      .withColumn("keep", coalesce(col("keep"), lit(false)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN keep THEN struct(line_no, line) END)), t -> t.line)"),
          "\n").as("text_dedup"))
  }

  val dedupLinesSql: String =
    s"""WITH ls AS (SELECT doc_id, string_split(text, '$LineDelim') AS ls FROM documents),
      lines AS (SELECT doc_id, CAST(t.i - 1 AS INT) AS line_no, ls[t.i] AS line
                FROM ls, LATERAL (SELECT unnest(range(1, len(ls) + 1)) AS i) t),
      flagged AS (SELECT doc_id, line_no, line,
                  row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) = 1 AS keep
                  FROM lines)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        CAST(count(*) FILTER (keep) AS BIGINT) AS n_kept,
        coalesce(string_agg(line, chr(10) ORDER BY line_no) FILTER (keep), '') AS text_dedup
      FROM flagged GROUP BY doc_id"""

  // --------------------------------------------------------------------
  // Per-source boilerplate stripping (the CCNet / RefinedWeb "remove the
  // navigation chrome" pass): a line is boilerplate WITHIN a source when
  // it appears in many of that source's documents — here >= 3 documents
  // AND >= 5% of the source's docs — and then EVERY occurrence of it is
  // dropped from that source (unlike q94's first-occurrence-wins dedup,
  // which keeps one copy and is blind to "frequent in src3, normal in
  // src7" structure).
  // --------------------------------------------------------------------

  /** Per-source boilerplate-line strip. Detection is ONE exchange keyed
    * by (source, line) with a partial-aggregated distinct-doc count; the
    * threshold is pure integer arithmetic (`df >= 3 AND df * 20 >=
    * n_docs`, i.e. 5% — no float boundary for engines to disagree on).
    * The boilerplate set is frequency-thresholded: each boiler line
    * occupies ≥ 5% of a source's docs, so distinct boiler lines per
    * source are bounded by 20 × (avg lines per doc) — small for typical
    * web chrome, but NOT a constant, so the strip join back onto the
    * line stream is left to AQE (it broadcasts while the set fits and
    * degrades to a shuffle join on a pathologically line-heavy source
    * instead of OOMing a forced broadcast); the only other exchange is
    * the doc-keyed reassembly.
    * Source doc counts are a source-cardinality aggregate joined in the
    * same broadcast fashion. Documents whose every line was boilerplate
    * survive with n_kept = 0 and empty text. */
  /** Deterministic chrome injection for the q149 query: the word-salad
    * corpus has no exact repeated lines, so the query plants a per-source
    * navigation line in 2/3 of each source's docs (over threshold —
    * stripped) and a rarer promo line in ~1% (under threshold — kept),
    * derived from (doc_id, source) alone, identically in both engines.
    * Library callers on real corpora skip the injection. */
  private val boilerInjected: Column =
    concat(
      when(pmod(col("doc_id"), lit(3)) =!= 0,
        concat(lit("chrome nav of "), col("source"), lit(LineDelim))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(97)) === 1,
        concat(lit("promo banner of "), col("source"), lit(LineDelim))).otherwise(lit("")),
      col("text"))

  private val boilerInjectedSql =
    s"""(CASE WHEN doc_id % 3 <> 0 THEN 'chrome nav of ' || source || '$LineDelim' ELSE '' END)
       || (CASE WHEN doc_id % 97 = 1 THEN 'promo banner of ' || source || '$LineDelim' ELSE '' END)
       || text"""

  def boilerplateStrip(docs: DataFrame, delim: String = "\n"): DataFrame = {
    // the q99 xxhash64 discipline (as dedupLines): the heaviest exchange
    // here is the (source, line) detection rollup — boilerplate lines by
    // definition repeat across most of a source's docs, so keying it (and
    // the strip join) by int64 `lh` both shrinks exchange bytes and makes
    // the map-side distinct-doc combine hash integers instead of chrome
    // strings. The string-form oracle is the collision tripwire.
    val lines = docs.select(col("doc_id"), col("source"),
      posexplode(linesOf(col("text"), delim)).as(Seq("line_no", "line")))
      .withColumn("lh", xxhash64(col("line")))
    val srcSizes = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val boiler = lines
      .groupBy("source", "lh")
      .agg(countDistinct(col("doc_id")).as("df"))
      .join(broadcast(srcSizes), Seq("source"))
      .filter(col("df") >= 3 && col("df") * 20 >= col("n_docs"))
      .select(col("source"), col("lh"), lit(true).as("boiler"))
    lines.join(boiler, Seq("source", "lh"), "left")
      .withColumn("keep", col("boiler").isNull)
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN keep THEN struct(line_no, line) END)), t -> t.line)"),
          "\n").as("text_clean"))
  }

  val boilerplateStripSql: String =
    s"""WITH inj AS (SELECT doc_id, source, $boilerInjectedSql AS text FROM documents),
      ls AS (SELECT doc_id, source, string_split(text, '$LineDelim') AS ls FROM inj),
      lines AS (SELECT doc_id, source, CAST(t.i - 1 AS INT) AS line_no, ls[t.i] AS line
                FROM ls, LATERAL (SELECT unnest(range(1, len(ls) + 1)) AS i) t),
      src AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
      boiler AS (SELECT d.source, d.line
                 FROM (SELECT source, line, count(DISTINCT doc_id) AS df
                       FROM lines GROUP BY source, line) d
                 JOIN src USING (source)
                 WHERE d.df >= 3 AND d.df * 20 >= src.n_docs)
      SELECT doc_id, l.source AS source, CAST(count(*) AS BIGINT) AS n_lines,
        CAST(count(*) FILTER (b.line IS NULL) AS BIGINT) AS n_kept,
        coalesce(string_agg(l.line, chr(10) ORDER BY line_no) FILTER (b.line IS NULL), '') AS text_clean
      FROM lines l LEFT JOIN boiler b ON l.source = b.source AND l.line = b.line
      GROUP BY doc_id, l.source"""

  /** Default blocklist for [[blocklistScan]] — word-boundary PHRASES of
    * mixed lengths over the corpus vocabulary (a real deployment loads
    * its abuse/boilerplate list; the mechanics are what's under test). */
  val BlockPhrases: Seq[String] = Seq(
    "fast hash merge", "a row data", "merge sort window",
    "table scan", "join filter", "hash column", "batch", "query")

  /** Multi-phrase blocklist scan — the "which documents contain any of
    * these N phrases, where, how often" primitive behind abuse
    * filtering, boilerplate detection, and policy audits. NOT a regex
    * alternation (N phrases compiled into one pattern stops being
    * codegen-friendly and word-boundary-correct fast): every w-token
    * window for each DISTINCT phrase length w is materialized as a gram
    * and filtered against the phrase set MAP-SIDE (an `In` predicate
    * over string literals — semantically a broadcast join with a
    * set-sized build). Exact word-boundary matches only; one row per
    * (document, phrase) with the occurrence count.
    *
    * Scale shape: gram volume is (#distinct lengths)·token volume
    * through a stateless projection + filter; the only exchange is the
    * (doc, phrase)-keyed rollup of HITS — abuse-list hits are sparse,
    * so the shuffle is tiny however large the corpus. */
  def blocklistScan(docs: DataFrame,
      phrases: Seq[String] = BlockPhrases): DataFrame = {
    val lens = phrases.map(_.split(" ").length).distinct.sorted
    val gramsByLen = lens.map(w =>
      s"""transform(sequence(1, greatest(size(toks) - ${w - 1}, 0)),
          i -> concat_ws(' ', slice(toks, i, $w)))""").mkString(", ")
    QueryDef.spread(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(expr(s"flatten(array($gramsByLen))")).as("phrase"))
      .filter(col("phrase").isin(phrases: _*))
      .groupBy("doc_id", "phrase")
      .agg(count(lit(1)).as("n_hits"))
  }

  def blocklistScanSql(phrases: Seq[String] = BlockPhrases,
      table: String = "documents"): String = {
    val lens = phrases.map(_.split(" ").length).distinct.sorted
    val inList = phrases.map(p => s"'$p'").mkString(", ")
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM $table),
      g AS (SELECT doc_id, array_to_string(toks[i : i + w - 1], ' ') AS phrase
            FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM tk),
                 (SELECT unnest([${lens.mkString(", ")}]) AS w)
            WHERE i + w - 1 <= len(toks))
      SELECT doc_id, phrase, count(*) AS n_hits
      FROM g WHERE phrase IN ($inList)
      GROUP BY doc_id, phrase"""
  }

  /** Shared-prefix template screen (q240): per source, how many docs
    * share their first-`nTok`-token prefix with ≥ `minGroup` others, how
    * many distinct templates exist, and the largest group — the
    * PARTIAL-template failure mode between whole-document dedup (q40:
    * misses docs that diverge after the intro) and line-level
    * boilerplate (q149: misses multi-line intros that aren't
    * line-identical). The screen that says whether a source needs
    * prefix-stripping before its exact-dup stats mean anything.
    *
    * Scale shape: one scan projects (source, xxhash64(prefix)) — the
    * q94/q99 int64 key discipline, prefix text never keys an exchange
    * (the oracle groups the raw prefix string = collision tripwire);
    * group sizes are a map-side-combined fp rollup joined back onto fp
    * rows; the report is source-bounded. */
  def prefixTemplates(docs: DataFrame, nTok: Int = 16,
      minGroup: Long = 3L): DataFrame = {
    val pf = docs.select(col("source"),
      xxhash64(expr(s"concat_ws(' ', slice(split(text, ' '), 1, $nTok))")).as("pfp"))
    val groups = pf.groupBy("pfp").agg(count(lit(1)).as("gsz"))
    pf.join(groups, "pfp")
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        expr(s"CAST(count_if(gsz >= $minGroup) AS BIGINT)").as("n_templated_docs"),
        expr(s"CAST(count(DISTINCT CASE WHEN gsz >= $minGroup THEN pfp END) AS BIGINT)")
          .as("n_templates"),
        max("gsz").as("max_group"))
      .withColumn("templated_micro",
        expr("(n_templated_docs * 1000000L) div n_docs"))
  }

  /** q240's oracle over a q149-style injection (every 9th doc gets a
    * deterministic 16-token intro — the corpus has no organic shared
    * prefixes at 1x); groups by the raw prefix string. */
  def prefixTemplatesSql(nTok: Int = 16, minGroup: Long = 3L): String =
    s"""WITH inj AS (SELECT doc_id, source,
            CASE WHEN doc_id % 9 = 0 THEN '$TemplateIntro' || ' ' || text ELSE text END AS text
          FROM documents),
      pf AS (SELECT source,
            array_to_string(string_split(text, ' ')[1:$nTok], ' ') AS pfx
          FROM inj),
      g AS (SELECT pfx, CAST(count(*) AS BIGINT) AS gsz FROM pf GROUP BY 1)
      SELECT pf.source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(count(*) FILTER (WHERE g.gsz >= $minGroup) AS BIGINT) AS n_templated_docs,
        CAST(count(DISTINCT CASE WHEN g.gsz >= $minGroup THEN g.pfx END) AS BIGINT)
          AS n_templates,
        CAST(MAX(g.gsz) AS BIGINT) AS max_group,
        (CAST(count(*) FILTER (WHERE g.gsz >= $minGroup) AS BIGINT) * 1000000) // count(*)
          AS templated_micro
      FROM pf JOIN g USING (pfx)
      GROUP BY pf.source"""

  /** 16 tokens of deterministic chrome for q240's injection. */
  val TemplateIntro: String =
    "welcome to the site this page is part of our standard catalog " +
      "layout please read on"

  val queries: Seq[QueryDef] = Seq(
    QueryDef("q240_prefix_templates",
      (s, d) => {
        val docs = t(s, d, "documents").select("doc_id", "source", "text")
        prefixTemplates(docs.select(col("source"),
          expr(s"CASE WHEN doc_id % 9 = 0 THEN '$TemplateIntro' || ' ' || text ELSE text END")
            .as("text")))
      },
      Some(prefixTemplatesSql())),

    QueryDef("q92_clean_lines",
      (s, d) => cleanLines(t(s, d, "documents"), delim = LineDelim,
        lineBlockToken = LineBlockToken, docBlockPhrase = DocBlockPhrase),
      Some(cleanLinesSql)),

    QueryDef("q93_pii_redact",
      (s, d) => redactPii(t(s, d, "documents"), piiInjected),
      Some(redactPiiSql)),

    QueryDef("q94_line_dedup",
      (s, d) => dedupLines(t(s, d, "documents"), delim = LineDelim),
      Some(dedupLinesSql)),

    QueryDef("q127_pii_card_luhn",
      (s, d) => redactCards(t(s, d, "documents"), cardInjected),
      Some(redactCardsSql)),

    QueryDef("q210_pii_density",
      (s, d) => piiDensity(t(s, d, "documents")
        .select(col("doc_id"), col("source"), piiMixInjected.as("text"))),
      Some(piiDensitySql)),

    QueryDef("q146_blocklist_scan",
      (s, d) => blocklistScan(t(s, d, "documents")),
      Some(blocklistScanSql())),

    QueryDef("q149_boilerplate_strip",
      (s, d) => boilerplateStrip(
        t(s, d, "documents").withColumn("text", boilerInjected), delim = LineDelim),
      Some(boilerplateStripSql))
  )
}
