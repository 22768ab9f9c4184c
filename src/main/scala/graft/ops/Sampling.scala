package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.QueryDef
import graft.queries.QueryDef._

/** Deterministic sampling and split assignment over `documents` (★ SURVEY
  * §2c — training-data pipeline staples).
  *
  * All selection is by md5(doc_id) hex prefix, NOT `rand()`: the sample a
  * document lands in is a pure function of its id, so it is stable across
  * re-runs, partitionings, engines and retries (a rand() sample is none of
  * those), and the oracle can reproduce it exactly. The first 4 hex chars
  * are compared lexicographically against a threshold — for fixed-length
  * lowercase hex, string order IS numeric order, so `< hex(k)` selects
  * k/65536 of the hash space with zero hex-to-int conversion.
  *
  * Scale: every op is a stateless per-row predicate — no shuffle, no
  * state, embarrassingly parallel; filters sit directly above the scan. */
object Sampling {

  private def bucket(idCol: String) = s"substr(md5(CAST($idCol AS STRING)), 1, 4)"

  /** Hex char → value, Spark SQL flavor (shared by the shard-byte
    * derivations in [[shuffleAssign]] and [[epochOrder]]). */
  private def hexValSpark(c: String) = s"(instr('0123456789abcdef', $c) - 1)"

  private def hex(k: Int) = f"'$k%04x'"

  /** Bernoulli-by-hash sample keeping ~`num`/65536 of the corpus. */
  def hashSample(docs: DataFrame, num: Int): DataFrame =
    docs.filter(expr(s"${bucket("doc_id")} < ${hex(num)}"))
      .select(col("doc_id"), col("lang"), col("n_chars"))

  /** SQL twin (DuckDB). */
  def hashSampleSql(num: Int): String =
    s"""SELECT doc_id, lang, n_chars FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < ${hex(num)}"""

  /** 80/10/10 train/val/test assignment by hash range — the standard
    * leakage-free split (membership never depends on data order). */
  val TrainMax = 52429 // 0xcccd ~ 80.0%
  val ValMax = 58982 // 0xe666 ~ 90.0%

  /** Split-assignment CASE over an id column — single source of truth for
    * every operator keyed on split membership (hashSplit here,
    * Dedup.decontaminate). Spark flavor; [[splitCaseDuck]] is the twin. */
  private[ops] def splitCase(idCol: String): String =
    s"""CASE WHEN ${bucket(idCol)} < ${hex(TrainMax)} THEN 'train'
             WHEN ${bucket(idCol)} < ${hex(ValMax)} THEN 'val'
             ELSE 'test' END"""

  private[ops] def splitCaseDuck(idCol: String): String = {
    val b = s"substr(md5(CAST($idCol AS VARCHAR)), 1, 4)"
    s"""CASE WHEN $b < ${hex(TrainMax)} THEN 'train'
             WHEN $b < ${hex(ValMax)} THEN 'val'
             ELSE 'test' END"""
  }

  def hashSplit(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), expr(splitCase("doc_id")).as("split"))

  def hashSplitSql: String =
    s"""SELECT doc_id, lang, ${splitCaseDuck("doc_id")} AS split
        FROM documents"""

  /** Composite c4-style quality filter: integer-exact predicates only
    * (cross-multiplied ratios — no doubles, so the cut is portable).
    * Keeps documents with >= 20 tokens, vocabulary-diversity >= 0.3,
    * mean token length in [3, 12], and >= 1 stopword hit. */
  def qualityFilter(docs: DataFrame): DataFrame =
    docs.select(col("doc_id") +: col("lang") +: TextStats.signalCols: _*)
      .filter(expr(TextStats.QualityPassCond))

  def qualityFilterSql(table: String = "documents"): String =
    s"""SELECT * FROM (
        SELECT doc_id, lang, ${TextStats.scoreSignalsDuck}, ${TextStats.sumLenDuck}
        FROM $table)
        WHERE ${TextStats.QualityPassCond}"""

  /** Exact stratified sample: EXACTLY `k` documents per stratum (fewer
    * only if the stratum is smaller), chosen by md5-hash rank within the
    * stratum — deterministic like every sampler here, and balanced where
    * the Bernoulli hash sample is only balanced in expectation (class
    * rebalancing is the training-data use). One shuffle on the stratum
    * key; WindowGroupLimit caps each partition's contribution at k rows
    * BEFORE the exchange, so the shuffle carries strata x k rows, not the
    * corpus. Ties on the 4-hex bucket (birthday-likely) break by doc_id. */
  def stratifiedSample(docs: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("bkt").asc, col("doc_id").asc)
    docs.select(col("doc_id"), col("source"), expr(bucket("doc_id")).as("bkt"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("source"), col("rk").cast("long").as("rk"))
  }

  def stratifiedSampleSql(k: Int): String =
    s"""SELECT doc_id, source, CAST(rk AS BIGINT) AS rk FROM (
        SELECT doc_id, source,
          row_number() OVER (PARTITION BY source
            ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 4), doc_id) AS rk
        FROM documents)
        WHERE rk <= $k"""

  val WeightedRate = 0.5

  /** Quality-weighted sampling (the upsample-good-sources step of a
    * pre-training mix): each document is kept with probability
    * `rate × quality_score`, decided by the SAME deterministic md5 bucket
    * as every other sampler here — so membership is reproducible, stable
    * under retries, and composable with the split/sample ops (a doc's
    * bucket is fixed; only its threshold varies). The score is q31's
    * exact-integer-derived quality (identical IEEE doubles in both
    * engines), so the integer cut is portable. Stateless per-row
    * predicate above the scan — no shuffle at any scale. */
  def weightedSample(docs: DataFrame, rate: Double = WeightedRate): DataFrame =
    graft.ops.TextStats.quality(docs)
      .withColumn("cut", floor(col("score") * rate * 65536.0).cast("long"))
      .filter(expr(s"CAST(conv(${bucket("doc_id")}, 16, 10) AS BIGINT)") < col("cut"))
      .select("doc_id", "lang", "score", "cut")

  def weightedSampleSql(rate: Double = WeightedRate): String =
    s"""WITH base AS (SELECT doc_id, lang, ${TextStats.scoreSignalsDuck}
      FROM documents),
      scored AS (SELECT doc_id, lang,
          ${TextStats.scoreExprDuck} AS score
        FROM base),
      th AS (SELECT doc_id, lang, score,
          CAST(floor(score * $rate * 65536.0) AS BIGINT) AS cut FROM scored)
      SELECT doc_id, lang, score, cut FROM th
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) < cut"""

  val MixBudgetTokens = 8000L

  /** The q96 query's weight column: derived from the synthetic source
    * name (src<n> → n%3+1) so the testdata mix is reproducible and
    * non-uniform. Real corpora pass their tuned weights instead — e.g.
    * `element_at(typedLit(Map("wikipedia" -> 5L, "crawl" -> 1L)),
    * col("source"))`. */
  def srcNameWeight: org.apache.spark.sql.Column =
    substring(col("source"), 4, 10).cast("long") % 3 + 1

  /** Source-mixing to a global token budget (the DoReMi / Pile-style
    * "mixture weights" step of assembling a pre-training corpus): each
    * source gets `budget × w_s / Σw` tokens, filled greedily by quality
    * rank. `weight` is any integer Column over the source row (default:
    * uniform). Selection is "highest q31 quality score first, doc_id
    * tie-break, keep while the running token total stays within the
    * source's share" — the first over-budget document is excluded (hard
    * budget). Shares are exact integer arithmetic (budget·w DIV Σw) and
    * the running total is an integer window sum, so the cut is
    * bit-portable across engines. Scale: one window shuffle keyed by
    * source — the same shape as q10's per-group top-k; per-source order
    * is a sort within its partition, no global sort. */
  def sourceMix(docs: DataFrame, budgetTokens: Long = MixBudgetTokens,
      weight: org.apache.spark.sql.Column = lit(1L)): DataFrame = {
    val scored = graft.ops.TextStats.scored(docs, Seq("source"))
      .withColumn("w", weight)
    val totw = scored.select(col("source"), col("w")).distinct()
      .agg(sum("w").as("totw"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("score").desc, col("doc_id").asc)
    scored.crossJoin(broadcast(totw))
      .withColumn("share_tokens", expr(s"($budgetTokens * w) DIV totw"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(win))
      .filter(col("cum_tokens") <= col("share_tokens"))
      .select("doc_id", "source", "n_tokens", "cum_tokens", "share_tokens")
  }

  /** Per-source length-outlier trim (q160): keep documents whose token
    * count lies within their SOURCE's [p05, p95] exact percentile band —
    * the tail-trimming pass before length statistics feed packing or
    * curriculum decisions (a crawl source's length tail is scrapes and
    * concatenation accidents, not prose; a global cut would mis-trim
    * every source whose natural length differs). Percentiles are q59's
    * exact weighted interpolation — Spark `percentile` == DuckDB
    * `quantile_cont` bit-for-bit (interpolation-parity spec-locked
    * there) — so the band edges are portable doubles and the filter is
    * one comparison per row.
    *
    * Scale shape: ONE source-keyed exact-percentile aggregation (q59's
    * buffering caveat applies per source), the band table is
    * source-cardinality and broadcasts, the filter is map-side. */
  def lengthTrim(docs: DataFrame, lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    val lens = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val cuts = lens.groupBy("source").agg(
      expr(s"percentile(n_tokens, CAST($lo AS DOUBLE))").as("lo_cut"),
      expr(s"percentile(n_tokens, CAST($hi AS DOUBLE))").as("hi_cut"))
    lens.join(broadcast(cuts), "source")
      .filter(col("n_tokens").cast("double") >= col("lo_cut") &&
        col("n_tokens").cast("double") <= col("hi_cut"))
      .select("doc_id", "source", "n_tokens", "lo_cut", "hi_cut")
  }

  def lengthTrimSql(lo: Double = 0.05, hi: Double = 0.95): String =
    s"""WITH l AS (SELECT doc_id, source,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
      c AS (SELECT source, quantile_cont(n_tokens, $lo) AS lo_cut,
              quantile_cont(n_tokens, $hi) AS hi_cut
            FROM l GROUP BY source)
      SELECT doc_id, l.source AS source, n_tokens, lo_cut, hi_cut
      FROM l JOIN c USING (source)
      WHERE CAST(n_tokens AS DOUBLE) >= lo_cut
        AND CAST(n_tokens AS DOUBLE) <= hi_cut"""

  /** Token exposure under epoching (q185): per source, the unique tokens
    * the q102 mixture keeps, the EXPOSURE tokens the trainer actually
    * sees (Σ n_tokens·epochs), and their ratio (effective epochs) — the
    * data-constrained-regime budget line (Muennighoff et al.: repeated
    * tokens buy less; this is the report that says HOW repeated each
    * source's contribution is). One source rollup over q102's kept-doc
    * output — doc-count rows, map-side combined. */
  def tokenExposure(docs: DataFrame, factor: Long = 3L,
      weight: org.apache.spark.sql.Column = lit(1L)): DataFrame =
    sourceMixEpochs(docs, factor, weight)
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("unique_tokens"),
        sum(col("n_tokens") * col("epochs")).as("exposure_tokens"))
      .withColumn("eff_epochs",
        col("exposure_tokens").cast("double") / col("unique_tokens").cast("double"))

  def tokenExposureSql(factor: Long = 3L): String =
    s"""WITH mix AS (${sourceMixEpochsSql(factor, "documents")})
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS unique_tokens,
        CAST(SUM(n_tokens * epochs) AS BIGINT) AS exposure_tokens,
        CAST(SUM(n_tokens * epochs) AS DOUBLE)
          / CAST(SUM(n_tokens) AS DOUBLE) AS eff_epochs
      FROM mix GROUP BY source"""

  /** Temperature-scaled source mixing (q156, α = 1/2): each source's
    * token share is ∝ avail^α — the published multilingual/multi-domain
    * recipe (exponentiated sampling, XLM-R/mT5 style): α < 1 flattens
    * the mixture, upweighting small sources a proportional split
    * starves and capping the dominance of the largest. α = 1/2 keeps
    * the weights PORTABLE with no float policy knob: `ws =
    * floor(sqrt(avail) · 1e6)` — sqrt of an exactly-representable
    * BIGINT is correctly rounded in both engines, the 1e6 scale and
    * floor are exact, and from there shares are `(budget·ws) DIV Σws`
    * pure integers. Fill is q96's greedy-by-quality window.
    *
    * Scale shape: q96's — ONE window shuffle keyed by source; the
    * per-source weight table is source-cardinality and broadcasts. */
  def temperatureMix(docs: DataFrame, budgetTokens: Long = MixBudgetTokens): DataFrame = {
    val scored = graft.ops.TextStats.scored(docs, Seq("source"))
    val aw = scored.groupBy("source").agg(sum("n_tokens").as("avail"))
      .withColumn("ws", expr("CAST(floor(sqrt(CAST(avail AS DOUBLE)) * 1000000) AS BIGINT)"))
    val totw = aw.agg(sum("ws").as("totw"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("score").desc, col("doc_id").asc)
    scored.join(broadcast(aw), "source").crossJoin(broadcast(totw))
      .withColumn("share_tokens", expr(s"($budgetTokens * ws) DIV totw"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(win))
      .filter(col("cum_tokens") <= col("share_tokens"))
      .select("doc_id", "source", "n_tokens", "cum_tokens", "share_tokens")
  }

  def temperatureMixSql(budgetTokens: Long = MixBudgetTokens): String =
    s"""WITH base AS (SELECT doc_id, source, ${TextStats.scoreSignalsDuck}
      FROM documents),
      scored AS (SELECT doc_id, source, n_tokens,
          ${TextStats.scoreExprDuck} AS score
        FROM base),
      aw AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS avail,
          CAST(floor(sqrt(CAST(CAST(SUM(n_tokens) AS BIGINT) AS DOUBLE)) * 1000000) AS BIGINT) AS ws
        FROM scored GROUP BY source),
      tw AS (SELECT SUM(ws) AS totw FROM aw),
      c AS (SELECT s.doc_id, s.source, s.n_tokens,
          CAST(($budgetTokens * aw.ws) // (SELECT totw FROM tw) AS BIGINT) AS share_tokens,
          CAST(SUM(s.n_tokens) OVER (PARTITION BY s.source ORDER BY s.score DESC, s.doc_id)
            AS BIGINT) AS cum_tokens
        FROM scored s JOIN aw USING (source))
      SELECT doc_id, source, n_tokens, cum_tokens, share_tokens
      FROM c WHERE cum_tokens <= share_tokens"""

  /** q309's oracle (r12): [[sourceMixSql]] at UNIT weight — the exact
    * semantics of the `source_mix(path, budget)` TVF, which exposes the
    * budget knob but not the weight column. */
  def sourceMixUnitSql(budgetTokens: Long = MixBudgetTokens): String =
    s"""WITH base AS (SELECT doc_id, source, ${TextStats.scoreSignalsDuck}
      FROM documents),
      scored AS (SELECT doc_id, source, n_tokens,
          ${TextStats.scoreExprDuck} AS score, CAST(1 AS BIGINT) AS w
        FROM base),
      tw AS (SELECT SUM(w) AS totw FROM (SELECT DISTINCT source, w FROM scored)),
      c AS (SELECT doc_id, source, n_tokens,
          CAST(($budgetTokens * w) // (SELECT totw FROM tw) AS BIGINT) AS share_tokens,
          CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY score DESC, doc_id)
            AS BIGINT) AS cum_tokens
        FROM scored)
      SELECT doc_id, source, n_tokens, cum_tokens, share_tokens
      FROM c WHERE cum_tokens <= share_tokens"""

  def sourceMixSql(budgetTokens: Long = MixBudgetTokens): String =
    s"""WITH base AS (SELECT doc_id, source, ${TextStats.scoreSignalsDuck}
      FROM documents),
      scored AS (SELECT doc_id, source, n_tokens,
          ${TextStats.scoreExprDuck} AS score,
          CAST(substr(source, 4) AS BIGINT) % 3 + 1 AS w
        FROM base),
      tw AS (SELECT SUM(w) AS totw FROM (SELECT DISTINCT source, w FROM scored)),
      c AS (SELECT doc_id, source, n_tokens,
          CAST(($budgetTokens * w) // (SELECT totw FROM tw) AS BIGINT) AS share_tokens,
          CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY score DESC, doc_id)
            AS BIGINT) AS cum_tokens
        FROM scored)
      SELECT doc_id, source, n_tokens, cum_tokens, share_tokens
      FROM c WHERE cum_tokens <= share_tokens"""

  /** Epoch-aware source mixing — the data-constrained regime of [[sourceMix]]
    * (Muennighoff et al. 2023: when a source's share exceeds its available
    * tokens, repeat it). Each source's share is `budget·w_s DIV Σw` with
    * budget = `factor × total corpus tokens` (computed from the corpus, so
    * every scale factor exercises the multi-epoch path); a source supplies
    * `e = share DIV avail` full epochs of everything, and its quality-top
    * documents (greedy by q31 score, doc_id tie-break, integer window cum)
    * run one extra epoch while the remainder `share − e·avail` lasts. With
    * `e = 0` this IS q96's hard-budget greedy fill, so the two mixers share
    * semantics at the boundary. All shares/epochs are exact integer
    * arithmetic — portable.
    *
    * Scale shape: q96's — one window shuffle keyed by source; the avail /
    * budget / weight totals are broadcast scalars. The output lists each
    * kept doc ONCE with its epoch count (a writer materializes repeats);
    * emitting doc×epoch rows would multiply output for no information. */
  def sourceMixEpochs(docs: DataFrame, factor: Long = 3L,
      weight: org.apache.spark.sql.Column = lit(1L)): DataFrame = {
    val scored = graft.ops.TextStats.scored(docs, Seq("source"))
      .withColumn("w", weight)
    val totw = scored.select(col("source"), col("w")).distinct().agg(sum("w").as("totw"))
    val total = scored.agg(sum("n_tokens").as("t_total"))
    val avail = scored.groupBy("source").agg(sum("n_tokens").as("avail"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("score").desc, col("doc_id").asc)
    scored.crossJoin(broadcast(totw)).crossJoin(broadcast(total))
      .join(broadcast(avail), "source")
      .withColumn("share_tokens", expr(s"(($factor * t_total) * w) DIV totw"))
      .withColumn("full_epochs", expr("share_tokens DIV avail"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(win))
      .withColumn("epochs", expr(
        "full_epochs + (CASE WHEN cum_tokens <= share_tokens - full_epochs * avail THEN 1 ELSE 0 END)"))
      .filter(col("epochs") > 0)
      .select("doc_id", "source", "n_tokens", "share_tokens", "epochs")
  }

  def sourceMixEpochsSql(factor: Long = 3L, table: String = "documents"): String =
    s"""WITH base AS (SELECT doc_id, source, ${TextStats.scoreSignalsDuck}
      FROM $table),
      scored AS (SELECT doc_id, source, n_tokens,
          ${TextStats.scoreExprDuck} AS score,
          CAST(substr(source, 4) AS BIGINT) % 3 + 1 AS w
        FROM base),
      tw AS (SELECT SUM(w) AS totw FROM (SELECT DISTINCT source, w FROM scored)),
      tt AS (SELECT SUM(n_tokens) AS t_total FROM scored),
      av AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS avail FROM scored GROUP BY 1),
      c AS (SELECT doc_id, scored.source, n_tokens, avail,
          CAST((($factor * (SELECT t_total FROM tt)) * w) // (SELECT totw FROM tw) AS BIGINT) AS share_tokens,
          CAST(SUM(n_tokens) OVER (PARTITION BY scored.source ORDER BY score DESC, doc_id)
            AS BIGINT) AS cum_tokens
        FROM scored JOIN av ON scored.source = av.source),
      e AS (SELECT doc_id, source, n_tokens, share_tokens,
          (share_tokens // avail)
            + (CASE WHEN cum_tokens <= share_tokens - (share_tokens // avail) * avail
               THEN 1 ELSE 0 END) AS epochs
        FROM c)
      SELECT doc_id, source, n_tokens, share_tokens, CAST(epochs AS BIGINT) AS epochs
      FROM e WHERE epochs > 0"""

  /** Per-source epoch-cap cycle for [[unimaxAlloc]]: source `srcN` may be
    * repeated at most `N % 4 + 1` epochs. A real pipeline assigns these
    * caps editorially (books repeat more than crawl); the deterministic
    * name-derived cycle gives the synthetic corpus the cap SKEW the
    * water-filling frontier needs (the corpus's token counts alone are
    * near-uniform, which would never exercise the capped branch). */
  val UnimaxEpochCycle = 4L

  /** UniMax budget allocation (Chung et al. 2023): spread a global token
    * budget as UNIFORMLY as possible across sources, capping each source
    * at `avail_s × epoch-cap_s` — the anti-skew alternative to the
    * weight-proportional [[sourceMix]] (q96), which starves small
    * sources exactly where repeating them a little would be free.
    *
    * Closed-form water-filling, no iteration: sort sources by cap
    * ascending; a PREFIX of that order is capped (proof: if the
    * remaining-uniform share already exceeds cap_i it exceeds every
    * earlier cap too), and the frontier k is the largest i with
    * `cap_i · (n−i+1) ≤ B − cum_{i−1}`. Capped sources take their cap;
    * the rest split the remainder exactly — `DIV` share plus one token
    * to the first `rem MOD m` of them, so Σalloc == B to the token, all
    * integer arithmetic on both engines.
    *
    * Scale shape: one map-side-combined groupBy over token volume; the
    * window chain after it runs on SOURCE-COUNT rows (tens), so its
    * single-partition OVER () frames are deliberate — never put them on
    * a corpus-sized frame. Budget B = one epoch of the whole corpus. */
  def unimaxAlloc(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    unimaxAllocFromCaps(
      t(spark, dir, "documents")
        .select(col("source"), size(split(col("text"), " ")).cast("long").as("tok"))
        .groupBy("source").agg(sum("tok").as("toks"))
        .withColumn("mult", expr(s"CAST(substr(source, 4) AS BIGINT) % $UnimaxEpochCycle + 1")))

  /** The water-filling frontier over an already-aggregated
    * (source, toks, mult) frame — split out so PropertySpec can drive
    * it against a plain-Scala greedy reference on random inputs. */
  def unimaxAllocFromCaps(caps: DataFrame): DataFrame =
    caps
      .withColumn("cap", col("toks") * col("mult"))
      .withColumn("bdg", expr("sum(toks) OVER ()"))
      .withColumn("n", expr("count(*) OVER ()"))
      .withColumn("i", expr("row_number() OVER (ORDER BY cap, source)"))
      .withColumn("cum", expr(
        "sum(cap) OVER (ORDER BY cap, source ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"))
      .withColumn("capped", expr("cap * (n - i + 1) <= bdg - (cum - cap)"))
      .withColumn("k", expr("max(CASE WHEN capped THEN i ELSE 0 END) OVER ()"))
      .withColumn("spent", expr("sum(CASE WHEN capped THEN cap ELSE 0L END) OVER ()"))
      .withColumn("alloc", expr(
        """CASE WHEN capped THEN cap
           ELSE (bdg - spent) div (n - k)
                + (CASE WHEN i - k <= (bdg - spent) % (n - k) THEN 1 ELSE 0 END) END"""))
      .select("source", "toks", "mult", "cap", "alloc", "capped")

  def unimaxAllocSql(table: String = "documents"): String =
    s"""WITH tok AS (SELECT source,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
        FROM $table GROUP BY 1),
      c AS (SELECT source, toks,
          CAST(substr(source, 4) AS BIGINT) % $UnimaxEpochCycle + 1 AS mult,
          toks * (CAST(substr(source, 4) AS BIGINT) % $UnimaxEpochCycle + 1) AS cap
        FROM tok),
      w AS (SELECT source, toks, mult, cap,
          CAST(SUM(toks) OVER () AS BIGINT) AS bdg,
          COUNT(*) OVER () AS n,
          row_number() OVER (ORDER BY cap, source) AS i,
          CAST(SUM(cap) OVER (ORDER BY cap, source
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        FROM c),
      f AS (SELECT *, (cap * (n - i + 1) <= bdg - (cum - cap)) AS capped FROM w),
      g AS (SELECT *, MAX(CASE WHEN capped THEN i ELSE 0 END) OVER () AS k,
          CAST(SUM(CASE WHEN capped THEN cap ELSE 0 END) OVER () AS BIGINT) AS spent
        FROM f)
      SELECT source, toks, mult, cap,
        CAST(CASE WHEN capped THEN cap
          ELSE (bdg - spent) // (n - k)
               + (CASE WHEN i - k <= (bdg - spent) % (n - k) THEN 1 ELSE 0 END) END
          AS BIGINT) AS alloc,
        capped
      FROM g"""

  /** Documents drawn in a Neyman-allocated stratified sample. */
  val NeymanBudget = 100L

  /** Neyman allocation for a stratified sample: with a fixed budget of
    * [[NeymanBudget]] documents and strata = sources, minimum-variance
    * estimation of a per-document metric (token count) wants n_h ∝
    * N_h·σ_h — oversample the big AND the high-variance sources
    * (Neyman 1934; the survey-sampling classic every eval-set builder
    * reinvents). Kept integer-exact across engines via the identity
    * N_h·σ_h = sqrt(N_h·Σx² − (Σx)²): ONE sqrt of an exact integer
    * (correctly rounded on both engines, and floor(sqrt(V)) is exact
    * for V < 2⁵² because |sqrt(V)−k| ≥ 1/(2k) ≫ ulp), then seats by
    * largest remainder on BIGINT weights — Σalloc == budget exactly.
    * `alloc_prop` is the proportional allocation (weight = N_h) through
    * the same seat machinery, so the output is the side-by-side card a
    * sampling owner reads to see what variance-awareness changes.
    *
    * Scale shape: one map-side-combined groupBy(source) over the corpus
    * (count/sum/sum-of-squares partials); every window after it runs on
    * SOURCE-COUNT rows (tens) — the single-partition OVER () frames are
    * deliberate, never on a corpus-sized frame. At 100 TB the Σx²
    * partial is the only thing that grows: x ≤ ~10⁶ tokens keeps the
    * per-stratum BIGINT sum safe to ~10⁹ docs per source. */
  def neymanAlloc(spark: org.apache.spark.sql.SparkSession, dir: String,
      budget: Long = NeymanBudget): DataFrame =
    neymanAllocFromMoments(
      t(spark, dir, "documents")
        .select(col("source"), size(split(col("text"), " ")).cast("long").as("x"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("x").as("sx"),
          sum(expr("x * x")).as("sxx")),
      budget)

  /** The allocation over an already-aggregated (source, n_docs, sx, sxx)
    * frame — split out so PropertySpec can drive it against a
    * plain-Scala reference on random moment tables. */
  def neymanAllocFromMoments(m: DataFrame, budget: Long): DataFrame =
    m.withColumn("w_neyman", expr(
        "CAST(floor(sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE))) AS BIGINT)"))
      // zero-variance corpus (every stratum constant) → Σw = 0; fall
      // back to proportional rather than divide by zero
      .withColumn("wn", expr(
        "CASE WHEN sum(w_neyman) OVER () = 0 THEN n_docs ELSE w_neyman END"))
      .withColumn("tw", expr("sum(wn) OVER ()"))
      .withColumn("tn", expr("sum(n_docs) OVER ()"))
      .withColumn("fl", expr(s"($budget * wn) div tw"))
      .withColumn("rem", expr(s"($budget * wn) % tw"))
      .withColumn("flp", expr(s"($budget * n_docs) div tn"))
      .withColumn("remp", expr(s"($budget * n_docs) % tn"))
      .withColumn("rk", expr("row_number() OVER (ORDER BY rem DESC, source)"))
      .withColumn("rkp", expr("row_number() OVER (ORDER BY remp DESC, source)"))
      .withColumn("alloc", expr(s"fl + (CASE WHEN rk <= $budget - sum(fl) OVER () THEN 1 ELSE 0 END)"))
      .withColumn("alloc_prop", expr(s"flp + (CASE WHEN rkp <= $budget - sum(flp) OVER () THEN 1 ELSE 0 END)"))
      .select("source", "n_docs", "sx", "w_neyman", "alloc", "alloc_prop")

  def neymanAllocSql(budget: Long = NeymanBudget, table: String = "documents"): String =
    s"""WITH m AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sx,
          CAST(SUM(len(string_split(text, ' ')) * len(string_split(text, ' '))) AS BIGINT) AS sxx
        FROM $table GROUP BY 1),
      w AS (SELECT *, CAST(floor(sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE))) AS BIGINT) AS w_neyman
        FROM m),
      w2 AS (SELECT *, CAST(CASE WHEN SUM(w_neyman) OVER () = 0
            THEN n_docs ELSE w_neyman END AS BIGINT) AS wn
        FROM w),
      s AS (SELECT *,
          CAST(SUM(wn) OVER () AS BIGINT) AS tw,
          CAST(SUM(n_docs) OVER () AS BIGINT) AS tn
        FROM w2),
      f AS (SELECT *,
          ($budget * wn) // tw AS fl, ($budget * wn) % tw AS rem,
          ($budget * n_docs) // tn AS flp, ($budget * n_docs) % tn AS remp
        FROM s),
      r AS (SELECT *,
          row_number() OVER (ORDER BY rem DESC, source) AS rk,
          row_number() OVER (ORDER BY remp DESC, source) AS rkp,
          CAST(SUM(fl) OVER () AS BIGINT) AS sfl,
          CAST(SUM(flp) OVER () AS BIGINT) AS sflp
        FROM f)
      SELECT source, n_docs, sx, w_neyman,
        CAST(fl + (CASE WHEN rk <= $budget - sfl THEN 1 ELSE 0 END) AS BIGINT) AS alloc,
        CAST(flp + (CASE WHEN rkp <= $budget - sflp THEN 1 ELSE 0 END) AS BIGINT) AS alloc_prop
      FROM r"""

  /** Per-epoch training-order manifest: expand the epoch counts of
    * [[sourceMixEpochs]] (q102) into one row per (document, epoch) with
    * a FRESH shuffle key per epoch — `md5("epoch:" e ":" doc_id)` — so
    * every epoch visits the corpus in an independent deterministic
    * order (the standard reshuffle-each-epoch training discipline; a
    * single fixed order correlates gradient noise across epochs). The
    * shard byte comes from the same key, so a document lands on
    * DIFFERENT shards in different epochs — no shard is ever a repeat
    * of a previous epoch's shard content.
    *
    * Scale shape: one explode of doc-count rows by their (small) epoch
    * multiplicity above q102's plan; the manifest writer then sorts
    * within (epoch, shard) — a bounded-partition sort, never global. */
  def epochOrder(docs: DataFrame, factor: Long = 3L,
      weight: org.apache.spark.sql.Column = lit(1L)): DataFrame =
    sourceMixEpochs(docs, factor, weight)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        explode(expr("sequence(1L, epochs)")).as("epoch"))
      .withColumn("sortkey", md5(concat_ws(":",
        lit("epoch"), col("epoch").cast("string"), col("doc_id").cast("string"))))
      .withColumn("shard", expr(
        s"CAST(${hexValSpark("substr(sortkey, 1, 1)")} * 16 + ${hexValSpark("substr(sortkey, 2, 1)")} AS BIGINT)"))
      .select("doc_id", "source", "n_tokens", "epoch", "shard", "sortkey")

  def epochOrderSql(factor: Long = 3L, table: String = "documents"): String = {
    val hexVal = (c: String) => s"(strpos('0123456789abcdef', $c) - 1)"
    s"""WITH mix AS (${sourceMixEpochsSql(factor, table)}),
      e AS (SELECT doc_id, source, n_tokens,
          unnest(range(1, epochs + 1)) AS epoch FROM mix),
      k AS (SELECT doc_id, source, n_tokens, CAST(epoch AS BIGINT) AS epoch,
          md5('epoch:' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS sortkey
        FROM e)
      SELECT doc_id, source, n_tokens, epoch,
        CAST(${hexVal("substr(sortkey, 1, 1)")} * 16 + ${hexVal("substr(sortkey, 2, 1)")} AS BIGINT) AS shard,
        sortkey
      FROM k"""
  }

  /** Length-distribution-matched sampling: resample the POOL (every
    * other source) so its token-length histogram is a `factor`-scaled
    * copy of a TARGET source's — the de-biasing step before mixing
    * (naive mixing lets a long-document source dominate the token
    * budget even at matched doc counts). Buckets are q112's log2
    * classes; per bucket the pool keeps `factor · target_count` docs
    * (fewer only if the pool bucket is smaller), chosen by md5-hash
    * rank — deterministic like every sampler here. Pool docs in
    * buckets the target never occupies are dropped entirely: that IS
    * the matching.
    *
    * Scale shape: the target histogram is bucket-count rows
    * (broadcast); the pool pays ONE bucket-keyed window shuffle. */
  def lengthMatchedSample(spark: org.apache.spark.sql.SparkSession,
      dir: String, targetSource: String = "src1", factor: Long = 3L): DataFrame = {
    val base = t(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("len_bucket", length(expr("bin(n_tok)")).cast("long"))
    val tb = base.filter(col("source") === targetSource)
      .groupBy("len_bucket").agg(count(lit(1)).as("t_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("len_bucket")
      .orderBy(md5(concat(lit("lm:"), col("doc_id").cast("string"))), col("doc_id"))
    base.filter(col("source") =!= targetSource)
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(tb), "len_bucket")
      .filter(col("rk") <= lit(factor) * col("t_b"))
      .select("doc_id", "source", "len_bucket")
  }

  def lengthMatchedSampleSql(targetSource: String = "src1",
      factor: Long = 3L): String =
    s"""WITH base AS (SELECT doc_id, source,
          CAST(length(bin(CAST(len(string_split(text, ' ')) AS BIGINT))) AS BIGINT) AS len_bucket
        FROM documents),
      tb AS (SELECT len_bucket, count(*) AS t_b FROM base
             WHERE source = '$targetSource' GROUP BY 1),
      pool AS (SELECT doc_id, source, len_bucket,
          CAST(row_number() OVER (PARTITION BY len_bucket
            ORDER BY md5('lm:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
        FROM base WHERE source <> '$targetSource')
      SELECT doc_id, source, len_bucket
      FROM pool JOIN tb USING (len_bucket)
      WHERE rk <= $factor * t_b"""

  /** Filter-funnel diagnostic: per source, how many documents each
    * [[qualityFilter]] predicate rejects (independently — a doc failing
    * two predicates counts in both columns) and how many pass all four.
    * The ablation table a pipeline owner reads before committing a
    * filter config: which source loses how much to which rule. Same
    * integer-exact predicates as q39, so funnel counts and the filter's
    * survivors reconcile exactly (spec-locked).
    *
    * Scale shape: per-row flag projection + ONE partial-aggregated
    * count_if rollup keyed by source — output is source-cardinality. */
  def filterFunnel(docs: DataFrame): DataFrame =
    docs.select(col("source") +: TextStats.signalCols: _*)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        expr(s"CAST(count_if(NOT (${TextStats.QcLen})) AS BIGINT)").as("n_short"),
        expr(s"CAST(count_if(NOT (${TextStats.QcDiversity})) AS BIGINT)").as("n_lowdiv"),
        expr(s"CAST(count_if(NOT ${TextStats.QcTokenLen}) AS BIGINT)").as("n_badlen"),
        expr(s"CAST(count_if(NOT (${TextStats.QcStop})) AS BIGINT)").as("n_nostop"),
        expr(s"CAST(count_if(${TextStats.QualityPassCond}) AS BIGINT)").as("n_pass"))

  def filterFunnelSql: String =
    s"""WITH base AS (SELECT source, ${TextStats.scoreSignalsDuck}, ${TextStats.sumLenDuck}
        FROM documents)
      SELECT source, count(*) AS n_docs,
        CAST(count_if(NOT (${TextStats.QcLen})) AS BIGINT) AS n_short,
        CAST(count_if(NOT (${TextStats.QcDiversity})) AS BIGINT) AS n_lowdiv,
        CAST(count_if(NOT ${TextStats.QcTokenLen}) AS BIGINT) AS n_badlen,
        CAST(count_if(NOT (${TextStats.QcStop})) AS BIGINT) AS n_nostop,
        CAST(count_if(${TextStats.QualityPassCond}) AS BIGINT) AS n_pass
      FROM base GROUP BY source"""

  /** Deterministic corpus shuffle — the "randomize training order" step
    * every pre-training pipeline runs before writing shards. Each
    * document gets a shard (first 2 hex chars of a salted md5 → 16² =
    * 256 hash-balanced shards, fixed by the decode width below) and a
    * within-shard sort key (the full hash);
    * reading shards in any order, each sorted by `sortkey`, yields a
    * reproducible pseudo-random global order. The salt (`shuf:`)
    * decorrelates this hash from the q37/q38 sampling bucket — shuffle
    * position must not leak split membership.
    *
    * Scale shape: a STATELESS per-row projection — no shuffle, no
    * window, no ordinal. A per-shard `row_number` would funnel each
    * shard through one task (the q41 global-window lesson at
    * corpus/256 size); instead the dense position is deferred to the
    * writer ([[shuffleWrite]]), where `repartition(shard) +
    * sortWithinPartitions(sortkey)` realizes exactly that order with
    * Spark's normal shuffle machinery. The hex→int shard decode is two
    * `instr` lookups — portable to any engine without conv(). */
  def shuffleAssign(docs: DataFrame): DataFrame = {
    val hexVal = (c: String) => s"(instr('0123456789abcdef', $c) - 1)"
    docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      md5(concat(lit("shuf:"), col("doc_id").cast("string"))).as("sortkey"))
      .withColumn("shard", expr(
        s"CAST(${hexVal("substr(sortkey, 1, 1)")} * 16 + ${hexVal("substr(sortkey, 2, 1)")} AS BIGINT)"))
      .select("doc_id", "source", "n_tokens", "shard", "sortkey")
  }

  /** Shard source-balance audit (q211): the quality gate on
    * [[shuffleAssign]]'s writer — per shard, the worst absolute
    * deviation of any source's within-shard share from its global
    * share, in exact micro units. A hash shuffle should leave every
    * shard a miniature of the corpus mix; a shard whose deviation
    * spikes means the shard key correlates with source (a broken salt,
    * a skewed id range) and training batches drawn shard-sequentially
    * would see a drifting mixture. dev = |c_ss·N − c_s·n_shard| ·1e6 /
    * (n_shard·N) — cross-multiplied on DECIMAL (exact at corpus scale),
    * one truncation at the end; argmax source reported with the usual
    * deterministic tie-break.
    *
    * Scale shape: ONE (shard × source)-bounded partial-agg rollup off
    * the assignment projection; global marginals are rollup-of-rollup
    * broadcasts; the max/argmax windows run over (shard × source)
    * rows. */
  def shardBalanceAudit(docs: DataFrame): DataFrame = {
    val ss = shuffleAssign(docs).groupBy("shard", "source")
      .agg(count(lit(1)).as("c")).localCheckpoint()
    val perShard = ss.groupBy("shard").agg(sum("c").as("n_shard"))
    val perSrc = ss.groupBy("source").agg(sum("c").as("c_src"))
    val n = ss.agg(sum("c").as("n_total"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("dev_micro").desc, col("source").asc)
    ss.join(broadcast(perShard), "shard")
      .join(broadcast(perSrc), "source")
      .crossJoin(broadcast(n))
      .withColumn("dev_micro", expr(
        """CAST((abs(CAST(c AS DECIMAL(19,0)) * n_total - CAST(c_src AS DECIMAL(19,0)) * n_shard)
           * 1000000) div (CAST(n_shard AS DECIMAL(19,0)) * n_total) AS BIGINT)"""))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("shard"), col("n_shard").as("n_docs"),
        col("source").as("worst_source"), col("dev_micro").as("max_dev_micro"))
  }

  def shardBalanceAuditSql: String =
    s"""WITH a AS (${shuffleAssignSql()}),
      ss AS (SELECT shard, source, CAST(count(*) AS BIGINT) AS c FROM a GROUP BY 1, 2),
      ps AS (SELECT shard, CAST(SUM(c) AS BIGINT) AS n_shard FROM ss GROUP BY 1),
      pr AS (SELECT source, CAST(SUM(c) AS BIGINT) AS c_src FROM ss GROUP BY 1),
      n AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM ss),
      d AS (SELECT ss.shard, ss.source, ps.n_shard,
            CAST((abs(CAST(ss.c AS HUGEINT) * n.n_total - CAST(pr.c_src AS HUGEINT) * ps.n_shard)
              * 1000000) // (CAST(ps.n_shard AS HUGEINT) * n.n_total) AS BIGINT) AS dev_micro
          FROM ss JOIN ps USING (shard) JOIN pr USING (source) CROSS JOIN n),
      r AS (SELECT *, row_number() OVER (PARTITION BY shard
            ORDER BY dev_micro DESC, source ASC) AS rn FROM d)
      SELECT shard, n_shard AS n_docs, source AS worst_source, dev_micro AS max_dev_micro
      FROM r WHERE rn = 1"""

  def shuffleAssignSql(table: String = "documents"): String = {
    val hexVal = (c: String) => s"(strpos('0123456789abcdef', $c) - 1)"
    s"""WITH k AS (SELECT doc_id, source,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          md5('shuf:' || CAST(doc_id AS VARCHAR)) AS sortkey
        FROM $table)
      SELECT doc_id, source, n_tokens,
        CAST(${hexVal("substr(sortkey, 1, 1)")} * 16 + ${hexVal("substr(sortkey, 2, 1)")} AS BIGINT) AS shard,
        sortkey
      FROM k"""
  }

  /** Materialize the shuffle: one parquet dir per shard, rows inside
    * each file in `sortkey` order. `coalesceShards` folds the 256 hash
    * shards into that many output partitions (shard id stays a column,
    * so the mapping survives); each partition sorts its shards'
    * documents by (shard, sortkey) — a training reader streaming the
    * files in partition order sees the deterministic shuffled order.
    * This is the scale-correct realization of the per-shard ordinal:
    * Spark's shuffle + per-partition sort, never a window funnel. */
  def shuffleWrite(docs: DataFrame, outDir: String, coalesceShards: Int = 16): Unit =
    shuffleAssign(docs)
      .repartition(coalesceShards, col("shard"))
      .sortWithinPartitions("shard", "sortkey")
      .write.mode("overwrite").parquet(outDir)

  /** Learning rate for [[doremiStep]]: micro-excess multiplier. */
  val DoremiEta = 4L
  /** Update-factor floor (0.1×): no domain zeroes out of the mixture. */
  val DoremiFloorMicro = 100000L

  /** One DoReMi-style multiplicative-weights mixture step (q198; Xie et
    * al. 2023, arXiv:2305.10429 "DoReMi": train a small proxy, reweight
    * domains by EXCESS LOSS vs a reference, iterate). This operator is
    * one EXACT step of that update with the per-source quality DEFICIT
    * standing in for measured excess loss (a low-mean-quality source ≈
    * a hard/high-loss domain → upweighted), the composition point a
    * deployment feeds real per-domain proxy losses into.
    *
    * Integer-exact throughout: per-source micro mean quality
    * `(Σ floor(score·1e6)) div n` (the q105 card discipline), excess =
    * corpus mean − source mean, update factor `1e6 + η·excess` floored
    * at [[DoremiFloorMicro]], new share = (n_tokens·factor·1e6) div
    * Σ(n_tokens·factor) with the products on DECIMAL(38,0) — n_tokens ·
    * factor·1e6 passes int64 at corpus scale (the q193 guard).
    *
    * Scale shape: ONE source-keyed partial-agg rollup is the only
    * corpus exchange; corpus totals and the factor sum are
    * source-cardinality rollup-of-rollup aggregates broadcast back. */
  def doremiStep(docs: DataFrame, eta: Long = DoremiEta): DataFrame =
    doremiStepFrom(graft.ops.TextStats.scored(docs, Seq("source"))
      .withColumn("q_micro", expr("CAST(floor(score * 1000000.0) AS BIGINT)")), eta)

  /** [[doremiStep]] over an already-scored (source, n_tokens, q_micro)
    * frame — the sharing point [[doremiWeightedMix]] uses to pay the
    * quality fold once for both the step and the fill. */
  private[graft] def doremiStepFrom(scored: DataFrame, eta: Long): DataFrame = {
    val perSrc = scored
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        sum("q_micro").as("q_sum"))
      .withColumn("mean_q_micro", expr("q_sum div n_docs"))
      .localCheckpoint() // source-cardinality; feeds totals + the update
    val tot = perSrc.agg(
      expr("(CAST(sum(q_sum) AS DECIMAL(38,0)) div sum(n_docs))").cast("long").as("corpus_mean_micro"))
    val upd = perSrc.crossJoin(broadcast(tot))
      .withColumn("excess_micro", col("corpus_mean_micro") - col("mean_q_micro"))
      .withColumn("factor_micro",
        greatest(lit(DoremiFloorMicro), lit(1000000L) + lit(eta) * col("excess_micro")))
      .withColumn("w", expr("CAST(n_tokens AS DECIMAL(38,0)) * factor_micro"))
    val wtot = upd.agg(sum("w").as("wtot"))
    upd.crossJoin(broadcast(wtot))
      .withColumn("share_micro", expr("CAST((w * 1000000) div wtot AS BIGINT)"))
      .select("source", "n_docs", "n_tokens", "mean_q_micro",
        "excess_micro", "factor_micro", "share_micro")
  }

  def doremiStepSql(eta: Long = DoremiEta): String =
    s"""WITH base AS (SELECT doc_id, source, ${graft.ops.TextStats.scoreSignalsDuck} FROM documents),
      scored AS (SELECT source, n_tokens,
            CAST(floor((${graft.ops.TextStats.scoreExprDuck}) * 1000000.0) AS BIGINT) AS q_micro
          FROM base),
      per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
            CAST(sum(q_micro) AS BIGINT) AS q_sum
          FROM scored GROUP BY source),
      per2 AS (SELECT *, CAST(q_sum // n_docs AS BIGINT) AS mean_q_micro FROM per),
      tot AS (SELECT CAST(CAST(SUM(q_sum) AS HUGEINT) // SUM(n_docs) AS BIGINT)
            AS corpus_mean_micro FROM per2),
      upd AS (SELECT per2.*,
            corpus_mean_micro - mean_q_micro AS excess_micro,
            GREATEST($DoremiFloorMicro, 1000000 + $eta * (corpus_mean_micro - mean_q_micro))
              AS factor_micro
          FROM per2, tot),
      w AS (SELECT *, CAST(n_tokens AS HUGEINT) * factor_micro AS w FROM upd),
      wt AS (SELECT SUM(w) AS wtot FROM w)
      SELECT source, n_docs, n_tokens, mean_q_micro,
        CAST(excess_micro AS BIGINT) AS excess_micro,
        CAST(factor_micro AS BIGINT) AS factor_micro,
        CAST((w * 1000000) // wtot AS BIGINT) AS share_micro
      FROM w, wt"""

  /** DoReMi-weighted source mix (q204): [[doremiStep]]'s updated mixture
    * actually DRIVING the q96 mixer — the composition the step exists
    * for. Each source's token share is `budget·share_micro DIV 1e6`
    * (the step's normalized integer share), filled greedily by the
    * shared q31 quality order. Upweighted (low-quality ≈ hard) domains
    * get more of the budget, exactly the DoReMi training mixture shape.
    *
    * Scale: the step's one source rollup + q96's ONE source-keyed
    * window; the weight table is source-cardinality and broadcasts. */
  def doremiWeightedMix(docs: DataFrame, budgetTokens: Long = MixBudgetTokens,
      eta: Long = DoremiEta): DataFrame = {
    // ONE quality fold feeds both the step's rollup and the fill window:
    // the checkpoint materializes narrow post-fold rows (no text), so the
    // corpus text scans once (measured 14.8 → 8.8 s at 100x)
    val scored = graft.ops.TextStats.scored(docs, Seq("source"))
      .withColumn("q_micro", expr("CAST(floor(score * 1000000.0) AS BIGINT)"))
      .select("doc_id", "source", "n_tokens", "score", "q_micro")
      .localCheckpoint()
    val wts = doremiStepFrom(scored, eta).select(col("source"), col("share_micro"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("score").desc, col("doc_id").asc)
    scored.join(broadcast(wts), "source")
      .withColumn("share_tokens", expr(s"($budgetTokens * share_micro) DIV 1000000"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(win))
      .filter(col("cum_tokens") <= col("share_tokens"))
      .select("doc_id", "source", "n_tokens", "cum_tokens", "share_tokens")
  }

  def doremiWeightedMixSql(budgetTokens: Long = MixBudgetTokens,
      eta: Long = DoremiEta): String =
    s"""WITH wts AS (SELECT source, share_micro FROM (${doremiStepSql(eta)})),
      base2 AS (SELECT doc_id, source, ${graft.ops.TextStats.scoreSignalsDuck} FROM documents),
      scored2 AS (SELECT doc_id, source, n_tokens,
          ${graft.ops.TextStats.scoreExprDuck} AS score
        FROM base2),
      c AS (SELECT s.doc_id, s.source, s.n_tokens,
          CAST(($budgetTokens * w.share_micro) // 1000000 AS BIGINT) AS share_tokens,
          CAST(SUM(s.n_tokens) OVER (PARTITION BY s.source ORDER BY s.score DESC, s.doc_id)
            AS BIGINT) AS cum_tokens
        FROM scored2 s JOIN wts w USING (source))
      SELECT doc_id, source, n_tokens, cum_tokens, share_tokens
      FROM c WHERE cum_tokens <= share_tokens"""

  /** Quality-curriculum phase plan (q220): split the corpus into three
    * training phases by quality tercile — phase 0 = top tercile (clean
    * text first), phase 2 = bottom (seen last, or dropped by trainers
    * that anneal) — and report each (phase, source) cell's doc and token
    * budget. Curriculum/annealing schedules (cleanest data late or
    * early, both are practiced) need exactly this table plus q137's
    * epoch order to become a loader plan.
    *
    * Tie-aware EXACT terciles without ranking docs: boundaries come from
    * cumulative counts over DISTINCT q_micro levels (the q195/q209
    * count-of-counts discipline) — b1 = min level with cum ≥ ceil(N/3),
    * b2 = min level with cum ≥ ceil(2N/3); every doc at a boundary level
    * gets that level's phase, so the split is deterministic under ties
    * (a row_number tercile would break ties arbitrarily AND global-sort
    * a doc-cardinality frame).
    *
    * Scale shape: reads the persisted scored artifact (no token fold);
    * the level rollup + its cumulative window run over DISTINCT-level
    * rows; boundaries collapse to a 1-row broadcast; phase assignment is
    * a stateless CASE; the final rollup is (3 × sources)-bounded. */
  def curriculumPhases(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val sc = TextStats.clfScoredPersisted(spark, dir)
      .select("doc_id", "source", "n_tokens", "q_micro")
    val levels = sc.groupBy("q_micro").agg(count(lit(1)).as("cnt"))
    val wCum = org.apache.spark.sql.expressions.Window.orderBy("q_micro")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val bounds = levels.withColumn("cum", sum("cnt").over(wCum))
      .crossJoin(broadcast(levels.agg(sum("cnt").as("n"))))
      .agg(
        min(when(expr("cum >= (n + 2) div 3"), col("q_micro"))).as("b1"),
        min(when(expr("cum >= (2 * n + 2) div 3"), col("q_micro"))).as("b2"))
    sc.crossJoin(broadcast(bounds))
      .withColumn("phase",
        when(col("q_micro") <= col("b1"), lit(2L))
          .when(col("q_micro") <= col("b2"), lit(1L)).otherwise(lit(0L)))
      .groupBy("phase", "source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
  }

  /** q220's oracle recomputes q31's q_micro from text (the artifact is
    * engine-internal; the hash compare gates identity). */
  val curriculumPhasesSql: String =
    s"""WITH sig AS (SELECT doc_id, source, ${TextStats.scoreSignalsDuck}
          FROM documents),
      sc AS (SELECT doc_id, source, n_tokens,
            CAST(floor((${TextStats.scoreExprDuck}) * 1000000.0) AS BIGINT) AS q_micro
          FROM sig),
      lv AS (SELECT q_micro, CAST(count(*) AS BIGINT) AS cnt FROM sc GROUP BY 1),
      cu AS (SELECT q_micro, SUM(cnt) OVER (ORDER BY q_micro) AS cum,
            (SELECT SUM(cnt) FROM lv) AS n FROM lv),
      b AS (SELECT MIN(CASE WHEN cum >= (n + 2) // 3 THEN q_micro END) AS b1,
            MIN(CASE WHEN cum >= (2 * n + 2) // 3 THEN q_micro END) AS b2 FROM cu)
      SELECT CASE WHEN sc.q_micro <= b.b1 THEN 2
                  WHEN sc.q_micro <= b.b2 THEN 1 ELSE 0 END AS phase,
        sc.source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(SUM(sc.n_tokens) AS BIGINT) AS n_tokens
      FROM sc CROSS JOIN b GROUP BY 1, 2"""

  /** Split-balance audit (q245): per (split × source), doc and token
    * counts plus the exact micro deviation of each source's within-split
    * share from its corpus share — the gate that says whether q38's hash
    * split is safe to EVALUATE on (a test split that over-represents one
    * source doesn't measure the mixture you trained; hash splits are
    * unbiased in expectation, and this measures the realized draw).
    * Deviation is |n_ss·N − n_s·N_split| cross-multiplied on DECIMAL —
    * the q211 shard-balance discipline applied to the eval split.
    *
    * Scale shape: ONE (split × source) rollup above the scan (the split
    * stamp is a stateless md5-prefix CASE); marginals are second aggs of
    * those rows, broadcast back; output is 3·sources rows. */
  def splitBalanceAudit(docs: DataFrame): DataFrame = {
    val cells = docs.select(col("source"),
        expr(splitCase("doc_id")).as("split"),
        expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_tok"))
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .localCheckpoint() // feeds both marginals AND the report
    val bySplit = cells.groupBy("split").agg(sum("n_docs").as("n_split"))
    val bySource = cells.groupBy("source").agg(sum("n_docs").as("n_source"))
    val total = cells.agg(sum("n_docs").as("n_all"))
    cells.join(broadcast(bySplit), "split")
      .join(broadcast(bySource), "source")
      .crossJoin(broadcast(total))
      .withColumn("dev_micro", expr(
        """CAST((abs(CAST(n_docs AS DECIMAL(38,0)) * n_all
           - CAST(n_source AS DECIMAL(38,0)) * n_split) * 1000000)
           div (CAST(n_split AS DECIMAL(38,0)) * n_all) AS BIGINT)"""))
      .select("split", "source", "n_docs", "n_tokens", "n_split", "n_source",
        "dev_micro")
  }

  def splitBalanceAuditSql: String =
    s"""WITH c AS (SELECT ${splitCaseDuck("doc_id")} AS split, source,
            CAST(count(*) AS BIGINT) AS n_docs,
            CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
          FROM documents GROUP BY 1, 2),
      sp AS (SELECT split, CAST(SUM(n_docs) AS BIGINT) AS n_split FROM c GROUP BY 1),
      so AS (SELECT source, CAST(SUM(n_docs) AS BIGINT) AS n_source FROM c GROUP BY 1),
      t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_all FROM c)
      SELECT c.split, c.source, c.n_docs, c.n_tokens, sp.n_split, so.n_source,
        CAST((abs(CAST(c.n_docs AS HUGEINT) * t.n_all
          - CAST(so.n_source AS HUGEINT) * sp.n_split) * 1000000)
          // (CAST(sp.n_split AS HUGEINT) * t.n_all) AS BIGINT) AS dev_micro
      FROM c JOIN sp USING (split) JOIN so USING (source) CROSS JOIN t"""

  // -------------------------------------------------------------------
  // q266: best-of-n selection card
  // -------------------------------------------------------------------

  /** Candidates per prompt in the best-of-n derivation. */
  val BonCandidates = 4

  /** q266: best-of-n (rejection-sampling) selection card — per source:
    * how much reward-model score a best-of-[[BonCandidates]] selector
    * gains over taking the first sample, and where the winning slot
    * lands. The derivation (the q93/q157 injection discipline — real
    * callers pass their own scored-candidate frames) plants
    * [[BonCandidates]] deterministic integer scores per document; a
    * selector that doesn't beat slot 0 by a clear margin means the
    * reward model is noise.
    *
    * Scale shape: scores are pure integer arithmetic in a stateless
    * projection (no candidate rows ever materialize — the argmax is a
    * CASE chain over [[BonCandidates]] columns), then ONE source-keyed
    * rollup; output is source-cardinality. */
  def bestOfN(docs: DataFrame): DataFrame = {
    val scored = docs
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_words"))
    val withScores = (0 until BonCandidates).foldLeft(scored) { (df, c) =>
      df.withColumn(s"s$c",
        expr(s"(doc_id * 37 + $c * 101 + n_words * ${c + 1}) % 1000"))
    }
    val bestExpr = (0 until BonCandidates).map(c => s"s$c").mkString("greatest(", ", ", ")")
    val slotExpr = (0 until BonCandidates)
      .map(c => s"WHEN s$c = best THEN $c")
      .mkString("CASE ", " ", " END")
    withScores
      .withColumn("best", expr(bestExpr))
      .withColumn("slot", expr(slotExpr))
      .groupBy("source")
      .agg(count(lit(1)).as("n_prompts"),
        sum("s0").as("base_sum"), sum("best").as("best_sum"),
        expr("CAST(count_if(slot = 0) AS BIGINT)").as("won0"),
        expr("CAST(count_if(slot = 1) AS BIGINT)").as("won1"),
        expr("CAST(count_if(slot = 2) AS BIGINT)").as("won2"),
        expr("CAST(count_if(slot = 3) AS BIGINT)").as("won3"))
      .withColumn("base_mean_milli", expr("(base_sum * 1000) div n_prompts"))
      .withColumn("best_mean_milli", expr("(best_sum * 1000) div n_prompts"))
      .withColumn("gain_milli", col("best_mean_milli") - col("base_mean_milli"))
      .drop("base_sum", "best_sum")
  }

  lazy val bestOfNSql: String = {
    val scoreCols = (0 until BonCandidates)
      .map(c => s"(doc_id * 37 + $c * 101 + n_words * ${c + 1}) % 1000 AS s$c")
      .mkString(",\n            ")
    val bestExpr = (0 until BonCandidates).map(c => s"s$c").mkString("greatest(", ", ", ")")
    val slotExpr = (0 until BonCandidates)
      .map(c => s"WHEN s$c = best THEN $c")
      .mkString("CASE ", " ", " END")
    s"""WITH sc AS (
          SELECT doc_id, source, $scoreCols
          FROM (SELECT doc_id, source,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
                FROM documents)),
      b AS (SELECT *, $bestExpr AS best FROM sc),
      sl AS (SELECT *, $slotExpr AS slot FROM b)
      SELECT source, CAST(count(*) AS BIGINT) AS n_prompts,
        CAST(count(*) FILTER (WHERE slot = 0) AS BIGINT) AS won0,
        CAST(count(*) FILTER (WHERE slot = 1) AS BIGINT) AS won1,
        CAST(count(*) FILTER (WHERE slot = 2) AS BIGINT) AS won2,
        CAST(count(*) FILTER (WHERE slot = 3) AS BIGINT) AS won3,
        CAST((SUM(s0) * 1000) // count(*) AS BIGINT) AS base_mean_milli,
        CAST((SUM(best) * 1000) // count(*) AS BIGINT) AS best_mean_milli,
        CAST((SUM(best) * 1000) // count(*) AS BIGINT)
          - CAST((SUM(s0) * 1000) // count(*) AS BIGINT) AS gain_milli
      FROM sl GROUP BY source"""
  }

  lazy val queries: Seq[QueryDef] = Seq(
    QueryDef("q245_split_balance",
      (s, d) => splitBalanceAudit(t(s, d, "documents")),
      Some(splitBalanceAuditSql)),

    QueryDef("q220_curriculum_phases",
      (s, d) => curriculumPhases(s, d),
      Some(curriculumPhasesSql)),

    QueryDef("q198_doremi_step",
      (s, d) => doremiStep(t(s, d, "documents")),
      Some(doremiStepSql())),

    QueryDef("q204_doremi_mix",
      (s, d) => doremiWeightedMix(t(s, d, "documents")),
      Some(doremiWeightedMixSql())),

    QueryDef("q101_shuffle_assign",
      (s, d) => shuffleAssign(t(s, d, "documents")),
      Some(shuffleAssignSql())),

    QueryDef("q211_shard_balance",
      (s, d) => shardBalanceAudit(t(s, d, "documents")),
      Some(shardBalanceAuditSql)),

    QueryDef("q135_unimax_alloc",
      (s, d) => unimaxAlloc(s, d),
      Some(unimaxAllocSql())),

    QueryDef("q194_neyman_alloc",
      (s, d) => neymanAlloc(s, d),
      Some(neymanAllocSql())),

    QueryDef("q147_length_matched_sample",
      (s, d) => lengthMatchedSample(s, d),
      Some(lengthMatchedSampleSql())),

    QueryDef("q137_epoch_order",
      (s, d) => epochOrder(t(s, d, "documents"), weight = srcNameWeight),
      Some(epochOrderSql())),

    QueryDef("q96_source_mix",
      (s, d) => sourceMix(t(s, d, "documents"), weight = srcNameWeight),
      Some(sourceMixSql())),

    // r12: the source_mix TVF's own hash gate — unit weight, explicit
    // budget, reached purely through SQL (the q281 discipline for the
    // multi-arg TVF family).
    QueryDef("q309_source_mix_tvf",
      (s, d) => s.sql(
        s"SELECT * FROM source_mix('$d/documents.parquet', $MixBudgetTokens)"),
      Some(sourceMixUnitSql())),

    QueryDef("q156_temperature_mix",
      (s, d) => temperatureMix(t(s, d, "documents")),
      Some(temperatureMixSql())),

    QueryDef("q160_length_trim",
      (s, d) => lengthTrim(t(s, d, "documents")),
      Some(lengthTrimSql())),

    QueryDef("q102_source_mix_epochs",
      (s, d) => sourceMixEpochs(t(s, d, "documents"), weight = srcNameWeight),
      Some(sourceMixEpochsSql())),

    QueryDef("q185_token_exposure",
      (s, d) => tokenExposure(t(s, d, "documents"), weight = srcNameWeight),
      Some(tokenExposureSql())),

    QueryDef("q103_filter_funnel",
      (s, d) => filterFunnel(t(s, d, "documents")),
      Some(filterFunnelSql)),

    QueryDef("q87_weighted_sample",
      (s, d) => weightedSample(t(s, d, "documents")),
      Some(weightedSampleSql())),

    QueryDef("q68_stratified_sample",
      (s, d) => stratifiedSample(t(s, d, "documents"), 25),
      Some(stratifiedSampleSql(25))),

    QueryDef("q37_sample_hash",
      (s, d) => hashSample(t(s, d, "documents"), 6554), // ~10%
      Some(hashSampleSql(6554))),

    QueryDef("q38_train_split",
      (s, d) => hashSplit(t(s, d, "documents")),
      Some(hashSplitSql)),

    QueryDef("q39_quality_filter",
      (s, d) => qualityFilter(t(s, d, "documents")),
      Some(qualityFilterSql())),

    QueryDef("q266_best_of_n",
      (s, d) => bestOfN(t(s, d, "documents")),
      Some(bestOfNSql)),

    QueryDef("q274_pass_at_k",
      (s, d) => passAtK(t(s, d, "documents")),
      Some(passAtKSql))
  )

  // -------------------------------------------------------------------
  // q274: pass@k estimator
  // -------------------------------------------------------------------

  /** Attempts per problem and the k values reported. */
  val PakAttempts = 8
  val PakKs = Seq(1, 2, 4)

  /** q274: unbiased pass@k (Chen et al. 2021's estimator,
    * 1 − C(n−c,k)/C(n,k)) per source from [[PakAttempts]] planted
    * attempt outcomes per problem — the eval-harness aggregation an
    * LLM benchmark run needs. The estimator is EXACT here: the falling
    * products perm(n−c,k)/perm(n,k) are small-integer ratios, so
    * pass@k lands in micro fixed-point with no floating point at all
    * (a zero factor makes perm(n−c,k) vanish whenever n−c < k, which
    * is precisely the always-pass case).
    *
    * Scale shape: attempt outcomes never materialize as rows — c is a
    * higher-order `aggregate` over a constant 8-element sequence in a
    * stateless projection; then ONE source rollup. */
  def passAtK(docs: DataFrame): DataFrame = {
    val n = PakAttempts
    def perm(a: String, k: Int): String =
      (0 until k).map(i => s"($a - $i)").mkString(" * ")
    def permN(k: Int): Long = (0 until k).map(i => (n - i).toLong).product
    // c as an explicit codegen'd sum — the higher-order `aggregate`
    // alternative runs INTERPRETED and re-evaluates the split lambda
    // per element (measured 10.4 s vs 2.0 s at 100x for this stage)
    val cSum = (0 until n)
      .map(i => s"(CASE WHEN (doc_id * 31 + ${i * 17} + n_words) % 100 < thr THEN 1L ELSE 0L END)")
      .mkString(" + ")
    val scored = docs
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_words"))
      .withColumn("thr", expr("20L + doc_id % 60"))
      .withColumn("c", expr(cSum))
    val withPass = PakKs.foldLeft(scored) { (df, k) =>
      df.withColumn(s"pass$k", expr(
        s"1000000L - ((${perm(s"(${n}L - c)", k)}) * 1000000L) div ${permN(k)}L"))
    }
    val aggs = expr(s"(sum(c) * 1000000) div (count(*) * $n)").as("mean_c_micro") +:
      PakKs.map(k => expr(s"sum(pass$k) div count(*)").as(s"pass${k}_micro"))
    withPass.groupBy("source")
      .agg(count(lit(1)).as("n_problems"), aggs: _*)
  }

  lazy val passAtKSql: String = {
    val n = PakAttempts
    def perm(a: String, k: Int): String =
      (0 until k).map(i => s"($a - $i)").mkString(" * ")
    def permN(k: Int): Long = (0 until k).map(i => (n - i).toLong).product
    val passCols = PakKs.map(k =>
      s"1000000 - ((${perm(s"($n - c)", k)}) * 1000000) // ${permN(k)} AS pass$k").mkString(",\n            ")
    val aggs = PakKs.map(k =>
      s"CAST(SUM(pass$k) // count(*) AS BIGINT) AS pass${k}_micro").mkString(",\n        ")
    s"""WITH sc AS (
          SELECT doc_id, source,
            list_sum(list_transform(range(0, $n), i ->
              CASE WHEN (doc_id * 31 + i * 17 + n_words) % 100 < thr
              THEN 1 ELSE 0 END)) AS c
          FROM (SELECT doc_id, source, 20 + doc_id % 60 AS thr,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
                FROM documents)),
      pk AS (SELECT source, c,
            $passCols
          FROM sc)
      SELECT source, CAST(count(*) AS BIGINT) AS n_problems,
        CAST((SUM(c) * 1000000) // (count(*) * $n) AS BIGINT) AS mean_c_micro,
        $aggs
      FROM pk GROUP BY source"""
  }

}
