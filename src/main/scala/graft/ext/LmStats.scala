package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** N-gram language-model corpus statistics — the diagnostics a
  * tokenizer/LM training pipeline reads off its corpus before (and
  * after) filtering: Kneser–Ney continuation diversity, the Zipf
  * rank-frequency curve, tokenizer fertility, and reference-vocabulary
  * OOV coverage.
  *
  * Exactness discipline: everything is counting, integer ppm ratios,
  * or base-2 logarithms taken as `length(bin(x)) - 1` — the floor-log2
  * both engines compute identically from the binary string rendering
  * (no float log anywhere). Token classes reuse the corpus-wide
  * disciplines: whitespace tokens ([[TextAnalysis.tokens]]) and the
  * BPE-ish pre-tokenizer regex from `text_bpe_tokens`.
  *
  * 100 TB shape: bigram extraction is the codegen'd `zip_with` over
  * each document's token array (no posexplode self-join); every count
  * is a map-side-combining aggregate on a token or pair key; the
  * Zipf rank rides the distributed two-phase rank
  * (`Offsets.globalPosition` — no single-partition window over the
  * vocabulary) and only the ~log2(V) power-of-two sample points reach
  * the bounded final window; the OOV reference vocabulary is a
  * TakeOrdered k-row table broadcast to the probe side.
  */
object LmStats {

  /** Per-word Kneser–Ney continuation statistics over `docs(text)`:
    * (w, n_w, left_types, right_types, cont_ppm) for the top `k` words
    * by left-context diversity. `left_types` = |{w1 : (w1,w) seen}| is
    * the numerator of the KN continuation probability
    * P_cont(w) = N1+(•w) / |distinct bigram types|, emitted as
    * `cont_ppm` (integer ppm). Words never seen as a bigram
    * continuation (document-initial only) carry 0s via the left joins.
    */
  def knContinuation(docs: DataFrame, k: Int): DataFrame = {
    val toks = docs.select(TextAnalysis.tokens(col("text")).as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    val pairs = toks
      .where(size(col("toks")) >= 2)
      .select(explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .distinct()
    val nTypes = pairs.agg(count(lit(1)).as("n_types"))
    val leftDiv = pairs.groupBy(col("w2").as("w"))
      .agg(count(lit(1)).as("left_types"))
    val rightDiv = pairs.groupBy(col("w1").as("w"))
      .agg(count(lit(1)).as("right_types"))
    uni
      .join(leftDiv, Seq("w"), "left")
      .join(rightDiv, Seq("w"), "left")
      .crossJoin(broadcast(nTypes))
      .select(col("w"), col("n_w"),
        coalesce(col("left_types"), lit(0L)).as("left_types"),
        coalesce(col("right_types"), lit(0L)).as("right_types"),
        expr("coalesce(left_types, 0L) * 1000000 div greatest(n_types, 1L)")
          .as("cont_ppm"))
      .orderBy(col("left_types").desc, col("w"))
      .limit(k)
  }

  /** The Zipf rank-frequency curve sampled at power-of-two ranks:
    * (bucket, rank_at, freq_at, fbits, decay_milli) where
    * `bucket = log2(rank)`, `fbits = floor(log2(freq))`, and
    * `decay_milli` = bits of frequency lost per rank doubling ×1000
    * (≈1000 for a textbook Zipf slope of −1). The rank is the
    * distributed two-phase rank; the power-of-two filter
    * (`rank & (rank−1) = 0`) leaves ≤ log2(V)+1 rows, so the final
    * lag window runs over a bounded table.
    */
  def zipfBitlogCurve(docs: DataFrame): DataFrame = {
    val uni = docs.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val ranked = graft.ops.Offsets.globalPosition(
      uni, Seq(col("n").desc, col("w")), "pos")
    val sampled = ranked
      .select((col("pos") + 1L).as("rank_at"), col("n").as("freq_at"))
      .where(expr("(rank_at & (rank_at - 1)) = 0"))
      .select(
        (length(bin(col("rank_at"))) - 1).cast("long").as("bucket"),
        col("rank_at"), col("freq_at"),
        (length(bin(col("freq_at"))) - 1).cast("long").as("fbits"))
    val w = Window.orderBy(col("bucket"))
    sampled.select(col("bucket"), col("rank_at"), col("freq_at"),
      col("fbits"),
      ((lag(col("fbits"), 1).over(w) - col("fbits")) * 1000L)
        .as("decay_milli"))
  }

  /** Heaps-law vocabulary growth curve (round 13): distinct word types
    * as a function of corpus prefix size, sampled at powers of two of
    * the doc-id order — the "will the vocabulary saturate" readout
    * behind tokenizer sizing (the measured companion of the BPE
    * trainer's Heaps-sublinearity claim). Each type contributes its
    * FIRST document (one min-aggregate on the word key), buckets by
    * floor-log2 of that first doc, and the cumulative sum runs over the
    * ≤ log2(D) bucket rows — corpus-linear with a log-bounded final
    * window, the lm_zipf_bitlog shape.
    */
  def vocabGrowthHeaps(docs: DataFrame): DataFrame = {
    val first = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(min(col("doc_id")).as("first_doc"))
    val buckets = first
      .select(expr("CAST(length(bin(first_doc + 1)) - 1 AS BIGINT)").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_types"))
    buckets
      .select(col("bucket"), col("new_types"),
        sum(col("new_types")).over(Window.orderBy(col("bucket"))).as("vocab_size"))
  }

  /** Heaps-law exponent fit over the [[vocabGrowthHeaps]] curve: ONE
    * row (n_points, slope_mb_per_doubling, intercept_mb) from an
    * integer least-squares fit of mlog2(vocab_size) against the
    * doubling bucket — the measured β (×1000: slope 500 ⇒ V ∝ N^0.5)
    * behind every "the tokenizer exchange rides a Heaps-sublinear
    * vocabulary" claim in this codebase. All sums are exact integers;
    * slope then intercept each take one truncating division (both
    * engines truncate toward zero), so the oracle replays the fit bit
    * for bit. The fold runs over ≤ log2(D) bucket rows — nothing
    * data-sized past the probed growth chain.
    */
  def heapsExponent(docs: DataFrame): DataFrame =
    vocabGrowthHeaps(docs)
      .select(col("bucket").as("x"),
        NbFilter.mlog2("vocab_size").cast("long").as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
      .select(col("n"), col("sx"), col("sy"),
        expr("(n * sxy - sx * sy) div greatest(n * sxx - sx * sx, 1L)")
          .as("slope_mb"))
      .select(col("n").as("n_points"),
        col("slope_mb").as("slope_mb_per_doubling"),
        expr("(sy - slope_mb * sx) div n").as("intercept_mb"))

  /** Per-language tokenizer fertility: whitespace words vs BPE-ish
    * pre-tokens (the `text_bpe_tokens` regex), fertility in ppm
    * (subword tokens per word ×10⁶) — the "how many pieces does the
    * tokenizer cut a word into" readout that decides vocabulary size.
    */
  /** Per-language (n_docs, n_words, n_subwords) — one stateless
    * projection + keyed aggregate, so it runs unchanged as a
    * complete-mode streaming aggregation (streaming_fertility). */
  def fertilityCounts(docs: DataFrame): DataFrame = {
    val bpePat = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
    docs
      .select(col("lang"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_words"),
        size(regexp_extract_all(col("text"), lit(bpePat), lit(0)))
          .cast("long").as("n_sub"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_sub")).as("n_subwords"))
  }

  /** ppm finisher over the per-language counts. */
  def fertilityFinish(counts: DataFrame): DataFrame =
    counts.select(col("lang"), col("n_docs"), col("n_words"),
      col("n_subwords"),
      expr("n_subwords * 1000000 div greatest(n_words, 1L)")
        .as("fertility_ppm"))

  def tokenizerFertility(docs: DataFrame): DataFrame =
    fertilityFinish(fertilityCounts(docs))

  /** The top-`v` reference vocabulary of `docs` (freq desc, word asc
    * ties): (w, in_vocab = 1). v-row table, broadcast by callers. */
  def refVocab(docs: DataFrame, v: Int): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(v)
      .select(col("w"), lit(1L).as("in_vocab"))

  /** Per-source (n_tokens, n_oov) over a `(source, w)` token table —
    * a plain keyed aggregate after the broadcast vocab probe, so it
    * runs unchanged as a complete-mode STREAMING aggregation
    * (the streaming_oov_monitor face). */
  def oovCounts(tok: DataFrame, vocab: DataFrame): DataFrame =
    tok.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))

  /** ppm finisher over the per-source counts. */
  def oovFinish(counts: DataFrame): DataFrame =
    counts.select(col("source"), col("n_tokens"), col("n_oov"),
      expr("n_oov * 1000000 div greatest(n_tokens, 1L)").as("oov_ppm"))

  /** Out-of-vocabulary coverage per source against a top-`v` corpus
    * vocabulary: (source, n_tokens, n_oov, oov_ppm). The v-row
    * vocabulary broadcasts to the token stream — the fixed-vocab
    * coverage audit run before committing a tokenizer.
    */
  def oovCoverage(docs: DataFrame, v: Int): DataFrame =
    oovFinish(oovCounts(
      docs.select(col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("w")),
      refVocab(docs, v)))

  /** Vocabulary drift between two corpus snapshots (even vs odd doc_id
    * halves — the stand-in for yesterday's crawl vs today's): per-token
    * Jensen–Shannon divergence terms over the top-`k` tokens by pooled
    * count. Shares [[graft.ext.Drift]]'s exactness discipline: ppm
    * share smoothing (`greatest(share, 1)`), ONE rounded float per ROW
    * (the consumer sums; Σ bounded by ln 2), totals as a 1-row
    * broadcast. The token-count table is vocabulary-sized; the top-k
    * cut is a TakeOrdered, so nothing data-sized reaches a window.
    */
  def vocabDriftJs(docs: DataFrame, k: Int): DataFrame =
    vocabDriftFinish(vocabDriftCounts(
      docs.select((col("doc_id") % 2 === 0).as("is_a"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))), k)

  /** Per-token side counts over an `(is_a, w)` token table — a plain
    * keyed aggregate, so it runs unchanged as a complete-mode STREAMING
    * aggregation (the `streaming_vocab_drift` face); state is one row
    * per vocabulary token. */
  def vocabDriftCounts(tok: DataFrame): DataFrame =
    tok.groupBy(col("w"))
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("is_a"), 0L).otherwise(1L)).as("n_b"))

  /** Top-`k` + JS-term finisher over the per-token counts. */
  def vocabDriftFinish(counts: DataFrame, k: Int): DataFrame = {
    val tot = counts.agg(sum(col("n_a")).as("t_a"), sum(col("n_b")).as("t_b"))
    counts
      .orderBy((col("n_a") + col("n_b")).desc, col("w")).limit(k)
      .crossJoin(broadcast(tot))
      .withColumn("sa", expr("greatest(n_a * 1000000 div t_a, 1L)"))
      .withColumn("sb", expr("greatest(n_b * 1000000 div t_b, 1L)"))
      .select(col("w"), col("n_a"), col("n_b"),
        round(
          col("sa").cast("double") / 2e6 *
            log(lit(2.0) * col("sa").cast("double") /
              (col("sa") + col("sb")).cast("double")) +
          col("sb").cast("double") / 2e6 *
            log(lit(2.0) * col("sb").cast("double") /
              (col("sa") + col("sb")).cast("double")), 6).as("js_term"))
  }

  /** Token burstiness (Church & Gale 1995 adaptation): of the documents
    * a token COULD repeat in, how often does it? (tf, df, repeat_ppm =
    * (tf − df)/tf) for the top-`k` tokens by tf — bursty tokens
    * (repeat-heavy) are topical; spread tokens are function words. One
    * (doc, token)-keyed aggregate folded into a token-keyed aggregate,
    * both map-side combining; top-k is a TakeOrdered.
    */
  def corpusBurstiness(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("n"))
      .groupBy(col("w"))
      .agg(sum(col("n")).as("tf"), count(lit(1)).as("df"))
      .select(col("w"), col("tf"), col("df"),
        expr("(tf - df) * 1000000 div greatest(tf, 1L)").as("repeat_ppm"))
      .orderBy(col("tf").desc, col("w")).limit(k)

  val queries: Map[String, Q] = Map(
    "lm_kn_continuation" -> ((s, dir) =>
      knContinuation(Tables.documents(s, dir), k = 50)),
    "vocab_drift_js" -> ((s, dir) =>
      vocabDriftJs(Tables.documents(s, dir), k = 64)),
    "corpus_burstiness" -> ((s, dir) =>
      corpusBurstiness(Tables.documents(s, dir), k = 100)),
    "lm_zipf_bitlog" -> ((s, dir) =>
      zipfBitlogCurve(Tables.documents(s, dir))),
    "tokenizer_fertility" -> ((s, dir) =>
      tokenizerFertility(Tables.documents(s, dir))),
    "lm_oov_coverage" -> ((s, dir) =>
      oovCoverage(Tables.documents(s, dir), v = 30)),
    "vocab_growth_heaps" -> ((s, dir) =>
      vocabGrowthHeaps(Tables.documents(s, dir))),
    "vocab_heaps_exponent" -> ((s, dir) =>
      heapsExponent(Tables.documents(s, dir)))
  )

  val oracleSql: Map[String, String] = Map(
    "vocab_growth_heaps" ->
      """WITH f AS (
        |  SELECT w, min(doc_id) AS first_doc FROM (
        |    SELECT doc_id,
        |      unnest(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS w
        |    FROM documents)
        |  GROUP BY w),
        |b AS (
        |  SELECT CAST(length(bin(first_doc + 1)) - 1 AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS new_types
        |  FROM f GROUP BY 1)
        |SELECT bucket, new_types,
        |  CAST(SUM(new_types) OVER (ORDER BY bucket) AS BIGINT) AS vocab_size
        |FROM b""".stripMargin,
    "vocab_heaps_exponent" ->
      s"""WITH f AS (
         |  SELECT w, min(doc_id) AS first_doc FROM (
         |    SELECT doc_id,
         |      unnest(list_filter(string_split_regex(text, '\\s+'), x -> x != '')) AS w
         |    FROM documents)
         |  GROUP BY w),
         |b AS (
         |  SELECT CAST(length(bin(first_doc + 1)) - 1 AS BIGINT) AS bucket,
         |    CAST(count(*) AS BIGINT) AS new_types
         |  FROM f GROUP BY 1),
         |g AS (
         |  SELECT bucket,
         |    CAST(SUM(new_types) OVER (ORDER BY bucket) AS BIGINT) AS vocab_size
         |  FROM b),
         |p AS (
         |  SELECT bucket AS x,
         |    CAST(${NbFilter.mlog2DuckSql("vocab_size")} AS BIGINT) AS y
         |  FROM g),
         |s AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx
         |  FROM p),
         |sl AS (
         |  SELECT n, sx, sy,
         |    (n * sxy - sx * sy) // greatest(n * sxx - sx * sx, 1) AS slope
         |  FROM s)
         |SELECT n AS n_points, CAST(slope AS BIGINT) AS slope_mb_per_doubling,
         |  CAST((sy - slope * sx) // n AS BIGINT) AS intercept_mb
         |FROM sl""".stripMargin,
    "vocab_drift_js" ->
      """WITH tk AS (
        |  SELECT doc_id % 2 = 0 AS is_a,
        |    unnest(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS w
        |  FROM documents),
        |c AS (
        |  SELECT w,
        |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
        |  FROM tk GROUP BY w),
        |t AS (SELECT CAST(sum(n_a) AS BIGINT) AS t_a,
        |        CAST(sum(n_b) AS BIGINT) AS t_b FROM c),
        |top AS (
        |  SELECT w, n_a, n_b FROM c
        |  ORDER BY n_a + n_b DESC, w LIMIT 64),
        |s AS (
        |  SELECT w, n_a, n_b,
        |    greatest(n_a * 1000000 // t_a, 1) AS sa,
        |    greatest(n_b * 1000000 // t_b, 1) AS sb
        |  FROM top, t)
        |SELECT w, n_a, n_b,
        |  round(CAST(sa AS DOUBLE) / 2e6 *
        |      ln(2.0 * CAST(sa AS DOUBLE) / CAST(sa + sb AS DOUBLE)) +
        |    CAST(sb AS DOUBLE) / 2e6 *
        |      ln(2.0 * CAST(sb AS DOUBLE) / CAST(sa + sb AS DOUBLE)), 6) AS js_term
        |FROM s""".stripMargin,

    "corpus_burstiness" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS w
        |  FROM documents),
        |dw AS (SELECT doc_id, w, count(*) AS n FROM tk GROUP BY doc_id, w),
        |c AS (
        |  SELECT w, CAST(sum(n) AS BIGINT) AS tf, CAST(count(*) AS BIGINT) AS df
        |  FROM dw GROUP BY w)
        |SELECT w, tf, df,
        |  (tf - df) * 1000000 // greatest(tf, 1) AS repeat_ppm
        |FROM c
        |ORDER BY tf DESC, w LIMIT 100""".stripMargin,

    "lm_kn_continuation" ->
      """WITH tk AS (
        |  SELECT list_filter(string_split_regex(text, '\s+'), x -> x != '') AS toks
        |  FROM documents),
        |uni AS (
        |  SELECT w, count(*) AS n_w
        |  FROM (SELECT unnest(toks) AS w FROM tk) GROUP BY w),
        |pairs AS (
        |  SELECT DISTINCT toks[t.i] AS w1, toks[t.i + 1] AS w2
        |  FROM tk, UNNEST(generate_series(1, len(toks) - 1)) AS t(i)
        |  WHERE len(toks) >= 2),
        |ntypes AS (SELECT count(*) AS n_types FROM pairs),
        |ld AS (SELECT w2 AS w, count(*) AS left_types FROM pairs GROUP BY w2),
        |rd AS (SELECT w1 AS w, count(*) AS right_types FROM pairs GROUP BY w1)
        |SELECT uni.w, uni.n_w,
        |  coalesce(ld.left_types, 0) AS left_types,
        |  coalesce(rd.right_types, 0) AS right_types,
        |  coalesce(ld.left_types, 0) * 1000000 // greatest(ntypes.n_types, 1)
        |    AS cont_ppm
        |FROM uni
        |LEFT JOIN ld ON ld.w = uni.w
        |LEFT JOIN rd ON rd.w = uni.w
        |CROSS JOIN ntypes
        |ORDER BY coalesce(ld.left_types, 0) DESC, uni.w
        |LIMIT 50""".stripMargin,
    "lm_zipf_bitlog" ->
      """WITH tk AS (
        |  SELECT list_filter(string_split_regex(text, '\s+'), x -> x != '') AS toks
        |  FROM documents),
        |uni AS (
        |  SELECT w, count(*) AS n
        |  FROM (SELECT unnest(toks) AS w FROM tk) GROUP BY w),
        |ranked AS (
        |  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rank_at
        |  FROM uni),
        |sampled AS (
        |  SELECT CAST(length(bin(rank_at)) - 1 AS BIGINT) AS bucket,
        |    rank_at, n AS freq_at,
        |    CAST(length(bin(n)) - 1 AS BIGINT) AS fbits
        |  FROM ranked WHERE (rank_at & (rank_at - 1)) = 0)
        |SELECT bucket, rank_at, freq_at, fbits,
        |  (lag(fbits, 1) OVER (ORDER BY bucket) - fbits) * 1000 AS decay_milli
        |FROM sampled""".stripMargin,
    "tokenizer_fertility" ->
      """WITH d AS (
        |  SELECT lang,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS BIGINT) AS n_words,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_sub
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_words) AS BIGINT) AS n_words,
        |  CAST(sum(n_sub) AS BIGINT) AS n_subwords,
        |  CAST(sum(n_sub) AS BIGINT) * 1000000
        |    // greatest(CAST(sum(n_words) AS BIGINT), 1) AS fertility_ppm
        |FROM d GROUP BY lang""".stripMargin,
    "lm_oov_coverage" ->
      """WITH tok AS (
        |  SELECT source, unnest(list_filter(string_split_regex(text, '\s+'),
        |    x -> x != '')) AS w
        |  FROM documents),
        |vocab AS (
        |  SELECT w FROM (
        |    SELECT w, ROW_NUMBER() OVER (ORDER BY count(*) DESC, w) AS r
        |    FROM tok GROUP BY w) WHERE r <= 30)
        |SELECT source, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(sum(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // greatest(count(*), 1) AS oov_ppm
        |FROM tok LEFT JOIN vocab ON vocab.w = tok.w
        |GROUP BY source""".stripMargin
  )
}
