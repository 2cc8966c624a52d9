package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-quality operators a training-data pipeline runs before anything
  * else sees the text: repetition scoring (the Gopher-style "is this
  * document mostly one phrase repeated" filters), benchmark
  * decontamination (drop training docs sharing long n-grams with an
  * evaluation set), and per-document term weighting (TF-IDF ranking).
  *
  * All three are groupBy/join programs keyed on doc_id / term — map-side
  * combined aggregates over an exploded token stream, never a window over
  * everything and never a UDF. The token stream is `size(text)`-bounded,
  * so at 100 TB each operator is one or two shuffles whose rows are
  * (id, token) pairs, not documents.
  */
object Quality {

  private def toks: Column = TextAnalysis.tokens(col("text"))

  /** Adjacent-token bigrams in document order (NOT distinct — repetition
    * scoring needs multiplicity, unlike the dedup shingles). Guarded:
    * `sequence(1, 0)` would count DOWN, not produce an empty array.
    */
  private def bigrams(t: Column): Column =
    when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => concat(element_at(t, i), lit(" "), element_at(t, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** The unigram half of the repetition profile — factored out because
    * [[Curate]]'s quality gate needs ONLY these columns, and joining the
    * full profile would drag the bigram explode/aggregate pass along
    * (Catalyst cannot eliminate an outer join to an aggregate).
    */
  def unigramProfile(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(toks).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_uniq_tokens"),
        max(col("c")).as("top_unigram_count"))

  /** Word-level repetition profile: most-frequent unigram/bigram counts
    * and the repeated-mass fractions the Gopher filters threshold on.
    * Two explode→count→max chains, both keyed on doc_id.
    *
    * The token array is MATERIALIZED in its own projection before the
    * bigram lambda touches it: Spark's subexpression elimination does
    * not reach inside higher-order-function lambdas, so
    * `bigrams(tokens(text))` would re-run the regex tokenizer for every
    * `element_at` — O(tokens²) regex splits per document (measured as
    * the whole cost of the bigram pass at sf0.1).
    */
  def repetitionProfile(docs: DataFrame): DataFrame = {
    val uni = unigramProfile(docs)
    val tok = docs.select(col("doc_id"), toks.as("t"))
    val bi = tok.select(col("doc_id"), explode(bigrams(col("t"))).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(
        sum(col("c")).as("n_bigrams"),
        max(col("c")).as("top_bigram_count"))
    uni.join(bi, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_uniq_tokens"),
        col("top_unigram_count"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("top_bigram_count"), lit(0L)).as("top_bigram_count"),
        round((col("n_tokens") - col("n_uniq_tokens")) / col("n_tokens"), 6)
          .as("rep_unigram_frac"),
        when(coalesce(col("n_bigrams"), lit(0L)) > 0,
          round(col("top_bigram_count") / col("n_bigrams"), 6))
          .otherwise(lit(0.0)).as("rep_bigram_frac"))
  }

  /** Benchmark decontamination (the GPT-3 appendix-C procedure): the
    * rows matching `evalSide` are the held-out evaluation set; every
    * TRAINING doc sharing at least one word-`n`-gram with it is reported
    * with its overlap count. At 100 TB the eval side is tiny by
    * construction — the broadcast is the right plan, and the training
    * side never shuffles anything wider than (doc_id, shingle).
    */
  def decontaminationReport(docs: DataFrame, evalSide: Column, n: Int = 8): DataFrame = {
    val shn = graft.functions.WordShingles.wordShingles(col("text"), n)
    val benchGrams = docs.filter(evalSide)
      .select(explode(shn).as("shingle")).distinct()
    docs.filter(!evalSide)
      .select(col("doc_id"), explode(shn).as("shingle"))
      .join(broadcast(benchGrams), "shingle")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap_ngrams"))
  }

  /** Per-doc TF-IDF term ranking, integers only: rank by (tf desc,
    * df asc, term asc) — the idf ORDER without the float logarithm, so
    * the oracle can reproduce it bit-exactly. Top-k per doc goes
    * through the partial/final TopKPerKey operator: ≤ k·partitions
    * rows per doc reach the shuffle regardless of vocabulary size.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(toks).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // pinParallelism: this final stage is many-keys (every doc) ×
    // narrow rows, the shape where AQE's byte-based coalescing
    // serializes a CPU-bound heap merge (measured at the 10x probe:
    // 1-2 partitions, ratio 2.18 → pinned 1.58; all other stages flat)
    graft.plans.TopKPerKey.topKPerKey(tf.join(df, "term"),
        Seq("doc_id"), Seq(("tf", true), ("df", false), ("term", false)), k,
        pinParallelism = true)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"))
  }

  /** Corpus-LM novelty signals — the integer core of n-gram-LM data
    * selection (the "how surprising is this document to a model of the
    * corpus" filter, cf. importance-resampling selection à la DSIR):
    * per doc, the total corpus frequency mass of its bigrams and the
    * count of bigrams occurring nowhere else. A float LM would take
    * log-probabilities here; the integer masses rank documents by the
    * same signal (monotone transforms) and stay oracle-exact. One
    * bigram-keyed aggregate for the corpus counts, one join back on
    * the bigram key, one doc-keyed aggregate — all map-side combined.
    */
  def bigramNovelty(docs: DataFrame): DataFrame = {
    // persisted: referenced by both the corpus-count aggregate and the
    // join back — without the cache each branch re-runs the explode +
    // first aggregate (harnesses clearCache() per query). Token array
    // materialized first — see repetitionProfile on lambda re-evaluation.
    val bg = docs.select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), explode(bigrams(col("t"))).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpus = bg.groupBy(col("bg")).agg(sum(col("c")).as("corpus_c"))
    bg.join(corpus, "bg")
      .groupBy(col("doc_id")).agg(
        sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("distinct_bigrams"),
        sum(col("c") * col("corpus_c")).as("bg_mass"),
        sum(when(col("corpus_c") === col("c"), col("c")).otherwise(lit(0L)))
          .as("novel_bigrams"))
  }

  val queries: Map[String, Q] = Map(
    "quality_repetition" -> ((s, dir) =>
      repetitionProfile(Tables.documents(s, dir))),

    "lm_bigram_novelty" -> ((s, dir) =>
      bigramNovelty(Tables.documents(s, dir))),

    // the ~10% md5-bucket split doubles as the held-out benchmark here
    "decontaminate_ngrams" -> ((s, dir) =>
      decontaminationReport(Tables.documents(s, dir),
        Sampling.hashBucket(col("doc_id")) < 6554)),

    "tfidf_top_terms" -> ((s, dir) =>
      tfidfTopTerms(Tables.documents(s, dir), 3)),

    // Gopher-style rule filter (Rae et al. 2021, §A1.1)
    "quality_gopher_rules" -> ((s, dir) =>
      gopherRules(Tables.documents(s, dir))),

    // per-source pass-rate scoreboard over the same flags — "which
    // source is garbage" is the question the rule filter exists for
    "quality_gopher_by_source" -> ((s, dir) =>
      gopherFinish(gopherCounts(gopherRules(Tables.documents(s, dir))))),

    // CCNet-style perplexity filtering without a KenLM: per-doc total
    // unigram SURPRISAL in floor-log2 bits — Σ over tokens of
    // (flog2(N) − flog2(n_w)) where n_w is the corpus unigram count —
    // the integer-exact stand-in for the LM score the public
    // pipelines cut on (low bits/token = templated boilerplate, high
    // = rare-token noise; both tails get filtered). One token-keyed
    // count + a token→count join + a doc-keyed sum; the engine-
    // portable flog2 is the length(bin(x))−1 discipline.
    "quality_unigram_surprisal" -> ((s, dir) => {
      val tok = Tables.documents(s, dir)
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("w"))
      surprisalFinish(surprisalCounts(tok, "doc_id",
        unigramModel(tok)), "doc_id")
    }),

    // the per-source face of the same score — the intake-quality
    // alarm's batch companion (streaming_surprisal_monitor streams it)
    "quality_surprisal_by_source" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val model = unigramModel(docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("w")))
      surprisalFinish(surprisalCounts(
        docs.select(col("source"),
          explode(TextAnalysis.tokens(col("text"))).as("w")),
        "source", model), "source")
    })
  )

  /** Corpus unigram model as a (w, n_w, n_total) table — the static
    * side the surprisal faces probe. The model is VOCABULARY-sized (one
    * row per distinct corpus token) — multi-GB on a web-scale corpus —
    * so the probe join strategy is left to Catalyst stats: auto-
    * broadcast when the vocab is small, shuffled hash join on the token
    * key otherwise. Only the 1-row n_total fold is pinned broadcast. */
  def unigramModel(tok: DataFrame): DataFrame = {
    val cnt = tok.groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    cnt.crossJoin(broadcast(cnt.agg(sum(col("n_w")).as("n_total"))))
  }

  /** Keyed (n_tokens, surprisal_bits) over a `(key, w)` token table —
    * a plain keyed aggregate after the model probe, so it runs
    * unchanged as a complete-mode STREAMING aggregation. */
  def surprisalCounts(tok: DataFrame, key: String, model: DataFrame): DataFrame =
    tok.join(model, "w")
      .select(col(key),
        (length(bin(col("n_total"))) - length(bin(col("n_w"))))
          .cast("long").as("bits"))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_tokens"), sum(col("bits")).as("surprisal_bits"))

  /** bits-per-token finisher. */
  def surprisalFinish(counts: DataFrame, key: String): DataFrame =
    counts.select(col(key), col("n_tokens"), col("surprisal_bits"),
      expr("surprisal_bits * 1000 div greatest(n_tokens, 1L)")
        .as("bits_per_token_milli"))

  /** Gopher-style rule filter (Rae et al. 2021, §A1.1) as exact
    * integer per-doc verdicts: word-count window [50, 100k], mean
    * word length in [3, 10] (×100 fixed-point), ≥2 stopwords (the
    * text_quality list), ≥80% purely-alphabetic words. One stateless
    * projection — the booleans and every count are engine-identical,
    * and the corpus pass rate is the downstream aggregate.
    */
  def gopherRules(docs: DataFrame): DataFrame = {
    val t = TextAnalysis.tokens(col("text"))
    docs
      .select(col("doc_id"), col("source"),
        size(t).cast("long").as("n_words"),
        expr("""aggregate(filter(split(text, '\\s+'), t -> t != ''),
               bigint(0), (a, x) -> a + length(x)) * 100
               div greatest(size(filter(split(text, '\\s+'), t -> t != '')), 1)""")
          .as("mean_word_len_x100"),
        size(filter(t, x => x.isin("the", "a", "and", "of", "to")))
          .cast("long").as("n_stopwords"),
        size(filter(t, x => x.rlike("^[A-Za-z]+$"))).cast("long")
          .as("n_alpha_words"))
      .select(col("doc_id"), col("source"), col("n_words"),
        col("mean_word_len_x100"),
        col("n_stopwords"), col("n_alpha_words"),
        (col("n_words") >= 50L && col("n_words") <= 100000L).as("ok_len"),
        (col("mean_word_len_x100") >= 300L &&
          col("mean_word_len_x100") <= 1000L).as("ok_word_len"),
        (col("n_stopwords") >= 2L).as("ok_stop"),
        (col("n_alpha_words") * 10L >= col("n_words") * 8L).as("ok_alpha"))
      .withColumn("pass",
        col("ok_len") && col("ok_word_len") && col("ok_stop") && col("ok_alpha"))
  }

  /** Per-source rule-failure counts over the [[gopherRules]] flags —
    * a plain keyed aggregate (streams unchanged in complete mode for
    * the streaming_quality_monitor face; state = one row per source).
    */
  def gopherCounts(flags: DataFrame): DataFrame =
    flags.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
      sum(when(!col("ok_len"), 1L).otherwise(0L)).as("n_fail_len"),
      sum(when(!col("ok_word_len"), 1L).otherwise(0L)).as("n_fail_word_len"),
      sum(when(!col("ok_stop"), 1L).otherwise(0L)).as("n_fail_stop"),
      sum(when(!col("ok_alpha"), 1L).otherwise(0L)).as("n_fail_alpha"))

  /** ppm finisher: the per-source intake-quality scoreboard. */
  def gopherFinish(counts: DataFrame): DataFrame =
    counts.select(col("source"), col("n_docs"), col("n_pass"),
      expr("n_pass * 1000000 div greatest(n_docs, 1L)").as("pass_ppm"),
      col("n_fail_len"), col("n_fail_word_len"), col("n_fail_stop"),
      col("n_fail_alpha"))

  /** The 8-gram decontamination CTE chain (tokens over ALL docs →
    * distinct word-8-grams), with the token CTE name parameterized so
    * [[Curate]]'s composed oracle can instantiate it alongside the
    * train-only 3-gram chain without name collisions — one definition,
    * no drift between the standalone and composed oracles.
    */
  private[ext] def gram8Ctes(toksName: String): String =
    s"""$toksName AS (
      |  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x != '') AS t
      |  FROM documents),
      |sh8 AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(t) >= 8 THEN list_transform(generate_series(1, len(t) - 7),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
      |           t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7])
      |    ELSE [] END)) AS shingle
      |  FROM $toksName)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // DuckDB sum(BIGINT) is HUGEINT, and BIGINT/BIGINT is float division
    // in both engines — only the final round(…, 6) doubles leave the
    // integer domain, same as the jaccard oracle.
    "quality_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x != '') AS t
        |  FROM documents),
        |uni AS (
        |  SELECT doc_id, tok, count(*) AS c
        |  FROM (SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY doc_id, tok),
        |ustat AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(*) AS n_uniq_tokens, CAST(max(c) AS BIGINT) AS top_unigram_count
        |  FROM uni GROUP BY doc_id),
        |big AS (
        |  SELECT doc_id, bg, count(*) AS c
        |  FROM (SELECT doc_id, unnest(CASE WHEN len(t) >= 2
        |      THEN list_transform(generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1])
        |      ELSE [] END) AS bg FROM toks) GROUP BY doc_id, bg),
        |bstat AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |    CAST(max(c) AS BIGINT) AS top_bigram_count
        |  FROM big GROUP BY doc_id)
        |SELECT u.doc_id, u.n_tokens, u.n_uniq_tokens, u.top_unigram_count,
        |  COALESCE(b.n_bigrams, 0) AS n_bigrams,
        |  COALESCE(b.top_bigram_count, 0) AS top_bigram_count,
        |  round((u.n_tokens - u.n_uniq_tokens) / u.n_tokens, 6) AS rep_unigram_frac,
        |  CASE WHEN COALESCE(b.n_bigrams, 0) > 0
        |       THEN round(b.top_bigram_count / b.n_bigrams, 6)
        |       ELSE 0.0 END AS rep_bigram_frac
        |FROM ustat u LEFT JOIN bstat b USING (doc_id)""".stripMargin,
    "lm_bigram_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x != '') AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, bg, count(*) AS c
        |  FROM (SELECT doc_id, unnest(CASE WHEN len(t) >= 2
        |      THEN list_transform(generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1])
        |      ELSE [] END) AS bg FROM toks) GROUP BY doc_id, bg),
        |corpus AS (SELECT bg, CAST(sum(c) AS BIGINT) AS corpus_c FROM bg GROUP BY bg)
        |SELECT b.doc_id, CAST(sum(b.c) AS BIGINT) AS n_bigrams,
        |  count(*) AS distinct_bigrams,
        |  CAST(sum(b.c * corpus.corpus_c) AS BIGINT) AS bg_mass,
        |  CAST(sum(CASE WHEN corpus.corpus_c = b.c THEN b.c ELSE 0 END) AS BIGINT) AS novel_bigrams
        |FROM bg b JOIN corpus USING (bg)
        |GROUP BY b.doc_id""".stripMargin,
    "decontaminate_ngrams" ->
      (s"WITH ${gram8Ctes("toks")},\n" +
      """bench AS (
        |  SELECT DISTINCT shingle FROM sh8
        |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) < 6554)
        |SELECT s.doc_id, count(*) AS n_overlap_ngrams
        |FROM sh8 s JOIN bench USING (shingle)
        |WHERE CAST(('0x' || substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 4)) AS BIGINT) >= 6554
        |GROUP BY s.doc_id""".stripMargin),
    "tfidf_top_terms" ->
      """WITH tf AS (
        |  SELECT doc_id, tok AS term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS tok
        |        FROM documents)
        |  GROUP BY doc_id, tok),
        |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
        |SELECT t.doc_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY t.doc_id
        |    ORDER BY t.tf DESC, d.df ASC, t.term ASC) AS INTEGER) AS rank,
        |  t.term, t.tf, d.df
        |FROM tf t JOIN dfx d USING (term)
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY t.doc_id
        |  ORDER BY t.tf DESC, d.df ASC, t.term ASC) <= 3""".stripMargin,

    "quality_gopher_rules" ->
      s"""WITH $gopherFlagCtes
        |SELECT doc_id, source, n_words, mean_word_len_x100, n_stopwords,
        |  n_alpha_words, ok_len, ok_word_len, ok_stop, ok_alpha, pass
        |FROM flags""".stripMargin,

    "quality_gopher_by_source" ->
      s"""WITH $gopherFlagCtes
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
        |  CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) * 1000000
        |    // greatest(count(*), 1) AS pass_ppm,
        |  CAST(sum(CASE WHEN NOT ok_len THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_len,
        |  CAST(sum(CASE WHEN NOT ok_word_len THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_word_len,
        |  CAST(sum(CASE WHEN NOT ok_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stop,
        |  CAST(sum(CASE WHEN NOT ok_alpha THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_alpha
        |FROM flags GROUP BY source""".stripMargin,

    "quality_unigram_surprisal" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),
        |    x -> x != '')) AS w
        |  FROM documents),
        |cnt AS (SELECT w, count(*) AS n_w FROM tok GROUP BY w),
        |tot AS (SELECT CAST(sum(n_w) AS BIGINT) AS n_total FROM cnt),
        |b AS (
        |  SELECT tok.doc_id,
        |    CAST(length(bin(tot.n_total)) - length(bin(cnt.n_w)) AS BIGINT) AS bits
        |  FROM tok JOIN cnt ON cnt.w = tok.w CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(bits) AS BIGINT) AS surprisal_bits,
        |  CAST(sum(bits) AS BIGINT) * 1000 // greatest(count(*), 1)
        |    AS bits_per_token_milli
        |FROM b GROUP BY doc_id""".stripMargin,

    "quality_surprisal_by_source" ->
      """WITH tok AS (
        |  SELECT source, unnest(list_filter(string_split_regex(text, '\s+'),
        |    x -> x != '')) AS w
        |  FROM documents),
        |cnt AS (SELECT w, count(*) AS n_w FROM tok GROUP BY w),
        |tot AS (SELECT CAST(sum(n_w) AS BIGINT) AS n_total FROM cnt),
        |b AS (
        |  SELECT tok.source,
        |    CAST(length(bin(tot.n_total)) - length(bin(cnt.n_w)) AS BIGINT) AS bits
        |  FROM tok JOIN cnt ON cnt.w = tok.w CROSS JOIN tot)
        |SELECT source, count(*) AS n_tokens,
        |  CAST(sum(bits) AS BIGINT) AS surprisal_bits,
        |  CAST(sum(bits) AS BIGINT) * 1000 // greatest(count(*), 1)
        |    AS bits_per_token_milli
        |FROM b GROUP BY source""".stripMargin
  )

  /** The per-doc Gopher flag CTE chain, shared by the per-doc dump and
    * the by-source rollup (and by the streaming monitor's oracle, and by
    * [[NbFilter]]'s weak-label chain) so the rule arithmetic exists
    * exactly once on the oracle side. */
  private[ext] lazy val gopherFlagCtes: String =
    """t AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split_regex(text, '\s+'), x -> x != '') AS toks
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, source,
      |    CAST(len(toks) AS BIGINT) AS n_words,
      |    CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) * 100
      |      // greatest(len(toks), 1) AS BIGINT) AS mean_word_len_x100,
      |    CAST(len(list_filter(toks,
      |      x -> x IN ('the', 'a', 'and', 'of', 'to'))) AS BIGINT) AS n_stopwords,
      |    CAST(len(list_filter(toks,
      |      x -> regexp_matches(x, '^[A-Za-z]+$'))) AS BIGINT) AS n_alpha_words
      |  FROM t),
      |flags AS (
      |  SELECT doc_id, source, n_words, mean_word_len_x100, n_stopwords,
      |    n_alpha_words,
      |    n_words >= 50 AND n_words <= 100000 AS ok_len,
      |    mean_word_len_x100 >= 300 AND mean_word_len_x100 <= 1000 AS ok_word_len,
      |    n_stopwords >= 2 AS ok_stop,
      |    n_alpha_words * 10 >= n_words * 8 AS ok_alpha,
      |    (n_words >= 50 AND n_words <= 100000)
      |      AND (mean_word_len_x100 >= 300 AND mean_word_len_x100 <= 1000)
      |      AND n_stopwords >= 2
      |      AND n_alpha_words * 10 >= n_words * 8 AS pass
      |  FROM m)""".stripMargin
}
