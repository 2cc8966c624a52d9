package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token stats, quality scoring, heuristic language ID,
  * and position-weighted document fingerprinting.
  *
  * All four are pure per-row projections (narrow, zero shuffle, fully
  * inside WholeStageCodegen) — at 100 TB they run at scan speed. No UDFs:
  * everything is built-in expressions / SQL higher-order functions, so the
  * DuckDB oracle can execute the identical integer-exact computation.
  */
object TextAnalysis {

  /** Whitespace tokens with empties dropped (matches DuckDB
    * `list_filter(string_split_regex(text, '\s+'), t -> t != '')`).
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Literal-substring occurrence count over the `_padded` column via
    * length arithmetic — integer exact, identical in any engine with
    * `replace`.
    */
  private def occurrences(kw: String): Column =
    (length(col("_padded")) - length(expr(s"replace(_padded, '$kw', '')"))) / kw.length

  /** PII scrubbing: emails then phone-shaped digit runs replaced with
    * typed placeholder tokens. Patterns are restricted to constructs
    * Java's regex and RE2 interpret identically (no backrefs, no
    * lookaround), so the DuckDB oracle replays them verbatim. Redaction
    * runs BEFORE [[normalize]] in the cleaning composition — a collapsed
    * or case-folded phone number would no longer match.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailPattern, "[EMAIL]"),
      phonePattern, "[PHONE]")

  /** Pre-dedup canonicalization: case-fold, strip everything outside
    * letters/digits/whitespace/brackets (keeping the redaction
    * placeholders), collapse whitespace runs, trim. Shingle/fingerprint
    * dedup keyed on the normalized form catches reformatted copies the
    * raw text misses. Whitespace is an EXPLICIT character class, not
    * `\s`: Java's `\s` includes vertical tab (\x0B), RE2's does not, so
    * `\s` here would make the two engines normalize a \x0B-bearing
    * document differently.
    */
  private val wsClass = " \\t\\n\\x0B\\f\\r"
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), s"[^a-z0-9$wsClass\\[\\]]", ""),
      s"[$wsClass]+", " "))

  /** Context-window chunking: split each document into overlapping
    * token windows of `chunkTokens` tokens at `stride`-token steps —
    * the doc→training-example explosion every pretraining pipeline runs
    * (strides < chunk size preserve cross-boundary context). Chunk
    * starts are 0, stride, 2·stride, … while < n_tokens, so the final
    * chunk may be short; token-less documents emit nothing. Still a
    * narrow per-row computation — the fan-out multiplies rows ~n/stride
    * but shuffles nothing.
    */
  def chunkDocuments(docs: org.apache.spark.sql.DataFrame,
                     chunkTokens: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      s"need 0 < stride <= chunkTokens, got chunk=$chunkTokens stride=$stride")
    docs.select(col("doc_id"), tokens(col("text")).as("_t"))
      .withColumn("_n", size(col("_t")))
      .filter(col("_n") > 0)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0L), expr(s"(_n - 1) div $stride")),
        i => struct(
          array_join(slice(col("_t"), (i * stride + 1).cast("int"),
            lit(chunkTokens)), " ").as("chunk_text"),
          // arithmetic, not a second O(chunk) slice: the final chunk is
          // whatever remains past its start offset, capped at chunk size
          least(lit(chunkTokens), (col("_n") - i * stride).cast("int"))
            .as("n_chunk_tokens")))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        col("col.chunk_text").as("chunk_text"),
        col("col.n_chunk_tokens").as("n_chunk_tokens"))
  }

  val queries: Map[String, Q] = Map(
    // Memorization-risk audit: the most-repeated 8-grams corpus-wide
    // (tf counts EVERY occurrence, within-doc repeats included — unlike
    // the dedup shingles, which are distinct-per-doc) with the distinct
    // document spread beside it. High-tf/low-df grams are boilerplate a
    // trained model will regurgitate verbatim; the standard pre-training
    // audit beside exact/near dedup. One explode + keyed aggregate +
    // TakeOrdered top-50.
    "memorization_ngrams" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val t = tokens(col("text"))
      val grams = when(size(t) >= 8,
        transform(sequence(lit(1), size(t) - 7),
          i => concat_ws(" ", slice(t, i, lit(8)))))
        .otherwise(array().cast("array<string>"))
      docs.select(col("doc_id"), explode(grams).as("g"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .where(col("tf") >= 2)
        .orderBy(col("tf").desc, col("g"))
        .limit(50)
    }),

    "text_tokens" -> ((s, dir) => {
      val t = tokens(col("text"))
      Tables.documents(s, dir).select(
        col("doc_id"),
        length(col("text")).as("n_chars2"),
        size(t).as("n_tokens"),
        size(array_distinct(t)).as("n_uniq_tokens"))
    }),

    "text_quality" -> ((s, dir) => {
      val t = tokens(col("text"))
      val nTok = size(t)
      val stop = filter(t, x => x.isin("the", "a", "and", "of", "to"))
      Tables.documents(s, dir).select(
        col("doc_id"),
        length(col("text")).as("n_chars2"),
        nTok.as("n_tokens"),
        size(stop).as("n_stopwords"),
        // whitespace-run count (length minus de-spaced length)
        (length(col("text")) - length(regexp_replace(col("text"), " ", ""))).as("n_spaces"),
        // mean token length ×100, floored — integer exact
        floor(expr(
          "aggregate(filter(split(text, '\\\\s+'), t -> t != ''), bigint(0), (a, x) -> a + length(x)) * 100") /
          nTok).cast("long").as("avg_token_len_x100"))
    }),

    // Per-doc ASCII character-class census — the mojibake/garbage
    // screen quality filters cut on (a doc that is 40% punctuation or
    // 30% "other" is markup, tables, or encoding damage, not prose).
    // Classes are pinned to explicit ASCII ranges so Java regex and
    // RE2 agree; counts are length deltas after class-targeted
    // regexp_replace — one projection, no explode, integer-exact.
    "doc_char_classes" -> ((s, dir) => {
      def cnt(cls: String) =
        length(col("text")) - length(regexp_replace(col("text"), cls, ""))
      val letters = cnt("[A-Za-z]")
      val digits = cnt("[0-9]")
      val spaces = cnt("[ \\t\\n\\r]")
      val punct = cnt("[!-/:-@\\[-`{-~]")
      Tables.documents(s, dir).select(
        col("doc_id"), length(col("text")).as("n_chars2"),
        letters.as("n_letters"), digits.as("n_digits"),
        spaces.as("n_spaces"), punct.as("n_punct"),
        (length(col("text")) - letters - digits - spaces - punct)
          .as("n_other"))
    }),

    // Heuristic language ID from function-word hits, fixed priority on
    // ties (en > de > fr > es). The testdata text is synthetic
    // English-ish word salad, so this classifies most rows 'en' — the
    // oracle checks cross-engine agreement, not label ground truth.
    "lang_id_ngram" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("_padded", concat(lit(" "), col("text"), lit(" ")))
      def score(kws: Seq[String]): Column =
        kws.map(occurrences).reduce(_ + _)
      val en = score(Seq(" the ", " and ", " of "))
      val de = score(Seq(" der ", " und ", " die "))
      val fr = score(Seq(" le ", " et ", " la "))
      val es = score(Seq(" el ", " y ", " los "))
      docs.select(
        col("doc_id"),
        en.cast("long").as("s_en"), de.cast("long").as("s_de"),
        fr.cast("long").as("s_fr"), es.cast("long").as("s_es"),
        when(en >= de && en >= fr && en >= es && en > 0, "en")
          .when(de >= fr && de >= es && de > 0, "de")
          .when(fr >= es && fr > 0, "fr")
          .when(es > 0, "es")
          .otherwise("und").as("lang_guess"))
    }),

    // BPE-ish token counting: letter runs, single digits, and punctuation
    // as separate tokens (the shape of GPT-style pre-tokenizers), via a
    // regex restricted to constructs Java and RE2 interpret identically.
    // Confusion matrix of the heuristic lang-ID against the table's
    // labeled `lang` column — the evaluation artifact a classifier
    // ships with: per (actual, predicted) cell counts plus each cell's
    // share of its actual-language row (the per-class recall readout,
    // integer ppm). One grouped count + a lang-keyed margin join.
    "langid_confusion" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("_padded", concat(lit(" "), col("text"), lit(" ")))
      def score(kws: Seq[String]): Column =
        kws.map(occurrences).reduce(_ + _)
      val en = score(Seq(" the ", " and ", " of "))
      val de = score(Seq(" der ", " und ", " die "))
      val fr = score(Seq(" le ", " et ", " la "))
      val es = score(Seq(" el ", " y ", " los "))
      val guessed = docs.select(col("lang"),
        when(en >= de && en >= fr && en >= es && en > 0, "en")
          .when(de >= fr && de >= es && de > 0, "de")
          .when(fr >= es && fr > 0, "fr")
          .when(es > 0, "es")
          .otherwise("und").as("lang_guess"))
      val cells = guessed.groupBy(col("lang"), col("lang_guess"))
        .agg(count(lit(1)).as("n"))
      val rowTot = cells.groupBy(col("lang")).agg(sum(col("n")).as("row_n"))
      cells.join(broadcast(rowTot), "lang")
        .select(col("lang"), col("lang_guess"), col("n"),
          expr("n * 1000000 div row_n").as("row_share_ppm"))
    }),

    "text_bpe_tokens" -> ((s, dir) => {
      val pat = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("n_bpe_tokens"),
        size(regexp_extract_all(col("text"), lit("[A-Za-z]+"), lit(0))).as("n_word_tokens"),
        size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0))).as("n_punct_tokens"))
    }),

    // Position-weighted checksum: sum(codepoint(c_i) * i) mod p — order-
    // sensitive, integer-exact, O(n) per row. Runs through the codegen
    // PosWeightChecksum expression (one static call per row); the
    // interpreted-HOF formulation it replaced dispatched two lambdas
    // per character and is kept only as the CodegenExprSpec equality
    // reference.
    "doc_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        graft.functions.PosWeightChecksum.posweightChecksum(col("text"))
          .as("fingerprint"))),

    // 64-token chunks at 48-token stride (16-token overlap)
    "chunk_documents" -> ((s, dir) =>
      chunkDocuments(Tables.documents(s, dir), 64, 48)),

    // Tokenizer-vocabulary construction: corpus-wide term & document
    // frequencies plus a DENSE deterministic token id. Counting is one
    // map-side-combining aggregate over the exploded (doc_id, token)
    // stream (count-distinct collapses to the same shuffle — the pair
    // stream is already distinct-able per partition); ids come from the
    // two-phase distributed scan (Offsets.globalPosition) in token
    // order, so no single-partition window touches the vocabulary and
    // the numbering is reproducible at any partitioning.
    "vocab_build" -> ((s, dir) => {
      val pairs = Tables.documents(s, dir)
        .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      val stats = pairs.groupBy(col("token"))
        .agg(count(lit(1)).as("tf_total"),
          count_distinct(col("doc_id")).as("df"))
      graft.ops.Offsets.globalPosition(stats, Seq(col("token")), "token_id")
        .select(col("token_id"), col("token"), col("tf_total"), col("df"))
    }),

    // Frequency-of-frequencies spectrum of the vocabulary — the
    // Zipf/Heaps audit (how many tokens occur exactly k times) that
    // decides vocabulary truncation and smoothing mass (Good–Turing's
    // N_k): two keyed aggregates, the second over vocabulary-sized
    // input with distinct-count-bounded output, plus each row's share
    // of the vocabulary as exact ppm.
    "vocab_spectrum" -> ((s, dir) => {
      val counts = Tables.documents(s, dir)
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("tf"))
      val spec = counts.groupBy(col("tf").as("occurrences"))
        .agg(count(lit(1)).as("n_tokens"))
      val tot = spec.agg(sum(col("n_tokens")).as("vocab_n"))
      spec.crossJoin(broadcast(tot))
        .select(col("occurrences"), col("n_tokens"),
          expr("n_tokens * 1000000 div vocab_n").as("vocab_share_ppm"))
    }),

    // Heavy hitters over the token stream via the Misra–Gries
    // TypedImperativeAggregate: ≤ k counters per partial cross the
    // shuffle however large the vocabulary — the bounded-memory
    // companion to the exact vocab_build. Rows-only (the surviving set
    // below the n/k guarantee threshold is merge-order-dependent);
    // the frequency guarantee and exact-below-k behavior are
    // property-tested in PropertySpec.
    "frequent_tokens_sketch" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(tokens(col("text"))).as("token"))
        .agg(graft.functions.MisraGriesAgg.misraGries(col("token"), 16).as("hh"))
        .select(posexplode(col("hh")))
        .select(col("pos").as("rank"), col("col.token").as("token"),
          col("col.est_count").as("est_count"))),

    // ORACLED companion for the Misra-Gries path: the classic MG
    // guarantee is that any token with true frequency > N/k SURVIVES a
    // k-counter sketch. For the exact top-5 tokens (oracle-computable:
    // count desc, token asc), emit `guaranteed_or_present` = "its
    // frequency is below the guarantee threshold OR it is in the
    // sketch" — vacuously true for light tokens, and a hard invariant
    // for genuine heavy hitters, so a sketch that drops one fails the
    // pinned-TRUE hash compare. Exact counts come from the oracle.
    "frequent_tokens_check" -> ((s, dir) => {
      val toks = Tables.documents(s, dir).select(explode(tokens(col("text"))).as("token"))
      val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      val total = toks.agg(count(lit(1)).as("n_total"))
      val sketch = toks
        .agg(graft.functions.MisraGriesAgg.misraGries(col("token"), 16).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.token").as("sk_token"))
      counts.crossJoin(broadcast(total)) // 1-row total side
        .orderBy(col("cnt").desc, col("token")).limit(5)
        .join(broadcast(sketch), col("token") === col("sk_token"), "left")
        .select(col("token"), col("cnt"),
          (col("cnt") * 16 <= col("n_total") || col("sk_token").isNotNull)
            .as("guaranteed_or_present"))
    }),

    // Count-min sketch token counts — the third sketch tier, and the
    // only one inside the EXACT gate: CMS merge is an elementwise sum
    // (deterministic under any partitioning) and the bucket hash is
    // engine-portable md5, so the oracle REBUILDS the identical sketch
    // in SQL (cell (i,b) = Σ counts of tokens hashing there) and the
    // estimates hash-compare exactly. Output: the exact top-20 tokens
    // with exact and CMS-estimated counts (est ≥ exact always; the gap
    // is the collision mass the 4×256 matrix admits). The sketch side
    // is one fixed-8KB-state aggregate over the token stream — at
    // 100 TB that is what crosses the shuffle, not the vocabulary.
    "cms_token_counts" -> ((s, dir) => {
      val toks = Tables.documents(s, dir).select(explode(tokens(col("text"))).as("token"))
      val sketch = toks.agg(
        graft.functions.CountMinAgg.countMin(col("token"), 4, 256).as("cells"))
      val top = toks.groupBy(col("token")).agg(count(lit(1)).as("exact_count"))
        .orderBy(col("exact_count").desc, col("token")).limit(20)
      val est = (0 until 4).map { i =>
        element_at(col("cells"),
          (conv(substring(md5(concat(lit(s"$i:"), col("token"))), 1, 8), 16, 10)
            .cast("long") % 256 + lit(i * 256) + 1).cast("int"))
      }
      top.crossJoin(broadcast(sketch)) // 1-row sketch side
        .select(col("token"), col("exact_count"),
          least(est: _*).as("est_count"))
    }),

    // The cleaning composition every corpus passes through before dedup:
    // PII redaction then canonicalization, still a pure narrow projection.
    // (The synthetic corpus contains no emails/phones, so redaction's
    // MATCHING behavior is covered by planted fixtures in ScalaTest; the
    // oracle proves the composed regex pipeline agrees across engines.)
    "text_normalize" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        normalize(redactPii(col("text"))).as("norm_text"))),

    // Integer-exact Flesch reading ease (×1000): 206835 − 1015·W/S −
    // 84600·V/W with truncating division — the readability gate a
    // quality pipeline thresholds on. Counts chosen for cross-engine
    // determinism: sentences = terminal-punctuation CHARS (replace-
    // length arithmetic, no regex split edge cases), syllable proxy =
    // vowel GROUPS via two global regexp_replace passes (collapse
    // [aeiouy]+ to a marker, strip the rest, length) — identical
    // semantics in any engine with global regex replace. One scan,
    // all codegen'd string expressions, no shuffle.
    "text_readability" -> ((s, dir) => {
      val w = greatest(lit(1L), size(tokens(col("text"))).cast("long"))
      val s_ = greatest(lit(1L),
        (length(col("text")) -
          length(translate(col("text"), ".!?", ""))).cast("long"))
      val v = length(regexp_replace(
        regexp_replace(lower(col("text")), "[aeiouy]+", "V"), "[^V]", ""))
        .cast("long")
      Tables.documents(s, dir)
        .select(col("doc_id"), w.as("n_words"), s_.as("n_sentences"),
          v.as("n_vowel_groups"))
        .select(col("doc_id"), col("n_words"), col("n_sentences"),
          col("n_vowel_groups"),
          (lit(206835L) - expr("1015L * n_words div n_sentences") -
            expr("84600L * n_vowel_groups div n_words")).as("flesch_x1000"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "memorization_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x != '') AS t
        |  FROM documents),
        |gr AS (
        |  SELECT doc_id, unnest(CASE WHEN len(t) >= 8 THEN
        |      list_transform(generate_series(1, len(t) - 7),
        |        i -> array_to_string(list_slice(t, i, i + 7), ' '))
        |    ELSE [] END) AS g
        |  FROM toks),
        |c AS (SELECT g, CAST(count(*) AS BIGINT) AS tf,
        |        CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |      FROM gr GROUP BY g)
        |SELECT g, tf, df FROM c WHERE tf >= 2
        |ORDER BY tf DESC, g LIMIT 50""".stripMargin,

    "text_readability" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    greatest(1, len(list_filter(string_split_regex(text, '\s+'),
        |      t -> t != ''))) AS n_words,
        |    greatest(1, length(text) - length(translate(text, '.!?', '')))
        |      AS n_sentences,
        |    length(regexp_replace(regexp_replace(lower(text),
        |      '[aeiouy]+', 'V', 'g'), '[^V]', '', 'g')) AS n_vowel_groups
        |  FROM documents)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  CAST(n_sentences AS BIGINT) AS n_sentences,
        |  CAST(n_vowel_groups AS BIGINT) AS n_vowel_groups,
        |  CAST(206835 - (1015 * n_words) // n_sentences
        |    - (84600 * n_vowel_groups) // n_words AS BIGINT) AS flesch_x1000
        |FROM c""".stripMargin,
    // exact top-5 token counts from the oracle; the MG-guarantee
    // boolean is pinned TRUE (see the query's Scaladoc)
    "frequent_tokens_check" ->
      """WITH t AS (
        |  SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS token
        |  FROM documents),
        |c AS (SELECT token, count(*) AS cnt FROM t GROUP BY token),
        |n AS (SELECT count(*) AS n_total FROM t)
        |SELECT token, cnt, CAST(TRUE AS BOOLEAN) AS guaranteed_or_present
        |FROM c, n
        |ORDER BY cnt DESC, token
        |LIMIT 5""".stripMargin,
    // the oracle rebuilds the 4×256 sketch: per-row buckets from the
    // same md5 discipline, cell = Σ token counts in the bucket,
    // estimate = min over the 4 rows — deterministic, so exact-hash
    "cms_token_counts" ->
      """WITH t AS (
        |  SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS token
        |  FROM documents),
        |c AS (SELECT token, count(*) AS cnt FROM t GROUP BY token),
        |bk AS (
        |  SELECT c.token, c.cnt, r.i,
        |    CAST(('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || c.token), 1, 8)) AS BIGINT) % 256 AS b
        |  FROM c CROSS JOIN range(4) r(i)),
        |cells AS (SELECT i, b, CAST(sum(cnt) AS BIGINT) AS cell FROM bk GROUP BY i, b),
        |top AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT 20)
        |SELECT top.token, top.cnt AS exact_count, CAST(min(cells.cell) AS BIGINT) AS est_count
        |FROM top
        |JOIN bk ON bk.token = top.token
        |JOIN cells ON cells.i = bk.i AND cells.b = bk.b
        |GROUP BY top.token, top.cnt""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id, length(text) AS n_chars2,
        |  len(list_filter(string_split_regex(text, '\s+'), t -> t != '')) AS n_tokens,
        |  len(list_distinct(list_filter(string_split_regex(text, '\s+'), t -> t != ''))) AS n_uniq_tokens
        |FROM documents""".stripMargin,
    "text_quality" ->
      """WITH t AS (SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '\s+'), x -> x != '') AS toks
        |  FROM documents)
        |SELECT doc_id, length(text) AS n_chars2,
        |  len(toks) AS n_tokens,
        |  len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of', 'to'))) AS n_stopwords,
        |  length(text) - length(replace(text, ' ', '')) AS n_spaces,
        |  CAST(floor(list_sum(list_transform(toks, x -> length(x))) * 100 / len(toks)) AS BIGINT)
        |    AS avg_token_len_x100
        |FROM t""".stripMargin,
    "doc_char_classes" ->
      """SELECT doc_id, length(text) AS n_chars2,
        |  length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_letters,
        |  length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
        |  length(text) - length(regexp_replace(text, '[ \t\n\r]', '', 'g')) AS n_spaces,
        |  length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS n_punct,
        |  length(regexp_replace(text, '[A-Za-z]', '', 'g'))
        |    + length(regexp_replace(text, '[0-9]', '', 'g'))
        |    + length(regexp_replace(text, '[ \t\n\r]', '', 'g'))
        |    + length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g'))
        |    - 3 * length(text) AS n_other
        |FROM documents""".stripMargin,

    "lang_id_ngram" ->
      """WITH p AS (SELECT doc_id, ' ' || text || ' ' AS pad FROM documents),
        |s AS (SELECT doc_id,
        |  (length(pad) - length(replace(pad, ' the ', ''))) / 5
        |    + (length(pad) - length(replace(pad, ' and ', ''))) / 5
        |    + (length(pad) - length(replace(pad, ' of ', ''))) / 4 AS s_en,
        |  (length(pad) - length(replace(pad, ' der ', ''))) / 5
        |    + (length(pad) - length(replace(pad, ' und ', ''))) / 5
        |    + (length(pad) - length(replace(pad, ' die ', ''))) / 5 AS s_de,
        |  (length(pad) - length(replace(pad, ' le ', ''))) / 4
        |    + (length(pad) - length(replace(pad, ' et ', ''))) / 4
        |    + (length(pad) - length(replace(pad, ' la ', ''))) / 4 AS s_fr,
        |  (length(pad) - length(replace(pad, ' el ', ''))) / 4
        |    + (length(pad) - length(replace(pad, ' y ', ''))) / 3
        |    + (length(pad) - length(replace(pad, ' los ', ''))) / 5 AS s_es
        |  FROM p)
        |SELECT doc_id,
        |  CAST(s_en AS BIGINT) AS s_en, CAST(s_de AS BIGINT) AS s_de,
        |  CAST(s_fr AS BIGINT) AS s_fr, CAST(s_es AS BIGINT) AS s_es,
        |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
        |       WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
        |       WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
        |       WHEN s_es > 0 THEN 'es'
        |       ELSE 'und' END AS lang_guess
        |FROM s""".stripMargin,
    "langid_confusion" ->
      """WITH p AS (SELECT lang, ' ' || text || ' ' AS pad FROM documents),
        |s AS (SELECT lang,
        |  (length(pad) - length(replace(pad, ' the ', ''))) / 5
        |    + (length(pad) - length(replace(pad, ' and ', ''))) / 5
        |    + (length(pad) - length(replace(pad, ' of ', ''))) / 4 AS s_en,
        |  (length(pad) - length(replace(pad, ' der ', ''))) / 5
        |    + (length(pad) - length(replace(pad, ' und ', ''))) / 5
        |    + (length(pad) - length(replace(pad, ' die ', ''))) / 5 AS s_de,
        |  (length(pad) - length(replace(pad, ' le ', ''))) / 4
        |    + (length(pad) - length(replace(pad, ' et ', ''))) / 4
        |    + (length(pad) - length(replace(pad, ' la ', ''))) / 4 AS s_fr,
        |  (length(pad) - length(replace(pad, ' el ', ''))) / 4
        |    + (length(pad) - length(replace(pad, ' y ', ''))) / 3
        |    + (length(pad) - length(replace(pad, ' los ', ''))) / 5 AS s_es
        |  FROM p),
        |g AS (SELECT lang,
        |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
        |       WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
        |       WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
        |       WHEN s_es > 0 THEN 'es'
        |       ELSE 'und' END AS lang_guess
        |  FROM s),
        |c AS (SELECT lang, lang_guess, count(*) AS n FROM g GROUP BY 1, 2),
        |t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS row_n FROM c GROUP BY lang)
        |SELECT c.lang, c.lang_guess, c.n,
        |  c.n * 1000000 // t.row_n AS row_share_ppm
        |FROM c JOIN t ON t.lang = c.lang""".stripMargin,

    // list_sum(BIGINT) yields HUGEINT in DuckDB — cast the final value
    // back to BIGINT so the dtype matches Spark's int64
    "doc_fingerprint" ->
      """SELECT doc_id,
        |  CAST(COALESCE(list_sum(list_transform(generate_series(1, length(text)),
        |    i -> CAST(ascii(text[i]) * i AS BIGINT))), 0) % 1000000007 AS BIGINT) AS fingerprint
        |FROM documents""".stripMargin,
    "vocab_build" ->
      """WITH p AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),
        |    x -> x != '')) AS token
        |  FROM documents)
        |SELECT ROW_NUMBER() OVER (ORDER BY token) - 1 AS token_id,
        |  token, count(*) AS tf_total, count(DISTINCT doc_id) AS df
        |FROM p GROUP BY token""".stripMargin,
    "vocab_spectrum" ->
      """WITH p AS (
        |  SELECT unnest(list_filter(string_split_regex(text, '\s+'),
        |    x -> x != '')) AS token
        |  FROM documents),
        |c AS (SELECT token, count(*) AS tf FROM p GROUP BY token),
        |s AS (SELECT tf AS occurrences, count(*) AS n_tokens
        |      FROM c GROUP BY tf),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS vocab_n FROM s)
        |SELECT occurrences, n_tokens,
        |  n_tokens * 1000000 // vocab_n AS vocab_share_ppm
        |FROM s, t""".stripMargin,

    "chunk_documents" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x != '') AS tk
        |  FROM documents),
        |c AS (SELECT doc_id, tk, len(tk) AS n FROM t WHERE len(tk) > 0)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
        |  array_to_string(tk[i*48+1 : i*48+64], ' ') AS chunk_text,
        |  CAST(len(tk[i*48+1 : i*48+64]) AS INTEGER) AS n_chunk_tokens
        |FROM c, UNNEST(generate_series(0, (n-1)//48)) AS u(i)""".stripMargin,
    // DuckDB regexp_replace replaces the FIRST match unless the 'g'
    // option is passed; Spark always replaces all
    // whitespace spelled as an explicit class on both sides (Java \s
    // includes \x0B, RE2 \s does not)
    "text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(
        |    lower(regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |      '\+?[0-9][0-9()\- ]{6,}[0-9]', '[PHONE]', 'g')),
        |    '[^a-z0-9 \t\n\x0B\f\r\[\]]', '', 'g'),
        |    '[ \t\n\x0B\f\r]+', ' ', 'g')) AS norm_text
        |FROM documents""".stripMargin,
    // len() is BIGINT in DuckDB, size() is int in Spark
    "text_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INTEGER) AS n_bpe_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS INTEGER) AS n_word_tokens,
        |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS INTEGER) AS n_punct_tokens
        |FROM documents""".stripMargin
  )
}
