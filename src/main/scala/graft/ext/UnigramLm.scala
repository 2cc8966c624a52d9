package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (Kudo 2018, "Subword Regularization:
  * Improving Neural Network Translation Models with Multiple Subword
  * Candidates" — the SentencePiece unigram model): score a candidate
  * piece vocabulary by EM over the ways pieces cover the corpus, the
  * companion trainer to [[BpeTrain]]'s merge learning.
  *
  * Relational formulation: the E-step's segmentation marginal is
  * approximated PER START POSITION — every occurrence of a candidate
  * piece at (word, start) takes responsibility proportional to its
  * current weight among the pieces STARTING at that position (the
  * leftmost-cover posterior), dropping cross-position segmentation
  * consistency. That approximation is what makes each EM round pure
  * relational algebra: one piece-keyed join, one (word,start)-keyed
  * normalizer aggregate, one piece-keyed re-estimate — no per-word
  * sequential DP, so the round distributes exactly like a query. The
  * trade is documented, not hidden: weights converge to the same
  * frequency-driven ordering as full EM on lattice-unambiguous text
  * and differ where segmentations compete mid-word.
  *
  * Determinism discipline (the [[Preference]] / KMeans convention):
  * fixed rounds (2), all arithmetic scaled-integer (responsibilities
  * in ppm, truncating `div` both engines implement identically), so
  * the DuckDB oracle replays the identical program as unrolled CTEs.
  * Headroom: a responsibility term is `freq · resp_ppm ≤ freq·10⁶`;
  * the re-estimate divides by 10³ immediately, so per-piece sums hold
  * to ~9·10¹⁵ corpus occurrences (≈ PB-scale text) before the bound.
  *
  * 100 TB shape: the lattice rides DISTINCT WORD TYPES (the Sennrich
  * word-frequency-dictionary regime [[BpeTrain]] proved at 100× = 1.8
  * — Heaps-sublinear) with a ≤ maxLen·|w| per-type fan-out; every EM
  * round's exchange rides that vocabulary lattice, never the corpus.
  * The corpus is touched exactly once (the word-type count).
  */
object UnigramLm {

  private val MaxLen = 4
  private val MinCount = 2L

  /** Corpus word-type table: (word, freq). */
  private def wordTypes(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Substring-occurrence lattice over word types: one row per
    * (word, start, len ≤ maxLen) with the piece text — the candidate
    * cover positions the E-step normalizes over.
    */
  private def occurrences(types: DataFrame): DataFrame =
    types
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("start"))
      .select(col("word"), col("freq"), col("start"),
        explode(sequence(lit(1),
          least(lit(MaxLen), length(col("word")) - col("start") + 1))).as("len"))
      .select(col("word"), col("freq"), col("start"), col("len"),
        expr("substring(word, start, len)").as("piece"))

  /** The fitted model: (candidates with n_occ, filtered lattice, final
    * weights after `rounds` EM rounds). Candidates are pieces with
    * ≥ minCount corpus occurrences, plus ALL single characters (the
    * coverage floor SentencePiece keeps too).
    */
  private def fit(docs: DataFrame, rounds: Int): (DataFrame, DataFrame, DataFrame) = {
    val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val occ = occurrences(wordTypes(docs))
    val cand = occ.groupBy(col("piece")).agg(sum(col("freq")).as("n_occ"))
      .where(col("n_occ") >= MinCount || length(col("piece")) === 1)
      .persist(ser)
    val occC = occ.join(cand.select(col("piece")), "piece")
      .persist(ser)
    var weights = cand.select(col("piece"), col("n_occ").as("w"))
    (0 until rounds).foreach { _ =>
      val j = occC.join(weights, "piece")
      val denom = j.groupBy(col("word"), col("start")).agg(sum(col("w")).as("dsum"))
      // persist each round's PIECE-ALPHABET-SIZED weight table — every
      // round references the previous one twice (normalizer join +
      // responsibility join), so an unpersisted lineage re-evaluates
      // the chain once per reference (the Preference.fit finding)
      weights = j.join(denom, Seq("word", "start"))
        .select(col("piece"), col("freq"),
          expr("w * 1000000L div greatest(dsum, 1L)").as("resp_ppm"))
        .groupBy(col("piece"))
        .agg(expr("sum(freq * resp_ppm) div 1000L").as("w"))
        .persist(ser)
    }
    (cand, occC, weights)
  }

  /** Top-`k` trained pieces: (piece, n_occ, weight) by final EM weight
    * (ties lexicographic).
    */
  def train(docs: DataFrame, rounds: Int, k: Int): DataFrame = {
    val (cand, _, weights) = fit(docs, rounds)
    cand.join(weights, "piece")
      .select(col("piece"), col("n_occ"), col("w").as("weight"))
      .orderBy(col("weight").desc, col("piece"))
      .limit(k)
  }

  /** Tokenizer APPLY: greedy leftmost-longest segmentation of every
    * corpus word under the trained vocabulary (top-`k` EM pieces plus
    * the single-character coverage floor) — the DECODE the fertility
    * faces deliberately approximate with a model expectation; this
    * face closes that documented gap with an actual segmentation. The
    * greedy step table is STATIC (per (word, start) the longest vocab
    * piece starting there — one lattice∩vocab aggregate; the
    * single-char floor guarantees an entry at EVERY position), so each
    * word's decode is a pure-local pointer chase: the steps collect
    * into a per-word array (one word-keyed aggregate — positions are
    * word-length-bounded) and a codegen'd SQL HOF `aggregate` walks it
    * in-row. ZERO driver-scheduled rounds — the first cut iterated
    * max-word-length joined rounds and spent ~3 s of fixed per-round
    * overhead on 31 word types (measured 25 s at sf0.1); this form is
    * one exchange. Greedy-longest is deterministic and engine-portable
    * (the oracle replays it as a recursive CTE — same RESULT, the only
    * contract); it is SentencePiece's longest-match fallback, not
    * Viterbi — documented, and the fertility deltas between the two
    * are what `unigram_vs_bpe_fertility` reads through the model
    * expectation. Emits the pieces-per-word histogram (n_pieces,
    * n_word_types, n_word_occurrences) — word-length-bounded rows.
    */
  def applySegment(docs: DataFrame, rounds: Int, k: Int): DataFrame = {
    val (cand, occC, weights) = fit(docs, rounds)
    val top = cand.join(weights, "piece")
      .orderBy(col("w").desc, col("piece")).limit(k).select(col("piece"))
    val vocab = top
      .unionByName(cand.where(length(col("piece")) === 1).select(col("piece")))
      .distinct()
    val stepArr = occC.join(vocab, "piece")
      .groupBy(col("word"), col("start")).agg(max(col("len")).as("step"))
      .groupBy(col("word"))
      .agg(array_sort(collect_list(struct(col("start"), col("step")))).as("sa"))
      .select(col("word"), expr("transform(sa, x -> x.step)").as("steps"))
    wordTypes(docs).join(stepArr, "word")
      .select(col("word"), col("freq"),
        expr("""aggregate(sequence(1, length(word)),
          named_struct('pos', 1, 'n', bigint(0)),
          (acc, i) -> CASE WHEN i = acc.pos
            THEN named_struct('pos', acc.pos + element_at(steps, i), 'n', acc.n + 1L)
            ELSE acc END,
          acc -> acc.n)""").as("n"))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("n_word_types"), sum(col("freq")).as("n_word_occurrences"))
      .select(col("n").as("n_pieces"), col("n_word_types"), col("n_word_occurrences"))
  }

  /** BPE-vs-unigram fertility comparison (per language): the
    * [[LmStats.tokenizerFertility]] whitespace-vs-pretoken readout next
    * to the unigram model's EXPECTED fertility — expected pieces per
    * word = word length over the responsibility-weighted mean piece
    * length, a model expectation (not a decode), in ×10³ fixed point
    * (`Σ freq · len·10⁹ div elen_x1e6` stays in BIGINT to ~9·10¹²
    * words per language). One extra join round over the fitted
    * lattice + a lang-keyed aggregate.
    */
  def fertilityVsBpe(docs: DataFrame, rounds: Int): DataFrame = {
    val (_, occC, weights) = fit(docs, rounds)
    val j = occC.join(weights, "piece")
    val denom = j.groupBy(col("word"), col("start")).agg(sum(col("w")).as("dsum"))
    val perWord = j.join(denom, Seq("word", "start"))
      .select(col("word"), col("len"),
        expr("w * 1000000L div greatest(dsum, 1L)").as("resp_ppm"))
      .groupBy(col("word"))
      .agg(sum(col("resp_ppm")).as("s_resp"),
        sum(col("resp_ppm") * col("len")).as("s_len"))
      .select(col("word"),
        expr("s_len * 1000000L div greatest(s_resp, 1L)").as("elen_x1e6"))
      .select(col("word"),
        expr("length(word) * 1000000000L div greatest(elen_x1e6, 1L)").as("tok_x1e3"))
    val langWords = docs
      .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("freq"))
    val uni = langWords.join(perWord, "word")
      .groupBy(col("lang"))
      .agg(expr("sum(freq * tok_x1e3) div sum(freq)").as("unigram_fertility_x1e3"))
    LmStats.tokenizerFertility(docs)
      .select(col("lang"), col("n_words"),
        col("fertility_ppm").as("bpe_fertility_ppm"))
      .join(uni, "lang")
  }

  /** The SentencePiece prune-and-refit step, relationally: after the EM
    * fit, drop BELOW-MEAN pieces (the exact cross-multiplied integer
    * threshold `w · n_pieces > Σw` — no division, no rank, one 1-row
    * broadcast) while keeping every single character (the coverage
    * floor), then run ONE more EM round over the pruned vocabulary and
    * emit the re-estimated top-`k`. Mean-threshold pruning is the
    * integer-exact stand-in for SentencePiece's likelihood-loss cut —
    * both discard the long tail that carries negligible posterior mass.
    */
  def pruneRound(docs: DataFrame, rounds: Int, k: Int): DataFrame = {
    val (cand, occC, weights) = fit(docs, rounds)
    val tot = weights.agg(sum(col("w")).as("tw"), count(lit(1)).as("np"))
    val kept = weights.crossJoin(broadcast(tot))
      .where(col("w") * col("np") > col("tw") || length(col("piece")) === 1)
      .select(col("piece"), col("w"))
    val j = occC.join(kept, "piece")
    val denom = j.groupBy(col("word"), col("start")).agg(sum(col("w")).as("dsum"))
    val refit = j.join(denom, Seq("word", "start"))
      .select(col("piece"), col("freq"),
        expr("w * 1000000L div greatest(dsum, 1L)").as("resp_ppm"))
      .groupBy(col("piece"))
      .agg(expr("sum(freq * resp_ppm) div 1000L").as("w"))
    cand.join(refit, "piece")
      .select(col("piece"), col("n_occ"), col("w").as("weight"))
      .orderBy(col("weight").desc, col("piece"))
      .limit(k)
  }

  /** Per-language multi-character coverage: the share of E-step
    * responsibility mass carried by pieces of length ≥ 2 — the readout
    * that says whether the trained vocabulary actually compresses (a
    * model whose mass sits on single characters tokenizes at fertility
    * ≈ word length and buys nothing). Same lattice join as the
    * fertility face; per-word ppm folded freq-weighted per language.
    */
  def multicharCoverage(docs: DataFrame, rounds: Int): DataFrame = {
    val (_, occC, weights) = fit(docs, rounds)
    val j = occC.join(weights, "piece")
    val denom = j.groupBy(col("word"), col("start")).agg(sum(col("w")).as("dsum"))
    val perWord = j.join(denom, Seq("word", "start"))
      .select(col("word"), col("len"),
        expr("w * 1000000L div greatest(dsum, 1L)").as("resp_ppm"))
      .groupBy(col("word"))
      .agg(sum(col("resp_ppm")).as("s_all"),
        sum(when(col("len") >= 2, col("resp_ppm")).otherwise(lit(0L))).as("s_multi"))
      .select(col("word"),
        expr("s_multi * 1000000L div greatest(s_all, 1L)").as("cov_ppm"))
    docs.select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("freq"))
      .join(perWord, "word")
      .groupBy(col("lang"))
      .agg(sum(col("freq")).as("n_words"),
        expr("sum(freq * cov_ppm) div sum(freq)").as("multichar_resp_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "unigram_lm_train" -> ((s, dir) =>
      train(Tables.documents(s, dir), rounds = 2, k = 200)),
    "unigram_vs_bpe_fertility" -> ((s, dir) =>
      fertilityVsBpe(Tables.documents(s, dir), rounds = 2)),
    "unigram_prune_refit" -> ((s, dir) =>
      pruneRound(Tables.documents(s, dir), rounds = 2, k = 200)),
    "unigram_apply_segment" -> ((s, dir) =>
      applySegment(Tables.documents(s, dir), rounds = 2, k = 200)),
    "unigram_multichar_coverage" -> ((s, dir) =>
      multicharCoverage(Tables.documents(s, dir), rounds = 2))
  )

  // shared oracle chain: word types → bounded substring lattice →
  // candidates → two unrolled EM rounds (w0 → w1 → w2)
  private def emRound(prev: String, r: Int): String =
    s"""d$r AS MATERIALIZED (
       |  SELECT o.word, o.start, CAST(sum(w.w) AS BIGINT) AS dsum
       |  FROM occ_c o JOIN $prev w ON w.piece = o.piece
       |  GROUP BY 1, 2),
       |w$r AS MATERIALIZED (
       |  SELECT o.piece,
       |    CAST(sum(o.freq * (w.w * 1000000 // greatest(d.dsum, 1))) // 1000 AS BIGINT) AS w
       |  FROM occ_c o JOIN $prev w ON w.piece = o.piece
       |  JOIN d$r d ON d.word = o.word AND d.start = o.start
       |  GROUP BY 1)""".stripMargin

  private val coreCtes: String =
    """types AS MATERIALIZED (
      |  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
      |  FROM (SELECT unnest(list_filter(string_split_regex(text, '\s+'),
      |          x -> x != '')) AS w FROM documents)
      |  GROUP BY 1),
      |st AS MATERIALIZED (
      |  SELECT word, freq, s AS start
      |  FROM types, UNNEST(generate_series(1, length(word))) AS t(s)),
      |occ AS MATERIALIZED (
      |  SELECT word, freq, start, l AS len, substring(word, start, l) AS piece
      |  FROM st, UNNEST(generate_series(1,
      |    least(4, length(word) - start + 1))) AS t(l)),
      |cand AS MATERIALIZED (
      |  SELECT piece, CAST(sum(freq) AS BIGINT) AS n_occ
      |  FROM occ GROUP BY 1
      |  HAVING sum(freq) >= 2 OR length(piece) = 1),
      |occ_c AS MATERIALIZED (
      |  SELECT o.word, o.freq, o.start, o.len, o.piece
      |  FROM occ o JOIN cand c ON c.piece = o.piece),
      |w0 AS (SELECT piece, n_occ AS w FROM cand)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "unigram_apply_segment" ->
      s"""WITH RECURSIVE $coreCtes,
         |${emRound("w0", 1)},
         |${emRound("w1", 2)},
         |vtop AS (
         |  SELECT c.piece FROM cand c JOIN w2 ON w2.piece = c.piece
         |  ORDER BY w2.w DESC, c.piece LIMIT 200),
         |vocab AS (
         |  SELECT piece FROM vtop
         |  UNION
         |  SELECT piece FROM cand WHERE length(piece) = 1),
         |stp AS MATERIALIZED (
         |  SELECT o.word, o.start, CAST(max(o.len) AS INTEGER) AS step
         |  FROM occ_c o JOIN vocab v ON v.piece = o.piece
         |  GROUP BY 1, 2),
         |seg AS (
         |  SELECT word, freq, 1 AS pos, CAST(0 AS BIGINT) AS n FROM types
         |  UNION ALL
         |  SELECT s.word, s.freq, s.pos + st.step, s.n + 1
         |  FROM seg s JOIN stp st ON st.word = s.word AND st.start = s.pos),
         |fin AS (
         |  SELECT word, freq, CAST(max(n) AS BIGINT) AS n FROM seg GROUP BY 1, 2)
         |SELECT n AS n_pieces, CAST(count(*) AS BIGINT) AS n_word_types,
         |  CAST(sum(freq) AS BIGINT) AS n_word_occurrences
         |FROM fin GROUP BY 1""".stripMargin,
    "unigram_lm_train" ->
      s"""WITH $coreCtes,
         |${emRound("w0", 1)},
         |${emRound("w1", 2)}
         |SELECT c.piece, c.n_occ, w2.w AS weight
         |FROM cand c JOIN w2 ON w2.piece = c.piece
         |ORDER BY weight DESC, c.piece
         |LIMIT 200""".stripMargin,
    "unigram_prune_refit" ->
      s"""WITH $coreCtes,
         |${emRound("w0", 1)},
         |${emRound("w1", 2)},
         |tot AS MATERIALIZED (
         |  SELECT CAST(sum(w) AS BIGINT) AS tw, CAST(count(*) AS BIGINT) AS np
         |  FROM w2),
         |kept AS MATERIALIZED (
         |  SELECT w2.piece, w2.w FROM w2, tot
         |  WHERE w2.w * tot.np > tot.tw OR length(w2.piece) = 1),
         |d3 AS MATERIALIZED (
         |  SELECT o.word, o.start, CAST(sum(k.w) AS BIGINT) AS dsum
         |  FROM occ_c o JOIN kept k ON k.piece = o.piece
         |  GROUP BY 1, 2),
         |w3 AS (
         |  SELECT o.piece,
         |    CAST(sum(o.freq * (k.w * 1000000 // greatest(d.dsum, 1))) // 1000 AS BIGINT) AS w
         |  FROM occ_c o JOIN kept k ON k.piece = o.piece
         |  JOIN d3 d ON d.word = o.word AND d.start = o.start
         |  GROUP BY 1)
         |SELECT c.piece, c.n_occ, w3.w AS weight
         |FROM cand c JOIN w3 ON w3.piece = c.piece
         |ORDER BY weight DESC, c.piece
         |LIMIT 200""".stripMargin,
    "unigram_multichar_coverage" ->
      s"""WITH $coreCtes,
         |${emRound("w0", 1)},
         |${emRound("w1", 2)},
         |d3 AS MATERIALIZED (
         |  SELECT o.word, o.start, CAST(sum(w.w) AS BIGINT) AS dsum
         |  FROM occ_c o JOIN w2 w ON w.piece = o.piece
         |  GROUP BY 1, 2),
         |perword AS MATERIALIZED (
         |  SELECT o.word,
         |    CAST(sum(w.w * 1000000 // greatest(d.dsum, 1)) AS BIGINT) AS s_all,
         |    CAST(sum(CASE WHEN o.len >= 2
         |          THEN w.w * 1000000 // greatest(d.dsum, 1) ELSE 0 END) AS BIGINT) AS s_multi
         |  FROM occ_c o JOIN w2 w ON w.piece = o.piece
         |  JOIN d3 d ON d.word = o.word AND d.start = o.start
         |  GROUP BY 1),
         |cov AS (
         |  SELECT word, s_multi * 1000000 // greatest(s_all, 1) AS cov_ppm FROM perword),
         |lw AS (
         |  SELECT lang, w AS word, CAST(count(*) AS BIGINT) AS freq
         |  FROM (SELECT lang, unnest(list_filter(string_split_regex(text, '\\s+'),
         |          x -> x != '')) AS w FROM documents)
         |  GROUP BY 1, 2)
         |SELECT lw.lang, CAST(sum(lw.freq) AS BIGINT) AS n_words,
         |  CAST(sum(lw.freq * c.cov_ppm) // sum(lw.freq) AS BIGINT) AS multichar_resp_ppm
         |FROM lw JOIN cov c ON c.word = lw.word
         |GROUP BY 1""".stripMargin,
    "unigram_vs_bpe_fertility" ->
      s"""WITH $coreCtes,
         |${emRound("w0", 1)},
         |${emRound("w1", 2)},
         |d3 AS MATERIALIZED (
         |  SELECT o.word, o.start, CAST(sum(w.w) AS BIGINT) AS dsum
         |  FROM occ_c o JOIN w2 w ON w.piece = o.piece
         |  GROUP BY 1, 2),
         |perword AS MATERIALIZED (
         |  SELECT o.word,
         |    CAST(sum(w.w * 1000000 // greatest(d.dsum, 1)) AS BIGINT) AS s_resp,
         |    CAST(sum((w.w * 1000000 // greatest(d.dsum, 1)) * o.len) AS BIGINT) AS s_len
         |  FROM occ_c o JOIN w2 w ON w.piece = o.piece
         |  JOIN d3 d ON d.word = o.word AND d.start = o.start
         |  GROUP BY 1),
         |etok AS (
         |  SELECT word,
         |    length(word) * 1000000000 //
         |      greatest(s_len * 1000000 // greatest(s_resp, 1), 1) AS tok_x1e3
         |  FROM perword),
         |lw AS (
         |  SELECT lang, w AS word, CAST(count(*) AS BIGINT) AS freq
         |  FROM (SELECT lang, unnest(list_filter(string_split_regex(text, '\\s+'),
         |          x -> x != '')) AS w FROM documents)
         |  GROUP BY 1, 2),
         |uni AS (
         |  SELECT lw.lang,
         |    CAST(sum(lw.freq * e.tok_x1e3) // sum(lw.freq) AS BIGINT)
         |      AS unigram_fertility_x1e3
         |  FROM lw JOIN etok e ON e.word = lw.word
         |  GROUP BY 1),
         |bpe AS (
         |  SELECT lang,
         |    CAST(sum(len(list_filter(string_split_regex(text, '\\s+'), x -> x != ''))) AS BIGINT) AS n_words,
         |    CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))) AS BIGINT) AS n_sub
         |  FROM documents GROUP BY lang)
         |SELECT b.lang, b.n_words,
         |  b.n_sub * 1000000 // greatest(b.n_words, 1) AS bpe_fertility_ppm,
         |  u.unigram_fertility_x1e3
         |FROM bpe b JOIN uni u ON u.lang = b.lang""".stripMargin
  )
}
