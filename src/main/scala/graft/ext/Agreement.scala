package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-rater agreement — the label-quality screen a supervised or
  * RLHF data pipeline runs before trusting annotations: when two
  * raters (human, heuristic, or model) label the same items, how much
  * do they agree BEYOND chance?
  *
  * '''Cohen's kappa''' for two binary raters is computed as ONE exact
  * rational: with the 2×2 confusion counts (n11, n10, n01, n00),
  * margins r1 = n11+n10, c1 = n11+n01 (rater A / rater B positives)
  * and n the total,
  *
  *   kappa = (po − pe) / (1 − pe)
  *         = (n·(n11+n00) − r1·c1 − r0·c0) / (n² − r1·c1 − r0·c0)
  *
  * — numerator and denominator are integers, so the statistic is an
  * integer ppm after one integral division. Products ride
  * decimal(38,0) (n² · 10⁶ passes 2⁶³ near 3e6 items); the division
  * is plain `div` — Spark's `div` and DuckDB's `//` both truncate
  * toward zero, so a negative kappa (worse than chance) divides
  * identically on both sides.
  *
  * 100 TB shape: one keyed aggregate over the items produces the four
  * counts (map-side combined); everything after is arithmetic on one
  * row. The demo raters are two deterministic document-length signals
  * ("long by chars" vs "long by tokens") — agreement between the two
  * length notions, a real curation QA question.
  */
object Agreement {

  /** One row: (n, n11, n10, n01, n00, po_ppm, pe_ppm, kappa_ppm) for
    * two boolean rater columns over any DataFrame.
    */
  def cohensKappa(data: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    data.select(raterA.cast("int").as("a"), raterB.cast("int").as("b"))
      .agg(count(lit(1)).as("n"),
        sum(col("a") * col("b")).as("n11"),
        sum(col("a") * (lit(1) - col("b"))).as("n10"),
        sum((lit(1) - col("a")) * col("b")).as("n01"),
        sum((lit(1) - col("a")) * (lit(1) - col("b"))).as("n00"))
      // the rational's numerator/denominator on decimal(38,0) — n²·10⁶
      // passes 2⁶³ near 3e6 items in plain longs
      .withColumn("_knum", expr(
        """(CAST(n AS DECIMAL(38,0)) * (n11 + n00)
          | - (n11 + n10) * CAST(n11 + n01 AS DECIMAL(38,0))
          | - (n01 + n00) * CAST(n10 + n00 AS DECIMAL(38,0))) * 1000000""".stripMargin))
      .withColumn("_kden", expr(
        """CAST(n AS DECIMAL(38,0)) * n
          | - (n11 + n10) * CAST(n11 + n01 AS DECIMAL(38,0))
          | - (n01 + n00) * CAST(n10 + n00 AS DECIMAL(38,0))""".stripMargin))
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        expr("(n11 + n00) * 1000000 div greatest(n, 1L)").as("po_ppm"),
        expr("""CAST(((n11 + n10) * CAST(n11 + n01 AS DECIMAL(38,0))
               + (n01 + n00) * CAST(n10 + n00 AS DECIMAL(38,0))) * 1000000
               div greatest(CAST(n AS DECIMAL(38,0)) * n, 1) AS BIGINT)""").as("pe_ppm"),
        // plain `div`: both engines truncate toward zero, so a
        // negative kappa (worse than chance) divides identically.
        // Degenerate-input guard (round-10 advice): pe = 1 (both raters
        // unanimous) zeroes the denominator, where Spark `div` yields
        // NULL but DuckDB `//` hard-errors — pin the undefined case to
        // an explicit NULL on BOTH sides instead of diverging.
        expr("CASE WHEN _kden = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST(_knum div _kden AS BIGINT) END").as("kappa_ppm"))
  }

  /** McNemar's test for PAIRED binary outcomes — "did the two raters
    * (or model versions) disagree symmetrically?": only the discordant
    * cells matter, χ² = (n10 − n01)²/(n10 + n01), emitted as an exact
    * integer ×10⁶ (the squared difference is ≤ n², rides decimal).
    * Same one-aggregate shape as kappa.
    */
  def mcnemar(data: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    data.select(raterA.cast("int").as("a"), raterB.cast("int").as("b"))
      .agg(sum(col("a") * (lit(1) - col("b"))).as("n10"),
        sum((lit(1) - col("a")) * col("b")).as("n01"))
      .select(col("n10"), col("n01"),
        expr("""CAST((n10 - n01) * CAST(n10 - n01 AS DECIMAL(38,0)) * 1000000
               div greatest(n10 + n01, 1L) AS BIGINT)""").as("mcnemar_x1e6"))
  }

  /** Fleiss' kappa for r = 3 binary raters — multi-rater agreement
    * beyond chance, again as ONE exact integer rational. With per-item
    * positive-counts n_i ∈ {0..3}, N items, and S = Σn_i:
    *
    *   A_i   = n_i² + (3−n_i)² − 3          (pairwise-agreement numerator)
    *   kappa = (3N·ΣA − 2S² − 2(3N−S)²) / (18N² − 2S² − 2(3N−S)²)
    *
    * (derived by clearing Po = ΣA/(6N), Pe = (S² + (3N−S)²)/(9N²) over
    * the common denominator 18N²). All terms are integer; products ride
    * decimal(38,0); one truncating division lands kappa_ppm.
    */
  def fleissKappa3(data: DataFrame, r1: Column, r2: Column, r3: Column): DataFrame = {
    data.select((r1.cast("int") + r2.cast("int") + r3.cast("int"))
        .cast("long").as("pos"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("pos")).as("s_pos"),
        sum(col("pos") * col("pos")
          + (lit(3L) - col("pos")) * (lit(3L) - col("pos")) - lit(3L)).as("sum_a"))
      // same degenerate-input guard as cohensKappa: Pe = 1 (all items
      // unanimous) zeroes the denominator — emit an explicit NULL on
      // both sides rather than diverge (Spark div→NULL, DuckDB //→error)
      .withColumn("_fden", expr(
        """18 * CAST(n_items AS DECIMAL(38,0)) * n_items
          | - 2 * CAST(s_pos AS DECIMAL(38,0)) * s_pos
          | - 2 * (3 * CAST(n_items AS DECIMAL(38,0)) - s_pos)
          |     * (3 * CAST(n_items AS DECIMAL(38,0)) - s_pos)""".stripMargin))
      .select(col("n_items"), col("s_pos"), col("sum_a"),
        expr("""CASE WHEN _fden = 0 THEN CAST(NULL AS BIGINT)
               ELSE CAST((3 * CAST(n_items AS DECIMAL(38,0)) * sum_a
               - 2 * CAST(s_pos AS DECIMAL(38,0)) * s_pos
               - 2 * (3 * CAST(n_items AS DECIMAL(38,0)) - s_pos)
                   * (3 * CAST(n_items AS DECIMAL(38,0)) - s_pos))
               * 1000000 div _fden AS BIGINT) END""").as("kappa_ppm"))
  }

  /** Krippendorff's alpha for r = 3 binary raters (nominal metric) —
    * the agreement coefficient built on DISAGREEMENT rather than
    * chance-corrected agreement, and the third face of the family
    * beside Cohen (2 raters) and Fleiss (marginal-chance Pe). With
    * per-item positive counts n_i ∈ {0..3} over N items, m = 3, total
    * positives S and pooled values Nm:
    *
    *   D_o ∝ Σᵢ n_i·(m−n_i)            (within-item disagreeing pairs)
    *   D_e ∝ S·(Nm−S)                  (pooled-margin disagreeing pairs)
    *   alpha = 1 − (Nm−1)·Σ n_i(m−n_i) / ((m−1)·S·(Nm−S))
    *
    * — one exact integer rational (Krippendorff 2004, the bivalent
    * special case). Note the pooled margin: unlike Fleiss, alpha's
    * expected disagreement uses Nm−1 in the numerator, which is what
    * makes it consistent for small N. Same degenerate guard as the
    * kappas: a unanimous pool (S = 0 or S = Nm) zeroes the
    * denominator → pinned NULL on both engines. Same one-aggregate
    * 100 TB shape as [[fleissKappa3]].
    */
  def krippendorffAlpha3(data: DataFrame, r1: Column, r2: Column, r3: Column): DataFrame = {
    data.select((r1.cast("int") + r2.cast("int") + r3.cast("int"))
        .cast("long").as("pos"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("pos")).as("s_pos"),
        sum(col("pos") * (lit(3L) - col("pos"))).as("d_obs"))
      // (m−1)·S·(Nm−S) with m = 3: 2·S·(3N−S), on decimal(38,0)
      .withColumn("_aden", expr(
        """2 * CAST(s_pos AS DECIMAL(38,0))
          | * (3 * CAST(n_items AS DECIMAL(38,0)) - s_pos)""".stripMargin))
      .select(col("n_items"), col("s_pos"), col("d_obs"),
        expr("""CASE WHEN _aden = 0 THEN CAST(NULL AS BIGINT)
               ELSE CAST((_aden - (3 * CAST(n_items AS DECIMAL(38,0)) - 1) * d_obs)
                 * 1000000 div _aden AS BIGINT) END""").as("alpha_ppm"))
  }

  val queries: Map[String, Q] = Map(
    // three deterministic "is this document substantial" raters:
    // chars, tokens, distinct tokens — multi-rater agreement on the
    // same curation question the two-rater kappa asks
    "fleiss_kappa" -> ((s, dir) => {
      val t = TextAnalysis.tokens(col("text"))
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"),
          size(t).cast("long").as("n_tokens"),
          size(array_distinct(t)).cast("long").as("n_uniq"))
      fleissKappa3(docs, col("n_chars") >= 500, col("n_tokens") >= 80,
        col("n_uniq") >= 60)
    }),

    // do "long by chars" and "long by tokens" agree on which documents
    // are long? (two deterministic raters over the documents table)
    "cohens_kappa" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      cohensKappa(docs, col("n_chars") >= 500, col("n_tokens") >= 80)
    }),

    // the same three raters as fleiss_kappa under the
    // disagreement-based coefficient — alpha vs kappa on identical
    // inputs is the standard annotation-QA cross-check
    "krippendorff_alpha" -> ((s, dir) => {
      val t = TextAnalysis.tokens(col("text"))
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"),
          size(t).cast("long").as("n_tokens"),
          size(array_distinct(t)).cast("long").as("n_uniq"))
      krippendorffAlpha3(docs, col("n_chars") >= 500, col("n_tokens") >= 80,
        col("n_uniq") >= 60)
    }),

    // the paired-disagreement companion on the same two raters: is the
    // char-rater systematically more generous than the token-rater?
    "mcnemar_test" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      mcnemar(docs, col("n_chars") >= 500, col("n_tokens") >= 80)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "krippendorff_alpha" ->
      """WITH r AS (
        |  SELECT (CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END
        |    + CASE WHEN len(list_filter(string_split_regex(text, '\s+'),
        |        x -> x != '')) >= 80 THEN 1 ELSE 0 END
        |    + CASE WHEN len(list_distinct(list_filter(
        |        string_split_regex(text, '\s+'), x -> x != ''))) >= 60
        |      THEN 1 ELSE 0 END) AS pos
        |  FROM documents),
        |m AS (
        |  SELECT count(*) AS n_items,
        |    CAST(sum(pos) AS BIGINT) AS s_pos,
        |    CAST(sum(pos * (3 - pos)) AS BIGINT) AS d_obs
        |  FROM r),
        |d AS (
        |  SELECT *, 2 * CAST(s_pos AS HUGEINT)
        |      * (3 * CAST(n_items AS HUGEINT) - s_pos) AS aden
        |  FROM m)
        |SELECT n_items, s_pos, d_obs,
        |  CASE WHEN aden = 0 THEN NULL
        |  ELSE CAST((aden - (3 * CAST(n_items AS HUGEINT) - 1) * d_obs)
        |    * 1000000 // aden AS BIGINT) END AS alpha_ppm
        |FROM d""".stripMargin,

    "fleiss_kappa" ->
      """WITH r AS (
        |  SELECT (CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END
        |    + CASE WHEN len(list_filter(string_split_regex(text, '\s+'),
        |        x -> x != '')) >= 80 THEN 1 ELSE 0 END
        |    + CASE WHEN len(list_distinct(list_filter(
        |        string_split_regex(text, '\s+'), x -> x != ''))) >= 60
        |      THEN 1 ELSE 0 END) AS pos
        |  FROM documents),
        |m AS (
        |  SELECT count(*) AS n_items,
        |    CAST(sum(pos) AS BIGINT) AS s_pos,
        |    CAST(sum(pos * pos + (3 - pos) * (3 - pos) - 3) AS BIGINT) AS sum_a
        |  FROM r)
        |, d AS (
        |  SELECT *, 18 * CAST(n_items AS HUGEINT) * n_items
        |      - 2 * CAST(s_pos AS HUGEINT) * s_pos
        |      - 2 * (3 * CAST(n_items AS HUGEINT) - s_pos)
        |          * (3 * CAST(n_items AS HUGEINT) - s_pos) AS fden
        |  FROM m)
        |SELECT n_items, s_pos, sum_a,
        |  CASE WHEN fden = 0 THEN NULL
        |  ELSE CAST((3 * CAST(n_items AS HUGEINT) * sum_a
        |      - 2 * CAST(s_pos AS HUGEINT) * s_pos
        |      - 2 * (3 * CAST(n_items AS HUGEINT) - s_pos)
        |          * (3 * CAST(n_items AS HUGEINT) - s_pos)) * 1000000
        |    // fden AS BIGINT) END AS kappa_ppm
        |FROM d""".stripMargin,

    "cohens_kappa" ->
      """WITH r AS (
        |  SELECT CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS a,
        |    CASE WHEN len(list_filter(string_split_regex(text, '\s+'),
        |      x -> x != '')) >= 80 THEN 1 ELSE 0 END AS b
        |  FROM documents),
        |m AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(a * b) AS BIGINT) AS n11,
        |    CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
        |    CAST(sum((1 - a) * b) AS BIGINT) AS n01,
        |    CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
        |  FROM r)
        |, d AS (
        |  SELECT *, CAST(n AS HUGEINT) * n
        |      - (n11 + n10) * CAST(n11 + n01 AS HUGEINT)
        |      - (n01 + n00) * CAST(n10 + n00 AS HUGEINT) AS kden
        |  FROM m)
        |SELECT n, n11, n10, n01, n00,
        |  (n11 + n00) * 1000000 // greatest(n, 1) AS po_ppm,
        |  CAST(((n11 + n10) * CAST(n11 + n01 AS HUGEINT)
        |      + (n01 + n00) * CAST(n10 + n00 AS HUGEINT)) * 1000000
        |    // greatest(CAST(n AS HUGEINT) * n, 1) AS BIGINT) AS pe_ppm,
        |  CASE WHEN kden = 0 THEN NULL
        |  ELSE CAST((CAST(n AS HUGEINT) * (n11 + n00)
        |      - (n11 + n10) * CAST(n11 + n01 AS HUGEINT)
        |      - (n01 + n00) * CAST(n10 + n00 AS HUGEINT)) * 1000000
        |    // kden AS BIGINT) END AS kappa_ppm
        |FROM d""".stripMargin,

    "mcnemar_test" ->
      """WITH r AS (
        |  SELECT CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS a,
        |    CASE WHEN len(list_filter(string_split_regex(text, '\s+'),
        |      x -> x != '')) >= 80 THEN 1 ELSE 0 END AS b
        |  FROM documents),
        |m AS (
        |  SELECT CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
        |    CAST(sum((1 - a) * b) AS BIGINT) AS n01
        |  FROM r)
        |SELECT n10, n01,
        |  CAST((n10 - n01) * CAST(n10 - n01 AS HUGEINT) * 1000000
        |    // greatest(n10 + n01, 1) AS BIGINT) AS mcnemar_x1e6
        |FROM m""".stripMargin
  )
}
