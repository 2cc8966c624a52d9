package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based statistics over corpus-sized columns — both built on the
  * two-phase distributed position scan (no single-partition window):
  *
  *  - '''ECDF normalization''': each value's empirical quantile as an
  *    integer ppm (`rank0 · 10⁶ div (n−1)`) — the rank-transform
  *    feature-engineering step that makes any signal comparable across
  *    corpora.
  *  - '''Spearman correlation''' between two per-document signals:
  *    Pearson on DETERMINISTICALLY TIE-BROKEN ranks (row_number order
  *    (value, doc_id) — true Spearman averages tied ranks, which is
  *    fractional; the tie-broken variant is exact, engine-identical,
  *    and converges to Spearman as ties thin out; the choice is pinned
  *    here and in the oracle). Ranks are exact integers, so all five
  *    moments are integer sums (decimal(38,0) for the squares — rank²
  *    sums pass 2⁶³ near 3e6 docs) and only the final coefficient is
  *    one mirrored float expression rounded to 6 dp (the
  *    correlation_by_group discipline).
  */
object RankStats {

  /** (doc_id, v, ecdf_ppm) over a long column. */
  def ecdfNormalize(data: DataFrame, idCol: String, valueCol: String): DataFrame = {
    val pos = graft.ops.Offsets.globalPosition(
      data.select(col(idCol), col(valueCol).as("v")),
      Seq(col("v"), col(idCol)), "pos")
    val n = pos.agg(count(lit(1)).as("n"))
    pos.crossJoin(broadcast(n))
      .select(col(idCol), col("v"),
        expr("CASE WHEN n > 1 THEN pos * 1000000 div (n - 1) ELSE 0L END")
          .as("ecdf_ppm"))
  }

  /** One row: (n, s_ra, s_rb, s_rab, s_ra2, s_rb2, spearman) for the
    * tie-broken rank correlation of two long signals keyed by `idCol`.
    */
  def spearmanTieBroken(data: DataFrame, idCol: String,
                        aCol: String, bCol: String): DataFrame = {
    val ra = graft.ops.Offsets.globalPosition(
        data.select(col(idCol), col(aCol).as("a")),
        Seq(col("a"), col(idCol)), "ra")
      .select(col(idCol), col("ra"))
    val rb = graft.ops.Offsets.globalPosition(
        data.select(col(idCol), col(bCol).as("b")),
        Seq(col("b"), col(idCol)), "rb")
      .select(col(idCol), col("rb"))
    // rank² sums accumulate on decimal(38,0), but the OUTPUT columns
    // are cast back to BIGINT (round-9 finding: no DECIMAL in output
    // schemas). CEILING (round-10 advice): Σrank² ≈ n³/3 exceeds 2⁶³
    // past ~3.0e6 joined rows — NOT a comfortable margin — and Spark's
    // non-ANSI cast would wrap SILENTLY there while DuckDB's
    // CAST(HUGEINT AS BIGINT) hard-errors. The checked cast below makes
    // the Spark side fail as loudly as the oracle side: past the
    // ceiling, switch to [[spearmanBucketed]] — the registered
    // coarse-rank-bucket rescale (spearman_bucketed).
    def checkedLong(c: String, name: String) =
      when(abs(col(c)) > lit(Long.MaxValue).cast("decimal(38,0)"),
        raise_error(lit(s"spearman: $name exceeds BIGINT (n ≳ 3e6 joined " +
          "rows) — rescale the rank sums upstream")))
        .otherwise(col(c).cast("long"))
    ra.join(rb, idCol)
      .agg(count(lit(1)).as("n"),
        sum(col("ra")).as("s_ra"), sum(col("rb")).as("s_rb"),
        sum((col("ra") * col("rb")).cast("decimal(38,0)")).as("_rab"),
        sum((col("ra") * col("ra")).cast("decimal(38,0)")).as("_ra2"),
        sum((col("rb") * col("rb")).cast("decimal(38,0)")).as("_rb2"))
      .select(col("n"), col("s_ra"), col("s_rb"),
        checkedLong("_rab", "s_rab").as("s_rab"),
        checkedLong("_ra2", "s_ra2").as("s_ra2"),
        checkedLong("_rb2", "s_rb2").as("s_rb2"))
      .withColumn("spearman", round(
        (col("n").cast("double") * col("s_rab").cast("double") -
          col("s_ra").cast("double") * col("s_rb").cast("double")) /
          (sqrt(col("n").cast("double") * col("s_ra2").cast("double") -
            col("s_ra").cast("double") * col("s_ra").cast("double")) *
            sqrt(col("n").cast("double") * col("s_rb2").cast("double") -
              col("s_rb").cast("double") * col("s_rb").cast("double"))), 6))
  }

  /** Bucketed Spearman — the registered fallback the
    * [[spearmanTieBroken]] ceiling comment promises: rescale each
    * signal to `buckets` equidepth rank buckets (bucket = pos·B div n,
    * the ecdf discretization) and correlate the BUCKET ids. With
    * B = 1000 the moment sums obey Σb² ≤ n·B² ≈ n·10⁶, so the BIGINT
    * ceiling moves from ~3e6 rows to ~9e12 — past any single-table
    * corpus this engine targets — at the cost of quantizing the rank
    * signal to 1/B resolution (the estimate converges to Spearman at
    * O(1/B), far below the 6-dp rounding for B = 1000). Same two-phase
    * distributed position scan, no single-partition stage; the row
    * count joins as a 1-row broadcast.
    */
  def spearmanBucketed(data: DataFrame, idCol: String, aCol: String,
                       bCol: String, buckets: Int = 1000): DataFrame = {
    def bucketed(valueCol: String, out: String) = {
      val pos = graft.ops.Offsets.globalPosition(
        data.select(col(idCol), col(valueCol).as("v")),
        Seq(col("v"), col(idCol)), "pos")
      val n = pos.agg(count(lit(1)).as("n"))
      pos.crossJoin(broadcast(n))
        .select(col(idCol), expr(s"pos * $buckets div n").as(out))
    }
    bucketed(aCol, "ba").join(bucketed(bCol, "bb"), idCol)
      .agg(count(lit(1)).as("n"),
        sum(col("ba")).as("s_ra"), sum(col("bb")).as("s_rb"),
        sum(col("ba") * col("bb")).as("s_rab"),
        sum(col("ba") * col("ba")).as("s_ra2"),
        sum(col("bb") * col("bb")).as("s_rb2"))
      .withColumn("spearman", round(
        (col("n").cast("double") * col("s_rab").cast("double") -
          col("s_ra").cast("double") * col("s_rb").cast("double")) /
          (sqrt(col("n").cast("double") * col("s_ra2").cast("double") -
            col("s_ra").cast("double") * col("s_ra").cast("double")) *
            sqrt(col("n").cast("double") * col("s_rb2").cast("double") -
              col("s_rb").cast("double") * col("s_rb").cast("double"))), 6))
  }

  /** Quantile normalization — map signal `fromCol` onto the empirical
    * distribution of signal `ontoCol` (the cross-corpus feature
    * alignment trick: after mapping, the two signals have IDENTICAL
    * marginals). Rank both signals with the deterministic tie-broken
    * two-phase scan and join on rank: row with the r-th smallest
    * `from` value receives the r-th smallest `onto` value. Two range
    * shuffles + one equi-join on the dense rank — exact integers
    * throughout, no single-partition stage.
    */
  def quantileNormalize(data: DataFrame, idCol: String,
                        fromCol: String, ontoCol: String): DataFrame = {
    val ra = graft.ops.Offsets.globalPosition(
      data.select(col(idCol), col(fromCol).as("v")),
      Seq(col("v"), col(idCol)), "pos")
    val rb = graft.ops.Offsets.globalPosition(
        data.select(col(idCol), col(ontoCol).as("w")),
        Seq(col("w"), col(idCol)), "pos")
      .select(col("pos"), col("w").as("qnorm"))
    ra.join(rb, "pos").select(col(idCol), col("v"), col("qnorm"))
  }

  /** Recency-weighted (time-decayed) revenue per user with INTEGER
    * half-life decay: weight = 2^(−age/halflife) realized as
    * `1024 div 2^k` with k = age div halflife capped at 10 — a
    * power-of-2 decay needs no transcendental, so the whole decayed
    * score is hash-exact at the 1024 scale. The standard recency
    * feature in ranking/churn models, minus the float drift. One
    * 1-row broadcast ("now") + one user-keyed aggregate.
    */
  def timeDecayRevenue(events: DataFrame, halflifeDays: Int = 7): DataFrame = {
    val hlUs = halflifeDays * 86400000000L
    val now = events.agg(max(col("ts_us")).as("now_us"))
    events.crossJoin(broadcast(now))
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents"),
        least(expr(s"(now_us - ts_us) div $hlUs"), lit(10L)).as("k"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents")).as("cents_total"),
        sum(expr("cents * 1024 div shiftleft(1L, CAST(k AS INT))"))
          .as("decayed_cents_x1024"))
  }

  /** Gini coefficient of a nonnegative value column — revenue/activity
    * concentration ("do 1% of users carry 60% of spend?"), the scalar
    * the Pareto table summarizes. Rank form on the deterministic
    * two-phase scan:
    *
    *   gini = (2·Σ rankᵢ·xᵢ − (n+1)·Σx) / (n·Σx),  ranks 1..n asc
    *
    * — integer-exact ppm; the rank-weighted sum rides decimal(38,0)
    * (rank·x tops 2⁶³ beyond ~10⁶ rows × 10⁷ cents). One range
    * shuffle + one aggregate.
    */
  def giniCoefficient(data: DataFrame, idCol: String, valueCol: String): DataFrame = {
    val pos = graft.ops.Offsets.globalPosition(
      data.select(col(idCol), col(valueCol).as("x")),
      Seq(col("x"), col(idCol)), "pos")
    pos.agg(count(lit(1)).as("n"), sum(col("x")).as("sum_x"),
        sum((col("pos") + 1).cast("decimal(38,0)") * col("x")).as("_rx"))
      .select(col("n"), col("sum_x"),
        // greatest(...,1) guard (round-10 advice): an empty or all-zero
        // input zeroes n·Σx, where Spark div yields NULL but DuckDB //
        // errors — the established mcnemar/bootstrap guard, mirrored in
        // the oracle
        expr("""CAST((2 * _rx - (n + 1) * CAST(sum_x AS DECIMAL(38,0)))
               * 1000000 div greatest(CAST(n AS DECIMAL(38,0)) * sum_x, 1)
               AS BIGINT)""").as("gini_ppm"))
  }

  /** Mann–Whitney U for two samples keyed by a binary `variant` column:
    * pooled deterministic tie-broken ranks (1-based), then
    * `U_a = R_a − n_a(n_a+1)/2` — all exact integers (the same
    * tie-break caveat as [[spearmanTieBroken]], pinned in the oracle).
    * Emits both U statistics (U_a + U_b = n_a·n_b, asserted by the
    * arithmetic itself) plus the integer inputs a consumer needs for
    * the normal approximation.
    */
  def mannWhitneyU(data: DataFrame, idCol: String, variantCol: String,
                   valueCol: String): DataFrame = {
    val ranked = graft.ops.Offsets.globalPosition(
        data.select(col(idCol), col(variantCol).as("variant"),
          col(valueCol).as("v")),
        Seq(col("v"), col(idCol)), "pos")
      .select(col("variant"), (col("pos") + 1).as("rank"))
    ranked.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("rank")).as("rank_sum"))
      .select(col("variant"), col("n"), col("rank_sum"),
        expr("rank_sum - n * (n + 1) div 2").as("u_stat"))
  }

  /** AUC as the normalized Mann–Whitney U — the standard identity
    * AUC = U₁/(n₀·n₁): "probability a random variant-1 value ranks
    * above a random variant-0 value", the model-evaluation readout
    * (here over an A/A-style md5 split, so ≈ 0.5 — a null-test
    * calibration). Exact integer ppm; the product rides decimal
    * (n₀·n₁·10⁶ passes 2⁶³ near 3e6 rows/side).
    */
  def aucMannWhitney(data: DataFrame, idCol: String, variantCol: String,
                     valueCol: String): DataFrame = {
    mannWhitneyU(data, idCol, variantCol, valueCol)
      .agg(sum(when(col("variant") === 1, col("n"))).as("n1"),
        sum(when(col("variant") === 0, col("n"))).as("n0"),
        sum(when(col("variant") === 1, col("u_stat"))).as("u1"))
      .select(col("n1"), col("n0"),
        expr("""CAST(CAST(u1 AS DECIMAL(38,0)) * 1000000
               div greatest(CAST(n1 AS DECIMAL(38,0)) * n0, 1)
               AS BIGINT)""").as("auc_ppm"))
  }

  /** Kruskal–Wallis H — the k-group rank ANOVA (the nonparametric
    * sibling of Stats.anovaFOneway, as Mann–Whitney is of the t-test),
    * with PROPER MIDRANKS for ties: unlike [[mannWhitneyU]]'s
    * deterministic tie-break (fine for U, which only needs a pinned
    * total order), H is quadratic in rank sums, so tie-broken ranks
    * would bias it — midranks are the textbook treatment. Ranks stay
    * integral by carrying DOUBLED midranks: for a value v with count c
    * and `cum` values ≤ v, r2(v) = 2·(cum−c) + c + 1 = 2·midrank.
    *
    *   H  = 12/(n(n+1)) · Σ R_g²/n_g − 3(n+1),  R_g²/n_g = R2_g² / (4n_g)
    *   C  = 1 − Σ(t³−t)/(n³−n)   (tie correction),  H_corr = H/C
    *
    * Staged integer rationals throughout, with each group's term
    * divided by the FULL denominator in one pinned step
    * (`t_g = R2_g²·10⁶ div (4·n_g·n·(n+1))`, so
    * `h_x1e6 = 12·Σt_g − 3(n+1)·10⁶`): the quotient lives at the final
    * H·10⁶ scale — a partial division like `R2_g²·10⁶ div 4n_g` leaves
    * an ≈ n_g·n²·10⁶ intermediate that blows past 2⁶³ around 10⁵ rows
    * (Spark's integral `div` returns LONG; measured as an ANSI
    * ARITHMETIC_OVERFLOW at sf0.1) — while the staging bias stays at
    * k ppm. Numerators ride decimal(38,0) — R2_g²·10⁶ ≈ 4n⁴·10⁶ passes
    * 38 digits near n ≈ 10⁷ rows, the documented ceiling (past it,
    * bucket the measure first).
    * All ties (every value distinct ⇒ C = 1) and the degenerate n ≤ 1
    * / all-one-value pool pin NULL via greatest-guards.
    *
    * 100 TB shape: one aggregate per (group, value) and one per value —
    * both bounded by the VALUE ALPHABET × k, not the data (the
    * pr_curve/seasonality bounded-frame discipline; a continuous
    * measure gets equidepth-binned first). The rank window runs over
    * the value alphabet; the alphabet table broadcasts to the
    * per-group join.
    */
  def kruskalWallisH(data: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val vals = data.select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
    val perVal = vals.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val wOrd = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = perVal.withColumn("_cum", sum(col("cnt")).over(wOrd))
      .select(col("v"), col("cnt"),
        (lit(2L) * (col("_cum") - col("cnt")) + col("cnt") + lit(1L)).as("r2"))
    val byG = vals.groupBy(col("g"), col("v")).agg(count(lit(1)).as("c_gv"))
      .join(broadcast(ranked.select(col("v"), col("r2"))), "v")
      .groupBy(col("g"))
      .agg(sum(col("c_gv")).as("n_g"), sum(col("c_gv") * col("r2")).as("r2_sum"))
    val ties = ranked.agg(
      sum(expr("CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt")).as("_tie3"),
      sum(col("cnt")).as("_ntot"))
    val scal = byG.crossJoin(broadcast(ties))
      .agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        max(col("_tie3")).as("_tie3"),
        sum(expr(
          """CAST(r2_sum AS DECIMAL(38,0)) * r2_sum * 1000000
            | div (4 * CAST(n_g AS DECIMAL(38,0)) * _ntot * (_ntot + 1))"""
            .stripMargin)).as("_tsum"))
      .withColumn("h_x1e6", expr(
        "12 * _tsum - 3 * (n + 1) * 1000000"))
      .withColumn("_cnum", expr(
        "CAST(n AS DECIMAL(38,0)) * n * n - n - _tie3"))
      .select(col("k"), col("n"), col("h_x1e6"),
        expr("""CASE WHEN _cnum <= 0 THEN CAST(NULL AS BIGINT)
               ELSE CAST(CAST(h_x1e6 AS DECIMAL(38,0))
                 * (CAST(n AS DECIMAL(38,0)) * n * n - n)
                 div _cnum AS BIGINT) END""").as("hc_x1e6"))
    // per-group rank sums + the global statistic on each row (the
    // 1-row broadcast cross join — the sanctioned scalar pattern)
    byG.crossJoin(broadcast(scal))
      .select(col("g"), col("n_g"), col("r2_sum"),
        col("k"), col("n"), col("h_x1e6"), col("hc_x1e6"))
  }

  val queries: Map[String, Q] = Map(
    // does event value rank differently across the five event types?
    // (midrank k-group rank ANOVA over the bounded cents alphabet)
    "kruskal_wallis_h" -> ((s, dir) =>
      kruskalWallisH(
        Tables.events(s, dir)
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents")),
        "event_type", "cents")),

    // AUC of purchase value separating the md5 A/B arms (≈ 0.5 — the
    // null-test calibration every experimentation stack should run)
    "abtest_auc" -> ((s, dir) =>
      aucMannWhitney(
        Tables.events(s, dir).where(col("event_type") === "purchase")
          .select(col("event_id"),
            (expr("conv(substring(md5(cast(user_id AS STRING)), 1, 4), 16, 10)")
              .cast("long") % 2).as("variant"),
            round(col("value") * 100).cast("long").as("cents")),
        "event_id", "variant", "cents")),

    // two-sample rank test over the md5 A/B split of purchase values
    "mannwhitney_u" -> ((s, dir) =>
      mannWhitneyU(
        Tables.events(s, dir).where(col("event_type") === "purchase")
          .select(col("event_id"),
            (expr("conv(substring(md5(cast(user_id AS STRING)), 1, 4), 16, 10)")
              .cast("long") % 2).as("variant"),
            round(col("value") * 100).cast("long").as("cents")),
        "event_id", "variant", "cents")),

    // rank-transform document length to empirical quantiles
    "ecdf_normalize" -> ((s, dir) =>
      ecdfNormalize(Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars")), "doc_id", "n_chars")),

    // recency-weighted purchase value per user, 7-day half-life
    "time_decay_revenue" -> ((s, dir) =>
      timeDecayRevenue(
        Tables.events(s, dir).where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_us"), col("value")),
        halflifeDays = 7)),

    // how concentrated is purchase revenue across users?
    "gini_coefficient" -> ((s, dir) =>
      giniCoefficient(
        Tables.events(s, dir).where(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(sum(round(col("value") * 100).cast("long")).as("cents")),
        "user_id", "cents")),

    // map each document's char count onto the token-count distribution
    // — after this, "length in chars" is measured in token units
    "quantile_normalize" -> ((s, dir) =>
      quantileNormalize(
        Tables.documents(s, dir).select(col("doc_id"), col("n_chars"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens")),
        "doc_id", "n_chars", "n_tokens")
        .withColumnRenamed("v", "n_chars")
        .withColumnRenamed("qnorm", "qnorm_tokens")),

    // do longer documents carry more tokens? (rank correlation of the
    // two document size signals — a monotonicity check, near 1.0)
    "spearman_doc_signals" -> ((s, dir) =>
      spearmanTieBroken(
        Tables.documents(s, dir).select(col("doc_id"), col("n_chars"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens")),
        "doc_id", "n_chars", "n_tokens")),

    // the same monotonicity check through the B = 1000 rank-bucket
    // rescale — the operator that still answers past the exact
    // variant's ~3e6-row BIGINT ceiling
    "spearman_bucketed" -> ((s, dir) =>
      spearmanBucketed(
        Tables.documents(s, dir).select(col("doc_id"), col("n_chars"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens")),
        "doc_id", "n_chars", "n_tokens", buckets = 1000))
  )

  val oracleSql: Map[String, String] = Map(
    "kruskal_wallis_h" ->
      """WITH v AS (
        |  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |perval AS (
        |  SELECT cents, count(*) AS cnt FROM v GROUP BY cents),
        |ranked AS (
        |  SELECT cents, cnt,
        |    2 * (sum(cnt) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
        |      + cnt + 1 AS r2
        |  FROM perval),
        |byg AS (
        |  SELECT g, CAST(sum(c_gv) AS BIGINT) AS n_g,
        |    CAST(sum(c_gv * r2) AS BIGINT) AS r2_sum
        |  FROM (SELECT g, cents, count(*) AS c_gv FROM v GROUP BY g, cents) gv
        |  JOIN ranked USING (cents) GROUP BY g),
        |ties AS (
        |  SELECT sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie3
        |  FROM ranked),
        |scal AS (
        |  SELECT count(*) AS k, CAST(sum(n_g) AS BIGINT) AS n,
        |    sum(CAST(r2_sum AS HUGEINT) * r2_sum * 1000000
        |      // (4 * CAST(n_g AS HUGEINT) * ntot * (ntot + 1))) AS tsum
        |  FROM byg, (SELECT CAST(sum(cnt) AS BIGINT) AS ntot FROM ranked) nt),
        |h AS (
        |  SELECT k, n,
        |    CAST(12 * tsum - 3 * (n + 1) * 1000000 AS BIGINT) AS h_x1e6,
        |    CAST(n AS HUGEINT) * n * n - n - tie3 AS cnum
        |  FROM scal, ties)
        |SELECT g, n_g, r2_sum, k, n, h_x1e6,
        |  CASE WHEN cnum <= 0 THEN NULL
        |  ELSE CAST(CAST(h_x1e6 AS HUGEINT)
        |    * (CAST(n AS HUGEINT) * n * n - n) // cnum AS BIGINT)
        |  END AS hc_x1e6
        |FROM byg, h""".stripMargin,

    "abtest_auc" ->
      """WITH v AS (
        |  SELECT event_id,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
        |      AS BIGINT) % 2 AS variant,
        |    CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT variant,
        |    row_number() OVER (ORDER BY cents, event_id) AS rank
        |  FROM v),
        |u AS (
        |  SELECT variant, count(*) AS n,
        |    CAST(sum(rank) - count(*) * (count(*) + 1) // 2 AS BIGINT) AS u_stat
        |  FROM r GROUP BY variant)
        |SELECT
        |  CAST(sum(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n1,
        |  CAST(sum(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n0,
        |  CAST(CAST(sum(CASE WHEN variant = 1 THEN u_stat END) AS HUGEINT)
        |    * 1000000
        |    // greatest(CAST(sum(CASE WHEN variant = 1 THEN n END) AS HUGEINT)
        |        * sum(CASE WHEN variant = 0 THEN n END), 1) AS BIGINT) AS auc_ppm
        |FROM u""".stripMargin,

    "mannwhitney_u" ->
      """WITH v AS (
        |  SELECT event_id,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
        |      AS BIGINT) % 2 AS variant,
        |    CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT variant,
        |    row_number() OVER (ORDER BY cents, event_id) AS rank
        |  FROM v)
        |SELECT variant, count(*) AS n,
        |  CAST(sum(rank) AS BIGINT) AS rank_sum,
        |  CAST(sum(rank) - count(*) * (count(*) + 1) // 2 AS BIGINT) AS u_stat
        |FROM r GROUP BY variant""".stripMargin,

    "ecdf_normalize" ->
      """WITH pos AS (
        |  SELECT doc_id, n_chars AS v,
        |    row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS pos,
        |    count(*) OVER () AS n
        |  FROM documents)
        |SELECT doc_id, v,
        |  CASE WHEN n > 1 THEN pos * 1000000 // (n - 1) ELSE 0 END AS ecdf_ppm
        |FROM pos""".stripMargin,

    "time_decay_revenue" ->
      """WITH v AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |n AS (SELECT max(ts_us) AS now_us FROM v),
        |k AS (
        |  SELECT user_id, cents,
        |    least((now_us - ts_us) // 604800000000, 10) AS k
        |  FROM v, n)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(cents) AS BIGINT) AS cents_total,
        |  CAST(sum(cents * 1024 // (1 << k)) AS BIGINT) AS decayed_cents_x1024
        |FROM k GROUP BY user_id""".stripMargin,

    "gini_coefficient" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |r AS (
        |  SELECT cents AS x,
        |    row_number() OVER (ORDER BY cents, user_id) AS rnk
        |  FROM u),
        |m AS (
        |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sum_x,
        |    CAST(sum(CAST(rnk AS HUGEINT) * x) AS HUGEINT) AS rx
        |  FROM r)
        |SELECT n, sum_x,
        |  CAST((2 * rx - (n + 1) * CAST(sum_x AS HUGEINT)) * 1000000
        |    // greatest(CAST(n AS HUGEINT) * sum_x, 1) AS BIGINT) AS gini_ppm
        |FROM m""".stripMargin,

    "quantile_normalize" ->
      """WITH sig AS (
        |  SELECT doc_id, n_chars,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'),
        |      x -> x != '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |ra AS (
        |  SELECT doc_id, n_chars AS v,
        |    row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS pos
        |  FROM sig),
        |rb AS (
        |  SELECT row_number() OVER (ORDER BY n_tokens, doc_id) - 1 AS pos,
        |    n_tokens AS qnorm
        |  FROM sig)
        |SELECT doc_id, v AS n_chars, qnorm AS qnorm_tokens
        |FROM ra JOIN rb USING (pos)""".stripMargin,

    "spearman_doc_signals" ->
      """WITH sig AS (
        |  SELECT doc_id, n_chars,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'),
        |      x -> x != '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |ra AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS ra
        |  FROM sig),
        |rb AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY n_tokens, doc_id) - 1 AS rb
        |  FROM sig),
        |m AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(ra) AS BIGINT) AS s_ra, CAST(sum(rb) AS BIGINT) AS s_rb,
        |    CAST(sum(CAST(ra AS HUGEINT) * rb) AS BIGINT) AS s_rab,
        |    CAST(sum(CAST(ra AS HUGEINT) * ra) AS BIGINT) AS s_ra2,
        |    CAST(sum(CAST(rb AS HUGEINT) * rb) AS BIGINT) AS s_rb2
        |  FROM ra JOIN rb USING (doc_id))
        |SELECT n, s_ra, s_rb, s_rab, s_ra2, s_rb2,
        |  round((CAST(n AS DOUBLE) * CAST(s_rab AS DOUBLE) -
        |      CAST(s_ra AS DOUBLE) * CAST(s_rb AS DOUBLE)) /
        |    (sqrt(CAST(n AS DOUBLE) * CAST(s_ra2 AS DOUBLE) -
        |        CAST(s_ra AS DOUBLE) * CAST(s_ra AS DOUBLE)) *
        |      sqrt(CAST(n AS DOUBLE) * CAST(s_rb2 AS DOUBLE) -
        |        CAST(s_rb AS DOUBLE) * CAST(s_rb AS DOUBLE))), 6) AS spearman
        |FROM m""".stripMargin,

    "spearman_bucketed" ->
      """WITH sig AS (
        |  SELECT doc_id, n_chars,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'),
        |      x -> x != '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |ra AS (
        |  SELECT doc_id,
        |    (row_number() OVER (ORDER BY n_chars, doc_id) - 1) * 1000
        |      // count(*) OVER () AS ba
        |  FROM sig),
        |rb AS (
        |  SELECT doc_id,
        |    (row_number() OVER (ORDER BY n_tokens, doc_id) - 1) * 1000
        |      // count(*) OVER () AS bb
        |  FROM sig),
        |m AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(ba) AS BIGINT) AS s_ra, CAST(sum(bb) AS BIGINT) AS s_rb,
        |    CAST(sum(ba * bb) AS BIGINT) AS s_rab,
        |    CAST(sum(ba * ba) AS BIGINT) AS s_ra2,
        |    CAST(sum(bb * bb) AS BIGINT) AS s_rb2
        |  FROM ra JOIN rb USING (doc_id))
        |SELECT n, s_ra, s_rb, s_rab, s_ra2, s_rb2,
        |  round((CAST(n AS DOUBLE) * CAST(s_rab AS DOUBLE) -
        |      CAST(s_ra AS DOUBLE) * CAST(s_rb AS DOUBLE)) /
        |    (sqrt(CAST(n AS DOUBLE) * CAST(s_ra2 AS DOUBLE) -
        |        CAST(s_ra AS DOUBLE) * CAST(s_ra AS DOUBLE)) *
        |      sqrt(CAST(n AS DOUBLE) * CAST(s_rb2 AS DOUBLE) -
        |        CAST(s_rb AS DOUBLE) * CAST(s_rb AS DOUBLE))), 6) AS spearman
        |FROM m""".stripMargin
  )
}
