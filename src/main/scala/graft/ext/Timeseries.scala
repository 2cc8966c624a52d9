package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series analytics beyond the windowed aggregates: CUSUM
  * changepoint detection and linear gap interpolation — the two
  * monitoring primitives a training-data ingest pipeline runs over its
  * own arrival streams (drift in a feed's value distribution; dense
  * reconstructions of sparse per-minute meters).
  *
  * Both are integer-exact by construction so the DuckDB oracle
  * reproduces them bit-for-bit; see each method for the trick.
  */
object Timeseries {

  /** Two-sided CUSUM (Page, Biometrika 1954) per key over an ordered
    * value stream, in EXACT integer arithmetic.
    *
    * The textbook recursion S⁺ᵢ = max(0, S⁺ᵢ₋₁ + dᵢ) is not a window
    * aggregate, but its closed form is: with Pᵢ = Σ_{j≤i} dⱼ (P₀ = 0),
    *
    *   S⁺ᵢ = Pᵢ − min_{0≤j≤i} Pⱼ      S⁻ᵢ = max_{0≤j≤i} Pⱼ − Pᵢ
    *
    * so the whole detector is ONE running sum plus a running min and
    * max over the same per-key ordered window — a single shuffle on
    * the key, three frame-shared window aggregates, no recursion and
    * no driver state. (Proof: unrolling the recursion gives
    * S⁺ᵢ = max_{j≤i} Σ_{k=j..i} dₖ ∨ 0 = Pᵢ − min(P_{j−1}) ∨ Pᵢ − Pᵢ.)
    *
    * Exactness: the deviation dᵢ = xᵢ − mean(x) would need a division;
    * instead each row carries the n-SCALED deviation n·xᵢ − Σx (long),
    * which has the same sign structure and scales both CUSUM curves by
    * the constant n — alarms at threshold h become alarms at n·h, and
    * every value is a sum/min/max of longs, identical in any engine.
    * Magnitudes stay in long range while n·Σ|x| < 2⁶³ (≈9e18); per-key
    * streams beyond ~1e7 rows at cent resolution should switch the two
    * running aggregates to decimal(38,0) — same plan, wider type.
    *
    * Output: one row per event with both scaled curves; the caller
    * thresholds (an alarm list is a `where` away, but the curves are
    * the operator).
    */
  def cusum(events: DataFrame, key: String, orderCols: Seq[String],
            valueCol: String): DataFrame = {
    val stats = events.groupBy(col(key))
      .agg(count(lit(1)).as("n_key"), sum(col(valueCol)).as("total_key"))
    val w = Window.partitionBy(col(key))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      // stats is KEY-cardinality — small enough that Catalyst broadcasts
      // it from stats when keys are few (the events fixture: 5), but a
      // forced broadcast would be a footgun at 1e9 keys, so the choice
      // stays with the optimizer; the join shares the window's key
      // partitioning either way
      .join(stats, key)
      .withColumn("d_scaled", col("n_key") * col(valueCol) - col("total_key"))
      .withColumn("p", sum(col("d_scaled")).over(w))
      .withColumn("cusum_pos", col("p") - least(lit(0L), min(col("p")).over(w)))
      .withColumn("cusum_neg", greatest(lit(0L), max(col("p")).over(w)) - col("p"))
  }

  /** Dense per-minute linear interpolation per key: every minute from
    * the key's first to its last OBSERVED minute carries a value —
    * observed minutes their own aggregate, missing minutes the linear
    * interpolation between the surrounding observed minutes:
    *
    *   v(t) = v_prev + trunc((v_next − v_prev)·(t − t_prev) / (t_next − t_prev))
    *
    * (integer division truncating toward zero — the semantics Spark's
    * `div` and DuckDB's integer `//` share, measured here on negative
    * numerators: both yield −4 for −13/3 — so the rounded value is
    * engine-identical on rising and falling segments alike).
    *
    * 100 TB shape — the neighbour lookup deliberately avoids
    * IGNORE-NULLS navigation windows: each grid row gets the RUNNING
    * COUNT of observed rows at-or-before it (one per-key window), which
    * IS the index of its predecessor in the observed sequence; the
    * previous/next observed points then arrive by two equi-joins
    * against the row_number-indexed observed table on (key, idx) /
    * (key, idx+1). Windows and joins all share the key partitioning;
    * grid size is bounded by time span × keys, not event count (the
    * `timeseries_gap_fill` argument).
    */
  def interpolateMinutes(events: DataFrame, key: String,
                         minuteCol: String, valueCol: String): DataFrame = {
    val obs = events.groupBy(col(key), col(minuteCol).as("minute"))
      .agg(sum(col(valueCol)).as("v"))
    val grid = obs.groupBy(col(key))
      .agg(min(col("minute")).as("mn"), max(col("minute")).as("mx"))
      .select(col(key), explode(sequence(col("mn"), col("mx"))).as("minute"))
    val g = grid.join(obs, Seq(key, "minute"), "left")
      .withColumn("is_observed", col("v").isNotNull)
    val wRun = Window.partitionBy(col(key)).orderBy(col("minute"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val indexed = g.withColumn("idx",
      sum(when(col("is_observed"), 1L).otherwise(0L)).over(wRun))
    val wObs = Window.partitionBy(col(key)).orderBy(col("minute"))
    val known = obs
      .withColumn("k", row_number().over(wObs).cast("long"))
      .select(col(key), col("k"), col("minute").as("m"), col("v").as("kv"))
    indexed
      .join(known.select(col(key), col("k").as("idx"),
        col("m").as("m_prev"), col("kv").as("v_prev")), Seq(key, "idx"))
      .join(known.select(col(key), (col("k") - 1L).as("idx"),
        col("m").as("m_next"), col("kv").as("v_next")), Seq(key, "idx"), "left")
      .withColumn("num", (col("v_next") - col("v_prev")) * (col("minute") - col("m_prev")))
      .withColumn("den", col("m_next") - col("m_prev"))
      .select(col(key), col("minute"),
        when(col("is_observed"), col("v"))
          .otherwise(col("v_prev") + expr("num div den")).as("v_interp"),
        col("is_observed"))
  }

  /** Additive seasonal decomposition v = trend + seasonal + residual
    * over a DENSE per-minute grid (the classical "decompose" of
    * monitoring stacks, in exact integer arithmetic):
    *
    *   trend(t)    = truncated mean of v over the centered ±`half`
    *                 minute window (a ROWS frame — the grid is dense,
    *                 so rows ARE minutes)
    *   seasonal(s) = truncated mean of v over the key's slot s =
    *                 minute mod `period`, minus the key's global
    *                 truncated mean (so seasonal components sum ≈ 0)
    *   residual    = v − trend − seasonal
    *
    * Every division is a truncating div of NON-NEGATIVE sums (counts
    * of events per minute are ≥ 0), so the decomposition is identical
    * in any engine. One minute-grid build (the `timeseries_gap_fill`
    * shape, span-bounded), one per-key ordered window for the trend,
    * one (key, slot) aggregate broadcast back — the slot table is
    * key-cardinality × period rows.
    */
  def seasonalDecompose(events: DataFrame, key: String, minuteCol: String,
                        valueCol: String, period: Int = 60,
                        half: Int = 30): DataFrame = {
    val obs = events.groupBy(col(key), col(minuteCol).as("minute"))
      .agg(sum(col(valueCol)).as("v"))
    val grid = obs.groupBy(col(key))
      .agg(min(col("minute")).as("mn"), max(col("minute")).as("mx"))
      .select(col(key), explode(sequence(col("mn"), col("mx"))).as("minute"))
    val dense = grid.join(obs, Seq(key, "minute"), "left")
      .select(col(key), col("minute"), coalesce(col("v"), lit(0L)).as("v"),
        (col("minute") % period).as("slot"))
      // referenced THREE times (global mean, slot means, the trend
      // window) — unpersisted, each reference re-ran the grid build +
      // densify join; released by the harness's per-query clearCache
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wTrend = Window.partitionBy(col(key)).orderBy(col("minute"))
      .rowsBetween(-half, half)
    val glob = dense.groupBy(col(key))
      .agg(expr("sum(v) div count(1)").as("g"))
    val slots = dense.groupBy(col(key), col("slot"))
      .agg(expr("sum(v) div count(1)").as("slot_mean"))
    dense
      .withColumn("tsum", sum(col("v")).over(wTrend))
      .withColumn("tcnt", count(lit(1)).over(wTrend))
      .withColumn("trend", expr("tsum div tcnt"))
      .join(broadcast(slots), Seq(key, "slot"))
      .join(broadcast(glob), Seq(key))
      .select(col(key), col("minute"), col("v"),
        col("trend"),
        (col("slot_mean") - col("g")).as("seasonal"),
        (col("v") - col("trend") - (col("slot_mean") - col("g"))).as("residual"))
  }

  /** Anomaly flags over the [[seasonalDecompose]] residuals: a minute
    * is anomalous when its residual deviates from the key's residual
    * median by more than `nMads` × MAD — the robust threshold that
    * survives the anomalies' own influence (mean/stddev do not).
    *
    * Integer-exact throughout: medians are LOWER medians selected by
    * rank (the `exact_median_selection` convention — no interpolation,
    * so any engine picks the same element), MAD is the lower median of
    * |r − med|, and the threshold compare is pure long arithmetic with
    * `greatest(mad, 1)` guarding the all-flat degenerate case. Two
    * rank-select rounds per key (windows share the key partitioning;
    * parallelism = key cardinality, the CUSUM note applies).
    */
  def seasonalAnomalies(decomposed: DataFrame, key: String,
                        nMads: Int = 3): DataFrame = {
    def lowerMedian(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val w = Window.partitionBy(col(key)).orderBy(col(valueCol), col("minute"))
      df.withColumn("_rn", row_number().over(w).cast("long"))
        .withColumn("_n", count(lit(1)).over(Window.partitionBy(col(key))))
        .where(col("_rn") === expr("(_n + 1) div 2"))
        .select(col(key), col(valueCol).as(out))
    }
    // decomposed feeds both the median chain and the deviation join,
    // and dev feeds both the MAD chain and the final filter — without
    // the pins the whole decomposition re-evaluates once per reference
    // (2×2 multiplicative), the Preference-fit lineage lesson
    val dec = decomposed
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = lowerMedian(dec, "residual", "med")
    val dev = dec.join(med, key)
      .withColumn("adev", abs(col("residual") - col("med")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mad = lowerMedian(dev, "adev", "mad")
    dev.join(mad, key)
      .where(col("adev") > lit(nMads.toLong) * greatest(col("mad"), lit(1L)))
      .select(col(key), col("minute"), col("v"), col("residual"),
        col("med"), col("mad"))
  }

  /** Theil–Sen trend estimator — the robust slope (median of all
    * pairwise slopes) of a daily aggregate series, immune to the
    * outlier days that wreck an OLS fit (up to ~29% contamination).
    * Slopes are pinned integer rationals: slope(i,j) = (y_j − y_i)·10⁶
    * div (day_j − day_i), truncation identical on both engines; the
    * median is the DISCRETE lower median (the element at rank
    * ⌈P/2⌉ of the P ascending slopes — even counts do NOT average,
    * which would leave the integer lattice). Row_number ties on equal
    * slope values are harmless: any stable order of the same multiset
    * puts the same VALUE at a given rank.
    *
    * 100 TB shape: the fact table collapses to one day-keyed aggregate
    * first, so the pairwise self-join is CALENDAR-bounded (d days →
    * d(d−1)/2 pairs — 10 years ≈ 6.7M pairs), constant in data volume;
    * the rank window runs over that bounded frame (the deciles /
    * calendar-days sanctioned pattern). Differences ride decimal(38,0)
    * (Δcents·10⁶ passes 2⁶³ near 9e12-cent days).
    */
  /** Per-bar OHLC over `ticks(day, ts_us, event_id, cents)`: open and
    * close are the first/last trade by the total (ts_us, event_id)
    * order via the integer struct-min/max trick (the dedup_keep_best
    * discipline — struct comparison is lexicographic in both engines,
    * so no window and no per-bar sort); high/low/volume are plain
    * aggregates. One map-side-combining bar-keyed aggregate.
    */
  def ohlcBars(ticks: DataFrame): DataFrame =
    ticks.groupBy(col("day")).agg(
      count(lit(1)).as("n_trades"),
      min(struct(col("ts_us"), col("event_id"), col("cents")))
        .getField("cents").as("open_cents"),
      max(col("cents")).as("high_cents"),
      min(col("cents")).as("low_cents"),
      max(struct(col("ts_us"), col("event_id"), col("cents")))
        .getField("cents").as("close_cents"),
      sum(col("cents")).as("volume_cents"))

  def theilSenTrend(daily: DataFrame, dayCol: String, valueCol: String): DataFrame = {
    val d = daily.select(col(dayCol).cast("long").as("day"),
      col(valueCol).cast("long").as("y"))
    val nDays = d.agg(count(lit(1)).as("n_days"))
    val slopes = d.as("i").join(d.as("j"), col("i.day") < col("j.day"))
      .select(expr(
        """CAST((CAST(j.y AS DECIMAL(38,0)) - i.y) * 1000000
          | div (j.day - i.day) AS BIGINT)""".stripMargin).as("slope_x1e6"))
    val w = Window.orderBy(col("slope_x1e6"))
    slopes
      .withColumn("_rn", row_number().over(w))
      .withColumn("n_pairs", count(lit(1)).over(Window.partitionBy()))
      .where(col("_rn") === expr("CAST((n_pairs + 1) div 2 AS INT)"))
      .crossJoin(broadcast(nDays))
      .select(col("n_days"), col("n_pairs"),
        col("slope_x1e6").as("slope_med_x1e6"))
  }

  val queries: Map[String, Q] = Map(
    // robust daily-revenue trend: median pairwise slope of the
    // day-keyed purchase cents series (cents/day, ×1e6)
    "theilsen_trend" -> ((s, dir) =>
      theilSenTrend(
        Tables.events(s, dir).where(col("event_type") === "purchase")
          .groupBy(expr("ts_us div 86400000000").as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).as("cents")),
        "day", "cents")),

    // Per-day OHLC bars over purchase cents — the canonical
    // downsampling of a tick stream to bar series: open/close are the
    // first/last trade by the total (ts, event_id) order via the
    // integer struct-min/max trick (the dedup_keep_best discipline —
    // no window, no per-day sort; struct comparison is lexicographic
    // in both engines), high/low/volume are plain aggregates. One
    // map-side-combining day-keyed aggregate.
    "timeseries_ohlc" -> ((s, dir) =>
      ohlcBars(Tables.events(s, dir)
        .where(col("event_type") === "purchase")
        .select(expr("ts_us div 86400000000").as("day"),
          col("ts_us"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents")))),

    // Hour-of-day × day-of-week traffic fingerprint — the seasonality
    // profile capacity planning and anomaly baselines start from: per
    // (dow, hour) cell, the event count and its exact ppm share of the
    // week grid. Pure epoch arithmetic (day 0 = Thursday, pinned), one
    // map-side-combined aggregate + a 1-row total broadcast.
    "seasonality_profile" -> ((s, dir) => {
      val cells = Tables.events(s, dir)
        .select(expr("pmod(ts_us div 86400000000 + 4, 7)").as("dow"),
          expr("pmod(ts_us, 86400000000) div 3600000000").as("hour"))
        .groupBy(col("dow"), col("hour")).agg(count(lit(1)).as("n"))
      val tot = cells.agg(sum(col("n")).as("n_total"))
      cells.crossJoin(broadcast(tot))
        .select(col("dow"), col("hour"), col("n"),
          expr("n * 1000000 div n_total").as("share_ppm"))
    }),
    // per-type CUSUM drift curves over the event stream, cent-resolution
    "changepoint_cusum" -> ((s, dir) =>
      cusum(
        Tables.events(s, dir).select(col("event_type"), col("event_id"),
          col("ts_us"), round(col("value") * 100).cast("long").as("cents")),
        key = "event_type", orderCols = Seq("ts_us", "event_id"),
        valueCol = "cents")
        .select(col("event_type"), col("event_id"), col("ts_us"),
          col("cusum_pos"), col("cusum_neg"))),

    // per-USER CUSUM — the keys-scaled face of the same detector: the
    // key cardinality rides the user population (the dimension a
    // production deployment actually grows in) while per-key depth is
    // one user's history, so both the window state here and the
    // streaming buffer in streaming_cusum_by_user stay bounded as the
    // corpus scales. The probe pair (streaming_cusum = depth-scaled,
    // streaming_cusum_by_user = keys-scaled) is the measured
    // depth-vs-keys decomposition of the cusum family's 10× curve.
    "changepoint_cusum_by_user" -> ((s, dir) =>
      cusum(
        Tables.events(s, dir).select(col("user_id"), col("event_id"),
          col("ts_us"), round(col("value") * 100).cast("long").as("cents")),
        key = "user_id", orderCols = Seq("ts_us", "event_id"),
        valueCol = "cents")
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("cusum_pos"), col("cusum_neg"))),

    // trend/seasonal/residual split of the per-type minute meters
    // (hour-of-day seasonality, +-30-minute trend window)
    "seasonal_decompose" -> ((s, dir) =>
      seasonalDecompose(
        Tables.events(s, dir).select(col("event_type"),
          expr("ts_us div 60000000").as("minute"),
          round(col("value") * 100).cast("long").as("cents")),
        key = "event_type", minuteCol = "minute", valueCol = "cents")),

    // robust anomaly flags on the decomposition residuals (3-MAD rule)
    "anomaly_seasonal_residual" -> ((s, dir) =>
      seasonalAnomalies(
        seasonalDecompose(
          Tables.events(s, dir).select(col("event_type"),
            expr("ts_us div 60000000").as("minute"),
            round(col("value") * 100).cast("long").as("cents")),
          key = "event_type", minuteCol = "minute", valueCol = "cents"),
        key = "event_type")),

    // dense per-type minute series, gaps linearly interpolated in cents
    "timeseries_interpolate" -> ((s, dir) =>
      interpolateMinutes(
        Tables.events(s, dir).select(col("event_type"),
          expr("ts_us div 60000000").as("minute"),
          round(col("value") * 100).cast("long").as("cents")),
        key = "event_type", minuteCol = "minute", valueCol = "cents")),

    // lag-1..7 autocorrelation of the daily event-count series —
    // integer moments (exact) plus the rounded coefficient. The
    // lag pairing is an equi-join of the daily series against itself
    // shifted by an exploded lag column (inner join: gap days pair
    // with nothing, identically in both engines), so there is no
    // ordered scan at all — at 100 TB the series table is
    // calendar-bounded and the join is a broadcast.
    "timeseries_autocorr" -> ((s, dir) => autocorrMoments(
      Tables.events(s, dir).select(expr("ts_us div 86400000000").as("day")),
      maxLag = 7)),

    // longest strictly-increasing run of the daily event-count series
    // per event type — gaps-and-islands on the sign of the day-over-day
    // delta: island id = running count of non-increasing steps, longest
    // island per type wins. One keyed window chain; series length is
    // calendar-bounded.
    "longest_increasing_streak" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(count(lit(1)).as("x"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("day"))
      val wCum = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      daily
        .withColumn("up",
          when(col("x") > lag(col("x"), 1).over(w) &&
            col("day") === lag(col("day"), 1).over(w) + 1, 0L).otherwise(1L))
        .withColumn("island", sum(col("up")).over(wCum))
        .groupBy(col("event_type"), col("island"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("event_type"))
        .agg(max(col("len")).as("longest_streak_days"))
    }),

    // open-interval concurrency curve (sweep line): each order is open
    // [orderdate, orderdate+7); +1/−1 boundary events aggregate per
    // day, the running sum is the number of simultaneously-open orders
    // — the backlog/occupancy curve. The only ordered stage runs over
    // the per-day delta series (calendar-bounded).
    "open_intervals_per_day" -> ((s, dir) => {
      val epoch = lit("1992-01-01").cast("date")
      val o = Tables.orders(s, dir)
        .select(datediff(col("o_orderdate"), epoch).cast("long").as("d0"))
      val deltas = o.select(col("d0").as("day"), lit(1L).as("delta"))
        .unionByName(o.select((col("d0") + 7).as("day"), lit(-1L).as("delta")))
        .groupBy(col("day")).agg(sum(col("delta")).as("net"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      deltas.withColumn("open_orders", sum(col("net")).over(w))
        .where(col("open_orders") > 0 || col("net") =!= 0)
    }),

    // time-weighted average value per event type (TWAP): each reading
    // holds until the next one, so its weight is the interval length —
    // the metric that is robust to irregular sampling where a plain
    // mean is not. Exact: Σ cents·Δt_ms div Σ Δt_ms, millisecond
    // weights to keep the weighted sum far from the long boundary
    // (cents ≤ 1e4 × Δms ≤ 1e8 × rows — audit in Scaladoc). One
    // user-keyless per-type window (5 keys — the documented per-key
    // parallelism bound of the cusum family; production keys by
    // feed × shard).
    "timeseries_twap" -> ((s, dir) => twapByKey(
      Tables.events(s, dir).select(col("event_type"), col("ts_us"),
        col("event_id"), round(col("value") * 100).cast("long").as("cents")),
      key = "event_type"))
  )

  /** Time-weighted average per `key`: ordered by (ts_us, event_id),
    * each row's value holds until the next row; emits (key,
    * n_intervals, sum_dt_ms, twap_cents = Σ v·Δt_ms div Σ Δt_ms).
    * The weighted sum accumulates in decimal(38,0) (per-row products
    * fit longs; their Σ does not at ~10⁷ day-gapped rows per key), so
    * the operator cannot wrap at any stream length. Σ Δt_ms itself is
    * telescoping — it equals the key's time span, never row-scaled.
    */
  def twapByKey(data: DataFrame, key: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col("ts_us"), col("event_id"))
    data
      .withColumn("next_ts", lead(col("ts_us"), 1).over(w))
      .where(col("next_ts").isNotNull)
      .withColumn("dt_ms", expr("(next_ts - ts_us) div 1000"))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dt_ms")).as("sum_dt_ms"),
        sum((col("cents") * col("dt_ms")).cast("decimal(38,0)")).as("wsum"))
      // a key whose whole span is sub-millisecond has zero total weight:
      // excluded explicitly (Spark would emit NULL where DuckDB errors
      // on integer division by zero — pin the engine-identical behavior)
      .where(col("sum_dt_ms") > 0)
      .select(col(key), col("n_intervals"), col("sum_dt_ms"),
        expr("CAST(wsum div sum_dt_ms AS BIGINT)").as("twap_cents"))
  }

  /** Lag-k autocorrelation moments of the daily count series derived
    * from `days(day)` (one input row per event): per k in 1..maxLag,
    * the paired-series integer moments (n, Σx, Σy, Σxy, Σx², Σy²) and
    * the Pearson coefficient `r` rounded to 6 dp. The two denominator
    * factors are square-rooted SEPARATELY — their product overflows
    * long at production scale while each factor alone does not.
    */
  def autocorrMoments(days: DataFrame, maxLag: Int): DataFrame = {
    val daily = days.groupBy(col("day")).agg(count(lit(1)).as("x"))
    val shifted = daily.select(col("day").as("pday"), col("x").as("y"))
    daily
      .select(col("day"), col("x"),
        explode(sequence(lit(1), lit(maxLag))).as("k"))
      .withColumn("pday", col("day") - col("k"))
      .join(shifted, "pday")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("d1", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("d2", col("n") * col("syy") - col("sy") * col("sy"))
      .withColumn("r",
        when(col("d1") === 0 || col("d2") === 0, lit(null))
          .otherwise(round(
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt(col("d1").cast("double")) * sqrt(col("d2").cast("double"))),
            6)))
      .select(col("k").cast("long").as("k"), col("n"), col("sx"), col("sy"),
        col("sxy"), col("sxx"), col("syy"), col("r"))
  }

  /** Shared DuckDB CTE chain producing `dec(event_type, minute, v,
    * trend, seasonal, residual)` — the decomposition both its own
    * oracle and the anomaly oracle build on.
    */
  private val decomposeCtes: String =
    """ev AS (SELECT event_type, epoch_us(ts) // 60000000 AS minute,
      |                 CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |obs AS (SELECT event_type, minute, sum(cents) AS v
      |        FROM ev GROUP BY event_type, minute),
      |grid AS (SELECT event_type, unnest(range(mn, mx + 1)) AS minute
      |         FROM (SELECT event_type, min(minute) AS mn, max(minute) AS mx
      |               FROM obs GROUP BY event_type)),
      |dense AS (SELECT grid.event_type, grid.minute,
      |            CAST(coalesce(obs.v, 0) AS BIGINT) AS v,
      |            grid.minute % 60 AS slot
      |          FROM grid LEFT JOIN obs USING (event_type, minute)),
      |gm AS (SELECT event_type,
      |           CAST(sum(v) // count(*) AS BIGINT) AS g
      |         FROM dense GROUP BY event_type),
      |slots AS (SELECT event_type, slot,
      |            CAST(sum(v) // count(*) AS BIGINT) AS slot_mean
      |          FROM dense GROUP BY event_type, slot),
      |tr AS (SELECT event_type, minute, v, slot,
      |         CAST(sum(v) OVER w // count(*) OVER w AS BIGINT) AS trend
      |       FROM dense
      |       WINDOW w AS (PARTITION BY event_type ORDER BY minute
      |                    ROWS BETWEEN 30 PRECEDING AND 30 FOLLOWING)),
      |dec AS (SELECT tr.event_type, tr.minute, tr.v, tr.trend,
      |          CAST(s.slot_mean - g.g AS BIGINT) AS seasonal,
      |          CAST(tr.v - tr.trend - (s.slot_mean - g.g) AS BIGINT) AS residual
      |        FROM tr
      |        JOIN slots s ON s.event_type = tr.event_type AND s.slot = tr.slot
      |        JOIN gm g ON g.event_type = tr.event_type)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "timeseries_ohlc" ->
      """WITH p AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, epoch_us(ts) AS ts_us,
        |    event_id, CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase')
        |SELECT day, count(*) AS n_trades,
        |  (min(struct_pack(ts_us := ts_us, event_id := event_id,
        |    cents := cents))).cents AS open_cents,
        |  max(cents) AS high_cents,
        |  min(cents) AS low_cents,
        |  (max(struct_pack(ts_us := ts_us, event_id := event_id,
        |    cents := cents))).cents AS close_cents,
        |  CAST(sum(cents) AS BIGINT) AS volume_cents
        |FROM p GROUP BY day""".stripMargin,

    "theilsen_trend" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |nd AS (SELECT count(*) AS n_days FROM daily),
        |slopes AS (
        |  SELECT CAST((CAST(j.y AS HUGEINT) - i.y) * 1000000
        |      // (j.day - i.day) AS BIGINT) AS slope_x1e6
        |  FROM daily i JOIN daily j ON i.day < j.day),
        |ranked AS (
        |  SELECT slope_x1e6,
        |    row_number() OVER (ORDER BY slope_x1e6) AS rn,
        |    count(*) OVER () AS n_pairs
        |  FROM slopes)
        |SELECT n_days, CAST(n_pairs AS BIGINT) AS n_pairs,
        |  slope_x1e6 AS slope_med_x1e6
        |FROM ranked, nd
        |WHERE rn = (n_pairs + 1) // 2""".stripMargin,

    "seasonality_profile" ->
      """WITH v AS (SELECT epoch_us(ts) AS ts_us FROM events),
        |c AS (
        |  SELECT ((ts_us // 86400000000 + 4) % 7 + 7) % 7 AS dow,
        |    (ts_us % 86400000000 + 86400000000) % 86400000000 // 3600000000 AS hour,
        |    count(*) AS n
        |  FROM v GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c)
        |SELECT dow, hour, n, n * 1000000 // n_total AS share_ppm
        |FROM c, t""".stripMargin,

    "changepoint_cusum" ->
      """WITH ev AS (SELECT event_type, event_id, epoch_us(ts) AS ts_us,
        |                   CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |st AS (SELECT event_type, count(*) AS n_key, sum(cents) AS total_key
        |       FROM ev GROUP BY event_type),
        |d AS (SELECT ev.event_type, event_id, ts_us,
        |        n_key * cents - total_key AS d_scaled
        |      FROM ev JOIN st USING (event_type)),
        |pp AS (SELECT event_type, event_id, ts_us,
        |         sum(d_scaled) OVER w AS p
        |       FROM d
        |       WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |mm AS (SELECT event_type, event_id, ts_us, p,
        |         min(p) OVER w AS minp, max(p) OVER w AS maxp
        |       FROM pp
        |       WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_type, event_id, ts_us,
        |  CAST(p - least(0, minp) AS BIGINT) AS cusum_pos,
        |  CAST(greatest(0, maxp) - p AS BIGINT) AS cusum_neg
        |FROM mm""".stripMargin,

    "changepoint_cusum_by_user" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |                   CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |st AS (SELECT user_id, count(*) AS n_key, sum(cents) AS total_key
        |       FROM ev GROUP BY user_id),
        |d AS (SELECT ev.user_id, event_id, ts_us,
        |        n_key * cents - total_key AS d_scaled
        |      FROM ev JOIN st USING (user_id)),
        |pp AS (SELECT user_id, event_id, ts_us,
        |         sum(d_scaled) OVER w AS p
        |       FROM d
        |       WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |mm AS (SELECT user_id, event_id, ts_us, p,
        |         min(p) OVER w AS minp, max(p) OVER w AS maxp
        |       FROM pp
        |       WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, ts_us,
        |  CAST(p - least(0, minp) AS BIGINT) AS cusum_pos,
        |  CAST(greatest(0, maxp) - p AS BIGINT) AS cusum_neg
        |FROM mm""".stripMargin,

    "seasonal_decompose" ->
      s"WITH $decomposeCtes\nSELECT event_type, minute, v, trend, seasonal, residual FROM dec",

    // the decomposition chain + two rank-selected lower medians
    "anomaly_seasonal_residual" ->
      (s"WITH $decomposeCtes,\n" +
      """rmed AS (SELECT event_type, residual AS med FROM (
        |    SELECT event_type, residual,
        |      row_number() OVER (PARTITION BY event_type ORDER BY residual, minute) AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS n
        |    FROM dec) t WHERE rn = (n + 1) // 2),
        |dev AS (SELECT d.event_type, d.minute, d.v, d.residual, m.med,
        |          abs(d.residual - m.med) AS adev
        |        FROM dec d JOIN rmed m ON m.event_type = d.event_type),
        |rmad AS (SELECT event_type, adev AS mad FROM (
        |    SELECT event_type, adev, minute,
        |      row_number() OVER (PARTITION BY event_type ORDER BY adev, minute) AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS n
        |    FROM dev) t WHERE rn = (n + 1) // 2)
        |SELECT d.event_type, d.minute, d.v, d.residual, d.med,
        |  CAST(a.mad AS BIGINT) AS mad
        |FROM dev d JOIN rmad a ON a.event_type = d.event_type
        |WHERE d.adev > 3 * greatest(a.mad, 1)""".stripMargin),

    "timeseries_interpolate" ->
      """WITH ev AS (SELECT event_type, epoch_us(ts) // 60000000 AS minute,
        |                   CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |obs AS (SELECT event_type, minute, sum(cents) AS v
        |        FROM ev GROUP BY event_type, minute),
        |grid AS (SELECT event_type, unnest(range(mn, mx + 1)) AS minute
        |         FROM (SELECT event_type, min(minute) AS mn, max(minute) AS mx
        |               FROM obs GROUP BY event_type)),
        |g AS (SELECT grid.event_type, grid.minute, obs.v,
        |        obs.v IS NOT NULL AS is_observed
        |      FROM grid LEFT JOIN obs USING (event_type, minute)),
        |idxed AS (SELECT *, sum(CASE WHEN is_observed THEN 1 ELSE 0 END)
        |            OVER (PARTITION BY event_type ORDER BY minute
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS idx
        |          FROM g),
        |known AS (SELECT event_type,
        |            CAST(row_number() OVER (PARTITION BY event_type ORDER BY minute) AS BIGINT) AS k,
        |            minute AS m, v AS kv
        |          FROM obs)
        |SELECT i.event_type, i.minute,
        |  CAST(CASE WHEN i.is_observed THEN i.v
        |       ELSE p.kv + ((nx.kv - p.kv) * (i.minute - p.m)) // (nx.m - p.m)
        |  END AS BIGINT) AS v_interp,
        |  i.is_observed
        |FROM idxed i
        |JOIN known p ON p.event_type = i.event_type AND p.k = i.idx
        |LEFT JOIN known nx ON nx.event_type = i.event_type AND nx.k = i.idx + 1""".stripMargin,

    "timeseries_autocorr" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS x
        |  FROM events GROUP BY 1),
        |pairs AS (
        |  SELECT t.k, a.x, b.x AS y
        |  FROM daily a
        |  CROSS JOIN (SELECT unnest(range(1, 8)) AS k) t
        |  JOIN daily b ON b.day = a.day - t.k),
        |mom AS (
        |  SELECT k, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*y) AS BIGINT) AS sxy,
        |    CAST(sum(x*x) AS BIGINT) AS sxx,
        |    CAST(sum(y*y) AS BIGINT) AS syy
        |  FROM pairs GROUP BY k)
        |SELECT k, n, sx, sy, sxy, sxx, syy,
        |  CASE WHEN n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0 THEN NULL
        |       ELSE round(CAST(n*sxy - sx*sy AS DOUBLE) /
        |            (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
        |             sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6)
        |  END AS r
        |FROM mom""".stripMargin,

    "longest_increasing_streak" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |flagged AS (
        |  SELECT event_type, day, x,
        |    CASE WHEN x > lag(x) OVER w AND day = lag(day) OVER w + 1
        |         THEN 0 ELSE 1 END AS up
        |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |islands AS (
        |  SELECT event_type,
        |    sum(up) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM flagged),
        |runs AS (
        |  SELECT event_type, island, count(*) AS len
        |  FROM islands GROUP BY event_type, island)
        |SELECT event_type, CAST(max(len) AS BIGINT) AS longest_streak_days
        |FROM runs GROUP BY event_type""".stripMargin,

    "open_intervals_per_day" ->
      """WITH o AS (
        |  SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
        |    AS BIGINT) AS d0
        |  FROM orders),
        |deltas AS (
        |  SELECT day, CAST(sum(delta) AS BIGINT) AS net FROM (
        |    SELECT d0 AS day, 1 AS delta FROM o
        |    UNION ALL SELECT d0 + 7, -1 FROM o)
        |  GROUP BY day),
        |c AS (
        |  SELECT day, net,
        |    CAST(sum(net) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS open_orders
        |  FROM deltas)
        |SELECT day, net, open_orders FROM c
        |WHERE open_orders > 0 OR net != 0""".stripMargin,

    "timeseries_twap" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS ts_us, event_id,
        |    CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events),
        |iv AS (
        |  SELECT event_type, cents,
        |    (lead(ts_us) OVER (PARTITION BY event_type
        |       ORDER BY ts_us, event_id) - ts_us) // 1000 AS dt_ms
        |  FROM e)
        |SELECT event_type, count(*) AS n_intervals,
        |  CAST(sum(dt_ms) AS BIGINT) AS sum_dt_ms,
        |  CAST(sum(cents * dt_ms) // sum(dt_ms) AS BIGINT) AS twap_cents
        |FROM iv WHERE dt_ms IS NOT NULL
        |GROUP BY event_type
        |HAVING sum(dt_ms) > 0""".stripMargin
  )
}
