package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream operators over `events`: gap-based sessionization (the
  * same gaps-and-islands shape as the reference's RLE, I2 — a timestamp
  * gap instead of a key change breaks the island), fixed time-window
  * aggregation, and JSON property extraction.
  *
  * All timestamps are epoch-micro longs (`Tables.events`), so every
  * boundary comparison is integer-exact against the oracle. Windows are
  * keyed by `user_id` — one hash shuffle, no global sort; the follow-up
  * groupBy reuses the partitioning.
  */
object Sessionize {

  val SessionGapUs: Long = 30L * 60 * 1000 * 1000 // 30 min

  /** Per-session rollup: (user_id, session_id, start/end, counts, value). */
  def sessions(events: DataFrame, gapUs: Long = SessionGapUs): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events
      .withColumn("_new", when(
        col("ts_us") - lag(col("ts_us"), 1).over(byUser) > gapUs || lag(col("ts_us"), 1).over(byUser).isNull, 1)
        .otherwise(0))
      .withColumn("session_id", sum(col("_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
  }

  /** Ordered-funnel analysis (the MATCH_RECOGNIZE shape): per user, the
    * earliest `steps.head` event, then for each later step the earliest
    * matching event STRICTLY after the previous step's match and within
    * `windowUs` of it — Amplitude-style earliest-completion semantics.
    *
    * ONE shuffle (hash by user), no joins: the chain is computed with
    * cumulative conditional minima over the user's time-ordered window —
    * `stepK_cum = min(ts where type=stepK and prev_cum < ts <= prev_cum
    * + W)` — which equals the join-the-first-matches formulation because
    * a running min over an expanding window settles to the global first
    * match as soon as any match precedes the current row (the oracle IS
    * that independent join formulation). Same-ts events never chain
    * (strict >), so the result depends only on values, not row order.
    */
  def funnelSteps(events: DataFrame, steps: Seq[String],
                  windowUs: Long): DataFrame = {
    require(steps.nonEmpty)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // step 1 candidate: any head-type event; step k candidate: a step-k
    // event chained off the running min of step k-1's candidates
    // (comparisons against a null cum are null → `when` false, so rows
    // before the previous step matched never qualify)
    var df = events.withColumn("_cand1",
      when(col("event_type") === steps.head, col("ts_us")))
    steps.tail.zipWithIndex.foreach { case (step, i) =>
      val prevCum = min(col(s"_cand${i + 1}")).over(w)
      df = df.withColumn(s"_cand${i + 2}",
        when(col("event_type") === step &&
          col("ts_us") > prevCum &&
          col("ts_us") <= prevCum + lit(windowUs), col("ts_us")))
    }
    val aggs = steps.indices.map(i => min(col(s"_cand${i + 1}")).as(s"t${i + 1}_us"))
    val stepCount = (2 to steps.size).foldLeft(lit(1)) {
      (acc, i) => acc + when(col(s"t${i}_us").isNotNull, 1).otherwise(0)
    }
    df.groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("t1_us").isNotNull) // users that never entered the funnel
      .withColumn("steps", stepCount)
  }

  val queries: Map[String, Q] = Map(
    "sessionize" -> ((s, dir) => sessions(Tables.events(s, dir))),

    // 3-step ordered funnel, 24 h per step: view → click → purchase.
    "funnel_steps" -> ((s, dir) =>
      funnelSteps(Tables.events(s, dir), Seq("view", "click", "purchase"),
        86400000000L)),

    // Fixed 1-hour tumbling windows by event type (integer bucket index —
    // `div` keeps it exact).
    "event_window_agg" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 3600000000").as("hour_bucket"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("value_cents"))),

    // Spark's NATIVE session-window operator — the engine-level
    // formulation of gap sessionization (SessionWindowing + merging
    // session aggregate), complementing the explicit gaps-and-islands
    // `sessionize`: same 30-min gap, session end = last event + gap by
    // session_window semantics. One keyed shuffle; state merges
    // adjacent windows inside the aggregate instead of a lag/sum
    // window chain.
    "sessionize_native" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("value_cents"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start_us"),
          unix_micros(col("session_window.end")).as("session_end_plus_gap_us"),
          col("n_events"), col("value_cents"))),

    // SLIDING 1-hour windows hopping every 30 min — Spark's built-in
    // `window(ts, width, slide)` generator: each event lands in
    // width/slide = 2 overlapping windows (batch counterpart of the
    // streaming windowed aggregation). Epoch-aligned starts, reported
    // as exact micros so the oracle reproduces the window arithmetic
    // with integer division.
    "event_sliding_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"),
          window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("value_cents"))
        .select(col("event_type"),
          unix_micros(col("window.start")).as("window_start_us"),
          col("n"), col("value_cents"))),

    // Time-series gap fill: a DENSE per-type minute grid (every minute
    // from the type's first to its last event, empty minutes as 0) —
    // the time-axis cousin of the reference's dense id-sequence join
    // (I6): generate the grid from per-type bounds (a group-cardinality
    // aggregate + sequence explode), left-join the per-minute counts,
    // null-fill. Grid size is bounded by time span, not event count.
    "timeseries_gap_fill" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"), expr("ts_us div 60000000").as("minute"))
      val grid = ev.groupBy(col("event_type"))
        .agg(min(col("minute")).as("mn"), max(col("minute")).as("mx"))
        .select(col("event_type"),
          explode(sequence(col("mn"), col("mx"))).as("minute"))
      val counts = ev.groupBy(col("event_type"), col("minute"))
        .agg(count(lit(1)).as("c"))
      grid.join(counts, Seq("event_type", "minute"), "left")
        .select(col("event_type"), col("minute"),
          coalesce(col("c"), lit(0L)).as("n_events"))
    }),

    // SCD2 history build: each user's event stream as slowly-changing-
    // dimension validity intervals — version n valid over
    // [valid_from, valid_to), the current version open (null) — the
    // warehouse companion of upsert_latest/snapshot_diff (which keep
    // only the latest; this keeps the full history queryable by as-of
    // time). One keyed window carries both row_number and lead.
    "scd2_intervals" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          round(col("value") * 100).cast("long").as("cents"))
        .select(col("user_id"),
          row_number().over(w).cast("long").as("version"),
          col("ts_us").as("valid_from_us"),
          lead(col("ts_us"), 1).over(w).as("valid_to_us"),
          col("cents"))
    }),

    // JSON property extraction (events.props = {"k": N}).
    "json_extract_props" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k")))
  )

  val oracleSql: Map[String, String] = Map(
    // INDEPENDENT formulation: first-match joins instead of cumulative
    // window minima — agreement pins the running-min chaining argument.
    "funnel_steps" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |s1 AS (SELECT user_id, min(ts_us) AS t1 FROM ev
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT ev.user_id, min(ts_us) AS t2 FROM ev JOIN s1 USING (user_id)
        |       WHERE event_type = 'click'
        |         AND ts_us > t1 AND ts_us <= t1 + 86400000000 GROUP BY ev.user_id),
        |s3 AS (SELECT ev.user_id, min(ts_us) AS t3 FROM ev JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase'
        |         AND ts_us > t2 AND ts_us <= t2 + 86400000000 GROUP BY ev.user_id)
        |SELECT s1.user_id, t1 AS t1_us, t2 AS t2_us, t3 AS t3_us,
        |  CAST(1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
        |         + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS INTEGER) AS steps
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin,
    "sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts_us, value,
        |    CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000
        |           OR lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (
        |  SELECT user_id, ts_us, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM s GROUP BY user_id, session_id""".stripMargin,
    "event_window_agg" ->
      """SELECT event_type, epoch_us(ts) // 3600000000 AS hour_bucket,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events
        |GROUP BY event_type, epoch_us(ts) // 3600000000""".stripMargin,
    // session_window boundary semantics: the window is [start, last+gap)
    // with an EXCLUSIVE end, so an event arriving exactly `gap` after
    // the last one starts a NEW session — the split predicate is >=,
    // one notch different from the lag-chain `sessionize` (>), and the
    // reported end is last_event + gap
    "sessionize_native" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts_us, value,
        |    CASE WHEN ts_us - lag(ts_us) OVER w >= 1800000000
        |           OR lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (
        |  SELECT user_id, ts_us, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id,
        |  min(ts_us) AS session_start_us,
        |  max(ts_us) + 1800000000 AS session_end_plus_gap_us,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM s GROUP BY user_id, sid""".stripMargin,
    // each event expands to its two containing window starts; the range
    // predicate is redundant at width = 2·slide but keeps the oracle
    // correct for any width/slide ratio
    "event_sliding_window" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS ts_us, value FROM events)
        |SELECT event_type,
        |  (ts_us // 1800000000 - k) * 1800000000 AS window_start_us,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM e, UNNEST(generate_series(0, 1)) AS u(k)
        |WHERE ts_us >= (ts_us // 1800000000 - k) * 1800000000
        |  AND ts_us < (ts_us // 1800000000 - k) * 1800000000 + 3600000000
        |GROUP BY 1, 2""".stripMargin,
    "timeseries_gap_fill" ->
      """WITH m AS (SELECT event_type, epoch_us(ts) // 60000000 AS minute FROM events),
        |b AS (SELECT event_type, min(minute) AS mn, max(minute) AS mx
        |      FROM m GROUP BY event_type),
        |grid AS (SELECT event_type, unnest(generate_series(mn, mx)) AS minute FROM b),
        |c AS (SELECT event_type, minute, count(*) AS c FROM m GROUP BY 1, 2)
        |SELECT g.event_type, g.minute, COALESCE(c.c, 0) AS n_events
        |FROM grid g LEFT JOIN c ON g.event_type = c.event_type AND g.minute = c.minute""".stripMargin,
    "json_extract_props" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events",
    "scd2_intervals" ->
      """SELECT user_id,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  epoch_us(ts) AS valid_from_us,
        |  lead(epoch_us(ts)) OVER w AS valid_to_us,
        |  CAST(round(value * 100) AS BIGINT) AS cents
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)""".stripMargin
  )
}
