package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Join surface (SURVEY.md §2.7). The reference only has two degenerate
  * joins (broadcast shifts-lookup, dense sequence left join); a complete
  * engine needs the full family, each planned the way it should be at
  * 100 TB:
  *  - dimension joins: explicit `broadcast()` — zero shuffle of the fact
  *    side (replaces the reference's replicated `shifts[]` array,
  *    src/touches/touch_reader.cpp:277);
  *  - fact-fact equi-join: shuffle hash / sort-merge on the key, AQE picks;
  *  - semi/anti: `left_semi`/`left_anti` — no payload duplication;
  *  - as-of join: NOT a per-row subquery — the union-and-window trick:
  *    tag both streams, union (no shuffle of either side alone), one
  *    window per (user) partition carries the last seen right-side row
  *    forward. One shuffle total, skew-bounded by user cardinality.
  */
object JoinOps {

  /** As-of join: for each left row, the most recent right row with
    * `rightTs <= leftTs`, matched on `keyCols`. Both inputs must share the
    * key + ts column names; right payload columns are carried forward.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftTagged = payloadCols.foldLeft(left.withColumn("_side", lit(1))) {
      (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val leftOnly = left.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
    val rightTagged = leftOnly.foldLeft(right.withColumn("_side", lit(0))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = leftTagged.unionByName(rightTagged.select(leftTagged.columns.map(col): _*))
    // order by (ts, side, payload): right rows at the same ts sort before
    // left rows, so a left row at ts==t sees a right row at ts==t
    // (inclusive as-of); payload columns break ties among right rows
    // sharing (key, ts) so the carried row is deterministic
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol) +: col("_side") +: payloadCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = payloadCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1).drop("_side")
  }

  /** [[asofJoin]] with a STALENESS BOUND — the feature-store
    * point-in-time join with TTL: a left row takes the latest right
    * row at-or-before its timestamp ONLY if that row is at most
    * `toleranceUs` old; older (or missing) matches yield NULL payload,
    * never a silently stale feature. Emits `gap_us` (left ts − matched
    * right ts) and `matched` so downstream can audit staleness instead
    * of discovering it in a trained model. Same single union + one
    * keyed-window shape as asofJoin — the tolerance adds one carried
    * timestamp column and a per-row comparison, no extra shuffle.
    */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                        tsCol: String, payloadCols: Seq[String],
                        toleranceUs: Long): DataFrame = {
    val leftTagged = payloadCols.foldLeft(left.withColumn("_side", lit(1))) {
      (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val leftOnly = left.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
    val rightTagged = leftOnly.foldLeft(right.withColumn("_side", lit(0))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = leftTagged.unionByName(rightTagged.select(leftTagged.columns.map(col): _*))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol) +: col("_side") +: payloadCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = payloadCols.foldLeft(
        unioned.withColumn("_rts",
          last(when(col("_side") === 0, col(tsCol)), ignoreNulls = true).over(w))) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    val fresh = col("_rts").isNotNull &&
      (col(tsCol) - col("_rts")) <= lit(toleranceUs)
    val out = filled.filter(col("_side") === 1)
      .withColumn("matched", fresh)
      .withColumn("gap_us", when(fresh, col(tsCol) - col("_rts")))
    payloadCols.foldLeft(out) { (df, c) =>
      df.withColumn(c, when(fresh, col(c)))
    }.drop("_side", "_rts")
  }

  /** Pure range join (point-in-interval, NO equi key) via BIN BUCKETING —
    * the scale-safe formulation of an inequality join: a naive theta
    * join is a nested-loop product, but binning time into fixed windows
    * turns it into an EQUI-join on the bin id (each interval explodes
    * into the bins it covers; each point lives in exactly one bin, so no
    * dedup is needed), with the precise containment check as a post-join
    * filter. Shuffle cost is |points| + |intervals|·(span/binWidth), not
    * |points|·|intervals|.
    */
  def rangeBinnedJoin(points: DataFrame, ptCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidth: Int): DataFrame = {
    val pts = points.withColumn("_bin", floor(col(ptCol) / binWidth))
    val ivs = intervals.withColumn("_bin",
      explode(sequence(floor(col(startCol) / binWidth),
        floor((col(endCol) - 1) / binWidth))))
    pts.join(ivs, Seq("_bin"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("_bin")
  }

  /** INTERVAL × INTERVAL overlap join via the same bin bucketing as
    * [[rangeBinnedJoin]], with the REPORT-ONCE trick of spatial
    * partition joins (the "reference point" method — Patel & DeWitt's
    * PBSM, SIGMOD'96): both sides explode into the fixed-width bins
    * they cover and equi-join on the bin id; a pair overlapping k
    * shared bins would surface k times, so instead of a data-sized
    * `distinct` each surviving pair is emitted ONLY from the bin
    * containing its overlap's start, max(start_a, start_b) — one
    * codegen'd comparison per candidate, zero dedup shuffle. Intervals
    * are half-open [start, end); overlap ⇔ s_a < e_b ∧ s_b < e_a.
    *
    * Shuffle cost |A|·(span_A/binWidth) + |B|·(span_B/binWidth);
    * `binWidth` trades replication against bin-local candidate
    * quadratics exactly as in the point form.
    */
  def intervalOverlapJoin(a: DataFrame, aStart: String, aEnd: String,
                          b: DataFrame, bStart: String, bEnd: String,
                          binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    val av = a.withColumn("_bin",
      explode(sequence(expr(s"$aStart div $binWidth"),
        expr(s"($aEnd - 1) div $binWidth"))))
    val bv = b.withColumn("_bin",
      explode(sequence(expr(s"$bStart div $binWidth"),
        expr(s"($bEnd - 1) div $binWidth"))))
    av.join(bv, Seq("_bin"))
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .filter(col("_bin") ===
        expr(s"greatest($aStart, $bStart) div $binWidth")) // report-once
      .drop("_bin")
  }

  /** Bloom-prefiltered semi join — the explicit runtime-filter
    * (sideways-information-passing) pattern: build a bloom filter over
    * the dim side's keys ([[graft.functions.BloomFilterAgg]] — a fixed
    * numBits/8-byte aggregate, never data-sized), inline it as a
    * literal into a codegen probe on the fact side, then remove the
    * bloom's false positives with the exact semi join. Result is
    * IDENTICAL to a plain semi join (blooms have no false negatives),
    * but the fact rows that reach the join shuffle shrink by the
    * filter's selectivity — at 100 TB the filter does its work inside
    * the fact SCAN stage, where Spark's own InjectRuntimeFilter only
    * kicks in when stats happen to qualify; this form is unconditional
    * and tunable.
    */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
                    dim: DataFrame, dimKey: String,
                    numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    import graft.functions.BloomFilterAgg.{bloomFilter, bloomMightContain}
    // ONE driver-collected row of numBits/8 bytes — bounded by the
    // parameter, never by the dim cardinality
    val bytes = dim.agg(bloomFilter(col(dimKey), numBits, numHashes).as("bf"))
      .head().getAs[Array[Byte]](0)
    fact.filter(bloomMightContain(col(factKey), lit(bytes), numHashes))
      .join(dim.select(col(dimKey)).distinct(),
        col(factKey) === col(dimKey), "left_semi")
  }

  val queries: Map[String, Q] = Map(
    // Broadcast dimension chain: customer ⋈ nation ⋈ region, fact side
    // never shuffles.
    "join_broadcast" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name").as("nation"),
          col("r_name").as("region"))
    }),

    // Fact-fact shuffle join + aggregate: revenue per order.
    "join_shuffle" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      // revenue in exact integer 1e-4 units (price has 2 decimals, discount
      // 2 decimals) — order-independent and bit-identical to the oracle,
      // unlike a rounded float sum, which flips at half-cent boundaries.
      o.join(li, o("o_orderkey") === li("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_totalprice"))
        .agg((sum(round(col("l_extendedprice") * 100).cast("long")
            * round((lit(1) - col("l_discount")) * 100).cast("long")) / 10000.0).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // EXISTS: customers that placed at least one order.
    "join_semi" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

    // NOT EXISTS: customers with no orders.
    "join_anti" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // Theta (non-equi) join: ordered pairs — broadcast nested loop on the
    // tiny side; at scale a banded/bucketed rewrite would bound the blowup.
    "join_theta" -> ((s, dir) => {
      val n1 = Tables.nation(s, dir).select(col("n_nationkey").as("a"), col("n_regionkey").as("ra"))
      val n2 = Tables.nation(s, dir).select(col("n_nationkey").as("b"), col("n_regionkey").as("rb"))
      n1.join(broadcast(n2), col("a") < col("b") && col("ra") === col("rb"))
        .select(col("a"), col("b"), col("ra").as("regionkey"))
    }),

    // Pure range join, binned: lineitems shipped within a week of an
    // order's date (dates as day offsets from 1992-01-01 → integer bins
    // of 7 days). No equi key exists between the tables — the bin IS
    // the join key; PlanSpec asserts no nested-loop product.
    "join_range_binned" -> ((s, dir) => {
      val epoch = lit("1992-01-01").cast("date")
      val pts = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        datediff(col("l_shipdate"), epoch).as("ship_day"))
      val ivs = Tables.orders(s, dir).filter(col("o_orderkey") < 100)
        .select(col("o_orderkey"),
          datediff(col("o_orderdate"), epoch).as("start_day"),
          (datediff(col("o_orderdate"), epoch) + 7).as("end_day"))
      rangeBinnedJoin(pts, "ship_day", ivs, "start_day", "end_day", binWidth = 7)
        .select(col("o_orderkey"), col("l_orderkey"), col("l_linenumber"),
          col("ship_day"))
    }),

    // interval × interval: per-(user, day) activity spans against the
    // hour-long "incident" windows where a type's hourly count spikes
    // ≥3σ above its mean over active hours (σ-based, NOT a 2×-mean
    // multiplicative cut — that one emptied under Poisson concentration
    // at sf0.1+, see the inline note) — which user-days ran through
    // which incidents. Day-wide bins: activity spans explode into ≤2
    // bins, incidents into 1.
    "join_interval_overlap" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts_us"))
      val spans = ev.groupBy(col("user_id"),
          expr("ts_us div 86400000000").as("day"))
        .agg(min(col("ts_us")).as("a_start"), (max(col("ts_us")) + 1L).as("a_end"))
      val hourly = ev.select(col("event_type"),
          expr("ts_us div 3600000000").as("hour"))
        .groupBy(col("event_type"), col("hour")).agg(count(lit(1)).as("cnt"))
      // 3-sigma spike rule on the FLOORED hourly mean, integer
      // cross-multiplied ((cnt-mu)^2 >= 9*mu) — sigma-based so the
      // incident set stays populated as density grows (a multiplicative
      // cut empties under Poisson concentration; measured: 2x-mean
      // found 226 incidents at sf0.01 and ZERO at sf0.1), and
      // mean-floored so the square fits a long at any plausible scale
      val stats = hourly.groupBy(col("event_type"))
        .agg(expr("sum(cnt) div count(1)").as("mu"))
      val incidents = hourly.join(broadcast(stats), "event_type")
        .where(col("cnt") > col("mu") &&
          (col("cnt") - col("mu")) * (col("cnt") - col("mu")) >= lit(9L) * col("mu"))
        .select(col("event_type"), (col("hour") * 3600000000L).as("b_start"),
          ((col("hour") + 1L) * 3600000000L).as("b_end"))
      intervalOverlapJoin(spans, "a_start", "a_end",
          incidents, "b_start", "b_end", binWidth = 86400000000L)
        .select(col("user_id"), col("day"), col("event_type"),
          col("b_start").as("incident_start_us"))
    }),

    // As-of: each purchase joined to the user's most recent click at-or-
    // before it. Compared in epoch MICROS on both sides — DuckDB's parquet
    // reader truncates TIMESTAMP(NANOS) to its micro-precision TIMESTAMP,
    // so nanos are not oracle-comparable.
    "asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_us"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("click_event_id"), col("ts_us").as("click_ts_us"))
      asofJoin(purchases, clicks, Seq("user_id"), "ts_us",
        Seq("click_event_id", "click_ts_us"))
        .select(col("user_id"), col("event_id"), col("ts_us"), col("value"),
          col("click_event_id"), col("click_ts_us"))
    }),

    // the same purchase←click as-of with a 6-hour TTL: stale clicks
    // yield NULL payload + matched=false instead of a silently old
    // feature (the feature-store point-in-time discipline)
    "join_asof_tolerance" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_us"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("click_event_id"), col("ts_us").as("click_ts_us"))
      asofJoinTolerance(purchases, clicks, Seq("user_id"), "ts_us",
        Seq("click_event_id", "click_ts_us"), toleranceUs = 6L * 3600 * 1000000)
        .select(col("user_id"), col("event_id"), col("ts_us"), col("value"),
          col("click_event_id"), col("click_ts_us"), col("matched"),
          col("gap_us"))
    }),

    // The SAME interval-overlap query written as the NAIVE theta join a
    // user would declare — the IntervalJoinRewrite optimizer rule
    // (opt-in bin width) turns the nested-loop plan into the binned
    // equi-join + report-once form, so this must reproduce
    // join_interval_overlap's oracle exactly while never planning a
    // data×data BroadcastNestedLoopJoin. PlanSpec pins the rewrite.
    "join_interval_overlap_auto" -> ((s, dir) => {
      if (!s.experimental.extraOptimizations.contains(graft.plans.IntervalJoinRewrite))
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ graft.plans.IntervalJoinRewrite
      s.conf.set(graft.plans.IntervalJoinRewrite.BinWidthConf, "86400000000")
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts_us"))
      val spans = ev.groupBy(col("user_id"),
          expr("ts_us div 86400000000").as("day"))
        .agg(min(col("ts_us")).as("a_start"), (max(col("ts_us")) + 1L).as("a_end"))
      val hourly = ev.select(col("event_type"),
          expr("ts_us div 3600000000").as("hour"))
        .groupBy(col("event_type"), col("hour")).agg(count(lit(1)).as("cnt"))
      // 3-sigma spike rule on the FLOORED hourly mean, integer
      // cross-multiplied ((cnt-mu)^2 >= 9*mu) — sigma-based so the
      // incident set stays populated as density grows (a multiplicative
      // cut empties under Poisson concentration; measured: 2x-mean
      // found 226 incidents at sf0.01 and ZERO at sf0.1), and
      // mean-floored so the square fits a long at any plausible scale
      val stats = hourly.groupBy(col("event_type"))
        .agg(expr("sum(cnt) div count(1)").as("mu"))
      val incidents = hourly.join(broadcast(stats), "event_type")
        .where(col("cnt") > col("mu") &&
          (col("cnt") - col("mu")) * (col("cnt") - col("mu")) >= lit(9L) * col("mu"))
        .select(col("event_type"), (col("hour") * 3600000000L).as("b_start"),
          ((col("hour") + 1L) * 3600000000L).as("b_end"))
      // the user-declared form: a plain theta join on the overlap
      spans.join(incidents,
          col("a_start") < col("b_end") && col("b_start") < col("a_end"))
        .select(col("user_id"), col("day"), col("event_type"),
          col("b_start").as("incident_start_us"))
    }),

    // NEAREST as-of: each purchase matched to the user's temporally
    // CLOSEST click in either direction (ties to the earlier side) —
    // the sensor-fusion variant of the backward-only asof_join. One
    // union + ONE keyed ordered window carrying both navigation
    // aggregates (last-before via the preceding frame, first-after via
    // the following frame — clicks at the same ts sort before
    // purchases, making "before" inclusive and "after" strict); no
    // join at all, so there is nothing to skew. The same plan at 100 TB
    // is one range-free hash shuffle on the key.
    "join_asof_nearest" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("user_id"), col("event_id"), col("ts_us"),
          (col("event_type") === "purchase").as("is_p"))
      val ord = Seq(col("ts_us"), col("is_p"), col("event_id"))
      val wPrev = Window.partitionBy(col("user_id")).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy(col("user_id")).orderBy(ord: _*)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val ck = when(!col("is_p"), struct(col("ts_us"), col("event_id")))
      ev
        .withColumn("prev", last(ck, ignoreNulls = true).over(wPrev))
        .withColumn("next", first(ck, ignoreNulls = true).over(wNext))
        .filter(col("is_p"))
        .select(col("user_id"), col("event_id"), col("ts_us"),
          when(col("next").isNull ||
            (col("prev").isNotNull &&
              col("ts_us") - col("prev.ts_us") <= col("next.ts_us") - col("ts_us")),
            col("prev")).otherwise(col("next")).as("near"))
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("near.event_id").as("near_click_id"),
          col("near.ts_us").as("near_click_ts_us"))
    }),

    // Runtime-filtered semi join: lineitems of urgent orders. The bloom
    // prefilter runs in the lineitem scan stage; the exact semi join
    // removes its false positives, so the oracle is the plain IN.
    "join_bloom_prefilter" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
      bloomSemiJoin(li, "l_orderkey", urgent, "o_orderkey")
    }),

    // FULL OUTER: customers ⟗ per-customer order rollup — preserves
    // both never-ordered customers (null order side) and orphan
    // custkeys in orders (none in this generator, but the semantics
    // are pinned by the coalesce columns). Same shuffle as a plain
    // equi-join: full-outer SMJ on the key, no extra exchange; the
    // pre-aggregation keeps the right side one row per key so the
    // output is customer-sized at any scale.
    "join_full_outer" -> ((s, dir) => {
      val perCust = Tables.orders(s, dir).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("spend_cents"))
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))
        .join(perCust, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("mktsegment"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("spend_cents"), lit(0L)).as("spend_cents"),
          (col("c_custkey").isNotNull && col("o_custkey").isNotNull)
            .as("matched"))
    }),

    // NULL-SAFE equality (`<=>` / IS NOT DISTINCT FROM): both sides
    // null out nationkey 13, and the null-keyed groups still pair up —
    // the semantics a plain `=` join silently drops. Aggregated to one
    // row per key on each side first, so the null×null match is 1×1,
    // not a null-key cross-product blowup; at scale the null bucket is
    // the classic skew key and pre-aggregation is the fix.
    "join_null_safe" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .select(nullif(col("c_nationkey").cast("long"), lit(13L)).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n_cust"))
      val supp = Tables.supplier(s, dir)
        .select(nullif(col("s_nationkey").cast("long"), lit(13L)).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n_supp"))
      cust.join(supp, cust("k") <=> supp("k"), "inner")
        .select(cust("k").as("nationkey_nulled"),
          col("n_cust"), col("n_supp"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "join_broadcast" ->
      """SELECT c_custkey, c_name, n_name AS nation, r_name AS region
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey""".stripMargin,
    "join_shuffle" ->
      """SELECT o_orderkey, o_totalprice,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l_discount) * 100) AS BIGINT)) / 10000.0 AS revenue,
        |  count(*) AS n_lines
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey, o_totalprice""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "join_theta" ->
      """SELECT n1.n_nationkey AS a, n2.n_nationkey AS b, n1.n_regionkey AS regionkey
        |FROM nation n1 JOIN nation n2
        |  ON n1.n_nationkey < n2.n_nationkey AND n1.n_regionkey = n2.n_regionkey""".stripMargin,
    "join_interval_overlap_auto" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |spans AS (SELECT user_id, ts_us // 86400000000 AS day,
        |            min(ts_us) AS a_start, max(ts_us) + 1 AS a_end
        |          FROM ev GROUP BY user_id, ts_us // 86400000000),
        |h AS (SELECT event_type, ts_us // 3600000000 AS hour, count(*) AS cnt
        |      FROM ev GROUP BY event_type, ts_us // 3600000000),
        |st AS (SELECT event_type, sum(cnt) // count(*) AS mu
        |       FROM h GROUP BY event_type),
        |inc AS (SELECT h.event_type, hour * 3600000000 AS b_start,
        |          (hour + 1) * 3600000000 AS b_end
        |        FROM h JOIN st USING (event_type)
        |        WHERE cnt > mu AND (cnt - mu) * (cnt - mu) >= 9 * mu)
        |SELECT s.user_id, s.day, i.event_type,
        |  CAST(i.b_start AS BIGINT) AS incident_start_us
        |FROM spans s JOIN inc i ON s.a_start < i.b_end AND i.b_start < s.a_end""".stripMargin,

    "join_asof_nearest" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |              event_type = 'purchase' AS is_p
        |            FROM events WHERE event_type IN ('purchase', 'click')),
        |n AS (SELECT user_id, event_id, ts_us, is_p,
        |        last_value(CASE WHEN NOT is_p THEN ts_us END IGNORE NULLS) OVER wp AS prev_ts,
        |        last_value(CASE WHEN NOT is_p THEN event_id END IGNORE NULLS) OVER wp AS prev_id,
        |        first_value(CASE WHEN NOT is_p THEN ts_us END IGNORE NULLS) OVER wn AS next_ts,
        |        first_value(CASE WHEN NOT is_p THEN event_id END IGNORE NULLS) OVER wn AS next_id
        |      FROM ev
        |      WINDOW wp AS (PARTITION BY user_id ORDER BY ts_us, is_p, event_id
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |             wn AS (PARTITION BY user_id ORDER BY ts_us, is_p, event_id
        |                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, event_id, ts_us,
        |  CASE WHEN next_ts IS NULL
        |         OR (prev_ts IS NOT NULL AND ts_us - prev_ts <= next_ts - ts_us)
        |    THEN prev_id ELSE next_id END AS near_click_id,
        |  CASE WHEN next_ts IS NULL
        |         OR (prev_ts IS NOT NULL AND ts_us - prev_ts <= next_ts - ts_us)
        |    THEN prev_ts ELSE next_ts END AS near_click_ts_us
        |FROM n WHERE is_p""".stripMargin,

    // direct overlap predicate, no bins — the bin+report-once plan must
    // reproduce the plain theta join exactly
    "join_interval_overlap" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |spans AS (SELECT user_id, ts_us // 86400000000 AS day,
        |            min(ts_us) AS a_start, max(ts_us) + 1 AS a_end
        |          FROM ev GROUP BY user_id, ts_us // 86400000000),
        |h AS (SELECT event_type, ts_us // 3600000000 AS hour, count(*) AS cnt
        |      FROM ev GROUP BY event_type, ts_us // 3600000000),
        |st AS (SELECT event_type, sum(cnt) // count(*) AS mu
        |       FROM h GROUP BY event_type),
        |inc AS (SELECT h.event_type, hour * 3600000000 AS b_start,
        |          (hour + 1) * 3600000000 AS b_end
        |        FROM h JOIN st USING (event_type)
        |        WHERE cnt > mu AND (cnt - mu) * (cnt - mu) >= 9 * mu)
        |SELECT s.user_id, s.day, i.event_type,
        |  CAST(i.b_start AS BIGINT) AS incident_start_us
        |FROM spans s JOIN inc i ON s.a_start < i.b_end AND i.b_start < s.a_end""".stripMargin,

    "join_range_binned" ->
      """SELECT o.o_orderkey, l.l_orderkey, l.l_linenumber,
        |  CAST(date_diff('day', DATE '1992-01-01', l.l_shipdate) AS INTEGER) AS ship_day
        |FROM lineitem l JOIN orders o
        |  ON l.l_shipdate >= o.o_orderdate
        | AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
        |WHERE o.o_orderkey < 100""".stripMargin,
    "asof_join" ->
      """SELECT p.user_id, p.event_id, epoch_us(p.ts) AS ts_us, p.value,
        |  c.event_id AS click_event_id, epoch_us(c.ts) AS click_ts_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,

    "join_asof_tolerance" ->
      """WITH j AS (
        |  SELECT p.user_id, p.event_id, epoch_us(p.ts) AS ts_us, p.value,
        |    c.event_id AS c_eid, epoch_us(c.ts) AS c_ts
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id AND p.ts >= c.ts)
        |SELECT user_id, event_id, ts_us, value,
        |  CASE WHEN c_ts IS NOT NULL AND ts_us - c_ts <= 21600000000
        |    THEN c_eid END AS click_event_id,
        |  CASE WHEN c_ts IS NOT NULL AND ts_us - c_ts <= 21600000000
        |    THEN c_ts END AS click_ts_us,
        |  (c_ts IS NOT NULL AND ts_us - c_ts <= 21600000000) AS matched,
        |  CASE WHEN c_ts IS NOT NULL AND ts_us - c_ts <= 21600000000
        |    THEN ts_us - c_ts END AS gap_us
        |FROM j""".stripMargin,
    "join_bloom_prefilter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin,
    "join_full_outer" ->
      """WITH per_cust AS (
        |  SELECT o_custkey, count(*) AS n_orders,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS spend_cents
        |  FROM orders GROUP BY o_custkey)
        |SELECT coalesce(c.c_custkey, p.o_custkey) AS custkey,
        |  coalesce(c.c_mktsegment, 'UNKNOWN') AS mktsegment,
        |  coalesce(p.n_orders, 0) AS n_orders,
        |  coalesce(p.spend_cents, 0) AS spend_cents,
        |  (c.c_custkey IS NOT NULL AND p.o_custkey IS NOT NULL) AS matched
        |FROM customer c FULL OUTER JOIN per_cust p
        |  ON c.c_custkey = p.o_custkey""".stripMargin,
    "join_null_safe" ->
      """WITH cust AS (
        |  SELECT nullif(CAST(c_nationkey AS BIGINT), 13) AS k, count(*) AS n_cust
        |  FROM customer GROUP BY 1),
        |supp AS (
        |  SELECT nullif(CAST(s_nationkey AS BIGINT), 13) AS k, count(*) AS n_supp
        |  FROM supplier GROUP BY 1)
        |SELECT cust.k AS nationkey_nulled, n_cust, n_supp
        |FROM cust JOIN supp ON cust.k IS NOT DISTINCT FROM supp.k""".stripMargin
  )
}
