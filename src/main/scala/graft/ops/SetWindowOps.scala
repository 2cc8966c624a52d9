package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Set operations (SURVEY.md §2.9 — the reference's ordered multi-file
  * union, plus the absent intersect/except/distinct family) and the general
  * window-function surface beyond W1/O5.
  *
  * Scale notes: union is metadata-only (no shuffle); distinct/intersect/
  * except are keyed hash aggregates (partial+final); every window here is
  * keyed (`partitionBy`) — no single-partition windows. Running sums are
  * over integral doubles (< 2^53), so Spark's sequential frame evaluation
  * and DuckDB's segment-tree evaluation agree bit-for-bit.
  */
object SetWindowOps {

  val queries: Map[String, Q] = Map(
    // Exact linear-interpolated percentiles per group (both engines use
    // the p·(n−1) index definition; quantities are integral doubles, so
    // the interpolation arithmetic is bit-identical). Scale note: exact
    // percentile buffers per-group VALUE COUNTS — bounded here by the
    // ~50 distinct quantities, but for high-cardinality columns at
    // 100 TB use approx_percentile (t-digest) instead; exactness and
    // bounded state cannot coexist for arbitrary quantile inputs.
    "percentile_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"),
          expr("percentile(l_quantity, 0.9)").as("p90"))),

    // Explicit GROUPING SETS (rollup/cube generalize from it) with
    // grouping() disambiguation of NULL-as-subtotal vs NULL-as-value —
    // via spark.sql, the surface a SQL user drives. One Expand + one
    // aggregate: each input row replicates once per matching set, the
    // same physical shape as the rollup/cube queries.
    "grouping_sets_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_gs")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
          |  CAST(grouping(l_linestatus) AS INT) AS g_status,
          |  count(*) AS n, sum(l_quantity) AS sum_qty
          |FROM lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
          |  (l_returnflag, l_linestatus), ())""".stripMargin)
    }),

    // The documented scale path for quantiles (see percentile_agg note):
    // Greenwald-Khanna approximate percentiles with bounded state per
    // group at ANY value cardinality — what replaces the exact
    // formulation when the quantile column is high-cardinality at
    // 100 TB. Rows-only: GK merge results depend on partition merge
    // order (and DuckDB's approx_quantile is a different sketch);
    // the error bound vs exact percentiles is asserted in ScalaTest.
    "percentile_approx_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("p50_approx"),
          expr("approx_percentile(l_extendedprice, 0.9, 1000)").as("p90_approx"))),

    // ORACLED companion for the approximate-percentile path: the
    // returned value's EMPIRICAL RANK must bracket the target quantile
    // within ±2% (accuracy=1000 guarantees ±0.1% rank error). The
    // two-sided bracket is duplication-proof: #(x ≤ v) bounds the rank
    // from ABOVE the target (lower check) and #(x < v) from BELOW it
    // (upper check) — a value carrying many duplicates at the quantile
    // inflates only the ≤-count, which the upper check deliberately
    // doesn't use. Exact per-group counts come from the oracle; the
    // booleans are pinned TRUE. Plan shape: group-cardinality approx
    // table broadcast back onto the fact scan, one pass each side.
    "percentile_approx_check" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_returnflag"), col("l_extendedprice"))
      val approx = li.groupBy(col("l_returnflag"))
        .agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("a50"),
          expr("approx_percentile(l_extendedprice, 0.9, 1000)").as("a90"))
      li.join(broadcast(approx), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_extendedprice") <= col("a50"), 1L).otherwise(0L)).as("le50"),
          sum(when(col("l_extendedprice") < col("a50"), 1L).otherwise(0L)).as("lt50"),
          sum(when(col("l_extendedprice") <= col("a90"), 1L).otherwise(0L)).as("le90"),
          sum(when(col("l_extendedprice") < col("a90"), 1L).otherwise(0L)).as("lt90"))
        .select(col("l_returnflag"), col("n"),
          (col("le50") >= col("n") * 0.48 && col("lt50") <= col("n") * 0.52).as("p50_rank_ok"),
          (col("le90") >= col("n") * 0.88 && col("lt90") <= col("n") * 0.92).as("p90_rank_ok"))
    }),

    // IQR-fence outlier detection per group — the Tukey data-quality
    // gate: rows outside [p25 − 1.5·IQR, p75 + 1.5·IQR] of their
    // event_type. Two passes over the data (fences, then filter), but
    // the fence table is group-cardinality-sized and broadcasts; the
    // filter is a narrow scan. Fence arithmetic keeps the exact
    // textual expression shape of the oracle so the IEEE double ops
    // evaluate identically.
    "outlier_iqr" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val fences = ev.groupBy(col("event_type")).agg(
        expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.75)").as("p75"))
      ev.join(broadcast(fences), "event_type")
        .filter(col("value") < col("p25") - lit(1.5) * (col("p75") - col("p25")) ||
          col("value") > col("p75") + lit(1.5) * (col("p75") - col("p25")))
        .select(col("event_type"), col("event_id"), col("value"))
    }),

    // Per-group z-score standardization — the feature-normalization
    // projection, kept engine-deterministic: moments come from the
    // integer-cents sums (order-independent), and the z-score is the
    // one float expression `(v·n − Σ) / sqrt(n·Σ² − (Σ)²)` evaluated
    // with the same textual shape on both engines (sqrt and division
    // are IEEE-exact on identical inputs; no float ACCUMULATION
    // anywhere). Broadcast the group-cardinality moment table, narrow
    // scan for the projection.
    "standardize_by_group" -> ((s, dir) => {
      val cents = round(col("l_quantity") * 100).cast("long")
      val mom = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(cents).as("s"),
          sum(cents * cents).as("s2"))
      // numerator stays integer-exact (≤ cents·n, far inside long);
      // the variance term multiplies as DOUBLES on both engines — in
      // integers Spark's long would wrap at scale while DuckDB's
      // HUGEINT would not, silently diverging; identical IEEE double
      // expressions cannot
      Tables.lineitem(s, dir)
        .join(broadcast(mom), "l_returnflag")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          round((cents * col("n") - col("s")) /
            sqrt(col("n").cast("double") * col("s2").cast("double") -
              col("s").cast("double") * col("s").cast("double")), 6).as("z"))
    }),

    // Pearson correlation per group, same determinism discipline as
    // standardize_by_group: ALL sums are exact integers (map-side
    // combining, order-independent); the only float arithmetic is the
    // final covariance/variance expression, textually mirrored in the
    // oracle. Built-in corr() would float-accumulate per partition and
    // could differ across engines/partitionings in the last ulps.
    "correlation_by_group" -> ((s, dir) => {
      val qc = round(col("l_quantity") * 100).cast("long")
      val pc = round(col("l_extendedprice") * 100).cast("long")
      // second-moment sums accumulate as DECIMAL(38,0): still exact and
      // order-independent, but sum(pc²) is already ~80% of Long.Max at
      // sf0.1 — a long would wrap just past the tested scale while
      // DuckDB promotes to hugeint, silently diverging (the per-row
      // products themselves fit comfortably in long)
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(qc).as("sq"), sum(pc).as("sp"),
          sum((qc * qc).cast("decimal(38,0)")).as("sqq"),
          sum((pc * pc).cast("decimal(38,0)")).as("spp"),
          sum((qc * pc).cast("decimal(38,0)")).as("sqp"))
        .select(col("l_returnflag"), col("n"),
          round((col("n").cast("double") * col("sqp").cast("double") -
              col("sq").cast("double") * col("sp").cast("double")) /
            (sqrt(col("n").cast("double") * col("sqq").cast("double") -
                col("sq").cast("double") * col("sq").cast("double")) *
              sqrt(col("n").cast("double") * col("spp").cast("double") -
                col("sp").cast("double") * col("sp").cast("double"))), 6)
            .as("corr_qty_price"))
    }),

    // Second moments in exact integer arithmetic (cents²): variance and
    // stddev derive downstream as (n·Σx² − (Σx)²) / n² without any
    // order-dependent float summation — the same pattern as the q1
    // integer-cents revenue and embedding_dim_stats.
    "moment_stats" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(round(col("l_quantity") * 100).cast("long")).as("sum_c"),
          sum(round(col("l_quantity") * 100).cast("long")
            * round(col("l_quantity") * 100).cast("long")).as("sum_c2"))),

    // Edit-distance surface: levenshtein over a bounded candidate set
    // (consecutive doc ids) — both engines implement the same DP.
    "edit_distance_neighbors" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      d.as("a").join(d.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          levenshtein(col("a.text"), col("b.text")).as("edit_dist"))
    }),

    // Ordered UNION ALL of two scans (the reference's multi-file concat).
    "union_all" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir).select(col("l_orderkey").as("k"), lit("l").as("src"))
      val o = Tables.orders(s, dir).select(col("o_orderkey").as("k"), lit("o").as("src"))
      l.unionAll(o)
    }),

    // Schema-evolution union: concatenating snapshots written before and
    // after a column was added (the reference's versioned touch schemas,
    // v1 ⊂ v2 ⊂ v3, are exactly this shape — SURVEY §1.4). unionByName
    // aligns by NAME and nulls the missing column; positional unionAll
    // would mis-bind or reject.
    "union_schema_evolution" -> ((s, dir) => {
      val v1 = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), lit("v1").as("src"))
      val v2 = Tables.orders(s, dir).filter(pmod(col("o_orderkey"), lit(3)) === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
          lit("v2").as("src"))
      v1.unionByName(v2, allowMissingColumns = true)
    }),

    "distinct_rows" -> ((s, dir) =>
      Tables.lineitem(s, dir).select(col("l_suppkey"), col("l_returnflag")).distinct()),

    "intersect_keys" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir).select(col("l_orderkey").as("k"))
      val o = Tables.orders(s, dir).select(col("o_orderkey").as("k"))
      o.intersect(l)
    }),

    "except_keys" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir).select(col("l_orderkey").as("k"))
      val o = Tables.orders(s, dir).select(col("o_orderkey").as("k"))
      o.except(l)
    }),

    // Hierarchical totals; null-filled super-aggregate rows match ANSI.
    "rollup_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))),

    "cube_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))),

    // Pivot = conditional aggregation (what it compiles to anyway).
    "pivot_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum(col("l_quantity")), 2))),

    // Keyed running sum (integral doubles ⇒ exact).
    "window_running_sum" -> ((s, dir) => {
      // (l_orderkey, l_linenumber) is NOT unique at larger SFs — quantity
      // + extendedprice complete the total order (full rows are unique)
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, 0)
      Tables.lineitem(s, dir).select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(col("l_quantity")).over(w).as("running_qty"))
    }),

    // lag/lead value-copy windows.
    "window_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
      Tables.lineitem(s, dir).select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        lag(col("l_quantity"), 1).over(w).as("prev_qty"),
        lead(col("l_quantity"), 1).over(w).as("next_qty"))
    }),

    // rank/dense_rank with real ties (integer quantity within supplier).
    "window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_quantity"))
      Tables.lineitem(s, dir).select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"))
    }),

    // Distribution window functions over a TOTAL order (the PK completes
    // it — percent_rank/cume_dist on a tied order would be ambiguous
    // only in output order, but ntile bucket boundaries would shift):
    // quartile bucket, (rank−1)/(n−1), and rank/n per return flag.
    "window_dist_stats" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, dir).select(
        col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cdist"))
    }),

    // RANGE frame (peer rows share the frame end — the tie semantics
    // that distinguish RANGE from ROWS): running cents revenue per
    // supplier in shipdate order, all same-date rows seeing the same
    // running total.
    "window_range_frame" -> ((s, dir) => {
      val cents = round(col("l_extendedprice") * 100).cast("long")
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_shipdate"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, dir).select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"),
        sum(cents).over(w).as("running_c"))
    }),

    // first/last/nth over an explicit full frame (last_value with the
    // default frame is a footgun both engines share; the full frame is
    // the meaningful form).
    "window_first_last" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.lineitem(s, dir).select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        first(col("l_quantity")).over(w).as("min_qty"),
        last(col("l_quantity")).over(w).as("max_qty"),
        nth_value(col("l_quantity"), 2).over(w).as("second_qty"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "percentile_agg" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  quantile_cont(l_quantity, 0.9) AS p90
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // exact group counts from the oracle; rank-window booleans pinned
    // TRUE — an approx-percentile whose value drifts outside the ±2%
    // empirical-rank window flips them
    "percentile_approx_check" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(TRUE AS BOOLEAN) AS p50_rank_ok,
        |  CAST(TRUE AS BOOLEAN) AS p90_rank_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "correlation_by_group" ->
      """WITH c AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS qc,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
        |  FROM lineitem),
        |m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(qc) AS BIGINT) AS sq, CAST(sum(pc) AS BIGINT) AS sp,
        |    CAST(sum(qc * qc) AS DECIMAL(38,0)) AS sqq,
        |    CAST(sum(pc * pc) AS DECIMAL(38,0)) AS spp,
        |    CAST(sum(qc * pc) AS DECIMAL(38,0)) AS sqp
        |  FROM c GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round((CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE) -
        |      CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE)) /
        |    (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) -
        |        CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) *
        |      sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) -
        |        CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))), 6) AS corr_qty_price
        |FROM m""".stripMargin,
    // numerator in exact integers, variance term in doubles with the
    // identical textual shape (see the query comment)
    "standardize_by_group" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS s,
        |    CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)
        |           * CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS s2
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag, l.l_orderkey, l.l_linenumber,
        |  round((CAST(round(l.l_quantity * 100) AS BIGINT) * m.n - m.s) /
        |    sqrt(CAST(m.n AS DOUBLE) * CAST(m.s2 AS DOUBLE) -
        |      CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE)), 6) AS z
        |FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag""".stripMargin,
    "grouping_sets_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS INT) AS g_status,
        |  count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
        |  (l_returnflag, l_linestatus), ())""".stripMargin,
    "union_schema_evolution" ->
      """SELECT o_orderkey, o_custkey, 'v1' AS src FROM orders
        |UNION ALL BY NAME
        |SELECT o_orderkey, o_custkey, o_orderpriority, 'v2' AS src
        |FROM orders WHERE o_orderkey % 3 = 0""".stripMargin,
    // fence expressions textually mirror the Spark side so the IEEE
    // double arithmetic evaluates identically
    "outlier_iqr" ->
      """WITH f AS (
        |  SELECT event_type,
        |    quantile_cont(value, 0.25) AS p25,
        |    quantile_cont(value, 0.75) AS p75
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type, e.event_id, e.value
        |FROM events e JOIN f USING (event_type)
        |WHERE e.value < f.p25 - 1.5 * (f.p75 - f.p25)
        |   OR e.value > f.p75 + 1.5 * (f.p75 - f.p25)""".stripMargin,
    // sum(BIGINT) is HUGEINT in DuckDB — cast back
    "moment_stats" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_c,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)
        |         * CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_c2
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "edit_distance_neighbors" ->
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.text, b.text) AS INTEGER) AS edit_dist
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1""".stripMargin,
    "window_range_frame" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) OVER (
        |    PARTITION BY l_suppkey ORDER BY l_shipdate
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c
        |FROM lineitem""".stripMargin,
    "window_first_last" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  first_value(l_quantity) OVER w AS min_qty,
        |  last_value(l_quantity) OVER w AS max_qty,
        |  nth_value(l_quantity, 2) OVER w AS second_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_quantity, l_orderkey, l_linenumber
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    "union_all" ->
      """SELECT l_orderkey AS k, 'l' AS src FROM lineitem
        |UNION ALL SELECT o_orderkey AS k, 'o' AS src FROM orders""".stripMargin,
    "distinct_rows" -> "SELECT DISTINCT l_suppkey, l_returnflag FROM lineitem",
    "intersect_keys" ->
      "SELECT o_orderkey AS k FROM orders INTERSECT SELECT l_orderkey AS k FROM lineitem",
    "except_keys" ->
      "SELECT o_orderkey AS k FROM orders EXCEPT SELECT l_orderkey AS k FROM lineitem",
    "rollup_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "cube_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "pivot_agg" ->
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS "F",
        |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS "O"
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "window_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  sum(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM lineitem""".stripMargin,
    "window_lag_lead" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  lag(l_quantity, 1) OVER w AS prev_qty,
        |  lead(l_quantity, 1) OVER w AS next_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice)""".stripMargin,
    "window_rank" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_quantity)""".stripMargin,
    "window_dist_stats" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cdist
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber)""".stripMargin
  )
}
