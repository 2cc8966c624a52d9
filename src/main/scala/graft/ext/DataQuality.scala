package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the Deequ/"unit tests
  * for data" pattern (Schelter et al., VLDB'18) as a single operator:
  * a constraint set over a table evaluates to one small frame of
  * (constraint, n_violations, n_checked) rows, the artifact a 100 TB
  * ingest gate stores per batch and alerts on.
  *
  * 100 TB shape — constraint classes map to plan shapes, and the suite
  * fuses everything fusable:
  *   - ROW-LOCAL predicates (range, set membership, completeness,
  *     cross-column order) compile to conditional-sum aggregates that
  *     all ride ONE scan of the table — adding a constraint adds a
  *     codegen'd sum, not a pass. No shuffle beyond the 1-row agg.
  *   - UNIQUENESS needs the key's grouped counts (one shuffle on the
  *     key — the same exchange an exact-dedup pass would pay).
  *   - REFERENTIAL INTEGRITY needs the FK join; the suite piggybacks
  *     every parent-child CROSS-TABLE predicate (here: a line must not
  *     ship before its order date) on that SAME join, so arbitrarily
  *     many parent-child rules still cost one join.
  * The result union is a handful of 1-row frames — nothing data-sized
  * moves after the aggregates.
  */
object DataQuality {

  private def one(name: String, violations: org.apache.spark.sql.Column,
                  checked: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    struct(lit(name).as("check_name"), violations.cast("long").as("n_violations"),
      checked.cast("long").as("n_checked"))

  /** The suite over the TPC-H-ish lineitem/orders pair. */
  def lineitemSuite(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)

    // row-local constraints: one scan, one conditional-sum aggregate
    val rowLocal = li.agg(
      one("lineitem.quantity_in_[1,50]",
        sum(when(!col("l_quantity").between(1, 50), 1L).otherwise(0L)),
        count(lit(1))).as("c1"),
      one("lineitem.discount_in_[0,1]",
        sum(when(!col("l_discount").between(0.0, 1.0), 1L).otherwise(0L)),
        count(lit(1))).as("c2"),
      one("lineitem.returnflag_in_{A,N,R}",
        sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L)),
        count(lit(1))).as("c3"),
      one("lineitem.shipdate_complete",
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)),
        count(lit(1))).as("c4"))
      .select(explode(array(col("c1"), col("c2"), col("c3"), col("c4"))).as("c"))
      .select(col("c.*"))

    // uniqueness of the line key: one shuffle on the key
    val unique = li.select(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("n"), count_distinct(col("l_orderkey"), col("l_linenumber")).as("nd"))
      .select(one("lineitem.line_key_unique", col("n") - col("nd"), col("n")).as("c"))
      .select(col("c.*"))

    // orders-side set membership rides its own single scan
    val ordLocal = ord.agg(
      one("orders.status_in_{F,O,P}",
        sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L)),
        count(lit(1))).as("c"))
      .select(col("c.*"))

    // FK join: RI + every parent-child predicate on the same exchange
    val joined = li.select(col("l_orderkey"), col("l_shipdate"))
      .join(ord.select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        Seq("l_orderkey"), "left")
      .agg(
        one("lineitem.orderkey_in_orders",
          sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)),
          count(lit(1))).as("c1"),
        one("lineitem.shipdate_on_or_after_orderdate",
          sum(when(col("o_orderdate").isNotNull &&
            col("l_shipdate") < col("o_orderdate"), 1L).otherwise(0L)),
          count(lit(1))).as("c2"))
      .select(explode(array(col("c1"), col("c2"))).as("c"))
      .select(col("c.*"))

    rowLocal.unionByName(unique).unionByName(ordLocal).unionByName(joined)
  }

  val queries: Map[String, Q] = Map(
    "dq_constraints" -> ((s, dir) => lineitemSuite(s, dir)),

    // Referential-integrity audit across the FK chain — orphan child
    // rows per relationship (the join-rot check a warehouse runs after
    // every load). Each relationship is one LEFT ANTI join counted
    // against the child total: anti-joins shuffle (or broadcast, for
    // dimension parents) on the FK — never a full outer materialize.
    // The testdata is consistent, so the pinned expectation is zero
    // orphans — the query's value is that any ingest regression flips
    // the ppm and fails the hash gate.
    "dq_referential" -> ((s, dir) => {
      def rel(name: String, child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame = {
        val total = child.agg(count(lit(1)).as("n_child"))
        val orphans = child
          .join(parent.select(col(parentKey).as(childKey)), Seq(childKey),
            "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        total.crossJoin(orphans) // 1-row × 1-row
          .select(lit(name).as("relationship"), col("n_child"),
            col("n_orphans"),
            // greatest guard (round-10 advice): an empty child table
            // zeroes n_child — Spark div→NULL vs DuckDB //→error
            expr("n_orphans * 1000000 div greatest(n_child, 1L)")
              .as("orphan_ppm"))
      }
      rel("lineitem->orders",
          Tables.lineitem(s, dir).select(col("l_orderkey")), "l_orderkey",
          Tables.orders(s, dir), "o_orderkey")
        .unionByName(rel("orders->customer",
          Tables.orders(s, dir).select(col("o_custkey")), "o_custkey",
          Tables.customer(s, dir), "c_custkey"))
        .unionByName(rel("customer->nation",
          Tables.customer(s, dir).select(col("c_nationkey")), "c_nationkey",
          Tables.nation(s, dir), "n_nationkey"))
    }),

    // k-anonymity audit (privacy gating before a data release): every
    // quasi-identifier combination must describe ≥ k individuals;
    // groups below k are re-identification risks the release must
    // suppress or generalize. One grouped count + a threshold filter —
    // the audit costs one shuffle on the quasi-identifier key at any
    // scale. Emits the violating groups (the suppression work-list),
    // k = 10 over (nation, market segment).
    "dq_k_anonymity" -> ((s, dir) =>
      Tables.customer(s, dir)
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("group_n"))
        .where(col("group_n") < 10)),

    // l-diversity (Machanavajjhala 2007) — k-anonymity's complement: a
    // large quasi-identifier group still leaks if everyone in it SHARES
    // the sensitive value. Sensitive attribute = account-balance band
    // (truncating integer division on cents — engine-portable); one
    // keyed aggregate, at_risk = fewer than 3 distinct bands.
    "dq_l_diversity" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_nationkey"), col("c_mktsegment"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT) div 100000").as("bal_band"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("group_n"),
          countDistinct(col("bal_band")).as("l_distinct"))
        .withColumn("at_risk", (col("l_distinct") < 3).cast("int"))),

    // Join-key skew diagnosis — the report that decides whether a key
    // needs the salted-join path BEFORE the job hits it: top-20 hottest
    // keys with integer-scaled share and ratio-to-mean. One keyed
    // count + a TakeOrdered top-k (never a global sort); the stat pair
    // is a 1-row broadcast.
    "dq_skew_profile" -> ((s, dir) => {
      val counts = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
      val stats = counts.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("total"))
      counts.orderBy(col("cnt").desc, col("l_orderkey")).limit(20)
        .crossJoin(broadcast(stats)) // 1-row scalar
        .select(col("l_orderkey"), col("cnt"),
          expr("cnt * 1000000L div total").as("share_x1e6"),
          expr("cnt * n_keys * 1000000L div total").as("ratio_to_mean_x1e6"))
    }),

    // Benford first-digit audit — the classic fabricated-amounts
    // screen: natural multi-magnitude amounts follow
    // P(d) = log10(1+1/d); a uniform or truncated generator does not.
    // The digit is taken from the cents STRING head (no float log10),
    // the observed share is integer-scaled, and the expected Benford
    // shares ship as exact per-mille constants — so the whole audit is
    // hash-exact. One map-side-combining 9-group aggregate; the total
    // is a 1-row broadcast.
    "dq_benford" -> ((s, dir) => {
      val cents = Tables.orders(s, dir)
        .select(round(col("o_totalprice") * 100).cast("long").as("c"))
        .where(col("c") > 0)
      val byDigit = cents
        .groupBy(substring(col("c").cast("string"), 1, 1).as("first_digit"))
        .agg(count(lit(1)).as("n"))
      val total = byDigit.agg(sum(col("n")).as("total"))
      // log10(1+1/d) in per-mille, rounded half-up: exact constants
      val benfordPm = "CASE first_digit WHEN '1' THEN 301 WHEN '2' THEN 176 " +
        "WHEN '3' THEN 125 WHEN '4' THEN 97 WHEN '5' THEN 79 WHEN '6' THEN 67 " +
        "WHEN '7' THEN 58 WHEN '8' THEN 51 ELSE 46 END"
      byDigit.crossJoin(broadcast(total))
        .select(col("first_digit"), col("n"),
          expr("n * 1000 div total").as("observed_pm"),
          expr(benfordPm).as("benford_pm"),
          expr(s"abs(n * 1000 div total - ($benfordPm))").as("abs_dev_pm"))
    }),

    // Freshness audit — per event stream, how stale is its newest
    // record against the corpus watermark (the ingestion-SLO check a
    // warehouse alerts on: one stream silently stopping shows up as a
    // growing lag while totals still look plausible). One
    // map-side-combining per-type aggregate + a 1-row watermark
    // broadcast; stale pins lag > 7 days.
    "dq_freshness" -> ((s, dir) =>
      freshnessFinish(freshnessCounts(Tables.events(s, dir)))),

    // t-closeness (Li et al., ICDE 2007) — the l-diversity upgrade: a
    // group with many DISTINCT sensitive values still leaks if its
    // DISTRIBUTION skews far from the table's. Distance = the ordered
    // Earth Mover's Distance over the same balance bands as
    // dq_l_diversity, computed on ppm-QUANTIZED CDFs (each cumulative
    // share truncates to ppm BEFORE the difference — deterministic in
    // both engines; headroom cum·10⁶ holds to ~9.2·10¹² rows). At risk
    // when EMD > 0.2 (200000 ppm).
    "dq_t_closeness" -> ((s, dir) =>
      tCloseness(Tables.customer(s, dir)))
  )

  /** Ordered-EMD t-closeness over (nation, mktsegment) groups and the
    * balance-band sensitive attribute. 100 TB shape: one group-keyed
    * and one band-keyed aggregate off a single scan; the band alphabet
    * and the global distribution are broadcast (bands are a handful of
    * values by construction); the CDF fold is a per-group window over
    * ≤ #bands rows (the batch_length_buckets bounded-window kind).
    */
  def tCloseness(customer: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val banded = customer.select(col("c_nationkey"), col("c_mktsegment"),
      expr("CAST(round(c_acctbal * 100) AS BIGINT) div 100000").as("bal_band"))
    val groups = banded.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("group_n"))
    val glob = banded.groupBy(col("bal_band")).agg(count(lit(1)).as("n_b"))
    val scal = glob.agg(sum(col("n_b")).as("n_all"), count(lit(1)).as("m_bands"))
    val gb = banded.groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
      .agg(count(lit(1)).as("n_gb"))
    val wCdf = Window.partitionBy(col("c_nationkey"), col("c_mktsegment"))
      .orderBy(col("bal_band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    groups.crossJoin(broadcast(glob.select(col("bal_band"), col("n_b"))))
      .join(gb, Seq("c_nationkey", "c_mktsegment", "bal_band"), "left")
      .select(col("c_nationkey"), col("c_mktsegment"), col("group_n"),
        col("bal_band"), col("n_b"), coalesce(col("n_gb"), lit(0L)).as("n_gb"))
      .withColumn("cum_g", sum(col("n_gb")).over(wCdf))
      .withColumn("cum_b", sum(col("n_b")).over(wCdf))
      .crossJoin(broadcast(scal))
      .select(col("c_nationkey"), col("c_mktsegment"), col("group_n"),
        col("m_bands"),
        abs(expr("cum_g * 1000000L div group_n") -
          expr("cum_b * 1000000L div n_all")).as("d_ppm"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("group_n"),
        col("m_bands"))
      .agg(sum(col("d_ppm")).as("sum_d"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("group_n"),
        col("m_bands"),
        expr("sum_d div greatest(m_bands - 1L, 1L)").as("emd_ppm"))
      .withColumn("at_risk", (col("emd_ppm") > 200000L).cast("int"))
  }

  /** Per-stream (n_events, last_day) — a plain keyed aggregate, so it
    * runs unchanged as a complete-mode STREAMING aggregation (the
    * streaming_freshness_monitor face; chained aggregations are
    * unsupported in streaming, so the watermark fold lives in the
    * finisher). */
  def freshnessCounts(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), max(col("day")).as("last_day"))

  /** Watermark + lag finisher over the per-stream counts (1-row
    * broadcast fold; stale pins lag > 7 days). */
  def freshnessFinish(byType: DataFrame): DataFrame = {
    val wm = byType.agg(max(col("last_day")).as("watermark_day"))
    byType.crossJoin(broadcast(wm))
      .select(col("event_type"), col("n_events"), col("last_day"),
        (col("watermark_day") - col("last_day")).as("lag_days"))
      .withColumn("stale", col("lag_days") > 7L)
  }

  val oracleSql: Map[String, String] = Map(
    "dq_referential" ->
      """SELECT 'lineitem->orders' AS relationship,
        |  (SELECT count(*) FROM lineitem) AS n_child,
        |  (SELECT count(*) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                       WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
        |  (SELECT count(*) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                       WHERE o.o_orderkey = l.l_orderkey))
        |    * 1000000 // greatest((SELECT count(*) FROM lineitem), 1) AS orphan_ppm
        |UNION ALL
        |SELECT 'orders->customer',
        |  (SELECT count(*) FROM orders),
        |  (SELECT count(*) FROM orders o
        |     WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                       WHERE c.c_custkey = o.o_custkey)),
        |  (SELECT count(*) FROM orders o
        |     WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                       WHERE c.c_custkey = o.o_custkey))
        |    * 1000000 // greatest((SELECT count(*) FROM orders), 1)
        |UNION ALL
        |SELECT 'customer->nation',
        |  (SELECT count(*) FROM customer),
        |  (SELECT count(*) FROM customer c
        |     WHERE NOT EXISTS (SELECT 1 FROM nation n
        |                       WHERE n.n_nationkey = c.c_nationkey)),
        |  (SELECT count(*) FROM customer c
        |     WHERE NOT EXISTS (SELECT 1 FROM nation n
        |                       WHERE n.n_nationkey = c.c_nationkey))
        |    * 1000000 // greatest((SELECT count(*) FROM customer), 1)""".stripMargin,

    "dq_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS group_n
        |FROM customer
        |GROUP BY c_nationkey, c_mktsegment
        |HAVING count(*) < 10""".stripMargin,

    "dq_l_diversity" ->
      """WITH b AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS bal_band
        |  FROM customer)
        |SELECT c_nationkey, c_mktsegment,
        |  count(*) AS group_n,
        |  CAST(count(DISTINCT bal_band) AS BIGINT) AS l_distinct,
        |  CAST(CASE WHEN count(DISTINCT bal_band) < 3 THEN 1 ELSE 0 END AS INTEGER) AS at_risk
        |FROM b GROUP BY c_nationkey, c_mktsegment""".stripMargin,

    "dq_t_closeness" ->
      """WITH b AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS bal_band
        |  FROM customer),
        |grp AS (SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS group_n
        |        FROM b GROUP BY 1, 2),
        |gl AS (SELECT bal_band, CAST(count(*) AS BIGINT) AS n_b FROM b GROUP BY 1),
        |sc AS (SELECT CAST(sum(n_b) AS BIGINT) AS n_all,
        |              CAST(count(*) AS BIGINT) AS m_bands FROM gl),
        |gb AS (SELECT c_nationkey, c_mktsegment, bal_band,
        |              CAST(count(*) AS BIGINT) AS n_gb
        |       FROM b GROUP BY 1, 2, 3),
        |grid AS (
        |  SELECT g.c_nationkey, g.c_mktsegment, g.group_n, gl.bal_band, gl.n_b,
        |    coalesce(gb.n_gb, 0) AS n_gb
        |  FROM grp g CROSS JOIN gl
        |  LEFT JOIN gb ON gb.c_nationkey = g.c_nationkey
        |    AND gb.c_mktsegment = g.c_mktsegment AND gb.bal_band = gl.bal_band),
        |cdf AS (
        |  SELECT c_nationkey, c_mktsegment, group_n,
        |    abs(sum(n_gb) OVER w * 1000000 // group_n
        |      - sum(n_b) OVER w * 1000000 // (SELECT n_all FROM sc)) AS d_ppm
        |  FROM grid
        |  WINDOW w AS (PARTITION BY c_nationkey, c_mktsegment ORDER BY bal_band
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT c_nationkey, c_mktsegment, group_n,
        |  (SELECT m_bands FROM sc) AS m_bands,
        |  CAST(sum(d_ppm) // greatest((SELECT m_bands FROM sc) - 1, 1) AS BIGINT)
        |    AS emd_ppm,
        |  CAST(CASE WHEN sum(d_ppm) // greatest((SELECT m_bands FROM sc) - 1, 1)
        |    > 200000 THEN 1 ELSE 0 END AS INTEGER) AS at_risk
        |FROM cdf GROUP BY 1, 2, 3""".stripMargin,

    "dq_skew_profile" ->
      """WITH c AS (SELECT l_orderkey, count(*) AS cnt
        |           FROM lineitem GROUP BY l_orderkey),
        |st AS (SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total FROM c),
        |r AS (SELECT l_orderkey, cnt,
        |        row_number() OVER (ORDER BY cnt DESC, l_orderkey) AS rk FROM c)
        |SELECT l_orderkey, cnt,
        |  CAST((cnt * 1000000) // total AS BIGINT) AS share_x1e6,
        |  CAST((cnt * n_keys * 1000000) // total AS BIGINT) AS ratio_to_mean_x1e6
        |FROM r, st WHERE rk <= 20""".stripMargin,

    "dq_benford" ->
      """WITH cents AS (
        |  SELECT CAST(round(o_totalprice*100) AS BIGINT) AS c
        |  FROM orders WHERE round(o_totalprice*100) > 0),
        |d AS (SELECT substring(CAST(c AS VARCHAR), 1, 1) AS first_digit,
        |        count(*) AS n
        |      FROM cents GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM d),
        |b AS (SELECT first_digit, n,
        |        CAST(n * 1000 // total AS BIGINT) AS observed_pm,
        |        CASE first_digit WHEN '1' THEN 301 WHEN '2' THEN 176
        |          WHEN '3' THEN 125 WHEN '4' THEN 97 WHEN '5' THEN 79
        |          WHEN '6' THEN 67 WHEN '7' THEN 58 WHEN '8' THEN 51
        |          ELSE 46 END AS benford_pm
        |      FROM d, t)
        |SELECT first_digit, n, observed_pm, benford_pm,
        |  abs(observed_pm - benford_pm) AS abs_dev_pm
        |FROM b""".stripMargin,

    "dq_freshness" ->
      """WITH d AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events),
        |bt AS (
        |  SELECT event_type, count(*) AS n_events, max(day) AS last_day
        |  FROM d GROUP BY event_type),
        |wm AS (SELECT max(last_day) AS watermark_day FROM bt)
        |SELECT event_type, n_events, last_day,
        |  watermark_day - last_day AS lag_days,
        |  watermark_day - last_day > 7 AS stale
        |FROM bt CROSS JOIN wm""".stripMargin,

    "dq_constraints" ->
      """SELECT 'lineitem.quantity_in_[1,50]' AS check_name,
        |  CAST(sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
        |  count(*) AS n_checked FROM lineitem
        |UNION ALL
        |SELECT 'lineitem.discount_in_[0,1]',
        |  CAST(sum(CASE WHEN l_discount NOT BETWEEN 0.0 AND 1.0 THEN 1 ELSE 0 END) AS BIGINT),
        |  count(*) FROM lineitem
        |UNION ALL
        |SELECT 'lineitem.returnflag_in_{A,N,R}',
        |  CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT),
        |  count(*) FROM lineitem
        |UNION ALL
        |SELECT 'lineitem.shipdate_complete',
        |  CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(*) FROM lineitem
        |UNION ALL
        |SELECT 'lineitem.line_key_unique',
        |  CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
        |  count(*) FROM lineitem
        |UNION ALL
        |SELECT 'orders.status_in_{F,O,P}',
        |  CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT),
        |  count(*) FROM orders
        |UNION ALL
        |SELECT 'lineitem.orderkey_in_orders',
        |  CAST(sum(CASE WHEN o.o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(*)
        |FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
        |UNION ALL
        |SELECT 'lineitem.shipdate_on_or_after_orderdate',
        |  CAST(sum(CASE WHEN o.o_orderdate IS NOT NULL AND l.l_shipdate < o.o_orderdate
        |      THEN 1 ELSE 0 END) AS BIGINT),
        |  count(*)
        |FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey""".stripMargin
  )
}
