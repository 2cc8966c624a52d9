package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed selection (k-th smallest / exact median) WITHOUT a
  * total sort — the classic two-phase histogram selection (the
  * relational face of quickselect): `percentile_agg` gives exact
  * percentiles by sorting per group, and `percentile_approx_agg` trades
  * exactness for one pass; this operator is the third point on that
  * curve — EXACT, and the only ordered stage it pays is over one
  * histogram bin.
  *
  * Phase 1: one scan aggregates (n, min, max); a second map-side-
  * combining aggregate histograms the column into `bins` equi-width
  * buckets. The cumulative walk over the ≤`bins` counts finds the
  * bucket containing rank k — a window over at most `bins` rows
  * (single-partition, but BOUNDED by the constant `bins`, never by
  * data — the RangeRle discipline).
  *
  * Phase 2: only that bucket's rows (expected n/bins of the data) are
  * re-filtered via a 1-row broadcast and ranked by a per-bucket sort;
  * rank k − cum_before inside the bucket is the answer. Total cost: two
  * scans + one narrow sort of ~n/bins rows — at 100 TB with 65k bins,
  * the sorted set is ~1.5 GB instead of 100 TB.
  *
  * Caveat (documented, inherent to one-level histograms): a massively
  * repeated single value collapses its whole mass into one bucket and
  * phase 2 degrades toward sorting that mass; the standard fix is
  * recursing the histogram inside the bucket (unbounded levels make it
  * quickselect). One level is right for price-like continuous columns.
  */
object Selection {

  /** (n, k, kth) for k = ⌊(n+1)/2⌋ (lower median) of `valueCol` (long). */
  def exactMedian(values: DataFrame, valueCol: String, bins: Int = 4096): DataFrame = {
    val v = values.select(col(valueCol).as("x"))
    val stats = v.agg(count(lit(1)).as("n"), min(col("x")).as("mn"), max(col("x")).as("mx"))
      .select(col("n"), col("mn"), col("mx"),
        expr("(n + 1) div 2").as("k"),
        expr(s"(mx - mn) div $bins + 1").as("width"))
    val binned = v.crossJoin(broadcast(stats)) // 1-row scalar frame
      .select(col("x"), expr("(x - mn) div width").as("bin"), col("k"), col("n"))
    val counts = binned.groupBy(col("bin")).agg(count(lit(1)).as("c"))
    // <= `bins` rows: the single-partition window is constant-bounded
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val target = counts
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("cum_before", col("cum") - col("c"))
      .crossJoin(broadcast(stats.select(col("k"))))
      .where(col("cum") >= col("k") && col("cum_before") < col("k"))
      .select(col("bin"), col("cum_before"))
    val wBin = Window.partitionBy(col("bin")).orderBy(col("x"))
    binned
      .join(broadcast(target), "bin") // phase 2: ~n/bins rows survive
      .withColumn("rn", row_number().over(wBin).cast("long"))
      .where(col("rn") === col("k") - col("cum_before"))
      .select(col("n"), col("k"), col("x").as("kth"))
  }

  val queries: Map[String, Q] = Map(
    // exact median line price in cents, selected without a global sort
    "exact_median_selection" -> ((s, dir) =>
      exactMedian(
        Tables.lineitem(s, dir)
          .select(round(col("l_extendedprice") * 100).cast("long").as("cents")),
        "cents"))
  )

  val oracleSql: Map[String, String] = Map(
    "exact_median_selection" ->
      """WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |           FROM lineitem),
        |st AS (SELECT count(*) AS n, (count(*) + 1) // 2 AS k FROM v),
        |r AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM v)
        |SELECT st.n, st.k, r.cents AS kth
        |FROM r CROSS JOIN st WHERE r.rn = st.k""".stripMargin
  )
}
