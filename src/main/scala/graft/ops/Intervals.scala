package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** I5 `merge_intervals` — per key, merge overlapping *and adjacent*
  * half-open `[start, end)` intervals (reference `_regroupNodeRanges`,
  * src/index/index.cpp:142-153, which repairs RLE runs split across rank
  * boundaries).
  *
  * Spark-first: the classic running-max island formulation — a new island
  * starts when `start` exceeds the running max of all previous `end`s
  * within the key. One shuffle on the key; the window sort is per-key, and
  * the follow-up groupBy reuses the partitioning. No `collect_list` — state
  * per row is O(1), so a skewed key with millions of intervals streams
  * through the window operator (spilling if needed) instead of
  * materializing an array.
  */
object Intervals {

  def merge(df: DataFrame, keyCol: String,
            startCol: String = "range_start", endCol: String = "range_end"): DataFrame = {
    val order = Window.partitionBy(col(keyCol)).orderBy(col(startCol), col(endCol))
    val runningMaxPrevEnd = max(col(endCol))
      .over(order.rowsBetween(Window.unboundedPreceding, -1))
    val break = when(col(startCol) > coalesce(runningMaxPrevEnd, lit(Long.MinValue)), 1)
      .otherwise(0)
    df.withColumn("_brk", break)
      .withColumn("_island", sum(col("_brk")).over(order.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("_island"))
      .agg(min(col(startCol)).as(startCol), max(col(endCol)).as(endCol))
      .drop("_island")
  }

  /** Alternative formulation for heavy skew: streaming merge over
    * per-key SORTED groups (`flatMapSortedGroups`) — O(1) state per key
    * regardless of interval count, no window operator, no array
    * materialization. Same results as `merge` (property-tested); the
    * window form wins when keys are small, this one when a single key
    * holds millions of intervals (the reference's `_regroupNodeRanges`
    * is this exact streaming merge, index.cpp:142-153).
    */
  def mergeSorted(df: DataFrame, keyCol: String,
                  startCol: String = "range_start", endCol: String = "range_end"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(col(keyCol).cast("long"), col(startCol).cast("long"), col(endCol).cast("long"))
    projected.as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col(startCol), col(endCol)) { (key, it) =>
        new Iterator[(Long, Long, Long)] {
          private var cur: Option[(Long, Long)] = None
          private var out: Option[(Long, Long, Long)] = None
          private def advance(): Unit = {
            while (out.isEmpty && it.hasNext) {
              val (_, s, e) = it.next()
              cur match {
                case None => cur = Some((s, e))
                case Some((cs, ce)) if s <= ce => cur = Some((cs, math.max(ce, e)))
                case Some((cs, ce)) => out = Some((key, cs, ce)); cur = Some((s, e))
              }
            }
            if (out.isEmpty && !it.hasNext && cur.isDefined) {
              out = Some((key, cur.get._1, cur.get._2)); cur = None
            }
          }
          def hasNext: Boolean = { if (out.isEmpty) advance(); out.isDefined }
          def next(): (Long, Long, Long) = {
            if (out.isEmpty) advance()
            val r = out.get; out = None; r
          }
        }
      }
      .toDF(keyCol, startCol, endCol)
  }

  /** Typed `Aggregator[IN, BUF, OUT]` — the Dataset-native aggregate
    * rung of the extension ladder: per-group UNION LENGTH of half-open
    * intervals. The buffer is the sorted DISJOINT merged interval list,
    * so `reduce` and `merge` both fold overlaps eagerly — buffer size is
    * bounded by the number of disjoint covered regions (the measure-
    * theoretic minimum), never the input count, and partial aggregation
    * runs map-side like any built-in agg. Coverage is a set measure:
    * order-free, so any partitioning yields identical results.
    */
  object CoverageAgg extends org.apache.spark.sql.expressions.Aggregator[
      (Long, Long, Long), List[(Long, Long)], Long] {
    override def zero: List[(Long, Long)] = Nil
    private def insert(buf: List[(Long, Long)], iv: (Long, Long)): List[(Long, Long)] = {
      val (before, rest) = buf.span(_._2 < iv._1)    // strictly left of iv
      val (overlap, after) = rest.span(_._1 <= iv._2) // touching/overlapping
      val merged =
        if (overlap.isEmpty) iv
        else (math.min(iv._1, overlap.head._1), math.max(iv._2, overlap.last._2))
      before ::: merged :: after
    }
    override def reduce(buf: List[(Long, Long)], row: (Long, Long, Long)): List[(Long, Long)] =
      insert(buf, (row._2, row._3))
    override def merge(a: List[(Long, Long)], b: List[(Long, Long)]): List[(Long, Long)] =
      b.foldLeft(a)(insert)
    override def finish(buf: List[(Long, Long)]): Long =
      buf.iterator.map { case (s, e) => e - s }.sum
    override def bufferEncoder: org.apache.spark.sql.Encoder[List[(Long, Long)]] =
      org.apache.spark.sql.Encoders.kryo[List[(Long, Long)]]
    override def outputEncoder: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
  }

  val queries: Map[String, Q] = Map(
    // Coverage via the typed Aggregator: per supplier, how many days are
    // covered by the union of 7-day windows following each shipment.
    "interval_coverage" -> ((s, dir) => {
      import s.implicits._
      val epoch = lit("1992-01-01").cast("date")
      Tables.lineitem(s, dir)
        .select(col("l_suppkey"),
          datediff(col("l_shipdate"), epoch).cast("long").as("s"),
          (datediff(col("l_shipdate"), epoch) + 7).cast("long").as("e"))
        .as[(Long, Long, Long)]
        .groupByKey(_._1)
        .agg(CoverageAgg.toColumn.name("covered_days"))
        .toDF("l_suppkey", "covered_days")
    }),
    // Synthetic sparse intervals over lineitem: start = 5×orderkey leaves
    // gaps; end = start + quantity (1..50) produces a genuine mix of
    // overlapping, adjacent, and disjoint intervals per supplier.
    "merge_intervals" -> ((s, dir) => {
      val iv = Tables.lineitem(s, dir).select(
        col("l_suppkey").as("k"),
        (col("l_orderkey") * 5).as("range_start"),
        (col("l_orderkey") * 5 + floor(col("l_quantity")).cast("long")).as("range_end"))
      merge(iv, "k")
    })
  )

  // Both oracles deduplicate intervals first: duplicates contribute
  // nothing to a union, and they make the two-pass window-island
  // formulation tie-FRAGILE — DuckDB 1.0 computes prev_max and the
  // running island sum in separate window operators whose tie order can
  // differ under multithreading, nondeterministically attaching a
  // duplicate boundary row to the wrong island (observed at sf0.1:
  // covered_days 1997 vs 2007 across runs of the same query; the
  // single-threaded run and the Spark side agree on 1997). DISTINCT
  // restores a total order per key, making the oracle deterministic;
  // the Spark sides are unaffected (the Aggregator is a set measure,
  // and Spark evaluates both window functions over one sorted stream).
  val oracleSql: Map[String, String] = Map(
    "interval_coverage" ->
      """WITH iv AS (
        |  SELECT DISTINCT l_suppkey,
        |    date_diff('day', DATE '1992-01-01', l_shipdate) AS s,
        |    date_diff('day', DATE '1992-01-01', l_shipdate) + 7 AS e
        |  FROM lineitem),
        |m AS (
        |  SELECT *, max(e) OVER (PARTITION BY l_suppkey ORDER BY s, e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM iv),
        |g AS (
        |  SELECT *, CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END AS brk
        |  FROM m),
        |i AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY l_suppkey ORDER BY s, e
        |    ROWS UNBOUNDED PRECEDING) AS island
        |  FROM g),
        |isl AS (
        |  SELECT l_suppkey, island, max(e) - min(s) AS len
        |  FROM i GROUP BY l_suppkey, island)
        |SELECT l_suppkey, CAST(sum(len) AS BIGINT) AS covered_days
        |FROM isl GROUP BY l_suppkey""".stripMargin,
    "merge_intervals" ->
      """WITH iv AS (
        |  SELECT DISTINCT l_suppkey AS k, l_orderkey * 5 AS range_start,
        |         l_orderkey * 5 + CAST(floor(l_quantity) AS BIGINT) AS range_end
        |  FROM lineitem),
        |m AS (
        |  SELECT k, range_start, range_end,
        |    CASE WHEN range_start > COALESCE(MAX(range_end) OVER (
        |           PARTITION BY k ORDER BY range_start, range_end
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |         -9223372036854775808) THEN 1 ELSE 0 END AS brk
        |  FROM iv),
        |isl AS (
        |  SELECT k, range_start, range_end,
        |    SUM(brk) OVER (PARTITION BY k ORDER BY range_start, range_end
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM m)
        |SELECT k, min(range_start) AS range_start, max(range_end) AS range_end
        |FROM isl GROUP BY k, island""".stripMargin
  )
}
