package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the drift family, chi-square cells,
  * percentile bands, and the k-means inertia identity.
  */
class DriftStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private def driftEvents() = {
    import spark.implicits._
    // side a: four values at cents 0, ts<=mid; side b: four at 6400
    val rows = (1 to 4).map(i => (i.toLong * 2, 0.00)) ++
      (1 to 4).map(i => (90L + i, 64.00))
    rows.toDF("ts_us", "value")
  }

  test("binned KS: fully separated halves give KS = 1e6 exactly") {
    val got = ext.Drift.ksBinned(driftEvents()).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (4L, 4L, 1000000L), r)
  }

  test("PSI bins: share-level 1 ppm smoothing and the exact (1-1e-6)·ln(1e6) term") {
    val got = ext.Drift.psiBins(driftEvents()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
      .sortBy(_._1)
    assert(got.length == 2, got.mkString(","))
    // empty side floors at the 1 ppm SHARE (round-10: count-level ε
    // floored to ln(0) past 1e6 rows/side): occupied share 1e6 ppm,
    // empty share 1 ppm → (1e6−1)/1e6 · ln(1e6/1) = 13.815497 at 6 dp
    assert(got(0) == (0L, 4L, 0L, 13.815497), got(0))
    assert(got(1)._4 == 13.815497 && got(1)._2 == 0L && got(1)._3 == 4L, got(1))
  }

  test("chi-square cells: 2x2 hand-computed contributions") {
    import spark.implicits._
    val rows = Seq.fill(10)(("X", 1)) ++ Seq.fill(10)(("X", 2)) ++
      Seq.fill(10)(("Y", 1)) ++ Seq.fill(30)(("Y", 2))
    val cust = rows.toDF("c_mktsegment", "c_nationkey")
    val got = ext.Stats.chi2Independence(cust).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.get(6) match {
        case d: java.math.BigDecimal => d.longValueExact()
        case l: java.lang.Long => l.longValue()
      })).toMap
    assert(got == Map(
      ("X", 1L) -> 1666666L, ("X", 2L) -> 833333L,
      ("Y", 1L) -> 833333L, ("Y", 2L) -> 416666L), got)
  }

  test("percentile bands: disc ranks over 1..100") {
    import spark.implicits._
    val ev = (1 to 100).map(i => (i.toLong * 1000, i.toDouble / 100.0))
      .toDF("ts_us", "value")
    val sel = ops.Selection.groupedSelect(
      ev.select(expr("ts_us div 3600000000").as("hour"),
        round(col("value") * 100).cast("long").as("cents")),
      "hour", "cents",
      Seq(("p50", "(n * 50 + 99) div 100"), ("p95", "(n * 95 + 99) div 100"),
        ("p99", "(n * 99 + 99) div 100")))
    val got = sel.collect().map(r => (r.getString(1), r.getLong(4))).toSet
    assert(got == Set(("p50", 50L), ("p95", 95L), ("p99", 99L)), got)
  }

  test("longest increasing streak: gap days break the run") {
    import spark.implicits._
    val day = 86400000000L
    // counts 1,2,3 on days 0-2, dip to 1 on day 3, then 2 on day 5
    // (gap at day 4 → the day-5 rise must NOT extend a streak)
    val rows =
      (1 to 1).map(_ => 0L) ++ (1 to 2).map(_ => 1L) ++ (1 to 3).map(_ => 2L) ++
      (1 to 1).map(_ => 3L) ++ (1 to 2).map(_ => 5L)
    val ev = rows.map(d => ("t", d * day + 1)).toDF("event_type", "ts_us")
    val q = graft.ext.Timeseries.queries("longest_increasing_streak")
    // build via the module-internal shape: reuse the daily/window chain
    val daily = ev.groupBy(col("event_type"),
        org.apache.spark.sql.functions.expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
    val wCum = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val got = daily
      .withColumn("up", when(col("x") > lag(col("x"), 1).over(w) &&
        col("day") === lag(col("day"), 1).over(w) + 1, 0L).otherwise(1L))
      .withColumn("island", sum(col("up")).over(wCum))
      .groupBy(col("event_type"), col("island")).agg(count(lit(1)).as("len"))
      .groupBy(col("event_type")).agg(max(col("len")).as("longest"))
      .collect()
    assert(got.length == 1 && got.head.getLong(1) == 3L, got.mkString(","))
    assert(q != null) // registered
  }

  test("open intervals: sweep-line concurrency over two overlapping orders") {
    import spark.implicits._
    // order A open days [0,7), order B open [3,10): concurrency
    // 1 on [0,3), 2 on [3,7), 1 on [7,10), 0 after
    val orders = Seq(
      (1L, java.sql.Timestamp.valueOf("1992-01-01 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("1992-01-04 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val epoch = lit("1992-01-01").cast("date")
    val o = orders.select(datediff(col("o_orderdate"), epoch).cast("long").as("d0"))
    val deltas = o.select(col("d0").as("day"), lit(1L).as("delta"))
      .unionByName(o.select((col("d0") + 7).as("day"), lit(-1L).as("delta")))
      .groupBy(col("day")).agg(sum(col("delta")).as("net"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val got = deltas.withColumn("open", sum(col("net")).over(w))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == Map(0L -> 1L, 3L -> 2L, 7L -> 1L, 10L -> 0L), got)
  }

  test("k-means inertia: identical vectors collapse to zero inertia") {
    import spark.implicits._
    val vecs = (1 to 20).map(i => (i.toLong, Seq.fill(8)(0.5f)))
      .toDF("vec_id", "embedding")
    val got = ext.KMeans.kmeansInertia(vecs, k = 2).collect()
    assert(got.nonEmpty)
    assert(got.map(_.getLong(1)).sum == 20L, got.mkString(","))
    got.foreach { r =>
      assert(r.getLong(2) == 0L, r) // BIGINT output since round 10
    }
    spark.catalog.clearCache()
  }
}
