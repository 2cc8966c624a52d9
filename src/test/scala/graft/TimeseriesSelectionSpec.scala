package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** CUSUM (closed form vs the textbook recursion), linear interpolation
  * (hand cases incl. negative slopes), the DQ suite's cross-checked
  * counts, and two-phase exact selection vs a plain sort.
  */
class TimeseriesSelectionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  // ---- CUSUM ----

  private def cusumOf(vals: Seq[Long]): Seq[(Long, Long)] = {
    import spark.implicits._
    val df = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("key", "pos", "x").repartition(3)
    graft.ext.Timeseries.cusum(df, "key", Seq("pos"), "x")
      .orderBy("pos").collect()
      .map(r => (r.getAs[Long]("cusum_pos"), r.getAs[Long]("cusum_neg"))).toSeq
  }

  test("cusum matches the hand-computed closed form") {
    // x = [1,1,4]: n=3, total=6, d_scaled = [-3,-3,6], p = [-3,-6,0]
    // s+ = p - min(0, runmin p) = [0,0,6]; s- = max(0, runmax p) - p = [3,6,0]
    assert(cusumOf(Seq(1L, 1L, 4L)) == Seq((0L, 3L), (0L, 6L), (6L, 0L)))
  }

  test("closed form equals the textbook recursion on random streams") {
    val rnd = new Random(7)
    val vals = Seq.fill(64)(rnd.nextInt(1000).toLong)
    val n = vals.size
    val total = vals.sum
    val d = vals.map(v => n * v - total)
    var sp = 0L; var sn = 0L
    val expected = d.map { di =>
      sp = math.max(0L, sp + di); sn = math.max(0L, sn - di); (sp, sn)
    }
    assert(cusumOf(vals) == expected)
  }

  // ---- interpolation ----

  private def interp(rows: Seq[(String, Long, Long)]): Map[(String, Long), (Long, Boolean)] = {
    import spark.implicits._
    val df = rows.toDF("key", "minute", "x").repartition(3)
    graft.ext.Timeseries.interpolateMinutes(df, "key", "minute", "x")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
  }

  test("gaps interpolate linearly, observed minutes keep their aggregate") {
    // k: minute 0 -> 10, minute 3 -> 1 (two events summing to 1)
    val r = interp(Seq(("k", 0L, 10L), ("k", 3L, -1L), ("k", 3L, 2L)))
    assert(r == Map(
      ("k", 0L) -> ((10L, true)),
      ("k", 1L) -> ((7L, false)),  // 10 + (-9*1) div 3
      ("k", 2L) -> ((4L, false)),  // 10 + (-9*2) div 3
      ("k", 3L) -> ((1L, true))), r.toString)
  }

  test("negative slopes truncate toward zero in both engines' semantics") {
    // 0 -> -13 over 3 minutes: -13*1 div 3 = -4, -13*2 div 3 = -8
    val r = interp(Seq(("k", 0L, 0L), ("k", 3L, -13L)))
    assert(r(("k", 1L)) == ((-4L, false)), r.toString)
    assert(r(("k", 2L)) == ((-8L, false)), r.toString)
  }

  test("grid spans exactly first..last observed minute per key") {
    val r = interp(Seq(("a", 5L, 1L), ("a", 9L, 1L), ("b", 2L, 1L)))
    assert(r.keySet.map(_._1) == Set("a", "b"))
    assert(r.keys.filter(_._1 == "a").map(_._2).toSeq.sorted == (5L to 9L))
    assert(r.keys.filter(_._1 == "b").map(_._2).toSeq == Seq(2L))
  }

  // ---- data-quality suite ----

  test("dq suite counts cross-check against independent plans") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val suite = graft.ext.DataQuality.lineitemSuite(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(suite.size == 8)
    val n = li.count()
    // independent uniqueness count: surplus rows over distinct keys
    val dupSurplus = n - li.select("l_orderkey", "l_linenumber").distinct().count()
    assert(suite("lineitem.line_key_unique") == ((dupSurplus, n)), suite.toString)
    // independent RI count: left-anti join
    val orphan = li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti").count()
    assert(suite("lineitem.orderkey_in_orders") == ((orphan, n)), suite.toString)
    assert(suite.values.forall { case (v, c) => v >= 0 && v <= c })
  }

  // ---- golden record survivorship ----

  test("a later event with a null field does not erase the earlier value") {
    import spark.implicits._
    val ev = Seq(
      (1L, 10L, 100L, 500L, Some(7L)),   // k=7 at ts=100
      (1L, 11L, 200L, 600L, None),       // later event, k missing
      (2L, 20L, 50L, 300L, None)         // never had k
    ).toDF("user_id", "event_id", "ts_us", "cents", "k").repartition(3)
    val out = graft.ops.CoreOps.goldenRecord(ev)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
          r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(1L) == ((600L, Some(7L), 100L, 200L, 2L)), out.toString)
    assert(out(2L) == ((300L, None, 50L, 50L, 1L)), out.toString)
  }

  // ---- exact selection ----

  private def median(vals: Seq[Long], bins: Int = 16): (Long, Long, Long) = {
    import spark.implicits._
    val df = vals.toDF("x").repartition(5)
    val r = graft.ops.Selection.exactMedian(df, "x", bins).collect()
    assert(r.length == 1)
    (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2))
  }

  test("two-phase selection equals the sorted definition (odd and even n)") {
    val rnd = new Random(11)
    for (n <- Seq(31, 64, 1000)) {
      val vals = Seq.fill(n)(rnd.nextInt(100000).toLong - 50000)
      val k = (n + 1) / 2
      val expected = vals.sorted.apply(k - 1)
      assert(median(vals) == ((n.toLong, k.toLong, expected)), s"n=$n")
    }
  }

  test("degenerate all-equal column collapses into one bin and still selects") {
    assert(median(Seq.fill(17)(42L)) == ((17L, 9L, 42L)))
  }

  // ---- stratified exact sampling ----

  test("largest-remainder quotas sum to exactly the target and stay proportional") {
    import spark.implicits._
    val docs = (1L to 377L).map { i =>
      val lang = if (i % 11 == 0) "de" else if (i % 3 == 0) "fr" else "en"
      (i, lang)
    }.toDF("doc_id", "lang").repartition(7)
    val out = graft.ext.Sampling.stratifiedExactSample(docs, "lang", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(out.length == 100) // EXACT total — the operator's contract
    val quotas = out.map(x => x._1 -> x._2).toMap
    val sizes = Map("de" -> 34L, "fr" -> 114L, "en" -> 229L)
    assert(sizes.values.sum == 377L)
    for ((l, q) <- quotas) {
      val ideal = 100.0 * sizes(l) / 377.0
      assert(math.abs(q - ideal) <= 1.0, s"$l quota $q vs ideal $ideal")
    }
    assert(quotas.values.sum == 100L)
  }

  // ---- seasonal decomposition ----

  test("decomposition identity holds and a flat series has zero seasonal/residual") {
    import spark.implicits._
    val flat = (0L to 239L).map(m => ("k", m, 50L)).toDF("key", "minute", "x")
    val d = graft.ext.Timeseries.seasonalDecompose(flat, "key", "minute", "x")
      .collect()
    assert(d.length == 240)
    d.foreach { r =>
      val (v, trend, seasonal, residual) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(v == trend + seasonal + residual) // identity by construction
      assert(trend == 50L && seasonal == 0L && residual == 0L, r.toString)
    }
  }

  test("a pure period-60 seasonal pattern lands in the seasonal component") {
    import spark.implicits._
    // 4 full periods of: slot 0 spikes to 120, others 60 — mean is
    // 61 per minute; trend windows average out the spike except near
    // the edges, so check the interior rows
    val rows = (0L to 239L).map(m => ("k", m, if (m % 60 == 0) 120L else 60L))
    val d = graft.ext.Timeseries.seasonalDecompose(rows.toDF("key", "minute", "x"),
        "key", "minute", "x")
      .collect().map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(4)))).toMap
    // slot-0 seasonal = 120 - 61 = 59; other slots 60 - 61 = -1
    assert(d(60L)._2 == 59L, d(60L).toString)
    assert(d(61L)._2 == -1L, d(61L).toString)
    // interior trend = mean of a full 61-minute window containing
    // exactly one or two spikes: (60*61 + 60 + k*60)/61 with k spikes
    assert(d(120L)._1 >= 60L && d(120L)._1 <= 62L, d(120L).toString)
  }

  test("selection is partition-invariant") {
    import spark.implicits._
    val vals = (1L to 999L).map(v => v * 7 % 1000)
    val a = graft.ops.Selection.exactMedian(vals.toDF("x").repartition(1), "x").collect()
    val b = graft.ops.Selection.exactMedian(vals.toDF("x").repartition(13), "x").collect()
    assert(a.toSeq == b.toSeq)
  }
}
