package graft

import graft.ext.Calibration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Calibration family: reliability diagram, ECE/Brier, Welch t-test —
  * closed-form fixtures first, then the registered queries' invariants
  * on testdata.
  */
class CalibrationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("reliability: a perfectly calibrated score has zero gap in every bin") {
    import spark.implicits._
    // 10 copies of each score 50k..950k ppm, with exactly score/1e6 of
    // each bin's rows positive (scores sit at bin centers: 20 rows per
    // bin, k positives where k = 2*binIndex... use 100 rows per score,
    // positives = score_ppm/10000 of them)
    val rows = for {
      c <- 0 until 10
      i <- 0 until 100
    } yield (c * 100000L + 50000L, if (i < c * 10 + 5) 1L else 0L)
    val df = rows.toDF("score_ppm", "y")
    val rel = Calibration.reliability(df).collect()
    assert(rel.length == 10)
    rel.foreach { r =>
      assert(r.getAs[Long]("gap_ppm") == 0L, r.toString)
      assert(r.getAs[Long]("conf_ppm") == r.getAs[Long]("acc_ppm"))
    }
    val eb = Calibration.eceBrier(df).head()
    assert(eb.getAs[Long]("ece_ppm") == 0L)
    // Brier of a calibrated p-forecast equals mean p(1-p) here:
    // (1/10)·Σ p(1-p)·1e12 over p = .05,.15,…,.95 = 0.1675e12
    assert(eb.getAs[Long]("brier_x1e12") == 167500000000L, eb.toString)
  }

  test("reliability: an anti-calibrated score maximizes ECE") {
    import spark.implicits._
    // confident-and-wrong: score 950k, all negatives; score 50k, all
    // positives → every bin gap is 950k ppm
    val rows = (0 until 50).map(_ => (950000L, 0L)) ++
      (0 until 50).map(_ => (50000L, 1L))
    val eb = Calibration.eceBrier(rows.toDF("score_ppm", "y")).head()
    assert(eb.getAs[Long]("ece_ppm") == 950000L, eb.toString)
    // Brier: mean of (0.95)²=0.9025e12 and (0.95)²... both cells
    // (950k-0)² and (50k-1e6)² = 902.5e9 each
    assert(eb.getAs[Long]("brier_x1e12") == 902500000000L, eb.toString)
  }

  test("welch: identical groups give t²=0; separated groups give large t²") {
    import spark.implicits._
    val same = ((1 to 100).map(i => (i % 10, "a")) ++
      (1 to 100).map(i => (i % 10, "b"))).toDF("x", "g")
    val w0 = Calibration.welch(same, col("x"), col("g") === "a",
      col("g") === "b").head()
    assert(w0.getAs[Long]("dm_ppm") == 0L)
    assert(w0.getAs[Long]("t2_ppm") == 0L)
    assert(w0.getAs[Long]("d2_ppm") == 0L)
    // group a ~ 10, group b ~ 1000, tiny variance → huge t²
    val apart = ((1 to 50).map(i => (10 + i % 3, "a")) ++
      (1 to 50).map(i => (1000 + i % 3, "b"))).toDF("x", "g")
    val w1 = Calibration.welch(apart, col("x"), col("g") === "a",
      col("g") === "b").head()
    assert(math.abs(w1.getAs[Long]("dm_ppm") + 990000000L) < 2000000L,
      w1.toString) // mean diff ≈ −990 in ppm
    assert(w1.getAs[Long]("t2_ppm") > 1000000L * 1000L, w1.toString)
    // Welch–Satterthwaite df for equal n, near-equal var ≈ n1+n2−2
    val df = w1.getAs[Long]("df_ppm")
    assert(df > 90L * 1000000L && df < 99L * 1000000L, w1.toString)
  }

  test("welch: degenerate cohorts emit NULL statistics, not errors") {
    import spark.implicits._
    // cohort b has one row → v2 undefined → t²/df/d² NULL
    val df = ((1 to 20).map(i => (i, "a")) :+ ((5, "b"))).toDF("x", "g")
    val w = Calibration.welch(df, col("x"), col("g") === "a",
      col("g") === "b").head()
    assert(w.isNullAt(w.fieldIndex("var2_x1e6")))
    assert(w.isNullAt(w.fieldIndex("t2_ppm")))
    assert(w.isNullAt(w.fieldIndex("df_ppm")))
    assert(w.isNullAt(w.fieldIndex("d2_ppm")))
    // zero variance in BOTH cohorts (constant x) → a1+a2 = 0 → NULL t²
    val const = ((1 to 10).map(_ => (7, "a")) ++ (1 to 10).map(_ => (7, "b")))
      .toDF("x", "g")
    val wc = Calibration.welch(const, col("x"), col("g") === "a",
      col("g") === "b").head()
    assert(wc.getAs[Long]("var1_x1e6") == 0L)
    assert(wc.isNullAt(wc.fieldIndex("t2_ppm")))
  }

  test("property: welch matches an exact driver-side integer replay on random cohorts") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (0 until 10).foreach { _ =>
      val n1 = 2 + rnd.nextInt(200); val n2 = 2 + rnd.nextInt(200)
      val xs1 = Array.fill(n1)(rnd.nextInt(1000).toLong)
      val xs2 = Array.fill(n2)(rnd.nextInt(1000).toLong)
      val df = (xs1.map((_, "a")) ++ xs2.map((_, "b"))).toSeq.toDF("x", "g")
      val w = Calibration.welch(df, col("x"), col("g") === "a",
        col("g") === "b").head()
      // replay the staged truncating arithmetic exactly (BigInt = the
      // decimal(38,0) ride; / on positive BigInt truncates like div)
      def varX1e6(n: Long, xs: Array[Long]): BigInt = {
        val s = BigInt(xs.sum); val q = BigInt(xs.map(x => x * x).sum)
        (BigInt(n) * q - s * s) * 1000000 / (BigInt(n) * (n - 1))
      }
      val v1 = varX1e6(n1, xs1); val v2 = varX1e6(n2, xs2)
      assert(w.getAs[Long]("var1_x1e6") == v1.toLong)
      assert(w.getAs[Long]("var2_x1e6") == v2.toLong)
      def tdiv(a: BigInt, b: BigInt): BigInt = // Spark div truncates toward 0
        if (b == 0) BigInt(0) else { val q = a.abs / b.abs; if (a.sign * b.sign < 0) -q else q }
      val dm = tdiv(BigInt(xs1.sum) * 1000000, n1) - tdiv(BigInt(xs2.sum) * 1000000, n2)
      assert(w.getAs[Long]("dm_ppm") == dm.toLong)
      val a1 = tdiv(v1, n1); val a2 = tdiv(v2, n2)
      if (a1 + a2 != 0)
        assert(w.getAs[Long]("t2_ppm") == tdiv(dm * dm, a1 + a2).toLong)
    }
  }

  test("registered queries: shapes and invariants on testdata") {
    val rel = Calibration.queries("calibration_reliability")(spark, sf).collect()
    assert(rel.length == 10)
    assert(math.abs(rel.map(_.getAs[Long]("n")).sum - 6000L) <= 1000L)
    rel.foreach { r =>
      val conf = r.getAs[Long]("conf_ppm"); val acc = r.getAs[Long]("acc_ppm")
      assert(conf >= 0 && conf <= 1000000L)
      assert(acc >= 0 && acc <= 1000000L)
      assert(r.getAs[Long]("gap_ppm") == math.abs(conf - acc))
    }
    val eb = Calibration.queries("calibration_ece_brier")(spark, sf).head()
    // the naive quantity score is uncalibrated by design: ECE must be
    // far from 0 (bins span [0,1] while the base rate is ~1/3)
    assert(eb.getAs[Long]("ece_ppm") > 150000L, eb.toString)
    val w = Calibration.queries("welch_ttest")(spark, sf).head()
    assert(w.getAs[Long]("n1") > 0 && w.getAs[Long]("n2") > 0)
    // quantity is uniform 1..50 in both cohorts: variance ≈ 208e6 ppm
    assert(math.abs(w.getAs[Long]("var1_x1e6") - 208000000L) < 15000000L)
  }
}
