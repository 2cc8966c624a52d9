package graft

import graft.ext.{Agreement, ClassifierEval, RankStats, Stats, Survival, Timeseries}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 statistics wave: log-rank, MCC, Krippendorff's alpha,
  * one-way ANOVA F, Kruskal–Wallis H, Theil–Sen — closed-form fixtures
  * with hand-computed expectations, then the degenerate-input guards.
  */
class StatTestsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private val dayUs = 86400000000L

  test("logRank: identical cohorts give zero O-E at every interval") {
    import spark.implicits._
    // pairs (2k, 2k+1) share a lifetime; parity split => cohorts equal.
    // lifetimes 0/20/40/60 churn (cutoff = 80-14=66d); 80 is censored.
    val rows = (0 until 10).flatMap { u =>
      val life = (u / 2) * 20L * dayUs
      Seq((u.toLong, 0L), (u.toLong, life))
    }
    val lr = Survival.logRank(rows.toDF("user_id", "ts_us"), censorDays = 14)
      .collect().map(r => r.getAs[Long]("t_days") -> r).toMap
    assert(lr.keySet == Set(0L, 20L, 40L, 60L, 80L))
    lr.values.foreach { r =>
      assert(r.getAs[Long]("n_risk_a") == r.getAs[Long]("n_risk_b"))
      assert(r.getAs[Long]("d_a") == r.getAs[Long]("d_b"))
      assert(r.getAs[Long]("oe_cum_ppm") == 0L, r.toString)
    }
    // t=0: d=2 of n=10 at risk, n_a=n_b=5:
    // v = 2*5*5*8e12/(100*9) = 444_444_444_444
    assert(lr(0L).getAs[Long]("v_x1e12") == 444444444444L)
    // censored-only day: no events, expected 0, variance 0
    assert(lr(80L).getAs[Long]("d_a") == 0L)
    assert(lr(80L).getAs[Long]("v_x1e12") == 0L)
  }

  test("matthewsCorr: perfect / inverted / independent / degenerate") {
    import spark.implicits._
    def mcc(rows: Seq[(Int, Int)]) =
      ClassifierEval.matthewsCorr(rows.toDF("y", "p"), col("y"), col("p"))
        .collect().head
    val perfect = mcc(Seq((1, 1), (1, 1), (0, 0), (0, 0)))
    assert(perfect.getAs[Long]("mcc_num") == 4L)
    assert(perfect.getAs[Long]("mcc2_x1e6") == 1000000L)
    val inverted = mcc(Seq((1, 0), (1, 0), (0, 1), (0, 1)))
    assert(inverted.getAs[Long]("mcc_num") == -4L)
    assert(inverted.getAs[Long]("mcc2_x1e6") == 1000000L)
    val indep = mcc(Seq((1, 1), (1, 0), (0, 1), (0, 0)))
    assert(indep.getAs[Long]("mcc_num") == 0L)
    assert(indep.getAs[Long]("mcc2_x1e6") == 0L)
    // all predicted positive => (tn+fn)=0 margin => pinned NULL
    val degen = mcc(Seq((1, 1), (0, 1)))
    assert(degen.isNullAt(degen.fieldIndex("mcc2_x1e6")))
  }

  test("krippendorffAlpha3: unanimity-with-variance = 1e6; pooled-unanimous pins NULL") {
    import spark.implicits._
    val d = Seq((3L, 0L, 3L, 0L)).flatMap(_ => Seq(
      (600L, 100L, 90L), (100L, 10L, 5L), (700L, 120L, 95L), (50L, 3L, 2L)))
      .toDF("n_chars", "n_tokens", "n_uniq")
    // raters: >=500 chars / >=80 tokens / >=60 uniq agree on every item
    val a = Agreement.krippendorffAlpha3(d,
      col("n_chars") >= 500, col("n_tokens") >= 80, col("n_uniq") >= 60)
      .collect().head
    assert(a.getAs[Long]("d_obs") == 0L)
    assert(a.getAs[Long]("alpha_ppm") == 1000000L)
    // hand fixture: pos = [2, 1] => S=3, N=2, d_obs=4,
    // aden = 2*3*(6-3) = 18, num = 18 - 5*4 = -2 => -111111 (trunc to 0)
    val d2 = Seq((600L, 100L, 5L), (600L, 10L, 2L))
      .toDF("n_chars", "n_tokens", "n_uniq")
    val a2 = Agreement.krippendorffAlpha3(d2,
      col("n_chars") >= 500, col("n_tokens") >= 80, col("n_uniq") >= 60)
      .collect().head
    assert(a2.getAs[Long]("alpha_ppm") == -111111L)
    // every value positive => Nm - S = 0 => denominator 0 => NULL
    val d3 = Seq((600L, 100L, 90L)).toDF("n_chars", "n_tokens", "n_uniq")
    val a3 = Agreement.krippendorffAlpha3(d3,
      col("n_chars") >= 500, col("n_tokens") >= 80, col("n_uniq") >= 60)
      .collect().head
    assert(a3.isNullAt(a3.fieldIndex("alpha_ppm")))
  }

  test("anovaFOneway: hand-computed F; zero within-variance pins NULL") {
    import spark.implicits._
    // g1: {1,3}, g2: {9,11}: SSB=64, SSW=4, F=(64/1)/(4/2)=32
    val d = Seq(("a", 1L), ("a", 3L), ("b", 9L), ("b", 11L)).toDF("g", "x")
    val f = Stats.anovaFOneway(d, col("g"), col("x")).collect().head
    assert(f.getAs[Long]("k") == 2L)
    assert(f.getAs[Long]("ssb_stage") == 64L)
    assert(f.getAs[Long]("ssw_stage") == 4L)
    assert(f.getAs[Long]("f_x1e6") == 32000000L)
    // constant-within groups: SSW = 0 => NULL (infinite F is undefined)
    val d0 = Seq(("a", 1L), ("a", 1L), ("b", 2L), ("b", 2L)).toDF("g", "x")
    val f0 = Stats.anovaFOneway(d0, col("g"), col("x")).collect().head
    assert(f0.isNullAt(f0.fieldIndex("f_x1e6")))
  }

  test("kruskalWallisH: tie-free hand value; all-ties pin NULL correction") {
    import spark.implicits._
    // a:{1,2}, b:{3,4}: doubled ranks 2,4 / 6,8; R2_a=6, R2_b=14
    // srn6 = 36e6/8 + 196e6/8 = 29e6; H = 12*29e6/20 - 15e6 = 2.4e6
    val d = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)).toDF("g", "v")
    val h = RankStats.kruskalWallisH(d, "g", "v")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(h("a").getAs[Long]("r2_sum") == 6L)
    assert(h("b").getAs[Long]("r2_sum") == 14L)
    assert(h("a").getAs[Long]("h_x1e6") == 2400000L)
    // no ties => correction is identity
    assert(h("a").getAs[Long]("hc_x1e6") == 2400000L)
    // midranks under ties: a:{5,5}, b:{5,5} => every r2 = n+1 = 5*2,
    // H = 0 raw; tie term = n^3-n => correction denominator 0 => NULL
    val dt = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "v")
    val ht = RankStats.kruskalWallisH(dt, "g", "v").collect().head
    assert(ht.getAs[Long]("h_x1e6") == 0L)
    assert(ht.isNullAt(ht.fieldIndex("hc_x1e6")))
  }

  test("theilSenTrend: exact line recovers slope; one outlier day cannot move it") {
    import spark.implicits._
    val line = (0L until 10L).map(d => (d, 5L * d + 100L))
    val t = Timeseries.theilSenTrend(line.toDF("day", "y"), "day", "y")
      .collect().head
    assert(t.getAs[Long]("n_days") == 10L)
    assert(t.getAs[Long]("n_pairs") == 45L)
    assert(t.getAs[Long]("slope_med_x1e6") == 5000000L)
    // poison one day with a 100x spike: the median pairwise slope holds
    val dirty = line.map { case (d, y) => if (d == 4L) (d, y * 100) else (d, y) }
    val t2 = Timeseries.theilSenTrend(dirty.toDF("day", "y"), "day", "y")
      .collect().head
    assert(t2.getAs[Long]("slope_med_x1e6") == 5000000L)
  }
}
