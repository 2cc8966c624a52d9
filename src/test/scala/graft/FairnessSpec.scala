package graft

import graft.ext.Fairness
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fairness-audit family: demographic parity and equalized odds. */
class FairnessSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("parity: identical acceptance rates give zero gap; disparate rates measure it") {
    import spark.implicits._
    val even = Seq(("a", 1), ("a", 0), ("b", 1), ("b", 0)).toDF("g", "acc")
    val e = Fairness.parityGap(even, col("g"), col("acc")).collect()
    assert(e.forall(_.getAs[Long]("parity_gap_ppm") == 0L))
    assert(e.forall(_.getAs[Long]("accept_ppm") == 500000L))
    // group a accepts 3/4, group b 1/4 → gap 500000 ppm
    val skew = Seq(("a", 1), ("a", 1), ("a", 1), ("a", 0),
      ("b", 1), ("b", 0), ("b", 0), ("b", 0)).toDF("g", "acc")
    val s = Fairness.parityGap(skew, col("g"), col("acc")).collect()
    assert(s.forall(_.getAs[Long]("parity_gap_ppm") == 500000L))
  }

  test("equalized odds: a perfect predictor has TPR=1e6, FPR=0, zero gaps") {
    import spark.implicits._
    val d = Seq(("a", 1, 1), ("a", 0, 0), ("b", 1, 1), ("b", 0, 0), ("b", 1, 1))
      .toDF("g", "y", "p")
    val r = Fairness.equalizedOdds(d, col("g"), col("y"), col("p")).collect()
    r.foreach { row =>
      assert(row.getAs[Long]("tpr_ppm") == 1000000L, row.toString)
      assert(row.getAs[Long]("fpr_ppm") == 0L)
      assert(row.getAs[Long]("tpr_gap_ppm") == 0L)
      assert(row.getAs[Long]("fpr_gap_ppm") == 0L)
    }
    // group-b-only false positives: FPR gap = b's FPR
    val biased = Seq(("a", 1, 1), ("a", 0, 0), ("b", 1, 1), ("b", 0, 1))
      .toDF("g", "y", "p")
    val b = Fairness.equalizedOdds(biased, col("g"), col("y"), col("p"))
      .collect()
    assert(b.forall(_.getAs[Long]("fpr_gap_ppm") == 1000000L))
    assert(b.forall(_.getAs[Long]("tpr_gap_ppm") == 0L))
  }

  test("property: rates replay exactly and gaps equal max-min on random groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (0 until 8).foreach { _ =>
      val n = 40 + rnd.nextInt(300)
      val rows = Seq.fill(n)((s"g${rnd.nextInt(5)}", rnd.nextInt(2), rnd.nextInt(2)))
      val df = rows.toDF("g", "y", "p")
      val par = Fairness.parityGap(df, col("g"), col("p")).collect()
      val expect = rows.groupBy(_._1).map { case (g, rs) =>
        g -> (rs.map(_._3.toLong).sum * 1000000L / rs.length)
      }
      par.foreach { r =>
        assert(r.getAs[Long]("accept_ppm") == expect(r.getAs[String]("grp")))
      }
      assert(par.head.getAs[Long]("parity_gap_ppm") ==
        expect.values.max - expect.values.min)
      val eo = Fairness.equalizedOdds(df, col("g"), col("y"), col("p")).collect()
      val tprs = eo.map(_.getAs[Long]("tpr_ppm"))
      val fprs = eo.map(_.getAs[Long]("fpr_ppm"))
      assert(eo.head.getAs[Long]("tpr_gap_ppm") == tprs.max - tprs.min)
      assert(eo.head.getAs[Long]("fpr_gap_ppm") == fprs.max - fprs.min)
    }
  }

  test("registered queries: one row per source, gaps replicated and consistent") {
    val p = Fairness.queries("fairness_parity_gap")(spark, sf).collect()
    assert(p.length > 1)
    val rates = p.map(_.getAs[Long]("accept_ppm"))
    assert(p.map(_.getAs[Long]("parity_gap_ppm")).distinct.length == 1)
    assert(p.head.getAs[Long]("parity_gap_ppm") == rates.max - rates.min)
    val eo = Fairness.queries("fairness_equalized_odds")(spark, sf).collect()
    val tprs = eo.map(_.getAs[Long]("tpr_ppm"))
    assert(eo.head.getAs[Long]("tpr_gap_ppm") == tprs.max - tprs.min)
    eo.foreach { r =>
      assert(r.getAs[Long]("tpr_ppm") >= 0 && r.getAs[Long]("tpr_ppm") <= 1000000L)
      assert(r.getAs[Long]("fpr_ppm") >= 0 && r.getAs[Long]("fpr_ppm") <= 1000000L)
    }
  }
}
