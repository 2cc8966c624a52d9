package graft

import graft.ext.ClassifierEval
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Classifier-evaluation family: per-class PRF and the PR curve —
  * closed-form fixtures, then registered-query invariants.
  */
class ClassifierEvalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("multiclass PRF: a perfect classifier scores 1e6 on every class") {
    import spark.implicits._
    val d = Seq(("a", "a"), ("b", "b"), ("a", "a"), ("c", "c")).toDF("t", "p")
    val m = ClassifierEval.multiclassPrf(d, col("t"), col("p")).collect()
    assert(m.length == 3)
    m.foreach { r =>
      assert(r.getAs[Long]("precision_ppm") == 1000000L, r.toString)
      assert(r.getAs[Long]("recall_ppm") == 1000000L)
      assert(r.getAs[Long]("f1_ppm") == 1000000L)
    }
  }

  test("multiclass PRF: never-predicted and never-true classes get zero rows, not NULLs") {
    import spark.implicits._
    // 'c' is never predicted (recall 0), 'd' is predicted but never true
    val d = Seq(("a", "a"), ("c", "a"), ("c", "d")).toDF("t", "p")
    val m = ClassifierEval.multiclassPrf(d, col("t"), col("p"))
      .collect().map(r => r.getAs[String]("class") -> r).toMap
    assert(m.keySet == Set("a", "c", "d"))
    assert(m("c").getAs[Long]("recall_ppm") == 0L)
    assert(m("c").getAs[Long]("n_true") == 2L)
    assert(m("c").getAs[Long]("n_pred") == 0L)
    assert(m("d").getAs[Long]("n_true") == 0L)
    assert(m("d").getAs[Long]("precision_ppm") == 0L)
    // 'a': tp=1, n_pred=2, n_true=1 → P=500000, R=1e6, F1=2/3e6
    assert(m("a").getAs[Long]("precision_ppm") == 500000L)
    assert(m("a").getAs[Long]("f1_ppm") == 666666L)
  }

  test("PR curve: a perfectly separating score sweeps precision 1e6 down the recall axis") {
    import spark.implicits._
    // scores 1..100, positives = top 20 scores exactly
    val d = (1 to 100).map(i => (i.toLong, if (i > 80) 1 else 0))
      .toDF("score", "y")
    val c = ClassifierEval.prCurve(d, col("score"), col("y"))
      .collect().map(r => r.getAs[Long]("threshold") -> r).toMap
    assert(c.size == 100)
    // at threshold 81: all 20 positives, zero negatives
    assert(c(81L).getAs[Long]("precision_ppm") == 1000000L)
    assert(c(81L).getAs[Long]("recall_ppm") == 1000000L)
    // at threshold 100: 1 positive captured of 20
    assert(c(100L).getAs[Long]("recall_ppm") == 50000L)
    // at threshold 1: everything predicted positive → precision = base rate
    assert(c(1L).getAs[Long]("precision_ppm") == 200000L)
    assert(c(1L).getAs[Long]("tp") == 20L)
    assert(c(1L).getAs[Long]("fp") == 80L)
    // precision is 1e6 on every threshold above the separation point
    (81L to 100L).foreach { t =>
      assert(c(t).getAs[Long]("precision_ppm") == 1000000L, s"t=$t")
    }
  }

  test("property: margins, diagonal bounds, and F1 ordering hold on random confusions") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val classes = Array("w", "x", "y", "z")
    (0 until 8).foreach { _ =>
      val n = 50 + rnd.nextInt(300)
      val rows = Seq.fill(n)((classes(rnd.nextInt(4)), classes(rnd.nextInt(4))))
      val m = ClassifierEval.multiclassPrf(rows.toDF("t", "p"),
        col("t"), col("p")).collect()
      assert(m.map(_.getAs[Long]("n_true")).sum == n)
      assert(m.map(_.getAs[Long]("n_pred")).sum == n)
      m.foreach { r =>
        val tp = r.getAs[Long]("tp")
        assert(tp <= math.min(r.getAs[Long]("n_true"), r.getAs[Long]("n_pred")))
        // F1 is the harmonic mean: bounded by min/max of P and R
        // (truncation can undershoot the min by at most 1 ppm)
        val p = r.getAs[Long]("precision_ppm"); val rc = r.getAs[Long]("recall_ppm")
        val f1 = r.getAs[Long]("f1_ppm")
        assert(f1 <= math.max(p, rc) && f1 + 1 >= math.min(p, rc) - 0,
          r.toString)
        assert(f1 <= (p + rc + 1) / 2, r.toString) // HM <= AM
      }
      // PR curve on the same data with a random integer score
      val scored = Seq.fill(n)((rnd.nextInt(30).toLong, rnd.nextInt(2)))
      val c = ClassifierEval.prCurve(scored.toDF("s", "y"), col("s"), col("y"))
        .orderBy(col("threshold").desc).collect()
      val nPos = scored.count(_._2 == 1)
      // tp and fp are monotone down the sweep; the last row captures all
      c.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("tp") <= b.getAs[Long]("tp"))
          assert(a.getAs[Long]("fp") <= b.getAs[Long]("fp"))
        case _ =>
      }
      if (c.nonEmpty) {
        assert(c.last.getAs[Long]("tp") == nPos)
        assert(c.last.getAs[Long]("fp") == n - nPos)
      }
    }
  }

  test("registered queries: shapes and monotonicity on testdata") {
    val m = ClassifierEval.queries("multiclass_prf")(spark, sf).collect()
    assert(m.map(_.getAs[String]("class")).toSet == Set("A", "N", "R"))
    // confusion margins must both sum to the row count
    assert(m.map(_.getAs[Long]("n_true")).sum ==
      m.map(_.getAs[Long]("n_pred")).sum)
    val c = ClassifierEval.queries("pr_curve_by_threshold")(spark, sf)
      .orderBy(col("threshold").desc).collect()
    assert(c.length == 50)
    // recall is monotone non-decreasing as the threshold drops
    val recalls = c.map(_.getAs[Long]("recall_ppm"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b })
    // the loosest threshold captures every positive
    assert(recalls.last == 1000000L)
  }
}
