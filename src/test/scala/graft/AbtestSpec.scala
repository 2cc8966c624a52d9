package graft

import graft.ext.Abtest
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** CUPED + diff-in-differences: algebraic invariants on constructed
  * pre/post purchase panels (exact θ on a perfectly linear covariate,
  * zero DiD under a uniform shift), plus the degenerate guards.
  */
class AbtestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private val dayUs = 86400000000L

  /** One purchase of `preCents` on day 0 and one of `postCents` on
    * day 3 per user — mid_day = (0+3+1) div 2 = 2 splits them. */
  private def panel(users: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    users.flatMap { case (u, preCents, postCents) =>
      Seq((u, 0L * dayUs, "purchase", preCents / 100.0),
        (u, 3L * dayUs, "purchase", postCents / 100.0))
    }.toDF("user_id", "ts_us", "event_type", "value")
  }

  test("cuped: y = 2x exactly gives theta_ppm = 2_000_000") {
    val ev = panel((0L until 8L).map(u => (u, 100L * (u + 1), 200L * (u + 1))))
    val rows = Abtest.cupedReadout(ev).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("theta_ppm") == 2000000L))
    // the emitted adjustment is exactly the staged-floor identity
    val n = rows.map(_.getAs[Long]("n_users")).sum
    val sx = (1L to 8L).map(_ * 100L).sum
    val meanXMilli = sx * 1000L / n
    rows.foreach { r =>
      val expected = r.getAs[Long]("mean_y_milli") -
        (r.getAs[Long]("theta_ppm") *
          (r.getAs[Long]("mean_x_v_milli") - meanXMilli)) / 1000000L
      assert(r.getAs[Long]("cuped_adj_milli") == expected, r.toString)
    }
  }

  test("diff-in-diff: uniform post shift cancels to did_milli = 0") {
    // y = x + 500 for every user: both variants move identically
    val ev = panel((0L until 10L).map(u => (u, 100L * (u + 1), 100L * (u + 1) + 500L)))
    val r = Abtest.diffInDiff(ev).collect()(0)
    assert(r.getAs[Long]("n_ctrl") + r.getAs[Long]("n_treat") == 10L)
    assert(r.getAs[Long]("n_ctrl") > 0 && r.getAs[Long]("n_treat") > 0)
    assert(r.getAs[Long]("did_milli") == 0L, r.toString)
  }

  test("degenerate: constant covariate zeroes theta, empty-variant guard") {
    // all x equal -> var(x)=0 AND cov=0: theta = 0 via greatest-guard
    val ev = panel((0L until 4L).map(u => (u, 700L, 100L * u)))
    val rows = Abtest.cupedReadout(ev).collect()
    assert(rows.forall(_.getAs[Long]("theta_ppm") == 0L))
    // adjusted mean collapses to the raw mean when theta = 0
    rows.foreach(r => assert(
      r.getAs[Long]("cuped_adj_milli") == r.getAs[Long]("mean_y_milli")))
  }

  test("non-purchase events are excluded from both periods") {
    import spark.implicits._
    val ev = panel(Seq((0L, 100L, 300L), (1L, 200L, 400L)))
      .union(Seq((0L, 1L * dayUs, "click", 999.0),
        (1L, 2L * dayUs, "view", 888.0))
        .toDF("user_id", "ts_us", "event_type", "value"))
    val r = Abtest.diffInDiff(ev).collect()(0)
    val totPre = r.getAs[Long]("ctrl_pre_milli") * r.getAs[Long]("n_ctrl") +
      r.getAs[Long]("treat_pre_milli") * r.getAs[Long]("n_treat")
    assert(totPre == 300000L) // 100+200 cents in milli, clicks ignored
  }
}
