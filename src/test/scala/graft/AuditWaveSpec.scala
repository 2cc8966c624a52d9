package graft

import graft.ext.{GraphOps, RecSys}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 audit wave: degree assortativity and recommendation
  * catalog coverage — hand-computed graph/basket fixtures.
  */
class AuditWaveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  test("assortativity: star = -1e6, path = -5e5, regular pins NULL") {
    import spark.implicits._
    // star K(1,3): every edge joins deg 3 to deg 1 => r = -1 exactly
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("u", "v")
    val s = GraphOps.assortativity(star).collect().head
    assert(s.getAs[Long]("n_directed") == 6L)
    assert(s.getAs[Long]("assort_ppm") == -1000000L)
    // path 0-1-2-3: num = 6*16-100 = -4, den = 6*18-100 = 8 => -0.5
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("u", "v")
    val p = GraphOps.assortativity(path).collect().head
    assert(p.getAs[Long]("assort_ppm") == -500000L)
    // triangle: degree-regular => zero variance => pinned NULL
    val tri = Seq((0L, 1L), (1L, 2L), (0L, 2L)).toDF("u", "v")
    val t = GraphOps.assortativity(tri).collect().head
    assert(t.isNullAt(t.fieldIndex("assort_ppm")))
  }

  test("asofJoinTolerance: fresh match carries payload, stale and missing yield NULL") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 1000L),  // fresh: click at 900, gap 100 <= 500
      (1L, 101L, 5000L),  // stale: latest click 900, gap 4100 > 500
      (2L, 102L, 1000L)   // no click for user 2 at all
    ).toDF("user_id", "event_id", "ts_us")
    val right = Seq((1L, 900L, 77L, 900L))
      .toDF("user_id", "ts_us", "click_id", "click_ts_us")
    val out = graft.ops.JoinOps.asofJoinTolerance(left, right,
        Seq("user_id"), "ts_us", Seq("click_id", "click_ts_us"),
        toleranceUs = 500L)
      .collect().map(r => r.getAs[Long]("event_id") -> r).toMap
    assert(out(100L).getAs[Boolean]("matched"))
    assert(out(100L).getAs[Long]("click_id") == 77L)
    assert(out(100L).getAs[Long]("gap_us") == 100L)
    assert(!out(101L).getAs[Boolean]("matched"))
    assert(out(101L).isNullAt(out(101L).fieldIndex("click_id")))
    assert(out(101L).isNullAt(out(101L).fieldIndex("gap_us")))
    assert(!out(102L).getAs[Boolean]("matched"))
    assert(out(102L).isNullAt(out(102L).fieldIndex("click_id")))
  }

  test("catalogCoverage: hub item dominates slots; unrecommended items shrink coverage") {
    import spark.implicits._
    // item 1 co-occurs with 2, 3, 4 (one basket each); k=2 lists:
    // 1 -> [2,3]; 2,3,4 -> [1]  => 5 slots, 3 distinct of 4 items,
    // item 1 fills 3 slots
    val baskets = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 3L),
      (30L, 1L), (30L, 4L)).toDF("basket_id", "item_id")
    val c = RecSys.catalogCoverage(baskets, k = 2).collect().head
    assert(c.getAs[Long]("n_items") == 4L)
    assert(c.getAs[Long]("n_recommended") == 3L)
    assert(c.getAs[Long]("coverage_ppm") == 750000L)
    assert(c.getAs[Long]("n_slots") == 5L)
    assert(c.getAs[Long]("max_item_slots") == 3L)
    assert(c.getAs[Long]("top_share_ppm") == 600000L)
  }
}
