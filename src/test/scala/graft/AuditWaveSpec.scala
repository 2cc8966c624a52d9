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
