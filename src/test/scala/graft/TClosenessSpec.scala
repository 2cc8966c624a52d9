package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** dq_t_closeness: ordered EMD between a quasi-identifier group's
  * sensitive-value distribution and the table's.
  */
class TClosenessSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private def customers(rows: Seq[(Int, String, Double)]) = {
    import spark.implicits._
    rows.toDF("c_nationkey", "c_mktsegment", "c_acctbal")
  }

  test("groups matching the global distribution score EMD 0") {
    // both groups: 2 rows in band 0 (bal < 1000), 2 in band 1
    val d = customers(Seq(
      (1, "A", 100.0), (1, "A", 200.0), (1, "A", 1100.0), (1, "A", 1200.0),
      (2, "B", 300.0), (2, "B", 400.0), (2, "B", 1300.0), (2, "B", 1400.0)))
    val rows = graft.ext.DataQuality.tCloseness(d).collect()
      .map(r => r.getInt(0) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
      .toMap
    assert(rows(1) == (4L, 2L, 0L, 0))
    assert(rows(2) == (4L, 2L, 0L, 0))
  }

  test("fully skewed groups score the exact half-mass EMD and flag at_risk") {
    // g1 all band 0, g2 all band 1; global = 50/50, m = 2 bands:
    // g1's CDF at band 0 = 1e6 vs global 5e5 → d = 5e5; band 1 → 0.
    // emd = 500000 / (m-1) = 500000 > 200000 → at_risk
    val d = customers(Seq(
      (1, "A", 100.0), (1, "A", 200.0), (1, "A", 300.0), (1, "A", 400.0),
      (2, "B", 1100.0), (2, "B", 1200.0), (2, "B", 1300.0), (2, "B", 1400.0)))
    val rows = graft.ext.DataQuality.tCloseness(d).collect()
      .map(r => r.getInt(0) -> (r.getLong(4), r.getInt(5))).toMap
    assert(rows(1) == (500000L, 1))
    assert(rows(2) == (500000L, 1))
  }

  test("missing middle bands still contribute CDF distance (ordered EMD)") {
    // 3 bands globally; the probe group sits only at the extremes while
    // the other group fills the middle — the band-1 grid row (absent in
    // the probe group's own rows) must still carry |cum diff|
    val d = customers(Seq(
      (1, "A", 100.0), (1, "A", 2100.0),                  // bands 0, 2
      (2, "B", 1100.0), (2, "B", 1200.0)))                // band 1 ×2
    val rows = graft.ext.DataQuality.tCloseness(d).collect()
      .map(r => r.getInt(0) -> (r.getLong(3), r.getLong(4))).toMap
    // global: band0=1, band1=2, band2=1 of 4 → CDF 250000, 750000, 1e6
    // g1 (n=2): CDF 500000, 500000, 1e6 → d = 250000 + 250000 + 0
    //   emd = 500000 // (3-1) = 250000
    assert(rows(1) == (3L, 250000L))
    // g2 (n=2): CDF 0, 1e6, 1e6 → d = 250000 + 250000 + 0 → 250000
    assert(rows(2) == (3L, 250000L))
  }
}
