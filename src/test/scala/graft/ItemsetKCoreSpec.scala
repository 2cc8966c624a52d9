package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** KCore peel and Itemsets/association-rule arithmetic: hand-computed
  * ground truths, convergence, downward-closure pruning.
  */
class ItemsetKCoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  test("kcore: triangle with a pendant — 2-core drops the pendant") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant 4 attached to 1
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("u", "v")
    val got = graft.ext.KCore.kcorePeel(e, k = 2, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("kcore: cascading peel needs multiple waves (path into a clique)") {
    import spark.implicits._
    // K4 on {1,2,3,4} plus path 4-5-6: wave1 drops 6, wave2 drops 5
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val e = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("u", "v")
    val after1 = graft.ext.KCore.kcorePeel(e, k = 2, rounds = 1).collect()
      .map(_.getLong(0)).toSet
    val after2 = graft.ext.KCore.kcorePeel(e, k = 2, rounds = 2).collect()
      .map(_.getLong(0)).toSet
    assert(after1 == Set(1L, 2L, 3L, 4L, 5L)) // 5 still has deg 2 in wave 1
    assert(after2 == Set(1L, 2L, 3L, 4L))
    // 3-core of the whole thing is the K4 with induced degree 3
    val core3 = graft.ext.KCore.kcorePeel(e, k = 3, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(core3 == Set((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("kcore: 3 waves converged on a random graph (wave 4 adds nothing)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val e = Seq.fill(300)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .toDF("u", "v")
    def run(r: Int) = graft.ext.KCore.kcorePeel(e, k = 3, rounds = r).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(run(3) == run(4))
    // every emitted degree is >= k — the convergence witness
    assert(run(3).forall(_._2 >= 3))
  }

  test("itemsets: hand-computed triple supports and top-k cut") {
    import spark.implicits._
    // baskets: {a,b,c} x3, {a,b,d} x2, {a,b,c,d} x1
    val rows =
      (1 to 3).flatMap(i => Seq("a", "b", "c").map(x => (i.toLong, x))) ++
      (4 to 5).flatMap(i => Seq("a", "b", "d").map(x => (i.toLong, x))) ++
      Seq("a", "b", "c", "d").map(x => (6L, x))
    val b = rows.toDF("bk", "item")
    val got = graft.ext.Itemsets.topTriplesBySupport(b, floorPpm = 1, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    // abc sup 4, abd sup 3, acd/bcd sup 1
    assert(got.take(2).toSeq == Seq(("a", "b", "c", 4L), ("a", "b", "d", 3L)))
    assert(got.drop(2).toSet == Set(("a", "c", "d", 1L), ("b", "c", "d", 1L)))
  }

  test("association rules: exact integer confidence and lift ppm") {
    import spark.implicits._
    // 5 baskets: {x,y} x2, {x}, {y,z}, {z} → sup(x)=3, sup(y)=3, sup(z)=2
    // (the relative floor clamps below at 2, so every item stays)
    val rows = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"),
      (4L, "y"), (4L, "z"), (5L, "z"))
    val b = rows.toDF("bk", "item")
    val got = graft.ext.Itemsets.associationRules(b, floorPpm = 1, k = 10)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // x→y: conf = 1e6*2 div 3 = 666666; lift = 1e6*2*5 div 9 = 1111111
    assert(got(("x", "y")) == ((2L, 666666L, 1111111L)))
    assert(got(("y", "x")) == ((2L, 666666L, 1111111L)))
    // y→z: conf = 1e6 div 3 = 333333; lift = 1e6*1*5 div 6 = 833333
    assert(got(("y", "z")) == ((1L, 333333L, 833333L)))
    assert(got(("z", "y")) == ((1L, 500000L, 833333L)))
  }

  test("itemsets: A-priori floor removes infrequent items before the fan-out") {
    import spark.implicits._
    // 1000 baskets of {a,b}, one basket {a,b,q}: at floorPpm high enough
    // q is infrequent — no triple may contain it
    val rows = (1 to 1000).flatMap(i => Seq((i.toLong, "a"), (i.toLong, "b"))) ++
      Seq((1001L, "a"), (1001L, "b"), (1001L, "q"))
    val b = rows.toDF("bk", "item")
    val tri = graft.ext.Itemsets.topTriplesBySupport(b, floorPpm = 10000, k = 10)
      .collect()
    assert(tri.isEmpty) // only 2 frequent items — no triple survives
    val rules = graft.ext.Itemsets.associationRules(b, floorPpm = 10000, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rules == Set(("a", "b"), ("b", "a")))
  }
}
