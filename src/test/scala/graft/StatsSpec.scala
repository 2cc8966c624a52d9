package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GraphOps triangle counting, Cohort retention, and the Stats family
  * (regression / MAD outliers / skyline): hand-computed ground truths,
  * edge-direction and partitioning invariance, brute-force equality.
  */
class StatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private def triangles(edges: Seq[(Long, Long)], parts: Int = 4): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("u", "v").repartition(parts)
    graft.ext.GraphOps.triangleCounts(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangle counts: K4 has every node in C(3,2)=3 triangles; a square has none") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(triangles(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(triangles(square) == Map.empty)
  }

  test("triangle counts tolerate duplicate, reversed, and self-loop edges") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val noisy = tri ++ tri.map(_.swap) ++ Seq((2L, 1L), (1L, 1L), (3L, 3L))
    assert(triangles(noisy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(triangles(tri, parts = 1) == triangles(tri, parts = 7))
  }

  test("triangle counts: two triangles sharing an edge count the shared endpoints twice") {
    // 1-2-3 and 2-3-4 share edge (2,3)
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(triangles(g) == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("cohort retention: hand-computed matrix, cohort size at offset 0") {
    import spark.implicits._
    // users 1,2 first active day 0; user 3 first active day 1;
    // day-1 actives: 1 and 3; day-2 actives: 3
    val day = 86400000000L
    val ev = Seq((1L, 0L), (2L, day / 2), (1L, day), (3L, day),
        (3L, 2 * day), (3L, 2 * day + 7))
      .toDF("user_id", "ts_us")
    val r = graft.ext.Cohort.retention(ev).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }

  test("regression recovers an exact line and is partition-invariant") {
    import spark.implicits._
    // y = 3x + 7 exactly: slope/intercept come out to the literal values
    val pts = (1L to 40L).map(x => ("g", x, 3 * x + 7))
    val df = pts.toDF("grp", "x", "y").repartition(8)
    val r = graft.ext.Stats.regressionByGroup(df, col("grp"), col("x"), col("y"))
      .collect().head
    assert(r.getAs[Double]("slope") == 3.0 && r.getAs[Double]("intercept") == 7.0)
  }

  test("MAD outliers: planted spike flagged, tight group silent") {
    import spark.implicits._
    // group a: values 100..119 plus one spike 10000; group b: constant
    val rows = (0L until 20L).map(i => ("a", i, 100L + i)) ++
      Seq(("a", 99L, 10000L)) ++ (0L until 10L).map(i => ("b", 200L + i, 500L))
    val df = rows.toDF("grp", "id", "x").repartition(5)
    val out = graft.ext.Stats.outliersMad(df, col("grp"), col("x"), k = 3,
        keep = Seq(col("id"))).select(col("id")).collect().map(_.getLong(0)).toSet
    assert(out == Set(99L))
  }

  test("skyline equals brute-force dominance and is partition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(300)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val expected = pts.distinct.filter { case (x, y) =>
      !pts.exists { case (bx, by) => bx <= x && by <= y && (bx < x || by < y) }
    }.toSet
    for (parts <- Seq(1, 4, 9)) {
      val df = pts.toDF("x", "y").repartition(parts)
      val (sky, unpersist) = graft.ext.Stats.skyline2dStamped(df, "x", "y")
      val got = sky.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      unpersist()
      assert(got == expected, s"parts=$parts")
    }
  }

  test("prefix-filter Jaccard equals the brute-force threshold join") {
    import spark.implicits._
    // templated docs: shared base tokens with small per-doc variations →
    // pairs straddle the 80% threshold both ways
    val base = (1 to 30).map(i => s"tok$i")
    val docs = (0L until 24L).map { i =>
      val drop = (i % 5).toInt
      val extra = (0 until drop).map(j => s"extra${i}_$j")
      (i, (base.drop(drop) ++ extra).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text").repartition(6)
    val (got, unpersist) = graft.ext.Dedup.prefixJaccardPairsStamped(df, thresholdPct = 80)
    val gotPairs = got.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    unpersist()
    val sets = docs.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty).toSet }.toMap
    val expected = (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      inter = (sets(a) & sets(b)).size
      union = sets(a).size + sets(b).size - inter
      if 100L * inter >= 80L * union
    } yield (a, b, inter.toLong)).toSet
    assert(expected.nonEmpty && gotPairs == expected)
  }

  test("prefix-filter Jaccard finds nothing when nothing qualifies") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "d e f"), (3L, "g h i"))
      .toDF("doc_id", "text")
    assert(graft.ext.Dedup.prefixJaccardPairs(df, thresholdPct = 50).count() == 0)
  }
}
