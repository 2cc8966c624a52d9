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

  test("prefix-filter Jaccard equals the brute-force shingle threshold join") {
    import spark.implicits._
    // templated docs: shared base token runs with per-doc point edits →
    // shingle-set pairs straddle the 80% threshold both ways (docs with
    // i % 5 == 0 are exact copies of each other)
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
    def shingleSet(t: String): Set[String] = {
      val tk = t.split("\\s+").filter(_.nonEmpty)
      if (tk.length < 3) Set.empty
      else tk.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
    val expected = (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      inter = (sets(a) & sets(b)).size
      union = sets(a).size + sets(b).size - inter
      if 100L * inter >= 80L * union
    } yield (a, b, inter.toLong)).toSet
    assert(expected.nonEmpty && gotPairs == expected)
  }

  test("sorted-neighborhood finds prefix-blocked near-dups, misses out-of-window ones") {
    import spark.implicits._
    // 10 docs share blocking prefix "aaaa"; two identical docs block
    // under "zzzz". With window 3, identical "aaaa" docs at sorted
    // positions 0 and 9 are NEVER compared — the documented screen
    // tradeoff — while adjacent near-identical ones are found.
    val body = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, s"aaaa $body x0"), (9L, s"aaaa $body x0"),
      (1L, s"aaaa $body x1"), (2L, s"aaaa $body x1"),
      (20L, s"zzzz $body"), (21L, s"zzzz $body"))
    val df = docs.toDF("doc_id", "text").repartition(3)
    val (got, unpersist) = graft.ext.Dedup.sortedNeighborhoodPairsStamped(
      df, window = 3, thresholdPct = 90)
    val pairs = got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    unpersist()
    // every aaaa doc shares one blocking key, so block order is doc_id:
    // 0, 1, 2, 9 — window 3 probes 2 successors. Same-block pairs score
    // 21/23 = 91.3% (x-suffix differs) or 100%; cross-block pairs 87%.
    // The IDENTICAL pair (0, 9) sits 3 positions apart → screened out,
    // the documented sorted-neighborhood tradeoff.
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L), (1L, 9L), (2L, 9L), (20L, 21L)))
  }

  test("equi-depth bins: uniform 1..100 into 4 bins of 25") {
    import spark.implicits._
    val df = (1L to 100L).toDF("x").repartition(7)
    val r = graft.ext.Stats.equiDepthBins(df, col("x"), bins = 4).collect()
      .map(x => x.getInt(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    // quantile_cont boundaries at 25.75, 50.5, 75.25 → bins 1-25, 26-50,
    // 51-75, 76-100
    assert(r == Map(0 -> ((25L, 1L, 25L)), 1 -> ((25L, 26L, 50L)),
      2 -> ((25L, 51L, 75L)), 3 -> ((25L, 76L, 100L))))
  }

  test("BFS layers: path graph distances, unreachable nodes absent") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (7L, 8L))
      .toDF("u", "v").repartition(3)
    val sources = Seq(1L).toDF("node_id")
    val (r, unpersist) = graft.ext.GraphOps.bfsLayersStamped(edges, sources, maxHops = 2)
    val got = r.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    unpersist()
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("BFS layers: min distance wins on converging paths; hop 0 only sources") {
    import spark.implicits._
    // diamond: 1-2, 1-3, 2-4, 3-4 → dist(4) = 2 (not 3); edges undirected
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("u", "v")
    val sources = Seq(1L).toDF("node_id")
    val got = graft.ext.GraphOps.bfsLayers(edges, sources, maxHops = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("clustering coefficients: triangle = 1.0, square = 0, K4 = 1.0, paw graph mixed") {
    import spark.implicits._
    def lcc(edges: Seq[(Long, Long)]) =
      graft.ext.GraphOps.clusteringCoefficients(edges.toDF("u", "v"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // triangle: every node deg 2, 1 triangle, lcc = 2*1/(2*1) = 1.0
    assert(lcc(Seq((1L, 2L), (2L, 3L), (1L, 3L))) ==
      Map(1L -> (2L, 1L, 1000000L), 2L -> (2L, 1L, 1000000L), 3L -> (2L, 1L, 1000000L)))
    // square: deg 2 everywhere, no triangles → 0
    assert(lcc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
      .values.forall { case (d, t, c) => d == 2L && t == 0L && c == 0L })
    // paw: triangle 1-2-3 plus pendant edge 3-4; node 3 has deg 3, 1
    // triangle → 2/(3*2) = 0.333333; node 4 deg 1 → absent
    val paw = lcc(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(paw(3L) == (3L, 1L, 333333L))
    assert(!paw.contains(4L))
  }

  private def lpa(edges: Seq[(Long, Long)], rounds: Int, parts: Int = 4): Map[Long, Long] = {
    import spark.implicits._
    graft.ext.GraphOps.labelPropagation(
        edges.toDF("u", "v").repartition(parts), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("label propagation: two cliques joined by a bridge converge to two communities") {
    // cliques {1,2,3} and {10,11,12} with a single bridge 3-10
    val c1 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val c2 = Seq((10L, 11L), (11L, 12L), (10L, 12L))
    val got = lpa(c1 ++ c2 ++ Seq((3L, 10L)), rounds = 3)
    // each clique agrees on one label; the two labels differ
    assert(Set(got(1L), got(2L)).size == 1 && got(1L) == got(2L))
    assert(got(10L) == got(11L) || got(11L) == got(12L))
    assert(got(1L) != got(12L), s"cliques must not merge: $got")
  }

  test("label propagation: deterministic tie-break (min label), partition-invariant") {
    // single edge: after round 1 each node adopts the neighbor's label;
    // round 2 swaps back — fixed synchronized rounds make this well-defined
    assert(lpa(Seq((5L, 9L)), rounds = 1) == Map(5L -> 9L, 9L -> 5L))
    assert(lpa(Seq((5L, 9L)), rounds = 2) == Map(5L -> 5L, 9L -> 9L))
    // triangle: round 1 gives each node the min of the OTHER two's labels
    assert(lpa(Seq((1L, 2L), (2L, 3L), (1L, 3L)), rounds = 1) ==
      Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
    // partitioning never changes the result
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    assert(lpa(e, rounds = 3, parts = 1) == lpa(e, rounds = 3, parts = 7))
  }

  private def lpaW(edges: Seq[(Long, Long, Long)], rounds: Int,
                   parts: Int = 4): Map[Long, Long] = {
    import spark.implicits._
    graft.ext.GraphOps.labelPropagationWeighted(
        edges.toDF("u", "v", "w").repartition(parts), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("weighted label propagation follows edge weight where unweighted tie-breaks by label") {
    // star: node 5's neighbors all have singleton labels {1, 8, 9};
    // the heavy edge points at 9 — weighted LPA adopts 9, while
    // count-LPA sees three 1-vote labels and tie-breaks to min label 1
    val heavy9 = Seq((5L, 1L, 1L), (5L, 8L, 1L), (5L, 9L, 10L))
    assert(lpaW(heavy9, rounds = 1)(5L) == 9L)
    assert(lpa(heavy9.map(t => (t._1, t._2)), rounds = 1)(5L) == 1L)
    // equal weights degrade to the count variant's tie-break
    val flat = Seq((5L, 1L, 2L), (5L, 8L, 2L), (5L, 9L, 2L))
    assert(lpaW(flat, rounds = 1)(5L) == 1L)
    // partition invariance (integer sums, no merge-order ambiguity)
    val e = Seq((8L, 9L, 1L), (5L, 8L, 1L), (5L, 9L, 1L), (5L, 1L, 3L))
    assert(lpaW(e, rounds = 3, parts = 1) == lpaW(e, rounds = 3, parts = 7))
  }

  test("bounded SSSP: min-plus relaxation takes the cheaper 2-leg path, respects hop bound") {
    import spark.implicits._
    // 1 -10- 2 -10- 4 and 1 -100- 4: two legs (20) beat the direct edge
    val edges = Seq((1L, 2L, 10L), (2L, 4L, 10L), (1L, 4L, 100L), (4L, 5L, 1L))
      .toDF("u", "v", "w")
    val src = Seq(1L).toDF("node_id")
    def run(r: Int) = graft.ext.GraphOps.ssspBounded(edges, src, r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(run(1) == Map(1L -> 0L, 2L -> 10L, 4L -> 100L))
    assert(run(2) == Map(1L -> 0L, 2L -> 10L, 4L -> 20L, 5L -> 101L))
    assert(run(3) == Map(1L -> 0L, 2L -> 10L, 4L -> 20L, 5L -> 21L))
    // undirected: relaxation flows back across an edge when cheaper
    val back = graft.ext.GraphOps.ssspBounded(
        Seq((1L, 2L, 5L)).toDF("u", "v", "w"), Seq(2L).toDF("node_id"), 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(back == Map(2L -> 0L, 1L -> 5L))
  }

  test("PMI bigrams: hand-computed two-step integer lift") {
    import spark.implicits._
    // tokens [a b a b]: n_(a,b)=2, n_(b,a)=1, n_a=n_b=2, N=4
    // lift(a,b) = ((1e6*2) div 2 * 4) div 2 = 2000000
    // lift(b,a) = ((1e6*1) div 2 * 4) div 2 = 1000000
    val df = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val got = graft.ext.Collocations.pmiBigramsTopK(df, k = 10, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(5)))
    assert(got.toSeq == Seq(("a", "b", 2L, 2000000L), ("b", "a", 1L, 1000000L)))
  }

  test("Markov transitions: hand-computed probabilities, per-user boundaries respected") {
    import spark.implicits._
    // user 1: a→b→a→c; user 2: a→b. Transitions: a→b ×2, b→a ×1, a→c ×1
    // (no cross-user pair between user 1's c and user 2's a)
    val ev = Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "a"),
        (1L, 40L, 4L, "c"), (2L, 10L, 5L, "a"), (2L, 20L, 6L, "b"))
      .toDF("user_id", "ts_us", "event_id", "event_type").repartition(3)
    val got = graft.ext.Markov.transitionTopK(ev, k = 5).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSet
    // from a: n_from=3 → a→b p=666666, a→c p=333333; from b: n_from=1 →
    // b→a p=1000000
    assert(got == Set(
      ("a", 1, "b", 2L, 666666L), ("a", 2, "c", 1L, 333333L),
      ("b", 1, "a", 1L, 1000000L)))
  }

  test("gini impurity: a 2-1 split of three events scores 444444 ppm") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.ext.Stats.queries("gini_impurity_by_user")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    // independent recomputation for every user from raw counts
    val raw = graft.Tables.events(spark, dir)
      .groupBy("user_id", "event_type").count()
      .collect().groupBy(_.getLong(0))
      .map { case (u, rows) =>
        val ns = rows.map(_.getLong(2))
        val n = ns.sum; val sq = ns.map(x => x * x).sum
        u -> ((n, 1000000L * (n * n - sq) / (n * n)))
      }
    assert(out == raw)
    // a user with all-same events must score 0; the formula's bounds hold
    assert(out.values.forall { case (_, g) => g >= 0L && g < 1000000L })
  }

  test("pareto contribution: cumulative algebra and the 80% head flag") {
    val rows = graft.ext.Stats.queries("contribution_pareto")(spark, "/root/testdata/sf0.001")
      .orderBy(org.apache.spark.sql.functions.col("cum"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val total = rows.map(_._1).sum
    assert(rows.last._2 == total)           // last cumulative == grand total
    assert(rows.last._3 == 1000000L)        // final share is exactly 100%
    rows.foreach { case (_, cum, share, head) =>
      assert(share == cum * 1000000L / total)
      assert(head == (cum * 5 <= total * 4))
    }
    assert(rows.map(_._2).sliding(2).forall { case Array(a, b) => a < b; case _ => true })
  }

  test("prefix-filter Jaccard finds nothing when nothing qualifies") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "d e f g"), (3L, "g h i j"))
      .toDF("doc_id", "text")
    assert(graft.ext.Dedup.prefixJaccardPairs(df, thresholdPct = 50).count() == 0)
  }
}
