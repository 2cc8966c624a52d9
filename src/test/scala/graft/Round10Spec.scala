package graft

import graft.ext.{Agreement, Drift, KMeans, Sq8, Survival, Uplift}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 additions: agreement, uplift, survival, SQ8, silhouette,
  * JS drift, char classes.
  */
class Round10Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("cohens kappa: perfect agreement is 1e6 ppm, perfect disagreement is negative") {
    import spark.implicits._
    val perfect = Seq((1, 1), (0, 0), (1, 1), (0, 0), (1, 1))
      .toDF("a", "b")
    val k1 = Agreement.cohensKappa(perfect, col("a") === 1, col("b") === 1)
      .head()
    assert(k1.getAs[Long]("kappa_ppm") == 1000000L, k1.toString)
    assert(k1.getAs[Long]("po_ppm") == 1000000L)
    // systematic disagreement: every pair differs → kappa < 0
    val opposite = Seq((1, 0), (0, 1), (1, 0), (0, 1)).toDF("a", "b")
    val k2 = Agreement.cohensKappa(opposite, col("a") === 1, col("b") === 1)
      .head()
    assert(k2.getAs[Long]("kappa_ppm") < 0L, k2.toString)
    assert(k2.getAs[Long]("po_ppm") == 0L)
  }

  test("lift/gains deciles: top decile of a perfectly ranking score has maximal lift") {
    import spark.implicits._
    // 100 users, score = id, responders = exactly the 10 top-scored
    val users = (1 to 100).map(i => (i.toLong, i.toLong, if (i > 90) 1L else 0L))
      .toDF("id", "score", "responded")
    val g = Uplift.liftGainsDeciles(users).orderBy("decile").collect()
    assert(g.length == 10)
    val top = g.head
    assert(top.getAs[Long]("decile") == 0L)
    assert(top.getAs[Long]("n_users") == 10L)
    assert(top.getAs[Long]("n_resp") == 10L)
    // all 10% responders in the top 10% → lift = 10× = 10,000,000 ppm
    assert(top.getAs[Long]("cum_lift_ppm") == 10000000L, top.toString)
    // the bottom row's cumulative lift is exactly 1× by construction
    assert(g.last.getAs[Long]("cum_lift_ppm") == 1000000L)
  }

  test("kaplan-meier: risk sets shrink monotonically and factors are exact") {
    import spark.implicits._
    // 4 users: lifetimes 0,0,2,5 days; end = max last; users 1,2
    // churn (last far from end), user 4 defines the end (censored),
    // user 3 censored iff within 14 days of end
    val day = 86400000000L
    val ev = Seq(
      (1L, 0L), (1L, 0L),                       // lifetime 0, old → churn
      (2L, 1 * day), (2L, 1 * day),             // lifetime 0, old → churn
      (3L, 20 * day), (3L, 22 * day),           // lifetime 2, near end → censored
      (4L, 10 * day), (4L, 15 * day)            // lifetime 5, near end → censored
    ).toDF("user_id", "ts_us")
    val km = Survival.kaplanMeier(ev, censorDays = 14).orderBy("t_days").collect()
    val byT = km.map(r => r.getAs[Long]("t_days") ->
      (r.getAs[Long]("n_risk"), r.getAs[Long]("n_events"), r.getAs[Long]("n_censored"))).toMap
    assert(byT(0L) == ((4L, 2L, 0L)), byT.toString)  // all 4 at risk, 2 churn at t=0
    assert(byT(2L) == ((2L, 0L, 1L)))                 // 2 remain, censor at t=2
    assert(byT(5L) == ((1L, 0L, 1L)))
    val f0 = km.head.getAs[Long]("factor_ppm")
    assert(f0 == 500000L, s"(4-2)/4 = 0.5 → $f0")     // (4−2)·1e6/4
  }

  test("sq8: codes stay in [0,255] and reconstruction error is bounded by the step size") {
    val stats = Sq8.sq8DimStats(Tables.embeddings(spark, sf)).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val (mn, mx) = (r.getAs[Long]("mn_q"), r.getAs[Long]("mx_q"))
      val step = math.max((mx - mn) / 255L, 1L)
      assert(r.getAs[Long]("max_abs_err") <= step + 1,
        s"dim ${r.getAs[Int]("dim")}: err ${r.getAs[Long]("max_abs_err")} vs step $step")
    }
    spark.catalog.clearCache()
  }

  test("silhouette: ppm values bounded, one row per cluster, counts match assignments") {
    val sil = KMeans.kmeansSilhouette(Tables.embeddings(spark, sf), 4).collect()
    assert(sil.length == 4, sil.mkString(","))
    sil.foreach { r =>
      val m = r.getAs[Long]("mean_silhouette_ppm")
      assert(m >= -1000000L && m <= 1000000L, r.toString)
    }
    val n = sil.map(_.getAs[Long]("n_vectors")).sum
    val assigned = KMeans.kmeansAssign2(Tables.embeddings(spark, sf), 4).count()
    assert(n == assigned)
    spark.catalog.clearCache()
  }

  test("JS drift terms are nonnegative and bounded by ln2/2 per bin (log-sum inequality)") {
    val js = Drift.jsBins(Tables.events(spark, sf)).collect()
    assert(js.nonEmpty)
    js.foreach { r =>
      val t = r.getAs[Double]("js_term")
      assert(t >= -1e-6, r.toString) // rounding can dip a true 0 to -0.0
      assert(t <= math.log(2.0), r.toString)
    }
    spark.catalog.clearCache()
  }

  test("mcnemar: symmetric disagreement scores 0, one-sided disagreement grows with the gap") {
    import spark.implicits._
    val sym = Seq((1, 0), (0, 1), (1, 0), (0, 1), (1, 1)).toDF("a", "b")
    val m1 = Agreement.mcnemar(sym, col("a") === 1, col("b") === 1).head()
    assert(m1.getAs[Long]("mcnemar_x1e6") == 0L, m1.toString)
    val oneSided = Seq((1, 0), (1, 0), (1, 0), (1, 0), (0, 0)).toDF("a", "b")
    val m2 = Agreement.mcnemar(oneSided, col("a") === 1, col("b") === 1).head()
    // b=4, c=0 → 16/4 = 4 → 4e6
    assert(m2.getAs[Long]("mcnemar_x1e6") == 4000000L, m2.toString)
  }

  test("quantile normalization makes the mapped marginal identical to the target") {
    import spark.implicits._
    val data = Seq((1L, 1000L, 7L), (2L, 5L, 90L), (3L, 500L, 12L), (4L, 50L, 40L))
      .toDF("id", "from_v", "onto_v")
    val qn = ext.RankStats.quantileNormalize(data, "id", "from_v", "onto_v")
      .collect()
    // the multiset of qnorm values IS the multiset of onto values
    assert(qn.map(_.getAs[Long]("qnorm")).sorted.toSeq == Seq(7L, 12L, 40L, 90L))
    // rank preservation: the largest from_v (id 1) gets the largest onto
    assert(qn.find(_.getAs[Long]("id") == 1L).get.getAs[Long]("qnorm") == 90L)
    assert(qn.find(_.getAs[Long]("id") == 2L).get.getAs[Long]("qnorm") == 7L)
    spark.catalog.clearCache()
  }

  test("poisson bootstrap: deterministic across runs, replicate sizes concentrate near n") {
    import spark.implicits._
    val data = (1 to 400).map(i => (i.toLong, 100L + (i % 7))).toDF("id", "cents")
    val r1 = ext.Bootstrap.poissonBootstrapMeans(data, "id", "cents", reps = 20)
      .orderBy("b").collect()
    val r2 = ext.Bootstrap.poissonBootstrapMeans(data, "id", "cents", reps = 20)
      .orderBy("b").collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
    assert(r1.length == 20)
    // Poisson(1) weights: E[n_eff] = 400, sd = 20 → all reps within 5 sd
    r1.foreach { r =>
      val n = r.getAs[Long]("n_eff")
      assert(n > 300 && n < 500, r.toString)
      val m = r.getAs[Long]("mean_cents")
      assert(m >= 100 && m <= 106, r.toString)
    }
  }

  test("fleiss kappa: unanimous raters score 1e6, coin-flip-ish patterns score near 0") {
    import spark.implicits._
    val unanimous = Seq((1, 1, 1), (0, 0, 0), (1, 1, 1), (0, 0, 0))
      .toDF("a", "b", "c")
    val k1 = Agreement.fleissKappa3(unanimous,
      col("a") === 1, col("b") === 1, col("c") === 1).head()
    assert(k1.getAs[Long]("kappa_ppm") == 1000000L, k1.toString)
    // every item gets exactly 2/3 positives → all pairwise agreement is
    // the chance level's neighborhood; kappa must be well below 1
    val twoOfThree = Seq((1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 0))
      .toDF("a", "b", "c")
    val k2 = Agreement.fleissKappa3(twoOfThree,
      col("a") === 1, col("b") === 1, col("c") === 1).head()
    assert(k2.getAs[Long]("kappa_ppm") < 250000L, k2.toString)
  }

  test("gini: equal values give 0, total concentration gives (n-1)/n") {
    import spark.implicits._
    val equal = (1 to 10).map(i => (i.toLong, 500L)).toDF("id", "cents")
    val g1 = ext.RankStats.giniCoefficient(equal, "id", "cents").head()
    assert(g1.getAs[Long]("gini_ppm") == 0L, g1.toString)
    val concentrated = ((1 to 9).map(i => (i.toLong, 0L)) :+ (10L, 1000L))
      .toDF("id", "cents")
    val g2 = ext.RankStats.giniCoefficient(concentrated, "id", "cents").head()
    assert(g2.getAs[Long]("gini_ppm") == 900000L, g2.toString) // (n−1)/n = 0.9
    spark.catalog.clearCache()
  }

  test("corpus duplication rate counts repeated 10-grams exactly") {
    import spark.implicits._
    val base = (1 to 12).map(i => s"w$i").mkString(" ") // 3 10-grams
    val docs = Seq(
      (1L, base, "crawl_a"),
      (2L, base, "crawl_b"),                            // exact dup of 1
      (3L, (20 to 30).map(i => s"u$i").mkString(" "), "crawl_a"))
      .toDF("doc_id", "text", "source")
    val r = ext.CorpusStats.duplicationRate(docs, 10).head()
    // 3 + 3 + 2 grams total; distinct = 3 + 2 → 3 dups of 8
    assert(r.getAs[Long]("n_grams") == 8L, r.toString)
    assert(r.getAs[Long]("n_distinct") == 5L, r.toString)
    assert(r.getAs[Long]("dup_ppm") == 375000L, r.toString)
  }

  test("source overlap jaccard: mirrored sources overlap fully, disjoint ones never pair") {
    import spark.implicits._
    val base = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base, "a"), (2L, base, "b"),                 // a and b mirror
      (3L, (50 to 61).map(i => s"z$i").mkString(" "), "c"))
      .toDF("doc_id", "text", "source")
    val got = ext.CorpusStats.sourceOverlap(docs, 10).collect()
    assert(got.length == 1, got.mkString(","))          // only (a,b) share grams
    val r = got.head
    assert((r.getAs[String]("source_a"), r.getAs[String]("source_b")) == ("a", "b"))
    assert(r.getAs[Long]("jaccard_ppm") == 1000000L, r.toString)
  }

  test("harmonic landmark rollup: path graph scores 1/1 + 1/2") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val seeds = Seq(1L).toDF("src")
    val (bfs, done) = ext.GraphOps.multiSourceBfsStamped(edges, seeds, maxHops = 2)
    val h = bfs.groupBy(col("src"))
      .agg(sum(when(col("dist") > 0, expr("1000000 div dist")).otherwise(0L))
        .as("harmonic_x1e6")).head()
    assert(h.getAs[Long]("harmonic_x1e6") == 1500000L, h.toString)
    done()
  }

  test("covariance moments: hand-computed 2-dim corpus") {
    import spark.implicits._
    // qv rows: (1000, 2000) and (3000, 4000) after 1e3 quantization
    val vecs = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val m = ext.Sq8.covarianceMoments(vecs).collect()
      .map(r => ((r.getAs[Int]("i"), r.getAs[Int]("j")),
        (r.getAs[Long]("s_i"), r.getAs[Long]("s_j"), r.getAs[Long]("s_ij")))).toMap
    assert(m((0, 0)) == ((4000L, 4000L, 10000000L)), m.toString)   // 1e6+9e6
    assert(m((0, 1)) == ((4000L, 6000L, 14000000L)), m.toString)   // 2e6+12e6
    assert(m((1, 1)) == ((6000L, 6000L, 20000000L)), m.toString)   // 4e6+16e6
    assert(m.size == 3)
  }

  test("langid confusion: row shares of each actual language sum to ~1e6") {
    val cc = SparkEntry.queries("langid_confusion")(spark, sf).collect()
    assert(cc.nonEmpty)
    cc.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val s = rows.map(_.getAs[Long]("row_share_ppm")).sum
      assert(s <= 1000000L && s > 1000000L - rows.length, s"$lang: $s")
    }
  }

  test("length matching: the reference source keeps everything, others never exceed their cell") {
    val r = SparkEntry.queries("length_match_resample")(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_kept") <= row.getAs[Long]("n_cell"), row.toString)
    }
    // at least one source is the reference: keep_ppm = 1e6 everywhere it appears
    val full = r.filter(_.getAs[Long]("keep_ppm") == 1000000L)
    assert(full.nonEmpty)
    full.foreach { row =>
      assert(row.getAs[Long]("n_kept") == row.getAs[Long]("n_cell"), row.toString)
    }
  }

  test("plan pins: covariance never joins, bootstrap explode stays map-side, length-match joins broadcast") {
    def plan(name: String): String = {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      spark.catalog.clearCache()
      p
    }
    // the nested-explode pair expansion must not plan any join at all
    val cov = plan("embedding_covariance")
    assert(!cov.contains("Join"), cov)
    // Poisson bootstrap: the 100x explode is map-side; the only
    // exchange is the replicate-keyed aggregate's
    val boot = plan("bootstrap_poisson_means")
    assert(!boot.contains("Join"), boot)
    assert("Exchange".r.findAllIn(boot).length <= 2, boot) // partial/final agg pair
    // distribution matching: every threshold-table join broadcasts —
    // a sort-merge join against a bins-x-sources table would be wrong
    val lm = plan("length_match_resample")
    assert(!lm.contains("SortMergeJoin"), lm)
    assert(lm.contains("BroadcastHashJoin"), lm)
  }

  test("char classes partition the document exactly") {
    val cc = SparkEntry.queries("doc_char_classes")(spark, sf).collect()
    assert(cc.nonEmpty)
    cc.foreach { r =>
      val total = r.getAs[Int]("n_letters") + r.getAs[Int]("n_digits") +
        r.getAs[Int]("n_spaces") + r.getAs[Int]("n_punct") + r.getAs[Int]("n_other")
      assert(total == r.getAs[Int]("n_chars2"), r.toString)
      assert(r.getAs[Int]("n_other") >= 0, r.toString)
    }
  }
}
