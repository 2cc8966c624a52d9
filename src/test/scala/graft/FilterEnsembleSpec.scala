package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Filter-ensemble audit: the vote frame, the 2×2×2 matrix, majority
  * keep, and pairwise Cohen's kappa with hand-computed values.
  */
class FilterEnsembleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, dir)

  test("votes: one row per doc, each vote boolean, ppl median splits ~half") {
    val v = ext.FilterEnsemble.votes(docs)
    assert(v.count() == docs.count())
    assert(v.columns.toSeq ==
      Seq("doc_id", "source", "n_chars", "n_words", "gopher", "nb", "ppl_ok"))
    // the <= median cut keeps at least half the docs
    val n = v.count(); val ok = v.where(col("ppl_ok")).count()
    assert(ok * 2 >= n && ok < n)
  }

  test("matrix cells partition the corpus; chars conserve") {
    val m = ext.FilterEnsemble.matrix(docs).collect()
    assert(m.map(_.getLong(3)).sum == docs.count())
    val chars = docs.agg(sum("n_chars")).collect()(0).getLong(0)
    assert(m.map(_.getLong(4)).sum == chars)
    assert(m.length <= 8)
  }

  test("majority keep: counts consistent with the vote frame") {
    val v = ext.FilterEnsemble.votes(docs)
      .select(col("source"),
        (when(col("gopher"), 1).otherwise(0) + when(col("nb"), 1).otherwise(0)
          + when(col("ppl_ok"), 1).otherwise(0)).as("nv"))
    val expect = v.groupBy("source")
      .agg(count(lit(1)).as("n"), sum(when(col("nv") >= 2, 1L).otherwise(0L)).as("maj"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = ext.FilterEnsemble.majorityKeep(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect)
    ext.FilterEnsemble.majorityKeep(docs).collect().foreach { r =>
      assert(r.getLong(3) <= r.getLong(2)) // unanimous <= majority
    }
  }

  test("kappa: hand-computed on a rigged vote frame via the same arithmetic") {
    // check the kappa arithmetic against a scala reference over the
    // REAL vote frame (any corpus): po, pe, kappa in truncating ppm
    val rows = ext.FilterEnsemble.votes(docs)
      .select("gopher", "nb", "ppl_ok").collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)))
    def ref(s1: Array[Boolean], s2: Array[Boolean]): (Long, Long, Long) = {
      val n = s1.length.toLong
      val a1 = s1.count(identity).toLong; val a2 = s2.count(identity).toLong
      val agree = s1.zip(s2).count { case (x, y) => x == y }.toLong
      val pe = a1 * a2 + (n - a1) * (n - a2)
      val po = agree * 1000000L / n
      val peP = pe * 1000000L / (n * n)
      val k = if (n * n == pe) 0L else (agree * n - pe) * 1000000L / (n * n - pe)
      (po, peP, k)
    }
    val g = rows.map(_._1); val nb = rows.map(_._2); val p = rows.map(_._3)
    val expect = Map("gopher_nb" -> ref(g, nb), "gopher_ppl" -> ref(g, p),
      "nb_ppl" -> ref(nb, p))
    val got = ext.FilterEnsemble.filterKappa(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == expect)
  }

  test("tier budget: greedy fill from the best tier, sum equals the budget exactly") {
    val rows = ext.FilterEnsemble.tierBudget(docs).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3))).sortBy(-_._1)
    val total = rows.map(_._2).sum
    val budget = total * 50 / 100
    assert(rows.map(_._3).sum == budget)
    // greedy: a tier is partially/un-filled only if every better tier is full
    rows.foreach { case (_, tok, alloc) => assert(alloc >= 0 && alloc <= tok) }
    val firstPartial = rows.indexWhere { case (_, tok, alloc) => alloc < tok }
    if (firstPartial >= 0) {
      assert(rows.take(firstPartial).forall { case (_, tok, alloc) => alloc == tok })
      assert(rows.drop(firstPartial + 1).forall(_._3 == 0L))
    }
    // tiers must match the vote frame's tier masses
    val v = ext.FilterEnsemble.votes(docs).collect().map { r =>
      val t = (if (r.getBoolean(4)) 1 else 0) + (if (r.getBoolean(5)) 1 else 0) +
        (if (r.getBoolean(6)) 1 else 0)
      t -> r.getLong(3)
    }
    val masses = v.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(rows.map(r => r._1 -> r._2).toMap == masses)
  }

  test("kappa degenerate case: two constant filters define kappa 0") {
    import spark.implicits._
    // all docs pass gopher AND nb (long clean docs), so pe = 1 for that
    // pair → kappa must be the documented 0, not a crash
    val clean = (Seq("the", "and", "of", "to") ++ Seq.fill(56)("word")).mkString(" ")
    val d = (0L until 8L).map(i => (i, clean + s" extra$i", "l", "s0",
      clean.length.toLong)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val k = ext.FilterEnsemble.filterKappa(d).collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(k("gopher_nb") == 0L)
  }
}
