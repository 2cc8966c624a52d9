package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** DoReMi-lite domain reweighting over the backoff-LM excess loss. */
class DoremiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private def docs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.map { case (id, text, source) => (id, text, source) }
      .toDF("doc_id", "text", "source")
  }

  test("symmetric sources keep exactly uniform weights through all rounds") {
    // two sources with the same text mix → equal mean cost, excess 0
    // on both → the multiplicative update is the identity and the
    // renormalize returns exactly 500000 ppm each round
    val d = docs(Seq(
      (0L, "a b a b", "s0"), (1L, "a b a b", "s0"),
      (2L, "a b a b", "s1"), (3L, "a b a b", "s1")))
    val w = graft.ext.Doremi.domainWeights(d).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(w("s0") == (0L, 500000L))
    assert(w("s1") == (0L, 500000L))
  }

  test("the high-excess source gains weight and the total stays ~1e6") {
    // s0's scored (odd) doc replays trained text → hits, cheap;
    // s1's scored doc is all-OOV → the 2000+mlog2(N) ceiling per token
    val d = docs(Seq(
      (0L, "a b a b", "s0"), (1L, "a b a b", "s0"),
      (2L, "a b a b", "s1"), (3L, "zz qq ww vv", "s1")))
    val rows = graft.ext.Doremi.domainWeights(d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (_, _, ex0, w0) = rows("s0")
    val (_, _, ex1, w1) = rows("s1")
    assert(ex0 == 0L, "the cheap source sits below the global mean")
    assert(ex1 > 0L)
    assert(w1 > w0, "excess loss must attract weight")
    val tot = w0 + w1
    assert(tot <= 1000000L && tot >= 1000000L - 2, s"ppm total drifted: $tot")
  }

  test("three rounds compound the multiplicative update monotonically") {
    // the weight formula is deterministic: re-derive round by round in
    // Scala from the excess values the face itself reports
    val d = docs(Seq(
      (0L, "a b a b", "s0"), (1L, "a b a b", "s0"),
      (2L, "a b a b", "s1"), (3L, "zz qq ww vv", "s1")))
    val rows = graft.ext.Doremi.domainWeights(d).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    val ex = Map("s0" -> rows("s0")._1, "s1" -> rows("s1")._1)
    var w = Map("s0" -> 500000L, "s1" -> 500000L)
    for (_ <- 1 to 3) {
      val u = w.map { case (s, v) => s -> v * (1000L + ex(s)) / 1000L }
      val su = u.values.sum
      w = u.map { case (s, v) => s -> v * 1000000L / su }
    }
    assert(rows("s0")._2 == w("s0") && rows("s1")._2 == w("s1"))
  }
}
