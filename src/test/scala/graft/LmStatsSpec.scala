package graft

import graft.ext.LmStats
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** LM corpus-statistics wave: Kneser–Ney continuation diversity, the
  * Zipf bit-log curve, tokenizer fertility, OOV coverage — tiny
  * hand-computed fixtures, then shape/boundary checks.
  */
class LmStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private def docs(rows: (Long, String, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
  }

  test("knContinuation: distinct left contexts, not raw counts") {
    // corpus: "a b", "c b", "a b" -> bigram TYPES {(a,b),(c,b)}
    // b: left_types=2 (a,c); a: left 0; c: left 0.
    // right: a->{b}=1, c->{b}=1, b->0. n_types=2.
    val d = docs((0L, "a b", "en", "s"), (1L, "c b", "en", "s"),
      (2L, "a b", "en", "s"))
    val r = LmStats.knContinuation(d, 10).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("b").getLong(2) == 2L && r("b").getLong(3) == 0L)
    assert(r("a").getLong(2) == 0L && r("a").getLong(3) == 1L)
    assert(r("a").getLong(1) == 2L) // n_w counts tokens, not types
    assert(r("b").getLong(4) == 1000000L) // 2 * 1e6 div 2
  }

  test("zipfBitlogCurve: power-of-two ranks only, exact floor-log2") {
    // 5 words, freqs 8,4,2,1,1 -> ranks 1..5; sampled ranks 1,2,4.
    val d = docs((0L, "w1 " * 8 + "w2 " * 4 + "w3 w3 w4 w5", "en", "s"))
    val rows = LmStats.zipfBitlogCurve(d).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 2L, 4L))
    assert(rows.map(_.getLong(2)).toSeq == Seq(8L, 4L, 1L))
    assert(rows.map(_.getLong(3)).toSeq == Seq(3L, 2L, 0L))
    // decay: null, (3-2)*1000, (2-0)*1000
    assert(rows(0).isNullAt(4))
    assert(rows(1).getLong(4) == 1000L && rows(2).getLong(4) == 2000L)
  }

  test("tokenizerFertility: punctuation splits subwords off words") {
    // "don't stop" -> 2 words; bpe pre-tokens: don,',t,stop = 4
    val d = docs((0L, "don't stop", "en", "s"))
    val r = LmStats.tokenizerFertility(d).collect()(0)
    assert(r.getAs[Long]("n_words") == 2L)
    assert(r.getAs[Long]("n_subwords") == 4L)
    assert(r.getAs[Long]("fertility_ppm") == 2000000L)
  }

  test("oovCoverage: tokens outside the top-v vocab are OOV") {
    // vocab size 1 -> only the most frequent word ("x", ties to "x"
    // by freq) is in-vocab; 2 of 5 tokens are OOV in s1, 1 of 1 in s2.
    val d = docs((0L, "x x x y z", "en", "s1"), (1L, "q", "en", "s2"))
    val r = LmStats.oovCoverage(d, 1).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("s1").getLong(1) == 5L && r("s1").getLong(2) == 2L)
    assert(r("s1").getLong(3) == 400000L)
    assert(r("s2").getLong(2) == 1L && r("s2").getLong(3) == 1000000L)
  }

  test("degenerate inputs: empty text and single-token docs") {
    val d = docs((0L, "only", "en", "s"), (1L, "  ", "en", "s"))
    // no bigrams anywhere -> left/right 0, cont_ppm 0 via greatest-guard
    val kn = LmStats.knContinuation(d, 10).collect()
    assert(kn.length == 1 && kn(0).getLong(2) == 0L && kn(0).getLong(4) == 0L)
    val f = LmStats.tokenizerFertility(d).collect()(0)
    assert(f.getAs[Long]("n_words") == 1L)
  }
}
