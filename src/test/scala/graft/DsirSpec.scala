package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance-resampling selection: hashed-bigram bucket model,
  * per-doc log importance weights, exact-quota selection.
  */
class DsirSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  /** Scala reference of the NbFilter millibit-log2 so weights can be
    * asserted exactly without replaying Spark.
    */
  private def mlog2(x: Long): Long = {
    require(x > 0)
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val p = 1L << (bits - 1)
    (bits - 1) * 1000L + (x - p) * 1000L / p
  }

  private def docs(rows: Seq[(Long, String, String, String)]) = {
    import spark.implicits._
    rows.map { case (id, text, lang, source) =>
      (id, text, lang, source, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  // target-only phrase "tt tt", raw-only phrase "rr rr": with every en
  // doc containing the former and every non-en the latter, the bucket
  // weights must separate them with the full smoothed log ratio
  private val corpus = docs(Seq(
    (0L, "tt tt", "en", "s0"),
    (1L, "tt tt", "en", "s0"),
    (2L, "rr rr", "de", "s1"),
    (3L, "rr rr", "de", "s1")))

  test("bucketWeights carries the exact smoothed millibit log ratio") {
    val w = graft.ext.Dsir.bucketWeights(corpus).collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    // N_t = 2 (two 'tt tt' occurrences), N_r = 4, B = 1024
    val tgtW = mlog2(2 + 1) - mlog2(2 + 1024) - mlog2(2 + 1) + mlog2(4 + 1024)
    val rawW = mlog2(0 + 1) - mlog2(2 + 1024) - mlog2(2 + 1) + mlog2(4 + 1024)
    assert(w((2L, 2L)) == tgtW)       // the target bigram's bucket
    assert(w((0L, 2L)) == rawW)       // the raw-only bigram's bucket
    assert(tgtW > rawW, "target-evidence buckets must outrank raw-only ones")
  }

  test("docScores covers the corpus; short docs score 0") {
    val d = docs(Seq(
      (0L, "tt tt", "en", "s0"),
      (1L, "one", "de", "s1"),        // 1 token: no bigram evidence
      (2L, "", "de", "s1")))          // empty
    val m = graft.ext.Dsir.docScores(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(m.size == 3)
    assert(m(1L) == (0L, 0L) && m(2L) == (0L, 0L))
    assert(m(0L)._1 == 1L)            // one bigram occurrence
  }

  test("selectQuota keeps exactly floor(25%) with target-like docs first") {
    // 8 docs: 2 en-phrase docs among 8 → quota = 2; the en-phrase docs
    // carry the highest importance and must be the kept ones
    val d = docs(
      (0 until 2).map(i => (i.toLong, "tt tt", "en", "sA")) ++
        (2 until 8).map(i => (i.toLong, "rr rr", "de", "sB")))
    val rows = graft.ext.Dsir.selectQuota(d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows("sA") == (2L, 2L, 10L, 1000000L))  // both kept, 5+5 chars
    assert(rows("sB")._2 == 0L, "no raw-only doc enters the 25% quota")
    assert(rows.values.map(_._2).sum == 2L)
  }

  test("quota tie-break is deterministic by doc_id") {
    // all docs identical → all scores tie; quota 25% of 8 = 2 keeps
    // doc_ids 0 and 1 exactly
    val d = docs((0 until 8).map(i => (i.toLong, "tt tt", "en", s"s${i % 2}")))
    val kept = graft.ext.Dsir.selectQuota(d).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(kept("s0") == 1L && kept("s1") == 1L)  // docs 0 and 1
  }
}
