package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 third wave: the FIM (fill-in-middle) transform, the
  * curriculum pacing schedule, and BM25 pseudo-relevance-feedback
  * expansion.
  */
class FimPrfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private def docs(rows: Seq[(Long, String, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
  }

  test("FIM rewrite: PSM order, deterministic cuts, odd ids pass through") {
    val d = docs(Seq(
      (0L, "abcdefghij", "en", "s"),   // applied: len 10
      (1L, "untouched", "en", "s"),    // odd id → passthrough
      (2L, "x", "en", "s")))           // too short → passthrough
    val m = graft.ext.Fim.transformDocs(d).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(m(1L) == (false, "untouched"))
    assert(m(2L) == (false, "x"))
    val (applied, out) = m(0L)
    assert(applied)
    // doc 0: c1 = 1 + 7 % 9 = 8, c2 = 1 + 3 % 9 = 4 → lo 4, hi 8
    assert(out == "<PRE>abcd<SUF>ij<MID>efgh", out)
    // the three segments reassemble the original text exactly
    val Re = "<PRE>(.*)<SUF>(.*)<MID>(.*)".r
    val Re(p, sfx, mid) = out
    assert(p + mid + sfx == "abcdefghij")
  }

  test("FIM audit conserves character mass per source") {
    val d = docs((0L until 50L).map(i =>
      (i, ("w" * (1 + (i % 13).toInt)), "en", if (i % 3 == 0) "a" else "b")))
    val rows = graft.ext.Fim.splitAudit(d).collect()
    rows.foreach { r =>
      val total = r.getAs[Long]("total_chars")
      val sum = r.getAs[Long]("prefix_chars") + r.getAs[Long]("middle_chars") +
        r.getAs[Long]("suffix_chars") + r.getAs[Long]("passthrough_chars")
      assert(total == sum)
    }
    // mass equals the input corpus mass
    val corpus = d.agg(sum(length(col("text")))).head.getLong(0)
    assert(rows.map(_.getAs[Long]("total_chars")).sum == corpus)
    // roughly half the docs get FIM'd
    val fim = rows.map(_.getAs[Long]("n_fim")).sum
    assert(fim >= 20 && fim <= 30, s"n_fim=$fim")
  }

  test("pacing schedule: consecutive step ranges covering every phase") {
    val d = docs((0L until 40L).map(i =>
      (i, (0 to (i % 7).toInt).map(j => s"t${(i + j) % 11}").mkString(" "), "en", "s")))
    val rows = graft.ext.Curriculum.pacingSchedule(d, phases = 4, stepTokens = 5L)
      .orderBy(col("phase")).collect()
    assert(rows.length == 4)
    var next = 0L
    rows.foreach { r =>
      val (steps, start, end) = (r.getAs[Long]("n_steps"),
        r.getAs[Long]("start_step"), r.getAs[Long]("end_step"))
      assert(start == next, s"phase ${r.getInt(0)} starts at $start, expected $next")
      assert(end == start + steps - 1)
      assert(steps == (r.getAs[Long]("token_budget") + 4) / 5)
      next = end + 1
    }
  }

  test("encoding entropy: constant column scores 0, distinct column near log2(N)") {
    import spark.implicits._
    val df = (0L until 64L).map(i => (i, "const", i % 4)).toDF("id", "c", "m")
    val rows = graft.ext.StoragePlan.encodingEntropyAudit(df, Seq("id", "c", "m"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // constant: 1 distinct, 0 entropy, 0 index bits
    assert(rows("c") == (1L, 0L, 0L))
    // all-distinct: 64 values, surprisal = (log2 64 - log2 1)*1000 = 6000
    assert(rows("id") == (64L, 6000L, 6L))
    // 4-value uniform: log2 64 - log2 16 = 2 bits
    assert(rows("m") == (4L, 2000L, 2L))
  }

  test("join cardinality forecast: exact self-join size and skew ratio") {
    import spark.implicits._
    // key 1 x3 rows, key 2 x1 → self-join = 9 + 1 = 10 rows,
    // max contrib 9, mean 5 → skew 1.8
    val df = Seq(1L, 1L, 1L, 2L).toDF("k")
    val r = graft.ext.StoragePlan.joinCardinalityForecast(df, df, "k", "k")
      .collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 2L && r.getLong(2) == 9L)
    assert(r.getLong(3) == 1800L)
  }

  test("PRF expansion excludes query terms and weights feedback mass") {
    // q = rarest terms; docs sharing the rare term also carry 'common'
    val d = docs(Seq(
      (0L, "rareterm common common alpha", "en", "s"),
      (1L, "rareterm common beta", "en", "s"),
      (2L, "other words entirely", "en", "s"),
      (3L, "common gamma", "en", "s")))
    import spark.implicits._
    val q = Seq("rareterm").toDF("term")
    val exp = graft.ext.Bm25.prfExpansion(d, q, fbK = 2, nTerms = 10).collect()
    val terms = exp.map(_.getString(0)).toSet
    assert(!terms.contains("rareterm"), "query term must be excluded")
    assert(terms.contains("common"), s"feedback-heavy term missing: $terms")
    // 'common' appears in both feedback docs
    val common = exp.find(_.getString(0) == "common").get
    assert(common.getAs[Long]("n_fb_docs") == 2L)
    // weights are positive and sorted descending
    val ws = exp.map(_.getAs[Long]("w_fp"))
    assert(ws.forall(_ >= 0) && ws.sameElements(ws.sorted.reverse))
  }
}
