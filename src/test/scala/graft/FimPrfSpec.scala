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
