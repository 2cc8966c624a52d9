package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Learned quality-filter faces: feature extraction, the NB model,
  * held-out scoring, and the exact top-p% selection.
  */
class NbFilterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  // docs engineered so the gopher verdict is decided by length alone:
  // short docs (4 words) fail ok_len, long docs (60 words) pass all four
  // rules (stopwords present, all-alpha, mean word length in [3,10]).
  private def corpus(n: Int) = {
    import spark.implicits._
    val longText = (Seq("the", "and") ++ Seq.fill(58)("word")).mkString(" ")
    val shortText = "the and word word"
    (0 until n).map { i =>
      val pass = i % 4 < 2 // doc 0,1 mod 4 long; 2,3 short — both split halves see both classes
      (i.toLong, if (pass) longText else shortText, "lang", s"s${(i / 2) % 2}",
        (if (pass) longText else shortText).length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("mlog2 millibit log2 matches a reference implementation") {
    import spark.implicits._
    def ref(x: Long): Long = {
      val msb = 63 - java.lang.Long.numberOfLeadingZeros(x)
      msb * 1000L + (x - (1L << msb)) * 1000L / (1L << msb)
    }
    val xs = Seq(1L, 2L, 3L, 5L, 7L, 8L, 100L, 1023L, 1024L, 1L << 40)
    val got = xs.toDF("x")
      .select(expr("(length(bin(x)) - 1) * 1000 + " +
        "(x - shiftleft(1L, length(bin(x)) - 1)) * 1000 div shiftleft(1L, length(bin(x)) - 1)")
        .as("m"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == xs.map(ref))
    // monotone non-decreasing over a dense range
    val dense = (1L to 300L).toDF("x")
      .select(expr("(length(bin(x)) - 1) * 1000 + " +
        "(x - shiftleft(1L, length(bin(x)) - 1)) * 1000 div shiftleft(1L, length(bin(x)) - 1)")
        .as("m"))
      .collect().map(_.getLong(0)).toSeq
    assert(dense == dense.sorted)
  }

  test("features emits exactly four cells per doc with a bounded alphabet") {
    val f = ext.NbFilter.features(corpus(40))
    assert(f.count() == 160)
    val perDoc = f.groupBy("doc_id").count().select("count").distinct().collect()
    assert(perDoc.map(_.getLong(0)).toSeq == Seq(4L))
    assert(f.select("feat").distinct().count() == 4)
  }

  test("model counts only the even split and the cells sum to the split size") {
    val m = ext.NbFilter.model(ext.NbFilter.features(corpus(40)))
    // 20 train docs x 4 features = 80 cell observations
    val sums = m.agg(sum(col("n_pass") + col("n_fail"))).collect()(0).getLong(0)
    assert(sums == 80L)
  }

  test("held-out confusion is perfect on a length-separable corpus") {
    val c = ext.NbFilter.confusion(corpus(40)).collect()(0)
    val (nTest, tp, fp, fn, tn, acc) =
      (c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3), c.getLong(4), c.getLong(5))
    assert(nTest == 20L && tp + fp + fn + tn == nTest)
    // the len feature alone separates the classes — the NB must learn it
    assert(fp == 0L && fn == 0L && acc == 1000000L)
  }

  test("filterTopPct keeps exactly n*pct/100 docs, highest scores first") {
    val kept = ext.NbFilter.filterTopPct(corpus(40), pct = 25)
    val total = kept.agg(sum("n_kept")).collect()(0).getLong(0)
    assert(total == 10L) // 40 * 25 / 100
    // the kept docs must be pass-class (higher NB score on this corpus):
    // all pass docs share one source-parity pattern — check via scored()
    val sc = ext.NbFilter.scored(corpus(40), lit(true))
    val topIds = sc.orderBy(col("score_mbits").desc, col("doc_id")).limit(10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(topIds.forall(i => i % 4 < 2))
  }

  test("ablation audit: five variants, full row equals the confusion face") {
    val rows = ext.NbFilter.ablationAudit(corpus(40)).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(rows.keySet == Set("full", "no_len", "no_mwl", "no_stop", "no_alpha"))
    // every variant partitions the same held-out split
    rows.values.foreach { case (n, tp, fp, fn, tn, _) => assert(tp + fp + fn + tn == n) }
    // the full variant must reproduce the confusion face bit for bit
    val c = ext.NbFilter.confusion(corpus(40)).collect()(0)
    assert(rows("full") ==
      ((c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3), c.getLong(4), c.getLong(5))))
  }

  test("waterfill budget: full prefix keeps everything, capped suffix spends the rest exactly") {
    import spark.implicits._
    // sources with 1/2/8/16 tokens; total 27, budget 13: the 1- and
    // 2-token sources fit under the water level, the 8/16 pair splits
    // the remaining 10 as 5 each — Σ alloc == budget exactly
    def doc(src: String, words: Int) =
      (src.hashCode.toLong.abs, Seq.fill(words)("w").mkString(" "), "l", src, words.toLong)
    val d = Seq(doc("a", 1), doc("b", 2), doc("c", 8), doc("d", 16))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = ext.Sampling.waterfillBudget(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got("a") == (1L, 1L, false))
    assert(got("b") == (2L, 2L, false))
    assert(got("c") == (8L, 5L, true))
    assert(got("d") == (16L, 5L, true))
    assert(got.values.map(_._2).sum == 13L)
  }

  test("waterfill budget: remainder tokens go one each to the first capped sources") {
    import spark.implicits._
    // 3/9/9 tokens, budget 10: source a full (3), b and c split 7 as
    // 4/3 — the +1 remainder lands on the smaller (name-ordered) capped
    def doc(src: String, words: Int) =
      (src.hashCode.toLong.abs, Seq.fill(words)("w").mkString(" "), "l", src, words.toLong)
    val d = Seq(doc("a", 3), doc("b", 9), doc("c", 9))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = ext.Sampling.waterfillBudget(d).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(got("a") == (3L, false))
    assert(got("b") == (4L, true))
    assert(got("c") == (3L, true))
  }

  test("sourceRates partitions the held-out split by source") {
    val r = ext.NbFilter.sourceRates(corpus(40))
    assert(r.agg(sum("n_docs")).collect()(0).getLong(0) == 20L)
    assert(r.count() == 2)
  }
}
