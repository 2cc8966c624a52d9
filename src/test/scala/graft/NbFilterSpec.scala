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

  test("sourceRates partitions the held-out split by source") {
    val r = ext.NbFilter.sourceRates(corpus(40))
    assert(r.agg(sum("n_docs")).collect()(0).getLong(0) == 20L)
    assert(r.count() == 2)
  }
}
