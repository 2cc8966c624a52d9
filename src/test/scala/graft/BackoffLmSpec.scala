package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stupid-backoff bigram LM faces: pair construction, the millibit
  * scoring convention (hit / backoff / OOV), per-doc scores, coverage,
  * and the per-language tertile bands — hand-computed expectations.
  */
class BackoffLmSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private def df(rows: (Long, String, String, String)*) = {
    import spark.implicits._
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  // train split (even ids): doc 0 "a b a b", doc 2 "a c"
  //   pairs: (S,a)(a,b)(b,a)(a,b) + (S,a)(a,c); N = 6
  //   bg: (S,a)=2 (a,b)=2 (b,a)=1 (a,c)=1; ctx: S=2 a=3 b=1; uni: a=3 b=2 c=1
  private val corpus = df(
    (0L, "a b a b", "l1", "s0"),
    (2L, "a c", "l1", "s0"),
    (1L, "a b z", "l1", "s1"),
    (3L, "c a", "l1", "s1"))

  private def mlog2(x: Long): Long = {
    val msb = 63 - java.lang.Long.numberOfLeadingZeros(x)
    msb * 1000L + (x - (1L << msb)) * 1000L / (1L << msb)
  }

  test("pairs: one row per token, sentinel context at position 1") {
    val p = ext.BackoffLm.pairs(df((7L, "x y", "l", "s")))
      .orderBy("v").collect().map(r => (r.getString(2), r.getString(3)))
    assert(p.toSeq == Seq(("\u0001", "x"), ("x", "y")))
    // token-less docs produce no pairs (and no sequence(1, 0) crash)
    assert(ext.BackoffLm.pairs(df((8L, "   ", "l", "s"))).count() == 0)
  }

  test("doc scores: hit, backoff, and OOV branches hand-computed") {
    val got = ext.BackoffLm.docPpl(corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 1 "a b z": (S,a) hit ml(2)-ml(2)=0; (a,b) hit ml(3)-ml(2)=500;
    //   (b,z) OOV 2000+ml(6)=4500  → total 5000, 3 tokens, 1666/tok
    assert(got(1L) == ((3L, 5000L, 1666L)))
    // doc 3 "c a": (S,c) backoff on c: 1000+ml(6)-ml(1)=3500;
    //   (c,a) backoff on a: 1000+2500-ml(3)=2000 → total 5500, 2 tok, 2750
    assert(got(3L) == ((2L, 5500L, 2750L)))
    // train docs score against their own model — all hits:
    // doc 0: (S,a) ml(2)-ml(2)=0; (a,b) 1500-1000=500; (b,a) ml(1)-ml(1)=0;
    //   (a,b) 500 → total 1000, 4 tok, 250
    assert(got(0L) == ((4L, 1000L, 250L)))
    // doc 2: (S,a) 0; (a,c) ml(3)-ml(1)=1500 → total 1500, 2 tok, 750
    assert(got(2L) == ((2L, 1500L, 750L)))
    assert(mlog2(6) == 2500L && mlog2(3) == 1500L) // the constants used above
  }

  test("token-less docs appear in docPpl with zeros") {
    val got = ext.BackoffLm.docPpl(corpus.union(df((4L, " ", "l1", "s0"))))
      .where(col("doc_id") === 4).collect()(0)
    assert((got.getLong(2), got.getLong(3), got.getLong(4)) == ((0L, 0L, 0L)))
  }

  test("coverage: per-source kind tallies are consistent and exact") {
    val got = ext.BackoffLm.coverage(corpus).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // s0 = train docs: 6 tokens, all hits
    assert(got("s0") == ((6L, 6L, 0L, 0L, 0L)))
    // s1: doc1 2 hits + 1 oov, doc3 2 backoffs → 5 tokens, oov_ppm = 200000
    assert(got("s1") == ((5L, 2L, 2L, 1L, 200000L)))
  }

  test("ppl bands partition each language into monotone tertiles") {
    // 9 docs, one lang, distinct scores → 3 bands of 3
    val many = df((0L to 8L).map { i =>
      // graded rarity: doc i repeats a base phrase plus i unique words
      val text = (Seq.fill(6)("base word") ++ (0 until i.toInt).map(j => s"rare_${i}_$j"))
        .mkString(" ")
      (i, text, "l1", s"s${i % 2}")
    }: _*)
    val bands = ext.BackoffLm.pplBands(many).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(bands.map(_._2).sum == 9L)
    assert(bands.map(_._1).toSeq == bands.map(_._1).toSeq.sorted)
    // band score ranges must not overlap out of order: hi(b) <= lo(b+1)
    bands.sliding(2).foreach {
      case Array((_, _, _, hi0), (_, _, lo1, _)) => assert(hi0 <= lo1)
      case _ =>
    }
  }

  test("registry: the three faces run on testdata and match schemas") {
    val dir = "/root/testdata/sf0.001"
    val ppl = SparkEntry.queries("lm_backoff_doc_ppl")(spark, dir)
    assert(ppl.columns.toSeq ==
      Seq("doc_id", "source", "n_tok", "total_mbits", "mbits_per_tok"))
    assert(ppl.count() > 0)
    val cov = SparkEntry.queries("lm_backoff_coverage")(spark, dir)
    assert(cov.columns.toSeq ==
      Seq("source", "n_tok", "n_hit", "n_backoff", "n_oov", "oov_ppm", "mbits_per_tok"))
    // every token is exactly one of hit/backoff/oov
    cov.collect().foreach { r =>
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) == r.getLong(1))
    }
    val bands = SparkEntry.queries("lm_backoff_ppl_bands")(spark, dir)
    assert(bands.columns.toSeq ==
      Seq("lang", "band", "n_docs", "char_mass", "mbits_lo", "mbits_hi"))
    assert(bands.select("band").distinct().count() <= 3)
  }
}
