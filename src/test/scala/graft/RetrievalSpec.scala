package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point BM25, winnowing fingerprints, bigram novelty: hand
  * arithmetic, the winnowing coverage/robustness guarantees, and
  * tf-saturation / idf-ordering properties.
  */
class RetrievalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  test("bm25: hand-computed fixed-point score on a two-doc corpus") {
    import spark.implicits._
    // doc 1 = "a a b", doc 2 = "b c": N=2, T=5, dl1=3, dl2=2
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val q = Seq("a").toDF("term") // df(a)=1
    val got = graft.ext.Bm25.bm25TopK(docs, q, k = 10).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // idf_fp = 1000*(2*(2-1)+1) div (2*1+1) = 1000
    // snorm_fp = 1e6*44*2*5 div (20*2*5 + 6*5 + 18*3*2) = 440000000 div 338
    val snorm = 440000000L / 338
    assert(got.toSeq == Seq((1, 1L, 1000L * snorm)))
  }

  test("bm25: more matching occurrences outrank fewer at equal length") {
    import spark.implicits._
    val docs = Seq((1L, "x x x y"), (2L, "x y y y"), (3L, "y y y y"))
      .toDF("doc_id", "text")
    val q = Seq("x").toDF("term")
    val got = graft.ext.Bm25.bm25TopK(docs, q, k = 10).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(got.map(_._2).toSeq == Seq(1L, 2L)) // doc 3 has no x — absent
  }

  test("bm25: tf saturation — the k1 curve gains less per extra tf") {
    import spark.implicits._
    // equal dl via padding; tf(x) = 1, 2, 3
    val docs = Seq((1L, "x p p p"), (2L, "x x p p"), (3L, "x x x p"))
      .toDF("doc_id", "text")
    val q = Seq("x").toDF("term")
    val s = graft.ext.Bm25.bm25TopK(docs, q, k = 10).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(s(3L) > s(2L) && s(2L) > s(1L))
    assert((s(3L) - s(2L)) < (s(2L) - s(1L))) // concave in tf
  }

  /** Reference winnowing: straightforward O(n·w) implementation. */
  private def winnowRef(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(g: String): Long = {
      val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(10), 16)
    }
    val grams = (1 to text.length - k + 1).map(i => (i.toLong, h(text.substring(i - 1, i - 1 + k))))
    (for (j <- 0 to grams.length - w) yield {
      val win = grams.slice(j, j + w)
      // min hash, rightmost on ties
      win.minBy(g => (g._2, -g._1)) match { case (p, hv) => (p, hv) }
    }).toSet
  }

  test("winnow: matches the reference implementation, incl. tie-breaks") {
    import spark.implicits._
    // 'ababab...' makes every other 3-gram IDENTICAL → hash ties in-window
    val texts = Seq((1L, "abababababababab"), (2L, "the quick brown fox jumps"),
      (3L, "zzzzzzzzzzzz")) // all grams identical — maximal tie stress
    val docs = texts.toDF("doc_id", "text")
    val got = graft.ext.Winnow.winnowFingerprints(docs, k = 3, w = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = texts.flatMap { case (id, t) =>
      winnowRef(t, 3, 4).map { case (p, h) => (id, p, h) } }.toSet
    assert(got == want)
  }

  test("winnow: every window of w grams contains a selected position") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val text = Seq.fill(300)(('a' + rnd.nextInt(6)).toChar).mkString
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val sel = graft.ext.Winnow.winnowFingerprints(docs, k = 5, w = 4).collect()
      .map(_.getLong(1)).toSet
    val m = text.length - 5 + 1
    (1 to m - 3).foreach { j =>
      assert((j until j + 4).exists(p => sel.contains(p.toLong)),
        s"window at $j has no selected fingerprint")
    }
  }

  test("winnow: shared long substring yields a shared fingerprint hash") {
    import spark.implicits._
    val shared = "this exact span is long enough to guarantee overlap"
    val docs = Seq((1L, "prefix one " + shared + " tail a"),
      (2L, "completely different lead-in " + shared + " other end"))
      .toDF("doc_id", "text")
    val fp = graft.ext.Winnow.winnowFingerprints(docs, k = 8, w = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val h1 = fp.filter(_._1 == 1L).map(_._2).toSet
    val h2 = fp.filter(_._1 == 2L).map(_._2).toSet
    assert((h1 & h2).nonEmpty)
  }

  test("bigram novelty: hand-computed masses") {
    import spark.implicits._
    // doc1 bigrams: "a b","b a","a b" ; doc2: "a b","b c"
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = graft.ext.Quality.bigramNovelty(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // corpus: "a b"->3, "b a"->1, "b c"->1
    // doc1: n=3, distinct=2, mass = 2*3 + 1*1 = 7, novel = "b a" (1)
    // doc2: n=2, distinct=2, mass = 1*3 + 1*1 = 4, novel = "b c" (1)
    assert(got(1L) == ((3L, 2L, 7L, 1L)))
    assert(got(2L) == ((2L, 2L, 4L, 1L)))
  }
}
