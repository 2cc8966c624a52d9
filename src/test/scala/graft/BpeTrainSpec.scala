package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** BPE training: hand-computed merges on tiny corpora, the greedy
  * left-to-right overlap rule (runs of identical symbols merge at even
  * offsets only), early stop when every word is one symbol, and
  * partition invariance of the learned merge table.
  */
class BpeTrainSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private def mergesOf(texts: Seq[String], rounds: Int,
                       parts: Int = 4): Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .repartition(parts)
    graft.ext.BpeTrain.bpeTrainMerges(docs, rounds)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
  }

  test("hand-computed merges on a two-word corpus") {
    // "abab ab": pairs a-b ×3, b-a ×1 → round 1 merges (a,b) n=3.
    // After: [ab, ab], [ab] → pairs ab-ab ×1 → round 2 merges (ab,ab) n=1.
    // After: [abab], [ab] → no pairs → early stop at round 3.
    val m = mergesOf(Seq("abab ab"), rounds = 5)
    assert(m == Seq((1, "a", "b", 3L), (2, "ab", "ab", 1L)), m.toString)
  }

  test("greedy LTR merges even offsets of an odd identical-symbol run") {
    // "aaaaa": pairs a-a ×4 → merge (a,a) n=4, greedy LTR gives
    // [aa, aa, a] (positions 1-2, 3-4 merge; 5 survives alone).
    // Round 2: pairs aa-aa ×1, aa-a ×1 → tie on n, (aa,a) < (aa,aa)
    // lexically on rgt → merges (aa,a) n=1? No: order is n DESC then
    // lft, rgt ASC — both n=1, lft both "aa", rgt "a" < "aa" → (aa,a).
    val m = mergesOf(Seq("aaaaa"), rounds = 2)
    assert(m == Seq((1, "a", "a", 4L), (2, "aa", "a", 1L)), m.toString)
  }

  test("early stop: single-character words exhaust immediately") {
    val m = mergesOf(Seq("a b c", "d e"), rounds = 5)
    assert(m.isEmpty, m.toString)
  }

  test("merge table is partition-invariant") {
    val corpus = Seq("the cat sat on the mat", "the bat and the cat",
      "a banana bandana", "low lower lowest", "new newer newest")
    val a = mergesOf(corpus, rounds = 5, parts = 1)
    val b = mergesOf(corpus, rounds = 5, parts = 13)
    assert(a == b)
    assert(a.size == 5)
  }

  test("word boundaries never merge: pairs never span whitespace") {
    // "ab ab": only ONE pair type a-b with n=2 (the space is a word
    // boundary, so b-a across words is never counted).
    val m = mergesOf(Seq("ab ab"), rounds = 1)
    assert(m == Seq((1, "a", "b", 2L)), m.toString)
  }

  test("applied stream is the greedy LTR tokenization after the learned merges") {
    import spark.implicits._
    // "abab ab" after (a,b) then (ab,ab): word 0 → [abab], word 1 → [ab]
    val docs = Seq((0L, "abab ab")).toDF("doc_id", "text")
    val t = graft.ext.BpeTrain.bpeApplyStream(docs, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq.sorted
    assert(t == Seq((0L, 0, 1, "abab"), (0L, 1, 1, "ab")).sorted, t.toString)
    // round-trip identity: concatenating each word's tokens in pos
    // order rebuilds the original words
    val corpus = Seq((0L, "the cat sat"), (1L, "low lower"))
    val words = corpus.flatMap { case (d, s) =>
      s.split("\\s+").zipWithIndex.map { case (w, i) => (d, i) -> w } }.toMap
    val applied = graft.ext.BpeTrain.bpeApplyStream(corpus.toDF("doc_id", "text"), rounds = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .groupBy(t => (t._1, t._2))
      .map { case (k, rows) => k -> rows.sortBy(_._3).map(_._4).mkString }
    assert(applied == words, s"$applied vs $words")
  }
}
