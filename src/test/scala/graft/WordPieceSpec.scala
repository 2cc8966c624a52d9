package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** WordPiece trainer: likelihood-gain argmax, greedy LTR merges,
  * BPE-divergence face.
  */
class WordPieceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private def docs(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("argmax is likelihood gain, not raw frequency") {
    // pair (a,b): n = 10 but its symbols are everywhere (n_a = n_b = 60)
    //   score = 10e9 / 3600 = 2_777_777
    // pair (x,y): n = 3 and its symbols occur ONLY in the pair
    //   score = 3e9 / 9 = 333_333_333  → WordPiece merges (x,y) first
    // (BPE would merge (a,b): 10 > 3)
    val d = docs(
      Seq.fill(10)("ab") ++ Seq.fill(50)("a") ++ Seq.fill(50)("b") ++
        Seq.fill(3)("xy"))
    val m = graft.ext.WordPiece.trainMerges(d, rounds = 1).collect()
    assert(m.length == 1)
    val r = m(0)
    assert((r.getString(1), r.getString(2)) == ("x", "y"))
    assert(r.getLong(3) == 3L)
    assert(r.getLong(4) == 3L * 1000000000L / 9L)
  }

  test("greedy LTR merges even run offsets; vocab collapses to the word") {
    // one word type "xxx" × 2: round 1 merges (x,x) as [xx, x] (the
    // odd-offset overlap must NOT merge), round 2 merges (xx, x)
    val d = docs(Seq("xxx", "xxx"))
    val m = graft.ext.WordPiece.trainMerges(d, rounds = 5).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq((1, "x", "x", 4L), (2, "xx", "x", 2L)))
    val vocab = graft.ext.WordPiece.symbolVocab(d, rounds = 5).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab == Map("xxx" -> 2L))
  }

  test("vsBpeOverlap counts shared merge pairs") {
    // single word type: both trainers are forced through the same two
    // merges, then exhaust — overlap is exactly 2
    val d = docs(Seq("xxx", "xxx"))
    val row = graft.ext.WordPiece.vsBpeOverlap(d, rounds = 5).collect()(0)
    assert(row.getInt(0) == 5 && row.getLong(1) == 2L)
  }
}
