package graft

import graft.ext.{ProductQuant, SimSearch}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProductQuantSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def corpus = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"))

  test("pqTopK: shape, self-exclusion, rank follows (dot desc, id)") {
    val out = ProductQuant.pqTopK(corpus.filter(col("vec_id") < 10), corpus)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val byQ = out.groupBy(_._1)
    assert(byQ.size == 10)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to 5), s"ranks 1..5 for query $q")
      assert(!rows.exists(_._3 == q), s"query $q must not match itself")
      // ranks ordered by (dot_q desc, c_id asc)
      val sorted = rows.sortBy(_._2).map(r => (-r._4, r._3)).toSeq
      assert(sorted == sorted.sorted, s"rank order must follow (dot desc, c_id) for $q")
    }
  }

  test("pqTopK is invariant to input partitioning") {
    val q = corpus.filter(col("vec_id") < 10)
    val a = ProductQuant.pqTopK(q, corpus).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    val b = ProductQuant.pqTopK(q.repartition(7), corpus.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(a == b)
  }

  test("reranked results carry EXACT dots: every returned pair matches brute-force scoring") {
    val q = corpus.filter(col("vec_id") < 10)
    val exactDots = SimSearch.bruteForceTopK(q, corpus, k = 499)
      .select(col("q_id"), col("c_id"), col("dot_q")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val pq = ProductQuant.pqTopK(q, corpus).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    pq.foreach { case (qid, cid, dot) =>
      assert(exactDots((qid, cid)) == dot,
        s"rerank dot for ($qid,$cid) must equal the exact dot")
    }
  }

  test("pqTopK recall@5 vs brute force clears the documented floor") {
    val q = corpus.filter(col("vec_id") < 10)
    val exact = SimSearch.bruteForceTopK(q, corpus, k = 5)
      .select(col("q_id"), col("c_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = ProductQuant.pqTopK(q, corpus)
      .select(col("q_id"), col("c_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq & exact).size.toDouble / exact.size
    info(f"PQ recall@5 = $recall%.2f")
    // ADC shortlist@50 over c=64 codebooks recovers 0.90 of the exact
    // top-5 on this corpus; floor documented at 0.7
    assert(recall >= 0.7, f"recall $recall%.2f under the 0.7 floor")
  }

  test("ivfpqTopK with every cell probed degenerates to exactly pqTopK") {
    // nProbe = nCells makes the candidate set the full corpus (minus
    // self), so the cell layer must change NOTHING — a strong identity
    // over the whole coarse-quantizer + restricted-ADC plumbing
    val q = corpus.filter(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val full = rows(ProductQuant.pqTopK(q, corpus))
    val ivf = rows(ProductQuant.ivfpqTopK(q, corpus, nCells = 16, nProbe = 16))
    assert(ivf == full, s"probe-all must equal full-corpus ADC")
  }

  test("ivfpqTopK: shape, self-exclusion, and recall against brute force") {
    val q = corpus.filter(col("vec_id") < 10)
    val out = ProductQuant.ivfpqTopK(q, corpus)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val byQ = out.groupBy(_._1)
    assert(byQ.size == 10)
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.size), s"dense ranks for $qid")
      assert(!rs.exists(_._3 == qid), s"query $qid must not match itself")
    }
    val exact = SimSearch.bruteForceTopK(q, corpus, k = 5)
      .select(col("q_id"), col("c_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = out.map(r => (r._1, r._3)).toSet
    val recall = (got & exact).size.toDouble / exact.size
    info(f"IVFPQ recall@5 = $recall%.2f (cell restriction vs PQ's full-corpus ADC)")
    // probing 8 of 32 cells costs recall vs the 0.90 full-ADC figure;
    // measured 0.66 at sf0.01 — floor documented at 0.4
    assert(recall >= 0.4, f"recall $recall%.2f under the 0.4 floor")
  }
}
