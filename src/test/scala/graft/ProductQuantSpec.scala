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
}
