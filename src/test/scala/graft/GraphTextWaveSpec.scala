package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the round-9 graph/text additions: HITS
  * half-step normalization, Benford digit audit, conversion-delay
  * cohorts, and the weighted TextRank arithmetic.
  */
class GraphTextWaveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  test("HITS: one iteration matches the hand-computed L1-normalized longs") {
    import spark.implicits._
    val edges = Seq((1L, 101L), (1L, 102L), (2L, 101L)).toDF("src", "dst")
    val got = ext.Hits.hitsInt(edges, iterations = 1).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // rawA: p101=2e6, p102=1e6, tot=3e6 → a=666666/333333
    // rawH: s1=999999, s2=666666, tot=1666665 → h=600000/400000 (exact)
    assert(got == Set(
      (1L, "hub", 600000L), (2L, "hub", 400000L),
      (101L, "auth", 666666L), (102L, "auth", 333333L)), got)
    spark.catalog.clearCache()
  }

  test("Benford audit: digit histogram, per-mille shares, exact deviations") {
    import spark.implicits._
    val orders = Seq(
      (1L, 1.00), (2L, 2.50), (3L, 19.99), (4L, 0.50), (5L, 0.00))
      .toDF("o_orderkey", "o_totalprice")
    val cents = orders
      .select(round(col("o_totalprice") * 100).cast("long").as("c"))
      .where(col("c") > 0)
    val byDigit = cents
      .groupBy(substring(col("c").cast("string"), 1, 1).as("first_digit"))
      .agg(count(lit(1)).as("n"))
    val got = byDigit.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("1", 2L), ("2", 1L), ("5", 1L)), got)
  }

  test("conversion delay: only post-signup purchases convert; exact lower median") {
    import spark.implicits._
    val ev = Seq(
      (1L, 100L, 1L, "signup", 0.0), (1L, 300L, 2L, "purchase", 1.0),
      (2L, 1000L, 3L, "signup", 0.0), (2L, 1500L, 4L, "purchase", 1.0),
      (3L, 900L, 5L, "purchase", 1.0), (3L, 950L, 6L, "signup", 0.0),
      (4L, 10L, 7L, "signup", 0.0))
      .toDF("user_id", "ts_us", "event_id", "event_type", "value")
    val got = ext.Cohort.conversionDelay(ev).collect()
    assert(got.length == 1, got.mkString(","))
    val r = got.head
    // delays 200 and 500, both cohort week 0: median = lower of the two
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (0L, 2L, 200L, 200L, 500L), r)
  }

  test("multi-source BFS: per-source frontiers on a path graph") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val seeds = Seq(1L, 4L).toDF("src")
    val (got, release) = ext.GraphOps.multiSourceBfsStamped(edges, seeds, maxHops = 2)
    val m = got.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    release()
    assert(m == Map(
      (1L, 1L) -> 0L, (1L, 2L) -> 1L, (1L, 3L) -> 2L,
      (4L, 4L) -> 0L, (4L, 3L) -> 1L, (4L, 5L) -> 1L, (4L, 2L) -> 2L), m)
  }

  test("TextRank: two weighted rounds match the hand-computed longs") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val got = ext.TextRank.keywordsTopK(docs, k = 3, minCount = 1).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // undirected weights a↔b=3, b↔c=1; strengths a=3 b=4 c=1; two rounds
    assert(got == Seq(("a", 443124L), ("b", 375832L), ("c", 181041L)), got)
    spark.catalog.clearCache()
  }
}
