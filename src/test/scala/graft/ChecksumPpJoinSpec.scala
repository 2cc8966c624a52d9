package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** PPJoin exactness (result equality with the prefix-filter join and
  * with brute force), bucket-digest algebra, and streaming-vs-batch
  * CUSUM parity.
  */
class ChecksumPpJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text").repartition(4)
  }

  private def pairSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.select("doc_a", "doc_b", "n_common").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def randomDocs(n: Int, seed: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val vocab = Vector.tabulate(30)(i => s"w$i")
    val base = Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    (1L to n).map { i =>
      // half near-dups of the base, half independent
      val t =
        if (i % 2 == 0) base.split(" ").map(w =>
          if (rnd.nextInt(10) == 0) vocab(rnd.nextInt(vocab.size)) else w).mkString(" ")
        else Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i, t)
    }
  }

  test("ppjoin equals the prefix-filter join at the same threshold") {
    val docs = docsDf(randomDocs(40, seed = 3))
    val (pp, upp) = graft.ext.PpJoin.ppjoinPairsStamped(docs, 85)
    val (pf, upf) = graft.ext.Dedup.prefixJaccardPairsStamped(docs, 85)
    try assert(pairSet(pp) == pairSet(pf))
    finally { upp(); upf() }
  }

  test("ppjoin equals brute-force threshold Jaccard over shingle sets") {
    val rows = randomDocs(30, seed = 9)
    val docs = docsDf(rows)
    val (pp, upp) = graft.ext.PpJoin.ppjoinPairsStamped(docs, 80)
    try {
      def sh(t: String): Set[String] =
        t.split("\\s+").filter(_.nonEmpty).sliding(3).filter(_.size == 3)
          .map(_.mkString(" ")).toSet
      val expected = (for {
        (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
        sa = sh(ta); sb = sh(tb)
        inter = (sa & sb).size.toLong
        if sa.nonEmpty && sb.nonEmpty &&
          100L * inter >= 80L * (sa.size + sb.size - inter)
      } yield (ia, ib, inter)).toSet
      assert(pairSet(pp) == expected)
    } finally upp()
  }

  test("bucket digest is invariant to row order and partitioning") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (i, i % 7, s"s$i", i * 3))
    val a = rows.toDF("k", "c1", "c2", "c3").repartition(1)
    val b = Random.shuffle(rows).toDF("k", "c1", "c2", "c3").repartition(17)
    val da = graft.ops.Checksum.bucketDigest(a, "k", Seq("k", "c1", "c2", "c3"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val db = graft.ops.Checksum.bucketDigest(b, "k", Seq("k", "c1", "c2", "c3"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(da == db)
    assert(da.size <= 64 && da.toSeq.map(_._2).sum == 500L)
  }

  test("a single changed value flips exactly one bucket's digest") {
    import spark.implicits._
    val rows = (1L to 200L).map(i => (i, s"v$i"))
    val mutated = rows.map { case (k, v) => if (k == 77L) (k, "CHANGED") else (k, v) }
    val da = graft.ops.Checksum.bucketDigest(rows.toDF("k", "v"), "k", Seq("k", "v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val db = graft.ops.Checksum.bucketDigest(mutated.toDF("k", "v"), "k", Seq("k", "v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val differing = da.keySet.union(db.keySet).filter(k => da.get(k) != db.get(k))
    assert(differing.size == 1, differing.toString)
    // row COUNT unchanged — only the xor digest moves
    assert(da(differing.head)._1 == db(differing.head)._1)
  }

  test("interval overlap join: report-once equals brute force, even across many shared bins") {
    import spark.implicits._
    val rnd = new Random(5)
    // spans up to 9 bins wide (binWidth 10) — multi-bin overlaps MUST
    // surface exactly once
    val as = (1L to 60L).map { i =>
      val s = rnd.nextInt(300).toLong; (i, s, s + 1 + rnd.nextInt(90))
    }
    val bs = (1L to 60L).map { i =>
      val s = rnd.nextInt(300).toLong; (i, s, s + 1 + rnd.nextInt(90))
    }
    val out = graft.ops.JoinOps.intervalOverlapJoin(
        as.toDF("a_id", "a_s", "a_e").repartition(5), "a_s", "a_e",
        bs.toDF("b_id", "b_s", "b_e").repartition(3), "b_s", "b_e", binWidth = 10L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = for {
      (ai, s1, e1) <- as; (bi, s2, e2) <- bs if s1 < e2 && s2 < e1
    } yield (ai, bi)
    assert(out.length == out.distinct.length, "a pair was reported twice")
    assert(out.toSet == expected.toSet)
    assert(out.length == expected.length)
  }

  test("nearest as-of agrees with the backward as-of whenever it picks the past side") {
    val dir = "/root/testdata/sf0.001"
    val near = graft.ops.JoinOps.queries("join_asof_nearest")(spark, dir)
      .collect().map(r => r.getLong(1) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]), r.getLong(2)))).toMap
    val back = graft.ops.JoinOps.queries("asof_join")(spark, dir)
      .collect().map(r => r.getLong(1) ->
        Option(r.get(4)).map(_.asInstanceOf[Long])).toMap
    assert(near.keySet == back.keySet) // same purchase universe
    var pastPicks = 0
    for ((eid, (nearId, nearTs, ts)) <- near) {
      nearTs.foreach { nts =>
        if (nts <= ts) { // picked the past side -> must equal backward asof
          assert(back(eid) == nearId, s"purchase $eid: near=$nearId back=${back(eid)}")
          pastPicks += 1
        } else assert(back(eid).isEmpty || nts > ts) // future pick only if closer
      }
    }
    assert(pastPicks > 0) // the agreement set is non-trivial
  }

  test("streaming digest equals the batch digest (XOR merge-invariance)") {
    val dir = "/root/testdata/sf0.001"
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val batch = toMap(graft.ops.Checksum.queries("table_checksum")(spark, dir))
    val streamed = toMap(graft.streaming.StreamingOps.checksumStream(spark, dir))
    assert(streamed == batch)
  }

  test("streaming cusum equals the batch operator") {
    val dir = "/root/testdata/sf0.001"
    val batch = graft.ext.Timeseries.queries("changepoint_cusum")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    val streamed = graft.streaming.StreamingOps.cusumToCompletion(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(streamed == batch)
  }
}
