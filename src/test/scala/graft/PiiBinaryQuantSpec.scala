package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 continuation wave: PII accounting/redaction audit and
  * binary-quantization (sign-bit) ANN.
  */
class PiiBinaryQuantSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  // ---- PII ----

  private def docs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  test("pii augmentation: modular rules append the documented tokens") {
    // doc 0: all three classes; doc 1: none; doc 3: email only
    val d = docs(Seq((0L, "alpha", "s"), (1L, "beta", "s"), (3L, "gamma", "s")))
    val m = graft.ext.Pii.augmented(d).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m(0L) == "alpha reach user0@mail.example.com call 555-0000 host 10.0.0.0")
    assert(m(1L) == "beta")
    assert(m(3L) == "gamma reach user3@mail.example.com")
  }

  test("pii_detect_counts: per-source class counts and matched chars") {
    val d = docs(Seq((0L, "a", "s1"), (1L, "b", "s1"), (5L, "c", "s2")))
    val rows = graft.ext.Pii.detectCounts(d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // doc 0 (s1): email "user0@mail.example.com" (22) + phone "555-0000" (8)
    // + ip "10.0.0.0" (8) = 38 matched chars; doc 1 clean
    assert(rows("s1") == (2L, 1L, 1L, 1L, 1L, 38L))
    // doc 5 (s2): phone only ("555-0005", 8 chars)
    assert(rows("s2") == (1L, 1L, 0L, 1L, 0L, 8L))
  }

  test("pii redaction replaces every class and leaves no residuals") {
    val d = docs(Seq((0L, "x", "s"), (15L, "y", "s"), (21L, "z", "s")))
    val red = graft.ext.Pii.augmented(d)
      .select(col("doc_id"), graft.ext.Pii.redact(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(0L) == "x reach <EMAIL> call <PHONE> host <IP>")
    assert(red(15L) == "y reach <EMAIL> call <PHONE>") // 15 ≡ 0 mod 3 and 5
    assert(red(21L) == "z reach <EMAIL> host <IP>")    // 21 ≡ 0 mod 3 and 7
    val audit = graft.ext.Pii.redactAudit(d).collect()
    assert(audit.forall(r =>
      r.getLong(3) == 0L && r.getLong(4) == 0L && r.getLong(5) == 0L),
      "residual matches after redaction")
  }

  test("pii_source_quarantine emits a verdict row per source, zeroing blocklisted mass") {
    // s1 gets every augmented doc id (0,3,5: email+phone+ip mass),
    // s2 only clean ids — s1's pii_chars sits above the 2-source mean,
    // so s1 is quarantined (verdict row with zeroed kept counts) and
    // s2 survives the anti-join with its full mass
    val d = docs(Seq(
      (0L, "a", "s1"), (3L, "b", "s1"), (5L, "c", "s1"),
      (1L, "dd", "s2"), (2L, "ee", "s2")))
    val rows = graft.ext.Pii.sourceQuarantine(d).collect()
      .map(r => r.getString(0) -> (r.getBoolean(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows == Map(
      "s1" -> (true, 0L, 0L),
      "s2" -> (false, 2L, 4L)))
  }

  // ---- BinaryQuant ----

  private def vecs(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  /** All-positive except the listed (0-based) negative dims. */
  private def v(neg: Int*): Seq[Float] =
    (0 until 64).map(i => if (neg.contains(i)) -1.0f else 1.0f)

  test("withCodes packs sign bits little-endian into two 32-bit halves") {
    val e = vecs(Seq(
      (1L, v()),            // all non-negative → both halves 2^32-1
      (2L, v(0, 33)),       // bit 0 of lo and bit 1 of hi cleared
      (3L, (0 until 64).map(i => if (i % 2 == 0) 1.0f else -1.0f))))
    val m = graft.ext.BinaryQuant.withCodes(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val full = (1L << 32) - 1
    assert(m(1L) == (full, full))
    assert(m(2L) == (full - 1L, full - 2L))
    val alt = (0 until 32).filter(_ % 2 == 0).map(1L << _).sum
    assert(m(3L) == (alt, alt))
  }

  test("bqTopK ranks by Hamming distance with id tie-break") {
    // query 0 = all positive; candidates at Hamming 1, 2, 2, 64
    val e = vecs(Seq(
      (0L, v()), (10L, v(5)), (11L, v(1, 2)), (12L, v(3, 4)),
      (13L, (0 until 64).map(_ => -1.0f))))
    val got = graft.ext.BinaryQuant
      .bqTopK(e.filter(col("vec_id") === 0), e, k = 3)
      .collect().sortBy(_.getInt(1))
      .map(r => (r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == Seq((1, 10L, 1), (2, 11L, 2), (3, 12L, 2)))
  }

  test("withBandTable slices each code into eight byte bands") {
    val e = vecs(Seq((1L, v()), (2L, v(0, 33))))
    val codes = graft.ext.BinaryQuant.withCodes(e)
      .select(col("vec_id"), col("c_lo"), col("c_hi"))
    val bands = graft.ext.BinaryQuant.withBandTable(codes).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(bands.size == 16)
    (0 until 8).foreach(i => assert(bands((1L, i)) == 255L))
    assert(bands((2L, 0)) == 254L)      // bit 0 cleared in lo byte 0
    assert(bands((2L, 4)) == 253L)      // bit 1 cleared in hi byte 0
    (Seq(1, 2, 3, 5, 6, 7)).foreach(i => assert(bands((2L, i)) == 255L))
  }

  test("bqBandedPairs finds pairs sharing a band, verified by exact Hamming") {
    // 1 and 2 differ in 2 bits but share six byte-bands → candidate, kept
    // at tau=18; 3 is all-negative: shares no band with 1/2 (bands 0 vs
    // 255) and would fail tau anyway — never surfaced
    val e = vecs(Seq((1L, v()), (2L, v(0, 33)),
      (3L, (0 until 64).map(_ => -1.0f))))
    val got = graft.ext.BinaryQuant.bqBandedPairs(e, tau = 18).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 2L, 2)))
  }

  test("bqBandedPairs candidate set is band-gated: near pair with no shared band is missed") {
    // craft two vectors at Hamming 8 with exactly one bit cleared per
    // byte band → NO shared band, so the banded miner must miss them
    // (that recall loss is what the recall face scores)
    val e = vecs(Seq((1L, v()), (2L, v(0, 8, 16, 24, 32, 40, 48, 56))))
    assert(graft.ext.BinaryQuant.bqBandedPairs(e, tau = 18).count() == 0)
    val rec = graft.ext.BinaryQuant.bqBandedRecall(e, tau = 18).collect()(0)
    assert((rec.getLong(0), rec.getLong(1), rec.getLong(2)) == (1L, 0L, 0L))
  }

  test("bqBandedAdaptive derives width from the corpus count and audits the frontier") {
    // n = 3 -> w = min(16, floor(log2 3) + 2) = 3 bits; vectors 1/2
    // share low bands (differ at bit 0 only in lane 0) -> candidate +
    // verified pair; vector 3 (all-negative) shares no band value
    val e = vecs(Seq((1L, v()), (2L, v(0)), (3L, (0 until 64).map(_ => -1.0f))))
    val r = graft.ext.BinaryQuant.bqBandedAdaptive(e, tau = 18).collect()(0)
    assert(r.getLong(0) == 3L)       // w_bits
    assert(r.getLong(1) >= 1L)       // candidates include (1,2)
    assert(r.getLong(2) == 1L)       // exactly the (1,2) pair verifies
  }

  test("bqBandedRecall is 1e6 ppm when banding catches every true pair") {
    val e = vecs(Seq((1L, v()), (2L, v(0)), (3L, v(1))))
    val rec = graft.ext.BinaryQuant.bqBandedRecall(e, tau = 18).collect()(0)
    assert((rec.getLong(0), rec.getLong(1), rec.getLong(2)) == (3L, 3L, 1000000L))
  }

  test("property: codes and Hamming ranking match an independent Scala reference") {
    // fixed-seed pseudo-random sign vectors; reference packs bits and
    // ranks by (hamming, id) with plain Scala integer ops
    val rnd = new scala.util.Random(42)
    val n = 40
    val vs = (0 until n).map { i =>
      i.toLong -> (0 until 64).map(_ => if (rnd.nextBoolean()) 1.0f else -1.0f)
    }
    def pack(v: Seq[Float], lo: Int): Long =
      (0 until 32).map(j => if (v(lo + j) >= 0) 1L << j else 0L).sum
    val ref = vs.map { case (id, v) => id -> (pack(v, 0), pack(v, 32)) }.toMap
    val e = vecs(vs)
    val got = graft.ext.BinaryQuant.withCodes(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == ref)
    // full ranking for queries 0..4 vs the reference
    val refTop = (0L until 5L).map { q =>
      val (ql, qh) = ref(q)
      q -> vs.filter(_._1 != q).map { case (c, _) =>
        val (cl, ch) = ref(c)
        (java.lang.Long.bitCount(ql ^ cl) + java.lang.Long.bitCount(qh ^ ch), c)
      }.sorted.take(5).map(_._2)
    }.toMap
    val gotTop = graft.ext.BinaryQuant
      .bqTopK(e.filter(col("vec_id") < 5), e, k = 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(gotTop == refTop)
  }

  test("bq rerank recovers the exact top-k when the shortlist covers it") {
    // 12 candidates, Hamming distance grows with id, so shortlist=6
    // provably contains the exact dot top-3 (dot decreases with Hamming
    // here: flipped dims move +1 → -1)
    val e = vecs(Seq((0L, v())) ++ (1 to 12).map(i => (i.toLong, v((0 until i): _*))))
    val q = e.filter(col("vec_id") === 0)
    val exact = graft.ext.SimSearch.bruteForceTopK(q, e, k = 3)
      .select(col("c_id")).collect().map(_.getLong(0)).toSet
    val rr = graft.ext.BinaryQuant.bqRerankTopK(q, e, shortlist = 6, k = 3)
      .select(col("c_id")).collect().map(_.getLong(0)).toSet
    assert(rr == exact)
    assert(exact == Set(1L, 2L, 3L))
  }
}
