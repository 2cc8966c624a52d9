package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The custom codegen expressions must agree with independent
  * formulations on arbitrary inputs — WordShingles and SimHash64 vs the
  * interpreted HOF chains they replaced, QuantizedDot vs BigInt math,
  * SignLshBuckets determinism/shape. Random strings exercise whitespace
  * runs, empties, unicode, and sub-n token counts.
  */
class CodegenExprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  /** Sample `g` across fixed seeds (deterministic property loop, same
    * pattern as PropertySpec). */
  private def forSamples[A](g: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private val textGen: Gen[String] = Gen.oneOf(
    Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)), Gen.const(" "), Gen.const("\t"),
      Gen.const("\n"), Gen.const("é"), Gen.const("。")))
      .map(_.mkString),
    Gen.const(""), Gen.const("   "), Gen.const("a b"), Gen.const("a b c"),
    Gen.const(" a  b\tc \n d "))

  test("WordShingles equals the HOF formulation on arbitrary text") {
    import spark.implicits._
    forSamples(Gen.listOfN(40, textGen)) { texts =>
      {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        val toks = filter(split(col("text"), "\\s+"), t => t =!= "")
        val hof = array_distinct(
          when(size(toks) >= 3,
            transform(sequence(lit(1), size(toks) - 2),
              i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
                element_at(toks, i + 2))))
            .otherwise(array().cast("array<string>")))
        val rows = df.select(col("id"),
            graft.functions.WordShingles.wordShingles(col("text"), 3).as("fast"),
            hof.as("ref"))
          .collect()
        rows.foreach { r =>
          assert(r.getSeq[String](1) == r.getSeq[String](2),
            s"id=${r.getLong(0)} differs")
        }
      }
    }
  }

  test("SimHash64 equals the HOF vote formulation on arbitrary text") {
    import spark.implicits._
    forSamples(Gen.listOfN(20, textGen), n = 4) { texts =>
      {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        val hs = transform(filter(split(col("text"), "\\s+"), t => t =!= ""),
          t => xxhash64(t))
        val bits = (0 until 64).map { b =>
          val vote = aggregate(hs, lit(0L),
            (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
          when(vote > 0, lit(1L << b)).otherwise(0L)
        }
        val rows = df.select(col("id"),
            graft.functions.SimHash64.simhash64(col("text")).as("fast"),
            bits.reduce(_ bitwiseOR _).as("ref"))
          .collect()
        rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}"))
      }
    }
  }

  test("QuantizedDot equals BigInt arithmetic on arbitrary vectors") {
    import spark.implicits._
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-2000000L, 2000000L))
    forSamples(Gen.listOfN(10, Gen.zip(vecGen, vecGen))) { pairs =>
      {
        val df = pairs.zipWithIndex
          .map { case ((a, b), i) => (i.toLong, a, b) }.toDF("id", "a", "b")
        val rows = df.select(col("id"),
            graft.functions.QuantizedDot.quantizedDot(col("a"), col("b")).as("dot"))
          .collect()
        rows.foreach { r =>
          val (a, b) = pairs(r.getLong(0).toInt)
          val expect = a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
          assert(BigInt(r.getLong(1)) == expect, s"id=${r.getLong(0)}")
        }
      }
    }
  }

  test("HilbertKey codegen equals the scalar state machine on arbitrary points") {
    import spark.implicits._
    forSamples(Gen.listOfN(40,
        Gen.zip(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L)))) { pts =>
      {
        val rows = pts.toDF("x", "y")
          .select(col("x"), col("y"),
            graft.functions.HilbertKey.hilbertKey(col("x"), col("y")).as("h"))
          .collect()
        rows.foreach { r =>
          assert(r.getLong(2) == graft.functions.HilbertKey.index(r.getLong(0), r.getLong(1)),
            s"(${r.getLong(0)}, ${r.getLong(1)})")
        }
      }
    }
  }

  test("PosWeightChecksum equals the HOF formulation on arbitrary text") {
    import spark.implicits._
    forSamples(Gen.listOfN(40, textGen)) { texts =>
      {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        val hof = expr("aggregate(transform(sequence(1, length(text)), " +
          "i -> cast(ascii(substr(text, i, 1)) * i AS BIGINT)), bigint(0), (a, x) -> a + x)") %
          1000000007L
        val rows = df.select(col("id"), hof.as("h"),
            graft.functions.PosWeightChecksum.posweightChecksum(col("text")).as("c"))
          .collect()
        rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}"))
      }
    }
  }

  test("bloom filter: no false negatives, bounded false positives, merge-invariant") {
    import spark.implicits._
    import graft.functions.BloomFilterAgg.{bloomFilter, bloomMightContain}
    val present = (0L until 1000L).map(i => i * 7919L + 13L)
    val absent = (0L until 1000L).map(i => i * 7919L + 14L) // disjoint by construction
    // small filter (4096 bits, ~17% theoretical FPR at n=1000, k=5) so
    // the FPR assertion actually exercises collision behavior
    val bytes = present.toDF("k")
      .agg(bloomFilter(col("k"), 4096, 5)).head().getAs[Array[Byte]](0)
    assert(bytes.length == 4096 / 8)
    // no false negatives — every inserted key probes true, and the
    // codegen path agrees with the interpreted expression eval
    val probed = present.toDF("k")
      .select(col("k"), bloomMightContain(col("k"), lit(bytes), 5).as("hit"))
      .collect()
    probed.foreach { r =>
      assert(r.getBoolean(1), s"false negative for key ${r.getLong(0)}")
      val interp = graft.functions.BloomMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(r.getLong(0)),
        org.apache.spark.sql.catalyst.expressions.Literal(bytes), 5)
        .eval(null).asInstanceOf[Boolean]
      assert(interp, s"interpreted eval disagrees for key ${r.getLong(0)}")
    }
    // bounded false positives (deterministic hashes → a fixed measured rate)
    val fp = absent.toDF("k")
      .filter(bloomMightContain(col("k"), lit(bytes), 5)).count()
    assert(fp < 300, s"FPR ${fp / 1000.0} far above the ~0.17 theoretical rate")
    // OR-merge is partitioning-invariant: 1 vs 13 partitions, same bytes
    val b13 = present.toDF("k").repartition(13)
      .agg(bloomFilter(col("k"), 4096, 5)).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(bytes, b13), "merge must be partitioning-invariant")
  }

  test("SignLshBuckets: deterministic, band-prefixed, stable across sessions") {
    import spark.implicits._
    val df = Seq((1L, Seq(1000L, -500L, 250L, 0L)), (2L, Seq(-1L, -2L, -3L, -4L)))
      .toDF("id", "qv")
    val b1 = df.select(graft.functions.SignLshBuckets.signLshBuckets(col("qv"), 4, 8))
      .collect().map(_.getSeq[Long](0))
    val b2 = df.select(graft.functions.SignLshBuckets.signLshBuckets(col("qv"), 4, 8))
      .collect().map(_.getSeq[Long](0))
    assert(b1.map(_.toSeq).toSeq == b2.map(_.toSeq).toSeq, "must be deterministic")
    b1.foreach { buckets =>
      assert(buckets.size == 8)
      buckets.zipWithIndex.foreach { case (v, band) =>
        assert((v >> 4) == band, s"band prefix must partition the id space: $v in band $band")
        assert((v & 0xf) >= 0)
      }
    }
  }
}
