package graft

import graft.ext.Multimodal
import graft.io.MediaCodec
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the round-11 media-query kernels beyond the DuckDB
  * gate: the aHash band math on hand-built images, the near-dup
  * structure of the synthetic corpus (same-class pairs at hamming 0,
  * perturbed pairs small, cross-class pairs unbanded), and the silence
  * RLE against a hand-enumerated run list.
  */
class MultimodalCodecQuerySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  test("ahashBands: bits are gray>mean of the 8x8 thumbnail, packed 16 per band") {
    // 8x8 image, no resampling: gray ramp 0..63 per cell (all channels equal)
    val px = new Array[Byte](8 * 8 * 3)
    for (c <- 0 until 64; ch <- 0 until 3) px(c * 3 + ch) = c.toByte
    val bands = Multimodal.ahashBands(MediaCodec.ImagePixels(8, 8, 3, px))
    // grays = 0..63, mean = 31 (integer), bits set for gray > 31 = cells 32..63
    assert(bands(0) == 0 && bands(1) == 0)
    assert(bands(2) == 0xFFFF && bands(3) == 0xFFFF)
  }

  test("ahash pairs: identical images collide at hamming 0; the corpus has real families") {
    // sf0.01: with the density-stable construction (nFam floor 240),
    // the 500-doc corpus puts ~2 docs per family — the 50-doc sf0.001
    // corpus would be all singletons and verify nothing
    val df = Multimodal.imageAhashPairs(spark, "/root/testdata/sf0.01")
    val rows = df.collect()
    assert(rows.nonEmpty, "synthetic corpus must contain near-dup pairs")
    assert(rows.exists(_.getInt(2) == 0), "exact-class pairs must land at hamming 0")
    assert(rows.forall(r => r.getInt(2) >= 0 && r.getInt(2) <= 8))
    spark.catalog.clearCache()
  }

  test("silence runs: decoded runs match the generating block structure") {
    val runs = Multimodal.wavSilenceRuns(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(runs.nonEmpty)
    // every run starts on a silent block boundary (8m, m % 3 == 0) and
    // spans at most one 8-sample block
    runs.foreach { case (_, s, e) =>
      assert(s % 8 == 0 && (s / 8) % 3 == 0, s"run start $s")
      assert(e > s && e - s <= 8, s"run [$s,$e)")
    }
    spark.catalog.clearCache()
  }
}
