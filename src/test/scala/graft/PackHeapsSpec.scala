package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Wave-E faces: length-sorted shelf packing and the Heaps-exponent
  * integer least-squares fit.
  */
class PackHeapsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def mlog2(x: Long): Long = {
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val p = 1L << (bits - 1)
    (bits - 1) * 1000L + (x - p) * 1000L / p
  }

  test("pack_fill_sorted conserves mass and yields contiguous shards") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val corpusTokens = docs
      .select(size(graft.ext.TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    val nDocs = docs.count()
    val shards = SparkEntry.queries("pack_fill_sorted")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(shards.map(_._2).sum == nDocs, "every document lands in a shard")
    assert(shards.map(_._3).sum == corpusTokens, "token mass is conserved")
    val ids = shards.map(_._1).sorted
    assert(ids.toSeq == (0L until ids.length).toSeq, "shard ids are contiguous from 0")
  }

  test("sorted fills deviate from budget by at most one document") {
    // a shard's fill differs from the budget only through the docs
    // straddling its two boundaries, each bounded by the longest
    // document — for EVERY shard order. With start-offset assignment
    // that is |fill − 1e6| ≤ maxdoc/2000 in ppm; assert it for the
    // sorted face (and that shard ids match the shuffled baseline's
    // count, since both pack the same token mass)
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val maxDoc = docs
      .select(size(graft.ext.TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    val tolPpm = maxDoc * 1000000L / 2000L
    val sorted = SparkEntry.queries("pack_fill_sorted")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    val maxId = sorted.map(_._1).max
    sorted.filter(_._1 != maxId).foreach { case (id, fill) =>
      assert(math.abs(fill - 1000000L) <= tolPpm,
        s"shard $id fill $fill drifts beyond one max-doc from budget")
    }
    val baseShards = SparkEntry.queries("corpus_pack_shards")(spark, sf)
      .select(col("shard_id")).distinct().count()
    assert(sorted.length.toLong == baseShards,
      "same token mass must cut the same number of start-offset shards")
  }

  test("heapsExponent equals the reference integer least-squares fit") {
    val pts = graft.ext.LmStats.vocabGrowthHeaps(Tables.documents(spark, sf))
      .collect().map(r => (r.getLong(0), mlog2(r.getLong(2))))
    val n = pts.length.toLong
    val sx = pts.map(_._1).sum
    val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / math.max(n * sxx - sx * sx, 1L)
    val intercept = (sy - slope * sx) / n
    val row = graft.ext.LmStats.heapsExponent(Tables.documents(spark, sf))
      .collect()(0)
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == slope)
    assert(row.getLong(2) == intercept)
    // the sublinearity claim itself: the measured exponent is strictly
    // between 0 (no growth) and 1000 (linear vocabulary growth)
    assert(slope > 0 && slope < 1000, s"Heaps exponent out of range: $slope")
  }
}
