package graft

import org.apache.spark.sql.{GraftSqlShim, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** The engine's `SparkSessionExtensions` entry point — the formal
  * registration rung of the extension ladder. Activate with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or imperatively via `GraftExtensions.register(spark)` on a live
  * session): injects the TopKPerKey planner strategy and registers the
  * custom codegen expressions + the HLL aggregate as SQL-callable
  * functions, so `spark.sql("SELECT simhash64(text) ...")` works with
  * no Scala imports — the full surface a SQL-only user needs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // rewrite the row_number-filter idiom into the TopKPerKey plan
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    // auto-bin interval-overlap theta joins (opt-in via binWidth conf)
    ext.injectOptimizerRule(_ => graft.plans.IntervalJoinRewrite)
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  /** (name, info, builder) for every SQL-registrable custom function. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("quantized_dot",
      info("quantized_dot", "quantized_dot(a, b) - int64 dot product of two array<bigint>"),
      (args: Seq[Expression]) => graft.functions.QuantizedDot(args(0), args(1))),
    ("word_shingles",
      info("word_shingles", "word_shingles(text, n) - distinct word n-grams"),
      (args: Seq[Expression]) => graft.functions.WordShingles(
        args(0), if (args.length > 1) intArg(args(1), "n") else 3)),
    ("simhash64",
      info("simhash64", "simhash64(text) - 64-bit SimHash fingerprint"),
      (args: Seq[Expression]) => graft.functions.SimHash64(args(0))),
    ("hilbert_key",
      info("hilbert_key", "hilbert_key(x, y) - Hilbert curve index on the 65536x65536 grid"),
      (args: Seq[Expression]) => graft.functions.HilbertKey(args(0), args(1))),
    ("sign_lsh_buckets",
      info("sign_lsh_buckets", "sign_lsh_buckets(qvec, rows, bands) - banded hyperplane LSH bucket ids"),
      (args: Seq[Expression]) => graft.functions.SignLshBuckets(
        args(0), intArg(args(1), "rows"), intArg(args(2), "bands"))),
    ("hll_distinct",
      info("hll_distinct", "hll_distinct(col[, p]) - HyperLogLog distinct-count sketch"),
      (args: Seq[Expression]) => graft.functions.HllSketchAgg(
        args(0), if (args.length > 1) intArg(args(1), "p") else 12)),
    ("posweight_checksum",
      info("posweight_checksum", "posweight_checksum(text) - order-sensitive sum(codepoint*pos) mod p checksum"),
      (args: Seq[Expression]) => graft.functions.PosWeightChecksum(args(0))),
    ("kmv_bottomk",
      info("kmv_bottomk", "kmv_bottomk(col[, k]) - k-minimum-values sketch: k smallest 60-bit md5 hashes (sample + distinct estimator)"),
      (args: Seq[Expression]) => graft.functions.KmvBottomKAgg(
        args(0), if (args.length > 1) intArg(args(1), "k") else 64)),
    ("misra_gries",
      info("misra_gries", "misra_gries(col[, k]) - frequent-items (heavy hitters) sketch"),
      (args: Seq[Expression]) => graft.functions.MisraGriesAgg(
        args(0), if (args.length > 1) intArg(args(1), "k") else 16)),
    ("hll_sketch",
      info("hll_sketch", "hll_sketch(col[, p]) - HLL register bytes for sketch tables (roll up with hll_merge)"),
      (args: Seq[Expression]) => graft.functions.HllSketchBytesAgg(
        args(0), if (args.length > 1) intArg(args(1), "p") else 12)),
    ("hll_merge",
      info("hll_merge", "hll_merge(sketch) - roll up hll_sketch register bytes to a distinct estimate"),
      (args: Seq[Expression]) => graft.functions.HllMergeAgg(args(0))),
    ("count_min",
      info("count_min", "count_min(col[, depth[, width]]) - count-min sketch (flattened depth x width cells)"),
      (args: Seq[Expression]) => graft.functions.CountMinAgg(args(0),
        if (args.length > 1) intArg(args(1), "depth") else 4,
        if (args.length > 2) intArg(args(2), "width") else 256)),
    ("bloom_filter",
      info("bloom_filter", "bloom_filter(key[, numBits[, numHashes]]) - bloom filter over a long key column"),
      (args: Seq[Expression]) => graft.functions.BloomFilterAgg(args(0),
        if (args.length > 1) intArg(args(1), "numBits") else 1 << 20,
        if (args.length > 2) intArg(args(2), "numHashes") else 5)),
    ("bloom_might_contain",
      info("bloom_might_contain", "bloom_might_contain(key, filter[, numHashes]) - probe a serialized bloom filter"),
      (args: Seq[Expression]) => graft.functions.BloomMightContain(args(0), args(1),
        if (args.length > 2) intArg(args(2), "numHashes") else 5)),
    ("topk_pairs",
      info("topk_pairs", "topk_pairs(ord, payload[, k]) - exact bounded-heap top-k (ord desc, payload asc) per group"),
      (args: Seq[Expression]) => graft.functions.TopKAgg(args(0), args(1),
        if (args.length > 2) intArg(args(2), "k") else 10)))

  /** Imperative registration on a live session (extensions configured at
    * build time are not applicable retroactively).
    */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKStrategy
    if (!spark.experimental.extraOptimizations.contains(graft.plans.TopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.TopKRewrite
    if (!spark.experimental.extraOptimizations.contains(graft.plans.IntervalJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.IntervalJoinRewrite
    functions.foreach { case (name, i, builder) =>
      GraftSqlShim.registerFunction(spark, FunctionIdentifier(name), i, builder)
    }
  }
}
