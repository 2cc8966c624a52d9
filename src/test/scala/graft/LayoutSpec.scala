package graft

import graft.ext.{Sampling, TextAnalysis}
import graft.ops.Layout
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))

  test("compaction: file count follows measured input bytes, content survives") {
    val base = graft.io.TempDirs.create("layout-compact")
    val docs = Tables.documents(spark, sf)
    docs.repartition(16).write.mode("overwrite").parquet(s"$base/shards")
    assert(parquetFiles(s"$base/shards").size == 16)

    val sharded = spark.read.parquet(s"$base/shards")
    val totalBytes = parquetFiles(s"$base/shards").map(_.length()).sum
    val target = 64L * 1024
    val out = Layout.compactTo(sharded, Seq("doc_id"), target, s"$base/compacted")

    val expectFiles = ((totalBytes + target - 1) / target).toInt
    assert(parquetFiles(s"$base/compacted").size == expectFiles,
      s"expected $expectFiles files for $totalBytes bytes at target $target")
    // content identity through the rewrite
    assert(out.count() == docs.count())
    assert(out.select("doc_id").except(docs.select("doc_id")).isEmpty)
    assert(docs.select("doc_id").except(out.select("doc_id")).isEmpty)
  }

  test("compaction to a huge target collapses to one file") {
    val base = graft.io.TempDirs.create("layout-compact1")
    Tables.documents(spark, sf).repartition(8)
      .write.mode("overwrite").parquet(s"$base/shards")
    Layout.compactTo(spark.read.parquet(s"$base/shards"),
      Seq("doc_id"), 1L << 30, s"$base/one")
    assert(parquetFiles(s"$base/one").size == 1)
  }

  test("bucketed join: no shuffle exchange on either side, result matches plain join") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the co-location is what elides the shuffle,
      // not a small-side broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Layout.bucketedJoin(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)

      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(df.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned layout: the slice scan prunes partitions at listing time") {
    val df = SparkEntry.queries("partitioned_scan_prune")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the lang predicate must be a PARTITION filter (directory pruning),
    // not a data filter evaluated per row
    val partFilter = """PartitionFilters: \[[^\]]*lang[^\]]*en[^\]]*\]""".r
    assert(partFilter.findFirstIn(plan).isDefined, plan)
    val dataFilter = """DataFilters: \[[^\]]*lang[^\]]*\]""".r
    assert(dataFilter.findFirstIn(plan).isEmpty, plan)
  }

  test("pii redaction scrubs planted emails and phone numbers, leaves clean text alone") {
    import spark.implicits._
    val rows = Seq(
      (1L, "contact me at jane.doe+spam@example.co.uk for details"),
      (2L, "call +41 (0)44 123-4567 or 0800 555 0199 now"),
      (3L, "no pii here, just words"),
      (4L, "two mails a@b.io and c.d@e-f.org on one line")
    ).toDF("doc_id", "text")
    val got = rows.select(col("doc_id"),
        TextAnalysis.redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "contact me at [EMAIL] for details")
    assert(got(2L) == "call [PHONE] or [PHONE] now")
    assert(got(3L) == "no pii here, just words")
    assert(got(4L) == "two mails [EMAIL] and [EMAIL] on one line")
  }

  test("normalization after redaction case-folds, strips punctuation, collapses runs") {
    import spark.implicits._
    val rows = Seq((1L, "  Hello,   WORLD!! mail: x@y.zz \t-- ok  ")).toDF("doc_id", "text")
    val got = rows.select(
        TextAnalysis.normalize(TextAnalysis.redactPii(col("text"))).as("n"))
      .head.getString(0)
    assert(got == "hello world mail [email] ok")
  }

  test("weighted sample: zero weight drops all, full weight keeps all, sample is stable") {
    val docs = Tables.documents(spark, sf)
    val none = Sampling.weightedHashSample(docs, col("doc_id"), lit(0L), 1000L)
    assert(none.count() == 0)
    val all = Sampling.weightedHashSample(docs, col("doc_id"), lit(1000L), 1000L)
    assert(all.count() == docs.count())
    val a = Sampling.weightedHashSample(docs, col("doc_id"), col("n_chars"), 1000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedHashSample(docs, col("doc_id"), col("n_chars"), 1000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "hash-decided sample must be identical across runs")
    assert(a.nonEmpty && a.size < docs.count(),
      s"length-weighted sample should be a strict non-empty subset, got ${a.size}")
  }

  test("weighted sample guards: null/negative weights raise, oversized scale rejected") {
    import spark.implicits._
    val rows = Seq((1L, Some(10L)), (2L, None), (3L, Some(5L)))
      .toDF("doc_id", "w")
    // a null weight must TRIP, not silently keep the row with p=1
    // (least() ignores nulls — the hazard the guard exists for)
    val e = intercept[Exception] {
      Sampling.weightedHashSample(rows, col("doc_id"), col("w"), 100L).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("null/negative weight"), msgs)
    val neg = intercept[Exception] {
      Sampling.weightedHashSample(rows.filter(col("doc_id") =!= 2),
        col("doc_id"), col("w") - 100L, 100L).collect()
    }
    val negMsgs = Iterator.iterate(neg: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(negMsgs.contains("null/negative weight"), negMsgs)
    // scale past 2^46 would overflow the integer cross-multiply
    intercept[IllegalArgumentException] {
      Sampling.weightedHashSample(rows, col("doc_id"), col("w"), Long.MaxValue / 2)
    }
    // in-range rows still sample normally alongside the guards
    val ok = Sampling.weightedHashSample(
      rows.filter(col("w").isNotNull), col("doc_id"), col("w"), 10L)
    assert(ok.count() >= 0)
  }
}
