package graft

import graft.io.TouchBinary
import graft.pipelines.TouchToParquet
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 touch connector: values must match the RDD-based
  * decoder bit-for-bit on every fixture version, column pruning must
  * reach the scan, and record-aligned splits must not change results.
  */
class TouchDataSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("v1/v2/v3 fixtures decode identically to the RDD path") {
    for (v <- 1 to 3) {
      val path = TouchToParquet.fixturePath(v)
      val v2 = spark.read.format("touchbin").load(path)
      val rdd = TouchBinary.readProjected(spark, path)
      assert(v2.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        rdd.schema.fields.map(f => (f.name, f.dataType)).toSeq, s"v$v schema")
      assert(rows(v2) == rows(rdd), s"v$v values")
    }
  }

  test("column pruning reaches the scan (2 of 22 fields decoded)") {
    val df = spark.read.format("touchbin").load(TouchToParquet.fixturePath(2))
      .select("source_node_id", "distance_soma")
    df.collect()
    val leaves = df.queryExecution.executedPlan.collectLeaves()
    assert(leaves.nonEmpty)
    assert(leaves.head.schema.fieldNames.toSeq ==
      Seq("source_node_id", "distance_soma"),
      s"scan must emit only the pruned columns: ${leaves.head.schema}")
  }

  test("record-aligned splits: many partitions, identical results") {
    val path = TouchToParquet.fixturePath(2)
    val df = spark.read.format("touchbin")
      .option("maxBytesPerPartition", (80 * 100).toString) // 100 records/split
      .load(path)
    assert(df.rdd.getNumPartitions > 5, s"${df.rdd.getNumPartitions} partitions")
    assert(rows(df) == rows(TouchBinary.readProjected(spark, path)))
  }

  private def copyFixture(version: Int, dir: java.nio.file.Path, suffix: Int): Unit = {
    val src = java.nio.file.Paths.get(TouchToParquet.fixturePath(version)).getParent
    java.nio.file.Files.copy(src.resolve("touchesData.0"), dir.resolve(s"touchesData.$suffix"))
    java.nio.file.Files.copy(src.resolve("touches.0"), dir.resolve(s"touches.$suffix"))
  }

  test("directory scan: 3 same-version files, sorted listing, splits straddling files") {
    val dir = java.nio.file.Paths.get(graft.io.TempDirs.create("touch_dir_ok"))
    Seq(2, 0, 1).foreach(copyFixture(2, dir, _)) // created out of name order
    val files = graft.sources.TouchDataSource.resolveDataFiles(dir.toString)
    assert(files.map(f => new java.io.File(f._1).getName) ==
      Seq("touchesData.0", "touchesData.1", "touchesData.2"),
      "directory listing must be name-sorted and data-files-only")
    // the three copies share one gid range, so a synapse_id projection
    // must be rejected (ids would collide across files)…
    val full = spark.read.format("touchbin")
      .option("maxBytesPerPartition", (80 * 100).toString) // 100 records/split
      .load(dir.toString)
    val e = intercept[Exception] { full.collect() }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("gid ranges overlap"), msgs)
    // …while a projection WITHOUT synapse_id scans them freely
    val noId = full.drop("synapse_id")
    assert(noId.rdd.getNumPartitions > 3 * 5,
      s"expected >5 splits per file across 3 files, got ${noId.rdd.getNumPartitions}")
    val single = rows(TouchBinary.readProjected(spark, TouchToParquet.fixturePath(2))
      .drop("synapse_id"))
    assert(rows(noId) == (single ++ single ++ single).sorted,
      "directory read must union every file's decode (multiset equality)")
  }

  test("directory scan rejects a schema-version mix (parquet2hdf5 agreement rule)") {
    val dir = java.nio.file.Paths.get(graft.io.TempDirs.create("touch_dir_mix"))
    copyFixture(2, dir, 0)
    copyFixture(3, dir, 1)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("touchbin").load(dir.toString)
    }
    assert(e.getMessage.contains("disagree on schema version"), e.getMessage)
  }

  /** Synthetic v1 file with `nGids` contiguous per-gid blocks of `per`
    * records each (gids 100, 101, …), plus a faithful companion index —
    * the multi-neuron shape the reference's `seek()` navigates, which
    * the single-gid fixtures can't exercise.
    */
  private def writeMultiGidFixture(nGids: Int, per: Int): String = {
    import java.nio.{ByteBuffer, ByteOrder}
    val dir = java.nio.file.Paths.get(graft.io.TempDirs.create("touch_gid_push"))
    val rec = 40 // v1 record size
    val data = ByteBuffer.allocate(nGids * per * rec).order(ByteOrder.LITTLE_ENDIAN)
    for (g <- 0 until nGids; k <- 0 until per) {
      data.putInt(100 + g).putInt(1).putInt(k)   // pre: gid, section, segment
      data.putInt(200 + g).putInt(2).putInt(k)   // post
      data.putInt(1).putFloat(1f).putFloat(0.5f).putFloat(0.5f)
    }
    java.nio.file.Files.write(dir.resolve("touchesData.0"), data.array())
    val idx = ByteBuffer.allocate(32 + nGids * 16).order(ByteOrder.LITTLE_ENDIAN)
    idx.putDouble(1.001).putLong(nGids)
    idx.put("1.0.0".getBytes("US-ASCII")); idx.position(32)
    for (g <- 0 until nGids)
      idx.putInt(100 + g).putInt(per).putLong(g.toLong * per * rec)
    java.nio.file.Files.write(dir.resolve("touches.0"), idx.array())
    dir.resolve("touchesData.0").toString
  }

  test("gid-range pushdown prunes splits via the index, results identical") {
    import org.apache.spark.sql.functions.col
    val path = writeMultiGidFixture(nGids = 6, per = 10)
    def read() = spark.read.format("touchbin")
      .option("maxBytesPerPartition", (40 * 10).toString) // 10 records/split
      .load(path)
    val full = read()
    assert(full.rdd.getNumPartitions == 6, "one split per gid block")
    // the predicate covers 2 of 6 gid blocks → 2 planned splits, the
    // Spark face of the reference's per-neuron seek (touch_reader.cpp:196-228)
    val pred = col("source_node_id") >= 102 && col("source_node_id") <= 103
    val pruned = read().filter(pred)
    assert(pruned.rdd.getNumPartitions == 2,
      s"index pruning must plan only matching record ranges, got ${pruned.rdd.getNumPartitions}")
    assert(pruned.queryExecution.executedPlan.toString.contains("PushedGidRange"),
      pruned.queryExecution.executedPlan.toString)
    // identical rows to the post-scan filter over the full scan —
    // including synapse_id, whose global row positions must stay
    // absolute under pruned split plans
    assert(rows(pruned) == rows(full.filter(pred)))
    val ids = pruned.select("synapse_id", "source_node_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    assert(ids == (for (g <- 102 to 103; k <- 0 until 10)
      yield ((g.toLong << 24) + k, g)).sorted,
      "synapse ids must keep absolute row positions under pruning")
    // a range outside every indexed gid plans ZERO splits
    assert(read().filter(col("source_node_id") > 1000).count() == 0)
    // equality and one-sided predicates prune too
    assert(read().filter(col("source_node_id") === 100).rdd.getNumPartitions == 1)
    assert(read().filter(col("source_node_id") > 103).rdd.getNumPartitions == 2)
    // UPPER-bound-only predicates (lo = Long.MinValue internally) must
    // not crash split planning (round-7 advice: the raw subtraction
    // wrapped) and must prune to the leading blocks
    val upper = read().filter(col("source_node_id") <= 101)
    assert(upper.rdd.getNumPartitions == 2, s"got ${upper.rdd.getNumPartitions}")
    assert(rows(upper) == rows(full.filter(col("source_node_id") <= 101)))
    assert(read().filter(col("source_node_id") < 101).rdd.getNumPartitions == 1)
  }

  test("multi-range pushdown: IN / OR plan one record range per gid interval") {
    import org.apache.spark.sql.functions.col
    val path = writeMultiGidFixture(nGids = 6, per = 10)
    def read() = spark.read.format("touchbin")
      .option("maxBytesPerPartition", (40 * 10).toString) // 10 records/split
      .load(path)
    val full = read()
    // scattered gids — first and last blocks — must plan 2 small
    // ranges, not the 6-block hull (the reference seeks per neuron,
    // touch_reader.cpp:196-228)
    val inPred = col("source_node_id").isin(100, 105)
    val pruned = read().filter(inPred)
    assert(pruned.rdd.getNumPartitions == 2,
      s"IN (first, last) must plan 2 ranges, got ${pruned.rdd.getNumPartitions}")
    assert(pruned.queryExecution.executedPlan.toString.contains("PushedGidRanges"),
      pruned.queryExecution.executedPlan.toString)
    assert(rows(pruned) == rows(full.filter(inPred)))
    // OR of two ranges prunes the gap between them
    val orPred = (col("source_node_id") === 100) || (col("source_node_id") >= 104)
    val orScan = read().filter(orPred)
    assert(orScan.rdd.getNumPartitions == 3, // 1 block + 2 blocks
      s"got ${orScan.rdd.getNumPartitions}")
    assert(rows(orScan) == rows(full.filter(orPred)))
    // ADJACENT gid values merge into one contiguous record range
    // (2 blocks of 10 records → 2 splits at 10 records/split, but ONE
    // merged range — no duplicate planning at the seam)
    val adj = read().filter(col("source_node_id").isin(102, 103))
    assert(adj.rdd.getNumPartitions == 2, s"got ${adj.rdd.getNumPartitions}")
    assert(rows(adj) == rows(full.filter(col("source_node_id").isin(102, 103))))
    // conjunction of an IN with a range intersects interval sets
    val both = read().filter(col("source_node_id").isin(100, 103, 105) &&
      col("source_node_id") >= 103)
    assert(both.rdd.getNumPartitions == 2, s"got ${both.rdd.getNumPartitions}")
    assert(rows(both) == rows(full.filter(
      col("source_node_id").isin(100, 103, 105) && col("source_node_id") >= 103)))
    // synapse ids keep absolute row positions under multi-range pruning
    val ids = pruned.select("synapse_id", "source_node_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    assert(ids == (for (g <- Seq(100, 105); k <- 0 until 10)
      yield ((g.toLong << 24) + k, g)).sorted)
  }

  test("metadata-only count and limit pushdown") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val path = writeMultiGidFixture(nGids = 6, per = 10)
    def read() = spark.read.format("touchbin")
      .option("maxBytesPerPartition", (40 * 10).toString) // 10 records/split
      .load(path)

    // ungrouped unfiltered count(*): answered from file lengths — the
    // plan carries the metadata-only count scan, one split per FILE
    // (not per 10-record chunk), and the value matches the full scan
    val cnt = read().agg(count(lit(1)).as("n"))
    assert(cnt.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      cnt.queryExecution.executedPlan.toString)
    assert(cnt.collect().head.getLong(0) == 60L)
    // count(col) of a non-nullable touch column pushes too
    val cntCol = read().agg(count(col("source_node_id")))
    assert(cntCol.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      cntCol.queryExecution.executedPlan.toString)
    assert(cntCol.collect().head.getLong(0) == 60L)
    // count DISTINCT must NOT push (not answerable from lengths)
    val cntDist = read().select(col("source_node_id")).distinct().count()
    assert(cntDist == 6L)
    // a FILTERED count takes the pruned-scan path (gid predicates stay
    // residuals, so Catalyst never offers the aggregate to the source)
    val filtered = read().filter(col("source_node_id") <= 101).agg(count(lit(1)))
    assert(!filtered.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      filtered.queryExecution.executedPlan.toString)
    assert(filtered.collect().head.getLong(0) == 20L)

    // limit pushdown: limit 15 plans only the covering splits and trims
    // the record total; rows come from the file head (gids 100-101)
    val lim = read().limit(15)
    assert(lim.queryExecution.executedPlan.toString.contains("PushedLimit: 15"),
      lim.queryExecution.executedPlan.toString)
    val got = lim.collect()
    assert(got.length == 15)
    assert(got.map(_.getAs[Int]("source_node_id")).forall(g => g == 100 || g == 101))
  }

  test("truncated data file fails loudly at split planning") {
    val dir = java.nio.file.Paths.get(graft.io.TempDirs.create("touch_dir_trunc"))
    copyFixture(2, dir, 0)
    val data = dir.resolve("touchesData.0")
    val ch = java.nio.channels.FileChannel.open(data,
      java.nio.file.StandardOpenOption.WRITE)
    try ch.truncate(java.nio.file.Files.size(data) - 7)
    finally ch.close()
    val df = spark.read.format("touchbin").load(data.toString)
    val e = intercept[Exception] { df.collect() }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("not a multiple"), msgs)
  }
}
