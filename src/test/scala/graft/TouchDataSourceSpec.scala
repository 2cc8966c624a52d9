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
