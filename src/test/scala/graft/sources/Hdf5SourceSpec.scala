package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural assertions on the SONATA HDF5 DataSource V2: column
  * pruning reaches the scan (only required columns in the read
  * schema), edge_id predicates become planned row ranges, limit and
  * metadata-only count push down, statistics reflect pruning, and the
  * unsigned widths zero-extend — all against the committed golden
  * fixture plus a sink-written container.
  */
class Hdf5SourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  private val golden = "src/test/resources/golden_sonata.h5"

  private def goldenDf = spark.read.format("sonatah5").load(golden)

  private def scanDescription(df: org.apache.spark.sql.DataFrame): String = {
    // under AQE the BatchScanExec may sit inside an AdaptiveSparkPlanExec
    // whose collectLeaves() stops at the adaptive node — search the
    // whole executed plan tree string instead
    val viaNode = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }.headOption
    viaNode.getOrElse(df.queryExecution.executedPlan.toString)
  }

  test("schema and full read of the golden fixture") {
    val df = goldenDf
    assert(df.columns.head == "edge_id")
    assert(df.columns.contains("source_node_id") && df.columns.contains("flags"))
    assert(!df.columns.contains("empty_marker"), "non-edge top-level dataset leaked in")
    assert(df.count() == 6)
    val rows = df.orderBy("edge_id").collect()
    assert(rows.map(_.getAs[Long]("source_node_id")).toSeq == Seq(0L, 0L, 1L, 1L, 2L, 2L))
    assert(rows.map(_.getAs[Double]("weight")).toSeq ==
      Seq(0.25, 1.25, 2.25, 3.25, 4.25, 5.25))
  }

  test("unsigned widths zero-extend to LongType through the V2 path") {
    val rows = goldenDf.orderBy("edge_id")
      .select("flags", "bucket", "crc").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 127L, 128L, 255L, 64L))
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 1L, 32767L, 32768L, 65535L, 42L))
    assert(rows.map(_.getLong(2)).toSeq ==
      Seq(0L, 1L, 2147483647L, 2147483648L, 4294967295L, 99L))
  }

  test("column pruning reaches the scan (read schema = required columns)") {
    val df = goldenDf.select("dist", "seg")
    val desc = scanDescription(df)
    assert(desc.contains("cols=[dist,seg]"), desc)
    assert(df.collect().length == 6)
  }

  test("edge_id range predicates prune planned rows; results stay exact") {
    val df = goldenDf.where(col("edge_id") >= 2L && col("edge_id") < 5L)
      .select("edge_id", "stamp")
    val desc = scanDescription(df)
    assert(desc.contains("PushedEdgeIdRanges: [2,4]"), desc)
    assert(df.orderBy("edge_id").collect().map(_.getLong(1)).toSeq ==
      Seq(3000L, 4000L, 5000L))
    // disjoint IN → two ranges, not the hull
    val in = goldenDf.where(col("edge_id").isin(0L, 5L)).select("edge_id")
    assert(scanDescription(in).contains("PushedEdgeIdRanges: [0,0]∪[5,5]"),
      scanDescription(in))
    assert(in.collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 5L))
  }

  test("limit pushes down; count(*) is metadata-only") {
    val lim = goldenDf.limit(3)
    assert(scanDescription(lim).contains("PushedLimit: 3"), scanDescription(lim))
    assert(lim.collect().length == 3)
    val cnt = goldenDf.groupBy().count()
    val desc = scanDescription(cnt)
    assert(desc.contains("metadata-only"), desc)
    assert(cnt.collect().head.getLong(0) == 6L)
  }

  test("statistics reflect pruning (pruned scan is broadcast-sized)") {
    val full = goldenDf
    val pruned = goldenDf.where(col("edge_id") < 2L).select("dist")
    def stats(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(stats(pruned) < stats(full),
      s"pruned ${stats(pruned)} should be < full ${stats(full)}")
  }

  test("V2 scan of a sink-written container matches the RDD read-back") {
    import graft.pipelines.SonataH5
    val out = graft.io.TempDirs.create("h5v2spec") + "/edges.h5"
    val edges = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .limit(3000)
      .select(col("l_orderkey").as("source_node_id"),
        col("l_suppkey").as("target_node_id"),
        col("l_linenumber").as("edge_type_id"),
        col("l_quantity").as("my_attribute"))
    val (_, done) = SonataH5.convert(spark, edges, "source_node_id",
      "target_node_id", out, "pop",
      tiebreak = Seq("edge_type_id", "my_attribute"))
    done()
    val viaV2 = spark.read.format("sonatah5").load(out)
      .select("edge_id", "source_node_id", "target_node_id",
        "edge_type_id", "my_attribute")
    val viaRdd = SonataH5.readEdges(spark, out, "pop")
      .select("edge_id", "source_node_id", "target_node_id",
        "edge_type_id", "my_attribute")
    assert(viaV2.exceptAll(viaRdd).isEmpty && viaRdd.exceptAll(viaV2).isEmpty)
  }

  test("column pruning skips bytes ON DISK: per-path byte meter vs planned width") {
    // the round-13 claim (Hdf5DataSource.scala pruning scaladoc) made
    // measurable: every SONATA column is its own contiguous region, so
    // a k-of-N projection must fetch EXACTLY planned_rows × Σ(width of
    // projected cols) data bytes — asserted against Hdf5Mini's
    // path-keyed readSlice meter, not inferred from the plan string
    import graft.pipelines.SonataH5
    import graft.io.Hdf5Mini
    val out = graft.io.TempDirs.create("h5bytes") + "/edges.h5"
    val edges = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .limit(3000)
      .select(col("l_orderkey").as("source_node_id"),
        col("l_suppkey").as("target_node_id"),
        col("l_linenumber").as("edge_type_id"),
        col("l_quantity").as("my_attribute"))
    val (_, done) = SonataH5.convert(spark, edges, "source_node_id",
      "target_node_id", out, "pop",
      tiebreak = Seq("edge_type_id", "my_attribute"))
    done()
    val layout = Hdf5DataSource.layout(out, Some("pop"))
    val n = layout.nRows
    def width(names: String*): Long =
      layout.cols.filter(c => names.contains(c.name)).map(_.dtype.size.toLong).sum
    def bytesOf(action: => Unit): Long = {
      val before = Hdf5Mini.dataBytesRead(out)
      action
      Hdf5Mini.dataBytesRead(out) - before
    }
    val df = spark.read.format("sonatah5").load(out)

    // metadata-only count(*): zero data bytes
    assert(bytesOf(assert(df.groupBy().count().collect().head.getLong(0) == n)) == 0L)
    // edge_id is synthesized from the row index: zero data bytes
    assert(bytesOf(assert(df.select("edge_id").collect().length == n)) == 0L)
    // 1-of-4 projection reads exactly that column's region
    val one = bytesOf(assert(df.select("my_attribute").collect().length == n))
    assert(one == n * width("my_attribute"), s"1-col scan read $one bytes")
    // full-width scan reads exactly the sum of all column regions
    val allCols = layout.cols.map(_.name)
    val full = bytesOf(assert(df.select(allCols.head, allCols.tail: _*)
      .collect().length == n))
    assert(full == n * width(allCols: _*), s"full scan read $full bytes")
    assert(one * 2 < full, "pruned scan must be well under the full width")
    // edge_id range + projection composes: planned_rows × pruned width
    val ranged = bytesOf(assert(df
      .where(col("edge_id") >= 1000L && col("edge_id") < 1500L)
      .select("source_node_id").collect().length == 500))
    assert(ranged == 500L * width("source_node_id"), s"ranged scan read $ranged bytes")
  }

  test("multi-population files demand an explicit population option") {
    val e = intercept[Exception] {
      spark.read.format("sonatah5").option("population", "nope").load(golden).count()
    }
    assert(e.getMessage.contains("no population nope"))
  }
}
