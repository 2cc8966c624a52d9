package graft

import graft.io.Hdf5Mini
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Foreign-feature tolerance of the HDF5 reader (round-13 verdict item
  * 2, then the round-14 subset widening): a real SONATA container
  * written by libhdf5 (the reference's own output —
  * src/circuit/sonata_file.cpp accepts whatever libhdf5 wrote) may use
  * classic-format features the sink never emits. Fixtures are
  * hand-authored from the public HDF5 File Format Specification by
  * `tools/h5forge.py` (the h5check.py discipline in reverse: an
  * independent spec reading in a different language, sharing no code
  * with Hdf5Mini) and committed with SHA-256 pins so the bytes cannot
  * drift; they validate structurally up to the foreign feature
  * (h5forge's groups/heap/SNOD pass tools/h5check.py).
  *
  *  - `foreign_chunked.h5` / `foreign_chunked_edge.h5`: 1-D int32
  *    datasets stored CHUNKED (layout message v3 class 2 + node-type-1
  *    chunk B-tree + whole-size raw chunks; the edge variant's last
  *    chunk overhangs the dataspace extent, as libhdf5 always allocates
  *    full chunks). Round 14 WIDENED the reader subset: Hdf5Mini.read
  *    walks the chunk B-tree and reassembles — but the PLANNED paths
  *    (the sonatah5 V2 source, the distributed slice readers), whose
  *    positional model needs one contiguous region per column, still
  *    reject chunked columns BY NAME.
  *  - `foreign_v2header.h5`: a root group in the VERSION 2 object
  *    header format ("OHDR" + lookup3 gateway checksum, spec IV.A.2) —
  *    what libhdf5 emits under H5F_LIBVER_LATEST; rejected loudly.
  */
class ForeignHdf5FixtureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private val chunked = "src/test/resources/foreign_chunked.h5"
  private val chunkedEdge = "src/test/resources/foreign_chunked_edge.h5"
  private val chunkedEdges = "src/test/resources/foreign_chunked_edges.h5"
  private val v2header = "src/test/resources/foreign_v2header.h5"

  private def sha256(path: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
      .map("%02x".format(_)).mkString
  }

  test("committed foreign fixtures carry the forged bytes exactly") {
    assert(sha256(chunked) ==
      "9e1c4c6d8b0572784f620a860b2b2eb0bb5f9055086bfba00bf2b4cd72e07892")
    assert(sha256(chunkedEdge) ==
      "b0375df74db5d7434596b0094b58170241a8a4c76569023746d37e7a552abc40")
    assert(sha256(chunkedEdges) ==
      "f9256052c6ef860930215ec8377bad474e86167782a6cbad52c9ebfc9611c3dc")
    assert(sha256(v2header) ==
      "1b47d14760c8dd3eebe4d2f4a6aff44ea3ef57c546e1c36931f25a59998a87f9")
  }

  test("1-D chunked dataset reads through the chunk B-tree") {
    val f = Hdf5Mini.read(chunked)
    val ds = f.datasets("/data")
    assert(ds.chunked && ds.dims == Seq(10L))
    assert(f.longs("/data").toSeq == (0L until 10L))
  }

  test("edge chunk: only the in-extent prefix of the last chunk is read") {
    // 7 elements in chunks of 5 — the second chunk is stored full-size
    // with fill garbage (-1) past the extent, which must NOT leak
    val f = Hdf5Mini.read(chunkedEdge)
    assert(f.datasets("/data").dims == Seq(7L))
    assert(f.longs("/data").toSeq == (0L until 7L))
  }

  test("level-1 chunk B-tree: the recursive descent reassembles across leaves") {
    // 24 values in 8 chunks of 3, split 4+4 across two level-0 leaves
    // under one level-1 internal node — the flat fixtures never leave
    // level 0, so this is the only coverage of walkChunkBtree's
    // recursion (spec III.A.1: internal node children are tree nodes)
    val deep = "src/test/resources/foreign_chunked_deep.h5"
    assert(sha256(deep) ==
      "6b31ca9be3f54464ee445db9136409538f7859aaf52556cf572147244c78812c")
    val f = Hdf5Mini.read(deep)
    assert(f.datasets("/data").chunked && f.datasets("/data").dims == Seq(24L))
    assert(f.longs("/data").toSeq == (0L until 24L))
  }

  test("readMeta registers a chunked dataset but defers its data") {
    val f = Hdf5Mini.readMeta(chunked)
    assert(f.datasets("/data").chunked)
    val e = intercept[RuntimeException] { f.longs("/data") }
    assert(e.getMessage.contains("not materialized"), e.getMessage)
  }

  test("the planned V2 source rejects a chunked edge column by name") {
    // the nested fixture carries a real /edges/pop/source_node_id tree,
    // so this exercises the ACTUAL discovery-path guard, not a re-stated
    // require: planning must name the column and the contiguous subset
    val e = intercept[Exception] {
      spark.read.format("sonatah5").load(chunkedEdges).count()
    }
    assert(e.getMessage.contains("chunked dataset") &&
      e.getMessage.contains("source_node_id"), e.getMessage)
    // ...while the in-memory reader handles the same column fine
    assert(Hdf5Mini.read(chunkedEdges)
      .longs("/edges/pop/source_node_id").toSeq == (0L until 12L))
  }

  test("the RDD edge reader rejects chunked datasets by name") {
    val e = intercept[Exception] {
      graft.pipelines.SonataH5.readEdges(spark, chunkedEdges, "pop").count()
    }
    assert(e.getMessage.contains("chunked dataset"), e.getMessage)
  }

  test("version-2 object header is rejected loudly at the header version") {
    val e = intercept[IllegalArgumentException] { Hdf5Mini.read(v2header) }
    assert(e.getMessage.contains("not version 1"), e.getMessage)
  }

  test("the sonatah5 V2 source surfaces the v2-header rejection at planning") {
    val ev = intercept[Exception] {
      spark.read.format("sonatah5").load(v2header).count()
    }
    assert(ev.getMessage.contains("not version 1"), ev.getMessage)
  }
}
