package graft

import graft.io.Hdf5Mini
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Foreign-feature tolerance of the HDF5 reader (round-13 verdict item
  * 2): a real SONATA container written by libhdf5 (the reference's own
  * output — src/circuit/sonata_file.cpp accepts whatever libhdf5
  * wrote) may use classic-format features our strict subset excludes.
  * The reader's contract is "fail loud, never guess" — these cases pin
  * that rejection against committed fixtures hand-authored from the
  * public HDF5 File Format Specification by `tools/h5forge.py` (the
  * h5check.py discipline in reverse: an independent spec reading in a
  * different language, sharing no code with Hdf5Mini).
  *
  *  - `foreign_chunked.h5`: a 1-D int32 dataset stored CHUNKED (layout
  *    message v3 class 2 + node-type-1 chunk B-tree + two raw chunks).
  *    Everything BEFORE the layout message is inside our subset —
  *    h5forge's groups/heap/SNOD pass tools/h5check.py — so the parse
  *    must reach and reject the layout class specifically, proving the
  *    guard sits exactly at the unsupported feature, not earlier.
  *  - `foreign_v2header.h5`: a root group in the VERSION 2 object
  *    header format ("OHDR" signature + lookup3 gateway checksum, spec
  *    IV.A.2) — what libhdf5 emits under H5F_LIBVER_LATEST.
  *
  * The SHA-256 pins keep the committed bytes stable: regenerating with
  * h5forge must reproduce them exactly, the golden_sonata.h5
  * convention.
  */
class ForeignHdf5FixtureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private val chunked = "src/test/resources/foreign_chunked.h5"
  private val v2header = "src/test/resources/foreign_v2header.h5"

  private def sha256(path: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
      .map("%02x".format(_)).mkString
  }

  test("committed foreign fixtures carry the forged bytes exactly") {
    assert(sha256(chunked) ==
      "9e1c4c6d8b0572784f620a860b2b2eb0bb5f9055086bfba00bf2b4cd72e07892")
    assert(sha256(v2header) ==
      "1b47d14760c8dd3eebe4d2f4a6aff44ea3ef57c546e1c36931f25a59998a87f9")
  }

  test("chunked-layout dataset is rejected loudly at the layout message") {
    val e = intercept[IllegalArgumentException] { Hdf5Mini.read(chunked) }
    assert(e.getMessage.contains("only contiguous layout"), e.getMessage)
  }

  test("chunked rejection happens AFTER the group walk (guard sits at the feature)") {
    // the superblock, root object header, B-tree, heap, and SNOD of the
    // forged file are all inside our subset — parse must get past them
    // and name the layout as the problem, not die earlier with a
    // structural error (bad signature / bad heap / bad SNOD)
    val e = intercept[IllegalArgumentException] { Hdf5Mini.read(chunked) }
    assert(!e.getMessage.contains("signature") && !e.getMessage.contains("heap") &&
      !e.getMessage.contains("SNOD"), e.getMessage)
  }

  test("version-2 object header is rejected loudly at the header version") {
    val e = intercept[IllegalArgumentException] { Hdf5Mini.read(v2header) }
    assert(e.getMessage.contains("not version 1"), e.getMessage)
  }

  test("the sonatah5 V2 source surfaces the same loud rejections at planning") {
    val ec = intercept[Exception] {
      spark.read.format("sonatah5").load(chunked).count()
    }
    assert(ec.getMessage.contains("only contiguous layout"), ec.getMessage)
    val ev = intercept[Exception] {
      spark.read.format("sonatah5").load(v2header).count()
    }
    assert(ev.getMessage.contains("not version 1"), ev.getMessage)
  }
}
