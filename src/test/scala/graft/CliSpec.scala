package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import graft.cli.Touch2Parquet
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Multi-input touch2parquet: schema agreement, gid-range disjointness,
  * and the provenance stamps of the single-input path. Uses synthetic
  * v1 pairs so gid ranges can be controlled (every shipped fixture
  * shares its gid range with itself).
  */
class CliSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  /** One v1 index+data pair with `n` records for a single `gid`. */
  private def v1Pair(gid: Int, n: Int): String = {
    val dir = java.nio.file.Paths.get(graft.io.TempDirs.create(s"cli_v1_$gid"))
    val idx = ByteBuffer.allocate(48).order(ByteOrder.LITTLE_ENDIAN)
    idx.putDouble(1.001).putLong(1)
    idx.put("1.0.0".getBytes("US-ASCII")); idx.position(32)
    idx.putInt(gid).putInt(n).putLong(0L)
    Files.write(dir.resolve("touches.0"), idx.array())
    val rec = ByteBuffer.allocate(40 * n).order(ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until n) {
      rec.putInt(gid).putInt(1).putInt(i)   // pre: gid, section, segment
      rec.putInt(gid + 1).putInt(2).putInt(i) // post
      rec.putInt(1).putFloat(1.5f).putFloat(0.25f).putFloat(0.75f)
    }
    Files.write(dir.resolve("touchesData.0"), rec.array())
    dir.resolve("touchesData.0").toString
  }

  test("convertMany unions disjoint-gid inputs with unique synapse ids and stamps") {
    val out = graft.io.TempDirs.create("cli_union")
    Touch2Parquet.convertMany(spark, Seq(v1Pair(7, 2), v1Pair(100, 3)), out)
    val rows = spark.read.parquet(out).select("synapse_id").collect().map(_.getLong(0))
    assert(rows.length == 5)
    assert(rows.distinct.length == 5, "synapse ids must be unique across the union")
    assert(rows.count(_ >> 24 == 7L) == 2)
    assert(rows.count(_ >> 24 == 100L) == 3)
    val kv = graft.io.ParquetMeta.readMeta(spark, out)
    assert(kv.contains("touchdetector_version") &&
      kv.getString("touchdetector_version") == "1.0.0",
      "multi-input path must stamp touchdetector_version like the single-input path")
    assert(kv.contains("touch2parquet_version"))
  }

  test("convertMany rejects overlapping gid ranges (synapse ids would collide)") {
    val e = intercept[IllegalArgumentException] {
      Touch2Parquet.convertMany(spark, Seq(v1Pair(7, 2), v1Pair(7, 3)),
        graft.io.TempDirs.create("cli_overlap"))
    }
    assert(e.getMessage.contains("gid ranges overlap"), e.getMessage)
  }

  test("Touch2Sonata: one command produces the full SONATA-mirror tree") {
    import graft.pipelines.TouchToParquet
    val out = graft.io.TempDirs.create("touch2sonata")
    val n = graft.cli.Touch2Sonata.run(spark, TouchToParquet.fixturePath(2), out)
    assert(n == 1104, s"v2 fixture has 1104 touches, got $n")
    // intermediate parquet + every sonata tree node readable with the
    // expected schema (README layout-mapping table)
    assert(spark.read.parquet(s"$out/parquet").count() == 1104)
    val edges = spark.read.parquet(s"$out/sonata/edges")
    assert(edges.count() == 1104)
    assert(edges.columns.contains("edge_id") && !edges.columns.contains("synapse_id"))
    for (d <- Seq("source_to_target", "target_to_source")) {
      val primary = spark.read.parquet(s"$out/sonata/indices/$d/primary")
      assert(primary.columns.toSeq == Seq("node_id", "range_start", "range_end"))
      assert(primary.count() > 0, s"$d primary empty")
      val secondary = spark.read.parquet(s"$out/sonata/indices/$d/secondary")
      assert(secondary.columns.toSeq == Seq("range_pos", "edge_start", "edge_end"))
      // range_to_edge_id rows must cover every edge exactly once
      val covered = secondary.agg(
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("edge_end") -
            org.apache.spark.sql.functions.col("edge_start"))).collect()(0).getLong(0)
      assert(covered == 1104, s"$d secondary covers $covered of 1104 edges")
    }
  }

  test("convertMany rejects a schema-version mix") {
    import graft.pipelines.TouchToParquet
    val e = intercept[IllegalArgumentException] {
      Touch2Parquet.convertMany(spark,
        Seq(v1Pair(7, 2), TouchToParquet.fixturePath(2)),
        graft.io.TempDirs.create("cli_mix"))
    }
    assert(e.getMessage.contains("disagree on schema version"), e.getMessage)
  }

  test("CurateCorpus: one command from raw documents to packed JSONL shards") {
    import org.apache.spark.sql.functions._
    val out = graft.io.TempDirs.create("curatecli")
    val (n, shards) = graft.cli.CurateCorpus.run(spark,
      "/root/testdata/sf0.001/documents.parquet", out, tokensPerShard = 2000L)
    assert(n > 0, "curation must keep documents")
    assert(shards > 1, s"2000-token shards over the kept corpus should split, got $shards")
    // the written shards reload to exactly the curated survivor set,
    // every kept doc is a canonical cluster representative, and no text
    // escaped normalization
    val reread = spark.read.json(out)
    assert(reread.count() == n)
    assert(reread.columns.sorted.toSeq ==
      Seq("cum_tokens", "doc_id", "lang", "n_tokens", "shard", "source", "text"))
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val keptIds = graft.ext.Curate.curateCorpus(docs,
        graft.ext.Sampling.hashBucket(col("doc_id")) < 6554)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(reread.select("doc_id").collect().map(_.getLong(0)).toSet == keptIds)
    assert(reread.filter(col("text") =!= lower(col("text"))).count() == 0,
      "all shard text must be normalized")
    // shard budget: every shard except the last stays within one doc of
    // the token budget by the prefix-scan construction
    val bad = reread.groupBy("shard").agg(sum("n_tokens").as("t"))
      .filter(col("t") > 2000L + 500L).count() // 500 = max doc tokens at sf0.001
    assert(bad == 0, "no shard may exceed budget by more than one document")
  }
}
