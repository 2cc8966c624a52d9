package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CLI parity with the reference's two converters, so a user can run the
  * same jobs without writing Scala (reference: `touch2parquet
  * <touchesData...> <outdir>` and `parquet2hdf5 <parquet-dir> <out>
  * <population>`). Local sessions here; on a cluster, submit the same
  * mains with `spark-submit --master ...`.
  */
private[cli] object Cli {
  def session(app: String): SparkSession = {
    val b = SparkSession.builder().appName(app)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit's --master (surfaced as the spark.master system
    // property) must win: only force a master when explicitly requested
    // via the env, falling back to local[*] ONLY when nothing else
    // configured one (bare `runMain` during development).
    (sys.env.get("SPARK_GRAFT_MASTER") match {
      case Some(m) => b.master(m)
      case None if sys.props.contains("spark.master") => b
      case None => b.master("local[*]")
    }).getOrCreate()
  }
}

/** `runMain graft.cli.Touch2Parquet <touchesData.N>... <outDir>` —
  * converts one or more TouchDetector binary files (each with its
  * companion index next to it) into a single parquet dataset, like the
  * reference's `touch2parquet` (src/touch2parquet.cpp:34-138). Multiple
  * inputs must share a schema version; they union into one sink.
  */
object Touch2Parquet {

  /** Union several touch files into one parquet sink, with the checks
    * the single-input path gets implicitly: the reference's
    * schema-agreement rule (parquet2hdf5.cpp:67-73 — mixed record
    * versions cannot share a sink) and gid-range disjointness (synapse
    * ids are `(gid << 24) + ordinal`, so overlapping gid ranges across
    * inputs would collide; the reference's per-rank file split
    * guarantees disjointness, here it is asserted). Stamps the same
    * footer provenance as the single-input path — version STRING
    * agreement is not required (git-hash builds of one record version
    * differ), so the first input's string is stamped. The ranges come
    * from the INDEXES, so the check is conservative: a short-read index
    * whose zero-padding pulls firstGid to 0 widens its claimed range
    * and can reject a union whose actual records were disjoint.
    */
  def convertMany(spark: SparkSession, inputs: Seq[String], outDir: String): Unit = {
    import graft.io.TouchBinary
    val indexes = inputs.map(p =>
      p -> TouchBinary.readIndex(TouchBinary.indexFileFor(p)))
    val versions = indexes.map(_._2.version).distinct
    require(versions.size == 1,
      s"inputs disagree on schema version: " +
        indexes.map { case (p, i) => s"$p=v${i.version.ordinal}" }.mkString(", "))
    val ranges = indexes.map { case (p, i) =>
      (p, i.firstGid, i.firstGid + math.max(0, i.shifts.length - 1)) }
    ranges.sortBy(_._2).sliding(2).foreach {
      case Seq((pa, _, aHi), (pb, bLo, _)) =>
        require(aHi < bLo,
          s"gid ranges overlap between $pa (..$aHi) and $pb ($bLo..) — " +
            "synapse ids would collide in the union")
      case _ => ()
    }
    val frames: Seq[DataFrame] =
      inputs.map(p => spark.read.format("touchbin").load(p))
    graft.io.ParquetMeta.writeWithMeta(
      frames.reduce(_ unionByName _), outDir,
      kv = Map(
        "touchdetector_version" -> indexes.head._2.versionString,
        "touch2parquet_version" -> graft.BuildInfo.version),
      options = Map(
        "compression" -> "snappy",
        "parquet.enable.dictionary" -> "false",
        "parquet.block.size" -> (20 * 1024 * 1024).toString))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Touch2Parquet <touchesData.N>... <outDir>")
    val inputs = args.dropRight(1)
    val outDir = args.last
    val spark = Cli.session("touch2parquet")
    try {
      if (inputs.length == 1)
        graft.pipelines.TouchToParquet.convert(spark, inputs.head, outDir)
      else convertMany(spark, inputs.toSeq, outDir)
      println(s"touch2parquet: wrote ${spark.read.parquet(outDir).count()} rows to $outDir")
    } finally spark.stop()
  }
}

/** `runMain graft.cli.Touch2Sonata <touchesData.N> <outDir>` — the full
  * reference pipeline in one command: TouchDetector binary →
  * `<outDir>/parquet` (provenance-stamped edge table) →
  * `<outDir>/sonata` (SONATA-mirror layout: ordered `edges/`, both
  * `indices/` directions, `@library/` dictionaries). Equivalent to
  * `touch2parquet` followed by `parquet2hdf5` in the reference, with
  * the HDF5 container mirrored as parquet directories — the group-name
  * mapping to sonata_file.cpp:26-79 / index.cpp:27-31 is documented in
  * README "Switching from the reference".
  */
object Touch2Sonata {

  /** The testable pipeline body (mains own session lifecycle, tests
    * share one): returns the ordered edge count.
    */
  def run(spark: SparkSession, touchesData: String, outDir: String): Long = {
    val parquetDir = s"$outDir/parquet"
    graft.pipelines.TouchToParquet.convert(spark, touchesData, parquetDir)
    val edges = graft.io.SchemaSidecar.readParquetDir(spark, parquetDir)
    // synapse_id is dropped by the sonata step (SkipColumns); everything
    // else tiebreaks the total order like Parquet2Sonata
    val tiebreak = edges.columns.filterNot(c =>
      c == "source_node_id" || c == "target_node_id" || c == "synapse_id").toSeq
    val (result, release) = graft.pipelines.EdgesToSonata.convertStamped(
      spark, edges, "source_node_id", "target_node_id", s"$outDir/sonata", tiebreak)
    val n = result.count()
    release()
    n
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: Touch2Sonata <touchesData.N> <outDir>")
    val spark = Cli.session("touch2sonata")
    try {
      val n = run(spark, args(0), args(1))
      println(s"touch2sonata: wrote $n edges + indices to ${args(1)}/sonata " +
        s"(intermediate parquet at ${args(1)}/parquet)")
    } finally spark.stop()
  }
}

/** `runMain graft.cli.Parquet2Sonata <edgesParquetDir> <outDir>
  * [sourceCol targetCol [enumCol...]]` — converts a parquet edge
  * directory into the SONATA-mirror layout (ordered position-stamped
  * edges + both CSR index directions + @library dictionaries), like the
  * reference's `parquet2hdf5` (src/parquet2hdf5.cpp:171-251) with the
  * HDF5 container mirrored as parquet (SURVEY §2.1 S5).
  */
object Parquet2Sonata {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: Parquet2Sonata <edgesDir> <outDir> [sourceCol targetCol [enumCol...]]")
    val (in, out) = (args(0), args(1))
    val sourceCol = if (args.length > 2) args(2) else "source_node_id"
    val targetCol = if (args.length > 3) args(3) else "target_node_id"
    val enums = args.drop(4).toSeq
    val spark = Cli.session("parquet2sonata")
    try {
      val edges = graft.io.SchemaSidecar.readParquetDir(spark, in)
      val tiebreak = edges.columns.filterNot(c =>
        c == sourceCol || c == targetCol).toSeq // total order over all columns
      val (result, release) = graft.pipelines.EdgesToSonata.convertStamped(
        spark, edges, sourceCol, targetCol, out, tiebreak, enums)
      println(s"parquet2sonata: wrote ${result.count()} edges + indices to $out")
      release()
    } finally spark.stop()
  }
}

/** `runMain graft.cli.CurateCorpus <documentsParquetDir|file> <outDir>
  * [tokensPerShard]` — the one-command training-data pipeline over a
  * raw `documents` table, composing the curation operators end-to-end:
  *
  *   1. md5-bucket held-out split (the ~10% eval side);
  *   2. near-dup clustering over the TRAINING pair graph, keep cluster
  *      minima; 8-gram decontamination vs the held-out split; integer
  *      repetition-quality gate  (ext.Curate.curateCorpus);
  *   3. PII redaction + normalization of the survivors' text;
  *   4. deterministic md5-order corpus shuffle + token-budget shard
  *      packing (exclusive weighted prefix scan);
  *   5. one JSONL file per shard (`shard=N/part-*.json` via a
  *      partitioned write) — the layout a trainer consumes.
  *
  * Counterpart of the reference's converter CLIs for the engine's
  * training-data side: raw table in, training shards out.
  */
object CurateCorpus {

  /** Testable body; returns (kept docs, shards written). */
  def run(spark: SparkSession, docsPath: String, outDir: String,
          tokensPerShard: Long): (Long, Long) = {
    import org.apache.spark.sql.functions._
    // div-by-zero in the shard expression would yield null shards and a
    // __HIVE_DEFAULT_PARTITION__ layout; negatives, negative shard ids
    require(tokensPerShard > 0, s"tokensPerShard must be positive, got $tokensPerShard")
    val docs = spark.read.parquet(docsPath)
    val evalSide = graft.ext.Sampling.hashBucket(col("doc_id")) < 6554
    val kept = graft.ext.Curate.curateCorpus(docs, evalSide)
    val cleaned = kept.join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"),
        graft.ext.TextAnalysis.normalize(
          graft.ext.TextAnalysis.redactPii(col("text"))).as("text"))
    val packed = graft.ops.Offsets.globalWeightedPrefix(cleaned,
        Seq(md5(col("doc_id").cast("string")), col("doc_id")),
        "n_tokens", "cum_tokens")
      .withColumn("shard", expr(s"cum_tokens div $tokensPerShard"))
    packed.write.mode("overwrite").partitionBy("shard").json(outDir)
    // summary from ONE read-back pass: explicit schema (no inference
    // scan over the JSON text) and a single aggregate for both counts
    val row = spark.read.schema(packed.schema).json(outDir)
      .agg(count(lit(1)), count_distinct(col("shard"))).head
    (row.getLong(0), row.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CurateCorpus <documentsParquet> <outDir> [tokensPerShard]")
    val tokensPerShard = if (args.length > 2) args(2).toLong else 1000000L
    val spark = Cli.session("curatecorpus")
    try {
      val (n, shards) = run(spark, args(0), args(1), tokensPerShard)
      println(s"curatecorpus: wrote $n curated documents in $shards shards to ${args(1)}")
    } finally spark.stop()
  }
}
