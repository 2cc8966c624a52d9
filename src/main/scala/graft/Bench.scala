package graft

import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Per-round benchmark: times every registered query at the given scale
  * factor and prints ONE JSON line. A full warmup pass runs first so the
  * timed pass measures steady-state execution (codegen compiled, JIT
  * warm, file listings cached) rather than JVM startup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // optional comma-separated filter for local iteration; the driver
    // leaves it unset (full run)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // warmup pass (untimed); clearCache between queries — several operators
    // persist() intermediates, and letting those accumulate would make the
    // timed pass measure cache eviction instead of the operators
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => }
      spark.catalog.clearCache()
    }
    val results = names.map { name =>
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // The driver's BENCH_r{N}.json truncates its tail — persist the full
    // per-query record in-repo so the round audit reads one file. The
    // round number is inferred from the newest driver-written BENCH_r*.json
    // (the driver benches BEFORE writing the round's file, so this run
    // belongs to the round after the newest one).
    if (only.isEmpty) {
      val repo = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo"))
      if (java.nio.file.Files.isDirectory(repo) &&
          java.nio.file.Files.exists(repo.resolve("build.sbt"))) {
        val benchRe = "BENCH_r(\\d+)\\.json".r
        val listing = java.nio.file.Files.list(repo)
        val lastRound =
          try listing.iterator().asScala
            .flatMap(p => benchRe.findFirstMatchIn(p.getFileName.toString))
            .map(_.group(1).toInt).foldLeft(0)(math.max)
          finally listing.close()
        java.nio.file.Files.write(
          repo.resolve(f"bench_full_r${lastRound + 1}%02d.json"),
          json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    spark.stop()
  }
}
