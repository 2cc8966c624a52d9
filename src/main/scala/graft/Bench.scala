package graft

import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Per-round benchmark: times every registered query at the given scale
  * factor and prints ONE JSON line. A full warmup pass runs first so the
  * timed pass measures steady-state execution (codegen compiled, JIT
  * warm, file listings cached) rather than JVM startup.
  *
  * `SPARK_GRAFT_ISOLATED=1` switches to the falsifiable mode the round-6
  * audit asked for: board numbers swing ±2-3× from JVM/GC contention
  * when 134 queries share one session back-to-back, which makes a true
  * regression indistinguishable from noise. Isolated mode runs each
  * query in a FRESH SparkContext (stop + rebuild per measurement), one
  * untimed warmup then `SPARK_GRAFT_REPS` (default 3) timed runs, and
  * reports the MEDIAN — written to `bench_isolated_r{N}.json`. Default
  * query set = top 10 by cost from the newest board record (override
  * with SPARK_GRAFT_ONLY).
  */
object Bench {

  private def newSession(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  /** Newest driver-written round number; this run's records belong to
    * the round AFTER it (the driver benches before writing its file).
    */
  private def currentRound(repo: java.nio.file.Path): Int = {
    val benchRe = "BENCH_r(\\d+)\\.json".r
    val listing = java.nio.file.Files.list(repo)
    val last =
      try listing.iterator().asScala
        .flatMap(p => benchRe.findFirstMatchIn(p.getFileName.toString))
        .map(_.group(1).toInt).foldLeft(0)(math.max)
      finally listing.close()
    last + 1
  }

  private def repoDir: Option[java.nio.file.Path] = {
    val repo = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo"))
    if (java.nio.file.Files.isDirectory(repo) &&
        java.nio.file.Files.exists(repo.resolve("build.sbt"))) Some(repo)
    else None
  }

  /** Top-`n` query names by per-query seconds in the newest full board
    * record (bench_full_r*.json) — the default isolated-mode target set.
    */
  private def topFromLastBoard(repo: java.nio.file.Path, n: Int): Seq[String] = {
    val re = "bench_full_r(\\d+)\\.json".r
    val listing = java.nio.file.Files.list(repo)
    val newest =
      try listing.iterator().asScala
        .flatMap(p => re.findFirstMatchIn(p.getFileName.toString)
          .map(m => (m.group(1).toInt, p)))
        .toSeq.sortBy(-_._1).headOption.map(_._2)
      finally listing.close()
    newest.toSeq.flatMap { p =>
      val json = new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8)
      // the record is flat and machine-written — a targeted regex beats
      // dragging a JSON parser into the bench classpath
      val q = "\"queries\":\\{([^}]*)\\}".r.findFirstMatchIn(json).map(_.group(1))
      q.toSeq.flatMap(_.split(",").toSeq.flatMap { kv =>
        kv.split(":") match {
          case Array(k, v) =>
            scala.util.Try(v.toDouble).toOption
              .map(d => (k.replaceAll("\"", ""), d))
          case _ => None
        }
      }).sortBy(-_._2).take(n).map(_._1)
    }
  }

  private def runIsolated(sfDir: String, cpus: String): Unit = {
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val names = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSeq)
      .orElse(repoDir.map(topFromLastBoard(_, 10)))
      .getOrElse(Seq.empty)
      .filter(SparkEntry.queries.contains)
    require(names.nonEmpty, "isolated mode: no queries (no board record and no SPARK_GRAFT_ONLY)")
    val results = names.map { name =>
      // 1 untimed warmup + `reps` timed, EACH in a fresh SparkContext so
      // no cross-query cache/GC/codegen state can leak into the number
      val runs = (0 to reps).map { _ =>
        val spark = newSession(cpus)
        try {
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        } finally spark.stop()
      }.drop(1).sorted
      val median = runs(runs.size / 2)
      System.err.println(f"[isolated] $name%-35s median ${median}%7.2f s  runs ${runs.map(r => f"$r%.2f").mkString(",")}")
      name -> (median, runs)
    }
    val qs = results.map { case (k, (m, runs)) =>
      "\"" + k + "\":{\"median\":" + m + ",\"runs\":[" + runs.mkString(",") + "]}"
    }.mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    val json = s"""{"metric":"isolated_median_total","value":$total,"unit":"sec","reps":$reps,"queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // same guard as the board record: an explicit SPARK_GRAFT_ONLY run is
    // local iteration and must not overwrite the round's full record
    if (sys.env.get("SPARK_GRAFT_ONLY").isEmpty) {
      repoDir.foreach { repo =>
        java.nio.file.Files.write(
          repo.resolve(f"bench_isolated_r${currentRound(repo)}%02d.json"),
          json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    if (sys.env.get("SPARK_GRAFT_ISOLATED").exists(v => v == "1" || v == "true")) {
      runIsolated(sfDir, cpus)
      return
    }
    val spark = newSession(cpus)

    // optional comma-separated filter for local iteration; the driver
    // leaves it unset (full run)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // deterministic but NON-alphabetical order (hash of the name):
    // alphabetical order runs whole families (dedup_*, streaming_*)
    // back-to-back, compounding contention on the same cached inputs —
    // interleaving spreads it (PLANS.md round-7 note)
    val names = SparkEntry.queries.keys.toSeq
      .sortBy(n => (n.hashCode, n))
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
      repoDir.foreach { repo =>
        java.nio.file.Files.write(
          repo.resolve(f"bench_full_r${currentRound(repo)}%02d.json"),
          json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    spark.stop()
  }
}
