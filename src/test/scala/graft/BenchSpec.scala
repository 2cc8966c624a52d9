package graft

import org.scalatest.funsuite.AnyFunSuite

/** Board-record parsing + isolated-mode target selection: the numbers
  * the driver grades the round on flow through these helpers, so a
  * format drift or a broken mover rule must fail a TEST, not silently
  * shrink the adjudication set.
  */
class BenchSpec extends AnyFunSuite {

  private def writeBoard(dir: java.nio.file.Path, round: Int,
                         qs: Map[String, Double]): java.nio.file.Path = {
    val body = qs.map { case (k, v) => "\"" + k + "\":" + v }.mkString(",")
    val p = dir.resolve(f"bench_full_r$round%02d.json")
    java.nio.file.Files.write(p,
      s"""{"metric":"total","value":1.0,"unit":"sec","queries":{$body},"sf":"x"}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    p
  }

  test("boardQueries parses a flat record and rejects a nested one") {
    val dir = java.nio.file.Paths.get(graft.io.TempDirs.create("bench_parse"))
    val p = writeBoard(dir, 1, Map("a" -> 1.5, "b" -> 0.25))
    assert(Bench.boardQueries(p) == Map("a" -> 1.5, "b" -> 0.25))
    val nested = dir.resolve("bench_full_r02.json")
    java.nio.file.Files.write(nested,
      """{"metric":"x","queries":{"a":{"median":1.0}},"sf":"x"}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val e = intercept[IllegalArgumentException] { Bench.boardQueries(nested) }
    assert(e.getMessage.contains("not a flat"), e.getMessage)
  }

  test("isolatedTargets = top-n of newest board ∪ >2.5x movers vs previous") {
    val dir = java.nio.file.Paths.get(graft.io.TempDirs.create("bench_targets"))
    // previous round: mid is cheap; newest: mid jumped 6x (a mover)
    // while staying below the top-2 cutoff
    writeBoard(dir, 6, Map("big" -> 9.0, "mid" -> 0.5, "small" -> 0.1, "other" -> 4.0))
    writeBoard(dir, 7, Map("big" -> 9.5, "mid" -> 3.0, "small" -> 0.1, "other" -> 4.0))
    val targets = Bench.isolatedTargets(dir, n = 2)
    assert(targets.take(2) == Seq("big", "other"), s"top-2 by newest cost: $targets")
    assert(targets.contains("mid"), s"6x mover must be auto-included: $targets")
    assert(!targets.contains("small"), s"unmoved cheap query excluded: $targets")
    // single board (no previous) → just top-n, no movers
    val dir2 = java.nio.file.Paths.get(graft.io.TempDirs.create("bench_targets1"))
    writeBoard(dir2, 3, Map("a" -> 2.0, "b" -> 1.0, "c" -> 0.1))
    assert(Bench.isolatedTargets(dir2, n = 2) == Seq("a", "b"))
  }

  test("a 1.5x mid-cost mover is included and survives the cap over pricier non-movers") {
    val dir = java.nio.file.Paths.get(graft.io.TempDirs.create("bench_midmover"))
    // 40 expensive-but-stable queries + one mid-cost query that drifted
    // 0.80 -> 1.37 s (the round-8 `snapshot_diff` shape: ratio 1.71,
    // delta 0.57 — below the old 2.5x ratio AND below the cost cap)
    val stable = (0 until 40).map(i => f"s$i%02d" -> (5.0 + i * 0.1)).toMap
    writeBoard(dir, 1, stable + ("mover" -> 0.80))
    writeBoard(dir, 2, stable + ("mover" -> 1.37))
    val targets = Bench.isolatedTargets(dir, n = 32)
    assert(targets.contains("mover"),
      s"sub-2.5x regression must be adjudicated: $targets")
    assert(targets.size == 32, s"cap still holds: ${targets.size}")
    // a ratio-clearing but sub-delta drift (0.10 -> 0.18) stays out
    val dir2 = java.nio.file.Paths.get(graft.io.TempDirs.create("bench_noise"))
    writeBoard(dir2, 1, Map("a" -> 2.0, "tiny" -> 0.10))
    writeBoard(dir2, 2, Map("a" -> 2.0, "tiny" -> 0.18))
    assert(!Bench.isolatedTargets(dir2, n = 1).contains("tiny"))
  }

  test("a mover flood (globally contended previous board) caps at the most expensive") {
    val dir = java.nio.file.Paths.get(graft.io.TempDirs.create("bench_flood"))
    val qs = (0 until 40).map(i => f"q$i%02d").toSeq
    writeBoard(dir, 1, qs.map(_ -> 0.1).toMap)
    // every query 10-50x slower on the newest board → all 40 are movers
    writeBoard(dir, 2, qs.zipWithIndex.map { case (q, i) => q -> (1.0 + i * 0.1) }.toMap)
    val targets = Bench.isolatedTargets(dir, n = 10)
    assert(targets.size == 32, s"flood must cap at 32, got ${targets.size}")
    // the kept set is the 32 most expensive by the newest board
    assert(targets.toSet == qs.drop(8).toSet, targets.sorted.mkString(","))
  }
}
