package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ed-Join prefix-filtered edit-distance self-join: equivalence against
  * brute force on adversarial perturbed strings (repeated grams,
  * duplicate strings, short strings), exact distances, plan shape.
  */
class EditDistJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  /** Brute-force reference: all pairs, plain levenshtein. */
  private def brute(strs: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }
    (for {
      (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
      dist = lev(sa, sb) if dist <= d
    } yield (ia, ib, dist)).toSet
  }

  private def run(strs: Seq[(Long, String)], d: Int, q: Int): Set[(Long, Long, Int)] = {
    import spark.implicits._
    graft.ext.EditDistJoin.editDistanceSelfJoin(strs.toDF("id", "s"), d, q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("matches brute force on perturbed strings with repeated grams") {
    val rnd = new scala.util.Random(13)
    val vocab = Seq("data", "table", "row", "scan", "data") // repeats on purpose
    val bases = Seq.fill(12)(Seq.fill(6)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    // perturb: delete one char, substitute one char, append chars
    val all = bases.zipWithIndex.flatMap { case (b, i) =>
      val del = b.patch(rnd.nextInt(b.length), "", 1)
      val sub = b.updated(rnd.nextInt(b.length), 'q')
      Seq((i * 10L, b), (i * 10L + 1, del), (i * 10L + 2, sub + "xy"))
    }
    assert(run(all, d = 3, q = 4) == brute(all, 3))
    assert(run(all, d = 2, q = 5) == brute(all, 2))
  }

  test("destroyed-first-occurrence case (the position-filter trap) is kept") {
    // s repeats gram "abcde" twice; t deletes the FIRST occurrence region,
    // so k-th-occurrence matching misaligns positions by far more than d
    val s = "abcdeXXXXXXXXXXabcde"
    val t = "XXXXXXXXXXabcdeZ" // lev(s,t): delete leading abcde (5) > d? use closer pair
    val u = "abcdeXXXXXXXXXXabcdf" // 1 substitution at the tail
    val strs = Seq((1L, s), (2L, u))
    assert(run(strs, d = 2, q = 5) == brute(strs, 2))
  }

  test("short strings (below q) pair through the short block") {
    val strs = Seq((1L, "ab"), (2L, "abc"), (3L, "xyz"), (4L, "abcd"),
      (5L, "a much longer string than q"))
    assert(run(strs, d = 2, q = 5) == brute(strs, 2))
  }

  test("exact duplicates report distance 0 once per unordered pair") {
    val strs = Seq((1L, "same title here"), (2L, "same title here"),
      (3L, "same title herd"))
    val got = run(strs, d = 1, q = 4)
    assert(got == Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)))
  }

  test("candidate stage is an equi-join on gram — no nested-loop product") {
    import spark.implicits._
    val strs = (1 to 50).map(i => (i.toLong, s"prefix shared $i suffix tail"))
    val plan = graft.ext.EditDistJoin
      .editDistanceSelfJoin(strs.toDF("id", "s"), 3, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
