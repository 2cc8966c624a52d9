package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted joins and two-phase aggregation.
  *
  * A shuffle join keyed on a skewed column sends every row of the hot key
  * to one task. Salting splits each hot key into `factor` sub-keys: the
  * big side gets a DETERMINISTIC salt derived from a unique column (no
  * `rand()` — nondeterministic columns break retries and oracle
  * comparison), the small side is replicated `factor` times. Results are
  * identical to the unsalted join; only the partitioning changes. AQE's
  * skew-join handling does this adaptively for sort-merge joins; the
  * explicit form works for any shape and documents the pattern.
  */
object Salting {

  /** Equi-join `big ⋈ small` on `key`, salted `factor` ways. `saltSrc`
    * must be a deterministic expression over `big`'s columns (e.g. a
    * unique id).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltSrc: Column, factor: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(xxhash64(saltSrc), lit(factor.toLong)))
    val saltedSmall = small
      .withColumn("_salt", explode(sequence(lit(0L), lit(factor.toLong - 1))))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  val queries: Map[String, Q] = Map(
    // Salted fact⋈dim join; result provably identical to the plain join —
    // which is exactly what the oracle executes.
    "join_salted_skew" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).withColumnRenamed("l_suppkey", "s_suppkey")
      val supp = Tables.supplier(s, dir)
      saltedJoin(li, supp, "s_suppkey", col("l_orderkey") * 10 + col("l_linenumber"), factor = 8)
        .select(col("l_orderkey"), col("l_linenumber"), col("s_name"),
          col("s_nationkey"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "join_salted_skew" ->
      """SELECT l_orderkey, l_linenumber, s_name, s_nationkey
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey""".stripMargin
  )
}
