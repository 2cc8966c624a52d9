package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** W1 `synapse_id_gen` — the reference's one derived-key "window function":
  * `synapse_id = (pre_gid << 24) + k`, k = 0-based ordinal of the row
  * inside its group's contiguous block (src/touches/touch_reader.cpp:275-288),
  * with a hard error when any group exceeds 2^24 rows
  * (touch_reader.cpp:278-283).
  *
  * Spark-first formulation: `shiftleft(gid, 24) + row_number() - 1` over
  * `Window.partitionBy(gid).orderBy(ord)`. At 100 TB this is one shuffle on
  * `gid` (hash-partitioned window, no global sort); the reference's
  * broadcast-`shifts` lookup is subsumed by the partitioned window — no
  * driver-side index file needed.
  */
object SynapseId {

  /** Append `synapse_id` to `df`. `guard`=true adds the 2^24 overflow check
    * as a `raise_error` branch (constant-folded away when Catalyst can prove
    * it dead; otherwise evaluated per-row but vectorized).
    */
  def withSynapseId(df: DataFrame, gid: Column, ord: Column, guard: Boolean = true,
                    guardLimit: Long = 1L << 24): DataFrame = {
    val w = Window.partitionBy(gid).orderBy(ord)
    val k = row_number().over(w).cast("long") - 1
    val kChecked =
      if (guard)
        when(k >= guardLimit,
          raise_error(concat(lit("synapse id overflow: group "), gid.cast("string"),
            lit(" has >= 2^24 rows")))).otherwise(k)
      else k
    df.withColumn("synapse_id", shiftleft(gid.cast("long"), 24) + kChecked)
  }

  val queries: Map[String, Q] = Map(
    "synapse_id_gen" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      withSynapseId(li, col("l_orderkey"), col("l_linenumber"), guard = false)
        .select(col("l_orderkey"), col("l_linenumber"), col("synapse_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "synapse_id_gen" ->
      """SELECT l_orderkey, l_linenumber,
        |  (l_orderkey << 24)
        |    + ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1
        |    AS synapse_id
        |FROM lineitem""".stripMargin
  )
}
