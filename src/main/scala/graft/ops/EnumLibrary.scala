package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `@library` dictionary-encoded enum columns — the reference's SONATA
  * writer stores a string enum column as integer codes in the data
  * datasets plus an `@library/<col>` string dataset holding the
  * enumeration values (src/circuit/sonata_writer.cpp:102-111; SURVEY.md
  * §1.1 "enumeration_values → @library").
  *
  * Spark-first: the dictionary is distinct values + a rank — BY
  * DEFINITION enum-small (its cardinality is the enum's, not the
  * data's), so the rank window over the deduplicated values is a
  * dictionary-sized single partition, and the data-side encode is a
  * BROADCAST join: the fact table never shuffles, regardless of scale.
  */
object EnumLibrary {

  /** (coded, library): `library` is `(code, value)` with `code` the
    * 0-based rank of `value` in sorted order; `coded` is `df` with
    * `valueCol` replaced by integer `codeCol`. Null values are kept out
    * of the library and code as null (SONATA enums are total — a null
    * would be a validation failure upstream).
    */
  def encode(df: DataFrame, valueCol: String, codeCol: String): (DataFrame, DataFrame) = {
    val library = df.select(col(valueCol).as("value")).where(col("value").isNotNull)
      .distinct()
      // dictionary-sized window (enum cardinality), not data-sized
      .withColumn("code", (row_number().over(Window.orderBy(col("value"))) - 1))
      .select(col("code"), col("value"))
    val coded = df
      .join(broadcast(library), df(valueCol) === library("value"), "left_outer")
      .drop(valueCol, "value")
      .withColumnRenamed("code", codeCol)
    (coded, library)
  }

  val queries: Map[String, Q] = Map(
    // Codes-join round trip on a real enum column: encode, then join the
    // library back and emit (key…, code, value) — proving the codes and
    // the @library values reconstruct the original column.
    "enum_library_codes" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      val (coded, library) = encode(li, "l_returnflag", "flag_code")
      coded.join(broadcast(library), coded("flag_code") === library("code"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("flag_code"), col("value").as("l_returnflag"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "enum_library_codes" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(DENSE_RANK() OVER (ORDER BY l_returnflag) - 1 AS INTEGER) AS flag_code,
        |  l_returnflag
        |FROM lineitem""".stripMargin
  )
}
