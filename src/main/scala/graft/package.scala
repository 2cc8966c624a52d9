package object graft {
  /** A registered query: (session, scale-factor dir) => result DataFrame.
    * Every operator in SURVEY.md §2 registers one of these in
    * `SparkEntry.queries`, plus (where ANSI-SQL-expressible) a DuckDB
    * oracle in `SparkEntry.oracleSql`.
    */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}

package graft {
  /** Engine identity stamped into sink provenance metadata (the
    * reference's `touch2parquet_version` footer KV analogue).
    */
  object BuildInfo {
    val version: String = "graft-spark 0.3.0"
  }
}
