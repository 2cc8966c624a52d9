package object graft {
  /** A registered query: (session, scale-factor dir) => result DataFrame.
    * Every operator in SURVEY.md §2 registers one of these in
    * `SparkEntry.queries`, plus (where ANSI-SQL-expressible) a DuckDB
    * oracle in `SparkEntry.oracleSql`.
    */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
