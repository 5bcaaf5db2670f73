package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query takes (spark, sfDir) and returns a DataFrame whose column
  * names match its oracle SQL exactly (the driver sorts columns by name and
  * hashes values). Float-bearing outputs are rounded to 6 decimals on BOTH
  * sides so double-summation order differences between Spark and DuckDB
  * cannot flip the hash. Query groups live in:
  *   - [[RecQueries]]   — RecDB recommendation surface (SURVEY.md §2.1)
  *   - [[RelQueries]]   — inherited relational surface (SURVEY.md §2.2)
  *   - [[PipelineQueries]] — training-data pipeline ops (dedup/ANN/text)
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The regression script's canonical shape (recdb_regression_test.sql:5-9):
    * top-10 itemCF recommendations for one user.
    */
  def entry(spark: SparkSession): DataFrame =
    RecQueries.queries("r_itemcf_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RecQueries.queries ++ RelQueries.queries ++ PipelineQueries.queries ++ ExtQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    RecQueries.oracleSql ++ RelQueries.oracleSql ++ PipelineQueries.oracleSql ++ ExtQueries.oracleSql
}
