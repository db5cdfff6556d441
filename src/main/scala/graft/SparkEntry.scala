package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship (SURVEY §7.2): the 4-table join through the full UES
    * optimization pipeline (parse -> join graph -> pessimistic join order ->
    * operator selection -> Catalyst plan enforcement) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    OptQueries.queries("opt01_ues_flagship")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ LlmQueries.queries ++ OptQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ LlmQueries.oracles ++ OptQueries.oracles
}
