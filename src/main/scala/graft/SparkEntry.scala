package graft
import graft.queries.{CoreQueries, CurationQueries, DerivedQueries, ExtendedQueries, GateQueries, LLMQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_enriched_lineitems")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ LLMQueries.queries ++ DerivedQueries.queries ++
      ExtendedQueries.queries ++ GateQueries.queries ++ CurationQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ LLMQueries.oracles ++ DerivedQueries.oracles ++
      ExtendedQueries.oracles ++ GateQueries.oracles ++ CurationQueries.oracles
}
