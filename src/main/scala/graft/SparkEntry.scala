package graft

import graft.queries.{GraphQueries, KgQueries, MiscQueries, ModelQueries, PipelineQueries, RelationalQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query: full KG extraction (docs → triples) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    KgQueries.queries("kg_triples")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ GraphQueries.queries ++
      PipelineQueries.queries ++ MiscQueries.queries ++ ModelQueries.queries ++
      KgQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (the kg_*
    * pipeline stages) → driver records a weaker rows-only check there.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ GraphQueries.oracles ++
      PipelineQueries.oracles ++ MiscQueries.oracles
}
