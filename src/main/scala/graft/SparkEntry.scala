package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{PipelineQueries, RelationalQueries, Tables, XmlQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * `queries` is the engine's full oracle-gated operator inventory; each entry has a
 * matching DuckDB SQL in `oracleSql` (identical column names/aliases — the driver's
 * compare sorts columns by name before hashing).
 */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q01_agg_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ the LLM-pipeline ops). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ XmlQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ XmlQueries.oracles ++ PipelineQueries.oracles
}
