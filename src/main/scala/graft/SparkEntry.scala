package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.engine.FossilEngine
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The docs' canonical pipeline (`docs/pipelines.md:46`): Fahrenheit →
    * Celsius over a week-shaped window, via the full FQL path. */
  def entry(spark: SparkSession): DataFrame = {
    val eng = FossilEngine.over(
      Tables.eventEntries(spark, "/root/testdata/sf0.001"),
      Tables.eventsCatalog, Queries.fixedClock)
    eng.query("all in /events since ~(2024/01/01) | map F -> 5/9 * (F-32)")
  }
  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.fqlQueries ++ Queries.relationalQueries ++ PipelineQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.fqlOracles ++ Queries.relationalOracles ++ PipelineQueries.oracles
}
