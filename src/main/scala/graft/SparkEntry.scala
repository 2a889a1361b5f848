package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module query registries; every entry in `queries`
  * with a counterpart in `oracleSql` is hash-checked against DuckDB by
  * the driver at sf0.01.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
    operators.Windows.queries ++
    operators.Functions.queries ++
    operators.Parity.queries ++
    operators.Dedup.queries ++
    operators.Similarity.queries ++
    operators.TextAnalysis.queries ++
    operators.Multimodal.queries ++
    operators.AggregatesPlus.queries ++
    operators.WindowsBatch.queries ++
    operators.UdfSurface.queries ++
    operators.Coverage.queries ++
    operators.SqlSurface.queries ++
    operators.Graph.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
    operators.Windows.oracles ++
    operators.Functions.oracles ++
    operators.Parity.oracles ++
    operators.Dedup.oracles ++
    operators.Similarity.oracles ++
    operators.TextAnalysis.oracles ++
    operators.Multimodal.oracles ++
    operators.AggregatesPlus.oracles ++
    operators.WindowsBatch.oracles ++
    operators.UdfSurface.oracles ++
    operators.Coverage.oracles ++
    operators.SqlSurface.oracles ++
    operators.Graph.oracles
}
