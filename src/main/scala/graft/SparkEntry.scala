package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggs.queries("agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Aggs.queries ++ Joins.queries ++
      Scalars.queries ++ Windows.queries ++ Text.queries ++ Vector.queries ++
      Udx.queries ++ graft.streaming.Streams.queries ++
      TextQuality.queries ++ Dedup.queries ++ Ann.queries ++
      Multimodal.queries ++ Pipeline.queries ++ Sinks.queries ++
      Analytics.queries ++ Warehouse.queries ++ Bpe.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Aggs.oracles ++ Joins.oracles ++
      Scalars.oracles ++ Windows.oracles ++ Text.oracles ++ Vector.oracles ++
      Udx.oracles ++ graft.streaming.Streams.oracles ++
      TextQuality.oracles ++ Dedup.oracles ++ Ann.oracles ++
      Multimodal.oracles ++ Pipeline.oracles ++ Sinks.oracles ++
      Analytics.oracles ++ Warehouse.oracles ++ Bpe.oracles
}
