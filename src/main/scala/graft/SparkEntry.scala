package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` keys are the stable operator names from SURVEY.md §2.2/§7.5;
  * each takes (session, sfDir) and returns a deterministic DataFrame.
  * `oracleSql` holds the DuckDB-equivalent SQL for every oracle-able query
  * (same column names, same row order — the driver hash-compares after
  * sorting columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Aggregates.aggHashGroupby(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Scans.queries ++
      graft.queries.Joins.queries ++
      graft.queries.Aggregates.queries ++
      graft.queries.Windows.queries ++
      graft.queries.SortsSets.queries ++
      graft.queries.Subqueries.queries ++
      graft.queries.Composite.queries ++
      graft.queries.CompositeTpch.queries ++
      graft.queries.Graphs.queries ++
      graft.queries.Scalars.queries ++
      graft.queries.SourceFormats.queries ++
      graft.queries.IngestQueries.queries ++
      graft.llm.Dedup.queries ++
      graft.llm.Similarity.queries ++
      graft.llm.TextStats.queries ++
      graft.llm.Multimodal.queries ++
      graft.llm.Curation.queries ++
      graft.llm.Ranking.queries ++
      graft.streaming.StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Scans.oracles ++
      graft.queries.Joins.oracles ++
      graft.queries.Aggregates.oracles ++
      graft.queries.Windows.oracles ++
      graft.queries.SortsSets.oracles ++
      graft.queries.Subqueries.oracles ++
      graft.queries.Composite.oracles ++
      graft.queries.CompositeTpch.oracles ++
      graft.queries.Graphs.oracles ++
      graft.queries.Scalars.oracles ++
      graft.queries.SourceFormats.oracles ++
      graft.queries.IngestQueries.oracles ++
      graft.llm.Dedup.oracles ++
      graft.llm.Similarity.oracles ++
      graft.llm.TextStats.oracles ++
      graft.llm.Multimodal.oracles ++
      graft.llm.Curation.oracles ++
      graft.llm.Ranking.oracles ++
      graft.streaming.StreamQueries.oracles
}
