package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each module under graft.operators contributes a map of named queries
  * (one per capability row of SURVEY.md §2) plus, where ANSI-SQL
  * expressible, a DuckDB oracle query producing identical columns/values.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    QueryModule(Relational.queries, Relational.oracle),
    QueryModule(Aggregates.queries, Aggregates.oracle),
    QueryModule(Windows.queries, Windows.oracle),
    QueryModule(Functions.queries, Functions.oracle),
    QueryModule(Dedup.queries, Dedup.oracle),
    QueryModule(Curation.queries, Curation.oracle),
    QueryModule(Similarity.queries, Similarity.oracle),
    QueryModule(Clustering.queries, Clustering.oracle),
    QueryModule(TextAnalysis.queries, TextAnalysis.oracle),
    QueryModule(Events.queries, Events.oracle),
    QueryModule(AsOfJoin.queries, AsOfJoin.oracle),
    QueryModule(RangeJoin.queries, RangeJoin.oracle),
    QueryModule(Multimodal.queries, Multimodal.oracle),
    QueryModule(MatchPath.queries, MatchPath.oracle),
    QueryModule(Graph.queries, Graph.oracle),
    QueryModule(Profiling.queries, Profiling.oracle),
    QueryModule(Statistics.queries, Statistics.oracle),
    QueryModule(graft.sources.HiveBucketedIO.queries,
      graft.sources.HiveBucketedIO.oracle),
    QueryModule(graft.sources.RCFileIO.queries,
      graft.sources.RCFileIO.oracle),
    QueryModule(Compactor.queries, Compactor.oracle),
    QueryModule(graft.sources.SymlinkTextIO.queries,
      graft.sources.SymlinkTextIO.oracle),
    QueryModule(graft.sources.SchemaEvolutionIO.queries,
      graft.sources.SchemaEvolutionIO.oracle),
    QueryModule(graft.sources.ExportImport.queries,
      graft.sources.ExportImport.oracle),
    QueryModule(graft.sources.LoadData.queries,
      graft.sources.LoadData.oracle),
    QueryModule(graft.tools.GraftCli.queries, graft.tools.GraftCli.oracle)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_.oracle).toMap
}

/** A bundle of harness queries + their DuckDB oracles. */
final case class QueryModule(
    queries: Map[String, (SparkSession, String) => DataFrame],
    oracle: Map[String, String])
