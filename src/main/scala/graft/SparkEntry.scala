package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are organized into [[QueryPack]]s under `graft.operators`; each
  * pack covers one band of the SURVEY.md §3B operator inventory and carries
  * its own DuckDB oracle SQL. Registration here is the single source of
  * truth the driver sees.
  */
object SparkEntry {

  /** All packs, in §3B order. Adding a pack here registers its queries and
    * oracles atomically. */
  private val packs: Seq[QueryPack] = Seq(
    operators.Relational,
    operators.Aggregations,
    operators.Windows,
    operators.Scalars,
    operators.LlmPipeline,
    operators.Curation,
    operators.TextMining,
    operators.Vectors,
    operators.Streaming,
    operators.Layout,
    operators.Profiling,
    operators.Graphs,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * = §3B #15 pricing-summary hash aggregate (SNOWAV band/total reduce
    * analog). */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_hash")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §3B. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
