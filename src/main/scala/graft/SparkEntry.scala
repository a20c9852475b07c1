package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed per module; each pairs a Spark implementation
  * with DuckDB oracle SQL (QuerySpec).
  */
object SparkEntry {
  /** Every registered capability, in module order. */
  def specs: Seq[QuerySpec] =
    CdcQueries.all ++ RelationalQueries.all ++ TpchShapes.all ++
      TextQueries.all ++ DedupQueries.all ++
      SimilarityQueries.all ++ MultimodalQueries.all ++
      PipelineQueries.all ++ StatQueries.all

  private lazy val maps = QuerySpec.toMaps(specs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY §7.2 minimum end-to-end slice: PITR snapshot ⊕ CDC replay.
    */
  def entry(spark: SparkSession): DataFrame =
    maps._1("cdc_restore_replay")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = maps._1

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = maps._2
}
