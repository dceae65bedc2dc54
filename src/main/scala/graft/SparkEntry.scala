package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by [[QueryPack]] modules; each pack covers one
  * slice of SURVEY.md §2's operator inventory.
  */
object SparkEntry {

  /** All query packs. Order is presentation-only. */
  def packs: Seq[QueryPack] = Seq(
    operators.RelationalQueries,
    operators.SubqueryQueries,
    operators.EngineSurfaceQueries,
    operators.StatsSurfaceQueries,
    operators.MoreTpchQueries,
    operators.EventQueries,
    operators.ClickBenchQueries,
    operators.LakeQueries,
    operators.MaintenanceQueries,
    operators.TypeSurfaceQueries,
    operators.PipelineQueries,
    operators.TrainingPipeline,
    operators.CorpusQueries,
    operators.SeriesQueries,
  )

  private lazy val all: Seq[QueryDef] = packs.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q5 shape: snowflake join + exact-decimal aggregation. */
  def entry(spark: SparkSession): DataFrame =
    all.find(_.name == "q5_join").get.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
