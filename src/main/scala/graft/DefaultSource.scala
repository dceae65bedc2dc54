package graft

import graft.sources.{GraftRelation, GraftSource}
import org.apache.spark.sql.{DataFrame, SaveMode, SQLContext}
import org.apache.spark.sql.sources.{
  BaseRelation, CreatableRelationProvider, DataSourceRegister,
  RelationProvider}

/** Registers the `graft` format: `spark.read.format("graft")` and
  * `df.write.format("graft")` (see [[graft.sources.GraftSource]] for the
  * option surface). Spark's provider lookup resolves
  * `format("graft")` → `graft.DefaultSource`. */
class DefaultSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val lake = GraftSource.lakeFor(sqlContext, parameters)
    val table = parameters.getOrElse("table",
      throw new IllegalArgumentException("option table is required"))
    new GraftRelation(sqlContext, lake, table,
      parameters.get("version").map(_.toLong),
      parameters.get("timestamp").map(_.toLong))
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val lake = GraftSource.lakeFor(sqlContext, parameters)
    val table = parameters.getOrElse("table",
      throw new IllegalArgumentException("option table is required"))
    val exists = scala.util.Try(lake.schemaOf(table)).isSuccess
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalArgumentException(s"table $table already exists")
      case SaveMode.Ignore if exists => ()
      case SaveMode.Overwrite =>
        if (exists) {
          // snapshot-versioned truncate + append (old data stays
          // reachable via time travel, like the reference's DML model)
          lake.delete(table, org.apache.spark.sql.functions.lit(true))
          lake.append(table, data)
        } else lake.createTableAs(table, data)
      case _ => // Append / ErrorIfExists / Ignore on a fresh table
        if (exists) lake.append(table, data)
        else lake.createTableAs(table, data)
    }
    createRelation(sqlContext, parameters)
  }
}
