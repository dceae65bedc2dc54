package graft.sources

import graft.catalog.Lake
import graft.plans.LakeRegistry
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** `spark.read.format("graft")` / `df.write.format("graft")` surface.
  *
  * Options: `catalog` + `data` (attach paths) or `alias` (a lake already
  * registered in [[LakeRegistry]]); `table` (may be schema-qualified);
  * read-only `version` / `timestamp` for time travel (reference AT
  * VERSION/TIMESTAMP clause).
  *
  * Reads convert pushed source filters to Columns so the lake's
  * catalog-side file pruning and parquet pushdown both apply; all filters
  * are reported unhandled so Spark re-evaluates them (pruning is an
  * optimization, never a correctness dependency). The SQL-transparent
  * Catalyst extension ([[graft.plans.GraftExtensions]]) remains the
  * higher-performance path (whole-stage codegen end to end); this DSv1
  * relation adds the format() spelling with row-level compatibility.
  */
private[graft] object GraftSource {
  def lakeFor(sqlContext: SQLContext,
      parameters: Map[String, String]): Lake =
    parameters.get("alias") match {
      case Some(a) => LakeRegistry.get(a).getOrElse(
        throw new IllegalArgumentException(s"no registered lake alias $a"))
      case None =>
        val cat = parameters.getOrElse("catalog",
          throw new IllegalArgumentException(
            "option catalog (or alias) is required"))
        val data = parameters.getOrElse("data",
          throw new IllegalArgumentException(
            "option data (or alias) is required"))
        Lake.attach(sqlContext.sparkSession, cat, data)
    }

  /** best-effort source-filter → Column; None when not expressible */
  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === v)
    case GreaterThan(a, v) => Some(col(a) > v)
    case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case LessThan(a, v) => Some(col(a) < v)
    case LessThanOrEqual(a, v) => Some(col(a) <= v)
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case And(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case Or(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case _ => None
  }
}

final class GraftRelation(
    @transient val sqlContext: SQLContext,
    lake: Lake,
    table: String,
    version: Option[Long],
    timestampMs: Option[Long])
    extends BaseRelation with PrunedFilteredScan {

  private def base(filter: Option[Column]): DataFrame = (version,
    timestampMs) match {
    case (Some(v), _) => lake.tableAtVersion(table, v, filter)
    case (_, Some(ts)) => lake.tableAtTime(table, ts, filter)
    case _ => lake.table(table, filter)
  }

  override def schema: StructType = version match {
    case Some(v) => lake.schemaOf(table, Some(v))
    case None => lake.schemaOf(table)
  }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val cond = filters.flatMap(GraftSource.toColumn)
      .reduceOption(_ && _)
    val df = base(cond)
    val projected =
      if (requiredColumns.isEmpty) df.select(col(df.columns.head))
      else df.select(requiredColumns.map(col).toIndexedSeq: _*)
    projected.rdd
  }

  // pruning is advisory: Spark re-applies every filter on the rows
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters
}
