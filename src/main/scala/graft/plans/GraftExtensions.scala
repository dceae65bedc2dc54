package graft.plans

import graft.catalog.Lake
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

/** SQL-transparent lake access via Catalyst (SURVEY.md §4's "cleaner
  * long-term home"): a resolution rule rewrites `graft.<table>` (or any
  * registered catalog alias) into the lake's pruned-scan plan, so plain
  * `spark.sql("SELECT ... FROM graft.events")` hits the catalog file
  * list, stats pruning, delete filters and inlined rows — no DSv2
  * machinery, no temp views.
  *
  * Register with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.plans.GraftExtensions`), then
  * `LakeRegistry.register("graft", lake)`.
  */
object LakeRegistry {
  private val lakes =
    new java.util.concurrent.ConcurrentHashMap[String, Lake]()

  def register(alias: String, lake: Lake): Unit = lakes.put(alias, lake)
  def unregister(alias: String): Unit = lakes.remove(alias)
  def get(alias: String): Option[Lake] = Option(lakes.get(alias))
}

case class ResolveLakeRelation(spark: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if u.multipartIdentifier.length == 2 =>
        val Seq(alias, table) = u.multipartIdentifier
        LakeRegistry.get(alias) match {
          case Some(lake) =>
            SubqueryAlias(table,
              lake.table(table).queryExecution.analyzed)
          case None => u
        }
      // graft.<schema>.<table> → non-main lake schemas
      case u: UnresolvedRelation if u.multipartIdentifier.length == 3 =>
        val Seq(alias, schema, table) = u.multipartIdentifier
        LakeRegistry.get(alias) match {
          case Some(lake) =>
            SubqueryAlias(table,
              lake.table(s"$schema.$table").queryExecution.analyzed)
          case None => u
        }
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // hint-resolution batch runs BEFORE the main Resolution batch, so
    // graft.<schema>.<table> is rewritten before the builtin relation
    // resolver rejects the three-part name (REQUIRES_SINGLE_PART_NAMESPACE)
    e.injectHintResolutionRule(ResolveLakeRelation)
    e.injectResolutionRule(ResolveLakeRelation)
  }
}
