package graft.plans

import graft.catalog.Lake
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Attribute, AttributeReference, Expression, NamedExpression,
  PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LeafNode, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftshim.ColumnBridge

/** SQL-transparent lake access via Catalyst (SURVEY.md §4's "cleaner
  * long-term home"): `graft.<table>` resolves to a placeholder leaf during
  * analysis, and an operator-optimization rule expands it AFTER Catalyst
  * has pushed predicates down — so the conjuncts sitting on the relation
  * reach [[graft.catalog.MetadataManager.filesForScan]] as catalog stats/
  * partition pruning, exactly like the DataFrame path's `filter` argument
  * (reference ducklake_metadata_manager.cpp:1492-1593). Running inside the
  * fixed-point batch also lets column pruning and further pushdown
  * optimize ACROSS the expansion boundary.
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

/** Resolved stand-in for a lake table: carries stable attribute ids
  * through analysis; expanded by [[ExpandLakeScan]] once predicates have
  * been pushed onto it. `version`/`tsMs` carry SQL time travel
  * (`VERSION AS OF` / `TIMESTAMP AS OF`). */
case class LakeRelationPlaceholder(alias: String, table: String,
    output: Seq[Attribute], version: Option[Long] = None,
    tsMs: Option[Long] = None) extends LeafNode {
  /** Catalog-backed estimates (reference answers scan cardinality from
    * `ducklake_table_stats`, ducklake_multi_file_list.cpp:136-142): lets
    * every optimizer rule that fires BEFORE [[ExpandLakeScan]] — join
    * reorder under CBO, broadcast-threshold checks on not-yet-expanded
    * relations — see the table's real byte/row size instead of
    * `defaultSizeInBytes` (= "assume huge"). A small dimension read
    * through plain SQL thus broadcasts at 100 TB fact scale even when
    * the decision point precedes expansion. Cached per placeholder
    * instance; a registry/stats miss falls back to the conservative
    * default. */
  private lazy val catalogStats:
      org.apache.spark.sql.catalyst.plans.logical.Statistics = {
    val fromCatalog = for {
      lake <- LakeRegistry.get(alias)
      info <- scala.util.Try(
        lake.meta.tableByName(table.split('.').last,
          version.getOrElse(lake.currentSnapshotId()),
          if (table.contains('.')) table.split('.').head else "main"))
        .toOption.flatten
      st <- lake.meta.tableStats(info.tableId)
      if st.fileSizeBytes > 0 || st.recordCount > 0
    } yield org.apache.spark.sql.catalyst.plans.logical.Statistics(
      sizeInBytes = BigInt(st.fileSizeBytes max 1L),
      rowCount = Some(BigInt(st.recordCount)))
    fromCatalog.getOrElse(
      org.apache.spark.sql.catalyst.plans.logical.Statistics(
        sizeInBytes = conf.defaultSizeInBytes))
  }
  override def computeStats():
      org.apache.spark.sql.catalyst.plans.logical.Statistics = catalogStats
}

/** `spark.sql("INSERT INTO graft.t …")` → a lake append at execution
  * time. Append-only (INSERT OVERWRITE and static partition specs go
  * through `lake.sql` / the DataFrame API); the query child resolves
  * normally first, so column types are checked by the lake's own
  * appendAligned path. */
case class LakeInsertCommand(alias: String, table: String,
    query: LogicalPlan, userCols: Seq[String] = Nil)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(session: SparkSession)
      : Seq[org.apache.spark.sql.Row] = {
    val lake = LakeRegistry.get(alias).getOrElse(
      throw new IllegalStateException(s"lake alias $alias unregistered"))
    val df = org.apache.spark.sql.graftshim.DatasetBridge
      .ofRows(session, query)
    // SQL INSERT matches by POSITION (to the explicit column list when
    // given, else the full table schema) — the query's own output names
    // (VALUES' col1/col2…) never reach the files
    val names =
      if (userCols.nonEmpty) userCols
      else lake.schemaOf(table).fieldNames.toSeq
    require(df.columns.length == names.length,
      s"INSERT provides ${df.columns.length} columns, expected " +
        s"${names.length} (${names.mkString(", ")})")
    lake.append(table, df.toDF(names: _*))
    Nil
  }
}

/** CREATE [OR REPLACE] VIEW through plain spark.sql: stores the view's
  * original SQL text in the lake catalog (dialect 'spark'); reads
  * resolve through the placeholder expansion in the resolution rule. */
case class LakeCreateViewCommand(alias: String, name: String,
    viewSql: String, orReplace: Boolean)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(session: SparkSession)
      : Seq[org.apache.spark.sql.Row] = {
    val lake = LakeRegistry.get(alias).getOrElse(
      throw new IllegalStateException(s"lake alias $alias unregistered"))
    lake.createView(name, viewSql, orReplace = orReplace)
    Nil
  }
}

/** ALTER VIEW … RENAME TO through plain spark.sql. */
case class LakeRenameViewCommand(alias: String, name: String,
    newName: String)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(session: SparkSession)
      : Seq[org.apache.spark.sql.Row] = {
    val lake = LakeRegistry.get(alias).getOrElse(
      throw new IllegalStateException(s"lake alias $alias unregistered"))
    lake.renameView(name, newName)
    Nil
  }
}

/** DROP VIEW [IF EXISTS] through plain spark.sql. */
case class LakeDropViewCommand(alias: String, name: String,
    ifExists: Boolean)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(session: SparkSession)
      : Seq[org.apache.spark.sql.Row] = {
    val lake = LakeRegistry.get(alias).getOrElse(
      throw new IllegalStateException(s"lake alias $alias unregistered"))
    lake.dropView(name, ifExists = ifExists)
    Nil
  }
}

object LakeDml {
  /** re-anchor a resolved condition/value on column NAMES so it resolves
    * against the Lake API's own scan DataFrame */
  def toColumn(e: Expression): org.apache.spark.sql.Column =
    ColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    })
}

/** `spark.sql("DELETE FROM graft.t WHERE …")` → lake positional delete. */
case class LakeDeleteCommand(alias: String, table: String, cond: Expression)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(session: SparkSession)
      : Seq[org.apache.spark.sql.Row] = {
    val lake = LakeRegistry.get(alias).getOrElse(
      throw new IllegalStateException(s"lake alias $alias unregistered"))
    lake.delete(table, LakeDml.toColumn(cond))
    Nil
  }
}

/** `spark.sql("UPDATE graft.t SET … WHERE …")` → lake copy-on-write
  * update. */
case class LakeUpdateCommand(alias: String, table: String,
    assignments: Seq[(String, Expression)], cond: Option[Expression])
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(session: SparkSession)
      : Seq[org.apache.spark.sql.Row] = {
    val lake = LakeRegistry.get(alias).getOrElse(
      throw new IllegalStateException(s"lake alias $alias unregistered"))
    lake.update(table,
      assignments.map { case (n, v) => n -> LakeDml.toColumn(v) }.toMap,
      cond.map(LakeDml.toColumn).getOrElse(
        org.apache.spark.sql.functions.lit(true)))
    Nil
  }
}

/** `spark.sql("MERGE INTO graft.t t USING src s ON t.k = s.k …")` →
  * [[graft.catalog.Lake.merge]]. Values re-anchor on `t.`/`s.`-qualified
  * names (the aliases Lake.merge itself uses for the join). */
case class LakeMergeCommand(alias: String, table: String,
    source: LogicalPlan, sourceOutput: Seq[Attribute], onKey: String,
    update: Option[Seq[(String, Expression)]], delete: Boolean,
    insert: Boolean,
    matchedCond: Option[Expression] = None,
    notMatchedCond: Option[Expression] = None,
    bySourceDeleteCond: Option[Expression] = None,
    insertValues: Option[Seq[(String, Expression)]] = None)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  private def sideQualified(e: Expression): org.apache.spark.sql.Column = {
    val srcIds = sourceOutput.map(_.exprId).toSet
    ColumnBridge.column(e.transform {
      case a: AttributeReference =>
        val side = if (srcIds.contains(a.exprId)) "s" else "t"
        UnresolvedAttribute(Seq(side, a.name))
    })
  }

  override def run(session: SparkSession)
      : Seq[org.apache.spark.sql.Row] = {
    val lake = LakeRegistry.get(alias).getOrElse(
      throw new IllegalStateException(s"lake alias $alias unregistered"))
    val src = org.apache.spark.sql.graftshim.DatasetBridge
      .ofRows(session, source)
    lake.merge(table, src, onKey,
      whenMatchedUpdate = update.map(_.map { case (n, v) =>
        n -> sideQualified(v)
      }.toMap),
      whenMatchedDelete = delete,
      whenNotMatchedInsert = insert,
      matchedCondition = matchedCond.map(sideQualified),
      notMatchedCondition = notMatchedCond.map(sideQualified),
      notMatchedBySourceDelete = bySourceDeleteCond.map(sideQualified),
      notMatchedInsertValues = insertValues.map(_.map { case (n, v) =>
        n -> sideQualified(v)
      }))
    Nil
  }
}

case class ResolveLakeRelation(spark: SparkSession)
    extends Rule[LogicalPlan] {
  private def placeholder(alias: String, table: String,
      version: Option[Long] = None,
      tsMs: Option[Long] = None): LogicalPlan = {
    val lake = LakeRegistry.get(alias).get
    // time-travel reads resolve their attributes against the schema AT
    // that snapshot (columns may have been added/renamed since)
    val snapId = version.orElse(
      tsMs.map(ms => lake.meta.snapshotAtTime(ms).getOrElse(
        throw new IllegalArgumentException(
          s"no snapshot at time $ms for $table")).snapshotId))
    val attrs = lake.schemaOf(table, snapId).map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
    SubqueryAlias(table.split('.').last,
      LakeRelationPlaceholder(alias, table, attrs, version, tsMs))
  }
  private def lakeName(u: UnresolvedRelation): Option[(String, String)] =
    u.multipartIdentifier match {
      case Seq(alias, table) if LakeRegistry.get(alias).isDefined =>
        Some((alias, table))
      case Seq(alias, schema, table)
        if LakeRegistry.get(alias).isDefined =>
        Some((alias, s"$schema.$table"))
      case _ => None
    }
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      // INSERT INTO graft.t … → lake append command (append-only; the
      // query child must already be resolved so the append sees types).
      // The table child has usually already been rewritten to the
      // placeholder by the relation case below (children resolve first).
      case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement
          if i.query.resolved && i.partitionSpec.isEmpty && !i.overwrite =>
        i.table match {
          case SubqueryAlias(_, p: LakeRelationPlaceholder)
              if p.version.isEmpty && p.tsMs.isEmpty =>
            LakeInsertCommand(p.alias, p.table, i.query, i.userSpecifiedCols)
          case u: UnresolvedRelation if lakeName(u).isDefined =>
            val (alias, table) = lakeName(u).get
            LakeInsertCommand(alias, table, i.query, i.userSpecifiedCols)
          case _ => i
        }
      // DELETE FROM graft.t WHERE … / UPDATE graft.t SET … WHERE … →
      // lake row-level commands (condition re-anchored by column name)
      case d: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable
          if d.condition.resolved => d.table match {
        case SubqueryAlias(_, p: LakeRelationPlaceholder)
            if p.version.isEmpty && p.tsMs.isEmpty =>
          LakeDeleteCommand(p.alias, p.table, d.condition)
        case _ => d
      }
      case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable
          if u.assignments.forall(_.resolved) &&
            u.condition.forall(_.resolved) => u.table match {
        case SubqueryAlias(_, p: LakeRelationPlaceholder)
            if p.version.isEmpty && p.tsMs.isEmpty =>
          val assigns = u.assignments.map { a =>
            val name = a.key match {
              case ar: AttributeReference => ar.name
              case ua: UnresolvedAttribute => ua.name
              case other => throw new IllegalArgumentException(
                s"unsupported UPDATE target $other (top-level columns only)")
            }
            name -> a.value
          }
          LakeUpdateCommand(p.alias, p.table, assigns, u.condition)
        case _ => u
      }
      // MERGE INTO graft.t USING … — the shapes Lake.merge supports
      // (same-name key equality; star/simple actions with optional
      // per-action conditions; not-matched-by-source DELETE); anything
      // else stays for Spark's own error
      case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable
          if m.sourceTable.resolved && m.mergeCondition.resolved &&
            !m.withSchemaEvolution =>
        import org.apache.spark.sql.catalyst.plans.logical._
        val placeholderOpt = m.targetTable match {
          case SubqueryAlias(_, SubqueryAlias(_, p: LakeRelationPlaceholder))
              if p.version.isEmpty && p.tsMs.isEmpty => Some(p)
          case SubqueryAlias(_, p: LakeRelationPlaceholder)
              if p.version.isEmpty && p.tsMs.isEmpty => Some(p)
          case _ => None
        }
        val keyOpt = m.mergeCondition match {
          case org.apache.spark.sql.catalyst.expressions.EqualTo(
            a: AttributeReference, b: AttributeReference)
            if a.name == b.name => Some(a.name)
          case _ => None
        }
        (placeholderOpt, keyOpt) match {
          case (Some(p), Some(key)) =>
            val lake = LakeRegistry.get(p.alias).get
            val tableCols = lake.schemaOf(p.table).fieldNames.toSeq
            val srcAttrByName =
              m.sourceTable.output.map(a => a.name -> a).toMap
            // matched: one star/simple update, or one delete, or none —
            // each optionally gated by a resolved AND-condition
            val matchedOk: Option[(Option[Seq[(String, Expression)]],
                Boolean, Option[Expression])] = m.matchedActions match {
              case Nil => Some((None, false, None))
              case Seq(us: UpdateStarAction) if tableCols.forall(
                srcAttrByName.contains) && us.condition.forall(_.resolved) =>
                Some((Some(tableCols.map(c =>
                  c -> (srcAttrByName(c): Expression))), false, us.condition))
              case Seq(UpdateAction(cond, assigns, _))
                  if cond.forall(_.resolved) =>
                val pairs = assigns.map { a =>
                  a.key match {
                    case ar: AttributeReference => Some(ar.name -> a.value)
                    case _ => None
                  }
                }
                if (pairs.forall(_.isDefined))
                  Some((Some(pairs.flatten), false, cond))
                else None
              case Seq(DeleteAction(cond)) if cond.forall(_.resolved) =>
                Some((None, true, cond))
              case _ => None
            }
            // not-matched: star insert — or its post-analysis expansion
            // into identity assignments (each table column ← the
            // same-named source attribute) — or an explicit column list
            // `INSERT (a, b) VALUES (…)` (columns left out read their
            // table defaults) — or none. Triple: (insert?, condition,
            // explicit per-column values)
            val insertOk: Option[(Boolean, Option[Expression],
                Option[Seq[(String, Expression)]])] =
              m.notMatchedActions match {
                case Nil => Some((false, None, None))
                case Seq(is: InsertStarAction) if tableCols.forall(
                  srcAttrByName.contains) &&
                  is.condition.forall(_.resolved) =>
                  Some((true, is.condition, None))
                case Seq(InsertAction(cond, assigns))
                    if cond.forall(_.resolved) &&
                      assigns.size == tableCols.size &&
                      assigns.forall { a => (a.key, a.value) match {
                        case (k: AttributeReference, v: AttributeReference) =>
                          srcAttrByName.get(k.name)
                            .exists(_.exprId == v.exprId)
                        case _ => false
                      }} => Some((true, cond, None))
                case Seq(InsertAction(cond, assigns))
                    if cond.forall(_.resolved) &&
                      assigns.forall(a => a.value.resolved &&
                        (a.key match {
                          case _: AttributeReference => true
                          case u: UnresolvedAttribute => u.nameParts.size == 1
                          case _ => false
                        })) =>
                  Some((true, cond, Some(assigns.map { a =>
                    val name = a.key match {
                      case ar: AttributeReference => ar.name
                      case u: UnresolvedAttribute => u.nameParts.head
                    }
                    name -> a.value
                  })))
                case _ => None
              }
            // not-matched-by-source: outer None = unsupported shape;
            // Some(None) = no action; Some(Some(cond)) = DELETE gated by
            // cond (TrueLiteral for a bare DELETE)
            val bySource: Option[Option[Expression]] =
              m.notMatchedBySourceActions match {
                case Nil => Some(None)
                case Seq(DeleteAction(cond)) if cond.forall(_.resolved) =>
                  Some(Some(cond.getOrElse(
                    org.apache.spark.sql.catalyst.expressions
                      .Literal.TrueLiteral)))
                case _ => None
              }
            (matchedOk, insertOk, bySource) match {
              case (Some((upd, del, mCond)), Some((ins, iCond, iVals)),
                  Some(bs)) =>
                LakeMergeCommand(p.alias, p.table, m.sourceTable,
                  m.sourceTable.output, key, upd, del, ins,
                  matchedCond = mCond, notMatchedCond = iCond,
                  bySourceDeleteCond = bs, insertValues = iVals)
              case _ => m
            }
          case _ => m
        }
      // SQL time travel: SELECT … FROM graft.t VERSION AS OF n
      //                  / TIMESTAMP AS OF '…' (reference AT (VERSION =>))
      case tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel =>
        (tt.relation match {
          case u: UnresolvedRelation => lakeName(u)
          case _ => None
        }) match {
          case Some((alias, table)) =>
            val ver = tt.version.map(_.toLong)
            val ts = tt.timestamp.collect {
              case e if e.foldable =>
                val micros = org.apache.spark.sql.catalyst.expressions
                  .Cast(e, org.apache.spark.sql.types.TimestampType,
                    Some(spark.sessionState.conf.sessionLocalTimeZone))
                  .eval(null).asInstanceOf[Long]
                micros / 1000L
            }
            placeholder(alias, table, ver, ts)
          case None => tt
        }
      // CREATE [OR REPLACE] VIEW graft.v AS … / DROP VIEW graft.v — Spark
      // 4.1 has no V2 ViewCatalog execution path, so route the parsed
      // view commands to the lake's view DDL here (reference gets view
      // DDL free from DuckDB's catalog).
      case cv: org.apache.spark.sql.catalyst.plans.logical.CreateView =>
        (cv.child match {
          case ui: org.apache.spark.sql.catalyst.analysis
              .UnresolvedIdentifier => lakeIdent(ui.nameParts)
          case _ => None
        }) match {
          case Some((alias, name)) if cv.originalText.isDefined =>
            LakeCreateViewCommand(alias, name, cv.originalText.get,
              cv.replace)
          case _ => cv
        }
      // ALTER VIEW graft.v RENAME TO v2 — same no-V2-path situation
      case rt: org.apache.spark.sql.catalyst.plans.logical.RenameTable
          if rt.isView =>
        (rt.child match {
          case u: org.apache.spark.sql.catalyst.analysis
              .UnresolvedTableOrView => lakeIdent(u.multipartIdentifier)
          case ui: org.apache.spark.sql.catalyst.analysis
              .UnresolvedIdentifier => lakeIdent(ui.nameParts)
          case _ => None
        }) match {
          case Some((alias, name)) =>
            // normalize the target: drop a leading catalog alias, and a
            // bare target inherits the source's schema so non-main views
            // rename in place (ALTER VIEW graft.raw.v RENAME TO v2)
            val tgtParts = rt.newName.toList match {
              case a :: rest if a == alias && rest.nonEmpty => rest
              case parts => parts
            }
            val srcSchema = name.split('.') match {
              case Array(s, _) => Some(s)
              case _ => None
            }
            val target = tgtParts match {
              case List(n) =>
                srcSchema.map(s => s"$s.$n").getOrElse(n)
              case parts => parts.mkString(".")
            }
            LakeRenameViewCommand(alias, name, target)
          case _ => rt
        }
      case dv: org.apache.spark.sql.catalyst.plans.logical.DropView =>
        (dv.child match {
          case ui: org.apache.spark.sql.catalyst.analysis
              .UnresolvedIdentifier => lakeIdent(ui.nameParts)
          case _ => None
        }) match {
          case Some((alias, name)) =>
            LakeDropViewCommand(alias, name, dv.ifExists)
          case _ => dv
        }
      case u: UnresolvedRelation if lakeName(u).isDefined =>
        val (alias, table) = lakeName(u).get
        viewOrPlaceholder(alias, table)
    }

  private def lakeIdent(parts: Seq[String]): Option[(String, String)] =
    parts match {
      case Seq(alias, name) if LakeRegistry.get(alias).isDefined =>
        Some((alias, name))
      case Seq(alias, schema, name) if LakeRegistry.get(alias).isDefined =>
        Some((alias, s"$schema.$name"))
      case _ => None
    }

  /** `graft.v` where v is a lake VIEW expands to the view's stored SQL
    * with bare lake relation names qualified by the alias — nested views
    * expand eagerly here (depth-first, cycle-checked) and base tables
    * resolve through this same rule, so catalog stats/partition pruning
    * reaches every base scan under the view (reference view tests: views
    * query like tables; view_tosql semantics). Tables take the
    * placeholder path unchanged. A self- or mutually-recursive view
    * chain fails with a clean "recursive view" error (the reference
    * fails with a max-depth error; Spark's fixpoint analyzer would
    * otherwise surface a confusing max-iterations internal error). */
  private def viewOrPlaceholder(alias: String, table: String): LogicalPlan =
    expandView(alias, table, List.empty)

  private def expandView(alias: String, table: String,
      stack: List[String]): LogicalPlan = {
    val lake = LakeRegistry.get(alias).get
    val (schema, name) = table.split('.') match {
      case Array(s, t) => (s, t)
      case _ => ("main", table)
    }
    val key = s"$schema.$name"
    val sid = lake.currentSnapshotId()
    lake.viewSqlAt(schema, name) match {
      case Some(viewSql) =>
        if (stack.contains(key))
          throw new IllegalArgumentException(
            s"recursive lake view: ${(key :: stack).reverse.mkString(" -> ")}")
        val body = spark.sessionState.sqlParser.parsePlan(viewSql)
        def isView(s: String, t: String): Boolean =
          lake.meta.viewByName(t, sid, s).isDefined
        def isTable(s: String, t: String): Boolean =
          lake.meta.tableByName(t, sid, s).isDefined
        val qualified = body.transformDownWithSubqueries {
          case ur: UnresolvedRelation => ur.multipartIdentifier match {
            case Seq(t) if isView("main", t) =>
              expandView(alias, t, key :: stack)
            case Seq(s, t) if LakeRegistry.get(s).isEmpty && isView(s, t) =>
              expandView(alias, s"$s.$t", key :: stack)
            // alias-qualified nested views must expand HERE too (with the
            // stack) — leaving them for the analyzer rule would restart
            // cycle detection from an empty stack and loop
            case Seq(a, t) if LakeRegistry.get(a).isDefined &&
                a == alias && isView("main", t) =>
              expandView(alias, t, key :: stack)
            case Seq(a, s, t) if LakeRegistry.get(a).isDefined &&
                a == alias && isView(s, t) =>
              expandView(alias, s"$s.$t", key :: stack)
            case Seq(t) if isTable("main", t) =>
              UnresolvedRelation(Seq(alias, t))
            case Seq(s, t) if LakeRegistry.get(s).isEmpty && isTable(s, t) =>
              UnresolvedRelation(Seq(alias, s, t))
            case _ => ur
          }
        }
        SubqueryAlias(name, qualified)
      case None => placeholder(alias, table)
    }
  }
}

/** Unfiltered `COUNT(*)` over a lake table → a [[LocalRelation]] holding
  * the catalog's exact row count ([[graft.catalog.Lake.fastCount]]) — the
  * 100 TB scan never launches. Injected BEFORE [[ExpandLakeScan]] in the
  * operator-optimization batch so it sees the placeholder; any Filter on
  * the relation (or an open transaction) leaves the plan untouched.
  * Projects below the Aggregate are count-preserving and skipped over.
  * Reference analogue: COUNT(*) answered from parquet footer metadata
  * (metadata_cache.test) and estimated_size from catalog stats
  * (table_cardinality.test). */
case class LakeCountFromStats(spark: SparkSession)
    extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.catalyst.expressions.aggregate.{
    AggregateExpression, Complete, Count}
  import org.apache.spark.sql.catalyst.plans.logical.{
    Aggregate, LocalRelation}

  import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, Min}

  /** What a no-grouping aggregate expression folds to: count-star, or a
    * MIN/MAX over a placeholder output column. */
  private sealed trait Fold
  private case object CountStar extends Fold
  private case class Extremum(column: String, isMax: Boolean) extends Fold

  private def foldOf(e: NamedExpression,
      p: LakeRelationPlaceholder): Option[Fold] = e match {
    case Alias(AggregateExpression(Count(Seq(_: Literal)), Complete, false,
      None, _), _) => Some(CountStar)
    case Alias(AggregateExpression(Min(ar: AttributeReference), Complete,
      false, None, _), _) =>
      p.output.find(_.exprId == ar.exprId).map(a => Extremum(a.name, false))
    case Alias(AggregateExpression(Max(ar: AttributeReference), Complete,
      false, None, _), _) =>
      p.output.find(_.exprId == ar.exprId).map(a => Extremum(a.name, true))
    case _ => None
  }

  /** the placeholder under count-preserving operators only */
  private def placeholderOf(plan: LogicalPlan)
      : Option[LakeRelationPlaceholder] = plan match {
    case p: LakeRelationPlaceholder => Some(p)
    case Project(_, child) => placeholderOf(child)
    case SubqueryAlias(_, child) => placeholderOf(child)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformDownWithSubqueries {
      case a @ Aggregate(Nil, aggExprs, child, _)
          if aggExprs.nonEmpty && placeholderOf(child).isDefined &&
            aggExprs.forall(e =>
              foldOf(e, placeholderOf(child).get).isDefined) =>
        val p = placeholderOf(child).get
        val folds = aggExprs.map(e => foldOf(e, p).get)
        LakeRegistry.get(p.alias).flatMap { lake =>
          // MIN/MAX folds only at the CURRENT snapshot (historical global
          // stats are not versioned); count folds at any snapshot
          lazy val cnt = lake.fastCount(p.table, p.version, p.tsMs)
          lazy val extrema: Map[String, Option[(Any, Any)]] =
            folds.collect { case Extremum(c, _) => c }.distinct
              .map(c => c -> (if (p.version.isEmpty && p.tsMs.isEmpty)
                lake.fastExtrema(p.table, c) else None)).toMap
          val vals = folds.map {
            case CountStar => cnt
            case Extremum(c, isMax) =>
              extrema(c).map(mm => if (isMax) mm._2 else mm._1)
          }
          if (vals.forall(_.isDefined))
            Some(LocalRelation(a.output.map(_.toAttribute),
              Seq(org.apache.spark.sql.catalyst.InternalRow(
                vals.map(_.get): _*))))
          else None
        }.getOrElse(a)
    }
}

/** Top-N file pruning (reference topn_file_pruning.test's dynamic
  * filter): `ORDER BY col [DESC] LIMIT k` over a bare lake relation gets
  * a stats-proven threshold filter injected under the Sort. The filter
  * is semantics-preserving ([[graft.catalog.Lake.topNThreshold]]'s
  * guards) and [[ExpandLakeScan]] turns it into a catalog file-list cut
  * — the top-k of a year of range-clustered data reads one file, not
  * the table. */
case class LakeTopNPruning(spark: SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{
    Descending, GreaterThanOrEqual, IntegerLiteral, LessThanOrEqual,
    Literal, NullsFirst, SortOrder}
  import org.apache.spark.sql.catalyst.plans.logical.{
    GlobalLimit, LocalLimit, Sort}

  /** placeholder under pass-through nodes; a Filter stops the search —
    * its row-count effect would break the threshold proof (and marks an
    * already-injected plan) */
  private def placeholderOf(plan: LogicalPlan)
      : Option[LakeRelationPlaceholder] = plan match {
    case p: LakeRelationPlaceholder => Some(p)
    case Project(pl, child) if pl.forall(_.isInstanceOf[Attribute]) =>
      placeholderOf(child)
    case SubqueryAlias(_, child) => placeholderOf(child)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformDownWithSubqueries {
      case g @ GlobalLimit(IntegerLiteral(k),
          ll @ LocalLimit(_, srt @ Sort(order, true, child, _)))
          if order.nonEmpty && placeholderOf(child).isDefined =>
        val p = placeholderOf(child).get
        val injected = for {
          _ <- Option.when(p.version.isEmpty && p.tsMs.isEmpty)(())
          so = order.head
          ar <- so.child match {
            case a: AttributeReference => Some(a)
            case _ => None
          }
          col <- p.output.find(_.exprId == ar.exprId).map(_.name)
          lake <- LakeRegistry.get(p.alias)
          desc = so.direction == Descending
          t <- lake.topNThreshold(p.table, col, k.toLong, desc,
            nullsLead = so.nullOrdering == NullsFirst)
        } yield {
          val cond =
            if (desc) GreaterThanOrEqual(ar, Literal(t, ar.dataType))
            else LessThanOrEqual(ar, Literal(t, ar.dataType))
          // inject DIRECTLY above the placeholder so ExpandLakeScan's
          // Filter-adjacent case turns it into a file-list cut in this
          // same optimizer iteration (the placeholder would otherwise be
          // expanded un-pruned before pushdown runs again)
          val pruned = child.transformUp {
            case pp: LakeRelationPlaceholder if pp.fastEquals(p) =>
              Filter(cond, pp)
          }
          g.copy(child = ll.copy(child = srt.copy(child = pruned)))
        }
        injected.getOrElse(g)
    }
}

/** Expands [[LakeRelationPlaceholder]] into the lake's pruned scan.
  * Runs at the END of the operator-optimization batch (after the standard
  * pushdown rules in each iteration): a `Filter` directly above the
  * placeholder carries every predicate Catalyst could push, and its
  * deterministic subquery-free conjuncts become the catalog pruning
  * filter. The full Filter stays on top for exactness — pruning only
  * shrinks the file list. */
case class ExpandLakeScan(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformDownWithSubqueries {
      case f @ Filter(cond, p: LakeRelationPlaceholder) =>
        val pushable = splitConjunctivePredicates(cond)
          .filter(c => c.deterministic && !c.exists(
            _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]))
        f.copy(child = expand(p, pushable.reduceOption(And)))
      case p: LakeRelationPlaceholder => expand(p, None)
    }

  private def expand(p: LakeRelationPlaceholder,
      pruneCond: Option[Expression]): LogicalPlan = {
    val lake = LakeRegistry.get(p.alias).getOrElse(
      throw new IllegalStateException(s"lake alias ${p.alias} unregistered"))
    // re-anchor the condition on column NAMES so it resolves against the
    // freshly-built scan DataFrame (exprIds differ)
    val filterCol = pruneCond.map { c =>
      ColumnBridge.column(c.transform {
        case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
      })
    }
    val scanned = p.version match {
      case Some(v) => lake.tableAtVersion(p.table, v, filterCol)
      case None => p.tsMs match {
        case Some(ms) => lake.tableAtTime(p.table, ms, filterCol)
        case None => lake.table(p.table, filterCol)
      }
    }
    val child = scanned.queryExecution.optimizedPlan
    // map the scan's output onto the placeholder's stable attribute ids
    val aliases: Seq[NamedExpression] =
      p.output.zip(child.output).map { case (want, have) =>
        Alias(have, want.name)(exprId = want.exprId)
      }
    Project(aliases, child)
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // hint-resolution batch runs BEFORE the main Resolution batch, so
    // graft.<schema>.<table> is rewritten before the builtin relation
    // resolver rejects the three-part name (REQUIRES_SINGLE_PART_NAMESPACE)
    e.injectHintResolutionRule(ResolveLakeRelation)
    e.injectResolutionRule(ResolveLakeRelation)
    // order matters: the count rewrite must see the placeholder before
    // ExpandLakeScan replaces it with the physical file scan
    e.injectOptimizerRule(LakeCountFromStats)
    e.injectOptimizerRule(LakeTopNPruning)
    e.injectOptimizerRule(ExpandLakeScan)

    // lake scalar functions in SQL (the reference registers murmur3_32 and
    // the spatial surface at extension load, ducklake_extension.cpp)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Cast, ExpressionInfo}
    import org.apache.spark.sql.types.DoubleType
    def info(name: String, clazz: Class[_]) =
      new ExpressionInfo(clazz.getName, name)
    e.injectFunction((FunctionIdentifier("murmur3_32"),
      info("murmur3_32", classOf[graft.functions.Murmur3Hash32]),
      (args: Seq[Expression]) => graft.functions.Murmur3Hash32(args.head)))
    e.injectFunction((FunctionIdentifier("st_point"),
      info("st_point", classOf[graft.functions.StPoint]),
      (args: Seq[Expression]) => graft.functions.StPoint(
        Cast(args(0), DoubleType), Cast(args(1), DoubleType))))
    e.injectFunction((FunctionIdentifier("st_hilbert"),
      info("st_hilbert", classOf[graft.functions.StHilbert]),
      (args: Seq[Expression]) => graft.functions.StHilbert(
        args.head +: args.tail.map(Cast(_, DoubleType)))))
    e.injectFunction((FunctionIdentifier("st_bbox_intersects"),
      info("st_bbox_intersects", classOf[graft.functions.StBboxIntersects]),
      (args: Seq[Expression]) => graft.functions.StBboxIntersects(
        args.head +: args.tail.map(Cast(_, DoubleType)))))
    // bounded_topk(k, sort_struct, payload_struct) → array<payload> of the
    // k smallest sort keys — the SQL spelling of the size-capped
    // top-n-per-group aggregate (negate a numeric field for DESC)
    e.injectFunction((FunctionIdentifier("bounded_topk"),
      info("bounded_topk", classOf[graft.functions.BoundedTopKAgg]),
      (args: Seq[Expression]) => {
        val k = args.head match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(v: Number, _) => v.intValue()
          case other => throw new IllegalArgumentException(
            s"bounded_topk k must be an integer literal, got $other")
        }
        graft.functions.BoundedTopKAgg(args(1), args(2), k)
          .toAggregateExpression()
      }))
  }
}
