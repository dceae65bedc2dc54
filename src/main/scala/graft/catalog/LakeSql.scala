package graft.catalog

import java.util.Locale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** SQL statement front-end for [[Lake.sql]]. The reference drives every
  * table operation through SQL (INSERT/UPDATE/DELETE/MERGE INTO, CREATE /
  * ALTER / DROP TABLE — reference test/sql corpus), so the Spark engine
  * accepts the same statement shapes and routes them to the Lake API;
  * anything unrecognized is treated as a query and delegated to Spark SQL
  * (views of the current snapshot pre-registered). Scalar expressions use
  * Spark SQL syntax — the "spark" dialect of the stored-view/macro model.
  *
  * DML results follow DuckDB's convention of returning an affected-row
  * "Count" column.
  */
private[catalog] object LakeSql {

  private val Insert =
    """(?is)^INSERT\s+INTO\s+([\w$.]+)\s*(?:\(([^)]*)\)\s*)?((?:SELECT|WITH|VALUES|TABLE)\b.*)$""".r
  private val Delete =
    """(?is)^DELETE\s+FROM\s+([\w$.]+)(?:\s+WHERE\s+(.+))?$""".r
  private val Update =
    """(?is)^UPDATE\s+([\w$.]+)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+))?$""".r
  private val Ctas =
    """(?is)^CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+([\w$.]+)\s+AS\s+(.+)$""".r
  private val CreateTable =
    """(?is)^CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w$.]+)\s*\((.+)\)\s*$""".r
  private val DropTable =
    """(?is)^DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([\w$.]+)\s*$""".r
  private val CreateSchema =
    """(?is)^CREATE\s+SCHEMA\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w$]+)\s*$""".r
  private val DropSchema =
    """(?is)^DROP\s+SCHEMA\s+([\w$]+)\s*$""".r
  private val CreateView =
    """(?is)^CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+([\w$.]+)\s+AS\s+(.+)$""".r
  private val DropView =
    """(?is)^DROP\s+VIEW\s+(IF\s+EXISTS\s+)?([\w$.]+)$""".r
  private val RenameTable =
    """(?is)^ALTER\s+TABLE\s+([\w$]+)\s+RENAME\s+TO\s+([\w$]+)\s*$""".r
  private val RenameView =
    """(?is)^ALTER\s+VIEW\s+([\w$.]+)\s+RENAME\s+TO\s+([\w$.]+)\s*$""".r
  private val RenameColumn =
    """(?is)^ALTER\s+TABLE\s+([\w$]+)\s+RENAME\s+(?:COLUMN\s+)?([\w$.]+)\s+TO\s+([\w$]+)\s*$""".r
  private val AddColumn =
    """(?is)^ALTER\s+TABLE\s+([\w$]+)\s+ADD\s+(?:COLUMN|FIELD)\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w$.]+)\s+(.+?)(?:\s+DEFAULT\s+(.+))?\s*$""".r
  private val DropColumn =
    """(?is)^ALTER\s+TABLE\s+([\w$]+)\s+DROP\s+(?:COLUMN|FIELD)\s+([\w$.]+)\s*$""".r
  private val AlterType =
    """(?is)^ALTER\s+TABLE\s+([\w$]+)\s+ALTER\s+(?:COLUMN\s+)?([\w$]+)\s+(?:SET\s+DATA\s+)?TYPE\s+(.+?)\s*$""".r
  private val SetDefault =
    """(?is)^ALTER\s+TABLE\s+([\w$]+)\s+ALTER\s+(?:COLUMN\s+)?([\w$]+)\s+SET\s+DEFAULT\s+(.+?)\s*$""".r
  private val DropDefault =
    """(?is)^ALTER\s+TABLE\s+([\w$]+)\s+ALTER\s+(?:COLUMN\s+)?([\w$]+)\s+DROP\s+DEFAULT\s*$""".r
  private val SetNotNull =
    """(?is)^ALTER\s+TABLE\s+([\w$]+)\s+ALTER\s+(?:COLUMN\s+)?([\w$]+)\s+SET\s+NOT\s+NULL\s*$""".r
  private val DropNotNull =
    """(?is)^ALTER\s+TABLE\s+([\w$]+)\s+ALTER\s+(?:COLUMN\s+)?([\w$]+)\s+DROP\s+NOT\s+NULL\s*$""".r
  private val SetSortedBy =
    """(?is)^ALTER\s+TABLE\s+([\w$.]+)\s+SET\s+SORTED\s+BY\s*\((.+)\)\s*$""".r
  private val ResetSortedBy =
    """(?is)^ALTER\s+TABLE\s+([\w$.]+)\s+RESET\s+SORTED\s+BY\s*;?\s*$""".r
  private val SetPartitionedBy =
    """(?is)^ALTER\s+TABLE\s+([\w$.]+)\s+SET\s+PARTITIONED\s+BY\s*\((.+)\)\s*$""".r
  private val ResetPartitionedBy =
    """(?is)^ALTER\s+TABLE\s+([\w$.]+)\s+RESET\s+PARTITIONED\s+BY\s*;?\s*$""".r
  private val CommentOn =
    """(?is)^COMMENT\s+ON\s+(TABLE|VIEW|COLUMN)\s+([\w$.]+)\s+IS\s+(.+?)\s*$""".r
  private val Call =
    """(?is)^CALL\s+(?:ducklake[._])?(\w+)\s*\(([^)]*)\)\s*$""".r
  private val CreateSecret =
    """(?is)^CREATE\s+(OR\s+REPLACE\s+)?SECRET\s+([\w$]+)\s*\((.+)\)\s*$""".r
  private val DropSecret =
    """(?is)^DROP\s+SECRET\s+([\w$]+)\s*$""".r
  private val Begin =
    """(?is)^(?:BEGIN|START)(?:\s+TRANSACTION)?\s*$""".r
  private val Commit = """(?is)^COMMIT\s*$""".r
  private val Rollback = """(?is)^(?:ROLLBACK|ABORT)\s*$""".r
  private val Checkpoint = """(?is)^(?:FORCE\s+)?CHECKPOINT\s*$""".r
  private val Merge =
    """(?is)^MERGE\s+INTO\s+([\w$]+)(?:\s+(?:AS\s+)?(\w+))?\s+USING\s+(.+?)\s+ON\s+(.+?)\s+(WHEN\s+.+)$""".r
  private val CreateMacro =
    """(?is)^CREATE\s+(OR\s+REPLACE\s+)?MACRO\s+([\w$.]+)\s*(\(.+)$""".r
  private val Describe =
    """(?is)^DESC(?:RIBE)?\s+(?:TABLE\s+)?([\w$.]+)\s*$""".r
  private val ShowTables =
    """(?is)^SHOW\s+TABLES(?:\s+(?:FROM|IN)\s+([\w$]+))?\s*$""".r
  private val ShowViews =
    """(?is)^SHOW\s+VIEWS(?:\s+(?:FROM|IN)\s+([\w$]+))?\s*$""".r
  private val DropMacro =
    """(?is)^DROP\s+MACRO\s+(TABLE\s+)?(IF\s+EXISTS\s+)?([\w$.]+)\s*$""".r

  /** Try to handle `stmt` as a DML/DDL statement; None → plain query. */
  def dispatch(lake: Lake, spark: SparkSession, stmt: String,
      runQuery: String => DataFrame): Option[DataFrame] = {
    import spark.implicits._
    def count(n: Long): DataFrame = Seq(n).toDF("Count")

    stmt match {
      case CreateSecret(orReplace, name, body) => Some {
        // CREATE SECRET name (TYPE S3, KEY_ID 'k', SECRET 's',
        //   SCOPE 's3a://bucket/') — reference ducklake_secret.cpp /
        // test/sql/secrets syntax
        val kv = splitTop(body).map(_.trim).filter(_.nonEmpty).map { e =>
          val i = e.indexWhere(ch => ch == ' ' || ch == '\t')
          require(i > 0, s"bad secret parameter: $e")
          (e.substring(0, i).trim.toLowerCase(Locale.ROOT),
            stripQuotes(e.substring(i + 1).trim))
        }.toMap
        val tpe = kv.getOrElse("type", "generic")
        val scope = kv.get("scope").toSeq.flatMap(_.split(';'))
          .filter(_.nonEmpty)
        Secrets.create(Secrets.Secret(name, tpe,
          kv - "type" - "scope", scope),
          orReplace = orReplace != null)
        count(1)
      }

      case DropSecret(name) => Some { Secrets.drop(name); count(1) }

      case Insert(tbl, colList, query) => Some {
        val df0 = runQuery(query)
        val names = Option(colList).map(_.split(",").map(_.trim).toSeq)
        val tableCols = lake.schemaOf(tbl).fieldNames.toSeq
        val df = names match {
          case Some(ns) => df0.toDF(ns: _*)
          case None if df0.columns.length == tableCols.length =>
            // positional (covers VALUES, whose columns are col1, col2, …)
            df0.toDF(tableCols: _*)
          case None => df0
        }
        val n = df.count()
        lake.append(tbl, df)
        count(n)
      }

      case Delete(tbl, whereOpt) => Some {
        count(lake.delete(tbl,
          Option(whereOpt).map(expr).getOrElse(lit(true))))
      }

      case Update(tbl, setList, whereOpt) => Some {
        val assigns = splitTop(setList).map { a =>
          val i = a.indexOf('=')
          require(i > 0, s"bad SET assignment: $a")
          a.substring(0, i).trim -> expr(a.substring(i + 1).trim)
        }.toMap
        count(lake.update(tbl, assigns,
          Option(whereOpt).map(expr).getOrElse(lit(true))))
      }

      case Ctas(orReplace, tbl, query) => Some {
        if (orReplace != null)
          try lake.dropTable(tbl) catch { case _: IllegalArgumentException => }
        val df = runQuery(query)
        lake.createTableAs(tbl, df)
        count(lake.table(tbl).count())
      }

      case CreateTable(ifNotExists, tbl, colDefs) => Some {
        val fields = splitTop(colDefs, angle = true).map(parseColumnDef)
        lake.createTable(tbl, StructType(fields.map(_._1)),
          ifNotExists = ifNotExists != null)
        fields.foreach { case (f, default) =>
          default.foreach(d => lake.setColumnDefault(tbl, f.name, d))
        }
        count(0L)
      }

      case DropTable(tbl) => Some { lake.dropTable(tbl); count(0L) }

      // maintenance table functions as CALLs (reference registers them in
      // ducklake_extension.cpp:53-126; CALL ducklake.merge_adjacent_files
      // etc.)
      case Call(fn, rawArgs) => Some {
        val args = splitTop(rawArgs).filter(_.nonEmpty).map(stripQuotes)
        fn.toLowerCase(Locale.ROOT) match {
          case "merge_adjacent_files" =>
            // named args (reference merge_adjacent_max_files /
            // compaction_session_target_file_size): unknown names error
            // instead of silently applying defaults
            val raw = splitTop(rawArgs).map(_.trim).filter(_.nonEmpty)
            val (named0, positional0) = raw.partition(_.matches(
              "(?is)^[a-z_]+\\s*=>.*"))
            val named = named0.map { a =>
              val i = a.indexOf("=>")
              (a.substring(0, i).trim.toLowerCase(Locale.ROOT),
                stripQuotes(a.substring(i + 2).trim))
            }.toMap
            named.keys.find(k => k != "table_name" &&
              k != "max_compacted_files" && k != "target_file_size")
              .foreach(k => throw new IllegalArgumentException(
                s"unknown named parameter \"$k\" for merge_adjacent_files"))
            val positional = positional0.map(stripQuotes)
            val tbl = named.get("table_name")
              .orElse(positional.headOption)
              .getOrElse(throw new IllegalArgumentException(
                "merge_adjacent_files requires a table argument " +
                "(positional or table_name => '…')"))
            // positional args after the table slot (none consumed when
            // the table arrived as table_name => '…')
            val posRest =
              if (named.contains("table_name")) positional
              else positional.drop(1)
            count(lake.mergeAdjacentFiles(tbl,
              named.get("target_file_size").map(_.toLong)
                .orElse(posRest.headOption.map(_.toLong))
                .getOrElse(512L * 1024 * 1024),
              named.get("max_compacted_files").map(_.toInt)).toLong)
          case "rewrite_data_files" =>
            // named args like the reference: delete_threshold,
            // max_compacted_files (test_rewrite_max_files.test)
            val raw2 = splitTop(rawArgs).map(_.trim).filter(_.nonEmpty)
            val (named2, pos2) = raw2.partition(_.matches(
              "(?is)^[a-z_]+\\s*=>.*"))
            val nm = named2.map { a =>
              val i = a.indexOf("=>")
              (a.substring(0, i).trim.toLowerCase(Locale.ROOT),
                stripQuotes(a.substring(i + 2).trim))
            }.toMap
            nm.keys.find(k => k != "table_name" && k != "delete_threshold"
              && k != "max_compacted_files")
              .foreach(k => throw new IllegalArgumentException(
                s"unknown named parameter \"$k\" for rewrite_data_files"))
            val tbl2 = nm.get("table_name")
              .orElse(pos2.headOption.map(stripQuotes))
              .getOrElse(throw new IllegalArgumentException(
                "rewrite_data_files requires a table argument"))
            count(lake.rewriteDataFiles(tbl2,
              nm.get("delete_threshold").map(_.toDouble)
                .orElse(pos2.lift(1).map(p => stripQuotes(p).toDouble))
                .getOrElse(0.95),
              nm.get("max_compacted_files").map(_.toInt)).toLong)
          case "expire_snapshots" =>
            count(lake.expireSnapshots(
              args.headOption.map(_.toLong)).size.toLong)
          case "cleanup_old_files" =>
            count(lake.cleanupOldFiles(
              args.headOption.map(_.toLong)).size.toLong)
          case "delete_orphaned_files" =>
            count(lake.deleteOrphanedFiles(args(0)).size.toLong)
          // bare CALL flush_inlined_data() sweeps every table (reference
          // ducklake_flush_inlined_data('catalog')); table_name => '…'
          // names one (data_inlining_flush.test)
          case "flush_inlined_data" | "flush_inlined_deletes" =>
            val f: String => Long =
              if (fn.equalsIgnoreCase("flush_inlined_data"))
                lake.flushInlinedData
              else lake.flushInlinedDeletes
            def namedArg(k: String): Option[String] =
              splitTop(rawArgs).map(_.trim)
                .find(_.matches(s"(?is)^$k\\s*=>.*"))
                .map(a => stripQuotes(
                  a.replaceFirst(s"(?is)^$k\\s*=>", "").trim))
            def sweep(schemas: Seq[String]): Long = {
              val sid = lake.currentSnapshotId()
              schemas.flatMap { sc =>
                lake.meta.listTables(sid, sc).map { t =>
                  f(if (sc == "main") t.name else s"$sc.${t.name}")
                }
              }.sum
            }
            namedArg("table_name").orElse(args.headOption) match {
              case Some(tbl) => count(f(tbl))
              case None => namedArg("schema_name") match {
                // flush one schema's tables (data_inlining_flush_schema)
                case Some(sc) => count(sweep(Seq(sc)))
                case None =>
                  count(sweep(lake.meta.listSchemas().map(_.name)))
              }
            }
          case "checkpoint" => lake.checkpoint(args(0)); count(0L)
          case "set_option" =>
            lake.setOption(args(0), args(1), args.lift(2)); count(0L)
          case "set_commit_message" =>
            // CALL set_commit_message(author, message [, extra_info=>'…'])
            // (reference ducklake_set_commit_message.cpp; audit tests).
            // Unquoted NULL → SQL NULL; '' escapes inside quoted strings.
            def nv(s: String): String =
              if (s == null || s.equalsIgnoreCase("NULL")) null
              else s.replace("''", "'")
            val extra = splitTop(rawArgs).map(_.trim)
              .find(_.matches("(?is)^extra_info\\s*=>.*"))
              .map(a => nv(stripQuotes(
                a.replaceFirst("(?is)^extra_info\\s*=>", "").trim)))
            lake.setCommitMessage(nv(args(0)), nv(args(1)), extra)
            count(0L)
          case "add_data_files" =>
            // CALL add_data_files(tbl, 'file' | ['f1','f2'] | 'glob/**',
            //   allow_missing => true, ignore_extra_columns => true,
            //   hive_partitioning => false) — reference
            // ducklake_add_data_files.cpp:69-84 named parameters
            val raw = splitTop(rawArgs).map(_.trim).filter(_.nonEmpty)
            val (named0, positional) = raw.partition(_.matches(
              "(?is)^[a-z_]+\\s*=>.*"))
            val named = named0.map { a =>
              val i = a.indexOf("=>")
              (a.substring(0, i).trim.toLowerCase(Locale.ROOT),
                stripQuotes(a.substring(i + 2).trim))
            }.toMap
            named.keys.find(k => k != "allow_missing" &&
              k != "ignore_extra_columns" && k != "hive_partitioning")
              .foreach(k => throw new IllegalArgumentException(
                s"unknown named parameter \"$k\" for add_data_files"))
            def flag(k: String, dflt: Boolean): Boolean =
              named.get(k).map(_.equalsIgnoreCase("true")).getOrElse(dflt)
            // file list: bare strings or a ['a','b'] list literal
            val files = positional.drop(1).flatMap { a =>
              if (a.startsWith("[") && a.endsWith("]"))
                a.substring(1, a.length - 1).split(',').toSeq
                  .map(_.trim).filter(_.nonEmpty).map(stripQuotes)
              else Seq(stripQuotes(a))
            }
            lake.addDataFiles(stripQuotes(positional.head), files,
              allowMissing = flag("allow_missing", dflt = false),
              ignoreExtraColumns =
                flag("ignore_extra_columns", dflt = false),
              hivePartitions = flag("hive_partitioning", dflt = true))
            count(0L)
          // CALL enable_logging(['DuckLakeMetadata']) — reference
          // ducklake_metadata_logging.test; the optional logger-name arg
          // is accepted and ignored (there is only the metadata logger)
          // managed incremental materialized views (beyond the reference;
          // graft.operators.IncrementalView):
          //   CALL create_mv('mv', 'base', 'g1,g2', 'name:expr;name2:e2')
          //   CALL refresh_mv('mv')   — definition + version checkpoint
          //                             live as table-scoped options
          case "create_mv" =>
            val sums = args(3).split(";").toSeq.filter(_.nonEmpty).map { s =>
              val i = s.indexOf(':')
              (s.substring(0, i).trim, s.substring(i + 1).trim)
            }
            count(graft.operators.IncrementalView.createManaged(
              lake, args(0), args(1),
              args(2).split(",").toSeq.map(_.trim), sums))
          case "refresh_mv" =>
            count(graft.operators.IncrementalView.refreshManaged(
              lake, args(0)))
          case "enable_logging" => lake.enableMetadataLogging(); count(0L)
          case "disable_logging" =>
            lake.disableMetadataLogging(); count(0L)
          case other => throw new IllegalArgumentException(
            s"unknown function: $other")
        }
      }

      // CREATE [OR REPLACE] MACRO name (a, b := 5) AS body
      //   [, (a) AS body, …]            — arity overloads
      //   | (a, n) AS TABLE SELECT …    — table macro, used in FROM
      // (reference test/sql/macros corpus)
      case CreateMacro(orReplace, name, rest) => Some {
        lake.createMacro(name, parseMacroImpls(rest), orReplace != null)
        count(0L)
      }
      case DropMacro(tableKw, ifExists, name) => Some {
        lake.dropMacro(name, isTable = tableKw != null,
          ifExists = ifExists != null)
        count(0L)
      }

      // introspection statements the reference inherits from its host
      // engine: DESCRIBE in DuckDB's six-column shape, SHOW TABLES/VIEWS
      case Describe(tbl) => Some {
        val snap = lake.meta.currentSnapshot()
        val (schemaName, baseName) =
          if (tbl.contains('.'))
            (tbl.split('.').head, tbl.split('.').last)
          else ("main", tbl)
        lake.meta.tableByName(baseName, snap.snapshotId, schemaName) match {
          case Some(t) =>
            lake.meta.columnsOf(t.tableId, snap.snapshotId)
              .filter(_.parentColumn.isEmpty).sortBy(_.columnOrder)
              .map(c => (c.name, DuckLakeTypes.displayName(c.typeString),
                if (c.nullsAllowed) "YES" else "NO",
                null: String, c.defaultValue.orNull, null: String))
              .toDF("column_name", "column_type", "null", "key", "default",
                "extra")
          case None if lake.meta.viewByName(baseName, snap.snapshotId,
              schemaName).isDefined =>
            // views describe through their resolved schema
            lake.view(tbl).schema.fields.toSeq.map(f =>
              (f.name, DuckLakeTypes.displayName(
                DuckLakeTypes.toTypeString(f.dataType)),
                if (f.nullable) "YES" else "NO",
                null: String, null: String, null: String))
              .toDF("column_name", "column_type", "null", "key", "default",
                "extra")
          case None =>
            throw new IllegalArgumentException(s"no table $tbl")
        }
      }
      case ShowTables(schema) => Some {
        // txn-aware: buffered creates/drops/renames show their effects
        // to the txn's own statements (reference rename_entity.test)
        lake.visibleTableNames(Option(schema).getOrElse("main"))
          .sorted.toDF("name")
      }
      case ShowViews(schema) => Some {
        // txn-aware like SHOW TABLES (buffered view DDL overlays)
        lake.visibleViews(Option(schema).getOrElse("main"))
          .values.map(_._1).toSeq.sorted.toDF("name")
      }

      // bare CHECKPOINT runs the maintenance pipeline on every table,
      // skipping views (reference view_checkpoint.test); inside an open
      // transaction it is a no-op like the reference's wal-checkpoint
      // (checkpoint_updates_interleaved.test — the txn's own state is
      // untouched and commits normally)
      case Checkpoint() => Some {
        if (!lake.inTransaction) {
          val sid = lake.currentSnapshotId()
          lake.meta.listSchemas().foreach { sc =>
            lake.meta.listTables(sid, sc.name).foreach { t =>
              lake.checkpoint(
                if (sc.name == "main") t.name else s"${sc.name}.${t.name}")
            }
          }
        }
        count(0L)
      }
      case Begin() => Some { lake.begin(); count(0L) }
      case Commit() => Some { lake.commit(); count(0L) }
      case Rollback() => Some { lake.rollback(); count(0L) }

      case CreateSchema(sc) => Some { lake.createSchema(sc); count(0L) }
      case DropSchema(sc) => Some { lake.dropSchema(sc); count(0L) }

      case CreateView(orReplace, v, query) => Some {
        lake.createView(v, query, orReplace = orReplace != null); count(0L)
      }
      case DropView(ifExists, v) => Some {
        lake.dropView(v, ifExists = ifExists != null); count(0L)
      }

      case RenameView(oldName, newName) => Some {
        lake.renameView(oldName, newName); count(0L)
      }
      case RenameTable(oldName, newName) => Some {
        lake.renameTable(oldName, newName); count(0L)
      }

      case RenameColumn(tbl, path, newName) => Some {
        if (path.contains(".")) lake.renameField(tbl, path, newName)
        else lake.renameColumn(tbl, path, newName)
        count(0L)
      }

      case AddColumn(tbl, path, typeDdl, defaultOpt) => Some {
        val (field, inlineDefault) = parseColumnDef(
          s"${path.split("\\.").last} $typeDdl") match {
          case (f, d) => (f, d)
        }
        val default = Option(defaultOpt).map(stripQuotes).orElse(inlineDefault)
        if (path.contains(".")) {
          val segs = path.split("\\.")
          lake.addField(tbl, segs.init.mkString("."), field)
        } else lake.addColumn(tbl, field, default)
        count(0L)
      }

      case DropColumn(tbl, path) => Some {
        if (path.contains(".")) lake.dropField(tbl, path)
        else lake.dropColumn(tbl, path)
        count(0L)
      }

      case AlterType(tbl, colName, typeDdl) => Some {
        lake.changeColumnType(tbl, colName,
          StructType.fromDDL(s"x $typeDdl").head.dataType)
        count(0L)
      }

      case SetDefault(tbl, colName, default) => Some {
        lake.setColumnDefault(tbl, colName, stripQuotes(default)); count(0L)
      }
      case DropDefault(tbl, colName) => Some {
        lake.setColumnDefault(tbl, colName, null); count(0L)
      }
      case SetNotNull(tbl, colName) => Some {
        lake.setNotNull(tbl, colName); count(0L)
      }
      case DropNotNull(tbl, colName) => Some {
        lake.dropNotNull(tbl, colName); count(0L)
      }

      // SET SORTED BY (expr [ASC|DESC] [NULLS FIRST|LAST], ...) — sort
      // keys may be arbitrary expressions (reference sorted_table family,
      // incl. st_hilbert space-filling-curve sorting)
      case SetSortedBy(tbl, keys) => Some {
        val parsed = splitTop(keys).map { k0 =>
          var k = k0.trim
          var nulls = "nulls_last" // DuckDB default
          val nm = "(?is)\\s+NULLS\\s+(FIRST|LAST)\\s*$".r
          nm.findFirstMatchIn(k).foreach { m =>
            nulls = s"nulls_${m.group(1).toLowerCase(Locale.ROOT)}"
            k = k.substring(0, m.start).trim
          }
          var ord = "asc"
          val om = "(?is)\\s+(ASC|DESC)\\s*$".r
          om.findFirstMatchIn(k).foreach { m =>
            ord = m.group(1).toLowerCase(Locale.ROOT)
            k = k.substring(0, m.start).trim
          }
          (k, ord, nulls)
        }
        lake.setSortedByFull(tbl, parsed); count(0L)
      }
      case ResetSortedBy(tbl) => Some { lake.resetSortedBy(tbl); count(0L) }

      // SET PARTITIONED BY (bucket(4, k), year(ts), col, ...) — bare
      // column = identity (reference partitioning family)
      case SetPartitionedBy(tbl, keys) => Some {
        val Fn = """(?is)^(\w+)\s*\(\s*(.+?)\s*\)$""".r
        val specs = splitTop(keys).map(_.trim).map {
          case Fn(fn, args) => fn.toLowerCase(Locale.ROOT) match {
            case "bucket" => splitTop(args).map(_.trim) match {
              case Seq(w, colName) => (colName, s"bucket($w)")
              case other => throw new IllegalArgumentException(
                s"bucket(width, column) expects 2 args, got $other")
            }
            case t @ ("year" | "month" | "day" | "hour") => (args.trim, t)
            case other => throw new IllegalArgumentException(
              s"unknown partition transform $other")
          }
          case colName => (colName, "identity")
        }
        lake.setPartitionedBy(tbl, specs); count(0L)
      }
      case ResetPartitionedBy(tbl) => Some {
        lake.resetPartitionedBy(tbl); count(0L)
      }

      // COMMENT ON TABLE/VIEW/COLUMN ... IS 'text' | NULL (reference
      // comments family; stored as versioned 'comment' tags)
      case CommentOn(kind, target, v) => Some {
        val value =
          if (v.trim.equalsIgnoreCase("NULL")) null else stripQuotes(v.trim)
        if (kind.equalsIgnoreCase("COLUMN")) {
          val segs = target.split("\\.")
          require(segs.length >= 2, s"COMMENT ON COLUMN needs table.column")
          // first segment is the table; a leading schema qualifier falls
          // back to schema.table when no table of that name exists
          try lake.commentOnColumn(segs.head, segs.tail.mkString("."), value)
          catch {
            case _: IllegalArgumentException if segs.length >= 3 =>
              lake.commentOnColumn(segs.take(2).mkString("."),
                segs.drop(2).mkString("."), value)
          }
        } else lake.commentOn(target, value)
        count(0L)
      }

      case Merge(tbl, tgtAliasOpt, usingPart, onPart, whenPart) => Some {
        val (source, srcAlias) = parseUsing(usingPart, runQuery)
        val onKeys = parseOnKeys(onPart)
        // remap the statement's aliases onto the merge API's fixed t/s
        def remap(e: String): String = {
          var out = e
          Option(tgtAliasOpt).foreach(a =>
            out = out.replaceAll(s"(?i)\\b$a\\.", "t."))
          srcAlias.foreach(a => out = out.replaceAll(s"(?i)\\b$a\\.", "s."))
          out.replaceAll(s"(?i)\\b$tbl\\.", "t.")
        }
        // split the action list on top-level WHEN keywords FIRST, then
        // match each clause with an anchored regex — a lazy `(.+?)` in a
        // whole-statement regex can otherwise swallow the next clause
        // (e.g. `WHEN MATCHED AND c THEN UPDATE … WHEN NOT MATCHED BY
        // SOURCE THEN DELETE` mis-read as one conditional DELETE)
        val UpdateRe =
          """(?is)\AMATCHED\s+(?:AND\s+(.+?)\s+)?THEN\s+UPDATE\s+SET\s+(.+?)\s*\z""".r
        val DeleteRe =
          """(?is)\AMATCHED\s+(?:AND\s+(.+?)\s+)?THEN\s+DELETE\s*\z""".r
        val BySourceRe =
          """(?is)\ANOT\s+MATCHED\s+BY\s+SOURCE\s+(?:AND\s+(.+?)\s+)?THEN\s+DELETE\s*\z""".r
        val InsertRe =
          """(?is)\ANOT\s+MATCHED\s+(?:BY\s+TARGET\s+)?(?:AND\s+(.+?)\s+)?THEN\s+INSERT\s*(.*?)\s*\z""".r
        // WHEN MATCHED clauses collect as an ORDERED list — the binder
        // accepts any number (reference ducklake_merge_into.cpp action
        // list); per row the first passing clause acts (mergeMatched)
        val matchedActions =
          scala.collection.mutable.ArrayBuffer.empty[MatchedAction]
        var doInsert = false
        var insertCond: Option[Column] = None
        var insertValues: Option[Seq[(String, Column)]] = None
        var bySourceDelete: Option[Column] = None
        splitWhenClauses(whenPart).foreach {
          case UpdateRe(cond, setPart) =>
            matchedActions += MatchedUpdate(
              splitTop(setPart).map { a =>
                val i = a.indexOf('=')
                a.substring(0, i).trim.split("\\.").last ->
                  expr(remap(a.substring(i + 1).trim))
              }.toMap,
              Option(cond).map(c => expr(remap(c))))
          case DeleteRe(cond) =>
            matchedActions += MatchedDelete(
              Option(cond).map(c => expr(remap(c))))
          case BySourceRe(cond) =>
            bySourceDelete = Some(Option(cond).map(c => expr(remap(c)))
              .getOrElse(org.apache.spark.sql.functions.lit(true)))
          case InsertRe(cond, rest) =>
            doInsert = true
            insertCond = Option(cond).map(c => expr(remap(c)))
            val r = rest.trim
            // INSERT | INSERT * → full-row star; INSERT (a, b) VALUES
            // (x, y) → per-column values, missing columns read defaults
            // (reference ducklake_merge_into.cpp:489-634 column binding)
            if (r.nonEmpty && r != "*") {
              require(r.startsWith("("),
                s"unsupported MERGE INSERT form: INSERT $r")
              val close = matchingParen(r)
              val names = splitTop(r.substring(1, close))
                .map(_.split("\\.").last.trim)
              val after = r.substring(close + 1).trim
              require(after.toUpperCase(Locale.ROOT).startsWith("VALUES"),
                s"expected VALUES after MERGE INSERT column list: $r")
              val vpart = after.substring("VALUES".length).trim
              require(vpart.startsWith("(") &&
                matchingParen(vpart) == vpart.length - 1,
                s"malformed MERGE INSERT VALUES: $r")
              val vals = splitTop(vpart.substring(1, vpart.length - 1))
                .map(v => expr(remap(v)))
              require(names.length == vals.length,
                s"MERGE INSERT has ${names.length} columns but " +
                  s"${vals.length} values")
              insertValues = Some(names.zip(vals))
            }
          case other => throw new IllegalArgumentException(
            s"unsupported MERGE clause: WHEN $other")
        }
        require(matchedActions.nonEmpty ||
          doInsert || bySourceDelete.isDefined,
          s"unsupported MERGE actions: $whenPart")
        lake.mergeOn(tbl, source, onKeys,
          matchedActions = matchedActions.toSeq,
          whenNotMatchedInsert = doInsert,
          notMatchedCondition = insertCond,
          notMatchedBySourceDelete = bySourceDelete,
          notMatchedInsertValues = insertValues)
        count(source.count())
      }

      case _ => None
    }
  }

  /** USING (subquery) [AS] alias | USING table [alias] */
  private def parseUsing(usingPart: String,
      runQuery: String => DataFrame): (DataFrame, Option[String]) = {
    val u = usingPart.trim
    if (u.startsWith("(")) {
      val close = matchingParen(u)
      val sub = u.substring(1, close)
      val alias = u.substring(close + 1).trim
        .replaceAll("(?i)^AS\\s+", "").trim
      (runQuery(sub), if (alias.isEmpty) None else Some(alias))
    } else {
      val parts = u.split("\\s+")
      val alias = parts.drop(1).filterNot(_.equalsIgnoreCase("AS")).headOption
      (runQuery(s"SELECT * FROM ${parts(0)}"), alias)
    }
  }

  /** AND-ed `a.k = b.k` equalities (same column name both sides) or bare
    * `k` → key list. Compound upsert keys are the reference's
    * test_rewrite_partitioning.test MERGE shape. */
  private def parseOnKeys(onPart: String): Seq[String] = {
    val Eq = """(?is)^\s*(?:[\w$]+\.)?([\w$]+)\s*=\s*(?:[\w$]+\.)?([\w$]+)\s*$""".r
    onPart.trim.stripPrefix("(").stripSuffix(")")
      .split("(?i)\\s+AND\\s+").toSeq.map(_.trim).map {
        case Eq(a, b) if a.equalsIgnoreCase(b) => a
        case bare if bare.matches("[\\w$]+") => bare
        case other => throw new IllegalArgumentException(
          "MERGE ON must be AND-ed equalities on shared key columns, " +
            s"got: $other")
      }
  }

  /** `name TYPE [NOT NULL] [DEFAULT v]` → (field, default) */
  private def parseColumnDef(d: String): (StructField, Option[String]) = {
    // generated columns are rejected with the reference's error text
    // (test/sql/general/generated_columns.test: "does not support")
    if ("(?is)\\)\\s*(VIRTUAL|STORED)?\\s*$".r.findFirstIn(d).isDefined &&
        "(?is)\\s+AS\\s*\\(".r.findFirstIn(d).isDefined)
      throw new IllegalArgumentException(
        "DuckLake does not support generated columns")
    val DefaultRe = """(?is)^(.*?)\s+DEFAULT\s+(.+)$""".r
    val (core, default) = d.trim match {
      case DefaultRe(c, v) => (c.trim, Some(stripQuotes(v.trim)))
      case c => (c, None)
    }
    val notNull = "(?is)\\s+NOT\\s+NULL\\s*$".r.findFirstIn(core).isDefined
    val base = "(?is)\\s+NOT\\s+NULL\\s*$".r.replaceAllIn(core, "")
    // GEOMETRY is a lake-level type (WKB blob + extent stats) that Spark's
    // DDL parser does not know; carry it in field metadata so createTable
    // records the declared lake type (reference geometry DDL,
    // test/sql/geo/ducklake_geometry.test). GEOMETRY nested inside
    // STRUCT(...) / T[] / MAP(...) (DuckDB type syntax) takes the same
    // metadata route via the full lake type string.
    val GeomRe = "(?is)^(.+?)\\s+GEOMETRY\\s*$".r
    val t = base.trim
    val parsed = t match {
      case GeomRe(name) => Lake.geometryField(stripIdent(name))
      case _ if "(?i)(\\bGEOMETRY\\b|\\bSTRUCT\\s*\\(|\\bMAP\\s*\\(|\\[\\s*\\])"
          .r.findFirstIn(t).isDefined =>
        // DuckDB nested type syntax (STRUCT(...) / T[] / MAP(...)) or a
        // lake-level type — name = first identifier, rest = type text
        val cut = t.indexWhere(Character.isWhitespace)
        require(cut > 0, s"cannot parse column definition: $d")
        Lake.typedField(stripIdent(t.substring(0, cut)),
          lakeTypeOf(t.substring(cut + 1).trim))
      case _ => StructType.fromDDL(duckTypeAliases(base)).head
    }
    (parsed.copy(nullable = !notNull), default)
  }

  /** DuckDB spellings Spark's DDL parser rejects: bare VARCHAR (no
    * length), TEXT, BLOB. VARCHAR(n) stays — Spark accepts it. */
  private def duckTypeAliases(s: String): String = s
    .replaceAll("(?i)\\bVARCHAR\\b(?!\\s*\\()", "STRING")
    .replaceAll("(?i)\\bTEXT\\b", "STRING")
    .replaceAll("(?i)\\bBLOB\\b", "BINARY")

  /** DuckDB-style type text → lake type string (only used when GEOMETRY
    * appears somewhere inside — plain types go through Spark's parser). */
  private def lakeTypeOf(t: String): String = {
    val s = t.trim
    val up = s.toUpperCase
    if (up.endsWith("[]")) s"list<${lakeTypeOf(s.dropRight(2))}>"
    else if (up.startsWith("STRUCT(") && s.endsWith(")"))
      DuckLakeTypes.mkStructString(
        splitTop(s.substring(7, s.length - 1)).map { f =>
          val cut = f.indexWhere(Character.isWhitespace)
          require(cut > 0, s"cannot parse struct field: $f")
          (stripIdent(f.substring(0, cut)), lakeTypeOf(f.substring(cut + 1)))
        })
    else if (up.startsWith("MAP(") && s.endsWith(")")) {
      val parts = splitTop(s.substring(4, s.length - 1))
      require(parts.size == 2, s"MAP needs two type args: $s")
      s"map<${lakeTypeOf(parts(0))},${lakeTypeOf(parts(1))}>"
    } else up match { // DuckDB base type names → lake type strings
      case "GEOMETRY" => "geometry"
      case "BOOLEAN" | "BOOL" => "boolean"
      case "TINYINT" | "INT8" => "int8"
      case "SMALLINT" | "INT16" => "int16"
      case "INT" | "INTEGER" | "INT32" => "int32"
      case "BIGINT" | "INT64" | "LONG" => "int64"
      case "FLOAT" | "REAL" | "FLOAT4" => "float32"
      case "DOUBLE" | "FLOAT8" => "float64"
      case "VARCHAR" | "TEXT" | "STRING" => "varchar"
      case "BLOB" | "BINARY" | "BYTEA" => "blob"
      case "DATE" => "date"
      case "TIMESTAMP" => "timestamp"
      case "TIMESTAMPTZ" => "timestamptz"
      case "UUID" => "uuid"
      case "JSON" => "json"
      case d if d.startsWith("DECIMAL(") || d.startsWith("NUMERIC(") =>
        s"decimal(${d.substring(d.indexOf('(') + 1, d.length - 1)})"
      case _ => // anything else: Spark's own DDL type grammar
        DuckLakeTypes.toTypeString(
          StructType.fromDDL(s"x $s").head.dataType)
    }
  }

  private def stripIdent(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.head == '"' && t.last == '"')
      t.substring(1, t.length - 1)
    else t
  }

  /** Parse a CREATE MACRO implementation list: `(params) AS [TABLE] body`
    * repeated, comma-separated (test_multiple_implementations.test). A
    * scalar body ends at a top-level comma whose remainder reads as the
    * next `(params) AS` head; a table body consumes the rest. */
  private def parseMacroImpls(rest0: String): Seq[MacroImpl] = {
    val impls = scala.collection.mutable.ListBuffer.empty[MacroImpl]
    var s = rest0.trim
    while (s.nonEmpty) {
      require(s.startsWith("("), s"expected macro parameter list at: $s")
      val close = matchingParen(s)
      // a parameter is `name`, `name TYPE` (test_defined_types.test), or
      // `name [TYPE] := default`
      val parsed = splitTop(s.substring(1, close)).map(_.trim)
        .filter(_.nonEmpty).map { p0 =>
          val i = p0.indexOf(":=")
          val (decl, dflt) =
            if (i >= 0) (p0.substring(0, i).trim,
              Some(p0.substring(i + 2).trim))
            else (p0, None)
          val parts = decl.split("\\s+", 2)
          (parts(0), if (parts.length > 1) parts(1).trim else "unknown",
            dflt)
        }
      val params = parsed.map(p => (p._1, p._3))
      val paramTypes = parsed.map(_._2)
      s = s.substring(close + 1).trim
      require(s.matches("(?is)^AS\\s.+"), s"expected AS after macro " +
        s"parameter list, got: $s")
      s = s.replaceFirst("(?is)^AS\\s+", "")
      val isTable = s.matches("(?is)^TABLE\\s.+")
      if (isTable) s = s.replaceFirst("(?is)^TABLE\\s+", "")
      // defaults may not precede non-default parameters
      val firstDflt = params.indexWhere(_._2.isDefined)
      require(firstDflt < 0 || params.drop(firstDflt).forall(_._2.isDefined),
        "macro parameters with defaults must come last")
      if (isTable) {
        impls += MacroImpl(params, s.trim, isTable = true, paramTypes)
        s = ""
      } else {
        // find the overload separator: a top-level comma followed by a
        // complete `(…) AS` head
        var depth = 0
        var inQuote = false
        var cut = -1
        var i = 0
        while (cut < 0 && i < s.length) {
          val ch = s.charAt(i)
          if (inQuote) { if (ch == '\'') inQuote = false }
          else ch match {
            case '\'' => inQuote = true
            case '(' => depth += 1
            case ')' => depth -= 1
            case ',' if depth == 0 =>
              val rem = s.substring(i + 1).trim
              if (rem.startsWith("(")) {
                val c2 = matchingParen(rem)
                if (c2 > 0 && rem.substring(c2 + 1)
                    .matches("(?is)^\\s*AS\\s.+")) cut = i
              }
            case _ =>
          }
          i += 1
        }
        if (cut < 0) {
          impls += MacroImpl(params, s.trim, isTable = false, paramTypes)
          s = ""
        } else {
          impls += MacroImpl(params, s.substring(0, cut).trim,
            isTable = false, paramTypes)
          s = s.substring(cut + 1).trim
        }
      }
    }
    require(impls.map(_.isTable).distinct.length == 1,
      "macro implementations must be all scalar or all table")
    impls.toSeq
  }

  private def stripQuotes(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.head == '\'' && t.last == '\'')
      t.substring(1, t.length - 1)
    else t
  }

  private def matchingParen(s: String): Int = {
    var depth = 0
    s.zipWithIndex.foreach { case (c, i) =>
      if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) return i }
    }
    throw new IllegalArgumentException(s"unbalanced parens: $s")
  }

  /** split on commas at paren depth 0 (function calls in expressions),
    * ignoring commas/parens inside single-quoted strings ('' escapes a
    * quote); angle brackets tracked too when splitting type definitions —
    * never in expressions, where < and > are comparison operators */
  /** Split a MERGE action list (starting with `WHEN …`) into clause
    * bodies, one per top-level WHEN keyword (outside parens/quotes); the
    * leading WHEN of each clause is dropped. */
  private[catalog] def splitWhenClauses(s: String): Seq[String] = {
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var depth = 0
    var inQuote = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) { if (c == '\'') inQuote = false }
      else c match {
        case '\'' => inQuote = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case 'W' | 'w' if depth == 0 &&
            (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1)) &&
              s.charAt(i - 1) != '_') &&
            i + 4 <= s.length &&
            s.substring(i, i + 4).equalsIgnoreCase("WHEN") &&
            (i + 4 == s.length || !Character.isLetterOrDigit(s.charAt(i + 4)) &&
              s.charAt(i + 4) != '_') =>
          starts += i
        case _ => ()
      }
      i += 1
    }
    require(starts.nonEmpty && starts.head == 0,
      s"MERGE actions must start with WHEN: $s")
    starts.zipAll(starts.drop(1).map(Some(_)), -1, None).map {
      case (from, to) =>
        s.substring(from + 4, to.getOrElse(s.length)).trim
    }.toSeq
  }

  private[catalog] def splitTop(s: String,
      angle: Boolean = false): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var inQuote = false
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) {
        sb += c
        if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') {
            sb += '\''; i += 1
          } else inQuote = false
        }
      } else c match {
        case '\'' => inQuote = true; sb += c
        case '(' | '[' => depth += 1; sb += c
        case ')' | ']' => depth -= 1; sb += c
        case '<' if angle => depth += 1; sb += c
        case '>' if angle => depth -= 1; sb += c
        case ',' if depth == 0 => out += sb.result().trim; sb.clear()
        case other => sb += other
      }
      i += 1
    }
    if (sb.nonEmpty) out += sb.result().trim
    out.toSeq
  }
}
