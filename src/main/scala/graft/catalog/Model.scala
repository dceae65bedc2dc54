package graft.catalog

/** Catalog model case classes — 1:1 with the reference's metadata structs
  * (reference src/include/common/ducklake_snapshot.hpp:18-36,
  * src/include/common/ducklake_data_file.hpp). */

final case class Snapshot(
    snapshotId: Long,
    snapshotTimeMs: Long,
    schemaVersion: Long,
    nextCatalogId: Long,
    nextFileId: Long)

final case class SchemaInfo(schemaId: Long, uuid: String, name: String)

final case class TableInfo(
    tableId: Long,
    uuid: String,
    schemaId: Long,
    name: String,
    path: String)

final case class ColumnInfo(
    columnId: Long,
    columnOrder: Long,
    name: String,
    typeString: String,
    nullsAllowed: Boolean,
    parentColumn: Option[Long] = None,
    defaultValue: Option[String] = None,
    /** value old files (written before this column existed) read back,
      * reference ducklake_column.initial_default */
    initialDefault: Option[String] = None)

/** One immutable Parquet data file of a table
  * (reference metadata table ducklake_data_file,
  * src/storage/ducklake_metadata_manager.cpp:214-219). */
final case class DataFileEntry(
    dataFileId: Long,
    tableId: Long,
    beginSnapshot: Long,
    endSnapshot: Option[Long],
    fileOrder: Long,
    path: String,
    recordCount: Long,
    fileSizeBytes: Long,
    rowIdStart: Long,
    partitionId: Option[Long] = None,
    partitionValues: Seq[(Long, String)] = Nil,
    /** ducklake_column_mapping id for foreign files whose parquet column
      * names differ from the table's (ducklake_add_data_files) */
    mappingId: Option[Long] = None,
    /** file physically embeds the materialized rowid/snapshot columns
      * (written by compaction/flush) — recorded at commit so scans never
      * sniff parquet footers to classify files */
    hasRowIds: Boolean = false,
    /** file was physically written in the table's sort-spec order (sorted
      * insert or re-sorting compaction). UPDATE/MERGE rewrites and
      * sort_on_insert=false appends record false — spjScanInfo's
      * per-partition ordering proof gates on this flag, so a scan never
      * REPORTS an ordering a file does not actually have (a false report
      * would let Spark elide SortExec and silently corrupt merge joins) */
    writtenSorted: Boolean = false)

/** Positional delete file covering one data file
  * (reference ducklake_delete_file,
  * src/storage/ducklake_metadata_manager.cpp:221-226). */
final case class DeleteFileEntry(
    deleteFileId: Long,
    tableId: Long,
    beginSnapshot: Long,
    endSnapshot: Option[Long],
    dataFileId: Long,
    path: String,
    deleteCount: Long,
    /** 'parquet' (positional file/pos rows) or 'roaring' (serialized
      * RoaringBitmap deletion vector, reference ducklake_deletion_vector) */
    format: String = "parquet")

/** Per-file per-column min/max/null stats, VARCHAR-encoded like the
  * reference (ducklake_file_column_stats,
  * src/storage/ducklake_metadata_manager.cpp:251-253). */
final case class FileColumnStats(
    columnId: Long,
    minValue: Option[String],
    maxValue: Option[String],
    nullCount: Long,
    nanCount: Long = 0L,
    numeric: Boolean = false,
    extraStats: Option[String] = None)

/** Geometry bbox pruning filter: keep files whose stored geo extent
  * intersects the query window (reference DuckLakeColumnGeoStats
  * pruning; extent JSON lives in extra_stats). */
final case class GeoStatsFilter(columnId: Long, xmin: Double, ymin: Double,
    xmax: Double, ymax: Double)

final case class TableStats(
    recordCount: Long,
    nextRowId: Long,
    fileSizeBytes: Long)

/** A file to write into a new snapshot: path + stats gathered at write. */
final case class PendingDataFile(
    path: String,
    recordCount: Long,
    fileSizeBytes: Long,
    columnStats: Seq[FileColumnStats],
    partitionValues: Seq[(Long, String)] = Nil,
    mappingId: Option[Long] = None,
    hasRowIds: Boolean = false,
    variantStats: Seq[VariantPathStats] = Nil,
    rowGroupCount: Option[Long] = None,
    /** physically ordered by the table's live sort spec at write time —
      * see DataFileEntry.writtenSorted */
    writtenSorted: Boolean = false)

/** A column change buffered inside an open transaction, applied in
  * statement order by the single commit (reference
  * multiple_column_changes.test: ALTER … TYPE + SET DEFAULT in one txn).
  * AddCol carries provisional negative column ids in DFS pre-order so
  * stats of files appended AFTER the alter (inside the same txn) remap
  * to the real ids the commit allocates. */
sealed trait AlterSpec
object AlterSpec {
  final case class AddCol(name: String, typeString: String,
      nullable: Boolean, default: Option[String],
      provisionalIds: Seq[Long]) extends AlterSpec
  final case class DropCol(name: String) extends AlterSpec
  final case class RenameCol(oldName: String, newName: String)
    extends AlterSpec
  final case class SetDefault(name: String, value: Option[String])
    extends AlterSpec
  final case class SetNotNull(name: String, allowed: Boolean)
    extends AlterSpec
  final case class ChangeType(name: String, newType: String)
    extends AlterSpec
}

/** Scan-time resolution: data file + the delete files applying to it. */
final case class ScanFile(
    file: DataFileEntry,
    deleteFiles: Seq[DeleteFileEntry])

/** Versioned partition spec (ducklake_partition_info/_column,
  * src/storage/ducklake_metadata_manager.cpp:268-271). Transform is one of
  * identity|year|month|day|hour|bucket(n) — Iceberg-compatible. */
final case class PartitionField(
    keyIndex: Long,
    columnId: Long,
    transform: String)

final case class PartitionSpec(partitionId: Long, fields: Seq[PartitionField])

/** One macro implementation: parameters (name, optional `:=` default
  * expression), body text, scalar vs table kind (reference ducklake_macro
  * model, test/sql/macros). `paramTypes` carries optional declared types
  * (`x INTEGER`, test_defined_types.test) aligned with `params`; empty →
  * all 'unknown'. */
final case class MacroImpl(params: Seq[(String, Option[String])],
    body: String, isTable: Boolean, paramTypes: Seq[String] = Nil)

/** A macro DDL statement buffered inside an open transaction
  * (test_macro_transactions.test): applied in statement order at commit. */
sealed trait MacroOp
final case class CreateMacroOp(name: String, impls: Seq[MacroImpl],
    orReplace: Boolean) extends MacroOp
final case class DropMacroOp(name: String, isTable: Boolean,
    ifExists: Boolean) extends MacroOp

/** View DDL buffered inside an open transaction (reference
  * transaction_conflicts_view.test / ducklake_rename_view.test
  * txn-local sections): applied in statement order at commit. */
sealed trait ViewOp
final case class CreateViewOp(name: String, schema: String, sql: String,
    orReplace: Boolean) extends ViewOp
final case class DropViewOp(name: String, schema: String,
    ifExists: Boolean) extends ViewOp
final case class RenameViewOp(oldName: String, newName: String,
    schema: String) extends ViewOp

final case class SnapshotChanges(
    createdTables: Seq[String] = Nil,
    droppedTables: Seq[String] = Nil,
    insertedIntoTables: Seq[Long] = Nil,
    deletedFromTables: Seq[Long] = Nil,
    compactedTables: Seq[Long] = Nil,
    alteredTables: Seq[Long] = Nil,
    author: Option[String] = None,
    commitMessage: Option[String] = None,
    extraInfo: Option[String] = None) {
  /** change summary string in the reference's snapshots() spelling
    * (test/sql/functions/ducklake_snapshots.test:
    * `{schemas_created=[main]}`, `{tables_created=[s1.tbl]}`,
    * `{tables_inserted_into=[1]}`; macros per
    * test/sql/macros/test_attach_timetravel.test:
    * `{scalar_macros_created=['main."simple"']}`). Created/dropped
    * schema/macro entries ride in the created/droppedTables seqs with a
    * `schema:` / `macro:` / `tmacro:` prefix. */
  def summary: String = {
    def bucket(xs: Seq[String]): (Seq[String], Seq[String], Seq[String], Seq[String]) = (
      xs.filter(_.startsWith("schema:")).map(_.stripPrefix("schema:")),
      xs.filter(_.startsWith("macro:")).map(_.stripPrefix("macro:")),
      xs.filter(_.startsWith("tmacro:")).map(_.stripPrefix("tmacro:")),
      xs.filterNot(x => x.startsWith("schema:") || x.startsWith("macro:") ||
        x.startsWith("tmacro:")))
    def quoteMacro(m: String): String = {
      val i = m.lastIndexOf('.')
      val (s, n) = if (i < 0) ("main", m) else (m.substring(0, i), m.substring(i + 1))
      s"""'$s."$n"'"""
    }
    val (schemasC, macrosC, tmacrosC, tablesC) = bucket(createdTables)
    val (schemasD, macrosD, tmacrosD, tablesD) = bucket(droppedTables)
    def part(key: String, vals: Seq[String]): Option[String] =
      if (vals.isEmpty) None else Some(s"$key=[${vals.mkString(", ")}]")
    val parts = Seq(
      part("schemas_created", schemasC),
      part("tables_created", tablesC),
      part("scalar_macros_created", macrosC.map(quoteMacro)),
      part("table_macros_created", tmacrosC.map(quoteMacro)),
      part("schemas_dropped", schemasD),
      part("tables_dropped", tablesD),
      part("scalar_macros_dropped", macrosD.map(quoteMacro)),
      part("table_macros_dropped", tmacrosD.map(quoteMacro)),
      part("tables_inserted_into", insertedIntoTables.map(_.toString)),
      part("tables_deleted_from", deletedFromTables.map(_.toString)),
      part("tables_compacted", compactedTables.map(_.toString)),
      part("tables_altered", alteredTables.map(_.toString))).flatten
    "{" + parts.mkString(", ") + "}"
  }
  def isAppendOnly: Boolean =
    createdTables.isEmpty && droppedTables.isEmpty &&
      deletedFromTables.isEmpty && compactedTables.isEmpty &&
      alteredTables.isEmpty
}

/** Commit-time conflict (another writer won); triggers retry or abort
  * (reference src/storage/ducklake_transaction_state.cpp:142-243). */
final class CommitConflictException(msg: String) extends RuntimeException(msg)

/** Raised inside the conflict-checked commit when a streaming batch marker
  * shows the batch already landed — the caller treats it as a replayed
  * duplicate, not an error. */
final class DuplicateBatchException(val key: String, val batchId: Long)
  extends RuntimeException(s"batch $batchId for $key already committed")

/** Pushed-filter primitive for catalog-side file pruning: column `op`
  * value, evaluated against VARCHAR-encoded per-file min/max (reference
  * ducklake_metadata_manager.cpp:1492-1593). */
final case class StatsFilter(columnId: Long, op: String, value: String,
    numeric: Boolean)

/** Per-file stats for one SHREDDED path of a variant column (reference
  * ducklake_variant_stats.cpp): min/max/null-count of
  * `variant_get(column, path)` so variant-path filters can prune files. */
final case class VariantPathStats(
    columnId: Long,
    path: String,
    minValue: Option[String],
    maxValue: Option[String],
    nullCount: Long,
    numeric: Boolean,
    shreddedType: Option[String] = None)

/** Pushed variant-path filter: `variant_get(col, path) op value`. */
final case class VariantStatsFilter(columnId: Long, path: String,
    op: String, value: String, numeric: Boolean)
