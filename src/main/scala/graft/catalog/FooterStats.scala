package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.CorruptStatistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.types._

/** Footer-only parquet statistics for foreign-file registration.
  *
  * `ducklake_add_data_files` in the reference reads parquet METADATA and
  * never rows (ducklake_add_data_files.cpp ReadParquetFullMetadata) —
  * registering 100 TB in place must not scan 100 TB. This reads each
  * file's row-group column statistics, merges them, and converts to the
  * SAME canonical stat encodings the write path produces
  * ([[StatsCodec.encode]]), so catalog pruning behaves identically for
  * scanned and footer-derived stats.
  *
  * Soundness rule: any untrustworthy piece (missing stats in a row
  * group, unknown null counts, a physical/logical type we do not map,
  * stats flagged corrupt by parquet's own created_by heuristics) yields
  * NO stats for that leaf — pruning then treats the file as
  * "cannot prove" and keeps it. Footer gaps can never lose rows. */
object FooterStats {

  /** merged leaf statistics: bounds already in canonical string form for
    * the TABLE's column type; counts summed across row groups */
  final case class LeafStats(min: String, max: String, nullCount: Long)

  /** raw per-leaf footer values before type conversion */
  private final case class RawLeaf(mins: Seq[Any], maxs: Seq[Any],
      nulls: Long)

  final case class FileFooter(rowCount: Long, rowGroups: Long,
      leaves: Map[String, RawFooterLeaf])

  /** one leaf's merged raw bounds (parquet-typed values + annotation) */
  final case class RawFooterLeaf(min: Any, max: Any, nullCount: Long,
      annotation: Option[LogicalTypeAnnotation],
      primitive: org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName)

  /** Read one file's footer: (row count, row groups, dotted-lower leaf
    * path → raw stats). List/map repetition segments are normalized away
    * (`l.list.element` → `l.element`, `m.key_value.key` → `m.key`) so
    * paths line up with the catalog's nested-column naming. */
  def read(absPath: String, conf: Configuration): FileFooter = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(absPath), conf)
    val r = ParquetFileReader.open(in)
    try aggregate(r.getFooter)
    finally r.close()
  }

  /** Footer read that ALSO yields the file's Spark schema, derived the
    * way Spark's own reader does — the writer-embedded
    * `org.apache.spark.sql.parquet.row.metadata` schema when present,
    * else `convert` applied to the footer's MessageType — so bulk
    * `add_data_files` pays ONE footer open per file instead of a
    * DataFrameReader/file-index pass (~2 ms vs ~50 ms per file). */
  def readWithSchema(absPath: String, conf: Configuration,
      convert: org.apache.parquet.schema.MessageType => StructType)
      : (FileFooter, StructType) = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(absPath), conf)
    val r = ParquetFileReader.open(in)
    try {
      val fm = r.getFooter.getFileMetaData
      val schema =
        Option(fm.getKeyValueMetaData
          .get("org.apache.spark.sql.parquet.row.metadata"))
          .flatMap(j => scala.util.Try(
            DataType.fromJson(j).asInstanceOf[StructType]).toOption)
          .getOrElse(convert(fm.getSchema))
      (aggregate(r.getFooter), schema)
    } finally r.close()
  }

  private def aggregate(
      footer: org.apache.parquet.hadoop.metadata.ParquetMetadata)
      : FileFooter = {
    {
      val createdBy = footer.getFileMetaData.getCreatedBy
      val blocks = footer.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val perLeaf = scala.collection.mutable.LinkedHashMap
        .empty[String, Option[RawFooterLeaf]]
      blocks.foreach { b =>
        b.getColumns.asScala.foreach { cc =>
          val path = cc.getPath.toArray.toSeq
            .filterNot(s => s == "list" || s == "bag" || s == "key_value")
            .map(s => if (s == "array") "element" else s)
            .mkString(".").toLowerCase
          val pt = cc.getPrimitiveType
          val st = cc.getStatistics
          val trusted = st != null && !st.isEmpty && st.isNumNullsSet &&
            (st.hasNonNullValue || st.getNumNulls == b.getRowCount) &&
            !CorruptStatistics.shouldIgnoreStatistics(createdBy,
              pt.getPrimitiveTypeName)
          val cur = perLeaf.getOrElse(path, Some(null: RawFooterLeaf))
          val next: Option[RawFooterLeaf] =
            if (!trusted || cur.isEmpty) None
            else {
              val (mn, mx) =
                if (st.hasNonNullValue)
                  (st.genericGetMin: Any, st.genericGetMax: Any)
                else (null, null) // all-null row group: counts only
              val merged = cur match {
                case Some(null) => Some(RawFooterLeaf(mn, mx,
                  st.getNumNulls, Option(pt.getLogicalTypeAnnotation),
                  pt.getPrimitiveTypeName))
                case Some(prev) => Some(RawFooterLeaf(
                  mergeBound(prev.min, mn, takeMin = true),
                  mergeBound(prev.max, mx, takeMin = false),
                  prev.nullCount + st.getNumNulls,
                  prev.annotation, prev.primitive))
                case None => None
              }
              merged
            }
          perLeaf(path) = next
        }
      }
      FileFooter(rows, blocks.size.toLong,
        perLeaf.collect { case (p, Some(l)) if l != null => p -> l }.toMap)
    }
  }

  private def mergeBound(a: Any, b: Any, takeMin: Boolean): Any =
    if (a == null) b
    else if (b == null) a
    else {
      val cmp = (a, b) match {
        case (x: java.lang.Comparable[_], _) =>
          x.asInstanceOf[java.lang.Comparable[Any]].compareTo(b)
        case _ => 0
      }
      if ((cmp <= 0) == takeMin) a else b
    }

  /** Convert one leaf's raw footer bounds to the canonical stat strings
    * for the table column's type. None = not convertible → no stats. */
  def convert(leaf: RawFooterLeaf, dt: DataType): Option[LeafStats] = {
    if (leaf.min == null || leaf.max == null) {
      // all-null leaf: bounds unknowable but the null count is exact
      return Some(LeafStats(null, null, leaf.nullCount))
    }
    def toExternal(v: Any): Option[Any] = {
      import org.apache.parquet.io.api.Binary
      import LogicalTypeAnnotation._
      (v, leaf.annotation) match {
        case (b: java.lang.Boolean, _) if dt == BooleanType => Some(b)
        case (i: java.lang.Integer, Some(_: DateLogicalTypeAnnotation))
          if dt == DateType => Some(i) // epoch days (internal form ok)
        case (i: java.lang.Integer, ann)
          if dt == ByteType || dt == ShortType || dt == IntegerType ||
            dt == LongType =>
          // reject unsigned-annotated ints whose Java value went negative
          ann match {
            case Some(ia: IntLogicalTypeAnnotation)
              if !ia.isSigned && i < 0 => None
            case _ => Some(i)
          }
        case (l: java.lang.Long, Some(ts: TimestampLogicalTypeAnnotation))
          if dt == TimestampType || dt == TimestampNTZType =>
          ts.getUnit match {
            case TimeUnit.MILLIS => Some(l * 1000L)
            case TimeUnit.MICROS => Some(l)
            case TimeUnit.NANOS => Some(Math.floorDiv(l, 1000L))
            case _ => None
          }
        case (l: java.lang.Long, ann) if dt == LongType =>
          ann match {
            case Some(ia: IntLogicalTypeAnnotation)
              if !ia.isSigned && l < 0 => None
            case _ => Some(l)
          }
        case (f: java.lang.Float, _) if dt == FloatType => Some(f)
        case (d: java.lang.Double, _) if dt == DoubleType => Some(d)
        case (i: java.lang.Integer, Some(dec: DecimalLogicalTypeAnnotation))
          if dt.isInstanceOf[DecimalType] =>
          Some(java.math.BigDecimal.valueOf(i.longValue, dec.getScale))
        case (l: java.lang.Long, Some(dec: DecimalLogicalTypeAnnotation))
          if dt.isInstanceOf[DecimalType] =>
          Some(java.math.BigDecimal.valueOf(l, dec.getScale))
        case (b: Binary, Some(dec: DecimalLogicalTypeAnnotation))
          if dt.isInstanceOf[DecimalType] =>
          Some(new java.math.BigDecimal(
            new java.math.BigInteger(b.getBytes), dec.getScale))
        case (b: Binary, Some(_: StringLogicalTypeAnnotation))
          if dt == StringType =>
          Some(b.toStringUsingUTF8)
        case _ => None
      }
    }
    // NANOS→MICROS truncation: a truncated MAX could under-state the true
    // bound and over-prune; bump it by one micro to stay sound
    def bumpMax(v: Any): Any = (v, leaf.annotation) match {
      case (l: Long, Some(ts: LogicalTypeAnnotation
        .TimestampLogicalTypeAnnotation))
        if ts.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS => l + 1L
      case _ => v
    }
    for {
      mn <- toExternal(leaf.min)
      mx0 <- toExternal(leaf.max)
      mx = bumpMax(mx0)
      mnS <- StatsCodec.encode(mn, dt)
      mxS <- StatsCodec.encode(mx, dt)
    } yield LeafStats(mnS, mxS, leaf.nullCount)
  }
}
