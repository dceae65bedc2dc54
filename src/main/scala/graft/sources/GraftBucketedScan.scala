package graft.sources

import graft.catalog.{Lake, SpjScanInfo}
import graft.functions.Murmur3
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetOptions
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}
import org.apache.spark.paths.SparkPath

/** Storage-partitioned DSv2 read path (opt-in via a catalog registered
  * with `spark.sql.catalog.<name>.spj = true`). The scan reports
  * `KeyGroupedPartitioning(bucket(n, col))` with one input partition per
  * bucket value, each carrying that bucket's pruned file list
  * ([[Lake.spjScanInfo]]) — so two tables bucketed on their join keys
  * with the same width join with ZERO shuffle exchange
  * (`spark.sql.sources.v2.bucketing.enabled` planner support), the
  * cluster translation of the reference's bucket-transform locality
  * (reference src/storage/ducklake_partition_data.cpp:54-140; DuckDB gets
  * the same effect from single-node shared memory).
  *
  * Rows are read by Spark's own vectorized
  * [[ParquetPartitionReaderFactory]] — whole-stage/columnar identical to
  * the built-in parquet source — with pushed filters applied at the
  * row-group level AND re-evaluated by Spark (pruning stays advisory,
  * like every other scan path in this engine).
  *
  * At 100 TB: grouped-by-bucket parallelism is bounded by the bucket
  * width — choose widths at CREATE time the way the reference does (a
  * bucket ≈ one executor-core's worth of the steady-state table). For
  * SKEWED buckets the scan reports per-FILE splits, so Spark's
  * partially-clustered SPJ mode
  * (`spark.sql.sources.v2.bucketing.partiallyClusteredDistribution
  * .enabled` + `pushPartValues.enabled`) can keep the hot side's splits
  * apart and replicate the other side's groups instead of running the
  * bucket as one straggler task (SpjScanSpec pins both modes). The
  * generic [[Lake.table]] path remains the safety hatch for every layout
  * this fast path refuses (deletes pending, old epochs, inlined rows). */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): Iceberg-exact murmur3 bucket transform " +
      "((murmur3_32(col) & Int.MaxValue) % n)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (width, column), got $inputType")
    GraftBucketBound(inputType.fields(1).dataType)
  }
}

/** Bound bucket function: evaluation matches the write path's
  * [[graft.functions.Murmur3Hash32]] bit for bit, so a planner-inserted
  * shuffle toward KeyGroupedPartitioning (bucketing.shuffle.enabled)
  * routes rows to exactly the bucket their files live in. */
final case class GraftBucketBound(keyType: DataType)
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  // null key → null bucket, exactly like the write path's nullSafeEval
  // (null rows land in the hive default partition, never bucket(0)) and
  // Iceberg's bucket transform — so a planner-inserted shuffle groups
  // null keys into their own partition instead of silently hashing a
  // 0-unboxed null into a real bucket (or NPEing on strings)
  override def isResultNullable: Boolean = true
  override def produceResult(input: InternalRow): Integer = {
    if (input.isNullAt(1)) return null
    val n = input.getInt(0)
    val v = input.get(1, keyType)
    Integer.valueOf(
      java.lang.Math.floorMod(Murmur3.hashAny(v, keyType) & Int.MaxValue, n))
  }

  // NO magic-method (ScalarFunction.MAGIC_METHOD_NAME) overloads, on
  // purpose: V2ExpressionUtils binds them with propagateNull = false, so
  // a NULL key reaches the method — a primitive-arg overload then either
  // throws (interpreted Invoke: Method.invoke with a null box) or
  // silently buckets the type's default value (codegen'd Invoke ignores
  // the child's isNull with propagateNull off) — exactly the
  // null-hashed-as-zero corruption produceResult's explicit isNullAt
  // check exists to prevent (SpjScanSpec's null-key shuffle case).
  // Measured cost of staying on produceResult: ~15% of the shuffle map
  // stage (952 → 810 ms/rep at factor 30 with a Long magic overload) —
  // the other 85% is Spark-internal per-row machinery in
  // TransformExpression.eval (expression construction, reflective
  // method search with exception-driven fallback; jstack histogram in
  // SCALE.md §12). Safety beats the 15%.
}

/** One bucket's worth of files; the partition key is the bucket id. */
final case class GraftBucketPartition(bucket: Int,
    files: Array[PartitionedFile])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}

/** Delegates each bucket partition to the built-in vectorized parquet
  * reader as a single [[FilePartition]]. */
final case class GraftBucketReaderFactory(
    parquet: ParquetPartitionReaderFactory) extends PartitionReaderFactory {
  private def fp(p: InputPartition): FilePartition =
    FilePartition(0, p.asInstanceOf[GraftBucketPartition].files)
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    parquet.createReader(fp(p))
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    parquet.createColumnarReader(fp(p))
  override def supportColumnarReads(p: InputPartition): Boolean =
    parquet.supportColumnarReads(fp(p))
}

final class GraftBucketedScan(spark: SparkSession, table: String,
    info: SpjScanInfo, required: StructType, pushed: Array[Filter])
    extends Scan with Batch with SupportsReportPartitioning
    with SupportsReportOrdering {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft spj $table bucket(${info.width}, ${info.bucketColumn}) " +
      s"groups=${info.groups.size}" +
      (if (info.ordering.nonEmpty)
        s" ordered=${info.ordering.map(_._1).mkString(",")}" else "")

  /** per-partition ordering, reported only when [[Lake.spjScanInfo]]
    * PROVED it (single sorted file per bucket, all files written under
    * the live sort spec) — a co-bucketed sort-merge join then plans with
    * neither exchanges NOR sorts */
  override def outputOrdering(): Array[
      org.apache.spark.sql.connector.expressions.SortOrder] =
    info.ordering.map { case (c, ord, nulls) =>
      Expressions.sort(Expressions.column(c),
        if (ord.equalsIgnoreCase("desc"))
          org.apache.spark.sql.connector.expressions.SortDirection.DESCENDING
        else org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING,
        if (nulls.equalsIgnoreCase("nulls_first"))
          org.apache.spark.sql.connector.expressions.NullOrdering.NULLS_FIRST
        else org.apache.spark.sql.connector.expressions.NullOrdering.NULLS_LAST)
    }.toArray

  /** One input partition PER FILE, each keyed by its bucket — Spark's
    * BatchScanExec groups same-key splits back into one partition per
    * bucket for the key-grouped join, and with
    * `spark.sql.sources.v2.bucketing.partiallyClusteredDistribution
    * .enabled` (+ pushPartValues) it instead KEEPS the bigger side's
    * per-file splits and replicates the other side's groups — the stock
    * mitigation for a hot bucket that would otherwise run as one
    * straggler task at 100 TB. Reporting per-file splits (not pre-merged
    * buckets) is what makes that planner choice possible. */
  override def planInputPartitions(): Array[InputPartition] =
    info.groups.flatMap { case (b, files) =>
      files.map { case (uri, size) =>
        GraftBucketPartition(b, Array(
          PartitionedFile(InternalRow.empty, SparkPath.fromUrlString(uri),
            0L, size, Array.empty[String], 0L, size))): InputPartition
      }
    }.toArray

  override def outputPartitioning(): Partitioning =
    if (info.groups.isEmpty) new UnknownPartitioning(0)
    else new KeyGroupedPartitioning(
      Array(Expressions.bucket(info.width, info.bucketColumn)),
      info.groups.size)

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = spark.sessionState.conf
    val hadoopConf = spark.sessionState.newHadoopConf()
    // the same reader wiring Spark's own ParquetScan.createReaderFactory
    // performs before broadcasting the conf (read-support class +
    // requested schema + parquet semantics flags)
    import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, ParquetWriteSupport}
    import org.apache.spark.sql.internal.SQLConf
    hadoopConf.set(
      org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[ParquetReadSupport].getName)
    hadoopConf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA,
      required.json)
    hadoopConf.set(ParquetWriteSupport.SPARK_ROW_SCHEMA, required.json)
    hadoopConf.set(SQLConf.SESSION_LOCAL_TIMEZONE.key,
      conf.sessionLocalTimeZone)
    hadoopConf.setBoolean(SQLConf.NESTED_SCHEMA_PRUNING_ENABLED.key,
      conf.nestedSchemaPruningEnabled)
    hadoopConf.setBoolean(SQLConf.CASE_SENSITIVE.key,
      conf.caseSensitiveAnalysis)
    ParquetWriteSupport.setSchema(required, hadoopConf)
    hadoopConf.setBoolean(SQLConf.PARQUET_BINARY_AS_STRING.key,
      conf.isParquetBinaryAsString)
    hadoopConf.setBoolean(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key,
      conf.isParquetINT96AsTimestamp)
    hadoopConf.setBoolean(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key,
      conf.legacyParquetNanosAsLong)
    hadoopConf.setBoolean(SQLConf.PARQUET_FIELD_ID_READ_ENABLED.key,
      conf.parquetFieldIdReadEnabled)
    hadoopConf.setBoolean(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key,
      conf.parquetInferTimestampNTZEnabled)
    val bc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(hadoopConf))
    GraftBucketReaderFactory(ParquetPartitionReaderFactory(
      conf, bc, info.schema, required, new StructType(), pushed, None,
      new ParquetOptions(Map.empty[String, String], conf)))
  }
}

final class GraftScanBuilder(spark: SparkSession, lake: Lake,
    table: String, atSnapshot: Option[Long] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private val fullSchema = lake.schemaOf(table)
  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // accept what converts to a Column (catalog file pruning + parquet
    // row-group skip); everything stays residual — pruning is advisory
    pushed = filters.filter(f => GraftSource.toColumn(f).isDefined)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val cond = pushed.flatMap(GraftSource.toColumn).reduceOption(_ && _)
    new GraftBucketedScan(spark, table,
      lake.spjScanInfo(table, cond, atSnapshot), required, pushed)
  }
}
