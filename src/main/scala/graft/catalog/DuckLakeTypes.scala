package graft.catalog

import org.apache.spark.sql.types._

/** Canonical type-string codec, mirroring the reference's DUCKLAKE_TYPES
  * table (reference src/common/ducklake_types.cpp:17-68) mapped onto Spark's
  * type system per SURVEY.md §1.3.
  *
  * Unsupported in the reference and here: enums, unions, fixed-size arrays,
  * collations, user-defined types (reference src/common/ducklake_types.cpp:125,145).
  */
object DuckLakeTypes {

  /** Spark type → canonical DuckLake type string. */
  def toTypeString(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case ByteType => "int8"
    case ShortType => "int16"
    case IntegerType => "int32"
    case LongType => "int64"
    case FloatType => "float32"
    case DoubleType => "float64"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case StringType => "varchar"
    case BinaryType => "blob"
    case DateType => "date"
    case TimestampType => "timestamptz"
    case TimestampNTZType => "timestamp"
    case CalendarIntervalType => "interval"
    case VariantType => "variant"
    case a: ArrayType =>
      s"list<${toTypeString(a.elementType)}>"
    case m: MapType =>
      s"map<${toTypeString(m.keyType)},${toTypeString(m.valueType)}>"
    case s: StructType =>
      s.fields.map(f => s"${f.name}:${toTypeString(f.dataType)}")
        .mkString("struct<", ",", ">")
    case other =>
      throw new IllegalArgumentException(
        s"DuckLake does not support type: $other")
  }

  /** Canonical DuckLake type string → Spark type. */
  /** catalog type string → the spelling DuckDB's DESCRIBE shows
    * (reference alter/add_column.test output shape). */
  def displayName(ts: String): String = ts.trim.toLowerCase match {
    case "int8" => "TINYINT"
    case "int16" => "SMALLINT"
    case "int32" => "INTEGER"
    case "int64" => "BIGINT"
    case "uint8" => "UTINYINT"
    case "uint16" => "USMALLINT"
    case "uint32" => "UINTEGER"
    case "uint64" => "UBIGINT"
    case "float32" | "float" => "FLOAT"
    case "float64" | "double" => "DOUBLE"
    case "varchar" | "string" => "VARCHAR"
    case "boolean" | "bool" => "BOOLEAN"
    case "date" => "DATE"
    case "time" => "TIME"
    case "blob" | "binary" => "BLOB"
    case "uuid" => "UUID"
    // catalog spelling convention here: "timestamp" = TimestampNTZ,
    // "timestamptz" = TimestampType (see toTypeString)
    case "timestamp" => "TIMESTAMP"
    case "timestamptz" => "TIMESTAMP WITH TIME ZONE"
    case other => other.toUpperCase(java.util.Locale.ROOT)
  }

  def fromTypeString(s: String): DataType = {
    val t = s.trim
    t match {
      case "boolean" => BooleanType
      case "int8" => ByteType
      case "int16" => ShortType
      case "int32" => IntegerType
      case "int64" => LongType
      case "uint8" => ShortType // widened (no unsigned in Spark)
      case "uint16" => IntegerType
      case "uint32" => LongType
      case "uint64" => DecimalType(20, 0)
      case "int128" | "uint128" => DecimalType(38, 0)
      case "float32" => FloatType
      case "float64" => DoubleType
      case "varchar" | "json" | "uuid" => StringType
      case "blob" => BinaryType
      case "date" => DateType
      case "timestamptz" => TimestampType
      case "timestamp" | "timestamp_s" | "timestamp_ms" | "timestamp_us" |
          "timestamp_ns" => TimestampNTZType
      case "time" | "time_ns" => LongType // µs/ns since midnight
      case "interval" => CalendarIntervalType
      case "variant" => VariantType // semi-structured (reference
      // ducklake_types.cpp:61,134 → Spark 4 VariantType + parse_json)
      case "geometry" => BinaryType // WKB bytes (reference :64,136; Spark
      // has no geometry type — spatial fns would be ST_* expressions)
      case dec if dec.startsWith("decimal(") =>
        val args = dec.stripPrefix("decimal(").stripSuffix(")").split(",")
        DecimalType(args(0).trim.toInt, args(1).trim.toInt)
      case lst if lst.startsWith("list<") =>
        ArrayType(fromTypeString(inner(lst, "list<")))
      case mp if mp.startsWith("map<") =>
        val parts = splitTop(inner(mp, "map<"))
        MapType(fromTypeString(parts(0)), fromTypeString(parts(1)))
      case st if st.startsWith("struct<") =>
        StructType(splitTop(inner(st, "struct<")).map { f =>
          val i = f.indexOf(':')
          StructField(f.substring(0, i), fromTypeString(f.substring(i + 1)))
        })
      case other =>
        throw new IllegalArgumentException(s"unknown DuckLake type: $other")
    }
  }

  /** Widening-only promotion lattice (reference alter tests: "only widening
    * type promotions are allowed"). */
  private val intRank: Map[String, Int] = Map(
    "int8" -> 1, "int16" -> 2, "int32" -> 3, "int64" -> 4, "int128" -> 5)
  private val uintRank: Map[String, Int] = Map(
    "uint8" -> 1, "uint16" -> 2, "uint32" -> 3, "uint64" -> 4)

  /** Primitive widening per the reference's promotion rule
    * (ducklake_table_entry.cpp TypePromotionIsAllowed = "max logical type
    * of source and target IS target", verified against DuckDB's lattice;
    * promote_type_all.test): within-family rank increase; unsigned→
    * STRICTLY-wider signed (the signed type must hold the full unsigned
    * range); never signed→unsigned (negatives would become
    * unrepresentable — DuckDB's max type jumps to the next signed type
    * instead); every integer→FLOAT/DOUBLE (FLOAT outranks all integers
    * in the lattice); timestamp→timestamptz (instant reinterpretation,
    * alter_timestamptz_promotion.test). */
  private def primWidening(from: String, to: String): Boolean =
    (intRank.contains(from), uintRank.contains(from)) match {
      case (true, _) =>
        (intRank.contains(to) && intRank(from) < intRank(to)) ||
          to == "float32" || to == "float64"
      case (_, true) =>
        (uintRank.contains(to) && uintRank(from) < uintRank(to)) ||
          (intRank.contains(to) && uintRank(from) < intRank(to)) ||
          to == "float32" || to == "float64"
      case _ =>
        (from == "float32" && to == "float64") ||
          (from == "timestamp" && to == "timestamptz")
    }

  def isWidening(from: String, to: String): Boolean =
    from == to || primWidening(from, to) ||
      structWidening(from, to) || nestedWidening(from, to)

  /** list<a>→list<b> / map<k,a>→map<k2,b> widening when the element
    * (resp. key and value) types widen. */
  private def nestedWidening(from: String, to: String): Boolean =
    (isList(from) && isList(to) ||
      isMap(from) && isMap(to)) && {
      val a = childSpecs(from); val b = childSpecs(to)
      a.length == b.length && a.zip(b).forall { case ((_, ta), (_, tb)) =>
        isWidening(ta, tb)
      }
    }

  /** struct→struct evolution (reference struct_evolution family,
    * ducklake_table_entry.cpp ColumnChangeInfo): fields match by NAME —
    * matched fields must widen (recursively), fields only in the target
    * are ADDs (old files read them back NULL), fields only in the source
    * are DROPs. Matched names keep their column_id
    * (MetadataManager.syncStructChildren), so a dropped-then-re-added
    * name gets a NEW id and never resurrects old data
    * (struct_evolution_reuse.test). */
  private def structWidening(from: String, to: String): Boolean =
    (fromTypeString(from), fromTypeString(to)) match {
      case (_: StructType, _: StructType) =>
        val a = structFieldStrings(from).toMap
        structFieldStrings(to).forall { case (n, tb) =>
          a.get(n).forall(ta => isWidening(ta, tb))
        }
      case _ => false
    }

  /** struct<a:t1,b:t2> → Seq((a,t1),(b,t2)); empty for non-structs. */
  def structFieldStrings(ts: String): Seq[(String, String)] = {
    val t = ts.trim
    if (!t.startsWith("struct<")) Nil
    else splitTop(inner(t, "struct<")).toSeq.map { f =>
      val i = f.indexOf(':')
      (f.substring(0, i), f.substring(i + 1))
    }
  }

  def isStruct(ts: String): Boolean = ts.trim.startsWith("struct<")
  def isList(ts: String): Boolean = ts.trim.startsWith("list<")
  def isMap(ts: String): Boolean = ts.trim.startsWith("map<")

  /** Child slots of a nested type, with the reference's canonical child
    * names (ducklake_field_data.cpp GetNewNestedType): struct → fields,
    * list → ("element"), map → ("key","value"). Leaf types → empty. */
  def childSpecs(ts: String): Seq[(String, String)] = {
    val t = ts.trim
    if (isStruct(t)) structFieldStrings(t)
    else if (isList(t)) Seq("element" -> inner(t, "list<"))
    else if (isMap(t)) {
      val parts = splitTop(inner(t, "map<"))
      Seq("key" -> parts(0).trim, "value" -> parts(1).trim)
    } else Nil
  }

  /** Reassemble a nested type string of `parentTs`'s kind from its
    * (possibly renamed/retyped) children. */
  def rebuildNested(parentTs: String,
      children: Seq[(String, String)]): String = {
    val t = parentTs.trim
    if (isStruct(t)) mkStructString(children)
    else if (isList(t)) s"list<${children.head._2}>"
    else if (isMap(t)) s"map<${children(0)._2},${children(1)._2}>"
    else parentTs
  }

  /** Reassemble a struct type string from (name, typeString) pairs. */
  def mkStructString(fields: Seq[(String, String)]): String =
    fields.map { case (n, t) => s"$n:$t" }.mkString("struct<", ",", ">")

  private def inner(s: String, prefix: String): String =
    s.stripPrefix(prefix).stripSuffix(">")

  /** split on commas at nesting depth 0 */
  private def splitTop(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    val sb = new StringBuilder
    s.foreach {
      case c @ ('<' | '(') => depth += 1; sb += c
      case c @ ('>' | ')') => depth -= 1; sb += c
      case ',' if depth == 0 => out += sb.result(); sb.clear()
      case c => sb += c
    }
    if (sb.nonEmpty) out += sb.result()
    out.toArray
  }
}
