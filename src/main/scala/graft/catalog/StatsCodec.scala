package graft.catalog

import org.apache.spark.sql.types._

/** VARCHAR encoding of per-file column stats, mirroring the reference's
  * string-encoded min/max (ducklake_file_column_stats) with a numeric-
  * sortable canonical form so catalog-side pruning can compare via CAST:
  * numbers as plain decimal strings, dates as epoch days, timestamps as
  * epoch micros, booleans as 0/1, strings raw (truncated — a truncated max
  * is not a valid upper bound, so long values store NULL like the
  * reference's partial_max handling). */
object StatsCodec {

  val MaxStatLen = 256

  def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType |
        BooleanType => true
    case _ => false
  }

  /** Catalyst literal value → canonical stats string. */
  def encode(value: Any, dt: DataType): Option[String] = Option(value).flatMap {
    v =>
      dt match {
        case BooleanType => Some(if (v.asInstanceOf[Boolean]) "1" else "0")
        // non-finite float extremes (a NaN max, an infinite min) have no
        // storable bound — encode NULL, which pruning treats as
        // "cannot prove", keeping the file (reference NaN rules,
        // ducklake_metadata_manager.cpp:1294-1340; the contains_nan flag
        // still records NaN presence). Derby's DOUBLE also rejects
        // NaN/Inf outright, so this guard is load-bearing for commits.
        case FloatType => v match {
          case f: Float if f.isNaN || f.isInfinite => None
          case _ => Some(v.toString)
        }
        case DoubleType => v match {
          case d: Double if d.isNaN || d.isInfinite => None
          case _ => Some(v.toString)
        }
        case ByteType | ShortType | IntegerType | LongType |
            _: DecimalType =>
          Some(v.toString)
        case DateType => Some(v match {
          case d: java.sql.Date => d.toLocalDate.toEpochDay.toString
          case d: java.time.LocalDate => d.toEpochDay.toString
          case i: Int => i.toString // days since epoch (Catalyst internal)
          case other => other.toString
        })
        case TimestampType | TimestampNTZType => Some(v match {
          case t: java.sql.Timestamp => (t.getTime * 1000L +
            (t.getNanos / 1000) % 1000).toString
          case i: java.time.Instant =>
            (i.getEpochSecond * 1000000L + i.getNano / 1000).toString
          case l: java.time.LocalDateTime =>
            (l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
              l.getNano / 1000).toString
          case l: Long => l.toString // micros (Catalyst internal)
          case other => other.toString
        })
        case StringType =>
          val s = v.toString
          if (s.length <= MaxStatLen) Some(s) else None
        case _ => None // blobs / nested types carry no stats
      }
  }

  /** Canonical stats string → Catalyst INTERNAL value (UTF8String for
    * strings, epoch days/micros ints for date/time) — the inverse of
    * [[encode]], used to fold MIN/MAX aggregates straight from catalog
    * stats (reference min_max_optimization family). None when the string
    * does not round-trip exactly for the type. */
  def decodeInternal(s: String, dt: DataType): Option[Any] = dt match {
    case BooleanType => Some(s == "1")
    case ByteType => s.toByteOption
    case ShortType => s.toShortOption
    case IntegerType => s.toIntOption
    case LongType => s.toLongOption
    case FloatType => s.toFloatOption.filterNot(f => f.isNaN || f.isInfinite)
    case DoubleType => s.toDoubleOption.filterNot(d => d.isNaN || d.isInfinite)
    case d: DecimalType =>
      scala.util.Try(org.apache.spark.sql.types.Decimal(
        new java.math.BigDecimal(s), d.precision, d.scale)).toOption
    case DateType => s.toIntOption.orElse(s.toLongOption.map(_.toInt))
    case TimestampType | TimestampNTZType => s.toLongOption
    case StringType =>
      Some(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    case _ => None
  }

  /** Is a stats string usable as both bounds for this type? */
  def statsSupported(dt: DataType): Boolean = dt match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType |
        BooleanType | StringType => true
    case _ => false
  }
}
