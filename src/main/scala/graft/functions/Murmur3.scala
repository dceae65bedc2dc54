package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-compatible murmur3_x86_32 bucket hash — the reference's single
  * scalar function (reference src/functions/ducklake_murmur3.cpp:9-103):
  * seed 0; bool as 0/1 long; int8..int64 sign-extended to an 8-byte
  * little-endian long; float widened to double, hashed as bit pattern;
  * date as epoch-day long; timestamp as epoch-micros long; strings/blobs
  * as raw bytes. Values agree with Iceberg's spec test vectors (e.g.
  * bucket hash of int 34 = 2017239379, "iceberg" = 1210000089).
  */
object Murmur3 {

  private val C1 = 0xcc9e2d51
  private val C2 = 0x1b873593

  /** canonical murmur3_x86_32 over a byte array (public algorithm). */
  def hashBytes(data: Array[Byte], seed: Int): Int = {
    val n = data.length
    var h = seed
    var i = 0
    while (i + 4 <= n) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= C1; k = Integer.rotateLeft(k, 15); k *= C2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k1 = 0
    (n & 3) match {
      case 3 =>
        k1 ^= (data(i + 2) & 0xff) << 16
        k1 ^= (data(i + 1) & 0xff) << 8
        k1 ^= data(i) & 0xff
      case 2 =>
        k1 ^= (data(i + 1) & 0xff) << 8
        k1 ^= data(i) & 0xff
      case 1 =>
        k1 ^= data(i) & 0xff
      case _ =>
    }
    if ((n & 3) != 0) {
      k1 *= C1; k1 = Integer.rotateLeft(k1, 15); k1 *= C2
      h ^= k1
    }
    fmix(h ^ n)
  }

  private def fmix(h0: Int): Int = {
    var h = h0
    h ^= h >>> 16; h *= 0x85ebca6b
    h ^= h >>> 13; h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** long → 8-byte little-endian → murmur3 (Iceberg hashLong). */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    hashBytes(b, 0)
  }

  def hashDouble(v: Double): Int =
    hashLong(java.lang.Double.doubleToLongBits(v))

  def hashAny(value: Any, dt: DataType): Int = dt match {
    case BooleanType => hashLong(if (value.asInstanceOf[Boolean]) 1L else 0L)
    case ByteType => hashLong(value.asInstanceOf[Byte].toLong)
    case ShortType => hashLong(value.asInstanceOf[Short].toLong)
    case IntegerType => hashLong(value.asInstanceOf[Int].toLong)
    case LongType => hashLong(value.asInstanceOf[Long])
    case FloatType => hashDouble(value.asInstanceOf[Float].toDouble)
    case DoubleType => hashDouble(value.asInstanceOf[Double])
    case DateType => hashLong(value.asInstanceOf[Int].toLong) // epoch days
    case TimestampType | TimestampNTZType =>
      hashLong(value.asInstanceOf[Long]) // epoch micros
    case StringType =>
      hashBytes(value.asInstanceOf[UTF8String].getBytes, 0)
    case BinaryType => hashBytes(value.asInstanceOf[Array[Byte]], 0)
    case d: DecimalType => // unscaled value as minimal big-endian bytes
      hashBytes(value.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toJavaBigDecimal.unscaledValue().toByteArray, 0)
    case other =>
      throw new IllegalArgumentException(s"murmur3_32 unsupported: $other")
  }
}

/** Catalyst expression with full codegen (bucket-partitioned writes put
  * this in the per-row hot path): the generated code calls the static
  * Murmur3 helpers directly, keeping the write projection inside
  * whole-stage codegen. */
case class Murmur3Hash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    Murmur3.hashAny(input, child.dataType)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = "graft.functions.Murmur3"
      val call = child.dataType match {
        case BooleanType => s"$m.hashLong($c ? 1L : 0L)"
        case ByteType | ShortType | IntegerType | DateType =>
          s"$m.hashLong((long) $c)"
        case LongType | TimestampType | TimestampNTZType =>
          s"$m.hashLong($c)"
        case FloatType => s"$m.hashDouble((double) $c)"
        case DoubleType => s"$m.hashDouble($c)"
        case StringType => s"$m.hashBytes($c.getBytes(), 0)"
        case BinaryType => s"$m.hashBytes($c, 0)"
        case _: DecimalType =>
          s"$m.hashBytes($c.toJavaBigDecimal().unscaledValue().toByteArray(), 0)"
        case other => throw new IllegalArgumentException(
          s"murmur3_32 unsupported: $other")
      }
      s"${ev.value} = $call;"
    })

  override protected def withNewChildInternal(c: Expression): Murmur3Hash32 =
    copy(child = c)
  override def prettyName: String = "murmur3_32"
}

object Murmur3Functions {
  /** murmur3_32(x) as a Column (reference ducklake_extension.cpp:124-126). */
  def murmur3_32(c: Column): Column =
    ColumnBridge.column(Murmur3Hash32(ColumnBridge.expr(c)))

  /** Iceberg bucket transform: (hash & Int.MaxValue) % n (reference
    * ducklake_partition_data.cpp bucket semantics). */
  def bucket(n: Int, c: Column): Column = {
    import org.apache.spark.sql.functions._
    pmod(murmur3_32(c).bitwiseAND(lit(Int.MaxValue)), lit(n))
  }
}
