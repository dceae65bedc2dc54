package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Size-capped top-k aggregate: keeps the k SMALLEST rows of `sortKey`
  * (struct compared field-wise ascending — negate a numeric field for
  * descending) and returns the matching `payload` structs in sort order
  * as `array<payload>`.
  *
  * This is the bounded-buffer alternative to `row_number() <= k` over a
  * window: the window plan range-exchanges EVERY row and sorts whole
  * partitions (O(n log n) per task, and the sort grows with the data);
  * this aggregate's state per group is k rows — each input row costs one
  * comparison against the current k-th (reject) or an O(k)
  * insertion-sort step (accept) — partial aggregation runs map-side, so
  * the exchange carries ≤ |groups|·k rows instead of |rows|. The q18
  * HAVING-broadcast and the gap-stats 8-day buckets bound their state the
  * same way; this closes the window-rank shape (reference runs it as
  * TPC-H-adjacent top-n-per-group; DuckDB's window sort is a fused
  * single-node kernel, this is the cluster-idiom equivalent).
  *
  * Buffers serialize as plain UnsafeRow bytes for partial-merge shuffles.
  * Evaluation is interpreted (TypedImperativeAggregate is object-based by
  * design); the per-row hot path is one struct comparison.
  */
case class BoundedTopKAgg(
    sortKey: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[
      scala.collection.mutable.ArrayBuffer[(UnsafeRow, UnsafeRow)]] {

  require(k > 0, s"bounded_topk needs k > 0, got $k")

  // dataType is only legal on resolved children — validate post-analysis
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (sortKey.dataType.isInstanceOf[StructType] &&
      payload.dataType.isInstanceOf[StructType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        "bounded_topk expects STRUCT sort key and payload, got " +
          s"(${sortKey.dataType}, ${payload.dataType})")

  private type Buf = scala.collection.mutable.ArrayBuffer[(UnsafeRow, UnsafeRow)]

  override def children: Seq[Expression] = Seq(sortKey, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(payload.dataType,
    containsNull = false)

  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(sortKey.dataType)
  @transient private lazy val keyProj =
    UnsafeProjection.create(Array(sortKey.dataType))
  @transient private lazy val payProj =
    UnsafeProjection.create(Array(payload.dataType))

  override def createAggregationBuffer(): Buf = new Buf

  private def keyOf(r: UnsafeRow): InternalRow =
    r.getStruct(0, sortKey.dataType.asInstanceOf[StructType].fields.length)

  private def insert(buf: Buf, key: UnsafeRow, pay: UnsafeRow): Unit = {
    val kk = keyOf(key)
    if (buf.size >= k &&
      ordering.compare(kk, keyOf(buf.last._1)) >= 0) return // fast reject
    // binary search for the insertion point (first element > key)
    var lo = 0
    var hi = buf.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ordering.compare(keyOf(buf(mid)._1), kk) <= 0) lo = mid + 1
      else hi = mid
    }
    buf.insert(lo, (key, pay))
    if (buf.size > k) buf.remove(k): Unit
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val kv = sortKey.eval(input)
    if (kv != null) {
      // copy() — UnsafeProjection reuses its output row
      val key = keyProj(InternalRow(kv)).copy()
      val pay = payProj(InternalRow(payload.eval(input))).copy()
      insert(buf, key, pay)
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach { case (key, pay) => insert(buf, key, pay) }
    buf
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.map(_._2.getStruct(0,
      payload.dataType.asInstanceOf[StructType].fields.length).copy())
      .toArray[Any])

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, pay) =>
      val kb = key.getBytes
      val pb = pay.getBytes
      out.writeInt(kb.length); out.write(kb)
      out.writeInt(pb.length); out.write(pb)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      val pb = new Array[Byte](in.readInt()); in.readFully(pb)
      val key = new UnsafeRow(1); key.pointTo(kb, kb.length)
      val pay = new UnsafeRow(1); pay.pointTo(pb, pb.length)
      buf += ((key, pay))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BoundedTopKAgg =
    copy(sortKey = c(0), payload = c(1))
  override def prettyName: String = "bounded_topk"
}

object BoundedTopK {
  /** array of the k payload structs with the smallest sortKey structs
    * (field-wise ascending), in sort order */
  def boundedTopK(k: Int, sortKey: Column, payload: Column): Column =
    ColumnBridge.column(
      BoundedTopKAgg(ColumnBridge.expr(sortKey),
        ColumnBridge.expr(payload), k)
        .toAggregateExpression())
}
