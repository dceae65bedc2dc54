package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact scaled-integer cosine over two float-array embeddings in ONE
  * fused, codegen'd pass — the hot inner loop of every similarity
  * operator.
  *
  * Semantics are identical to the composable form
  * `cosineScaled(scaled(a), scaled(b))` in [[graft.operators.Similarity]]
  * (components rounded half-away-from-zero to 6 decimals, multiplied as
  * longs; dot/norms recombined with the same IEEE double tree), but where
  * that version walks three higher-order-function expressions per pair —
  * interpreted lambdas outside whole-stage codegen — this one loop
  * computes dot, |a|² and |b|² together inside the generated code. */
object ScaledCosineOps {
  /** round half away from zero after 1e6 scaling (matches Spark's and
    * DuckDB's ROUND on doubles, and QueryDsl's scaled-long convention) */
  @inline def sc(x: Float): Long = {
    val v = x.toDouble * 1000000d
    if (v >= 0) math.floor(v + 0.5).toLong else math.ceil(v - 0.5).toLong
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0L
    var aa = 0L
    var bb = 0L
    var i = 0
    while (i < n) {
      val la = sc(a.getFloat(i))
      val lb = sc(b.getFloat(i))
      dot += la * lb
      aa += la * la
      bb += lb * lb
      i += 1
    }
    dot.toDouble / (math.sqrt(aa.toDouble) * math.sqrt(bb.toDouble))
  }
}

case class ScaledCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    ScaledCosineOps.cosine(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ScaledCosineOps.cosine($a, $b);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ScaledCosine = copy(left = l, right = r)
  override def prettyName: String = "scaled_cosine"
}

object ScaledCosineFunctions {
  /** cosine(a, b) over array<float> columns, codegen'd */
  def scaledCosine(a: Column, b: Column): Column =
    ColumnBridge.column(
      ScaledCosine(ColumnBridge.expr(a), ColumnBridge.expr(b)))
}
