package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Argmin-distance centroid assignment for the k-means operator: given a
  * raw float-array embedding, scales each component to a 1e6 long
  * ([[ScaledCosineOps.sc]], the same rounding as
  * [[graft.operators.Similarity.scaled]]) INSIDE the loop and returns
  * the 0-based index of the nearest centroid by squared L2 distance,
  * ties broken toward the smaller index.
  *
  * All-integer arithmetic — a 64-dim squared distance of ±2e6-scaled
  * component deltas is ≤ ~2.6e14, comfortably inside a long — so the
  * assignment is bit-identical to the DuckDB oracle's unrolled-CTE
  * computation. Taking the FLOAT array (not a pre-scaled long array)
  * matters: the scaling would otherwise be a `transform` higher-order
  * function, which is not codegen-supported and would drop the whole
  * projection out of WholeStageCodegen. One fused loop over k·dim per
  * row keeps it in (KMeansSpec asserts this). Centroids ride along as a
  * reference object in the generated code — k·dim longs of plan
  * metadata per round. */
case class NearestCentroid(child: Expression,
    centroids: Array[Array[Long]]) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    NearestCentroidOps.assign(v.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "long[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NearestCentroidOps.assign($v, $ref);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroid = copy(child = newChild)
}

object NearestCentroidOps {
  def assign(v: ArrayData, centroids: Array[Array[Long]]): Int = {
    val n = v.numElements()
    val sv = new Array[Long](n)
    var i = 0
    while (i < n) { sv(i) = ScaledCosineOps.sc(v.getFloat(i)); i += 1 }
    var best = 0
    var bestDist = Long.MaxValue
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      var d = 0L
      i = 0
      while (i < c.length) {
        val x = sv(i) - c(i)
        d += x * x
        i += 1
      }
      if (d < bestDist) { bestDist = d; best = j }
      j += 1
    }
    best
  }

  def distTo(v: ArrayData, centroids: Array[Array[Long]],
      cluster: Int): Long = {
    val c = centroids(cluster)
    var d = 0L
    var i = 0
    while (i < c.length) {
      val x = ScaledCosineOps.sc(v.getFloat(i)) - c(i)
      d += x * x
      i += 1
    }
    d
  }
}

/** Squared L2 distance from a float-array embedding to ONE centroid of a
  * codebook, selected per row by the 0-based `cluster` column — the
  * medoid-pass companion of [[NearestCentroid]]: same inside-the-loop
  * scaling, same integer arithmetic, fused + codegen'd instead of a
  * zip_with/aggregate HOF pair that would leave WholeStageCodegen. */
case class CentroidDistance(left: Expression, right: Expression,
    centroids: Array[Array[Long]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any, cl: Any): Any =
    NearestCentroidOps.distTo(v.asInstanceOf[ArrayData],
      centroids, cl.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "long[][]")
    nullSafeCodeGen(ctx, ev, (v, cl) =>
      s"${ev.value} = graft.functions.NearestCentroidOps" +
        s".distTo($v, $ref, $cl);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CentroidDistance =
    copy(left = newLeft, right = newRight)
}

object NearestCentroidFunctions {
  /** `floatVec` is the raw array<float> embedding column (or a slice of
    * it); scaling happens inside the fused loop */
  def nearestCentroid(floatVec: Column,
      centroids: Array[Array[Long]]): Column =
    ColumnBridge.column(
      NearestCentroid(ColumnBridge.expr(floatVec), centroids))

  /** squared L2 distance to `centroids(cluster)`; cluster is 0-based */
  def centroidDistance(floatVec: Column, cluster: Column,
      centroids: Array[Array[Long]]): Column =
    ColumnBridge.column(CentroidDistance(ColumnBridge.expr(floatVec),
      ColumnBridge.expr(cluster), centroids))
}
