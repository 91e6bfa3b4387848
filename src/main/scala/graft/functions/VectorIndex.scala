package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Compiled IVF cell assignment: argmin squared-L2 over a fixed centroid
  * matrix. The declarative formulation (a fold over an array literal of
  * centroid structs, with a nested zip_with distance fold) evaluates
  * interpreted lambdas per centroid element — nCells × dim boxed ops per
  * row; this kernel runs the whole double loop in compiled JVM code and
  * participates in whole-stage codegen via a reference object. Ties
  * resolve to the lowest cell index, matching the fold's strict `<`.
  */
object VectorIndex {
  def nearestCell(fd: ArrayData, centroids: Array[Array[Double]]): Int = {
    if (centroids.length == 0)
      throw new IllegalArgumentException(
        "nearest_centroid: empty centroid matrix — the IVF index has no cells")
    val dims = fd.numElements()
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      // fail fast on dimension mismatch: silently truncating the loop
      // would assign vectors to wrong cells (one length compare per
      // centroid, negligible next to the dim loop)
      if (ctr.length != dims)
        throw new IllegalArgumentException(
          s"nearest_centroid: vector has $dims dims but centroid $c has ${ctr.length}")
      var d = 0.0
      var i = 0
      while (i < dims) {
        val diff = fd.getDouble(i) - ctr(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
}

/** array<double> vector → int cell id (argmin L2 against `centroids`,
  * whose row index IS the cell id — callers pass rows sorted by cell). */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(input: Any): Any =
    VectorIndex.nearestCell(input.asInstanceOf[ArrayData], centroids)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorIndex.nearestCell($c, $centRef)")
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
}

object VectorIndexFunctions {
  def nearestCentroid(fd: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(fd), centroids))
}
