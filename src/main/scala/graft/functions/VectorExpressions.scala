package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact int64 dot product of two `array<bigint>` columns.
  *
  * The scale path for similarity search: embeddings are pre-scaled to
  * exact int64 (TextDsl.scaledVec), and the pairwise kernel inside the
  * O(n·m) candidate loop must be compiled code, not an interpreted
  * higher-order-function chain — `aggregate(zip_with(a, b, _*_), …)`
  * allocates and interprets per element, ~100× slower, which dominates
  * wall-clock on a brute-force or LSH-bucketed neighbor join.
  *
  * Participates in whole-stage codegen via [[doGenCode]]: the loop below
  * compiles into the generated join-stage Java, reading the unsafe array
  * words directly with no boxing.
  *
  * Semantics match the HOF formulation for well-formed inputs (equal
  * lengths, no null elements — both guaranteed by scaledVec): sum over i
  * of a[i]*b[i] in wrapping int64 arithmetic.
  */
case class DotProductInt64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_int64"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductInt64 =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Exact int64 dot product (codegen'd). */
  def dotInt64(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductInt64(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
