// Lives under org.apache.spark.sql for the same reason as CosineSim: the
// Column↔Expression bridge is private[sql]. Graft-facing entry points
// re-export from graft.ops.Ann.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression for squared L2 distance over two
  * `array<double>` columns — the hot inner loop of the PQ index build
  * ([[graft.ops.Ann]]: the encode/Lloyd argmin evaluates it 16× per
  * subspace per row) and the exact re-rank.
  *
  * Same design as [[CosineSim]]: one fused primitive loop that
  * whole-stage codegen inlines, computing the IDENTICAL left-to-right
  * summation as the HOF formulation
  * (`aggregate(zip_with(a,b,(x,y)=>(x-y)*(x-y)), 0d, _+_)`), so results
  * are bit-identical (L2SqSpec asserts parity) and the AnnSpec
  * driver-side fixed-point replay stays exact. Null array or
  * length-mismatched inputs yield null, matching the HOF reference.
  */
case class L2Sq(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_l2sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (s, n, i, d) = (ctx.freshName("s"), ctx.freshName("n"),
        ctx.freshName("i"), ctx.freshName("d"))
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)
}

object L2Sq {
  /** Column-API entry point: `l2sq(a, b)`. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      L2Sq(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
