// Lives under org.apache.spark.sql because AbstractDataType and the
// Column↔Expression bridge (classic.ExpressionUtils) are private[sql] —
// the same placement every public Spark extension library uses for
// native expressions. All graft-facing entry points re-export from
// graft.ops.Vector / graft.functions.GraftExtensions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns — the hot inner loop of every embedding
  * operator ([[graft.ops.Vector]], [[graft.ops.Ann]], [[graft.ops.Dedup]]).
  *
  * Motivation: the higher-order-function formulation
  * (`aggregate(zip_with(a,b,_*_),0d,_+_) / (sqrt(...)*sqrt(...))`)
  * allocates a zipped array and evaluates three lambda folds per row;
  * this expression is one fused primitive loop that whole-stage codegen
  * inlines — no allocation, no virtual calls — and it computes the SAME
  * left-to-right summation, so results are bit-identical to the HOF
  * version (asserted by CosineSimSpec) and stay in parity with the
  * DuckDB oracle.
  *
  * Assumes non-null array elements (embedding vectors); a null array on
  * either side, or a length mismatch between the two arrays, yields null —
  * identical to the HOF reference's null behavior.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  // null is also produced for length-mismatched inputs, so the expression
  // is nullable even over non-nullable children.
  override def nullable: Boolean = true

  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // Length mismatch yields null, matching the HOF reference (zip_with
    // pads the shorter side with nulls, poisoning the fold to null).
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (dot, na, nb, n, i) =
        (ctx.freshName("dot"), ctx.freshName("na"), ctx.freshName("nb"),
          ctx.freshName("n"), ctx.freshName("i"))
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    double xi = $a.getDouble($i);
         |    double yi = $b.getDouble($i);
         |    $dot += xi * yi; $na += xi * xi; $nb += yi * yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column-API entry point: `cosine(a, b)`. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSim(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
