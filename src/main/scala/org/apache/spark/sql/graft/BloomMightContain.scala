// Lives under org.apache.spark.sql for the same reason as CosineSim:
// the Column↔Expression bridge (classic.ExpressionUtils) is
// private[sql]. Graft-facing entry points re-export from graft.ops.Dedup.
package org.apache.spark.sql.graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression probing a serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] — the memory-bounded
  * membership test incremental dedup needs at 100 TB, where the exact
  * anti-join's build side (every content key ever ingested) no longer
  * fits anywhere, but a ~1.2 bytes/key sketch still broadcasts.
  *
  * Mirrors the shape of Spark's own runtime-filter expression
  * (`BloomFilterMightContain(bloomFilterExpression, valueExpression)`):
  * the first child must be a FOLDABLE binary (the staged sketch bytes),
  * so the filter deserializes ONCE per task via a transient lazy val and
  * per-row work is one hash probe. No false negatives by construction —
  * a true duplicate is always flagged; false positives are bounded by
  * the fpp the sketch was built with (DedupBloomSpec replays the exact
  * bit pattern driver-side and pins both properties).
  */
case class BloomMightContain(bloom: Expression, value: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = bloom
  override def right: Expression = value

  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, StringType)

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!bloom.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains requires a constant (foldable) bloom argument")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  /** Deserialized once per task (transient: rebuilt after executor-side
    * deserialization of the expression tree, never shipped as an object
    * graph). */
  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(
      new ByteArrayInputStream(bloom.eval(null).asInstanceOf[Array[Byte]]))

  override protected def nullSafeEval(bloomBytes: Any, v: Any): Any =
    // putString/mightContainString hash the UTF-8 bytes; probing the
    // UTF8String's bytes directly skips the java.lang.String round-trip.
    filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => {
      s"${ev.value} = $ref.mightContainBinary($v.getBytes());"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(bloom = newLeft, value = newRight)
}

object BloomMightContain {
  /** Column-API entry point: `bloomContains(sketchBytesLiteral, key)`. */
  def apply(bloom: Column, value: Column): Column =
    ExpressionUtils.column(
      BloomMightContain(ExpressionUtils.expression(bloom),
        ExpressionUtils.expression(value)))
}
