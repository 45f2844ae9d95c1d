package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen Bloom-filter membership probe over a broadcast filter
  * (operators/BloomPrune's scan-side predicate). The ScalaUDF form breaks
  * whole-stage codegen exactly where it hurts most — the full-corpus scan
  * the pruned join exists to keep cheap — and boxes a Long per row. This
  * keeps the probe inside WholeStageCodegen: the filter handle is resolved
  * from the broadcast ONCE per codegen instance (mutable state, not a
  * per-row `value()` lookup) and the probe is a direct long call.
  */
case class BloomProbeExpr(child: Expression, bc: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_probe requires a BIGINT key hash, got ${t.sql}")
  }

  override protected def nullSafeEval(h: Any): Any =
    bc.value.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bc, "org.apache.spark.broadcast.Broadcast")
    val filterVar = ctx.addMutableState(
      "org.apache.spark.util.sketch.BloomFilter", "bloomFilter",
      v => s"$v = (org.apache.spark.util.sketch.BloomFilter) $bcRef.value();")
    defineCodeGen(ctx, ev, h => s"$filterVar.mightContainLong($h)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbeExpr =
    copy(child = newChild)

  override def prettyName: String = "bloom_probe"
}
