package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer dot product with whole-stage codegen (SURVEY.md §4 tier
  * (b): native Expression > Scala UDF for hot scalars). The similarity
  * scorers (brute/LSH/IVF cosine) evaluate one dot per candidate pair —
  * the innermost loop of the ANN paths. Unlike `Kernels.dotUdf` there is
  * no Array[Long] materialization and no codegen break: the loop reads the
  * unsafe ArrayData in place and the surrounding projection stays inside
  * WholeStageCodegen.
  *
  * Sums min(|a|, |b|) terms — same contract as Kernels.dotLong (quantized
  * vectors are equal-length by construction; the min guards ragged input
  * instead of throwing).
  */
case class DotLongExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_long requires ARRAY<BIGINT> args, got ${left.dataType.sql}, ${right.dataType.sql}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotLongExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.DotLongExpr.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLongExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_long"
}

object DotLongExpr {
  /** In-place ArrayData dot; called from generated code. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** DataFrame-API form. */
  def dotLong(a: Column, b: Column): Column = {
    import org.apache.spark.sql.classic.GraftPlanBridge
    GraftPlanBridge.column(
      DotLongExpr(GraftPlanBridge.staticExpr(a), GraftPlanBridge.staticExpr(b)))
  }
}
