package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native ADC table lookup with whole-stage codegen (PqIndex's scoring
  * inner loop): sum over sub-spaces j of table(j)(codes(j)). The ScalaUDF
  * form boxed every per-query table to Seq[Seq[Long]] per CANDIDATE row —
  * measured as the dominant ADC cost (the 50k-candidate smoke scored
  * barely faster than exact brute force). This reads the nested unsafe
  * ArrayData in place and keeps the scoring projection inside
  * WholeStageCodegen.
  */
case class AdcLookupExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ArrayType(LongType, _), _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"adc_lookup requires (ARRAY<ARRAY<BIGINT>>, ARRAY<INT>), got ${l.sql}, ${r.sql}")
  }

  override protected def nullSafeEval(t: Any, codes: Any): Any =
    AdcLookupExpr.lookup(t.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, c) => s"graft.plans.AdcLookupExpr.lookup($t, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcLookupExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "adc_lookup"
}

object AdcLookupExpr {
  /** In-place nested ArrayData lookup sum; called from generated code.
    * Shape-checked: UnsafeArrayData.getLong does NO bounds checking, so a
    * codes/table mismatch (codes persisted under one PQ model, tables
    * built from another) would otherwise read adjacent raw memory and
    * return silently wrong distances instead of failing. */
  def lookup(t: ArrayData, codes: ArrayData): Long = {
    val m = codes.numElements()
    if (t.numElements() != m)
      throw new IllegalArgumentException(
        s"ADC table has ${t.numElements()} sub-spaces but codes have $m — " +
          "were the codes encoded with a different PQ model?")
    var s = 0L
    var j = 0
    while (j < m) {
      val sub = t.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= sub.numElements())
        throw new IllegalArgumentException(
          s"code $c out of range for a ${sub.numElements()}-entry codebook " +
            s"(sub-space $j) — were the codes encoded with a different PQ model?")
      s += sub.getLong(c)
      j += 1
    }
    s
  }

  /** DataFrame-API form. */
  def adcLookup(table: Column, codes: Column): Column = {
    import org.apache.spark.sql.classic.GraftPlanBridge
    GraftPlanBridge.column(
      AdcLookupExpr(GraftPlanBridge.staticExpr(table), GraftPlanBridge.staticExpr(codes)))
  }
}
