package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace token counter with whole-stage codegen (SURVEY.md §4:
  * "custom Expressions for hot scalar functions if UDF overhead shows up" —
  * preference order native Expression > Scala UDF).
  *
  * Counts maximal non-whitespace runs (== WhitespaceTokenizer.count, the
  * empty-filtering word count). Unlike a UDF there is no String
  * materialization: the loop walks the UTF8String bytes; ASCII whitespace
  * matches Java's regex \s class ([ \t\n\x0B\f\r]).
  */
case class TokenCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_count_native requires STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    TokenCountExpr.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenCountExpr.count($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCountExpr =
    copy(child = newChild)

  override def prettyName: String = "token_count_native"
}

object TokenCountExpr {
  /** Byte-level token count; called from generated code. */
  def count(s: UTF8String): Int = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    var i = 0
    var tokens = 0
    var inTok = false
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, offset + i)
      val ws = b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
        b == 0x0b.toByte || b == '\f'.toByte || b == '\r'.toByte
      if (!ws && !inTok) { tokens += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    tokens
  }
}
