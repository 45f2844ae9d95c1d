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
  /** Byte-level token count; called from generated code.
    *
    * Boundary semantics match WhitespaceTokenizer.count exactly: that
    * counter runs String.trim first, which strips ALL chars <= U+0020 at
    * the ends (a superset of the six \s chars), so a leading " "
    * must not count as its own token. Chars <= U+0020 are single UTF-8
    * bytes, so the byte-level boundary skip ((b & 0xFF) <= 0x20 — the
    * mask keeps multi-byte sequences, whose bytes are >= 0x80, out) is
    * equivalent to trim. Interior scanning keeps the six-char \s set,
    * also matching the post-trim scan. */
  def count(s: UTF8String): Int = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    def at(i: Int): Byte = org.apache.spark.unsafe.Platform.getByte(base, offset + i)
    var lo = 0
    while (lo < n && (at(lo) & 0xff) <= 0x20) lo += 1
    var hi = n
    while (hi > lo && (at(hi - 1) & 0xff) <= 0x20) hi -= 1
    var i = lo
    var tokens = 0
    var inTok = false
    while (i < hi) {
      val b = at(i)
      val ws = b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
        b == 0x0b.toByte || b == '\f'.toByte || b == '\r'.toByte
      if (!ws && !inTok) { tokens += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    tokens
  }
}
