package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating expression (SURVEY.md §2.14 "one-row -> many-rows" SQL
  * surface): the semantic splitter as a Catalyst `Generator`, the same
  * class as `explode`. Each input markdown yields (chunk, chunk_index,
  * chunks_count) rows, so SQL can LATERAL VIEW over it:
  *
  * {{{ SELECT d.id, c.chunk_index, c.chunk
  *     FROM docs d LATERAL VIEW semantic_split_rows(d.md) c }}}
  *
  * The flatMap form (SplitStep) remains the typed-pipeline path; this is
  * the equivalent declarative surface — Catalyst prunes/pushes around a
  * Generate node, which it cannot do through an opaque flatMap. */
case class SemanticSplitGen(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  @transient private lazy val splitter = new graft.split.SemanticSplitter()

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk", StringType, nullable = false),
    StructField("chunk_index", IntegerType, nullable = false),
    StructField("chunks_count", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"semantic_split_rows requires STRING, got ${child.dataType.sql}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val md = child.eval(input)
    if (md == null) Nil
    else {
      val chunks = splitter.splitMarkdown(md.toString)
      val n = chunks.length
      chunks.zipWithIndex.map { case (c, i) =>
        InternalRow(UTF8String.fromString(c), i, n)
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SemanticSplitGen =
    copy(child = newChild)

  override def prettyName: String = "semantic_split_rows"
}
