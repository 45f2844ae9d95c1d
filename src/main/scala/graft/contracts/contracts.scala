package graft.contracts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data contracts (SURVEY.md §1.1): the reference's pydantic/pandera models
  * become case classes + Encoders; schema enforcement is the Analyzer.
  *
  * MarkdownDoc <- MarkdownDataContract (wurzel/datacontract/common.py:80-83).
  * Chunk       <- splitter output (semantic_splitter.py:763-798).
  * EmbeddingRow <- EmbeddingResult (wurzel/steps/data.py:11-21).
  * EmbeddingMultiRow <- EmbeddingMultiVectorResult (steps/data.py:24-36).
  */
case class MarkdownDoc(
    md: String,
    keywords: String,
    url: String,
    metadata: Map[String, String] = Map.empty)

case class Chunk(
    md: String,
    keywords: String,
    url: String,
    metadata: Map[String, String])

case class EmbeddingRow(
    text: String,
    url: String,
    vector: Array[Float],
    keywords: String,
    embedding_input_text: String,
    metadata: Map[String, String])

case class EmbeddingMultiRow(
    text: String,
    url: String,
    vectors: Array[Array[Float]],
    splits: Array[String],
    keywords: String,
    metadata: Map[String, String])

/** Contract metrics (SURVEY.md §2.4 A1; datacontract.py:50-69,
  * common.py:151-157): rows, md char/line totals, keyword counts — computed
  * as one aggregation, or attached to a running query via observe(). */
object ContractMetrics {
  def markdownMetrics: Seq[Column] = Seq(
    count(lit(1)).as("rows"),
    sum(length(col("md"))).as("md_char_len"),
    sum(size(split(col("md"), "\n"))).as("md_line_count"),
    sum(size(split(col("keywords"), ","))).as("keywords_count"))

  /** Aggregate the metrics into a single-row DataFrame. */
  def of(df: DataFrame): DataFrame = df.agg(markdownMetrics.head, markdownMetrics.tail: _*)

  /** Attach as a named observation (collected by StepReport's listener). */
  def observed(df: DataFrame, name: String): DataFrame =
    df.observe(name, markdownMetrics.head, markdownMetrics.tail: _*)
}
