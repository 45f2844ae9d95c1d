package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.contracts.MarkdownDoc
import graft.functions.text._

/** Markdown folder source (SURVEY.md §2.1 S1; reference `ManualMarkdownStep`
  * wurzel/steps/manual_markdown.py:17-23 + front-matter parse
  * wurzel/datacontract/common.py:96-149).
  *
  * Spark-first: a `binaryFile` scan with recursive lookup + glob — the file
  * listing and reads are distributed, unlike the reference's driver-side
  * `Path.glob` — then a columnar front-matter parse (regex
  * `(?s)^---\n(.*?)\n---\n?(.*)$`, common.py:17). Defaults mirror the
  * reference: keywords fall back to the filename stem, url falls back to
  * "<StepName>/<path>" (common.py:137-149).
  */
object MarkdownSource {

  def read(spark: SparkSession, folder: String, stepName: String = "ManualMarkdown"): Dataset[MarkdownDoc] = {
    import spark.implicits._
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.md")
      .option("recursiveFileLookup", "true")
      .load(folder)
      .select(col("path"), col("content").cast("string").as("raw"))
    parse(raw, stepName).as[MarkdownDoc]
  }

  /** Columnar front-matter extraction over (path, raw) rows. */
  def parse(raw: DataFrame, stepName: String): DataFrame = {
    // keywords fallback = filename up to the FIRST dot (reference
    // `path.name.split(".")[0]`, common.py:148: "file.de.md" -> "file")
    val stem = regexp_extract(col("path"), "([^/.]+)[^/]*$", 1)
    val kw = frontMatterField(col("raw"), "keywords")
    val u = frontMatterField(col("raw"), "url")
    raw.select(
      frontMatterBody(col("raw")).as("md"),
      when(kw =!= "", kw).otherwise(stem).as("keywords"),
      when(u =!= "", u).otherwise(concat(lit(stepName + "/"), col("path"))).as("url"),
      map(lit("source_path"), col("path")).as("metadata"))
  }
}
