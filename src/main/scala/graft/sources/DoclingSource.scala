package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.contracts.MarkdownDoc

/** PDF/DOCX extraction step (SURVEY.md §2.1 S3; reference `DoclingStep`,
  * wurzel/steps/docling/docling_step.py:62-145). The step's orchestration
  * runs in-engine against the [[DocConverter]] seam: per-URL convert
  * distributed over partitions, markdown export, keyword extraction (HTML
  * comments stripped, escaped underscores unescaped, first heading's text —
  * `extract_keywords` :89-110), keywords = "<DEFAULT_KEYWORD> <heading>"
  * (:131-135), and skip-on-failure per URL (:138-140 logs and continues —
  * unlike the SFTP step, a bad document does NOT fail the step). The
  * docling converter itself (PDF parse + EasyOCR models) is the env-blocked
  * piece; it drops in as a DocConverter, one instance per partition.
  *
  * Scale shape: URLs round-robin over partitions and each executor converts
  * independently — OCR is CPU-bound per document, so throughput scales with
  * cores; extracted markdown never passes through the driver. */
object DoclingSource {

  /** Converter seam (reference DocumentConverter.convert +
    * export_to_markdown(image_placeholder="")): url -> markdown, throwing
    * java.io.IOException for unreadable/unfetchable documents. */
  trait DocConverter extends Serializable { def convert(url: String): String }

  private val CommentRe = "(?s)<!--.*?-->".r
  private val AtxRe = "(?m)^\\s{0,3}(#{1,6})\\s+(.+?)\\s*#*\\s*$".r
  private val HtmlHeadingRe = "(?is)<h[1-6][^>]*>(.*?)</h[1-6]>".r
  private val TagRe = "<[^>]+>".r

  /** First heading's text after cleanup (reference `extract_keywords`:
    * HTML comments like `<!-- image -->` removed, escaped underscores
    * unescaped, first h1-h6 — ATX or inline HTML — stripped to text). */
  def extractKeyword(md: String): String = {
    val cleaned = CommentRe.replaceAllIn(md, "").replace("\\_", "_")
    val atx = AtxRe.findFirstMatchIn(cleaned).map(m => (m.start, m.group(2)))
    val html = HtmlHeadingRe.findFirstMatchIn(cleaned)
      .map(m => (m.start, TagRe.replaceAllIn(m.group(1), "")))
    (atx, html) match {
      case (Some((ai, a)), Some((hi, h))) => if (ai <= hi) a.trim else h.trim
      case (Some((_, a)), None) => a.trim
      case (None, Some((_, h))) => h.trim
      case _ => ""
    }
  }

  /** Full step: distributed convert + contract assembly; failed URLs are
    * skipped (reference warning semantics). */
  def read(spark: SparkSession, converter: DocConverter, urls: Seq[String],
           defaultKeyword: String = "pdf"): Dataset[MarkdownDoc] = {
    import spark.implicits._
    val parallelism = math.max(1, math.min(spark.sparkContext.defaultParallelism, urls.length))
    spark.createDataset(urls)
      .repartition(parallelism)
      .mapPartitions { it =>
        it.flatMap { url =>
          try {
            val md = converter.convert(url)
            Some(MarkdownDoc(
              md = md,
              keywords = Seq(defaultKeyword, extractKeyword(md)).mkString(" "),
              url = url))
          } catch {
            case _: java.io.IOException => None // log-and-continue (:138-140)
          }
        }
      }
  }
}
