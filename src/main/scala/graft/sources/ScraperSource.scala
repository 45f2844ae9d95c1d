package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.contracts.MarkdownDoc
import graft.functions.HtmlToMd
import graft.sinks.UpsertSink.{RetryPolicy, RetryableFailure}

/** Web-scrape source (SURVEY.md §2.1 S4; reference `ScraperAPIStep`
  * wurzel/steps/scraperapi/step.py:29-106: fetch URLs through a scraping
  * proxy, retry on 403/5xx, reduce the HTML body, convert to markdown).
  *
  * Spark shape: the URL list is a Dataset and fetching is an I/O-bound
  * `mapPartitions` — the reference's thread pool (step.py:86) becomes
  * partition parallelism; retry policy is the shared capped full-jitter
  * backoff; a URL whose fetch fails after retries is skipped and counted
  * (reference returns per-URL failures without failing the step). The
  * fetcher is injectable: production binds an HTTP client per executor,
  * tests bind a deterministic mock — the engine logic (batching, retry,
  * conversion, contract mapping) is identical.
  */
object ScraperSource {

  final case class UrlItem(url: String, title: String,
                           description: Option[String] = None, category: Option[String] = None)

  /** Executor-side page fetcher; throw RetryableFailure for 403/5xx. */
  trait Fetcher extends Serializable {
    def fetch(url: String): String
  }

  def scrape(urls: Dataset[UrlItem], fetcher: Fetcher,
             retry: RetryPolicy = RetryPolicy()): Dataset[MarkdownDoc] = {
    val spark = urls.sparkSession
    import spark.implicits._
    val fetched = spark.sparkContext.longAccumulator("scrape_ok")
    val skipped = spark.sparkContext.longAccumulator("scrape_skipped")
    urls.mapPartitions { it =>
      it.flatMap { item =>
        try {
          val html = retry.run(() => fetcher.fetch(item.url))
          val md = HtmlToMd.convert(html, item.url)
          // whitespace-empty conversion output is a convert FAILURE, never
          // an empty document (reference MarkdownConvertFailed,
          // html2md.py:102-103) — contained per-URL like fetch failures
          // rather than failing the job
          if (md.replace(" ", "").replace("\n", "").isEmpty) {
            skipped.add(1); None
          } else {
            fetched.add(1)
            Some(MarkdownDoc(
              md = md,
              keywords = item.category.getOrElse(item.title),
              url = item.url,
              metadata = Map("title" -> item.title) ++
                item.description.map("description" -> _).toMap))
          }
        } catch {
          case _: Exception => skipped.add(1); None
        }
      }
    }
  }
}
