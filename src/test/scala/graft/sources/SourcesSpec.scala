package graft.sources

import graft.SparkSpec
import graft.sinks.UpsertSink.{RetryPolicy, RetryableFailure}
import graft.sinks.VersionedTableSink
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

object MockWeb {
  val failures = new ConcurrentHashMap[String, AtomicInteger]()
}

class MockFetcher extends ScraperSource.Fetcher {
  def fetch(url: String): String = {
    val ctr = MockWeb.failures.get(url)
    if (ctr != null && ctr.getAndDecrement() > 0) throw new RetryableFailure(s"503 $url")
    if (url.contains("empty")) "<a></a>" // converts to whitespace-only markdown
    else
      s"""<html><body><h1>Page $url</h1><p>Body of <b>$url</b>.</p>
         |<a href="/rel">rel</a><script>junk()</script></body></html>""".stripMargin
  }
}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val noSleep = RetryPolicy(sleeper = _ => (), jitter = identity)

  test("sftp source: recursive .md discovery, distributed fetch, front-matter + fallbacks (S2)") {
    import java.nio.file.{Files, Paths}
    val root = tmpDir("sftp")
    def put(rel: String, body: String): Unit = {
      val p = Paths.get(root, rel)
      Files.createDirectories(p.getParent)
      Files.write(p, body.getBytes("UTF-8"))
    }
    put("a/doc1.md", "---\nkeywords: kw1\nurl: https://kb/one\n---\n# One\n\nbody one")
    put("a/b/doc2.md", "# Two\n\nno front matter") // fallbacks: stem keywords, step/path url
    put("a/readme.txt", "not markdown")
    put("top.md", "---\nkeywords: kwt\n---\ntop body")
    val docs = SftpMarkdownSource
      .read(spark, RemoteFs.Local(root), root, stepName = "SFTPManualMarkdown")
      .collect().sortBy(_.url)
    assert(docs.length == 3) // .txt excluded
    val d1 = docs.find(_.url == "https://kb/one").get
    assert(d1.keywords == "kw1" && d1.md.startsWith("# One"))
    val d2 = docs.find(_.md.startsWith("# Two")).get
    assert(d2.keywords == "doc2") // filename-stem fallback (common.py:137-141)
    assert(d2.url == s"SFTPManualMarkdown/$root/a/b/doc2.md") // step/path fallback
    val dt = docs.find(_.keywords == "kwt").get
    assert(dt.md == "top body")
  }

  test("sftp source: non-recursive listing stays at the top level; empty tree fails the step (S2)") {
    import java.nio.file.{Files, Paths}
    val root = tmpDir("sftp2")
    Files.write(Paths.get(root, "top.md"), "top".getBytes("UTF-8"))
    Files.createDirectories(Paths.get(root, "deep"))
    Files.write(Paths.get(root, "deep", "nested.md"), "nested".getBytes("UTF-8"))
    val fs = RemoteFs.Local(root).open()
    assert(SftpMarkdownSource.findMarkdownFiles(fs, root, recursive = false)
      .map(_.split('/').last) == Seq("top.md"))
    assert(SftpMarkdownSource.findMarkdownFiles(fs, root, recursive = true)
      .map(_.split('/').last).sorted == Seq("nested.md", "top.md"))
    // reference StepFailed when nothing is found (run :112-114)
    val empty = tmpDir("sftp3")
    intercept[IllegalStateException] {
      SftpMarkdownSource.read(spark, RemoteFs.Local(empty), empty)
    }
  }

  test("docling source: distributed convert, keyword from first heading, skip-on-failure (S3)") {
    object StubConverter extends DoclingSource.DocConverter {
      def convert(url: String): String =
        if (url.contains("bad")) throw new java.io.IOException(s"unreadable $url")
        else s"<!-- image -->\n# Handbuch ${url.split('/').last}\n\nInhalt mit \\_escape\\_."
    }
    val urls = Seq("https://kb/a.pdf", "https://kb/bad.pdf", "https://kb/c.pdf")
    val docs = DoclingSource.read(spark, StubConverter, urls, defaultKeyword = "manual")
      .collect().sortBy(_.url)
    assert(docs.map(_.url).toSeq == Seq("https://kb/a.pdf", "https://kb/c.pdf")) // bad skipped
    assert(docs.head.keywords == "manual Handbuch a.pdf")
    assert(docs.head.md.contains("# Handbuch a.pdf"))
  }

  test("docling keyword extraction: comments stripped, ATX vs HTML heading order, escapes (S3)") {
    import DoclingSource.extractKeyword
    assert(extractKeyword("<!-- note -->\n## Zweite\\_Ebene\n\ntext") == "Zweite_Ebene")
    assert(extractKeyword("<h2 class=x>Html <b>Title</b></h2>\n# Atx Later") == "Html Title")
    assert(extractKeyword("# Atx First\n<h1>Later</h1>") == "Atx First")
    assert(extractKeyword("no headings at all") == "")
    assert(extractKeyword("<!-- # not a heading -->\nplain") == "")
  }

  test("scraper source: distributed fetch + html->md + retry + skip-on-failure (S4)") {
    MockWeb.failures.clear()
    MockWeb.failures.put("https://a.io/flaky", new AtomicInteger(1)) // one transient failure
    MockWeb.failures.put("https://a.io/dead", new AtomicInteger(99)) // always fails
    val urls = Seq(
      ScraperSource.UrlItem("https://a.io/one", "One", category = Some("cat1")),
      ScraperSource.UrlItem("https://a.io/flaky", "Flaky"),
      ScraperSource.UrlItem("https://a.io/dead", "Dead"),
      // fetch succeeds but converts to whitespace-only markdown: a convert
      // failure (reference MarkdownConvertFailed, html2md.py:102-103),
      // never an empty document
      ScraperSource.UrlItem("https://a.io/empty", "Empty")).toDS()
    val docs = ScraperSource.scrape(urls, new MockFetcher, noSleep).collect().sortBy(_.url)
    assert(docs.length == 2) // dead + empty skipped, step not failed
    assert(!docs.exists(_.url.contains("empty")))
    val one = docs.find(_.url == "https://a.io/one").get
    assert(one.md.contains("# Page https://a.io/one"))
    assert(one.md.contains("**https://a.io/one**"))
    assert(one.md.contains("[rel](https://a.io/rel)")) // absolutized against page url
    assert(!one.md.contains("junk"))
    assert(one.keywords == "cat1")
    assert(one.metadata("title") == "One")
  }

  test("DataSource V2: kb metadata readable via spark.read.format (S2 custom-source slot)") {
    val root = tmpDir("kbmeta")
    val sink = new VersionedTableSink(root, "kb", historyLen = 10)
    sink.write(Seq((1, "a")).toDF("id", "v"))
    sink.write(Seq((2, "b"), (3, "c")).toDF("id", "v"))
    val meta = spark.read.format("graft.sources.KbMetaSource")
      .option("root", root).option("name", "kb").load()
      .orderBy("version")
    assert(meta.schema == KbMetaSource.schema)
    val rows = meta.collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(rows.map(_.getBoolean(2)).toSeq == Seq(false, true)) // alias on v2
    assert(rows.forall(_.getLong(3) >= 1))
    // the scan composes with SQL like any table
    meta.createOrReplaceTempView("kb_versions")
    assert(spark.sql("SELECT version FROM kb_versions WHERE aliased").collect()
      .map(_.getInt(0)).toSeq == Seq(2))
  }
}
