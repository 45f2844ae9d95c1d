package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

class MarkdownSourceSpec extends SparkSpec {

  test("recursive *.md scan with YAML front-matter parse and fallbacks (S1, common.py:96-149)") {
    val dir = tmpDir("mdsrc")
    Files.createDirectories(Paths.get(s"$dir/sub"))
    Files.writeString(Paths.get(s"$dir/with_fm.md"),
      "---\nkeywords: bread,butter\nurl: some/file/path.md\n---\n# Some title\nBody text here")
    Files.writeString(Paths.get(s"$dir/sub/plain.md"),
      "# No front matter\n\njust a body")
    Files.writeString(Paths.get(s"$dir/ignored.txt"), "not markdown")

    val docs = MarkdownSource.read(spark, dir).collect().sortBy(_.url)
    assert(docs.length == 2)

    val withFm = docs.find(_.url == "some/file/path.md").get
    assert(withFm.keywords == "bread,butter")
    assert(withFm.md.startsWith("# Some title"))
    assert(!withFm.md.contains("---"))

    val plain = docs.find(_.url != "some/file/path.md").get
    assert(plain.keywords == "plain")           // filename-stem fallback
    assert(plain.url.startsWith("ManualMarkdown/")) // step-name fallback
    assert(plain.md.startsWith("# No front matter"))
    assert(plain.metadata.contains("source_path"))
  }

  test("front-matter case table (tests/datacontract/md_test.py:11-36)") {
    // (md, expected url or "" for fallback, expected keywords or "" for
    // filename-stem fallback) — the reference's parametrized from_file pins
    val cases = Seq(
      ("---\n\nurl: myurl\n---\nText", "myurl", ""),
      ("---\n\n   url: myurl\n---\nText", "myurl", ""), // space indent parses
      ("---\n\n\t url: myurl\n---\nText", "", ""),      // tab = invalid YAML, all metadata dropped
      ("---\nurl: myurl\n---\nText", "myurl", ""),
      ("---\n\nurl: myurl\n\nkeywords: bread\n---\nText", "myurl", "bread"),
      ("---\n\nurl: myurl\n\nkeywords: bread,butter\n---\nText", "myurl", "bread,butter"),
      ("---\n\n\nkeywords: bread,butter\n---\nText", "", "bread,butter"),
      ("---\n\n\nkeywords: bread,butter\n\n---\nText\nurl:url_body", "", "bread,butter"),
      ("---\n\n\nkeywords: bread,butter\nurl: url_header\n---\nText", "url_header", "bread,butter"),
      // empty-valued field: the value regex must not cross the newline and
      // swallow the next header line — url falls back, keywords still parse
      ("---\nurl:\nkeywords: bread\n---\nText", "", "bread"))
    cases.zipWithIndex.foreach { case ((md, wantUrl, wantKw), i) =>
      val dir = tmpDir(s"fmcase$i")
      Files.writeString(Paths.get(s"$dir/file.md"), md)
      val doc = MarkdownSource.read(spark, dir).collect().head
      if (wantUrl.nonEmpty) assert(doc.url == wantUrl, s"case $i url")
      else assert(doc.url.startsWith("ManualMarkdown/") && doc.url.endsWith("file.md"), s"case $i url fallback")
      assert(doc.keywords == (if (wantKw.nonEmpty) wantKw else "file"), s"case $i keywords")
      // body: header stripped even when its YAML is invalid; a url: in the
      // BODY stays in the body
      if (md.contains("url:url_body")) assert(doc.md == "Text\nurl:url_body", s"case $i body")
      else assert(doc.md == "Text", s"case $i body")
    }
  }

  test("keywords fallback is the filename's first-dot stem (common.py:148)") {
    val dir = tmpDir("stem")
    Files.writeString(Paths.get(s"$dir/guide.de.md"), "no front matter body")
    val doc = MarkdownSource.read(spark, dir).collect().head
    assert(doc.keywords == "guide")
  }
}
