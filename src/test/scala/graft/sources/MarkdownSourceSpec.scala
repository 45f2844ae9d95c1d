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
}
