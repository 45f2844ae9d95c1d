package graft.split

import org.scalatest.funsuite.AnyFunSuite
import graft.contracts.MarkdownDoc

class SemanticSplitterSpec extends AnyFunSuite {

  private val sp = new SemanticSplitter(tokenLimit = 20, buffer = 4, tokenMin = 2)

  test("short document is returned unchanged (reference splitter_test.py:29-56)") {
    val md = "# Title\n\nshort body here"
    assert(sp.splitMarkdown(md) == Vector(md))
  }

  test("empty document yields no chunks") {
    assert(sp.splitMarkdown("") == Vector.empty)
    assert(sp.splitMarkdown("   \n  ") == Vector.empty)
  }

  test("splits at the strongest heading boundaries") {
    val body = (1 to 15).map(i => s"word$i").mkString(" ")
    val md = s"# A\n\n$body\n\n# B\n\n$body\n\n# C\n\n$body"
    val chunks = sp.splitMarkdown(md)
    assert(chunks.length >= 2)
    assert(chunks.forall(c => sp.tk.count(c) <= sp.tokenLimit + sp.buffer))
  }

  test("running headers are carried into deeper chunks as '# H1 - H2' prefix") {
    val body = (1 to 18).map(i => s"w$i").mkString(" ")
    val md = s"# Top\n\n## Sub\n\n$body\n\n## Sub2\n\n$body\n\n$body"
    val chunks = sp.splitMarkdown(md)
    // some later chunk must carry the Top prefix
    assert(chunks.exists(c => c.startsWith("# Top")))
  }

  test("standalone-heading chunks are dropped (reference 735-737)") {
    val body = (1 to 30).map(i => s"w$i").mkString(" ")
    val chunks = sp.splitMarkdown(s"# OnlyHeading\n\n# Another\n\n$body")
    assert(chunks.forall(c => c.linesIterator.exists(l => !l.trim.startsWith("#") && l.trim.nonEmpty)))
  }

  test("hard cut: an unbreakable paragraph is cut by token windows") {
    val words = (1 to 100).map(i => s"tok$i").mkString(" ")
    val chunks = sp.splitMarkdown(words)
    assert(chunks.length >= 4)
    assert(chunks.forall(c => sp.tk.count(c) <= sp.tokenLimit + sp.buffer))
  }

  test("chunk metadata: dense chunk_index, chunks_count, token/char lens, source hash") {
    val words = (1 to 100).map(i => s"tok$i").mkString(" ")
    val doc = MarkdownDoc(words, "kw", "http://u")
    val chunks = sp.splitDoc(doc)
    val n = chunks.length
    assert(chunks.map(_.metadata("chunk_index").toInt) == (0 until n))
    assert(chunks.forall(_.metadata("chunks_count").toInt == n))
    assert(chunks.forall(c => c.metadata("token_len").toInt == sp.tk.count(c.md)))
    assert(chunks.forall(c => c.metadata("char_len").toInt == c.md.length))
    assert(chunks.map(_.metadata("source_sha256_hash")).distinct.size == 1)
    assert(chunks.head.keywords == "kw" && chunks.head.url == "http://u")
  }

  test("property: every chunk of a heading-free doc respects limit+buffer (reference assertion 492-493)") {
    val rnd = new scala.util.Random(42)
    (1 to 100).foreach { _ =>
      val n = 1 + rnd.nextInt(200)
      val words = Vector.fill(n)("w" + rnd.nextInt(50))
      val md = words.grouped(1 + rnd.nextInt(9)).map(_.mkString(" ")).mkString("\n\n")
      val chunks = sp.splitMarkdown(md)
      assert(chunks.forall(c => sp.tk.count(c) <= sp.tokenLimit + sp.buffer))
      if (sp.tk.count(md.trim) >= 2) assert(chunks.nonEmpty)
    }
  }

  test("table inside a long doc is split by rows, never mid-row, header repeated") {
    val rows = (1 to 40).map(i => s"| r$i | v$i |").mkString("\n")
    val md = s"# T\n\n| a | b |\n| --- | --- |\n$rows"
    val chunks = sp.splitMarkdown(md)
    val tableChunks = chunks.filter(_.contains("| a | b |"))
    assert(tableChunks.length >= 2)
    tableChunks.foreach { c =>
      c.linesIterator.filter(_.contains("| r")).foreach(l => assert(l.trim.endsWith("|")))
    }
  }

  test("oversized list splits at item boundaries, never mid-item") {
    val items = (1 to 12).map(i => s"- item $i " + Seq.fill(4)(s"w$i").mkString(" "))
    val md = "intro line first\n\n" + items.mkString("\n")
    val chunks = sp.splitMarkdown(md) // limit 20, buffer 4
    assert(chunks.length > 1)
    // every item line survives exactly once, intact
    val lines = chunks.flatMap(_.linesIterator).filter(_.startsWith("- item"))
    assert(lines.length == 12)
    items.foreach(i => assert(lines.contains(i)))
  }

  test("sentenceLeaves: oversized paragraph packs sentence-by-sentence into the window") {
    val sents = (1 to 10).map(i => s"sentence $i has five words end.")
    val md = sents.mkString(" ") // 60 tokens, one paragraph
    val withSent = new SemanticSplitter(tokenLimit = 20, buffer = 4, tokenMin = 2,
      sentenceLeaves = true)
    val chunks = withSent.splitMarkdown(md)
    assert(chunks.length > 1)
    // no sentence is ever cut: each chunk is whole sentences joined by \n
    chunks.foreach { c =>
      c.linesIterator.foreach { l =>
        assert(l.matches("sentence \\d+ has five words end\\."), s"cut sentence: $l")
      }
    }
    assert(chunks.flatMap(_.linesIterator).toVector == sents.toVector)
    // default splitter hard-cuts the same input mid-sentence instead
    val hard = sp.splitMarkdown(md)
    assert(hard.exists(_.linesIterator.exists(l => !l.endsWith("end."))))
  }

  test("sentenceLeaves: a single giant sentence still hard-cuts (last resort)") {
    val md = Seq.fill(50)("word").mkString(" ") + "."
    val withSent = new SemanticSplitter(tokenLimit = 20, buffer = 4, tokenMin = 2,
      sentenceLeaves = true)
    val chunks = withSent.splitMarkdown(md)
    assert(chunks.length >= 2)
    assert(chunks.flatMap(_.split("\\s+")).length == 50)
  }
}
