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

  // ---- nested-structure descent (reference _split_children +
  // _markdown_hierarchy_parser, semantic_splitter.py:277-445) ------------

  test("descendList: 3-deep nested list splits at the shallowest indent, items intact") {
    val md = Seq(
      "- t1 t2 t3",                                      // 4 tok
      "  - u1 u2 u3",                                    // 4
      "    - " + (1 to 9).map(i => s"v1$i").mkString(" "), // 10
      "    - " + (1 to 9).map(i => s"v2$i").mkString(" "),
      "    - " + (1 to 9).map(i => s"v3$i").mkString(" "),
      "    - " + (1 to 9).map(i => s"v4$i").mkString(" "),
      "  - u4 u5 u6",                                    // 4
      "- " + (1 to 9).map(i => s"s$i").mkString(" ")     // 10
    ).mkString("\n")                                     // total 62 > 24
    val chunks = sp.splitMarkdown(md)
    assert(chunks.length == 3)
    assert(chunks.forall(c => sp.tk.count(c) <= sp.tokenLimit + sp.buffer))
    // every original line survives exactly once, intact with its indent —
    // the reference splits at ListItem boundaries, never mid-item
    val lines = chunks.flatMap(_.linesIterator).filter(_.trim.nonEmpty)
    assert(lines == md.linesIterator.toVector)
  }

  test("descendList progress guard: a lone top-level marker descends to the next indent") {
    // first line is the ONLY indent-0 marker — splitting there would regroup
    // the same text forever; the guard requires >= 2 pieces and falls
    // through to the indent-2 markers
    val md = ("- top intro" +: (1 to 6).map(i =>
      s"  - sub$i " + (1 to 7).map(j => s"w$i$j").mkString(" "))).mkString("\n") // 3 + 6*9 = 57
    val chunks = sp.splitMarkdown(md)
    assert(chunks.length > 1)
    assert(chunks.forall(c => sp.tk.count(c) <= sp.tokenLimit + sp.buffer))
    val lines = chunks.flatMap(_.linesIterator).filter(_.trim.nonEmpty)
    assert(lines == md.linesIterator.toVector)
  }

  test("descendList depth exhaustion: 35-deep nesting terminates bounded (reference max_depth=30)") {
    // every suffix subtree stays oversized so recursion must burn depth;
    // past the guard the remainder hard-cuts instead of looping
    val deep = (0 until 34).map(j => "  " * j + "- x" + j) :+
      ("  " * 34 + "- " + (1 to 30).map(i => s"p$i").mkString(" "))
    val md = deep.mkString("\n")
    val noMin = new SemanticSplitter(tokenLimit = 20, buffer = 4, tokenMin = 1)
    val chunks = noMin.splitMarkdown(md)
    assert(chunks.nonEmpty)
    assert(chunks.forall(c => noMin.tk.count(c) <= 24))
    // hard cuts drop indentation but never tokens
    assert(chunks.map(noMin.tk.count(_)).sum == noMin.tk.count(md))
  }

  test("descendList handles ordered-list markers (digit. / digit)) at nested indents") {
    val md = ((1 to 3).map(i =>
      s"$i. " + (1 to 6).map(j => s"o$i$j").mkString(" ")) ++
      (1 to 3).map(i => s"  $i) " + (1 to 6).map(j => s"p$i$j").mkString(" "))).mkString("\n")
    val chunks = sp.splitMarkdown(md) // 6 items x 7 tok = 42 > 24
    assert(chunks.length > 1)
    val lines = chunks.flatMap(_.linesIterator).filter(_.trim.nonEmpty)
    assert(lines == md.linesIterator.toVector) // never mid-item, indices intact
  }

  test("descendQuote strips one marker level and re-enters block assembly") {
    val p1 = "> " + (1 to 14).map(i => s"a$i").mkString(" ")
    val p2 = "> " + (1 to 14).map(i => s"b$i").mkString(" ")
    val chunks = sp.splitMarkdown(s"$p1\n>\n$p2") // 30 tok raw, 28 stripped
    assert(chunks.length == 2)
    assert(chunks.forall(c => !c.contains(">")))
    assert(chunks(0).startsWith("a1 ") && chunks(1).startsWith("b1 "))
  }

  test("descendQuote nested quote: each descent strips exactly one level") {
    val inner = (1 to 3).map(i => "> > " + (1 to 9).map(j => s"n$i$j").mkString(" "))
    val chunks = sp.splitMarkdown(inner.mkString("\n")) // 33 tok; inner 3 paragraphs? no — one quote
    assert(chunks.nonEmpty)
    assert(chunks.forall(c => !c.contains(">")))
    assert(chunks.forall(c => sp.tk.count(c) <= sp.tokenLimit + sp.buffer))
  }

  test("quote wrapping a single oversized list descends item boundaries (round-4 fix)") {
    // pre-fix this routed to splitLeaf and hard-cut mid-item
    val items = (1 to 8).map(i => s"- item$i " + (1 to 4).map(j => s"q$i$j").mkString(" "))
    val md = items.map("> " + _).mkString("\n") // 8 * 7 = 56 raw, 48 stripped
    val chunks = sp.splitMarkdown(md)
    assert(chunks.length > 1)
    val lines = chunks.flatMap(_.linesIterator).filter(_.trim.nonEmpty)
    assert(lines == items.toVector) // every item intact, unquoted, in order
  }

  test("quote wrapping a single oversized table splits rows with header repeat (round-4 fix)") {
    val rows = (1 to 10).map(i => s"| r$i | v$i |")
    val md = (Seq("| a | b |", "| --- | --- |") ++ rows).map("> " + _).mkString("\n")
    val chunks = sp.splitMarkdown(md)
    assert(chunks.count(_.contains("| a | b |")) >= 2)
    val got = chunks.flatMap(_.linesIterator).map(_.trim).filter(_.startsWith("| r"))
    assert(got.toSet == rows.toSet) // no mid-row cut
  }

  test("q66 construction lands 235/183/243/123 with the default config (oracle mirror)") {
    val md = graft.queries.TextQ.nestedDoc(7, (1 to 750).map(i => s"w$i").mkString(" "))
    val dflt = new SemanticSplitter()
    val chunks = dflt.splitMarkdown(md)
    assert(chunks.map(dflt.tk.count(_)) == Vector(235, 183, 243, 123))
    assert(chunks(0).startsWith("# Doc 7\n\n- w1 ") && chunks(0).contains("\n\n    - "))
    assert(chunks.tail.forall(_.startsWith("# Doc 7\n\n"))) // header carry
    assert(chunks(2).contains("\n\n- w399 ") && !chunks(2).contains(">"))
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
