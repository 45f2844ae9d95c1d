package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {

  test("html->md: headings, links (absolutized), emphasis, lists, strip script/style/img/hr (F8-F10)") {
    val html =
      """<head><title>x</title></head><body>
        |<script>var a = 1;</script><style>.c{}</style>
        |<h1>Title</h1><p>Hello <b>world</b> and <i>friends</i>.</p>
        |<img src="pic.png" alt="a picture"><hr>
        |<ul><li>one</li><li>two</li></ul>
        |<p>See <a href="/docs/page">the docs</a> and <a href="https://x.io/a">abs</a>.</p>
        |</body>""".stripMargin
    val md = HtmlToMd.convert(html, "https://kb.example.com/root/")
    assert(md.contains("# Title"))
    assert(md.contains("Hello **world** and *friends*."))
    assert(md.contains("a picture") && !md.contains("<img") && !md.contains("pic.png"))
    assert(!md.contains("var a") && !md.contains(".c{}"))
    assert(md.contains("- one") && md.contains("- two"))
    assert(md.contains("[the docs](https://kb.example.com/docs/page)"))
    assert(md.contains("[abs](https://x.io/a)"))
    assert(!md.contains("<"))
  }

  test("href absolutization rules (F9)") {
    assert(HtmlToMd.absolutize("https://a.b/c", "https://x.y") == "https://a.b/c")
    assert(HtmlToMd.absolutize("//cdn.a.b/x", "https://x.y") == "https://cdn.a.b/x")
    assert(HtmlToMd.absolutize("sub/page", "https://x.y/base") == "https://x.y/base/sub/page")
    assert(HtmlToMd.absolutize("mailto:a@b.c", "https://x.y") == "mailto:a@b.c")
  }

  test("winnowing: any shared >= n+w-1 word run yields a shared fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val a = graft.functions.Kernels.winnow(s"one two $shared three four five six seven", 3, 4).toSet
    val b = graft.functions.Kernels.winnow(s"$shared completely different tail words here", 3, 4).toSet
    assert(a.intersect(b).nonEmpty)
    val c = graft.functions.Kernels.winnow("unrelated words entirely distinct from both documents", 3, 4).toSet
    assert(a.intersect(c).isEmpty)
    // deterministic + sorted
    val again = graft.functions.Kernels.winnow(s"one two $shared three four five six seven", 3, 4)
    assert(again.toSeq == again.sorted.toSeq && again.toSet == a)
  }

  test("sentence split with abbreviation merge-back (F7, sentence_splitter.py:115-226)") {
    assert(Sentences.split("One sentence. Two sentence! Three?").toSeq ==
      Seq("One sentence.", "Two sentence!", "Three?"))
    assert(Sentences.split("Das kostet z.B. zehn Euro. Danach mehr.").toSeq ==
      Seq("Das kostet z.B. zehn Euro.", "Danach mehr."))
    assert(Sentences.split("Dr. Meier kommt. Er ist spät.").toSeq ==
      Seq("Dr. Meier kommt.", "Er ist spät."))
    assert(Sentences.split("J. Smith wrote this. True story.").toSeq ==
      Seq("J. Smith wrote this.", "True story."))
    assert(Sentences.split("Er belegte den 3. Platz. Super.").toSeq ==
      Seq("Er belegte den 3. Platz.", "Super."))
    assert(Sentences.split("").toSeq == Seq.empty)
  }
}
