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
    // entity decode order: &amp; decodes LAST, so double-escaped entities
    // yield their literal text instead of being decoded twice
    assert(HtmlToMd.convert("<p>a &amp;lt; b</p>") == "a &lt; b")
    assert(HtmlToMd.convert("<p>x &lt; y &amp; z</p>") == "x < y & z")
    // untouched specials (reference normalize_urls cases, html2md_test.py)
    assert(HtmlToMd.absolutize("data:image/png;base64,abc123", "https://x.y") == "data:image/png;base64,abc123")
    assert(HtmlToMd.absolutize("#fragment", "https://x.y") == "#fragment")
    assert(HtmlToMd.absolutize("", "https://x.y") == "")
  }

  test("clean_tree parity: js-footer div removed with content (html2md_test.py)") {
    val html = """<div><div id="js-footer">Should be removed</div><div>Should stay</div></div>"""
    val md = HtmlToMd.convert(html)
    assert(!md.contains("Should be removed") && md.contains("Should stay"))
    // nested divs inside the footer: removal is depth-counted to the
    // MATCHING close, not the first </div>
    val nested = """<p>Keep</p><div id="js-footer"><div class="row">links</div>
      |Copyright Acme. <a href="/imprint">Imprint</a></div><p>Tail</p>""".stripMargin
    val md2 = HtmlToMd.convert(nested)
    assert(!md2.contains("Copyright") && !md2.contains("links") && !md2.contains("Imprint"))
    assert(md2.contains("Keep") && md2.contains("Tail"))
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

  test("abbreviation merge-back scans the last token across \\r (CRLF text)") {
    // the old scan only looked for ' '/'\n'/'\t', so "a\rb." yielded
    // lastTok "a\rb." and flipped the merge decision on CR-containing text
    // the CRLF separator is consumed by the terminator split and the
    // merge-back rejoins with a single space
    assert(Sentences.split("See fig.\r\nIt explains. More here.").toSeq ==
      Seq("See fig. It explains.", "More here."))
    // "a\rb." now scans lastTok "b." — a single initial, so it merges
    assert(Sentences.split("Left a\rb. Next one.").toSeq ==
      Seq("Left a\rb. Next one."))
  }

  // Reference case table (tests/splitter/sentence_splitter_test_cases.py,
  // REGEX_TEST_CASES — the set the reference runs against its
  // RegexSentenceSplitter; cases the reference marks "TODO fails with
  // current default splitter" are excluded there and here).
  private val regexCases: Seq[(String, Seq[String])] = Seq(
    "Dr. Smith went to Washington. He arrived at 3.14 p.m. Amazing!" ->
      Seq("Dr. Smith went to Washington.", "He arrived at 3.14 p.m.", "Amazing!"),
    "A. B. Carter agreed. No. 5 was the winning ticket." ->
      Seq("A. B. Carter agreed.", "No. 5 was the winning ticket."),
    "She left in Sept. 2020. Then, in Oct., she returned." ->
      Seq("She left in Sept. 2020.", "Then, in Oct., she returned."),
    "Hello..!   World." -> Seq("Hello..!", "World."))

  // Active cases from the wider tables (BASIC/PL — nominally model-splitter
  // targets) that the regex heuristics also handle; kept as regression
  // pins on the lookahead (URLs, decimals-in-paths, ellipses, quotes,
  // emoji) and the merge-back non-interference.
  private val compatibleCases: Seq[(String, Seq[String])] = Seq(
    "Hello world." -> Seq("Hello world."),
    "This is a test. It has two sentences." ->
      Seq("This is a test.", "It has two sentences."),
    "The U.S. economy grew. The E.U. responded with new rules. NASA launched at 4 a.m." ->
      Seq("The U.S. economy grew.", "The E.U. responded with new rules.",
        "NASA launched at 4 a.m."),
    "Visit https://example.com/docs/v1.2?lang=en or email support@example.co.uk. Don't split inside URLs or emails." ->
      Seq("Visit https://example.com/docs/v1.2?lang=en or email support@example.co.uk.",
        "Don't split inside URLs or emails."),
    "Wait... are you serious? Yes... totally serious." ->
      Seq("Wait... are you serious?", "Yes... totally serious."),
    "\"This is quoted,\" she said. \"Is it clear?\" he asked." ->
      Seq("\"This is quoted,\" she said.", "\"Is it clear?\" he asked."),
    "She left (did she?). I think so (probably!)." ->
      Seq("She left (did she?).", "I think so (probably!)."),
    "Emojis are fine \ud83d\ude42. So are emoticons ;-). Mixed? Sure!" ->
      Seq("Emojis are fine \ud83d\ude42.", "So are emoticons ;-).", "Mixed?", "Sure!"),
    "The file is at C:\\\\Program Files\\\\MyApp v1.2.3\\\\readme.txt. Do not split inside paths." ->
      Seq("The file is at C:\\\\Program Files\\\\MyApp v1.2.3\\\\readme.txt.",
        "Do not split inside paths."),
    "(Nested punctuation?!). Works, right? Yes." ->
      Seq("(Nested punctuation?!).", "Works, right?", "Yes."),
    "She said 'Go now!' and left. 'Really?' he asked." ->
      Seq("She said 'Go now!' and left.", "'Really?' he asked."),
    "Czekaj... m\u00f3wisz powa\u017cnie? Tak... ca\u0142kiem powa\u017cnie." ->
      Seq("Czekaj... m\u00f3wisz powa\u017cnie?", "Tak... ca\u0142kiem powa\u017cnie."))

  test("referenceSplit passes the reference REGEX_TEST_CASES table") {
    regexCases.foreach { case (in, want) =>
      assert(Sentences.referenceSplit(in).toSeq == want, s"\ninput: $in")
    }
  }

  test("referenceSplit handles the compatible BASIC/PL cases") {
    compatibleCases.foreach { case (in, want) =>
      assert(Sentences.referenceSplit(in).toSeq == want, s"\ninput: $in")
    }
  }

  test("referenceSplit: newline runs normalize to one space; empty input") {
    assert(Sentences.referenceSplit("One line.\nNext Line starts. Done.").toSeq ==
      Seq("One line.", "Next Line starts.", "Done."))
    assert(Sentences.referenceSplit("").toSeq == Seq.empty)
    assert(Sentences.referenceSplit("   \n  ").toSeq == Seq.empty)
  }
}
