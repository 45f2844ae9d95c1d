package graft.split

import org.scalatest.funsuite.AnyFunSuite

class MarkdownTextSpec extends AnyFunSuite {

  test("identity on plain text (the corpus contract behind q51)") {
    val s = "plain words with no markdown at all just text"
    assert(MarkdownText.toPlain(s) == s)
  }

  test("headings lose markers, keep titles; blocks joined by newline") {
    val md = "# Title\n\nSome paragraph text.\n\n## Sub ##\n\nMore."
    assert(MarkdownText.toPlain(md) == "Title\nSome paragraph text.\nSub\nMore.")
  }

  test("code fences kept verbatim including markdown-like characters") {
    val md = "before\n\n```scala\nval x = 1 // #not a heading\n|pipe| *star*\n```\n\nafter"
    assert(MarkdownText.toPlain(md) ==
      "before\nval x = 1 // #not a heading\n|pipe| *star*\nafter")
  }

  test("link text preserved, target dropped; images dropped entirely") {
    val md = "See [the docs](https://example.com/a) and ![diagram](img.png) here."
    assert(MarkdownText.toPlain(md) == "See the docs and  here.")
  }

  test("bare and autolinked URLs masked with LINK") {
    val md = "Visit <https://x.io/a> or http://y.z/b?q=1 now"
    assert(MarkdownText.toPlain(md) == "Visit LINK or LINK now")
  }

  test("emphasis, strong, strikethrough, inline code unwrapped") {
    val md = "a **bold** and *em* and __also__ and ~~gone~~ and `code x` end"
    assert(MarkdownText.toPlain(md) == "a bold and em and also and gone and code x end")
  }

  test("list and quote markers dropped, content kept in order") {
    val md = "- first item\n- second **item**\n1. third\n> quoted line"
    assert(MarkdownText.toPlain(md) == "first item\nsecond item\nthird\nquoted line")
  }

  test("pipe table lines pass through as text (no table extension)") {
    val md = "| a | b |\n| --- | --- |\n| 1 | 2 |"
    assert(MarkdownText.toPlain(md) == "| a | b |\n| --- | --- |\n| 1 | 2 |")
  }

  test("underscores inside words survive (snake_case is not emphasis)") {
    assert(MarkdownText.toPlain("use snake_case_name here") == "use snake_case_name here")
  }
}
