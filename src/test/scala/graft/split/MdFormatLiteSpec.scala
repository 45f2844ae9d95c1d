package graft.split

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

class MdFormatLiteSpec extends AnyFunSuite {

  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/table_splitter/$name/input.md")
    try Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  // these three inputs are machine-normalized (saved from mdformat output),
  // so normalize must be the identity on them; the other fixtures are
  // hand-edited with deliberate misalignments
  for (name <- Seq("short_table", "standalone_table", "table_and_text")) {
    test(s"identity on already-normalized input: $name") {
      val md = fixture(name)
      assert(MdFormatLite.normalize(md) == md.strip())
    }
  }

  for (name <- Seq("short_table", "standalone_table", "table_and_text", "many_rows_table",
      "many_rows_table_dont_repeat_header", "many_columns_table", "long_table_and_long_text")) {
    test(s"idempotent: $name") {
      val once = MdFormatLite.normalize(fixture(name))
      assert(MdFormatLite.normalize(once) == once)
    }
  }

  test("R6: ragged table re-rendered with aligned, padded columns") {
    val md = "|a|long header|\n|---|---|\n|wide cell here|b|\n| x |  y  |"
    val out = MdFormatLite.normalize(md)
    assert(out ==
      """#| a              | long header |
        #| -------------- | ----------- |
        #| wide cell here | b           |
        #| x              | y           |""".stripMargin('#'))
  }

  test("R6: alignment colons preserved and stretched") {
    val md = "| a | b | c |\n|:---|---:|:-:|\n| 1 | 2 | 3 |"
    val out = MdFormatLite.normalize(md)
    val sep = out.linesIterator.toVector(1)
    // delimiter cells count toward width: ':---' (4) and '---:' (4) keep
    // their length; ':-:' meets the 3 minimum
    assert(sep == "| :--- | ---: | :-: |")
  }

  test("R3: blank line forced around headings and tables") {
    val md = "text\n# Head\nmore\n| a | b |\n| --- | --- |\n| 1 | 2 |\ntail"
    val out = MdFormatLite.normalize(md)
    assert(out ==
      """#text
        #
        ## Head
        #
        #more
        #
        #| a   | b   |
        #| --- | --- |
        #| 1   | 2   |
        #
        #tail""".stripMargin('#'))
  }

  test("R2/R4/R5: blank collapse, heading spacing, bullet markers") {
    val md = "##   Title ##\n\n\n\n* one\n+ two\n- three\n\n\npara   \nnext"
    val out = MdFormatLite.normalize(md)
    assert(out ==
      """## Title
        |
        |- one
        |- two
        |- three
        |
        |para
        |next""".stripMargin)
  }

  test("fenced code blocks pass through verbatim (incl. pipes and #)") {
    val md = "```scala\n# not a heading\n| not | a table |\n```"
    assert(MdFormatLite.normalize(md) == md)
  }

  test("R8: ordered items all take the first item's number (mdformat default, no --number)") {
    assert(MdFormatLite.normalize("3. a\n7. b\n9.  c") == "3. a\n3. b\n3. c")
    // even already-consecutive lists collapse — the striking mdformat default
    assert(MdFormatLite.normalize("1. a\n2. b\n3. c") == "1. a\n1. b\n1. c")
    // marker-type switch = new CommonMark list with its own first number
    assert(MdFormatLite.normalize("2. a\n4. b\n5) c\n7) d") == "2. a\n2. b\n5) c\n5) d")
    // mixed block (not every line an item) passes through untouched
    assert(MdFormatLite.normalize("intro\n3. not renumbered") == "intro\n3. not renumbered")
  }

  test("R9: dangling brackets escape; links, code spans, existing escapes stay intact") {
    // the reference's own truncation shape (splitter_test.py:179): a link
    // whose (url) was cut off leaves a bare [ that mdformat escapes
    assert(MdFormatLite.normalize("Gerne beraten wir. [Beratung Heimnetzwerk")
      == "Gerne beraten wir. \\[Beratung Heimnetzwerk")
    // complete inline + reference links and images are NOT escaped
    val links = "see [docs](https://x.y/a_(b)) and [ref][r1] and ![img](p.png \"t\")"
    assert(MdFormatLite.normalize(links) == links)
    // code spans protect their brackets; text brackets around them escape
    assert(MdFormatLite.normalize("use `arr[0]` for [first") == "use `arr[0]` for \\[first")
    // a link spanning a soft line break inside one paragraph stays whole
    val wrapped = "x [two\nline](u) y"
    assert(MdFormatLite.normalize(wrapped) == wrapped)
    // idempotent: already-escaped brackets are not double-escaped
    val once = MdFormatLite.normalize("stray ] and [ here")
    assert(once == "stray \\] and \\[ here")
    assert(MdFormatLite.normalize(once) == once)
    // headings get the same text-token escape
    assert(MdFormatLite.normalize("# Results [draft") == "# Results \\[draft")
  }

  test("R8b: loose ordered lists renumber as one list across blank lines") {
    // blank-separated items are ONE CommonMark (loose) list — mdformat
    // gives every item the list's first number, same as the tight case
    assert(MdFormatLite.normalize("1. a\n\n2. b") == "1. a\n\n1. b")
    assert(MdFormatLite.normalize("3. a\n\n7. b\n\n9. c") == "3. a\n\n3. b\n\n3. c")
    // a marker-type switch starts a new list with its own first number
    assert(MdFormatLite.normalize("1. a\n\n2) b") == "1. a\n\n2) b")
    // an interrupting paragraph ends the list; the next list keeps its
    // own first number
    assert(MdFormatLite.normalize("1. a\n\ntext\n\n5. b") == "1. a\n\ntext\n\n5. b")
    // mixed tight + loose: the in-block and cross-block runs agree
    assert(MdFormatLite.normalize("2. a\n3. b\n\n4. c") == "2. a\n2. b\n\n2. c")
    // idempotent
    for (s <- Seq("1. a\n\n2. b", "3. a\n\n7. b\n\n9. c", "2. a\n3. b\n\n4. c")) {
      val once = MdFormatLite.normalize(s)
      assert(MdFormatLite.normalize(once) == once, s)
    }
  }

  test("R8c: nested ordered lists renumber per level; indents normalize to parent marker width") {
    // each nesting level is its own CommonMark list: every item takes
    // THAT level's first number, and nested content indents to the
    // parent marker's width ("1. " = 3 columns)
    assert(MdFormatLite.normalize("1. a\n   5. b\n   7. c\n2. d")
      == "1. a\n   5. b\n   5. c\n1. d")
    // a non-canonical nested indent (within the item, below the code
    // threshold) re-indents to the parent marker width
    assert(MdFormatLite.normalize("1. a\n    5. b\n2. c")
      == "1. a\n   5. b\n1. c")
    // dedent closes the nested list; the outer run continues
    assert(MdFormatLite.normalize("3. a\n   1. b\n9. c\n   4. d")
      == "3. a\n   1. b\n3. c\n   4. d")
    // two levels deep: widths accumulate ("1. " + "1. " = 6)
    assert(MdFormatLite.normalize("1. a\n   1. b\n      9. c\n1. d")
      == "1. a\n   1. b\n      9. c\n1. d")
    // an under-indented item (below the parent's content column) is a
    // SIBLING, not a child
    assert(MdFormatLite.normalize("1. a\n  5. b") == "1. a\n1. b")
    // marker-type switch at the nested level starts a new nested list
    assert(MdFormatLite.normalize("1. a\n   2. b\n   3) c\n   4) d")
      == "1. a\n   2. b\n   3) c\n   3) d")
    // loose nesting: level state carries across the blank line
    assert(MdFormatLite.normalize("1. a\n\n   5. b\n\n2. c")
      == "1. a\n\n   5. b\n\n1. c")
    // an over-indent CommonMark reads as indented code: pass through
    assert(MdFormatLite.normalize("1. a\n        2. b") == "1. a\n        2. b")
    // idempotent
    for (s <- Seq("1. a\n   5. b\n   7. c\n2. d", "1. a\n    5. b\n2. c",
        "3. a\n   1. b\n9. c\n   4. d", "1. a\n  5. b", "1. a\n\n   5. b\n\n2. c")) {
      val once = MdFormatLite.normalize(s)
      assert(MdFormatLite.normalize(once) == once, s)
    }
  }

  test("R11: unmatched emphasis markers escape; matched emphasis is preserved") {
    // mdformat's escape_asterisk/underscore_emphasis: escape unless both
    // neighbors are whitespace — but only delimiters that did NOT parse
    // as emphasis are text
    assert(MdFormatLite.normalize("5*6=30") == "5\\*6=30")
    assert(MdFormatLite.normalize("foo_bar_baz") == "foo\\_bar\\_baz")
    assert(MdFormatLite.normalize("a * b") == "a * b") // ws both sides
    // real emphasis/strong renders with its source markers, untouched
    assert(MdFormatLite.normalize("**bold** and *em* and _u_") == "**bold** and *em* and _u_")
    // CommonMark: intraword _ cannot open/close, so _a_b_ is em("a_b") —
    // the inner underscore is text and escapes
    assert(MdFormatLite.normalize("_a_b_") == "_a\\_b_")
    // partially-matched run: the leftover delimiter borders a token
    // boundary (None neighbor) and stays unescaped, like mdformat
    assert(MdFormatLite.normalize("***bold** x") == "***bold** x")
    // idempotence of the whole family
    for (s <- Seq("5*6=30", "foo_bar_baz", "_a_b_", "***bold** x")) {
      val once = MdFormatLite.normalize(s)
      assert(MdFormatLite.normalize(once) == once, s)
    }
  }

  test("R10/R13: backslash doubling, < and unmatched backtick escapes; autolinks/html/code protected") {
    assert(MdFormatLite.normalize("a\\b") == "a\\\\b") // literal backslash doubles
    assert(MdFormatLite.normalize("a\\*b") == "a\\*b") // existing escape preserved
    assert(MdFormatLite.normalize("x < y") == "x \\< y")
    assert(MdFormatLite.normalize("un`matched") == "un\\`matched")
    val prot = "auto <https://x.y/z?a=1> mail <a@b.co> tag <div class=\"x\">t</div> `a<b`"
    assert(MdFormatLite.normalize(prot) == prot)
    assert(MdFormatLite.normalize("<!-- note --> keep") == "<!-- note --> keep")
  }

  test("setext headings convert to ATX; thematic breaks normalize to the 70-underscore line") {
    // mdformat style: headings are ATX, thematic breaks render as a
    // 70-underscore line
    val hr = "_" * 70
    assert(MdFormatLite.normalize("Title\n=====\n\nbody") == "# Title\n\nbody")
    assert(MdFormatLite.normalize("Sub\n---\n\nbody") == "## Sub\n\nbody")
    assert(MdFormatLite.normalize("a\n\n***\n\nb") == s"a\n\n$hr\n\nb")
    assert(MdFormatLite.normalize("a\n\n- - -\n\nb") == s"a\n\n$hr\n\nb")
    assert(MdFormatLite.normalize("a\n\n___\n\nb") == s"a\n\n$hr\n\nb")
    // * and _ breaks may interrupt a paragraph; a '-' run after one line
    // of paragraph is a setext h2, not a break
    assert(MdFormatLite.normalize("a\n***\nb") == s"a\n\n$hr\n\nb")
    assert(MdFormatLite.normalize("a\n---\nb") == "## a\n\nb")
    // a list item is not setext content
    assert(MdFormatLite.normalize("- x\n---") == "- x\n---")
    // two dashes are too short for a break but fine for setext
    assert(MdFormatLite.normalize("t\n--") == "## t")
    // round 13: MULTI-LINE setext content converts — mdformat always
    // renders ATX, so the soft line breaks become spaces; continuation
    // indents (lazy paragraph lines) trim away with them
    assert(MdFormatLite.normalize("a\nb\n=====\n\nbody") == "# a b\n\nbody")
    assert(MdFormatLite.normalize("long title\n  wrapped here\n---") ==
      "## long title wrapped here")
    // a paragraph CONTAINING a list/quote line is not setext content
    assert(MdFormatLite.normalize("t\n- x\n---") == "t\n- x\n---")
    // idempotent
    for (s <- Seq("Title\n=====\n\nbody", "a\n\n***\n\nb", "a\n---\nb", "- x\n---",
        "a\nb\n=====", "long title\n  wrapped here\n---", "t\n- x\n---")) {
      val once = MdFormatLite.normalize(s)
      assert(MdFormatLite.normalize(once) == once, s)
    }
  }

  test("R15: blockquote markers normalize to one '>' + one space per level") {
    assert(MdFormatLite.normalize(">x") == "> x")
    assert(MdFormatLite.normalize(">> x\n>>y") == "> > x\n> > y")
    assert(MdFormatLite.normalize("  > x") == "> x") // indent drops
    assert(MdFormatLite.normalize("> >   > x") == "> > > x")
    // content spacing beyond the marker space is preserved (code indent
    // inside a quote)
    assert(MdFormatLite.normalize(">     code") == ">     code")
    // already-normalized and empty-quote lines are fixpoints
    assert(MdFormatLite.normalize("> a\n>\n> b") == "> a\n>\n> b")
    // a '-' run after a quote closes the quote and is a thematic break,
    // not a setext heading (CommonMark: "> foo" + "---" = quote + break)
    assert(MdFormatLite.normalize("> q\n---") == "> q\n\n" + ("_" * 70))
    for (s <- Seq(">x", ">> x\n>>y", "> >   > x", "> q\n---")) {
      val once = MdFormatLite.normalize(s)
      assert(MdFormatLite.normalize(once) == once, s)
    }
  }

  test("review findings: deep-quote recursion bounded; tab indents expand; decoded-digit markers escape") {
    // a single line of thousands of '>' markers must not blow the stack
    // (the R15b recursion is depth-capped; past the cap quote lines take
    // the byte-stable paragraph path)
    val deep = (">" * 3000) + " x"
    val o = MdFormatLite.normalize(deep)
    assert(o.nonEmpty && MdFormatLite.normalize(o) == o)
    // R8g (round 12): the tab measures as a 4-column stop — the item
    // nests (4 >= content col 3) and the indent renders as spaces
    assert(MdFormatLite.normalize("1. a\n\t5. b") == "1. a\n   5. b")
    // tab-indented code after a block opens a code block (no escapes)
    assert(MdFormatLite.normalize("p\n\n\tcode [x]") == "p\n\n\tcode [x]")
    // entity-decoded digits + a PLAIN '.' would mint an ordered-list
    // marker on re-parse (and get renumbered): the '.' escapes
    assert(MdFormatLite.normalize("&#49;. x\n\n2. y") == "1\\. x\n\n2. y")
  }

  test("R15b: quoted content re-formats recursively; lazy continuations stay byte-stable") {
    // mdformat recurses into block quotes: strip one marker level,
    // format the inner document, re-prefix with canonical markers
    assert(MdFormatLite.normalize("> 3. a\n> 7. b") == "> 3. a\n> 3. b")
    assert(MdFormatLite.normalize(">#  H ##") == "> # H")
    assert(MdFormatLite.normalize("> > 5*6") == "> > 5\\*6")
    assert(MdFormatLite.normalize("> t\n> ---") == "> ## t")
    // a table inside a quote gets the mdformat-tables treatment
    assert(MdFormatLite.normalize("> |a|b|\n> |---|---|\n> |1|2|")
      == "> | a   | b   |\n> | --- | --- |\n> | 1   | 2   |")
    // inner blank lines become bare '>' markers
    assert(MdFormatLite.normalize("> a\n>\n>\n> b") == "> a\n>\n> b")
    // a quote interrupts a paragraph (CommonMark)
    assert(MdFormatLite.normalize("p\n> q") == "p\n\n> q")
    for (s <- Seq("> 3. a\n> 7. b", ">#  H ##", "> > 5*6",
        "> |a|b|\n> |---|---|\n> |1|2|", "p\n> q", "> a\n>\n>\n> b")) {
      val once = MdFormatLite.normalize(s)
      assert(MdFormatLite.normalize(once) == once, s)
    }
  }

  test("R15c: lazy continuation lines join the quoted paragraph and re-format WITH markers") {
    // CommonMark: a plain line after a quote whose paragraph is open is
    // STILL INSIDE the quote — mdformat renders it with the marker
    assert(MdFormatLite.normalize("> a\nb") == "> a\n> b")
    assert(MdFormatLite.normalize(">a\nb") == "> a\n> b") // markers normalize too
    assert(MdFormatLite.normalize("> a\nb\nc") == "> a\n> b\n> c")
    // quote lines may resume after a lazy line — all one container
    assert(MdFormatLite.normalize("> a\nb\n> c") == "> a\n> b\n> c")
    // the lazy line joins the INNERMOST open paragraph (depth 2 here)
    assert(MdFormatLite.normalize("> > deep\nlazy") == "> > deep\n> > lazy")
    // a blank line ends the quote: the next paragraph is outside
    assert(MdFormatLite.normalize("> a\n\nb") == "> a\n\nb")
    // a block-start follower is NOT lazy: the quote closes before it
    assert(MdFormatLite.normalize("> a\n# h") == "> a\n\n# h")
    assert(MdFormatLite.normalize("> a\n- x") == "> a\n\n- x")
    assert(MdFormatLite.normalize("> a\n***") ==
      "> a\n\n" + "_" * 70)
    // a plain follower after a NON-paragraph quote ending is not lazy
    // (nothing open to continue): heading ends the quote
    assert(MdFormatLite.normalize("> # h\nnext") == "> # h\n\nnext")
    // an unclosed fence inside the quote cannot continue lazily either —
    // and r15 CLOSES it in the output (mdformat closes unclosed fences;
    // the quote's inner document gains the closer line)
    assert(MdFormatLite.normalize("> ```\ncode") == "> ```\n> ```\n\ncode")
    // a quote ending in a LIST absorbs a plain follower too: CommonMark
    // laziness reaches through the item container, and the inner R8e
    // pass re-indents the lazy line to the item's content column
    assert(MdFormatLite.normalize("> 3. a\n> 7. b\nlazy")
      == "> 3. a\n> 3. b\n>    lazy")
    assert(MdFormatLite.normalize("> - q\nplain") == "> - q\n>   plain")
    for (s <- Seq("> a\nb", ">a\nb", "> a\nb\n> c", "> > deep\nlazy",
        "> a\n# h", "> # h\nnext", "> ```\ncode", "> 3. a\n> 7. b\nlazy",
        "> a\n    ind", "> a\nb\n\nc")) {
      val once = MdFormatLite.normalize(s)
      assert(MdFormatLite.normalize(once) == once,
        s.replace("\n", "\\n") + " -> " + once.replace("\n", "\\n"))
    }
  }

  test("R8d: ordered items with indented continuation lines renumber; continuations re-indent to the content column") {
    // paragraph continuation at the content column
    assert(MdFormatLite.normalize("2. a\n   cont\n5. b") == "2. a\n   cont\n2. b")
    // over-indented (but < +4) paragraph continuation re-indents to the column
    assert(MdFormatLite.normalize("2. a\n     cont\n5. b") == "2. a\n   cont\n2. b")
    // wide marker: content column moves with the number width
    assert(MdFormatLite.normalize("10. a\n    cont\n12. b") == "10. a\n    cont\n10. b")
    // indented CODE inside an item keeps its relative offset
    assert(MdFormatLite.normalize("2. a\n       code\n5. b") == "2. a\n       code\n2. b")
    // loose: a continuation PARAGRAPH block between items is item content
    assert(MdFormatLite.normalize("2. a\n\n   para\n\n5. b") == "2. a\n\n   para\n\n2. b")
    // a continuation at the parent's column closes the nested level: the
    // next item at the nested indent starts a NEW list (its own number)
    assert(MdFormatLite.normalize("1. a\n   4. b\n   cont\n   9. c")
      == "1. a\n   4. b\n   cont\n   9. c")
    // LAZY (under-indented) continuation (R8e): it continues the item's
    // paragraph, so it re-indents to the content column and the list
    // still renumbers
    assert(MdFormatLite.normalize("2. a\nlazy\n5. b") == "2. a\n   lazy\n2. b")
    // laziness reaches the DEEPEST open item's paragraph
    assert(MdFormatLite.normalize("1. a\n   4. b\n  z")
      == "1. a\n   4. b\n      z")
    // an under-indented DASH run stays byte-stable (a break interrupting
    // the list); a lazy '=' run is ABSORBED as the item paragraph's text
    // (a setext underline cannot be lazy, CommonMark) and renders at the
    // content column in its escaped spelling — the raw bytes there would
    // BE an underline next pass (r15; the r14 bail is lifted)
    assert(MdFormatLite.normalize("2. a\n---") == "2. a\n---")
    assert(MdFormatLite.normalize("2. a\n===") == "2. a\n   \\===")
    // ...and a later real underline joins the absorbed text into the head
    assert(MdFormatLite.normalize("1. aa\nbb\n  ===\n   ---") == "1. ## aa bb ===")
    // tab continuation (R8g): 4-column stop = content col 3 + 1 extra,
    // renders at the content column in spaces
    assert(MdFormatLite.normalize("2. a\n\tcont\n5. b") == "2. a\n   cont\n2. b")
    // R8f: a bullet nested in an ordered item is STRUCTURAL — it opens
    // its own (non-renumbering) level and the ordered list still
    // renumbers around it
    assert(MdFormatLite.normalize("2. a\n   - b\n5. c") == "2. a\n   - b\n2. c")
    // nested ordered under the bullet: content columns accumulate
    // through the bullet's 2-column marker
    assert(MdFormatLite.normalize("1. a\n   - b\n     7. z\n     9. w")
      == "1. a\n   - b\n     7. z\n     7. w")
    // ordered resuming after a bullet interruption is a NEW list (its
    // own first number); wide markers re-indent nested bullets
    assert(MdFormatLite.normalize("3. a\n7. b\n- c\n9. d")
      == "3. a\n3. b\n- c\n9. d")
    assert(MdFormatLite.normalize("10. a\n    - b\n12. c")
      == "10. a\n    - b\n10. c")
    // bullet-HEADED lists reach the renumberer too: nested ordered
    // lists under a bullet renumber, and nested bullet indents
    // normalize to the parent's 2-column marker width
    assert(MdFormatLite.normalize("- a\n  3. x\n  7. y") == "- a\n  3. x\n  3. y")
    assert(MdFormatLite.normalize("- a\n   - b") == "- a\n  - b")
    assert(MdFormatLite.normalize("- a\n- b") == "- a\n- b")
    for (s <- Seq("2. a\n   cont\n5. b", "10. a\n    cont\n12. b",
        "2. a\n       code\n5. b", "2. a\n\n   para\n\n5. b",
        "1. a\n   4. b\n   cont\n   9. c", "2. a\nlazy\n5. b",
        "2. a\n   - b\n5. c", "3. a\n\n    code block\n\n7. b",
        "1. a\n   - b\n     7. z", "3. a\n7. b\n- c\n9. d",
        "10. a\n    - b\n12. c", "1. a\n  - b",
        "- a\n  3. x\n  7. y", "- a\n   - b", "- a\n1. x")) {
      val once = MdFormatLite.normalize(s)
      assert(MdFormatLite.normalize(once) == once,
        s.replace("\n", "\\n") + " -> " + once.replace("\n", "\\n"))
    }
  }

  test("empty ATX headings and spaced-dash breaks (round-12 ADVICE closures)") {
    // "# #": the trailing run is a closing sequence -> empty heading
    assert(MdFormatLite.normalize("# #") == "#")
    assert(MdFormatLite.normalize("## ###") == "##")
    // bare marker runs are empty headings already
    assert(MdFormatLite.normalize("#") == "#")
    assert(MdFormatLite.normalize("##  ") == "##")
    // an empty heading interrupts a paragraph like any ATX heading
    assert(MdFormatLite.normalize("p\n# #") == "p\n\n#")
    // 7+ hashes are not a heading: paragraph text — and since a 7-run
    // cannot re-parse as a heading, the escape pass leaves it bare
    assert(MdFormatLite.normalize("#######") == "#######")
    // a spaced '-' run can never be a setext underline, so it interrupts
    // an open paragraph as a thematic break (CommonMark)
    assert(MdFormatLite.normalize("p\n- - -") == "p\n\n" + "_" * 70)
    // a pure '-' run after a one-line paragraph is still setext h2
    assert(MdFormatLite.normalize("p\n---") == "## p")
    for (s <- Seq("# #", "#", "## ###", "p\n# #", "p\n- - -", "#######")) {
      val once = MdFormatLite.normalize(s)
      assert(MdFormatLite.normalize(once) == once,
        s.replace("\n", "\\n") + " -> " + once.replace("\n", "\\n"))
    }
  }

  test("indented code blocks pass through verbatim (no text-token escapes inside)") {
    // 4-space-indented lines after a blank are CommonMark code — their
    // bytes are not text tokens and must never be escaped
    val doc = "p\n\n    arr[0] * x\n    b_c\n\nq"
    assert(MdFormatLite.normalize(doc) == doc)
    // internal blank lines stay inside the block
    val doc2 = "p\n\n    a[0]\n\n    b[1]\n\nq"
    assert(MdFormatLite.normalize(doc2) == doc2)
    // an indented LIST item keeps its loose-list reading (renumbered),
    // not a code reading — this grouper has no container stack
    assert(MdFormatLite.normalize("1. a\n\n    5. b") == "1. a\n\n   5. b")
    // a code block at the very START of the document is NOT protected:
    // the reference's trailing .strip() removes its indent anyway, so it
    // demotes to a paragraph (and escapes) exactly once
    val lead = MdFormatLite.normalize("    code [1]")
    assert(lead == "code \\[1\\]")
    // a 4-space line while a paragraph is OPEN is a lazy continuation
    assert(MdFormatLite.normalize("p\n    cont [x]") == "p\n    cont \\[x\\]")
    for (s <- Seq(doc, doc2, "    code [1]", "p\n    cont [x]", "1. a\n\n    5. b")) {
      val once = MdFormatLite.normalize(s)
      assert(MdFormatLite.normalize(once) == once, s)
    }
  }

  test("hard line break: backslash before newline is preserved, not doubled") {
    // CommonMark: '\' at end of line is a HARD BREAK — mdformat preserves
    // it (and even normalizes two-space breaks to backslash breaks).
    // Doubling it would silently turn a hard break into a literal
    // backslash + soft break — a content change.
    assert(MdFormatLite.normalize("foo\\\nbar") == "foo\\\nbar")
    // an ESCAPED backslash at end of line is a literal backslash (no break)
    assert(MdFormatLite.normalize("foo\\\\\nbar") == "foo\\\\\nbar")
    // end of block: no following line, so it's a literal backslash
    assert(MdFormatLite.normalize("foo\\") == "foo\\\\")
    for (s <- Seq("foo\\\nbar", "a\\\nb\\\nc"))
      assert(MdFormatLite.normalize(MdFormatLite.normalize(s)) == MdFormatLite.normalize(s), s)
  }

  test("unnecessary escapes drop: the char decodes and re-escapes only where context demands") {
    // mdformat's renderer keeps an escape only when the char could
    // re-parse as syntax in context; all other escapes drop to the char
    assert(MdFormatLite.normalize("a\\,b") == "a,b")
    assert(MdFormatLite.normalize("100\\% sure\\!") == "100% sure!")
    assert(MdFormatLite.normalize("mid\\#line and a\\.b") == "mid#line and a.b")
    // ...but syntax-capable contexts keep theirs
    assert(MdFormatLite.normalize("a\\*b") == "a\\*b") // could be emphasis
    assert(MdFormatLite.normalize("\\[not a link\\]") == "\\[not a link\\]")
    assert(MdFormatLite.normalize("x \\< y") == "x \\< y")
    // line-start block syntax stays escaped (re-parse would change meaning)
    assert(MdFormatLite.normalize("\\# not a heading") == "\\# not a heading")
    assert(MdFormatLite.normalize("\\- not a bullet") == "\\- not a bullet")
    // an escaped dot completing an ordered-list marker stays escaped;
    // the same dot mid-line drops
    assert(MdFormatLite.normalize("1\\. not a list") == "1\\. not a list")
    assert(MdFormatLite.normalize("v1\\.2") == "v1.2")
    // escaped '!' before a link must not re-parse as an image
    assert(MdFormatLite.normalize("\\![t](u)") == "\\![t](u)")
    // idempotent across the drop
    for (s <- Seq("a\\,b", "100\\% sure\\!", "1\\. not a list", "\\![t](u)")) {
      val once = MdFormatLite.normalize(s)
      assert(MdFormatLite.normalize(once) == once, s)
    }
  }

  test("link labels get inner text escapes; destinations and references stay verbatim") {
    // mdformat escapes specials inside link/image LABELS — the label is
    // an inline text context — while the destination is not text
    assert(MdFormatLite.normalize("[a*b](u)") == "[a\\*b](u)")
    assert(MdFormatLite.normalize("![img_v2](p.png)") == "![img\\_v2](p.png)")
    assert(MdFormatLite.normalize("[5<6](u)") == "[5\\<6](u)")
    // destination specials untouched (underscores in URLs are the
    // classic case), reference labels untouched
    assert(MdFormatLite.normalize("[t](https://x.y/a_b_c)") == "[t](https://x.y/a_b_c)")
    assert(MdFormatLite.normalize("[text*x][ref_1]") == "[text\\*x][ref_1]")
    // ws-surrounded asterisk inside a label follows the same R11 rule
    assert(MdFormatLite.normalize("[a * b](u)") == "[a * b](u)")
    // matched emphasis inside a label is preserved
    assert(MdFormatLite.normalize("[see **bold** here](u)") == "[see **bold** here](u)")
    // idempotent
    for (s <- Seq("[a*b](u)", "![img_v2](p.png)", "[text*x][ref_1]", "[see **bold** here](u)")) {
      val once = MdFormatLite.normalize(s)
      assert(MdFormatLite.normalize(once) == once, s)
    }
  }

  test("R8h: fenced code nested in an ordered item renumbers the list; code bytes stay verbatim") {
    // the fence sits at the item's content column, the list renumbers
    // around it (tight — no blank lines appear), and the fence content —
    // including item-shaped lines, blank lines, and escape-hazard bytes —
    // is untouched by both the renumberer and the escape pass
    val md = "2. a\n   ```scala\n   3. not an item\n\n   [raw] *x* `tick\n   ```\n5. b"
    val out = MdFormatLite.normalize(md)
    assert(out ==
      """#2. a
        #   ```scala
        #   3. not an item
        #
        #   [raw] *x* `tick
        #   ```
        #2. b""".stripMargin('#'))
    assert(MdFormatLite.normalize(out) == out)
  }

  test("R8h: fence content re-indents by the content-column delta; offsets beyond the opener keep") {
    // tab opener (4 cols) at a 3-column content item: the fence renders
    // AT the content column and content keeps its relative offset
    val md = "1. a\n\t```\n\tcode\n\t  extra\n\t```\n3. b"
    val out = MdFormatLite.normalize(md)
    assert(out ==
      """#1. a
        #   ```
        #   code
        #     extra
        #   ```
        #1. b""".stripMargin('#'))
    assert(MdFormatLite.normalize(out) == out)
  }

  test("R8h: fence in a NESTED item; a dedented fence closes the inner level") {
    val md = "1. a\n   1. b\n      ```\n      x\n      ```\n   2. c\n2. d"
    val out = MdFormatLite.normalize(md)
    assert(out ==
      """#1. a
        #   1. b
        #      ```
        #      x
        #      ```
        #   1. c
        #1. d""".stripMargin('#'))
    // fence at the OUTER item's column closes the inner level and
    // belongs to the outer item
    val md2 = "1. a\n   1. b\n   ```\n   y\n   ```\n2. c"
    val out2 = MdFormatLite.normalize(md2)
    assert(out2 ==
      """#1. a
        #   1. b
        #   ```
        #   y
        #   ```
        #1. c""".stripMargin('#'))
    assert(MdFormatLite.normalize(out2) == out2)
  }

  test("R8h: unclosed or under-indented fences keep the conservative bail path") {
    // under-indented (interrupts the list per CommonMark): byte-stable
    // pass-through of the run, fence escapes as unmatched backticks only
    // where the old path already did
    val md = "1. a\n  ```\n  x\n  ```\n2. b"
    val out = MdFormatLite.normalize(md)
    assert(MdFormatLite.normalize(out) == out) // fixpoint, whatever the shape
    assert(out.contains("1. a")) // run not renumbered-and-merged wrongly
    // unclosed fence: the opener is plain text, run bails byte-stable
    val md2 = "1. a\n   ```\n   x\n2. b"
    val out2 = MdFormatLite.normalize(md2)
    assert(MdFormatLite.normalize(out2) == out2)
  }

  test("R8h loose: a fence in a continuation block of a loose list renumbers with the list") {
    // blank line between the item and its fence: the fence block rides
    // the run's carried item state; the list stays loose (mdformat keeps
    // the blank), the fence renders at the content column, and the code
    // bytes stay verbatim and escape-exempt
    val md = "2. a\n\n   ```\n   [code] *x*\n   ```\n\n5. b"
    val out = MdFormatLite.normalize(md)
    assert(out ==
      """#2. a
        #
        #   ```
        #   [code] *x*
        #   ```
        #
        #2. b""".stripMargin('#'))
    assert(MdFormatLite.normalize(out) == out)
    // under a 2-column bullet level the rendered block would fall out of
    // the run (contish needs 3 columns): conservative byte-stable
    val md2 = "- a\n\n  ```\n  x\n  ```\n- b"
    val out2 = MdFormatLite.normalize(md2)
    assert(MdFormatLite.normalize(out2) == out2)
    // a loose fence with an internal blank line cannot hold together as
    // one block: conservative, byte-stable across passes
    val md3 = "1. a\n\n   ```\n   x\n\n   y\n   ```\n2. b"
    val out3 = MdFormatLite.normalize(md3)
    assert(MdFormatLite.normalize(out3) == out3)
  }

  test("R8h: headings and */_ breaks nested in item content render at the content column") {
    // a heading at the item's content column is item content (CommonMark)
    // — the list stays together and renumbers, the heading normalizes
    val md = "1. a\n   #  h [x\n2. b"
    val out = MdFormatLite.normalize(md)
    assert(out ==
      """#1. a
        #   # h \[x
        #1. b""".stripMargin('#'))
    assert(MdFormatLite.normalize(out) == out)
    // a spaced '*' break inside an item renders as the 70-underscore
    // line at the content column (never rewritten as a bullet)
    val md2 = "1. a\n   * * *\n2. b"
    val out2 = MdFormatLite.normalize(md2)
    assert(out2 == "1. a\n   " + ("_" * 70) + "\n1. b")
    assert(MdFormatLite.normalize(out2) == out2)
    // a dash run at the content column under the item's open paragraph
    // is its setext underline (r14): the paragraph joins into an ATX h2
    // merged into the head line, and the list still renumbers
    val md3 = "1. a\n   ---\n2. b"
    val out3 = MdFormatLite.normalize(md3)
    assert(out3 == "1. ## a\n1. b")
    assert(MdFormatLite.normalize(out3) == out3)
    // under-indented headings still interrupt the list (own block)
    val md4 = "1. a\n# h\n2. b"
    assert(MdFormatLite.normalize(md4) == "1. a\n\n# h\n\n2. b")
  }

  test("R8h: indented-code blocks ride a loose run; items after them keep renumbering") {
    // the run used to BREAK at the code block, so '5. b' restarted its
    // own list; now the code rides verbatim and the list renumbers
    val md = "2. a\n\n       code [1]\n       more\n\n5. b"
    val out = MdFormatLite.normalize(md)
    assert(out ==
      """#2. a
        #
        #       code [1]
        #       more
        #
        #2. b""".stripMargin('#'))
    assert(MdFormatLite.normalize(out) == out)
    // code bytes that LOOK like fences stay verbatim (item-shaped code
    // lines keep their r11 loose-list reading and split the block —
    // such runs bail byte-stable instead)
    val md2 = "1. a\n\n       ```\n       x *y*\n\n9. b"
    val out2 = MdFormatLite.normalize(md2)
    assert(out2.contains("       ```\n       x *y*"))
    assert(out2.endsWith("1. b"))
    assert(MdFormatLite.normalize(out2) == out2)
  }

  test("R8h: pipe tables nested in item content re-render at the content column") {
    // previously the grouper hoisted the table to column 0 and split the
    // list; now it pads/aligns in place and the list renumbers around it
    val md = "1. a\n   |k|value|\n   |-|-|\n   |x|y|\n2. b"
    val out = MdFormatLite.normalize(md)
    assert(out ==
      """#1. a
        #   | k   | value |
        #   | --- | ----- |
        #   | x   | y     |
        #1. b""".stripMargin('#'))
    assert(MdFormatLite.normalize(out) == out)
    // under a bullet (2-column content): same, at column 2
    val md2 = "- a\n  |p|q|\n  |-|-|\n- b"
    val out2 = MdFormatLite.normalize(md2)
    assert(out2 ==
      """#- a
        #  | p   | q   |
        #  | --- | --- |
        #- b""".stripMargin('#'))
    assert(MdFormatLite.normalize(out2) == out2)
    // an UNDER-indented table still interrupts the list (own block)
    val md3 = "1. a\n|k|v|\n|-|-|\n2. b"
    val out3 = MdFormatLite.normalize(md3)
    assert(out3.contains("\n\n| k   | v   |"))
    assert(MdFormatLite.normalize(out3) == out3)
  }

  test("R8h: item-nested quote CONTENT re-formats recursively when the line count holds") {
    // a quoted LIST inside an item renumbers (mdformat recurses into
    // item-nested quotes); the group re-formats as one inner document
    val md = "1. a\n   > 5. uno\n   > 9. dos\n2. b"
    val out = MdFormatLite.normalize(md)
    assert(out ==
      """#1. a
        #   > 5. uno
        #   > 5. dos
        #1. b""".stripMargin('#'))
    assert(MdFormatLite.normalize(out) == out)
    // a count-CHANGING inner re-format recurses too (late r14 — the
    // per-block renderer lengths made it representable): a paragraph
    // followed by a nested quote gains the separating blank mdformat
    // inserts, rendered as a bare ">" line inside the group
    val md2 = "1. a\n   > q [b]\n   > > deep\n2. c"
    val out2 = MdFormatLite.normalize(md2)
    assert(out2 ==
      """#1. a
        #   > q \[b\]
        #   >
        #   > > deep
        #1. c""".stripMargin('#'))
    assert(MdFormatLite.normalize(out2) == out2)
    // a quoted one-line setext inside an item joins to ATX, SHRINKING
    // the group (2 lines -> 1)
    val md3 = "1. a\n   > t\n   > ==="
    val out3 = MdFormatLite.normalize(md3)
    assert(out3 == "1. a\n   > # t")
    assert(MdFormatLite.normalize(out3) == out3)
    // inner blank runs collapse to one separating blank
    val md4 = "1. a\n   > p\n   >\n   >\n   > q\n2. b"
    val out4 = MdFormatLite.normalize(md4)
    assert(out4 == "1. a\n   > p\n   >\n   > q\n1. b")
    assert(MdFormatLite.normalize(out4) == out4)
  }

  test("R8h: quote lines nested in item content re-indent with normalized markers; list renumbers") {
    val md = "1. a\n   >q [b]\n   > >deep\n2. c"
    val out = MdFormatLite.normalize(md)
    // quote markers normalize at the content column and the group's
    // inner document re-formats whole (late r14: including the blank
    // mdformat inserts between the paragraph and the nested quote);
    // the list renumbers around the quote
    assert(out ==
      """#1. a
        #   > q \[b\]
        #   >
        #   > > deep
        #1. c""".stripMargin('#'))
    assert(MdFormatLite.normalize(out) == out)
    // under a bullet (2-column content), a 2-space quote is item content
    val md2 = "- a\n  > q\n- b"
    val out2 = MdFormatLite.normalize(md2)
    assert(out2 == "- a\n  > q\n- b")
    // an UNDER-indented quote interrupts the list: container path
    val md3 = "- a\n> q\nlazy"
    val out3 = MdFormatLite.normalize(md3)
    assert(out3.startsWith("- a\n\n> q"))
  }

  test("r14: setext underlines in item content join the open paragraph into ATX; dash runs without one break") {
    // underline at the content column under the item head's text: the
    // paragraph joins into an ATX heading merged into the head line
    assert(MdFormatLite.normalize("1. a\n   ---\n2. b") == "1. ## a\n1. b")
    assert(MdFormatLite.normalize("1. title\n   ===\n2. b") == "1. # title\n1. b")
    assert(MdFormatLite.normalize("- title\n  ---") == "- ## title")
    // 4+ dashes are still an underline when a paragraph is open
    // (CommonMark: setext wins over the break reading)
    assert(MdFormatLite.normalize("1. a\n   ----\n2. b") == "1. ## a\n1. b")
    // short runs underline too ('--', '='); multi-line paragraph content
    // joins with spaces (the top-level multi-line setext rule)
    assert(MdFormatLite.normalize("1. a\n   --\n2. b") == "1. ## a\n1. b")
    assert(MdFormatLite.normalize("1. a\n   =\n2. b") == "1. # a\n1. b")
    assert(MdFormatLite.normalize("1. a\n   b\n   ---\n2. c") == "1. ## a b\n1. c")
    // a paragraph OPENED AFTER another block in the item joins at the
    // content column (standalone ATX line, not head-merged)
    assert(MdFormatLite.normalize("1. a\n   # h\n   p\n   ---\n2. b")
      == "1. a\n   # h\n   ## p\n1. b")
    // content following the join starts the item's next paragraph
    assert(MdFormatLite.normalize("1. a\n   ---\n   b\n2. c") == "1. ## a\n   b\n1. c")
    // joined content renders through the heading escape recursion
    assert(MdFormatLite.normalize("1. [x\n   ---\n2. b") == "1. ## \\[x\n1. b")
    assert(MdFormatLite.normalize("1. a *b\n   ---") == "1. ## a \\*b")
    // nested: the underline joins at ITS level; at an outer column it
    // closes the inner level (no paragraph there) and becomes a break
    assert(MdFormatLite.normalize("1. a\n   1. b\n      ---\n2. c")
      == "1. a\n   1. ## b\n1. c")
    assert(MdFormatLite.normalize("1. a\n   1. b\n   ---\n   c")
      == "1. a\n   1. b\n   " + ("_" * 70) + "\n   c")
    // NO open paragraph (a heading closed it): a 3+ dash run is the
    // item's thematic break — the '*'/'_' rule's dash case
    assert(MdFormatLite.normalize("1. a\n   # h\n   ---\n2. b")
      == "1. a\n   # h\n   " + ("_" * 70) + "\n1. b")
    // ...and a '=' run with no paragraph is plain text
    assert(MdFormatLite.normalize("1. a\n   # h\n   ===\n2. b")
      == "1. a\n   # h\n   ===\n1. b")
    // that text then opens a paragraph a later underline can join
    assert(MdFormatLite.normalize("1. a\n   # h\n   ===\n   ---\n2. b")
      == "1. a\n   # h\n   ## ===\n1. b")
    // escaped/entity spellings stay conservative (byte-stable)
    for (s <- Seq("1. a\n   \\-\\-\\-\n2. b", "1. a\n   &#61;==\n2. b")) {
      val once = MdFormatLite.normalize(s)
      assert(MdFormatLite.normalize(once) == once, s)
    }
    // everything above is a fixpoint
    for (s <- Seq("1. a\n   ---\n2. b", "1. title\n   ===", "- t\n  ---",
        "1. a\n   b\n   ---\n2. c", "1. a\n   # h\n   p\n   ---",
        "1. a\n   1. b\n      ---\n2. c", "1. a\n   # h\n   ---\n2. b",
        "1. a\n   ---\n   b\n2. c", "3. a\n7. b\n   ---\n9. c")) {
      val once = MdFormatLite.normalize(s)
      assert(MdFormatLite.normalize(once) == once,
        s.replace("\n", "\\n") + " -> " + once.replace("\n", "\\n"))
    }
  }

  test("r14: LOOSE block syntax in items renders at the content column instead of hoisting and splitting the list") {
    val hr = "_" * 70
    // a blank-separated '*' (or '-') break inside a live loose run is the
    // ITEM's thematic break — previously a column-0 HrOut block that
    // split the run ('2. b' restarted)
    assert(MdFormatLite.normalize("1. a\n\n   ***\n\n2. b")
      == s"1. a\n\n   $hr\n\n1. b")
    assert(MdFormatLite.normalize("1. a\n\n   ---\n\n2. b")
      == s"1. a\n\n   $hr\n\n1. b")
    // loose headings, quote groups, and tables defer the same way
    assert(MdFormatLite.normalize("1. a\n\n   # h\n\n5. b")
      == "1. a\n\n   # h\n\n1. b")
    assert(MdFormatLite.normalize("1. a\n\n   > q\n   > r\n\n5. b")
      == "1. a\n\n   > q\n   > r\n\n1. b")
    assert(MdFormatLite.normalize("1. a\n\n   |k|v|\n   |-|-|\n\n5. b")
      == "1. a\n\n   | k   | v   |\n   | --- | --- |\n\n1. b")
    // a loose indented paragraph + setext underline is the item's
    // heading (was: a hoisted column-0 '## p')
    assert(MdFormatLite.normalize("1. a\n\n   p\n   ---\n\n5. b")
      == "1. a\n\n   ## p\n\n1. b")
    // r15: the bullet-level (2-column) and wide-marker (4+-column)
    // content columns participate too — the r14 conservative bails are
    // lifted (the run threshold generalizes via stableHeadCol)
    assert(MdFormatLite.normalize("10. a\n\n    ***\n\n12. b")
      == s"10. a\n\n    $hr\n\n10. b")
    assert(MdFormatLite.normalize("- a\n\n  ***\n- b")
      == s"- a\n\n  $hr\n- b")
    assert(MdFormatLite.normalize("- a\n\n  > q\n\n- b")
      == "- a\n\n  > q\n\n- b")
    assert(MdFormatLite.normalize("- a\n\n  # h\n\n- b")
      == "- a\n\n  # h\n\n- b")
    assert(MdFormatLite.normalize("- a\n\n  p\n  ===\n- b")
      == "- a\n\n  # p\n- b")
    assert(MdFormatLite.normalize("- a\n\n  |k|v|\n  |-|-|\n\n- b")
      == "- a\n\n  | k   | v   |\n  | --- | --- |\n\n- b")
    // wide-marker loose continuation paragraphs attach and renumber
    // (previously an indented-code claim broke the run)...
    assert(MdFormatLite.normalize("10. a\n\n    p\n\n12. b")
      == "10. a\n\n    p\n\n10. b")
    // ...and one-to-three extra columns re-indent to the content column
    assert(MdFormatLite.normalize("1. a\n\n    p\n\n2. b")
      == "1. a\n\n   p\n\n1. b")
    assert(MdFormatLite.normalize("- a\n\n    p\n\n- b")
      == "- a\n\n  p\n\n- b")
    // the code-vs-continuation boundary is judged ONLY against
    // output-stable item columns: a deep non-canonical item must not
    // flip a following block from code (pass 1) to continuation
    // (pass 2) — the fuzz-found class
    assert(MdFormatLite.normalize("021. a\n   * c\n\n    .")
      == "021. a\n- c\n\n    .")
    // r15 wrap extensions: bullet 2-column and wide 4-column loose
    // continuation paragraphs re-fill; nested levels fill at their own
    // content columns; a block-shaped item rest stays verbatim and the
    // continuation after it fills as its OWN paragraph (never merged
    // into the heading)
    val w12 = MdFormatLite.Wrap.Width(12)
    assert(MdFormatLite.normalize("- aa\n\n  ff gg hh ii jj kk\n\n- bb", w12)
      == "- aa\n\n  ff gg hh\n  ii jj kk\n\n- bb")
    assert(MdFormatLite.normalize("10. aa\n\n    ff gg hh ii jj\n\n12. b", w12)
      == "10. aa\n\n    ff gg hh\n    ii jj\n\n10. b")
    assert(MdFormatLite.normalize(
        "1. aa bb cc dd ee ff\n   - gg hh ii jj kk ll mm nn", w12)
      == "1. aa bb cc\n   dd ee ff\n   - gg hh\n     ii jj\n     kk ll\n     mm nn")
    assert(MdFormatLite.normalize("1. aa bb\n   - cc dd\n   ee ff gg hh", w12)
      == "1. aa bb\n   - cc dd\n   ee ff gg\n   hh")
    assert(MdFormatLite.normalize("1. # h\n   cont more words here", w12)
      == "1. # h\n   cont more\n   words\n   here")
    // r15: an UNCLOSED top-level fence runs to the document end and the
    // output CLOSES it (mdformat's rendering; char and run length match
    // the opener)
    assert(MdFormatLite.normalize("```\nx") == "```\nx\n```")
    assert(MdFormatLite.normalize("````scala\ny") == "````scala\ny\n````")
    assert(MdFormatLite.normalize("~~~\nz") == "~~~\nz\n~~~")
    // bare '-' with no open paragraph is an EMPTY nested bullet; '--' is
    // plain text opening the item's next paragraph (r15)
    assert(MdFormatLite.normalize("1. a\n   ```\n   ```\n   -")
      == "1. a\n   ```\n   ```\n   -")
    assert(MdFormatLite.normalize("1. a\n   ```\n   ```\n   --\n2. b")
      == "1. a\n   ```\n   ```\n   --\n1. b")
    // ...and a later underline joins the '--' paragraph into a heading
    assert(MdFormatLite.normalize("1. a\n   ```\n   ```\n   --\n   ---")
      == "1. a\n   ```\n   ```\n   ## --")
    // an item inside the block re-instates the tight reclaim rule: a
    // quote below the item's content column stays byte-stable
    assert(MdFormatLite.normalize("9. d\n   ```\n   ```\n\n\t0. w\n\t>")
      == "9. d\n   ```\n   ```\n\n\t0. w\n\t>")
    for (m <- Seq("1. a\n\n   ***\n\n2. b", "1. a\n\n   # h\n\n5. b",
        "1. a\n\n   > q\n   > r\n\n5. b", "1. a\n\n   |k|v|\n   |-|-|\n\n5. b",
        "1. a\n\n   p\n   ---\n\n5. b", "1. a\n\n   |\n    >")) {
      val once = MdFormatLite.normalize(m)
      assert(MdFormatLite.normalize(once) == once,
        m.replace("\n", "\\n") + " -> " + once.replace("\n", "\\n"))
    }
  }

  test("r14: --wrap modes re-fill top-level paragraphs; keep is the default and byte-identical") {
    import MdFormatLite.Wrap
    val md = "alpha beta gamma delta\nepsilon zeta\n\n# h\n\ncode eta theta"
    // keep (default): source breaks preserved — the two entry points agree
    assert(MdFormatLite.normalize(md, Wrap.Keep) == MdFormatLite.normalize(md))
    // no: each paragraph joins to one line; headings untouched
    assert(MdFormatLite.normalize(md, Wrap.No) ==
      "alpha beta gamma delta epsilon zeta\n\n# h\n\ncode eta theta")
    // width: greedy fill at the column
    assert(MdFormatLite.normalize(md, Wrap.Width(11)) ==
      "alpha beta\ngamma delta\nepsilon\nzeta\n\n# h\n\ncode eta\ntheta")
    // a break is refused before a word that would mint block syntax at
    // its new line start: the dash rides the previous line (over-width)
    // instead of opening a bullet
    assert(MdFormatLite.normalize("aaaa bbbb - cc", Wrap.Width(10)) ==
      "aaaa bbbb -\ncc")
    // r14 follow-up: simple LIST items re-fill at the content column —
    // the fill width shrinks by the marker width, continuations indent
    // to the content column (mdformat's list-aware fill)
    val listy = "1. a\n   cont\n2. b"
    assert(MdFormatLite.normalize(listy, Wrap.No) == "1. a cont\n1. b")
    assert(MdFormatLite.normalize("1. aaa bbb ccc ddd\n2. x", Wrap.Width(11)) ==
      "1. aaa bbb\n   ccc ddd\n1. x")
    assert(MdFormatLite.normalize("- aa bb cc dd\n- e", Wrap.Width(8)) ==
      "- aa bb\n  cc dd\n- e")
    // nested levels / block shapes in item content keep source breaks
    val nested = "1. a\n   - b\n2. c"
    assert(MdFormatLite.normalize(nested, Wrap.No) == MdFormatLite.normalize(nested))
    // a LOOSE run's 3-column continuation paragraph block re-fills at
    // its column (width reduced by it); 2-column bullet continuations
    // keep source breaks (the run-break hazard)
    assert(MdFormatLite.normalize("1. a\n\n   cc dd\n   ee\n\n2. b", Wrap.No) ==
      "1. a\n\n   cc dd ee\n\n1. b")
    assert(MdFormatLite.normalize("1. a\n\n   cc dd ee ff gg\n\n2. b", Wrap.Width(9)) ==
      "1. a\n\n   cc dd\n   ee ff\n   gg\n\n1. b")
    val bulletLoose = "- a\n\n  p q\n- b"
    assert(MdFormatLite.normalize(bulletLoose, Wrap.No) ==
      MdFormatLite.normalize(bulletLoose))
    // ITEM-NESTED quote content re-fills too (late r14): the recursion
    // threads the mode with the width reduced by the rendered column
    // plus the "> " marker
    assert(MdFormatLite.normalize("1. a\n   > p q\n   > r\n2. b", Wrap.No) ==
      "1. a\n   > p q r\n1. b")
    assert(MdFormatLite.normalize("1. a\n   > aaa bbb ccc ddd eee\n2. b",
      Wrap.Width(14)) == "1. a\n   > aaa bbb\n   > ccc ddd\n   > eee\n1. b")
    // r14 follow-up: QUOTE content re-fills through the inner-document
    // recursion, width reduced by the "> " marker per nesting level;
    // lazy continuation lines join before the fill
    assert(MdFormatLite.normalize("> a\n> b c\n> d", Wrap.No) == "> a b c d")
    assert(MdFormatLite.normalize("> aaa bbb ccc ddd eee", Wrap.Width(10)) ==
      "> aaa bbb\n> ccc ddd\n> eee")
    assert(MdFormatLite.normalize("> a\nb", Wrap.No) == "> a b")
    assert(MdFormatLite.normalize("> > aaa bbb ccc ddd", Wrap.Width(12)) ==
      "> > aaa bbb\n> > ccc ddd")
    // hard line breaks are never joined
    val hard = "foo\\\nbar baz"
    assert(MdFormatLite.normalize(hard, Wrap.No) == MdFormatLite.normalize(hard))
    // fixpoint under the SAME mode, including when escapes change word
    // lengths (fill counts DECODED lengths, so the re-spelled pass
    // breaks at the same words)
    for ((s, m) <- Seq(
        (md, Wrap.No), (md, Wrap.Width(11)), ("aaaa bbbb - cc", Wrap.Width(10)),
        ("[x y [z w [q aa bb cc", Wrap.Width(8)),
        ("a &#62; b &amp; c *d e* f", Wrap.Width(6)),
        ("&#49;. x plain words here", Wrap.Width(8))): Seq[(String, Wrap)]) {
      val once = MdFormatLite.normalize(s, m)
      assert(MdFormatLite.normalize(once, m) == once,
        s"not a fixpoint under $m: ${s.replace("\n", "\\n")} -> ${once.replace("\n", "\\n")}")
    }
  }

  test("R14: character references decode; literal text that would re-parse as a reference escapes its &") {
    assert(MdFormatLite.normalize("&#65;&#x42;") == "AB")
    assert(MdFormatLite.normalize("&lt;tag&gt;") == "\\<tag>") // decoded < then escaped; > is not special
    assert(MdFormatLite.normalize("&copy;") == "©")
    // &amp; decodes to &, leaving text that WOULD re-parse as &copy; -> escape
    assert(MdFormatLite.normalize("&amp;copy;") == "\\&copy;")
    // an unknown name is not a reference: & stays bare
    assert(MdFormatLite.normalize("&notanentity; and A&B") == "&notanentity; and A&B")
    // an entity decoding to a block-syntax char at line start escapes —
    // "# x" would otherwise become a heading on re-parse
    assert(MdFormatLite.normalize("&#35; not a heading") == "\\# not a heading")
    assert(MdFormatLite.normalize("x\n&#45; not a bullet") == "x\n\\- not a bullet")
    // mid-line it needs no escape
    assert(MdFormatLite.normalize("a &#35; b") == "a # b")
    // idempotence across decode+escape
    for (s <- Seq("&amp;copy;", "&lt;tag&gt;", "&copy;", "&#35; not a heading",
        "x\n&#45; not a bullet")) {
      val once = MdFormatLite.normalize(s)
      assert(MdFormatLite.normalize(once) == once, s)
    }
  }
}
