package graft.split

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic fuzz over the exact atom mix that found the round-11
  * idempotence escapes bugs (escape dropping next to matched delimiter
  * runs, Verbatim-edge flanking, indented markers, heading-run
  * extension): normalize must be a fixpoint after one application. The
  * scalacheck PropertySpec generators cover char-level mixes; this one
  * adds STRUCTURED atoms (list markers, escaped markers, links, entity
  * markers, hard breaks) that exercise the block grouper and the
  * text-escape pass together. */
class MdEscapeFuzzSpec extends AnyFunSuite {

  private[split] val atoms = Seq("&amp;", "&copy;", "&#65;", "&nope;", "**", "](u)",
    "<https://x.y>", "<div>", "`c`", "\\*", "\\\\",
    "1. ", "2) ", "   5. ", "\\- ", "1\\. ", "&#42; ", "&#45; ",
    "[a*b](u)", "![i](p)", "\\!", "\\.", "\\,", "foo\\\n", "- x\n", "# h\n",
    "***\n", "---\n", "___\n", "=====\n", "t\n---\n", "- - -\n", "* --\n",
    "\\=", "\\_", "=", "    code [1]\n", "    a*b\n", "    ",
    "> x\n", ">>y\n", "> - q\n", ">\n", "\\>", "&#62;",
    "> 3. a\n", "> # h\n", "> |a|b|\n", "> ---\n", ">     c\n", "> a\nb\n",
    // round-12 shapes: lazy quote continuations, quote resumes after a
    // lazy line, list continuation lines (paragraph/code/lazy/tab),
    // empty headings, spaced-dash breaks
    "> a\nb\n> c\n", ">> d\ne\n", "> p\n\nq\n", "> ```\nz\n", "> a\n    i\n",
    "1. a\n   b\n", "10. a\n    b\n", "1. a\n       c\n", "1. a\n  z\n",
    "1. a\n\n   p\n\n2. b\n", "2. a\n\tq\n", "1. a\n   - m\n",
    "# #\n", "#\n", "## ###\n", "p\n- - -\n", "- -\t-\n", "#######\n",
    // block syntax shaped item content (r12 fuzz find: re-indenting
    // "    >" to the content column minted a quote marker)
    "2. b\n    >\n", "1. a\n    # h\n", "1. a\n   ---\n", "1. a\n    ```\n",
    // r12 mixed-marker structural bullets (R8f)
    "1. a\n   - b\n", "1. a\n   - b\n     7. z\n", "3. a\n- c\n9. d\n",
    "10. a\n    - b\n", "1. a\n  - b\n", "1. a\n   * c\n",
    "- a\n  3. x\n", "- a\n   - b\n", "- a\n1. x\n", "* a\n  cont\n",
    // r12 deep-fuzz atom additions (folded in from the throwaway
    // FuzzDeep/FuzzDeep2 drivers): deep nesting with continuations,
    // wide markers, tab-indented bullets, and table-separator shapes
    // whose escaped spellings must never drop into table syntax
    "- b\n    7. z\n      c\n", "9. d\n     1. a\n       c\n",
    "- c\n\t* --\n", "- b\n   7. z\n  3. x\n", "100. w\n", "  21. a\n",
    "\\|", "|-|\n", "|:-|\n", "a|b\n-|-\n", "\\:",
    // round-13 R8h shapes: fences and quotes nested in item content —
    // closed/unclosed/under-indented fences, item-shaped and blank and
    // escape-hazard fence bytes, tab openers, quote markers at and
    // below the content column
    "1. a\n   ```\n   x\n   ```\n", "2. a\n   ```\n   3. z\n\n   [r]\n   ```\n5. b\n",
    "1. a\n\t```\n\tc\n\t```\n", "1. a\n   ```\n   x\n", "1. a\n  ```\n  x\n  ```\n",
    "1. a\n   1. b\n      ```\n      x\n      ```\n   2. c\n",
    "1. a\n   ~~~\n   - y\n   ~~~~\n", "- a\n  ```\n  `t\n  ```\n- b\n",
    "1. a\n   >q\n", "1. a\n   > >d\n2. c\n", "- a\n  > q\n- b\n",
    "1. a\n   \\> t\n", "1. a\n      > deep\n", "- a\n > u\n",
    "\\~~~\n", "\\~", "  1. a\n", "*\t|\n", "* |\n", "|!\n*\t|\n",
    // r13 loose fences: blank line between the item and the fence (run
    // carry), bullet-level looseness (contish-unstable, bails), and an
    // internal blank (region cannot hold together, bails)
    "2. a\n\n   ```\n   [c]\n   ```\n\n5. b\n", "- a\n\n  ```\n  x\n  ```\n",
    "1. a\n\n   p\n\n   ```\n   x\n   ```\n", "1. a\n\n   ```\n   x\n\n   y\n   ```\n",
    // r13 quote-in-item recursion: quoted lists/headings/fences/setext,
    // escaped and entity spellings, column changes mid-group, the
    // count-gate fallbacks
    "1. a\n   > 3. q\n   > 9. r\n", "1. a\n   > # h\n", "1. a\n   > ```\n   > z\n   > ```\n",
    "1. a\n   > t\n   > ===\n", "1. a\n   > [x\n", "1. a\n   > \\* e\n",
    "1. a\n   > p\n   >\n   > q\n", "1. a\n   > x\n      > y\n",
    "1. a\n   > x\n   cont\n   > y\n", "1. a\n   1. b\n      > in\n   > out\n2. c\n",
    "->bab)&#62;\n", "&#62;    ```\n", "\t>a*&1. a\n",
    // r13 headings / */_ breaks in item content (dash runs conservative)
    "1. a\n   # h\n2. b\n", "1. a\n   # h [x\n", "1. a\n   #\n", "1. a\n   ## #\n",
    "1. a\n   ***\n", "1. a\n   * * *\n", "- a\n  # h\n- b\n", "1. a\n  # h\n",
    "1. a\n   \\# h\n", "1. a\n   &#35; h\n", "1. a\n   ===\n", "10. a\n    # h\n",
    // r13 tables in item content (tight at the content column; deeper,
    // under-indented, loose, and sep-shaped-row variants)
    "1. a\n   |k|v|\n   |-|-|\n   |x|y|\n2. b\n", "- a\n  |p|q|\n  |-|-|\n- b\n",
    "1. a\n|k|v|\n|-|-|\n", "1. a\n    |k|v|\n    |-|-|\n", "1. a\n   |k|v|\n   |-|-|\n   lazy\n",
    "1. a\n\n   |k|v|\n   |-|-|\n", "1. a\n   1. b\n      |k|v|\n      |-|-|\n   2. c\n",
    // r13 indented-code blocks riding loose runs (verbatim, incl.
    // fence- and item-shaped code bytes); under-indented code breaks
    "2. a\n\n       code [1]\n\n5. b\n", "1. a\n\n       ```\n       3. x\n\n9. b\n",
    "1. a\n\n      - c\n\n2. b\n", "1. a\n\n    low\n\n2. b\n",
    // r14 setext shapes in item content: underlines joining the item's
    // open paragraph (head-merged, multi-line, nested, after R8h blocks),
    // no-paragraph dash breaks and '='-run text, short runs, lazy and
    // escaped/entity spellings (those stay conservative), and joins whose
    // content carries escapes
    "1. a\n   ---\n2. b\n", "1. t\n   ===\n", "1. a\n   b\n   ---\n2. c\n",
    "- t\n  ---\n", "1. a\n   ----\n", "1. a\n   --\n", "1. a\n   =\n",
    "1. a\n   # h\n   ---\n2. b\n", "1. a\n   # h\n   p\n   ---\n",
    "1. a\n   # h\n   ===\n", "1. a\n   1. b\n      ---\n2. c\n",
    "1. a\n   1. b\n   ---\n   c\n", "1. [x\n   ---\n", "1. a *b\n   ---\n",
    "1. a\n   > q\n   ---\n", "1. a\n   ```\n   x\n   ```\n   ---\n",
    "1. a\n   \\-\\-\\-\n", "1. a\n   &#61;==\n", "1. a\n   =\\=\n",
    "1. a\n\n   ---\n\n2. b\n", "1. a\n  ---\n", "1. a\n    ---\n",
    "1. a\n       ---\n", "1. ---\n", "1. a\n   ===\n   ---\n",
    // r14 escaped/entity spellings of block syntax as item TEXT (quote,
    // heading, setext render; fence and '*'-break spellings still bail)
    "1. a\n   \\> q\n5. b\n", "1. a\n   \\# h\n", "1. a\n   \\-\\-\\-\n",
    "1. a\n   \\=\\=\\=\n", "1. a\n   &#62; q\n5. b\n", "1. a\n   &#35; h\n",
    "1. a\n   \\`\\`\\`\n", "1. a\n   \\*\\*\\*\n", "1. a\n     \\> q\n",
    "1. a\n   \\> q\n   ---\n", "1. x\n\n   ```\n   ```\n\t=\n",
    "1. a\n\n   p\n\n   ```\n   x\n   ```\n\t=====\n",
    // r14 LOOSE defer shapes: breaks/headings/quotes/tables/setext
    // paragraphs opening their own blank-separated block inside a live
    // loose run render at the content column (they used to hoist to
    // column 0 and split the list); bullet-level (col 2) and wide-marker
    // (col 4) variants stay conservative
    "1. a\n\n   ***\n\n2. b\n", "1. a\n\n   # h\n\n5. b\n",
    "1. a\n\n   > q\n   > r\n\n5. b\n", "1. a\n\n   |k|v|\n   |-|-|\n\n5. b\n",
    "1. a\n\n   p\n   ---\n\n5. b\n", "1. a\n\n   p\n   ===\n",
    "- a\n\n  ***\n- b\n", "10. a\n\n    ***\n\n12. b\n",
    "1. a\n\n   |\n    >\n", "9. d\n   ```\n   ```\n\n\t0. w\n\t>\n",
    "1. a\n\n   > q\n\n   # h\n\n5. b\n", "1. a\n\n   ---\n\n   > x\n",
    // late-r14 wrap-surface shapes: loose 3-column continuation
    // paragraphs (re-fill), bullet-level 2-column ones (kept), quote
    // containers with lazy joins, and simple multi-item lists — the
    // wrap fuzz runs the same atom mix through every mode
    "1. a\n\n   cc dd\n   ee\n\n2. b\n", "- a\n\n  p q\n- b\n",
    "1. aa bb cc\n   dd ee\n2. x\n", "> aa bb\n> cc\ndd\n",
    "- aa bb cc dd\n- e\n", "1. a\n\n   long words here to fill\n\n2. b\n")
  private val chars = "abAB \n\n*_[]<>`&\\*_[]<>`&\\.-)#!0123=\t|:~"

  private def fuzz(seed: Long, cases: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    def gen(): String = {
      val n = rnd.nextInt(40)
      (0 until n).map { _ =>
        if (rnd.nextInt(6) == 0) atoms(rnd.nextInt(atoms.length))
        else chars(rnd.nextInt(chars.length)).toString
      }.mkString
    }
    var i = 0
    while (i < cases) {
      val s = gen()
      val once = MdFormatLite.normalize(s)
      val twice = MdFormatLite.normalize(once)
      assert(twice == once,
        s"normalize not idempotent (seed=$seed case=$i) on: " +
          s.replace("\\", "\\\\").replace("\n", "\\n"))
      i += 1
    }
  }

  test("normalize is a fixpoint under marker/escape-dense fuzz (seed 42)") { fuzz(42L, 10000) }
  test("normalize is a fixpoint under marker/escape-dense fuzz (seed 7)") { fuzz(7L, 10000) }

  test("normalize is a fixpoint under every --wrap mode (r14)") {
    val modes = Seq(MdFormatLite.Wrap.No, MdFormatLite.Wrap.Width(12),
      MdFormatLite.Wrap.Width(40))
    val rnd = new scala.util.Random(19L)
    def gen(): String = {
      val n = rnd.nextInt(40)
      (0 until n).map { _ =>
        if (rnd.nextInt(6) == 0) atoms(rnd.nextInt(atoms.length))
        else chars(rnd.nextInt(chars.length)).toString
      }.mkString
    }
    var i = 0
    while (i < 5000) {
      val s = gen()
      for (m <- modes) {
        val once = MdFormatLite.normalize(s, m)
        val twice = MdFormatLite.normalize(once, m)
        assert(twice == once,
          s"wrap $m not idempotent (case=$i) on: " +
            s.replace("\\", "\\\\").replace("\n", "\\n"))
      }
      i += 1
    }
    // deep-sweep r14 pins (late-r14 list/quote wrap extension): the
    // --wrap list fill must NOT touch a block from a BAILED loose-run
    // renumber — the riding ```-byte code block makes the whole-run
    // renumber pass through (r8h), and joining "10. a\nb" (or even a
    // uniformly-numbered "1. a\nb\n1. a", whose run-level first number
    // lives in an EARLIER block) changes the geometry the bail depended
    // on, so the next pass's renumber succeeds and renumbers — a flip.
    // Gated by the cleanRenumber bit renumberLoose now threads out.
    for (s <- Seq(
        "5. b\n10. a\nb\n11. a\n\n       ```\n\n       3. x\n\n9. b",
        "2. c\n\n1. a\nb\n1. a\n\n       ```\n\n       3. x\n\n9. b",
        "5. b\n10. a\nb\n\n       ```\n\n9. c",
        "2. c\n\n1. a\nb",
        // a re-filled bullet HEAD completing a thematic break ("- " +
        // "--" -> "- --"), found through the quote-inner wrap recursion
        "1. a\n       ---\n>- -- a\n1. x",
        "> - -- a",
        // count-changing item-nested quote recursion under wrap (the
        // lifted 1:1 gate composing with the wrap modes)
        "1. a\n   > t\n   > ===\n2. b",
        "1. a\n   > q [b]\n   > > deep\n2. c",
        // r15 wrap extensions: bullet 2-column and wide 4-column loose
        // continuations fill, nested levels fill at their own columns,
        // block-shaped heads stay verbatim with separate paragraph units
        "- aa\n\n  ff gg hh ii jj kk\n\n- bb",
        "10. aa\n\n    ff gg hh ii jj\n\n12. b",
        "1. aa bb cc dd ee ff\n   - gg hh ii jj kk ll mm nn",
        "1. aa bb\n   - cc dd\n   ee ff gg hh",
        "1. # h\n   cont more words here",
        // r15 output-stable run-witness classes (normalize-level, pinned
        // under wrap too since the fill composes with the renumber)
        "021. a\n   * c\n\n    .",
        ">\n 3. x\n\n    .",
        ">\n - b\n\n  ```\n  ```\n.",
        "5. b\n\n - a\n\n  p\n_",
        "1. a\n- a\n\n   p\n\n- b\n\n  ```\n  ```\n.",
        "2. b\n* c\n\n   .\n\n\t\\\n|",
        // r15 escaped-break paragraph-state class (raw break bails via a
        // lazy '=', escapes to \*\*\* — both spellings must leave the
        // same paragraph state behind)
        "- b\n\t___\n=",
        "2. b\n   ```\n   ```\n\t***\n=",
        // r15 table-head minting class: a marker-switched item head
        // de-indents to column 0 over a sep-shaped continuation, and the
        // rendered pair would re-parse as a table next pass — bails
        "&\n\n 1. z\n- b\n  5. |\n-|",
        // r15 code-block blank-run absorption stopping at a
        // loose-continuation line
        "12. b\n\n\t\t_\n   d\n2. x"); m <- modes) {
      val once = MdFormatLite.normalize(s, m)
      assert(MdFormatLite.normalize(once, m) == once,
        s"wrap $m pin: " + s.replace("\\", "\\\\").replace("\n", "\\n"))
    }
  }

  test("regression pins from fuzz-found round-11 failures") {
    val cases = Seq(
      "\\__*_&",          // escape drop merges into a matched delimiter run
      "*&***_*",          // partially-consumed *** run must stay bare
      "___*_",            // leftover chain: whole run bare, not split
      " \\* *",           // indented escaped bullet must keep its escape
      "*<s>\\*[]()*&",    // Verbatim edges are flanking-active, not ws
      " # h\na",          // leading-space heading parses as heading
      "#\\# h\n[",        // decoded '#' must not extend a heading run
      "* --",             // bullet normalization must not form an hr
      "-\\- - -",         // escaped dash in an hr-shaped line stays
      "a\n-\\-",          // escaped dash must not complete a setext
      "-- #\n-",          // setext title ending ' #': closing seq escapes
      "a\n\\=",           // escaped '=' must not become a setext h1
      "&#49;. x\n\n2. y", // decoded digit + plain '.' must not mint a marker
      "1. a\n\t5. b",     // tab indent measures as a 4-column stop (R8g)
      // deep-fuzz r12 finds: re-indented bullet completing break syntax,
      // same-output-column adjacent ordered lists re-merging, and a
      // code-offset continuation reaching back into a just-closed level
      "- c\n\t* --",
      "- b\n   7. z\n  3. x",
      "- b\n    7. z\n      c",
      "9. d\n     1. a\n       c",
      // escaped pipes/dashes must never drop into table-separator
      // syntax ("|\n-\|" -> "|\n-|" is a header+separator next pass)
      "|\n-\\|",
      "|\n|\\-|",
      // deep-fuzz r13 finds: a decoded line-start tilde run minting a
      // fence opener; bullet normalization minting a table separator
      // ("* |" -> "- |"); a geometry-dependent fence/quote bail whose
      // item-only fallback would re-indent the head block and flip the
      // classification next pass
      "\\~~~`x\ny\n```\nz",
      "|!&\n*\t|",
      "  1. a\n\n   p\n\n2. b\nc\n    7. z\nA1. a\n\t```\n\tc\n\t```",
      "  1. a\n\n   p\n\n2. b\n   > q\nr",
      // fuzz r14 finds: a setext join pops its paragraph lines, changing
      // adjacency in both directions — a pipe-bearing heading can land
      // under an item-nested table (row slurp absorbs it as a DATA ROW)
      // or above a separator-shaped line (it becomes a table HEAD); such
      // joins bail byte-stable
      "1. b\n   |\n-|\nc\n|\n   -",
      "1. |\n   -\n-|",
      // fuzz r14 find: a head-merged setext join must emit a plain
      // NON-exempt line — pre-escaping it via recursion excluded its
      // emphasis markers from this pass's block-wide delimiter matching,
      // while the next pass (reading an ordinary item rest) included
      // them, flipping a neighboring line's escape
      "- b\n*_3_\n  -\n&*`*",
      // fuzz r14 find: a no-paragraph '=' run in an ITEM-LESS loose
      // block must not re-indent tab->spaces — at <=3 columns the next
      // pass's TOP-LEVEL setext branch would claim it as the indented
      // paragraph's underline and hoist the block into a heading
      "1. x\n\n   ```\n   ```\n\t=",
      // fuzz r14 finds (loose-defer refinement): a renumber-rendered
      // block-syntax line is loose-reclaimable only in an ITEM-LESS
      // contish-pure block — a quote re-indented to column 3 below a
      // same-block item's deeper content column (or after a column-0
      // line) would interrupt the list as a container next pass
      "9. d\n   ```\n   ```\n\n\t0. w\n\t>",
      "1. a\n\n   |\n    >",
      // fuzz r14 finds (latent since r12, surfaced by the new atom mix):
      // a lazy line re-indented to a wide marker's >= 4-column content
      // col AT ITS BLOCK START reads as indented CODE next pass; and a
      // loose fence region's item-shaped code byte pollutes the next
      // pass's paraItemMin, so the loose reclaim must treat such blocks
      // as item-bearing
      "21. a\n\n   |\n1. a",
      "1. a\n\n   ```\n   ```\n   ~~~\n   - y\n   ~~~\n   ---",
      // wide-fuzz r13 find (pre-r13 shape): an output-indent collision
      // bails the whole run, the item-only fallback re-indents the
      // all-item sub-block, and the next pass's whole-run attempt on
      // the new geometry SUCCEEDS — the fallback must re-enter the
      // whole-run renumber on its own output within one pass
      "- b\nx\n\n   5. a\n   7. z\n  3. x",
      // late-r14 sweep find (latent since r13): an in-item thematic
      // break's same-block reclaim must also require a STABLE run — a
      // loose continuation head re-indented to the bullet's 2-column
      // content col breaks the run, the block then skips renumbering
      // next pass, and a rendered 70-underscore break would be escaped
      // as emphasis markers by the plain text pass
      "- b\n\n   5\n1. a\n   >\n   ---",
      "- b\n\n   5\n1. a\n   ***",
      "- b\n\n   5\n1. a\n   >\n   ___",
      // late-r14 sweep find: a bullet-shaped pipe line ("*\t|", minted
      // to "- \|" by the bullet branch's separator escape) must END a
      // table's row slurp (GFM: a list item terminates the table) —
      // slurped as a row it erased the item line the next pass's para
      // state depends on; and the cell splitter must treat "\|" as
      // literal content (escape-aware escapedSplit, boundary strips
      // only unescaped pipes)
      "1. a\n\n   |\n-|\n*\t|\n   ```\n\n   ```",
      "|a\\|b|\n|-|\nx\\||",
      "| \\| |\n|-|")
    for (s <- cases) {
      val once = MdFormatLite.normalize(s)
      assert(MdFormatLite.normalize(once) == once,
        s.replace("\\", "\\\\").replace("\n", "\\n"))
    }
  }
}
