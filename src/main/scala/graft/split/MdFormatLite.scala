package graft.split

/** mdformat-style markdown canonicalization (SURVEY.md §2.9 F11; reference
  * semantic_splitter.py:107-119 `_format_markdown_docs` runs `mdformat.text`
  * on every final chunk before hashing/metadata).
  *
  * No JVM mdformat exists, so this implements the subset of mdformat's
  * normalization rules that affect chunk bytes on this engine's inputs —
  * the rule list is the documented contract (FIXTURES.md §1.5):
  *
  *  R1. line endings -> \n; per-line trailing whitespace stripped
  *  R2. blocks are separated by exactly one blank line (runs collapse)
  *  R3. a heading, a pipe table, and a fenced code block are always their
  *      own block, even when the source had no blank line around them
  *  R4. ATX headings: single space after #s, trailing closing sequence
  *      (whitespace + #s) dropped; up to 3 leading spaces allowed
  *      (CommonMark). Round 12: EMPTY headings ("#", "## ", and
  *      closing-sequence-only content like "# #") render as the bare
  *      marker run. Round 11: SETEXT headings convert to ATX ('=' ->
  *      h1, '-' -> h2); round 13: MULTI-LINE setext content converts
  *      too, its soft line breaks becoming spaces (mdformat renders
  *      headings as one ATX line), and
  *      THEMATIC BREAKS (3+ of * - _ with optional internal spacing)
  *      render as mdformat's 70-underscore line; after an open
  *      paragraph, only a pure '-' run (a possible setext underline) is
  *      setext-or-text — SPACED '-' runs like "- - -" interrupt as
  *      breaks (round 12), as * and _ runs always did
  *  R5. bullet list markers * and + become - (marker + single space)
  *  R6. pipe tables re-rendered mdformat-tables style: cells trimmed and
  *      left-aligned, every column padded to its widest cell (min 3) where
  *      the delimiter row's own cell length counts toward the width,
  *      separator row stretched with dashes preserving :--- / ---: / :--:
  *      alignment colons, leading/trailing pipes with single-space gutters
  *  R7. no trailing newline (output is .strip()-ed like the reference's
  *      `mdformat.text(doc.md).strip()`)
  *  R8. ordered lists, mdformat default (no --number): EVERY item renders
  *      with the list's FIRST item number — "3. a / 7. b" -> "3. a / 3. b"
  *      and even consecutive "1. / 2. / 3." collapses to "1. / 1. / 1." —
  *      marker type (. or )) preserved from source, single space after the
  *      marker, and a marker-type switch starts a new list (CommonMark)
  *      with its own first number. Applies to flat tight blocks AND —
  *      R8b, round 10 — across consecutive all-item blocks (a LOOSE
  *      list: blank lines between items), which renumber as one list,
  *      AND — R8c, round 11 — to NESTED levels: each level is its own
  *      list with its own first-number rule, and nested indents
  *      normalize to the parent marker's width, AND — R8d, round 12 —
  *      to items carrying indented CONTINUATION lines (paragraph lines
  *      re-indent to the output content column, indented code inside an
  *      item keeps its relative offset) AND — R8e — to LAZY
  *      (under-indented) plain continuation lines, which re-indent to
  *      the deepest open item's content column, AND — R8f — to
  *      MIXED-MARKER nesting: bullets nested in ordered items (and
  *      ordered lists under bullets) participate structurally with a
  *      2-column marker width; bullets never renumber, and a
  *      marker-KIND switch starts a new list (bullet-HEADED lists flow
  *      through the same pass, so ordered lists nested under bullets
  *      renumber and nested bullet indents normalize), AND — R8g — TAB
  *      indents
  *      measure as CommonMark 4-column tab stops and render as spaces,
  *      AND — R8h, round 13 — FENCED CODE and QUOTE lines nested in
  *      item content carry through: a fence opener at an open item's
  *      content column opens a verbatim region (consumed wholesale by
  *      the grouper, blank lines included, so the list stays TIGHT)
  *      that re-indents to the level's output content column with
  *      offsets beyond the opener preserved and its bytes exempt from
  *      the escape pass; QUOTE lines at the same content column form a
  *      group whose content RE-FORMATS through this whole pipeline
  *      (mdformat recurses into item-nested quotes) — late r14 lifts
  *      the r13 1:1 line-count gate, so count-changing inner
  *      re-formats (blank insertion/collapse, setext joins) recurse
  *      too, the per-block renderer lengths making them representable
  *      and inner blanks rendering as bare ">"; HEADINGS and
  *      '*'/'_' THEMATIC BREAKS at a content column are item blocks
  *      too, rendering there through a one-line recursion (dash runs
  *      are setext-ambiguous inside an item and stay conservative);
  *      PIPE TABLES at a content column re-render in place through the
  *      R6 math (renderTable is 1:1 on lines), tight only; and
  *      INDENTED-CODE blocks (every non-blank line >= 6 columns) ride
  *      a loose run VERBATIM, so items after them keep renumbering.
  *      AND — r14 — SETEXT UNDERLINES at a content column JOIN the
  *      item's open paragraph into an ATX heading (merged into the
  *      head line when the paragraph starts there — "1. title" +
  *      "---" -> "1. ## title" — multi-line content joining with
  *      spaces), a dash run with NO open paragraph renders as the
  *      item's thematic break, a '='-run with none is plain text,
  *      and ESCAPED/ENTITY spellings of quote / heading / setext
  *      syntax render as plain TEXT at the content column (fence and
  *      '*'/'_'-break spellings stay conservative: the escape pass
  *      rewrites those raw shapes into escaped spellings inside a
  *      bailed block, so rendering the spelling would flip one pass
  *      after a raw bail).
  *      AND — r14 LOOSE DEFER — the same block-in-item rules reach
  *      blocks separated from their items by BLANK LINES: an indented
  *      (>= 3 column) break / heading / quote group / pipe table /
  *      setext paragraph opening its own block inside a live loose
  *      run stays in the paragraph stream and renders at the item's
  *      content column (those shapes used to hoist to a column-0
  *      block that SPLIT the list), gated on an item-less
  *      contish-pure block plus the renderer's SIMULATION of the next
  *      pass's grouper run state (r15 — the state the next pass's
  *      defer re-derives, block by block; a simulated mid-run death
  *      means the rendered bytes would re-group as different runs, so
  *      the run bails byte-stable). Round 15 generalizes the run
  *      threshold from the ordered 3-column geometry to bullet-level
  *      (2-column) and wide-marker (4+-column) content columns, keyed
  *      on the run's one OUTPUT-STABLE witness (its first block
  *      head's column — stableHeadCol), and re-reads blank-separated
  *      paragraphs within [contentCol, contentCol+4) of a live run as
  *      the item's continuation instead of indented code. LAZY '='
  *      runs in item content absorb as paragraph text (an underline
  *      cannot be lazy) rendered escape-spelled at the content
  *      column; escaped/entity '*'/'_' BREAK spellings render as
  *      plain text under the raw break's own gates.
  *      Shapes whose rendered column the next pass would not reclaim
  *      (no same-block item at or below that column, no loose
  *      reclaim), under-indented
  *      or unclosed fences, bare '-'/'--' with no
  *      paragraph (an empty-bullet reading), pipe-bearing setext
  *      joins near tables, and fence escaped spellings pass
  *      through byte-stable
  *      or fall back to item-only renumbering (divergence). Fences in
  *      LOOSE items (blank line between the item and the fence) carry
  *      too: the run's scanner state rides across blocks, valid while
  *      every rendered block head re-enters the simulated run — one
  *      with internal blank lines (its block cannot hold
  *      together without items above) stays pass-through.
  *  R9. bracket escape normalization: [ and ] in TEXT — not part of a
  *      complete inline/reference link or image, not in a code span, not
  *      already escaped — render as \[ \] (mdformat's text renderer
  *      escapes all brackets in text tokens; a truncation that cuts a
  *      link's (url) off leaves exactly such text, the reference's own
  *      splitter_test.py:179 expected output). Fences, table cells, and
  *      — round 11 — INDENTED CODE BLOCKS (>= 4-space lines opening a
  *      block; indented list-item shapes keep their list reading, and
  *      the input's LEADING whitespace is pre-stripped, mirroring the
  *      trailing .strip(), so a document-leading indented line parses
  *      as the paragraph the strip would have demoted it to) are not
  *      text tokens and pass through.
  *  R10-R14 (round 10, [[MdTextEscapes]]): the remaining text-token
  *      escape classes per mdformat's renderer — literal backslash
  *      doubling (R10), unmatched * / _ emphasis-marker escapes under
  *      the full CommonMark flanking + rule-of-three delimiter matching
  *      so REAL emphasis like **bold** stays untouched (R11), < and
  *      unmatched backtick escapes with autolink / inline-HTML / code-
  *      span protection (R13), character references decoded to their
  *      characters (WHATWG HTML5 entity table, checked-in resource) with
  *      a \& escape wherever literal text would re-parse as a reference
  *      (R14). R9's bracket rule is subsumed by the same pass (R12).
  *      Round 11: input escape sequences DECODE and re-escape only where
  *      context demands (mdformat drops unnecessary escapes: `a\,b` ->
  *      `a,b`), a backslash before a newline is a CommonMark hard line
  *      break and passes through verbatim, and link/image LABELS render
  *      through the same text-escape pass (destinations and reference
  *      labels stay verbatim).
  *  R15/R15b/R15c (rounds 11-12): blockquotes — markers normalize to
  *      one '>' + one space per level at column 0, and a quote
  *      CONTAINER recurses: one marker level strips, the inner document
  *      runs through this same pipeline (lists renumber, tables pad,
  *      headings normalize — mdformat re-formats quoted content), and
  *      the result re-prefixes with canonical markers. R15c (round 12):
  *      a plain paragraph line after the run whose inner document ends
  *      in an OPEN PARAGRAPH is a CommonMark lazy continuation — it
  *      joins the quoted paragraph (strips into the inner document and
  *      renders WITH markers); a follower that starts a block, or one
  *      after a non-paragraph inner ending, closes the quote instead.
  *
  * Not implemented (documented divergence): emphasis-marker handling
  * needs none (mdformat renders em/strong with the SOURCE marker,
  * `node.markup` — markers are preserved, not rewritten); remaining gaps
  * are the narrow conservative bails listed under R8h (lazy setext
  * shapes, bare short dash runs without a paragraph, pipe-bearing
  * setext joins near tables, fence escaped spellings,
  * loose-block dash runs — each byte-stable pass-through or item-only
  * renumbering). Paragraph re-wrapping (mdformat `--wrap no|N`) is
  * implemented behind the [[Wrap]] knob on the [[normalize]] overload
  * — default [[Wrap.Keep]] matches mdformat's default and leaves every
  * oracle untouched; top-level paragraphs, quote content — top-level
  * AND item-nested (width reduced by the cumulative marker indent) —
  * simple list items INCLUDING nested levels (r15, a level stack
  * mirroring the renumberer's attach rules), and loose continuation
  * blocks at any uniform column >= 2 re-fill; block-shaped item rests
  * stay verbatim with their continuations filled as separate
  * paragraph units.
  * Table cells render through the mdformat-tables path (R6), not the
  * text-escape pass.
  */
object MdFormatLite {

  private[split] val TableSepRe = "^\\s*\\|?(?:\\s*:?-+:?\\s*\\|)+\\s*$".r
  // CommonMark: a heading may be indented up to 3 spaces (and the final
  // whole-output strip() would expose a leading-space heading to the next
  // pass anyway — parsing it here keeps normalize idempotent)
  // the ATX closing sequence strips only when whitespace precedes it
  // (CommonMark: "# x#" keeps its '#', "# x #" drops it) — stripping a
  // bare trailing '#' would lose content a setext conversion just wrote
  private val HeadingRe = "^ {0,3}(#{1,6})\\s+(.*?)(?:\\s+#+)?\\s*$".r
  // CommonMark empty ATX heading: bare #s ("#", "## "); and "# #"-shaped
  // lines are empty too (the trailing run is a closing sequence) — both
  // render as the bare marker run (round 12, mdformat's reading)
  private val EmptyHeadingRe = "^ {0,3}(#{1,6})\\s*$".r
  // setext underlines (round 11): '=' run -> h1, '-' run -> h2 when they
  // close a one-line paragraph; mdformat converts setext headings to ATX
  private val SetextH1Re = "^ {0,3}=+\\s*$".r
  private val SetextH2Re = "^ {0,3}-+\\s*$".r
  // thematic break: 3+ of * - _ (spaces/tabs between allowed); mdformat's
  // style renders every thematic break as a 70-underscore line
  private val HrRe = "^ {0,3}(?:(?:\\*[ \t]*){3,}|(?:-[ \t]*){3,}|(?:_[ \t]*){3,})$".r
  private val HrOut = "_" * 70
  private val BulletRe = "^(\\s*)[*+-]\\s+(.*)$".r
  private val FenceRe = "^(```|~~~).*$".r
  // Per-line hot-path patterns precompiled (String.replaceAll/split recompile per call)
  private val TrailWs = java.util.regex.Pattern.compile("\\s+$")

  private def isSep(l: String): Boolean = TableSepRe.matches(l)

  private val OrderedItemRe = "^(\\s*)(\\d{1,9})([.)])\\s+(\\S.*)$".r

  /** Leading-whitespace COLUMN width under CommonMark 4-column tab stops
    * (R8g) — indents are measured in columns and render as spaces. */
  private def colWidth(ws: String): Int = {
    var col = 0
    var i = 0
    while (i < ws.length) {
      if (ws.charAt(i) == '\t') col += 4 - (col % 4) else col += 1
      i += 1
    }
    col
  }

  private def leadWs(l: String): String = l.takeWhile(c => c == ' ' || c == '\t')

  /** Content column a list-item line OPENS (marker indent + marker width
    * + one space), or -1 when the line is not an item shape. */
  private def itemContentCol(l: String): Int = l match {
    case OrderedItemRe(ind, nu, _, _) => colWidth(ind) + nu.length + 2
    case BulletRe(ind, _)             => colWidth(ind) + 2
    case _                            => -1
  }

  /** r15: the OUTPUT-STABLE content column a loose run's FIRST block
    * head witnesses, or Int.MaxValue. Every run-threshold decision
    * (defer, carry, run extension, code-vs-continuation) must be
    * invariant under rendering, and ONLY the run's first head column
    * provably is: it renders at indent 0 whatever its sub-4 input
    * indent (the outermost level's outIndent is 0 and its own number is
    * the one renumbering keeps). Any later head can MOVE — an indented
    * later head can dedent to 0 (becoming a would-be witness the first
    * pass never saw: the fuzz-found "5. b\n\n - a\n\n  p\n_" class) or
    * attach nested and render deeper, and a renumbered head takes the
    * first number's width — so later heads never fold. */
  private def stableHeadCol(head: String): Int = head match {
    case BulletRe(ind, _) if colWidth(ind) < 4 => 2
    case OrderedItemRe(ind, nu, _, _) if colWidth(ind) < 4 => nu.length + 2
    case _ => Int.MaxValue
  }

  /** R8h: closing-fence search for an ITEM-NESTED fenced region opened at
    * line `at` (opener fence char `ch`, run length `n`, indent column
    * `w`). Region content must be mdformat-canonical item content — every
    * non-blank line indented at least to the opener's column (an
    * under-indented line would end the ITEM in CommonMark, so such input
    * is not representable here and the caller falls back) — and the
    * closer is a bare same-char run of >= the opener's length at >= the
    * opener's column. Returns the closer index, or -1 (no region). */
  private def fenceCloserAt(lines: Vector[String], at: Int,
                            ch: Char, n: Int, w: Int): Int = {
    var j = at + 1
    while (j < lines.length) {
      val cl = lines(j)
      if (cl.isEmpty) j += 1
      else {
        val lead = leadWs(cl)
        if (colWidth(lead) < w) return -1
        val ct = cl.substring(lead.length)
        if (ct.nonEmpty && ct.forall(_ == ch) && ct.length >= n) return j
        j += 1
      }
    }
    -1
  }

  /** R8h region scanner over one text block's lines: inclusive
    * (opener, closer) spans of item-nested FENCED CODE regions, plus the
    * final item-column state so a LOOSE run can carry it across blocks
    * (round 13: a fence in a continuation BLOCK of a loose list opens
    * against items seen in EARLIER blocks of the same run — `minItem0`
    * seeds the scan). A region opens at a line whose indent column
    * reaches the minimum content column of an item line seen above it
    * (same block, or carried) and whose stripped content is
    * fence-shaped; see [[fenceCloserAt]] for the closing rule. Region
    * content never updates the item-column state (code bytes are not
    * items). The block grouper consumes exactly the same-block spans
    * verbatim into the paragraph run (so tight regions keep their blank
    * lines inside one block); loose regions hold together on their own
    * because a blank-containing loose region never parses (its closer
    * lands outside the block). Scanning a rendered block re-derives the
    * same regions: output item columns are monotone with depth, so the
    * carried minimum stays at or below every rendered region column. */
  private[split] def fenceSpans(lines: Vector[String],
                                minItem0: Int = Int.MaxValue): (Vector[(Int, Int)], Int) = {
    val spans = Vector.newBuilder[(Int, Int)]
    var minItem = minItem0
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      var consumed = false
      if (minItem != Int.MaxValue && l.nonEmpty) {
        val lead = leadWs(l)
        val w = colWidth(lead)
        val t = l.substring(lead.length)
        if (w >= minItem && FenceRe.matches(t)) {
          val ch = t.charAt(0)
          val n = t.takeWhile(_ == ch).length
          val close = fenceCloserAt(lines, i, ch, n, w)
          if (close >= 0) { spans += ((i, close)); i = close + 1; consumed = true }
        }
      }
      if (!consumed) {
        val c = itemContentCol(l)
        if (c >= 0) minItem = math.min(minItem, c)
        i += 1
      }
    }
    (spans.result(), minItem)
  }

  /** R15 (round 11): blockquote MARKER normalization — mdformat renders
    * one '>' plus one space per quote level at column 0 ("> > x").
    * Only the marker run is touched: a missing space after a '>' is
    * inserted, inter-marker spacing collapses, and the ≤3-space leading
    * indent drops; content spacing beyond the final marker space is
    * preserved (so code indent inside a quote survives; divergence:
    * mdformat also re-formats the quoted CONTENT as markdown). */
  private def normalizeQuoteMarkers(l: String): String = {
    var i = 0
    while (i < l.length && i < 3 && l.charAt(i) == ' ') i += 1
    if (i >= l.length || l.charAt(i) != '>') return l
    var levels = 0
    var j = i
    while (j < l.length && l.charAt(j) == '>') {
      levels += 1
      j += 1
      if (j < l.length && l.charAt(j) == ' ') {
        var k = j
        while (k < l.length && l.charAt(k) == ' ') k += 1
        // spaces BETWEEN markers collapse; one space before content is
        // the marker's own, the rest is content indent and stays
        if (k < l.length && l.charAt(k) == '>') j = k else j += 1
      }
    }
    val content = l.substring(j)
    if (content.isEmpty) ("> " * (levels - 1)) + ">"
    else ("> " * levels) + content
  }

  /** R8/R8c/R8d: renumber an ordered-list line sequence — nested levels
    * (round 11) and non-item CONTINUATION lines (round 12) included.
    * Levels follow CommonMark item nesting — an item NESTS when its
    * indent reaches the parent's content column (marker indent + marker
    * width + one space), stays a SIBLING below it, and CLOSES nested
    * levels when it dedents below their marker indent. Every level's
    * items take that level's FIRST number (per marker-type run,
    * mdformat's no-`--number` default), and nested indents normalize to
    * the sum of ancestor marker widths (mdformat re-indents list content
    * to the parent marker's width).
    *
    * A `Right` line is item CONTENT (a paragraph/code line in the item):
    * it attaches to the deepest open level whose content column its
    * indent reaches — closing deeper levels, as a paragraph at the
    * parent's content column does per CommonMark — and renders at that
    * level's OUTPUT content column; an extra indent of 4+ (indented
    * code inside the item) keeps its relative offset, a smaller extra
    * strips (mdformat renders paragraph continuation lines exactly at
    * the content column). R8e (round 12): an UNDER-indented plain line
    * is a CommonMark LAZY continuation of the DEEPEST open item's
    * paragraph — it renders at that item's content column (no level
    * closes; laziness reaches the innermost paragraph).
    *
    * R8f (round 12): BULLET lines participate STRUCTURALLY — a bullet
    * nested in an ordered item (or an ordered list nested under a
    * bullet) opens its own level with a 2-column ("- ") marker width,
    * indents normalize against ancestor output widths like any level,
    * and a marker-KIND switch at the same level starts a new CommonMark
    * list (an ordered list resuming after a bullet interruption takes
    * its own first number). Bullets themselves never renumber.
    *
    * Returns None when the shape is not a clean list — a leading 4-column
    * indent, an over-indent CommonMark would read as indented CODE in
    * place of an item, a continuation whose content is block-syntax-
    * shaped beyond the R8h fence/quote/heading/break support (dash runs,
    * setext underlines, escaped/entity spellings), or an R8h shape whose
    * rendered column the next pass would not reclaim — and the caller
    * falls back to the round-11 item-only treatment (whole-run
    * pass-through when the run holds R8h shapes, whose attachment is
    * geometry-dependent). */
  private sealed trait ListLine
  private final case class OItem(ind: String, num: String, marker: String, rest: String) extends ListLine
  private final case class BItem(ind: String, rest: String) extends ListLine
  private final case class Cont(raw: String) extends ListLine
  // R8h (round 13): item-nested fenced-code region lines, pre-classified
  // by the fenceSpans scanner so verbatim code bytes (which may be
  // item-shaped, blank, or block-syntax-shaped) never reach the item /
  // continuation logic
  private final case class FOpen(ind: String, text: String) extends ListLine
  private final case class FBody(raw: String) extends ListLine
  private final case class FClose(text: String) extends ListLine
  // R8h (round 13): an item-nested PIPE TABLE — one element carrying its
  // raw lines (head, separator, rows), rendered 1:1 through renderTable
  // at the attached level's content column
  private final case class TBlock(ind: String, rows: Vector[String]) extends ListLine
  // a line the renderer passes through VERBATIM with no effect on the
  // level stack — an indented-code block riding a loose run (round 13:
  // the run used to BREAK at a code block, so items after it never
  // renumbered with the list; the code block itself stays a non-text
  // block, untouched by re-indent and escape alike)
  private final case class Skip(raw: String) extends ListLine
  // block boundary within a loose run (no output line): R8h safety state
  // is BLOCK-local, because the next pass's grouper and fence scanner
  // judge quote/fence lines against items in the SAME block only
  private case object BlockBreak extends ListLine

  /** Returns the rendered lines plus a parallel ESCAPE-EXEMPT mask (true
    * lines — fence-region bytes, recursively re-formatted quote content —
    * splice through the text-escape pass verbatim) plus the PER-BLOCK
    * output line counts. Rendering is 1:1 on lines EXCEPT the r14 setext
    * join (a paragraph plus its underline collapse into one ATX line) and
    * the late-r14 count-changing quote-group recursion (the group's inner
    * document may shrink or grow), so the caller re-slices blocks by the
    * returned counts, not the input lengths. `quoteDepth` bounds the
    * R8h-quote recursion exactly like normalizeCore's R15b bound. */
  private def renumberNested(items: Vector[ListLine], quoteDepth: Int,
                             wrap: Wrap = Wrap.Keep): Option[(Vector[String], Vector[Boolean], Vector[Int])] = {
    // bullet levels carry num = "" and marker = "-": width = "" + "-" +
    // " " = 2 columns, and the shared rendering/contentCol arithmetic
    // (num + marker + space) stays uniform across kinds
    final case class Level(inIndent: Int, var bullet: Boolean,
                           var num: String, var marker: String,
                           outIndent: Int) {
      def contentCol: Int = inIndent + num.length + 2 // marker char + space
      def outContentCol: Int = outIndent + num.length + 2
    }
    // R8g (round 12): a TAB in leading whitespace advances to the next
    // 4-column tab stop (CommonMark's tab expansion); indents are
    // measured in COLUMNS (object-level colWidth) and render as spaces
    // (mdformat emits space indents)
    if (items.isEmpty) return None
    items.head match {
      case OItem(ind, _, _, _) if colWidth(ind) < 4 => ()
      case BItem(ind, _) if colWidth(ind) < 4 => ()
      case _ => return None
    }
    val stack = scala.collection.mutable.ArrayBuffer.empty[Level]
    // ArrayBuffers, not builders: the r14 setext join POPS the open
    // paragraph's already-emitted lines and replaces them with one ATX
    // heading line
    val outLines = scala.collection.mutable.ArrayBuffer.empty[String]
    val outExempt = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    // per-block output lengths (a BlockBreak closes a block): the caller
    // re-slices its blocks by these, because a setext join makes a block
    // SHORTER than its input
    val blockLens = scala.collection.mutable.ArrayBuffer.empty[Int]
    var blockStart = 0
    // r15: the run-level minimum OUTPUT item content column rendered so
    // far in COMPLETED blocks — the renderer's sequential mirror of the
    // grouper's runItemMin (which updates at closePara, i.e. at block
    // boundaries), so the reclaim gates below predict the next pass's
    // defer thresholds exactly. Folded from outBlockMin at BlockBreak.
    // r15: the renderer SIMULATES the next pass's grouper run state over
    // its own RENDERED blocks — (nextRunAlive, nextStable) are exactly
    // the grouper's (runHasItems, runItemMinStable) as they will evolve
    // when the rendered bytes re-parse, updated at each BlockBreak from
    // the closed block's rendered head line. Runs can SPLIT mid-render
    // (a rendered head below the threshold kills the carry) and a later
    // item-headed block then starts a FRESH run with its own first-head
    // witness (fuzz-found: "1. a\n- a\n\n   p\n\n- b\n\n  ```\n  ```\n."),
    // so a run-scoped constant cannot represent the state — only the
    // faithful sequential simulation can.
    var nextRunAlive = false
    var nextStable = Int.MaxValue
    def thrOut: Int =
      if (nextStable == Int.MaxValue) 3 else math.min(3, nextStable)
    // r14 LOOSE reclaim state: true while EVERY line rendered in the
    // current block is at or beyond the run threshold (r15: thrOut,
    // previously the literal 3) columns of indent — the next pass's
    // grouper extends its loose defer through such a block
    // (contish-pure), so a deferred block-syntax line rendered
    // mid-block stays deferred. Item lines are excluded separately
    // (outBlockMin != MaxValue): an item in the block re-instates the
    // TIGHT paraItemMin guard, which reclaims only at or beyond the
    // item's content column.
    var blockContish = true
    def noteLine(s: String): Unit =
      // item-SHAPED lines disqualify too, whatever their provenance: a
      // fence region's verbatim "   - y" code byte updates the next
      // pass's grouper paraItemMin (the grouper cannot know a loose
      // region's bytes are code), re-instating the tight content-column
      // guard there — the loose reclaim must predict that (fuzz r14)
      if (!s.startsWith(" " * thrOut) || itemContentCol(s) >= 0)
        blockContish = false
    // keeps the existing `out += line` sites reading naturally: a plain
    // += emits a NON-exempt line, outEx an escape-exempt one
    object out {
      def +=(s: String): Unit = { outLines += s; outExempt += false; noteLine(s) }
    }
    def outEx(s: String): Unit = { outLines += s; outExempt += true; noteLine(s) }
    // The OPEN ITEM PARAGRAPH (r14): the run of plain paragraph lines —
    // the item head's own text and its continuation lines — currently
    // open at the deepest level, tracked so a setext underline can JOIN
    // it the way mdformat does (ATX conversion, softbreaks to spaces).
    // paraIdx holds the emitted lines' indices (popped on join),
    // paraTexts their raw content, paraHeadPrefix the "  1. " marker
    // prefix when the paragraph starts at the item head line itself
    // (the heading then merges INTO the head: "1. ## title"). Whenever
    // paraIdx is non-empty, paraLevel is stack.last by construction —
    // every level change flows through a site that resets or re-opens
    // the paragraph.
    var paraLevel: Level = null
    var paraHeadPrefix: String = null
    val paraIdx = scala.collection.mutable.ArrayBuffer.empty[Int]
    val paraTexts = scala.collection.mutable.ArrayBuffer.empty[String]
    def paraReset(): Unit = {
      paraLevel = null; paraHeadPrefix = null; paraIdx.clear(); paraTexts.clear()
    }
    def paraOpen(level: Level, text: String, headPrefix: String = null): Unit = {
      paraReset()
      paraLevel = level; paraHeadPrefix = headPrefix
      paraIdx += outLines.length - 1; paraTexts += text
    }
    def paraAppend(text: String): Unit = {
      paraIdx += outLines.length - 1; paraTexts += text
    }
    // shared level resolution for marker lines of either kind
    def levelFor(w: Int, bullet: Boolean, n: String, m: String): Option[Level] = {
      // dedent closes nested levels; the OUTERMOST list never closes (a
      // shallower-indented item still belongs to it per CommonMark)
      val popped = scala.collection.mutable.ArrayBuffer.empty[Level]
      while (stack.length > 1 && w < stack.last.inIndent) {
        popped += stack.last
        stack.dropRightInPlace(1)
      }
      if (stack.isEmpty) stack += Level(w, bullet, n, m, 0)
      else if (w >= stack.last.contentCol + 4) return None // indented code
      else if (w >= stack.last.contentCol) {
        val parent = stack.last
        val outIndent = parent.outContentCol
        // OUTPUT-INDENT COLLISION (deep-fuzz r12 find): distinct input
        // indents can normalize to the SAME output column. If an
        // ordered list that was just closed by this dedent rendered at
        // this column with the same marker but a DIFFERENT number, the
        // rendered doc re-parses as ONE merged list and renumbers again
        // next pass — not representable, so the run passes through
        if (popped.exists(p => !p.bullet && !bullet &&
            p.outIndent == outIndent && p.marker == m && p.num != n))
          return None
        stack += Level(w, bullet, n, m, outIndent)
      } else {
        val top = stack.last
        // a KIND or marker-type switch starts a new CommonMark list at
        // this level, with its own first number (for ordered lists)
        if (top.bullet != bullet || m != top.marker) {
          top.bullet = bullet; top.num = n; top.marker = m
        }
      }
      Some(stack.last)
    }
    // R8h fence-region rendering state: the opener's input column and the
    // column the region renders at (the attached level's content column)
    var regionInCol = -1
    var regionOutCol = -1
    // R8h quote groups (round 13, count-gate lifted late r14):
    // consecutive quote-marker continuation lines rendering at the SAME
    // column form one item-nested blockquote whose content re-formats
    // through the full pipeline — mdformat recurses into item-nested
    // quotes — INCLUDING count-changing re-formats (blank collapse,
    // blank insertion between inner blocks, setext joins): since r14
    // the renderer reports PER-BLOCK output lengths (blockLens), so a
    // group that shrinks or grows is representable, inner blank lines
    // render as bare ">" (never an outer blank), and the next pass
    // re-groups the same marker lines around a now-canonical inner
    // document (identity — the fixpoint the r13 1:1 gate used to
    // enforce by bailing). Recursed lines are escape-EXEMPT (the
    // recursion ran its own escape pass); at recursion depth 0 the
    // fallback is the per-line marker normalization, its content
    // escaping in the outer text pass — stable on its own since both
    // passes take it. Grouping by the RENDERED column (not input
    // indent) keeps the next pass's grouping identical: it sees equal
    // indents and forms the same group.
    val qPend = scala.collection.mutable.ArrayBuffer.empty[String]
    var qCol = -1
    def flushQuotes(): Unit = {
      if (qPend.isEmpty) return
      val texts = qPend.toVector
      val col = qCol
      qPend.clear()
      qCol = -1
      if (quoteDepth > 0) {
        // late r14: the inner document re-fills under the active --wrap
        // mode with the width reduced by the rendered column plus the
        // "> " marker ([[innerWrap]] — mdformat's cumulative indent)
        val inner = texts.map(stripOneMarker)
        val rendered = normalizeCore(inner, quoteDepth - 1,
          wrap = innerWrap(wrap, col + 2)).split("\n", -1).toVector
        rendered.foreach(x => outEx((" " * col) + (if (x.isEmpty) ">" else "> " + x)))
      } else {
        texts.foreach(t => out += (" " * col) + normalizeQuoteMarkers(t))
      }
    }
    // R8h safety state: the minimum OUTPUT content column among item
    // lines rendered in the CURRENT block. The next pass's grouper (and
    // the fence scanner) reclaim a quote/fence line as item content only
    // when an item AT OR BELOW its column sits above it in the SAME
    // block — a rendered quote/fence column this minimum does not reach
    // would reclassify next pass, so those shapes bail instead...
    var outBlockMin = Int.MaxValue
    // the current rendered block starts at outLines(blockStart); a block
    // is at its start while nothing has been emitted into it yet
    def atBlockStart: Boolean = outLines.length == blockStart
    // will the NEXT pass renumber-visit the current block? Either a run
    // is alive at its boundary (the simulation above), or its rendered
    // head line is itself an item (orderedish starts a fresh run).
    def blockRenumbered: Boolean =
      nextRunAlive || (outLines.length > blockStart && {
        val h = outLines(blockStart)
        OrderedItemRe.matches(h) || BulletRe.matches(h)
      })
    // the loose-reclaim disjunct for quote/heading/break/setext gates:
    // rendered between the run threshold and column 3 (r15 — previously
    // exactly 3; quote/heading/break/setext syntax caps at 3 columns of
    // indent, and deeper reads as indented code at a loose block
    // start), inside a live simulated run, in an item-less contish-pure
    // block — precisely the state the next pass's looseDefer re-derives
    def looseReclaim(outCol: Int): Boolean =
      outCol >= thrOut && outCol <= 3 && nextRunAlive &&
        outBlockMin == Int.MaxValue && blockContish
    // one grouper closePara/addBlock step over the just-closed rendered
    // block, returning false when the run DIES mid-simulation — the
    // rendered bytes would then re-group as different runs next pass
    // (and post-run blocks would reclassify against a dead run), so the
    // caller bails byte-stable. Runs on EVERY block including the last:
    // a final block rendered below the threshold changes the run state
    // the next pass's grouper carries into the blocks AFTER this run
    // (fuzz-found: "2. b\n* c\n\n   .\n\n\t\\\n|" — the re-indented
    // "  ." kills the carry, reclassifying the tab-code line behind the
    // run from deferred paragraph to code block).
    def simCloseBlock(len: Int): Boolean = {
      if (len <= 0) return true
      val head = outLines(blockStart)
      if (OrderedItemRe.matches(head) || BulletRe.matches(head)) {
        if (!nextRunAlive) nextStable = stableHeadCol(head)
        nextRunAlive = true
        true
      } else if (isIndentedCodeLine(head) &&
          !(nextRunAlive && nextStable != Int.MaxValue && {
            val w = colWidth(leadWs(head))
            w >= nextStable && w < nextStable + 4
          })) {
        (0 until len).forall { k =>
          val x = outLines(blockStart + k)
          x.isEmpty || colWidth(leadWs(x)) >= 6
        }
      } else head.startsWith(" " * thrOut)
    }
    for (line <- items) line match {
      case Skip(raw) =>
        flushQuotes()
        paraReset()
        out += raw
      case BlockBreak =>
        flushQuotes()
        paraReset()
        val len = outLines.length - blockStart
        blockLens += len
        // SIMULATE the next pass's grouper closePara/addBlock over the
        // just-closed rendered block (see nextRunAlive above): an
        // item-headed block starts or continues the run (the run's
        // FIRST head is its one stable witness); an indented-code-led
        // block is a code claim UNLESS the loose-continuation exception
        // keeps it a paragraph, and carries the run only when fully
        // codeish (>= 6 columns everywhere); any other head carries
        // the run iff it reaches the threshold indent. A simulated
        // mid-run DEATH means the rendered bytes would re-group as
        // DIFFERENT runs next pass — the remaining blocks (and even
        // blocks after this run) would re-render under fresh run state
        // this pass never applied (fuzz-found: a bullet-switched run
        // whose re-indented "  p" continuation splits it, letting the
        // 2-column fence block behind it join a fresh thr-2 run) — so
        // the render is unrepresentable and the run bails byte-stable.
        if (!simCloseBlock(len)) return None
        blockStart = outLines.length
        outBlockMin = Int.MaxValue
        blockContish = true
      case FOpen(ind, text) =>
        flushQuotes()
        paraReset()
        // a fence at an open level's content column (extra < 4) is a
        // block INSIDE that item: deeper levels close (same dedent rule
        // as continuations — block syntax is never lazy), the fence
        // renders AT the level's output content column (mdformat renders
        // an item's block children at the content column; a 1-3 extra
        // indent is not preserved), and its content re-indents by the
        // same delta with offsets beyond the opener's column kept
        if (stack.isEmpty) return None
        val w = colWidth(ind)
        if (w < stack.head.contentCol) return None // interrupts the list
        while (stack.length > 1 && w < stack.last.contentCol)
          stack.dropRightInPlace(1)
        val top = stack.last
        val extra = w - top.contentCol
        // 4+ extra is CommonMark indented CODE inside the item whose
        // bytes merely look like a fence — beyond this pass (the region
        // scanner claimed its lines, so re-indenting as code here would
        // reclassify them next pass): pass the run through byte-stable
        if (extra >= 4) return None
        // next pass's scanner reclaims the region when an item at or
        // below its column precedes it in the same block (TIGHT), or —
        // round 13, LOOSE — through the run's carried item state, which
        // reaches this block only while the rendered run holds together:
        // every block head so far re-enters the run, and this region's
        // own lines render at or beyond the run threshold (contish —
        // r15: thrOut, so a loose fence under a 2-column bullet level
        // reclaims at column 2 instead of bailing).
        val outCol = top.outContentCol
        if (!(outBlockMin <= outCol || (outCol >= thrOut && nextRunAlive)))
          return None
        regionInCol = w
        regionOutCol = outCol
        outEx((" " * regionOutCol) + text)
      case FBody(raw) =>
        if (raw.isEmpty) outEx("")
        else {
          // strip up to the opener's column (CommonMark), keep the rest
          val lead = leadWs(raw)
          val off = math.max(0, colWidth(lead) - regionInCol)
          outEx((" " * (regionOutCol + off)) + raw.substring(lead.length))
        }
      case FClose(text) =>
        outEx((" " * regionOutCol) + text)
        regionInCol = -1
        regionOutCol = -1
      case TBlock(ind, rows) =>
        flushQuotes()
        paraReset()
        // R8h (round 13): a pipe table at an open level's content column
        // is a block INSIDE that item — deeper levels close, the table
        // re-renders through the R6 path (cells trimmed/padded, NOT the
        // text-escape pass — exempt) at the level's output content
        // column. renderTable is exactly 1:1 on lines (head + separator
        // + data rows), so the renderer's slicing contract holds.
        // TIGHT only (a same-block item at or below the column): the
        // next pass's grouper reclaims indented table heads into the
        // paragraph run by exactly that rule.
        if (stack.isEmpty) return None
        val w = colWidth(ind)
        if (w < stack.head.contentCol) return None // interrupts the list
        while (stack.length > 1 && w < stack.last.contentCol)
          stack.dropRightInPlace(1)
        val top = stack.last
        if (w - top.contentCol >= 4) return None // indented-code bytes
        val outCol = top.outContentCol
        // reclaim via a same-block item, or — r14 LOOSE — the run-level
        // defer (table detection is indent-agnostic, so any column at or
        // beyond the run threshold works while the run holds together)
        if (outBlockMin > outCol &&
            !(outCol >= thrOut && nextRunAlive && outBlockMin == Int.MaxValue &&
              blockContish)) return None
        val s = rows.map(r => r.substring(leadWs(r).length))
        val rendered = renderTable(s.head, s(1), s.drop(2))
        if (rendered.length != rows.length) return None // defensive: 1:1
        rendered.foreach(x => outEx((" " * outCol) + x))
      case OItem(ind, n, m, rest) =>
        flushQuotes()
        paraReset()
        levelFor(colWidth(ind), bullet = false, n, m) match {
          case None => return None
          case Some(top) =>
            outBlockMin = math.min(outBlockMin, top.outContentCol)
            out += (" " * top.outIndent) + top.num + top.marker + " " + rest
            // the head's text opens the item's paragraph — a following
            // setext underline joins it (r14) — unless the rest is
            // itself block-syntax-shaped (then the item's first block is
            // not a paragraph and an underline cannot apply)
            if (rest.trim.nonEmpty && !blockShapedText(rest))
              paraOpen(top, rest,
                headPrefix = (" " * top.outIndent) + top.num + top.marker + " ")
        }
      case BItem(ind, rest) =>
        flushQuotes()
        paraReset()
        levelFor(colWidth(ind), bullet = true, "", "-") match {
          case None => return None
          case Some(top) =>
            outBlockMin = math.min(outBlockMin, top.outContentCol)
            // re-indenting can COMPLETE thematic-break (or, r13,
            // table-separator) syntax the grouper's own bullet guard
            // never saw ("\t* --" rendered at column 2 becomes "  - --",
            // a valid break) — apply the same collision escape here
            // (deep-fuzz r12/r13 finds)
            val line = (" " * top.outIndent) + "- " + rest
            val collided = HrRe.matches(line) || isSep(line)
            out += (if (collided) (" " * top.outIndent) + "- \\" + rest else line)
            if (!collided && rest.trim.nonEmpty && !blockShapedText(rest))
              paraOpen(top, rest, headPrefix = (" " * top.outIndent) + "- ")
        }
      case Cont(raw) =>
        if (stack.isEmpty) return None
        val lead = leadWs(raw)
        val w = colWidth(lead)
        val text = raw.substring(lead.length)
        // R8h (round 13): a RAW quote-marker line at an open level's
        // content column is a blockquote INSIDE that item — deeper
        // levels close (block syntax is never lazy), the line renders
        // at the level's output content column with its markers
        // normalized per R15's per-line rule. The quoted CONTENT is not
        // re-formatted (divergence: mdformat recurses into item-nested
        // quotes; this engine's quote recursion covers top-level
        // containers). Escaped spellings ("\> x") stay on the bail path
        // below: the escape pass DECODES unnecessary escapes, so a
        // rendered form must never sit one decode away from a marker.
        if (text.startsWith(">")) {
          if (w < stack.head.contentCol) return None // interrupts the list
          while (stack.length > 1 && w < stack.last.contentCol)
            stack.dropRightInPlace(1)
          val top = stack.last
          if (w - top.contentCol >= 4) return None // indented-code bytes
          // a rendered column of 4+ stays paragraph content next pass
          // (isQuoteLine caps at 3 spaces); at <= 3 the grouper's R8h
          // guard reclaims it via a same-block item at or below that
          // column, or — r14 LOOSE — via the run-level defer at exactly
          // column 3 while the run holds together; otherwise it would
          // mint a quote CONTAINER there next pass, so bail byte-stable
          if (top.outContentCol < 4 && outBlockMin > top.outContentCol &&
              !looseReclaim(top.outContentCol))
            return None
          paraReset() // a quote block closes the item's open paragraph
          // buffer into the current quote GROUP; a column change closes
          // the group (different attach level = a different blockquote)
          if (qCol >= 0 && qCol != top.outContentCol) flushQuotes()
          qCol = top.outContentCol
          qPend += text
        } else if (quoteDepth > 0 &&
            (HeadingRe.matches(text) || EmptyHeadingRe.matches(text) ||
              (HrRe.matches(text) && !text.contains('-')))) {
          flushQuotes()
          // R8h (round 13): a HEADING or a '*'/'_' THEMATIC BREAK at an
          // open level's content column is a block INSIDE that item —
          // deeper levels close (block syntax is never lazy), and the
          // line renders at the level's output content column through a
          // one-line recursion (canonical heading spacing/escapes, the
          // 70-underscore break), escape-exempt like recursed quotes.
          // Dash runs stay on the conservative path (setext-ambiguous
          // inside an item); so do escaped/entity spellings (the
          // blockShapedText bail below, both spellings, both passes).
          if (w < stack.head.contentCol) return None // interrupts the list
          while (stack.length > 1 && w < stack.last.contentCol)
            stack.dropRightInPlace(1)
          val top = stack.last
          if (w - top.contentCol >= 4) return None // indented-code bytes
          val outCol = top.outContentCol
          // same reclaim rule as quotes: a same-block item at or below
          // the column, or — r14 LOOSE — the run-level defer at exactly
          // column 3 (headings/breaks match at <= 3 columns of indent;
          // deeper ones reach the paragraph path on their own in tight
          // blocks, but read as indented CODE at a loose block start).
          // The same-block reclaim ALSO requires a stable run (late-r14
          // sweep find, latent since r13): the next pass renumbers this
          // block only if every rendered block head re-enters the run —
          // a continuation head re-indented to a bullet's 2-column
          // content col breaks it, the block then skips renumbering,
          // and a rendered 70-underscore break would be escaped as
          // emphasis markers by the plain text pass (a flip)
          if (outCol < 4 && !((outBlockMin <= outCol && blockRenumbered) ||
              looseReclaim(outCol))) return None
          paraReset() // a heading/break block closes the open paragraph
          val one = normalizeCore(Vector(text), quoteDepth - 1)
            .split("\n", -1).toVector
          if (one.length != 1) return None // not representable 1:1
          outEx((" " * outCol) + one.head)
        } else if (SetextH1Re.matches(text) || SetextH2Re.matches(text)) {
          flushQuotes()
          // r14: SETEXT-SHAPED lines in item content resolve the way
          // mdformat reads them instead of bailing the run:
          //  - at/beyond the open paragraph's content column, a '='/'-'
          //    run is that paragraph's SETEXT UNDERLINE — the paragraph
          //    (the item head's own text and its continuations) JOINS
          //    into one ATX line, softbreaks becoming spaces (the
          //    top-level multi-line setext rule), merged into the head
          //    line itself when the paragraph starts there ("1. title /
          //    --- " -> "1. ## title");
          //  - with NO open paragraph, a 3+ dash run is a THEMATIC
          //    BREAK in the item (the existing '*'/'_' rule's missing
          //    dash case) and a '=' run is plain TEXT (no block
          //    meaning of its own).
          // Bare '-'/'--' with no open paragraph stays on the
          // conservative bail path (an empty-bullet/plain-text
          // ambiguity this renderer does not model).
          if (stack.isEmpty) return None
          val isBreakShape = HrRe.matches(text) // pure 3+ dash run here
          // mirror the plain-continuation attach rule: intermediate
          // columns close deeper levels
          if (w >= stack.head.contentCol)
            while (stack.length > 1 && w < stack.last.contentCol)
              stack.dropRightInPlace(1)
          val top = stack.last
          val paraHere = paraLevel != null && (paraLevel eq top) && paraIdx.nonEmpty
          if (w < top.contentCol) {
            // LAZY setext shape (r15): a setext underline can never be a
            // lazy continuation line (CommonMark), so a lazy '=' run with
            // an open paragraph is ABSORBED as that paragraph's text —
            // rendered at the content column in its ESCAPED spelling
            // ("\===": the raw bytes there WOULD be an underline next
            // pass, and the escape pass keeps a decoded line-start '='
            // run escaped, so one spelling is canonical in both passes).
            // A lazy '-' run is NOT absorbed (it closes the paragraph as
            // a top-level block outside the list) and stays byte-stable.
            if (SetextH1Re.matches(text) && paraHere) {
              out += (" " * top.outContentCol) + "\\" + text
              paraAppend("\\" + text)
            } else return None
          } else if (w - top.contentCol >= 4)
            return None // indented-code bytes
          else if (paraHere) {
            // the underline JOINS the open paragraph into an ATX heading
            val hashes = if (SetextH1Re.matches(text)) "#" else "##"
            val content = paraTexts.map(_.trim).mkString(" ")
            // POPPING the paragraph changes line adjacency in BOTH
            // directions, and a pipe-bearing heading is table-hazardous
            // either way: landing after a rendered table row it joins
            // the next pass's row slurp as a DATA ROW, and landing
            // before a separator-shaped line it becomes a table HEAD
            // ("1. |\n   -\n-|" -> "1. ## |\n   -|") — both fuzz r14
            // finds. Not representable; bail byte-stable.
            if (content.contains("|")) return None
            val at = paraIdx.head
            if (paraHeadPrefix != null) {
              // merged into the item head: a plain NON-exempt line. The
              // next pass reads it as an ordinary item rest, so its
              // escaping must run in the same item-rest context BOTH
              // passes — an exempt pre-escaped line here would exclude
              // its emphasis markers from the block's delimiter
              // matching in this pass only, flipping a neighbor's
              // escape next pass (fuzz r14 find).
              outLines.takeInPlace(at)
              outExempt.takeInPlace(at)
              out += paraHeadPrefix + hashes + " " + content
            } else {
              // standalone heading line: one-line recursion, exempt —
              // exactly the R8h heading branch's treatment, which is
              // also how the NEXT pass will re-render this line, so
              // the escape segmentation stays identical across passes
              if (quoteDepth <= 0) return None
              if (top.outContentCol < 4 && outBlockMin > top.outContentCol &&
                  !looseReclaim(top.outContentCol))
                return None // next-pass reclaim gate (tight or r14 loose)
              val one = normalizeCore(Vector(s"$hashes $content"), quoteDepth - 1)
                .split("\n", -1).toVector
              if (one.length != 1) return None // not representable
              if (one.head.contains("|")) return None // table hazard (above)
              outLines.takeInPlace(at)
              outExempt.takeInPlace(at)
              outEx((" " * top.outContentCol) + one.head)
            }
            paraReset()
          } else if (isBreakShape) {
            // dash thematic break inside the item — the heading/'*'/'_'
            // branch's exact gates and one-line recursion
            if (w < stack.head.contentCol) return None // interrupts the list
            if (quoteDepth <= 0) return None
            val outCol = top.outContentCol
            // same-block reclaim requires a stable run, like the
            // heading/'*'/'_' branch (the HrOut bytes flip otherwise)
            if (outCol < 4 && !((outBlockMin <= outCol && blockRenumbered) ||
                looseReclaim(outCol))) return None
            paraReset()
            val one = normalizeCore(Vector(text), quoteDepth - 1)
              .split("\n", -1).toVector
            if (one.length != 1) return None
            outEx((" " * outCol) + one.head)
          } else if (SetextH1Re.matches(text)) {
            // '=' run with no paragraph to underline: plain text — it
            // opens the item's next paragraph (a later underline may
            // join IT: "=== / ---" is setext h2 of the text "===").
            // ONLY with an item line in the current output block: in an
            // item-less continuation block a <=3-column '=' run would be
            // claimed by the next pass's TOP-LEVEL setext branch as the
            // indented paragraph's underline (fuzz r14 find — a
            // tab-indented "=" rendered as spaces flipped the whole
            // block into "# ..."), so those bail byte-stable
            if (top.outContentCol <= 3 && outBlockMin == Int.MaxValue)
              return None
            out += (" " * top.outContentCol) + text
            paraOpen(top, text)
          } else {
            // bare '-'/'--' with NO open paragraph (r15 — the r14
            // empty-item bail, resolved): a lone '-' is an EMPTY nested
            // bullet item (CommonMark: a list marker needs no content —
            // it opens a level at the parent's content column and
            // renders bare), and '--' (or any longer dash run HrRe
            // rejected) is plain TEXT opening the item's next paragraph
            // (it cannot be an underline with no paragraph, a break
            // needs 3+ dashes, and a marker needs a following space).
            // Both ONLY with a same-block item above: in an item-less
            // block the next pass's top-level setext branch would claim
            // the rendered dash run as the indented paragraph's
            // underline (the '='-run branch's exact hazard).
            if (outBlockMin == Int.MaxValue) return None
            if (text == "-") {
              levelFor(w, bullet = true, "", "-") match {
                case None => return None
                case Some(lv) =>
                  // no trailing space (trailing whitespace strips), no
                  // outBlockMin update (the next pass's grouper sees no
                  // item-content column in a bare marker), no paragraph
                  out += (" " * lv.outIndent) + "-"
                  paraReset()
              }
            } else {
              out += (" " * top.outContentCol) + text
              paraOpen(top, text)
            }
          }
        } else {
          flushQuotes()
          // RAW block-syntax-shaped content that no branch above claimed
          // (unclosed/under-indented fences, depth-0 headings/breaks) is
          // beyond this grouper's container model — and re-indenting it
          // could even CHANGE its block reading ("    >" stripped to
          // "   >" becomes a quote marker, the fuzz-found r12 case) —
          // so the run passes through byte-stable.
          def shapedOn(t: String): Boolean =
            isQuoteLine(t) || HeadingRe.matches(t) || EmptyHeadingRe.matches(t) ||
              FenceRe.matches(t) || HrRe.matches(t) ||
              SetextH1Re.matches(t) || SetextH2Re.matches(t)
          if (shapedOn(text)) return None
          val dec = unescapePunct(text)
          // an escaped/entity spelling of a '*'/'_' thematic break: its
          // render gates below must mirror the RAW break branch's exactly
          val decBreak = HrRe.matches(dec) && !dec.contains('-')
          if (shapedOn(dec)) {
            // An ESCAPED or ENTITY spelling of block syntax is plain
            // TEXT (r14): mdformat renders "\> q" / "&#62; q" / "\# h" /
            // "\-\-\-" at the content column with the escape kept (the
            // escape pass keeps line-start spellings escape-necessary
            // and re-spells entities to backslashes — both passes then
            // classify the same bytes the same way). QUOTE, HEADING,
            // SETEXT/DASH — and, r15, '*'/'_' BREAK — spellings render;
            // FENCE spellings STAY on the bail path. The asymmetry is
            // bail-convergence: the escape pass rewrites the RAW shapes
            // into their escaped spellings inside a bailed block ("```"
            // -> "\`\`\`", "***" -> "\*\*\*"), so an escaped spelling
            // may be one pass downstream of a raw bail and must take
            // the SAME branch that raw line took (the r12 fuzz class
            // the old spelling-insensitive bail existed to prevent).
            // For '*'/'_' breaks the raw branch's bail conditions are
            // its reclaim gates — mirrored below once the attach level
            // is known — so the escaped spelling can render as text
            // wherever the raw shape renders as a break, and bails
            // byte-stable wherever the raw shape bailed. An unclaimed
            // raw FENCE bails unconditionally (no gate to mirror), so
            // its escaped spelling must keep bailing too.
            val renderableSpelling =
              !FenceRe.matches(dec) &&
                (isQuoteLine(dec) ||
                  ((HeadingRe.matches(dec) || EmptyHeadingRe.matches(dec) ||
                    decBreak) && quoteDepth > 0) ||
                  SetextH1Re.matches(dec) || SetextH2Re.matches(dec))
            if (!renderableSpelling) return None
            // the raw '*'/'_' break branch bails on a list-interrupting
            // indent — mirror it (its column gates follow the attach)
            if (decBreak && w < stack.head.contentCol) return None
          }
          // a separator-SHAPED continuation right under a pipe-bearing
          // rendered line would form a TABLE HEAD next pass when the
          // pair's rendered indents escape the grouper's item-content
          // guard (fuzz-found: a marker-switched item head de-indented
          // to column 0 under a paraItemMin-2 block, turning "5. |" +
          // "-|" into a claimed table) — not representable 1:1, so the
          // run passes through byte-stable
          if (isSep(text) && outLines.length > blockStart &&
              outLines.last.contains("|")) return None
          // a continuation at an outer content column closes deeper
          // levels — but a LAZY (under-everything) line continues the
          // DEEPEST open item's paragraph (CommonMark laziness), so
          // levels only close when the line reaches SOME shallower
          // level's content column
          val popped = scala.collection.mutable.ArrayBuffer.empty[Level]
          if (w >= stack.head.contentCol)
            while (stack.length > 1 && w < stack.last.contentCol) {
              popped += stack.last
              stack.dropRightInPlace(1)
            }
          val top = stack.last
          val outCol = top.outContentCol
          // r15: the escaped-break render's remaining raw-branch gate
          // mirrors (the raw shape bails on these, so its escape-pass
          // respelling must land on the same branch next pass)
          if (decBreak && (quoteDepth <= 0 || w - top.contentCol >= 4 ||
              (outCol < 4 && !((outBlockMin <= outCol && blockRenumbered) ||
                looseReclaim(outCol)))))
            return None
          // r14: plain lines continue (or open) the item's paragraph —
          // the state a later setext underline joins against. An
          // escaped-BREAK text line (r15) deliberately does NOT open or
          // continue a paragraph: its raw spelling renders as a break
          // (paragraph-closing), and a whole-run bail turns raw into
          // escaped via the emphasis escapes — so the paragraph state a
          // later lazy setext consults must match across the two
          // spellings or the bail flips one pass downstream (fuzz-found
          // "- b\n\t___\n=" class; divergence: mdformat would let a
          // following paragraph join the escaped break's line).
          def trackPara(): Unit =
            if (decBreak) paraReset()
            else if (paraLevel != null && (paraLevel eq top) && paraIdx.nonEmpty)
              paraAppend(text)
            else paraOpen(top, text)
          // a plain line re-indented to >= 4 columns AT ITS BLOCK START
          // would read as an INDENTED CODE block next pass (the grouper
          // only keeps 4+-column lines in a paragraph when the block
          // already has content above them) — the run is unrepresentable,
          // pass through byte-stable. Latent since r12's lazy re-indent
          // ("21. a\n\n   |\n1. a" re-indented the lazy '|' to the wide
          // marker's column-4 content col); surfaced by the r14 fuzz mix.
          // r15 EXCEPTION: within [runItemMin, runItemMin + 4) columns of
          // a stable run, the next pass's grouper reads the line as the
          // open item's continuation paragraph instead of code
          // (looseContinuationCol — the wide-marker loose continuation),
          // so the render IS representable there.
          if (atBlockStart && outCol >= 4 && w < top.contentCol + 4 &&
              !(nextRunAlive && nextStable != Int.MaxValue &&
                outCol >= nextStable && outCol < nextStable + 4))
            return None
          if (w < top.contentCol) {
            // R8e (round 12): lazy paragraph continuation — mdformat
            // renders it AT the item's content column
            out += (" " * outCol) + text
            trackPara()
          } else {
            val extra = w - top.contentCol
            if (extra >= 4) {
              // indented code inside the item: relative offset preserved
              // so it stays code — UNLESS the preserved offset would
              // reach a level this dedent just closed: that level
              // renders NARROWER than its input indent, so in output
              // coordinates the code line would re-attach to it and
              // re-classify next pass (deep-fuzz r12 find) — not
              // representable, pass the run through byte-stable
              if (popped.exists(p => p.outContentCol <= outCol + extra))
                return None
              out += (" " * (outCol + extra)) + text
              paraReset() // a code line is not underline-able paragraph text
            } else {
              // < 4 extra: paragraph continuation, renders AT the column
              out += (" " * outCol) + text
              trackPara()
            }
          }
        }
    }
    flushQuotes()
    val lastLen = outLines.length - blockStart
    if (!simCloseBlock(lastLen)) return None
    blockLens += lastLen
    Some((outLines.toVector, outExempt.toVector, blockLens.toVector))
  }

  /** R9-R14: the text-token escape pass ([[MdTextEscapes]]) over a whole
    * block, so links and emphasis spanning a soft line break stay whole.
    * Idempotent (every emitted escape re-enters as an escape sequence). */
  private def escapeTextBlock(s: String): Vector[String] =
    MdTextEscapes.render(s).split("\n", -1).toVector

  /** Cell split on UNESCAPED pipes only — markdown-it's escapedSplit: a
    * backslash escapes the next char, so "\|" is literal cell content
    * while "\\|" splits. The old escape-blind split/stripSuffix mangled
    * a row whose only pipe is escaped ("- \|" became a cell holding a
    * bare trailing backslash, which the next pass's escape pass then
    * doubled — a late-r14 sweep find, latent since the r13 row slurp
    * began consuming such lines the way markdown-it does). One leading/
    * trailing UNESCAPED boundary pipe drops, as before. */
  private def cells(row: String): Vector[String] = {
    val t = row.trim
    val parts = Vector.newBuilder[String]
    val sb = new StringBuilder
    var i = 0
    var esc = false
    while (i < t.length) {
      val c = t.charAt(i)
      if (esc) { sb += c; esc = false }
      else if (c == '\\') { sb += c; esc = true }
      else if (c == '|') { parts += sb.result(); sb.clear() }
      else sb += c
      i += 1
    }
    parts += sb.result()
    var all = parts.result()
    if (t.startsWith("|") && all.nonEmpty) all = all.tail
    // only an UNESCAPED trailing pipe can produce an empty final part
    // (an escaped one stays inside its cell, making it non-empty), so
    // empty-last + '|'-last means the boundary split — drop it. t.length
    // > 1 keeps a lone "|" one empty cell (its single char is the
    // leading boundary, already consumed), matching the old
    // stripPrefix-then-stripSuffix sequencing.
    if (t.endsWith("|") && t.length > 1 && all.nonEmpty && all.last.isEmpty)
      all = all.init
    all.map(_.trim)
  }

  /** Re-render one pipe table (header, sep, rows) with aligned columns. */
  private def renderTable(header: String, sep: String, rows: Vector[String]): Vector[String] = {
    val hc = cells(header)
    val n = hc.length
    val sc = cells(sep).padTo(n, "---").take(n)
    val rc = rows.map(r => cells(r).padTo(n, "").take(n))
    // mdformat-tables: the delimiter row participates in the width max as a
    // plain cell string, so an over-wide separator is preserved, never shrunk
    val widths = (0 until n).map { i =>
      math.max(3, (hc(i).length +: sc(i).length +: rc.map(_(i).length)).max)
    }
    def fmtRow(cs: Vector[String]): String =
      cs.zip(widths).map { case (c, w) => c.padTo(w, ' ') }
        .mkString("| ", " | ", " |")
    val fmtSep = sc.zip(widths).map { case (c, w) =>
      val left = c.startsWith(":")
      val right = c.endsWith(":") && c.length > 1
      val dashes = w - (if (left) 1 else 0) - (if (right) 1 else 0)
      (if (left) ":" else "") + ("-" * dashes) + (if (right) ":" else "")
    }.mkString("| ", " | ", " |")
    (fmtRow(hc) +: fmtSep +: rc.map(fmtRow)).toVector
  }

  /** mdformat's `--wrap` modes (r14): [[Wrap.Keep]] preserves source
    * soft line breaks (mdformat's default — every oracle and fixture
    * runs this), [[Wrap.No]] joins each paragraph's lines into one,
    * [[Wrap.Width]] greedily re-fills at the given column. Wrapping
    * applies to top-level paragraph blocks, to QUOTE content through
    * the container recursion (the fill width shrinks by the "> "
    * marker per nesting level, mdformat's indent accounting —
    * [[innerWrap]]), and to simple LIST blocks per item at the
    * content column ([[wrapListBlock]]), to a loose run's
    * three-column continuation paragraph blocks
    * ([[wrapIndentedParagraph]]), and to ITEM-NESTED quote content
    * (the flushQuotes recursion threads the mode, width reduced by
    * the rendered column plus the marker). Paragraphs in shapes
    * beyond those — bullet-level (two-column) continuations, nested
    * list levels, blocks carrying fence regions — keep source breaks
    * (documented divergence; mdformat re-wraps those too).
    * Wrapped blocks render through the escape+re-fill fixpoint loop
    * ([[wrapAndEscape]]); a break is refused before a word whose
    * decoded form would start block syntax at its new line start, and
    * a re-fill that would COMPLETE block syntax ("*" joining "a" into
    * a bullet) reverts to source breaks — keeping one application a
    * fixpoint under the same mode. */
  sealed trait Wrap
  object Wrap {
    case object Keep extends Wrap
    case object No extends Wrap
    final case class Width(columns: Int) extends Wrap {
      require(columns >= 1, "Wrap.Width: columns must be positive")
    }
  }

  /** Canonicalize a markdown string per the rule list above. */
  def normalize(md: String): String = normalize(md, Wrap.Keep)

  /** [[normalize]] with a [[Wrap]] mode (mdformat `--wrap`). */
  def normalize(md: String, wrap: Wrap): String = {
    // leading whitespace is pre-stripped: the trailing .strip() (R7)
    // erases it from the OUTPUT anyway, so parsing the input as if it
    // were already gone makes one pass convergent — otherwise a leading
    // indented line ("    # h") would render verbatim, lose its indent
    // to the strip, and parse as different block syntax next time
    val lines = md.stripLeading().replace("\r\n", "\n").replace("\r", "\n")
      .split("\n", -1).toVector.map(l => TrailWs.matcher(l).replaceAll(""))
    normalizeCore(lines, wrap = wrap).strip()
  }

  /** The --wrap rendering of one text block: iterate escape -> re-fill
    * until the block is a FIXPOINT of both (the escape pass's spelling
    * depends on line geometry, and the fill's break points depend on
    * the spelled byte lengths — each feeds the other, so a single
    * ordering of the two passes is not stable under re-normalization;
    * the loop converges in 1-2 iterations in practice). The emitted
    * block is escape-canonical AND fill-stable, so the next pass's
    * identical loop reproduces it byte-for-byte. If the cap is hit
    * (a pathological escape/fill oscillation), fall back to the
    * UN-wrapped canonical escape of the source lines — also a fixpoint,
    * because the next pass's loop runs the same iteration sequence from
    * an escape-equivalent start and hits the same cap. */
  private def wrapAndEscape(b: Vector[String], wrap: Wrap,
                            cleanRenumber: Boolean = true): Vector[String] = {
    var x = b
    var k = 0
    while (k < 5) {
      val y = escapeTextBlock(x.mkString("\n"))
      val z = wrapTextBlock(y, wrap, cleanRenumber)
      if (z == y) return y
      x = z
      k += 1
    }
    escapeTextBlock(b.mkString("\n"))
  }

  /** Re-fill one escape-canonical paragraph block per `wrap` (the
    * [[wrapAndEscape]] loop body). Eligibility is conservative:
    * flush-left, non-empty, marker-free, pipe-free lines with no
    * trailing-backslash hard breaks — everything else (list runs,
    * passed-through continuations, hard breaks, table-adjacent text)
    * keeps its source breaks. */
  private def wrapParagraph(b: Vector[String], wrap: Wrap): Vector[String] = {
    val eligible = b.nonEmpty && b.forall { l =>
      l.nonEmpty && !l.charAt(0).isWhitespace && !l.endsWith("\\") &&
        !l.contains("|") && !OrderedItemRe.matches(l) && !BulletRe.matches(l)
    }
    if (!eligible) return b
    // split on ANY whitespace run: a mid-line tab kept inside a "word"
    // would land at a re-filled line end, where the next pass's
    // trailing-whitespace strip changes the word sequence (fuzz r14)
    val words = b.flatMap(_.split("\\s+")).filter(_.nonEmpty)
    if (words.isEmpty) return b
    def checked(out: Vector[String]): Vector[String] =
      if (out.exists(mintsBlock)) b else out
    wrap match {
      case Wrap.Keep => b
      case Wrap.No => checked(Vector(words.mkString(" ")))
      case Wrap.Width(cols) => checked(fillWords(words, cols))
    }
  }

  /** Re-filling can COMPLETE block syntax a source break kept apart
    * ("*" + "a" joins to the bullet "* a"; "-" + a word to "- x";
    * "#" + a word to a heading) — if any re-filled line would parse
    * as a block start, in either spelling, the caller keeps the source
    * breaks (fuzz r14 finds). Deterministic, so both passes agree. */
  private def mintsBlock(l: String): Boolean = {
    def on(t: String): Boolean =
      BulletRe.matches(t) || OrderedItemRe.matches(t) || HrRe.matches(t) ||
        HeadingRe.matches(t) || EmptyHeadingRe.matches(t) ||
        FenceRe.matches(t) || SetextH1Re.matches(t) ||
        SetextH2Re.matches(t) || isSep(t) || isQuoteLine(t)
    on(l) || on(unescapePunct(l))
  }

  /** Greedy fill of a word sequence to `cols` columns. A word whose
    * decoded form would start block syntax must not open a line — the
    * next pass would re-parse the paragraph — so the break before it is
    * refused and the line runs long instead. */
  private def fillWords(words: Vector[String], cols: Int): Vector[String] = {
    def hazardStart(word: String): Boolean = {
      val w0 = unescapePunct(word)
      w0 == "-" || w0 == "*" || w0 == "+" || w0.startsWith("#") ||
        w0.startsWith(">") || w0.startsWith("```") || w0.startsWith("~~~") ||
        w0.matches("\\d{1,9}[.)]") || w0.matches("[-=_*]+") ||
        w0.startsWith("    ")
    }
    val out = Vector.newBuilder[String]
    val line = new StringBuilder
    var lineLen = 0
    for (word <- words) {
      val wl = word.length
      if (lineLen == 0) { line ++= word; lineLen = wl }
      else if (lineLen + 1 + wl <= cols) {
        line += ' '; line ++= word; lineLen += 1 + wl
      } else if (hazardStart(word)) {
        line += ' '; line ++= word; lineLen += 1 + wl
      } else {
        out += line.result(); line.clear(); lineLen = 0
        line ++= word; lineLen = wl
      }
    }
    if (lineLen > 0) out += line.result()
    out.result()
  }

  /** The wrap mode a nested container's INNER document re-fills under:
    * the fill width shrinks by the container's marker width — mdformat
    * reduces the paragraph fill width by the accumulated container
    * indent (quote markers, list content columns) so the RENDERED line
    * including the prefix targets the requested width — clamped at one
    * column; `no` and `keep` pass through unchanged. */
  private def innerWrap(wrap: Wrap, marker: Int): Wrap = wrap match {
    case Wrap.Width(c) => Wrap.Width(math.max(1, c - marker))
    case w             => w
  }

  /** `--wrap` inside a LIST block (r14, nested levels r15): re-fill
    * each item's paragraph content at the item's content column — the
    * first filled line carries the marker, the rest indent to the
    * content column, and the fill width shrinks by that column
    * ([[innerWrap]]). NESTED levels (r15) fill at their own deeper
    * content columns via a level stack mirroring the renumberer's
    * attach rules (sibling at the level's indent, nested at the
    * parent's content column, marker-kind switch restarts the level's
    * list); a continuation at an OUTER level's column after a nested
    * item is its own paragraph unit (merging it into the outer item's
    * head words would move text across the nested item), and an item
    * whose rest is block-shaped (a heading, a break spelling) emits
    * verbatim and opens no fillable paragraph (r15 — the r14 code
    * merged continuation words into such heads). Eligibility is
    * strict: renumber-canonical geometry only — exactly one space
    * after each marker, ordered siblings carrying the run's first
    * number, space-only indents landing exactly on open content
    * columns, plain-shaped text in both spellings — anything else
    * keeps its source breaks via None. The block must ALREADY be
    * renumber-canonical (the cleanRenumber gate in the dispatcher): a
    * block whose renumber BAILED must not be re-filled, because the
    * fill would change the very geometry the bail depended on
    * (deep-sweep find: "5. b\n10. a\nb\n11. a" joined pass 1,
    * renumbered to 5/5/5 pass 2). The produced geometry is exactly
    * what the next pass's renumberer re-derives, so one application is
    * a fixpoint. */
  private def wrapListBlock(b: Vector[String], wrap: Wrap): Option[Vector[String]] = {
    if (b.isEmpty) return None
    // output units: an item head + fillable words (prefix = marker), a
    // paragraph at a column (prefix = spaces), or a verbatim FIXED line
    final case class U(prefix: String, col: Int,
                       words: scala.collection.mutable.ArrayBuffer[String],
                       fixed: String)
    val units = scala.collection.mutable.ArrayBuffer.empty[U]
    // open level stack: the level's own indent, its content column, and
    // the marker string of its current same-kind run
    final case class Lv(indent: Int, var col: Int, var marker: String)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Lv]
    var open = false // the last unit accepts continuation words
    def splitWords(s: String) = s.split("\\s+").filter(_.nonEmpty)
    for (l <- b) {
      if (l.isEmpty || l.contains("|") || l.endsWith("\\")) return None
      val lead = leadWs(l)
      if (lead.exists(_ != ' ')) return None
      val w = lead.length
      val headCol = itemContentCol(l)
      if (headCol >= 0) {
        val mk = l.substring(w, headCol)
        // canonical head shape only: marker + ONE space + content
        if (!mk.endsWith(" ") || mk.dropRight(1).endsWith(" ")) return None
        val head = mk.dropRight(1)
        if (head == "*" || head == "+") return None // canonical bullet is "-"
        while (stack.nonEmpty && w < stack.last.indent)
          stack.dropRightInPlace(1)
        if (stack.isEmpty) {
          if (w != 0) return None
          stack += Lv(0, headCol, head)
        } else if (w == stack.last.indent) {
          val lv = stack.last
          if (head != lv.marker) {
            if (head.last == lv.marker.last &&
                head.head.isDigit && lv.marker.head.isDigit)
              return None // same delimiter, different number: renumber bailed
            // marker kind/delimiter switch: a NEW list at this level
            lv.marker = head
            lv.col = headCol
          }
        } else if (w == stack.last.col) {
          stack += Lv(w, headCol, head)
        } else return None // non-canonical head indent
        val rest = l.substring(headCol)
        if (rest.isEmpty || rest.charAt(0).isWhitespace) return None
        if (blockShapedText(rest) || mintsBlock(rest) ||
            itemContentCol(rest) >= 0 || isSep(rest)) {
          // block-shaped rest: the item's first block is not a
          // paragraph — emit verbatim, open nothing
          units += U(null, -1, null, l)
          open = false
        } else {
          units += U(l.substring(0, headCol), headCol,
            scala.collection.mutable.ArrayBuffer(splitWords(rest): _*), null)
          open = true
        }
      } else {
        // continuation: must land exactly on an open level's content
        // column (an outer column closes deeper levels, as in the
        // renumberer)
        while (stack.nonEmpty && w < stack.last.col)
          stack.dropRightInPlace(1)
        if (stack.isEmpty || w != stack.last.col) return None
        val t = l.substring(w)
        if (t.isEmpty || t.charAt(0).isWhitespace) return None
        if (blockShapedText(t) || itemContentCol(t) >= 0 || isSep(t) ||
            mintsBlock(t)) return None
        if (open && units.last.col == w)
          units.last.words ++= splitWords(t)
        else {
          units += U(" " * w, w,
            scala.collection.mutable.ArrayBuffer(splitWords(t): _*), null)
          open = true
        }
      }
    }
    if (units.isEmpty) return None
    // a re-filled HEAD line can complete NON-item block syntax: "- " +
    // a leading "--" reads as the thematic break "- --" next pass, and
    // a joined "- " + "-" + "-" as "- - -" (deep-sweep r14 find via the
    // quote-inner wrap). The head must still be ONLY an item head, in
    // both spellings.
    def headHazard(h: String): Boolean = {
      def on(t: String): Boolean =
        HrRe.matches(t) || isSep(t) ||
          SetextH1Re.matches(t) || SetextH2Re.matches(t)
      on(h) || on(unescapePunct(h))
    }
    val out = Vector.newBuilder[String]
    for (u <- units) {
      if (u.fixed != null) out += u.fixed
      else {
        val ws = u.words.toVector
        val isPara = u.prefix.forall(_ == ' ')
        // a paragraph unit's first filled line must stay plain too (an
        // item head's first line is covered by headHazard instead)
        def paraMints(t: String): Boolean =
          isPara && (mintsBlock(t) || blockShapedText(t))
        wrap match {
          case Wrap.Keep => return None
          case Wrap.No =>
            val joined = ws.mkString(" ")
            if (headHazard(u.prefix + joined) || paraMints(joined)) return None
            out += u.prefix + joined
          case Wrap.Width(c) =>
            val filled = fillWords(ws, math.max(1, c - u.col))
            // a filled continuation must stay plain in both spellings —
            // else the next pass reads different block structure
            if (filled.tail.exists(t => mintsBlock(t) || blockShapedText(t)))
              return None
            if (paraMints(filled.head)) return None
            val h = u.prefix + filled.head
            if (!isPara && headHazard(h)) return None
            out += h
            filled.tail.foreach(t => out += (" " * u.col) + t)
        }
      }
    }
    Some(out.result())
  }

  /** `--wrap` for a loose run's continuation PARAGRAPH block: every
    * line indented exactly N >= 2 spaces (r15 — previously exactly 3;
    * the loose-column generalization gives bullet-level 2-column and
    * wide-marker 4+-column continuation blocks the same treatment, and
    * any 4+-column TEXT block can only have come from the renderer's
    * loose-continuation path — orphan 4+-column blocks are indented
    * code and never text) with plain content in both spellings.
    * Re-fills at the column with the fill width reduced by it, like
    * the list fill; the renumberer has already re-indented the block
    * to its output column, and the filled lines keep it, so the next
    * pass re-forms the same run and re-derives the same fill. */
  private def wrapIndentedParagraph(b: Vector[String], wrap: Wrap): Vector[String] = {
    if (b.isEmpty) return b
    val n = leadWs(b.head).length
    val eligible = n >= 2 && b.forall { l =>
      l.length > n && l.startsWith(" " * n) && !l.charAt(n).isWhitespace &&
        !l.endsWith("\\") && !l.contains("|") && {
          val t = l.substring(n)
          !(blockShapedText(t) || mintsBlock(t)) && itemContentCol(l) < 0
        }
    }
    if (!eligible) return b
    val words = b.flatMap(_.substring(n).split("\\s+")).filter(_.nonEmpty)
    if (words.isEmpty) return b
    def checked(out: Vector[String]): Vector[String] =
      if (out.exists { l =>
        val t = l.substring(n)
        mintsBlock(t) || blockShapedText(t)
      }) b else out
    val pad = " " * n
    wrap match {
      case Wrap.Keep => b
      case Wrap.No => checked(Vector(pad + words.mkString(" ")))
      case Wrap.Width(c) =>
        checked(fillWords(words, math.max(1, c - n)).map(pad + _))
    }
  }

  /** The `--wrap` dispatcher for one text block: simple list blocks
    * re-fill per item ([[wrapListBlock]]) and three-column loose
    * continuation blocks re-fill at their column
    * ([[wrapIndentedParagraph]]) — both ONLY when the block came out
    * of a clean whole-run renumber (`cleanRenumber`; a bailed run must
    * stay byte-stable or the fill changes the geometry its bail
    * depended on) — and plain paragraph blocks re-fill whole
    * ([[wrapParagraph]]); ineligible shapes keep their source
    * breaks. */
  private def wrapTextBlock(b: Vector[String], wrap: Wrap,
                            cleanRenumber: Boolean): Vector[String] =
    if (b.exists(l => OrderedItemRe.matches(l) || BulletRe.matches(l))) {
      if (cleanRenumber) wrapListBlock(b, wrap).getOrElse(b) else b
    } else if (b.exists(_.startsWith("  "))) {
      if (cleanRenumber) wrapIndentedParagraph(b, wrap) else b
    } else wrapParagraph(b, wrap)

  /** One quote-marker level off a line ('>' + at most one space after
    * ≤3-space indent); content spacing beyond the marker space stays. */
  private def stripOneMarker(l: String): String = {
    var i = 0
    while (i < l.length && i < 3 && l.charAt(i) == ' ') i += 1
    if (i < l.length && l.charAt(i) == '>') {
      val j = i + 1
      if (j < l.length && l.charAt(j) == ' ') l.substring(j + 1) else l.substring(j)
    } else l
  }

  private def isQuoteLine(l: String): Boolean = {
    var i = 0
    while (i < l.length && i < 3 && l.charAt(i) == ' ') i += 1
    i < l.length && l.charAt(i) == '>'
  }

  // CommonMark indented code: >= 4 leading spaces and not a list-item
  // shape (indented list items keep their loose-list reading — this
  // grouper has no container stack, and renumbering them is the less
  // surprising choice for list-heavy corpora)
  private def isIndentedCodeLine(x: String): Boolean =
    (x.startsWith("    ") || x.startsWith("\t")) &&
      !OrderedItemRe.matches(x) && !BulletRe.matches(x)

  /** GFM: a table's body rows run until a blank line or ANOTHER block
    * start — a list item, heading, fence, quote, or break line ends the
    * table even when it contains a pipe (markdown-it's terminator
    * rules). Late-r14 sweep find: a bullet-shaped "- \|" (minted by the
    * bullet branch's separator escape) slurped as a row ERASED the item
    * line the next pass's para item-column state depends on, flipping a
    * following fence's classification. */
  private def tableRowStops(l: String): Boolean =
    itemContentCol(l) >= 0 || HeadingRe.matches(l) || EmptyHeadingRe.matches(l) ||
      FenceRe.matches(l) || isQuoteLine(l) || HrRe.matches(l)

  /** The spelling-insensitive probe for the classifiers below: decode
    * backslash escapes AND character references (the escape pass
    * re-spells "&#62;" as "\>", so a test that saw only one spelling
    * would classify differently across passes — r12 backslash find,
    * r13 entity find). */
  private def unescapePunct(s: String): String =
    MdTextEscapes.decodeSpellings(s)

  /** Block-syntax shapes a list-item continuation line must never be
    * re-indented across (see renumberNested's Right case) — tested on
    * the raw text AND its decoded spelling. */
  private def blockShapedText(text: String): Boolean = {
    def shaped(t: String): Boolean =
      isQuoteLine(t) || HeadingRe.matches(t) || EmptyHeadingRe.matches(t) ||
        FenceRe.matches(t) || HrRe.matches(t) ||
        SetextH1Re.matches(t) || SetextH2Re.matches(t)
    shaped(text) || shaped(unescapePunct(text))
  }

  /** Can doc(at) be a CommonMark LAZY CONTINUATION line — plain paragraph
    * continuation text, no block-start shape? (Block starts — fences,
    * ATX headings, thematic breaks, list items, setext underlines, table
    * heads, deeper quotes — interrupt the paragraph and so close the
    * quote instead of continuing it.) */
  private def lazyShape(doc: Vector[String], at: Int): Boolean = {
    val n = doc(at)
    n.nonEmpty && !isQuoteLine(n) &&
      !(FenceRe.matches(n) || HeadingRe.matches(n) || EmptyHeadingRe.matches(n) ||
        BulletRe.matches(n) || OrderedItemRe.matches(n) || HrRe.matches(n) ||
        SetextH1Re.matches(n) || SetextH2Re.matches(n) ||
        (n.contains("|") && at + 1 < doc.length && isSep(doc(at + 1))))
  }

  /** Does `doc` END with an open paragraph — the CommonMark state that
    * lets a following plain line continue lazily? Mirrors the grouper's
    * own block reading: fences, headings, breaks, list items, tables,
    * and indented code close the paragraph; a setext underline after an
    * open paragraph closes it into a heading; a trailing quote run
    * defers to ITS inner document (recursion, bounded by `depth` like
    * the R15b render recursion). */
  private def endsOpenParagraph(doc: Vector[String], depth: Int): Boolean = {
    if (depth <= 0) return false
    var inFence = false
    var state = 0 // 0 none, 1 paragraph open, 2 other block, 3 quote run
    var qStart = -1
    var idx = 0
    while (idx < doc.length) {
      val l = doc(idx)
      var classified = true
      if (inFence) { if (FenceRe.matches(l)) inFence = false; state = 2; qStart = -1 }
      else if (l.isEmpty) { state = 0; qStart = -1 }
      else if (isQuoteLine(l)) { if (state != 3) qStart = idx; state = 3 }
      else if (state == 3) {
        if (lazyShape(doc, idx) &&
            endsOpenParagraph(doc.slice(qStart, idx).map(stripOneMarker), depth - 1)) {
          // absorbed into the quote container — state stays 3
        } else { state = 0; qStart = -1; classified = false }
      } else classified = false
      if (!classified) {
        if (FenceRe.matches(l)) { inFence = true; state = 2 }
        else if (HeadingRe.matches(l) || EmptyHeadingRe.matches(l) || HrRe.matches(l)) state = 2
        // a LIST ITEM leaves its own paragraph open — CommonMark
        // laziness reaches through the item container, and the inner
        // re-format (R8e) re-indents the lazy line to the item's
        // content column (round 12; was conservative-close)
        else if (BulletRe.matches(l) || OrderedItemRe.matches(l)) state = 1
        else if (l.contains("|") && idx + 1 < doc.length && isSep(doc(idx + 1))) {
          state = 2
          idx += 2
          while (idx < doc.length && doc(idx).contains("|") &&
              !tableRowStops(doc(idx))) idx += 1
          idx -= 1 // the loop's own increment lands on the first non-row
        }
        else if (state != 1 && isIndentedCodeLine(l)) state = 2
        else if (state == 1 && (SetextH1Re.matches(l) || SetextH2Re.matches(l))) state = 2
        else state = 1
      }
      idx += 1
    }
    if (inFence) false
    else if (state == 3)
      endsOpenParagraph(doc.drop(qStart).map(stripOneMarker), depth - 1)
    else state == 1
  }

  /** The grouping + rendering pipeline WITHOUT the outer strips — the
    * recursion target for quoted content (an inner document must keep
    * leading indent: a quote-leading indented code block is real code).
    * `quoteDepth` bounds the R15b recursion: real quote nesting is a
    * handful of levels, while a single adversarial line of thousands of
    * '>' chars would otherwise recurse one stack frame per level and
    * kill the executor with a StackOverflowError (the same budget idea
    * as matchEmphasis's workBudget); past the cap, quote runs take the
    * byte-stable paragraph path. */
  private def normalizeCore(lines: Vector[String], quoteDepth: Int = 32,
                            wrap: Wrap = Wrap.Keep): String = {

    // group lines into blocks; every block renders as its joined lines and
    // blocks are separated by exactly one blank line. Text (paragraph/
    // list) blocks stay RAW here — renumbering must see the whole loose
    // run before indents mean anything, so R8/R8b/R8c and the escape pass
    // run after grouping; non-text blocks (fences, tables, headings) are
    // final as built.
    val blocks = Vector.newBuilder[(Vector[String], Boolean)] // (lines, isText)
    var para = Vector.empty[String] // open paragraph/list run
    // R8h (round 13): minimum content column among the open para's ITEM
    // lines — the gate for claiming indented fences, quote lines,
    // headings, and '*'/'_' breaks (all <= 3 columns of indent by their
    // own syntax) as item content. Mirrors the fenceSpans scanner's
    // state exactly: region content is appended verbatim and never
    // updates it (code bytes are not items).
    var paraItemMin = Int.MaxValue
    // r14: is a LOOSE LIST RUN alive at the current blank-separated block
    // boundary? True after a text block headed by a list item, carried
    // through contish ("   "-led) text blocks and codeish (>= 6-column)
    // riding code blocks, false after everything else — mirroring
    // renumberLoose's own run-formation test, so a line the grouper
    // DEFERS on this signal is guaranteed to reach renumberNested
    // through the run whose level state it needs.
    var runHasItems = false
    // r15: the live run's minimum OUTPUT-STABLE item content column
    // ([[stableHeadCol]]) — the generalization that lets bullet-level
    // (2-column) and wide-marker (4+-column) geometries participate in
    // the loose machinery the ordered 3-column case always had. The
    // grouper's defer/carry thresholds derive from it (a 2-column quote
    // under a bullet run is item content; under an ordered run it
    // interrupts the list), and the renderer mirrors it sequentially
    // from the RENDERED block-head item columns (runStableMinOut), so
    // both passes judge the same line the same way — folding any
    // non-stable column would flip decisions between a pass and its
    // re-parse (three fuzz-found classes: "021. a\n   * c\n\n    .",
    // ">\n - b\n\n  ```\n  ```\n." and "5. b\n\n - a\n\n  p\n_").
    var runItemMinStable = Int.MaxValue
    // the defer/carry indent threshold: a line (or block head) at or
    // beyond this many SPACE columns stays with the run. Capped at 3 —
    // deeper thresholds would exclude the 3-column shapes the ordered
    // machinery relies on — and floored by the run's shallowest stable
    // item content column (2 for bullet-headed runs).
    def runThr: Int =
      if (runItemMinStable == Int.MaxValue) 3
      else math.min(3, runItemMinStable)
    // r14 LOOSE DEFER (r15: threshold generalized from the literal 3 to
    // runThr): an indented block-syntax line opening its own block
    // inside a live loose run is ITEM CONTENT (mdformat renders it at
    // the item's content column) — it stays in the paragraph stream for
    // renumberNested's block-in-item rules instead of hoisting to a
    // column-0 block that would split the list. The loose analog of the
    // tight paraItemMin guards; the renumberer's next-pass-state gates decide
    // whether the rendered column is reclaimable, bailing byte-stable
    // when not.
    def looseDefer(l: String): Boolean =
      runHasItems && colWidth(leadWs(l)) >= runThr &&
        (para.isEmpty ||
          (paraItemMin == Int.MaxValue && para.forall(_.startsWith(" " * runThr))))
    // r15: a blank-separated line whose indent reaches the run's
    // (output-stable) item content column but stays under content + 4 is
    // the open item's CONTINUATION PARAGRAPH per CommonMark, not
    // indented code — the wide-marker ("10. " = 4 columns) and
    // one-to-three-extra-column cases the unconditional >= 4 code claim
    // used to swallow, breaking the run.
    def looseContinuationCol(l: String): Boolean =
      runHasItems && runItemMinStable != Int.MaxValue && {
        val w = colWidth(leadWs(l))
        w >= runItemMinStable && w < runItemMinStable + 4
      }
    def paraAdd(l: String): Unit = {
      val c = itemContentCol(l)
      if (c >= 0) paraItemMin = math.min(paraItemMin, c)
      para = para :+ l
    }
    def closePara(): Unit = {
      if (para.nonEmpty) {
        blocks += ((para, true))
        val h = para.head
        if (OrderedItemRe.matches(h) || BulletRe.matches(h)) {
          if (!runHasItems) runItemMinStable = stableHeadCol(h)
          runHasItems = true
        } else if (!h.startsWith(" " * runThr)) {
          runHasItems = false
          runItemMinStable = Int.MaxValue
        }
        // else: a contish (threshold-indented) block carries the run
        // state through unchanged
        para = Vector.empty
      }
      paraItemMin = Int.MaxValue
    }
    // non-text blocks end the loose run, EXCEPT codeish indented code
    // (>= 6 columns everywhere), which renumberLoose lets ride
    def addBlock(b: Vector[String], keepsRun: Boolean = false): Unit = {
      blocks += ((b, false))
      if (!keepsRun) {
        runHasItems = false
        runItemMinStable = Int.MaxValue
      }
    }
    // R8h opener test: when lines(at) opens an item-nested fenced region
    // of the open para's list, the region's CLOSER index; -1 otherwise
    def fenceRegionEnd(at: Int): Int = {
      val l = lines(at)
      if (para.isEmpty || paraItemMin == Int.MaxValue || l.isEmpty) return -1
      val lead = leadWs(l)
      val w = colWidth(lead)
      if (w < paraItemMin) return -1
      val t = l.substring(lead.length)
      if (!FenceRe.matches(t)) return -1
      val ch = t.charAt(0)
      fenceCloserAt(lines, at, ch, t.takeWhile(_ == ch).length, w)
    }
    var r8hEnd = -1
    def isIndentedCode(x: String): Boolean = isIndentedCodeLine(x)
    // R8b (round 10, nested since round 11, continuations since round
    // 12): LOOSE ordered lists — consecutive text blocks that belong to
    // ONE CommonMark list (items separated by blank lines, including
    // blocks that are a continuation PARAGRAPH of the open item) feed
    // one renumberNested pass (level state carries across the blank
    // lines), then split back into their blocks. Tight single-block
    // lists are runs of length one. A run that fails to parse as a
    // clean items+continuations list falls back to the round-11
    // item-only treatment: its all-item sub-runs renumber, everything
    // else passes through untouched.
    // Output blocks are annotated with a per-line ESCAPE-EXEMPT mask —
    // the escape-time contract (exempt lines splice through the escape
    // pass verbatim: fence-region code bytes, recursively re-formatted
    // quote content). The mask is computed ONCE here, because a LOOSE
    // fence region (round 13) is only derivable with the run's carried
    // item-column state, and quote recursion is only derivable with the
    // renumberer's level stack — an escape-time rescan could see
    // neither.
    // each output block carries (lines, isText, exemptMask, cleanRenumber):
    // cleanRenumber is true only when the block came out of a SUCCESSFUL
    // whole-run renumber (or never entered a run at all) — the r8h
    // pass-through and the item-only fallback emit false, and the --wrap
    // dispatcher must not re-fill list blocks from those paths (the fill
    // would change the geometry the bail depended on, so the next pass's
    // renumber could take a different path — deep-sweep r14 find)
    def renumberLoose(bs: Vector[(Vector[String], Boolean)]): Vector[(Vector[String], Boolean, Vector[Boolean], Boolean)] = {
      def maskFromSpans(len: Int, spans: Vector[(Int, Int)]): Vector[Boolean] = {
        if (spans.isEmpty) return Vector.fill(len)(false)
        val m = Array.fill(len)(false)
        for ((a, b) <- spans; i <- a to b) m(i) = true
        m.toVector
      }
      def orderedish(b: (Vector[String], Boolean)): Boolean =
        b._2 && b._1.nonEmpty &&
          (OrderedItemRe.matches(b._1.head) || BulletRe.matches(b._1.head))
      // a block that could be a loose item's continuation paragraph:
      // starts at or beyond the run's extension threshold — min(3, the
      // shallowest OUTPUT-STABLE item content column seen so far in the
      // run, [[stableHeadCol]]), the renumber-side mirror of the
      // grouper's runThr (r15: previously the literal 3, which excluded
      // bullet-level 2-column blocks)
      def contish(b: (Vector[String], Boolean), thr: Int): Boolean =
        b._2 && b._1.nonEmpty && b._1.head.startsWith(" " * thr)
      // an indented-CODE block rides a loose run VERBATIM (round 13):
      // every non-blank line at >= 6 columns — at or beyond a 2-column
      // bullet's content column + 4 — so items after it keep
      // renumbering with the list instead of restarting. Only indented
      // code qualifies: every other non-text block (headings, tables,
      // quotes, col-0 fences, breaks) renders at column 0.
      def codeish(b: (Vector[String], Boolean)): Boolean =
        !b._2 && b._1.nonEmpty &&
          b._1.forall(x => x.isEmpty || colWidth(leadWs(x)) >= 6)
      def parseLine(l: String): ListLine = l match {
        case OrderedItemRe(ind, nu, m, rest) => OItem(ind, nu, m, rest)
        // a spaced '*' thematic break ("* * *") is bullet-SHAPED; the
        // R8h block-in-item rule must see it as a continuation, never a
        // bullet whose marker would be rewritten (dash runs never reach
        // a paragraph as breaks, so no ambiguity here)
        case hr if HrRe.matches(hr) && !hr.contains('-') => Cont(hr)
        case BulletRe(ind, rest) => BItem(ind, rest)
        case other => Cont(other)
      }
      // R8h: classify each block's item-nested fence regions FIRST, so
      // verbatim code bytes (which may be item-shaped, blank, or
      // block-syntax-shaped) never parse as items or continuations.
      // Spans never cross blocks: the grouper consumed each tight region
      // into one paragraph run wholesale, and a loose region's lines
      // have no internal blanks (or its closer search already failed).
      def parseBlock(ls: Vector[String], spans: Vector[(Int, Int)]): Vector[ListLine] = {
        val out = Vector.newBuilder[ListLine]
        var si = 0
        var i = 0
        while (i < ls.length) {
          if (si < spans.length && spans(si)._1 == i) {
            val (a, b) = spans(si)
            val lead = leadWs(ls(a))
            out += FOpen(lead, ls(a).substring(lead.length))
            (a + 1 until b).foreach(x => out += FBody(ls(x)))
            out += FClose(ls(b).trim)
            i = b + 1
            si += 1
          } else if (ls(i).contains("|") && itemContentCol(ls(i)) < 0 &&
              i + 1 < ls.length && isSep(ls(i + 1)) &&
              (si >= spans.length || i + 1 < spans(si)._1)) {
            // R8h item-nested pipe table: head + separator + data rows
            // (rows stop at the next fence span — regions stay
            // verbatim — and at any other block start, tableRowStops)
            var j = i + 2
            while (j < ls.length && ls(j).contains("|") &&
                !tableRowStops(ls(j)) &&
                (si >= spans.length || j < spans(si)._1)) j += 1
            out += TBlock(leadWs(ls(i)), ls.slice(i, j))
            i = j
          } else { out += parseLine(ls(i)); i += 1 }
        }
        out.result()
      }
      def parse(ls: Vector[(Vector[String], Boolean)],
                spans: Vector[Vector[(Int, Int)]]): Vector[ListLine] =
        ls.zipWithIndex.flatMap { case (b, bi) =>
          // BlockBreak carries the block boundary into renumberNested's
          // R8h safety state; it emits no output line, so emit()'s
          // slicing by block lengths is unaffected. NON-TEXT blocks
          // (riding code) pass line-for-line as Skip — never item/
          // continuation-parsed, never scanned for regions.
          val parsed =
            if (b._2) parseBlock(b._1, spans(bi))
            else b._1.map(Skip(_): ListLine)
          if (bi == 0) parsed else BlockBreak +: parsed
        }
      val out = Vector.newBuilder[(Vector[String], Boolean, Vector[Boolean], Boolean)]
      // per-block slicing by the renderer's OWN output lengths (r14: a
      // setext join shrinks its block, so input lengths no longer apply),
      // carrying the exempt mask alongside the lines
      def emit(run: Seq[(Vector[String], Boolean)],
               lines: Vector[String], mask: Vector[Boolean],
               lens: Vector[Int]): Unit = {
        var off = 0
        run.zip(lens).foreach { case ((_, t), n) =>
          out += ((lines.slice(off, off + n), t, mask.slice(off, off + n), true))
          off += n
        }
      }
      var idx = 0
      // one run through renumbering. A whole-run failure takes the
      // round-11 fallback (renumber maximal all-item sub-runs) — but a
      // byte-CHANGING fallback RE-ENTERS this function on its own
      // output: the whole-run bail reasons are geometry-dependent
      // (output-indent collisions, code re-attach, the R8h gates), and
      // the next pass's whole-run attempt on the re-indented bytes
      // could otherwise succeed where this pass fell back — a flip the
      // wide fuzz caught in a shape that predates round 13. The
      // fallback is idempotent on its own output (canonical sub-blocks
      // renumber to themselves), so one re-entry converges; `depth`
      // bounds it regardless.
      def processRun(run: Vector[(Vector[String], Boolean)], depth: Int): Unit = {
        // per-block spans with the loose-list carry: items seen in
        // earlier blocks of the run qualify fences in later ones;
        // riding CODE blocks are never scanned (their bytes may be
        // fence-shaped) and leave the carry untouched
        var carry = Int.MaxValue
        val runSpans = run.map { b =>
          if (!b._2) Vector.empty[(Int, Int)]
          else {
            val (sp, m) = fenceSpans(b._1, carry)
            carry = m
            sp
          }
        }
        val parsed = parse(run, runSpans)
        // R8h: a failed run containing fence/quote/heading/table shapes
        // never takes the fallback at all — their attachment is
        // geometry-dependent AND their handling interacts with the
        // escape-exempt masks, so the conservative move is byte-stable
        // pass-through (deep-fuzz r13 finds; see also the escaped-
        // spelling note below).
        def r8hShaped(l: ListLine): Boolean = l match {
          case FOpen(_, _) => true
          case TBlock(_, _) => true
          case Cont(raw) =>
            // fence-SHAPED continuations count even when no span
            // claimed them (under-indented for the current carry,
            // unclosed): the fallback's re-indent could qualify them
            // as a span next pass. Tested on the raw AND unescaped
            // spelling — after a pass-through the escape pass rewrites
            // "```" to "\`\`\`", and both passes must take the same
            // branch here or the fallback flips (deep-fuzz r13 finds)
            val t = raw.dropWhile(c => c == ' ' || c == '\t')
            def shaped(x: String): Boolean =
              x.startsWith(">") || FenceRe.matches(x) ||
                HeadingRe.matches(x) || EmptyHeadingRe.matches(x) ||
                (HrRe.matches(x) && !x.contains('-'))
            shaped(t) || shaped(unescapePunct(t))
          case _ => false
        }
        renumberNested(parsed, quoteDepth, wrap) match {
          case Some((lines, mask, lens)) => emit(run, lines, mask, lens)
          case None if parsed.exists(r8hShaped) =>
            // pass through byte-stable, but KEEP the span-derived
            // exemptions: the escape pass must still treat the code
            // bytes as code, and the next pass re-derives the same
            // spans from the same bytes either way
            run.zip(runSpans).foreach { case ((b, t), sp) =>
              out += ((b, t, maskFromSpans(b.length, sp), false)) }
          case None =>
            // round-11 fallback: renumber maximal all-item sub-runs
            // (into a buffer, so a byte-changing result can re-enter)
            val fb = Vector.newBuilder[(Vector[String], Boolean)]
            var k = 0
            while (k < run.length) {
              def allItems(b: (Vector[String], Boolean)): Boolean =
                b._1.forall(OrderedItemRe.matches(_))
              if (allItems(run(k))) {
                var e = k
                while (e < run.length && allItems(run(e))) e += 1
                val sub = run.slice(k, e)
                val subSpans = runSpans.slice(k, e) // all-item: empty
                renumberNested(parse(sub, subSpans), quoteDepth) match {
                  case Some((lines, _, lens)) => // all-item: no exempt lines
                    var off = 0
                    sub.zip(lens).foreach { case ((_, t), n) =>
                      fb += ((lines.slice(off, off + n), t))
                      off += n
                    }
                  case None => sub.foreach(fb += _)
                }
                k = e
              } else { fb += run(k); k += 1 }
            }
            val out2 = fb.result()
            if (depth > 0 && out2.map(_._1) != run.map(_._1))
              processRun(out2, depth - 1)
            else {
              var c2 = Int.MaxValue
              out2.foreach { case (b, t) =>
                val sp =
                  if (!t) Vector.empty[(Int, Int)]
                  else { val (s0, m0) = fenceSpans(b, c2); c2 = m0; s0 }
                out += ((b, t, maskFromSpans(b.length, sp), false))
              }
            }
        }
      }
      while (idx < bs.length) {
        if (orderedish(bs(idx))) {
          // the run's FIRST head fixes the extension threshold for the
          // whole run — the grouper's one stable witness, mirrored
          val runMin = stableHeadCol(bs(idx)._1.head)
          val thr = if (runMin == Int.MaxValue) 3 else math.min(3, runMin)
          var j = idx + 1
          while (j < bs.length &&
              (orderedish(bs(j)) || contish(bs(j), thr) || codeish(bs(j)))) j += 1
          processRun((idx until j).map(bs).toVector, depth = 3)
          idx = j
        } else {
          val b = bs(idx)
          out += ((b._1, b._2,
            if (b._2) maskFromSpans(b._1.length, fenceSpans(b._1)._1)
            else Vector.empty, true))
          idx += 1
        }
      }
      out.result()
    }

    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      if (l.isEmpty) { closePara(); i += 1 }
      else if (FenceRe.matches(l)) {
        closePara()
        val fence = Vector.newBuilder[String]
        fence += l
        var j = i + 1
        while (j < lines.length && !FenceRe.matches(lines(j))) { fence += lines(j); j += 1 }
        if (j < lines.length) { fence += lines(j); j += 1 }
        else
          // r15: an UNCLOSED top-level fence runs to the end of the
          // document (CommonMark) and mdformat CLOSES it in the output —
          // append a closer matching the opener's char and run length,
          // so the next pass reads a closed block (idempotent)
          fence += l.takeWhile(_ == l.charAt(0))
        addBlock(fence.result())
        i = j
      } else if ({ r8hEnd = fenceRegionEnd(i); r8hEnd >= 0 }) {
        // R8h: an indented fence at/beyond the open list's item content
        // column opens an item-nested VERBATIM region — consumed here
        // wholesale (blank lines included; bullet normalization and the
        // table/HR reads below bypassed) so renumbering and the escape
        // pass see exactly the fenceSpans scanner's region, and the
        // list stays TIGHT (the fence never splits the block)
        para = para ++ lines.slice(i, r8hEnd + 1) // verbatim: not paraAdd
        i = r8hEnd + 1
      } else if (l.contains("|") && i + 1 < lines.length && isSep(lines(i + 1)) &&
          !(para.nonEmpty && paraItemMin <= colWidth(leadWs(l))) &&
          !looseDefer(l)) {
        // (looseDefer: an indented table head inside a live loose run
        // stays in the paragraph stream — renumberNested's TBlock rule
        // renders it at the item's content column, r14)
        // (the guard is R8h: a table head whose indent reaches the open
        // list's item content column is ITEM CONTENT — it stays in the
        // paragraph run, line by line, for renumberNested's table-in-
        // item rule. Rows contain '|' and no blanks, so the block holds
        // together on its own.)
        closePara()
        val rows = Vector.newBuilder[String]
        var j = i + 2
        while (j < lines.length && lines(j).contains("|") &&
            !tableRowStops(lines(j))) { rows += lines(j); j += 1 }
        addBlock(renderTable(l, lines(i + 1), rows.result()))
        i = j
      } else if (para.isEmpty && isIndentedCode(l) && !looseContinuationCol(l)) {
        // indented CODE block: verbatim — its bytes are not text tokens,
        // so the escape pass must never touch them. Blank runs followed
        // by more indented lines stay inside the block. (A DOCUMENT-
        // leading indented line cannot reach here: the input pre-strip
        // removed its indent, mirroring what the trailing .strip() would
        // have done to the rendered code block.) r15: a line within
        // [runItemMin, runItemMin + 4) columns of a live loose run is
        // the open item's continuation paragraph, NOT code (CommonMark
        // measures the code threshold from the item's content column) —
        // it stays in the paragraph stream.
        val code = Vector.newBuilder[String]
        var j = i
        var done = false
        // r15: the blank-run absorption must stop BEFORE a line the
        // loose-continuation rule claims as the open item's paragraph —
        // absorbing it into the code block would classify the same
        // bytes code on one pass and paragraph on the next (fuzz-found
        // "12. b\n\n\t\t_\n   d\n2. x": the rendered "    d" landed
        // inside the tab-code block's blank run)
        while (!done) {
          while (j < lines.length && isIndentedCode(lines(j)) &&
              !looseContinuationCol(lines(j))) { code += lines(j); j += 1 }
          var k = j
          while (k < lines.length && lines(k).isEmpty) k += 1
          if (k > j && k < lines.length && isIndentedCode(lines(k)) &&
              !looseContinuationCol(lines(k))) {
            (j until k).foreach(x => code += lines(x))
            j = k
          } else done = true
        }
        val codeB = code.result()
        addBlock(codeB, keepsRun =
          codeB.forall(x => x.isEmpty || colWidth(leadWs(x)) >= 6))
        i = j
      } else if (para.nonEmpty && para.forall(p => !p.trim.startsWith("- ") &&
          !p.startsWith(">") && !OrderedItemRe.matches(p)) &&
          (SetextH1Re.matches(l) || SetextH2Re.matches(l)) &&
          !(runHasItems && para.forall(_.startsWith(" " * runThr)) &&
            colWidth(leadWs(l)) >= runThr)) {
        // (the r14 exclusion: an indented paragraph + underline inside a
        // live loose run is an ITEM's setext heading — both stay in the
        // paragraph stream for renumberNested's join rule, instead of
        // hoisting a column-0 "# ..." that would split the list)
        // setext heading: the open PARAGRAPH above is the content
        // ('=' -> h1, '-' -> h2); a list item or quote above is not a
        // paragraph (bullet lines always read "- " here — the grouper
        // normalized their markers on append). Round 13: MULTI-LINE
        // setext content converts too — mdformat always renders ATX, so
        // the content's soft line breaks become spaces (its heading
        // renderer: newlines in setext headings convert to spaces).
        val t = para.map(_.trim).mkString(" ")
        para = Vector.empty
        paraItemMin = Int.MaxValue
        val hashes = if (SetextH1Re.matches(l)) "#" else "##"
        addBlock(escapeTextBlock(s"$hashes $t"))
        i += 1
      } else if (HrRe.matches(l) && !l.contains('-') &&
          (para.nonEmpty && paraItemMin <= colWidth(leadWs(l)) ||
            looseDefer(l))) {
        // R8h (round 13): a '*'/'_' thematic break whose indent reaches
        // the open list's item content column is ITEM CONTENT — it stays
        // in the paragraph run for renumberNested's block-in-item rule
        // (appended verbatim: a spaced '*' run is bullet-shaped and the
        // bullet branch would corrupt it; parseLine classifies it as a
        // continuation). Dash runs are excluded — a '-' break inside an
        // item is setext-ambiguous and stays on the conservative path.
        para = para :+ l
        i += 1
      } else if (HrRe.matches(l) && (para.isEmpty || !SetextH2Re.matches(l)) &&
          !looseDefer(l)) {
        // thematic break. With a paragraph open, only a line that could
        // be a SETEXT UNDERLINE (a pure '-' run, no internal spaces) is
        // setext-or-text per CommonMark; * and _ runs, and — round 12 —
        // SPACED '-' runs like "- - -" (which can never be underlines),
        // interrupt the paragraph as breaks
        closePara()
        addBlock(Vector(HrOut))
        i += 1
      } else if (isQuoteLine(l) &&
          !(para.nonEmpty && paraItemMin <= colWidth(leadWs(l))) &&
          !looseDefer(l)) {
        // (the guard is R8h: a quote line whose indent reaches the open
        // list's item content column is ITEM CONTENT — it stays in the
        // paragraph run for renumberNested's quote-in-item rule, not a
        // top-level quote container. Under-indented quotes interrupt
        // the list and take the container path below, per CommonMark.)
        // R15b/R15c (rounds 11-12): collect the full quote CONTAINER —
        // the marker-line run plus any CommonMark LAZY CONTINUATION
        // lines (a plain paragraph line after a quote whose inner
        // document ends in an open paragraph is still INSIDE the
        // quote). One marker level strips (lazy lines carry no marker
        // and pass through stripOneMarker unchanged — they join the
        // quoted paragraph), the inner document re-formats through this
        // same pipeline, and the result re-prefixes with canonical
        // "> " markers: "> foo\nbar" renders "> foo\n> bar", mdformat's
        // reading. A non-lazy follower (heading, list, fence, break,
        // table, setext underline — or any line when the inner document
        // does NOT end in an open paragraph) closes the container.
        var j = i
        var openRun = true
        while (j < lines.length && openRun) {
          if (isQuoteLine(lines(j))) j += 1
          else if (lines(j).nonEmpty && lazyShape(lines, j) &&
              endsOpenParagraph((i until j).map(x => stripOneMarker(lines(x))).toVector,
                quoteDepth))
            j += 1
          else openRun = false
        }
        if (quoteDepth <= 0) {
          paraAdd(normalizeQuoteMarkers(l)); i += 1
        } else {
          closePara()
          val inner = (i until j).map(x => stripOneMarker(lines(x))).toVector
          // r14 follow-up: the inner document re-fills under the same
          // --wrap mode with the fill width reduced by the "> " marker
          // ([[innerWrap]]) — nested quotes reduce again per level
          val prefixed = normalizeCore(inner, quoteDepth - 1,
              wrap = innerWrap(wrap, 2)).split("\n", -1).toVector
            .map(x => if (x.isEmpty) ">" else "> " + x)
          addBlock(prefixed)
          i = j
        }
      } else l match {
        // R8h (round 13): a heading whose indent reaches the open list's
        // item content column is ITEM CONTENT — it stays in the
        // paragraph run for renumberNested's block-in-item rule
        case _ if (HeadingRe.matches(l) || EmptyHeadingRe.matches(l)) &&
            (para.nonEmpty && paraItemMin <= colWidth(leadWs(l)) ||
              looseDefer(l)) =>
          paraAdd(l)
          i += 1
        case HeadingRe(hashes, title) =>
          closePara()
          // a title that is ONLY a #-run was a closing sequence after
          // all (CommonMark reads "# #" as an empty heading)
          val t = if (title.matches("#+")) "" else title
          addBlock(if (t.isEmpty) Vector(hashes)
                   else escapeTextBlock(s"$hashes $t"))
          i += 1
        case EmptyHeadingRe(hashes) =>
          // bare-marker ATX heading ("#", "##  ") — empty content
          closePara()
          addBlock(Vector(hashes))
          i += 1
        case BulletRe(indent, rest) =>
          // marker normalization can COLLIDE with block syntax the source
          // marker never had: "* --" is a bullet (mixed chars can't be a
          // break) but its normalized form "- --" is all dashes and would
          // re-parse as a BREAK; "* |" normalizes to "- |", a valid
          // TABLE-SEPARATOR shape that would claim the line above as a
          // table header next pass (deep-fuzz r13 find) — escape the
          // content's first char to keep the item an item
          val line = s"$indent- $rest"
          paraAdd(if ((HrRe.matches(line) || isSep(line)) &&
              !HrRe.matches(l) && !isSep(l))
            s"$indent- \\$rest" else line)
          i += 1
        case other =>
          paraAdd(other); i += 1
      }
    }
    closePara()
    // R8/R8b/R8c renumber first (raw indents intact), THEN the
    // text-token escape pass per text block (R9-R14; multi-line links
    // stay whole). Under an r14 --wrap mode, exempt-free text blocks
    // instead run the escape+re-fill FIXPOINT loop (see wrapAndEscape —
    // escaping and filling feed back into each other's geometry).
    renumberLoose(blocks.result())
      .map { case (b, isText, mask, clean) =>
        if (!isText) b
        else if (wrap != Wrap.Keep && !mask.contains(true))
          wrapAndEscape(b, wrap, clean)
        else escapeTextWithMask(b, mask)
      }
      .map(_.mkString("\n")).mkString("\n\n")
  }

  /** Escape pass over one text block, R8h-aware: EXEMPT lines (fence
    * region bytes, recursively re-formatted quote content) splice
    * through UNTOUCHED; only the maximal non-exempt segments between
    * them render through [[escapeTextBlock]]. The block stays ONE
    * block, so no blank line appears around a tight fence and the list
    * stays tight. An exempt region never splits a link or emphasis span
    * legitimately (it is a block boundary), so per-segment escaping
    * loses nothing. */
  private def escapeTextWithMask(b: Vector[String],
                                 mask: Vector[Boolean]): Vector[String] = {
    if (!mask.contains(true)) return escapeTextBlock(b.mkString("\n"))
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < b.length) {
      val exempt = mask(i)
      var j = i + 1
      while (j < b.length && mask(j) == exempt) j += 1
      if (exempt) out ++= b.slice(i, j)
      else out ++= escapeTextBlock(b.slice(i, j).mkString("\n"))
      i = j
    }
    out.result()
  }
}
