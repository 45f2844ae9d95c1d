package graft.split

/** Table-aware splitting (SURVEY.md §2.10 stage 3; reference
  * wurzel/utils/splitters/markdown_table_splitter.py:48-452).
  *
  * Semantics preserved: tables split by rows, never mid-row; the header +
  * separator are re-emitted on every chunk; a single row that alone exceeds
  * the token budget is sliced at column boundaries, each slice carrying the
  * matching header-cell slice (markdown_table_splitter.py:165-213).
  */
object TableSplitter {

  private val PipeSplit = java.util.regex.Pattern.compile("\\|")

  private def cells(row: String): Vector[String] =
    PipeSplit.split(row.stripPrefix("|").stripSuffix("|"), -1).toVector.map(_.trim)

  // ---- document-level splitter (reference-faithful port) -----------------

  private val DocSepRe = "^\\s*\\|?(?:\\s*:?-+:?\\s*\\|)+\\s*$".r
  private def docCells(row: String): Vector[String] =
    PipeSplit.split(row.trim.stripPrefix("|").stripSuffix("|"), -1).toVector.map(_.trim)
  /** reference make_row: `"|" + " | ".join(cells) + "|\n"` — asymmetric
    * gutters on purpose; counts must match the reference's budget math. */
  private def makeRow(cs: Seq[String]): String = "|" + cs.mkString(" | ") + "|\n"

  /** Whole-document table-aware splitting, the semantics of the reference's
    * MarkdownTableSplitterUtil.split (markdown_table_splitter.py:118-417):
    * the SemanticSplitter routes an entire document through this path when
    * its strongest top-level block is a table (semantic_splitter.py:628-646).
    *
    *  - lines keep their endings; chunks are the concatenation of original
    *    lines, so non-sliced content is byte-identical to the input;
    *  - non-table lines pack greedily: flush when the next line would push
    *    the buffer past tokenLimit (a single oversized line still becomes
    *    its own over-limit chunk — the reference does not cut lines here);
    *  - a table header+separator is (re)emitted per chunk when
    *    repeatHeader; budgets count the RE-RENDERED row (`|a | b|\n`) while
    *    the buffer keeps the original line — exactly the reference's math;
    *  - a row whose own rendered count exceeds tokenLimit is sliced at
    *    column boundaries with matching header/separator slices; after an
    *    oversized row the buffer restarts empty (reference quirk kept:
    *    following rows open a headerless chunk).
    */
  def splitDocument(md: String, tokenLimit: Int, tk: Tokenizer,
                    repeatHeader: Boolean = true): Vector[String] = {
    val lines: Vector[String] = {
      // splitlines(keepends=True)
      val out = Vector.newBuilder[String]
      var start = 0
      var i = 0
      while (i < md.length) {
        if (md.charAt(i) == '\n') { out += md.substring(start, i + 1); start = i + 1 }
        i += 1
      }
      if (start < md.length) out += md.substring(start)
      out.result()
    }
    val chunks = Vector.newBuilder[String]
    var buf = Vector.empty[String]
    var bufTok = 0
    def flush(): Unit =
      if (buf.nonEmpty) { chunks += buf.mkString(""); buf = Vector.empty; bufTok = 0 }
    def addLine(line: String): Unit = {
      val t = tk.count(line)
      if (bufTok + t > tokenLimit) flush()
      buf = buf :+ line; bufTok += t
    }
    def isTableStart(i: Int): Boolean =
      lines(i).contains("|") && i + 1 < lines.length && DocSepRe.matches(lines(i + 1))

    def sliceLongRow(rowCells: Vector[String], headerCells: Vector[String],
                     sepCells: Vector[String], header: String, sep: String,
                     headerTok: Int): Unit = {
      var colIdx = 0
      while (colIdx < rowCells.length) {
        var slice = Vector.empty[String]
        var continue = true
        while (colIdx < rowCells.length && continue) {
          val tentative = slice :+ rowCells(colIdx)
          val sliceTok = tk.count(makeRow(tentative))
          val headSliceTok =
            if (repeatHeader)
              tk.count(makeRow(headerCells.take(tentative.length))) +
                tk.count(makeRow(sepCells.take(tentative.length)))
            else 0
          if (headSliceTok + sliceTok > tokenLimit && slice.nonEmpty) continue = false
          else { slice = tentative; colIdx += 1 }
        }
        if (repeatHeader)
          buf = buf ++ Vector(makeRow(headerCells.take(slice.length)),
            makeRow(sepCells.take(slice.length)), makeRow(slice))
        else buf = buf :+ makeRow(slice)
        flush()
        if (colIdx < rowCells.length && repeatHeader) {
          buf = Vector(header, sep); bufTok = headerTok
        } else { buf = Vector.empty; bufTok = 0 }
      }
    }

    var i = 0
    while (i < lines.length) {
      if (isTableStart(i)) {
        val header = lines(i); val sep = lines(i + 1)
        val headerCells = docCells(header); val sepCells = docCells(sep)
        val headerTok = tk.count(header + sep)
        if (bufTok + headerTok > tokenLimit) flush()
        buf = buf ++ Vector(header, sep); bufTok += headerTok
        i += 2
        while (i < lines.length && lines(i).contains("|")) {
          val rowLine = lines(i)
          val rowCells = docCells(rowLine)
          val rowTok = tk.count(makeRow(rowCells))
          if (bufTok + rowTok <= tokenLimit) {
            buf = buf :+ rowLine; bufTok += rowTok
          } else {
            flush()
            if (repeatHeader) { buf = Vector(header, sep); bufTok = headerTok }
            if (rowTok > tokenLimit)
              sliceLongRow(rowCells, headerCells, sepCells, header, sep, headerTok)
            else { buf = buf :+ rowLine; bufTok += rowTok }
          }
          i += 1
        }
      } else {
        addLine(lines(i))
        i += 1
      }
    }
    flush()
    chunks.result()
  }

  private def mkRow(cs: Seq[String]): String = cs.mkString("| ", " | ", " |")

  private def sepFor(n: Int): String = Vector.fill(n)("---").mkString("| ", " | ", " |")

  /** Slice one oversized row at column boundaries (per-slice header). */
  def sliceLongRow(headerCells: Vector[String], rowCells: Vector[String],
                   tokenLimit: Int, tk: Tokenizer): Vector[String] = {
    val out = Vector.newBuilder[String]
    var start = 0
    while (start < rowCells.length) {
      var end = start + 1
      def sliceText(e: Int): String = {
        val h = headerCells.slice(start, e)
        val r = rowCells.slice(start, e)
        Seq(mkRow(h), sepFor(e - start), mkRow(r)).mkString("\n")
      }
      while (end < rowCells.length && tk.count(sliceText(end + 1)) <= tokenLimit) end += 1
      out += sliceText(end)
      start = end
    }
    out.result()
  }

  /** Split a table block into markdown chunks each within tokenLimit.
    * `repeatHeader` re-emits header+separator on every chunk (reference
    * `repeat_table_header_row`, default true; the dont_repeat_header fixture
    * covers false — only the first chunk carries the header). Rows that
    * alone exceed the limit are column-sliced. */
  def split(table: TableBlock, tokenLimit: Int, tk: Tokenizer,
            repeatHeader: Boolean = true): Vector[String] = {
    if (tk.count(table.text) <= tokenLimit) return Vector(table.text)
    val headerCells = cells(table.header)
    val head = table.header + "\n" + table.sep
    val headTokens = tk.count(head)
    var emittedHeader = false
    val out = Vector.newBuilder[String]
    var buf = Vector.empty[String]
    var bufTokens = headTokens
    def flush(): Unit = {
      if (buf.nonEmpty) {
        val withHead = repeatHeader || !emittedHeader
        emittedHeader = true
        out += (if (withHead) (head +: buf) else buf).mkString("\n")
        buf = Vector.empty
        bufTokens = if (repeatHeader) headTokens else 0
      }
    }
    table.rows.foreach { row =>
      val rowTokens = tk.count(row)
      if (headTokens + rowTokens > tokenLimit) {
        flush()
        out ++= sliceLongRow(headerCells, cells(row), tokenLimit, tk)
      } else if (bufTokens + rowTokens > tokenLimit) {
        flush()
        // Seed the head budget only if this chunk will actually carry the
        // header (repeatHeader=false chunks after the first are header-less).
        buf = Vector(row)
        bufTokens = (if (repeatHeader || !emittedHeader) headTokens else 0) + rowTokens
      } else {
        buf = buf :+ row; bufTokens += rowTokens
      }
    }
    flush()
    out.result()
  }
}
