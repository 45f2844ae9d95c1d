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

  private def cells(row: String): Vector[String] =
    row.stripPrefix("|").stripSuffix("|").split("\\|", -1).toVector.map(_.trim)

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
