package graft.split

/** Line-based markdown block model (SURVEY.md §2.10 stage 1).
  *
  * The reference ranks block types by split priority
  * (semantic_splitter.py:28-39 LEVEL_MAPPING): Heading 1-6 < List 7 <
  * CodeFence 8 < Table 9 < Paragraph 10 — lower level = stronger split
  * boundary. The reference walks a mistletoe AST; this engine uses a
  * deterministic line scanner with the same block classes, which is
  * sufficient for the block-boundary semantics (and much cheaper per doc).
  */
sealed trait Block extends Serializable {
  def level: Int
  def text: String
}
final case class Heading(depth: Int, line: String) extends Block {
  def level: Int = depth
  def text: String = line
}
final case class ListBlock(text: String) extends Block { def level = 7 }
final case class CodeFence(text: String) extends Block { def level = 8 }
final case class TableBlock(header: String, sep: String, rows: Vector[String]) extends Block {
  def level = 9
  def text: String = (header +: sep +: rows).mkString("\n")
}
final case class Paragraph(text: String) extends Block { def level = 10 }
/** Blockquote. The reference's LEVEL_MAPPING has no Quote entry
  * (semantic_splitter.py:28-39), so quotes rank LEVEL_UNDEFINED(15): never
  * a split boundary themselves — they attach to the enclosing section and
  * descent unwraps their inner blocks (`_split_children` single-child
  * recursion, 324-328). */
final case class QuoteBlock(text: String) extends Block { def level = 15 }

object MarkdownBlocks {
  private val HeadingRe = "^(#{1,6})\\s+(.*)$".r
  private val FenceRe = "^\\s*(```|~~~)".r
  private val TableRowRe = "^\\s*\\|.*\\|\\s*$".r
  // Table start detection mirrors markdown_table_splitter.py:20, 469-475:
  // a pipe row followed by a separator row of dashes/colons/pipes.
  private val TableSepRe = "^\\s*\\|?[-:\\s|]+\\|?\\s*$".r
  private val ListItemRe = "^\\s*([-*+]|\\d+[.)])\\s+.*$".r
  // CommonMark block quote marker: up to 3 leading spaces then '>'.
  private val QuoteRe = "^\\s{0,3}>".r

  /** Scan markdown into top-level blocks. */
  def parse(md: String): Vector[Block] = {
    val lines = md.split("\n", -1)
    val out = Vector.newBuilder[Block]
    var i = 0
    def isBlank(l: String) = l.trim.isEmpty
    while (i < lines.length) {
      val line = lines(i)
      if (isBlank(line)) { i += 1 }
      else if (FenceRe.findFirstIn(line).isDefined) {
        val start = i; i += 1
        while (i < lines.length && FenceRe.findFirstIn(lines(i)).isEmpty) i += 1
        if (i < lines.length) i += 1
        out += CodeFence(lines.slice(start, math.min(i, lines.length)).mkString("\n"))
      } else {
        line match {
          case HeadingRe(hashes, _) =>
            out += Heading(hashes.length, line.trim)
            i += 1
          case _ if TableRowRe.findFirstIn(line).isDefined
              && i + 1 < lines.length
              && TableRowRe.findFirstIn(lines(i + 1)).isDefined
              && TableSepRe.findFirstIn(lines(i + 1)).isDefined =>
            val header = line.trim
            val sep = lines(i + 1).trim
            i += 2
            val rows = Vector.newBuilder[String]
            while (i < lines.length && TableRowRe.findFirstIn(lines(i)).isDefined) {
              rows += lines(i).trim; i += 1
            }
            out += TableBlock(header, sep, rows.result())
          case _ if QuoteRe.findFirstIn(line).isDefined =>
            val start = i
            while (i < lines.length && QuoteRe.findFirstIn(lines(i)).isDefined) i += 1
            out += QuoteBlock(lines.slice(start, i).mkString("\n"))
          case _ if ListItemRe.findFirstIn(line).isDefined =>
            val start = i
            while (i < lines.length && !isBlank(lines(i))
                && (ListItemRe.findFirstIn(lines(i)).isDefined || lines(i).startsWith("  "))) i += 1
            out += ListBlock(lines.slice(start, i).mkString("\n"))
          case _ =>
            val start = i
            while (i < lines.length && !isBlank(lines(i))
                && HeadingRe.findFirstIn(lines(i)).isEmpty
                && FenceRe.findFirstIn(lines(i)).isEmpty
                && ListItemRe.findFirstIn(lines(i)).isEmpty
                && QuoteRe.findFirstIn(lines(i)).isEmpty
                && TableRowRe.findFirstIn(lines(i)).isEmpty) i += 1
            if (i == start) i += 1 // defensive: always make progress
            out += Paragraph(lines.slice(start, i).mkString("\n").trim)
        }
      }
    }
    out.result().filter(b => b.text.nonEmpty)
  }
}
