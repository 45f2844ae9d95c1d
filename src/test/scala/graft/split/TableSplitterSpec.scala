package graft.split

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference golden-fixture harness shape
  * (tests/splitter/table_splitter_test.py:24-49): short table unchanged,
  * many-rows split with repeated header, many-columns row sliced at column
  * boundaries (FIXTURES.md §1.5 — token counts re-derived for the
  * whitespace tokenizer, divergence documented). */
class TableSplitterSpec extends AnyFunSuite {

  private val tk = WhitespaceTokenizer

  private def table(nRows: Int, nCols: Int = 2): TableBlock = {
    val header = (1 to nCols).map(c => s"h$c").mkString("| ", " | ", " |")
    val sep = Vector.fill(nCols)("---").mkString("| ", " | ", " |")
    val rows = (1 to nRows).map(r => (1 to nCols).map(c => s"r${r}c$c").mkString("| ", " | ", " |")).toVector
    TableBlock(header, sep, rows)
  }

  test("short_table: fits the budget, returned whole") {
    val t = table(2)
    assert(TableSplitter.split(t, 100, tk) == Vector(t.text))
  }

  test("many_rows_table: split by rows, header+separator re-emitted per chunk") {
    val t = table(30)
    val chunks = TableSplitter.split(t, 40, tk)
    assert(chunks.length > 1)
    chunks.foreach { c =>
      val lines = c.linesIterator.toVector
      assert(lines(0) == t.header)
      assert(lines(1) == t.sep)
      assert(tk.count(c) <= 40)
    }
    // no row lost, none split mid-row
    val allRows = chunks.flatMap(_.linesIterator.drop(2))
    assert(allRows == t.rows)
  }

  test("many_columns_table: an oversized single row is sliced at column boundaries with per-slice header") {
    val nCols = 30
    val t = table(1, nCols)
    val chunks = TableSplitter.split(t, 25, tk)
    assert(chunks.length > 1)
    chunks.foreach { c =>
      val lines = c.linesIterator.toVector
      assert(lines.length == 3) // header slice, separator, row slice
      assert(lines(0).startsWith("| h"))
      // header slice columns match row slice columns
      val hCells = lines(0).split("\\|").count(_.trim.nonEmpty)
      val rCells = lines(2).split("\\|").count(_.trim.nonEmpty)
      assert(hCells == rCells)
    }
    val cellsOut = chunks.flatMap(_.linesIterator.toVector.last.split("\\|").map(_.trim).filter(_.nonEmpty))
    assert(cellsOut == (1 to nCols).map(c => s"r1c$c"))
  }

  test("many_rows_table_dont_repeat_header: header only on the first chunk (repeat_table_header_row=False)") {
    val t = table(30)
    val chunks = TableSplitter.split(t, 40, tk, repeatHeader = false)
    assert(chunks.length > 1)
    assert(chunks.head.linesIterator.toVector.take(2) == Vector(t.header, t.sep))
    chunks.tail.foreach { c =>
      assert(!c.contains(t.header), "header must not repeat")
      assert(!c.contains("---"))
    }
    // still no row lost or cut
    val allRows = chunks.head.linesIterator.drop(2).toVector ++
      chunks.tail.flatMap(_.linesIterator)
    assert(allRows == t.rows)
  }

  test("rows never split mid-row even when tight") {
    val t = table(10, 3)
    val chunks = TableSplitter.split(t, 15, tk)
    val rowLines = chunks.flatMap(_.linesIterator.filter(_.contains("r")))
    rowLines.filterNot(_.contains("---")).foreach(l => assert(l.endsWith("|")))
  }
}
