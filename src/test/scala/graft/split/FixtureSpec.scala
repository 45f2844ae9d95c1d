package graft.split

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Reference golden fixtures (ported inputs from
  * tests/data/splitter/table_splitter/ — FIXTURES.md §1.5 sanctions the
  * port). The reference's expected outputs are cl100k_base- and
  * mdformat-dependent; goldens are re-derived for the whitespace tokenizer
  * (divergence documented): instead of byte-exact outputs we pin invariants
  * the reference harness also asserts — split behavior, header repetition,
  * no row ever cut — plus content-preservation checks the reference gets
  * implicitly from its byte-exact compare.
  */
class FixtureSpec extends AnyFunSuite {

  private val sp = new SemanticSplitter() // 256 / 32 / 64 like the reference default
  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/table_splitter/$name/input.md")
    try Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }
  private def goldens(name: String): Vector[String] = {
    Iterator.from(0).map { i =>
      Option(getClass.getResourceAsStream(f"/table_splitter/$name/expected_output_$i%03d.md"))
    }.takeWhile(_.isDefined).map { s =>
      val in = s.get
      try Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }.toVector
  }

  for (name <- Seq("short_table", "standalone_table", "table_and_text", "many_rows_table",
      "many_rows_table_dont_repeat_header", "many_columns_table", "long_table_and_long_text")) {
    test(s"golden: $name matches the pinned re-derived outputs byte-exact") {
      // dont_repeat_header runs the non-default repeat_table_header_row=false
      // mode, like the reference's parametrized fixture test.
      val splitter =
        if (name.contains("dont_repeat_header")) new SemanticSplitter(repeatTableHeader = false)
        else sp
      val actual = splitter.splitMarkdown(fixture(name).trim)
      val expected = goldens(name)
      assert(expected.nonEmpty, "goldens missing — run graft.tools.RegenGoldens")
      assert(actual.length == expected.length, "split count drifted")
      actual.zip(expected).zipWithIndex.foreach { case ((a, e), i) =>
        assert(a == e, s"chunk $i drifted")
      }
    }
  }
  private def tableRows(s: String): Seq[String] =
    s.linesIterator.filter(l => l.trim.startsWith("|") && !l.contains("---")).toSeq

  // ---- reference golden parity (BPE + mdformat-lite fidelity stack) -------

  private def refGoldens(name: String): Vector[String] = {
    Iterator.from(0).map { i =>
      Option(getClass.getResourceAsStream(f"/table_splitter_ref/$name/expected_output_$i%03d.md"))
    }.takeWhile(_.isDefined).map { s =>
      val in = s.get
      try Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }.toVector
  }

  // The reference's own fixture test (tests/splitter/table_splitter_test.py)
  // runs the full SemanticSplitter with cl100k and compares each chunk to
  // `mdformat.text(expected).strip()`. This engine reproduces those chunks
  // BYTE-EXACTLY with the vendored calibrated BPE (Bpe.CalibratedMerges) and
  // MdFormatLite — same comparison, same six fixtures. The seventh fixture
  // (long_table_and_long_text) is excluded exactly as the reference excludes
  // it: its committed goldens are known-wrong upstream (telekom/wurzel#103).
  for (name <- Seq("short_table", "standalone_table", "table_and_text", "many_rows_table",
      "many_rows_table_dont_repeat_header", "many_columns_table")) {
    test(s"reference parity: $name chunks match the ported cl100k goldens byte-exact") {
      val fidelity = SemanticSplitter.referenceDefault(
        repeatTableHeader = !name.contains("dont_repeat_header"))
      val actual = fidelity.splitMarkdown(fixture(name).trim)
      val expected = refGoldens(name).map(MdFormatLite.normalize)
      assert(expected.nonEmpty)
      assert(actual.length == expected.length, "chunk count diverged from reference")
      actual.zip(expected).zipWithIndex.foreach { case ((a, e), i) =>
        assert(a == e, s"chunk $i diverged from the reference golden")
      }
    }
  }

  for (name <- Seq("short_table", "standalone_table")) {
    test(s"$name: fits the default window -> single chunk, unchanged") {
      val md = fixture(name).trim
      assert(sp.splitMarkdown(md) == Vector(md))
    }
  }

  test("table_and_text: splits under the whitespace tokenizer (474 tokens); rows preserved") {
    // re-derived golden: cl100k counts this under the reference's window,
    // whitespace tokens do not — behavior divergence documented.
    val md = fixture("table_and_text").trim
    val chunks = sp.splitMarkdown(md)
    assert(chunks.length >= 2)
    val joined = chunks.mkString("\n")
    tableRows(md).foreach(r => assert(joined.contains(r.trim)))
  }

  test("many_rows_table: all data rows preserved in order, never cut mid-row") {
    val md = fixture("many_rows_table")
    val tight = new SemanticSplitter(tokenLimit = 80, buffer = 8, tokenMin = 4)
    val chunks = tight.splitMarkdown(md)
    assert(chunks.length > 1)
    val inputRows = tableRows(md).drop(1) // drop header
    val outputRows = chunks.flatMap(c => tableRows(c).filterNot(_ == tableRows(md).head))
    assert(outputRows == inputRows)
    chunks.filter(_.contains("| DataIngestor")).foreach { c =>
      assert(tableRows(c).head == tableRows(md).head, "header re-emitted per chunk")
    }
  }

  test("many_rows_table_dont_repeat_header: only the first table chunk carries the header") {
    val md = fixture("many_rows_table_dont_repeat_header")
    val tight = new SemanticSplitter(tokenLimit = 80, buffer = 8, tokenMin = 4,
      repeatTableHeader = false)
    val chunks = tight.splitMarkdown(md)
    assert(chunks.length > 1)
    val header = tableRows(md).head
    assert(tableRows(chunks.head).headOption.contains(header))
    chunks.tail.foreach(c => assert(!tableRows(c).contains(header), s"header repeated in:\n$c"))
    // all data rows survive, in order
    val inputRows = tableRows(md).drop(1)
    assert(chunks.flatMap(tableRows).filterNot(_ == header) == inputRows)
  }

  test("many_columns_table: oversized row sliced at column boundaries with matching header slices") {
    val md = fixture("many_columns_table")
    val tight = new SemanticSplitter(tokenLimit = 40, buffer = 4, tokenMin = 2)
    val chunks = tight.splitMarkdown(md)
    assert(chunks.length > 1)
    // reference chunk shape (markdown_table_splitter.py:176-213): a slice
    // chunk ends with [header-slice, separator-slice, row-slice] whose
    // column counts agree (the full header+separator may precede them)
    chunks.foreach { c =>
      val lines = c.linesIterator.filter(_.trim.startsWith("|")).toVector
      if (lines.length >= 3) {
        val Vector(hs, ss, rs) = lines.takeRight(3).map(_.split("\\|").count(_.trim.nonEmpty))
        assert(hs == rs && ss == rs, s"slice column mismatch in:\n$c")
      }
    }
  }

  test("long_table_and_long_text: mixed doc splits; table chunks carry headers; bound respected") {
    val md = fixture("long_table_and_long_text")
    val chunks = sp.splitMarkdown(md)
    assert(chunks.nonEmpty)
    // body bound: limit+buffer, plus carried-header prefix allowance
    chunks.foreach(c => assert(sp.tk.count(c) <= sp.tokenLimit + sp.buffer + 8))
    // every input table row must survive in some chunk
    val inRows = tableRows(md)
    val joined = chunks.mkString("\n")
    inRows.foreach(r => assert(joined.contains(r.trim)))
  }
}
