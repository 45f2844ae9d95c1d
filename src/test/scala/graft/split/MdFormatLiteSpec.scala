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
}
