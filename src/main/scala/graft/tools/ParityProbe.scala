package graft.tools

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.split.{BpeTokenizer, MdFormatLite, SemanticSplitter}

/** Probe reference-fixture boundary parity across BPE granularities.
  *
  * For each nMerges candidate, runs the fidelity splitter (BPE tokenizer +
  * mdformat-lite canonicalization) on every ported fixture input and diffs
  * against the ported reference goldens (normalized the same way the
  * reference test does: `mdformat.text(expected).strip()` —
  * tests/splitter/table_splitter_test.py:47). Prints per-fixture chunk
  * counts and byte-equality so the matching granularity can be pinned in
  * FixtureSpec / FIXTURES.md.
  */
object ParityProbe {
  val fixtures = Seq("short_table", "standalone_table", "table_and_text",
    "many_rows_table", "many_rows_table_dont_repeat_header", "many_columns_table")

  private val base = Paths.get("src/test/resources/table_splitter")
  private val refBase = Paths.get("src/test/resources/table_splitter_ref")

  /** Ported fixture inputs + mdformat-normalized reference goldens,
    * loaded once. */
  lazy val goldens: Seq[(String, String, Seq[String])] = fixtures.map { f =>
    val input = new String(Files.readAllBytes(base.resolve(f).resolve("input.md")), "UTF-8")
    val expected = Files.list(refBase.resolve(f)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("expected_output_"))
      .toSeq.sortBy(_.getFileName.toString)
      .map(p => MdFormatLite.normalize(new String(Files.readAllBytes(p), "UTF-8")))
    (f, input, expected)
  }

  /** Per-fixture byte-parity of the fidelity splitter under `tk` against
    * the reference goldens: (fixture, actualChunks, expectedChunks). */
  def splitAll(tk: BpeTokenizer): Seq[(String, Seq[String], Seq[String])] =
    goldens.map { case (f, input, expected) =>
      val sp = new SemanticSplitter(tk = tk, canonicalize = true,
        repeatTableHeader = !f.contains("dont_repeat_header"))
      (f, sp.splitMarkdown(input.trim), expected)
    }

  /** Number of fixtures whose chunks are byte-exact under `tk`. */
  def exactCount(tk: BpeTokenizer): Int =
    splitAll(tk).count { case (_, a, e) => a == e }

  def main(args: Array[String]): Unit = {
    val candidates = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(400, 600, 800, 1000, 1200, 1400, 1767)
    for (n <- candidates) {
      val tk = BpeTokenizer.withMerges(n)
      val results = splitAll(tk)
      val matched = results.count { case (_, a, e) => a == e }
      println(s"nMerges=$n  exact=$matched/${fixtures.size}")
      results.foreach { case (f, actual, expected) =>
        val exact = actual == expected
        val cnt = s"${actual.length}/${expected.length}"
        val firstDiff = if (exact) "" else {
          actual.zipAll(expected, "<missing>", "<missing>").zipWithIndex
            .collectFirst { case ((a, e), i) if a != e =>
              val d = a.zip(e).indexWhere { case (x, y) => x != y }
              s"chunk$i@${if (d < 0) math.min(a.length, e.length) else d}"
            }.getOrElse("")
        }
        println(f"  $f%-36s $cnt%-6s ${if (exact) "EXACT" else "diff " + firstDiff}")
      }
    }
  }
}
