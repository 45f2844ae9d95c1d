package graft.tools

import java.nio.file.{Files, Paths}
import graft.split.SemanticSplitter
import scala.jdk.CollectionConverters._

/** Regenerate the re-derived splitter goldens (FIXTURES.md §1.5: the
  * reference goldens are cl100k/mdformat-dependent; ours are derived once
  * from the whitespace-tokenizer splitter and then pinned byte-exact).
  * Run after any intentional splitter behavior change; the FixtureSpec
  * golden test fails on any unintentional one. */
object RegenGoldens {
  def main(args: Array[String]): Unit = {
    val base = Paths.get("src/test/resources/table_splitter")
    Files.list(base).iterator().asScala.filter(Files.isDirectory(_)).foreach { dir =>
      // The dont_repeat_header fixture exercises repeat_table_header_row=false
      // (reference test_markdown_table_splitter.py parametrization); all
      // other fixtures run the default splitter.
      val sp = new SemanticSplitter(
        repeatTableHeader = !dir.getFileName.toString.contains("dont_repeat_header"))
      val input = new String(Files.readAllBytes(dir.resolve("input.md")), "UTF-8")
      Files.list(dir).iterator().asScala
        .filter(_.getFileName.toString.startsWith("expected_output_"))
        .toList.foreach(Files.delete)
      sp.splitMarkdown(input.trim).zipWithIndex.foreach { case (chunk, i) =>
        Files.write(dir.resolve(f"expected_output_$i%03d.md"), chunk.getBytes("UTF-8"))
      }
      println(s"${dir.getFileName}: ${sp.splitMarkdown(input.trim).length} chunks")
    }
  }
}
