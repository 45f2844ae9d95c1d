package graft.tools

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.split.{Bpe, BpeTokenizer, BpeVocab, MdFormatLite, SemanticSplitter}

/** Print the exact chunk-level diff between the fidelity splitter's output
  * and the ported reference goldens for one fixture at one BPE granularity
  * — the drill-down behind ParityProbe's one-line "diff chunkN@pos"
  * (which boundary moved, in which direction, with the surrounding bytes
  * and per-chunk token counts). Calibration forensics only.
  *
  * Usage: runMain graft.tools.ChunkDiff <nMerges> <fixture>
  */
object ChunkDiff {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val f = args(1)
    val tk = new BpeTokenizer(new BpeVocab(Bpe.loadMerges("/graft/bpe/merges.txt", n)), n)
    val base = Paths.get("src/test/resources/table_splitter")
    val refBase = Paths.get("src/test/resources/table_splitter_ref")
    val input = new String(Files.readAllBytes(base.resolve(f).resolve("input.md")), "UTF-8")
    val expected = Files.list(refBase.resolve(f)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("expected_output_"))
      .toSeq.sortBy(_.getFileName.toString)
      .map(p => MdFormatLite.normalize(new String(Files.readAllBytes(p), "UTF-8")))
    val sp = new SemanticSplitter(tk = tk, canonicalize = true,
      repeatTableHeader = !f.contains("dont_repeat_header"))
    val actual = sp.splitMarkdown(input.trim)
    println(s"$f @ $n: actual ${actual.length} chunks toks=${actual.map(tk.count)} | " +
      s"expected ${expected.length} chunks toks=${expected.map(tk.count)}")
    actual.zipAll(expected, "<missing>", "<missing>").zipWithIndex.foreach { case ((a, e), i) =>
      if (a != e) {
        val d = a.zip(e).indexWhere { case (x, y) => x != y }
        val pos = if (d < 0) math.min(a.length, e.length) else d
        println(s"chunk $i diff@$pos:")
        println("  ACT ..." + a.slice(math.max(0, pos - 80), pos + 160).replace("\n", "\\n"))
        println("  EXP ..." + e.slice(math.max(0, pos - 80), pos + 160).replace("\n", "\\n"))
      } else println(s"chunk $i EXACT (${tk.count(a)} toks)")
    }
  }
}
