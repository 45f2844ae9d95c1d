package graft.tools

import scala.jdk.CollectionConverters._
import graft.split.{Bpe, BpeTokenizer, SemanticSplitter}

/** Measure the out-of-domain cl100k drift (FIXTURES.md §1.5) at candidate
  * merge-table granularities: chunk count + token sum of the reference's
  * held-out tests/data/markdown.json corpus (reference e2e pins 11 chunks
  * / 2072 cl100k tokens) and the cut_off_test sentence (~25 cl100k
  * tokens). Run alongside ParityProbe when retraining/calibrating.
  *
  * Usage: runMain graft.tools.DriftProbe [nMerges...]
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    // Default: the calibrated parity prefix AND the full trained table —
    // the two production vocabs after the round-11 per-context split
    // (BpeTokenizer.parity / BpeTokenizer.counting).
    val candidates =
      if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(Bpe.CalibratedMerges,
        Bpe.loadMerges("/graft/bpe/merges.txt").length).distinct
    // test resource, not on the main classpath — read from the repo tree
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new java.io.File("src/test/resources/markdown_corpus/markdown.json"))
    val docs = root.elements().asScala.map(_.get("md").asText()).toVector
    val cutOff = "This is a very long long text with many many words that produce " +
      "a lengthy sentence that is the input for the splitter."
    for (n <- candidates) {
      val tk = BpeTokenizer.withMerges(n)
      val sp = new SemanticSplitter(256, 32, 64, tk = tk,
        repeatTableHeader = true, canonicalize = true, sentenceLeaves = true)
      val chunks = docs.flatMap(sp.splitMarkdown)
      val tokens = chunks.map(tk.count).sum
      val chars = chunks.map(_.length).sum
      println(f"nMerges=$n: ${chunks.length} chunks, $tokens tokens, $chars chars, " +
        f"drift=${tokens / 2072.0}%.3f, chars/tok=${chars.toDouble / tokens}%.2f, " +
        f"cutoff=${tk.count(cutOff)} toks (ref ~25, drift ${tk.count(cutOff) / 25.0}%.2f)")
    }
  }
}
