package graft.tools

import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Round-12 counting-vocab extension (FIXTURES.md §1.5 item: Latin-family
  * corpus growth). The fixture-parity calibration is EXPENSIVE to redo and
  * the parity prefix is already byte-exact, so this tool never retrains
  * it: the existing merge table REPLAYS VERBATIM (same (a, b) pairs, same
  * ids — the written file's first 30,442 lines are byte-identical, so
  * `BpeTokenizer.parity()`'s calibrated prefix and all six fixture goldens
  * are untouched by construction), and training CONTINUES from there on
  * the corpus extended with the Romance-language gettext prose
  * (TrainBpe.buildCorpus group 3c) until the merge pool exhausts or
  * `maxMerges`. Only `BpeTokenizer.counting()` (the full table) sees the
  * new tail — exactly the budget contexts whose held-out drift the
  * extension targets.
  *
  * Safety gates, run before writing:
  *  - held-out proof: ZERO shared 8-gram word shingles between the
  *    extended corpus' new group and the markdown.json drift benchmark
  *    (the r10 methodology) — abort otherwise;
  *  - English parity: the full-table count of the reference cut_off
  *    sentence must stay at cl100k's exact 25 tokens — abort otherwise
  *    (a new tail merge over-compressing English would silently shift
  *    every budget context).
  *
  * Usage: runMain graft.tools.ExtendBpe [maxMerges]
  */
object ExtendBpe {
  def main(args: Array[String]): Unit = {
    val maxMerges = args.headOption.map(_.toInt).getOrElse(60000)
    val corpus = TrainBpe.buildCorpus()
    println(s"corpus: ${corpus.all.length} files, ${corpus.all.map(_._2.length).sum} chars, sha256=${corpus.sha256}")

    // held-out gate: the NEW romance group shares no 8-gram word shingle
    // with any benchmark doc
    def shingles8(text: String): Set[String] = {
      val w = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (w.length < 8) Set.empty
      else (0 to w.length - 8).map(i => w.slice(i, i + 8).mkString(" ")).toSet
    }
    val benchFile = new java.io.File("src/test/resources/markdown_corpus/markdown.json")
    val bench = new com.fasterxml.jackson.databind.ObjectMapper().readTree(benchFile)
      .elements().asScala.map(_.get("md").asText()).toVector
    val benchSh = bench.map(shingles8).reduce(_ ++ _)
    val romance = corpus.base.filter(_._1.startsWith("/usr/share/locale/"))
    require(romance.nonEmpty, "no romance gettext docs found — nothing to extend with")
    val romSh = romance.map(d => shingles8(d._2)).reduce(_ ++ _)
    val shared = benchSh.intersect(romSh)
    println(s"romance docs: ${romance.length} langs, ${romance.map(_._2.length).sum} chars; " +
      s"benchmark shingles=${benchSh.size}, romance shingles=${romSh.size}, shared=${shared.size}")
    require(shared.isEmpty, s"romance corpus shares ${shared.size} 8-gram shingles with the benchmark")

    // replay the existing table verbatim, then continue
    val existing = new String(Files.readAllBytes(TrainBpe.MergesPath), "UTF-8")
      .split("\n").filter(_.nonEmpty).toVector
      .map { line =>
        val sp = line.indexOf(' ')
        (line.substring(0, sp).toInt, line.substring(sp + 1).toInt)
      }
    println(s"replaying ${existing.length} existing merges, extending to <= $maxMerges")
    val pieces = TrainBpe.pieceFreqs(corpus, fixtureWeight = 10L,
      manyRowsWeight = 11L, latinWeight = 256L, baseWeight = 8L)
    println(s"${pieces.size} distinct pretokens")
    val t0 = System.nanoTime()
    val table = TrainBpe.train(pieces, maxMerges, replay = existing,
      blocklist = TrainBpe.loadBlocklist())
    println(f"trained ${table.length - existing.length} new tail merges in ${(System.nanoTime() - t0) / 1e9}%.0f s")

    // English-parity gate on the would-be counting vocab
    val vocab = new graft.split.BpeVocab(table.toArray)
    val tk = new graft.split.BpeTokenizer(vocab, table.length)
    val cutOff = "This is a very long long text with many many words that produce " +
      "a lengthy sentence that is the input for the splitter."
    val n = tk.count(cutOff)
    println(s"cut_off count with extended table: $n (cl100k: 25)")
    require(n == 25, s"extended table broke English cut_off parity: $n != 25 — " +
      "blocklist the offending tail merge and re-run")

    TrainBpe.writeMerges(table)
    println(s"wrote ${table.length} merges")
  }
}
