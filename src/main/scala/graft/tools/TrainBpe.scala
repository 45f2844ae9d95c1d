package graft.tools

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.split.Bpe

/** Train the vendored byte-level BPE merge table (graft/split/Bpe.scala).
  *
  * Classic BPE training with cl100k-style pretokenization: count distinct
  * pretokens over the corpus, then repeatedly merge the most frequent
  * adjacent id pair (frequency-weighted by pretoken count). Ties break
  * deterministically on the smaller (a, b) pair, so the table is a pure
  * function of the corpus — which is the CHECKED-IN fixture inputs under
  * src/test/resources/table_splitter, making the artifact reproducible
  * offline. Because training is greedy-sequential, any prefix of the
  * emitted table is itself a valid smaller BPE (BpeTokenizer.nMerges).
  *
  * Usage: runMain graft.tools.TrainBpe [maxMerges] (default 4000)
  */
object TrainBpe {
  def main(args: Array[String]): Unit = {
    val maxMerges = args.headOption.map(_.toInt).getOrElse(4000)
    val base = Paths.get("src/test/resources/table_splitter")
    val corpus = Files.list(base).iterator().asScala.filter(Files.isDirectory(_))
      .toSeq.sortBy(_.getFileName.toString)
      .map(d => new String(Files.readAllBytes(d.resolve("input.md")), "UTF-8"))
      .mkString("\n\n")

    // distinct pretoken byte sequences with frequencies
    val pieceFreq = new scala.collection.mutable.HashMap[Vector[Int], Long]()
    Bpe.pretokens(corpus).foreach { p =>
      val ids = p.getBytes("UTF-8").map(_ & 0xff).toVector
      pieceFreq(ids) = pieceFreq.getOrElse(ids, 0L) + 1L
    }
    var pieces = pieceFreq.toVector

    val merges = Vector.newBuilder[(Int, Int)]
    var nextId = 256
    var iter = 0
    while (iter < maxMerges) {
      val pairFreq = new scala.collection.mutable.HashMap[(Int, Int), Long]()
      pieces.foreach { case (ids, f) =>
        var i = 0
        while (i < ids.length - 1) {
          val pr = (ids(i), ids(i + 1))
          pairFreq(pr) = pairFreq.getOrElse(pr, 0L) + f
          i += 1
        }
      }
      if (pairFreq.isEmpty) iter = maxMerges
      else {
        // deterministic argmax: highest freq, then smallest (a, b)
        val ((a, b), f) = pairFreq.toVector.minBy { case ((x, y), fr) => (-fr, x, y) }
        if (f < 2) iter = maxMerges // merging hapax pairs memorizes the corpus
        else {
          merges += ((a, b))
          pieces = pieces.map { case (ids, fr) =>
            val out = Vector.newBuilder[Int]
            var i = 0
            while (i < ids.length) {
              if (i < ids.length - 1 && ids(i) == a && ids(i + 1) == b) {
                out += nextId; i += 2
              } else { out += ids(i); i += 1 }
            }
            (out.result(), fr)
          }
          nextId += 1
          iter += 1
        }
      }
    }

    val table = merges.result()
    val outDir = Paths.get("src/main/resources/graft/bpe")
    Files.createDirectories(outDir)
    Files.write(outDir.resolve("merges.txt"),
      table.map { case (a, b) => s"$a $b" }.mkString("\n").getBytes("UTF-8"))
    println(s"trained ${table.length} merges from ${pieceFreq.size} distinct pretokens")
  }
}
