package graft.split

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

/** Property-based invariants for the text-processing kernels (scalacheck;
  * 200 cases per property, fixed seed-independent generators). */
class PropertySpec extends AnyFunSuite {

  private val params = Parameters.default.withMinSuccessfulTests(200)
  private def holds(p: Prop, name: String): Unit = {
    val r = check(params, p)
    assert(r.passed, s"$name: ${r.status}")
  }

  private val bpe = BpeTokenizer.counting()

  // strings mixing ascii, unicode letters, emoji-plane chars, and whitespace
  private val anyText: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', ' ', '\t', '\n'),
    2 -> Gen.oneOf('ä', 'ß', 'é', '日', '本', '語', '→', '€'),
    1 -> Gen.oneOf('|', '#', '*', '`', '.', '!', '-', '_'),
    1 -> Gen.choose('Ͱ', 'Ͽ') // greek block
  )).map(_.mkString)

  test("BPE: decode(encode(s)) == s for arbitrary unicode text") {
    holds(Prop.forAll(anyText)(s => bpe.decode(bpe.encode(s)) == s), "bpe round-trip")
  }

  test("whitespace fast count == tokens(s).length for arbitrary text (incl. unicode ws chars)") {
    val wsHeavy: Gen[String] = Gen.listOf(Gen.frequency(
      4 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', '\t', '\n', '\r', '\f', '\u000B'),
      // C0 controls <= U+0020: String.trim strips them at the ENDS but
      // regex \s never matches them - count() must mirror the trim
      1 -> Gen.oneOf('\u0001', '\u0007', '\u001F'),
      1 -> Gen.oneOf('ä', '日', '\u00A0', '\u2028'))).map(_.mkString)
    holds(Prop.forAll(wsHeavy)(s =>
      WhitespaceTokenizer.count(s) == WhitespaceTokenizer.tokens(s).length),
      "fast count equivalence")
  }

  test("BPE: truncate(s, n) is always a prefix with count <= n") {
    val gen = for { s <- anyText; n <- Gen.choose(0, 50) } yield (s, n)
    holds(Prop.forAll(gen) { case (s, n) =>
      val t = bpe.truncate(s, n)
      s.startsWith(t) && (bpe.count(t) <= n || t == s)
    }, "bpe truncate")
  }

  test("BPE: chunkTokens concatenates back byte-exact for arbitrary text") {
    // note: a re-encoded piece need not count exactly n tokens — BPE merges
    // act differently at cut boundaries (e.g. a split space run re-merges);
    // the invariant that matters for hard cuts is zero data loss
    val gen = for { s <- anyText; n <- Gen.choose(1, 20) } yield (s, n)
    holds(Prop.forAll(gen) { case (s, n) =>
      bpe.chunkTokens(s, n).mkString("") == s
    }, "bpe chunk concat")
  }

  test("MdFormatLite: normalize is idempotent on arbitrary input") {
    holds(Prop.forAll(anyText) { s =>
      val once = MdFormatLite.normalize(s)
      MdFormatLite.normalize(once) == once
    }, "mdformat idempotence")
  }

  test("MdFormatLite: idempotent on escape-dense input (R10-R14 stress)") {
    // heavy in exactly the characters the text-token escape pass touches:
    // emphasis markers, brackets, backslashes, backticks, ampersands with
    // real entity fragments, angle brackets with autolink/html fragments
    val escapey: Gen[String] = Gen.listOf(Gen.frequency(
      5 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', '\n'),
      3 -> Gen.oneOf('*', '_', '[', ']', '<', '>', '`', '&', '\\'),
      1 -> Gen.oneOf("&amp;", "&copy;", "&#65;", "&nope;", "**", "](u)",
        "<https://x.y>", "<div>", "`c`", "\\*", "\\\\"))).map(_.map {
      case c: Char => c.toString
      case s: String => s
    }.mkString)
    holds(Prop.forAll(escapey) { s =>
      val once = MdFormatLite.normalize(s)
      MdFormatLite.normalize(once) == once
    }, "mdformat escape-dense idempotence")
  }

  test("splitter: whitespace-mode chunks of a plain word doc preserve every token") {
    val words = Gen.listOfN(400, Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaChar).map(_.mkString)))
    holds(Prop.forAll(words) { ws =>
      val doc = ws.mkString(" ")
      val sp = new SemanticSplitter(tokenLimit = 64, buffer = 8, tokenMin = 1)
      val out = sp.splitMarkdown(doc).flatMap(c => WhitespaceTokenizer.tokens(c))
      out == ws.filter(_.nonEmpty)
    }, "splitter token preservation")
  }

  test("table splitter: random tables never cut mid-row, rows survive in order") {
    val cell = Gen.choose(1, 14).flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString))
    val table = for {
      nCols <- Gen.choose(2, 5)
      nRows <- Gen.choose(1, 30)
      header <- Gen.listOfN(nCols, cell)
      rows <- Gen.listOfN(nRows, Gen.listOfN(nCols, cell))
    } yield {
      def row(cs: List[String]) = cs.mkString("| ", " | ", " |")
      (row(header) + "\n" + List.fill(nCols)("---").mkString("| ", " | ", " |") +
        "\n" + rows.map(row).mkString("\n"), rows.map(row))
    }
    holds(Prop.forAll(table) { case (md, dataRows) =>
      val sp = new SemanticSplitter(tokenLimit = 40, buffer = 4, tokenMin = 1)
      val out = sp.splitMarkdown(md)
      val survived = out.flatMap(_.linesIterator)
        .map(_.trim).filter(l => dataRows.contains(l))
      // every data row appears (at least once: a row can double as a
      // repeated header slice never happens for data rows) and in order
      dataRows.forall(survived.contains) &&
        dataRows.map(r => survived.indexOf(r)).sliding(2).forall {
          case Seq(a, b) => a <= b
          case _ => true
        }
    }, "table rows survive")
  }

  test("referenceSplit: lossless on quote/bracket-free text (only the known quote-drop diverges)") {
    // the reference regex consumes closing quotes/brackets at boundaries
    // (reproduced bug-for-bug), so losslessness is asserted on text
    // without them: every non-whitespace char survives the split+merge
    val noQuotes: Gen[String] = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '\n', '\t'),
      1 -> Gen.oneOf('.', '!', '?', ',', ':', '-'))).map(_.mkString)
    holds(Prop.forAll(noQuotes) { s =>
      val joined = graft.functions.Sentences.referenceSplit(s).mkString(" ")
      joined.filterNot(_.isWhitespace) == s.filterNot(_.isWhitespace)
    }, "referenceSplit lossless")
  }

  test("sentences: split never loses characters outside separators") {
    holds(Prop.forAll(anyText) { s =>
      val joined = graft.functions.Sentences.split(s).mkString(" ")
      // every non-whitespace char of the trimmed input survives
      joined.filterNot(_.isWhitespace).length >= s.trim.filterNot(_.isWhitespace).length - 0
    }, "sentence char preservation")
  }

  test("canonicalizeUrl and normalizeText are idempotent (canonical forms are fixpoints)") {
    val spark = graft.TestSpark.spark
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val urlGen: Gen[String] = for {
      scheme <- Gen.oneOf("http", "HTTPS", "ftp")
      host <- Gen.oneOf("Example.COM", "x.io", "API.host.Org:8080", "h.io:443")
      path <- Gen.oneOf("", "/a/B", "/a/", "/p%20q")
      q <- Gen.oneOf("", "?b=2&a=1", "?utm_source=x&k=v", "?fbclid=1")
      frag <- Gen.oneOf("", "#sec")
    } yield s"$scheme://$host$path$q$frag"
    val textGen: Gen[String] = Gen.listOf(Gen.frequency(
      5 -> Gen.alphaNumChar, 1 -> Gen.oneOf('\u0301', '\u0007', '\t', ' ', '\u00e9')
    )).map(_.mkString)
    def once(c: org.apache.spark.sql.Column => org.apache.spark.sql.Column, vs: List[String]): List[String] =
      if (vs.isEmpty) Nil
      else vs.toDF("v").select(c(col("v")).as("o")).as[String].collect().toList
    // batch the generated cases through Spark in one pass per function
    val urls = Gen.listOfN(60, urlGen).sample.get
    val u1 = once(graft.functions.text.canonicalizeUrl, urls)
    assert(once(graft.functions.text.canonicalizeUrl, u1) == u1)
    val texts = Gen.listOfN(60, textGen).sample.get
    val t1 = once(graft.functions.text.normalizeText, texts)
    assert(once(graft.functions.text.normalizeText, t1) == t1)
  }

  test("gopherStats: count invariants hold on arbitrary text") {
    import graft.functions.Kernels
    val stop = Set("the", "a", "is")
    // constrain to the \s whitespace class so the independent
    // replaceAll("\\s","") recomputation means the same thing
    val text: Gen[String] = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '\n', '\t'),
      1 -> Gen.oneOf('.', '-', '*'))).map(_.mkString)
    holds(Prop.forAll(text) { s =>
      val (nTok, lenNoWs, nAlpha, nStop, nDistinct, nLines, nBullet, nEll) =
        Kernels.gopherStats(s, stop)
      val expectNoWs = s.replaceAll("\\s", "")
      nTok >= nDistinct && nDistinct >= (if (nTok > 0) 1L else 0L) &&
        nAlpha <= nTok && nStop <= nTok &&
        lenNoWs == expectNoWs.codePointCount(0, expectNoWs.length) &&
        nBullet <= nLines && nEll <= nLines &&
        nLines == s.split("\n", -1).length.toLong
    }, "gopherStats invariants")
  }
}
