package graft.split

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

class BpeSpec extends AnyFunSuite {

  // the COUNTING vocab (full trained table) — what budget contexts use
  // after the round-11 per-context granularity split (FIXTURES.md §1.5)
  private val tk = BpeTokenizer.counting()
  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/table_splitter/$name/input.md")
    try Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  test("measured out-of-domain divergence vs cl100k on tests/data/markdown.json (FIXTURES.md §1.5)") {
    // The reference's own e2e pins this corpus's cl100k chunking
    // (tests/steps/simple_splitter/e2e_simple_splitter_test.py:44-53):
    // 11 chunks, token_lens summing 2072 over 6701 chars = 3.23 chars per
    // cl100k token. The corpus is classical LATIN prose and is HELD OUT
    // of merge-table training (TrainBpe excludes the tests subtree), so
    // this stays an honest out-of-domain bound. The round-10 table (the
    // 7x-grown corpus: fixtures + reference markdown prose + the
    // benchmark-distinct Lorem-ipsum Latin incl. container package data
    // + German Wikipedia/CC0 HTML through HtmlToMd + license legalese +
    // Node.js API markdown, with CalibrateBpe's 16-entry fixture-parity
    // blocklist; round-13 re-pin to the 23,100 top-of-band point after
    // the full-table SweepParity proved the band's drift improves toward
    // its frozen top edge) lands at 13 chunks / 2.53 chars per token =
    // 1.299x token over-count — down from 1.301x (22,400 pin), 1.50x
    // (round-6b), 1.67x (round-6a,
    // English-only prose) and 1.86x (round-5 fixtures-only). The corpus
    // SIZE was the binding constraint (the old 250 KB mix exhausted its
    // merge pool at ~9k distinct pretokens); English prose drift is now
    // EXACT (see the cut-off pin below). This pin is the measured
    // bound — it is NOT parity; parity is certified only on the fixture
    // boundary windows (6/6 byte-exact).
    import scala.jdk.CollectionConverters._
    val in = getClass.getResourceAsStream("/markdown_corpus/markdown.json")
    val root = try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in) finally in.close()
    val docs = root.elements().asScala.map(_.get("md").asText()).toVector
    assert(docs.length == 7)
    val sp = SemanticSplitter.referenceDefault()
    val chunks = docs.flatMap(sp.splitMarkdown)
    // regression pin: a merge-table or splitter change that moves these
    // numbers must re-measure and update FIXTURES.md §1.5
    assert(chunks.length == 13)
    val ourTokens = chunks.map(c => sp.tk.count(c)).sum
    val ourChars = chunks.map(_.length).sum
    // chars moved 6809 -> 6807 in round 11: the mdformat escape pass now
    // drops unnecessary input escapes (two droppable escapes exist in the
    // Latin corpus); token count and chunk boundaries are unaffected.
    // tokens moved 2696 -> 2692 in round 13 (22,400 -> 23,100 re-pin)
    assert(ourTokens == 2692 && ourChars == 6807, s"tokens=$ourTokens chars=$ourChars")
    val refTokens = Seq(236, 74, 243, 278, 240, 225, 247, 136, 245, 67, 81).sum // = 2072
    val drift = ourTokens.toDouble / refTokens
    assert(drift > 1.2 && drift < 1.4, s"measured drift ratio moved: $drift")
  }

  test("counting vocab (full table) held-out drift <= 1.15x (per-context granularity split)") {
    // Round-11 split (FIXTURES.md §1.5): budget contexts (count / truncate /
    // packing / sharding) use the FULL trained table via
    // BpeTokenizer.counting(), which measures LOWER out-of-domain drift
    // than the fixture-parity prefix — the parity prefix trades drift
    // for golden chunk-boundary byte-parity, a trade only splitter
    // contexts need. Round 12 (ExtendBpe): the table extends past the
    // r11 30,442 merges with a tail trained on the Romance-language
    // gettext corpus (replayed prefix byte-identical, so parity is
    // untouched; zero shared 8-gram shingles with this benchmark) to
    // 59,472 merges. Same held-out Latin corpus as the test above,
    // chunked AND counted with the counting vocab (what a pure budget
    // pipeline sees): 12 chunks / 2363 tokens vs the reference's 2072
    // cl100k = 1.140x (was 1.245x r11), vs the parity prefix's 2692 =
    // 1.30x; English cut_off stays EXACT at cl100k's 25.
    import scala.jdk.CollectionConverters._
    val in = getClass.getResourceAsStream("/markdown_corpus/markdown.json")
    val root = try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in) finally in.close()
    val docs = root.elements().asScala.map(_.get("md").asText()).toVector
    val sp = new SemanticSplitter(256, 32, 64, tk = tk,
      repeatTableHeader = true, canonicalize = true, sentenceLeaves = true)
    val chunks = docs.flatMap(sp.splitMarkdown)
    assert(chunks.length == 12, s"chunks=${chunks.length}")
    val ourTokens = chunks.map(tk.count).sum
    assert(ourTokens == 2363, s"tokens=$ourTokens")
    val drift = ourTokens / 2072.0
    assert(drift <= 1.15, s"count-context drift exceeded the 1.15x budget: $drift")
    // and the two vocabs agree where it matters for budgets: fewer merges
    // can only raise counts, never lower them
    val parity = BpeTokenizer.parity()
    docs.foreach(d => assert(parity.count(d) >= tk.count(d)))
  }

  test("cut-off boundaries vs the reference's cut_off_test pins (second drift datapoint)") {
    // tests/splitter/cut_off_test.py:14-24 pins cl100k truncation of this
    // sentence: 10 tokens -> 44 chars, 20 tokens -> 100 chars, 100 -> whole
    // (118 chars, so cl100k counts it ~25 tokens). The round-10 table
    // counts this sentence at cl100k's own 25 tokens, and the 10-token
    // cut lands on cl100k's exact 44-char boundary (the 20-token cut
    // lands at 94 vs cl100k's 100 — same count, one word-boundary
    // earlier; was 28 tokens / 1.12x round-6b, 32 round-6a, 46 round-5);
    // `truncate = exact prefix` (the semantics under test there) holds
    // regardless of table.
    val s = "This is a very long long text with many many words that produce " +
      "a lengthy sentence that is the input for the splitter."
    assert(s.length == 118)
    Seq(10, 20, 100).foreach { n =>
      val t = tk.truncate(s, n)
      assert(s.startsWith(t), s"truncate($n) must be an exact prefix")
      assert(tk.count(t) <= n)
    }
    // regression pins (update FIXTURES.md §1.5 if the table changes)
    assert(tk.truncate(s, 10).length == 44, tk.truncate(s, 10).length) // == reference cl100k
    assert(tk.truncate(s, 20).length == 94, tk.truncate(s, 20).length) // reference cl100k: 100
    assert(tk.truncate(s, 100) == s)        // fits whole on both tables
    val drift = tk.count(s).toDouble / 25   // ~25 cl100k tokens
    assert(drift >= 1.0 && drift < 1.1, s"plain-prose drift moved: $drift")
  }

  test("decode(encode(s)) == s for fixture text, unicode, and edge cases") {
    val samples = Seq(
      fixture("many_rows_table"),
      fixture("long_table_and_long_text"),
      "", " ", "\n", "   \n\n  x", "don't stop",
      "Grüße aus Köln – naïve façade ✓ 日本語テスト",
      "prices: 1234567 items at $3.99 (≈ €3,50)",
      "| a | b |\n| --- | --- |\n| 1 | 2 |")
    samples.foreach { s =>
      assert(tk.decode(tk.encode(s)) == s, s"round-trip failed for: ${s.take(40)}")
    }
  }

  test("truncate returns an exact prefix (reference limit_token_count semantics)") {
    val s = fixture("table_and_text")
    for (n <- Seq(0, 1, 7, 50, 1000)) {
      val t = tk.truncate(s, n)
      assert(s.startsWith(t), s"truncate($n) not a prefix")
      assert(tk.count(t) <= n || t == s)
    }
    // count(truncate(s, n)) == n when s is long enough
    assert(tk.count(tk.truncate(s, 50)) == 50)
  }

  test("chunkTokens concatenates back to the original text byte-exact") {
    val s = fixture("many_columns_table")
    val chunks = tk.chunkTokens(s, 64)
    assert(chunks.mkString("") == s)
    // each non-final piece is EXACTLY 64 tokens of the original id stream
    // by construction; RE-encoding the decoded piece standalone may merge
    // differently right at the cut (a mid-pretoken boundary), so the
    // re-measured count is pinned to a +-1 boundary-token band, not ==
    chunks.init.foreach { c =>
      val n = tk.count(c)
      assert(n >= 63 && n <= 65, s"re-encoded piece count $n strayed from 64")
    }
  }

  test("pretokenization is a partition of the input (no bytes lost)") {
    val s = "Hello, world!  Don't 123 4567 \n\n  end "
    assert(Bpe.pretokens(s).mkString("") == s)
  }

  test("prefix-of-merge-table is a coarser valid tokenizer (nMerges knob)") {
    val small = BpeTokenizer.withMerges(200)
    val s = fixture("short_table")
    assert(small.decode(small.encode(s)) == s)
    assert(small.count(s) >= tk.count(s), "fewer merges must not shrink counts")
  }

  test("compression on in-domain text is subword-class, not char-class") {
    val s = fixture("many_rows_table")
    val words = s.split("\\s+").count(_.nonEmpty)
    val toks = tk.count(s)
    // cl100k lands ~1.3-2.0 tokens/word on markdown tables; a degenerate
    // char-level encoder would be ~5+. Pin the class, not the exact value.
    assert(toks.toDouble / words < 3.0, s"$toks tokens for $words words")
    assert(toks >= words, "BPE of natural text has at least ~1 token per word")
  }

  test("deterministic: two instances produce identical encodings") {
    val other = BpeTokenizer.counting()
    val s = fixture("standalone_table")
    assert(tk.encode(s).toSeq == other.encode(s).toSeq)
  }

  test("survives Java serialization (Spark closure shipping) and re-encodes identically") {
    // the vocab is @transient and reloads lazily from the classpath on the
    // executor side — round-trip through serialization like a task closure
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(tk); oos.close()
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bos.toByteArray))
    val revived = ois.readObject().asInstanceOf[BpeTokenizer]
    val s = fixture("table_and_text")
    assert(revived.encode(s).toSeq == tk.encode(s).toSeq)
    assert(revived.truncate(s, 40) == tk.truncate(s, 40))
  }
}
