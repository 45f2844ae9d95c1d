package graft.split

import graft.contracts.{Chunk, MarkdownDoc}

/** Structure-aware token-bounded markdown splitting (SURVEY.md §2.10;
  * reference wurzel/utils/splitters/semantic_splitter.py, 812 LoC).
  *
  * Pipeline stages preserved from the reference:
  *  1. block hierarchy parse with level ranking (MarkdownBlocks);
  *  2. greedy token-bounded assembly: accumulate while below
  *     limit-buffer, emit inside [limit-buffer, limit+buffer], recurse into
  *     oversized sections at the next boundary level, hard-cut leaves
  *     (semantic_splitter.py:602-702, 583-599);
  *  3. table-aware split — never mid-row, header re-emitted (TableSplitter);
  *  4. running-header carry: the highest previously seen heading per level
  *     is re-attached as a `# H1 - H2` prefix when a chunk starts deeper
  *     (semantic_splitter.py:704-761); standalone-heading chunks dropped;
  *  5. metadata stamping: chunk_index, chunks_count, token_len, char_len,
  *     source_sha256_hash (763-798). mdformat canonicalization is replaced
  *     by whitespace-trim (no JVM mdformat in the offline build — divergence
  *     documented in FIXTURES.md §1.5).
  *
  * Defaults match the reference splitter step: limit 256, buffer 32,
  * min 64 (semantic_splitter.py:181-189, steps/splitter.py:28-33).
  *
  * Bound: chunk bodies respect tokenLimit+buffer; a carried-header prefix
  * (stage 4) is attached AFTER assembly — as in the reference — so a chunk
  * that receives a prefix can exceed the bound by the prefix's own tokens.
  */
object SemanticSplitter {
  /** The reference-equivalent configuration: BPE token counting (calibrated
    * merge table), mdformat canonicalization of final chunks, and
    * sentence-level leaf descent — `SemanticSplitter()` in the reference
    * (cl100k + mdformat + sentence model, semantic_splitter.py:181-189)
    * maps to this. This is the config FixtureSpec proves byte-equal to the
    * reference's fixture goldens. The primary constructor's defaults keep
    * the engine's oracle-pinned plain-text contract (whitespace tokens, no
    * canonicalization) — see q43. */
  def referenceDefault(
      tokenLimit: Int = 256, buffer: Int = 32, tokenMin: Int = 64,
      repeatTableHeader: Boolean = true): SemanticSplitter =
    new SemanticSplitter(tokenLimit, buffer, tokenMin,
      tk = BpeTokenizer.parity(), repeatTableHeader = repeatTableHeader,
      canonicalize = true, sentenceLeaves = true)
}

class SemanticSplitter(
    val tokenLimit: Int = 256,
    val buffer: Int = 32,
    val tokenMin: Int = 64,
    val tk: Tokenizer = WhitespaceTokenizer,
    val repeatTableHeader: Boolean = true,
    val canonicalize: Boolean = false,
    /** Sentence-level leaves (reference semantic_splitter.py:404-431: when a
      * node has no more block structure, its children are sentences and
      * chunks accumulate sentence-by-sentence into the token window).
      * Opt-in: the default keeps the plain-text corpus contract (q43 pins
      * 256-token hard cuts) byte-stable; q55 oracle-checks this path. */
    val sentenceLeaves: Boolean = false) extends Serializable {

  private val hardMax = tokenLimit + buffer
  private val softMin = tokenLimit - buffer

  /** mdformat-lite pass on final chunks (reference _format_markdown_docs,
    * semantic_splitter.py:107-119 — every chunk is mdformat.text'd then
    * stripped). Opt-in: the plain-text corpus contract (q43) pins
    * non-canonicalized bytes. */
  private def finish(chunks: Vector[String]): Vector[String] =
    if (canonicalize) chunks.map(MdFormatLite.normalize).filter(_.nonEmpty) else chunks

  /** Split markdown into chunk texts (stage 1-4). */
  def splitMarkdown(md: String): Vector[String] = {
    val canonical = md.trim
    if (canonical.isEmpty) return Vector.empty
    if (tk.count(canonical) <= hardMax) return finish(Vector(canonical))
    val blocks = MarkdownBlocks.parse(canonical)
    // Reference routing (semantic_splitter.py:628-646): when the strongest
    // top-level block is a table (no heading/list/fence outranks it), the
    // WHOLE document runs through the line-based table splitter at
    // token_limit — text between tables packs into the same chunks, and no
    // token-min filter applies to its output.
    if (blocks.nonEmpty && blocks.map(_.level).min == 9)
      return finish(
        TableSplitter.splitDocument(canonical, tokenLimit, tk, repeatTableHeader)
          .map(_.trim).filter(_.nonEmpty))
    val pieces = assemble(blocks, MaxDepth)
    // chunks under token_limit_min are skipped (reference 616-619); a doc
    // short enough to stay whole never reaches this filter (early return).
    finish(attachHeaders(blocks, pieces)
      .filter(c => !isStandaloneHeading(c))
      .filter(c => tk.count(c) >= tokenMin))
  }

  // ---- stage 2: token-bounded assembly -----------------------------------

  /** Maximum nested-structure recursion depth (reference
    * `_markdown_hierarchy_parser` max_depth=30 guard,
    * semantic_splitter.py:387-395). The reference returns the node whole at
    * depth 0 (logging "maximal markdown recursion reached"), which can emit
    * an over-limit chunk; this engine hard-cuts instead so the token bound
    * holds — documented divergence. */
  private val MaxDepth = 30

  /** Greedy assembly over a block list; oversized single blocks recurse. */
  private def assemble(blocks: Vector[Block], depth: Int): Vector[String] = {
    val out = Vector.newBuilder[String]
    var buf = Vector.empty[String]
    var bufTokens = 0
    def flush(): Unit = {
      if (buf.nonEmpty) { out += buf.mkString("\n\n"); buf = Vector.empty; bufTokens = 0 }
    }
    // Sections bounded by the strongest (lowest-level) block type present —
    // reference _find_highest_level / _split_children (277-362).
    val boundary = blocks.map(_.level).min
    val sections = splitAtBoundaries(blocks, boundary)
    sections.foreach { section =>
      val text = render(section)
      val t = tk.count(text)
      if (t > hardMax) {
        flush()
        out ++= splitSection(section, depth)
      } else if (bufTokens + t > hardMax) {
        flush()
        buf = Vector(text); bufTokens = t
      } else {
        buf = buf :+ text; bufTokens += t
        if (bufTokens >= softMin) flush()
      }
    }
    flush()
    out.result()
  }

  /** One oversized section: recurse below its boundary block, table-split
    * tables, descend lists through nested item levels (reference ListItem
    * level 11 + nested List recursion, semantic_splitter.py:277-445),
    * unwrap blockquotes, sentence-pack or hard-cut oversized leaves
    * (reference 583-599). */
  private def splitSection(section: Vector[Block], depth: Int): Vector[String] = {
    section.flatMap {
      case t: TableBlock if tk.count(t.text) > hardMax =>
        TableSplitter.split(t, hardMax, tk, repeatTableHeader)
      case l: ListBlock if tk.count(l.text) > hardMax =>
        // item-boundary descent, recursing into nested list levels; the
        // re-pack below merges small items back together
        descendList(l.text, depth - 1)
      case q: QuoteBlock if tk.count(q.text) > hardMax =>
        descendQuote(q.text, depth - 1)
      case b if tk.count(b.text) > hardMax =>
        b match {
          case p: Paragraph => splitLeaf(p.text)
          case c: CodeFence => hardCut(c.text)
          case other => splitLeaf(other.text)
        }
      case b => Vector(b.text)
    } match {
      case pieces =>
        // re-run greedy packing over the pieces so small leftovers merge
        val out = Vector.newBuilder[String]
        var buf = Vector.empty[String]
        var bufTokens = 0
        def flush(): Unit =
          if (buf.nonEmpty) { out += buf.mkString("\n\n"); buf = Vector.empty; bufTokens = 0 }
        pieces.foreach { p =>
          val t = tk.count(p)
          if (t > hardMax || bufTokens + t > hardMax) {
            flush()
            if (t > hardMax) out += p else { buf = Vector(p); bufTokens = t }
          } else {
            buf = buf :+ p; bufTokens += t
            if (bufTokens >= softMin) flush()
          }
        }
        flush()
        out.result()
    }
  }

  /** Hard token cut of a leaf (reference _md_data_from_dict_cut 583-599 —
    * discarded-text logging becomes caller-side metrics; unlike the
    * reference this keeps the tail instead of discarding it). */
  private def hardCut(text: String): Vector[String] =
    tk.chunkTokens(text, tokenLimit)

  /** Leaf splitting: sentence accumulation into the token window when
    * enabled (reference sentence-children flow — sentences join with \n,
    * emit inside [limit-buffer, limit+buffer], an oversized single
    * sentence still hard-cuts), else hard cut. */
  private def splitLeaf(text: String): Vector[String] = {
    if (!sentenceLeaves) return hardCut(text)
    val sents = graft.functions.Sentences.split(text)
    if (sents.length <= 1) return hardCut(text)
    val out = Vector.newBuilder[String]
    var buf = Vector.empty[String]
    var bufT = 0
    def flush(): Unit =
      if (buf.nonEmpty) { out += buf.mkString("\n"); buf = Vector.empty; bufT = 0 }
    sents.foreach { s =>
      val t = tk.count(s)
      if (t > hardMax) { flush(); out ++= hardCut(s) }
      else if (bufT + t > hardMax) { flush(); buf = Vector(s); bufT = t }
      else {
        buf = buf :+ s; bufT += t
        if (bufT >= softMin) flush()
      }
    }
    flush()
    out.result()
  }

  private val MarkerRe = "^(\\s*)([-*+]|\\d+[.)])\\s+.*$".r

  /** Space-indent of a list-item marker line, -1 for non-marker lines. */
  private def markerIndent(line: String): Int = line match {
    case MarkerRe(ws, _) if !ws.contains('\t') => ws.length
    case _ => -1
  }

  /** Recursive nested-list descent (reference `_split_children` +
    * `_markdown_hierarchy_parser`, semantic_splitter.py:324-362, 372-445:
    * an oversized List splits at its ListItem(11) boundaries, an oversized
    * item descends into ITS nested List, and so on to the max-depth
    * guard). Split points are item markers at the shallowest indent that
    * yields progress (>= 2 pieces); pre-marker continuation lines stay with
    * the preceding piece, exactly as the reference keeps a ListItem's
    * leading paragraph with the item when splitting at the nested list. */
  private def descendList(text: String, depth: Int): Vector[String] = {
    if (tk.count(text) <= hardMax) return Vector(text)
    if (depth <= 0) return splitLeaf(text)
    val lines = text.split("\n", -1).toVector
    val indents = lines.map(markerIndent).filter(_ >= 0).distinct.sorted
    val usable = indents.find { ind =>
      val markers = lines.count(l => markerIndent(l) == ind)
      // progress requires >= 2 pieces: a lone marker on the first line
      // would regroup into the same text forever
      if (markerIndent(lines.head) == ind) markers >= 2 else markers >= 1
    }
    usable match {
      case None => splitLeaf(text) // no sub-structure left: sentence/hard cut
      case Some(ind) =>
        val pieces = Vector.newBuilder[Vector[String]]
        var cur = Vector.empty[String]
        lines.foreach { l =>
          if (markerIndent(l) == ind && cur.nonEmpty) { pieces += cur; cur = Vector(l) }
          else cur = cur :+ l
        }
        if (cur.nonEmpty) pieces += cur
        pieces.result().flatMap(p => descendList(p.mkString("\n"), depth - 1))
    }
  }

  private val QuoteMarkerRe = "^\\s{0,3}>\\s?".r

  /** Blockquote descent: the reference's single-child recursion unwraps the
    * Quote into its inner blocks and re-renders them WITHOUT the quote
    * markers (mistletoe `_split_children` 324-328 + `_render_doc`) — so one
    * marker level is stripped and the inner markdown re-enters block
    * assembly. */
  private def descendQuote(text: String, depth: Int): Vector[String] = {
    if (depth <= 0) return splitLeaf(text)
    val inner = text.linesIterator
      .map(l => QuoteMarkerRe.replaceFirstIn(l, "")).mkString("\n").trim
    if (inner.isEmpty) return Vector.empty
    val innerBlocks = MarkdownBlocks.parse(inner)
    // A quote wrapping a SINGLE block still descends by that block's own
    // structure (reference single-child recursion, _split_children
    // semantic_splitter.py:324-328): a blockquoted oversized list/table gets
    // item/row-boundary descent, not a mid-sentence hard cut. splitSection
    // handles ListBlock/TableBlock/Paragraph and is depth-guarded.
    if (innerBlocks.length <= 1) splitSection(innerBlocks, depth - 1)
    else assemble(innerBlocks, depth - 1)
  }

  private def splitAtBoundaries(blocks: Vector[Block], boundary: Int): Vector[Vector[Block]] = {
    val out = Vector.newBuilder[Vector[Block]]
    var cur = Vector.empty[Block]
    blocks.foreach { b =>
      if (b.level == boundary && cur.nonEmpty) { out += cur; cur = Vector(b) }
      else cur = cur :+ b
    }
    if (cur.nonEmpty) out += cur
    out.result()
  }

  private def render(blocks: Vector[Block]): String = blocks.map(_.text).mkString("\n\n")

  // ---- stage 4: running-header carry -------------------------------------

  private val HeadingLineRe = "^(#{1,6})\\s+(.*)$".r

  private def isStandaloneHeading(chunk: String): Boolean =
    chunk.linesIterator.toSeq match {
      case Seq(only) => HeadingLineRe.findFirstIn(only.trim).isDefined
      case _ => false
    }

  /** Walk chunks in document order, carrying the latest heading text per
    * level; prefix `# H1 - H2` when a chunk starts with a deeper heading or
    * none (reference 704-761, prefix format 731-733). */
  private def attachHeaders(blocks: Vector[Block], chunks: Vector[String]): Vector[String] = {
    val carried = scala.collection.mutable.TreeMap[Int, String]()
    chunks.map { chunk =>
      val firstHeading = chunk.linesIterator.collectFirst {
        case HeadingLineRe(h, t) => (h.length, t.trim)
      }
      val prefixLevels = firstHeading match {
        case Some((depth, _)) => carried.rangeUntil(depth).values.toSeq
        case None => carried.values.toSeq
      }
      // update carried state with every heading in this chunk
      chunk.linesIterator.foreach {
        case HeadingLineRe(h, t) =>
          val d = h.length
          carried(d) = t.trim
          carried.keys.filter(_ > d).toSeq.foreach(carried.remove) // deeper headers reset
        case _ => ()
      }
      if (prefixLevels.nonEmpty && !chunk.startsWith("# "))
        s"# ${prefixLevels.mkString(" - ")}\n\n$chunk"
      else chunk
    }
  }

  // ---- stage 5: document-level API with metadata -------------------------

  def splitDoc(doc: MarkdownDoc): Seq[Chunk] = {
    val sourceHash = graft.functions.Kernels.md5Hex(doc.md) // cheap id for tests
    val sha256 = java.security.MessageDigest.getInstance("SHA-256")
      .digest(doc.md.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val texts = splitMarkdown(doc.md)
    val n = texts.length
    texts.zipWithIndex.map { case (text, i) =>
      Chunk(
        md = text,
        keywords = doc.keywords,
        url = doc.url,
        metadata = doc.metadata ++ Map(
          "chunk_index" -> i.toString,
          "chunks_count" -> n.toString,
          "token_len" -> tk.count(text).toString,
          "char_len" -> text.length.toString,
          "source_md5" -> sourceHash,
          "source_sha256_hash" -> sha256))
    }
  }
}
