package graft.split

/** mdformat-style TEXT-token escaping (the R10-R14 rule family of
  * [[MdFormatLite]]; reference semantic_splitter.py:107-119 runs
  * `mdformat.text` whose renderer escapes characters in text tokens that
  * could be re-parsed as markdown syntax — mdformat's public
  * `renderer/_default_renderers.text` + `_util.escape_*` semantics).
  *
  * Model: a block is scanned left-to-right into inline elements the way
  * CommonMark's inline pass consumes them —
  *
  *   - backslash escape sequences `\p` (p ASCII punctuation): the
  *     escape's CHAR is text content — it is DECODED to that character
  *     and re-escaped only where the render context demands it, exactly
  *     like mdformat's renderer (which drops escapes its context deems
  *     unnecessary: `a\,b` -> `a,b`, but `a\*b` stays `a\*b`);
  *   - a backslash immediately before a newline is a CommonMark HARD
  *     LINE BREAK, not an escape and not a literal backslash — it
  *     passes through verbatim (mdformat preserves backslash breaks);
  *   - character references `&name;` / `&#n;` / `&#xh;`: DECODED to their
  *     characters (CommonMark inline semantics; the HTML5 entity list is
  *     the `graft/md/html5_entities.tsv` resource, generated from the
  *     published WHATWG table), and the decoded characters are then
  *     escaped like any text character;
  *   - code spans (backtick-run + equal-length closer), autolinks
  *     `<scheme:..>` / `<mail@..>`, and inline HTML tags/comments:
  *     VERBATIM — their bytes are not text tokens;
  *   - inline links / images / reference links: destination and
  *     reference bytes are VERBATIM, but the LABEL is an inline text
  *     context of its own — its content re-renders through this same
  *     pass (mdformat escapes specials inside labels);
  *   - everything else: text characters.
  *
  * Characters that reached the text stream DECODED (from an escape or a
  * character reference) get two extra context rules plain chars never
  * need (the block grouper claims real markers before the text pass):
  * line-start block-syntax chars (`#` `-` `+` `>`, and `*` before
  * whitespace) re-escape, and `.` / `)` re-escape when they would
  * complete an ordered-list marker (line is 1-9 digits, whitespace or
  * end follows). A decoded `!` directly before a link re-escapes so the
  * pair cannot re-parse as an image.
  *
  * Emphasis delimiters (`*` / `_` runs of plain text chars) are then
  * matched per CommonMark's flanking + rule-of-three algorithm; MATCHED
  * delimiters render verbatim (mdformat renders emphasis with the source
  * markup), and every OTHER special in text renders escaped:
  *
  *   R10. `\`  -> `\\` (literal backslash, e.g. before a letter)
  *   R11. unmatched `*` / `_` -> escaped UNLESS both neighbors inside
  *        the text run are whitespace-or-boundary (mdformat's
  *        escape_asterisk/underscore_emphasis rule; a token boundary —
  *        code span, link, block edge — counts as whitespace)
  *   R12. `[` `]` -> `\[` `\]` (subsumes the round-8 R9 rule)
  *   R13. `<` -> `\<`; `` ` `` -> ``\` `` (unmatched backtick leftovers)
  *   R14. `&` -> `\&` when the following text would re-parse as a
  *        character reference (numeric or HTML5-named)
  *
  * Idempotent by construction: every escape this pass emits re-enters
  * the scanner as an escape sequence and is preserved; matched emphasis
  * re-matches.
  */
private[split] object MdTextEscapes {

  /** HTML5 named references (name -> replacement), from the checked-in
    * resource generated off the published WHATWG entity table. */
  private lazy val entities: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](4096)
    val in = getClass.getResourceAsStream("/graft/md/html5_entities.tsv")
    if (in != null) {
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try src.getLines().foreach { l =>
        val t = l.indexOf('\t')
        if (t > 0) m.put(l.substring(0, t), l.substring(t + 1))
      } finally src.close()
    }
    m
  }

  private def isAsciiPunct(c: Char): Boolean =
    "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".indexOf(c) >= 0

  /** CommonMark "Unicode punctuation" (P* categories or ASCII punct). */
  private def isPunct(c: Char): Boolean = isAsciiPunct(c) || {
    val t = Character.getType(c)
    t == Character.CONNECTOR_PUNCTUATION || t == Character.DASH_PUNCTUATION ||
    t == Character.END_PUNCTUATION || t == Character.FINAL_QUOTE_PUNCTUATION ||
    t == Character.INITIAL_QUOTE_PUNCTUATION || t == Character.OTHER_PUNCTUATION ||
    t == Character.START_PUNCTUATION
  }

  private def isWs(c: Char): Boolean = Character.isWhitespace(c)

  // Anchored java Patterns probed with matcher.region(i, n) +
  // lookingAt() — NO substring per candidate position (a bracket-heavy
  // megabyte document would otherwise pay O(n) char copying per '['/
  // '<'/'&', O(n^2) total on an executor).
  // autolink: <scheme:...> or <addr@host>; inline html: tags + comments
  private val AutolinkRe = java.util.regex.Pattern.compile(
    "<(?:[A-Za-z][A-Za-z0-9+.-]{1,31}:[^<>\\s]*|[^<>\\s@]+@[^<>\\s]+\\.[^<>\\s]+)>")
  private val HtmlTagRe = java.util.regex.Pattern.compile(
    "</?[A-Za-z][A-Za-z0-9-]*(?:\\s[^<>]*)?/?>|<!--[\\s\\S]*?-->")
  // inline/reference link or image, same shape MdFormatLite protects
  private val LinkRe = java.util.regex.Pattern.compile(
    "!?\\[[^\\[\\]]*\\]" +
      "(?:\\([^()]*(?:\\([^()]*\\)[^()]*)*\\)|\\[[^\\[\\]]*\\])")
  private val NumRefRe = java.util.regex.Pattern.compile(
    "&#(?:[0-9]{1,7}|[Xx][0-9A-Fa-f]{1,6});")
  private val NamedRefRe = java.util.regex.Pattern.compile(
    "&([A-Za-z][A-Za-z0-9]{1,31});")

  /** lookingAt() the pattern at position i; returns the match end or -1. */
  private def probeAt(p: java.util.regex.Pattern, s: String, i: Int): Int = {
    val m = p.matcher(s)
    m.region(i, s.length)
    if (m.lookingAt()) m.end else -1
  }

  /** One scanned element. For text chars, `origin` distinguishes how the
    * char reached the content stream (it changes render + syntax rules). */
  private final val OriginPlain = 0
  private final val OriginEscaped = 1 // from a \p escape sequence
  private final val OriginEntity = 2 // from a decoded character reference

  private sealed trait Item
  private final case class Verbatim(raw: String) extends Item
  private final case class TextChar(c: Char, origin: Int) extends Item

  /** Decode a reference at s(i) (must be '&'); returns (replacement,
    * consumedLength) or null. */
  private def reference(s: String, i: Int): (String, Int) = {
    val numEnd = probeAt(NumRefRe, s, i)
    if (numEnd >= 0) {
      val body = s.substring(i + 2, numEnd - 1)
      val cp =
        try {
          if (body.charAt(0) == 'x' || body.charAt(0) == 'X')
            Integer.parseInt(body.substring(1), 16)
          else Integer.parseInt(body)
        } catch { case _: NumberFormatException => -1 }
      val repl =
        if (cp <= 0 || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) "�"
        else new String(Character.toChars(cp))
      (repl, numEnd - i)
    } else {
      val m = NamedRefRe.matcher(s)
      m.region(i, s.length)
      if (!m.lookingAt()) null
      else {
        val repl = entities.get(m.group(1))
        if (repl == null) null else (repl, m.end - i)
      }
    }
  }

  /** Decode backslash escapes AND character references to plain chars —
    * the spelling-INSENSITIVE view MdFormatLite's block-shape
    * classifiers probe (a shape test must read "\\>", "&#62;" and ">"
    * identically: the escape pass re-spells entity forms into backslash
    * forms, and a classification that sees one spelling but not the
    * other flips between passes — deep-fuzz r13 find). A shape probe,
    * not a renderer: verbatim constructs are not protected. */
  private[split] def decodeSpellings(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length && isAsciiPunct(s.charAt(i + 1))) {
        b.append(s.charAt(i + 1)); i += 2
      } else if (c == '&') {
        val r = reference(s, i)
        if (r == null) { b.append(c); i += 1 }
        else { b.append(r._1); i += r._2 }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Scan a block into inline elements (CommonMark consumption order:
    * escapes, code spans, autolinks/html, links, references, text). */
  private def scan(s: String): Vector[Item] = {
    val items = Vector.newBuilder[Item]
    val n = s.length
    // once a closer search for run length L fails, every later search for
    // L fails too (it starts further right) — memoizing keeps adversarial
    // all-backtick input from rescanning the tail per run (CommonMark
    // parsers make the same note)
    val noCloser = new java.util.HashSet[Int]()
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < n && s.charAt(i + 1) == '\n') {
        // CommonMark hard line break: NOT an escape (newline is not
        // punctuation) and NOT a literal backslash — mdformat preserves
        // backslash breaks (it even normalizes two-space breaks to them)
        items += Verbatim("\\"); i += 1
      } else if (c == '\\' && i + 1 < n && isAsciiPunct(s.charAt(i + 1))) {
        items += TextChar(s.charAt(i + 1), OriginEscaped); i += 2
      } else if (c == '`') {
        var l = i
        while (l < n && s.charAt(l) == '`') l += 1
        val runLen = l - i
        // find a closer run of EXACTLY runLen
        var j = l
        var close = -1
        if (!noCloser.contains(runLen)) {
          while (close < 0 && j < n) {
            if (s.charAt(j) == '`') {
              var k = j
              while (k < n && s.charAt(k) == '`') k += 1
              if (k - j == runLen) close = j else j = k
            } else j += 1
          }
          if (close < 0) noCloser.add(runLen): Unit
        }
        if (close >= 0) { items += Verbatim(s.substring(i, close + runLen)); i = close + runLen }
        else { (0 until runLen).foreach(_ => items += TextChar('`', OriginPlain)); i = l }
      } else if (c == '&') {
        val r = reference(s, i)
        if (r == null) { items += TextChar('&', OriginPlain); i += 1 }
        else { r._1.foreach(ch => items += TextChar(ch, OriginEntity)); i += r._2 }
      } else if (c == '<') {
        val end = {
          val a = probeAt(AutolinkRe, s, i)
          if (a >= 0) a else probeAt(HtmlTagRe, s, i)
        }
        if (end >= 0) { items += Verbatim(s.substring(i, end)); i = end }
        else { items += TextChar('<', OriginPlain); i += 1 }
      } else if (c == '[' || (c == '!' && i + 1 < n && s.charAt(i + 1) == '[')) {
        val end = probeAt(LinkRe, s, i)
        if (end >= 0) {
          // destination/reference bytes stay verbatim; the LABEL is its
          // own inline text context and re-renders through this pass
          // (LinkRe guarantees the label holds no brackets, so the
          // recursion cannot find another link and terminates)
          val raw = s.substring(i, end)
          val lb = raw.indexOf('[')
          val rb = raw.indexOf(']')
          items += Verbatim(raw.substring(0, lb + 1) +
            renderInline(raw.substring(lb + 1, rb), lineStartAtZero = false) +
            raw.substring(rb))
          i = end
        }
        else { items += TextChar(c, OriginPlain); i += 1 }
      } else { items += TextChar(c, OriginPlain); i += 1 }
    }
    items.result()
  }

  private final case class Delim(idx: Int, ch: Char, origLen: Int,
                                 canOpen: Boolean, canClose: Boolean,
                                 var remaining: Int, var consumedLeft: Int)

  /** CommonMark delimiter-run matching; returns the set of item indices
    * whose delimiter chars are MATCHED emphasis markers. */
  private def matchEmphasis(items: Vector[Item]): java.util.BitSet = {
    val matched = new java.util.BitSet(items.length)
    // visible neighbor char of an item (for flanking)
    def charOf(it: Item, last: Boolean): Char = it match {
      case TextChar(c, _) => c
      case Verbatim(raw) => if (last) raw.charAt(raw.length - 1) else raw.charAt(0)
    }
    // collect maximal runs of plain * / _
    val delims = Vector.newBuilder[Delim]
    var i = 0
    while (i < items.length) {
      items(i) match {
        case TextChar(ch, OriginPlain) if ch == '*' || ch == '_' =>
          var j = i
          while (j < items.length && (items(j) match {
            case TextChar(`ch`, OriginPlain) => true; case _ => false
          })) j += 1
          val len = j - i
          val prev = if (i == 0) ' ' else charOf(items(i - 1), last = true)
          val next = if (j >= items.length) ' ' else charOf(items(j), last = false)
          val wsB = isWs(prev); val wsA = isWs(next)
          val pB = isPunct(prev); val pA = isPunct(next)
          val leftF = !wsA && (!pA || wsB || pB)
          val rightF = !wsB && (!pB || wsA || pA)
          val (canOpen, canClose) =
            if (ch == '*') (leftF, rightF)
            else (leftF && (!rightF || pB), rightF && (!leftF || pA))
          delims += Delim(i, ch, len, canOpen, canClose, len, 0)
          i = j
        case _ => i += 1
      }
    }
    val ds = delims.result().toArray
    // process: for each closer, walk back to nearest compatible opener.
    // workBudget bounds the quadratic opener walk (adversarial web text —
    // e.g. megabytes of alternating "*a" — would otherwise be O(d^2) per
    // block on an executor); past the budget, remaining delimiters stay
    // unmatched and render escaped, which is content-preserving and
    // deterministic. Normal prose never comes close.
    var workBudget = 2000000L
    var ci = 0
    while (ci < ds.length && workBudget > 0) {
      val closer = ds(ci)
      if (closer.canClose) {
        var oi = ci - 1
        while (closer.remaining > 0 && oi >= 0 && workBudget > 0) {
          workBudget -= 1
          val opener = ds(oi)
          val ruleOf3Blocked =
            (closer.canOpen || opener.canClose) &&
              (opener.origLen + closer.origLen) % 3 == 0 &&
              !(opener.origLen % 3 == 0 && closer.origLen % 3 == 0)
          if (opener.ch == closer.ch && opener.canOpen &&
              opener.remaining > 0 && !ruleOf3Blocked) {
            while (opener.remaining > 0 && closer.remaining > 0) {
              val take = math.min(2, math.min(opener.remaining, closer.remaining))
              // opener consumes from its RIGHT edge, closer from its LEFT
              (0 until take).foreach { k =>
                matched.set(opener.idx + opener.remaining - 1 - k)
                matched.set(closer.idx + closer.consumedLeft + k)
              }
              opener.remaining -= take
              closer.remaining -= take
              closer.consumedLeft += take
            }
          }
          oi -= 1
        }
      }
      ci += 1
    }
    matched
  }

  /** Render one block's worth of text with mdformat's text-token escapes
    * (R10-R14). Block-level structure (headings, tables, fences) is the
    * caller's concern — this is the inline/text layer. */
  def render(s: String): String = renderInline(s, lineStartAtZero = true)

  /** @param lineStartAtZero whether position 0 is a LINE start (false when
    *        rendering a link label, which begins mid-line). */
  private def renderInline(s: String, lineStartAtZero: Boolean): String = {
    // fast path: nothing escapable ('#' is here for the ATX
    // closing-sequence guard — a heading title ending " #" needs the
    // escape pass even when no other special is present)
    var has = false
    var p = 0
    while (!has && p < s.length) {
      val c = s.charAt(p)
      has = c == '\\' || c == '*' || c == '_' || c == '[' || c == ']' ||
        c == '<' || c == '`' || c == '&' || c == '#'
      p += 1
    }
    if (!has) return s

    val items = scan(s)
    val matched = matchEmphasis(items)
    val out = new StringBuilder(s.length + 16)
    // neighbor view for the *_ whitespace rule: within a contiguous text
    // run; Verbatim, block edge, or a MATCHED emphasis delimiter counts
    // as a boundary (mdformat sees token boundaries as None — a leftover
    // `*` right next to `**bold**` stays unescaped)
    def neighbor(i: Int, step: Int): Char = {
      val j = i + step
      if (j < 0 || j >= items.length || matched.get(j)) ' '
      else items(j) match {
        case TextChar(c, _) => c
        case _: Verbatim => ' '
      }
    }
    // decoded downstream text of the current text run (for the & rule)
    def downstream(i: Int): String = {
      val sb = new StringBuilder(34)
      var j = i
      while (j < items.length && sb.length <= 33) {
        items(j) match {
          case TextChar(c, _) => sb.append(c)
          case _: Verbatim => j = items.length
        }
        j += 1
      }
      sb.toString
    }
    // any digit of the run rendered immediately before item i reached
    // the text stream DECODED (escape/entity) — pairing with a plain
    // '.'/')' it would still mint an ordered-list marker on re-parse
    def decodedDigitRun(i0: Int): Boolean = {
      var j = i0 - 1
      var any = false
      var more = true
      while (more && j >= 0) {
        items(j) match {
          case TextChar(ch, o) if ch >= '0' && ch <= '9' =>
            if (o != OriginPlain) any = true
            j -= 1
          case _ => more = false
        }
      }
      any
    }
    // the current out line is (optional indent +) a 1-9 digit run — the
    // shape that, with '.' or ')' appended, re-parses as an ordered-list
    // marker (list markers accept leading whitespace)
    def lineIsDigits(): Boolean = {
      var p = out.length - 1
      while (p >= 0 && out.charAt(p) != '\n') p -= 1
      if (p < 0 && !lineStartAtZero) return false
      var q = p + 1
      while (q < out.length && (out.charAt(q) == ' ' || out.charAt(q) == '\t')) q += 1
      val len = out.length - q
      if (len < 1 || len > 9) return false
      while (q < out.length) {
        if (out.charAt(q) < '0' || out.charAt(q) > '9') return false
        q += 1
      }
      true
    }
    var i = 0
    while (i < items.length) {
      items(i) match {
        case Verbatim(raw) => out.append(raw)
        case TextChar(c, _) if matched.get(i) => out.append(c)
        case TextChar(c, origin) =>
          // a char that reached the text stream DECODED — from a \p
          // escape or a character reference — can collide with syntax on
          // re-parse in contexts a plain char never occupies (the block
          // grouper already claimed real markers before the text pass)
          val decoded = origin != OriginPlain
          // "line start" modulo leading whitespace: block markers accept
          // indent, so a decoded marker char after spaces still re-parses
          // as syntax (" \* x" dropping its escape would bullet-ize)
          val atLineStart = {
            var p = out.length - 1
            var ok = true
            while (ok && p >= 0 && out.charAt(p) != '\n') {
              ok = out.charAt(p) == ' ' || out.charAt(p) == '\t'
              p -= 1
            }
            ok && (p >= 0 || lineStartAtZero)
          }
          def nextCh = neighbor(i, 1)
          def beforeLink = i + 1 < items.length && (items(i + 1) match {
            case Verbatim(raw) => raw.startsWith("[")
            case _ => false
          })
          // a decoded '#' appended to a line-start '#' run would EXTEND a
          // heading marker ("#\# h" -> "## h" re-parses as an h2)
          def lineStartHashes: Boolean = {
            var p = out.length - 1
            var hashes = 0
            while (p >= 0 && out.charAt(p) == '#') { hashes += 1; p -= 1 }
            if (hashes == 0 || hashes > 5) return false
            var ok = true
            while (ok && p >= 0 && out.charAt(p) != '\n') {
              ok = out.charAt(p) == ' ' || out.charAt(p) == '\t'
              p -= 1
            }
            ok && (p >= 0 || lineStartAtZero)
          }
          // a decoded hr/setext char whose whole DECODED line is that
          // char + whitespace must stay escaped: dropping it could form
          // or extend a thematic break ("-\- - -" -> "-- - -") or a
          // setext underline ("a\n-\-" -> "a\n--" -> h2) on re-parse
          def lineAllCharOrWs(ch: Char): Boolean = {
            def dir(step: Int): Boolean = {
              var j = i + step
              while (j >= 0 && j < items.length) {
                items(j) match {
                  case TextChar('\n', _) => return true
                  case TextChar(x, _) if x == ch || x == ' ' || x == '\t' =>
                    j += step
                  case _ => return false
                }
              }
              true
            }
            dir(-1) && dir(1)
          }
          // on an ATX heading line ("#{1,6} " prefix), a trailing '#' run
          // preceded by whitespace is a CLOSING SEQUENCE — re-parse would
          // strip it from the title, so its first '#' (ANY origin: a
          // setext conversion can put a plain "x #" title here) must
          // escape; later '#'s of the run are then preceded by the
          // escaped one and safe bare
          def closingHashSeq: Boolean = {
            if (out.isEmpty || !isWs(out.charAt(out.length - 1))) return false
            var p = out.length - 1
            while (p >= 0 && out.charAt(p) != '\n') p -= 1
            var q = p + 1
            var h = 0
            while (q < out.length && out.charAt(q) == '#') { h += 1; q += 1 }
            if (h < 1 || h > 6 ||
                q >= out.length || !isWs(out.charAt(q))) return false
            var j = i + 1
            while (j < items.length) {
              items(j) match {
                case TextChar('\n', _) => return true
                case TextChar('#', _) => j += 1
                case _ => return false
              }
            }
            true
          }
          // a decoded '-' or ':' whose whole DECODED line is made of
          // - : | and whitespace WITH a pipe present would form a TABLE
          // SEPARATOR row on re-parse ("|\n|\-|" dropping the escape
          // becomes "|\n|-|", a valid header+separator — the 1M-fuzz
          // r12 find): it must stay escaped. Pure dash/ws lines are the
          // thematic-break/setext hazard lineAllCharOrWs already covers.
          def lineSepShape: Boolean = {
            val left = new StringBuilder
            val right = new StringBuilder
            def dir(step: Int, sb: StringBuilder): Boolean = {
              var j = i + step
              while (j >= 0 && j < items.length) {
                items(j) match {
                  case TextChar('\n', _) => return true
                  case TextChar(x, _) if x == '-' || x == ':' || x == '|' ||
                      x == ' ' || x == '\t' =>
                    sb.append(x); j += step
                  case _ => return false
                }
              }
              true
            }
            if (!dir(-1, left) || !dir(1, right)) return false
            val line = left.reverse.toString + c + right.toString
            line.contains('|') && MdFormatLite.TableSepRe.matches(line)
          }
          // a decoded '>' is a quote-marker hazard not just at line
          // start but anywhere in a line-start run of markers/ws
          // ("> \>" dropping its escape becomes a second marker)
          def lineStartQuotePrefix: Boolean = {
            var p = out.length - 1
            var ok = true
            while (ok && p >= 0 && out.charAt(p) != '\n') {
              val ch = out.charAt(p)
              ok = ch == ' ' || ch == '\t' || ch == '>'
              p -= 1
            }
            ok && (p >= 0 || lineStartAtZero)
          }
          // behind: a run of ch, then optional whitespace, back to a
          // line start; ahead: raw same-char text extends the run
          def lineStartFenceRun(ch: Char): Boolean = {
            var p = out.length - 1
            var run = 1
            while (p >= 0 && out.charAt(p) == ch) { run += 1; p -= 1 }
            while (p >= 0 && (out.charAt(p) == ' ' || out.charAt(p) == '\t')) p -= 1
            if (!((p < 0 && lineStartAtZero) || (p >= 0 && out.charAt(p) == '\n')))
              return false
            var j = i + 1
            var more = true
            while (more && j < items.length) {
              items(j) match {
                case TextChar(x, _) if x == ch => run += 1; j += 1
                case _ => more = false
              }
            }
            run >= 3
          }
          if (decoded && atLineStart &&
              (c == '#' || c == '-' || c == '+' ||
                (c == '*' && isWs(nextCh)))) {
            // line-start block syntax ("# x", "- x", "* x")
            out.append('\\').append(c)
          } else if (decoded && c == '>' && lineStartQuotePrefix) {
            out.append('\\').append(c)
          } else if (c == '#' && closingHashSeq) {
            out.append('\\').append(c)
          } else if (decoded && c == '#' && lineStartHashes) {
            out.append('\\').append(c)
          } else if (decoded && (c == '-' || c == '*' || c == '_' || c == '=') &&
              lineAllCharOrWs(c)) {
            out.append('\\').append(c)
          } else if (decoded && c == '~' && lineStartFenceRun(c)) {
            // a decoded '~' in a LINE-START tilde run (optionally after
            // leading whitespace) re-escapes when the rendered run would
            // reach 3: "\~~~" dropping its escape re-parses as a FENCE
            // opener next pass (col-0 for the block grouper, or an R8h
            // item-nested region opener at an indented content column —
            // fence openers allow any info suffix, so only the run
            // matters). Backticks need no twin rule: an unmatched
            // TextChar '`' always escapes below (R13), and matched runs
            // are Verbatim code spans that never reach this dispatch.
            out.append('\\').append(c)
          } else if (decoded && (c == '-' || c == ':') && lineSepShape) {
            out.append('\\').append(c)
          } else if ((c == '.' || c == ')') && isWs(nextCh) &&
              lineIsDigits() && (decoded || decodedDigitRun(i)) ) {
            // would complete an ordered-list marker ("1. x"): fires when
            // the marker CHAR is decoded ("1\. x") OR any digit of the
            // run is ("&#49;. x" -> "1. x" would re-parse as a list and
            // get renumbered next pass); a fully plain "1. x" is a real
            // marker the grouper already claimed, never escaped here
            out.append('\\').append(c)
          } else if (decoded && c == '!' && beforeLink) {
            // "!" + "[label](url)" would re-parse as an image
            out.append('\\').append(c)
          } else c match {
            case '\\' => out.append("\\\\")
            case '*' | '_' =>
              // a DECODED delimiter char judges its neighbors RAW (not
              // boundary-masked): dropping its escape is safe only when
              // the bare char would be INERT on re-parse — both raw
              // neighbors true whitespace, so it can neither open nor
              // close (CommonMark flanking). A masked view would drop it
              // next to a matched delimiter ('\__*_' -> '__*_' re-parses
              // with a len-2 run) or next to a verbatim construct
              // ('<s>\*[]()' -> a flanking-active delimiter between
              // punctuation edges) and change the emphasis structure.
              def raw(step: Int): Char = {
                val j = i + step
                if (j < 0 || j >= items.length) ' '
                else items(j) match {
                  case TextChar(ch, _) => ch
                  case Verbatim(rawS) =>
                    if (step < 0) rawS.charAt(rawS.length - 1) else rawS.charAt(0)
                }
              }
              // a PLAIN leftover in a PARTIALLY-consumed delimiter run
              // (its contiguous same-char run contains a matched char)
              // renders bare: escaping any of its chars would SPLIT the
              // run on re-parse (different length -> different
              // rule-of-three outcome -> different emphasis), while bare
              // leftovers let the run re-form identically — the
              // idempotence anchor for runs like '***' consumed from
              // both edges
              def runHasMatch: Boolean = {
                def scanDir(step: Int): Boolean = {
                  var j = i + step
                  var found = false
                  while (!found && j >= 0 && j < items.length &&
                      (items(j) match {
                        case TextChar(ch, OriginPlain) => ch == c
                        case _ => false
                      })) { if (matched.get(j)) found = true; j += step }
                  found
                }
                scanDir(-1) || scanDir(1)
              }
              val dropOk =
                if (decoded) isWs(raw(-1)) && isWs(raw(1))
                else runHasMatch ||
                  (isWs(neighbor(i, -1)) && isWs(neighbor(i, 1)))
              if (dropOk) out.append(c)
              else out.append('\\').append(c)
            case '[' | ']' | '<' | '`' => out.append('\\').append(c)
            case '|' if decoded =>
              // an ESCAPED pipe keeps its escape: pipes are structural
              // under the tables extension, and dropping one can MINT a
              // table ("|\n-\|" -> "|\n-|", a valid separator row next
              // pass — the 1M-fuzz r12 find); mdformat-tables likewise
              // escapes pipes in text. Plain input pipes stay bare.
              out.append('\\').append(c)
            case '&' =>
              val rest = downstream(i)
              val named = NamedRefRe.matcher(rest)
              if (probeAt(NumRefRe, rest, 0) >= 0 ||
                  (named.lookingAt() && entities.containsKey(named.group(1))))
                out.append("\\&")
              else out.append('&')
            case other => out.append(other)
          }
      }
      i += 1
    }
    out.toString
  }
}
