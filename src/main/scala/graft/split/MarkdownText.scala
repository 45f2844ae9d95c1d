package graft.split

/** Markdown -> plain text for embedding input (SURVEY.md §2.9 F2; reference
  * wurzel/steps/embedding/step.py:123-140, 188-233).
  *
  * The reference renders markdown to an element tree and walks it writing
  * every element's text and tail (`__md_to_plain`), then masks URLs
  * (`_replace_link`). This is the same walk expressed as a single pass over
  * the block structure — NOT a regex strip: fence bodies survive verbatim
  * (including `#`, `|`, `*` characters), link text is preserved while the
  * target vanishes with the markup, and images disappear entirely (alt text
  * is an attribute in the rendered tree, so the reference drops it too).
  *
  * Block behavior (tree tails render one '\n' between blocks):
  *  - headings lose their `#` markers, keeping the title text
  *  - list items lose their bullet/number markers
  *  - blockquote markers `>` are dropped
  *  - fenced code keeps its body verbatim, fence lines vanish
  *  - pipe-table lines pass through as text (the reference's renderer has
  *    no table extension enabled — table markup is paragraph text there)
  *
  * Inline behavior:
  *  - `![alt](src)` -> removed;  `[text](url)` -> `text`;  `<http://u>` -> `http://u`
  *  - emphasis/strong/strikethrough markers stripped; inline code unwrapped
  *  - finally every remaining URL is replaced by the literal `LINK`
  *    (reference _URL_PATTERN semantics, same mask as functions.maskUrls)
  */
object MarkdownText {

  import java.util.regex.Pattern

  private val FenceRe = "^(```|~~~).*$".r
  private val HeadingRe = "^#{1,6}\\s+(.*?)\\s*#*\\s*$".r
  private val BulletRe = "^(\\s*)(?:[-*+]|\\d+[.)])\\s+(.*)$".r
  private val QuoteRe = "^\\s*>\\s?(.*)$".r

  // Inline rewrites run once per line per doc — precompiled (String.replaceAll
  // would recompile each pattern on every call).
  private val Image      = Pattern.compile("!\\[[^\\]]*\\]\\([^)]*\\)")
  private val Link       = Pattern.compile("\\[([^\\]]*)\\]\\([^)]*\\)")
  private val Autolink   = Pattern.compile("<(https?://[^>]+)>")
  private val Strong     = Pattern.compile("(\\*\\*|__)(.+?)\\1")
  private val Emphasis   = Pattern.compile("(?<![\\w*])([*_])([^*_]+)\\1(?![\\w*])")
  private val Strike     = Pattern.compile("~~(.+?)~~")
  private val InlineCode = Pattern.compile("`([^`]*)`")
  private val BareUrl    = Pattern.compile("https?://[^\\s)]+")

  private def inline(s: String): String = {
    var t = s
    t = Image.matcher(t).replaceAll("") // images dropped, alt too
    t = Link.matcher(t).replaceAll("$1") // link text kept
    t = Autolink.matcher(t).replaceAll("$1") // autolink -> bare url
    t = Strong.matcher(t).replaceAll("$2") // strong
    t = Emphasis.matcher(t).replaceAll("$2") // emphasis
    t = Strike.matcher(t).replaceAll("$1") // strikethrough
    t = InlineCode.matcher(t).replaceAll("$1") // inline code
    t
  }

  /** Mask URLs with LINK (reference step.py:214-233). */
  def maskLinks(s: String): String = BareUrl.matcher(s).replaceAll("LINK")

  def toPlain(md: String): String = {
    val out = Vector.newBuilder[String]
    var inFence = false
    md.replace("\r\n", "\n").linesIterator.foreach { line =>
      if (inFence) {
        if (FenceRe.matches(line)) inFence = false
        else out += line // fence body verbatim
      } else if (FenceRe.matches(line)) {
        inFence = true
      } else line match {
        case l if l.trim.isEmpty => () // blank: block tail already yields \n
        case HeadingRe(title) => out += inline(title)
        case BulletRe(_, rest) => out += inline(rest)
        case QuoteRe(rest) => out += inline(rest)
        case other => out += inline(other)
      }
    }
    maskLinks(out.result().mkString("\n")).trim
  }
}
