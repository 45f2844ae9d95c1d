package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** HTML → markdown conversion (SURVEY.md §2.9 F8-F10; reference shells out
  * to a vendored Go binary per document, wurzel/utils/to_markdown/
  * html2md.py:54-104 — a per-row subprocess would be a disaster at scale,
  * so this is a pure-JVM regex converter covering the reference's cleaning
  * contract: script/style/svg/footer/link tags stripped, images replaced by
  * their alt text, thematic breaks dropped, headings/lists/links/emphasis
  * mapped, relative hrefs absolutized against a base url (F9,
  * html2md.py:167-221).
  *
  * Scope: the tag grammar the reference's cleaner handles; not a general
  * HTML5 parser (no offline jsoup in this build — a real deployment swaps
  * one in behind the same function).
  */
object HtmlToMd {
  import java.util.regex.Pattern

  // Every pattern compiled once at class load: the converter runs per row on
  // the executor hot path, and Pattern.compile dominated the cost when these
  // lived inline (one compile per replaceAll per row).
  private val BlockStrip =
    Pattern.compile("(?is)<(script|style|svg|footer|nav|head)\\b[^>]*>.*?</\\1>")
  // the reference's cleaner also drops the div#js-footer CONTAINER with its
  // content (clean_tree, html2md.py) — depth-counted to the MATCHING close
  // tag, since real footers nest divs
  private val JsFooterOpen =
    Pattern.compile("(?is)<div\\b[^>]*\\bid=[\"']js-footer[\"'][^>]*>")
  private val DivTag = Pattern.compile("(?is)<(/?)div\\b[^>]*>")

  private def stripJsFooter(html: String): String = {
    var s = html
    var m = JsFooterOpen.matcher(s)
    while (m.find()) {
      val t = DivTag.matcher(s).region(m.end(), s.length)
      var depth = 1
      var end = s.length
      while (depth > 0 && t.find()) {
        if (t.group(1).isEmpty) depth += 1 else depth -= 1
        if (depth == 0) end = t.end()
      }
      s = s.substring(0, m.start()) + s.substring(end)
      m = JsFooterOpen.matcher(s)
    }
    s
  }
  private val Comment   = Pattern.compile("(?is)<!--.*?-->")
  private val ImgAlt    = Pattern.compile("(?is)<img\\b[^>]*\\balt=[\"']([^\"']*)[\"'][^>]*>")
  private val ImgBare   = Pattern.compile("(?is)<img\\b[^>]*>")
  private val Hr        = Pattern.compile("(?is)<hr\\b[^>]*>")
  private val Headings: Array[(Pattern, String)] =
    (1 to 6).map(i => (Pattern.compile(s"(?is)<h$i\\b[^>]*>(.*?)</h$i>"),
                       "\n" + ("#" * i) + " $1\n")).toArray
  private val Anchor    = Pattern.compile("(?is)<a\\b[^>]*\\bhref=[\"']([^\"']*)[\"'][^>]*>(.*?)</a>")
  private val Bold      = Pattern.compile("(?is)<(b|strong)\\b[^>]*>(.*?)</\\1>")
  private val Italic    = Pattern.compile("(?is)<(i|em)\\b[^>]*>(.*?)</\\1>")
  private val Code      = Pattern.compile("(?is)<code\\b[^>]*>(.*?)</code>")
  private val ListItem  = Pattern.compile("(?is)<li\\b[^>]*>(.*?)</li>")
  private val ListWrap  = Pattern.compile("(?is)</?(ul|ol)\\b[^>]*>")
  private val Br        = Pattern.compile("(?is)<br\\b[^>]*>")
  private val ParaClose = Pattern.compile("(?is)</p>")
  private val AnyTag    = Pattern.compile("(?s)<[^>]+>")
  private val Spaces    = Pattern.compile("[ \\t]+")
  private val NlPad     = Pattern.compile(" ?\\n ?")
  private val NlRun     = Pattern.compile("\\n{3,}")
  private val AbsScheme = Pattern.compile("(?i)^[a-z][a-z0-9+.-]*:.*")
  private val BaseTail  = Pattern.compile("(?<!/)/(?!/).*$")

  def absolutize(url: String, base: String): String =
    // empty and fragment-only hrefs stay untouched (reference
    // normalize_urls leaves them: html2md_test.py fragment/empty cases)
    if (url.isEmpty || url.startsWith("#") ||
        AbsScheme.matcher(url).matches() || base.isEmpty) url
    else {
      val b = base.stripSuffix("/")
      if (url.startsWith("//")) "https:" + url
      else if (url.startsWith("/")) BaseTail.matcher(b).replaceAll("") + url
      else b + "/" + url
    }

  @inline private def rep(p: Pattern, s: String, r: String): String =
    p.matcher(s).replaceAll(r)

  def convert(html: String, baseUrl: String = ""): String = {
    var s = html
    s = rep(BlockStrip, s, "")
    s = stripJsFooter(s)
    s = rep(Comment, s, "")
    // images -> alt text (reference drops Image tokens, keeps alt; 107-134)
    s = rep(ImgAlt, s, "$1")
    s = rep(ImgBare, s, "")
    s = rep(Hr, s, "") // thematic breaks removed
    // headings
    var i = 0
    while (i < Headings.length) {
      s = rep(Headings(i)._1, s, Headings(i)._2); i += 1
    }
    // links with href absolutization
    s = {
      val m  = Anchor.matcher(s)
      val sb = new java.lang.StringBuilder
      while (m.find()) m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(
        s"[${m.group(2)}](${absolutize(m.group(1), baseUrl)})"))
      m.appendTail(sb).toString
    }
    // emphasis / code
    s = rep(Bold, s, "**$2**")
    s = rep(Italic, s, "*$2*")
    s = rep(Code, s, "`$1`")
    // list items / paragraphs / breaks
    s = rep(ListItem, s, "\n- $1")
    s = rep(ListWrap, s, "\n")
    s = rep(Br, s, "\n")
    s = rep(ParaClose, s, "\n\n")
    // strip all remaining tags, decode the common entities
    s = rep(AnyTag, s, "")
    // &amp; decodes LAST: decoding it first would turn double-escaped
    // entities ("&amp;lt;", rendering as the literal text "&lt;") into
    // "&lt;" and then wrongly decode that to "<" in the second pass
    s = s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")
      .replace("&amp;", "&")
    // canonicalize whitespace
    rep(NlRun, rep(NlPad, rep(Spaces, s, " "), "\n"), "\n\n").trim
  }

  def htmlToMdUdf(baseUrl: String = ""): UserDefinedFunction =
    udf((html: String) => convert(html, baseUrl))
}
