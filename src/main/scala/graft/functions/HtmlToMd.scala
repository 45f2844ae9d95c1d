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

  private val BlockStrip =
    "(?is)<(script|style|svg|footer|nav|head)\\b[^>]*>.*?</\\1>".r

  def absolutize(url: String, base: String): String =
    if (url.matches("(?i)^[a-z][a-z0-9+.-]*:.*") || base.isEmpty) url
    else {
      val b = base.stripSuffix("/")
      if (url.startsWith("//")) "https:" + url
      else if (url.startsWith("/")) b.replaceAll("(?<!/)/(?!/).*$", "") + url
      else b + "/" + url
    }

  def convert(html: String, baseUrl: String = ""): String = {
    var s = html
    s = BlockStrip.replaceAllIn(s, "")
    s = s.replaceAll("(?is)<!--.*?-->", "")
    // images -> alt text (reference drops Image tokens, keeps alt; 107-134)
    s = s.replaceAll("(?is)<img\\b[^>]*\\balt=[\"']([^\"']*)[\"'][^>]*>", "$1")
    s = s.replaceAll("(?is)<img\\b[^>]*>", "")
    s = s.replaceAll("(?is)<hr\\b[^>]*>", "") // thematic breaks removed
    // headings
    for (i <- 1 to 6)
      s = s.replaceAll(s"(?is)<h$i\\b[^>]*>(.*?)</h$i>", "\n" + ("#" * i) + " $1\n")
    // links with href absolutization
    s = "(?is)<a\\b[^>]*\\bhref=[\"']([^\"']*)[\"'][^>]*>(.*?)</a>".r
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        s"[${m.group(2)}](${absolutize(m.group(1), baseUrl)})"))
    // emphasis / code
    s = s.replaceAll("(?is)<(b|strong)\\b[^>]*>(.*?)</\\1>", "**$2**")
    s = s.replaceAll("(?is)<(i|em)\\b[^>]*>(.*?)</\\1>", "*$2*")
    s = s.replaceAll("(?is)<code\\b[^>]*>(.*?)</code>", "`$1`")
    // list items / paragraphs / breaks
    s = s.replaceAll("(?is)<li\\b[^>]*>(.*?)</li>", "\n- $1")
    s = s.replaceAll("(?is)</?(ul|ol)\\b[^>]*>", "\n")
    s = s.replaceAll("(?is)<br\\b[^>]*>", "\n")
    s = s.replaceAll("(?is)</p>", "\n\n")
    // strip all remaining tags, decode the common entities
    s = s.replaceAll("(?s)<[^>]+>", "")
    s = s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")
    // canonicalize whitespace
    s.replaceAll("[ \\t]+", " ").replaceAll(" ?\\n ?", "\n")
      .replaceAll("\\n{3,}", "\n\n").trim
  }

  def htmlToMdUdf(baseUrl: String = ""): UserDefinedFunction =
    udf((html: String) => convert(html, baseUrl))
}
