package graft.split

/** Token counting/truncation (SURVEY.md §2.9 F6; reference
  * wurzel/utils/tokenizers.py:16-201 wraps tiktoken/HuggingFace).
  *
  * The engine ships a whitespace tokenizer (the oracle-friendly default
  * the plain-text corpus contract pins) and a REAL byte-level BPE
  * ([[BpeTokenizer]] in Bpe.scala, with per-context vocab granularity —
  * FIXTURES.md §1.5). Operators take the trait, so a deployment tokenizer
  * drops in without touching them.
  */
trait Tokenizer extends Serializable {
  def tokens(s: String): Array[String]
  def count(s: String): Int = tokens(s).length

  /** First n tokens re-joined (reference truncation,
    * tokenizers.py:52-74 — offset-mapping variant avoids decode drift; the
    * join-on-space form is exact for whitespace tokens). */
  def truncate(s: String, n: Int): String = tokens(s).take(n).mkString(" ")

  /** Hard-cut into n-token pieces. Space re-joining is exact for the
    * whitespace tokenizer; subword tokenizers override with offset slicing
    * (BpeTokenizer decodes id groups — byte-exact concatenation). */
  def chunkTokens(s: String, n: Int): Vector[String] =
    tokens(s).grouped(n).map(_.mkString(" ")).toVector
}

/** Split on runs of whitespace (reference regex word tokenizer,
  * wurzel/steps/embedding/step.py:35). The pattern is precompiled:
  * `String.split("\\s+")` compiles a fresh regex on every call, and the
  * splitter tokenizes each document dozens of times. */
object WhitespaceTokenizer extends Tokenizer {
  private val Ws = java.util.regex.Pattern.compile("\\s+")
  def tokens(s: String): Array[String] =
    if (s.isEmpty) Array.empty else Ws.split(s.trim).filter(_.nonEmpty)

  // Java regex \s (no UNICODE_CHARACTER_CLASS) is exactly these six chars.
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Allocation-free token count — the splitter counts every subtree at
    * every recursion level, so this is its hottest call. Equivalent to
    * `tokens(s).length`: tokens() trims first (String.trim strips ALL
    * chars <= U+0020 at the ends, a superset of regex \s), so the scan
    * runs over the trimmed view; trim allocates nothing when there is
    * nothing to strip. */
  override def count(sRaw: String): Int = {
    val s = sRaw.trim
    var i = 0; var n = 0; var inTok = false
    while (i < s.length) {
      val ws = isWs(s.charAt(i))
      if (!ws && !inTok) { n += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    n
  }
}
