package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Sentence splitting (SURVEY.md §2.9 F7; reference
  * wurzel/utils/splitters/sentence_splitter.py).
  *
  * Two splitters, mirroring the reference:
  *  - [[split]] — the engine's oracle-pinned splitter (split on
  *    terminator+space, merge back abbreviation/initial/enumeration
  *    fragments). q55/q61 hash-pin this behavior; it stays the
  *    SemanticSplitter leaf default.
  *  - [[referenceSplit]] — a faithful port of the reference's
  *    `RegexSentenceSplitter` (sentence_splitter.py:115-226): split after
  *    [.!?…] + closing quotes only when the next token looks like a
  *    sentence start (capital/digit, optionally after an opening quote),
  *    then merge back known abbreviations, initials, dotted acronyms,
  *    decimals, ordinals ("No. 5"), and ellipses. The reference's
  *    model-backed variants (spaCy, SaT) are per-executor-model
  *    mapPartitions deployments of the same signature.
  */
object Sentences {

  /** German+English abbreviation list used by [[split]] (subset tuned to
    * the engine's corpus; the full reference table backs
    * [[ReferenceAbbreviations]]). */
  val Abbreviations: Set[String] = Set(
    "z.b", "d.h", "u.a", "bzw", "ca", "evtl", "ggf", "inkl", "max", "min",
    "nr", "s", "str", "tel", "usw", "vgl", "dr", "prof", "mr", "mrs", "ms",
    "st", "etc", "e.g", "i.e", "vs", "approx", "dept", "fig", "al")

  private val SplitRe = "(?<=[.!?])\\s+".r

  private val SingleLetter = "[a-z]".r
  private val Digits = "\\d+".r

  private def endsInAbbrev(fragment: String): Boolean = {
    // last whitespace-delimited token without re-splitting the fragment;
    // scan backwards over ANY whitespace (incl. \r — indexOf(' ') missed it)
    val t = fragment.trim
    var i = t.length - 1
    while (i >= 0 && !Character.isWhitespace(t.charAt(i))) i -= 1
    val lastTok = t.substring(i + 1)
    val stripped = lastTok.stripSuffix(".").stripSuffix("!").stripSuffix("?").toLowerCase
    Abbreviations.contains(stripped) ||
      SingleLetter.matches(stripped) ||  // single initial: "J. Smith"
      Digits.matches(stripped)           // enumeration: "3. Platz"
  }

  def split(text: String): Array[String] = {
    val raw = SplitRe.split(text.trim).filter(_.nonEmpty)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    raw.foreach { frag =>
      if (out.nonEmpty && endsInAbbrev(out.last)) out(out.length - 1) = out.last + " " + frag
      else out += frag
    }
    out.toArray
  }

  val sentencesUdf: UserDefinedFunction = udf((text: String) => split(text))

  // ---- faithful RegexSentenceSplitter port -------------------------------

  /** The reference's full abbreviation table, verbatim
    * (sentence_splitter.py:141-180). */
  val ReferenceAbbreviations: Set[String] = Set(
    "mr", "mrs", "ms", "dr", "prof", "sr", "jr", "sir", "madam", "st",
    "a.m", "p.m", "etc", "e.g", "i.e", "vs", "cf", "al", "ca", "resp",
    "jan", "feb", "mar", "apr", "jun", "jul", "aug", "sep", "sept", "oct",
    "nov", "dec", "no", "dept", "fig", "eq", "inc", "ltd")

  // Split after [.!?…] and any closing quotes/brackets, only when the next
  // non-space token looks like a sentence start (capital letter or digit,
  // optionally after an opening quote/paren) — sentence_splitter.py:131-136.
  // NOTE: like the reference, the closing-quote run is CONSUMED by the
  // split (it sits outside the lookbehind/lookahead), so a quote that
  // closes right at a boundary is dropped — reproduced bug-for-bug; the
  // reference's own quote cases are disabled pending a fix upstream.
  private val RefSplitRe = java.util.regex.Pattern.compile(
    "(?<=[.!?\u2026])['\")\\]]*(?=\\s+(?=[\u201C\"'(\\[]?[A-Z0-9]))")

  // sentence_splitter.py:183-190 — merge-back patterns, verbatim.
  private val EndsWithInitials = java.util.regex.Pattern.compile("(?:\\b[A-Z]\\.){1,3}\\s*$")
  private val EndsWithAcronym  = java.util.regex.Pattern.compile("(?:\\b[A-Z]\\.){2,}\\s*$")
  private val EndsWithDecimal  = java.util.regex.Pattern.compile("\\d\\.\\d+\\s*$")
  private val EndsWithEllipsis = java.util.regex.Pattern.compile("\\.\\.\\.\\s*$")
  private val EndsWithOrdinal  = java.util.regex.Pattern.compile("(?i)\\bNo\\.\\s*\\d+\\s*$")
  // [^\W\d_]+ in unicode-aware Python = letter runs.
  private val TrailWordBeforeDot = java.util.regex.Pattern.compile("(\\p{L}+)\\.\\s*$")
  private val NewlineRunRe = java.util.regex.Pattern.compile("[ \\t]*\\n[ \\t]*")

  private def endsWithKnownAbbrev(chunk: String): Boolean = {
    val m = TrailWordBeforeDot.matcher(chunk.stripTrailing())
    m.find() && ReferenceAbbreviations.contains(m.group(1).toLowerCase)
  }

  private def shouldMergeWithNext(chunkRaw: String): Boolean = {
    val chunk = chunkRaw.stripTrailing()
    endsWithKnownAbbrev(chunk) ||
      EndsWithInitials.matcher(chunk).find() ||
      EndsWithAcronym.matcher(chunk).find() ||
      EndsWithDecimal.matcher(chunk).find() ||
      EndsWithEllipsis.matcher(chunk).find() ||
      EndsWithOrdinal.matcher(chunk).find()
  }

  /** `RegexSentenceSplitter.get_sentences` (sentence_splitter.py:209-226):
    * newline runs normalize to one space, split at candidate boundaries,
    * merge false positives back, strip. */
  def referenceSplit(text: String): Array[String] = {
    val normalized = NewlineRunRe.matcher(text.strip()).replaceAll(" ")
    val parts = RefSplitRe.split(normalized, -1)
    val sentences = scala.collection.mutable.ArrayBuffer[String]()
    parts.foreach { part =>
      if (part.nonEmpty) {
        if (sentences.isEmpty) sentences += part
        else if (shouldMergeWithNext(sentences.last))
          sentences(sentences.length - 1) =
            sentences.last.stripTrailing() + " " + part.stripLeading()
        else sentences += part
      }
    }
    sentences.map(_.strip()).filter(_.nonEmpty).toArray
  }

  val referenceSentencesUdf: UserDefinedFunction = udf((text: String) => referenceSplit(text))
}
