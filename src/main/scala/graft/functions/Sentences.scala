package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Sentence splitting — the regex implementation with abbreviation
  * merge-back (SURVEY.md §2.9 F7; reference
  * wurzel/utils/splitters/sentence_splitter.py:115-226: split on
  * terminator+space, then re-join fragments that end in a known
  * abbreviation, a single initial, or a number so "z. B." / "Dr. Meier" /
  * "3. Platz" never break a sentence). The reference's model-backed
  * variants (spaCy, SaT) are per-executor-model mapPartitions deployments
  * of the same signature.
  */
object Sentences {

  /** German+English abbreviation list (subset of the reference's table,
    * sentence_splitter.py:141-180). */
  val Abbreviations: Set[String] = Set(
    "z.b", "d.h", "u.a", "bzw", "ca", "evtl", "ggf", "inkl", "max", "min",
    "nr", "s", "str", "tel", "usw", "vgl", "dr", "prof", "mr", "mrs", "ms",
    "st", "etc", "e.g", "i.e", "vs", "approx", "dept", "fig", "al")

  private val SplitRe = "(?<=[.!?])\\s+".r

  private val SingleLetter = "[a-z]".r
  private val Digits = "\\d+".r

  private def endsInAbbrev(fragment: String): Boolean = {
    // last whitespace-delimited token without re-splitting the fragment
    val t = fragment.trim
    val cut = math.max(t.lastIndexOf(' '), math.max(t.lastIndexOf('\n'), t.lastIndexOf('\t')))
    val lastTok = if (cut < 0) t else t.substring(cut + 1)
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
}
