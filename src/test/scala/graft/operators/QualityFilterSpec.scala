package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityFilterSpec extends SparkSpec {
  import spark.implicits._

  // 42 tokens, all distinct (dup 0), 7 stopwords, mean word len ~5.1,
  // fully alphabetic-or-alnum, no bullets/ellipses: passes every rule.
  private val good =
    "the a and of to in is " + (1 to 35).map(i => s"word$i").mkString(" ")

  test("each rule fires with its own reason, in order") {
    val docs = Seq(
      (1L, good),
      (2L, "too short"),                                 // word_count (2 < 30)
      (3L, Seq.fill(60)("ab").mkString(" ")),            // mean_word_len = 2.0
      // 48 numeric + 108 word tokens: alpha 108/156 ≈ 0.69; mean exactly 3.0 passes
      (4L, (Seq.fill(48)("1234") ++ Seq.fill(12)("the word is a to in of good men")).mkString(" ")),
      // 60 distinct alphanumeric words, zero stopwords
      (5L, (0 until 60).map(i => s"wordy$i").mkString(" ")),
      // 6 stopwords + 54x "same": dup_frac = 1 - 7/60 ≈ 0.88
      (6L, "the of and to in is " + Seq.fill(54)("same").mkString(" ")),
      // every line a bullet; 7 per-line-unique words keep dup_frac at 0.2925
      (7L, (1 to 40).map(i =>
        s"- the u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g is").mkString("\n")),
      // every line ends "..."; same distinctness construction
      (8L, (1 to 40).map(i =>
        s"the u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g is fine...").mkString("\n"))
    ).toDF("doc_id", "text")
    val out = QualityFilter.gopherGate(docs, "doc_id", "text", QualityFilter.GopherConfig(minTokens = 30))
      .orderBy("doc_id").select("doc_id", "keep", "reason")
      .as[(Long, Boolean, Option[String])].collect().toSeq
    assert(out(0) == ((1L, true, None)))
    assert(out(1) == ((2L, false, Some("word_count"))))
    assert(out(2) == ((3L, false, Some("mean_word_len"))))
    assert(out(3) == ((4L, false, Some("alpha_ratio"))))
    assert(out(4) == ((5L, false, Some("stopwords"))))
    assert(out(5) == ((6L, false, Some("dup_word_frac"))))
    assert(out(6) == ((7L, false, Some("bullet_lines"))))
    assert(out(7) == ((8L, false, Some("ellipsis_lines"))))
  }

  test("null text gates out as word_count instead of crashing the kernel") {
    val docs = Seq((1L, good), (2L, null: String)).toDF("doc_id", "text")
    val out = QualityFilter.gopherGate(docs, "doc_id", "text",
        QualityFilter.GopherConfig(minTokens = 30))
      .orderBy("doc_id").select("doc_id", "keep", "reason")
      .as[(Long, Boolean, Option[String])].collect().toSeq
    assert(out == Seq((1L, true, None), (2L, false, Some("word_count"))))
  }

  test("degenerate docs gate deterministically when minTokens = 0 disables word_count") {
    // empty/blank text tokenizes to empty-string tokens (1 and 2 of them —
    // the oracle's string_split_regex semantics), so those docs fail
    // mean_word_len (mean 0 < 3). NULL text is the true 0-token case: the
    // explicit guard names it word_count — without it the ratio rules
    // would evaluate 0/0 = NaN and Spark's NaN ordering would pick an
    // arbitrary-looking reason
    val docs = Seq((1L, ""), (2L, "   "), (3L, null: String)).toDF("doc_id", "text")
    val out = QualityFilter.gopherGate(docs, "doc_id", "text",
        QualityFilter.GopherConfig(minTokens = 0, minStopwords = 0))
      .orderBy("doc_id").select("reason").as[Option[String]].collect().toSeq
    assert(out == Seq(Some("mean_word_len"), Some("mean_word_len"), Some("word_count")))
  }

  test("keep is a pure map-side filter: no exchange, no join in the plan") {
    val docs = Seq((1L, good), (2L, "too short")).toDF("doc_id", "text")
    val kept = QualityFilter.keep(docs, "text", QualityFilter.GopherConfig(minTokens = 30))
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }
}
