package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.text

/** Composite document-quality gate (north-star; the Gopher/MassiveText
  * rule family, Rae et al. 2021 appendix A — see PAPERS.md). The
  * per-metric operators (q29 quality score, q73 repetition) measure;
  * this operator DECIDES: every rule is evaluated per row and the doc
  * either passes all of them (`keep = true`) or carries the FIRST failing
  * rule's name in `reason` — the audit trail a filtering pipeline needs
  * to report why corpus mass was dropped.
  *
  * Thresholds are a config with the published Gopher defaults — real
  * pipelines always tune them per corpus (the defaults assume natural
  * English prose; a code or multilingual corpus needs different bounds).
  *
  * Everything is a codegen'd Column expression over one token-array pass
  * (no UDFs, no shuffle — a pure map gate): at 100 TB this fuses into the
  * scan's WholeStageCodegen and filters before anything downstream pays
  * for the row.
  */
object QualityFilter {

  /** Rule thresholds (published Gopher defaults, whitespace-token
    * adapted). A `min*` of 0 / `max*` of 1.0 disables that rule. */
  case class GopherConfig(
      minTokens: Int = 50, maxTokens: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      minAlphaRatio: Double = 0.8,
      minStopwords: Int = 2,
      maxDupWordFrac: Double = 0.3,
      maxBulletRatio: Double = 0.9,
      maxEllipsisRatio: Double = 0.3)

  /** Rule names in evaluation order (the `reason` vocabulary). */
  val Rules: Seq[String] = Seq("word_count", "mean_word_len", "alpha_ratio",
    "stopwords", "dup_word_frac", "bullet_lines", "ellipsis_lines")

  /** The first failing rule's name for a text column, null when every rule
    * passes. A single expression tree, so both the flag and filter forms
    * stay inside whole-stage codegen. */
  def failReason(textCol: Column,
                 cfg: GopherConfig = GopherConfig()): Column = {
    val t = text.tokens(textCol)
    val lines = split(textCol, "\n")
    val nTok = size(t).cast("long")
    val meanWordLen =
      length(regexp_replace(textCol, "\\s", "")).cast("double") / nTok
    val alphaRatio =
      size(filter(t, x => x.rlike("[A-Za-z]"))).cast("double") / nTok
    val nStop = size(filter(t, x => x.isin(text.EnStop: _*)))
    val dupFrac = lit(1.0) - size(array_distinct(t)).cast("double") / nTok
    val bulletRatio =
      size(filter(lines, l => substring(l, 1, 2).isin("- ", "* ")))
        .cast("double") / size(lines)
    val ellipsisRatio =
      size(filter(lines, l => l.endsWith("..."))).cast("double") / size(lines)
    when(!nTok.between(cfg.minTokens, cfg.maxTokens), lit("word_count"))
      .when(meanWordLen < cfg.minMeanWordLen || meanWordLen > cfg.maxMeanWordLen,
        lit("mean_word_len"))
      .when(alphaRatio < cfg.minAlphaRatio, lit("alpha_ratio"))
      .when(nStop < cfg.minStopwords, lit("stopwords"))
      .when(dupFrac > cfg.maxDupWordFrac, lit("dup_word_frac"))
      .when(bulletRatio > cfg.maxBulletRatio, lit("bullet_lines"))
      .when(ellipsisRatio > cfg.maxEllipsisRatio, lit("ellipsis_lines"))
      .otherwise(lit(null).cast("string"))
  }

  /** Per-row gate columns: (idCol, n_tokens, keep, reason). */
  def gopherGate(df: DataFrame, idCol: String, textCol: String,
                 cfg: GopherConfig = GopherConfig()): DataFrame = {
    val reason = failReason(col(textCol), cfg)
    df.select(col(idCol),
      size(text.tokens(col(textCol))).cast("long").as("n_tokens"),
      reason.isNull.as("keep"), reason.as("reason"))
  }

  /** The filtering form: original rows that pass every rule — a pure
    * map-side filter, no join, no shuffle. */
  def keep(df: DataFrame, textCol: String,
           cfg: GopherConfig = GopherConfig()): DataFrame =
    df.filter(failReason(col(textCol), cfg).isNull)
}
