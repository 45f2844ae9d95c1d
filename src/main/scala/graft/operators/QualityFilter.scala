package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{text, Kernels}

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
  * The counting is ONE JVM kernel pass per row (Kernels.gopherStats — the
  * engine's hot-loop idiom; the equivalent higher-order-lambda formulation
  * measured ~ms/row interpreted), the thresholds cheap Column arithmetic,
  * and the whole gate is a pure map — no shuffle, so at 100 TB it drops
  * rows before anything downstream pays for them.
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

  /** Ordered rule chain over the one-pass stat struct (cheap arithmetic —
    * the expensive token pass happened once in the kernel). */
  private def reasonFromStats(s: Column, cfg: GopherConfig): Column = {
    val nTok = s.getField("_1")
    val meanWordLen = s.getField("_2").cast("double") / nTok
    val alphaRatio = s.getField("_3").cast("double") / nTok
    val nStop = s.getField("_4")
    val dupFrac = lit(1.0) - s.getField("_5").cast("double") / nTok
    val bulletRatio = s.getField("_7").cast("double") / s.getField("_6")
    val ellipsisRatio = s.getField("_8").cast("double") / s.getField("_6")
    // a 0-token doc is degenerate regardless of config: every ratio below
    // would be 0/0 (NaN under IEEE double division, whose Spark ordering
    // quirks would pick an arbitrary-looking rule) — name it word_count
    // even when minTokens = 0 "disables" that rule
    when(nTok === 0, lit("word_count"))
      .when(!nTok.between(cfg.minTokens, cfg.maxTokens), lit("word_count"))
      .when(meanWordLen < cfg.minMeanWordLen || meanWordLen > cfg.maxMeanWordLen,
        lit("mean_word_len"))
      .when(alphaRatio < cfg.minAlphaRatio, lit("alpha_ratio"))
      .when(nStop < cfg.minStopwords, lit("stopwords"))
      .when(dupFrac > cfg.maxDupWordFrac, lit("dup_word_frac"))
      .when(bulletRatio > cfg.maxBulletRatio, lit("bullet_lines"))
      .when(ellipsisRatio > cfg.maxEllipsisRatio, lit("ellipsis_lines"))
      .otherwise(lit(null).cast("string"))
  }

  /** The first failing rule's name for a text column, null when every rule
    * passes. One kernel pass (Kernels.gopherStats), let-bound so the rule
    * chain's many references share a single evaluation. */
  def failReason(textCol: Column,
                 cfg: GopherConfig = GopherConfig()): Column =
    text.bindOnce(Kernels.gopherStatsUdf(text.EnStop)(textCol))(
      s => reasonFromStats(s, cfg))

  /** Per-row gate columns: (idCol, n_tokens, keep, reason). The stat
    * struct is projected once; keep/reason derive from the projected
    * attribute, so the kernel runs exactly once per row (CollapseProject
    * keeps non-cheap expressions with multiple references un-inlined). */
  def gopherGate(df: DataFrame, idCol: String, textCol: String,
                 cfg: GopherConfig = GopherConfig()): DataFrame = {
    df.select(col(idCol),
        Kernels.gopherStatsUdf(text.EnStop)(col(textCol)).as("__s"))
      .select(col(idCol),
        col("__s").getField("_1").as("n_tokens"),
        reasonFromStats(col("__s"), cfg).as("reason"))
      .select(col(idCol), col("n_tokens"),
        col("reason").isNull.as("keep"), col("reason"))
  }

  /** The filtering form: original rows that pass every rule — a pure
    * map-side filter, no join, no shuffle. */
  def keep(df: DataFrame, textCol: String,
           cfg: GopherConfig = GopherConfig()): DataFrame =
    df.filter(failReason(col(textCol), cfg).isNull)
}
