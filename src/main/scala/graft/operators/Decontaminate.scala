package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{text, Kernels}

/** Benchmark decontamination (north-star LLM-pipeline surface, no reference
  * analog — wurzel stops at dedup, wurzel/steps/duplication.py:21-51).
  *
  * Training corpora must drop documents that leak evaluation data: the
  * standard filter (GPT-3 appx C, PaLM sec 7, Llama 2 sec A.6 — see
  * PAPERS.md) flags any training doc sharing at least one word n-gram
  * (n≈8..13) with a benchmark document.
  *
  * Scale design (100 TB corpus, benchmark ≪ corpus):
  *  - benchmark n-grams are hashed to 60-bit keys, deduped, and BROADCAST —
  *    eval suites are a few MB of grams, so the corpus side never shuffles;
  *    the overlap join is a map-side broadcast hash join over the corpus'
  *    exploded grams;
  *  - corpus grams are computed in ONE JVM kernel pass per row
  *    (Kernels.shingleArr — distinct per doc, so the post-join count is
  *    exactly "distinct contaminated grams"); n_grams and the exploded
  *    stream derive from the same projected array, so the corpus is
  *    scanned and shingled exactly once;
  *  - the per-doc aggregate's exchange carries one partial row per doc
  *    per partition (id, n_grams, count — ~tens of bytes), never grams;
  *  - `broadcastBench = false` falls back to a shuffled hash join for the
  *    rare huge-benchmark case.
  *
  * Hash collisions (distinct gram strings colliding in 60 bits) can only
  * ADD spurious overlap at ~2^-60 per pair — same documented odds as the
  * LSH band keys (Dedup.scala).
  */
object Decontaminate {

  /** Per-document contamination flags: (idCol, n_grams, overlap_grams,
    * contaminated) for every corpus row. `overlap_grams` counts DISTINCT
    * n-grams shared with any benchmark doc; `contaminated` is
    * overlap_grams >= minOverlap. */
  def flag(corpus: DataFrame, bench: DataFrame, idCol: String, textCol: String,
           n: Int = 8, minOverlap: Int = 1,
           broadcastBench: Boolean = true): DataFrame = {
    val grams = Kernels.shinglesUdf(n)
    val benchGrams = {
      val g = bench
        .select(explode(grams(col(textCol))).as("gram"))
        .select(text.hash60(col("gram"), "decon").as("bh"))
        .distinct()
      if (broadcastBench) broadcast(g) else g
    }
    // ONE shingle pass per corpus row: n_grams and the exploded gram stream
    // come from the same projected array (explode_outer keeps sub-n-token
    // docs as a null-gram row, so every doc survives to the aggregate);
    // count(bh) counts only benchmark-matched grams, which are distinct
    // within a doc and distinct in the benchmark — so the plain count is
    // the distinct-overlap count, no count(distinct) Expand needed.
    corpus
      .select(col(idCol), grams(col(textCol)).as("__g"))
      .select(col(idCol), size(col("__g")).cast("long").as("n_grams"),
        explode_outer(col("__g")).as("gram"))
      .select(col(idCol), col("n_grams"),
        text.hash60(col("gram"), "decon").as("gh"))
      .join(benchGrams, col("gh") === col("bh"), "left")
      .groupBy(col(idCol), col("n_grams"))
      .agg(count(col("bh")).as("overlap_grams"))
      .withColumn("contaminated", col("overlap_grams") >= minOverlap)
  }

  /** The removal form: corpus rows with fewer than `minOverlap` shared
    * n-grams — `flag`'s contaminated ids anti-joined back against the
    * original rows. */
  def clean(corpus: DataFrame, bench: DataFrame, idCol: String, textCol: String,
            n: Int = 8, minOverlap: Int = 1): DataFrame = {
    val contaminatedIds = flag(corpus, bench, idCol, textCol, n, minOverlap)
      .filter(col("contaminated"))
      .select(col(idCol))
    corpus.join(contaminatedIds, Seq(idCol), "left_anti")
  }
}
