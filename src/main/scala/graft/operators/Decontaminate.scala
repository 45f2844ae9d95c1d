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
  *  - corpus grams are computed in one JVM kernel pass per row
  *    (Kernels.shingleArr — distinct per doc, so the post-join count is
  *    exactly "distinct contaminated grams") and only the 8-byte hash plus
  *    the doc id survive the explode;
  *  - the per-doc overlap count aggregates AFTER the broadcast join has
  *    discarded every clean gram, so the single shuffle carries only rows
  *    from contaminated docs;
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
        .select(text.hash60(col("gram"), "decon").as("gh"))
        .distinct()
      if (broadcastBench) broadcast(g) else g
    }
    val overlap = corpus
      .select(col(idCol), explode(grams(col(textCol))).as("gram"))
      .select(col(idCol), text.hash60(col("gram"), "decon").as("gh"))
      .join(benchGrams, "gh")
      // grams are distinct within a doc and benchGrams is distinct, so a
      // plain count is the distinct-overlap count — no count(distinct)
      // (and its extra Expand/shuffle) needed
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("overlap_grams"))
    corpus
      .select(col(idCol), size(grams(col(textCol))).cast("long").as("n_grams"))
      .join(overlap, Seq(idCol), "left")
      .withColumn("overlap_grams", coalesce(col("overlap_grams"), lit(0L)))
      .withColumn("contaminated", col("overlap_grams") >= minOverlap)
  }

  /** The removal form: corpus rows with fewer than `minOverlap` shared
    * n-grams. Same plan as `flag` minus the clean-side bookkeeping. */
  def clean(corpus: DataFrame, bench: DataFrame, idCol: String, textCol: String,
            n: Int = 8, minOverlap: Int = 1): DataFrame = {
    val contaminatedIds = flag(corpus, bench, idCol, textCol, n, minOverlap)
      .filter(col("contaminated"))
      .select(col(idCol))
    corpus.join(contaminatedIds, Seq(idCol), "left_anti")
  }
}
