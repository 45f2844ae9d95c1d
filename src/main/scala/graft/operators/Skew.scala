package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4 physical-layout notes: "salted
  * keys for skewed groupBy"; BASELINE north star — 100 TB operators).
  *
  * AQE's skew-join splitting covers joins at runtime; for aggregations over
  * pathologically hot keys (one URL domain with 10% of the corpus, one
  * near-dup band bucket with millions of members) the two-phase salted
  * aggregate keeps every reducer bounded: phase 1 aggregates on
  * (key, salt) — hot keys fan out over `salt` reducers — phase 2 merges the
  * partials per key. Only algebraic aggregates (sum/count/min/max) compose
  * this way; use it when a plain groupBy shows a straggling reducer.
  */
object Skew {

  /** Deterministic salt column in [0, buckets). */
  def saltCol(buckets: Int, tiebreak: Column): Column =
    pmod(hash(tiebreak), lit(buckets))

  /** Two-phase salted sum/count per key: returns (keyCol, sum_<valueCol>,
    * cnt) with exactly the values of a direct groupBy — decimal sums keep
    * partition-order independence. */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
                     tiebreakCol: String, buckets: Int = 32): DataFrame = {
    val partial = df
      .withColumn("__salt", saltCol(buckets, col(tiebreakCol)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(
        sum(col(valueCol).cast("decimal(12,2)")).as("__psum"),
        count(lit(1)).as("__pcnt"))
    partial
      .groupBy(col(keyCol))
      .agg(
        sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }

  /** Salted near-dup band join: cap a hot LSH bucket by splitting it into
    * `cap`-sized sub-buckets deterministically. Trades recall inside
    * oversized buckets for a hard bound on join fan-out — the standard
    * escape hatch when a degenerate band (e.g. empty-text docs) would
    * otherwise produce a quadratic pair explosion. */
  def subBucket(bandCol: Column, idCol: Column, cap: Int): Column =
    subBucket(bandCol, idCol, lit(cap))

  /** Column-count variant: the number of sub-buckets can be computed per
    * row (e.g. `ceil(band_size / cap)` so the cap bounds sub-bucket SIZE
    * rather than sub-bucket count).
    *
    * Uses the engine's md5/hash60 id-hash — the SAME scheme
    * Dedup.capBandFanout inlines (there with the per-row window count as
    * nSub) — so sub-buckets built through this helper stay reproducible
    * in the DuckDB oracles; Spark's Murmur3 `hash` would not be. */
  def subBucket(bandCol: Column, idCol: Column, nSub: Column): Column =
    concat_ws("#", bandCol,
      pmod(graft.functions.text.hash60(idCol.cast("string"), "band"), nSub))
}
