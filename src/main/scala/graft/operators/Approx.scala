package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates for the 100 TB report path (SURVEY.md §2.4;
  * round-1 verdict plan audit: q03's exact two-countDistinct Expand is
  * correct for the oracle but the report path at 100x should sketch).
  *
  * Shapes:
  *  - approx_count_distinct (HyperLogLog++): one pass, no Expand, fixed
  *    ~few-KB state per group vs a shuffle of every distinct value;
  *  - approx_percentile (GK sketch): replaces exact percentile's full sort;
  *  - both compose map-side (partial aggregation) so the exchange carries
  *    sketches, not values.
  *
  * The exact forms stay the oracle-checked queries (q03, q45); these are
  * the operators a pipeline calls when the answer feeds a dashboard, not a
  * hash compare. rsd defaults to Spark's 5%.
  */
object Approx {

  /** Per-group approximate distinct counts for `distinctCols`, plus exact
    * row count. */
  def distinctCounts(df: DataFrame, groupCols: Seq[String],
                     distinctCols: Seq[String], rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        distinctCols.map(c => approx_count_distinct(col(c), rsd).as(s"approx_$c")): _*)

  /** Per-group percentile sketch: p25/p50/p75/p95 of `valueCol` with
    * bounded `accuracy` memory (10000 ~ 1/10000 rank error). */
  def percentileSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(valueCol),
        array(lit(0.25), lit(0.5), lit(0.75), lit(0.95)), lit(accuracy)).as("pcts"))
      .select((groupCols.map(col) ++ Seq(
        element_at(col("pcts"), 1).as("p25"),
        element_at(col("pcts"), 2).as("p50"),
        element_at(col("pcts"), 3).as("p75"),
        element_at(col("pcts"), 4).as("p95"))): _*)
}
