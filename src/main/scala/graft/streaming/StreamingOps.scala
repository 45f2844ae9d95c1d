package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twins of the batch event operators (SURVEY.md §2.13
  * T4). The batch formulations in graft.operators.Events are what the t2
  * oracle checks; these are the same logical aggregations declared over a
  * streaming DataFrame — watermarked, incremental, restart-safe. The
  * reference has no stream processing (its "streaming" is Argo cron
  * re-runs, backend_argo.py:414-456); this is north-star surface.
  */
object StreamingOps {

  /** Tumbling-window counts/sums with late-data watermark. */
  def tumblingAgg(events: DataFrame, tsCol: String, window_ : String,
                  watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding windows. */
  def slidingAgg(events: DataFrame, tsCol: String, window_ : String, slide: String,
                 watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_, slide).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("n"))

  /** Streaming dedup with bounded state: duplicates arriving within the
    * watermark horizon are dropped, and state for keys older than the
    * watermark is evicted automatically — the built-in operator form of
    * StatefulDedup's TTL (dedup key state must be bounded on an unbounded
    * stream; an un-watermarked dropDuplicates grows state forever). */
  def dedupWithinWatermark(events: DataFrame, tsCol: String, keyCols: Seq[String],
                           watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Session windows with a fixed inactivity gap — the streaming-native
    * equivalent of Events.sessionize (which the batch oracle checks). */
  def sessionAgg(events: DataFrame, tsCol: String, keyCol: String, gap: String,
                 watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col(keyCol), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))
}
