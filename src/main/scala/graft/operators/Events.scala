package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time/event operators (SURVEY.md §2.13 T4, §2.3 J6, §2.5 W2).
  *
  * Batch formulations that are 1:1 expressible in ANSI SQL (for the DuckDB
  * oracle) and whose streaming twins live in `graft.streaming`. All window
  * orderings carry an id tiebreak so results are total-ordered and
  * hash-stable.
  */
object Events {

  /** Tumbling-window key: epoch-aligned bucket start, formatted as a string
    * (timestamps are never emitted raw — parquet INT96 vs ns round-trips
    * would make oracle hashes flaky). */
  def tumbleStart(ts: Column, seconds: Int): Column =
    date_format(
      timestamp_seconds(floor(unix_timestamp(ts) / seconds) * seconds),
      "yyyy-MM-dd HH:mm:ss")

  /** Gaps-and-islands sessionization: a new session starts when the gap to
    * the previous event of the same key exceeds `gapSeconds`. Returns the
    * input plus `session_start` (string key of the session's first event).
    * Same semantics as streaming `session_window` with a fixed gap. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
                 gapSeconds: Int): DataFrame = {
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val newSession = when(
      unix_timestamp(col(tsCol)) - unix_timestamp(lag(col(tsCol), 1).over(wOrd)) > gapSeconds
        || lag(col(tsCol), 1).over(wOrd).isNull, 1L).otherwise(0L)
    val withSess = df.withColumn("__new", newSession)
      .withColumn("session_seq",
        sum(col("__new")).over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withSess
      .withColumn("session_start",
        date_format(min(col(tsCol)).over(
          Window.partitionBy(col(keyCol), col("session_seq"))), "yyyy-MM-dd HH:mm:ss"))
      .drop("__new", "session_seq") // internal helpers — the contract is input + session_start
  }

  /** Last-wins dedup as an aggregation (SURVEY.md §2.7 U3 — the 100 TB
    * shape). `max_by(struct(all columns), struct(orderCols...))` keeps the
    * row with the lexicographically greatest order key per group in ONE
    * shuffle with map-side partial aggregation — no per-partition full sort
    * like the row_number window form (q22 keeps the window form because the
    * oracle replicates it; this is the operator to call in pipelines). */
  def lastWins(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    val ord = struct(orderCols.map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, ord).as("__last"))
      .select(col("__last.*"))
  }

  /** First-wins twin (min_by): keep the earliest row per group — the
    * aggregate form of exact dedup's keep-min-tiebreak representative. */
  def firstWins(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    val ord = struct(orderCols.map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(min_by(payload, ord).as("__first"))
      .select(col("__first.*"))
  }

  /** As-of lookup inside one table: for each row, the most recent timestamp
    * (formatted) of a marker predicate within the same key, at-or-before the
    * row. Window-function formulation of the as-of join — shuffles once on
    * the key, no range join (SURVEY.md §2.3 J6 + W2 carry-forward pattern). */
  def asofMarker(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
                 marker: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("asof_ts",
      last(when(marker, date_format(col(tsCol), "yyyy-MM-dd HH:mm:ss")), ignoreNulls = true)
        .over(w))
  }
}
