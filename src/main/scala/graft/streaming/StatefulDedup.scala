package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact-dedup with keyed state (SURVEY.md §2.13 T2 streaming
  * variant: `KeyValueGroupedDataset.flatMapGroupsWithState` — the
  * reference's SelfConsumingLeafStep "reduce double work" semantics applied
  * continuously: a document whose content hash was already seen in the
  * stream is dropped, first occurrence wins).
  *
  * State per key is one boolean (seen), with a processing-time TTL so state
  * size tracks the live dedup horizon, not the stream's lifetime — the knob
  * that keeps this viable on an unbounded 100 TB stream.
  */
object StatefulDedup {

  final case class Keyed(key: String, payload: String)

  private implicit val keyedEnc: Encoder[Keyed] = Encoders.product[Keyed]
  private implicit val boolEnc: Encoder[Boolean] = Encoders.scalaBoolean

  /** The state function both entry points run: drop keys already seen,
    * emit the first row of an unseen key, arm the TTL. */
  private def firstWins(ttl: Option[String])(
      key: String, rows: Iterator[Keyed], state: GroupState[Boolean]): Iterator[Keyed] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else if (state.exists) Iterator.empty // already emitted this key
    else {
      state.update(true)
      ttl.foreach(state.setTimeoutDuration)
      rows.take(1) // first occurrence in this batch wins
    }
  }

  /** First-occurrence-wins dedup over `key` (e.g. sha256 of the content).
    *
    * `ttl = Some("24 hours")` bounds state via processing-time timeouts —
    * note that timeout evaluation makes the engine schedule batches even
    * without new data (so `processAllAvailable` on an idle stream will not
    * return); production queries run with a processing-time trigger where
    * that is exactly the desired behavior. `ttl = None` keeps state forever
    * (bounded-horizon backfills, tests). */
  def dedupStream(ds: Dataset[Keyed], ttl: Option[String] = Some("24 hours")): Dataset[Keyed] = {
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[Boolean, Keyed](OutputMode.Append(), timeoutConf)(firstWins(ttl))
  }

  /** Deterministic batch replay of the SAME state function (the oracle
    * path, q67): the caller pre-partitions `df` by `key` and sorts
    * (key, <arrival order>) within partitions; grouping via
    * `groupBy(col).as[K, V]` keeps the key a plain column, so the
    * operator's hash-distribution and key-only sort requirements are both
    * satisfied by the existing exchange/sort and Spark inserts NO re-sort
    * — `rows.take(1)` is exactly the stream's first arrival. (Typed
    * `groupByKey(_.key)` would NOT work here: its AppendColumns synthesizes
    * a fresh grouping column, forcing a second shuffle + key-only re-sort
    * that destroys within-group order — StreamingSpec plan-asserts the
    * distinction.) Batch execution invokes the function once per key with
    * empty state, so the TTL branch is moot. */
  def dedupReplay(df: DataFrame): Dataset[Keyed] = {
    df.groupBy(col("key")).as[String, Keyed](Encoders.STRING, keyedEnc)
      .flatMapGroupsWithState[Boolean, Keyed](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(firstWins(None))
  }
}
