package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
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

  /** First-occurrence-wins dedup over `key` (e.g. sha256 of the content).
    *
    * `ttl = Some("24 hours")` bounds state via processing-time timeouts —
    * note that timeout evaluation makes the engine schedule batches even
    * without new data (so `processAllAvailable` on an idle stream will not
    * return); production queries run with a processing-time trigger where
    * that is exactly the desired behavior. `ttl = None` keeps state forever
    * (bounded-horizon backfills, tests). */
  def dedupStream(ds: Dataset[Keyed], ttl: Option[String] = Some("24 hours")): Dataset[Keyed] = {
    implicit val enc: Encoder[Keyed] = Encoders.product[Keyed]
    implicit val boolEnc: Encoder[Boolean] = Encoders.scalaBoolean
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[Boolean, Keyed](OutputMode.Append(), timeoutConf) {
        (_: String, rows: Iterator[Keyed], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) Iterator.empty // already emitted this key
          else {
            state.update(true)
            ttl.foreach(state.setTimeoutDuration)
            rows.take(1) // first occurrence in this batch wins
          }
      }
  }
}
