package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-pruned membership joins — the scale path for semi/anti joins whose
  * member side is too large to broadcast EXACTLY but whose Bloom filter fits
  * comfortably (the crawl-ingest shape: "drop every URL we already hold" with
  * 10^9 seen URLs — an exact broadcast set is tens of GB, the 3%-fpp filter
  * is ~1 GB; a full shuffle join moves the 100 TB corpus).
  *
  * Both forms keep EXACT join semantics — the filter only changes the plan:
  *  - [[semiJoin]]: the filter drops non-members at the SCAN (map-side), so
  *    the exact confirm join shuffles only true matches + the fpp sliver
  *    instead of the whole corpus. (Spark's own InjectRuntimeFilter plays
  *    this trick cost-based for selective-filtered creation sides; this is
  *    the deterministic, explicit form for membership sets.)
  *  - [[antiJoin]]: a Bloom filter has NO false negatives, so a row that
  *    fails `mightContain` is DEFINITELY absent from the member side and is
  *    emitted with no join at all. Only the bloom-positive sliver — true
  *    members plus the fpp share of survivors — goes through the exact
  *    left_anti confirm. The non-member bulk (the dominant part of a dedup
  *    subtract) never shuffles. Costs a second scan of the corpus; at scale
  *    a columnar re-scan is far cheaper than shuffling the corpus, and the
  *    caller can cache the input when it is not.
  *
  * Keys of any atomic type are normalized through xxhash64 on BOTH sides, so
  * filter construction and probing agree byte-for-byte; a 64-bit collision
  * can only ADD a bloom-positive row, which the exact confirm join on the
  * REAL key then discards — correctness never depends on the hash.
  *
  * Driver/executor state is the filter itself (`numBits/8` bytes, default
  * fpp 3%): built with `DataFrameStatFunctions.bloomFilter` (a tree
  * aggregation — executors build partial filters, the driver holds one
  * merged copy) and shipped once per executor via a broadcast variable,
  * never per task.
  */
object BloomPrune {

  /** Build the membership filter over `members(keyCol)`, keyed on xxhash64.
    * `expectedItems < 0` auto-sizes with a count of the member side (one
    * scan-only agg job over the key column — the member side is the smaller
    * side by premise). */
  def keyFilter(members: DataFrame, keyCol: String,
                expectedItems: Long = -1L, fpp: Double = 0.03): BloomFilter = {
    val keyed = members.select(xxhash64(col(keyCol)).as("__h"))
    // Zero member rows: stat.bloomFilter's aggregate has nothing to build
    // from (NPEs driver-side) — an empty filter (contains nothing) is the
    // correct value: semi yields nothing, anti passes everything. The
    // emptiness check is explicit (head-1 probe, short-circuits) rather
    // than a blanket NPE catch: mapping an unexpected failure on a
    // NON-empty member side to an empty filter would silently void the
    // no-false-negative guarantee antiJoin's map-side branch relies on.
    if (keyed.isEmpty) BloomFilter.create(1, fpp)
    else {
      val n = if (expectedItems >= 0) expectedItems else keyed.count()
      keyed.stat.bloomFilter("__h", math.max(n, 1L), fpp)
    }
  }

  /** `mightContain` probe column over an already-broadcast filter — the
    * caller broadcasts ONCE and derives every probe from the same handle
    * (antiJoin probes twice; two broadcasts would ship and pin the
    * ~GB-scale filter twice per executor). The probe is a native codegen
    * Expression (plans/BloomProbeExpr), so the corpus scan it runs on
    * stays inside WholeStageCodegen — a ScalaUDF here would fence the
    * exact full-table scan this operator exists to keep cheap. */
  private def probe(bc: org.apache.spark.broadcast.Broadcast[BloomFilter],
                    keyCol: String): Column = {
    import org.apache.spark.sql.classic.GraftPlanBridge
    GraftPlanBridge.column(graft.plans.BloomProbeExpr(
      GraftPlanBridge.staticExpr(xxhash64(col(keyCol))), bc))
  }

  /** Exact left-semi join, Bloom-pruned: corpus rows whose key appears in
    * `members(memberKey)`. The shuffle carries matches + fpp·|corpus| rows
    * instead of |corpus|. */
  def semiJoin(corpus: DataFrame, corpusKey: String,
               members: DataFrame, memberKey: String,
               expectedItems: Long = -1L, fpp: Double = 0.03): DataFrame = {
    val bf = keyFilter(members, memberKey, expectedItems, fpp)
    val bc = corpus.sparkSession.sparkContext.broadcast(bf)
    corpus.filter(probe(bc, corpusKey))
      .join(members.select(col(memberKey).as(corpusKey)), Seq(corpusKey), "left_semi")
  }

  /** Exact left-anti join, Bloom-pruned: corpus rows whose key does NOT
    * appear in `members(memberKey)`. Bloom-negative rows (no false
    * negatives ⇒ definitely absent) are emitted map-side with no exchange;
    * only the bloom-positive sliver runs the exact left_anti confirm. */
  def antiJoin(corpus: DataFrame, corpusKey: String,
               members: DataFrame, memberKey: String,
               expectedItems: Long = -1L, fpp: Double = 0.03): DataFrame = {
    val bf = keyFilter(members, memberKey, expectedItems, fpp)
    val bc = corpus.sparkSession.sparkContext.broadcast(bf)
    val definitelyAbsent = corpus.filter(!probe(bc, corpusKey))
    val confirmed = corpus.filter(probe(bc, corpusKey))
      .join(members.select(col(memberKey).as(corpusKey)), Seq(corpusKey), "left_anti")
    definitelyAbsent.unionByName(confirmed)
  }
}
