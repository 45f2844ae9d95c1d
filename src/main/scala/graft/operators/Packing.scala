package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.text

/** Sequence packing for training-batch assembly (north-star surface; no
  * reference analog — wurzel hands chunks straight to the embedder).
  * Pre-training pipelines concatenate documents into fixed-token-budget
  * sequences to avoid padding waste; the assignment step is "which docs
  * share a pack, in what order".
  *
  * Strategy: deterministic greedy fill per shard. Docs are hash-sharded
  * (content-addressed, like Sampling.byHash — reruns and appends never
  * reshuffle existing shards' relative order), ordered inside each shard
  * by (hash, id), and packed greedily: a doc joins the current pack unless
  * it would push the token sum over `budget`, else it opens the next pack.
  * A doc larger than the budget gets a pack of its own.
  *
  * Scale shape (100 TB): ONE shuffle (groupByKey on the shard) with a
  * secondary sort — `flatMapSortedGroups` streams each shard's docs in
  * order through an O(1)-state accumulator, so per-task memory is
  * constant no matter the shard size; `shards` bounds parallelism, not
  * memory. This is the Spark idiom for inherently-sequential per-group
  * logic — a window cumsum could not express the greedy reset, and a
  * driver-side loop would not distribute.
  */
object Packing {

  /** Encoder row for the packer input (public: Catalyst's generated
    * deserializer cannot access a private nested case class). */
  case class In(id: Long, shard: Long, h: Long, tok: Int)

  /** Assign every row to (shard, pack, slot): `pack` is the greedy bin
    * index within the shard, `slot` the doc's position inside its pack. */
  def greedy(df: DataFrame, idCol: String, textCol: String,
             budget: Int, shards: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    locally {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val dt = df.schema(idCol).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"$idCol must be an integral id column, got $dt (string ids would " +
          "cast to null and crash the encoder — hash them to a long first)")
    }
    val spark = df.sparkSession
    import spark.implicits._
    // stage the select so the md5-based hash evaluates once per row and
    // shard derives from the projected attribute; null text counts as the
    // empty string (one empty token), same as the rest of the engine
    val in: Dataset[In] = df.select(
        col(idCol).cast("long").as("id"),
        text.hash60(col(idCol).cast("string"), "pack").as("h"),
        text.tokenCount(coalesce(col(textCol), lit(""))).as("tok"))
      .select(col("id"), pmod(col("h"), lit(shards.toLong)).as("shard"),
        col("h"), col("tok"))
      .as[In]
    in.groupByKey(_.shard)
      .flatMapSortedGroups($"h", $"id") { (shard, it) =>
        var first = true
        var pack = 0L
        var acc = 0L
        var slot = 0L
        it.map { r =>
          if (first) { first = false; acc = r.tok.toLong }
          else if (acc + r.tok > budget) { pack += 1; acc = r.tok.toLong; slot = 0L }
          else { acc += r.tok; slot += 1 }
          (r.id, shard, pack, slot, r.tok.toLong)
        }
      }
      .toDF(idCol, "shard", "pack", "slot", "tok")
  }

  /** Per-pack fill report: docs, token total, waste vs the budget. */
  def packStats(assigned: DataFrame, budget: Int): DataFrame =
    assigned.groupBy(col("shard"), col("pack"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tok_sum"))
      .withColumn("waste",
        when(col("tok_sum") >= budget, lit(0L))
          .otherwise(lit(budget.toLong) - col("tok_sum")))
}
