package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.text.hash60

/** Deterministic sampling for training-data pipelines (north-star surface;
  * the reference has no sampling step — its corpora fit one machine).
  *
  * Both samplers are pure functions of row content, not of partitioning,
  * executor count, or row order: re-running the pipeline, rescaling the
  * cluster, or adding unrelated rows never flips a row's keep/drop
  * decision (`rand()`/`TABLESAMPLE` give none of these guarantees). The
  * hash is the engine's md5/hash60 scheme, so a DuckDB oracle reproduces
  * the exact selection.
  *
  * Scale notes (100 TB): [[byHash]] is a map-side filter — no shuffle, no
  * state, pushdown-friendly. [[perGroup]] is one shuffle on the group key
  * into bounded per-group heaps (GroupTopKExec) — never a full sort, never
  * a per-group collect.
  */
object Sampling {

  /** The keep/drop decision column: true iff the row is in the sample.
    * `basisPoints` of 10000 = keep everything; 250 = 2.5 %. Buckets are
    * `hash60(id || '#' || seed) % 10000`, so samples at different rates
    * NEST: every row kept at 250 bp is also kept at 500 bp. */
  def keepCol(id: Column, basisPoints: Int, seed: String): Column =
    pmod(hash60(id.cast("string"), seed), lit(10000L)) < basisPoints

  /** Deterministic Bernoulli-by-hash sample: keeps ~basisPoints/10000 of
    * rows, exactly reproducibly. */
  def byHash(df: DataFrame, idCol: String, basisPoints: Int,
             seed: String = "sample"): DataFrame = {
    require(basisPoints >= 0 && basisPoints <= 10000,
      s"basisPoints must be in [0, 10000], got $basisPoints")
    df.filter(keepCol(col(idCol), basisPoints, seed))
  }

  /** Exact deterministic k-per-group sample (stratified): the k rows with
    * the smallest hash rank within each group — a uniform-without-
    * replacement draw per stratum, stable across runs. Rides the
    * GroupTopKExec bounded-heap operator: one shuffle on the group key,
    * heap memory O(k) per group, no sort of the group's full contents. */
  def perGroup(df: DataFrame, groupCol: String, idCol: String, k: Int,
               seed: String = "sample"): DataFrame =
    graft.plans.GroupTopK.topK(
      df.withColumn("__rank", hash60(col(idCol).cast("string"), seed)),
      Seq(groupCol), Seq(col("__rank").asc, col(idCol).asc), k)
      .drop("__rank")

  /** Mixture-weighted sample: the per-ROW rate (a basis-points column,
    * 0..10000 — typically a CASE over domain/language/quality bucket)
    * replaces byHash's global rate. This is the training-mixture
    * reweighting op (sample web at 10 %, wiki at 100 %, ...) — still a
    * pure map-side filter on the same nested hash buckets, so raising a
    * stratum's rate only ADDS rows to its sample and reruns never flip a
    * decision. Rows with a null rate are dropped; a rate outside
    * [0, 10000] throws at runtime (same fail-fast contract as byHash's
    * require — a fraction or percent column passed by mistake must not
    * silently produce an empty or 100x-thinned sample). */
  def byHashWeighted(df: DataFrame, idCol: String, rateBpCol: Column,
                     seed: String = "sample"): DataFrame = {
    val bp = rateBpCol.cast("long")
    // integrality check: a fraction column (0.5 meaning 50%) would truncate
    // to 0 bp and silently empty the sample — exactly the mistake the
    // fail-fast contract exists for
    val valid = bp.isNull ||
      (bp >= 0 && bp <= 10000 && rateBpCol.cast("double") === bp.cast("double"))
    val checked = when(valid, bp)
      .otherwise(raise_error(format_string(
        "byHashWeighted rate must be integral basis points in [0, 10000], got %s",
        rateBpCol.cast("string"))).cast("long"))
    df.filter(pmod(hash60(col(idCol).cast("string"), seed), lit(10000L)) < checked)
  }
}
