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
  /** Temperature-resampled group mixture — the multilingual/domain
    * balancing op (mT5/XLM-R style): group g keeps rate
    * (n_min / n_g)^(1-alpha) of its rows, so the smallest group keeps
    * everything (10000 bp), bigger groups are thinned toward it, alpha=1
    * keeps the natural distribution and alpha->0 flattens toward equal
    * group volumes. Rates are computed from one tiny groupBy(count) and
    * broadcast-joined back; selection is [[byHashWeighted]]'s map-side
    * content-addressed filter, so the corpus never shuffles and reruns
    * never flip a row's decision.
    *
    * Determinism: at the default alpha=0.5 the ratio is
    * sqrt(n_min)/sqrt(n_g) — IEEE sqrt is correctly rounded, so the
    * basis-point floor is bit-identical across engines (the q105 oracle).
    * Other alphas go through pow(), which may differ in the last ulp
    * across math libraries; at basis-point granularity that is safe in
    * practice but not certified exact.
    *
    * @return the sampled rows: `df`'s columns plus `rate_bp`. */
  def temperatureMixture(df: DataFrame, idCol: String, groupCol: String,
                         alpha: Double = 0.5, seed: String = "sample"): DataFrame =
    byHashWeighted(df.join(broadcast(temperatureRates(df, groupCol, alpha)),
      Seq(groupCol)), idCol, col("rate_bp"), seed)

  /** The per-group basis-point rates [[temperatureMixture]] samples by,
    * exposed for rate COMPOSITION (multiply with a soft-dedup or quality
    * rate via [[composeRates]] before one shared hash filter).
    * @return (groupCol, rate_bp) — group-count-sized, broadcastable. */
  def temperatureRates(df: DataFrame, groupCol: String,
                       alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, "temperatureRates: alpha must be in (0, 1]")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val nmin = counts.agg(min(col("__n")).as("__nmin"))
    val ratio: Column =
      if (alpha == 0.5)
        sqrt(col("__nmin").cast("double")) / sqrt(col("__n").cast("double"))
      else
        pow(col("__nmin").cast("double"), lit(1 - alpha)) /
          pow(col("__n").cast("double"), lit(1 - alpha))
    counts.crossJoin(broadcast(nmin))
      .select(col(groupCol), floor(lit(1e4) * ratio).cast("long").as("rate_bp"))
  }

  /** Exact integer product of two basis-point rates: (a * b) div 10000 —
    * the composition law for independent thinning decisions (keep iff a
    * single hash bucket clears the combined rate). Floor semantics make
    * the composite rate <= min(a, b), so the composed sample is a SUBSET
    * of each single-rate sample over the same seed — rate stacking can
    * only remove rows, never flip one in. */
  def composeRates(a: Column, b: Column): Column = {
    // (a*b) div 10000 in exact arithmetic without a SQL-string round-trip:
    // subtract the mod first so the double division is of an exactly-
    // divisible product <= 1e8 — bit-exact vs DuckDB's integer //
    val p = a.cast("long") * b.cast("long")
    ((p - pmod(p, lit(10000L))) / 10000).cast("long")
  }

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
