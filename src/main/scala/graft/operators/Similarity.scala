package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Kernels

/** Approximate-nearest-neighbor / similarity search (SURVEY.md §2.8 D5).
  *
  * Baseline: brute-force cosine top-k — the query set is broadcast (it is
  * small by construction) and each candidate partition scores locally; the
  * only shuffle is the final per-query top-k, which is bounded by k·|queries|
  * after per-partition pruning by Spark's TakeOrdered-style window.
  *
  * Scale path: `lshTopK` buckets both sides with random-hyperplane LSH and
  * turns the cross join into an equi-join on the bucket id — at 100 TB the
  * candidate set per query drops by ~2^planes while recall stays high for
  * high-cosine neighbors.
  *
  * Kernels: quantization (floor(x·1e6) → exact integer dot products — see
  * graft.functions.vectors for the determinism spec), norms and LSH buckets
  * are computed in ONE JVM UDF pass per row; the per-pair work is a single
  * integer dot product. The Column-expression formulations in
  * graft.functions.vectors define the same values for the SQL oracle.
  */
object Similarity {

  private def cosine = (dot: org.apache.spark.sql.Column,
                        qn: org.apache.spark.sql.Column,
                        cn: org.apache.spark.sql.Column) =>
    dot.cast("double") / (sqrt(qn.cast("double")) * sqrt(cn.cast("double")))

  /** Brute-force top-k by quantized cosine. `queries`/`cands` need columns
    * (idCol, vecCol). Returns (qid, cid, rank, cosine). */
  def bruteTopK(cands: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String, kTop: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), Kernels.quantNormUdf(col(vecCol)).as("qf"))
      .select(col("qid"), col("qf._1").as("qv"), col("qf._2").as("qn"))
    val c = cands.select(col(idCol).as("cid"), Kernels.quantNormUdf(col(vecCol)).as("cf"))
      .select(col("cid"), col("cf._1").as("cv"), col("cf._2").as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        cosine(graft.plans.DotLongExpr.dotLong(col("qv"), col("cv")), col("qn"), col("cn")).as("cosine"))
    rankTopK(scored, kTop)
  }

  /** Heap-prune to the k best per query (GroupTopKExec: map-side partial,
    * no full sort of the scored pairs), then rank the <= k survivors — the
    * ranking window reuses the prune's exchange and sorts k rows per
    * group, not the whole score matrix. Same rows and ranks as the pure
    * window form (ties broken by cid in both). Shared contract for every
    * (qid, cid, cosine) scorer — IvfIndex.topK calls this too. */
  private[operators] def rankTopK(scored: DataFrame, kTop: Int): DataFrame = {
    val pruned = graft.plans.GroupTopK.topK(
      scored, Seq("qid"), Seq(col("cosine").desc, col("cid")), kTop)
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    pruned.withColumn("rank", row_number().over(w)).filter(col("rank") <= kTop)
  }

  /** LSH-bucketed top-k: same contract as `bruteTopK` but only same-bucket
    * candidates are scored (approximate; deterministic). */
  def lshTopK(cands: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, kTop: Int, planes: Int = 6): DataFrame = {
    val feat = Kernels.vecFeaturesUdf(planes, "ann")
    val q = queries.select(col(idCol).as("qid"), feat(col(vecCol)).as("qf"))
      .select(col("qid"), col("qf._1").as("qv"), col("qf._2").as("qn"), col("qf._3").as("bucket"))
    val c = cands.select(col(idCol).as("cid"), feat(col(vecCol)).as("cf"))
      .select(col("cid"), col("cf._1").as("cv"), col("cf._2").as("cn"), col("cf._3").as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        cosine(graft.plans.DotLongExpr.dotLong(col("qv"), col("cv")), col("qn"), col("cn")).as("cosine"))
    rankTopK(scored, kTop)
  }
}
