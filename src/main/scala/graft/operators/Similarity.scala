package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.vectors._

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
  */
object Similarity {

  /** Brute-force top-k by quantized cosine. `queries`/`cands` need columns
    * (idCol, vecCol). Returns (qid, cid, rank, cosine). */
  def bruteTopK(cands: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String, kTop: Int): DataFrame = {
    // Norms are computed once per row before the pair join — cosine per pair
    // is then one dot product + two IEEE-exact sqrts.
    val q = queries.select(col(idCol).as("qid"), quantize(col(vecCol)).as("qv"))
      .withColumn("qn", normSqQ(col("qv")))
    val c = cands.select(col(idCol).as("cid"), quantize(col(vecCol)).as("cv"))
      .withColumn("cn", normSqQ(col("cv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (dotQ(col("qv"), col("cv")).cast("double")
          / (sqrt(col("qn").cast("double")) * sqrt(col("cn").cast("double")))).as("cosine"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= kTop)
  }

  /** LSH-bucketed top-k: same contract as `bruteTopK` but only same-bucket
    * candidates are scored (approximate; deterministic). */
  def lshTopK(cands: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, kTop: Int, planes: Int = 6): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), quantize(col(vecCol)).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), planes, "ann"))
      .withColumn("qn", normSqQ(col("qv")))
    val c = cands.select(col(idCol).as("cid"), quantize(col(vecCol)).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), planes, "ann"))
      .withColumn("cn", normSqQ(col("cv")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (dotQ(col("qv"), col("cv")).cast("double")
          / (sqrt(col("qn").cast("double")) * sqrt(col("cn").cast("double")))).as("cosine"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= kTop)
  }
}
