package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Kernels

/** IVF-style ANN (SURVEY.md §2.8 D5 scale path; north-star "an IVF or
  * LSH-bucketed variant"): a coarse quantizer (k-means over quantized
  * vectors) partitions the corpus into cells; a query probes only its
  * `nprobe` nearest cells, turning brute-force scoring into an equi-join on
  * the cell id. Complements `Similarity.lshTopK` — IVF adapts to the data
  * distribution where random hyperplanes do not.
  *
  * Fully deterministic (cluster-safe): centroid seeds are the k rows with
  * the smallest md5-derived rank (not "first k" — partition-order free),
  * Lloyd updates use exact integer sums with integer division, and
  * assignment distance is exact integer arithmetic on quantized vectors
  * (dist² = |a|² − 2a·c + |c|², all < 2^62 for 1e6-scaled embeddings).
  * Per-iteration state (k × dim longs) is tiny and driver-held; the data
  * never leaves executors except as per-cell per-dimension partial sums.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Long]]) extends Serializable

  /** Persist the fitted quantizer (k rows of (cell_id, centroid)) — fit
    * once, serve many query batches without re-clustering the corpus. The
    * model is k x dim longs, so save/load move kilobytes, not data. */
  def save(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): Model = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(col("cell_id"), col("centroid"))
      .as[(Int, Seq[Long])].collect().sortBy(_._1) // k rows — bounded
    require(rows.nonEmpty, s"no IVF model at $path")
    require(rows.map(_._1).toSeq == rows.indices.toSeq, s"non-dense cell ids at $path")
    // fail fast at the driver: a ragged model would otherwise surface as an
    // executor ArrayIndexOutOfBounds (or silently wrong cells) in nearest()
    require(rows.map(_._2.length).distinct.size == 1,
      s"ragged centroid dimensions at $path: ${rows.map(_._2.length).distinct}")
    Model(rows.map(_._2.toArray))
  }

  private def distSq(a: Array[Long], c: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { val d = a(i) - c(i); s += d * d; i += 1 }
    s
  }

  /** Nearest-centroid id with lowest-id tiebreak. */
  def nearest(qv: Array[Long], centroids: Array[Array[Long]]): Int = {
    var best = 0; var bestD = Long.MaxValue; var c = 0
    while (c < centroids.length) {
      val d = distSq(qv, centroids(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** `nprobe` nearest centroid ids, ascending by (distance, id). */
  def nearestN(qv: Array[Long], centroids: Array[Array[Long]], nprobe: Int): Array[Int] =
    centroids.indices
      .sortBy(c => (distSq(qv, centroids(c)), c))
      .take(nprobe).toArray

  /** Deterministic k-means fit. The quantized projection is cached for the
    * duration of the fit: each Lloyd iteration is one full pass, and
    * without the cache every iteration (plus the seed scan) would re-read
    * and re-quantize the source parquet — 4 scans of the corpus for the
    * default 3 iterations. Unpersisted before returning. */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int = 3): Model = {
    val spark = df.sparkSession
    val q = df.select(col(idCol).as("id"), Kernels.quantNormUdf(col(vecCol)).as("f"))
      .select(col("id"), col("f._1").as("qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try fitCached(spark, q, k, iters)
    finally { q.unpersist(); () }
  }

  /** Shared by PqIndex's per-sub-space codebook training. */
  private[operators] def fitCached(spark: org.apache.spark.sql.SparkSession, q: DataFrame,
                                   k: Int, iters: Int): Model = {
    // deterministic seed sample: smallest md5-rank ids
    val seeds = q
      .withColumn("rk", Kernels.md5RankUdf(col("id").cast("string")))
      .orderBy(col("rk"), col("id"))
      .limit(k)
      .select("qv").collect().map(_.getSeq[Long](0).toArray)
    // fail fast with context (PqIndex.fit's contract): an empty corpus
    // would otherwise surface as an opaque ArrayIndexOutOfBounds inside
    // lloyd, and fewer rows than k would silently yield an under-sized model
    require(seeds.nonEmpty, "IvfIndex.fit: empty corpus — nothing to cluster")
    require(seeds.length == k,
      s"IvfIndex.fit: corpus has only ${seeds.length} rows, need >= k = $k")
    lloyd(spark, q, seeds, iters)
  }

  /** Lloyd iterations from given seeds — PqIndex trains m codebooks from
    * ONE seed-rank pass by slicing shared seed rows per sub-space. */
  private[operators] def lloyd(spark: org.apache.spark.sql.SparkSession, q: DataFrame,
                               seeds: Array[Array[Long]], iters: Int): Model = {
    var centroids = seeds
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val assignUdf = udf((qv: Array[Long]) => nearest(qv, bc.value))
      // per-cell per-dimension exact integer partials
      val partials = q
        .withColumn("cell", assignUdf(col("qv")))
        .select(col("cell"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
      val dim = centroids(0).length
      val next = centroids.map(_.clone())
      partials.groupBy(_.getInt(0)).foreach { case (cell, rows) =>
        val cen = new Array[Long](dim)
        rows.foreach { r => cen(r.getInt(1)) = r.getLong(2) / r.getLong(3) } // int div: exact, deterministic
        next(cell) = cen
      }
      centroids = next
      it += 1
    }
    Model(centroids)
  }

  /** Assign every row to its cell. */
  def assign(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model.centroids)
    val feat = Kernels.quantNormUdf(col(vecCol))
    val assignUdf = udf((qv: Array[Long]) => nearest(qv, bc.value))
    df.select(col(idCol).as("cid"), feat.as("f"))
      .select(col("cid"), col("f._1").as("cv"), col("f._2").as("cn"))
      .withColumn("cell", assignUdf(col("cv")))
  }

  /** IVF top-k: probe `nprobe` cells per query, score only those members. */
  def topK(cands: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
           model: Model, kTop: Int, nprobe: Int = 2): DataFrame = {
    val spark = cands.sparkSession
    val bc = spark.sparkContext.broadcast(model.centroids)
    val probesUdf = udf((qv: Array[Long]) => nearestN(qv, bc.value, nprobe))
    val feat = Kernels.quantNormUdf(col(vecCol))
    val q = queries.select(col(idCol).as("qid"), feat.as("f"))
      .select(col("qid"), col("f._1").as("qv"), col("f._2").as("qn"))
      .withColumn("cell", explode(probesUdf(col("qv"))))
    val c = assign(cands, idCol, vecCol, model)
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (graft.plans.DotLongExpr.dotLong(col("qv"), col("cv")).cast("double")
          / (sqrt(col("qn").cast("double")) * sqrt(col("cn").cast("double")))).as("cosine"))
      .distinct() // a pair can surface via several probed cells
    Similarity.rankTopK(scored, kTop)
  }
}
