package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-curve record for the judge-top CC-family queries (q72 dup
  * clusters, q103 keeper election, q107 soft dedup, q91 SemDeDup, q110
  * dangling PageRank): run each operator COMPOSITION at 1x / 10x / 100x
  * document multipliers over salted sf0.1 and print wall seconds, so
  * COVERAGE.md can record how the checkpoint-dominated flat costs
  * amortize as data grows (the sf0.1 bench numbers for these queries are
  * mostly fixed per-CC-round localCheckpoint overhead, not data work).
  *
  * Corpus shape mirrors ScaleSmoke: every copy of a document appends a
  * per-copy token, so copies are NEAR-dups of their original — at mult=m
  * each original seeds an m-member duplicate cluster, the adversarial
  * (election/resolution-heavy) case. Vectors jitter one dimension per
  * copy (still >0.999 cosine to the original at 64 dims); the PageRank
  * graph scales edges AND nodes 1:1 with mult.
  *
  * Usage: runMain graft.tools.ScaleCurve [mult ...]   (default: 1 10 100)
  */
object ScaleCurve {
  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10, 100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text").persist()
    val nBase = base.count()
    val embBase = graft.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      .select("vec_id", "embedding").persist()
    val nEmb = embBase.count()
    val dim = embBase.select(size(col("embedding"))).as[Int].head()

    for (mult <- mults) {
      val docs = base
        .crossJoin(spark.range(mult).toDF("copy"))
        .select((col("doc_id") + col("copy") * nBase).as("doc_id"),
          when(col("copy") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" v"), col("copy"))).as("text"))
        .repartition(64, col("doc_id")).persist()
      val nDocs = docs.count()
      // per-copy jitter on ONE dimension keeps copies >0.999-cosine
      // near-dups of their original (the SemDeDup threshold band)
      val vecs = embBase
        .crossJoin(spark.range(mult).toDF("copy"))
        .select((col("vec_id") + col("copy") * nEmb).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(i === 0, x + col("copy").cast("float") * lit(1e-4f))
              .otherwise(x)).as("embedding"))
        .repartition(64, col("vec_id")).persist()
      val nVecs = vecs.count()
      val centroids = embBase.filter(col("vec_id") < 16).orderBy(col("vec_id"))
        .select(graft.functions.Kernels.quantNormUdf(col("embedding")).getField("_1").as("qv"))
        .as[Seq[Long]].collect().map(_.toArray)
      val ivf = graft.operators.IvfIndex.Model(centroids)
      // hub-skewed graph, nodes and edges both scale with mult
      val edges = spark.range(100000L * mult).toDF("i")
        .select(pmod(hash(col("i")), lit(20000L * mult)).as("src"),
          pmod(hash(col("i") * 31), lit(500L * mult)).as("dst"))
        .repartition(64).persist()
      val nEdges = edges.count()
      println(s"== mult=$mult: $nDocs docs, $nVecs vecs (dim $dim), $nEdges edges")

      def time(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = f
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"SCALE mult=$mult $name%-16s ${sec}%8.2f s  ($rows rows)")
      }
      def pairs = graft.operators.Dedup.minhashPairs(docs, "doc_id", "text", 12, 4, 0.6)
      time("q72_clusters") {
        graft.operators.Dedup.resolveClusters(docs, "doc_id", pairs)
          .queryExecution.toRdd.count()
      }
      time("q103_keepers") {
        graft.operators.Dedup.selectKeepers(docs, "doc_id", pairs,
          size(array_distinct(split(col("text"), "\\s+"))))
          .queryExecution.toRdd.count()
      }
      time("q107_soft_dedup") {
        graft.operators.Dedup.softDedupSample(docs, "doc_id", pairs)
          .queryExecution.toRdd.count()
      }
      time("q91_semdedup") {
        graft.operators.Dedup.semanticDedup(vecs, "vec_id", "embedding", ivf,
          threshold = 0.999).queryExecution.toRdd.count()
      }
      time("q110_pagerank") {
        graft.operators.PageRank.run(edges, "src", "dst", iterations = 5,
          redistributeDangling = true).queryExecution.toRdd.count()
      }
      docs.unpersist(); vecs.unpersist(); edges.unpersist()
    }
    spark.stop()
  }
}
