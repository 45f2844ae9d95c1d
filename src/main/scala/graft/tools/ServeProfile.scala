package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: phase-level timing of the q124-shaped serving lifecycle
  * (build -> remove -> serve) so the remaining cost attributes to
  * specific actions. */
object ServeProfile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(graft.plans.GraftExtensions.install)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{HybridServe, IvfIndex, PqIndex}
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    (1 to 3).foreach { rep =>
      println(s"== rep $rep")
      val embT = graft.Tables.load(spark, d, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val corpus = t("corpus frame") { graft.Tables.load(spark, d, "documents")
        .join(embT.select(col("vec_id").as("doc_id")), Seq("doc_id"), "left_semi") }
      val qv4 = t("qv4 collect") { embT.filter(col("vec_id") < 4).orderBy(col("vec_id"))
        .select(graft.functions.Kernels.quantNormUdf(col("embedding")).getField("_1").as("qv"))
        .as[Seq[Long]].collect().map(_.toArray) }
      val ivf = IvfIndex.Model(qv4)
      val pq = PqIndex.Model((0 until 2).map(j => qv4.map(v =>
        java.util.Arrays.copyOfRange(v, j * 32, (j + 1) * 32))).toArray)
      val arts = t("buildWith") { HybridServe.buildWith(corpus, "doc_id", "text",
        embT, "vec_id", "embedding", ivf, pq,
        HybridServe.BuildConfig(champM = 8, champSlack = 4, champMinDf = 1L)) }
      val stale = corpus.filter(col("doc_id") % 17 === 5)
      val maintained = t("remove") { HybridServe.remove(arts, stale, "doc_id", "text") }
      val queries = embT.filter(col("vec_id") < 3)
        .select(
          when(col("vec_id") === 0, "agg_pipeline")
            .when(col("vec_id") === 1, "scan_perf")
            .otherwise("stream_state").as("query_id"),
          when(col("vec_id") === 0, typedlit(Seq("spark", "join", "agg")))
            .when(col("vec_id") === 1, typedlit(Seq("scan", "fast", "filter")))
            .otherwise(typedlit(Seq("stream", "window", "batch"))).as("terms"),
          col("embedding"), col("vec_id").as("exclude_id"))
      t("serve action") { HybridServe.serve(maintained, queries)
        .queryExecution.toRdd.count() }
    }
    spark.stop()
  }
}
