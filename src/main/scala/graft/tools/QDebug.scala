package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Dev-only: stage-by-stage timing of the minhash pipeline. */
object QDebug {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, d, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val base = Dedup.withMinhash(docs, "text", 12, 4)
      .select(col("doc_id").as("id"), col("sh"), col("bands"))
    time("base")(base.count())
    val bandRows = base.select(col("id"), explode(col("bands")).as("band"))
    time("bandRows")(bandRows.count())
    val cand = bandRows.as("a")
      .join(bandRows.as("b"), col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    time("cand")(cand.count())
    time("pairs")(Dedup.minhashPairs(docs, "doc_id", "text", 12, 4, 0.6).count())
    if (args.contains("explain"))
      Dedup.minhashPairs(docs, "doc_id", "text", 12, 4, 0.6).explain("formatted")
    spark.stop()
  }
}
