package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only: time named queries at a given SF dir (args: sfDir q1 q2 ...). */
object QTime {
  def main(args: Array[String]): Unit = {
    val d = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, d).queryExecution.toRdd.count()
        println(f"$q rep$i ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$n")
      }
    }
    spark.stop()
  }
}
