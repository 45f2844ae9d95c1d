package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only: time named queries at a given SF dir (args: sfDir q1 q2 ...). */
object QTime {
  def main(args: Array[String]): Unit = {
    val d = args.head
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
    val reps = sys.env.getOrElse("QTIME_REPS", "2").toInt
    args.tail.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      val ts = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, d).queryExecution.toRdd.count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"$q rep$i $t%8.2f s rows=$n")
        t
      }
      println(f"$q min ${ts.min}%8.2f s")
    }
    spark.stop()
  }
}
