package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only: run named queries with a listener that prints every Spark
  * job's wall time, so multi-job operators (CC rounds, the serve
  * lifecycle's build/mutate/guard actions) can be attributed job by job.
  * args: sfDir q1 q2 ... (QTIME_REPS reps, jobs printed for the LAST rep). */
object JobProfile {
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
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts.put(e.jobId, (System.nanoTime(), e.stageInfos.map(_.numTasks).sum))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.remove(e.jobId)).foreach { case (t0, nt) =>
          log.add(f"  job ${e.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  tasks=$nt")
        }
      }
    })
    val reps = sys.env.getOrElse("QTIME_REPS", "3").toInt
    args.tail.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      (1 to reps).foreach { i =>
        log.clear()
        val t0 = System.nanoTime()
        val n = fn(spark, d).queryExecution.toRdd.count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"$q rep$i $t%8.2f s rows=$n")
        if (i == reps) log.forEach(println(_))
      }
    }
    spark.stop()
  }
}
