package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: does an Observation deliver metrics when the observing
  * action is an eager localCheckpoint? (Gates fusing per-round
  * convergence checksums into the checkpoint job in CC/PageRank.) */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val obs = org.apache.spark.sql.Observation()
    val df = spark.range(100).select(col("id").as("u"), (col("id") % 7).as("v"))
      .observe(obs, count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("sig"))
    val t0 = System.nanoTime()
    val cp = df.localCheckpoint(true)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    def tryGet(tag: String): Boolean =
      try {
        val got = Await.result(Future(obs.get), 5.seconds)
        println(s"$tag (+${(System.nanoTime() - t0) / 1e6} ms): $got")
        true
      } catch { case _: java.util.concurrent.TimeoutException =>
        println(s"$tag: TIMEOUT — metrics not delivered"); false
      }
    if (!tryGet("after localCheckpoint")) {
      cp.queryExecution.toRdd.count()
      tryGet("after extra count")
    }
    spark.stop()
  }
}
