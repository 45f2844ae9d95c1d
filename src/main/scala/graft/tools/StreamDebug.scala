package graft.tools

import org.apache.spark.sql.SparkSession
import graft.streaming.StatefulDedup

object StreamDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    println("creating stream")
    val mem = MemoryStream[StatefulDedup.Keyed]
    println("starting query")
    val q = StatefulDedup.dedupStream(mem.toDS(), ttl = None)
      .writeStream.format("memory").queryName("out").outputMode("append").start()
    println("adding batch 1")
    mem.addData(StatefulDedup.Keyed("h1", "a"), StatefulDedup.Keyed("h1", "a2"),
      StatefulDedup.Keyed("h2", "b"))
    q.processAllAvailable()
    println("batch1 done rows=" + spark.table("out").count())
    mem.addData(StatefulDedup.Keyed("h1", "later"), StatefulDedup.Keyed("h3", "c"))
    q.processAllAvailable()
    println("batch2 done rows=" + spark.table("out").count())
    q.stop()
    spark.stop()
    println("STREAM OK")
  }
}
