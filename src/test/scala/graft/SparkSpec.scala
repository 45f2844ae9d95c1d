package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (tests fork one JVM; the session is
  * created once and never stopped mid-run). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    // same extension set as the Bench/Verify sessions, so every suite
    // exercises the plans the driver actually runs
    .withExtensions(graft.plans.GraftExtensions.install)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSpark.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Occurrences of `needle` in a rendered plan string — shared by the
    * plan-shape assertions across suites. */
  def planCount(plan: String, needle: String): Int =
    plan.sliding(needle.length).count(_ == needle)
}
