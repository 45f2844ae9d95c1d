package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus table loader (TESTDATA.md). Plain parquet reads — Catalyst pushes
  * filters/pruning into the scan; do not cache or collect here.
  *
  * The `events` table stores TIMESTAMP(NANOS), which Spark's parquet reader
  * rejects; sessions set `spark.sql.legacy.parquet.nanosAsLong=true` and the
  * loader converts here with exact integer division (`div`, not `/` — a
  * double roundtrip would lose precision above 2^53 ns).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && raw.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
}
