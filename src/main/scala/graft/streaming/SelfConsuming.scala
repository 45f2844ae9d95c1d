package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental self-consuming step (SURVEY.md §2.13 T2; reference
  * `SelfConsumingLeafStep` wurzel/core/self_consuming_step.py:12-27 +
  * executor wiring base_executor.py:290-297: a step whose input contract is
  * its own previous output — "reduce double work").
  *
  * Batch form: merge the new increment into the step's own durable output —
  * upsert by key with last-writer-wins on a version column, the
  * `MERGE INTO` pattern on plain parquet (a Delta/Iceberg table at real
  * scale; the merge plan — union + window-dedup on the key — is identical).
  */
object SelfConsuming {

  /** Merge `increment` into the parquet table at `path` by `keyCol`,
    * keeping the row with the highest `versionCol` per key. Creates the
    * table on first run (reference: executor feeds None on first run). */
  def merge(spark: SparkSession, path: String, increment: DataFrame,
            keyCol: String, versionCol: String): DataFrame = {
    val existing =
      if (new java.io.File(path).exists()) Some(spark.read.parquet(path)) else None
    val unioned = existing.map(_.unionByName(increment)).getOrElse(increment)
    // version ties (an ingest re-run unions an identical-version row with
    // the existing one) break on a content hash — arbitrary but
    // deterministic, so two runs of the same merge persist the same row;
    // ordering by version alone would pick by partition arrival order.
    // MapType columns can't feed xxhash64 directly (Spark rejects hashing
    // maps: unordered); serialize them through to_json first.
    val tiebreak = xxhash64(unioned.schema.fields.sortBy(_.name).map { f =>
      def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
        case _: org.apache.spark.sql.types.MapType => true
        case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
        case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
        case _ => false
      }
      if (hasMap(f.dataType)) to_json(col(f.name)) else col(f.name)
    }: _*)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(versionCol).desc, tiebreak)
    val merged = unioned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    // write-then-swap: never clobber the live table mid-read
    val tmp = path + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    val live = new java.io.File(path)
    if (live.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(live)
    }
    require(new java.io.File(tmp).renameTo(live), s"swap failed for $path")
    spark.read.parquet(path)
  }
}
