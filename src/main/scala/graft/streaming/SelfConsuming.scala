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
    // maps: unordered); serialize them through to_json — over KEY-SORTED
    // entry arrays, because a map's to_json preserves its internal entry
    // order and two value-equal maps built through different paths
    // (repartitioned collect_list, map_from_entries order) would otherwise
    // hash differently, breaking exactly the determinism the tiebreak
    // exists for. Maps nested under arrays/structs are canonicalized
    // recursively; canonicalized maps become sorted entry arrays, which
    // ARE orderable, so nesting composes.
    import org.apache.spark.sql.types._
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case a: ArrayType => hasMap(a.elementType)
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case _ => false
    }
    def canonical(c: org.apache.spark.sql.Column, dt: DataType): org.apache.spark.sql.Column = dt match {
      case m: MapType =>
        array_sort(transform(map_entries(c), e =>
          struct(canonical(e.getField("key"), m.keyType).as("key"),
            canonical(e.getField("value"), m.valueType).as("value"))))
      case a: ArrayType if hasMap(a.elementType) =>
        transform(c, e => canonical(e, a.elementType))
      case s: StructType if hasMap(s) =>
        struct(s.fields.toSeq.map(f => canonical(c.getField(f.name), f.dataType).as(f.name)): _*)
      case _ => c
    }
    val tiebreak = xxhash64(unioned.schema.fields.sortBy(_.name).map { f =>
      if (hasMap(f.dataType)) to_json(canonical(col(f.name), f.dataType)) else col(f.name)
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
