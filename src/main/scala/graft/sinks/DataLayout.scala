package graft.sinks

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.functions.col

/** Physical data-layout services for the 100 TB write path.
  *
  * The reference's steps hand their outputs to object storage and re-shuffle
  * on every downstream join (wurzel/steps/s3/step.py:23-101 writes plain
  * snapshots; every consumer re-reads and re-partitions). At cluster scale
  * the dominant cost of a repeated fact-fact join is that shuffle — so the
  * engine makes layout a first-class sink concern instead:
  *
  *  - [[writeBucketed]]: hash-bucketed, per-bucket-sorted external tables.
  *    Two tables bucketed on the join key with the same bucket count join
  *    with NO Exchange, and — because the writer guarantees ONE file per
  *    bucket — no Sort either: the scan's outputOrdering satisfies the
  *    SortMergeJoin requirement directly. Spark trusts bucket-file order
  *    only behind `spark.sql.legacy.bucketedTableScan.outputOrdering`
  *    (trusting it with several files per bucket would need a merge-read);
  *    this writer's one-file-per-bucket invariant is exactly what makes
  *    enabling it safe. Point predicates on the bucket key additionally
  *    prune to a single bucket at planning time (`SelectedBucketsCount:
  *    1 out of n`) — keep `spark.sql.sources.bucketing.autoBucketedScan
  *    .enabled=false` for lookup-heavy sessions, since that heuristic only
  *    credits join/agg benefit and would drop the bucketed scan (and with
  *    it the pruning) for a bare point lookup.
  *  - [[writeClustered]]: range-clustered, sorted parquet for min/max
  *    row-group skipping on range predicates, plus optional per-column
  *    parquet bloom filters so point lookups on non-cluster keys skip row
  *    groups whose stats ranges can't exclude them.
  *
  * Both are plain open-format parquet: DuckDB/Trino/any reader consume the
  * files unchanged; the bucket metadata lives in the session catalog and the
  * bloom/stats metadata in the parquet footers.
  *
  * Scale notes: `repartition(buckets, key)` uses the same Murmr3 pmod
  * assignment as the bucket-id function, so each write task holds exactly
  * one bucket's rows and emits exactly one file — the layout invariant the
  * sort-elimination depends on. Bucket count is therefore also the write
  * parallelism; size it like shuffle partitions (rows_per_bucket comfortably
  * in executor memory — the writer sorts each bucket once).
  */
object DataLayout {

  /** Write `df` as a hash-bucketed, per-bucket-sorted EXTERNAL parquet table
    * registered as `table` with files under `path`. One file per bucket
    * (see scaladoc above). `sortCols` defaults to the bucket key.
    */
  def writeBucketed(df: DataFrame, table: String, path: String, buckets: Int,
                    key: String, sortCols: Seq[String] = Nil): Unit = {
    require(buckets > 0, s"writeBucketed: buckets must be positive, got $buckets")
    val sorts = if (sortCols.isEmpty) Seq(key) else sortCols
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(sorts.head, sorts.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Write `df` as `files` range-clustered, internally-sorted parquet files
    * under `path`. Range predicates on `clusterCols` then skip whole row
    * groups via footer min/max stats; `bloomCols` get parquet bloom filters
    * (sized by `bloomNdv` expected distinct values) so point lookups on
    * those columns skip row groups bloom-negatively even when stats ranges
    * overlap. Plain parquet — no catalog entry.
    */
  def writeClustered(df: DataFrame, path: String, clusterCols: Seq[String],
                     files: Int, bloomCols: Seq[String] = Nil,
                     bloomNdv: Long = 1000000L,
                     extraOptions: Map[String, String] = Map.empty): Unit = {
    require(clusterCols.nonEmpty, "writeClustered: need at least one cluster column")
    require(files > 0, s"writeClustered: files must be positive, got $files")
    val cols = clusterCols.map(col)
    var w: DataFrameWriter[Row] = df
      .repartitionByRange(files, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite")
    bloomCols.foreach { c =>
      // parquet omits the bloom filter when a column stays fully
      // dictionary-encoded (the dictionary already filters exactly), so
      // force plain encoding for bloom columns — at 100 TB these are
      // high-NDV id/hash columns that would fall back anyway.
      w = w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", bloomNdv.toString)
        .option(s"parquet.enable.dictionary#$c", "false")
    }
    extraOptions.foreach { case (k, v) => w = w.option(k, v) }
    w.parquet(path)
  }

  /** The bucketed table, scanned with bucket metadata (joins/aggs on the
    * bucket key need no Exchange; point filters prune buckets). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
