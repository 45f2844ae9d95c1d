package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.functions._

/** One declared query: a Spark DataFrame builder plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL. Contract (builder prompt + SURVEY.md §7):
  * identical column names on both sides, canonical trailing ORDER BY, and
  * deterministic values (ints/strings/decimal-derived doubles only). */
case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Exact money/quantity arithmetic: sum DECIMAL(12,2), emit DOUBLE.
    * Summing raw doubles would be partition-order dependent; decimal sums are
    * exact, and the final decimal->double cast is the same value in Spark and
    * DuckDB. */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Derived integers are BIGINT on both sides (Spark size()/year() return
    * INT while DuckDB len()/year() return BIGINT — unify). */
  def big(c: Column): Column = c.cast("long")

  val TsFmt = "yyyy-MM-dd HH:mm:ss" // == DuckDB strftime '%Y-%m-%d %H:%M:%S'

  def fmtTs(c: Column): Column = date_format(c, TsFmt)

  /** Scale-adaptive parallelizer for CPU-heavy map stages (optimization
    * guide §2.5, "input skew: one huge unsplittable file — repartition
    * immediately after the read"): parquet scans split at row-group
    * granularity, so a single-row-group file is ONE scan task and every
    * per-row kernel downstream of it (mdformat, BPE, vector math) runs
    * serially no matter how many cores the session has. When the scan
    * yields fewer partitions than the session's parallelism, shuffle the
    * (tiny, by construction) input once before the kernel; when the input
    * already splits wide — the 100 TB case, where shuffling a corpus for
    * parallelism's sake would be the §8 anti-pattern — this is a no-op
    * and adds nothing to the plan. Results are unaffected: every declared
    * query ends in a total ORDER BY, and all aggregation here is exact
    * (integer/decimal) arithmetic. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions >= target) df
    else df.repartition(target)
  }

  /** [[spread]] keyed by high-cardinality columns: hash repartition skips
    * the local sort a round-robin repartition pays for retry determinism
    * (spark.sql.execution.sortBeforeRepartition) — measurably cheaper when
    * the narrow input is a fact table rather than a 5k-doc corpus. The key
    * only decides placement; downstream aggregates re-shuffle by their own
    * group keys, so any deterministic high-cardinality key is correct. */
  def spread(df: DataFrame, keys: Column*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions >= target) df
    else df.repartition(target, keys: _*)
  }
}
