package graft

import org.apache.spark.sql.functions._

class EntrySpec extends SparkSpec {

  test("driver contract: entry() returns rows on sf0.001 with a vanilla session") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSet == Set("r_name", "n_name", "revenue", "n_items"))
  }

  test("driver contract: every oracleSql key exists in queries; names are stable") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    // a dropped QueryDef silently shrinks the correctness gate — pin the
    // round-5 floor so the regression fails here, not in the driver
    assert(qs.size >= 97, s"query count regressed: ${qs.size}")
  }

  test("approx_count_distinct (HLL++) tracks exact distinct within 5% (A6 sketch path)") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val row = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), 0.01).as("approx")).collect()(0)
    val exact = row.getAs[Long]("exact").toDouble
    val approx = row.getAs[Long]("approx").toDouble
    assert(math.abs(approx - exact) / exact < 0.03)
  }
}
