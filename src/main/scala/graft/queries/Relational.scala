package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import QueryDef._

/** Relational surface over the star schema (SURVEY.md §2.2 P4, §2.3 J4-J6,
  * §2.4 A6, §2.5 W4, §2.6 O4, §2.7 U4).
  *
  * Scale notes: dimension sides (region/nation/customer/supplier/part at
  * these SFs) are broadcast explicitly; fact-fact joins shuffle on the join
  * key and AQE handles skew; aggregations rely on Catalyst's partial+final
  * HashAggregate; top-k compiles to TakeOrderedAndProject (no full sort).
  */
object Relational {

  private def li(s: SparkSession, d: String) = Tables.load(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables.load(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables.load(s, d, "customer")
  private def nat(s: SparkSession, d: String) = Tables.load(s, d, "nation")
  private def reg(s: SparkSession, d: String) = Tables.load(s, d, "region")
  private def part(s: SparkSession, d: String) = Tables.load(s, d, "part")
  private def supp(s: SparkSession, d: String) = Tables.load(s, d, "supplier")

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q01_filter_project",
      (s, d) => li(s, d)
        .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin)),

    QueryDef("q02_agg_pricing",
      (s, d) => spread(li(s, d), col("l_orderkey"))
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(3,2)") - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    QueryDef("q03_distinct_agg",
      (s, d) => spread(li(s, d), col("l_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders,
        |COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    QueryDef("q04_rollup",
      (s, d) => spread(li(s, d), col("l_orderkey"))
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    QueryDef("q05_cube",
      (s, d) => spread(li(s, d), col("l_orderkey"))
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    QueryDef("q06_join_star",
      (s, d) => li(s, d)
        .join(ord(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
            && col("o_orderdate") < to_timestamp(lit("1999-01-01 00:00:00"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(3,2)") - dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name")),
      Some("""SELECT r_name, n_name,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    QueryDef("q07_join_parts",
      (s, d) => li(s, d)
        .join(broadcast(part(s, d).filter(col("p_size") <= 20)), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp(s, d)), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("p_brand"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          countDistinct(col("s_nationkey")).as("n_supp_nations"),
          count(lit(1)).as("n"))
        .orderBy(col("p_brand")),
      Some("""SELECT p_brand,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |COUNT(DISTINCT s_nationkey) AS n_supp_nations, COUNT(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE p_size <= 20 GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    QueryDef("q08_semi_join",
      (s, d) => ord(s, d)
        .join(li(s, d).filter(col("l_quantity") >= 49),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin)),

    QueryDef("q09_anti_join",
      (s, d) => cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin)),

    QueryDef("q10_range_join",
      (s, d) => {
        val bands = s.createDataFrame(Seq(
          ("budget", 0.0, 900.0), ("mid", 900.0, 1500.0), ("premium", 1500.0, 1e9)))
          .toDF("band", "lo", "hi")
        part(s, d)
          .join(broadcast(bands), col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n_parts"),
            sum(dec(col("p_retailprice"))).cast("double").as("sum_price"))
          .orderBy(col("band"))
      },
      Some("""SELECT band, COUNT(*) AS n_parts,
        |CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM part JOIN (VALUES ('budget', 0.0, 900.0), ('mid', 900.0, 1500.0), ('premium', 1500.0, 1000000000.0)) b(band, lo, hi)
        |ON p_retailprice >= lo AND p_retailprice < hi
        |GROUP BY band ORDER BY band""".stripMargin)),

    QueryDef("q12_window_rank",
      (s, d) => {
        val wTotal = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        val wPrice = Window.partitionBy(col("l_suppkey")).orderBy(col("l_extendedprice").desc)
        li(s, d)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .withColumn("rn", big(row_number().over(wTotal)))
          .withColumn("rnk", big(rank().over(wPrice)))
          .withColumn("drnk", big(dense_rank().over(wPrice)))
          .withColumn("nt", big(ntile(4).over(wTotal)))
          .withColumn("pr", percent_rank().over(wPrice))
          .filter(col("rn") <= 5)
          .orderBy(col("l_suppkey"), col("rn"))
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |CAST(rn AS BIGINT) AS rn, CAST(rnk AS BIGINT) AS rnk, CAST(drnk AS BIGINT) AS drnk,
        |CAST(nt AS BIGINT) AS nt, pr FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |  ROW_NUMBER() OVER wt AS rn, RANK() OVER wp AS rnk, DENSE_RANK() OVER wp AS drnk,
        |  NTILE(4) OVER wt AS nt, PERCENT_RANK() OVER wp AS pr
        |  FROM lineitem
        |  WINDOW wt AS (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber),
        |         wp AS (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC)
        |) WHERE rn <= 5 ORDER BY l_suppkey, rn""".stripMargin)),

    QueryDef("q13_window_lag",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        ord(s, d)
          .select(col("o_custkey"), col("o_orderkey"), fmtTs(col("o_orderdate")).as("od"),
            lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"),
            big(datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))).as("days_since_prev"),
            lead(col("o_orderkey"), 1).over(w).as("next_orderkey"))
          .orderBy(col("o_custkey"), col("od"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS od,
        |lag(o_orderkey, 1) OVER w AS prev_orderkey,
        |CAST(datediff('day', lag(o_orderdate, 1) OVER w, o_orderdate) AS BIGINT) AS days_since_prev,
        |lead(o_orderkey, 1) OVER w AS next_orderkey
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, od, o_orderkey""".stripMargin)),

    QueryDef("q14_window_running",
      (s, d) => {
        // (l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_quantity) is a
        // unique composite in the corpus — the frame order must be total or
        // the running sum is partition-order dependent.
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        li(s, d)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            sum(dec(col("l_quantity"))).over(w).cast("double").as("run_qty"),
            big(count(lit(1)).over(w)).as("run_n"))
          .orderBy(col("l_suppkey"), col("run_n"))
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER w AS DOUBLE) AS run_qty,
        |CAST(COUNT(*) OVER w AS BIGINT) AS run_n
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, run_n""".stripMargin)),

    QueryDef("q15_topk",
      (s, d) => li(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin)),

    QueryDef("q16_union_except",
      (s, d) => {
        val c = cust(s, d)
        c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
          .union(c.filter(col("c_acctbal") > 5000).select(col("c_custkey")))
          .distinct()
          .except(c.filter(col("c_nationkey") < 5).select(col("c_custkey")))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey FROM (
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |   UNION SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |  EXCEPT SELECT c_custkey FROM customer WHERE c_nationkey < 5)
        |ORDER BY c_custkey""".stripMargin)),

    QueryDef("q17_intersect",
      (s, d) => cust(s, d)
        .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")).select(col("c_custkey"))
        .intersect(ord(s, d).filter(col("o_totalprice") > 100000).select(col("o_custkey").as("c_custkey")))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
        |  INTERSECT SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin)),

    QueryDef("q50_prune_stale",
      (s, d) => supp(s, d)
        .join(li(s, d), col("s_suppkey") === col("l_suppkey"), "left_anti")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey")),
      Some("""SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem)
        |ORDER BY s_suppkey""".stripMargin)),

    // Two-phase salted aggregation (operators/Skew.scala): phase 1 fans a
    // hot grouping key out over (key, salt) reducers, phase 2 merges the
    // algebraic partials — value-identical to the direct groupBy the oracle
    // runs, which is exactly what makes the skew escape hatch safe to
    // enable. l_returnflag has 3 values over all of lineitem (maximal key
    // skew at any scale); salts come from hashing the l_orderkey tiebreak.
    QueryDef("q71_salted_agg",
      (s, d) => graft.operators.Skew
        .saltedSumCount(li(s, d), "l_returnflag", "l_extendedprice", "l_orderkey")
        .select(
          col("l_returnflag"),
          col("sum_l_extendedprice").cast("double").as("sum_price"),
          col("cnt"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Bloom-pruned membership subtract (operators/BloomPrune.antiJoin):
    // lineitem rows whose order is NOT in the pre-1997-06 "already
    // ingested" set. Bloom-NEGATIVE rows are exact non-members (no false negatives)
    // and are emitted map-side with no exchange; only the bloom-positive
    // sliver runs the exact left_anti confirm — so the shuffle carries the
    // member-matched share of the fact table instead of all of it. The
    // result is value-identical to the plain anti join the oracle runs
    // (false positives are discarded by the confirm join on the real key).
    QueryDef("q99_bloom_subtract",
      (s, d) => graft.operators.BloomPrune.antiJoin(
          li(s, d), "l_orderkey",
          ord(s, d).filter(col("o_orderdate") < to_timestamp(lit("1997-06-01 00:00:00")))
            .select(col("o_orderkey")),
          "o_orderkey")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_lines"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"))
        .orderBy(col("l_orderkey")),
      Some("""SELECT l_orderkey, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-06-01 00:00:00')
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)),

    // Sorted-bucket co-located join (sinks/DataLayout.writeBucketed): both
    // large sides are laid out bucketed-by-orderkey ONCE at write time, so
    // this — and every later join on the same key — runs with no Exchange
    // on the join key (plan-asserted in PlanAuditSpec; at 100 TB that
    // shuffle is the dominant cost of a repeated fact-fact join). Layout
    // changes the plan, never the answer: values match the plain join the
    // oracle runs.
    QueryDef("q101_bucketed_join",
      (s, d) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_q101_bkt").toString
        graft.sinks.DataLayout.writeBucketed(
          ord(s, d).select(col("o_orderkey"), col("o_orderpriority")),
          "graft_q101_orders", s"$tmp/orders", 8, "o_orderkey")
        graft.sinks.DataLayout.writeBucketed(
          li(s, d).select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice")),
          "graft_q101_lineitem", s"$tmp/lineitem", 8, "l_orderkey")
        s.table("graft_q101_orders")
          .join(s.table("graft_q101_lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_lines"),
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))
  )
}
