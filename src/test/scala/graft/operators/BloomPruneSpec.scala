package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  // 2000 corpus rows over 400 keys (multiplicity 5), member set = 120 keys.
  private lazy val corpus = (0 until 2000)
    .map(i => (i.toLong, i.toLong % 400, s"row$i"))
    .toDF("row_id", "key", "payload")
  private lazy val members = (0 until 400).filter(_ % 37 < 11)
    .map(k => Tuple1(k.toLong)).toDF("mkey")

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("row_id").as[Long].collect().sorted.toSeq

  test("semiJoin equals the plain left_semi join") {
    val expected = ids(corpus.join(members, col("key") === col("mkey"), "left_semi"))
    assert(expected.nonEmpty && expected.size < 2000)
    assert(ids(BloomPrune.semiJoin(corpus, "key", members, "mkey")) == expected)
  }

  test("antiJoin equals the plain left_anti join, schema preserved") {
    val expected = ids(corpus.join(members, col("key") === col("mkey"), "left_anti"))
    val pruned = BloomPrune.antiJoin(corpus, "key", members, "mkey")
    assert(pruned.columns.toSeq == corpus.columns.toSeq)
    assert(ids(pruned) == expected)
  }

  test("exact under forced false positives (tiny filter, fpp 0.5)") {
    // Undersize the filter so mightContain fires spuriously: the confirm
    // join on the real key must still make both forms exact.
    val bf = BloomPrune.keyFilter(members, "mkey", expectedItems = 8, fpp = 0.5)
    assert(bf.expectedFpp() > 0.3) // saturated — false positives guaranteed
    val expectedSemi = ids(corpus.join(members, col("key") === col("mkey"), "left_semi"))
    val expectedAnti = ids(corpus.join(members, col("key") === col("mkey"), "left_anti"))
    assert(ids(BloomPrune.semiJoin(corpus, "key", members, "mkey", 8, 0.5)) == expectedSemi)
    assert(ids(BloomPrune.antiJoin(corpus, "key", members, "mkey", 8, 0.5)) == expectedAnti)
  }

  test("empty member set: semi yields nothing, anti passes everything") {
    val none = members.filter(col("mkey") < 0)
    assert(BloomPrune.semiJoin(corpus, "key", none, "mkey").count() == 0)
    assert(ids(BloomPrune.antiJoin(corpus, "key", none, "mkey")) == (0L until 2000L))
  }

  test("string keys normalize through xxhash64 on both sides") {
    val c = Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)).toDF("k", "row_id")
    val m = Seq(Tuple1("b"), Tuple1("d"), Tuple1("zz")).toDF("mk")
    assert(ids(BloomPrune.semiJoin(c, "k", m, "mk")) == Seq(2L, 4L))
    assert(ids(BloomPrune.antiJoin(c, "k", m, "mk")) == Seq(1L, 3L))
  }

  test("plan shape: bloom probe filters before the exchange; anti passthrough branch has no join") {
    // range-based inputs: a LocalRelation would let ConvertToLocalRelation
    // evaluate the probe filter at optimization time and hide it from the plan
    val c = spark.range(2000).select(col("id").as("row_id"),
      (col("id") % 400).as("key"))
    val m = spark.range(400).filter(col("id") % 37 < 11).select(col("id").as("mkey"))
    val df = BloomPrune.antiJoin(c, "key", m, "mkey")
    df.collect() // run so AQE finalizes and WholeStageCodegen spans appear
    // drop the "== Initial Plan ==" echo so node counts aren't doubled
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // Two scans of the corpus (documented trade), exactly one join — the
    // bloom-negative branch reaches the union through a plain Filter.
    assert(planCount(plan, "Union") == 1, plan)
    assert(planCount(plan, "Join") == 1, plan)
    // The probe is a native codegen expression in both branch filters —
    // no ScalaUDF fencing the corpus scan out of WholeStageCodegen.
    assert(planCount(plan, "bloom_probe") >= 2, plan)
    assert(planCount(plan, "UDF") == 0, plan)
    // the probe filters sit INSIDE WholeStageCodegen spans ("*(n) Filter")
    assert(planCount(plan, "*(") >= 2 && plan.contains(") Filter"), plan)
  }
}
