package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[FoldConstantUdfRule]] — constant deterministic UDFs evaluate once at
  * plan time; everything else keeps per-row evaluation. The shared test
  * session installs GraftExtensions, so the rule is active here exactly as
  * in the Bench/Verify sessions. Inputs are `spark.range` (a parquet-like
  * lazy relation) — a LocalRelation input would be folded whole by Spark's
  * own ConvertToLocalRelation and prove nothing about this rule. */
class FoldConstantUdfRuleSpec extends SparkSpec {

  private def optimized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("deterministic UDF over literals folds to the literal it denotes") {
    val f = udf((s: String) => s.toUpperCase + "!")
    val df = spark.range(3).select(col("id"), f(lit("ab")).as("c"))
    val plan = optimized(df)
    assert(!plan.contains("UDF"), plan)
    assert(plan.contains("AB!"), plan)
    assert(df.collect().map(_.getString(1)).toSeq == Seq("AB!", "AB!", "AB!"))
  }

  test("folding composes with ConstantFolding across the fixed point (UDF over concat of literals, and concat over a folded UDF)") {
    val f = udf((s: String) => s.length)
    val df = spark.range(1)
      .select(concat(lit("x"), f(concat(lit("ab"), lit("cd"))).cast("string")).as("c"))
    val plan = optimized(df)
    assert(!plan.contains("UDF"), plan)
    assert(df.head().getString(0) == "x4")
  }

  test("per-row arguments keep per-row evaluation") {
    val f = udf((n: Long) => n + 1)
    val df = spark.range(2).select(f(col("id")).as("c"))
    assert(optimized(df).contains("UDF"), optimized(df))
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("nondeterministic UDFs never fold, even over literals") {
    val f = udf((s: String) => s).asNondeterministic()
    val df = spark.range(1).select(f(lit("x")).as("c"))
    assert(optimized(df).contains("UDF"), optimized(df))
  }

  test("a UDF that throws on its constant input stays in the plan (error surfaces at execution, not planning)") {
    val f = udf((s: String) => { require(s != "boom", "boom"); s })
    val df = spark.range(1).select(f(lit("boom")).as("c"))
    // optimization must not crash...
    val plan = optimized(df)
    assert(plan.contains("UDF"), plan)
    // ...and execution raises the UDF's own error
    intercept[Exception] { df.collect() }
  }

  test("the mdformat shape: normalize over a literal document folds; over a column it does not") {
    val f = udf((m: String) => graft.split.MdFormatLite.normalize(m))
    val lit1 = spark.range(1).select(f(lit("# h\n\npara")).as("c"))
    assert(!optimized(lit1).contains("UDF"), optimized(lit1))
    assert(lit1.head().getString(0) == "# h\n\npara")
    val perRow = spark.range(1).select(f(concat(lit("# a"), col("id").cast("string"))).as("c"))
    assert(optimized(perRow).contains("UDF"), optimized(perRow))
  }
}
