package graft.plans

import graft.SparkSpec
import graft.functions.Kernels
import org.apache.spark.sql.functions._

class DotLongExprSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
    (2L, Seq(-7L, 0L, 2L), Seq(3L, 9L, -1L)),
    (3L, Seq.empty[Long], Seq(1L, 2L))
  ).toDF("id", "a", "b")

  test("matches Kernels.dotLong on every row, incl. ragged/empty") {
    val out = vecs.select($"id", DotLongExpr.dotLong($"a", $"b").as("d"))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 32L && out(2L) == -23L && out(3L) == 0L)
    vecs.as[(Long, Seq[Long], Seq[Long])].collect().foreach { case (id, a, b) =>
      val n = math.min(a.length, b.length)
      assert(out(id) == Kernels.dotLong(a.take(n).toArray, b.take(n).toArray))
    }
  }

  test("null inputs yield null (nullIntolerant)") {
    val df = Seq((Some(Seq(1L)), None: Option[Seq[Long]])).toDF("a", "b")
    assert(df.select(DotLongExpr.dotLong($"a", $"b")).head().isNullAt(0))
  }

  test("stays inside WholeStageCodegen — no ScalaUDF in the scorer projection") {
    // a Range source so the projection isn't constant-folded to a
    // LocalTableScan; the dot must sit inside the *(1) codegen span
    val df = spark.range(100)
      .select(array(col("id"), col("id") + 1).as("a"),
        array(col("id") * 2, col("id")).as("b"))
      .select(DotLongExpr.dotLong(col("a"), col("b")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"), plan)
    assert(df.agg(sum("d")).head().getLong(0) ==
      (0L until 100L).map(i => i * (i * 2) + (i + 1) * i).sum)
  }

  test("type check rejects non-ARRAY<BIGINT> args") {
    val bad = Seq((1, "x")).toDF("a", "b")
    val e = intercept[Exception](
      bad.select(DotLongExpr.dotLong($"a", $"b")).collect())
    assert(e.getMessage.contains("dot_long") || e.getMessage.contains("ARRAY"),
      e.getMessage)
  }
}
