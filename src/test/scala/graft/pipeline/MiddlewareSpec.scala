package graft.pipeline

import graft.SparkSpec

class MiddlewareSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf = Seq(
    ("# A", "kw1", "https://x/a"),
    ("# A", "kw1", "https://x/a"),
    ("# B", "kw2", "https://x/b"))
    .toDF("md", "keywords", "url")

  test("chain wraps Engine.run in declaration order") {
    val order = scala.collection.mutable.ArrayBuffer[String]()
    def probe(tag: String): Middleware = new Middleware {
      def apply(next: (Step, org.apache.spark.sql.DataFrame) => (org.apache.spark.sql.DataFrame, StepReport),
                step: Step, in: org.apache.spark.sql.DataFrame) = {
        order += s"$tag-in"
        val r = next(step, in)
        order += s"$tag-out"
        r
      }
    }
    val chain = MiddlewareChain(Seq(probe("outer"), probe("inner")))
    val (_, rep) = chain.run(DropDuplicationStep(), docsDf)
    assert(rep.rows == 2)
    assert(order.toSeq == Seq("outer-in", "inner-in", "inner-out", "outer-out"))
  }

  test("metrics middleware records the reference gauge family (prometheus.py:74-115)") {
    val reg = new MetricsRegistry
    val chain = MiddlewareChain(Seq(new MetricsMiddleware(reg)))
    chain.run(DropDuplicationStep(), docsDf)
    val step = "step_name" -> "DropDuplication"
    assert(reg.get("graft_step_result_items", step).contains(2.0))
    assert(reg.get("graft_step_status", step, "status" -> "succeeded").contains(1.0))
    assert(reg.get("graft_step_status", step, "status" -> "failed").contains(0.0))
    assert(reg.get("graft_step_duration_seconds", step, "phase" -> "wall").exists(_ > 0))
    assert(reg.get("graft_step_datacontract_metric", step, "metric_name" -> "rows").contains(2.0))
    val text = reg.exposition
    assert(text.contains("""graft_step_result_items{step_name="DropDuplication"} 2.0"""))
    assert(text.linesIterator.size >= 6)
  }

  test("a throwing step marks failed and rethrows") {
    val reg = new MetricsRegistry
    val boom = new Step {
      override def name = "Boom"
      def run(in: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        throw new RuntimeException("kaput")
    }
    val chain = MiddlewareChain(Seq(new MetricsMiddleware(reg)))
    intercept[RuntimeException] { chain.run(boom, docsDf) }
    assert(reg.get("graft_step_status", "step_name" -> "Boom", "status" -> "failed").contains(1.0))
    assert(reg.get("graft_step_status", "step_name" -> "Boom", "status" -> "succeeded").contains(0.0))
  }
}
