package graft.pipeline

import graft.SparkSpec
import graft.contracts.MarkdownDoc
import graft.split.{SemanticSplitter, SplitStep}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf = Seq(
    MarkdownDoc("# A\n\nbody one", "k1", "http://x/a"),
    MarkdownDoc("# A\n\nbody one", "k1", "http://x/a2"),    // duplicate md
    MarkdownDoc("# B\n\nbody two", "k2", "http://x/neverejn/b"),
    MarkdownDoc("# C\n\nbody three", "k3", "http://x/c")).toDF()

  test("DropDuplicationStep drops by field list, default [md] (reference duplication.py:21-51)") {
    assert(DropDuplicationStep().run(docsDf).count() == 3)
    assert(DropDuplicationStep(Seq("*")).run(docsDf).count() == 4)
    assert(DropDuplicationStep(Seq("keywords")).run(docsDf).count() == 3)
  }

  test("UrlFilterStep drops case-folded url fragment matches (reference wonderful/step.py:330-333)") {
    val out = UrlFilterStep("NEVEREJN").run(docsDf)
    assert(out.count() == 3)
    assert(!out.select("url").as[String].collect().exists(_.contains("neverejn")))
  }

  test(">> composes steps in order and builds history like the reference (History, '-' joined, 'Step' stripped)") {
    val p = DropDuplicationStep() >> UrlFilterStep("neverejn") >> DeterministicSortStep(Seq("url"))
    assert(p.history == "DropDuplication-UrlFilter-DeterministicSort")
    val out = p.runWithHistory(docsDf)
    assert(out.count() == 2)
    assert(out.select("history").distinct().as[String].collect().toSeq ==
      Seq("DropDuplication-UrlFilter-DeterministicSort"))
  }

  test("SplitStep: distributed split with skip-bad-doc accumulators; fails only when all docs fail") {
    val step = new SplitStep(new SemanticSplitter(tokenLimit = 8, buffer = 2, tokenMin = 1))
    val many = Seq.tabulate(6)(i =>
      MarkdownDoc((1 to 40).map(j => s"w$i$j").mkString(" "), "k", s"u$i")).toDS()
    val chunks = step.split(many)
    val n = chunks.count()
    assert(n > 6)
    step.assertNotAllSkipped() // none skipped -> no throw
    val (docs, skipped) = step.skipStats
    assert(docs == 6 && skipped == 0)
  }

  test("Engine.run returns (DataFrame, StepReport) with observed metrics in one pass (§3.2)") {
    val (out, rep) = Engine.run(DropDuplicationStep(), docsDf)
    assert(out.count() == 3)
    assert(rep.step == "DropDuplication" && rep.rows == 3)
    assert(rep.metrics("rows") == 3L)
    assert(rep.metrics.contains("md_char_len"))
    assert(rep.execSeconds > 0)
    // listener-captured action timing (A4): the QueryExecutionListener keyed
    // on the step's CollectMetrics node reported a real duration
    assert(rep.actionSeconds >= 0, "QueryExecutionListener timing not captured")
    assert(rep.actionSeconds <= rep.execSeconds)
  }

  test("Engine.runPipeline reports per step with accumulated history") {
    val p = DropDuplicationStep() >> UrlFilterStep("neverejn")
    val (out, reps) = Engine.runPipeline(p, docsDf)
    assert(out.count() == 2)
    assert(reps.map(_.rows) == Seq(3L, 2L))
    assert(reps.last.history == "DropDuplication-UrlFilter")
  }

  test("contract metrics aggregate (reference datacontract get_metrics)") {
    val m = graft.contracts.ContractMetrics.of(docsDf).collect()(0)
    assert(m.getAs[Long]("rows") == 4)
    assert(m.getAs[Long]("keywords_count") == 4)
  }
}
