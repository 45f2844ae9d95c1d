package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Per-step execution report (SURVEY.md §3.1 step 8; reference `StepReport`
  * wurzel/executors/base_executor.py:53-64, 348-357: load/exec/save
  * timings, input/result counts, contract metrics). Spark collapses
  * load/save into the exec plan, so one wall-time plus the observed
  * metrics covers the same information. */
final case class StepReport(
    step: String,
    history: String,
    execSeconds: Double,
    rows: Long,
    metrics: Map[String, Any])

/** Programmatic entry point (SURVEY.md §3.2; reference
  * `with BaseStepExecutor() as ex: ex(Step, inputs, out)` →
  * `Engine.run(step, inputDf): (DataFrame, StepReport)`).
  *
  * Metrics ride an `observe()` (CollectMetrics) node — they are computed in
  * the SAME pass as the materializing action, no second scan. Compose steps
  * with `Pipeline` when one fused Catalyst plan (no per-step action) is
  * wanted; `Engine.run` mirrors the reference's materialize-per-step
  * semantics and fires `finalizeStep` like the reference's finalize hook.
  */
object Engine {

  def run(step: Step, in: DataFrame): (DataFrame, StepReport) = {
    val t0 = System.nanoTime()
    val out = step.run(in)
    val obs = Observation(s"graft_${step.name}_${java.util.UUID.randomUUID().toString.take(8)}")
    val metricCols =
      if (out.columns.contains("md") && out.columns.contains("keywords"))
        count(lit(1)).as("rows") +: graft.contracts.ContractMetrics.markdownMetrics.tail
      else Seq(count(lit(1)).as("rows"))
    val observed = out.observe(obs, metricCols.head, metricCols.tail: _*)
    val rows = observed.count() // the materializing action; observation resolves here
    step.finalizeStep(in.sparkSession)
    val metrics = obs.get
    val report = StepReport(
      step.name, step.name, (System.nanoTime() - t0) / 1e9, rows, metrics)
    (observed, report)
  }

  /** Run a whole pipeline step-by-step with reports (reference returns
    * list[(result, StepReport)], base_executor.py:376-403). */
  def runPipeline(p: Pipeline, in: DataFrame): (DataFrame, Seq[StepReport]) = {
    var df = in
    val reports = p.steps.map { s =>
      val (out, rep) = run(s, df)
      df = out
      rep.copy(history = p.steps.takeWhile(_ != s).map(_.name).mkString("-") match {
        case "" => s.name
        case prefix => prefix + "-" + s.name
      })
    }
    (df, reports)
  }
}
