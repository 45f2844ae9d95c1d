package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Step-executor middleware chain (SURVEY.md §3; reference
  * wurzel/executors/middlewares/base.py — chain-of-responsibility wrapping
  * of step execution for cross-cutting concerns) plus a Prometheus-style
  * metrics middleware (middlewares/prometheus/prometheus.py:69-140).
  *
  * `Engine.run` stays the terminal executor; middlewares wrap it:
  * {{{
  *   val chain = MiddlewareChain(Seq(new MetricsMiddleware(reg), LoggingMiddleware))
  *   val (out, rep) = chain.run(step, df)
  * }}}
  */
trait Middleware extends Serializable {
  def apply(next: (Step, DataFrame) => (DataFrame, StepReport),
            step: Step, in: DataFrame): (DataFrame, StepReport)
}

final case class MiddlewareChain(middlewares: Seq[Middleware]) {
  /** Execute `step` through the chain, innermost call = Engine.run. */
  def run(step: Step, in: DataFrame): (DataFrame, StepReport) = {
    val terminal: (Step, DataFrame) => (DataFrame, StepReport) = Engine.run
    val chained = middlewares.foldRight(terminal) { (mw, next) =>
      (s, df) => mw(next, s, df)
    }
    chained(step, in)
  }
}

/** Log step lifecycle to stderr (reference base.py docstring example). */
object LoggingMiddleware extends Middleware {
  def apply(next: (Step, DataFrame) => (DataFrame, StepReport),
            step: Step, in: DataFrame): (DataFrame, StepReport) = {
    System.err.println(s"[graft] starting ${step.name}")
    try {
      val r = next(step, in)
      System.err.println(f"[graft] finished ${step.name} in ${r._2.execSeconds}%.2fs (${r._2.rows} rows)")
      r
    } catch {
      case e: Throwable =>
        System.err.println(s"[graft] FAILED ${step.name}: ${e.getMessage}")
        throw e
    }
  }
}

/** In-JVM gauge registry with Prometheus text exposition — the reference
  * pushes the same gauge family to a pushgateway; here the scrape text is
  * produced directly (zero deps) and a caller binds it to an HTTP endpoint
  * or a pushgateway client in production. */
final class MetricsRegistry extends Serializable {
  private val gauges =
    new java.util.concurrent.ConcurrentHashMap[(String, Seq[(String, String)]), Double]()

  def set(name: String, labels: Seq[(String, String)], value: Double): Unit = {
    gauges.put((name, labels.sortBy(_._1)), value); ()
  }

  def get(name: String, labels: (String, String)*): Option[Double] = {
    val key = (name, labels.toSeq.sortBy(_._1))
    if (gauges.containsKey(key)) Some(gauges.get(key)) else None
  }

  /** Prometheus text exposition format (one line per labeled gauge). */
  def exposition: String = {
    import scala.jdk.CollectionConverters._
    gauges.asScala.toSeq.sortBy { case ((n, ls), _) => (n, ls.mkString) }
      .map { case ((name, labels), v) =>
        val ls = labels.map { case (k, lv) => s"""$k="$lv"""" }.mkString(",")
        if (ls.isEmpty) s"$name $v" else s"$name{$ls} $v"
      }.mkString("\n")
  }
}

/** Gauge family mirroring the reference's (prometheus.py:74-115):
  * result items, per-phase duration, started/succeeded/failed status
  * markers, lifecycle timestamps, and one gauge per observed contract
  * metric. Labels: step_name (the reference's runtime-context labels
  * collapse to this in-engine). */
final class MetricsMiddleware(registry: MetricsRegistry) extends Middleware {
  private def status(step: String, st: String): Unit =
    Seq("started", "succeeded", "failed").foreach { s =>
      registry.set("graft_step_status",
        Seq("step_name" -> step, "status" -> s), if (s == st) 1.0 else 0.0)
    }

  def apply(next: (Step, DataFrame) => (DataFrame, StepReport),
            step: Step, in: DataFrame): (DataFrame, StepReport) = {
    val labels = Seq("step_name" -> step.name)
    registry.set("graft_step_timestamp_seconds",
      labels :+ ("event" -> "start"), System.currentTimeMillis() / 1000.0)
    status(step.name, "started")
    try {
      val (out, rep) = next(step, in)
      registry.set("graft_step_result_items", labels, rep.rows.toDouble)
      registry.set("graft_step_duration_seconds",
        labels :+ ("phase" -> "wall"), rep.execSeconds)
      if (rep.actionSeconds >= 0)
        registry.set("graft_step_duration_seconds",
          labels :+ ("phase" -> "action"), rep.actionSeconds)
      rep.metrics.foreach {
        case (k, v: Number) =>
          registry.set("graft_step_datacontract_metric",
            labels :+ ("metric_name" -> k), v.doubleValue())
        case _ => ()
      }
      status(step.name, "succeeded")
      registry.set("graft_step_timestamp_seconds",
        labels :+ ("event" -> "end"), System.currentTimeMillis() / 1000.0)
      (out, rep)
    } catch {
      case e: Throwable => status(step.name, "failed"); throw e
    }
  }
}
