package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Step/pipeline abstraction (SURVEY.md §1.1, §3).
  *
  * The reference's `TypedStep[SETTS, IN, OUT]` (wurzel/core/typed_step.py:
  * 40-99) carries settings + contracts and implements `run(in) -> out`; DAG
  * edges are type-checked at `>>` time (core/step.py:44-49). Here a Step is
  * a named DataFrame transform — schema compatibility is enforced by
  * Catalyst's Analyzer when the composed lazy plan resolves, which is the
  * same check at the same stage (plan build), minus a bespoke type system.
  *
  * History (core/history.py:16-121): step names with the "Step" suffix
  * stripped, joined by "-", stamped by sinks into payloads — here exposed as
  * `Pipeline.history` and a `withHistory` projection (qdrant/step.py:99).
  */
trait Step extends Serializable {
  def name: String = {
    val n = getClass.getSimpleName.stripSuffix("$")
    if (n != "Step" && n.endsWith("Step")) n.dropRight(4) else n
  }

  def run(in: DataFrame): DataFrame

  /** Post-run lifecycle hook (reference finalize(), typed_step.py:220-226 —
    * index creation / alias swap / retirement live here in sinks). */
  def finalizeStep(spark: SparkSession): Unit = {}

  def >>(next: Step): Pipeline = Pipeline(Vector(this, next))
}

final case class Pipeline(steps: Vector[Step]) {
  def >>(next: Step): Pipeline = Pipeline(steps :+ next)

  def history: String = steps.map(_.name).mkString("-")

  /** Compose lazily; one Catalyst plan spans the whole DAG (SURVEY.md §3.3:
    * the reference runs one OS process per step with file hand-offs — here
    * stage boundaries are exchanges, and Catalyst optimizes across them). */
  def run(in: DataFrame): DataFrame = steps.foldLeft(in)((df, s) => s.run(df))

  def runWithHistory(in: DataFrame): DataFrame =
    run(in).withColumn("history", lit(history))

  def finalizeAll(spark: SparkSession): Unit = steps.foreach(_.finalizeStep(spark))
}

/** Reference `DropDuplicationStep` (wurzel/steps/duplication.py:21-51):
  * drop duplicate rows by field list; `Seq("*")` = whole row. Map-typed
  * columns (the open metadata map) are not comparable in Spark set
  * operations, so whole-row dedup keys them through to_json. */
final case class DropDuplicationStep(fields: Seq[String] = Seq("md")) extends Step {
  def run(in: DataFrame): DataFrame =
    if (fields == Seq("*")) {
      val mapCols = in.schema.fields
        .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType]).map(_.name)
      if (mapCols.isEmpty) in.distinct()
      else {
        val keyed = mapCols.foldLeft(in)((df, m) => df.withColumn(s"__k_$m", to_json(col(m))))
        keyed
          .dropDuplicates((in.columns.filterNot(mapCols.contains) ++ mapCols.map("__k_" + _)).toSeq)
          .drop(mapCols.map("__k_" + _).toIndexedSeq: _*)
      }
    } else in.dropDuplicates(fields)
}

/** Filter-out rows whose `urlCol` contains a fragment, case-folded
  * (reference wurzel/steps/wonderful/step.py:330-333). */
final case class UrlFilterStep(fragment: String, urlCol: String = "url") extends Step {
  def run(in: DataFrame): DataFrame =
    in.filter(!lower(col(urlCol)).contains(fragment.toLowerCase))
}

/** Deterministic output ordering before persistence (reference
  * base_executor.py:67-87 — sorts for DVC cache stability; here for
  * hash-stable sinks/goldens). */
final case class DeterministicSortStep(byCols: Seq[String]) extends Step {
  def run(in: DataFrame): DataFrame = in.orderBy(byCols.map(col): _*)
}
