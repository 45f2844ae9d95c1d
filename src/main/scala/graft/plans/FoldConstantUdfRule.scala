package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, ScalaUDF}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: constant-fold DETERMINISTIC Scala UDFs whose every
  * argument is foldable — the one class of expression Catalyst's own
  * ConstantFolding refuses on principle (an arbitrary closure could
  * side-effect), evaluated here exactly once on the driver at
  * optimization time.
  *
  * Why it matters (guide §1.2 "per-task work", measured r15): the
  * mdformat oracle queries apply the normalize kernel (25-90 µs/call) to
  * literal document shapes — `udf(normalize)(lit("- aa\n...")), 5 of 7
  * legs in q131 — and without folding every ROW re-evaluates the same
  * constant call: 5000 rows x 5 legs x ~50 µs ≈ 1.2 s of identical
  * results per execution, on the single input split the small parquet
  * scan produces. Folding turns each constant leg into the Literal it
  * denotes; per-row legs are untouched.
  *
  * Safety guards:
  *  - `udfDeterministic` only (the engine's kernels are pure functions;
  *    a nondeterministic UDF keeps per-row evaluation by contract);
  *  - every child foldable (Literal or expressions ConstantFolding
  *    already reduced — the rule runs inside the operator-optimization
  *    fixed point, so nested constant UDFs fold inside-out across
  *    iterations);
  *  - evaluation failures leave the expression in place (the error then
  *    surfaces at execution time with normal task diagnostics, not as a
  *    planning crash).
  *
  * Installed via [[GraftExtensions]] (injectOptimizerRule), so it runs in
  * the same fixed-point batch as ConstantFolding: folding a UDF makes its
  * parent foldable, which ConstantFolding then reduces, which can make an
  * enclosing UDF's arguments foldable in the next iteration. */
object FoldConstantUdfRule extends Rule[LogicalPlan] {

  private def foldableUdf(e: Expression): Boolean = e match {
    case u: ScalaUDF =>
      u.udfDeterministic && u.resolved && u.children.nonEmpty &&
        u.children.forall(_.foldable)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p => p.transformExpressionsUp {
      case u: ScalaUDF if foldableUdf(u) =>
        try Literal.create(u.eval(InternalRow.empty), u.dataType)
        catch { case scala.util.control.NonFatal(_) => u }
    }
  }
}
