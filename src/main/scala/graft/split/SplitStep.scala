package graft.split

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.util.LongAccumulator
import graft.contracts.{Chunk, MarkdownDoc}
import graft.pipeline.Step

/** Distributed splitter step (SURVEY.md §2.10 wrapper semantics; reference
  * `SimpleSplitterStep` wurzel/steps/splitter.py:71-119).
  *
  * The reference batches 100 docs over 4 joblib threads — in Spark that is
  * partition parallelism, free. The error policy is preserved exactly
  * (splitter.py:51-68): a doc that fails to split is SKIPPED and counted;
  * the step fails only when EVERY doc was skipped. Counting happens in
  * accumulators inside the flatMap — no collect — and the threshold check
  * runs after the terminal action via `assertNotAllSkipped`.
  */
final class SplitStep(
    splitter: SemanticSplitter = new SemanticSplitter(),
    @transient spark: SparkSession = null) extends Step {

  @transient private var _docs: LongAccumulator = _
  @transient private var _skipped: LongAccumulator = _

  def split(ds: Dataset[MarkdownDoc]): Dataset[Chunk] = {
    val sp = ds.sparkSession
    import sp.implicits._
    val docs = sp.sparkContext.longAccumulator("split_docs")
    val skipped = sp.sparkContext.longAccumulator("split_skipped")
    _docs = docs; _skipped = skipped
    val sseq = splitter
    ds.flatMap { doc =>
      docs.add(1)
      try sseq.splitDoc(doc)
      catch { case _: Exception => skipped.add(1); Seq.empty[Chunk] }
    }
  }

  def run(in: DataFrame): DataFrame = {
    val sp = in.sparkSession
    import sp.implicits._
    split(in.as[MarkdownDoc]).toDF()
  }

  /** Call after the terminal action: reference fails the step when all docs
    * were skipped (splitter.py:62-67), warns on a partial skip rate. */
  def assertNotAllSkipped(): Unit = {
    if (_docs != null && _docs.value > 0 && _skipped.value == _docs.value)
      throw new IllegalStateException(
        s"all ${_docs.value} documents failed to split — failing step (reference splitter.py:62-67)")
  }

  def skipStats: (Long, Long) =
    (if (_docs == null) 0L else _docs.value, if (_skipped == null) 0L else _skipped.value)
}
