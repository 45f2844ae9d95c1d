package graft.pipeline

import graft.SparkSpec
import graft.operators._
import org.apache.spark.sql.functions._

/** End-to-end composition of the vector operators over real embedding
  * parquet: near-dup prune -> IVF coarse quantizer -> PQ codebooks ->
  * encode-once serving frame -> probed ADC top-k. Complements
  * TrainingPipelineSpec (the text flow) with the ANN serving flow. */
class VectorPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("prune -> IVF fit -> PQ fit -> encodeCells -> ivfAdcTopK composes") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val n0 = emb.count()

    // 1. drop near-identical vectors (cluster resolution on hyperplane pairs)
    val verdicts = Dedup.resolveClusters(emb, "vec_id",
      Dedup.embeddingPairs(emb, "vec_id", "embedding", planes = 8, threshold = 0.995))
    val kept = emb.join(
      verdicts.filter(!col("is_duplicate")).select("vec_id"), Seq("vec_id"), "left_semi")
    val n1 = kept.count()
    assert(n1 > 0 && n1 <= n0)

    // 2. fit both quantizers on the pruned corpus
    val ivf = IvfIndex.fit(kept, "vec_id", "embedding", k = 8)
    val pq = PqIndex.fit(kept, "vec_id", "embedding", m = 4, ksub = 8)
    assert(ivf.centroids.length == 8 && pq.m == 4)

    // 3. build the serving frame once; serve a query batch from it
    val cells = PqIndex.encodeCells(kept, "vec_id", "embedding", ivf, pq).persist()
    assert(cells.count() == n1)
    val queries = kept.limit(5)
    val top = PqIndex.ivfAdcTopK(cells, queries, "vec_id", "embedding",
      ivf, pq, kTop = 3, nprobe = 2)
    val byQ = top.select("qid", "cid", "adist").as[(Long, Long, Long)]
      .collect().groupBy(_._1)
    assert(byQ.nonEmpty && byQ.values.forall(_.length <= 3))
    // determinism: a second serve returns the identical result set
    val again = PqIndex.ivfAdcTopK(cells, queries, "vec_id", "embedding",
      ivf, pq, kTop = 3, nprobe = 2)
      .select("qid", "cid", "adist").as[(Long, Long, Long)].collect().toSet
    assert(again == top.select("qid", "cid", "adist")
      .as[(Long, Long, Long)].collect().toSet)
    cells.unpersist()
    ()
  }
}
