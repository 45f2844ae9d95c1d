package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

/** ANN retrieval-QUALITY regression pins (round-6 item: q37/q64/q83/q86
  * hash-match fixed oracles, but nothing tracked whether the approximate
  * indexes still RETRIEVE well). Recall@10 of each approximate path
  * against the exact brute-force top-10 on the sf0.01 embeddings table —
  * a parameter/kernel change that silently degrades retrieval now fails
  * here instead of surfacing as a bad production index.
  *
  * Calibration (measured once, deterministic end-to-end): the corpus is
  * 500 unit vectors near-UNIFORM on the 64-d sphere (mean top-10 cosine
  * 0.26 vs ~0 background; the label column is uncorrelated with
  * geometry), so absolute recall is bounded by data geometry, not
  * implementation quality. A NumPy reference IVF (20 Lloyd iters) on the
  * same data measures 0.556 at k=16/nprobe=4 vs this engine's 0.526
  * (3 iters), and a reference full-scan PQ ADC (m=8, ksub=16) measures
  * 0.234 vs this engine's IVF-restricted 0.264 — the engine sits AT the
  * textbook level, and the floors below are those measurements minus a
  * safety margin. Two geometry-independent invariants are pinned exactly:
  * probing every cell makes IVF equal brute force (recall 1.0), and
  * recall is monotone in nprobe. The 6-plane LSH floor is tiny by
  * design: P[neighbor at ~75 deg survives 6 hyperplanes] ~ 0.58^6 ~ 0.04
  * — it is the documented cheap-filter baseline, not the scale path. */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"
  private lazy val emb = Tables.load(spark, sf, "embeddings")
  private lazy val queries = emb.filter(col("vec_id") < 50)
  private val kTop = 10

  /** qid -> retrieved cid set, from any (qid, cid) frame. */
  private def hits(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select(col("qid").cast("long"), col("cid").cast("long")).as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }

  private lazy val ground: Map[Long, Set[Long]] =
    hits(Similarity.bruteTopK(emb, queries, "vec_id", "embedding", kTop))

  private lazy val ivfModel = IvfIndex.fit(emb, "vec_id", "embedding", k = 16)

  private def ivfRecall(nprobe: Int): Double =
    recallOf(hits(IvfIndex.topK(emb, queries, "vec_id", "embedding",
      ivfModel, kTop, nprobe)))

  private def recallOf(approx: Map[Long, Set[Long]]): Double = {
    val per = ground.map { case (q, g) =>
      approx.getOrElse(q, Set.empty).intersect(g).size.toDouble / g.size
    }
    per.sum / per.size
  }

  test("IVF nprobe=4 recall@10 >= 0.50 (engine 0.526 vs NumPy-reference 0.556)") {
    val r = ivfRecall(4)
    info(f"IVF nprobe=4 recall@10 = $r%.3f")
    assert(r >= 0.50, f"IVF recall@10 regressed: $r%.3f < 0.50")
  }

  test("IVF recall is monotone in nprobe, and probing every cell IS brute force (recall 1.0)") {
    val r4 = ivfRecall(4); val r8 = ivfRecall(8); val rAll = ivfRecall(16)
    info(f"IVF recall@10: nprobe4=$r4%.3f nprobe8=$r8%.3f nprobe16=$rAll%.3f")
    assert(r4 <= r8 && r8 <= rAll, f"non-monotone: $r4%.3f, $r8%.3f, $rAll%.3f")
    assert(rAll == 1.0, f"exhaustive probe must equal brute force, got $rAll%.3f")
  }

  test("IVF-PQ ADC nprobe=4 recall@10 >= 0.25 (engine 0.264 vs reference full-scan ADC 0.234)") {
    val pq = PqIndex.fit(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val cells = PqIndex.encodeCells(emb, "vec_id", "embedding", ivfModel, pq)
    val r = recallOf(hits(PqIndex.ivfAdcTopK(cells, queries, "vec_id", "embedding",
      ivfModel, pq, kTop, nprobe = 4)))
    info(f"IVF-PQ ADC recall@10 = $r%.3f")
    assert(r >= 0.25, f"IVF-PQ ADC recall@10 regressed: $r%.3f < 0.25")
  }

  test("LSH 6-plane recall@10 >= 0.035 (cheap-filter baseline; 0.58^6 collision bound)") {
    val r = recallOf(hits(Similarity.lshTopK(emb, queries, "vec_id", "embedding",
      kTop, planes = 6)))
    info(f"LSH recall@10 = $r%.3f")
    assert(r >= 0.035, f"LSH recall@10 regressed: $r%.3f < 0.035")
  }
}
