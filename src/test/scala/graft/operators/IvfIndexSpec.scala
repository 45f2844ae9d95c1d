package graft.operators

import graft.SparkSpec

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("IVF: deterministic fit, cells cover the corpus, probe join beats brute-force candidate count") {
    val m1 = IvfIndex.fit(emb, "vec_id", "embedding", k = 8, iters = 2)
    val m2 = IvfIndex.fit(emb, "vec_id", "embedding", k = 8, iters = 2)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq) // deterministic
    val assigned = IvfIndex.assign(emb, "vec_id", "embedding", m1)
    assert(assigned.count() == emb.count())
    val cells = assigned.groupBy("cell").count().collect()
    assert(cells.length > 1 && cells.map(_.getLong(1)).sum == emb.count())
  }

  test("IVF model round-trips through parquet: load(save(m)) serves identical assignments") {
    val m = IvfIndex.fit(emb, "vec_id", "embedding", k = 8, iters = 2)
    val path = tmpDir("ivf") + "/model"
    IvfIndex.save(spark, m, path)
    val loaded = IvfIndex.load(spark, path)
    assert(loaded.centroids.map(_.toSeq).toSeq == m.centroids.map(_.toSeq).toSeq)
    val a = IvfIndex.assign(emb, "vec_id", "embedding", m)
      .orderBy("vec_id").collect().toSeq
    val b = IvfIndex.assign(emb, "vec_id", "embedding", loaded)
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
  }

  test("IVF top-k recall vs brute force scales with nprobe (synthetic vectors are near-random)") {
    val model = IvfIndex.fit(emb, "vec_id", "embedding", k = 8, iters = 2)
    val queries = emb.filter($"vec_id" < 10)
    val brute = Similarity.bruteTopK(emb, queries, "vec_id", "embedding", 10)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    def recallAt(nprobe: Int): (Double, Set[(Long, Long)]) = {
      val ivf = IvfIndex.topK(emb, queries, "vec_id", "embedding", model, 10, nprobe)
        .select("qid", "cid").as[(Long, Long)].collect().toSet
      (brute.intersect(ivf).size.toDouble / brute.size, ivf)
    }
    val (r2, ivf2) = recallAt(2)
    val (r4, _) = recallAt(4)
    assert(r2 >= 0.3, s"recall@nprobe=2 $r2 too low")
    assert(r4 > r2, "recall must grow with nprobe")
    assert(r4 >= 0.6, s"recall@nprobe=4 $r4 too low")
    // determinism of the full query path
    val (_, again) = recallAt(2)
    assert(again == ivf2)
  }
}
