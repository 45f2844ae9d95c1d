package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated 8-dim clusters; cluster id = vec_id / 10
  private def vecs = (0L until 30L).map { i =>
    val c = (i / 10).toInt
    val base = Array.fill(8)(0.05f * ((i % 10) + 1))
    base(c * 2) = 1.0f + 0.01f * (i % 10)
    (i, base)
  }.toDF("vec_id", "embedding")

  test("fit is deterministic and shapes match (m sub-spaces, ksub codewords)") {
    val a = PqIndex.fit(vecs, "vec_id", "embedding", m = 2, ksub = 3)
    val b = PqIndex.fit(vecs, "vec_id", "embedding", m = 2, ksub = 3)
    assert(a.m == 2 && a.ksub == 3 && a.subDim == 4)
    assert(a.codebooks.flatten.flatten.toSeq == b.codebooks.flatten.flatten.toSeq)
  }

  test("encode emits m codes in [0, ksub) and identical vectors share codes") {
    val model = PqIndex.fit(vecs, "vec_id", "embedding", m = 4, ksub = 3)
    val dup = vecs.union(vecs.filter($"vec_id" === 0).withColumn("vec_id", lit(99L)))
    val codes = PqIndex.encode(dup, "vec_id", "embedding", model)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert(codes.values.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 3)))
    assert(codes(99L) == codes(0L))
  }

  test("adcTopK: an exact duplicate ranks first; all neighbors stay in-cluster") {
    val model = PqIndex.fit(vecs, "vec_id", "embedding", m = 2, ksub = 4)
    val withDup = vecs.union(
      vecs.filter($"vec_id" === 5).withColumn("vec_id", lit(50L)))
    val top = PqIndex.adcTopK(withDup, withDup.filter($"vec_id" === 5),
        "vec_id", "embedding", model, kTop = 8)
      .orderBy("adist", "cid")
      .select("cid", "adist").as[(Long, Long)].collect().toSeq
    // ADC distance to the exact duplicate is the query's own quantization
    // error (table lookup on the dup's codeword) — nonzero, but strictly
    // minimal: no candidate can score below the query's own cell
    assert(top.head._1 == 50L, s"dup must rank first: $top")
    // all top-8 neighbors of a cluster-0 vector are cluster-0 members
    assert(top.forall { case (cid, _) => cid == 50L || cid / 10 == 0 }, top.toString)
  }

  test("adcTopKEncoded serves from pre-encoded codes with identical results") {
    val model = PqIndex.fit(vecs, "vec_id", "embedding", m = 2, ksub = 4)
    val codes = PqIndex.encode(vecs, "vec_id", "embedding", model)
      .withColumnRenamed("vec_id", "cid")
    val a = PqIndex.adcTopKEncoded(codes, vecs.limit(3), "vec_id", "embedding", model, 4)
      .select("qid", "cid", "adist").as[(Long, Long, Long)].collect().toSet
    val b = PqIndex.adcTopK(vecs, vecs.limit(3), "vec_id", "embedding", model, 4)
      .select("qid", "cid", "adist").as[(Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("fit fails fast on empty, ragged, and under-sized corpora") {
    val empty = vecs.filter($"vec_id" < 0)
    assert(intercept[IllegalArgumentException](
      PqIndex.fit(empty, "vec_id", "embedding", 2, 2)).getMessage.contains("empty"))
    val ragged = vecs.union(Seq((99L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding"))
    assert(intercept[IllegalArgumentException](
      PqIndex.fit(ragged, "vec_id", "embedding", 2, 2)).getMessage.contains("ragged"))
    assert(intercept[IllegalArgumentException](
      PqIndex.fit(vecs.limit(2), "vec_id", "embedding", 2, 4)).getMessage.contains("ksub"))
  }

  test("ivfAdcTopK: probed-cell results are the full-ADC results restricted to the probed members") {
    val ivf = IvfIndex.fit(vecs, "vec_id", "embedding", k = 3)
    val pq = PqIndex.fit(vecs, "vec_id", "embedding", m = 2, ksub = 4)
    val cells = PqIndex.encodeCells(vecs, "vec_id", "embedding", ivf, pq).persist()
    val queries = vecs.filter($"vec_id" === 15)
    val probed = PqIndex.ivfAdcTopK(cells, queries, "vec_id", "embedding",
        ivf, pq, kTop = 5, nprobe = 1)
      .select("cid", "adist").as[(Long, Long)].collect().toMap
    // full ADC over the same candidate restriction must agree on distances
    val full = PqIndex.adcTopK(vecs, queries, "vec_id", "embedding", pq, 30)
      .select("cid", "adist").as[(Long, Long)].collect().toMap
    assert(probed.nonEmpty)
    probed.foreach { case (cid, d) => assert(full(cid) == d, s"cid $cid: $d vs ${full(cid)}") }
    // with its own cluster probed, the query's nearest heap members are in-cluster
    assert(probed.keySet.forall(_ / 10 == 1), probed.toString)
    cells.unpersist()
    ()
  }

  test("adcTopK ranks through GroupTopK (bounded heaps), not a window sort") {
    val model = PqIndex.fit(vecs, "vec_id", "embedding", m = 2, ksub = 4)
    val plan = PqIndex.adcTopK(vecs, vecs.limit(2), "vec_id", "embedding", model, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
  }
}
