package graft.operators

import graft.SparkSpec
import graft.functions.Kernels
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("spark", "join", "scan", "merge", "filter", "group", "sort",
    "window", "batch", "stream", "table", "row", "key", "hash", "data")
  private def mkDoc(seed: Int, n: Int = 60): String = {
    val r = new scala.util.Random(seed)
    Vector.fill(n)(vocab(r.nextInt(vocab.size))).mkString(" ")
  }
  private def perturb(doc: String, seed: Int, edits: Int): String = {
    val r = new scala.util.Random(seed)
    val w = doc.split(" ").toVector
    val out = (1 to edits).foldLeft(w)((acc, _) =>
      acc.updated(r.nextInt(acc.size), vocab(r.nextInt(vocab.size))))
    out.mkString(" ")
  }

  // 10 base docs + 3 near-dups of doc 0 + 1 exact dup of doc 1
  private val docs = (
    (0 until 10).map(i => (i.toLong, mkDoc(i))) ++
    Seq((100L, perturb(mkDoc(0), 7, 2)), (101L, perturb(mkDoc(0), 8, 3)), (102L, mkDoc(0)),
        (103L, mkDoc(1)))
  ).toDF("doc_id", "text")

  test("exact dedup keeps the min-tiebreak representative") {
    val out = Dedup.exact(docs, Seq("text"), "doc_id")
    assert(out.count() == 12) // 14 rows, 102 dups 0, 103 dups 1
    assert(out.filter($"doc_id".isin(102L, 103L)).count() == 0)
  }

  test("duplicateGroups reports duplicated keys (reference logs removed %)") {
    val groups = Dedup.duplicateGroups(docs, Seq("text")).collect()
    assert(groups.length == 2)
    assert(groups.forall(_.getAs[Long]("dup_count") == 2))
  }

  test("minhash LSH finds planted near-duplicates and the exact dup") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", 12, 4, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 102L))) // exact dup always collides
    assert(pairs.contains((0L, 100L)) || pairs.contains((0L, 101L))) // near-dups found
    assert(pairs.contains((1L, 103L)))
    // no pair between unrelated base docs
    assert(!pairs.exists { case (a, b) => a < 10 && b < 10 })
  }

  test("simhash pairs: exact dup at hamming 0; unrelated docs filtered by maxHamming") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", 48, 16, 2)
      .as[(Long, Long, Long)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m.get((0L, 102L)).contains(0L))
    assert(m.get((1L, 103L)).contains(0L))
  }

  test("kernel UDFs compute the same values as the Column-expression spec") {
    val df = docs.limit(5)
    // minhash parity
    val viaUdf = df.select($"doc_id", Kernels.minhashSigUdf(12, 3)($"text").as("sig"))
    val viaExpr = df.select($"doc_id",
      graft.functions.text.minhashSignature(
        graft.functions.text.shingles(graft.functions.text.tokens($"text"), 3), 12).as("sig"))
    assert(viaUdf.orderBy("doc_id").as[(Long, Seq[Long])].collect().toSeq ==
      viaExpr.orderBy("doc_id").as[(Long, Seq[Long])].collect().toSeq)
    // simhash parity
    val sUdf = df.select($"doc_id", Kernels.simhashUdf(48)($"text")).as[(Long, Long)].collect().toSeq
    val sExpr = df.select($"doc_id",
      graft.functions.text.simhash(graft.functions.text.tokens($"text"), 48)).as[(Long, Long)].collect().toSeq
    assert(sUdf == sExpr)
  }

  test("degenerate band: capPerBand bounds pair fan-out; distinct near-dups still found") {
    // 1000 identical docs — every band key collides, the uncapped join
    // would produce C(1000,2) = 499,500 candidate pairs per band.
    val degenerate = (0 until 1000).map(i => (1000L + i, mkDoc(42)))
    // exact dup: band collision is certain (near-dup collision is only
    // probabilistic in LSH and would flake independent of the cap)
    val planted = Seq((1L, mkDoc(1)), (2L, mkDoc(1)))
    val df = (degenerate ++ planted).toDF("doc_id", "text")
    val cap = 64
    val pairs = Dedup.minhashPairs(df, "doc_id", "text", 12, 4, 0.5, capPerBand = cap)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    // Identical docs score jaccard 1.0, so every surviving candidate pair is
    // returned: the count IS the post-cap fan-out. With nSub = ceil(n/cap)
    // sub-buckets the bound is ~n*cap pairs, far under the quadratic blowup.
    val degeneratePairs = pairs.count { case (a, b) => a >= 1000 && b >= 1000 }
    assert(degeneratePairs > 0, "sub-buckets still produce in-band pairs")
    assert(degeneratePairs < 1000 * cap, s"fan-out not bounded: $degeneratePairs")
    assert(pairs.contains((1L, 2L)), "non-degenerate near-dup pair unaffected by the cap")
    // every degenerate doc keeps at least one in-band link (cluster stays discoverable)
    val linked = pairs.collect { case (a, b) if a >= 1000 || b >= 1000 => Seq(a, b) }
      .flatten.filter(_ >= 1000).toSet
    assert(linked.size == 1000, s"docs left unlinked: ${1000 - linked.size}")
  }

  test("capPerBand leaves small-band results byte-identical (default-on safety)") {
    val capped = Dedup.minhashPairs(docs, "doc_id", "text", 12, 4, 0.5, capPerBand = 256)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val uncapped = Dedup.minhashPairs(docs, "doc_id", "text", 12, 4, 0.5, capPerBand = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == uncapped)
  }

  test("embedding near-dup pairs find identical vectors") {
    val vecs = Seq(
      (1L, Array(0.1f, 0.2f, 0.3f, 0.4f)),
      (2L, Array(0.1f, 0.2f, 0.3f, 0.4f)),       // identical to 1
      (3L, Array(-0.5f, 0.1f, -0.2f, 0.9f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(vecs, "vec_id", "embedding", planes = 4, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
}
