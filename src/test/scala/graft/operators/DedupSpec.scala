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

  test("exact dedup plans as hash aggregation, value-equal to the window form") {
    // multi-field grouping incl. a null field value and an empty string —
    // the JSON key must keep ("", x) distinct from (null, x)
    val rows = Seq(
      (1L, "a", "x"), (2L, "a", "x"),          // dup group, keep id 1
      (3L, "", "x"), (4L, null, "x"),          // NOT dups of each other
      (5L, "b", "y")
    ).toDF("doc_id", "text", "lang")
    val out = Dedup.exact(rows, Seq("text", "lang"), "doc_id")
    // the pre-r9 formulation, kept here as the semantic oracle
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"text", $"lang").orderBy($"doc_id")
    val legacy = rows.withColumn("__rn", row_number().over(w))
      .filter($"__rn" === 1).drop("__rn")
    assert(out.columns.toSeq == rows.columns.toSeq)
    assert(out.select("doc_id", "text", "lang").as[(Long, String, String)].collect().toSet
      == legacy.select("doc_id", "text", "lang").as[(Long, String, String)].collect().toSet)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 3L, 4L, 5L))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"exact must not window raw fields:\n$plan")
    assert(planCount(plan, "Exchange") == 1, s"one hash exchange expected:\n$plan")
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

  // Driver-side transliteration of the q33/q34/q35 oracle-SQL cap model
  // (windowed count per band -> ceil(n/cap) sub-buckets -> hash60(id#band)
  // picks the sub-bucket). Mirrors the DuckDB CTEs independently of the
  // engine's distributed plan, so set-equality below proves the oracle
  // stays hash-exact when a band actually exceeds the cap.
  private def modelCapBands(rows: Seq[(Long, String)], cap: Int): Seq[(Long, String)] = {
    val n = rows.groupBy(_._2).view.mapValues(_.size).toMap
    rows.map { case (id, band) =>
      val c = n(band)
      if (cap > 0 && c > cap)
        (id, band + "#" + (Kernels.hash60(id.toString + "#band") % math.ceil(c / cap.toDouble).toLong))
      else (id, band)
    }
  }

  private def modelPairs(banded: Seq[(Long, String)]): Set[(Long, Long)] =
    banded.groupBy(_._2).values.flatMap { members =>
      val ids = members.map(_._1)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet

  test("q33 oracle cap model: engine matches driver-side model when a minhash band exceeds the cap") {
    val cap = 256
    // 300 identical docs -> every minhash band has 300 members (> cap), plus
    // a planted near-dup pair and unrelated docs in untouched small bands.
    val rows = (0 until 300).map(i => (1000L + i, mkDoc(42))) ++
      Seq((1L, mkDoc(1)), (2L, perturb(mkDoc(1), 5, 1))) ++
      (10L until 15L).map(i => (i, mkDoc(i.toInt)))
    val df = rows.toDF("doc_id", "text")

    val engine = Dedup.minhashPairs(df, "doc_id", "text", 12, 4, 0.5, capPerBand = cap)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet

    // oracle model: bands -> windowed cap -> candidate pairs -> exact jaccard
    val bandRows = rows.flatMap { case (id, text) =>
      val sig = Kernels.minhashSig(text, 12, 3)
      (0 until 3).map(b => (id, s"$b:" + (0 until 4).map(i => sig(b * 4 + i)).mkString(":")))
    }
    assert(bandRows.groupBy(_._2).values.map(_.size).max > cap, "planted skew must exceed the cap")
    val sh = rows.map { case (id, text) => id -> Kernels.shingleArr(text, 3).toSet }.toMap
    val expected = modelPairs(modelCapBands(bandRows, cap)).map { case (a, b) =>
      (a, b, sh(a).intersect(sh(b)).size.toDouble / sh(a).union(sh(b)).size)
    }.filter(_._3 >= 0.5)
    assert(engine == expected)
  }

  test("q35 oracle cap model: engine matches driver-side model when a hyperplane bucket exceeds the cap") {
    val cap = 256
    val base = Array(0.3f, -0.1f, 0.7f, 0.2f)
    // 300 identical vectors collapse into one bucket (> cap); two planted
    // distinct-but-equal vectors and one orthogonal-ish outlier elsewhere.
    val rows = (0 until 300).map(i => (1000L + i, base)) ++
      Seq((1L, Array(0.9f, 0.1f, -0.3f, 0.5f)), (2L, Array(0.9f, 0.1f, -0.3f, 0.5f)),
          (3L, Array(-0.5f, 0.8f, 0.1f, -0.9f)))
    val df = rows.toDF("vec_id", "embedding")

    val engine = Dedup.embeddingPairs(df, "vec_id", "embedding", planes = 8, threshold = 0.9, capPerBand = cap)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect().toSet

    val feats = rows.map { case (id, v) =>
      val qv = Kernels.quantizeVec(v)
      (id, qv, Kernels.dotLong(qv, qv), Kernels.lshBucketVec(qv, 8, "emb"))
    }
    val bucketRows = feats.map { case (id, _, _, bucket) => (id, bucket.toString) }
    assert(bucketRows.groupBy(_._2).values.map(_.size).max > cap, "planted skew must exceed the cap")
    val byId = feats.map(f => f._1 -> f).toMap
    val expected = modelPairs(modelCapBands(bucketRows, cap)).map { case (a, b) =>
      val (_, qa, na, _) = byId(a); val (_, qb, nb, _) = byId(b)
      (a, b, Kernels.dotLong(qa, qb).toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)))
    }.filter(_._3 >= 0.9)
    assert(expected.nonEmpty, "capped bucket must still yield confirmed pairs")
    assert(engine == expected)
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

  test("stripHotLines removes lines in > maxDocs docs, keeps order, blanks, and emptied docs") {
    val footer = "(c) footer"
    val docs = (1L to 5L).map { i =>
      (i, s"$footer\nbody $i line one\n\nbody $i line two", s"g${i % 2}")
    } :+ ((6L, footer, "g0")) // doc whose every line is hot
    val out = Dedup.stripHotLines(docs.toDF("doc_id", "body", "grp"),
        "doc_id", "body", maxDocs = 3)
      .orderBy("doc_id").select("doc_id", "body", "grp")
      .as[(Long, String, String)].collect().toSeq
    // the footer (6 docs > 3) is stripped; blank separators and per-doc
    // unique lines stay in original order; untouched columns survive
    assert(out(0) == ((1L, "body 1 line one\n\nbody 1 line two", "g1")))
    assert(out(4) == ((5L, "body 5 line one\n\nbody 5 line two", "g1")))
    // a fully-boilerplate doc survives as an empty-text row, not a lost row
    assert(out(5) == ((6L, "", "g0")))
  }

  test("stripHotLines: blank lines are never counted as boilerplate") {
    val docs = (1L to 10L).map(i => (i, s"\nuniq $i\n")).toDF("doc_id", "body")
    val out = Dedup.stripHotLines(docs, "doc_id", "body", maxDocs = 2)
      .orderBy("doc_id").select("body").as[String].collect()
    assert(out(0) == "\nuniq 1\n")
  }

  test("stripHotLines paragraph mode: \\n\\n units dedup whole paragraphs, inner newlines survive") {
    val boiler = "subscribe to\nour newsletter"
    val docs = (1L to 5L).map(i => (i, s"intro $i line\nsecond\n\n$boiler\n\nbody $i"))
      .toDF("doc_id", "body")
    val out = Dedup.stripHotLines(docs, "doc_id", "body", maxDocs = 3, sep = "\n\n")
      .orderBy("doc_id").select("body").as[String].collect().toSeq
    // the 2-line boilerplate paragraph (5 docs > 3) goes as one unit;
    // the multi-line intro paragraph survives with its inner newline
    assert(out(0) == "intro 1 line\nsecond\n\nbody 1")
  }

  test("stripHotLines: null text stays null, distinct from an emptied doc") {
    val docs = Seq((1L, null: String), (2L, "solo line 2"))
      .toDF("doc_id", "body")
    val out = Dedup.stripHotLines(docs, "doc_id", "body", maxDocs = 1)
      .orderBy("doc_id").select("body").as[Option[String]].collect().toSeq
    assert(out == Seq(None, Some("solo line 2")))
  }

  test("incremental pairing composes across arrivals below the cap") {
    // one-shot ingest of {100..103} vs the same docs in two arrivals: raw
    // band keys don't depend on corpus size, so with no band above the
    // cap the union of the two ingests' pair sets equals the one-shot set
    val existing = docs.filter($"doc_id" < 100)
    val batch1 = docs.filter($"doc_id".isin(100L, 101L))
    val batch2 = docs.filter($"doc_id".isin(102L, 103L))
    def pairs(ex: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      Dedup.minhashPairsIncremental(ex, b, "doc_id", "text")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val oneShot = pairs(existing, batch1.unionByName(batch2))
    val twoStep = pairs(existing, batch1) ++ pairs(existing.unionByName(batch1), batch2)
    assert(oneShot == twoStep)
    assert(oneShot.nonEmpty) // 100-103 are near-dups of docs 0/1 — real pairs
  }

  test("minhashIndex + pairsAgainstIndex == from-text incremental run (steady-state ingest)") {
    val existing = docs.filter($"doc_id" % 2 === 0)
    val batch = docs.filter($"doc_id" % 2 === 1)
    // round-trip the index through parquet: the production shape — the
    // corpus text is never re-read, only its persisted signature rows
    val idxDir = java.nio.file.Files.createTempDirectory("mh_idx").toString
    Dedup.minhashIndex(existing, "doc_id", "text").write.mode("overwrite").parquet(idxDir)
    val viaIndex = Dedup.minhashPairsAgainstIndex(
        spark.read.parquet(idxDir), batch, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val fromText = Dedup.minhashPairsIncremental(existing, batch, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(viaIndex == fromText)
    assert(viaIndex.nonEmpty)
  }

  test("index ingest composes across arrivals: append batch index rows, pairs match one-shot") {
    val arrival1 = docs.filter($"doc_id" < 100)
    val b1 = docs.filter($"doc_id".isin(100L, 101L))
    val b2 = docs.filter($"doc_id".isin(102L, 103L))
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    var index = Dedup.minhashIndex(arrival1, "doc_id", "text")
    val p1 = pairSet(Dedup.minhashPairsAgainstIndex(index, b1, "doc_id", "text"))
    index = index.unionByName(Dedup.minhashIndex(b1, "doc_id", "text"))
    val p2 = pairSet(Dedup.minhashPairsAgainstIndex(index, b2, "doc_id", "text"))
    val oneShot = pairSet(Dedup.minhashPairsIncremental(
      arrival1, b1.unionByName(b2), "doc_id", "text"))
    assert((p1 ++ p2) == oneShot)
  }

  test("pairsAgainstIndex validateDisjoint rejects overlapping ids") {
    val idx = Dedup.minhashIndex(docs.filter($"doc_id" < 5), "doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.minhashPairsAgainstIndex(idx, docs.filter($"doc_id" < 3),
        "doc_id", "text", validateDisjoint = true).count()
    }
  }

  test("minhashPairsIncremental: exactly the batch-involving subset of the full pair set") {
    val existing = docs.filter($"doc_id" % 2 === 0)
    val batch = docs.filter($"doc_id" % 2 === 1)
    val inc = Dedup.minhashPairsIncremental(existing, batch, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val full = Dedup.minhashPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(inc == full.filter { case (a, b) => a % 2 == 1 || b % 2 == 1 })
    // existing x existing pairs exist in the full set (0~100, 0~102 are all
    // even) but must never be re-emitted by the incremental path
    assert((full -- inc).nonEmpty)
    assert(inc.forall { case (a, b) => a % 2 == 1 || b % 2 == 1 })
  }

  test("zero-norm vectors never pair: a failed-embed row cannot collapse its cell/bucket") {
    // cosine with a zero vector is 0/0 = NaN, and Spark orders NaN above
    // every number — without the norm guard the zero row would "match"
    // everything it shares a band with and CC would merge the whole cell
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 0.0f)), (4L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    assert(Dedup.embeddingPairs(vecs, "vec_id", "embedding", planes = 2, threshold = 0.5)
      .count() == 0)
    val model = IvfIndex.fit(vecs, "vec_id", "embedding", k = 1, iters = 1)
    val out = Dedup.semanticDedup(vecs, "vec_id", "embedding", model, threshold = 0.5)
      .orderBy("vec_id").select("is_duplicate").as[Boolean].collect().toSeq
    assert(out == Seq(false, false, false, false))
  }

  test("semanticDedup: same-cell near-identical vectors cluster, min id is canonical") {
    // two well-separated directions; c/d are exact copies of a twin
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.1f)), (2L, Array(1.0f, 0.01f, 0.1f)), // near-dups
      (3L, Array(0.0f, 1.0f, 0.1f)),                                 // lone in cell 2
      (4L, Array(1.0f, 0.0f, 0.1f)),                                 // exact copy of 1
      (5L, Array(0.0f, 1.0f, 0.9f))                                  // cell 2, dissimilar
    ).toDF("vec_id", "embedding")
    val model = IvfIndex.fit(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val out = Dedup.semanticDedup(vecs, "vec_id", "embedding", model, threshold = 0.99)
      .orderBy("vec_id")
      .select("vec_id", "cluster_id", "is_duplicate")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out(0) == ((1L, 1L, false))) // canonical
    assert(out(1) == ((2L, 1L, true)))
    assert(out(2) == ((3L, 3L, false))) // no pair above threshold
    assert(out(3) == ((4L, 1L, true)))
    assert(out(4) == ((5L, 5L, false)))
  }

  // ---- stripDupSpans (ExactSubstr, Lee et al. 2022 family) ---------------

  // 30 distinct filler tokens so cross-doc windows never collide by accident
  private def filler(tag: String, n: Int): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("stripDupSpans: a shared >= w-token run survives only in the first doc") {
    val run = filler("dup", 8) // 8-token shared run, w = 4
    val docs = Seq(
      (1L, s"${filler("a", 5)} $run ${filler("b", 5)}"),
      (2L, s"${filler("c", 5)} $run ${filler("d", 5)}")).toDF("doc_id", "text")
    val out = Dedup.stripDupSpans(docs, "doc_id", "text", w = 4)
      .orderBy("doc_id")
      .select("text", "dup_windows", "covered_tokens")
      .as[(String, Long, Long)].collect().toSeq
    // doc 1 holds every global-first occurrence — untouched, byte-for-byte
    assert(out(0) == ((s"${filler("a", 5)} $run ${filler("b", 5)}", 0L, 0L)))
    // doc 2: 5 flagged windows (positions 5..9) merge into one maximal
    // 8-token span; the flanks survive
    assert(out(1) == ((s"${filler("c", 5)} ${filler("d", 5)}", 5L, 8L)))
  }

  test("stripDupSpans: within-doc repetition is stripped after the first occurrence") {
    val run = filler("rep", 6)
    val docs = Seq((1L, s"$run ${filler("mid", 4)} $run")).toDF("doc_id", "text")
    val out = Dedup.stripDupSpans(docs, "doc_id", "text", w = 6)
      .select("text", "dup_windows", "covered_tokens")
      .as[(String, Long, Long)].collect().head
    assert(out == ((s"$run ${filler("mid", 4)}", 1L, 6L)))
  }

  test("stripDupSpans: docs shorter than w produce no windows and keep exact text") {
    val docs = Seq((1L, "tiny  doc\twith\nodd   whitespace"),
      (2L, "tiny  doc\twith\nodd   whitespace")).toDF("doc_id", "text")
    val out = Dedup.stripDupSpans(docs, "doc_id", "text", w = 15)
      .orderBy("doc_id").select("text").as[String].collect().toSeq
    // both under w tokens: even the exact duplicate is out of scope (the
    // paper's min-match-length), and original whitespace is untouched
    assert(out == Seq("tiny  doc\twith\nodd   whitespace",
      "tiny  doc\twith\nodd   whitespace"))
  }

  test("stripDupSpans: a doc that is entirely a duplicate is emptied, null stays null") {
    val run = filler("whole", 10)
    val docs = Seq((1L, run), (2L, run), (3L, null: String)).toDF("doc_id", "text")
    val out = Dedup.stripDupSpans(docs, "doc_id", "text", w = 5)
      .orderBy("doc_id").select("text", "covered_tokens")
      .as[(Option[String], Long)].collect().toSeq
    assert(out == Seq((Some(run), 0L), (Some(""), 10L), (None, 0L)))
  }

  test("stripDupSpans property: matches a brute-force reference on a random collision-heavy corpus") {
    // tiny vocabulary + short docs force genuine cross-doc and within-doc
    // window collisions; the brute force recomputes the whole semantics
    // independently of the operator's census/join/kernel machinery
    val w = 3
    val r = new scala.util.Random(42)
    val corpus = (1L to 60L).map { id =>
      (id, Vector.fill(3 + r.nextInt(12))(vocab(r.nextInt(5))).mkString(" "))
    }
    def brute(): Map[Long, (String, Long, Long)] = {
      val wins = corpus.flatMap { case (id, text) =>
        val t = text.split(" ")
        (0 to t.length - w).map(p => (t.slice(p, p + w).mkString(" "), id, p))
      }
      val byGram = wins.groupBy(_._1)
      val flagged = wins.filter { case (g, id, p) =>
        val occ = byGram(g)
        occ.length > 1 && (id, p) != occ.map(o => (o._2, o._3)).min
      }.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
      corpus.map { case (id, text) =>
        val t = text.split(" ")
        val ps = flagged.getOrElse(id, Set.empty)
        val keptIdx = t.indices.filterNot(i => ps.exists(p => p <= i && i < p + w))
        val kept = if (ps.isEmpty) text else keptIdx.map(t).mkString(" ")
        (id, (kept, ps.size.toLong, (t.length - keptIdx.length).toLong))
      }.toMap
    }
    val expected = brute()
    val out = Dedup.stripDupSpans(corpus.toDF("doc_id", "text"), "doc_id", "text", w)
      .select("doc_id", "text", "dup_windows", "covered_tokens")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == expected)
  }

  test("dupWindows census: n_occ counts all occurrences, is_first marks (id, pos) order") {
    val run = filler("cen", 5)
    val docs = Seq(
      (1L, s"$run ${filler("x", 3)} $run"), // positions 0 and 8
      (2L, run)).toDF("doc_id", "text")
    val wins = Dedup.dupWindows(docs, "doc_id", "text", w = 5)
      .filter($"n_occ" > 1).orderBy("doc_id", "pos")
      .select("doc_id", "pos", "n_occ", "is_first")
      .as[(Long, Int, Long, Boolean)].collect().toSeq
    assert(wins == Seq((1L, 0, 3L, true), (1L, 8, 3L, false), (2L, 0, 3L, false)))
  }

  test("dupWindows: planted corpus-hot window (in EVERY doc) stays correct and window-free") {
    // the skew class the census must absorb: one boilerplate window in
    // every document — a per-key window would funnel all N occurrences
    // into one sorting task; the groupBy census absorbs it map-side
    val boiler = filler("boil", 5)
    val docs = (1L to 200L)
      .map(i => (i, s"${filler(s"u$i", 3)} $boiler"))
      .toDF("doc_id", "text")
    val wins = Dedup.dupWindows(docs, "doc_id", "text", w = 5)
    val hot = wins.filter($"n_occ" === 200)
      .select("doc_id", "is_first")
      .as[(Long, Boolean)].collect().toSeq
    assert(hot.size == 200)
    assert(hot.filter(_._2).map(_._1) == Seq(1L)) // global first = min (id, pos)
    val plan = wins.queryExecution.executedPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, plan.toString)
  }

  test("selectKeepers: quality elects the keeper, not the min id; singletons keep themselves") {
    // cluster {1,2,3}: doc 3 has the highest quality -> keeper despite max id
    val docs = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (9L, 5.0)).toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.selectKeepers(docs, "doc_id", pairs, $"q")
      .select("doc_id", "cluster_id", "cluster_size", "is_keeper")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 1L, 3L, false), (2L, 1L, 3L, false),
      (3L, 1L, 3L, true), (9L, 9L, 1L, true)))
  }

  test("selectKeepers: quality ties break on the smaller id; one keeper per cluster always") {
    val docs = (1L to 6L).map(i => (i, 7.0)).toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Dedup.selectKeepers(docs, "doc_id", pairs, $"q")
      .select("doc_id", "cluster_id", "is_keeper")
      .as[(Long, Long, Boolean)].collect()
    assert(out.filter(_._3).map(_._1).sorted.toSeq == Seq(1L, 3L, 6L))
    val perCluster = out.groupBy(_._2).view.mapValues(_.count(_._3)).toMap
    assert(perCluster.values.forall(_ == 1), perCluster.toString)
  }

  test("selectKeepers plan: election is aggregate-shaped — no per-cluster window sort") {
    val docs = Seq((1L, 1.0), (2L, 2.0)).toDF("doc_id", "q")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val plan = Dedup.selectKeepers(docs, "doc_id", pairs, $"q")
      .queryExecution.executedPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, plan.toString)
  }

  test("softDedupSample: rate is 10000 div cluster_size; membership is the hash filter") {
    // cluster {3,4,5} via 3-4, 4-5 (id 4 hashes into the 1/3 keep bucket,
    // ids 3 and 5 hash out — both filter directions exercised); 7, 8 singletons
    val docs = Seq(3L, 4L, 5L, 7L, 8L).toDF("doc_id")
    val pairs = Seq((3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Dedup.softDedupSample(docs, "doc_id", pairs)
      .select("doc_id", "cluster_id", "cluster_size", "rate_bp")
      .as[(Long, Long, Long, Long)].collect().toSet
    // expected keeps: singletons always (rate 10000); cluster members iff
    // hash60(id#sample) % 10000 < 3333 — the same kernel the filter uses
    val expCluster = Seq(3L, 4L, 5L)
      .filter(id => Kernels.hash60(s"$id#sample") % 10000 < 3333)
      .map(id => (id, 3L, 3L, 3333L)).toSet
    val expSingle = Set((7L, 7L, 1L, 10000L), (8L, 8L, 1L, 10000L))
    assert(out == expCluster ++ expSingle)
    assert(expCluster == Set((4L, 3L, 3L, 3333L)),
      "planted ids pin one kept member and two dropped members")
  }

  test("softDedupSample: keeps compose with independent hash samples (nested buckets)") {
    val docs = (1L to 200L).toDF("doc_id")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val kept = Dedup.softDedupSample(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    // every doc that a downstream 30% sample keeps and soft-dedup kept
    // stays kept when the two filters compose in either order
    val downstream = graft.operators.Sampling
      .byHash(docs, "doc_id", 3000).select("doc_id").as[Long].collect().toSet
    val composed = graft.operators.Sampling
      .byHash(Dedup.softDedupSample(docs, "doc_id", pairs), "doc_id", 3000)
      .select("doc_id").as[Long].collect().toSet
    assert(composed == (kept intersect downstream))
    // singletons (everything but maybe 1, 2) always survive soft dedup
    assert((3L to 200L).forall(kept.contains))
  }
}
