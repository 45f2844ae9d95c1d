package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The q115 capstone contract: once the champion index and the PQ codes are
  * persisted, serving (index-only BM25 + ADC over codes + RRF fusion) must
  * never read the corpus again — the steady-state 100 TB shape where build
  * cost amortizes and query latency is bounded by index size. The value
  * path is oracle-checked by q115; this spec pins the PLAN: every file scan
  * in the serving query belongs to the stored index or the stored codes,
  * and neither the documents nor the embeddings table appears. */
class HybridServeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark join spark agg"),
    (2L, "spark scan"),
    (3L, "filter scan scan scan"),
    (4L, "window batch stream stream")
  ).toDF("doc_id", "text")

  // 4-dim embeddings, 2 subspaces x 2 dims; ids align with doc ids
  private def embeddings = Seq(
    (1L, Array(1.0f, 0.1f, 0.0f, 0.2f)),
    (2L, Array(0.9f, 0.2f, 0.1f, 0.1f)),
    (3L, Array(0.0f, 1.0f, 0.8f, 0.0f)),
    (4L, Array(0.1f, 0.9f, 1.0f, 0.1f))
  ).toDF("vec_id", "embedding")

  test("serving plan scans ONLY the persisted index and codes — never the corpus tables") {
    val root = java.nio.file.Files.createTempDirectory("graft_hybrid_serve").toString
    try {
      // the "tables": corpus text + corpus embeddings, as parquet
      corpus.write.parquet(s"$root/docs_tbl")
      embeddings.write.parquet(s"$root/emb_tbl")
      val docsT = spark.read.parquet(s"$root/docs_tbl")
      val embT = spark.read.parquet(s"$root/emb_tbl")

      // BUILD phase (amortized): champion index + PQ codebooks + codes
      val subDim = 2
      val books = (0 until 2).map { j =>
        embT.filter($"vec_id" < 3).orderBy($"vec_id")
          .select(slice(
            graft.functions.Kernels.quantNormUdf($"embedding").getField("_1"),
            j * subDim + 1, subDim).as("sv"))
          .as[Seq[Long]].collect().map(_.toArray)
      }.toArray
      val pq = PqIndex.Model(books)
      Rank.championIndex(docsT, "doc_id", "text", m = 8)
        .write.parquet(s"$root/index_store")
      PqIndex.encode(embT, "vec_id", "embedding", pq)
        .withColumnRenamed("vec_id", "cid")
        .write.parquet(s"$root/codes_store")

      // SERVE phase: stored artifacts + client-supplied queries only (the
      // query vectors arrive as a local relation, not a table scan)
      val savedIndex = spark.read.parquet(s"$root/index_store")
      val savedCodes = spark.read.parquet(s"$root/codes_store")
      val qvec = Seq(
        (0L, Array(1.0f, 0.1f, 0.1f, 0.1f)),
        (1L, Array(0.0f, 1.0f, 0.9f, 0.0f))
      ).toDF("vec_id", "embedding")
      val lex = Rank.bm25FromIndex(savedIndex, nDocs = 4L,
          Map("qa" -> Seq("spark"), "qb" -> Seq("scan")), kTop = 3)
        .select($"query_id", $"id".as("doc_id"), $"rank")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"adist".asc, $"cid".asc)
      val vec = PqIndex.adcTopKEncoded(savedCodes, qvec, "vec_id", "embedding", pq, kTop = 3)
        .withColumn("rank", row_number().over(w))
        .select(when($"qid" === 0, "qa").otherwise("qb").as("query_id"),
          $"cid".as("doc_id"), $"rank")
      val fused = Rank.rrfFuse(Seq(lex, vec), kRrf = 60, kTop = 3)

      // serving works: both sources fuse, ranks are contiguous per query
      val rows = fused.select($"query_id", $"doc_id", $"rank", $"n_sources")
        .as[(String, Long, Int, Long)].collect()
      assert(rows.nonEmpty)
      assert(rows.groupBy(_._1).forall { case (_, rs) =>
        rs.map(_._3).sorted.toSeq == (1 to rs.length) })
      assert(rows.exists(_._4 == 2L)) // at least one doc found by BOTH paths

      // THE capstone assertion: every file scan is index or codes; the
      // corpus tables are absent from the serving plan
      val scanPaths = fused.queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec => f.relation.location.rootPaths.map(_.toString)
      }.flatten
      assert(scanPaths.nonEmpty)
      assert(scanPaths.forall(p =>
        p.contains("index_store") || p.contains("codes_store")), scanPaths.toString)
      assert(!scanPaths.exists(p => p.contains("docs_tbl") || p.contains("emb_tbl")))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("IVF-probed serving (q117 shape): cells store partitioned by cell, scan pruned to probed cells, no corpus scans") {
    val root = java.nio.file.Files.createTempDirectory("graft_hybrid_ivf").toString
    try {
      corpus.write.parquet(s"$root/docs_tbl")
      embeddings.write.parquet(s"$root/emb_tbl")
      val docsT = spark.read.parquet(s"$root/docs_tbl")
      val embT = spark.read.parquet(s"$root/emb_tbl")

      // BUILD phase: champion index + IVF centroids + PQ codebooks +
      // per-cell codes, the codes store partitioned BY CELL — the layout
      // that lets probing prune whole partitions
      val subDim = 2
      val qv2 = embT.filter($"vec_id" < 3).orderBy($"vec_id")
        .select(graft.functions.Kernels.quantNormUdf($"embedding").getField("_1").as("qv"))
        .as[Seq[Long]].collect().map(_.toArray)
      val ivf = IvfIndex.Model(qv2)
      val pq = PqIndex.Model(
        (0 until 2).map(j => qv2.map(v =>
          java.util.Arrays.copyOfRange(v, j * subDim, (j + 1) * subDim))).toArray)
      Rank.championIndex(docsT, "doc_id", "text", m = 8)
        .write.parquet(s"$root/index_store")
      // repartition by cell first — the one-file-per-cell layout rule
      // (PqIndex.encodeCells scaladoc; ScaleCurve measures why)
      PqIndex.encodeCells(embT, "vec_id", "embedding", ivf, pq)
        .repartition(col("cell"))
        .write.partitionBy("cell").parquet(s"$root/cells_store")

      // SERVE phase: stored artifacts + client-supplied query vectors
      val savedIndex = spark.read.parquet(s"$root/index_store")
      val savedCells = spark.read.parquet(s"$root/cells_store")
      val qvec = Seq(
        (0L, Array(1.0f, 0.1f, 0.1f, 0.1f)),
        (1L, Array(0.0f, 1.0f, 0.9f, 0.0f))
      ).toDF("vec_id", "embedding")
      val lex = Rank.bm25FromIndex(savedIndex, nDocs = 4L,
          Map("qa" -> Seq("spark"), "qb" -> Seq("scan")), kTop = 3)
        .select($"query_id", $"id".as("doc_id"), $"rank")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"adist".asc, $"cid".asc)
      val probed = PqIndex.ivfAdcTopK(savedCells, qvec, "vec_id", "embedding",
        ivf, pq, kTop = 3, nprobe = 1)
      val vec = probed
        .withColumn("rank", row_number().over(w))
        .select(when($"qid" === 0, "qa").otherwise("qb").as("query_id"),
          $"cid".as("doc_id"), $"rank")
      val fused = Rank.rrfFuse(Seq(lex, vec), kRrf = 60, kTop = 3)

      // serving works and the probe is cell-bounded: with nprobe=1 each
      // query scores only members of its own nearest cell
      val rows = fused.select($"query_id", $"doc_id", $"rank", $"n_sources")
        .as[(String, Long, Int, Long)].collect()
      assert(rows.nonEmpty)
      val probedPairs = probed.select($"qid", $"cid").as[(Long, Long)].collect().toSet
      val cellOf = PqIndex.encodeCells(embT, "vec_id", "embedding", ivf, pq)
        .select($"cid", $"cell").as[(Long, Int)].collect().toMap
      val qCell = Map(0L -> IvfIndex.nearest(
          graft.functions.Kernels.quantizeVec(Array(1.0f, 0.1f, 0.1f, 0.1f)), qv2),
        1L -> IvfIndex.nearest(
          graft.functions.Kernels.quantizeVec(Array(0.0f, 1.0f, 0.9f, 0.0f)), qv2))
      assert(probedPairs.nonEmpty)
      assert(probedPairs.forall { case (q, c) => cellOf(c) == qCell(q) })

      // plan: only index + cells stores are scanned (corpus absent), and
      // the cells scan carries a partition filter on the probed cell ids —
      // Spark's dynamic partition pruning from the broadcast query side
      val scans = fused.queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec => f
      }
      val scanPaths = scans.flatMap(_.relation.location.rootPaths.map(_.toString))
      assert(scanPaths.nonEmpty)
      assert(scanPaths.forall(p =>
        p.contains("index_store") || p.contains("cells_store")), scanPaths.toString)
      assert(!scanPaths.exists(p => p.contains("docs_tbl") || p.contains("emb_tbl")))
      val cellScans = scans.filter(
        _.relation.location.rootPaths.exists(_.toString.contains("cells_store")))
      assert(cellScans.nonEmpty)
      assert(cellScans.forall(_.partitionFilters.nonEmpty),
        cellScans.map(_.partitionFilters).toString)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("PQ codebooks round-trip through parquet; a restarted server ranks bit-identically from loaded artifacts alone") {
    // The q117 artifact-set completeness check: lexical index, IVF
    // centroids, PQ codebooks, and per-cell codes are ALL persistable, so
    // a restarted serving job loads the four stores and never re-fits.
    val root = java.nio.file.Files.createTempDirectory("graft_pq_roundtrip").toString
    try {
      val embT = embeddings
      val subDim = 2
      val qv2 = embT.filter($"vec_id" < 3).orderBy($"vec_id")
        .select(graft.functions.Kernels.quantNormUdf($"embedding").getField("_1").as("qv"))
        .as[Seq[Long]].collect().map(_.toArray)
      val ivf = IvfIndex.Model(qv2)
      val pq = PqIndex.Model(
        (0 until 2).map(j => qv2.map(v =>
          java.util.Arrays.copyOfRange(v, j * subDim, (j + 1) * subDim))).toArray)

      // BUILD: persist every serving artifact
      IvfIndex.save(spark, ivf, s"$root/ivf_store")
      PqIndex.save(spark, pq, s"$root/pq_store")
      // repartition by cell first — the one-file-per-cell layout rule
      // (PqIndex.encodeCells scaladoc; ScaleCurve measures why)
      PqIndex.encodeCells(embT, "vec_id", "embedding", ivf, pq)
        .repartition(col("cell"))
        .write.partitionBy("cell").parquet(s"$root/cells_store")

      // RESTART: models come back from parquet structurally identical
      val ivf2 = IvfIndex.load(spark, s"$root/ivf_store")
      val pq2 = PqIndex.load(spark, s"$root/pq_store")
      assert(pq2.m == pq.m && pq2.ksub == pq.ksub && pq2.subDim == pq.subDim)
      for (j <- 0 until pq.m; c <- 0 until pq.ksub)
        assert(pq2.codebooks(j)(c).toSeq == pq.codebooks(j)(c).toSeq, s"codebook ($j,$c) moved")

      // and serve BIT-IDENTICAL rankings from only the loaded artifacts
      val savedCells = spark.read.parquet(s"$root/cells_store")
      val qvec = Seq(
        (0L, Array(1.0f, 0.1f, 0.1f, 0.1f)),
        (1L, Array(0.0f, 1.0f, 0.9f, 0.0f))
      ).toDF("vec_id", "embedding")
      def rank(iv: IvfIndex.Model, p: PqIndex.Model): Seq[(Long, Long, Long)] =
        PqIndex.ivfAdcTopK(savedCells, qvec, "vec_id", "embedding", iv, p,
            kTop = 3, nprobe = 1)
          .select($"qid", $"cid", $"adist").as[(Long, Long, Long)]
          .collect().sortBy(r => (r._1, r._3, r._2)).toSeq
      val fresh = rank(ivf, pq)
      val restarted = rank(ivf2, pq2)
      assert(fresh.nonEmpty)
      assert(restarted == fresh, s"restarted ranking diverged:\n$restarted\nvs\n$fresh")

      // encoding with the loaded model is also bit-identical (the codes
      // store stays valid across restarts)
      val codesA = PqIndex.encode(embT, "vec_id", "embedding", pq)
        .as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq
      val codesB = PqIndex.encode(embT, "vec_id", "embedding", pq2)
        .as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq
      assert(codesA == codesB)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }
}
