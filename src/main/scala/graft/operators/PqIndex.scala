package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Kernels

/** Product quantization for billion-scale ANN (SURVEY.md §2.8 D5 scale
  * path; Jégou et al. 2011, the IVF-PQ layout every large vector store
  * uses): the vector splits into `m` equal sub-spaces, each sub-space gets
  * its own `ksub`-entry codebook (deterministic k-means, reusing the IVF
  * machinery), and a vector compresses to `m` small codes — 64 float dims
  * become 2-8 bytes, the difference between holding 100 TB of raw vectors
  * and holding the codes in executor memory.
  *
  * Query scoring is asymmetric distance computation (ADC): ONE m x ksub
  * table of exact sub-space distances per query, then every candidate
  * costs m table lookups — no per-pair vector arithmetic. All integer
  * (quantized sub-vectors, exact squared distances), so ranking is
  * deterministic and a DuckDB oracle reproduces it bit-for-bit.
  *
  * Scale shape: codebooks are m x ksub x (dim/m) longs of driver/broadcast
  * state (kilobytes); encoding is one map-side UDF pass; the ADC join
  * broadcasts queries+tables over the code column and ranks through the
  * GroupTopKExec bounded heaps — partial heaps prune each partition to
  * kTop rows per query BEFORE the exchange.
  */
object PqIndex {

  /** m sub-space codebooks, each ksub x (dim/m). */
  final case class Model(codebooks: Array[Array[Array[Long]]]) extends Serializable {
    def m: Int = codebooks.length
    def ksub: Int = codebooks(0).length
    def subDim: Int = codebooks(0)(0).length
  }

  /** Persist the fitted codebooks — (subspace, code, centroid) rows, the
    * same artifact protocol as IvfIndex.save — so the q117 serving set
    * (lexical index, IVF centroids, PQ codebooks, per-cell codes) is fully
    * persistable: a restarted serving job loads everything and never
    * re-`fit`s. m x ksub rows of subDim longs = kilobytes. */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    (for {
      j <- model.codebooks.indices
      c <- model.codebooks(j).indices
    } yield (j, c, model.codebooks(j)(c).toSeq))
      .toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(col("subspace"), col("code"), col("centroid"))
      .as[(Int, Int, Seq[Long])].collect() // m x ksub rows — bounded
    require(rows.nonEmpty, s"no PQ model at $path")
    // fail fast at the driver, like IvfIndex.load: ragged or non-dense
    // codebooks would otherwise surface as executor ArrayIndexOutOfBounds
    // (or silently wrong codes) inside encodeVec/adcTable
    val bySub = rows.groupBy(_._1)
    require(bySub.keys.toSeq.sorted == bySub.keys.toSeq.indices.toSeq,
      s"non-dense subspace ids at $path: ${bySub.keys.toSeq.sorted}")
    val books = bySub.toSeq.sortBy(_._1).map { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      require(sorted.map(_._2).toSeq == sorted.indices.toSeq,
        s"non-dense code ids at $path")
      sorted.map(_._3.toArray).toArray
    }.toArray
    require(books.map(_.length).distinct.length == 1,
      s"subspaces disagree on ksub at $path: ${books.map(_.length).toSeq}")
    require(books.flatMap(_.map(_.length)).distinct.length == 1,
      s"ragged centroid dimensions at $path")
    Model(books)
  }

  private def subSlice(qv: Array[Long], j: Int, subDim: Int): Array[Long] =
    java.util.Arrays.copyOfRange(qv, j * subDim, (j + 1) * subDim)

  /** Train per-sub-space codebooks with the IVF deterministic k-means.
    * Fails fast on the opaque-failure corpus shapes: empty input, ragged
    * dimensions (which would silently zero-pad codes downstream), fewer
    * rows than ksub (which would silently shrink the codebook). */
  def fit(df: DataFrame, idCol: String, vecCol: String,
          m: Int, ksub: Int, iters: Int = 3): Model = {
    require(m >= 1 && ksub >= 1, s"m=$m ksub=$ksub must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val q = df.select(col(idCol).as("id"),
        Kernels.quantNormUdf(col(vecCol)).getField("_1").as("fullqv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dims = q.select(size(col("fullqv")).as("d")).distinct()
        .as[Option[Int]].collect().toSeq
      require(!dims.contains(None),
        "corpus contains null vectors — filter null embeddings before fit")
      val flat = dims.flatten.sorted
      require(flat.nonEmpty, "PqIndex.fit on an empty corpus")
      require(flat.length == 1, s"ragged vector dimensions: $flat")
      val dim = flat.head
      require(dim % m == 0, s"dim $dim must divide into m=$m sub-spaces")
      val subDim = dim / m
      // ONE seed-rank pass: the md5 rank is over ids, so every sub-space
      // shares the same seed rows — slice them instead of re-ranking m
      // times.
      val seedRows = q
        .withColumn("rk", Kernels.md5RankUdf(col("id").cast("string")))
        .orderBy(col("rk"), col("id"))
        .limit(ksub)
        .select("fullqv").collect().map(_.getSeq[Long](0).toArray)
      require(seedRows.length >= ksub,
        s"corpus has ${seedRows.length} rows < ksub=$ksub")
      // FUSED Lloyd (round 12; previously m-way sequential — m * iters
      // cached scans): each iteration is ONE distributed pass updating
      // all m codebooks at once. Per row, one UDF call assigns every
      // sub-space its nearest codeword; posexplode over the full vector
      // derives (sub-space, within-sub position) from the flat position,
      // and one hash agg produces the per-(sub-space, cell, pos) exact
      // integer partials — m x ksub x subDim = dim x ksub rows, a
      // bounded driver collect. The per-sub-space arithmetic (nearest
      // by lowest-(dist, id), integer-division centroid update, empty
      // cells keep their previous centroid) is IvfIndex.lloyd's exactly,
      // and each sub-space's assignment depends only on its own
      // codebook, so the fused fit is bit-identical to the sequential
      // one (FitBench checksums pin it: iters passes instead of
      // m x iters — 2x wall at m=4 to 9x at m=16 on the 50k smoke).
      var books = (0 until m).map(j => seedRows.map(subSlice(_, j, subDim))).toArray
      var it = 0
      while (it < iters) {
        val bc = spark.sparkContext.broadcast(books)
        val assignAll = udf((qv: Array[Long]) => {
          val b = bc.value
          Array.tabulate(b.length)(j =>
            IvfIndex.nearest(subSlice(qv, j, b(j)(0).length), b(j)))
        })
        val jCol = (col("gpos") / lit(subDim)).cast("int")
        val partials = q
          .withColumn("cells", assignAll(col("fullqv")))
          .select(col("cells"), posexplode(col("fullqv")).as(Seq("gpos", "v")))
          .select(jCol.as("j"), (col("gpos") % lit(subDim)).cast("int").as("pos"),
            element_at(col("cells"), jCol + lit(1)).as("cell"), col("v"))
          .groupBy(col("j"), col("cell"), col("pos"))
          .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
          .collect()
        val next = books.map(_.map(_.clone()))
        val touched = scala.collection.mutable.HashSet.empty[(Int, Int)]
        partials.foreach { r =>
          val (j, cell, pos) = (r.getInt(0), r.getInt(1), r.getInt(2))
          if (touched.add((j, cell))) next(j)(cell) = new Array[Long](subDim)
          next(j)(cell)(pos) = r.getLong(3) / r.getLong(4) // int div: exact, deterministic
        }
        books = next
        it += 1
      }
      Model(books)
    } finally { q.unpersist(); () }
  }

  /** Per-sub-space nearest-codeword ids (lowest-id tiebreak — the same
    * argmin contract as IvfIndex.nearest). */
  def encodeVec(qv: Array[Long], model: Model): Array[Int] = {
    require(qv != null, "null vector — filter null embeddings before encoding")
    require(qv.length == model.m * model.subDim,
      s"vector dim ${qv.length} != model dim ${model.m * model.subDim}")
    val out = new Array[Int](model.m)
    var j = 0
    while (j < model.m) {
      out(j) = IvfIndex.nearest(subSlice(qv, j, model.subDim), model.codebooks(j))
      j += 1
    }
    out
  }

  /** Compress every row to its m codes: (idCol, codes).
    *
    * INCREMENTAL MAINTENANCE (the ANN mirror of the champion-index
    * ingest story): encoding is a pure per-row function of the FROZEN
    * codebook, so arrivals can be encoded alone and appended to the
    * stored codes — appended == from-scratch encode of everything, bit
    * for bit (StreamingSpec pins it through the versioned sink). What
    * drifts is the MODEL: a codebook trained on yesterday's distribution
    * quantizes tomorrow's vectors with growing reconstruction error, so
    * the carry-vs-retrain policy mirrors [[Rank.championIndexImpact]]'s
    * avgdl note — monitor mean ADC self-distance (a candidate's distance
    * to its own codes, 0 for a perfect codebook) on a sample of
    * arrivals; CARRY while it holds near the training-time figure,
    * RETRAIN the codebook and re-encode when it degrades past the
    * deployment's recall tolerance. A retrain is the same `fit`; codes
    * re-encode in one map-side pass. */
  def encode(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame =
    encodeWith(df, idCol, vecCol,
      df.sparkSession.sparkContext.broadcast(model))

  private def encodeWith(df: DataFrame, idCol: String, vecCol: String,
      bc: org.apache.spark.broadcast.Broadcast[Model]): DataFrame = {
    val enc = udf((qv: Array[Long]) => encodeVec(qv, bc.value))
    df.select(col(idCol),
        Kernels.quantNormUdf(col(vecCol)).getField("_1").as("__qv"))
      .select(col(idCol), enc(col("__qv")).as("codes"))
  }

  /** The per-query ADC lookup table: table(j)(c) = exact squared distance
    * from the query's j-th sub-vector to codeword c. */
  def adcTable(qv: Array[Long], model: Model): Array[Array[Long]] = {
    val t = Array.ofDim[Long](model.m, model.ksub)
    var j = 0
    while (j < model.m) {
      val sub = subSlice(qv, j, model.subDim)
      var c = 0
      while (c < model.ksub) {
        var s = 0L
        var i = 0
        val cw = model.codebooks(j)(c)
        while (i < cw.length) { val d = sub(i) - cw(i); s += d * d; i += 1 }
        t(j)(c) = s
        c += 1
      }
      j += 1
    }
    t
  }

  /** The ADC scoring pieces, shared by the flat and IVF-probed serving
    * paths so the lookup semantics can never diverge. The per-query table
    * is a UDF (one call per QUERY — negligible); the per-candidate lookup
    * is a native codegen Expression (plans/AdcLookupExpr — it runs once
    * per scored pair, and the boxed-UDF form measurably dominated ADC). */
  private def tableUdfFor(
      bc: org.apache.spark.broadcast.Broadcast[Model]) =
    udf((qv: Array[Long]) => adcTable(qv, bc.value))

  private def lookupCol(table: org.apache.spark.sql.Column,
                        codes: org.apache.spark.sql.Column) =
    graft.plans.AdcLookupExpr.adcLookup(table, codes)

  /** ADC top-k over PRE-ENCODED candidates — the serving path: encode the
    * corpus once (`encode`, persist the (cid, codes) frame), then every
    * query batch scores against the executor-resident codes with m integer
    * lookups per candidate and never touches a raw vector. `codes` must
    * have columns (cid, codes). Output: per query, the kTop candidates
    * ascending (adist, cid) — fully deterministic. */
  def adcTopKEncoded(codes: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, model: Model, kTop: Int): DataFrame = {
    val spark = codes.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val q = queries.select(col(idCol).as("qid"),
        Kernels.quantNormUdf(col(vecCol)).getField("_1").as("__qv"))
      .select(col("qid"), tableUdfFor(bc)(col("__qv")).as("__t"))
    // every candidate scores against every query — by DESIGN: ADC's point
    // is that the "scan" costs m integer lookups per (query, candidate),
    // over codes already in memory. For corpus-scale serving, compose with
    // IvfIndex: probe cells first, ADC-rank only the probed members.
    val scored = codes.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), lookupCol(col("__t"), col("codes")).as("adist"))
    graft.plans.GroupTopK.topK(scored, Seq("qid"),
      Seq(col("adist").asc, col("cid").asc), kTop)
  }

  /** One-shot convenience: encode + ADC in a single call. Prefer
    * `encode` once + `adcTopKEncoded` per batch for serving — this form
    * re-encodes the candidate corpus on every invocation. */
  def adcTopK(cands: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              model: Model, kTop: Int): DataFrame =
    adcTopKEncoded(
      encode(cands, idCol, vecCol, model).withColumnRenamed(idCol, "cid"),
      queries, idCol, vecCol, model, kTop)

  /** The full IVF-PQ layout: the coarse quantizer restricts each query to
    * its `nprobe` nearest cells' members (an equi-join on the cell id —
    * the candidate set shrinks by ~k/nprobe), then ADC ranks the probed
    * members by table lookups. This is THE billion-scale serving shape:
    * no cross join, no raw-vector arithmetic per candidate, and both
    * models are kilobytes of broadcast state. `encodedCells` must carry
    * (cell, cid, codes) — build it once with [[encodeCells]], persist,
    * serve every batch. */
  def ivfAdcTopK(encodedCells: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, ivf: IvfIndex.Model, pq: Model,
                 kTop: Int, nprobe: Int = 2,
                 excludeIdCol: Option[String] = None): DataFrame = {
    val spark = encodedCells.sparkSession
    val bcIvf = spark.sparkContext.broadcast(ivf.centroids)
    val bcPq = spark.sparkContext.broadcast(pq)
    val probesUdf = udf((qv: Array[Long]) => IvfIndex.nearestN(qv, bcIvf.value, nprobe))
    // Self-exclusion: when query ids ARE candidate ids (near-dup probes,
    // more-like-this), qid =!= cid drops the trivial self match. When query
    // ids live in a different key space (e.g. HybridServe's string
    // query_ids over long candidate ids — where a cross-type =!= would
    // null out and drop EVERYTHING), the caller names a typed
    // `excludeIdCol` in the queries frame instead: candidates equal to
    // that value drop, a NULL exclusion keeps all (null-safe <=>).
    val exclSel = excludeIdCol.map(c => col(c).as("__excl")).toSeq
    val q = queries.select(col(idCol).as("qid") +:
        Kernels.quantNormUdf(col(vecCol)).getField("_1").as("__qv") +: exclSel: _*)
      .select(col("qid") +: tableUdfFor(bcPq)(col("__qv")).as("__t") +:
        explode(probesUdf(col("__qv"))).as("cell") +: exclSel.map(_ => col("__excl")): _*)
    // no distinct needed: encodeCells assigns each candidate exactly ONE
    // cell and nearestN's probes are distinct, so (qid, cid) pairs are
    // already unique — the partial heaps prune straight to the exchange
    val keep = if (excludeIdCol.isDefined) !(col("cid") <=> col("__excl"))
               else col("qid") =!= col("cid")
    val scored = encodedCells.join(broadcast(q), Seq("cell"))
      .filter(keep)
      .select(col("qid"), col("cid"), lookupCol(col("__t"), col("codes")).as("adist"))
    graft.plans.GroupTopK.topK(scored, Seq("qid"),
      Seq(col("adist").asc, col("cid").asc), kTop)
  }

  /** Build the serving frame for [[ivfAdcTopK]]: every candidate's coarse
    * cell plus its PQ codes — one map-side pass, persist and reuse.
    *
    * Persist with [[writeCells]], which bakes in the one-file-per-cell
    * layout; see its scaladoc for why a bare `write.partitionBy("cell")`
    * is a measured 24x serve-time trap. */
  def encodeCells(cands: DataFrame, idCol: String, vecCol: String,
                  ivf: IvfIndex.Model, pq: Model): DataFrame = {
    val spark = cands.sparkSession
    val bcIvf = spark.sparkContext.broadcast(ivf.centroids)
    val bcPq = spark.sparkContext.broadcast(pq)
    val cellUdf = udf((qv: Array[Long]) => IvfIndex.nearest(qv, bcIvf.value))
    val encUdf = udf((qv: Array[Long]) => encodeVec(qv, bcPq.value))
    cands.select(col(idCol).as("cid"),
        Kernels.quantNormUdf(col(vecCol)).getField("_1").as("__qv"))
      .select(col("cid"), cellUdf(col("__qv")).as("cell"),
        encUdf(col("__qv")).as("codes"))
  }

  /** THE writer for the persisted cells store — the layout rule as API,
    * not documentation: `repartition(col("cell"))` BEFORE
    * `write.partitionBy("cell")`. Without the repartition every upstream
    * task writes a file into every cell directory (tasks x cells tiny
    * files — ~100k at a 1600-cell corpus), and serve-time scans pay
    * per-file open/footer costs even under partition pruning;
    * graft.tools.ScaleCurve measured the difference at 24x serve time and
    * 16x build time at the 100x corpus point. With it, each cell's rows
    * land in exactly one shuffle partition, so each cell directory holds
    * exactly one file and a probed serve touches nprobe files per query.
    * HybridServeSpec asserts the one-file-per-cell invariant on this
    * writer's own output. */
  def writeCells(cells: DataFrame, path: String,
                 mode: String = "overwrite"): Unit =
    cells.repartition(col("cell"))
      .write.mode(mode).partitionBy("cell").parquet(path)
}
