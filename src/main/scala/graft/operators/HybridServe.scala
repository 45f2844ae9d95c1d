package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The hybrid-retrieval serving LIFECYCLE as one engine API — the
  * build/save/load/serve packaging of the q117 composition (champion-list
  * lexical index + IVF coarse quantizer + PQ codebooks + cell-partitioned
  * codes, fused by RRF), mirroring how the reference packages a vector
  * collection's lifecycle as a reusable step (collection create/upsert/
  * alias-swap/retire, wurzel/steps/qdrant/step.py:35-283) rather than a
  * recipe the user reassembles by hand.
  *
  * Phases and their scale shapes:
  *  - BUILD (amortized, corpus-sized): one [[Rank.championIndex]] pass over
  *    the text, one [[PqIndex.encodeCells]] map-side pass over the
  *    embeddings; the IVF/PQ models are either caller-fitted
  *    ([[buildWith]]) or fitted here ([[build]]).
  *  - SAVE: all four artifacts persist as parquet. The cells store goes
  *    through [[PqIndex.writeCells]], so the measured one-file-per-cell
  *    layout rule is baked into the writer and cannot be forgotten.
  *    [[saveVersioned]] rides the [[graft.sinks.VersionedTableSink]]
  *    protocol (count-verified manifest commit, atomic alias swap,
  *    retirement of stale versions) so serving artifacts get the same
  *    crash-safe version lifecycle as any other collection.
  *  - LOAD: models come back as bounded driver state (kilobytes); the
  *    index and cells stores stay as lazy DataFrames — a restarted server
  *    never re-fits and never re-reads the corpus.
  *  - SERVE (per query batch): index-only BM25 over the batch vocabulary
  *    ([[Rank.bm25FromIndex]] DataFrame form — one equi-join, no driver
  *    collect), IVF-probed ADC over the cells store
  *    ([[PqIndex.ivfAdcTopK]] — per-query work is cell-bounded and the
  *    partitioned store prunes to the probed cells), RRF fusion
  *    ([[Rank.rrfFuse]]). graft.tools.ScaleCurve measured this serve
  *    phase FLAT across 100x corpus growth.
  */
object HybridServe {

  /** Build-phase knobs. `champM`/`champMinDf`/`lowercase` parameterize the
    * champion index; `ivfK`, `pqM`, `pqKsub`, `iters` parameterize the
    * [[build]] overload's model fits (ignored by [[buildWith]]). */
  final case class BuildConfig(
      champM: Int = 8,
      champMinDf: Long = 1L,
      lowercase: Boolean = true,
      ivfK: Int = 16,
      pqM: Int = 2,
      pqKsub: Int = 16,
      iters: Int = 3)

  /** Serve-phase knobs: per-leg depth, fusion constants, probe width. */
  final case class ServeConfig(
      kTopPerLeg: Int = 20,
      kRrf: Int = 60,
      kTop: Int = 10,
      nprobe: Int = 2,
      k1: Double = 1.2,
      lowercase: Boolean = true)

  /** The complete serving artifact set. `index` and `cells` are frames
    * (persisted stores after [[load]]); `ivf`/`pq` are kilobytes of
    * driver/broadcast model state; `nDocs` is the index's corpus size
    * (idf metadata the index itself cannot carry). */
  final case class Artifacts(
      index: DataFrame,
      nDocs: Long,
      ivf: IvfIndex.Model,
      pq: PqIndex.Model,
      cells: DataFrame)

  /** Build all four artifacts from caller-fitted models — the form the
    * oracle queries use (deterministic models from pinned vectors) and the
    * form a deployment uses when models are fitted on a sample or carried
    * forward from the previous version (the carry-vs-retrain policy on
    * [[PqIndex.encode]]). */
  def buildWith(corpus: DataFrame, docIdCol: String, textCol: String,
                embeddings: DataFrame, vecIdCol: String, vecCol: String,
                ivf: IvfIndex.Model, pq: PqIndex.Model,
                cfg: BuildConfig = BuildConfig()): Artifacts = {
    val index = Rank.championIndex(corpus, docIdCol, textCol,
      m = cfg.champM, minDf = cfg.champMinDf, lowercase = cfg.lowercase)
    val cells = PqIndex.encodeCells(embeddings, vecIdCol, vecCol, ivf, pq)
    Artifacts(index, corpus.count(), ivf, pq, cells)
  }

  /** [[buildWith]] with the models fitted here: IVF centroids via
    * [[IvfIndex.fit]] (deterministic k-means over the quantized
    * embeddings), PQ codebooks via [[PqIndex.fit]]. */
  def build(corpus: DataFrame, docIdCol: String, textCol: String,
            embeddings: DataFrame, vecIdCol: String, vecCol: String,
            cfg: BuildConfig = BuildConfig()): Artifacts = {
    val ivf = IvfIndex.fit(embeddings, vecIdCol, vecCol, cfg.ivfK, cfg.iters)
    val pq = PqIndex.fit(embeddings, vecIdCol, vecCol, cfg.pqM, cfg.pqKsub, cfg.iters)
    buildWith(corpus, docIdCol, textCol, embeddings, vecIdCol, vecCol, ivf, pq, cfg)
  }

  /** Incremental ingest — the reference's upsert analog, composed from
    * the engine's two exact merge paths: the arriving batch indexes
    * ALONE ([[Rank.championIndex]] with minDf 1), merges with the
    * stored index ([[Rank.mergeChampionIndexes]] — bit-identical to a
    * from-scratch build over the union, `validateDisjoint` guards
    * double-counting), and the batch's embeddings encode against the
    * FROZEN models ([[PqIndex.encodeCells]] — encoding is a pure
    * per-row function of the codebook, so appended cells equal a
    * from-scratch encode) and union into the cells frame. Neither the
    * stored corpus text nor the stored embeddings are ever re-read.
    *
    * Exactness requires the stored index to carry UNPRUNED terms
    * (`champMinDf = 1` at build — a term below a higher threshold in
    * each half can cross it in the union); `cfg.champMinDf` applies at
    * the merge instead. Models carry frozen — monitor drift per the
    * carry-vs-retrain policy on [[PqIndex.encode]]; a retrain is a
    * fresh [[build]]. Persist the result with [[saveVersioned]]: the
    * union writes as a NEW version (one file per cell again), the
    * alias swaps, and the previous version retires on schedule. */
  def ingest(a: Artifacts, corpus: DataFrame, docIdCol: String, textCol: String,
             embeddings: DataFrame, vecIdCol: String, vecCol: String,
             cfg: BuildConfig = BuildConfig()): Artifacts = {
    val batchIndex = Rank.championIndex(corpus, docIdCol, textCol,
      m = cfg.champM, minDf = 1L, lowercase = cfg.lowercase)
    val merged = Rank.mergeChampionIndexes(a.index, batchIndex,
      m = cfg.champM, minDf = cfg.champMinDf, validateDisjoint = true)
    val newCells = PqIndex.encodeCells(embeddings, vecIdCol, vecCol, a.ivf, a.pq)
    Artifacts(merged, a.nDocs + corpus.count(), a.ivf, a.pq,
      a.cells.select(col("cid"), col("cell"), col("codes"))
        .unionByName(newCells.select(col("cid"), col("cell"), col("codes"))))
  }

  /** Persist the artifact set under `dir`: `index_store`, `ivf_store`,
    * `pq_store`, `cells_store` (via [[PqIndex.writeCells]] — the
    * one-file-per-cell layout is this writer's contract, not a caller
    * convention) and a 1-row `meta` carrying nDocs. Returns the READ-BACK
    * index + cells row count — [[saveVersioned]]'s verified payload
    * count, summed over both stores so a lexically-empty corpus with
    * valid vectors (or vice versa) still commits; only a genuinely empty
    * artifact set reads as the empty payload the sink refuses to alias. */
  def save(spark: SparkSession, a: Artifacts, dir: String): Long = {
    import spark.implicits._
    a.index.write.mode("overwrite").parquet(s"$dir/index_store")
    IvfIndex.save(spark, a.ivf, s"$dir/ivf_store")
    PqIndex.save(spark, a.pq, s"$dir/pq_store")
    PqIndex.writeCells(a.cells, s"$dir/cells_store")
    Seq(a.nDocs).toDF("n_docs").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
    // an empty store has no files to infer a schema from — that side
    // simply contributes 0 to the verified count
    def readCount(p: String): Long =
      try spark.read.parquet(p).count()
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    readCount(s"$dir/index_store") + readCount(s"$dir/cells_store")
  }

  /** Rehydrate [[Artifacts]] from a [[save]]d directory: the models load
    * into driver state (bounded collects — centroid and codebook rows),
    * the index and cells stores stay lazy parquet scans. A server
    * restarted from this alone ranks bit-identically to the builder
    * (HybridServeSpec pins it). */
  def load(spark: SparkSession, dir: String): Artifacts = {
    import spark.implicits._
    val nDocs = spark.read.parquet(s"$dir/meta")
      .select(col("n_docs")).as[Long].head()
    Artifacts(
      index = spark.read.parquet(s"$dir/index_store"),
      nDocs = nDocs,
      ivf = IvfIndex.load(spark, s"$dir/ivf_store"),
      pq = PqIndex.load(spark, s"$dir/pq_store"),
      cells = spark.read.parquet(s"$dir/cells_store"))
  }

  /** [[save]] as a crash-safe versioned collection: the artifact set
    * writes as `<name>_v{N}` under `root`, commits via the
    * [[graft.sinks.VersionedTableSink]] manifest protocol (the payload
    * count is the index store's verified row count), atomically swaps the
    * `<name>.alias` pointer, and retires versions beyond `historyLen` —
    * the reference's collection create/alias-swap/retire lifecycle
    * (wurzel/steps/qdrant/step.py:224-257, retirement.py). Returns the
    * committed version. */
  def saveVersioned(spark: SparkSession, a: Artifacts, root: String,
                    name: String, historyLen: Int = 10): Int =
    new graft.sinks.VersionedTableSink(root, name, historyLen)
      .writeVia(dir => save(spark, a, dir))

  /** [[load]] through the alias pointer of a [[saveVersioned]] root. */
  def loadCurrent(spark: SparkSession, root: String, name: String): Artifacts = {
    val sink = new graft.sinks.VersionedTableSink(root, name)
    val v = sink.aliasedVersion().getOrElse(
      throw new IllegalStateException(s"no alias for $name under $root"))
    load(spark, sink.versionDir(v))
  }

  /** Serve one query batch against the artifact set. `queries` columns:
    *  - `query_id` — any type; the fused output key.
    *  - `terms` (array<string>, optional column): the lexical leg's query
    *    terms. A null/empty array skips the lexical leg for that query.
    *  - a vector column named by `vecCol` (optional column): the vector
    *    leg's embedding. Null skips the vector leg for that query.
    *  - `exclude_id` (optional column, candidate-id-typed): a candidate to
    *    drop from that query's vector leg (self-exclusion for
    *    more-like-this queries whose vector IS a corpus member). Null
    *    excludes nothing.
    * Both legs rank to `kTopPerLeg`, then RRF fuses to `kTop`:
    * (query_id, doc_id, rank, rrf_micro, n_sources). Everything is one
    * batch-sized plan — no driver collect, no corpus scan: the lexical
    * leg joins the batch vocabulary against the index store, the vector
    * leg equi-joins probed cell ids against the cells store (partition
    * pruning does the rest). */
  def serve(a: Artifacts, queries: DataFrame, vecCol: String = "embedding",
            cfg: ServeConfig = ServeConfig()): DataFrame = {
    val cols = queries.columns.toSet
    require(cols.contains("query_id"), "serve: queries needs a query_id column")
    require(cols.contains("terms") || cols.contains(vecCol),
      s"serve: queries needs a terms and/or $vecCol column")
    val legs = Seq.newBuilder[DataFrame]
    if (cols.contains("terms")) {
      // explode drops null/empty term arrays — those queries simply have
      // no lexical leg, the serving contract (not an error)
      val lexQ = queries.select(col("query_id"), explode(col("terms")).as("term"))
      legs += Rank.bm25FromIndex(a.index, a.nDocs, lexQ,
          cfg.kTopPerLeg, cfg.k1, cfg.lowercase)
        .select(col("query_id"), col("id").as("doc_id"), col("rank"))
    }
    if (cols.contains(vecCol)) {
      // ALWAYS serve through the typed-exclusion path: query ids here
      // are fused output keys (often strings), not candidate ids, so the
      // qid =!= cid default would cross-type-cast and (under ANSI) throw
      // — a missing exclude_id means "exclude nothing" (NULL never
      // null-safe-equals any candidate id)
      val vecQ0 = queries.filter(col(vecCol).isNotNull)
      val vecQ = if (cols.contains("exclude_id")) vecQ0
                 else vecQ0.withColumn("exclude_id", lit(null))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("adist").asc, col("cid").asc)
      legs += PqIndex.ivfAdcTopK(a.cells, vecQ, "query_id", vecCol,
          a.ivf, a.pq, cfg.kTopPerLeg, cfg.nprobe, Some("exclude_id"))
        .withColumn("rank", row_number().over(w))
        .select(col("qid").as("query_id"), col("cid").as("doc_id"), col("rank"))
    }
    Rank.rrfFuse(legs.result(), cfg.kRrf, cfg.kTop)
  }
}
