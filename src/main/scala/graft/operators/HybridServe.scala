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

  /** Serve-phase knobs: per-leg depth, fusion constants, probe width.
    * `lowercase` must agree with the index's build-time setting —
    * lowercasing query terms against a mixed-case index (or vice versa)
    * would silently empty the lexical leg, so [[serve]] validates it
    * against the persisted [[BuildConfig]]. */
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
    * (idf metadata the index itself cannot carry); `build` is the
    * [[BuildConfig]] the index was built with — persisted in the meta
    * store by [[save]] and restored by [[load]], so the mutation paths
    * ([[ingest]], [[remove]], [[upsert]]) can ENFORCE their exactness
    * preconditions on a loaded store instead of trusting the caller to
    * remember how it was built, and [[serve]] can reject a query-term
    * normalization that disagrees with the index's. */
  final case class Artifacts(
      index: DataFrame,
      nDocs: Long,
      ivf: IvfIndex.Model,
      pq: PqIndex.Model,
      cells: DataFrame,
      build: BuildConfig = BuildConfig())

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
    Artifacts(index, corpus.count(), ivf, pq, cells, cfg)
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

  /** The mutation paths' shared exactness precondition, ENFORCED (not
    * convention): the stored index must carry UNPRUNED terms
    * (`champMinDf = 1` at build) — a term below a higher threshold in
    * each half can cross it in a merged union, and a pruned term's
    * df/cf are unrecoverable at subtraction time. The [[BuildConfig]]
    * travels inside [[Artifacts]] and the meta store, so a LOADED
    * store is checked too — a minDf-50 build fails here loudly instead
    * of merging silently-approximately. */
  private def requireMergeable(a: Artifacts, op: String): Unit =
    require(a.build.champMinDf == 1L,
      s"$op: the stored index was built with champMinDf = ${a.build.champMinDf}; " +
        "exact incremental maintenance requires champMinDf = 1 (unpruned terms — " +
        "a pruned term's postings and df/cf cannot be reconstructed). Either " +
        "rebuild once with champMinDf = 1 and carry forward from there, or stay " +
        "on the full-rebuild-per-version path (build + saveVersioned).")

  /** Incremental ingest — the reference's upsert-create analog, composed
    * from the engine's two exact merge paths: the arriving batch indexes
    * ALONE ([[Rank.championIndex]] with minDf 1), merges with the
    * stored index ([[Rank.mergeChampionIndexes]] — bit-identical to a
    * from-scratch build over the union, `validateDisjoint` guards
    * double-counting), and the batch's embeddings encode against the
    * FROZEN models ([[PqIndex.encodeCells]] — encoding is a pure
    * per-row function of the codebook, so appended cells equal a
    * from-scratch encode) and union into the cells frame. Neither the
    * stored corpus text nor the stored embeddings are ever re-read.
    *
    * All knobs come from `a.build` (the config the stored index was
    * actually built with — persisted by [[save]]), and the stored index
    * must satisfy [[requireMergeable]]; the merged index stays minDf-1
    * so the NEXT ingest is exact too. Models carry frozen — monitor
    * drift per the carry-vs-retrain policy on [[PqIndex.encode]]; a
    * retrain is a fresh [[build]]. Persist the result with
    * [[saveVersioned]]: the union writes as a NEW version (one file per
    * cell again), the alias swaps, and the previous version retires on
    * schedule. */
  def ingest(a: Artifacts, corpus: DataFrame, docIdCol: String, textCol: String,
             embeddings: DataFrame, vecIdCol: String, vecCol: String): Artifacts = {
    requireMergeable(a, "ingest")
    // ONE guard job doubling as the nDocs count: the batch's ids probe the
    // CELLS store — the serving set's membership roster (exactly one row
    // per stored candidate, the same table [[remove]] validates against) —
    // instead of mergeChampionIndexes' index-side validateDisjoint, which
    // would re-derive the stored champion census just to read its ids.
    // An overlap would silently double-count df/cf in the merge, so it
    // fails fast here.
    val probe = corpus.select(col(docIdCol).as("__bid"))
      .join(a.cells.select(col("cid").as("__bid"), lit(1).as("__hit")),
        Seq("__bid"), "left")
      .agg(count(lit(1)).as("n"), count(col("__hit")).as("overlap")).head()
    require(probe.getLong(1) == 0,
      "ingest: batch contains ids already in the stored serving set — corpora " +
        "must be disjoint (updating a stored doc is upsert: remove, then ingest)")
    val batchIndex = Rank.championIndex(corpus, docIdCol, textCol,
      m = a.build.champM, minDf = 1L, lowercase = a.build.lowercase)
    val merged = Rank.mergeChampionIndexes(a.index, batchIndex,
      m = a.build.champM, minDf = 1L)
    val newCells = PqIndex.encodeCells(embeddings, vecIdCol, vecCol, a.ivf, a.pq)
    Artifacts(merged, a.nDocs + probe.getLong(0), a.ivf, a.pq,
      a.cells.select(col("cid"), col("cell"), col("codes"))
        .unionByName(newCells.select(col("cid"), col("cell"), col("codes"))),
      a.build)
  }

  /** Document removal — the reference's prune-stale analog
    * (wurzel/steps/wonderful/step.py:207-230 deletes the stale set-diff
    * every run; elevenlabs/step.py:167-230 deletes before re-upload):
    * drop `stale` documents from the serving set WITHOUT rebuilding or
    * re-reading the surviving corpus. `stale` must be the stale rows AS
    * STORED (id + the text that was indexed — in the reference pipeline
    * shape these come from the previous corpus version, which is exactly
    * what a prune-stale set-diff holds).
    *
    * What removal does, and how exact it is:
    *  - VECTOR leg: fully exact. The cells store holds EVERY candidate's
    *    codes, so an anti-join on the stale ids leaves precisely the
    *    surviving corpus's from-scratch encoding.
    *  - LEXICAL stats: fully exact. The stale batch re-indexes alone
    *    (one pass over the stale rows, never the survivors) and its
    *    per-term (df, cf) subtract from the stored stats; nDocs
    *    decrements — so serve-time idf equals a from-scratch build over
    *    the survivors. This is why [[requireMergeable]] applies: pruned
    *    stats could not be subtracted.
    *  - CHAMPION LISTS: stale postings anti-join away — surviving
    *    entries are exactly the from-scratch champions MINUS any
    *    backfill. Exact in-place deletion is impossible in general: the
    *    build's top-m heap DISCARDED postings ranked m+1..df, so when a
    *    stale doc was a champion of a term with df > m, the doc that
    *    would back-fill the slot is unrecoverable (in the extreme, a
    *    term whose every champion was stale vanishes outright). Lists
    *    can therefore go SHORT — a recall degradation, never a wrong
    *    score: every posting still served carries its exact (tf, df).
    *    With `m >= df` for the query vocabulary (full posting lists)
    *    removal is fully exact — the q121 oracle pins that end-to-end.
    *  - `rank` keeps its build-time value (gaps where stale champions
    *    dropped): every consumer recomputes or ignores it, and keeping
    *    it avoids a full index re-rank window; the next merge or
    *    rebuild re-normalizes.
    * Monitor degradation with [[compactionDue]]; compaction is the
    * existing versioned rebuild ([[build]] + [[saveVersioned]] — alias
    * swap, old version retires).
    *
    * Scale shape: both anti-joins and the stats join broadcast the
    * stale side (a prune batch is small relative to a 100 TB corpus by
    * assumption — a corpus-scale removal IS a rebuild), so [[serve]]
    * over the result adds NO exchange; work is index-sized, never
    * survivor-corpus-sized. [[save]] persists the filtered frames, so
    * the next version is physically compacted postings-wise. */
  def remove(a: Artifacts, stale: DataFrame, docIdCol: String,
             textCol: String): Artifacts = {
    requireMergeable(a, "remove")
    val staleIds = stale.select(col(docIdCol).as("__sid")).distinct()
    // ONE guard job doubling as the nDocs decrement count: every stale id
    // must be in the stored set (the cells store carries exactly one row
    // per stored candidate) — subtracting a never-added doc's stats would
    // silently corrupt df/cf (the ingest disjointness guard's mirror
    // image), so an unknown id fails fast.
    val probe = staleIds
      .join(a.cells.select(col("cid").as("__sid"), lit(1).as("__hit")),
        Seq("__sid"), "left")
      .agg(count(lit(1)).as("n"), count(col("__hit")).as("known")).head()
    require(probe.getLong(0) == probe.getLong(1),
      "remove: stale ids not present in the stored serving set — stale rows " +
        "must come from the previously stored corpus version")
    // the stale batch's exact per-term stats, from its own rows alone
    // (championIndex computes df/cf before the champion prune, so m=1
    // minimizes work without affecting the stats)
    val staleStats = Rank.championIndex(stale, docIdCol, textCol,
        m = 1, minDf = 1L, lowercase = a.build.lowercase)
      .select(col("term"), col("df").as("__rdf"), col("cf").as("__rcf"))
    val adjusted = a.index.toDF("term", "df", "cf", "rank", "id", "tf")
      .join(broadcast(staleIds), col("id") === col("__sid"), "left_anti")
      .join(broadcast(staleStats), Seq("term"), "left")
      .select(col("term"),
        (col("df") - coalesce(col("__rdf"), lit(0L))).as("df"),
        (col("cf") - coalesce(col("__rcf"), lit(0L))).as("cf"),
        col("rank"), col("id"), col("tf"))
      .filter(col("df") >= 1)
    val cells = a.cells.select(col("cid"), col("cell"), col("codes"))
      .join(broadcast(staleIds), col("cid") === col("__sid"), "left_anti")
    Artifacts(adjusted, a.nDocs - probe.getLong(0), a.ivf, a.pq, cells, a.build)
  }

  /** Document update — the reference's create-vs-update upsert
    * (wurzel/steps/elevenlabs/step.py:167-230: changed docs delete then
    * re-upload under the same id; new docs create): [[remove]] the
    * stale versions, then [[ingest]] the fresh rows. Because removal
    * physically drops the stale ids from the index and cells frames,
    * the re-ingest of the SAME ids passes the disjointness guard — no
    * synthetic version-suffixed ids needed. `stale` = the previous
    * versions of the changed docs (as stored); `fresh` = the incoming
    * batch (updated docs under their ids, plus any genuinely new ids);
    * `freshEmb` = the incoming batch's embeddings. Exactness is
    * [[remove]]'s + [[ingest]]'s: stats and the vector leg exact,
    * champion lists exact up to removal backfill. */
  def upsert(a: Artifacts, stale: DataFrame, fresh: DataFrame,
             docIdCol: String, textCol: String,
             freshEmb: DataFrame, vecIdCol: String, vecCol: String): Artifacts =
    ingest(remove(a, stale, docIdCol, textCol),
      fresh, docIdCol, textCol, freshEmb, vecIdCol, vecCol)

  /** Removal-degradation monitor, the compaction trigger [[remove]]'s
    * scaladoc promises: terms whose champion list went SHORT — fewer
    * surviving postings than `least(champM, df)`, the list length a
    * from-scratch build would produce. (A term whose every champion was
    * removed has vanished and cannot be seen here — another reason the
    * trigger should fire well before lists empty out.) One index-sized
    * aggregate; compact by rebuilding ([[build]] + [[saveVersioned]])
    * when the degraded share crosses the deployment's recall tolerance.
    * @return (term, df, have) — degraded terms only. */
  def compactionDue(a: Artifacts): DataFrame =
    a.index.toDF("term", "df", "cf", "rank", "id", "tf")
      .groupBy(col("term"))
      .agg(first(col("df")).as("df"), count(lit(1)).as("have"))
      .filter(col("have") < least(lit(a.build.champM.toLong), col("df")))
      .select(col("term"), col("df"), col("have"))

  /** Persist the artifact set under `dir`: `index_store`, `ivf_store`,
    * `pq_store`, `cells_store` (via [[PqIndex.writeCells]] — the
    * one-file-per-cell layout is this writer's contract, not a caller
    * convention) and a 1-row `meta` carrying nDocs plus the
    * [[BuildConfig]], so a loaded store knows how it was built and the
    * mutation paths can enforce their preconditions. Returns the index
    * + cells row count — [[saveVersioned]]'s verified payload count,
    * summed over both stores so a lexically-empty corpus with valid
    * vectors (or vice versa) still commits; only a genuinely empty
    * artifact set reads as the empty payload the sink refuses to alias.
    * The counts are MEASURED DURING THE WRITE JOBS ([[Observation]]
    * metrics riding the write actions) — a read-back count would be a
    * second full scan of each store per save, a real job at 100 TB. */
  def save(spark: SparkSession, a: Artifacts, dir: String): Long = {
    import spark.implicits._
    val idxObs = org.apache.spark.sql.Observation()
    val cellObs = org.apache.spark.sql.Observation()
    a.index.observe(idxObs, count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$dir/index_store")
    IvfIndex.save(spark, a.ivf, s"$dir/ivf_store")
    PqIndex.save(spark, a.pq, s"$dir/pq_store")
    PqIndex.writeCells(a.cells.observe(cellObs, count(lit(1)).as("n")),
      s"$dir/cells_store")
    Seq((a.nDocs, a.build.champM, a.build.champMinDf, a.build.lowercase,
        a.build.ivfK, a.build.pqM, a.build.pqKsub, a.build.iters))
      .toDF("n_docs", "champ_m", "champ_min_df", "lowercase",
        "ivf_k", "pq_m", "pq_ksub", "iters")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
    // an empty store's write action still runs, so its observation
    // simply reports 0 toward the verified count
    def n(o: org.apache.spark.sql.Observation): Long =
      o.get("n").asInstanceOf[Long]
    n(idxObs) + n(cellObs)
  }

  /** Rehydrate [[Artifacts]] from a [[save]]d directory: the models load
    * into driver state (bounded collects — centroid and codebook rows),
    * the index and cells stores stay lazy parquet scans. A server
    * restarted from this alone ranks bit-identically to the builder
    * (HybridServeSpec pins it). */
  def load(spark: SparkSession, dir: String): Artifacts = {
    import spark.implicits._
    val meta = spark.read.parquet(s"$dir/meta")
    val nDocs = meta.select(col("n_docs")).as[Long].head()
    // metas written before the config was persisted carry only n_docs;
    // fall back to the defaults rather than refusing to load the store
    val build =
      if (meta.columns.contains("champ_m"))
        meta.select(col("champ_m"), col("champ_min_df"), col("lowercase"),
            col("ivf_k"), col("pq_m"), col("pq_ksub"), col("iters"))
          .as[(Int, Long, Boolean, Int, Int, Int, Int)].head() match {
            case (m, minDf, lc, ivfK, pqM, pqKsub, iters) =>
              BuildConfig(m, minDf, lc, ivfK, pqM, pqKsub, iters)
          }
      else BuildConfig()
    Artifacts(
      index = spark.read.parquet(s"$dir/index_store"),
      nDocs = nDocs,
      ivf = IvfIndex.load(spark, s"$dir/ivf_store"),
      pq = PqIndex.load(spark, s"$dir/pq_store"),
      cells = spark.read.parquet(s"$dir/cells_store"),
      build = build)
  }

  /** [[save]] as a crash-safe versioned collection: the artifact set
    * writes as `<name>_v{N}` under `root`, commits via the
    * [[graft.sinks.VersionedTableSink]] manifest protocol (the payload
    * count is the index + cells stores' verified row count), atomically swaps the
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
    require(cfg.lowercase == a.build.lowercase,
      s"serve: cfg.lowercase = ${cfg.lowercase} but the index was built with " +
        s"lowercase = ${a.build.lowercase} — query terms must normalize the way " +
        "the indexed text did or the lexical leg silently returns nothing " +
        "(the build setting is persisted in the meta store and restored by load)")
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
