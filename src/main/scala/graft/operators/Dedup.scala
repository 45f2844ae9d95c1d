package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.text._

/** Deduplication operators (SURVEY.md §2.8; reference `DropDuplicationStep`
  * wurzel/steps/duplication.py:21-51 + north-star near-dup surface).
  *
  * Scale notes (100 TB): every variant is a single shuffle on a hash key —
  * exact dedup shuffles on the content hash (not the content), MinHash/SimHash
  * shuffle on short band keys, and the candidate-pair join is band-key
  * equi-join (shuffled hash join), never a cross join. Signatures are computed
  * map-side with codegen'd array expressions.
  */
object Dedup {

  /** Bound degenerate-band join fan-out (the 100 TB escape hatch): bands
    * with more than `cap` members — boilerplate text, empty docs, a hot
    * hyperplane bucket — are split into `ceil(size/cap)` deterministic
    * sub-buckets (Skew.subBucket), so a size-n band produces O(n*cap)
    * candidate pairs instead of O(n^2). Bands at or under the cap keep
    * their key byte-for-byte, so results on non-degenerate data are
    * unchanged. Costs one extra shuffle on the (short) band key — the
    * membership count runs as a window over the same partitioning the
    * candidate join needs anyway. `cap <= 0` disables.
    *
    * Recall note: two members of an oversized band only stay candidates if
    * they hash to the same sub-bucket, but each still gets ~cap in-band
    * comparisons — for the degenerate clusters this targets (mutually
    * near-identical members), transitive links inside sub-buckets preserve
    * cluster discovery.
    *
    * The census runs as groupBy + join-back rather than
    * `count().over(Window.partitionBy(band))`: a window would funnel the
    * whole hot band into ONE sorting task — the very skew this cap exists
    * to defuse — while groupBy absorbs it with map-side partial
    * aggregation and the join's probe side stays AQE-splittable. The
    * over-cap set is boilerplate-sized, so the join back broadcasts.
    *
    * The sub-bucket index hashes the id with the engine's md5/hash60
    * scheme rather than Spark's Murmur3 so the DuckDB oracle can model the
    * cap exactly (q34's bands exceed the cap at sf0.1 — the capped join is
    * itself oracle-checked there). */
  private def capBandFanout(rows: DataFrame, bandCol: String, idCol: String,
                            cap: Int): DataFrame = {
    if (cap <= 0) return rows
    val census = rows.groupBy(col(bandCol)).agg(count(lit(1)).as("__band_n"))
      .filter(col("__band_n") > cap)
    val sub = pmod(hash60(col(idCol).cast("string"), "band"),
      ceil(col("__band_n") / lit(cap)).cast("long"))
    // Normalize the band to string BEFORE branching: with a numeric band
    // column (embedding buckets) the when/otherwise common type would
    // otherwise resolve by casting the sub-bucketed string branch to the
    // numeric type — an ANSI cast error the moment the cap first fires.
    val base = col(bandCol).cast("string")
    rows.join(census, Seq(bandCol), "left")
      .withColumn(bandCol,
        when(col("__band_n").isNotNull, concat_ws("#", base, sub)).otherwise(base))
      .drop("__band_n")
  }

  /** Exact dedup by field list — reference semantics (`DROP_BY_FIELDS`,
    * default ["md"]). Keeps an arbitrary-but-deterministic representative:
    * the row with the minimum tiebreak key.
    *
    * Shape: hash-group aggregation, NOT a window over the raw fields. The
    * default field is the full document body, so a
    * `row_number().over(partitionBy(fields))` would shuffle every body as
    * a partition key and window-sort each group — the exchange payload the
    * q23 posture exists to avoid. Instead the group key is a 64-byte
    * sha-256 of the fields' JSON encoding (unambiguous across field
    * boundaries and null/empty distinctions, collision odds
    * cryptographically negligible — the q23/content-hash convention) and
    * the representative rides a `min_by` whose map-side partials reduce
    * each group to ONE candidate row per partition before the exchange —
    * a corpus-hot duplicate group arrives at its reducer as a handful of
    * partial rows, never the full group. */
  def exact(df: DataFrame, fields: Seq[String], tiebreak: String): DataFrame = {
    val key = sha2(to_json(struct(fields.map(col): _*)), 256)
    val all = struct(df.columns.map(col): _*)
    df.groupBy(key.as("__k"))
      .agg(min_by(all, col(tiebreak)).as("__r"))
      .select(df.columns.map(c => col("__r." + c).as(c)): _*)
  }

  /** Duplicate-group report (reference logs removed %,
    * duplication.py:43-47): one row per duplicated key group. */
  def duplicateGroups(df: DataFrame, fields: Seq[String]): DataFrame =
    df.groupBy(fields.map(col): _*)
      .agg(count(lit(1)).as("dup_count"), min(col(df.columns.head)).as("first_id"))
      .filter(col("dup_count") > 1)

  /** Per-row MinHash signature + LSH band keys. Adds columns:
    * `sh` (distinct `shingleN`-gram word shingles), `minhash`
    * (array<bigint> of k), `bands` (array<string> of k/r).
    *
    * Defaults (3-gram shingles, r=4 rows/band) are tuned so a band only
    * fires around Jaccard ~0.6+: with j the true shingle Jaccard, a band
    * matches with probability j^r — on a corpus with high baseline
    * similarity (common vocabulary), 2-gram/r=2 floods the candidate join
    * (measured: ~3M candidate pairs on the 5k-doc corpus vs 256 at 3-gram/
    * r=4 with identical recall on true near-dups). */
  def withMinhash(df: DataFrame, textCol: String, k: Int, r: Int,
                  shingleN: Int = 3): DataFrame = {
    import graft.functions.Kernels
    val mb = bindOnce(Kernels.minhashSigUdf(k, shingleN)(col(textCol)))(s =>
      struct(s.as("m"), bandKeys(s, k, r).as("b")))
    df.withColumn("sh", Kernels.shinglesUdf(shingleN)(col(textCol)))
      .withColumn("__mb", mb)
      .withColumn("minhash", col("__mb.m"))
      .withColumn("bands", col("__mb.b"))
      .drop("__mb")
  }

  /** MinHash-LSH near-duplicate pairs: docs sharing any band key become
    * candidates; candidates are confirmed with exact shingle Jaccard >=
    * `threshold`. Returns (id_a, id_b, jaccard) with id_a < id_b.
    *
    * Plan shape for scale: the band self-join carries only (id, band) —
    * candidate pairs are deduped BEFORE the shingle arrays are fetched and
    * compared, so the wide payload is joined exactly once per unique
    * candidate pair, not once per shared band. At toy scale the broadcast
    * conversion of one self-join side duplicates the signature subplan
    * (signatures computed twice); at real scale both sides exceed the
    * broadcast threshold, the join becomes a shuffled join on the band
    * key, and Spark's ReusedExchange collapses the identical children —
    * one signature pass total. */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 12, r: Int = 4, threshold: Double = 0.6,
                   capPerBand: Int = 256): DataFrame =
    minhashPairsImpl(
      df.select(col(idCol).as("id"), col(textCol).as("__t"), lit(true).as("__new")),
      k, r, threshold, capPerBand)

  /** Shared MinHash-LSH pair pipeline over rows of (id, __t, __new):
    * band + cap, candidate self-join keeping pairs where at least one side
    * is new (all-new == the full pair set), candidate dedup BEFORE the
    * shingle arrays are fetched, exact-Jaccard confirm. */
  private def minhashPairsImpl(rows: DataFrame, k: Int, r: Int,
                               threshold: Double, capPerBand: Int): DataFrame = {
    import graft.functions.Kernels
    // bindOnce: the signature (one md5 pass over all shingles) is computed
    // once per row, not once per band-key reference.
    val bandRows = rows.select(col("id"), col("__new"),
      explode(bindOnce(Kernels.minhashSigUdf(k, 3)(col("__t")))(s => bandKeys(s, k, r)))
        .as("band"))
    val shs = rows.select(col("id"), Kernels.shinglesUdf(3)(col("__t")).as("sh"))
    minhashPairsFromParts(bandRows, shs, threshold, capPerBand)
  }

  /** Pair pipeline over pre-computed parts: `bandRows` (id, __new, band —
    * RAW band keys, pre-cap) and `shs` (id, sh). The cap's sub-bucketing
    * runs here over the union-at-join-time band sizes, so index-fed and
    * from-text runs produce identical pairs on the same underlying docs. */
  private def minhashPairsFromParts(bandRows: DataFrame, shs: DataFrame,
                                    threshold: Double, capPerBand: Int): DataFrame = {
    val capped = capBandFanout(bandRows, "band", "id", capPerBand)
    val cand = capped.as("a")
      .join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id") &&
          (col("a.__new") || col("b.__new")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(shs.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(shs.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Persistable MinHash-LSH index: one row per doc — (id, sh, bands),
    * the full signature state the pair pipeline needs from an
    * already-ingested corpus (`bands` drive candidate generation, `sh`
    * the exact-Jaccard confirm). Computing it is the ONLY signature pass
    * a doc ever needs: write it through a versioned/self-consuming sink
    * at ingest and feed it to [[minhashPairsAgainstIndex]] on the next
    * arrival, and steady-state ingest signatures only the batch. Band
    * keys are raw (pre-cap) and depend only on the doc's own text, so
    * index rows compose across arrivals byte-for-byte. */
  def minhashIndex(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 12, r: Int = 4): DataFrame = {
    import graft.functions.Kernels
    df.select(col(idCol).as("id"),
        Kernels.shinglesUdf(3)(col(textCol)).as("sh"),
        bindOnce(Kernels.minhashSigUdf(k, 3)(col(textCol)))(s => bandKeys(s, k, r)).as("bands"))
  }

  /** Near-dup pairs of a new `batch` against a stored [[minhashIndex]] —
    * the operationalized steady-state ingest: the corpus side contributes
    * only its persisted (id, sh, bands) rows (NO re-signaturing, no text
    * scan), the batch is signatured once here, and emitted pairs involve
    * at least one batch doc (existing×existing is already resolved).
    * Equals [[minhashPairsIncremental]] on the same docs — and therefore
    * composes across arrivals the same way (q88 oracle). `k`/`r` must
    * match the index's; ids disjoint (guard as in the incremental path). */
  def minhashPairsAgainstIndex(index: DataFrame, batch: DataFrame,
                               idCol: String, textCol: String,
                               k: Int = 12, r: Int = 4, threshold: Double = 0.6,
                               capPerBand: Int = 256,
                               validateDisjoint: Boolean = false): DataFrame = {
    if (validateDisjoint) {
      val overlap = batch.select(col(idCol))
        .join(index.select(col("id").as(idCol)), Seq(idCol), "left_semi").limit(1).count()
      require(overlap == 0,
        s"minhashPairsAgainstIndex: batch and index share ids on '$idCol'")
    }
    val batchIdx = minhashIndex(batch, idCol, textCol, k, r)
    val parts = index.select(col("id"), col("sh"), col("bands"), lit(false).as("__new"))
      .unionByName(batchIdx.withColumn("__new", lit(true)))
    minhashPairsFromParts(
      parts.select(col("id"), col("__new"), explode(col("bands")).as("band")),
      parts.select(col("id"), col("sh")),
      threshold, capPerBand)
  }

  /** Incremental MinHash-LSH: near-dup pairs that INVOLVE a new batch —
    * the steady-state ingest path, where re-pairing the whole corpus per
    * arrival would redo O(corpus²-candidate) work for pairs already known.
    * Emits batch×existing and batch×batch pairs (id_a < id_b, confirmed by
    * exact shingle Jaccard like [[minhashPairs]]); existing×existing pairs
    * are assumed already resolved and are never candidates, so the
    * expensive shingle-confirm join scales with batch-linked candidates,
    * not the corpus.
    *
    * Band keys are computed over the UNION of both frames, so a given
    * ingest's pair set equals the batch-involving subset of a full-corpus
    * run on the same union. Raw band keys are stable across ingest
    * schedules, so below the fan-out cap results compose exactly across
    * arrivals; a band whose size crosses `capPerBand` as the corpus grows
    * re-sub-buckets on the CURRENT union size, so pair discovery inside
    * degenerate bands depends on when members arrived (the documented
    * recall trade of [[capBandFanout]], now schedule-dependent). In
    * production the existing side's (id, band) rows are the persistable
    * index ([[minhashIndex]] / [[minhashPairsAgainstIndex]]), and each
    * ingest computes signatures only for the batch. Ids must be disjoint
    * across the two frames — overlapping ids would silently duplicate
    * band rows and emit wrong pairs, so pass `validateDisjoint = true`
    * (one extra semi-join count, batch-sized) to fail fast in pipelines
    * where the invariant is not structural. */
  def minhashPairsIncremental(existing: DataFrame, batch: DataFrame,
                              idCol: String, textCol: String,
                              k: Int = 12, r: Int = 4, threshold: Double = 0.6,
                              capPerBand: Int = 256,
                              validateDisjoint: Boolean = false): DataFrame = {
    if (validateDisjoint) {
      val overlap = batch.select(col(idCol))
        .join(existing.select(col(idCol)), Seq(idCol), "left_semi").limit(1).count()
      require(overlap == 0,
        s"minhashPairsIncremental: batch and existing share ids on '$idCol'")
    }
    minhashPairsImpl(
      existing.select(col(idCol).as("id"), col(textCol).as("__t"), lit(false).as("__new"))
        .unionByName(batch.select(col(idCol).as("id"), col(textCol).as("__t"), lit(true).as("__new"))),
      k, r, threshold, capPerBand)
  }

  /** Winnowing-fingerprint near-dup pairs (Schleimer et al. 2003): docs
    * sharing at least `minShared` winnowing fingerprints. The DETERMINISTIC
    * complement to [[minhashPairs]]: winnowing guarantees every shared run
    * of >= n+w-1 words contributes a shared fingerprint, so a pair with a
    * long verbatim overlap cannot be missed the way a probabilistic band
    * scheme can — at the cost of candidate volume scaling with fingerprint
    * density rather than band collisions. The guarantee holds while no
    * shared fingerprint's band exceeds `capPerBand`: once the cap fires on
    * a hot fingerprint, the two docs can land in different sub-buckets and
    * that fingerprint stops contributing to `n_shared` (the same recall
    * trade documented on [[capBandFanout]]). Same plan shape:
    * fingerprints explode map-side (8-byte values), the self-join is a
    * fingerprint equi-join with the fan-out cap, and `n_shared` counts
    * distinct shared fingerprints (per-doc sets are already distinct). */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
                  n: Int = 3, w: Int = 4, minShared: Int = 2,
                  capPerBand: Int = 256): DataFrame = {
    import graft.functions.Kernels
    val fps = capBandFanout(
      df.select(col(idCol).as("id"),
        explode(Kernels.winnowUdf(n, w)(col(textCol))).as("fp")),
      "fp", "id", capPerBand)
    val a = fps.select(col("id").as("id_a"), col("fp"))
    val b = fps.select(col("id").as("id_b"), col("fp"))
    a.join(b, Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** SimHash fingerprints (`bits`-bit) per row. 48 bits default: wide enough
    * to discriminate on a homogeneous corpus, and every band/shift stays in
    * positive i64 territory for the SQL oracle. */
  def withSimhash(df: DataFrame, textCol: String, bits: Int = 48): DataFrame =
    df.withColumn("simhash", graft.functions.Kernels.simhashUdf(bits)(col(textCol)))

  /** SimHash near-dup pairs: bucket by `bandBits`-bit bands of the
    * fingerprint (two docs within maxHamming bit flips share a clean band
    * unless every band catches a flip), then confirm by Hamming distance. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   bits: Int = 48, bandBits: Int = 16, maxHamming: Int = 2,
                   capPerBand: Int = 256): DataFrame = {
    val nBands = bits / bandBits
    // Explode (band, fingerprint) structs built under a bindOnce so the
    // md5-over-tokens fingerprint pass runs once per row, not per band.
    val banded = capBandFanout(
      df.select(
          col(idCol).as("id"),
          explode(bindOnce(graft.functions.Kernels.simhashUdf(bits)(col(textCol))) { fp =>
            array((0 until nBands).map(bnd =>
              struct(
                concat_ws(":", lit(bnd),
                  shiftright(fp, bnd * bandBits).bitwiseAND(lit((1L << bandBits) - 1))).as("band"),
                fp.as("fp"))): _*)
          }).as("x"))
        .select(col("id"), col("x.band").as("band"), col("x.fp").as("simhash")),
      "band", "id", capPerBand)
    val a = banded.select(col("id").as("id_a"), col("simhash").as("fp_a"), col("band"))
    val b = banded.select(col("id").as("id_b"), col("simhash").as("fp_b"), col("band"))
    a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), expr("bit_count(fp_a ^ fp_b)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** TLSH near-dup pairs: the distributed similarity-comparison companion
    * to the digest the reference stores per point ("can be used for
    * similarity comparisons", qdrant/step.py:263-265 — the reference never
    * operationalizes it; this is the Spark-scale realization).
    *
    * Candidate generation bands the 64-hex digest BODY (32 bytes of 2-bit
    * bucket codes): a near-dup flips few buckets, so most of the `bands`
    * substrings stay identical and the pair meets in a band equi-join on a
    * short key. The header (length/quartile bytes) is excluded from band
    * keys — near-dups of slightly different length would otherwise match in
    * no band. Candidates are confirmed with the exact TLSH distance
    * (paper's practical match threshold ~100). Docs with no digest (short/
    * low-variation) never pair. Single shuffle on the band key; the
    * 72-char digest is the only payload carried. */
  def tlshPairs(df: DataFrame, idCol: String, textCol: String,
                bands: Int = 8, maxDist: Int = 100,
                capPerBand: Int = 256): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    val width = 64 / bands
    val diffUdf = udf((x: String, y: String) => graft.functions.Tlsh.diff(x, y))
    val digests = df
      .select(col(idCol).as("id"), graft.functions.Tlsh.hashUdf(col(textCol)).as("h"))
      .filter(col("h").isNotNull)
    // digest layout: "T1" + 6 header hex + 64 body hex -> body at pos 9
    val banded = capBandFanout(
      digests.select(col("id"), col("h"),
        explode(array((0 until bands).map(bnd =>
          concat_ws(":", lit(bnd), substring(col("h"), 9 + bnd * width, width))): _*))
          .as("band")),
      "band", "id", capPerBand)
    val a = banded.select(col("id").as("id_a"), col("h").as("h_a"), col("band"))
    val b = banded.select(col("id").as("id_b"), col("h").as("h_b"), col("band"))
    a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("h_a"), col("h_b"))
      .distinct() // dedup shared-band pairs BEFORE the exact distance runs
      .select(col("id_a"), col("id_b"), diffUdf(col("h_a"), col("h_b")).as("tlsh_dist"))
      .filter(col("tlsh_dist") <= maxDist)
  }

  /** Quantized-cosine pairs from a banded frame of (id, q, n, <bandCol>):
    * equi-join on the band, ordered ids, cosine >= threshold. Zero-norm
    * vectors (failed embeds, padding rows) never pair: their cosine is
    * 0/0 = NaN, and Spark orders NaN GREATER than any number, so without
    * the explicit norm guard a single zero vector would "match" every
    * member of its band and collapse the band into one duplicate cluster
    * downstream. `dedup` adds a distinct for banding schemes where a pair
    * can meet in more than one band (hyperplane multi-probe); cell
    * assignment partitions rows, so [[semanticDedup]] skips it. */
  private def bandedCosinePairs(banded: DataFrame, bandCol: String,
                                threshold: Double, dedup: Boolean): DataFrame = {
    val a = banded.select(col("id").as("id_a"), col("q").as("q_a"), col("n").as("n_a"), col(bandCol))
    val b = banded.select(col("id").as("id_b"), col("q").as("q_b"), col("n").as("n_b"), col(bandCol))
    val scored = a.join(b, Seq(bandCol))
      .filter(col("id_a") < col("id_b") && col("n_a") > 0 && col("n_b") > 0)
      .select(col("id_a"), col("id_b"),
        (graft.plans.DotLongExpr.dotLong(col("q_a"), col("q_b")).cast("double")
          / (sqrt(col("n_a").cast("double")) * sqrt(col("n_b").cast("double")))).as("cosine"))
    (if (dedup) scored.distinct() else scored)
      .filter(col("cosine") >= threshold)
  }

  /** Embedding near-dup: pairs with quantized cosine >= threshold among
    * candidates sharing a random-hyperplane LSH bucket. */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
                     planes: Int = 8, threshold: Double = 0.95,
                     capPerBand: Int = 256): DataFrame = {
    import graft.functions.Kernels
    val feat = Kernels.vecFeaturesUdf(planes, "emb")
    val q = capBandFanout(
      df.select(col(idCol).as("id"), feat(col(vecCol)).as("f"))
        .select(col("id"), col("f._1").as("q"), col("f._2").as("n"), col("f._3").as("bucket")),
      "bucket", "id", capPerBand)
    bandedCosinePairs(q, "bucket", threshold, dedup = true)
  }

  /** SemDeDup (Abbas et al. 2023): semantic deduplication over embeddings —
    * drops documents whose EMBEDDINGS are near-identical even when their
    * text is not (translations, templated rewrites, paraphrases), the
    * complement of the token-level dedup family above. Vectors are
    * partitioned by a k-means coarse quantizer ([[IvfIndex]] model — fit
    * once on a sample, reuse across corpora), pairwise quantized cosine
    * runs only WITHIN a cell (the SemDeDup observation: epsilon-balls
    * don't straddle clusters, so the all-pairs comparison becomes
    * per-cell), and pairs at or above `threshold` resolve into clusters
    * with a min-id canonical via [[resolveClusters]].
    *
    * Scale shape (100 TB): assignment is map-side against broadcast k x
    * dim centroids; the pair comparison is an equi-join on the cell id
    * with [[capBandFanout]] bounding degenerate cells (recall caveat
    * documented there); CC rounds are pair-graph-sized. Returns one row
    * per input: (idCol, cluster_id, is_duplicate) — filter
    * `!is_duplicate` to keep one representative per semantic ball. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    model: IvfIndex.Model, threshold: Double = 0.95,
                    capPerCell: Int = 256): DataFrame = {
    val assigned = IvfIndex.assign(df, idCol, vecCol, model)
      .select(col("cid").as("id"), col("cv").as("q"), col("cn").as("n"), col("cell"))
    val banded = capBandFanout(assigned, "cell", "id", capPerCell)
    // one cell per vector (and the cap's sub-buckets partition a cell), so
    // a pair meets in at most one band — no distinct needed
    val pairs = bandedCosinePairs(banded, "cell", threshold, dedup = false)
    resolveClusters(df, idCol, pairs)
  }

  /** Resolve near-dup PAIRS into duplicate CLUSTERS with a canonical
    * representative per cluster — the decision layer a training-data
    * pipeline needs on top of any pair emitter above: near-duplication is
    * not transitive, so without component resolution a chain A~B~C either
    * drops both B and C (over-deletion) or neither (pair-local dedup).
    *
    * Clusters are connected components of the pair graph
    * ([[ConnectedComponents]], alternating star rounds); the
    * representative is the minimum id, which doubles as the cluster id.
    *
    * @return one row per doc: (idCol, cluster_id LONG, is_duplicate BOOL);
    *         docs in no pair form their own singleton cluster. The
    *         components frame is pair-graph-sized (usually a small fraction
    *         of the corpus), so the join back to `docs` broadcasts under
    *         AQE at typical dup rates. */
  def resolveClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
                      idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    val comp = ConnectedComponents.run(pairs, idA, idB)
      .withColumnRenamed("node", idCol)
    docs.select(col(idCol).cast("long").as(idCol))
      .join(comp, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("cluster_id"))
      .withColumn("is_duplicate", col("cluster_id") =!= col(idCol))
  }

  /** Elect one KEEPER per duplicate cluster by a quality score — the
    * decision [[resolveClusters]]' min-id canonical cannot make: when a
    * cluster mixes a clean original with truncated/boilerplate-wrapped
    * copies, a training pipeline keeps the HIGHEST-QUALITY member, not the
    * smallest id. `quality` is any non-null orderable expression over
    * `docs` (Gopher stats, LM bucket score, distinct-word count...);
    * ties break on the smaller id so election is total.
    *
    * Scale shape (100 TB): the election groupBy runs over PAIR-GRAPH
    * members only (an inner join against the components frame), never the
    * corpus — singleton docs skip election entirely and are labeled
    * keepers map-side through two left joins whose right sides are
    * pair-graph- and cluster-sized (AQE broadcasts them at typical dup
    * rates). The keeper pick is an aggregate max over (quality, -id) —
    * no per-cluster window sort.
    *
    * @return one row per doc: (idCol, cluster_id, cluster_size,
    *         is_keeper); `filter(col("is_keeper"))` is the deduplicated
    *         corpus. */
  def selectKeepers(docs: DataFrame, idCol: String, pairs: DataFrame,
                    quality: Column,
                    idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    val comp = ConnectedComponents.run(pairs, idA, idB)
      .withColumnRenamed("node", idCol)
    val base = docs.select(col(idCol).cast("long").as(idCol),
      quality.cast("double").as("__q"))
    val elect = base.join(comp, Seq(idCol))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"),
        max(struct(col("__q").as("q"), (-col(idCol)).as("nid"))).as("__k"))
      .select(col("component"), col("cluster_size"),
        (-col("__k.nid")).as("__keeper"))
    base.join(comp, Seq(idCol), "left")
      .join(elect, Seq("component"), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("cluster_id"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"),
        coalesce(col(idCol) === col("__keeper"), lit(true)).as("is_keeper"))
  }

  /** Duplicate-aware SOFT dedup: every member of a near-dup cluster of
    * size n is kept with probability 1/n, so in expectation each cluster
    * contributes ONE document — but WHICH member survives is decided by
    * content-addressed hash, preserving the within-cluster diversity that
    * [[selectKeepers]]' hard election always discards (the "soft dedup"
    * used by duplicate-aware samplers: downweight, don't delete). Rates
    * are exact integer basis points `max(1, 10000 div n)` — floored at
    * 1 bp so a cluster of more than 10000 members is never dropped
    * outright — and selection rides
    * [[Sampling.byHashWeighted]]'s nested hash buckets, so the decision is
    * rerun-stable and composes with every other hash sample in the
    * pipeline (a doc kept here stays kept when a later stage samples at a
    * lower rate). Singletons get rate 10000 and are always kept.
    *
    * Scale shape (100 TB): cluster labels come from [[resolveClusters]]
    * (pair-graph-sized CC rounds); sizes are one `groupBy` over the
    * (id, cluster_id) label frame — 16-byte rows, partial-aggregated —
    * and the keep decision itself is a map-side filter. The corpus text
    * never shuffles.
    *
    * @return the KEPT rows: (idCol, cluster_id, cluster_size, rate_bp). */
  def softDedupSample(docs: DataFrame, idCol: String, pairs: DataFrame,
                      idA: String = "id_a", idB: String = "id_b",
                      seed: String = "sample"): DataFrame = {
    val labeled = resolveClusters(docs, idCol, pairs, idA, idB)
    val sizes = labeled.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    // clamp to >= 1 bp: `10000 div n` floors to 0 for clusters larger
    // than 10000 members (common boilerplate at corpus scale), which
    // would deterministically drop the whole cluster; at 1 bp a cluster
    // of n > 10000 keeps n/10000 >= 1 docs in expectation, preserving
    // the one-per-cluster-in-expectation contract
    val rated = labeled.join(sizes, Seq("cluster_id"))
      .withColumn("rate_bp", greatest(lit(1L), expr("10000 div cluster_size")))
    Sampling.byHashWeighted(rated, idCol, col("rate_bp"), seed)
      .select(col(idCol), col("cluster_id"), col("cluster_size"), col("rate_bp"))
  }

  /** Duplicated-window census at `w`-token granularity — the analysis
    * surface behind [[stripDupSpans]]. One row per window: (idCol, pos,
    * wh, n_occ, is_first), where `pos` is the 0-based token offset, `wh`
    * the 60-bit window hash, `n_occ` the corpus-wide occurrence count of
    * that window (including within-doc repeats), and `is_first` marks the
    * global first occurrence in (id, pos) order.
    *
    * The census runs as groupBy + join-back rather than `count()/
    * row_number() over Window.partitionBy(wh)`: a corpus-hot boilerplate
    * window (one 15-token footer occurring in millions of docs) would
    * funnel its ENTIRE occurrence list into one sorting task, while the
    * groupBy absorbs the hot hash with map-side partial aggregation and
    * the join-back's probe side stays AQE-skew-splittable (the build side
    * is one row per wh) — the same de-skew applied to capBandFanout and
    * ConnectedComponents. `is_first` falls out of the aggregate as
    * "(id, pos) equals min(struct(id, pos))"; no per-key sort exists
    * anywhere in the plan. */
  def dupWindows(df: DataFrame, idCol: String, textCol: String,
                 w: Int = 15): DataFrame = {
    val wins = df.select(col(idCol),
      posexplode(windowHashes(col(textCol), w)).as(Seq("pos", "wh")))
    val census = wins.groupBy(col("wh"))
      .agg(count(lit(1)).as("n_occ"),
        min(struct(col(idCol), col("pos"))).as("__first"))
    wins.join(census, Seq("wh"))
      .select(col(idCol), col("pos"), col("wh"), col("n_occ"),
        (col("__first").getField(idCol) === col(idCol) &&
          col("__first").getField("pos") === col("pos")).as("is_first"))
  }

  /** Rolling `w`-token window hashes of a text column: element i (0-based)
    * is hash60 of the space-joined tokens [i, i+w). Empty array when the
    * doc has fewer than w tokens. JVM kernel ([[graft.functions.Kernels
    * .windowHashes]]): the equivalent transform/concat_ws/md5 Column chain
    * is interpreted per window and measured ~3x slower on the corpus. */
  private def windowHashes(textCol: Column, w: Int): Column =
    graft.functions.Kernels.windowHashesUdf(w)(textCol)

  /** Exact duplicated-substring removal at `w`-token granularity — the
    * north-star ExactSubstr dedup of Lee et al. 2022 ("Deduplicating
    * Training Data Makes Language Models Better"), re-expressed for a
    * cluster: their single-node suffix array becomes a distributed census
    * of rolling w-token window hashes, exact at window granularity (any
    * duplicated run of >= w tokens is caught; shorter repeats are not,
    * matching the paper's min-match-length parameter).
    *
    * Every occurrence of a window that appears more than once corpus-wide
    * (any doc, any position — within-doc repeats count) is flagged EXCEPT
    * the global first occurrence in (id, pos) order, so each duplicated
    * span survives exactly once. Flagged docs have every token covered by
    * a flagged window removed and their text rebuilt space-joined
    * (overlapping windows merge into maximal spans via the coverage mask);
    * untouched docs keep their original text byte-for-byte. Null text
    * stays null. Adds `dup_windows` and `covered_tokens` columns.
    *
    * Scale shape (100 TB): window hashes are computed map-side and the
    * census shuffles only (id, pos, 8-byte hash) rows — O(total tokens),
    * the same asymptotic cost as the paper's suffix array but horizontally
    * partitioned, as a skew-proof groupBy + join-back (see [[dupWindows]])
    * rather than a per-hash window sort; the hash side is scanned twice
    * (once per join input), both times kernel-map-side. The flagged set is dup-rate-sized, so the
    * per-doc position lists regroup small and the join back to the corpus
    * broadcasts under AQE at typical dup rates; the rebuild is map-side.
    * Distinct grams colliding in 60 bits could over-strip at ~2^-60 per
    * pair — the same documented odds as the LSH band keys and the
    * line-dedup census. */
  def stripDupSpans(df: DataFrame, idCol: String, textCol: String,
                    w: Int = 15): DataFrame = {
    require(w >= 2, s"window must be >= 2 tokens, got $w")
    val reserved = Seq("dup_windows", "covered_tokens", "__orig", "__ps", "__sc")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"input already has reserved column(s) ${clash.mkString(", ")} — rename them first")
    val flagged = dupWindows(df, idCol, textCol, w)
      .filter(col("n_occ") > 1 && !col("is_first"))
    val perDoc = flagged.groupBy(col(idCol))
      .agg(sort_array(collect_list(col("pos"))).as("__ps"),
        count(lit(1)).as("dup_windows"))
    // rebuild in one kernel pass (rolling cover-end over the sorted
    // positions); the when-guard keeps untouched docs byte-identical and
    // only evaluates the kernel on flagged rows
    val strip = graft.functions.Kernels.stripCoveredUdf(w)(col("__orig"), col("__ps"))
    df.withColumnRenamed(textCol, "__orig")
      .join(perDoc, Seq(idCol), "left")
      .withColumn("__sc", when(col("__ps").isNotNull, strip))
      .withColumn(textCol,
        when(col("__ps").isNull, col("__orig")).otherwise(col("__sc._1")))
      .withColumn("covered_tokens",
        when(col("__ps").isNull, lit(0L)).otherwise(col("__sc._2")))
      .withColumn("dup_windows", coalesce(col("dup_windows"), lit(0L)))
      .select((df.columns.map(c => col(c)) :+ col("dup_windows") :+ col("covered_tokens")).toIndexedSeq: _*)
  }

  /** Line-level boilerplate removal (north-star; the MassiveText "remove
    * documents' repeated lines" / CCNet paragraph-dedup family — a
    * different axis than doc-level dedup: a line appearing verbatim in
    * more than `maxDocs` DISTINCT documents (footers, cookie banners, nav
    * text) is stripped from every document; everything else keeps its
    * original position and order.
    *
    * Scale shape (100 TB): lines explode map-side; the hot-line census is
    * two shuffles on the 8-byte line hash (distinct (hash, id), then a
    * count) — never on line text; the strip is a left_anti join on the
    * same hash (the hot set is small — boilerplate by definition — so AQE
    * turns it into a broadcast join); the rebuild is one shuffle on the
    * doc id with an array_sort regroup, no window. Docs whose every line
    * was hot survive with empty text (left join back to the id spine), so
    * row accounting downstream stays exact. Distinct gram strings
    * colliding in 60 bits could over-strip at ~2^-60 per pair — the same
    * documented odds as the LSH band keys. */
  def stripHotLines(df: DataFrame, idCol: String, textCol: String,
                    maxDocs: Int, sep: String = "\n"): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    require(sep.nonEmpty, "separator must be non-empty")
    val others = df.columns.filterNot(c => c == idCol || c == textCol)
    // `sep` is a LITERAL unit separator (split quotes it, the rebuild
    // joins with it): "\n" = MassiveText line dedup (default, q78),
    // "\n\n" = CCNet paragraph dedup — same census either way
    val lines = df
      .select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))).as(Seq("pos", "line")))
      .withColumn("lh", hash60(col("line"), "line"))
    // empty lines (paragraph separators) are structural, not boilerplate —
    // they'd be hot in any corpus and stripping them would collapse layout
    val hot = lines.filter(col("line") =!= "")
      .select(col("lh"), col(idCol)).distinct()
      .groupBy(col("lh")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxDocs)
      .select(col("lh"))
    val rebuilt = lines.join(hot, Seq("lh"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("line")))).as("__ls"))
      .select(col(idCol),
        concat_ws(sep, transform(col("__ls"), x => x.getField("line"))).as(textCol))
    // null text stays null (it produced no lines, so it is absent from the
    // rebuild — fabricating "" would erase the had-no-text/all-boilerplate
    // distinction); a doc whose every line was hot comes back as ""
    df.select((col(idCol) +: (others.map(col) :+ col(textCol).as("__orig"))).toIndexedSeq: _*)
      .join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol,
        when(col("__orig").isNull, lit(null).cast("string"))
          .otherwise(coalesce(col(textCol), lit(""))))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
