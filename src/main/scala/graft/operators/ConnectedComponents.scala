package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the missing half of
  * the near-dup story: pair emitters (Dedup.minhashPairs / simhashPairs /
  * embeddingPairs / tlshPairs) produce EDGES, and a training-data pipeline
  * needs CLUSTERS with one canonical representative per cluster
  * (north-star dedup resolution; the reference stops at per-field drop,
  * wurzel/steps/duplication.py:21-51, so this is engine surface).
  *
  * Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
  * and Beyond", SoCC '14). Each half-round computes the per-node
  * neighborhood minimum as a groupBy aggregate joined back to the edges —
  * NOT a window over the node id: a window sorts each neighborhood inside
  * one task, so a degenerate star center (the exact shape late CC rounds
  * produce) becomes a single straggler task, while the groupBy absorbs the
  * hot node with map-side partial aggregation and the join's probe side
  * stays AQE-splittable. The edge set provably shrinks toward a forest of
  * stars centered at component minima in O(log^2 n) rounds on any graph —
  * and in 1-2 rounds on the near-clique clusters duplicate detection
  * actually produces. Labels are component MINIMA, so the output is
  * deterministic and oracle-checkable (a transitive-closure recursive CTE
  * computes the same labels).
  *
  * Scale notes (100 TB): per-iteration state is only the oriented distinct
  * edge list, shuffled on node id — nothing is ever collected to the
  * driver. Each iteration persists its edge set and unpersists the
  * previous one; convergence is a count+checksum metric OBSERVED on the
  * checkpoint job itself (two longs to the driver per round, no separate
  * action). Lineage is cut with a localCheckpoint every round so plan
  * analysis stays O(1) per iteration instead of growing with the round
  * count.
  */
object ConnectedComponents {

  /** Session conf key for [[run]]'s small-graph cutover (edge count at or
    * below which the component labeling runs driver-side); default 100000
    * oriented distinct edges = ~1.6 MB collected — the same order as a
    * broadcast-join build side. Deployments tune it like any join
    * threshold; 0 disables the local path outright. */
  val LocalEdgeLimitKey = "spark.graft.graph.localEdgeLimit"
  val LocalEdgeLimitDefault = 100000L

  /** Component labels for every node appearing in `edges`.
    *
    * @param edges  DataFrame with two id columns (castable to long);
    *               self-loops, duplicates and reversed duplicates are fine.
    * @param localEdgeLimit small-graph cutover (edges); negative = read the
    *               [[LocalEdgeLimitKey]] session conf.
    * @return       DataFrame(node LONG, component LONG) — one row per
    *               distinct node; `component` is the minimum node id of the
    *               node's connected component. Isolated ids that never
    *               appear in `edges` are absent (callers left-join).
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          maxIter: Int = 25, localEdgeLimit: Long = -1L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // Orient (u > v), drop self-loops and duplicates: the canonical edge
    // form both star steps preserve. Every iteration's edge set is
    // localCheckpoint'd EAGERLY: the checkpoint is simultaneously the
    // cache (next round reads blocks, not lineage) and the plan
    // truncation — without it the logical plan deepens every round and
    // Catalyst re-analysis makes iteration i cost O(i), turning a
    // 17-round path graph quadratic (measured 130 s -> 8 s on a 100k-node
    // path + 120k-edge graph at local[32]).
    // The per-round convergence checksum RIDES the checkpoint job as an
    // observed metric (r15): previously every round ran two actions — the
    // eager checkpoint materialization plus a count+xor aggregate re-read
    // of the cached blocks — and the fixed cost of that second job
    // dominates late rounds, whose edge sets are tiny. One action per
    // round now; the observed values are the same two longs.
    def checkpointed(df: DataFrame): (DataFrame, (Long, Long)) = {
      val obs = org.apache.spark.sql.Observation()
      val cp = df.observe(obs, count(lit(1)).as("n"),
          coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("sig"))
        .localCheckpoint(true)
      (cp, (obs.get("n").asInstanceOf[Long], obs.get("sig").asInstanceOf[Long]))
    }

    var (e, prevSig) = checkpointed(edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter($"a" =!= $"b" && $"a".isNotNull && $"b".isNotNull)
      .select(greatest($"a", $"b").as("u"), least($"a", $"b").as("v"))
      .distinct())

    // Small-graph cutover (r16, guide §1.2 "remove unnecessary shuffles and
    // passes"): the edge count just rode the checkpoint's observed metric,
    // so the decision is free. At or below the limit the star rounds are
    // pure fixed job latency — each round is a checkpoint job with ~4
    // exchanges over a graph that fits in one broadcast — so the labels are
    // computed driver-side by union-find over the SAME oriented distinct
    // edge set (bounded collect, ≤ limit×16 bytes — the size class of a
    // broadcast build side) and returned as a local relation, which
    // downstream joins broadcast exactly like the checkpointed frame. The
    // labels are identical by construction: min node id per component.
    // Above the limit nothing changes — the distributed rounds below are
    // the 100 TB path. Adaptive plan choice (AQE's broadcast cutover, made
    // at the operator level), not caching: every run recomputes from its
    // input.
    val limit =
      if (localEdgeLimit >= 0L) localEdgeLimit
      else spark.conf.get(LocalEdgeLimitKey, LocalEdgeLimitDefault.toString).toLong
    if (prevSig._1 <= limit) {
      val es = e.as[(Long, Long)].collect()
      e.unpersist()
      val parent = new java.util.HashMap[Long, Long](es.length * 2)
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x
        while (c != r) { val nx = parent.get(c); parent.put(c, r); c = nx }
        r
      }
      for ((u, v) <- es) {
        if (!parent.containsKey(u)) parent.put(u, u)
        if (!parent.containsKey(v)) parent.put(v, v)
        val ru = find(u); val rv = find(v)
        // attach the larger root under the smaller: the root IS the
        // component minimum, matching the distributed labels exactly
        if (ru < rv) parent.put(rv, ru)
        else if (rv < ru) parent.put(ru, rv)
      }
      val out = Vector.newBuilder[(Long, Long)]
      val it = parent.keySet().iterator()
      while (it.hasNext) { val node = it.next(); out += ((node, find(node))) }
      return out.result().toDF("node", "component")
    }

    var converged = prevSig._1 == 0L
    var iter = 0
    while (!converged && iter < maxIter) {
      iter += 1
      val (next, sig) = checkpointed(smallStar(largeStar(e)))
      e.unpersist()
      e = next
      converged = sig == prevSig
      prevSig = sig
    }

    // At the fixpoint the edge set is a forest of stars (member -> min);
    // the min(component) re-group is belt-and-braces for a maxIter bailout
    // on a pathological graph, where edges may not yet form proper stars.
    // Materialized via localCheckpoint so the iteration working set can be
    // unpersisted before returning — callers get a self-contained frame,
    // not a view over cached intermediate edges.
    val labels = e.select($"u".as("node"), $"v".as("component"))
      .union(e.select($"v".as("node"), $"v".as("component")))
      .groupBy($"node").agg(min($"component").as("component"))
      .localCheckpoint(true)
    e.unpersist()
    labels
  }

  /** Large-star: every node links its LARGER neighbors to the minimum of
    * its neighborhood (incl. itself). The neighborhood min is a groupBy on
    * the node joined back — skew-safe for degenerate star centers (see
    * object doc). */
  private def largeStar(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val sym = e.union(e.select($"v".as("u"), $"u".as("v")))
    val mins = sym.groupBy($"u").agg(min(least($"v", $"u")).as("m"))
    // no distinct here: the output feeds smallStar's aggregate + final
    // distinct, which absorb duplicates — saves one exchange per round
    sym.join(mins, Seq("u"))
      .filter($"v" > $"u")
      .select($"v".as("u"), $"m".as("v"))
  }

  /** Small-star: every node links its smaller neighbors — and itself — to
    * the minimum of its smaller neighborhood. Input and output stay in
    * (u > v) canonical orientation. */
  private def smallStar(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val mins = e.groupBy($"u").agg(min($"v").as("m"))
    val withM = e.join(mins, Seq("u"))
    val linkNeighbors = withM.select($"v".as("u"), $"m".as("v"))
    val linkSelf = withM.select($"u", $"m".as("v"))
    linkNeighbors.union(linkSelf)
      .filter($"u" =!= $"v")
      .select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
      .distinct()
  }
}
