package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list in EXACT integer arithmetic —
  * link-graph centrality for corpus curation. Web-scale training pipelines
  * rank crawl hosts/pages by graph centrality to pick high-quality seeds
  * (Common Crawl publishes harmonic/PageRank host rankings for exactly this
  * use); the same operator ranks pages in a clickstream transition graph
  * (q108) or hosts in a hyperlink graph. Complements
  * [[ConnectedComponents]]: CC answers "which nodes form one group", this
  * answers "which nodes matter most inside the link structure".
  *
  * Determinism: ranks are integers scaled by `scale`; every division is
  * integral (`div` — floor for the non-negative values that occur here) and
  * every sum is an integer hash-aggregate, so results are partition-order
  * independent and a symbolic replay of the recurrence (the q108 DuckDB
  * oracle's chained CTEs) matches bit-for-bit. The recurrence per
  * iteration, with damping d = dampingPct/100 and N nodes:
  *
  *   share(u)  = pr(u) div outdeg(u)
  *   pr'(v)    = ((100-dampingPct) * scale) div (100 * N)
  *             + (dampingPct * (sum_{u->v} share(u) + dang)) div 100
  *
  * where `dang` = (sum of pr over nodes with no out-edges) div N when
  * `redistributeDangling` is on, else 0. OFF by default (the common
  * simplification — ranks then measure relative, not normalized,
  * centrality); ON gives the normalized-mass variant at the cost of one
  * extra node-sized aggregate per round — a 1-row frame broadcast into
  * the round's own plan (r15), not a separate driver action. Edges are
  * deduplicated and self-loops removed, so the graph is simple and
  * unweighted.
  *
  * `stopDelta` adds convergence-based early stopping: after each round
  * the max |pr' - pr| over all nodes (one scalar aggregate) is compared
  * against the threshold (in `scale` units) and iteration stops once the
  * ranks have settled. `iterations` stays the hard upper bound, so the
  * default (None) keeps the fixed-iteration contract the q108 oracle
  * replays.
  *
  * Scale shape (100 TB graphs, billions of nodes):
  *  - per-iteration state is (node, pr) — node-sized, never edge-sized; no
  *    driver-side state beyond the node count (one `count()` action).
  *  - each iteration is two node-keyed hash joins plus one
  *    partially-aggregated `groupBy(dst)`: a hot destination (a popular
  *    page with millions of in-links) is absorbed by map-side partial sums,
  *    never sorted in one task — the same de-skew posture as
  *    [[ConnectedComponents]]' groupBy minima.
  *  - every iteration's ranks are localCheckpoint'd EAGERLY and the
  *    previous iteration unpersisted (CC's lesson: without plan
  *    truncation, Catalyst re-analysis makes iteration i cost O(i)).
  *    Edges and out-degrees are checkpointed once up front — they are
  *    re-read every round from cached blocks, not recomputed lineage.
  */
object PageRank {

  /** PageRank after exactly `iterations` rounds.
    *
    * @param edges  DataFrame with two id columns (castable to long);
    *               duplicates and self-loops are dropped.
    * @return       DataFrame(node LONG, pr LONG): one row per distinct node
    *               appearing in any edge, pr in `scale` units. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iterations: Int = 5, dampingPct: Int = 85,
          scale: Long = 1000000000000L,
          redistributeDangling: Boolean = false,
          stopDelta: Option[Long] = None): DataFrame = {
    require(iterations >= 0 && iterations <= 1000,
      s"PageRank: iterations must be in [0, 1000], got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"PageRank: dampingPct must be in [0, 100], got $dampingPct")
    // Upper bound, not just positivity: the teleport constant multiplies
    // scale by up to 100, and the damping step multiplies a mass sum that
    // can reach ~1.5*scale (inbound shares + redistributed dangling) by
    // up to 100 — /200 keeps every intermediate inside Long exactly.
    require(scale > 0 && scale <= Long.MaxValue / 200,
      s"PageRank: scale must be in (0, ${Long.MaxValue / 200}], got $scale")
    require(stopDelta.forall(_ >= 0), "PageRank: stopDelta must be >= 0")

    val ed = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    // the node count rides the checkpoint job as an observed metric (r15)
    // instead of a second count() action over the cached blocks
    val nObs = org.apache.spark.sql.Observation()
    val nodes = ed.select(col("src").as("node"))
      .union(ed.select(col("dst").as("node")))
      .distinct()
      .observe(nObs, count(lit(1)).as("n"))
      .localCheckpoint(true)
    val n = nObs.get("n").asInstanceOf[Long]
    require(n > 0, "PageRank: empty graph")
    val outdeg = ed.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
      .localCheckpoint(true)

    // Driver-side exact integer constants (Long arithmetic, no parity risk)
    val init = scale / n
    val teleport = ((100L - dampingPct) * scale) / (100L * n)

    // no checkpoint for the initial ranks: it is a constant projection over
    // the already-checkpointed nodes frame (depth-1 lineage over cached
    // blocks), so materializing it was a pure extra job (r15)
    var ranks = nodes.select(col("node"), lit(init).as("pr"))
    var i = 0
    var settled = false
    while (i < iterations && !settled) {
      val shares = ranks.join(outdeg, ranks("node") === outdeg("src"))
        .select(col("src"), expr("pr div odeg").as("share"))
      val inbound = ed.join(shares, Seq("src"))
        .groupBy(col("dst")).agg(sum(col("share")).as("m"))
      val base = nodes.join(inbound, nodes("node") === inbound("dst"), "left")
      // dangling mass: previously a separate per-round driver action; now a
      // 1-row aggregate broadcast INTO the round's plan (r15), so each
      // round is exactly one job. The arithmetic is unchanged — `div` is
      // the same floor division the driver-side Long division performed
      // (both operands non-negative here).
      val next = (if (redistributeDangling) {
        val dangF = ranks.join(outdeg, ranks("node") === outdeg("src"), "left_anti")
          .agg(coalesce(sum(col("pr")), lit(0L)).as("__dsum"))
          .select(expr(s"__dsum div ${n}L").as("__dang"))
        base.crossJoin(broadcast(dangF))
          .select(col("node"),
            (lit(teleport) + expr(s"($dampingPct * (coalesce(m, 0L) + __dang)) div 100")).as("pr"))
      } else {
        base.select(col("node"),
          (lit(teleport) + expr(s"($dampingPct * coalesce(m, 0L)) div 100")).as("pr"))
      }).localCheckpoint(true)
      settled = stopDelta.exists { eps =>
        // scalar max-|delta| over node-sized state; both sides are
        // already-checkpointed block scans, so the join is two cached reads
        next.select(col("node"), col("pr").as("__npr"))
          .join(ranks, Seq("node"))
          .agg(coalesce(max(abs(col("__npr") - col("pr"))), lit(0L)))
          .head.getLong(0) <= eps
      }
      ranks.unpersist()
      ranks = next
      i += 1
    }
    ed.unpersist()
    outdeg.unpersist()
    // nodes stays cached until ranks' final checkpoint is built from it —
    // the last `next` above already materialized, so release it now.
    nodes.unpersist()
    ranks
  }
}
