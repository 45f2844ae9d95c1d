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
  *             + (dampingPct * sum_{u->v} share(u)) div 100
  *
  * Dangling mass (nodes with no out-edges) is dropped, not redistributed —
  * the common simplification; ranks then measure relative, not normalized,
  * centrality. Edges are deduplicated and self-loops removed, so the graph
  * is simple and unweighted.
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
          scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 0 && iterations <= 1000,
      s"PageRank: iterations must be in [0, 1000], got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"PageRank: dampingPct must be in [0, 100], got $dampingPct")
    require(scale > 0, "PageRank: scale must be positive")

    val ed = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    val nodes = ed.select(col("src").as("node"))
      .union(ed.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "PageRank: empty graph")
    val outdeg = ed.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
      .localCheckpoint(true)

    // Driver-side exact integer constants (Long arithmetic, no parity risk)
    val init = scale / n
    val teleport = ((100L - dampingPct) * scale) / (100L * n)

    var ranks = nodes.select(col("node"), lit(init).as("pr")).localCheckpoint(true)
    for (_ <- 0 until iterations) {
      val shares = ranks.join(outdeg, ranks("node") === outdeg("src"))
        .select(col("src"), expr("pr div odeg").as("share"))
      val inbound = ed.join(shares, Seq("src"))
        .groupBy(col("dst")).agg(sum(col("share")).as("m"))
      val next = nodes.join(inbound, nodes("node") === inbound("dst"), "left")
        .select(col("node"),
          (lit(teleport) + expr(s"($dampingPct * coalesce(m, 0L)) div 100")).as("pr"))
        .localCheckpoint(true)
      ranks.unpersist()
      ranks = next
    }
    ed.unpersist()
    outdeg.unpersist()
    // nodes stays cached until ranks' final checkpoint is built from it —
    // the last `next` above already materialized, so release it now.
    nodes.unpersist()
    ranks
  }
}
