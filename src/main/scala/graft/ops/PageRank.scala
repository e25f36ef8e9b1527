package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank (Brin & Page 1998) in EXACT integer-ppm arithmetic — the
  * iterative-graph-computation class (beside the one-shot
  * [[Components]] closure): rank flows along edges for a FIXED number
  * of rounds, each round one edge join + one aggregate.
  *
  * Determinism across engines is the design constraint: float
  * PageRank cannot replay bit-for-bit (summation order moves the
  * lowest bits), so ranks are scaled integers (1.0 = 1,000,000) and
  * each round computes `r' = (1e6 - d) + d * Σ(r_u DIV odeg_u) DIV
  * 1e6` — integer division per out-share, exact integer sums
  * (order-free), one integer damping division. The same unrolled
  * arithmetic replays in a chained-CTE DuckDB oracle.
  *
  * Scale shape: the edge list and node/out-degree tables are computed
  * once (cached in the ambient [[graft.core.CacheScope]]); each round
  * is a share projection, an equi-join on `src`, and a map-side-
  * combined sum by `dst` — the canonical one-shuffle-per-iteration
  * plan. Fixed `iters` keeps the unrolled plan bounded; beyond ~10
  * rounds a production caller would localCheckpoint between rounds.
  * Dangling nodes (no out-edges) simply leak their mass — the
  * standard simplification; a symmetric edge list has none.
  */
object PageRank {

  /** One row per node: (node, rank_ppm) after `iters` rounds from a
    * uniform 1,000,000-ppm start. `edges` is a directed (src, dst)
    * list; duplicates are collapsed. */
  def ranks(
      edges: DataFrame, iters: Int = 5,
      dampingPpm: Long = 850000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(dampingPpm >= 0L && dampingPpm <= 1000000L,
      "dampingPpm must be a ppm fraction")
    // ONE src-partitioning carries every round (guide §2.4): the edge
    // list is repartitioned by src BEFORE the dedup aggregate —
    // hashpartitioning(src) satisfies the (src, dst) grouping (same
    // src lands in one partition), so the dedup inserts no second
    // exchange and the CACHED frame materializes partitioned by src.
    // Each iteration's share join then reuses that partitioning and
    // only node-sized frames move; the old distinct() cached the
    // edges partitioned by (src, dst), and every one of the `iters`
    // share joins re-exchanged the FULL edge list by src.
    val e = graft.core.CacheScope.cache(
      edges.select(col("src"), col("dst"))
        .repartition(col("src"))
        .dropDuplicates("src", "dst"))
    val nodes = graft.core.CacheScope.cache(
      e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct())
    val odeg = graft.core.CacheScope.cache(
      e.groupBy(col("src")).agg(count(lit(1)).as("odeg")))
    val base = 1000000L - dampingPpm
    var r = nodes.withColumn("r", lit(1000000L))
    (1 to iters).foreach { _ =>
      val share = r.join(odeg, col("node") === col("src"))
        .select(col("src"), expr("r DIV odeg").as("share"))
      val mass = e.join(share, Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("share")).as("mass"))
      // truncate the lineage every round: without it each round's
      // plan embeds all prior rounds and analysis/optimization cost
      // grows super-linearly in `iters` (measured: 10.2 s → 7.0 s at
      // sf0.1 for the 5-round entry, and the gap widens with iters).
      // localCheckpoint keeps the materialization distributed
      // (executor-local blocks) — the standard iterative-Spark
      // posture.
      r = nodes.join(mass, Seq("node"), "left")
        .select(col("node"),
          expr(s"$base + $dampingPpm * coalesce(mass, 0) DIV 1000000")
            .cast("long").as("r"))
        .localCheckpoint()
    }
    r.select(col("node"), col("r").as("rank_ppm"))
  }
}
