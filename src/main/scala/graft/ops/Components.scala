package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a candidate-pair edge list — the cluster
  * resolution step of a dedup pipeline. Candidate generators
  * ([[Dedup.minhashCandidates]], [[Dedup.jaccardPairs]],
  * [[Similarity.lshNearestNeighbor]]) emit PAIRS; production dedup
  * needs per-document cluster ids (keep one canonical doc per
  * component, drop the rest).
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with its own id; each round a node takes the min of its
  * label and its neighbors' labels; fixpoint = every node carries the
  * min id of its component. Rounds = O(component diameter) — near-dup
  * graphs are dense cliques with tiny diameter, so 2-4 rounds is
  * typical. Each round is two bounded shuffles over slim (long, long)
  * rows: one equi-join of the symmetric edge list against the current
  * labels, one min-aggregate — no all-pairs work, no driver-side
  * graph. `localCheckpoint()` truncates the per-round lineage so the
  * plan does not grow with iterations (the classic iterative-DataFrame
  * trap), and the convergence test reads the already-materialized
  * checkpoint, costing one cheap count per round.
  */
object Components {

  /** Per-node component labels for `nodes` (single column `id`) under
    * `edges` (`id1`, `id2`, undirected). Output: (id, cluster_id)
    * where cluster_id = min node id reachable from id.
    */
  def connectedComponents(
      nodes: DataFrame, edges: DataFrame, maxIters: Int = 25): DataFrame = {
    val sym = edges.select(col("id1").as("id"), col("id2").as("nbr"))
      .union(edges.select(col("id2").as("id"), col("id1").as("nbr")))
      .cache()
    var labels = nodes.select(col("id"), col("id").as("lbl")).localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val nbrMin = sym
        .join(labels.select(col("id").as("nbr"), col("lbl").as("nlbl")), Seq("nbr"))
        .groupBy(col("id"))
        .agg(min(col("nlbl")).as("nlbl"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(
          col("id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"),
          coalesce(col("nlbl") < col("lbl"), lit(false)).as("chg"))
        .localCheckpoint()
      changed = next.filter(col("chg")).count()
      labels = next.select(col("id"), col("lbl"))
      iter += 1
    }
    sym.unpersist()
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }

  /** Labels -> per-node cluster assignment with component size (the
    * shape a dedup filter consumes: keep id == cluster_id, or keep
    * cluster_size == 1 plus one canonical per larger cluster). */
  def withClusterSizes(labels: DataFrame): DataFrame = {
    val sizes = labels.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("cluster_id"))
      .select(col("id"), col("cluster_id"), col("cluster_size"))
  }
}
