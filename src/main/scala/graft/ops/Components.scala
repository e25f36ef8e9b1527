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
  * graph. `localCheckpoint()` truncates the lineage at each batch of
  * rounds so the plan does not grow with iterations (the classic
  * iterative-DataFrame trap), and the convergence test reads the
  * already-materialized checkpoint, costing one cheap count per batch.
  */
object Components {

  /** One propagation round, declaratively: every node's label becomes
    * the min of its own and its neighbors' labels. Extra columns on
    * `cur` (e.g. the batch-start label) ride through untouched. */
  private def propagateOnce(sym: DataFrame, cur: DataFrame): DataFrame = {
    val nbrMin = sym
      .join(cur.select(col("id").as("nbr"), col("lbl").as("nlbl")), Seq("nbr"))
      .groupBy(col("id"))
      .agg(min(col("nlbl")).as("nlbl"))
    cur.join(nbrMin, Seq("id"), "left")
      .withColumn("lbl", least(col("lbl"), coalesce(col("nlbl"), col("lbl"))))
      .drop("nlbl")
  }

  /** Per-node component labels for `nodes` (single column `id`) under
    * `edges` (`id1`, `id2`, undirected). Output: (id, cluster_id)
    * where cluster_id = min node id reachable from id.
    *
    * Rounds run in BATCHES of `roundsPerCheck` between actions: each
    * batch is one materialization job (the chained declarative rounds)
    * plus one cheap count over the materialized result — sequential
    * tiny jobs, not data volume, dominate this loop's cost, so halving
    * the action count roughly halves the wall clock. Convergence is
    * detected by carrying the batch-start label (`lbl0`) through the
    * chain: no comparison join needed. A no-change batch is a
    * fortiori a no-change round, so the fixpoint test stays exact.
    */
  def connectedComponents(
      nodes: DataFrame, edges: DataFrame, maxIters: Int = 25,
      roundsPerCheck: Int = 2): DataFrame = {
    // one pass over the edge list (a union of two selects would scan
    // the — possibly expensive — candidate plan twice on first use)
    val sym = edges.select(explode(array(
        struct(col("id1").as("id"), col("id2").as("nbr")),
        struct(col("id2").as("id"), col("id1").as("nbr")))).as("e"))
      .select(col("e.id").as("id"), col("e.nbr").as("nbr"))
      .cache()
    var labels = nodes.select(col("id"), col("id").as("lbl")).localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val rounds = math.min(roundsPerCheck, maxIters - iter)
      var cur = labels.withColumn("lbl0", col("lbl"))
      for (_ <- 0 until rounds) cur = propagateOnce(sym, cur)
      val next = cur
        .withColumn("chg", col("lbl") =!= col("lbl0"))
        .select(col("id"), col("lbl"), col("chg"))
        .localCheckpoint()
      changed = next.filter(col("chg")).count()
      labels = next.select(col("id"), col("lbl"))
      iter += rounds
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
