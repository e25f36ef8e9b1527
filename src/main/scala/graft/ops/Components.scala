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
  * min id of its component. Near-dup graphs are dense cliques with
  * tiny diameter, so 2-4 rounds is typical; a pointer-jumping step
  * per batch doubles the established reach, so even long-path
  * components converge in O(log diameter) batches. Each round is two
  * bounded shuffles over slim (long, long) rows: one equi-join of the
  * symmetric edge list against the current labels, one min-aggregate
  * — no all-pairs work, no driver-side graph. `localCheckpoint()` truncates the lineage at each batch of
  * rounds so the plan does not grow with iterations (the classic
  * iterative-DataFrame trap), and the convergence test reads the
  * already-materialized checkpoint, costing one cheap count per batch.
  */
object Components {

  /** One propagation round, declaratively: every node's label becomes
    * the min of its own and its neighbors' labels. Extra columns on
    * `cur` (e.g. the batch-start label) ride through untouched.
    *
    * "Min of own and neighbors'" is ONE aggregate over the union of
    * own rows and neighbor contributions — the earlier
    * aggregate-then-left-join spelling shuffled the label table a
    * second time (by id for the join) after the neighbor aggregate
    * had already exchanged by id; the union form groups both row
    * kinds in that single exchange (guide §2.4: operations keyed the
    * same way share one shuffle). Extra columns ride as null on the
    * neighbor rows and fold back with a null-skipping min — they are
    * functionally dependent on id, so the min IS the own-row value. */
  private def propagateOnce(sym: DataFrame, cur: DataFrame): DataFrame = {
    val extra = cur.schema.filterNot(f => f.name == "id" || f.name == "lbl")
    val nbrRows = extra.foldLeft(
      sym.join(cur.select(col("id").as("nbr"), col("lbl").as("nlbl")),
          Seq("nbr"))
        .select(col("id"), col("nlbl").as("lbl"))) {
      (d, f) => d.withColumn(f.name, lit(null).cast(f.dataType))
    }
    cur.unionByName(nbrRows)
      .groupBy(col("id"))
      .agg(min(col("lbl")).as("lbl"),
        extra.map(f => min(col(f.name)).as(f.name)): _*)
  }

  /** One pointer-jumping round: every node's label becomes the min of
    * its label and its LABEL's label (labels are node ids, so the
    * label table joins against itself). Jumping doubles the reach a
    * propagation chain has already established, so a batch of
    * propagations + one jump converges in O(log diameter) batches
    * instead of O(diameter) — near-dup cliques never notice (they
    * converge in 1-2 batches either way), but a long-path component
    * at 100 TB does. One extra slim equi-join per batch. */
  private def pointerJumpOnce(cur: DataFrame): DataFrame = {
    val parent = cur.select(col("lbl").as("jlbl"), col("id").as("lbl"))
    cur.join(parent, Seq("lbl"), "left")
      .withColumn("lbl", least(col("lbl"), coalesce(col("jlbl"), col("lbl"))))
      .drop("jlbl")
  }

  /** Per-node component labels for `nodes` (single column `id`) under
    * `edges` (`id1`, `id2`, undirected; endpoints must be drawn from
    * `nodes` — every caller derives pairs from the same id set it
    * labels). Output: (id, cluster_id) where cluster_id = min node id
    * reachable from id.
    *
    * Rounds run in BATCHES of `roundsPerCheck` between actions: each
    * batch is one materialization job (the chained declarative rounds)
    * plus one cheap count over the materialized result — sequential
    * tiny jobs, not data volume, dominate this loop's cost, so halving
    * the action count roughly halves the wall clock. Convergence is
    * detected by carrying the label as of the LAST round's entry
    * (`lblp`) through the chain — labels only decrease, so
    * final-round-and-jump-changed-nothing is exactly "that application
    * was a no-op", i.e. the propagation fixpoint: the batch that
    * converges also detects it, with no confirmation batch after.
    */
  def connectedComponents(
      nodes: DataFrame, edges: DataFrame, maxIters: Int = 25,
      roundsPerCheck: Int = 2): DataFrame = {
    // one pass over the edge list (a union of two selects would scan
    // the — possibly expensive — candidate plan twice on first use);
    // cached PARTITIONED BY nbr — every round's propagation joins on
    // nbr, so one exchange at build time carries all rounds instead of
    // re-shuffling the edge list per round (the PageRank move)
    val sym = edges.select(explode(array(
        struct(col("id1").as("id"), col("id2").as("nbr")),
        struct(col("id2").as("id"), col("id1").as("nbr")))).as("e"))
      .select(col("e.id").as("id"), col("e.nbr").as("nbr"))
      .repartition(col("nbr"))
      .cache()
    var labels = nodes.select(col("id"), col("id").as("lbl")).localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val rounds = math.min(roundsPerCheck, maxIters - iter)
      var cur = labels
      for (i <- 0 until rounds) {
        if (i == rounds - 1) cur = cur.withColumn("lblp", col("lbl"))
        cur = propagateOnce(sym, cur)
      }
      cur = pointerJumpOnce(cur)
      val next = cur
        .withColumn("chg", col("lbl") =!= col("lblp"))
        .select(col("id"), col("lbl"), col("chg"))
        .localCheckpoint()
      changed = next.filter(col("chg")).count()
      labels = next.select(col("id"), col("lbl"))
      iter += rounds
    }
    sym.unpersist()
    // wrong-loud beats wrong-silent: a non-converged exit would hand
    // the dedup filter partial clusters (docs kept that should drop)
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIters rounds " +
        s"($changed labels still moving); raise maxIters — with pointer " +
        "jumping the reachable diameter doubles per batch, so a few " +
        "extra rounds cover any practical graph")
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
