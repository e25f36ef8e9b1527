package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.CacheScope.Scoped

/** SemDeDup (Abbas et al. 2023): semantic deduplication by k-means
  * clustering the embedding space and removing near-duplicates
  * WITHIN each cluster — pairwise cosine comparison happens only
  * inside a cluster, so the all-pairs O(n²) the doc-level
  * embedding near-dup pays becomes O(sum of cluster sizes²), a
  * ~n/k-fold reduction at the cost of missing cross-cluster pairs
  * (the paper's accepted trade).
  *
  * Keep rule: within a cluster, a vector is a duplicate if some
  * LOWER-id vector sits within cosine `eps`; the lowest id of each
  * duplicate group survives. (The paper keeps the member farthest
  * from the centroid; the lowest-id rule is the deterministic greedy
  * variant — same clusters, same duplicate sets, an id-stable choice
  * of survivor that replays exactly in the oracle.)
  *
  * Scale shape: clustering reuses [[Ivf.train]] (Lloyd's with a
  * k-row driver matrix; assignments distributed) and [[Ivf.assigned]]
  * (broadcast centroid join + map-side argmax). The dedup pass is an
  * equi-join on `cluster` — at corpus scale `nClusters` should grow
  * ~sqrt(n) to keep per-cluster pair counts bounded; a skewed (giant)
  * cluster is the known failure mode and AQE's skew-split applies to
  * the probe side. The trained model is stashed in [[lastModel]] so
  * the DuckDB oracle can replay the data-dependent assignment with
  * the centroids as literals (same contract as [[Ivf.lastModel]]).
  */
object SemDedup {

  final case class Model(
      centroids: Array[Array[Double]], eps: Double, nClusters: Int)
  @volatile var lastModel: Option[Model] = None

  /** One row per vector: (vec_id, cluster, keep, dup_of, best_sim)
    * where `dup_of` is the LOWEST lower id within `eps` in the same
    * cluster (-1 when none — then keep=1) and `best_sim` the highest
    * such similarity (0.0 when none). */
  def report(
      emb: DataFrame, eps: Double,
      nClusters: Int = 16, iters: Int = 3): DataFrame = {
    val base = Similarity.prepared(emb).scopedCache() // train + assign reuse
    val centroids = Ivf.train(base, nClusters, iters)
    lastModel = Some(Model(centroids, eps, nClusters))
    val a = Ivf.assigned(base, centroids).scopedCache() // both sides of the self-join
    val lower = a.select(col("cluster"), col("vec_id").as("b_id"),
      col("v").as("bv"), col("nrm").as("bn"))
    val dups = a.join(lower, Seq("cluster"))
      .filter(col("b_id") < col("vec_id"))
      .withColumn("sim",
        Similarity.dot(col("v"), col("bv")) / (col("nrm") * col("bn")))
      .filter(col("sim") >= eps)
      .groupBy(col("vec_id"))
      .agg(min(col("b_id")).as("dup_of"), max(col("sim")).as("best_sim"))
    a.select(col("vec_id"), col("cluster").cast("long").as("cluster"))
      .join(dups, Seq("vec_id"), "left")
      .withColumn("keep", col("dup_of").isNull.cast("long"))
      .na.fill(-1L, Seq("dup_of"))
      .na.fill(0.0, Seq("best_sim"))
  }
}
