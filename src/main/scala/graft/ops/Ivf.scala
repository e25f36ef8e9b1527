package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN: k-means coarse quantizer + probe-limited
  * exact search — the second scale path next to sign-LSH.
  *
  * Training is Lloyd's algorithm with the k x dims centroid matrix
  * (tiny) collected to the driver each iteration and re-broadcast as
  * literals; assignments and means stay fully distributed. Search
  * scores a query only against the `nProbe` nearest centroids'
  * inverted lists — at corpus scale the scan cost drops by
  * ~nProbe/nClusters vs brute force.
  */
object Ivf {

  /** argmin-distance cluster id against literal centroids. Distance
    * rank uses v·c_j - |c_j|²/2 (monotone in euclidean distance for
    * fixed v); `array_max` over (score, j) structs picks the argmax
    * with deterministic tie-break on j. */
  def assignExpr(v: Column, centroids: Array[Array[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, j) =>
      val cCol = array(c.toIndexedSeq.map(lit): _*)
      val half = c.map(x => x * x).sum / 2.0
      struct((Similarity.dot(v, cCol) - lit(half)).as("s"), lit(j).as("j"))
    }
    array_max(array(scored.toIndexedSeq: _*)).getField("j")
  }

  /** Deterministic init (first k vectors) + `iters` Lloyd steps.
    * `prepared` must be [[Similarity.prepared]] output (cached by the
    * caller when reused downstream). */
  def train(prepared: DataFrame, k: Int = 16, iters: Int = 3): Array[Array[Double]] = {
    val e = prepared.select(col("vec_id"), col("v"))
    var centroids: Array[Array[Double]] = e.orderBy(col("vec_id")).limit(k)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    for (_ <- 0 until iters) {
      val means = e
        .withColumn("cluster", assignExpr(col("v"), centroids))
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      centroids = next
    }
    centroids
  }

  /** Probe-limited top-k: score queries only against vectors whose
    * cluster is among the query's `nProbe` closest centroids. */
  def ivfTopK(
      emb: DataFrame, queryMaxId: Long, k: Int,
      nClusters: Int = 16, nProbe: Int = 4, iters: Int = 3): DataFrame = {
    val base = Similarity.prepared(emb).cache() // shared by train + assign + probes
    val centroids = train(base, nClusters, iters)
    val e = base.withColumn("cluster", assignExpr(col("v"), centroids))
    // query -> its nProbe nearest clusters (small side, exploded)
    val probes = e.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        explode(array((0 until nClusters).map { j =>
          val cCol = array(centroids(j).toIndexedSeq.map(lit): _*)
          val half = centroids(j).map(x => x * x).sum / 2.0
          struct((Similarity.dot(col("v"), cCol) - lit(half)).as("s"), lit(j).as("j"))
        }: _*)).as("cand"))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cand.s").desc, col("cand.j"))))
      .filter(col("pr") <= nProbe)
      .select(col("q_id"), col("qv"), col("qn"), col("cand.j").as("cluster"))
    val scored = e.join(broadcast(probes), Seq("cluster"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim",
        Similarity.dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored
      .select(col("q_id"), col("vec_id"), col("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }
}
