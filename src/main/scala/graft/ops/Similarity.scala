package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs.dotFast

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Brute-force cosine top-k is the correctness baseline; sign-LSH
  * bucketing is the scale path (candidates meet only inside a
  * bucket — an equi-join — instead of all-pairs).
  *
  * Performance notes (measured at sf0.1):
  *  - dot products use the codegen'd [[graft.functions.DotProduct]]
  *    expression (one primitive loop per pair) — the `zip_with` +
  *    `aggregate` composition interprets lambdas over boxed doubles
  *    and was ~40x slower at 4M pairs;
  *  - the ranking shuffle carries only (q_id, vec_id, sim) — vectors
  *    are projected away *before* the window exchange (512 B/row of
  *    embedding payload otherwise rides the sort);
  *  - single-file local scans are repartitioned so the candidate
  *    scoring parallelizes (a cluster read of many splits gets this
  *    for free).
  */
object Similarity {

  /** Sequential left-fold dot product — bit-identical to the oracle's
    * index-order accumulation. */
  def dot(a: Column, b: Column): Column = dotFast(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Embeddings with the vector cast to double (exact widening), the
    * norm precomputed once per vector, and partitions spread for
    * parallel scoring. */
  def prepared(emb: DataFrame): DataFrame = {
    val parallelism = emb.sparkSession.sparkContext.defaultParallelism
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .repartition(parallelism)
      .withColumn("nrm", norm(col("v")))
  }

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored
      .select(col("q_id"), col("vec_id"), col("sim")) // slim before exchange
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Brute-force cosine top-k: broadcast the (small) query set against
    * all vectors, rank per query. The scan side never shuffles; cost
    * is one pass over the corpus per batch of queries. */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val e = prepared(emb)
    val q = prepared(queries).select(
      col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.join(broadcast(q), col("q_id") =!= col("vec_id"))
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    rankTopK(scored, k)
  }

  /** Deterministic ±1 hyperplane matrix (SplitMix64 from a fixed
    * seed), materialized driver-side and shipped as literals — the
    * per-row work is then `nBits` codegen'd dot products instead of
    * interpreted lambda+hash evaluation per element. */
  private def planes(nBits: Int, dims: Int): Seq[Array[Double]] =
    (0 until nBits).map { j =>
      Array.tabulate(dims) { i =>
        var z = j.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L + 42L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        if ((z & 1L) == 1L) 1.0 else -1.0
      }
    }

  /** Sign-LSH bucket id: `nBits` hyperplane sign bits packed into a
    * long. Random-hyperplane LSH preserves cosine locality. */
  def lshBucket(v: Column, nBits: Int = 12, dims: Int = 64): Column =
    planes(nBits, dims).zipWithIndex.map { case (p, j) =>
      val plane = array(p.toIndexedSeq.map(lit): _*)
      when(dot(v, plane) > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)

  /** Bucketed ANN: rank candidates within each query's bucket only.
    * Recall < 1 by construction; the probe count (bucket width) is
    * the tuning knob. */
  def lshTopK(emb: DataFrame, queryMaxId: Long, k: Int, nBits: Int = 12): DataFrame = {
    val e = prepared(emb).withColumn("bucket", lshBucket(col("v"), nBits))
    val q = e.filter(col("vec_id") < queryMaxId).select(
      col("vec_id").as("q_id"), col("v").as("qv"),
      col("nrm").as("qn"), col("bucket"))
    val scored = e.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    rankTopK(scored, k)
  }

  /** Nearest neighbor (top-1) for every vector — the embedding-cosine
    * near-duplicate detector. Brute force here; [[lshTopK]] is the
    * 100 TB path. */
  def nearestNeighbor(emb: DataFrame): DataFrame = {
    val e = prepared(emb)
    val a = e.select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.join(a, col("q_id") =!= col("vec_id"))
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored
      .select(col("q_id"), col("vec_id"), col("sim")) // slim before exchange
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("q_id").as("vec_id"), col("vec_id").as("nn_id"), col("sim"))
      .orderBy(col("vec_id"))
  }
}
