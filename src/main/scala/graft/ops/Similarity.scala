package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Brute-force cosine top-k is the correctness baseline; sign-LSH
  * bucketing is the scale path (candidates meet only inside a
  * bucket — an equi-join — instead of all-pairs). Dot products are
  * pure `zip_with`/`aggregate` expressions: codegen'd, no UDF.
  */
object Similarity {

  /** Left-fold dot product (sequential, index order — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Embeddings with the vector cast to double (exact widening) and
    * the norm precomputed once per vector. */
  def prepared(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))

  /** Brute-force cosine top-k: broadcast the (small) query set against
    * all vectors, rank per query. The scan side never shuffles; cost
    * is one pass over the corpus per batch of queries. */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val e = prepared(emb)
    val q = prepared(queries).select(
      col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.join(broadcast(q), col("q_id") =!= col("vec_id"))
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Deterministic ±1 hyperplane component for (plane j, dim i):
    * parity of xxhash64(j, i). */
  private def planeSign(j: Int, i: Column): Column =
    when(xxhash64(lit(j), i).bitwiseAND(1L) === 1L, lit(1.0)).otherwise(lit(-1.0))

  /** Sign-LSH bucket id: `nBits` hyperplane sign bits packed into a
    * long. Random-hyperplane LSH preserves cosine locality. */
  def lshBucket(v: Column, nBits: Int = 12): Column =
    (0 until nBits).map { j =>
      val s = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * planeSign(j, i)),
        lit(0.0), (acc, x) => acc + x)
      when(s > 0, lit(1L << j)).otherwise(0L)
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
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
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
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("q_id").as("vec_id"), col("vec_id").as("nn_id"), col("sim"))
      .orderBy(col("vec_id"))
  }
}
