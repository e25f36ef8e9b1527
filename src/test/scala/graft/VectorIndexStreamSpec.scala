package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Ivf, Similarity}
import graft.streaming.{EventStream, VectorIndexStream}

class VectorIndexStreamSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated planes of vectors; queries sit near each
  private def vec(seed: Int, plane: Int): Seq[Float] =
    Seq.tabulate(4)(d =>
      (if (plane == 0) 1.0f else -1.0f) * (1.0f + 0.01f * (seed * 4 + d)))

  private val batches = Seq(
    (0L to 3L).map(i => (i, vec(i.toInt, 0))),
    (4L to 7L).map(i => (i, vec(i.toInt, 1))),
    (8L to 9L).map(i => (i, vec(i.toInt, i.toInt % 2))))

  private def train(all: Seq[(Long, Seq[Float])]) =
    Ivf.train(Similarity.prepared(all.toDF("vec_id", "embedding")),
      k = 2, iters = 2)

  test("drained index equals the batch-assignment twin; search serves from it") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_vecstream").toString
    batches.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("vec_id", "embedding").coalesce(1)
        .write.parquet(s"$tmp/in/b$i.parquet")
    }
    EventStream.orderLanding(spark, s"$tmp/in/*.parquet", byName = true)
    val all = batches.flatten
    val centroids = train(all)
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*.parquet")
    val manifest = VectorIndexStream.runIngest(spark, stream, centroids,
      s"$tmp/index", s"$tmp/manifest", s"$tmp/ckpt")
    // manifest counts sum to the corpus size
    assert(manifest.agg(sum("n_vecs")).head().getLong(0) === all.size.toLong)
    // standing index assignment == batch twin over the union
    val standing = spark.read.option("basePath", s"$tmp/index")
      .parquet(s"$tmp/index")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster"))
      .toMap
    val twin = Ivf.assigned(
        Similarity.prepared(all.toDF("vec_id", "embedding")), centroids)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster"))
      .toMap
    assert(standing === twin)
    // search from the PERSISTED index: the planted same-plane
    // neighbors rank first
    val hits = VectorIndexStream.searchStanding(spark, s"$tmp/index",
        s"$tmp/manifest",
        Seq((0L, vec(0, 0))).toDF("vec_id", "embedding"),
        centroids, k = 3, nProbe = 1)
      .collect().map(_.getAs[Long]("neighbor_id"))
    assert(hits.length === 3)
    assert(hits.forall(id => twin(id) === twin(0L)))

    // redelivered committed batch is a no-op
    val before = spark.read.option("basePath", s"$tmp/index")
      .parquet(s"$tmp/index").count()
    VectorIndexStream.ingestBatch(spark,
      batches(1).toDF("vec_id", "embedding"), centroids,
      s"$tmp/index", s"$tmp/manifest", 1L)
    val after = spark.read.option("basePath", s"$tmp/index")
      .parquet(s"$tmp/index").count()
    assert(after === before)
  }

  test("a torn batch (index written, marker missing) is invisible to search") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_vectorn").toString
    val all = batches.flatten
    val centroids = train(all)
    // commit batch 0 properly
    VectorIndexStream.ingestBatch(spark,
      batches(0).toDF("vec_id", "embedding"), centroids,
      s"$tmp/index", s"$tmp/manifest", 0L)
    // tear batch 1: index partition lands, manifest never commits
    Ivf.assigned(Similarity.prepared(
        batches(1).toDF("vec_id", "embedding")), centroids)
      .select(col("cluster"), col("vec_id"), col("v"), col("nrm"))
      .write.mode("overwrite").parquet(s"$tmp/index/batch=1")
    val seen = VectorIndexStream.searchStanding(spark, s"$tmp/index",
        s"$tmp/manifest",
        Seq((99L, vec(3, 0))).toDF("vec_id", "embedding"),
        centroids, k = 10, nProbe = 2)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(seen === batches(0).map(_._1).toSet)
  }

  test("a completed compaction stage supersedes its merged batches for a READ-ONLY search") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_vecstage").toString
    val all = batches.take(2).flatten
    val centroids = train(all)
    (0 to 1).foreach { b =>
      VectorIndexStream.ingestBatch(spark,
        batches(b).toDF("vec_id", "embedding"), centroids,
        s"$tmp/index", s"$tmp/manifest", b.toLong)
    }
    // simulate the mid-swap window: batch 0's rows live in a
    // COMPLETED stage (.compact_0 with _SUCCESS), its source dir
    // already deleted, the rename not yet done
    spark.read.parquet(s"$tmp/index/batch=0")
      .write.parquet(s"$tmp/index/.compact_0")
    val fs = new org.apache.hadoop.fs.Path(s"$tmp/index")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$tmp/index/batch=0"), true)
    val seen = VectorIndexStream.searchStanding(spark, s"$tmp/index",
        s"$tmp/manifest",
        Seq((99L, vec(3, 0))).toDF("vec_id", "embedding"),
        centroids, k = 10, nProbe = 2)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    // every vector of BOTH batches is visible, none double-counted
    assert(seen === all.map(_._1).toSet)
    // and the read did NOT mutate the index (stage still staged)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$tmp/index/.compact_0/_SUCCESS")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$tmp/index/batch=0")))
  }
}
