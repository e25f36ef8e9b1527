package graft

import graft.ops.Centroids

class CentroidsSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated labeled clusters plus one mislabeled vector
  // sitting inside the other cluster
  private def emb = Seq(
    (1L, Seq(1.0f, 0.0f), 0),
    (2L, Seq(0.9f, 0.1f), 0),
    (3L, Seq(0.0f, 1.0f), 1),
    (4L, Seq(0.1f, 0.9f), 1),
    (5L, Seq(0.05f, 0.95f), 0)) // labeled 0, lives with cluster 1
    .toDF("vec_id", "embedding", "label")

  test("centroids are the rounded integer-thousandth means") {
    val c = Centroids.labelCentroids(Centroids.quantized(emb))
      .orderBy("label").collect()
    // label 0: mean of (1000,0), (900,100), (50,950) = (650, 350)
    assert(c(0).getLong(0) === 0L && c(0).getLong(1) === 3L)
    assert(c(0).getSeq[Long](2) === Seq(650L, 350L))
    // label 1: mean of (0,1000), (100,900) = (50, 950)
    assert(c(1).getSeq[Long](2) === Seq(50L, 950L))
  }

  test("rounded division is half-up including sub-thousandth means") {
    // label 7: elements average to 0.3335 -> 334 thousandths (half-up)
    val e = Seq(
      (1L, Seq(0.333f), 7),
      (2L, Seq(0.334f), 7)).toDF("vec_id", "embedding", "label")
    val c = Centroids.labelCentroids(Centroids.quantized(e)).collect()
    assert(c.head.getSeq[Long](2) === Seq(334L))
  }

  test("mislabeled vector lands on the other label's centroid") {
    val r = Centroids.confusionReport(emb)
      .orderBy("label", "assigned").collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> (x.getLong(2), x.getLong(3)))
      .toMap
    // label 0: two of three stay (the centroid is dragged toward the
    // planted outlier but 1,2 remain closer to it), the mislabeled
    // vector crosses to centroid 1
    assert(r((0L, 0L)) === ((2L, 666666L)))
    assert(r((0L, 1L)) === ((1L, 333333L)))
    assert(r((1L, 1L)) === ((2L, 1000000L)))
    assert(!r.contains((1L, 0L)))
  }

  test("distance ties assign the smaller centroid label") {
    // two labels with identical centroids: every vector ties and must
    // resolve to label 0
    val e = Seq(
      (1L, Seq(1.0f, 0.0f), 5),
      (2L, Seq(1.0f, 0.0f), 9)).toDF("vec_id", "embedding", "label")
    val r = Centroids.confusionReport(e).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(5L -> 5L, 9L -> 5L))
  }
}
