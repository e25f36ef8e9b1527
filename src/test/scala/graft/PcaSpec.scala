package graft

import org.apache.spark.sql.functions._
import graft.ops.Pca

/** PCA invariants behind `q_pca_project`: a planted dominant
  * direction is recovered, components come out orthonormal in ppm,
  * the sign convention and the exact statistics make the model a
  * pure function of the data (partitioning-invariant), and the
  * projection column is exact integer arithmetic.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // points spread along (1,1,0) with small jitter on the other axes —
  // PC1 must recover the diagonal, PC2 an orthogonal direction
  private def planted(n: Int): Seq[(Long, Seq[Float])] =
    (0 until n).map { i =>
      val t = (i - n / 2).toFloat
      (i.toLong, Seq(t + 0.01f * (i % 3), t - 0.01f * (i % 5),
        0.1f * ((i % 7) - 3)))
    }

  test("planted dominant direction recovered; components orthonormal in ppm") {
    val df = planted(60).toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", dims = 3, nComponents = 2)
    val c1 = m.compPpm(0)
    // PC1 ~ (1,1,0)/sqrt(2) = (707107, 707107, 0) ppm
    assert(math.abs(c1(0) - 707107L) <= 500, c1.toSeq)
    assert(math.abs(c1(1) - 707107L) <= 500, c1.toSeq)
    assert(math.abs(c1(2)) <= 5000, c1.toSeq)
    // unit norms and orthogonality, all in ppm
    m.compPpm.foreach { c =>
      val n2 = c.map(x => x * x).sum
      assert(math.abs(n2 - 1000000L * 1000000L) <= 3L * 1000000L, n2)
    }
    val dot12 = m.compPpm(0).zip(m.compPpm(1))
      .map { case (a, b) => a * b }.sum
    assert(math.abs(dot12) <= 3L * 1000000L, dot12)
  }

  test("model is a pure function of the data: partitioning-invariant, fixed sign") {
    val rows = planted(40)
    val a = Pca.fit(rows.toDF("vec_id", "embedding").repartition(1),
      "embedding", dims = 3, nComponents = 2)
    val b = Pca.fit(rows.toDF("vec_id", "embedding").repartition(13),
      "embedding", dims = 3, nComponents = 2)
    assert(a.compPpm.map(_.toSeq) === b.compPpm.map(_.toSeq))
    // sign convention: the largest-|coordinate| entry is positive
    a.compPpm.foreach { c =>
      assert(c(c.zipWithIndex.maxBy(p => (math.abs(p._1), -p._2))._2) > 0)
    }
  }

  test("magnitude-adaptive flush: large coordinates stay exact where " +
      "a fixed 8192-row window would silently wrap a long") {
    // |f| ~ 40 -> q ~ 4e7 -> q^2 ~ 1.6e15 per row; 8192 near-max rows
    // sum to ~1.3e19 > Long.MAX — the old fixed window corrupted this
    // silently. The adaptive cap (2^62 / maxQ^2 ~ 2882 rows) flushes
    // in time, so one fat partition and many thin ones (which never
    // filled a window) must agree, and PC1 must still be the plant.
    val n = 9000
    val rows = (0 until n).map { i =>
      val s = (if (i % 2 == 0) 1.0f else -1.0f) *
        (1.0f - 0.0001f * (i % 7))
      (i.toLong, Seq(40f * s, 20f * s + 0.02f * (i % 5)))
    }
    val one = Pca.fit(rows.toDF("vec_id", "embedding").repartition(1),
      "embedding", dims = 2, nComponents = 1)
    val many = Pca.fit(rows.toDF("vec_id", "embedding").repartition(17),
      "embedding", dims = 2, nComponents = 1)
    assert(one.compPpm.map(_.toSeq) === many.compPpm.map(_.toSeq))
    val c = one.compPpm(0)
    // PC1 ~ (2,1)/sqrt(5) = (894427, 447214) ppm
    assert(math.abs(c(0) - 894427L) <= 2000, c.toSeq)
    assert(math.abs(c(1) - 447214L) <= 2000, c.toSeq)
  }

  test("coordinates beyond the exact-fold magnitude bound are refused") {
    // |f| >= ~2147 -> q >= 2^31: a single q*q long product would
    // overflow — the fold must refuse loudly, never corrupt silently
    val df = Seq((1L, Seq(3000f, 0f)), (2L, Seq(1f, 1f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Pca.fit(df, "embedding", dims = 2, nComponents = 1)
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + msgs(t.getCause)
    assert(msgs(e).contains("exact-fold bound"), msgs(e))
  }

  test("projectPpm is exact integer arithmetic over quantized coords") {
    val df = Seq((1L, Seq(0.5f, -0.25f))).toDF("vec_id", "embedding")
    val m = Pca.Model(Vector(Array(600000L, -800000L)))
    val p = df.select(Pca.projectPpm(m, "embedding", 0)).head().getLong(0)
    // q = (500000, -250000); p = 600000*500000 + (-800000)*(-250000)
    assert(p === 600000L * 500000L + 800000L * 250000L)
  }

  test("pcaProjectAll kernel ≡ per-component projectPpm expressions") {
    // awkward magnitudes: exact .5 ties (HALF_UP both ways), negatives,
    // float→double widening artifacts — the one-loop kernel must match
    // the declarative spelling bit for bit on every component
    val rows = Seq(
      (1L, Seq(0.5f, -0.25f, 0.0000005f, -0.0000005f)),
      (2L, Seq(-1.5f, 2.5f, 0.1f, -0.3f)),
      (3L, Seq(0.123456f, -0.654321f, 1.999999f, -1.000001f)))
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.Model(Vector(
      Array(600000L, -800000L, 123L, -456L),
      Array(-1L, 2L, -3L, 4L),
      Array(999999L, 999999L, -999999L, -999999L)))
    val viaExpr = df.select(col("vec_id") +: (0 until 3).map(c =>
        Pca.projectPpm(m, "embedding", c).as(s"p$c")): _*)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val viaKernel = df.select(col("vec_id"),
        graft.functions.VectorExprs.pcaProjectAll(
          col("embedding").cast("array<double>"), m.compPpm).as("pa"))
      .select(col("vec_id"), element_at(col("pa"), 1),
        element_at(col("pa"), 2), element_at(col("pa"), 3))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(viaKernel === viaExpr)
  }
}
