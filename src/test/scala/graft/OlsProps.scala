package graft

import org.scalacheck.{Gen, Prop}
import graft.ops.Ols

/** Generative check of the OLS fit: on any consistent integer system
  * y = w0 + Σ wᵢ·xᵢ (zero residual, non-singular design), the
  * normal-equation solve must recover the generating weights EXACTLY
  * in ppm — across random weight vectors, feature widths, row counts
  * and partitionings. This pins the whole chain (sufficient-statistics
  * aggregate → decimal exactness → driver solve → ppm rounding) far
  * beyond the two hand-computed spec vectors.
  */
object OlsProps extends SparkProperties("ols") {

  private val genCase = for {
    k <- Gen.choose(1, 3)
    w <- Gen.listOfN(k + 1, Gen.choose(-9L, 9L))
    n <- Gen.choose(k + 6, 40)
    parts <- Gen.choose(1, 7)
    // feature rows with enough spread that the design is (almost
    // surely) full-rank; collinear draws are discarded below
    xs <- Gen.listOfN(n, Gen.listOfN(k, Gen.choose(0L, 20L)))
  } yield (w, xs, parts)

  property("exact linear law recovered exactly, any partitioning") =
    Prop.forAll(genCase) { case (w, xs, parts) =>
      val rows = xs.map { x =>
        val y = w.head + w.tail.zip(x).map { case (wi, xi) => wi * xi }.sum
        (x :+ y).toArray
      }
      val cols = (1 to w.length - 1).map(i => s"x$i") :+ "y"
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq)), parts),
        org.apache.spark.sql.types.StructType(cols.map(c =>
          org.apache.spark.sql.types.StructField(c,
            org.apache.spark.sql.types.LongType))))
      try {
        val m = Ols.fit(df, cols.init, "y")
        Prop(m.wPpm.toSeq == w.map(_ * 1000000L)) :|
          s"got ${m.wPpm.toSeq}, want ${w.map(_ * 1000000L)}"
      } catch {
        // a genuinely collinear random draw has no unique solution —
        // the loud refusal IS the contract; discard the case
        case e: IllegalArgumentException
          if e.getMessage.contains("singular") => Prop.undecided
      }
    }
}
