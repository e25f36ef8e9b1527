package graft

import org.apache.spark.sql.functions._
import graft.ops.Ols

/** OLS runtime-prediction invariants behind `q_runtime_predict` /
  * `q_predict_mape`: hand-computed exact fits, determinism under
  * partitioning (the sufficient statistics are exact integer sums),
  * loud failure on collinear designs, and the integer MAPE report.
  */
class OlsSpec extends SparkSpec {
  import spark.implicits._

  test("one-feature fit recovers an exact linear law") {
    // y = 3 + 2x exactly — the normal equations solve with zero
    // residual, so the ppm weights are exact
    val df = Seq((0L, 3L), (1L, 5L), (2L, 7L)).toDF("x", "y")
    val m = Ols.fit(df, Seq("x"), "y")
    assert(m.wPpm.toSeq === Seq(3000000L, 2000000L))
  }

  test("two-feature fit recovers y = 1 + 2a + 3b (hand-computed)") {
    val df = Seq(
      (0L, 0L, 1L), (1L, 0L, 3L), (0L, 1L, 4L),
      (1L, 1L, 6L), (2L, 1L, 8L)).toDF("a", "b", "y")
    val m = Ols.fit(df, Seq("a", "b"), "y")
    assert(m.wPpm.toSeq === Seq(1000000L, 2000000L, 3000000L))
  }

  test("fit is bit-deterministic under any partitioning") {
    // noisy data (no exact solution) — the weights must still be a
    // pure function of the data because X'X / X'y accumulate as
    // exact decimals, and the driver solve is fixed-order
    val rows = (0 until 500).map { i =>
      (i.toLong % 37, (i * i).toLong % 101, (3 + 2 * (i % 37) + (i % 7)).toLong)
    }
    val a = Ols.fit(rows.toDF("x1", "x2", "y").repartition(1),
      Seq("x1", "x2"), "y")
    val b = Ols.fit(rows.toDF("x1", "x2", "y").repartition(17),
      Seq("x1", "x2"), "y")
    assert(a.wPpm.toSeq === b.wPpm.toSeq)
  }

  test("collinear design fails loudly, never pseudo-solves") {
    val df = Seq((1L, 2L, 5L), (2L, 4L, 7L), (3L, 6L, 9L))
      .toDF("x", "x2", "y") // x2 = 2x exactly
    val e = intercept[IllegalArgumentException] {
      Ols.fit(df, Seq("x", "x2"), "y")
    }
    assert(e.getMessage.contains("singular"))
  }

  test("mapeReport: exact integer APE per row, DIV semantics") {
    val m = Ols.Model(Array(1000000L, 2000000L)) // y = 1 + 2x
    val df = Seq((1L, 3L, "A"), (2L, 4L, "A"), (1L, 6L, "B"))
      .toDF("x", "y", "g")
    val got = Ols.mapeReport(df, m, Seq("x"), "y", "g")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // A: pred(1)=3 exact -> ape 0; pred(2)=5 vs 4 -> |5e6-4e6| DIV 4 = 250000
    // B: pred(1)=3 vs 6 -> 3e6 DIV 6 = 500000
    assert(got === Array(
      ("A", 2L, 250000L, 125000L),
      ("B", 1L, 500000L, 500000L)))
  }

  test("fitPerGroup: each group's one-pass model equals the filtered global fit") {
    val df = Seq(
      ("a", 0L, 3L), ("a", 1L, 5L), ("a", 2L, 7L),   // y = 3 + 2x
      ("b", 0L, 1L), ("b", 1L, 4L), ("b", 2L, 7L),   // y = 1 + 3x
      ("b", 3L, 10L)).toDF("g", "x", "y")
    val ms = Ols.fitPerGroup(df, Seq("x"), "y", "g")
    assert(ms.keySet === Set("a", "b"))
    assert(ms("a").wPpm.toSeq ===
      Ols.fit(df.filter($"g" === "a"), Seq("x"), "y").wPpm.toSeq)
    assert(ms("b").wPpm.toSeq ===
      Ols.fit(df.filter($"g" === "b"), Seq("x"), "y").wPpm.toSeq)
    assert(ms("a").wPpm.toSeq === Seq(3000000L, 2000000L))
    assert(ms("b").wPpm.toSeq === Seq(1000000L, 3000000L))
    // grouped scoring routes each row through ITS group's weights
    val preds = df
      .select($"g", $"x",
        Ols.predictPpmGrouped(ms, Seq("x"), "g").as("p"))
      .orderBy("g", "x").as[(String, Long, Long)].collect()
    assert(preds.take(3).map(_._3).toSeq ===
      Seq(3000000L, 5000000L, 7000000L))
    assert(preds.drop(3).map(_._3).toSeq ===
      Seq(1000000L, 4000000L, 7000000L, 10000000L))
  }

  test("predictPpm stays inside whole-stage codegen (no UDF, no join)") {
    val m = Ols.Model(Array(5L, 7L, 11L))
    // a non-local source, or the optimizer folds the whole projection
    // into a LocalTableScan and there is nothing left to codegen
    val df = spark.range(1, 2)
      .select(col("id").as("a"), (col("id") * 2).as("b"))
      .select(Ols.predictPpm(m, Seq("a", "b")).as("p"))
    assert(df.head().getLong(0) === 5L + 7L * 1 + 11L * 2)
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty,
      df.queryExecution.executedPlan.toString.take(400))
  }
}
