package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Multiple-regression runtime prediction — the reference's headline
  * analytic (SAAF's published result: ordinary-least-squares runtime
  * estimation from Linux CPU time accounting, "multiple regression to
  * estimate FaaS function runtime… MAPE ≈ 3.49%",
  * /root/reference/research.md:19, per-scenario error table
  * research/performance_modeling/IC2E Data.csv:3-9), re-expressed as
  * a distributed Spark aggregate.
  *
  * TRAINING is one map-side-combined pass: the normal-equation
  * sufficient statistics X'X and X'y — (k+1)(k+2)/2 + (k+1) scalar
  * sums over integer features — reduce to a single driver row; the
  * k×k solve happens at the driver on numbers that are EXACT (the
  * sums accumulate as DECIMAL(38,0): overflow-proof at any corpus
  * size, and integer addition is associative, so the statistics —
  * and therefore the weights — are bit-identical under any
  * partitioning). Nothing row-shaped ever reaches the driver: the
  * same shape as [[QualityClassifier.train]]'s gradient aggregate,
  * with one pass instead of an iteration.
  *
  * INFERENCE is exactly replayable integer arithmetic (the
  * [[Ivf.lastModel]] post-training oracle contract): weights round to
  * ppm longs, a row's prediction is `w0 + Σ wᵢ·xᵢ` in ppm — pure
  * long multiply-add, so the oracle replays predictions and the
  * per-group MAPE with the weight vector inlined as literals. The
  * absolute-percentage error stays integral too:
  * `ape_ppm = |pred_ppm − y·10⁶| DIV y` (y > 0 required — both
  * engines' integer division agree on non-negatives).
  */
object Ols {

  /** Fitted model: ppm-rounded weights, index 0 = intercept, then one
    * per feature in [[fit]]'s feature order. */
  final case class Model(wPpm: Array[Long]) {
    def k: Int = wPpm.length - 1
  }

  /** Stash of the most recent fit, read by the oracle builder after
    * Verify has executed the query (deterministic: any entry fitting
    * the same frame re-derives the identical model). */
  @volatile var lastModel: Option[Model] = None

  /** OLS fit of LONG column `target` on LONG columns `features` (plus
    * an intercept) via one sufficient-statistics aggregate. Fails
    * loudly on a (near-)singular design — collinear features have no
    * unique least-squares solution and a silent pseudo-solve would
    * poison every downstream prediction. */
  def fit(df: DataFrame, features: Seq[String], target: String): Model = {
    val k = features.size
    require(k >= 1, "OLS needs at least one feature")
    val aug: Seq[Column] = lit(1L) +: features.map(col)
    // upper triangle of X'X plus X'y, each term cast to decimal BEFORE
    // the sum so accumulation is exact and unbounded; the per-row
    // product itself is long (features are small integer units — the
    // caller's scaling contract)
    val moments = for (i <- 0 to k; j <- i to k)
      yield sum((aug(i) * aug(j)).cast("decimal(38,0)")).as(s"m_${i}_$j")
    val rhs = (0 to k).map(i =>
      sum((aug(i) * col(target)).cast("decimal(38,0)")).as(s"b_$i"))
    val aggs = moments ++ rhs
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    val a = Array.ofDim[Double](k + 1, k + 2) // augmented [X'X | X'y]
    var idx = 0
    for (i <- 0 to k; j <- i to k) {
      val v = row.getDecimal(idx).doubleValue()
      a(i)(j) = v; a(j)(i) = v
      idx += 1
    }
    for (i <- 0 to k) a(i)(k + 1) = row.getDecimal(idx + i).doubleValue()
    // Gaussian elimination with partial pivoting — deterministic
    // driver arithmetic over deterministic inputs
    val n = k + 1
    for (c <- 0 until n) {
      val p = (c until n).maxBy(r => math.abs(a(r)(c)))
      val tmp = a(p); a(p) = a(c); a(c) = tmp
      require(math.abs(a(c)(c)) > 1e-9 * math.max(1.0, math.abs(a(0)(0))),
        s"singular design matrix: feature set $features is collinear")
      for (r <- 0 until n; if r != c) {
        val f = a(r)(c) / a(c)(c)
        for (cc <- c to n) a(r)(cc) -= f * a(c)(cc)
      }
    }
    val w = (0 until n).map(i => a(i)(n) / a(i)(i)).toArray
    val m = Model(w.map(x => math.round(x * 1e6)))
    lastModel = Some(m)
    m
  }

  /** Per-row prediction in ppm: `w0 + Σ wᵢ·xᵢ` as one long
    * multiply-add column — weights ride as literals, no join, fully
    * codegen'd. */
  def predictPpm(model: Model, features: Seq[String]): Column =
    features.zipWithIndex.foldLeft(lit(model.wPpm(0))) {
      case (acc, (f, i)) => acc + lit(model.wPpm(i + 1)) * col(f)
    }

  /** Per-group prediction-error report — the IC2E per-scenario MAPE
    * table as data: (group, n, sum_ape_ppm, mape_ppm) with
    * `ape_ppm = |pred_ppm − y·10⁶| DIV y` per row (exact integers;
    * requires y > 0) and `mape_ppm = sum_ape_ppm DIV n`. */
  def mapeReport(df: DataFrame, model: Model, features: Seq[String],
      target: String, group: String): DataFrame =
    df.withColumn("pred_ppm", predictPpm(model, features))
      .withColumn("ape_ppm",
        expr(s"abs(pred_ppm - $target * 1000000) DIV $target"))
      .groupBy(col(group))
      .agg(count(lit(1)).as("n"), sum(col("ape_ppm")).as("sum_ape_ppm"))
      .withColumn("mape_ppm", expr("sum_ape_ppm DIV n"))
}
