package graft

import org.apache.spark.sql.functions._
import graft.ops.Cms

/** Count-Min sketch (ops/Cms.scala): never-underestimate invariant,
  * the ε-overshoot bound, mergeability across partitionings, register
  * bounds, and oracle-constant parity. */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private val D = 4
  private val W = 256

  /** Skewed synthetic stream: key k appears 1 + (k % 50) times. */
  private def skewed(parts: Int) = {
    val rows = (0 until 400).flatMap { k =>
      Seq.fill(1 + k % 50)(("g", s"k$k"))
    }
    rows.toDF("grp", "v").repartition(parts)
  }

  private def estimates(parts: Int): Map[String, (Long, Long)] = {
    val df = skewed(parts)
    val regs = Cms.registers(df, Seq("grp"), "v", D, W)
    val exact = df.groupBy($"grp", $"v").agg(count(lit(1)).as("n_exact"))
    Cms.estimate(regs, exact.select($"grp", $"v"), Seq("grp"), "v", D, W)
      .join(exact, Seq("grp", "v"))
      .collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("CMS never underestimates and overshoot stays inside the bound") {
    val est = estimates(parts = 4)
    val n = est.values.map(_._2).sum // total stream length
    est.foreach { case (k, (nEst, nExact)) =>
      assert(nEst >= nExact, s"$k underestimated: $nEst < $nExact")
    }
    // ε = e/w; with d=4 the per-key failure probability is (1/2)^4 —
    // over 400 keys allow a small tail above εN but the MEDIAN
    // overshoot must be far inside it
    val epsN = (math.E / W * n).toLong
    val overs = est.values.map { case (nEst, nExact) => nEst - nExact }.toSeq
    assert(overs.count(_ > epsN) <= 400 / 8,
      s"too many keys past the eps bound: ${overs.count(_ > epsN)}")
    assert(overs.sorted.apply(overs.length / 2) <= epsN)
  }

  test("registers are identical across partitionings (mergeable sums)") {
    val a = Cms.registers(skewed(1), Seq("grp"), "v", D, W)
      .collect().map(r => (r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    val b = Cms.registers(skewed(7), Seq("grp"), "v", D, W)
      .collect().map(r => (r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(a === b)
    assert(a.size <= D * W)
  }

  test("an unseen key estimates from the sketch without erroring") {
    val df = skewed(2)
    val regs = Cms.registers(df, Seq("grp"), "v", D, W)
    val cand = Seq(("g", "never-seen-key")).toDF("grp", "v")
    val est = Cms.estimate(regs, cand, Seq("grp"), "v", D, W).collect()(0)
    assert(est.getLong(2) >= 0L) // collisions may make it > 0; never null
  }

  test("oracle SQL carries the same shape constants as the plan") {
    val sql = Cms.estimateSql("events", "g", "CAST(x AS VARCHAR)",
      "SELECT 1 AS g, 2 AS k", "k", D, W)
    assert(sql.contains(s"% $W") && sql.contains(s"range(0, $D)"))
    assert(sql.contains("min(COALESCE(r.n, 0))"))
  }
}
