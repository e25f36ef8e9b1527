package graft

import org.apache.spark.sql.functions._
import graft.ops.Hll

/** HyperLogLog sketch (ops/Hll.scala): determinism across
  * partitionings (mergeability), register bounds, accuracy inside the
  * published error envelope on both the raw-HLL and linear-counting
  * branches, and the estimate's cross-engine arithmetic contract. */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private val P = 8
  private val M = 1 << P

  private def estimateOf(n: Int, parts: Int) = {
    val df = (0 until n).map(i => ("g", s"v$i")).toDF("grp", "v")
      .repartition(parts)
    Hll.estimate(Hll.registers(df, Seq("grp"), "v", P), Seq("grp"), P)
      .collect()(0)
  }

  test("registers are bounded by m per group and rho stays in range") {
    val df = (0 until 5000).map(i => (s"g${i % 3}", s"v$i")).toDF("grp", "v")
    val regs = Hll.registers(df, Seq("grp"), "v", P).collect()
    val perGroup = regs.groupBy(_.getString(0)).map(_._2.length)
    assert(perGroup.forall(_ <= M))
    assert(regs.forall { r =>
      val mj = r.getInt(2); mj >= 1 && mj <= 61 - P
    })
  }

  test("estimate is identical across partitionings (mergeable max)") {
    val a = estimateOf(4000, 1)
    val b = estimateOf(4000, 7)
    assert(a.getLong(1) === b.getLong(1))      // n_zero_regs
    assert(a.getLong(2) === b.getLong(2))      // sum_pow
    assert(a.getDouble(3) === b.getDouble(3))  // est_hll bit-equal
  }

  test("raw-HLL branch: 4000 distinct within 5 sigma of truth, no LC") {
    val r = estimateOf(4000, 4)
    assert(!r.getBoolean(4), "4000 >> 2.5m must not take the LC branch")
    val sigma = 1.04 / math.sqrt(M.toDouble) // Flajolet 2007 thm 1
    assert(math.abs(r.getDouble(3) - 4000) / 4000 < 5 * sigma)
  }

  test("linear-counting branch: 60 distinct corrected within 10%") {
    val r = estimateOf(60, 3)
    assert(r.getBoolean(4), "60 << 2.5m must take the LC branch")
    val corrected = Hll.corrected(r.getDouble(3), r.getLong(1), P)
    assert(math.abs(corrected - 60) / 60.0 < 0.10)
    // out-of-branch passthrough
    assert(Hll.corrected(5000.0, 0L, P) === 5000.0)
  }

  test("sum_pow of an empty-ish group is exact: all-zero registers") {
    // one value: 255 empty registers at 2^53 each + one hit register
    val df = Seq(("g", "only")).toDF("grp", "v")
    val r = Hll.estimate(Hll.registers(df, Seq("grp"), "v", P), Seq("grp"), P)
      .collect()(0)
    assert(r.getLong(1) === (M - 1).toLong)
    assert(r.getLong(2) > (M - 1).toLong * (1L << (61 - P)))
  }

  test("numerator constant is the Flajolet alpha for every p branch") {
    assert(Hll.alpha(16) === 0.673 && Hll.alpha(64) === 0.709)
    assert(math.abs(Hll.alpha(256) - 0.7213 / (1 + 1.079 / 256)) === 0.0)
    // the embedded oracle literal round-trips through toString
    val c = Hll.numerator(8)
    assert(c.toString.toDouble === c)
  }

  test("oracle SQL carries the same constants as the plan") {
    val sql = Hll.estimateSql("events", "grp", "CAST(x AS VARCHAR)", 8)
    assert(sql.contains(Hll.numerator(8).toString))
    assert(sql.contains((1L << 52).toString)) // w modulus for p=8
    assert(sql.contains("<< 53"))             // maxRho scale
  }
}
