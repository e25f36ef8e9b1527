package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew-join study (`runMain graft.SkewStudy [sfDir]`): measures
  * AQE's runtime skew-join split against the same plan with the
  * handler disabled, on a deterministically skewed fact table —
  * the PLANS.md evidence that the engine's answer to hot keys at
  * 100 TB is Spark's own runtime re-plan (AQE splits the oversized
  * partition into per-split tasks and replicates the matching build
  * rows), not hand-rolled salting inside every operator.
  *
  * Skew shape: 60% of lineitem rows remap their join key to ONE hot
  * orderkey (`l_orderkey % 10 < 6 → hot`), so under
  * hash-partitioning one task receives ~60% of the fact side while
  * its 31 siblings share the rest — the canonical straggler.
  * Broadcast is disabled (at real scale the dim side outgrows the
  * driver) and the skew threshold is lowered to match the corpus
  * (the production default of 256 MB is tuned for real partitions;
  * the RATIO on/off is what transfers). min-of-2 per setting.
  */
object SkewStudy {

  private def time[A](body: => A): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "4MB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2MB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // x4 inline replication (both sides, keys re-derived consistently)
    // fattens the join so its work — not scan/agg fixed cost —
    // dominates the wall clock at local scale; hot = key (1, r=1)
    val hot = 5L
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_extendedprice"),
        explode(sequence(lit(0), lit(3))).as("r"))
      .select(
        when(pmod(col("l_orderkey"), lit(10)) < 6, lit(hot))
          .otherwise(col("l_orderkey") * 4L + col("r")).as("k"),
        col("l_extendedprice"))
    val ord = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        explode(sequence(lit(0), lit(3))).as("r"))
      .select((col("o_orderkey") * 4L + col("r")).as("k"),
        col("o_orderpriority"))

    def run(): Long =
      li.join(ord, "k")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)), sum(col("l_extendedprice")))
        .collect().map(_.getLong(1)).sum

    var expect = -1L
    Seq(true, false).foreach { skewOn =>
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn)
      val secs = (0 until 2).map(_ => time {
        val n = run()
        if (expect < 0) expect = n
        require(n == expect, s"row-count drift: $n vs $expect")
      })
      println(f"""{"study":"skew","skewJoinEnabled":$skewOn,"sec":${secs.min}%.3f,"joined_rows":$expect}""")
    }
    spark.stop()
  }
}
