package graft
import org.apache.spark.sql.SparkSession

/** Throughput bench: each query timed SPARK_GRAFT_BENCH_RUNS times
  * (default 3) and reported at its MINIMUM — this box's load swings
  * single-run timings 3-10x (PLANS.md), so the min is the only number
  * stable enough for round-over-round comparison. Total = sum of
  * per-query minima. Optional args restrict the run to the named
  * queries (for re-checking a single outlier).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val wanted = if (args.nonEmpty) args.toSet else SparkEntry.queries.keySet
    val results = SparkEntry.queries.view.filterKeys(wanted).toMap.map { case (name, fn) =>
      val times = (0 until nRuns).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            if (!errors.contains(name)) errors += name
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        // queries cache intermediates for their own multi-consumer
        // plans; drop them between runs so each run is cold
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs_per_query":$nRuns,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
