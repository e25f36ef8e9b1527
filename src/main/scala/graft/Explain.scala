package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: prints the formatted physical plan of
  * selected queries (all of them with no args). Used to check
  * pushdown/pruning/broadcast/codegen expectations hold — see
  * PLANS.md for the reviewed findings. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      // let AQE coalesce the output partitioning of CACHED plans too:
      // a persisted aggregate otherwise materializes at the static
      // shuffle-partition count and every downstream action pays that
      // task count regardless of data size (the decision stays
      // byte-driven at any scale)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = if (args.nonEmpty) args.toSet else SparkEntry.queries.keySet
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => wanted.contains(q._1))
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        // per-entry cache scope, as in Verify: without it, an earlier
        // entry's still-registered cache (whose CAPTURED plan carries
        // its own parquet lineage) substitutes into later entries'
        // plans and inflates their scan counts — the sweep must show
        // each entry's OWN plan (PLANS.md pinned-method caveat)
        try graft.core.CacheScope.withScope {
          fn(spark, sfDir).explain("formatted")
        }
        catch { case e: Throwable => println(s"explain failed: $e") }
      }
    spark.stop()
  }
}
