package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.report.Groups

/** Continuous report-section refresh — the streaming twin of the
  * reference's drop-box-fed batch report (St2 feeds S7/A1): runs land
  * continuously, and after each micro-batch the report's grouped
  * sections are re-derived ONLY for the groups whose runs changed.
  *
  * Shape per micro-batch (`foreachBatch` — the report upsert is a
  * batch-only sink pattern):
  *
  *   1. the batch's prepared rows append to a cumulative RUNS store,
  *      written `partitionBy(category)` under a `batch=<id>` prefix —
  *      per-batch overwrite makes retries idempotent (exactly-once
  *      runs store without a commit log);
  *   2. the batch's own categories (bounded: one row per group) name
  *      the AFFECTED sections;
  *   3. those sections re-derive from the runs store FILTERED to the
  *      affected categories — partition pruning makes the refresh
  *      read O(changed groups' runs), not the whole history;
  *   4. the section frame upserts into the report store via DYNAMIC
  *      partition overwrite: untouched groups keep their rows.
  *
  * At scale the refresh cost tracks the arrival pattern (hot groups
  * re-aggregate often but prune to their own partitions) while the
  * report stays continuously queryable — the property a full-report
  * rebuild per batch lacks. The final report equals the batch report
  * over the drained landing dir BY CONSTRUCTION (same `Groups.section`
  * over the same accumulated rows), which is what the entry's DuckDB
  * oracle checks.
  */
object ReportStream {

  /** Drain `stream` with AvailableNow, refreshing the report store
    * incrementally; returns the final report read back. `prepare` is
    * the per-row run-record normalization (filters/projections) —
    * applied per batch BEFORE the store, so dropped rows never land. */
  def runRefresh(
      s: SparkSession, stream: DataFrame, cfg: Groups.GroupConfig,
      prepare: DataFrame => DataFrame,
      runsDir: String, reportDir: String, checkpointDir: String): DataFrame = {
    val category = cfg.category
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val rows = prepare(batch)
        // bounded collect: one value per group present in THIS batch
        val affected = rows.select(category).distinct().collect().map(_.get(0))
        if (affected.nonEmpty) {
          rows.write.mode("overwrite").partitionBy(category)
            .parquet(s"$runsDir/batch=$batchId")
          // NULL is a group too (the batch oracle's GROUP BY keeps
          // it), and `isin` never matches null — filter it explicitly
          val nonNull = affected.filter(_ != null).toSeq
          val catMatch =
            if (nonNull.length == affected.length)
              col(category).isin(nonNull: _*)
            else col(category).isin(nonNull: _*) || col(category).isNull
          val changedRuns = s.read.option("basePath", runsDir)
            .parquet(s"$runsDir/batch=*")
            .filter(catMatch)
            .drop("batch")
          Groups.section(changedRuns, cfg)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(category)
            .parquet(reportDir)
        }
        ()
      }
      .start()
    q.awaitTermination()
    s.read.parquet(reportDir)
  }
}
