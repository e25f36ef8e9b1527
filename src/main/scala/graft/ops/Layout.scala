package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import graft.functions.ZOrderExprs

/** Physical-layout writers for scan-side pruning at scale (the
  * companion of the bucketing/partitioning evidence in
  * `BucketingSpec`/`PartitionPruningSpec`).
  */
object Layout {

  /** Cluster `df` by the Z-order of two key columns and write
    * `nFiles` parquet files: range-partition on the interleaved key
    * (so files own contiguous z-ranges), sort within each partition,
    * drop the helper key. After this layout, min/max footer stats are
    * narrow in BOTH key dimensions per file — a range predicate on
    * either column prunes files/row groups, where a linear sort
    * serves only its leading column. */
  def zorderWrite(df: DataFrame, c1: Column, c2: Column,
      nFiles: Int, outPath: String): Unit =
    df.withColumn("__zk", ZOrderExprs.interleaveBits(c1, c2))
      .repartitionByRange(nFiles, col("__zk"))
      .sortWithinPartitions(col("__zk"))
      .drop("__zk")
      .write.mode("overwrite").parquet(outPath)

  /** The linear-sort baseline: same file count, sorted by `c1` only
    * — the layout Z-ordering replaces. */
  def linearWrite(df: DataFrame, c1: Column,
      nFiles: Int, outPath: String): Unit =
    df.repartitionByRange(nFiles, c1)
      .sortWithinPartitions(c1)
      .write.mode("overwrite").parquet(outPath)
}
