package graft.core

import org.apache.spark.sql.DataFrame

/** Parallelism guard for explode-heavy operators.
  *
  * A narrow local input (one parquet file → one or two scan splits)
  * would run a shingle/token explode nearly single-threaded, so those
  * operators widen the input to the cluster's parallelism first. But
  * widening must not be unconditional: a 100 TB scan already carries
  * orders of magnitude more partitions than cores, and a blanket
  * `repartition(defaultParallelism)` there would pay a full-corpus
  * text exchange AND down-partition it to core count — multi-GB
  * spilling partitions. Widen only inputs narrower than the target;
  * a well-partitioned scan passes through untouched.
  */
object Par {

  /** `df` repartitioned up to `defaultParallelism` when its current
    * plan yields fewer partitions; unchanged otherwise. Reading the
    * partition count runs physical planning for `df` but launches no
    * job. Row placement is the only thing that changes, so operators
    * built on it stay partitioning-invariant. */
  def widen(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
