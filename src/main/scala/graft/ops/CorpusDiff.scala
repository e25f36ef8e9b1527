package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Release-to-release corpus diff: given two snapshots of a document
  * table, account per source for what changed — added / removed /
  * text-changed / unchanged doc counts and their token masses. The
  * artifact a data-release review reads next to the data card: "this
  * release adds 2.1M docs (+1.4B tokens) to web, rewrites 310k, drops
  * 12k".
  *
  * Scale shape: each side reduces to (id, src, fingerprint,
  * n_tokens) INSIDE its scan (md5 + split-size expressions — the
  * full text never shuffles), the diff is ONE full-outer equi-join on
  * id over those slim rows, and the report is one aggregate over
  * |sources| x 4 statuses. All counts integer; md5 fingerprints make
  * the change detection engine-replayable.
  */
object CorpusDiff {

  /** Per-(source, status) diff: status in added | removed | changed |
    * unchanged, with doc counts and token masses (tokens_prev /
    * tokens_cur are each side's whitespace-token mass; 0 on the side
    * where the doc does not exist). A doc's source is taken from the
    * side where it exists (current wins for changed docs — a doc may
    * move sources between releases and is reported under where it
    * landed). */
  def report(prev: DataFrame, cur: DataFrame,
      textCol: String, idCol: String, srcCol: String): DataFrame = {
    // presence is tracked by an explicit flag, never by fp nullness —
    // a doc with NULL text present on both sides is "unchanged", not
    // "added" (its fp coalesces, its token count is 0)
    def slim(df: DataFrame, side: String): DataFrame = df.select(
      col(idCol).as("id"),
      col(srcCol).as(s"src_$side"),
      lit(true).as(s"in_$side"),
      md5(coalesce(col(textCol), lit(""))).as(s"fp_$side"),
      when(col(textCol).isNull, lit(0L))
        .otherwise(Pack.whitespaceTokens(col(textCol))).as(s"toks_$side"))
    slim(prev, "p").join(slim(cur, "c"), Seq("id"), "full_outer")
      .withColumn("status",
        when(col("in_p").isNull, "added")
          .when(col("in_c").isNull, "removed")
          .when(col("fp_p") === col("fp_c"), "unchanged")
          .otherwise("changed"))
      .withColumn("source", coalesce(col("src_c"), col("src_p")))
      .groupBy(col("source"), col("status"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(col("toks_p"), lit(0L))).as("tokens_prev"),
        sum(coalesce(col("toks_c"), lit(0L))).as("tokens_cur"))
      .withColumn("token_delta", col("tokens_cur") - col("tokens_prev"))
      .orderBy(col("source"), col("status"))
  }
}
