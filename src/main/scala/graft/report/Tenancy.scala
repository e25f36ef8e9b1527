package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J2: tenancy count-join (reference report_generator.py:231-255).
  *
  * Count uses per VM id, then join count + a representative attribute
  * string back onto every run (`zTenancy[vmID] = "<cpuType> - <uses>"`).
  * The reference's "first cpuType seen" is list-order dependent; here
  * `min` is used — deterministic under any partitioning (documented
  * deviation, same spirit).
  *
  * Scale: the aggregated side is one row per VM id — broadcast it;
  * the fact side never shuffles.
  */
object Tenancy {

  def enrich(df: DataFrame, idCol: String, attrCol: String): DataFrame = {
    val counts = df.groupBy(col(idCol)).agg(
      count(lit(1)).as("tenants"),
      min(col(attrCol).cast("string")).as("__attr"))
    df.join(broadcast(counts), Seq(idCol))
      .withColumn(s"ztenancy_$idCol",
        concat(col("__attr"), lit(" - "), col("tenants").cast("string")))
      .drop("__attr")
  }
}
